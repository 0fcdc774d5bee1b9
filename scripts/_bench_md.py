"""Shared helper for evidence scripts that maintain sections of the
markdown files under BENCH/ (ADVICE r4: cc_capacity_smoke appended a
duplicate section per run while eval_recall replaced in place — one
idempotent implementation for both)."""

from __future__ import annotations

import os


def replace_section(path: str, marker: str, new_text: str) -> None:
    """Replace ONE '## ...' section of ``path`` in place (or append it if
    absent), preserving the headline and every OTHER section regardless of
    order — naive split-at-marker truncation deleted whichever sections
    happened to follow the replaced one."""
    try:
        content = open(path).read()
    except FileNotFoundError:
        content = ""
    start = content.find(marker)
    if start < 0:
        out = content + new_text
    else:
        nxt = content.find("\n\n## ", start + len(marker))
        tail = content[nxt:] if nxt >= 0 else ""
        out = content[:start] + new_text + tail
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "w") as f:
        f.write(out)
