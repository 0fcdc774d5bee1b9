"""Deterministic synthetic source-code corpus with planted near-duplicate
clusters (FIXTURES.md §1). Input shape is exactly the north rule's Iceberg
table: (repo, path, commit, lang, content). Ground truth (file index →
cluster id) is returned alongside for recall measurement.

Pure-Python generation on the driver for test scales (≤ ~100k files), then
parallelized into a DataFrame; everything seeded — same seed, same corpus.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

LANGS = ("python", "java", "c", "go", "js")
EXT = {"python": "py", "java": "java", "c": "c", "go": "go", "js": "js"}

_IDENTS = (
    "data value result index count buffer node item entry key total offset state "
    "config handler parser writer reader queue stack cache token block chunk row col"
).split()
_OPS = ("+", "-", "*", "%")
_LICENSE = [
    "// Licensed under the Apache License, Version 2.0 (the License);",
    "// you may not use this file except in compliance with the License.",
    "// You may obtain a copy of the License at http://www.apache.org/licenses/",
    "// Unless required by applicable law or agreed to in writing, software",
    "// distributed under the License is distributed on an AS IS BASIS,",
]


def _base_file(rng: random.Random, n_funcs: int = 4, boilerplate: bool = False) -> list[str]:
    lines: list[str] = []
    if boilerplate:
        lines += _LICENSE
    for _ in range(n_funcs):
        name = rng.choice(_IDENTS) + "_" + rng.choice(_IDENTS)
        args = rng.sample(_IDENTS, 2)
        lines.append(f"def {name} ( {args[0]} , {args[1]} ) :")
        for _ in range(rng.randint(3, 7)):
            a, b, c = rng.choice(_IDENTS), rng.choice(_IDENTS), rng.choice(_IDENTS)
            op = rng.choice(_OPS)
            lines.append(f"    {a} = {b} {op} {c} + {rng.randint(0, 99)}")
        lines.append(f"    return {rng.choice(args)}")
    return lines


def _mutate(rng: random.Random, lines: list[str], edit_rate: float) -> list[str]:
    """Token renames / line inserts / comment edits at a controlled rate —
    keeps shingle-Jaccard to the base high but < 1."""
    out = list(lines)
    n_edits = max(1, int(len(out) * edit_rate))
    for _ in range(n_edits):
        kind = rng.random()
        i = rng.randrange(len(out))
        if kind < 0.4:  # token rename within one line
            toks = out[i].split(" ")
            idents = [j for j, t in enumerate(toks) if t in _IDENTS]
            if idents:
                toks[rng.choice(idents)] = rng.choice(_IDENTS)
            out[i] = " ".join(toks)
        elif kind < 0.7:  # comment insert
            out.insert(i, f"    # note {rng.randint(0, 9999)}")
        else:  # line insert
            a, b = rng.choice(_IDENTS), rng.choice(_IDENTS)
            out.insert(i, f"    {a} = {a} + {b}")
    return out


@dataclass
class CorpusSpec:
    n_files: int = 200
    n_clusters: int = 30
    cluster_min: int = 2
    cluster_max: int = 8
    edit_rate: float = 0.08
    exact_dup_rate: float = 0.25   # fraction of cluster members that are exact copies
    boilerplate_frac: float = 0.0  # fraction of files carrying the shared license header
    seed: int = 42


SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)


def synth_source_files(
    spark: SparkSession, spec: CorpusSpec | None = None
) -> tuple[DataFrame, dict[tuple[str, str, str], int]]:
    """Returns (files_df, truth) where truth maps (repo, path, commit) →
    planted cluster id (-1 for singletons)."""
    spec = spec or CorpusSpec()
    rng = random.Random(spec.seed)
    rows: list[tuple] = []
    truth: dict[tuple[str, str, str], int] = {}

    def add(i: int, content: str, cluster: int) -> None:
        lang = LANGS[i % len(LANGS)]
        repo = f"org{i % 7}/repo{i % 23}"
        path = f"src/m{i % 13}/f{i}.{EXT[lang]}"
        commit = hashlib.sha1(f"{spec.seed}:{i}".encode()).hexdigest()
        rows.append((repo, path, commit, lang, content))
        truth[(repo, path, commit)] = cluster

    i = 0
    for c in range(spec.n_clusters):
        size = rng.randint(spec.cluster_min, spec.cluster_max)
        boiler = rng.random() < spec.boilerplate_frac
        base = _base_file(rng, boilerplate=boiler)
        add(i, "\n".join(base), c)
        i += 1
        for _ in range(size - 1):
            if rng.random() < spec.exact_dup_rate:
                add(i, "\n".join(base), c)
            else:
                add(i, "\n".join(_mutate(rng, base, spec.edit_rate)), c)
            i += 1
    while i < spec.n_files:
        boiler = rng.random() < spec.boilerplate_frac
        add(i, "\n".join(_base_file(rng, boilerplate=boiler)), -1)
        i += 1

    df = spark.createDataFrame(rows, SCHEMA)
    return df, truth


def _det_line(seed: int, key: str, i: int) -> str:
    """Deterministic pseudo-random code line keyed by (seed, key, i) — content
    depends only on the key, never on partitioning or generation order."""
    h = hashlib.blake2b(f"{seed}:{key}:{i}".encode(), digest_size=8).digest()
    a, b, c, d = h[0] | h[1] << 8, h[2] | h[3] << 8, h[4] | h[5] << 8, h[6] | h[7] << 8
    return f"    v{a} = fn{b} ( arg{c} , {d % 100} )"


def synth_containment_files(
    spark: SparkSession,
    n_files: int = 100_000,
    pair_frac: float = 0.1,
    host_lines: int = 200,
    embed_lines: int = 30,
    seed: int = 42,
    rewrap: int = 0,
) -> tuple[DataFrame, set[tuple[int, int]]]:
    """Planted SHIFTED-CONTAINMENT corpus, generated DISTRIBUTED (mapInPandas
    over spark.range — no driver-side materialization, so it scales far past
    the list-of-rows generator above).

    For k < n_files*pair_frac/2: file 2k is a small standalone file A_k
    (``embed_lines`` lines) and file 2k+1 is a large host B_k = unique
    prefix + A_k verbatim + unique suffix (``host_lines`` total). Symmetric
    shingle Jaccard of the pair is ~embed/host (≈0.15 at the defaults) —
    far below the LSH S-curve and SimHash Hamming radius, so MinHash-LSH and
    SimHash both MISS these pairs by construction; only the substring
    (line-gram containment) pass can recover them. Remaining ids are unique
    filler files. Returns ((id, content) DataFrame, planted (2k, 2k+1) pairs).

    ``rewrap > 0``: the HOST's embedded copy is RE-WRAPPED — groups of
    ``rewrap`` logical lines joined into one physical line. The token stream
    (and hence the shingle sets and exact-verify scores) is unchanged, but
    not one physical line is shared, so the line-gram substring pass finds
    zero candidates by construction — only the winnowed-fingerprint pass
    (``substring_pass="winnow"``, whitespace-normalized) can recover these.
    """
    n_pairs = int(n_files * pair_frac) // 2
    pre = (host_lines - embed_lines) // 2
    suf = host_lines - embed_lines - pre

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out_id, out_content = [], []
            for fid in pdf["id"]:
                fid = int(fid)
                k = fid // 2
                if k < n_pairs and fid % 2 == 0:
                    lines = [_det_line(seed, f"A{k}", i) for i in range(embed_lines)]
                elif k < n_pairs:
                    emb = [_det_line(seed, f"A{k}", i) for i in range(embed_lines)]
                    if rewrap:
                        emb = [
                            " ".join(emb[i : i + rewrap])
                            for i in range(0, len(emb), rewrap)
                        ]
                    lines = (
                        [_det_line(seed, f"P{k}", i) for i in range(pre)]
                        + emb
                        + [_det_line(seed, f"S{k}", i) for i in range(suf)]
                    )
                else:
                    lines = [_det_line(seed, f"F{fid}", i) for i in range(embed_lines)]
                out_id.append(fid)
                out_content.append("\n".join(lines))
            yield pd.DataFrame({"id": out_id, "content": out_content})

    files = spark.range(n_files).mapInPandas(gen, "id long, content string")
    planted = {(2 * k, 2 * k + 1) for k in range(n_pairs)}
    return files, planted


def synth_scattered_files(
    spark: SparkSession,
    n_files: int = 200,
    pair_frac: float = 0.2,
    host_lines: int = 90,
    runs: int = 6,
    run_len: int = 6,
    seed: int = 42,
) -> tuple[DataFrame, set[tuple[int, int]]]:
    """Planted ORDER-BLIND FALSE-POSITIVE corpus for the substring pass.

    For k < n_files*pair_frac/2: file 2k+1 is a host of ``host_lines``
    unique lines; file 2k is a CHERRY-PICKED excerpt — ``runs`` non-adjacent
    runs of ``run_len`` consecutive host lines, concatenated. Nearly every
    token shingle of the excerpt appears in the host (inter/min ≈ 0.93 at
    the defaults, above the containment threshold) and each run fires the
    line-gram candidate pass, BUT there is no contiguous shared region longer
    than one run — the excerpt is NOT a substring of the host. The count-based
    containment rule merges these pairs; the exact suffix-array LCS rule
    (``substring_verify="lcs"``) must reject every one. Remaining ids are
    unique filler files. Returns ((id, content) DataFrame, planted pairs).
    """
    n_pairs = int(n_files * pair_frac) // 2
    stride = host_lines // runs
    if stride <= run_len:
        raise ValueError("runs*run_len too dense: excerpt runs would be adjacent")

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out_id, out_content = [], []
            for fid in pdf["id"]:
                fid = int(fid)
                k = fid // 2
                if k < n_pairs and fid % 2 == 1:
                    lines = [_det_line(seed, f"H{k}", i) for i in range(host_lines)]
                elif k < n_pairs:
                    lines = [
                        _det_line(seed, f"H{k}", j * stride + i)
                        for j in range(runs)
                        for i in range(run_len)
                    ]
                else:
                    lines = [_det_line(seed, f"F{fid}", i) for i in range(run_len * runs)]
                out_id.append(fid)
                out_content.append("\n".join(lines))
            yield pd.DataFrame({"id": out_id, "content": out_content})

    files = spark.range(n_files).mapInPandas(gen, "id long, content string")
    planted = {(2 * k, 2 * k + 1) for k in range(n_pairs)}
    return files, planted


def truth_pairs(truth: dict[tuple[str, str, str], int]) -> set[tuple]:
    """All unordered within-cluster key pairs — the recall denominator."""
    by_cluster: dict[int, list] = {}
    for key, c in truth.items():
        if c >= 0:
            by_cluster.setdefault(c, []).append(key)
    out = set()
    for members in by_cluster.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                out.add((ms[x], ms[y]))
    return out
