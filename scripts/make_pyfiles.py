"""Build the --py-files artifact for cluster submission (north-rule run mode:
``spark-submit --py-files dist/sycl_jaccard_spark.zip jobs/run_pipeline.py``).

Zips the package sources only — tests, data and benchmarks stay out so the
artifact shipped to every executor is a few tens of KB.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    out_dir = os.path.join(ROOT, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "sycl_jaccard_spark.zip")
    pkg = os.path.join(ROOT, "sycl_jaccard_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, ROOT))
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
