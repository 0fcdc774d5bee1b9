"""Measure the substring (line-gram containment) leg of the DELTA store —
the recall it buys and the delivery wall it costs, mirroring the batch
pipeline's containment evidence in BENCH/RECALL.md.

Protocol: a planted shifted-containment corpus (pairs are invisible to
MinHash-LSH and SimHash by construction — symmetric J ~= embed/host). The
embedded small file of every planted pair goes into the BOOTSTRAP, its host
arrives later in a PROBE delivery, so every pair must be found across the
store/delta boundary. Two stores — substring off vs on — receive identical
probe halves, delivery order alternated per half (session drift cancels),
best-of-2 walls. The wall delta is the leg's cost; the cross-boundary
containment recall (off ~= 0, on = 1) is what it buys.

Usage: python scripts/eval_delta_substring.py        # 20k files
       SPARK_GRAFT_DELTA_SUB_FILES=4000 python scripts/eval_delta_substring.py
Writes/updates the '## Substring containment leg' section of BENCH/DELTA.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts._bench_md import replace_section  # noqa: E402
from sycl_jaccard_spark.config import PipelineConfig  # noqa: E402
from sycl_jaccard_spark.plans.delta import DeltaDedup  # noqa: E402
from sycl_jaccard_spark.sources.corpus import synth_containment_files  # noqa: E402


def main() -> int:
    n_files = int(os.environ.get("SPARK_GRAFT_DELTA_SUB_FILES", "20000"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from sycl_jaccard_spark.session import get_spark

    spark = get_spark("eval_delta_substring", cores=cores, shuffle_partitions=cores)
    cfg = PipelineConfig()

    files, planted = synth_containment_files(spark, n_files=n_files, pair_frac=0.1, seed=5)
    files = files.localCheckpoint(eager=True)
    # every planted pair crosses the store/delta boundary: embedded file
    # (even id) bootstraps, its host (odd id) arrives in a probe delivery
    bootstrap = files.filter(F.col("id") % 2 == 0).localCheckpoint(eager=True)
    probe = files.filter(F.col("id") % 2 == 1)
    halves = [
        probe.filter(F.pmod(F.xxhash64("id"), F.lit(2)) == h).localCheckpoint(eager=True)
        for h in range(2)
    ]

    root = tempfile.mkdtemp(prefix="delta_sub_")

    # untimed warmup (JVM codegen + Arrow/Python-worker startup)
    warm = DeltaDedup(spark, f"{root}/warm", cfg, enable_substring=True)
    warm.add_batch(bootstrap.limit(500))
    warm.add_batch(halves[0].limit(200).select(
        (F.col("id") + (1 << 50)).alias("id"), "content"))

    stores = {
        "off": DeltaDedup(spark, f"{root}/off", cfg),
        "on": DeltaDedup(spark, f"{root}/on", cfg, enable_substring=True),
    }
    boot_walls = {}
    for name, store in stores.items():
        t0 = time.monotonic()
        store.add_batch(bootstrap)
        boot_walls[name] = time.monotonic() - t0
        print(f"bootstrap[{name}] ({bootstrap.count()} files): {boot_walls[name]:.1f}s")

    walls = {"off": float("inf"), "on": float("inf")}
    for h, half in enumerate(halves):
        order = ["off", "on"] if h % 2 == 0 else ["on", "off"]
        for name in order:
            t0 = time.monotonic()
            stores[name].add_batch(half)
            walls[name] = min(walls[name], time.monotonic() - t0)
    n_half = halves[0].count()
    print(f"probe half ({n_half} files): off={walls['off']:.1f}s on={walls['on']:.1f}s")

    recall = {}
    for name, store in stores.items():
        lab = {r["id"]: r["cluster"] for r in store.clusters().collect()}
        recall[name] = sum(1 for a, b in planted if lab[a] == lab[b]) / len(planted)
    print(f"containment recall: off={recall['off']:.2f} on={recall['on']:.2f}")

    overhead = 100.0 * (walls["on"] / walls["off"] - 1.0)
    boot_overhead = 100.0 * (boot_walls["on"] / boot_walls["off"] - 1.0)
    replace_section("BENCH/DELTA.md", "\n\n## Substring containment leg", f"""

## Substring containment leg (scripts/eval_delta_substring.py)

Planted shifted-containment corpus, {n_files:,} files / {len(planted):,}
pairs (symmetric J ~= 0.15 — invisible to MinHash-LSH + SimHash by
construction). The embedded file of every pair bootstraps the store; its
host arrives in a later probe delivery, so every pair must be found ACROSS
the store/delta boundary. Identical probe halves to both stores, order
alternated, best-of-2 walls, local[{cores}].

| store | bootstrap ({bootstrap.count():,}) | probe delivery ({n_half:,}) | cross-boundary containment recall |
|---|---|---|---|
| substring off | {boot_walls['off']:.1f} s | {walls['off']:.1f} s | {recall['off']:.2f} |
| substring on | {boot_walls['on']:.1f} s | {walls['on']:.1f} s | **{recall['on']:.2f}** |

Recall {recall['off']:.2f} -> {recall['on']:.2f} for
{overhead:+.0f}% probe wall ({boot_overhead:+.0f}% bootstrap) — the same
trade the batch pipeline measures in BENCH/RECALL.md, now available to a
store that never re-signs old content: the host's line grams band-join
against the PERSISTED grams of the embedded file signed in an earlier epoch.
""")
    print("BENCH/DELTA.md updated")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
