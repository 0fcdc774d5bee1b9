"""Capacity smoke for the DISTRIBUTED connected-components path
(large-star/small-star, Kiveris SoCC'14) on a >2M-edge graph — the scale
regime the driver union-find scale-switch (components.py driver_threshold)
normally absorbs at test SFs. VERDICT r3 #5: the distributed path was
correct-by-test only; this records a real measurement (rounds to
convergence + wall) on a graph past the switch.

Graph: N_COMP path components of 6 nodes (the dominant dup-graph shape:
many small clusters) plus one 10k-node chain (worst-case diameter — naive
min-label propagation would need 10k rounds; star rounds need O(log^2)).
Generated DISTRIBUTED from spark.range (no driver materialization).
Correctness is asserted structurally: every path component labels to its
min node, the chain collapses to one label, total distinct labels match.

Usage: python scripts/cc_capacity_smoke.py   # appends to BENCH/BASELINE.md
       SPARK_GRAFT_CC_EDGES=2500000 SPARK_GRAFT_CPUS=32 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sycl_jaccard_spark.operators.components import connected_components  # noqa: E402
from sycl_jaccard_spark.session import get_spark  # noqa: E402

CHAIN_N = 10_000
CHAIN_OFFSET = 10_000_000_000  # disjoint id space, also exercises 64-bit ids


def main() -> int:
    n_edges = int(os.environ.get("SPARK_GRAFT_CC_EDGES", "2500000"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_comp = n_edges // 5  # 5 path edges per 6-node component
    spark = get_spark("cc_capacity_smoke", cores=cores, shuffle_partitions=cores)

    paths = spark.range(n_comp * 5).select(
        ((F.col("id") / 5).cast("long") * 6 + F.col("id") % 5).alias("a"),
        ((F.col("id") / 5).cast("long") * 6 + F.col("id") % 5 + 1).alias("b"),
    )
    chain = spark.range(CHAIN_N - 1).select(
        (F.col("id") + CHAIN_OFFSET).alias("a"),
        (F.col("id") + CHAIN_OFFSET + 1).alias("b"),
    )
    pairs = paths.union(chain).localCheckpoint(eager=True)
    total_edges = pairs.count()

    stats: dict = {}
    t0 = time.monotonic()
    labels = connected_components(pairs, driver_threshold=0, stats=stats)
    # verification doubles as materialization: every 6-node path component
    # must label to its min node (6c), the chain to CHAIN_OFFSET
    bad = labels.filter(
        F.when(
            F.col("node") >= CHAIN_OFFSET, F.col("label") != CHAIN_OFFSET
        ).otherwise(F.col("label") != (F.col("node") / 6).cast("long") * 6)
    ).count()
    n_labels = labels.select("label").distinct().count()
    wall = time.monotonic() - t0

    ok = bad == 0 and n_labels == n_comp + 1
    line = (
        f"| {total_edges} edges ({n_comp} path components + {CHAIN_N}-node chain) "
        f"| local[{cores}] | {stats.get('rounds', '?')} | {wall:.1f} | "
        f"{'PASS' if ok else 'FAIL'} ({bad} mislabeled, {n_labels} labels) |"
    )
    print(line)
    from scripts._bench_md import replace_section

    replace_section("BENCH/BASELINE.md", "\n\n## Distributed connected-components capacity smoke", f"""

## Distributed connected-components capacity smoke (scripts/cc_capacity_smoke.py)

Large-star/small-star path forced with ``driver_threshold=0`` on a graph past
the 2M-edge driver switch; labels verified structurally (min-node per planted
component, chain collapse, distinct-label count).

| graph | mode | star rounds | wall (s) | verdict |
|---|---|---|---|---|
{line}
""")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
