"""Connected components via alternating large-star / small-star hash joins
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
public algorithm; SURVEY.md §7 step 7).

Two execution paths, chosen by pair count (the same scale-switch idea as
Spark's broadcast-join threshold):

* ``driver_threshold`` or fewer pairs — union-find on the driver (one Arrow
  collect + one parallelize). The verified dup-pair graph is usually tiny
  relative to the corpus, so this is the common case even at large SF.
* otherwise — distributed large-star/small-star. Each round is 4 shuffles
  over a *directed large→small* edge form; converges in O(log² n) rounds on
  any topology (naive min-label propagation needs diameter rounds — dup
  chains can be long). Per-round localCheckpoint is load-bearing: each round
  references its input several times, so an untruncated plan grows
  exponentially.

Output: (node, label) with label = min node id of the component — the same
deterministic representative the reference's sorted std::set ordering yields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LABEL_SCHEMA = T.StructType(
    [
        T.StructField("node", T.LongType(), False),
        T.StructField("label", T.LongType(), False),
    ]
)


def _driver_union_find(pairs: DataFrame) -> DataFrame:
    """Exact same labels as the distributed path, via vectorized min-label
    propagation on the driver (NumPy scatter-min + pointer doubling — the
    FastSV/Shiloach-Vishkin shape). One Arrow collect, O(E) work per round,
    O(log n) rounds; replaces the r1 per-edge Python union-find loop whose
    serial seconds were the largest Amdahl term in the scaling bench."""
    import numpy as np
    import pandas as pd

    spark = pairs.sparkSession
    pdf = pairs.select(
        F.col("a").cast("long"), F.col("b").cast("long")
    ).toPandas()
    if len(pdf) == 0:
        return spark.createDataFrame(pd.DataFrame({"node": [], "label": []}, dtype="int64"), _LABEL_SCHEMA)
    ab = np.concatenate([pdf["a"].to_numpy(np.int64), pdf["b"].to_numpy(np.int64)])
    nodes, idx = np.unique(ab, return_inverse=True)
    u, v = idx[: len(pdf)], idx[len(pdf):]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = label
        edge_min = np.minimum(label[u], label[v])
        label = label.copy()
        np.minimum.at(label, u, edge_min)
        np.minimum.at(label, v, edge_min)
        label = np.minimum(label, label[label])  # pointer doubling
        label = np.minimum(label, label[label])
        if np.array_equal(label, before):
            break
    out = pd.DataFrame({"node": nodes, "label": nodes[label]})
    return spark.createDataFrame(out, _LABEL_SCHEMA)  # Arrow path


def _round(edges: DataFrame) -> DataFrame:
    """One large-star + small-star round over directed (u > v) edges.
    Returns directed (u > v) edges again. 4 shuffles."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # large-star: m(u) = min(N(u) ∪ {u}); connect strictly-larger neighbors to m
    m = sym.groupBy("u").agg(F.min("v").alias("mn")).select(
        "u", F.least("mn", F.col("u")).alias("m")
    )
    ls = (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )
    # ls edges are (big, small): grouping by u sees exactly the ≤-neighborhood
    # small-star: connect u and all its small neighbors to their min
    m2 = ls.groupBy("u").agg(F.min("v").alias("m2"))
    ss = (
        ls.join(m2, "u")
        .select(F.col("v").alias("u"), F.col("m2").alias("v"))
        .union(m2.select("u", F.col("m2").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )
    return ss


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 50,
    checkpoint_every: int = 1,
    driver_threshold: int = 2_000_000,
    stats: dict | None = None,
) -> DataFrame:
    """(node, label) for every node appearing in ``pairs`` (a, b).

    ``stats``: pass a dict to receive execution observability — which path
    ran ("driver" | "distributed"), the pair count (when counted), and for
    the distributed path the star rounds to convergence."""
    pairs = pairs.select("a", "b").filter(F.col("a") != F.col("b"))
    if stats is None:
        stats = {}
    if driver_threshold > 0:
        # full parallel count, not limit(N+1).count(): GlobalLimit funnels up
        # to N rows through ONE task — a serial scan that anti-scales. Callers
        # pass a materialized pair relation, so counting it is one cheap job.
        n_pairs = pairs.count()
        stats["n_pairs"] = n_pairs
        if n_pairs <= driver_threshold:
            stats["path"] = "driver"
            return _driver_union_find(pairs)
    stats["path"] = "distributed"

    # distributed path: directed large→small canonical edges
    edges = (
        pairs.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .dropDuplicates(["u", "v"])
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def signature(e: DataFrame) -> tuple:
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        return (row.n, row.h)

    prev_sig = None
    converged = False
    for it in range(max_iterations):
        edges = _round(edges)
        if (it + 1) % checkpoint_every == 0:
            edges = edges.localCheckpoint(eager=True)
        sig = signature(edges)
        if sig == prev_sig:
            converged = True
            stats["rounds"] = it + 1
            break
        prev_sig = sig
    if not converged:
        # returning silently would hand back wrong (partially merged) labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "star rounds; raise max_iterations (O(log^2 n) expected)"
        )

    # fixpoint is a star forest of (node, root) directed edges
    labels = edges.groupBy("u").agg(F.min("v").alias("label")).select(
        F.col("u").alias("node"), "label"
    )
    roots = nodes.join(labels, "node", "left_anti").select(
        "node", F.col("node").alias("label")
    )
    return labels.union(roots)
