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
    """Exact same labels as the distributed path, via driver union-find."""
    spark = pairs.sparkSession
    pdf = pairs.select(
        F.col("a").cast("long"), F.col("b").cast("long")
    ).toPandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pdf["a"], pdf["b"]):
        a, b = int(a), int(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    import pandas as pd

    out = pd.DataFrame(
        {"node": list(parent.keys()), "label": [find(n) for n in parent]},
        dtype="int64",
    )
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
) -> DataFrame:
    """(node, label) for every node appearing in ``pairs`` (a, b)."""
    pairs = pairs.select("a", "b").filter(F.col("a") != F.col("b"))
    if driver_threshold > 0:
        n_pairs = pairs.limit(driver_threshold + 1).count()
        if n_pairs <= driver_threshold:
            return _driver_union_find(pairs)

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
    for it in range(max_iterations):
        edges = _round(edges)
        if (it + 1) % checkpoint_every == 0:
            edges = edges.localCheckpoint(eager=True)
        sig = signature(edges)
        if sig == prev_sig:
            break
        prev_sig = sig

    # fixpoint is a star forest of (node, root) directed edges
    labels = edges.groupBy("u").agg(F.min("v").alias("label")).select(
        F.col("u").alias("node"), "label"
    )
    roots = nodes.join(labels, "node", "left_anti").select(
        "node", F.col("node").alias("label")
    )
    return labels.union(roots)
