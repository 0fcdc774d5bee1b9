"""Exact Jaccard over an explicit candidate-pair list — the reference's
``sygraph::jaccard_list`` (A5, ``standalone_algorithms.hpp:109-133``,
``jaccard.cpp:901-923``): K3 rowsum → K5 pair intersect → K6 score.

This is THE verification primitive of the dedup pipeline: LSH/SimHash emit
(a, b) candidate pairs; this operator scores them exactly against the items'
set columns. Two implementations (their equality is a test, mirroring the
reference's EC-vs-VC consistency runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sycl_jaccard_spark.functions.jaccard import (
    jaccard_from_counts,
    jaccard_of_arrays,
)


def jaccard_pairs(
    items: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    set_col: str = "set",
    impl: str = "arrays",
) -> DataFrame:
    """Score each (a, b) pair in ``pairs`` with the exact Jaccard of the two
    rows' ``set_col`` arrays (distinct elements). Returns (a, b, inter,
    size_a, size_b, jaccard).

    ``impl="arrays"``: join set arrays onto pairs, fused array_intersect
    expression (K5+K6 in one codegen stage).
    ``impl="exploded"``: explode sets, equi-join on element, groupBy count —
    the atomic-accumulation analog (``jaccard.cpp:370-396`` → groupBy.sum).
    """
    if impl == "arrays":
        a = items.select(F.col(id_col).alias("a"), F.col(set_col).alias("set_a"))
        b = items.select(F.col(id_col).alias("b"), F.col(set_col).alias("set_b"))
        inter = F.size(F.array_intersect("set_a", "set_b")).cast("long")
        return (
            pairs.select("a", "b")
            .join(a, "a")
            .join(b, "b")
            .select(
                "a",
                "b",
                inter.alias("inter"),
                F.size("set_a").cast("long").alias("size_a"),
                F.size("set_b").cast("long").alias("size_b"),
                jaccard_of_arrays(F.col("set_a"), F.col("set_b")).alias("jaccard"),
            )
        )
    if impl == "exploded":
        elems = items.select(
            F.col(id_col).alias("_id"), F.explode(F.array_distinct(set_col)).alias("elem")
        )
        sizes = elems.groupBy("_id").agg(F.count("*").alias("sz"))
        pa = pairs.select("a", "b")
        # intersection count: expand pair with a's elements, then inner-join
        # on (b, elem) — a hash probe per element, never |A|×|B| (this is the
        # binary-search-probe analog, jaccard.cpp:494-508 → hash join)
        ea = elems.select(F.col("_id").alias("a"), "elem")
        eb = elems.select(F.col("_id").alias("b"), "elem")
        inter = (
            pa.join(ea, "a")
            .join(eb, ["b", "elem"])
            .groupBy("a", "b")
            .agg(F.count("*").alias("inter"))
        )
        sa = sizes.select(F.col("_id").alias("a"), F.col("sz").alias("size_a"))
        sb = sizes.select(F.col("_id").alias("b"), F.col("sz").alias("size_b"))
        return (
            pa.join(inter, ["a", "b"], "left")
            .join(sa, "a")
            .join(sb, "b")
            .select(
                "a",
                "b",
                F.coalesce("inter", F.lit(0)).cast("long").alias("inter"),
                "size_a",
                "size_b",
                jaccard_from_counts(
                    F.coalesce("inter", F.lit(0)).cast("long"), F.col("size_a"), F.col("size_b")
                ).alias("jaccard"),
            )
        )
    raise ValueError(f"unknown impl {impl!r}")
