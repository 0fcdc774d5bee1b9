"""Per-vertex volume — reference kernel K3 (Jaccard_RowSumKernel,
``jaccard.cpp:236-313``).

Unweighted: work[v] = degree(v). Weighted: work[v] = Σ_{x∈N(v)} w(x) where w
is a per-vertex weight vector (``standalone_algorithms.hpp:60-63``). The
manual intra-workgroup prefix sum (K2, ``jaccard.cpp:53-137``) disappears:
Spark's partial + final aggregation in ``groupBy().agg(sum)`` is the same
map-side-combine strategy, chosen by the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame, vertex_col: str = "src") -> DataFrame:
    """K3 unweighted: (vertex, degree). Edges are assumed deduplicated
    (N5) as the CSR build guarantees in the reference."""
    return (
        edges.groupBy(F.col(vertex_col).alias("vertex"))
        .agg(F.count("*").alias("degree"))
    )


def synthesize_vertex_weights(edges: DataFrame, weight_col: str = "weight") -> DataFrame:
    """K10 analog (``main.cpp:216-275``): when only *edge* weights exist, the
    reference synthesizes per-vertex weights as the sum of incident edge
    weights (reusing K3 with an identity index buffer). Same thing here —
    one groupBy."""
    return (
        edges.groupBy(F.col("src").alias("vertex"))
        .agg(F.sum(weight_col).alias("w"))
    )


def volumes(edges: DataFrame, vertex_weights: DataFrame) -> DataFrame:
    """K3 weighted: vol(v) = Σ_{x∈N(v)} w(x).

    ``vertex_weights``: (vertex, w). Broadcast when small — the weight vector
    is per-vertex, usually far smaller than the edge set.
    """
    vw = vertex_weights.select(F.col("vertex").alias("dst"), "w")
    return (
        edges.join(vw, "dst")
        .groupBy(F.col("src").alias("vertex"))
        .agg(F.sum("w").alias("volume"))
    )
