"""Edge-set normalization — reference operators N1-N5 (SURVEY.md §2.2).

Input convention: an edge DataFrame with columns ``src`` (long), ``dst``
(long) and optionally ``weight`` (double). This is the COO set of
``readMtxToCSR.hpp:27-29`` as a DataFrame; Spark's ``dropDuplicates`` replaces
``std::set`` dedup, a swap projection replaces ``invertDirection``
(``readMtxToCSR.cpp:116-132``), and a canonical ``src < dst`` filter replaces
the mirror-erasing loop of ``removeReverseEdges`` (``readMtxToCSR.cpp:133-147``).

All are narrow or single-shuffle transforms; none collect to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EDGE_COLS = ("src", "dst")


def _other_cols(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c not in _EDGE_COLS]


def invert_direction(edges: DataFrame) -> DataFrame:
    """N1: emit the reversed copy of every edge (dst, src, w...)."""
    return edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), *_other_cols(edges)
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """N1+N2: union of forward and reverse edges, exact-duplicate dedup
    (``main.cpp:108-109``). One shuffle (the dropDuplicates)."""
    return edges.unionByName(invert_direction(edges)).dropDuplicates(["src", "dst"])


def canonical_pairs(edges: DataFrame) -> DataFrame:
    """N3: keep one direction of each symmetric pair, canonicalized so that
    src < dst. Works on any edge set (not only symmetric ones): we *rewrite*
    each edge to (min, max) then dedup — equivalent to removeReverseEdges on a
    symmetrized graph, and a pure map + one shuffle."""
    others = _other_cols(edges)
    return (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            *others,
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def drop_self_loops(edges: DataFrame) -> DataFrame:
    """N4: remove src == dst edges (``readMtxToCSR.cpp:174``, ignoreSelf)."""
    return edges.filter(F.col("src") != F.col("dst"))


def dedup_edges(edges: DataFrame) -> DataFrame:
    """N5: exact-duplicate edge elimination (std::set insert semantics —
    first-inserted weight wins; we keep the min weight for determinism)."""
    others = _other_cols(edges)
    if not others:
        return edges.dropDuplicates(["src", "dst"])
    aggs = [F.min(c).alias(c) for c in others]
    return edges.groupBy("src", "dst").agg(*aggs)
