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
    weighted_jaccard_from_sums,
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
        return jaccard_pairs_memberships(elems, pairs, id_col="_id")
    raise ValueError(f"unknown impl {impl!r}")


def jaccard_pairs_memberships(
    memberships: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    elem_col: str = "elem",
) -> DataFrame:
    """Exact Jaccard scoring over an already-exploded DISTINCT membership
    relation (id, elem) instead of per-row set arrays — semantics identical
    to ``jaccard_pairs(impl="exploded")`` (which delegates here).

    This is the form that scales when a single set is too large to
    materialize as one array column: a collection-level set (the shingle
    union of a whole repository, ``operators/collections.py``) can run to
    10^8 elements, which no row can hold, while the relational form shards
    it across partitions like any other table. Rows must already be
    distinct per (id, elem) — duplicates would inflate both sizes and
    intersections."""
    elems = memberships.select(F.col(id_col).alias("_id"), F.col(elem_col).alias("elem"))
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


def jaccard_pairs_weighted(
    memberships: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    elem_col: str = "elem",
    weight_col: str = "w",
    with_counts: bool = False,
) -> DataFrame:
    """Weighted ``jaccard_list`` (A5 weighted — ``standalone_algorithms.hpp:
    109-124``, ``jaccard.cpp:254-256`` volume accumulation): score explicit
    (a, b) pairs with ``Jw = W∩ / (vol_a + vol_b − W∩)`` where ``vol(v) =
    Σ w(e)`` over v's distinct elements and ``W∩`` sums the weights of shared
    elements.

    ``memberships`` is the exploded weighted membership relation
    (id, elem, w) with DISTINCT (id, elem) rows — duplicates would be summed
    into both vol and W∩ (`.dropDuplicates([id, elem])` first if unsure);
    ``w`` is a per-ELEMENT weight (the same for every owner of the element —
    the reference's vertex-weight model, where ``v[j]`` weights neighbor
    vertex j). Returns (a, b, wi, vol_a, vol_b, jaccard).

    Shape mirrors the unweighted ``impl="exploded"`` path: W∩ via a hash
    probe per shared element (expand with a's elements, inner-join on
    (b, elem)), never |A|×|B|; volumes via one groupBy — all JVM-side.

    ``with_counts=True`` additionally emits the UNweighted intersection /
    set sizes (inter, size_a, size_b) from the same aggregations — the
    weighted pipeline's containment accept rule needs them, and they cost
    one extra count per existing groupBy, no extra shuffle.
    """
    m = memberships.select(
        F.col(id_col).alias("_id"), F.col(elem_col).alias("elem"), F.col(weight_col).alias("w")
    )
    vol = m.groupBy("_id").agg(
        F.sum("w").alias("vol"), F.count(F.lit(1)).alias("sz")
    )
    pa = pairs.select("a", "b")
    ea = m.select(F.col("_id").alias("a"), "elem", F.col("w").alias("wa"))
    eb = m.select(F.col("_id").alias("b"), "elem")
    wi = (
        pa.join(ea, "a")
        .join(eb, ["b", "elem"])
        .groupBy("a", "b")
        .agg(F.sum("wa").alias("wi"), F.count(F.lit(1)).alias("inter"))
    )
    va = vol.select(F.col("_id").alias("a"), F.col("vol").alias("vol_a"), F.col("sz").alias("size_a"))
    vb = vol.select(F.col("_id").alias("b"), F.col("vol").alias("vol_b"), F.col("sz").alias("size_b"))
    zero = F.lit(0).cast("long")
    # wi/vol_* keep the weight column's own sum type (long for integral
    # weights, double for float weights such as IDF) — casting to long would
    # truncate fractional sums and report components inconsistent with the
    # jaccard they imply (ADVICE r3).
    cols = [
        F.col("a"),
        F.col("b"),
        F.coalesce("wi", zero).alias("wi"),
        F.col("vol_a"),
        F.col("vol_b"),
        weighted_jaccard_from_sums(
            F.coalesce("wi", zero), F.col("vol_a"), F.col("vol_b")
        ).alias("jaccard"),
    ]
    if with_counts:
        cols[5:5] = [
            F.coalesce("inter", F.lit(0)).cast("long").alias("inter"),
            F.col("size_a").cast("long"),
            F.col("size_b").cast("long"),
        ]
    return (
        pa.join(wi, ["a", "b"], "left")
        .join(va, "a")
        .join(vb, "b")
        .select(*cols)
    )


def jaccard_pairs_weighted_arrays(
    items: DataFrame,
    weights: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    set_col: str = "set",
    with_counts: bool = False,
    memberships: DataFrame | None = None,
    volumes: DataFrame | None = None,
) -> DataFrame:
    """Array-attach implementation of the weighted ``jaccard_list`` — same
    results as :func:`jaccard_pairs_weighted` over
    ``explode(items) ⨝ weights``, different physical shape (the dual-impl
    discipline of the unweighted pair verify, and the weighted pipeline's
    verify hot path):

    * the exploded impl expands every pair with ALL of a's elements and hash-
      probes (b, elem) — Σ_pairs |A| join rows;
    * this impl attaches both (sorted, distinct) element arrays to the pair,
      intersects them in whole-stage codegen (``array_intersect``), and
      explodes ONLY the intersection before the weight join — Σ_pairs |A∩B|
      rows, typically an order of magnitude fewer on near-threshold
      candidates, and zero Python either way.

    ``weights`` is the per-element weight relation (elem, w) — e.g.
    ``idf_weights`` output — and MUST cover every element of ``items``: the
    equivalence above is exact only for a total relation. With missing
    elements the two impls diverge in a documented way — weight sums agree
    (missing elements contribute 0 to W∩ and vol in both), but the
    ``with_counts`` columns differ: this impl counts set cardinalities from
    the arrays themselves, while the exploded impl's inner weight join
    removes uncovered elements BEFORE counting. The pipeline trains IDF on
    the corpus it verifies, so its relation is total; pass a
    ``default_weight`` through ``weighted_memberships`` for the streaming
    case. Volumes are one explode+join+groupBy over ``items`` — independent
    of the pair count — unless ``volumes=`` (a precomputed (id, vol)
    relation, e.g. the signature stage's free array-aggregate) or
    ``memberships=`` short-circuits them. Float note: an array aggregate
    sums elem-sorted weights left-to-right while groupBy(sum) is
    order-free, so ``vol_*`` can differ in the last ulp between the
    variants (dual-impl-tested at 1e-12 rel). Returns the same column set
    as :func:`jaccard_pairs_weighted`.
    """
    w = weights.select("elem", "w")
    sets = items.select(
        F.col(id_col).alias("_id"), F.array_distinct(set_col).alias("els")
    )
    if volumes is not None:
        # the signature stage computed vol = Σw as a free array aggregate
        # (weighted_signatures with_volume=True) — no explode, no groupBy,
        # just a projection of an already-materialized stage
        vol = volumes.select(F.col(id_col).alias("_id"), "vol")
    elif memberships is None:
        vol = (
            sets.select("_id", F.explode("els").alias("elem"))
            .join(w, "elem")
            .groupBy("_id")
            .agg(F.sum("w").alias("vol"))
        )
    else:
        # the caller already materialized the distinct (id, elem, w)
        # relation (e.g. the pipeline's memberships stage): volumes become a
        # plain groupBy over it — no second explode of the shingle relation
        # per weighted run (VERDICT r4 #3)
        vol = (
            memberships.select(F.col(id_col).alias("_id"), "w")
            .groupBy("_id")
            .agg(F.sum("w").alias("vol"))
        )
    a = sets.select(F.col("_id").alias("a"), F.col("els").alias("set_a"))
    b = sets.select(F.col("_id").alias("b"), F.col("els").alias("set_b"))
    attached = (
        pairs.select("a", "b")
        .join(a, "a")
        .join(b, "b")
        .select(
            "a",
            "b",
            F.array_intersect("set_a", "set_b").alias("ie"),
            F.size("set_a").cast("long").alias("size_a"),
            F.size("set_b").cast("long").alias("size_b"),
        )
    )
    # ONE pass: explode_outer keeps empty-intersection pairs (null elem row),
    # the left weight join leaves their w null, and sum() ignores nulls
    scored = (
        attached.select(
            "a", "b", "size_a", "size_b",
            F.size("ie").cast("long").alias("inter"),
            F.explode_outer("ie").alias("elem"),
        )
        .join(w, "elem", "left")
        .groupBy("a", "b", "size_a", "size_b", "inter")
        .agg(F.sum("w").alias("wi"))
    )
    va = vol.select(F.col("_id").alias("a"), F.col("vol").alias("vol_a"))
    vb = vol.select(F.col("_id").alias("b"), F.col("vol").alias("vol_b"))
    zero = F.lit(0).cast("long")
    cols = [
        F.col("a"),
        F.col("b"),
        F.coalesce("wi", zero).alias("wi"),
        F.col("vol_a"),
        F.col("vol_b"),
        weighted_jaccard_from_sums(
            F.coalesce("wi", zero), F.col("vol_a"), F.col("vol_b")
        ).alias("jaccard"),
    ]
    if with_counts:
        cols[5:5] = [F.col("inter"), F.col("size_a"), F.col("size_b")]
    return scored.join(va, "a").join(vb, "b").select(*cols)
