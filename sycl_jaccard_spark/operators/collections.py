"""Collection-level similarity — fork / mirror / vendored-copy detection.

A 10^12-file source-code corpus is not a flat bag of files: it is ~10^8
repositories, and wholesale duplication happens at REPOSITORY granularity
— forks, org-to-org mirrors, vendored third-party directories. The
file-level pipeline (``plans/pipeline.py``) finds the member pairs; what
it cannot answer directly is "which COLLECTIONS are near-copies of each
other" — the question a corpus curator asks before dropping whole forks
rather than file-by-file survivors. This module answers it with the same
exact-Jaccard primitive the reference computes per vertex pair
(``jaccard.cpp:272-311`` — neighbor-set intersection over CSR rows): the
"vertex" is a collection (repo / source), and its "neighbor set" is the
distinct union of its members' shingles.

Scale shape (100 TB):

* everything stays relational — a collection's element set is NEVER
  collected into an array column (a large repository's shingle union can
  run to 10^8 elements; no row can hold it). The membership relation
  (collection, elem) shards across partitions like any table, and scoring
  goes through :func:`~sycl_jaccard_spark.operators.pair_jaccard.
  jaccard_pairs_memberships` (sizes = one groupBy; intersections = a hash
  probe per shared element).
* candidate generation is the same inverted-index + document-frequency
  cap discipline as the file-level pipeline: an element present in more
  than ``max_df`` collections is boilerplate (license headers, build
  scaffolding, vocabulary words) and generates NO pairs — pair fan-out is
  bounded by Σ df² over rare elements only. Capped elements still count
  toward the exact sizes and intersections, so scores are exact; only
  candidate RECALL is governed by the cap, exactly like the file-level
  ``DF_CAP`` inverted index (``__spark_entry__._rare_shingle_scored``).
* for corpora where even the rare-element index is too dense, feed
  per-member MinHash signatures instead of raw shingles: collection
  Jaccard over the union of members' signature values approximates
  collection shingle Jaccard (union-closure of MinHash), with the
  membership relation shrunk by |doc|/num_perms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sycl_jaccard_spark.functions.jaccard import containment_from_counts
from sycl_jaccard_spark.functions.shingles import md5_long
from sycl_jaccard_spark.operators.components import connected_components
from sycl_jaccard_spark.operators.pair_jaccard import jaccard_pairs_memberships


def collection_memberships(
    members: DataFrame,
    group_col: str,
    elems_col: str,
) -> DataFrame:
    """DISTINCT (collection, elem) membership relation from per-member
    element arrays — the collection's set in relational form.

    ``members`` carries one row per member file with ``group_col`` (the
    collection key: repo, source, org/…) and ``elems_col`` an array column
    (shingle strings, shingle hashes, MinHash values — any element type).
    The distinct is the set-union across members: an element owned by many
    members of one collection counts once."""
    return (
        members.select(
            F.col(group_col).alias("collection"), F.explode(elems_col).alias("elem")
        )
        .dropDuplicates(["collection", "elem"])
    )


def collection_candidates(memberships: DataFrame, max_df: int) -> DataFrame:
    """(a, b) collection pairs sharing ≥1 element whose collection-level
    document frequency is ≤ ``max_df`` — the inverted-index pair generator
    at collection granularity.

    The df cap is the fan-out bound: without it, one element present in
    every fork of a popular repo would emit |forks|² pairs. With it, each
    rare element emits ≤ max_df·(max_df−1)/2 pairs, and the join that
    produces them groups per element — the standard skew-safe shape."""
    rare = (
        memberships.groupBy("elem")
        .agg(F.count(F.lit(1)).alias("cdf"))
        .filter(F.col("cdf") <= max_df)
        .select("elem")
    )
    mr = memberships.join(rare, "elem")
    return (
        mr.select(F.col("collection").alias("a"), "elem")
        .join(mr.select(F.col("collection").alias("b"), "elem"), "elem")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )


def collection_clusters(
    scored: DataFrame,
    threshold: float = 0.9,
    score_col: str = "jaccard",
    collections: DataFrame | None = None,
) -> DataFrame:
    """Fork GROUPS: connected components over collection pairs whose
    ``score_col`` ≥ ``threshold``, through the same CC machinery as the
    file pipeline (driver/distributed switch, large-star/small-star past
    2M edges — ``operators/components.py``). Transitivity is the point: a
    chain of pairwise-similar forks is one lineage even when its endpoints
    score below threshold.

    Returns (collection, rep) with ``rep`` = the lexicographically smallest
    member of the group — the deterministic representative a curator keeps
    (same min-rule the file pipeline and the reference's sorted std::set
    ordering use). CC is long-typed, so string keys ride through it as
    md5-60bit hashes; names are joined back and no hash surfaces.

    ``collections``: optional one-column DataFrame of ALL collection keys —
    collections with no qualifying edge then appear as singletons
    (rep = themselves)."""
    edges = scored.filter(F.col(score_col) >= threshold).select("a", "b")
    names = (
        edges.select(F.col("a").alias("collection"))
        .union(edges.select(F.col("b").alias("collection")))
        .distinct()
    )
    keyed = names.select(
        "collection", md5_long(F.col("collection").cast("string")).alias("_k")
    )
    e = (
        edges.join(
            keyed.select(F.col("collection").alias("a"), F.col("_k").alias("ka")), "a"
        )
        .join(keyed.select(F.col("collection").alias("b"), F.col("_k").alias("kb")), "b")
        .select(F.col("ka").alias("a"), F.col("kb").alias("b"))
        # CC's contract: callers pass a MATERIALIZED pair relation — it runs
        # several actions (count + collect or star rounds) and would re-run
        # the filter/key/join tree from scratch for each one otherwise
        .localCheckpoint(eager=True)
    )
    labels = connected_components(e)
    lab = (
        keyed.join(labels, keyed["_k"] == labels["node"])
        .select("collection", "label")
        # consumed twice (reps agg + output join)
        .localCheckpoint(eager=True)
    )
    reps = lab.groupBy("label").agg(F.min("collection").alias("rep"))
    out = lab.join(reps, "label").select("collection", "rep")
    if collections is not None:
        allc = collections.select(
            F.col(collections.columns[0]).alias("collection")
        ).distinct()
        out = allc.join(out, "collection", "left").select(
            "collection", F.coalesce("rep", F.col("collection")).alias("rep")
        )
    return out


def drop_fork_members(
    members: DataFrame, clusters: DataFrame, group_col: str
) -> DataFrame:
    """Curator action over fork groups: every member row of a group's rep
    collection is kept, every member of the group's OTHER collections is
    dropped — the collection-granularity analog of
    ``representatives.deduplicate_corpus``. Returns the members relation
    plus (rep, keep) as a MANIFEST: the caller filters on ``keep`` to
    enact, or persists the whole relation to audit what a drop would do
    (and to count the bytes it frees) before enacting. Collections absent
    from ``clusters`` are their own rep (keep = true)."""
    cl = clusters.withColumnRenamed("collection", group_col)
    return (
        members.join(cl, group_col, "left")
        .withColumn("rep", F.coalesce("rep", F.col(group_col)))
        .withColumn("keep", F.col(group_col) == F.col("rep"))
    )


def collection_minhash(
    signed: DataFrame,
    group_col: str,
    num_perms: int,
    sig_col: str = "sig",
) -> DataFrame:
    """Collection-level MinHash signatures from per-MEMBER signatures, by
    union closure: for any permutation h, min over A∪B equals
    min(min over A, min over B) (Broder, SEQUENCES'97 §3 — the min-wise
    property the file-level signer already relies on). So a collection's
    signature is ONE groupBy with ``num_perms`` ``min`` aggregates over its
    members' EXISTING signatures — no re-shingle, no re-sign, no explode,
    and no Python: the per-file Arrow signing cost is fully amortized and
    the lift to collection granularity is a JVM partial-aggregable shuffle
    of exactly one row per (collection) out of each map partition.

    This is the 10^8-collection scale path for candidate generation: band
    these signatures with the ordinary LSH machinery
    (``operators/lsh.band_hashes`` / ``candidate_pairs``) to get fork/mirror
    candidates WITHOUT touching the raw membership relation; reserve
    :func:`collection_pair_jaccard`'s exact relational scoring for the
    candidate survivors. Estimator caveat: band collision probability
    tracks the JACCARD of the union sets — for containment-style forks
    (small repo inside a big one) the symmetric J is low, so keep the exact
    containment scorer on the verify side.

    Returns (collection, ``sig_col``: array<long>[num_perms])."""
    aggs = [
        F.min(F.element_at(sig_col, i + 1)).alias(f"_m{i}") for i in range(num_perms)
    ]
    return (
        signed.groupBy(F.col(group_col).alias("collection"))
        .agg(*aggs)
        .select(
            "collection",
            F.array(*[F.col(f"_m{i}") for i in range(num_perms)]).alias(sig_col),
        )
    )


def collection_pair_jaccard(
    members: DataFrame,
    group_col: str,
    elems_col: str,
    max_df: int = 10,
    memberships: DataFrame | None = None,
) -> DataFrame:
    """Fork/mirror scorecard: exact Jaccard AND containment between every
    collection pair sharing a rare (cdf ≤ ``max_df``) element.

    Returns (a, b, inter, size_a, size_b, jaccard, containment). The two
    scores answer different curator questions: ``jaccard`` ≈ 1 flags full
    mirrors; ``containment`` (inter / min size) ≈ 1 with low jaccard flags
    a fork EMBEDDED in a larger repo — the collection-level analog of the
    file pipeline's substring pass accept rule
    (``plans/pipeline.py`` containment accept).

    The membership relation feeds FOUR consumers (df counts, the candidate
    self-join, sizes, intersections); pass a persisted/checkpointed
    ``memberships`` (from :func:`collection_memberships`) to compute the
    explode+distinct once — at corpus scale that relation is the dominant
    intermediate and should be a bucketed checkpoint, not a recompute."""
    mem = (
        memberships
        if memberships is not None
        else collection_memberships(members, group_col, elems_col)
    )
    pairs = collection_candidates(mem, max_df)
    scored = jaccard_pairs_memberships(mem, pairs, id_col="collection")
    return scored.withColumn(
        "containment",
        containment_from_counts(F.col("inter"), F.col("size_a"), F.col("size_b")),
    )
