"""IDF-weighted near-duplicate candidate generation — boilerplate-robust
dedup, the natural consumer of the CWS weighted MinHash.

Plain MinHash treats every shingle equally, so two files sharing a large
license header but different bodies look similar (the skew the bucket
cap/salt machinery exists to absorb). Weighting each shingle by corpus IDF
down-weights boilerplate BEFORE hashing: the weighted Jaccard
Σmin/Σmax ≈ body overlap, and header-only pairs stop colliding at all —
candidates get cheaper AND cleaner instead of merely bounded.

This is the approximate half of the reference's weighted family
(``standalone_algorithms.hpp:109-124``, ``jaccard.cpp:254-256`` vertex-weight
volume accumulation); the exact half is ``jaccard_pairs_weighted``. Both are
wired into ``DedupPipeline`` via ``PipelineConfig(candidate_weights="idf")``.

Shapes: IDF is one groupBy over the exploded shingle relation (the same
df-count the rare-shingle inverted index already computes); signatures are
one CWS Arrow pass; banding/bucketing reuses the unweighted machinery
verbatim (``band_hashes`` + ``candidate_pairs``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sycl_jaccard_spark.config import PipelineConfig
from sycl_jaccard_spark.functions.weighted_minhash import (
    weighted_minhash_simhash_udf,
    weighted_minhash_udf,
)
from sycl_jaccard_spark.operators.lsh import band_hashes, candidate_pairs


def idf_weights(
    shingled: DataFrame,
    id_col: str = "id",
    hash_col: str = "shingle_hashes",
    n_docs: int | None = None,
) -> DataFrame:
    """(elem, df, w) per distinct shingle hash: w = ln(1 + N/df), strictly
    positive and finite, large for rare shingles, ~ln(2) for boilerplate
    present in every file.

    ``n_docs``: pass the already-known corpus size (e.g. a pipeline stage's
    row count) to skip the counting job; defaults to ``shingled.count()`` —
    ids are unique by contract upstream, so no ``distinct()`` (a redundant
    full shuffle at 10^12 rows — ADVICE r3/VERDICT #6)."""
    if n_docs is None:
        n_docs = shingled.count()
    df_counts = (
        shingled.select(F.col(id_col).alias("_id"), F.explode(hash_col).alias("elem"))
        .dropDuplicates(["_id", "elem"])
        .groupBy("elem")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return df_counts.select(
        "elem",
        "df",
        F.log(F.lit(1.0) + F.lit(float(n_docs)) / F.col("df")).alias("w"),
    )


def weighted_memberships(
    shingled: DataFrame,
    idf: DataFrame,
    id_col: str = "id",
    hash_col: str = "shingle_hashes",
    default_weight: float | None = None,
) -> DataFrame:
    """Distinct (id, elem, w) weighted membership relation — the shared input
    of the CWS signature stage and the exact weighted verify
    (``jaccard_pairs_weighted``).

    ``default_weight``: weight for elements ABSENT from ``idf``. The batch
    pipeline trains IDF on the same corpus it signs, so the relation is total
    and the default inner join is right; a STREAMING consumer signing new
    files against a static IDF snapshot must pass one (unseen shingles are by
    definition rare — use a max-rarity weight) or novel-content files would
    silently lose those elements (and fully-novel files would produce NO
    membership rows at all)."""
    exploded = shingled.select(
        F.col(id_col).alias("id"), F.explode(hash_col).alias("elem")
    ).dropDuplicates(["id", "elem"])
    if default_weight is None:
        return exploded.join(idf.select("elem", "w"), "elem")
    return exploded.join(idf.select("elem", "w"), "elem", "left").withColumn(
        "w", F.coalesce("w", F.lit(float(default_weight)))
    )


def weighted_signatures(
    shingled: DataFrame,
    idf: DataFrame,
    num_perms: int = 128,
    seed: int = 42,
    id_col: str = "id",
    hash_col: str = "shingle_hashes",
    materialize: bool = True,
    with_simhash: bool = False,
    default_weight: float | None = None,
    memberships: DataFrame | None = None,
    with_volume: bool = False,
) -> DataFrame:
    """(id, sig[, sim]) CWS signatures over IDF-weighted shingles. The weight
    join re-collects (elems, weights) arrays in one groupBy (weights must
    pair elementwise with elems for the UDF); sort by elem for determinism.
    ``default_weight`` is forwarded to :func:`weighted_memberships` (needed
    when signing content the IDF snapshot has never seen).

    ``with_simhash=True`` additionally emits the (unweighted) SimHash
    signature from the SAME fused Arrow pass — one JVM↔Python round-trip for
    both, the weighted twin of the unweighted pipeline's fused UDF.

    ``materialize=False`` skips the eager localCheckpoint — pass it when the
    caller materializes the result itself (e.g. a pipeline stage write); the
    checkpoint is otherwise REQUIRED before banding's explode (a pandas-UDF
    column cannot feed a generator).

    ``memberships``: pass an already-materialized
    :func:`weighted_memberships` relation to skip re-deriving it.

    ``with_volume=True`` additionally emits ``vol = Σ w`` per doc as a free
    JVM ``aggregate`` over the weight array this stage already built — the
    exact weighted verify consumes it (``jaccard_pairs_weighted_arrays
    volumes=``), so a weighted run explodes the shingle relation ONCE
    (VERDICT r4 #3; materializing the full membership relation instead was
    measured SLOWER — 0.7 GB of localCheckpoint memory pressure at 100k,
    BENCH/RECALL.md)."""
    if memberships is None:
        memberships = weighted_memberships(shingled, idf, id_col, hash_col, default_weight)
    paired = (
        memberships
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("elem", "w"))).alias("ew"))
        .select(
            "id",
            F.col("ew.elem").alias("elems"),
            F.col("ew.w").alias("weights"),
        )
    )
    # vol rides INSIDE the Arrow UDF (vol_batch): a JVM-side F.aggregate
    # column next to the UDF measured +20-45% on the stage — the weight
    # arrays would be shipped to Python AND re-consumed JVM-side
    if with_simhash:
        fused = weighted_minhash_simhash_udf(num_perms, seed, with_volume=with_volume)
        cols = ["id", F.col("ms.sig").alias("sig"), F.col("ms.sim").alias("sim")] + (
            [F.col("ms.vol").alias("vol")] if with_volume else []
        )
        out = paired.select(
            "id", fused(F.col("elems"), F.col("weights")).alias("ms")
        ).select(*cols)
    elif with_volume:
        sig = weighted_minhash_udf(num_perms, seed, with_volume=True)
        out = paired.select(
            "id", sig(F.col("elems"), F.col("weights")).alias("ms")
        ).select("id", F.col("ms.sig").alias("sig"), F.col("ms.vol").alias("vol"))
    else:
        sig = weighted_minhash_udf(num_perms, seed)
        out = paired.select("id", sig(F.col("elems"), F.col("weights")).alias("sig"))
    return out.localCheckpoint(eager=True) if materialize else out


def idf_weighted_candidates(
    shingled: DataFrame,
    cfg: PipelineConfig | None = None,
    seed: int = 42,
    id_col: str = "id",
    hash_col: str = "shingle_hashes",
) -> DataFrame:
    """End-to-end boilerplate-robust candidate pairs: IDF → CWS signatures →
    the SAME band/bucket/skew machinery as the unweighted path."""
    cfg = cfg or PipelineConfig()
    idf = idf_weights(shingled, id_col, hash_col)
    signed = weighted_signatures(shingled, idf, cfg.num_perms, seed, id_col, hash_col)
    banded = band_hashes(signed, cfg, "id")
    return candidate_pairs(banded, cfg, "id", skew_mode=cfg.skew_mode)
