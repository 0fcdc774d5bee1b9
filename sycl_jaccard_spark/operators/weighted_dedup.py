"""IDF-weighted near-duplicate candidate generation — boilerplate-robust
dedup, the natural consumer of the CWS weighted MinHash.

Plain MinHash treats every shingle equally, so two files sharing a large
license header but different bodies look similar (the skew the bucket
cap/salt machinery exists to absorb). Weighting each shingle by corpus IDF
down-weights boilerplate BEFORE hashing: the weighted Jaccard
Σmin/Σmax ≈ body overlap, and header-only pairs stop colliding at all —
candidates get cheaper AND cleaner instead of merely bounded.

Shapes: IDF is one groupBy over the exploded shingle relation (the same
df-count the rare-shingle inverted index already computes); signatures are
one CWS Arrow pass; banding/bucketing reuses the unweighted machinery
verbatim (``band_hashes`` + ``candidate_pairs``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sycl_jaccard_spark.config import PipelineConfig
from sycl_jaccard_spark.functions.weighted_minhash import weighted_minhash_udf
from sycl_jaccard_spark.operators.lsh import band_hashes, candidate_pairs


def idf_weights(
    shingled: DataFrame,
    id_col: str = "id",
    hash_col: str = "shingle_hashes",
) -> DataFrame:
    """(elem, w) per distinct shingle hash: w = ln(1 + N/df), strictly
    positive and finite, large for rare shingles, ~ln(2)·(few) for
    boilerplate present in every file."""
    n_docs = shingled.select(id_col).distinct().count()
    df_counts = (
        shingled.select(F.col(id_col).alias("_id"), F.explode(hash_col).alias("elem"))
        .dropDuplicates(["_id", "elem"])
        .groupBy("elem")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return df_counts.select(
        "elem", F.log(F.lit(1.0) + F.lit(float(n_docs)) / F.col("df")).alias("w")
    )


def weighted_signatures(
    shingled: DataFrame,
    idf: DataFrame,
    num_perms: int = 128,
    seed: int = 42,
    id_col: str = "id",
    hash_col: str = "shingle_hashes",
) -> DataFrame:
    """(id, sig) CWS signatures over IDF-weighted shingles. The weight join
    re-collects (elems, weights) arrays in one groupBy (weights must pair
    elementwise with elems for the UDF); sort by elem for determinism."""
    exploded = (
        shingled.select(F.col(id_col).alias("id"), F.explode(hash_col).alias("elem"))
        .dropDuplicates(["id", "elem"])
        .join(idf, "elem")
    )
    paired = (
        exploded.groupBy("id")
        .agg(
            F.array_sort(F.collect_list(F.struct("elem", "w"))).alias("ew")
        )
        .select(
            "id",
            F.col("ew.elem").alias("elems"),
            F.col("ew.w").alias("weights"),
        )
    )
    sig = weighted_minhash_udf(num_perms, seed)
    return paired.select(
        "id", sig(F.col("elems"), F.col("weights")).alias("sig")
    ).localCheckpoint(eager=True)  # pandas-UDF column feeds banding's explode


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
