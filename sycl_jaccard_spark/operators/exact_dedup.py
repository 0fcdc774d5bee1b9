"""Exact-duplicate detection by content hash — N5 analog at file granularity.

The reference dedups edges via std::set insertion (``readMtxToCSR.cpp:112``);
here identical file contents collapse to one representative before any
approximate pass runs (they would otherwise flood LSH buckets). sha256 is the
per-row integrity invariant the north rule mandates end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_sha256(df: DataFrame, content_col: str = "content") -> DataFrame:
    return df.withColumn("sha256", F.sha2(F.col(content_col), 256))


def exact_dup_groups(df: DataFrame, id_col: str = "id", content_col: str = "content") -> DataFrame:
    """(sha256, n_docs, rep_id, members) for every content appearing >1 time.
    rep_id = min id (deterministic representative)."""
    return (
        with_sha256(df, content_col)
        .groupBy("sha256")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("rep_id"),
            F.array_sort(F.collect_list(id_col)).alias("members"),
        )
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, id_col: str = "id", content_col: str = "content"):
    """Returns (uniques, exact_pairs):

    * uniques — one representative row (min id) per distinct content; only
      these flow into the approximate pipeline (candidate space shrinks, the
      scale win at 100 TB where boilerplate repeats millions of times).
    * exact_pairs — (a, b) with a = representative, b = duplicate, jaccard=1.0
      by definition; fed straight into clustering.
    """
    hashed = with_sha256(df, content_col)
    reps = hashed.groupBy("sha256").agg(F.min(id_col).alias("rep_id"))
    uniques = (
        hashed.join(reps, "sha256")
        .filter(F.col(id_col) == F.col("rep_id"))
        .drop("rep_id")
    )
    # exact_pairs needs only (id, sha256) — derive it from a LAZILY
    # checkpointed metadata projection instead of the full hashed scan
    # (guide §8: decide on small rows): each evaluation of the r5 shape
    # re-scanned and re-hashed every content byte TWICE (probe + reps
    # subtrees), and the pipeline evaluates exact_pairs once per consumer
    # (pair_graph, verified_pairs). Lazy checkpoint: callers that never
    # evaluate exact_pairs (the delta ingest discards it) pay nothing.
    meta = hashed.select(id_col, "sha256").localCheckpoint(eager=False)
    reps_m = meta.groupBy("sha256").agg(F.min(id_col).alias("rep_id"))
    exact_pairs = (
        meta.join(reps_m, "sha256")
        .filter(F.col(id_col) != F.col("rep_id"))
        .select(
            F.col("rep_id").alias("a"),
            F.col(id_col).alias("b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return uniques, exact_pairs
