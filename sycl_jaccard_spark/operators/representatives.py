"""Cluster representative selection + corpus deduplication — the consumer
step after clustering: "give me the deduped corpus and a manifest of what
was dropped and why".

The reference stops at pair scores (its output is the edge list,
``jaccard.cpp:811-819``); a training-data pipeline needs the corpus-level
action. Strategies:

* ``min_id``   — smallest id per cluster (deterministic, matches the CC
  label convention: the representative IS the cluster label);
* ``longest``  — longest content wins (ties → smallest id): near-dup
  clusters usually contain truncated/older variants, keep the fullest.

All JVM-side: one join + one rank window partitioned by cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def select_representatives(
    clusters: DataFrame,
    files: DataFrame,
    strategy: str = "longest",
    id_col: str = "id",
    content_col: str = "content",
) -> DataFrame:
    """(cluster, rep_id) — one representative per cluster.

    ``clusters`` is the pipeline output (id, cluster); ``files`` carries the
    content for the ``longest`` strategy."""
    if strategy == "min_id":
        return clusters.groupBy("cluster").agg(F.min("id").alias("rep_id"))
    if strategy != "longest":
        raise ValueError(f"unknown strategy {strategy!r}")
    lens = files.select(
        F.col(id_col).alias("id"), F.length(content_col).alias("_len")
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("_len"), F.asc("id"))
    return (
        clusters.join(lens, "id")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("cluster", F.col("id").alias("rep_id"))
    )


def deduplicate_corpus(
    files: DataFrame,
    clusters: DataFrame,
    strategy: str = "longest",
    id_col: str = "id",
    content_col: str = "content",
) -> tuple[DataFrame, DataFrame]:
    """Returns (kept_files, manifest).

    ``kept_files``: the input rows whose id is its cluster's representative —
    the deduplicated corpus. ``manifest``: (id, cluster, rep_id, kept) for
    EVERY input row — the audit trail a compliance/reproducibility review
    needs (which row was dropped in favor of which representative)."""
    reps = select_representatives(clusters, files, strategy, id_col, content_col)
    manifest = clusters.join(reps, "cluster").select(
        "id",
        "cluster",
        "rep_id",
        (F.col("id") == F.col("rep_id")).cast("int").alias("kept"),
    )
    kept = files.join(
        manifest.filter(F.col("kept") == 1).select(F.col("id").alias(id_col)),
        id_col,
    )
    return kept, manifest
