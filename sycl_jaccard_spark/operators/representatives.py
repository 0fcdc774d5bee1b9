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

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sycl_jaccard_spark.functions import textstats


@dataclass(frozen=True)
class QualityGate:
    """Thresholds for the heuristic quality filter of :func:`training_set`.

    Every statistic is an exact-integer pair divided once
    (:func:`~sycl_jaccard_spark.functions.textstats.quality_stats`), so the
    comparisons reproduce bit-for-bit in a SQL oracle. ``None`` disables a
    criterion; a document fails the gate when ANY enabled criterion fails:

    * ``min_tokens`` — fewer than this many whitespace tokens (empty docs
      fail whenever ``min_tokens > 0``);
    * ``max_avg_tok_len`` — mean token length above this (minified /
      binary-ish blobs; evaluated only for non-empty docs);
    * ``min_distinct_ratio`` — distinct/total token ratio below this
      (boilerplate repetition; evaluated only for non-empty docs).
    """

    min_tokens: int | None = 1
    max_avg_tok_len: float | None = None
    min_distinct_ratio: float | None = None

    def low_quality(self, text: Column) -> Column:
        """Boolean column: does ``text`` FAIL the gate? Pure JVM expression
        — no join, no shuffle; evaluates inline in the files scan."""
        st = textstats.quality_stats(text)
        n = st["n_tokens"]
        cond = F.lit(False)
        if self.min_tokens is not None:
            cond = cond | (n < F.lit(int(self.min_tokens)))
        if self.max_avg_tok_len is not None:
            cond = cond | (
                (n > 0) & (st["avg_tok_len"] > F.lit(float(self.max_avg_tok_len)))
            )
        if self.min_distinct_ratio is not None:
            cond = cond | (
                (n > 0)
                & (st["distinct_ratio"] < F.lit(float(self.min_distinct_ratio)))
            )
        return cond


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


def training_set(
    files: DataFrame,
    clusters: DataFrame,
    contam_manifest: DataFrame,
    strategy: str = "longest",
    quality: QualityGate | None = None,
    id_col: str = "id",
    content_col: str = "content",
) -> tuple[DataFrame, DataFrame]:
    """The full corpus action an LLM-data pipeline runs before training:
    drop benchmark leaks, low-quality documents AND near/exact duplicates in
    ONE manifest, composed in the hygiene-correct order — decontaminate
    first, quality-filter second, then pick each cluster's representative
    among the SURVIVORS. A cluster whose best member is a leak (or junk)
    keeps its best clean member (representative succession) instead of
    losing the whole cluster; dropping order the other way around would
    silently discard such clusters.

    ``contam_manifest`` is the (doc_id, max_containment, contaminated)
    relation from :func:`~sycl_jaccard_spark.operators.decontaminate.
    decontamination_manifest` or ``DeltaDedup.contamination_manifest``.
    ``quality`` (optional) applies a :class:`QualityGate` — a pure column
    predicate on ``content_col``, no extra shuffle on the files side.

    Returns ``(training_files, manifest)``. ``manifest`` has one row per
    clustered file: (id, cluster, rep_id, max_containment, keep,
    drop_reason) with ``drop_reason`` ∈ (NULL, 'contaminated',
    'low_quality', 'duplicate') — precedence in that order — and ``rep_id``
    NULL for contaminated/low-quality rows (they never enter representative
    selection). The contaminated set is leak-sized, so its anti-joins
    broadcast; the low-quality set can be corpus-scale, so its cluster-side
    exclusion is a plain id-keyed anti-join instead.
    """
    contam = contam_manifest.select(
        F.col("doc_id").alias("id"), "max_containment", "contaminated"
    )
    flagged = contam.filter("contaminated").select("id")
    clean = files.join(
        F.broadcast(flagged.withColumnRenamed("id", id_col)), id_col, "left_anti"
    )
    clean_clusters = clusters.join(F.broadcast(flagged), "id", "left_anti")
    if quality is not None:
        lowq = quality.low_quality(F.col(content_col))
        qual = files.select(F.col(id_col).alias("id"), lowq.alias("_lowq"))
        clean = clean.filter(~quality.low_quality(F.col(content_col)))
        clean_clusters = clean_clusters.join(
            qual.filter("_lowq").select("id"), "id", "left_anti"
        )
    kept, dd = deduplicate_corpus(clean, clean_clusters, strategy, id_col, content_col)
    base = clusters.join(contam, "id", "left")
    if quality is not None:
        base = base.join(qual, "id", "left")
    else:
        base = base.withColumn("_lowq", F.lit(False))
    manifest = (
        base.join(dd.select("id", "rep_id", "kept"), "id", "left")
        .select(
            "id",
            "cluster",
            "rep_id",
            F.coalesce("max_containment", F.lit(0.0)).alias("max_containment"),
            F.coalesce(F.col("kept") == 1, F.lit(False)).alias("keep"),
            F.when(F.coalesce("contaminated", F.lit(False)), F.lit("contaminated"))
            .when(F.coalesce("_lowq", F.lit(False)), F.lit("low_quality"))
            .when(F.col("kept") == 0, F.lit("duplicate"))
            .alias("drop_reason"),
        )
    )
    return kept, manifest
