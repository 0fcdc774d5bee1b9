"""Benchmark decontamination — n-gram overlap of corpus documents against an
evaluation/benchmark set.

The standard pre-training hygiene step a 100 TB corpus pipeline needs next to
dedup: any document sharing a large fraction of a benchmark item's n-grams is
a leaked eval example and must be dropped before training. Semantically this
is one-sided containment — ``|doc ∩ bench| / |bench|`` — the same score the
reference computes pairwise (``standalone_algorithms.hpp:52-69`` intersection
counts), restricted to corpus×benchmark pairs and normalized by the benchmark
side only.

Scale shape (the reason this is its own operator and not a pipeline pass):
the benchmark side is ALWAYS small (eval sets are 10^3-10^6 items, a few MB
of n-gram hashes) while the corpus side is the 100 TB relation. So the join
is a **broadcast hash join against the corpus scan** — the corpus is never
shuffled; the only exchange in the plan carries the matched (doc, bench,
hash) rows, which are sparse by construction. A pinned plan test
(tests/test_decontam.py) asserts exactly that: BroadcastHashJoin, no
Exchange upstream of the corpus scan.

Composition: the benchmark n-gram relation is static per training run, so
the identical operator applies unchanged to a delta-store delivery or a
streaming micro-batch (probe only the new files); nothing here keys on
corpus-global state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def benchmark_ngrams(
    bench: DataFrame, id_col: str = "bench_id", ngrams_col: str = "ngram_hashes"
) -> tuple[DataFrame, DataFrame]:
    """Normalize a benchmark set for probing.

    ``bench`` carries one row per benchmark item with a (distinct) array of
    n-gram hashes. Returns ``(exploded, sizes)``:

    * exploded — (bench_id, h), one row per (item, n-gram); the broadcast
      probe relation.
    * sizes — (bench_id, bench_size); the containment denominator.
    """
    exploded = bench.select(
        F.col(id_col).alias("bench_id"),
        F.explode(F.array_distinct(F.col(ngrams_col))).alias("h"),
    )
    sizes = bench.select(
        F.col(id_col).alias("bench_id"),
        F.size(F.array_distinct(F.col(ngrams_col))).cast("long").alias("bench_size"),
    )
    return exploded, sizes


def contamination_overlap(
    doc_ngrams: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    ngrams_col: str = "ngram_hashes",
    bench_id_col: str = "bench_id",
    bench_ngrams_col: str = "ngram_hashes",
    min_overlap: int = 1,
) -> DataFrame:
    """(doc_id, bench_id, overlap, bench_size, containment) for every
    corpus×benchmark pair sharing ≥ ``min_overlap`` n-grams.

    ``containment = overlap / bench_size`` ∈ (0, 1]; 1.0 means every n-gram
    of the benchmark item appears in the document (verbatim leak). Both
    n-gram columns must be SETS (distinct arrays) — :func:`shingle_hashes`
    output qualifies — so the post-join count is exact without a distinct.

    The benchmark side is broadcast; the corpus side stays a straight scan →
    explode → map-side hash probe with no shuffle of corpus bytes. The only
    exchange aggregates the matched rows on (doc_id, bench_id), with
    map-side partial aggregation.
    """
    bx, bsz = benchmark_ngrams(bench, bench_id_col, bench_ngrams_col)
    dx = doc_ngrams.select(
        F.col(id_col).alias("doc_id"), F.explode(F.col(ngrams_col)).alias("h")
    )
    ov = (
        dx.join(F.broadcast(bx), "h")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").cast("long").alias("overlap"))
        .filter(F.col("overlap") >= min_overlap)
    )
    return ov.join(F.broadcast(bsz), "bench_id").select(
        "doc_id",
        "bench_id",
        "overlap",
        "bench_size",
        (F.col("overlap") / F.col("bench_size")).alias("containment"),
    )


def drop_contaminated(
    files: DataFrame, manifest: DataFrame, id_col: str = "id"
) -> DataFrame:
    """Corpus action: the training set — every row of ``files`` whose
    manifest row is not contaminated (mirrors representatives.py's kept-rows
    action for dedup). The flagged-id side is a filtered projection of the
    manifest (small by construction — leaks are rare), so it broadcasts and
    the corpus passes through as an unshuffled anti-join probe."""
    flagged = manifest.filter(F.col("contaminated")).select("doc_id")
    return files.join(
        F.broadcast(flagged), files[id_col] == flagged["doc_id"], "left_anti"
    )


def decontamination_manifest(
    doc_ids: DataFrame,
    overlaps: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document drop manifest: (doc_id, max_containment, contaminated)
    for EVERY document (docs with zero benchmark overlap get 0.0 / false).

    ``overlaps`` is :func:`contamination_overlap` output; ``threshold`` is
    the drop rule (max containment over all benchmark items ≥ threshold).
    The manifest is the actionable artifact — anti-join it against the
    corpus to produce the training set, mirroring the dedup pipeline's
    representatives manifest (operators/representatives.py).
    """
    per_doc = overlaps.groupBy("doc_id").agg(
        F.max("containment").alias("max_containment")
    )
    return (
        doc_ids.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("max_containment"), F.lit(0.0)).alias("max_containment"),
            (F.coalesce(F.col("max_containment"), F.lit(0.0)) >= threshold).alias(
                "contaminated"
            ),
        )
    )
