"""Benchmark decontamination (operators/decontaminate.py).

Functional: planted-leak recall (a doc containing a benchmark snippet
verbatim scores containment 1.0; unrelated docs score 0), manifest
completeness, threshold behavior. Plan: the corpus side must reach the join
as a straight scan→explode with the BENCHMARK side broadcast — the corpus is
never shuffled before the probe (the 100 TB property this operator exists
for).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sycl_jaccard_spark.functions.shingles import shingle_hashes, shingles, tokens
from sycl_jaccard_spark.operators.decontaminate import (
    benchmark_ngrams,
    contamination_overlap,
    decontamination_manifest,
    drop_contaminated,
)

K = 3


def _ngram_df(spark, rows, id_col="doc_id"):
    df = spark.createDataFrame(rows, f"{id_col} long, text string")
    return df.select(
        id_col,
        shingle_hashes(shingles(tokens(F.col("text")), K)).alias("ngram_hashes"),
    )


WORDS = [f"w{i}" for i in range(40)]
SNIPPET = " ".join(WORDS[10:20])  # 10 tokens -> 8 distinct 3-gram shingles


def _corpus(spark):
    return _ngram_df(
        spark,
        [
            # doc 1: contains the snippet verbatim inside a larger text
            (1, " ".join(WORDS[:30])),
            # doc 2: half the snippet (tokens 10..14) -> partial containment
            (2, " ".join(WORDS[10:15] + ["x1", "x2", "x3", "x4", "x5"])),
            # doc 3: disjoint vocabulary -> zero overlap
            (3, " ".join(f"z{i}" for i in range(20))),
        ],
    )


def _bench(spark):
    return _ngram_df(spark, [(100, SNIPPET)], id_col="bench_id")


def test_planted_leak_scores_containment_one(spark):
    got = {
        (r.doc_id, r.bench_id): r
        for r in contamination_overlap(_corpus(spark), _bench(spark)).collect()
    }
    assert set(got) == {(1, 100), (2, 100)}  # doc 3 never appears
    full = got[(1, 100)]
    assert full.bench_size == 8
    assert full.overlap == 8 and full.containment == 1.0
    part = got[(2, 100)]
    # tokens 10..14 inside doc 2 yield 3-grams (10,11,12),(11,12,13),(12,13,14)
    assert part.overlap == 3 and part.containment == 3 / 8


def test_min_overlap_filters_weak_hits(spark):
    got = contamination_overlap(_corpus(spark), _bench(spark), min_overlap=4).collect()
    assert {(r.doc_id, r.bench_id) for r in got} == {(1, 100)}


def test_manifest_covers_every_doc_and_flags_by_threshold(spark):
    corpus = _corpus(spark)
    overlaps = contamination_overlap(corpus, _bench(spark))
    docs = corpus.select("doc_id")
    man = {
        r.doc_id: r
        for r in decontamination_manifest(docs, overlaps, threshold=0.5).collect()
    }
    assert set(man) == {1, 2, 3}
    assert man[1].contaminated and man[1].max_containment == 1.0
    assert not man[2].contaminated and man[2].max_containment == 3 / 8
    assert not man[3].contaminated and man[3].max_containment == 0.0


def test_benchmark_ngrams_dedups_and_sizes(spark):
    bench = spark.createDataFrame(
        [(7, [11, 11, 12])], "bench_id long, ngram_hashes array<long>"
    )
    exploded, sizes = benchmark_ngrams(bench)
    assert sorted((r.bench_id, r.h) for r in exploded.collect()) == [(7, 11), (7, 12)]
    assert sizes.collect()[0].bench_size == 2


def test_decontam_plan_broadcasts_bench_never_shuffles_corpus(spark):
    plan = (
        contamination_overlap(_corpus(spark), _bench(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    # the overlap count is the ONLY hash exchange (post-join partial agg);
    # the corpus explode must feed the join probe directly, unshuffled
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_run_decontam_cli(spark, tmp_path):
    from jobs.run_decontam import main

    pairs_out = str(tmp_path / "pairs")
    man_out = str(tmp_path / "man")
    rc = main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--input-kind", "documents",
            "--bench", "/root/testdata/sf0.001/documents.parquet",
            "--bench-kind", "documents",
            "--pairs-out", pairs_out,
            "--manifest-out", man_out,
            "--min-overlap", "3",
        ]
    )
    assert rc == 0
    pairs = spark.read.parquet(pairs_out)
    assert set(pairs.columns) == {
        "doc_id", "bench_id", "overlap", "bench_size", "containment"
    }
    # corpus == benchmark: every doc is its own verbatim leak
    self_rows = pairs.filter(F.col("doc_id") == F.col("bench_id"))
    assert self_rows.count() == 500
    assert self_rows.filter(F.col("containment") < 1.0).count() == 0
    man = spark.read.parquet(man_out)
    assert man.count() == 500
    assert man.filter(~F.col("contaminated")).count() == 0


def test_drop_contaminated_action_keeps_clean_rows_unshuffled(spark):
    corpus = _corpus(spark)
    overlaps = contamination_overlap(corpus, _bench(spark))
    manifest = decontamination_manifest(corpus.select("doc_id"), overlaps, threshold=0.5)
    files = spark.createDataFrame(
        [(1, "leaked"), (2, "partial"), (3, "clean")], "id long, content string"
    )
    kept = drop_contaminated(files, manifest)
    assert {r.id for r in kept.collect()} == {2, 3}
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_training_set_succession_and_reasons(spark):
    """training_set composes decontaminate-then-dedup in the hygiene-correct
    order: a cluster whose LONGEST member is a leak keeps its best clean
    member (representative succession), reasons are per-row, and the keep
    set equals the explicit composition (dedup over the decontaminated
    survivors)."""
    from sycl_jaccard_spark.operators.representatives import (
        deduplicate_corpus,
        training_set,
    )

    # cluster 1: ids 1,2,3 (content lengths 30, 20, 10; id 1 is the leak)
    # cluster 4: ids 4,5 — all contaminated (the whole cluster drops)
    # cluster 6: id 6 singleton, clean
    files = spark.createDataFrame(
        [(1, "x" * 30), (2, "y" * 20), (3, "z" * 10),
         (4, "a" * 9), (5, "b" * 8), (6, "c" * 7)],
        "id long, content string",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)],
        "id long, cluster long",
    )
    contam = spark.createDataFrame(
        [(1, 1.0, True), (2, 0.2, False), (3, 0.0, False),
         (4, 0.9, True), (5, 1.0, True), (6, 0.0, False)],
        "doc_id long, max_containment double, contaminated boolean",
    )
    kept, manifest = training_set(files, clusters, contam)
    assert {r.id for r in kept.collect()} == {2, 6}
    m = {r.id: r for r in manifest.collect()}
    assert set(m) == {1, 2, 3, 4, 5, 6}
    # succession: the leak (longest) is dropped, the next-longest clean
    # member represents the cluster
    assert m[2].keep and m[2].rep_id == 2 and m[2].drop_reason is None
    assert not m[1].keep and m[1].drop_reason == "contaminated"
    assert m[1].rep_id is None and m[1].max_containment == 1.0
    assert not m[3].keep and m[3].drop_reason == "duplicate" and m[3].rep_id == 2
    # all-contaminated cluster: every row drops as contaminated, rep NULL
    for i in (4, 5):
        assert not m[i].keep and m[i].drop_reason == "contaminated"
        assert m[i].rep_id is None
    assert m[6].keep and m[6].rep_id == 6 and m[6].drop_reason is None

    # equivalence: keep set == deduplicate_corpus over the decontaminated
    # survivors (the explicit two-step composition)
    clean = files.join(
        contam.filter("contaminated").select(F.col("doc_id").alias("id")),
        "id", "left_anti",
    )
    clean_clusters = clusters.join(clean.select("id"), "id", "left_semi")
    kept2, _ = deduplicate_corpus(clean, clean_clusters)
    assert {r.id for r in kept.collect()} == {r.id for r in kept2.collect()}


def test_quality_gate_column_semantics(spark):
    """QualityGate.low_quality: each criterion fires independently; empty
    docs fail min_tokens; a doc passing every enabled criterion passes."""
    from sycl_jaccard_spark.operators.representatives import QualityGate

    gate = QualityGate(min_tokens=3, max_avg_tok_len=5.0, min_distinct_ratio=0.5)
    df = spark.createDataFrame(
        [
            (1, ""),                         # empty -> min_tokens
            (2, "aa bb"),                    # 2 tokens -> min_tokens
            (3, "aaaaaaaa bbbbbbbb cccccccc"),  # avg len 8 -> max_avg_tok_len
            (4, "aa aa aa aa aa bb"),        # distinct 2/6 -> min_distinct_ratio
            (5, "aa bb cc dd"),              # passes all
        ],
        "id long, content string",
    )
    got = {
        r.id: r.lowq
        for r in df.select(
            "id", gate.low_quality(F.col("content")).alias("lowq")
        ).collect()
    }
    assert got == {1: True, 2: True, 3: True, 4: True, 5: False}
    # disabled criteria never fire; min_tokens=0 admits the empty doc
    lax = QualityGate(min_tokens=0)
    got2 = {
        r.id: r.lowq
        for r in df.select(
            "id", lax.low_quality(F.col("content")).alias("lowq")
        ).collect()
    }
    assert got2 == {i: False for i in range(1, 6)}


def test_training_set_quality_gate_precedence_and_succession(spark):
    """training_set with a QualityGate: contaminated beats low_quality in
    drop_reason; a cluster whose longest member is junk falls to its best
    clean member; keep set equals the explicit three-step composition."""
    from sycl_jaccard_spark.operators.representatives import (
        QualityGate,
        deduplicate_corpus,
        training_set,
    )

    # cluster 1: id 1 longest but repetitive junk, id 2 clean, id 3 short dup
    # cluster 4: id 4 leak AND junk (precedence check), id 5 clean
    # cluster 6: id 6 singleton junk (cluster drops entirely, rep NULL)
    files = spark.createDataFrame(
        [
            (1, "xx " * 40),                                      # junk: dr 1/40
            (2, " ".join(f"t{i}" for i in range(30))),            # clean, 30 toks
            (3, " ".join(f"t{i}" for i in range(10))),            # clean, shorter
            (4, "yy " * 50),                                      # junk + leak
            (5, " ".join(f"u{i}" for i in range(20))),            # clean
            (6, "zz " * 30),                                      # junk singleton
        ],
        "id long, content string",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)],
        "id long, cluster long",
    )
    contam = spark.createDataFrame(
        [(1, 0.0, False), (2, 0.1, False), (3, 0.0, False),
         (4, 1.0, True), (5, 0.0, False), (6, 0.2, False)],
        "doc_id long, max_containment double, contaminated boolean",
    )
    gate = QualityGate(min_tokens=5, min_distinct_ratio=0.5)
    kept, manifest = training_set(files, clusters, contam, quality=gate)
    assert {r.id for r in kept.collect()} == {2, 5}
    m = {r.id: r for r in manifest.collect()}
    # precedence: id 4 is both a leak and junk -> 'contaminated'
    assert m[4].drop_reason == "contaminated" and m[4].rep_id is None
    # succession past the junk longest member: id 2 represents cluster 1
    assert m[1].drop_reason == "low_quality" and m[1].rep_id is None
    assert m[2].keep and m[2].rep_id == 2 and m[2].drop_reason is None
    assert m[3].drop_reason == "duplicate" and m[3].rep_id == 2
    assert m[5].keep and m[5].rep_id == 5
    # all-junk cluster: dropped as low_quality, no representative
    assert m[6].drop_reason == "low_quality" and m[6].rep_id is None
    assert not m[6].keep

    # equivalence with the explicit composition: filter leaks, filter junk,
    # then dedup the survivors
    clean = files.join(
        contam.filter("contaminated").select(F.col("doc_id").alias("id")),
        "id", "left_anti",
    ).filter(~gate.low_quality(F.col("content")))
    clean_clusters = clusters.join(clean.select("id"), "id", "left_semi")
    kept2, _ = deduplicate_corpus(clean, clean_clusters)
    assert {r.id for r in kept.collect()} == {r.id for r in kept2.collect()}


def test_quality_gate_min_tokens_none_disables(spark):
    """min_tokens=None disables the length criterion (docstring contract;
    review regression: it used to raise TypeError)."""
    from sycl_jaccard_spark.operators.representatives import QualityGate

    gate = QualityGate(min_tokens=None, max_avg_tok_len=5.0)
    df = spark.createDataFrame(
        [(1, ""), (2, "aa"), (3, "aaaaaaaaaa bbbbbbbbbb")],
        "id long, content string",
    )
    got = {
        r.id: r.lowq
        for r in df.select(
            "id", gate.low_quality(F.col("content")).alias("lowq")
        ).collect()
    }
    # empty/short docs pass (no length criterion); long-token doc fails
    assert got == {1: False, 2: False, 3: True}
    # all-None gate flags nothing
    off = QualityGate(min_tokens=None)
    got2 = {
        r.id: r.lowq
        for r in df.select(
            "id", off.low_quality(F.col("content")).alias("lowq")
        ).collect()
    }
    assert got2 == {1: False, 2: False, 3: False}
