"""Physical-plan regression tests — pin the plan SHAPES the 100 TB design
depends on, not just the results. Each assertion is a property that silently
regressing would cost orders of magnitude at scale:

* column pruning / predicate pushdown reach the parquet FileScan
  (a scan reading `text` for a doc_id projection re-reads the corpus);
* the LSH bucket cap is a WindowGroupLimit pushdown (per-partition top-K
  before the shuffle), not a full sort;
* graph/verify hot paths are pure JVM (no Python eval of any kind);
* the MinHash stage is Arrow-vectorized (ArrowEvalPython), never
  row-at-a-time BatchEvalPython.

Plan-only: nothing here executes a job beyond session fixtures.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sycl_jaccard_spark.config import PipelineConfig
from sycl_jaccard_spark.functions.shingles import shingle_hashes, shingles, tokens
from sycl_jaccard_spark.operators.graph_jaccard import jaccard_all_edges
from sycl_jaccard_spark.operators.lsh import band_hashes, candidate_pairs, minhash_signatures
from sycl_jaccard_spark.operators.pair_jaccard import jaccard_pairs
from sycl_jaccard_spark.sources.tables import documents_as_files, load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_prunes_columns_and_pushes_filters(spark):
    docs = load_table(spark, SF, "documents")
    p = _plan(docs.filter(F.col("doc_id") > 100).select("doc_id"))
    scan = next(l for l in p.splitlines() if "FileScan" in l)
    # projection pruned to the single needed column ...
    assert "ReadSchema: struct<doc_id:bigint>" in scan, scan
    # ... and the predicate reached the parquet reader
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)]" in scan, scan


def _shingled(spark):
    files = documents_as_files(load_table(spark, SF, "documents"))
    return files.select(
        "id",
        shingle_hashes(shingles(tokens(F.col("content")), 3), portable=True).alias(
            "shingle_hashes"
        ),
    )


def test_candidate_pairs_plan_shape(spark):
    """Bucket cap must compile to WindowGroupLimit (rank pushed below the
    full window sort) and the whole candidate path must stay JVM-side."""
    cfg = PipelineConfig(num_perms=16, bands=4, portable_hashes=True)
    sig = minhash_signatures(_shingled(spark), cfg)
    banded = band_hashes(sig, cfg, "id", portable=True)
    p = _plan(candidate_pairs(banded, cfg, "id"))
    assert "WindowGroupLimit" in p
    assert "BatchEvalPython" not in p  # row-at-a-time Python would be ~100x
    assert "ArrowEvalPython" not in p  # portable hashes stay in codegen


def test_graph_jaccard_is_pure_jvm(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    for impl in ("exploded", "arrays"):
        p = _plan(jaccard_all_edges(edges, impl=impl))
        assert "EvalPython" not in p, f"{impl}: Python in the hot path"
        # JVM join/agg operators present (under AQE the pre-execution plan
        # shows isFinalPlan=false, so WholeStageCodegen spans aren't visible
        # here — absence of any Python eval is the load-bearing property)
        assert "Join" in p and "Aggregate" in p


def test_pair_verify_is_pure_jvm(spark):
    items = _shingled(spark).select("id", F.col("shingle_hashes").alias("set"))
    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    for impl in ("exploded", "arrays"):
        p = _plan(jaccard_pairs(items, pairs, id_col="id", set_col="set", impl=impl))
        assert "EvalPython" not in p, f"{impl}: Python in the verify path"


def test_minhash_stage_is_arrow_vectorized(spark):
    cfg = PipelineConfig(num_perms=128)  # production config -> pandas UDF path
    p = _plan(minhash_signatures(_shingled(spark), cfg))
    assert "ArrowEvalPython" in p     # vectorized Arrow batches...
    assert "BatchEvalPython" not in p  # ...never per-row pickling


def test_candidate_self_join_reuses_exchange(spark):
    """The bucket self-join's two sides derive from the same capped
    relation, so they must share ONE shuffle (ReusedExchange) — breaking the
    shared lineage (e.g. a non-deterministic column on one side) would
    silently double the candidate stage's shuffle volume. Checked with AQE
    off because the adaptive wrapper hides reuse decisions until runtime
    (where stage-cache reuse applies equally)."""
    banded = spark.createDataFrame(
        [(i, i % 3, i % 7) for i in range(100)], "id long, band int, band_hash long"
    ).localCheckpoint(eager=True)
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for mode in ("cap", "auto", "salt"):
            p = _plan(candidate_pairs(banded, PipelineConfig(), "id", skew_mode=mode))
            assert "ReusedExchange" in p, f"{mode}: self-join shuffles twice"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def test_weighted_signatures_are_arrow_vectorized(spark):
    from sycl_jaccard_spark.functions.weighted_minhash import weighted_minhash_udf

    df = spark.createDataFrame(
        [(1, [10, 20], [1.0, 2.0])], "id long, elems array<long>, weights array<double>"
    )
    p = _plan(df.select("id", weighted_minhash_udf(16)(F.col("elems"), F.col("weights")).alias("sig")))
    assert "ArrowEvalPython" in p
    assert "BatchEvalPython" not in p


def test_weighted_verify_is_pure_jvm(spark):
    """The weighted pipeline's verify (jaccard_pairs_weighted over the IDF
    membership relation) must stay whole-stage-codegen JVM — no Python in the
    pair-scoring hot path, weighted or not."""
    from sycl_jaccard_spark.operators.pair_jaccard import jaccard_pairs_weighted

    m = spark.createDataFrame(
        [(1, 10, 0.5), (2, 10, 0.5)], "id long, elem long, w double"
    )
    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    for wc in (False, True):
        p = _plan(jaccard_pairs_weighted(m, pairs, with_counts=wc))
        # under AQE the pre-execution plan shows isFinalPlan=false, so
        # codegen spans aren't visible — no-Python is the load-bearing pin
        assert "EvalPython" not in p
        assert "Join" in p and "Aggregate" in p


def test_idf_weights_is_pure_jvm_single_shuffle(spark):
    """idf_weights: explode + dropDuplicates + groupBy — JVM-side, and the
    dedup and df-count agg share the elem-keyed exchange (no second wide
    shuffle for the count)."""
    from sycl_jaccard_spark.operators.weighted_dedup import idf_weights

    sh = spark.createDataFrame([(1, [10, 20])], "id long, shingle_hashes array<long>")
    p = _plan(idf_weights(sh, n_docs=1))
    assert "EvalPython" not in p
    assert p.count("Exchange hashpartitioning") <= 2  # (id,elem) dedup + elem agg


def test_weighted_arrays_with_memberships_single_generate(spark):
    """With the pipeline's pre-materialized memberships relation, the
    array-attach weighted verify must contain exactly ONE Generate (the
    intersection explode) — the second explode of the shingle relation (for
    volumes) is gone (VERDICT r4 #3)."""
    from sycl_jaccard_spark.operators.pair_jaccard import jaccard_pairs_weighted_arrays

    items = spark.createDataFrame(
        [(1, [10, 20]), (2, [10, 30])], "id long, set array<long>"
    )
    idf = spark.createDataFrame(
        [(10, 0.5), (20, 1.0), (30, 1.5)], "elem long, w double"
    )
    m = spark.createDataFrame(
        [(1, 10, 0.5), (1, 20, 1.0), (2, 10, 0.5), (2, 30, 1.5)],
        "id long, elem long, w double",
    )
    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    vols = spark.createDataFrame([(1, 1.5), (2, 2.0)], "id long, vol double")
    p_with = _plan(jaccard_pairs_weighted_arrays(items, idf, pairs, memberships=m))
    p_vol = _plan(jaccard_pairs_weighted_arrays(items, idf, pairs, volumes=vols))
    p_without = _plan(jaccard_pairs_weighted_arrays(items, idf, pairs))
    assert p_with.count("Generate") == 1, p_with
    # volumes= (the pipeline hot path: vol precomputed as a free array
    # aggregate in the signature stage) — also exactly one Generate, and no
    # groupBy aggregation for volumes at all
    assert p_vol.count("Generate") == 1, p_vol
    assert p_without.count("Generate") > 1
    assert "EvalPython" not in p_with and "EvalPython" not in p_vol


def test_bucketed_shingles_checkpoint_avoids_items_exchange(spark, tmp_path):
    """cfg.shingle_buckets>0: the durable shingles stage is a bucketed table
    and verify's two array-attach joins must NOT re-shuffle the items side —
    at 100 TB the shingle relation is the corpus and verify re-exchanging it
    per run is THE cost center (VERDICT r4 #5). Broadcast is disabled to
    force the shuffle path the real scale would take."""
    from sycl_jaccard_spark.config import PipelineConfig
    from sycl_jaccard_spark.operators.pair_jaccard import jaccard_pairs
    from sycl_jaccard_spark.plans.pipeline import DedupPipeline

    files = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta file{i} body{i % 7}") for i in range(50)],
        "id long, content string",
    )
    cfg = PipelineConfig(shingle_buckets=4)
    pipe = DedupPipeline(spark, cfg, checkpoint_dir=str(tmp_path / "ckpt"))
    pipe.run(files)
    tbl = spark.table(pipe._bucket_table("shingles"))
    pairs = spark.createDataFrame([(i, i + 1) for i in range(0, 40, 2)], "a long, b long")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            jaccard_pairs(
                tbl.select("id", F.col("shingle_hashes").alias("set")), pairs
            )._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Bucketed: true" in plan, plan
    # the only exchanges are on the pair side: one into the first join, one
    # re-keying (a,b)->b into the second — the two corpus-sized items scans
    # feed their joins directly from the bucketed layout
    import re

    scans = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert len(scans) == 2 and all("Bucketed: true" in ln for ln in scans), scans
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_bucketed_checkpoint_recovers_from_crashed_write(spark, tmp_path):
    """A killed run leaves the bucketed stage dir non-empty without _SUCCESS;
    the rerun's CTAS must clear it first (Spark refuses CTAS into a
    non-empty external location) — same recovery semantics as the plain
    parquet overwrite path."""
    from sycl_jaccard_spark.config import PipelineConfig
    from sycl_jaccard_spark.plans.pipeline import DedupPipeline

    files = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta file{i} body{i % 7}") for i in range(50)],
        "id long, content string",
    )
    cfg = PipelineConfig(shingle_buckets=4)
    ckpt = tmp_path / "ckpt"
    pipe = DedupPipeline(spark, cfg, checkpoint_dir=str(ckpt))
    expected = {r["id"]: r["cluster"] for r in pipe.run(files).clusters.collect()}
    # simulate the crash: stage files present, completion marker missing
    stage = ckpt / "stage=shingles"
    (stage / "_SUCCESS").unlink()
    spark.sql(f"DROP TABLE IF EXISTS {pipe._bucket_table('shingles')}")
    rerun = DedupPipeline(spark, cfg, checkpoint_dir=str(ckpt))
    got = {r["id"]: r["cluster"] for r in rerun.run(files).clusters.collect()}
    assert got == expected
    shingle_metric = next(m for m in rerun.metrics if m["stage"] == "shingles")
    assert shingle_metric["resumed"] is False  # the crashed stage re-ran, not resumed


def test_substring_band_passes_are_pure_jvm(spark):
    """The substring pass EXPRESSION forms — line grams and the golden
    winnow form (normalize → char-gram hash → HOF window-min) — are pure
    column expressions: no Python eval anywhere in the banding explode.
    (The pipelines route winnow's window-min through an Arrow batch instead
    — see test_winnow_pipeline_banding_is_arrow_vectorized.)"""
    from sycl_jaccard_spark.config import PipelineConfig
    from sycl_jaccard_spark.functions.shingles import substring_band_hashes

    docs = spark.createDataFrame(
        [(1, "a = 1\nb = 2\nc = 3\nd = 4\ne = 5")], "id long, content string"
    )
    for sub_pass in ("linegram", "winnow"):
        cfg = PipelineConfig(substring_pass=sub_pass, winnow_k=4, winnow_w=3)
        p = _plan(
            docs.select("id", F.explode(substring_band_hashes(F.col("content"), cfg)))
        )
        assert "EvalPython" not in p, f"{sub_pass}: Python in the banding path"
        assert "Generate" in p  # the explode stays a JVM generator


def test_winnow_pipeline_banding_is_arrow_vectorized(spark):
    """The pipelines' winnow banding (plans.pipeline.substring_banded): gram
    hashing JVM-side, window-min as ONE ArrowEvalPython (never per-row
    BatchEvalPython), explode over a materialized fingerprint column — and
    the result matches the golden expression form row-for-row."""
    from sycl_jaccard_spark.config import PipelineConfig
    from sycl_jaccard_spark.functions.shingles import winnow_hashes
    from sycl_jaccard_spark.plans.pipeline import substring_banded

    cfg = PipelineConfig(substring_pass="winnow", winnow_k=4, winnow_w=3)
    docs = spark.createDataFrame(
        [(1, "a = 1\nb = 2\nc = 3\nd = 4"), (2, "x" * 40)], "id long, content string"
    )
    banded = substring_banded(docs, cfg, band_id=99)
    p = _plan(banded)
    assert "BatchEvalPython" not in p
    got = {(r["id"], r["band"], r["band_hash"]) for r in banded.collect()}
    want = {
        (r["id"], 99, h)
        for r in docs.select(
            "id", winnow_hashes(F.col("content"), 4, 3).alias("fps")
        ).collect()
        for h in r["fps"]
    }
    assert got == want


def test_training_set_plan_broadcasts_leaks_and_inlines_quality(spark):
    """training_set's 100 TB contract: the contaminated set (leak-sized) is
    excluded via BROADCAST anti-joins, the QualityGate is a pure inline
    Filter on the files scan (no Python eval, no extra Exchange on the
    files side before dedup's cluster join)."""
    from sycl_jaccard_spark.operators.representatives import (
        QualityGate,
        training_set,
    )

    files = documents_as_files(load_table(spark, SF, "documents")).select(
        "id", "content"
    )
    clusters = files.select("id", (F.col("id") % 10).alias("cluster"))
    contam = files.select(
        F.col("id").alias("doc_id"),
        F.lit(0.0).alias("max_containment"),
        (F.col("id") % 97 == 0).alias("contaminated"),
    )
    gate = QualityGate(min_tokens=5, min_distinct_ratio=0.2)
    kept, manifest = training_set(files, clusters, contam, quality=gate)
    for df in (kept, manifest):
        p = _plan(df)
        assert "BroadcastHashJoin" in p and "LeftAnti" in p, p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    # the quality gate evaluates inline: the kept plan filters the files
    # scan without any exchange between the scan and the filter
    kp = _plan(kept)
    assert "Filter" in kp, kp
