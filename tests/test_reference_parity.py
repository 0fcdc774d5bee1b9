"""Reference-semantics parity tests: K10 synthetic weights, env-var impl
dispatch (A7), force-weighted override, substring containment pass."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sycl_jaccard_spark.config import PipelineConfig
from sycl_jaccard_spark.functions.shingles import line_gram_hashes
from sycl_jaccard_spark.operators.graph_jaccard import jaccard_all_edges
from sycl_jaccard_spark.operators.lsh import candidate_pairs
from sycl_jaccard_spark.operators.normalize import symmetrize
from sycl_jaccard_spark.operators.rowsum import synthesize_vertex_weights
from sycl_jaccard_spark.plans.pipeline import DedupPipeline
from sycl_jaccard_spark.sources.corpus import CorpusSpec, synth_source_files
from sycl_jaccard_spark.sources.tables import with_file_id


def test_synthesize_vertex_weights_k10(spark):
    """main.cpp:216-275: vertex weight = Σ incident edge weights."""
    edges = spark.createDataFrame(
        [(0, 1, 2.0), (0, 2, 3.0), (1, 0, 2.0), (2, 0, 3.0), (1, 2, 1.0), (2, 1, 1.0)],
        ["src", "dst", "weight"],
    )
    w = {r.vertex: r.w for r in synthesize_vertex_weights(edges).collect()}
    assert w == {0: 5.0, 1: 3.0, 2: 4.0}


def test_env_var_impl_dispatch(spark, monkeypatch):
    """A7 selectImplementation analog: JACSPARK_FORCE_IMPL picks the physical
    strategy; both must give identical results."""
    edges = symmetrize(spark.createDataFrame([(0, 1), (1, 2), (0, 2), (2, 3)], ["src", "dst"]))
    results = {}
    for mode in ("arrays", "exploded"):
        monkeypatch.setenv("JACSPARK_FORCE_IMPL", mode)
        results[mode] = {
            (r.src, r.dst): r.jaccard for r in jaccard_all_edges(edges).collect()
        }
    assert results["arrays"] == results["exploded"]
    monkeypatch.setenv("JACSPARK_FORCE_IMPL", "bogus")
    with pytest.raises(ValueError):
        jaccard_all_edges(edges)


def test_substring_pass_catches_containment(spark):
    """The substring (suffix-array analog) pass: a file whose content
    contains another file's lines at an arbitrary offset has low token-
    shingle Jaccard but shares w-line grams — the pass must produce the
    candidate pair, offset-independently."""
    body = "\n".join(f"line{i} = x + {i}" for i in range(30))
    prefix = "\n".join(f"other{i} stuff {i * 7}" for i in range(53))  # odd offset
    rows = [(1, body), (2, prefix + "\n" + body)]
    df = spark.createDataFrame(rows, ["id", "content"])
    cfg = PipelineConfig()
    sub = df.select(
        "id",
        F.explode(line_gram_hashes(F.col("content"), cfg.substring_lines)).alias("band_hash"),
    ).withColumn("band", F.lit(0))
    cands = {(r.a, r.b) for r in candidate_pairs(sub.select("id", "band", "band_hash"), cfg, "id").collect()}
    assert (1, 2) in cands


def test_pipeline_substring_stage_enabled(spark):
    """Pipeline runs end-to-end with the substring pass on."""
    files, _ = synth_source_files(spark, CorpusSpec(n_files=60, n_clusters=10))
    files = with_file_id(files)
    res = DedupPipeline(spark, enable_substring=True).run(files)
    assert res.clusters.count() == 60


def test_simhash_pipeline_survives_driver_aggregate(spark):
    """Regression for the r1 INTERNAL_ERROR shape: a pandas-UDF column feeding
    a generator after Catalyst collapses projections (the driver wraps every
    query in an aggregate, which triggered it). The fused minhash stage is
    materialized before the SimHash posexplode, so this must run clean."""
    import __spark_entry__ as entrymod

    df = entrymod.q_dedup_pipeline_full(spark, "/root/testdata/sf0.001")
    assert df.agg(F.count(F.lit(1))).collect()[0][0] == 500


def test_pipeline_substring_recovers_containment_end_to_end(spark):
    """Shifted containment THROUGH the flagship: a file fully embedded at an
    odd offset inside a larger file has token-shingle J ~0.45 (< 0.7), so the
    LSH+SimHash pipeline keeps them apart — the substring pass generates the
    candidate from shared w-line grams and the containment acceptance rule
    (inter/min >= 0.9) clusters them, without perturbing unrelated files."""
    body = "\n".join(f"val{i} = compute({i}) + {i * 3}" for i in range(40))
    noise = "\n".join(f"unrelated{i} -> {i * 11}" for i in range(80))
    rows = [(0, body), (1, noise + "\n" + body)]
    rows += [(10 + i, f"def only_{i}(): return {i * 13}\n" * 6) for i in range(5)]
    files = spark.createDataFrame(rows, ["id", "content"])

    off = DedupPipeline(spark, enable_simhash=True, enable_substring=False).run(files)
    lab_off = {r.id: r.cluster for r in off.clusters.collect()}
    assert lab_off[0] != lab_off[1]  # the miss the pass exists to fix

    pipe = DedupPipeline(spark, enable_simhash=True, enable_substring=True)
    on = pipe.run(files)
    lab_on = {r.id: r.cluster for r in on.clusters.collect()}
    assert lab_on[0] == lab_on[1]
    # unrelated files stay singletons
    assert len({lab_on[10 + i] for i in range(5)}) == 5
    # the recovered pair is a containment acceptance (J below the threshold)
    vp = {(r.a, r.b): r.jaccard for r in on.verified_pairs.collect()}
    assert (0, 1) in vp and vp[(0, 1)] < 0.7
    # and the pass's cost is visible in the stage metrics (verify stage ran)
    assert any(m["stage"] == "verify" for m in pipe.metrics)


def test_env_cleanup():
    assert os.environ.get("JACSPARK_FORCE_IMPL") != "bogus"


def test_env_var_force_weighted(spark, monkeypatch):
    """JACCARD_FORCE_WEIGHTED analog (main.cpp:139-155): "1" with no weights
    synthesizes constant-1.0 weights (result == unweighted); "0" ignores
    provided weights (result == unweighted)."""
    from pyspark.sql import functions as F

    edges = symmetrize(spark.createDataFrame([(0, 1), (1, 2), (0, 2), (2, 3)], ["src", "dst"]))
    base = {(r.src, r.dst): r.jaccard for r in jaccard_all_edges(edges).collect()}

    monkeypatch.setenv("JACSPARK_FORCE_WEIGHTED", "1")
    forced_on = {(r.src, r.dst): r.jaccard for r in jaccard_all_edges(edges).collect()}
    assert set(forced_on) == set(base)
    for k in base:
        assert forced_on[k] == pytest.approx(base[k], abs=1e-9), k

    monkeypatch.setenv("JACSPARK_FORCE_WEIGHTED", "0")
    wdf = spark.createDataFrame([(v, 7.0 + v) for v in range(4)], ["vertex", "w"])
    forced_off = {
        (r.src, r.dst): r.jaccard
        for r in jaccard_all_edges(edges, vertex_weights=wdf).collect()
    }
    assert forced_off == base
