"""Deterministic sampling + stratified source mixing (operators/mixing.py).

Functional: reproducibility, the NESTING property of hash-threshold
sampling (rate r ⊆ rate r' for r < r'), water-filled rate computation
(scarcest source taken whole, others thinned to proportion), target
validation. Plan: the corpus side reaches the hash filter through a
broadcast join of the tiny rates relation — no sort-merge join, no Python
eval anywhere.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sycl_jaccard_spark.operators.mixing import (
    deterministic_sample,
    sample_hash,
    stratified_mix,
)


def test_deterministic_sample_reproducible_and_nested(spark):
    df = spark.range(4000).withColumnRenamed("id", "id")
    s1 = {r.id for r in deterministic_sample(df, 0.3, seed=7).collect()}
    s2 = {r.id for r in deterministic_sample(df, 0.3, seed=7).collect()}
    assert s1 == s2
    # nesting: the 30% sample is a subset of the 60% sample (same seed)
    s_big = {r.id for r in deterministic_sample(df, 0.6, seed=7).collect()}
    assert s1 <= s_big
    # rates are honored statistically (binomial sd ~29 at n=4000, p=0.3)
    assert abs(len(s1) - 1200) < 150 and abs(len(s_big) - 2400) < 150
    # a different seed selects a genuinely different set
    s_other = {r.id for r in deterministic_sample(df, 0.3, seed=8).collect()}
    assert s1 != s_other


def test_sample_hash_is_uniform_60bit(spark):
    hs = spark.range(2000).select(sample_hash("id", seed=1).alias("h"))
    lo, hi, mean = hs.agg(
        F.min("h"), F.max("h"), F.avg(F.col("h").cast("double"))
    ).collect()[0]
    assert 0 <= lo and hi < 2**60
    assert abs(mean / 2**59 - 1.0) < 0.05  # mean ≈ half the space


def test_stratified_mix_water_fills(spark):
    """Sources 10000/5000/1000 rows at equal target shares: the scarce
    source C is taken WHOLE (rate 1), A and B thin to ~1000 rows each."""
    df = (
        spark.range(16000)
        .select(
            F.col("id"),
            F.when(F.col("id") < 10000, "A")
            .when(F.col("id") < 15000, "B")
            .otherwise("C")
            .alias("source"),
        )
    )
    sampled, rates = stratified_mix(df, {"A": 1.0, "B": 1.0, "C": 1.0}, seed=3)
    r = {x.source: x for x in rates.collect()}
    assert r["C"].rate == pytest.approx(1.0, abs=1e-12)
    assert r["A"].rate == pytest.approx(0.1, rel=1e-12)
    assert r["B"].rate == pytest.approx(0.2, rel=1e-12)
    assert (r["A"].weight, r["B"].weight, r["C"].weight) == (10000, 5000, 1000)
    counts = {x.source: x["count"] for x in sampled.groupBy("source").count().collect()}
    assert counts["C"] == 1000  # whole source kept
    sd = math.sqrt(1000)
    assert abs(counts["A"] - 1000) < 6 * sd and abs(counts["B"] - 1000) < 6 * sd
    # sampled rows carry no helper columns and are a subset of the input
    assert sampled.columns == df.columns


def test_stratified_mix_weighted_and_unnamed_sources(spark):
    """weight_col drives the fill level; sources not in targets are
    excluded; targets naming absent sources are ignored."""
    df = spark.createDataFrame(
        [(1, "A", 100), (2, "A", 300), (3, "B", 50), (4, "D", 999)],
        "id long, source string, n long",
    )
    sampled, rates = stratified_mix(
        df, {"A": 1.0, "B": 1.0, "Z": 5.0}, weight_col="n", seed=0
    )
    r = {x.source: x for x in rates.collect()}
    assert set(r) == {"A", "B"}  # Z absent from corpus, D not targeted
    # fill T = min(400/1, 50/1) = 50 → A rate 50/400, B rate 1
    assert r["B"].rate == pytest.approx(1.0, abs=1e-12)
    assert r["A"].rate == pytest.approx(0.125, rel=1e-12)
    got_sources = {x.source for x in sampled.collect()}
    assert "D" not in got_sources
    assert 3 in {x.id for x in sampled.collect()}  # B kept whole


def test_stratified_mix_rejects_bad_targets(spark):
    df = spark.range(10).select("id", F.lit("A").alias("source"))
    with pytest.raises(ValueError):
        stratified_mix(df, {})
    with pytest.raises(ValueError):
        stratified_mix(df, {"A": 0.0})
    with pytest.raises(ValueError):
        stratified_mix(df, {"A": -1.0})


def test_stratified_mix_plan_is_broadcast_and_jvm_only(spark):
    """100 TB shape: the corpus joins the (≤|targets|-row) rates relation
    via broadcast (never sort-merge) and the hash filter is a pure JVM
    expression — no Python eval of any kind."""
    df = spark.range(1000).select(
        "id", F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source")
    )
    sampled, _ = stratified_mix(df, {"s0": 2.0, "s1": 1.0}, seed=5)
    p = sampled._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_stratified_mix_total_budget(spark):
    """total= caps the mix at a fixed expected weight while preserving
    proportions; a budget above the feasible maximum is a no-op."""
    df = (
        spark.range(16000)
        .select(
            F.col("id"),
            F.when(F.col("id") < 10000, "A")
            .when(F.col("id") < 15000, "B")
            .otherwise("C")
            .alias("source"),
        )
    )
    targets = {"A": 1.0, "B": 1.0, "C": 1.0}
    # feasible max fill is 1000 per source (C is scarce); ask for half
    _, rates = stratified_mix(df, targets, seed=3, total=1500.0)
    r = {x.source: x.rate for x in rates.collect()}
    assert r["A"] == pytest.approx(0.05, rel=1e-12)
    assert r["B"] == pytest.approx(0.1, rel=1e-12)
    assert r["C"] == pytest.approx(0.5, rel=1e-12)
    # budget above feasible max: identical to the uncapped mix
    _, rates_hi = stratified_mix(df, targets, seed=3, total=10_000_000.0)
    _, rates_un = stratified_mix(df, targets, seed=3)
    assert {tuple(x) for x in rates_hi.collect()} == {
        tuple(x) for x in rates_un.collect()
    }
    with pytest.raises(ValueError):
        stratified_mix(df, targets, total=0.0)


def test_leakage_safe_split_never_straddles(spark):
    from sycl_jaccard_spark.operators.mixing import leakage_safe_split

    # 3000 docs in 1000 clusters of 3
    clusters = spark.range(3000).select(
        F.col("id"), (F.col("id") / 3).cast("long").alias("cluster")
    )
    split = leakage_safe_split(clusters, 0.3, seed=4)
    rows = split.collect()
    assert {r.split for r in rows} == {"test", "train"}
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, set()).add(r.split)
    # THE property: no cluster straddles the split
    assert all(len(s) == 1 for s in by_cluster.values())
    test_clusters = sum(1 for s in by_cluster.values() if s == {"test"})
    sd = math.sqrt(1000 * 0.3 * 0.7)
    assert abs(test_clusters - 300) < 6 * sd
    # deterministic + nested: a larger share keeps every test cluster
    bigger = leakage_safe_split(clusters, 0.5, seed=4)
    test_small = {r.cluster for r in rows if r.split == "test"}
    test_big = {r.cluster for r in bigger.collect() if r.split == "test"}
    assert test_small <= test_big
    with pytest.raises(ValueError):
        leakage_safe_split(clusters, 1.5)
    # pure column expression: no exchange, no Python eval
    p = split._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "EvalPython" not in p, p


def test_split_composes_with_training_set(spark):
    """The full pre-training flow: training_set picks one representative
    per cluster, leakage_safe_split assigns by cluster — so the EVAL side
    can never contain a near-duplicate of any train doc: each kept rep
    carries its whole cluster to one side."""
    from sycl_jaccard_spark.operators.mixing import leakage_safe_split
    from sycl_jaccard_spark.operators.representatives import training_set

    # 60 docs in 20 clusters of 3; doc 0 is a planted leak
    files = spark.range(60).select(
        F.col("id"),
        F.concat_ws(" ", F.array([F.concat(F.lit("w"), (F.col("id") / 3).cast("long").cast("string"), F.lit(f"_{t}")) for t in range(12)])).alias("content"),
    )
    clusters = spark.range(60).select(
        F.col("id"), (F.col("id") / 3).cast("long").alias("cluster")
    )
    contam = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 0, 1.0).otherwise(0.0).alias("max_containment"),
        (F.col("id") == 0).alias("contaminated"),
    )
    kept, manifest = training_set(files, clusters, contam)
    split = leakage_safe_split(clusters, 0.4, seed=6)
    # final corpora: kept representatives joined with their cluster's side
    final = kept.join(split.select("id", "split"), "id")
    train_ids = {r.id for r in final.filter("split = 'train'").collect()}
    test_ids = {r.id for r in final.filter("split = 'test'").collect()}
    assert train_ids and test_ids and not (train_ids & test_ids)
    cluster_of = {r.id: r.cluster for r in clusters.collect()}
    side_of_cluster = {}
    for r in split.collect():
        side_of_cluster.setdefault(cluster_of[r.id], set()).add(r.split)
    # no train doc's cluster has ANY member assigned to test (and vice
    # versa) — near-dup leakage into eval is impossible by construction
    for i in train_ids:
        assert side_of_cluster[cluster_of[i]] == {"train"}
    for i in test_ids:
        assert side_of_cluster[cluster_of[i]] == {"test"}
    # the contaminated cluster's rep succession still holds under the split
    m = {r.id: r for r in manifest.collect()}
    assert not m[0].keep and m[0].drop_reason == "contaminated"
    assert m[1].keep or m[2].keep  # succession inside cluster 0


def test_stratified_mix_budget_ignores_absent_sources(spark):
    """total= is split over sources PRESENT in the corpus — an absent
    target must not dilute the delivered budget (review regression)."""
    df = spark.range(10000).select("id", F.lit("web").alias("source"))
    _, rates = stratified_mix(
        df, {"web": 1.0, "code": 1.0}, seed=1, total=1000.0
    )
    r = rates.collect()
    assert len(r) == 1 and r[0].source == "web"
    # budget 1000 over ONE present unit share -> rate 0.1, not 0.05
    assert r[0].rate == pytest.approx(0.1, rel=1e-12)


def test_stratified_mix_zero_weight_source_is_absent(spark):
    """A target source whose total weight is 0 is treated like an absent
    one: it cannot poison the fill level or grab rate 1.0 (review
    regression: 0-division previously yielded rate NULL -> least = 1)."""
    df = spark.createDataFrame(
        [(1, "A", 0), (2, "A", 0), (3, "B", 40), (4, "B", 60)],
        "id long, source string, n long",
    )
    sampled, rates = stratified_mix(df, {"A": 1.0, "B": 1.0}, weight_col="n")
    r = {x.source: x for x in rates.collect()}
    assert set(r) == {"B"} and r["B"].rate == pytest.approx(1.0, abs=1e-12)
    assert {x.id for x in sampled.collect()} == {3, 4}


def test_stratified_mix_tolerates_rate_column_name(spark):
    """An input relation already carrying a 'rate' column must not make
    the internal rates join ambiguous (review regression)."""
    df = spark.range(100).select(
        "id", F.lit("A").alias("source"), F.lit(0.5).alias("rate")
    )
    sampled, _ = stratified_mix(df, {"A": 1.0}, seed=2)
    assert sampled.columns == ["id", "source", "rate"]
    assert sampled.count() == 100  # single source fills whole
