"""Incremental (delta) dedup: the store runner must be label-for-label
equivalent to one full batch pipeline over the unioned corpus (VERDICT r4
top ask), idempotent under batch replay, and must never re-sign content the
store has already seen."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sycl_jaccard_spark.config import PipelineConfig
from sycl_jaccard_spark.plans.delta import DeltaDedup
from sycl_jaccard_spark.plans.pipeline import DedupPipeline
from sycl_jaccard_spark.sources.corpus import CorpusSpec, synth_source_files
from sycl_jaccard_spark.sources.tables import with_file_id

CFG = PipelineConfig()


def _corpus(spark, n_files=240, seed=7, exact_dup_rate=0.3):
    spec = CorpusSpec(
        n_files=n_files, n_clusters=30, cluster_min=2, cluster_max=6,
        edit_rate=0.05, exact_dup_rate=exact_dup_rate, seed=seed,
    )
    files, _ = synth_source_files(spark, spec)
    return with_file_id(files).select("id", "content").localCheckpoint(eager=True)


def _batches(files, n):
    """Deterministic disjoint split: pmod of a row hash — arrival order is
    uncorrelated with id order, exercising first-seen-rep vs min-id-rep."""
    return [
        files.filter(F.pmod(F.xxhash64("id"), F.lit(n)) == i)
        for i in range(n)
    ]


def _clusters(df) -> dict:
    return {r["id"]: r["cluster"] for r in df.collect()}


@pytest.fixture(scope="module")
def corpus(spark):
    return _corpus(spark)


def test_delta_equals_full_run(spark, tmp_path, corpus):
    """Three deliveries through the store == one full pipeline over the
    union, label for label — the VERDICT r4 'done' criterion."""
    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    for batch in _batches(corpus, 3):
        store.add_batch(batch)
    delta = _clusters(store.clusters())

    full = DedupPipeline(spark, CFG, enable_substring=False).run(corpus)
    expected = _clusters(full.clusters)
    assert delta == expected
    assert len(delta) == corpus.count()


def test_delta_incremental_cc_equals_full_cc(spark, tmp_path, corpus):
    batches = _batches(corpus, 3)
    inc = DeltaDedup(spark, str(tmp_path / "inc"), CFG, cc_mode="incremental")
    ful = DeltaDedup(spark, str(tmp_path / "ful"), CFG, cc_mode="full")
    for b in batches:
        s_inc = inc.add_batch(b)
        s_ful = ful.add_batch(b)
        assert s_inc["n_new_edges"] == s_ful["n_new_edges"]
    assert _clusters(inc.clusters()) == _clusters(ful.clusters())


def test_delta_replay_idempotent(spark, tmp_path, corpus):
    """Replaying a batch id (at-least-once delivery) must leave the store
    bit-identical — partitions overwrite, labels reconverge."""
    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    b0, b1, _ = _batches(corpus, 3)
    store.add_batch(b0, batch_id=0)
    store.add_batch(b1, batch_id=1)
    before = _clusters(store.clusters())
    edges_before = {(r["a"], r["b"]) for r in store.edges().collect()}
    store.add_batch(b1, batch_id=1)  # replay
    assert _clusters(store.clusters()) == before
    assert {(r["a"], r["b"]) for r in store.edges().collect()} == edges_before


def test_delta_never_resigns_seen_content(spark, tmp_path, corpus):
    """A batch of exact duplicates of stored content adds files and edges
    but ZERO shingle/signature rows — per-batch signing cost is proportional
    to never-seen content only."""
    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    b0, b1, _ = _batches(corpus, 3)
    store.add_batch(b0)
    dup_batch = b0.select((F.col("id") + F.lit(1 << 40)).alias("id"), "content")
    summary = store.add_batch(dup_batch)
    assert summary["n_new_uniques"] == 0
    assert summary["n_files"] == b0.count()
    # every duplicate must land in its original's cluster
    joined = (
        store.clusters().alias("c")
        .join(
            store.clusters().select(
                (F.col("id") + F.lit(1 << 40)).alias("id"), F.col("cluster").alias("dup_cluster")
            ),
            "id",
        )
    )
    assert joined.filter(F.col("cluster") != F.col("dup_cluster")).count() == 0


def test_delta_cross_batch_near_dups_found(spark, tmp_path):
    """Near-dup pairs split across deliveries must be caught by the
    banded-store join (not only within-batch pairs)."""
    spec = CorpusSpec(n_files=60, n_clusters=15, cluster_min=2, cluster_max=2,
                      edit_rate=0.04, exact_dup_rate=0.0, seed=11)
    files, truth = synth_source_files(spark, spec)
    files = with_file_id(files)
    # route each cluster's two members into DIFFERENT batches
    key = files.select("repo", "path", "commit", "id").collect()
    truth_by_id = {}
    idx = {}
    for r in key:
        truth_by_id[r["id"]] = truth[(r["repo"], r["path"], r["commit"])]
        idx.setdefault(truth_by_id[r["id"]], []).append(r["id"])
    first = {min(v) for k, v in idx.items() if k >= 0 and len(v) == 2}
    fdf = files.select("id", "content").localCheckpoint(eager=True)
    b0 = fdf.filter(F.col("id").isin(list(first)))
    b1 = fdf.join(b0.select("id"), "id", "left_anti")
    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    store.add_batch(b0)
    store.add_batch(b1)
    clusters = _clusters(store.clusters())
    by_truth: dict[int, set] = {}
    for fid, c in clusters.items():
        t = truth_by_id[fid]
        if t >= 0:
            by_truth.setdefault(t, set()).add(c)
    # every planted 2-cluster collapsed to one label despite the batch split
    merged = sum(1 for s in by_truth.values() if len(s) == 1)
    assert merged >= 0.99 * len(by_truth)


def test_delta_config_mismatch_refuses(spark, tmp_path, corpus):
    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    store.add_batch(_batches(corpus, 3)[0])
    with pytest.raises(ValueError, match="different config"):
        DeltaDedup(spark, str(tmp_path / "store"), PipelineConfig(shingle_k=7))


def test_delta_rejects_weighted_mode(spark, tmp_path):
    with pytest.raises(ValueError, match="candidate_weights"):
        DeltaDedup(spark, str(tmp_path / "s"), PipelineConfig(candidate_weights="idf"))


def test_compact_preserves_state_and_continues(spark, tmp_path, corpus):
    """compact() folds batch partitions without changing any observable:
    clusters and edges identical before/after, and a post-compaction
    delivery still reproduces the full batch pipeline label-for-label."""
    b = _batches(corpus, 4)
    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    for batch in b[:3]:
        store.add_batch(batch)
    before_c = _clusters(store.clusters())
    before_e = {(r["a"], r["b"]) for r in store.edges().collect()}
    summary = store.compact(files_per_relation=4)
    assert summary["compacted"] and summary["n_batches"] == 3
    assert store.batch_ids() == [2]
    assert store.compacted_through() == 2
    assert _clusters(store.clusters()) == before_c
    assert {(r["a"], r["b"]) for r in store.edges().collect()} == before_e
    store.add_batch(b[3])
    full = DedupPipeline(spark, CFG, enable_substring=False).run(corpus)
    assert _clusters(store.clusters()) == _clusters(full.clusters)


def test_compact_reduces_file_count_and_closes_replay_window(
    spark, tmp_path, corpus
):
    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    b0, b1, _ = _batches(corpus, 3)
    store.add_batch(b0, batch_id=0)
    store.add_batch(b1, batch_id=1)
    root = tmp_path / "store"
    n_before = len(list((root / "banded").glob("**/part-*.parquet")))
    store.compact(files_per_relation=2)
    n_after = len(list((root / "banded").glob("**/part-*.parquet")))
    assert n_after == 2 < n_before
    # replaying a folded batch id must refuse (its rows now live in the
    # consolidated partition — an overwrite would duplicate them), and the
    # horizon must survive a store reopen from disk
    assert DeltaDedup(spark, str(root), CFG).compacted_through() == 1
    with pytest.raises(ValueError, match="compaction horizon"):
        store.add_batch(b0, batch_id=1)
    # idempotent no-op on an already-single-batch store
    assert store.compact() == {"compacted": False, "n_batches": 1}


def test_interrupted_compaction_refused(spark, tmp_path, corpus):
    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    store.add_batch(_batches(corpus, 3)[0])
    (tmp_path / "store" / "_compact_tmp").mkdir()
    with pytest.raises(ValueError, match="_compact_tmp"):
        DeltaDedup(spark, str(tmp_path / "store"), CFG)


def test_store_deduplicate_matches_batch_action(spark, tmp_path, corpus):
    """The store's corpus-level dedup ACTION must agree with the batch
    operator run over the equivalent full-pipeline clusters."""
    from sycl_jaccard_spark.operators.representatives import deduplicate_corpus

    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    for batch in _batches(corpus, 3):
        store.add_batch(batch)
    kept_s, man_s = store.deduplicate(corpus)
    full = DedupPipeline(spark, CFG, enable_substring=False).run(corpus)
    kept_b, man_b = deduplicate_corpus(corpus, full.clusters)
    assert {r["id"] for r in kept_s.collect()} == {r["id"] for r in kept_b.collect()}
    rows = lambda df: {tuple(r) for r in df.select("id", "cluster", "rep_id", "kept").collect()}
    assert rows(man_s) == rows(man_b)


def test_non_latest_replay_refused(spark, tmp_path, corpus):
    """Replaying any batch EXCEPT the latest must refuse: later batches
    already verified cross-batch pairs against its rows, so a re-run would
    re-emit those edges into a second partition (double-counted edges())."""
    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    b0, b1, _ = _batches(corpus, 3)
    store.add_batch(b0, batch_id=0)
    store.add_batch(b1, batch_id=1)
    with pytest.raises(ValueError, match="precedes the latest"):
        store.add_batch(b0, batch_id=0)


def test_incomplete_batch_blocks_new_and_heals_on_replay(spark, tmp_path, corpus):
    """Crash between the files/ write and edges/ completion must be
    detected (reps that were never signed would silently lose every future
    near-dup edge), block NEW batches, and heal when the same batch id is
    replayed."""
    import shutil

    root = tmp_path / "store"
    store = DeltaDedup(spark, str(root), CFG)
    b0, b1, b2 = _batches(corpus, 3)
    store.add_batch(b0, batch_id=0)
    store.add_batch(b1, batch_id=1)
    reference = _clusters(store.clusters())
    # simulate the crash: batch 1's files/ landed but edges/ never completed
    shutil.rmtree(root / "edges" / "batch=1")
    assert store.incomplete_batch_ids() == [1]
    with pytest.raises(ValueError, match="incomplete batch"):
        store.add_batch(b2, batch_id=2)
    # replaying exactly the incomplete id overwrites its partitions and heals
    store.add_batch(b1, batch_id=1)
    assert store.incomplete_batch_ids() == []
    assert _clusters(store.clusters()) == reference
    store.add_batch(b2, batch_id=2)  # and the store accepts new batches again


def test_redelivered_ids_dropped_first_write_wins(spark, tmp_path, corpus):
    """A file id delivered again in a LATER batch (crawler revisit,
    re-pushed delivery) must not duplicate rows in files/ — clusters()
    stays one row per id and the drop is surfaced in the summary."""
    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    b0, b1, _ = _batches(corpus, 3)
    store.add_batch(b0)
    n0 = b0.count()
    redelivery = b1.unionByName(b0.limit(5))  # 5 already-stored ids
    summary = store.add_batch(redelivery)
    assert summary["n_redelivered"] == 5
    assert summary["n_files"] == b1.count()
    clusters = store.clusters()
    assert clusters.count() == n0 + b1.count()
    assert clusters.select("id").distinct().count() == clusters.count()


def test_compact_horizon_written_before_swap(spark, tmp_path, corpus):
    """The compaction horizon must already be on disk when the destructive
    swap begins — a crash mid-swap with no horizon would silently reopen
    the replay window for folded batch ids (duplicated rows on replay).
    Inject a crash at the swap's first _compact_tmp lookup (phase 2 only
    touches that path) and assert the horizon is already advanced and the
    constructor refuses the half-swapped store."""
    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    b0, b1, _ = _batches(corpus, 3)
    store.add_batch(b0, batch_id=0)
    store.add_batch(b1, batch_id=1)

    orig = DeltaDedup._fs

    def crashing_fs(self, path):
        if path.endswith("_compact_tmp/files"):
            raise RuntimeError("injected crash before first rename")
        return orig(self, path)

    DeltaDedup._fs = crashing_fs
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            store.compact()
    finally:
        DeltaDedup._fs = orig
    assert store.compacted_through() == 1
    with pytest.raises(ValueError, match="_compact_tmp"):
        DeltaDedup(spark, str(tmp_path / "store"), CFG)
