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
WCFG = PipelineConfig(candidate_weights="idf")


def _train_idf(spark, files, cfg=WCFG):
    """The library trainer (train_idf_snapshot == the batch pipeline's
    internal IDF training relation; idf_weights is deterministic, so this
    snapshot equals the one DedupPipeline trains — the weighted parity tests
    depend on that), checkpointed for reuse across test assertions."""
    from sycl_jaccard_spark.plans.delta import train_idf_snapshot

    return train_idf_snapshot(files, cfg).localCheckpoint(eager=True)


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


def test_label_overlay_never_rewrites_old_base_partitions(spark, tmp_path, corpus):
    """The label store is an overlay: a delivery appends base rows for
    ENTERING nodes and folds merges into the remap closure — it must never
    rewrite an earlier batch's base partition (that rewrite is the O(corpus)
    cost the overlay exists to remove). Cross-batch merges therefore live in
    the closure until compact() folds them into the base and resets it."""
    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    b = _batches(corpus, 3)
    store.add_batch(b[0])
    root = tmp_path / "store"
    base0 = sorted((root / "label_base" / "batch=0").glob("part-*.parquet"))
    stat0 = [(p.name, p.stat().st_mtime_ns, p.stat().st_size) for p in base0]
    assert stat0, "batch 0 wrote no base rows"

    store.add_batch(b[1])
    store.add_batch(b[2])
    after = [
        (p.name, p.stat().st_mtime_ns, p.stat().st_size)
        for p in sorted((root / "label_base" / "batch=0").glob("part-*.parquet"))
    ]
    assert after == stat0, "a later delivery rewrote batch 0's base partition"

    # the splits share planted clusters, so cross-batch merges must exist —
    # and they are recorded as closure rows, not member rewrites
    closure = store._closure()
    n_remaps = closure.count()
    assert n_remaps > 0, "corpus split produced no cross-batch merges"
    # folded: no closure target is itself a source (one read hop suffices)
    chained = closure.alias("x").join(
        closure.alias("y"), F.col("x.new_label") == F.col("y.old_label")
    )
    assert chained.count() == 0, "closure has chains — not folded"

    before = _clusters(store.clusters())
    store.compact(files_per_relation=2)
    assert store._closure().count() == 0, "compact did not reset the closure"
    assert _clusters(store.clusters()) == before


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


def test_weighted_delta_requires_snapshot(spark, tmp_path):
    """Weighted mode needs a frozen IDF snapshot on a NEW store (per-batch
    IDF would drift and make stored CWS signatures incomparable); a snapshot
    on an unweighted store is meaningless and refused."""
    with pytest.raises(ValueError, match="idf_snapshot"):
        DeltaDedup(spark, str(tmp_path / "s"), WCFG)
    dummy = spark.range(1).select(F.col("id").alias("elem"), F.lit(1.0).alias("w"))
    with pytest.raises(ValueError, match="candidate_weights"):
        DeltaDedup(spark, str(tmp_path / "s2"), CFG, idf_snapshot=dummy)
    empty = spark.createDataFrame([], "elem long, w double")
    with pytest.raises(ValueError, match="empty IDF"):
        DeltaDedup(spark, str(tmp_path / "s3"), WCFG, idf_snapshot=empty)


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


# ---- weighted (frozen-IDF-snapshot) mode ----


def test_weighted_delta_equals_full_run(spark, tmp_path, corpus):
    """Three weighted deliveries against a snapshot trained on the union ==
    one weighted batch pipeline over the union, label for label (the
    pipeline trains the identical IDF internally — idf_weights is
    deterministic over the same uniques)."""
    idf = _train_idf(spark, corpus)
    store = DeltaDedup(spark, str(tmp_path / "store"), WCFG, idf_snapshot=idf)
    for batch in _batches(corpus, 3):
        summary = store.add_batch(batch)
        assert "idf_drift" in summary
    delta = _clusters(store.clusters())

    full = DedupPipeline(spark, WCFG, enable_substring=False).run(corpus)
    assert delta == _clusters(full.clusters)
    assert len(delta) == corpus.count()


def test_weighted_delta_boilerplate_discrimination(spark, tmp_path):
    """The delta store inherits the weighted mode's boilerplate robustness:
    planted pairs split ACROSS deliveries are all found (cross-batch weighted
    candidates + verify), with zero false merges — while the unweighted store
    on the same corpus demonstrably over-merges header-only pairs."""
    from test_dedup_pipeline import _boilerplate_corpus, _cluster_pairs

    files, planted = _boilerplate_corpus(spark)
    files = files.localCheckpoint(eager=True)
    idf = _train_idf(spark, files)
    b0 = files.filter(F.col("id") % 2 == 0)  # routes each planted pair's
    b1 = files.filter(F.col("id") % 2 == 1)  # members to DIFFERENT batches
    store = DeltaDedup(spark, str(tmp_path / "w"), WCFG, idf_snapshot=idf)
    store.add_batch(b0)
    store.add_batch(b1)
    pred = _cluster_pairs(store.clusters())
    assert pred == planted, (
        f"missing {sorted(planted - pred)[:5]} false {sorted(pred - planted)[:5]}"
    )

    unweighted = DeltaDedup(spark, str(tmp_path / "u"), CFG)
    unweighted.add_batch(b0)
    unweighted.add_batch(b1)
    assert _cluster_pairs(unweighted.clusters()) - planted, (
        "corpus no longer discriminates: unweighted delta had no false merges"
    )


def test_weighted_delta_novel_content_signed_and_drift_reported(spark, tmp_path, corpus):
    """Content the snapshot has never seen still gets signed (novel shingles
    take the max-rarity default, same as the streaming leg) and a fully-novel
    near-dup pair clusters; idf_drift quantifies the retrain signal."""
    idf = _train_idf(spark, corpus)
    store = DeltaDedup(spark, str(tmp_path / "store"), WCFG, idf_snapshot=idf)
    s0 = store.add_batch(corpus)
    assert s0["idf_drift"]["novel_elem_frac"] == 0.0

    body = "zq wv xr qj kx " * 30 + "alpha beta gamma delta epsilon " * 20
    novel = spark.createDataFrame(
        [(10_000_001, body), (10_000_002, body + " trailing extra bits")],
        "id long, content string",
    )
    s1 = store.add_batch(novel)
    assert s1["idf_drift"]["novel_elem_frac"] > 0.9
    assert s1["n_new_uniques"] == 2
    c = _clusters(store.clusters())
    assert c[10_000_001] == c[10_000_002]


def test_weighted_delta_replay_idempotent(spark, tmp_path, corpus):
    """Replaying the latest batch id leaves clusters, edges AND the volumes
    relation bit-identical (overwrite-by-partition covers the weighted-only
    relation too)."""
    idf = _train_idf(spark, corpus)
    store = DeltaDedup(spark, str(tmp_path / "store"), WCFG, idf_snapshot=idf)
    b0, b1, _ = _batches(corpus, 3)
    store.add_batch(b0, batch_id=0)
    store.add_batch(b1, batch_id=1)
    before = _clusters(store.clusters())
    vols_before = sorted(
        (r["id"], r["vol"]) for r in spark.read.parquet(store.root + "/volumes").collect()
    )
    store.add_batch(b1, batch_id=1)  # replay
    assert _clusters(store.clusters()) == before
    vols_after = sorted(
        (r["id"], r["vol"]) for r in spark.read.parquet(store.root + "/volumes").collect()
    )
    assert vols_after == vols_before


def test_weighted_delta_snapshot_identity(spark, tmp_path, corpus):
    """Reopening without a snapshot loads the persisted one; reopening with a
    DIFFERENT snapshot is refused (stored CWS signatures are as-of their
    snapshot)."""
    idf = _train_idf(spark, corpus)
    path = str(tmp_path / "store")
    store = DeltaDedup(spark, path, WCFG, idf_snapshot=idf)
    store.add_batch(_batches(corpus, 3)[0])

    reopened = DeltaDedup(spark, path, WCFG)
    assert reopened._novel_weight == store._novel_weight
    reopened_same = DeltaDedup(spark, path, WCFG, idf_snapshot=idf)
    assert reopened_same._novel_weight == store._novel_weight

    other = idf.select("elem", (F.col("w") * 2).alias("w"))
    with pytest.raises(ValueError, match="different IDF snapshot"):
        DeltaDedup(spark, path, WCFG, idf_snapshot=other)


def test_weighted_delta_compact_preserves_and_continues(spark, tmp_path, corpus):
    """compact() folds the weighted-only volumes relation too: clusters
    unchanged, and a post-compaction delivery still reproduces the weighted
    batch pipeline label-for-label."""
    idf = _train_idf(spark, corpus)
    b = _batches(corpus, 3)
    store = DeltaDedup(spark, str(tmp_path / "s"), WCFG, idf_snapshot=idf)
    store.add_batch(b[0])
    store.add_batch(b[1])
    before = _clusters(store.clusters())
    summary = store.compact()
    assert summary["compacted"] and "volumes" in summary["rows"]
    assert _clusters(store.clusters()) == before
    store.add_batch(b[2])
    full = DedupPipeline(spark, WCFG, enable_substring=False).run(corpus)
    assert _clusters(store.clusters()) == _clusters(full.clusters)


def test_weighted_delta_migrate_equals_fresh_batch(spark, tmp_path, corpus):
    """migrate() = retrain IDF on the survivors + re-ingest into a NEW
    store: after deliveries signed against a deliberately STALE snapshot
    (trained on one batch only — drift by construction) and a removal
    epoch, the migrated store's clusters equal one weighted batch pipeline
    run over the surviving corpus (whose internally-trained snapshot the
    retrain reproduces — train_idf_snapshot determinism). The old store is
    untouched (read-only cutover)."""
    b = _batches(corpus, 3)
    stale = _train_idf(spark, b[0])
    old = DeltaDedup(spark, str(tmp_path / "old"), WCFG, idf_snapshot=stale)
    for batch in b:
        old.add_batch(batch)
    removed = [r["id"] for r in corpus.orderBy("id").limit(5).collect()]
    old.remove_ids(removed)
    before = _clusters(old.clusters())

    new = old.migrate(str(tmp_path / "new"), corpus)
    survivors = corpus.filter(~F.col("id").isin(removed))
    full = DedupPipeline(spark, WCFG, enable_substring=False).run(survivors)
    assert _clusters(new.clusters()) == _clusters(full.clusters)
    # read-only cutover: the old store still answers exactly as before, and
    # the migrate event is recorded in its metrics
    assert _clusters(old.clusters()) == before
    assert any(m["stage"] == "migrate" for m in old.metrics)
    # the new store is a normal store: next delivery continues the lifecycle
    novel = spark.createDataFrame(
        [(20_000_001, "wholly new content " * 40)], "id long, content string"
    )
    s = new.add_batch(novel)
    assert s["n_new_uniques"] == 1 and "idf_drift" in s


def test_delta_migrate_guards(spark, tmp_path, corpus):
    """Unweighted stores refuse migrate() (nothing to retrain — a rebuild
    reproduces the same state); a source corpus missing a survivor, or
    duplicating one, is refused BEFORE any signing."""
    u = DeltaDedup(spark, str(tmp_path / "u"), CFG)
    u.add_batch(corpus)
    with pytest.raises(ValueError, match="idf_drift response"):
        u.migrate(str(tmp_path / "un"), corpus)

    idf = _train_idf(spark, corpus)
    w = DeltaDedup(spark, str(tmp_path / "w"), WCFG, idf_snapshot=idf)
    w.add_batch(corpus)
    some_id = corpus.orderBy("id").first()["id"]
    with pytest.raises(ValueError, match="exactly one row per surviving id"):
        w.migrate(str(tmp_path / "m1"), corpus.filter(F.col("id") != some_id))
    with pytest.raises(ValueError, match="exactly one row per surviving id"):
        w.migrate(str(tmp_path / "m2"), corpus.unionByName(corpus.limit(1)))
    # the cancel-out shape: one survivor missing AND another duplicated —
    # the row count matches the survivor count, only distinct ids catch it
    cancel = corpus.filter(F.col("id") != some_id).unionByName(
        corpus.orderBy(F.col("id").desc()).limit(1)
    )
    with pytest.raises(ValueError, match="exactly one row per surviving id"):
        w.migrate(str(tmp_path / "m3"), cancel)


# ---- removals (remove_ids: tombstones, rep succession, component splits) ----


def _removal_set(spark, store, full_clusters):
    """Adversarial removal set: the min id (= label) of the largest cluster,
    one of the STORE's exact-dup representatives that has surviving
    duplicates (store reps are first-seen, not min-id — read them from the
    store, don't recompute), and EVERY member of one small cluster
    (whole-group purge, no successor)."""
    sizes = full_clusters.groupBy("cluster").count()
    big = sizes.orderBy(F.desc("count"), "cluster").first()["cluster"]
    small = sizes.filter("count = 2").orderBy("cluster").first()["cluster"]
    small_ids = [
        r["id"] for r in full_clusters.filter(F.col("cluster") == small).collect()
    ]
    grp = (
        spark.read.parquet(store.root + "/files")
        .groupBy("sha256")
        .agg(
            F.max(F.when(F.col("is_rep"), F.col("id"))).alias("rep"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter("n >= 2")
        .orderBy("rep")
        .first()
    )
    return sorted({big, grp["rep"], *small_ids})


def test_remove_equals_full_run_over_survivors(spark, tmp_path, corpus):
    """remove_ids is the shrink half of the living corpus: after tombstoning
    an adversarial set (a component's min node, an exact-dup rep with
    survivors, a whole small cluster), clusters() must equal one full batch
    pipeline over the SURVIVING corpus, label for label — and stay equal
    after a further delivery that includes near-dups of REMOVED content
    (stale banded rows must not resurrect edges to tombstoned ids)."""
    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    for batch in _batches(corpus, 3):
        store.add_batch(batch)
    full0 = DedupPipeline(spark, CFG, enable_substring=False).run(corpus)
    rm = _removal_set(spark, store, full0.clusters)

    summary = store.remove_ids(rm)
    assert summary["n_removed"] == len(rm)
    assert summary["n_rep_successions"] >= 1
    survivors = corpus.filter(~F.col("id").isin(rm)).localCheckpoint(eager=True)
    full = DedupPipeline(spark, CFG, enable_substring=False).run(survivors)
    assert _clusters(store.clusters()) == _clusters(full.clusters)

    # next delivery: near-dups of surviving AND of removed content
    gone = corpus.filter(F.col("id").isin(rm))
    delivery = (
        survivors.limit(8)
        .unionByName(gone)
        .select(
            (F.col("id") + F.lit(1 << 44)).alias("id"),
            F.concat(F.col("content"), F.lit("\nprobe")).alias("content"),
        )
        .localCheckpoint(eager=True)
    )
    store.add_batch(delivery)
    corpus2 = survivors.unionByName(delivery)
    full2 = DedupPipeline(spark, CFG, enable_substring=False).run(corpus2)
    assert _clusters(store.clusters()) == _clusters(full2.clusters)


def test_remove_rep_succession_and_component_split(spark, tmp_path):
    """Engineered graph: exact group {1,2,3} (content c) plus two near-dups
    n1=10, n2=11 of c that are NOT near-dups of each other — the group is the
    only bridge. Removing the rep (1) must hand the group to the min survivor
    (2) with edges rewritten (component intact); removing the WHOLE group
    must split n1 and n2 into singletons, even though the component's min
    node and every closure/base label referenced the removed ids."""
    toks = [f"tok{i:03d}" for i in range(100)]
    c = " ".join(toks)
    n1 = " ".join([f"aaa{i}" for i in range(12)] + toks[12:])
    n2 = " ".join(toks[:-12] + [f"bbb{i}" for i in range(12)])
    files = spark.createDataFrame(
        [(1, c), (2, c), (3, c), (10, n1), (11, n2)], "id long, content string"
    ).localCheckpoint(eager=True)

    store = DeltaDedup(spark, str(tmp_path / "a"), CFG)
    store.add_batch(files)
    assert set(_clusters(store.clusters()).values()) == {1}

    s1 = store.remove_ids([1])
    assert s1["n_rep_successions"] == 1 and s1["n_edges_rewritten"] >= 2
    c1 = _clusters(store.clusters())
    assert c1 == {2: 2, 3: 2, 10: 2, 11: 2}

    s2 = store.remove_ids([2, 3])
    assert s2["n_rep_successions"] == 0  # whole group gone — no successor
    assert _clusters(store.clusters()) == {10: 10, 11: 11}, "component must split"

    # the same end state in ONE removal epoch (min + rep + group at once)
    store_b = DeltaDedup(spark, str(tmp_path / "b"), CFG)
    store_b.add_batch(files)
    store_b.remove_ids([1, 2, 3])
    assert _clusters(store_b.clusters()) == {10: 10, 11: 11}


def test_remove_replay_idempotent_and_crash_heal(spark, tmp_path, corpus):
    """A removal epoch is replay-safe exactly like a delivery: same batch-id
    sequence, anchor partition (removed/) plus edges/ lineage as the
    completion marker; a crash mid-removal blocks new epochs and heals when
    the same removal is replayed."""
    import shutil

    root = tmp_path / "store"
    store = DeltaDedup(spark, str(root), CFG)
    b0, b1, _ = _batches(corpus, 3)
    store.add_batch(b0, batch_id=0)
    store.add_batch(b1, batch_id=1)
    full0 = DedupPipeline(spark, CFG, enable_substring=False).run(
        b0.unionByName(b1)
    )
    rm = _removal_set(spark, store, full0.clusters)
    rm = [i for i in rm if i in _clusters(store.clusters())][:4]

    store.remove_ids(rm, batch_id=2)
    after = _clusters(store.clusters())
    store.remove_ids(rm, batch_id=2)  # replay: overwrites epoch 2 partitions
    assert _clusters(store.clusters()) == after

    # crash: anchor (removed/) landed, lineage never written
    shutil.rmtree(root / "edges" / "batch=2")
    assert store.incomplete_batch_ids() == [2]
    with pytest.raises(ValueError, match="incomplete batch"):
        store.add_batch(b1.limit(3), batch_id=3)
    with pytest.raises(ValueError, match="incomplete batch"):
        store.remove_ids([999], batch_id=3)
    store.remove_ids(rm, batch_id=2)  # heal
    assert store.incomplete_batch_ids() == []
    assert _clusters(store.clusters()) == after


def test_remove_unknown_or_already_removed_ids(spark, tmp_path, corpus):
    """Unknown ids and already-tombstoned ids are counted and skipped —
    removal requests are idempotent by state; a removed id cannot re-enter
    via add_batch until compact() purges its files/ row."""
    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    b0, _, _ = _batches(corpus, 3)
    store.add_batch(b0)
    victim = b0.orderBy("id").first()
    s1 = store.remove_ids([victim["id"]])
    assert s1["n_removed"] == 1
    before = _clusters(store.clusters())

    s2 = store.remove_ids([victim["id"], 987_654_321])
    assert s2["n_removed"] == 0 and s2["n_requested"] == 2
    assert _clusters(store.clusters()) == before

    # re-delivery of a tombstoned id is dropped (first write still wins)
    s3 = store.add_batch(
        spark.createDataFrame([(victim["id"], victim["content"])], "id long, content string")
    )
    assert s3["n_files"] == 0 and s3["n_redelivered"] == 1
    assert victim["id"] not in _clusters(store.clusters())


def test_compact_purges_tombstoned_rows_and_reopens_ids(spark, tmp_path, corpus):
    """compact() is the physical purge point: after it, NO store relation
    holds a row for a removed id (the GDPR guarantee), clusters are
    unchanged, and the purged id can be re-ingested as a fresh file."""
    root = tmp_path / "store"
    store = DeltaDedup(spark, str(root), CFG)
    for batch in _batches(corpus, 3):
        store.add_batch(batch)
    full0 = DedupPipeline(spark, CFG, enable_substring=False).run(corpus)
    rm = _removal_set(spark, store, full0.clusters)
    store.remove_ids(rm)
    before = _clusters(store.clusters())

    store.compact(files_per_relation=2)
    assert _clusters(store.clusters()) == before
    rm_set = set(rm)
    for rel, cols in [
        ("files", ["id"]), ("shingles", ["id"]), ("banded", ["id"]),
        ("edges", ["a", "b"]), ("label_base", ["node"]), ("removed", ["id"]),
        ("label_fix", ["node"]),
    ]:
        df = spark.read.parquet(str(root / rel))
        hit = df.filter(F.col(cols[0]).isin(list(rm_set)))
        for c in cols[1:]:
            hit = hit.unionByName(df.filter(F.col(c).isin(list(rm_set))), allowMissingColumns=True)
        assert hit.count() == 0, f"{rel} still holds purged rows"
    assert spark.read.parquet(str(root / "removed")).count() == 0
    assert spark.read.parquet(str(root / "label_fix")).count() == 0

    # the purged id is re-ingestable and re-clusters by content
    gone = corpus.filter(F.col("id").isin(rm)).localCheckpoint(eager=True)
    s = store.add_batch(gone)
    assert s["n_files"] == gone.count()
    survivors = corpus.filter(~F.col("id").isin(rm))
    full = DedupPipeline(spark, CFG, enable_substring=False).run(
        survivors.unionByName(gone)
    )
    assert _clusters(store.clusters()) == _clusters(full.clusters)


def test_weighted_remove_equals_full_run(spark, tmp_path, corpus):
    """Removal in the weighted (frozen-IDF) mode: succession must copy the
    volumes relation too, and clusters must match a weighted full run over
    the survivors (the snapshot freezes pre-removal IDF; planted margins are
    far from the threshold, so survivor-trained IDF agrees on every pair)."""
    idf = _train_idf(spark, corpus)
    store = DeltaDedup(spark, str(tmp_path / "store"), WCFG, idf_snapshot=idf)
    for batch in _batches(corpus, 3):
        store.add_batch(batch)
    full0 = DedupPipeline(spark, WCFG, enable_substring=False).run(corpus)
    rm = _removal_set(spark, store, full0.clusters)
    summary = store.remove_ids(rm)
    assert summary["n_rep_successions"] >= 1
    # succession copied the removed reps' volumes under the successor id
    vols = spark.read.parquet(store.root + "/volumes")
    assert vols.filter(F.col("batch") == summary["batch"]).count() == summary["n_rep_successions"]

    survivors = corpus.filter(~F.col("id").isin(rm)).localCheckpoint(eager=True)
    full = DedupPipeline(spark, WCFG, enable_substring=False).run(survivors)
    assert _clusters(store.clusters()) == _clusters(full.clusters)


def test_delta_substring_full_lifecycle_equals_batch(spark, tmp_path):
    """The substring (line-gram containment) pass in the delta store: planted
    shifted-containment pairs are invisible to MinHash-LSH and SimHash by
    construction, so a store WITHOUT the pass misses all of them, and a store
    WITH it must match the batch pipeline (enable_substring=True) label for
    label across the whole lifecycle — cross-batch deliveries, a removal
    epoch, and a compaction fold."""
    from sycl_jaccard_spark.sources.corpus import synth_containment_files

    files, planted = synth_containment_files(spark, n_files=300, pair_frac=0.2, seed=11)
    files = files.localCheckpoint(eager=True)

    # control: no substring leg -> every planted pair is missed
    off = DeltaDedup(spark, str(tmp_path / "off"), CFG)
    for batch in _batches(files, 3):
        off.add_batch(batch)
    lab_off = _clusters(off.clusters())
    assert sum(1 for a, b in planted if lab_off[a] == lab_off[b]) == 0

    store = DeltaDedup(spark, str(tmp_path / "store"), CFG, enable_substring=True)
    for batch in _batches(files, 3):
        store.add_batch(batch)
    full = DedupPipeline(spark, CFG, enable_substring=True, count_rows=False).run(files)
    assert _clusters(store.clusters()) == _clusters(full.clusters)

    # removal epoch: tombstone a few embedded small files — their hosts must
    # fall back to singletons, exactly as a batch rerun over survivors says
    rm_ids = [a for a, _ in sorted(planted)[:5]]
    store.remove_ids(rm_ids)
    survivors = files.filter(~F.col("id").isin(rm_ids)).localCheckpoint(eager=True)
    full_rm = DedupPipeline(spark, CFG, enable_substring=True, count_rows=False).run(
        survivors
    )
    assert _clusters(store.clusters()) == _clusters(full_rm.clusters)

    # compaction: labels invariant, substring band rows survive the fold —
    # a NEW host delivered post-compaction must still pair with its stored
    # embedded file through the containment pass
    before = _clusters(store.clusters())
    store.compact(files_per_relation=2)
    assert _clusters(store.clusters()) == before
    surv_small = sorted(a for a, _ in planted if a not in rm_ids)[0]
    content = files.filter(F.col("id") == surv_small).first().content
    new_host = spark.createDataFrame(
        [(10**9, "x = 0\n" * 40 + content + "y = 1\n" * 40)], "id long, content string"
    )
    store.add_batch(new_host)
    after = _clusters(store.clusters())
    assert after[10**9] == after[surv_small]


def test_delta_substring_config_guard(spark, tmp_path, corpus):
    """enable_substring is part of the store fingerprint when ON: reopening
    with the flag flipped must refuse (mixed banded relations), while stores
    written with the default keep their pre-substring fingerprint."""
    store = DeltaDedup(spark, str(tmp_path / "s"), CFG, enable_substring=True)
    store.add_batch(_batches(corpus, 3)[0])
    with pytest.raises(ValueError, match="different config"):
        DeltaDedup(spark, str(tmp_path / "s"), CFG)
    # and the reverse direction
    plain = DeltaDedup(spark, str(tmp_path / "p"), CFG)
    plain.add_batch(_batches(corpus, 3)[0])
    with pytest.raises(ValueError, match="different config"):
        DeltaDedup(spark, str(tmp_path / "p"), CFG, enable_substring=True)


def test_weighted_delta_substring_equals_batch(spark, tmp_path):
    """The weighted (frozen-IDF) mode and the substring containment pass
    COMPOSE in the store: planted shifted-containment pairs — invisible to
    CWS-MinHash-LSH banding by construction — are surfaced by the line-gram
    leg and accepted by the count-based containment rule riding the weighted
    verify's with_counts aggregations, matching the weighted batch pipeline
    (candidate_weights="idf", enable_substring=True) label for label across
    cross-batch deliveries."""
    from sycl_jaccard_spark.sources.corpus import synth_containment_files

    files, planted = synth_containment_files(spark, n_files=200, pair_frac=0.2, seed=13)
    files = files.localCheckpoint(eager=True)
    idf = _train_idf(spark, files)

    store = DeltaDedup(
        spark, str(tmp_path / "ws"), WCFG, enable_substring=True, idf_snapshot=idf
    )
    for batch in _batches(files, 2):
        store.add_batch(batch)
    lab = _clusters(store.clusters())
    assert all(lab[a] == lab[b] for a, b in planted)

    full = DedupPipeline(spark, WCFG, enable_substring=True, count_rows=False).run(files)
    assert lab == _clusters(full.clusters)


def test_delta_winnow_pass_equals_batch(spark, tmp_path):
    """substring_pass="winnow" flows through the store via the shared
    substring_band_hashes dispatch: a winnow store matches the winnow batch
    pipeline label for label on the re-wrapped containment corpus (where the
    default line-gram pass finds nothing), and the pass choice is part of
    the store fingerprint — a linegram store refuses a winnow reopen."""
    from sycl_jaccard_spark.sources.corpus import synth_containment_files

    wcfg = PipelineConfig(substring_pass="winnow")
    files, planted = synth_containment_files(
        spark, n_files=200, pair_frac=0.2, seed=13, rewrap=3
    )
    files = files.localCheckpoint(eager=True)

    store = DeltaDedup(spark, str(tmp_path / "wn"), wcfg, enable_substring=True)
    for batch in _batches(files, 2):
        store.add_batch(batch)
    full = DedupPipeline(
        spark, wcfg, enable_substring=True, count_rows=False
    ).run(files)
    lab = _clusters(store.clusters())
    assert lab == _clusters(full.clusters)
    assert all(lab[a] == lab[b] for a, b in planted)

    with pytest.raises(ValueError, match="different config"):
        DeltaDedup(spark, str(tmp_path / "wn"), CFG, enable_substring=True)


# ---- incremental decontamination (store-integrated benchmark hygiene) ----


def _bench_from_contents(spark, files, ids, cfg=CFG):
    """Benchmark items whose n-gram sets ARE selected corpus files' shingle
    sets (a verbatim leak: containment 1.0 by construction), hashed with the
    store's own shingle config — the shape contract of bench_snapshot=."""
    from sycl_jaccard_spark.functions.shingles import doc_shingle_hashes

    return (
        files.filter(F.col("id").isin(ids))
        .select(
            F.col("id").alias("bench_id"),
            doc_shingle_hashes(F.col("content"), cfg).alias("ngram_hashes"),
        )
        .localCheckpoint(eager=True)
    )


def _batch_manifest(spark, files, bench, threshold, cfg=CFG):
    """The batch operator's manifest over the full corpus — the oracle the
    incremental manifest must reproduce score-for-score."""
    from sycl_jaccard_spark.functions.shingles import doc_shingle_hashes
    from sycl_jaccard_spark.operators.decontaminate import (
        contamination_overlap,
        decontamination_manifest,
    )

    docs = files.select(
        F.col("id").alias("doc_id"),
        doc_shingle_hashes(F.col("content"), cfg).alias("ngram_hashes"),
    )
    return decontamination_manifest(
        files.select(F.col("id").alias("doc_id")),
        contamination_overlap(docs, bench, id_col="doc_id"),
        threshold=threshold,
        id_col="doc_id",
    )


def _manifest_dict(df) -> dict:
    return {
        r["doc_id"]: (round(r["max_containment"], 12), r["contaminated"])
        for r in df.collect()
    }


def test_delta_decontam_equals_batch_manifest(spark, tmp_path, corpus):
    """Three deliveries through a bench-enabled store == ONE batch probe of
    the unioned corpus, score-for-score and verdict-for-verdict — per-batch
    probe cost stays O(Δ never-seen contents) while the manifest stays
    corpus-complete (exact copies inherit through sha256)."""
    leak_ids = [r["id"] for r in corpus.orderBy("id").limit(2).collect()]
    bench = _bench_from_contents(spark, corpus, leak_ids)
    store = DeltaDedup(
        spark, str(tmp_path / "store"), CFG, bench_snapshot=bench
    )
    probed = 0
    for batch in _batches(corpus, 3):
        summary = store.add_batch(batch)
        assert summary["decontam"]["n_probed"] == summary["n_new_uniques"]
        probed += summary["decontam"]["n_probed"]
    # only never-seen contents ever pay a probe
    assert probed == corpus.select("content").distinct().count()

    got = _manifest_dict(store.contamination_manifest(threshold=0.8))
    expected = _manifest_dict(
        _batch_manifest(spark, corpus, bench, threshold=0.8)
    )
    assert got == expected
    # the planted verbatim leaks flag at containment 1.0
    for lid in leak_ids:
        assert got[lid] == (1.0, True)
    assert sum(1 for _, c in got.values() if c) >= len(leak_ids)


def test_delta_decontam_action_replay_and_snapshot_identity(
    spark, tmp_path, corpus
):
    """The drop action removes exactly the flagged rows; replaying the latest
    delivery leaves the manifest unchanged (partition-overwrite idempotence);
    reopening without the arg works, with a DIFFERENT benchmark set refuses,
    and retroactive enabling on a bench-less store refuses."""
    leak_ids = [r["id"] for r in corpus.orderBy("id").limit(1).collect()]
    bench = _bench_from_contents(spark, corpus, leak_ids)
    path = str(tmp_path / "store")
    store = DeltaDedup(spark, path, CFG, bench_snapshot=bench)
    batches = _batches(corpus, 2)
    for b in batches:
        last = store.add_batch(b)
    before = _manifest_dict(store.contamination_manifest(threshold=0.8))

    kept, manifest = store.decontaminate(corpus, threshold=0.8)
    flagged = {d for d, (_, c) in before.items() if c}
    assert {r["id"] for r in kept.collect()} == set(before) - flagged
    assert leak_ids[0] in flagged

    # at-least-once replay of the latest batch
    store.add_batch(batches[-1], batch_id=last["batch"])
    assert _manifest_dict(store.contamination_manifest(threshold=0.8)) == before

    # reopen without the arg: loads the persisted snapshot
    re1 = DeltaDedup(spark, path, CFG)
    assert _manifest_dict(re1.contamination_manifest(threshold=0.8)) == before
    # a different benchmark set is refused (scores are as-of the stored one)
    other = _bench_from_contents(
        spark, corpus, [r["id"] for r in corpus.orderBy(F.desc("id")).limit(1).collect()]
    )
    with pytest.raises(ValueError, match="different benchmark"):
        DeltaDedup(spark, path, CFG, bench_snapshot=other)
    # retroactive enabling on a store created without a bench leg
    plain = DeltaDedup(spark, str(tmp_path / "plain"), CFG)
    plain.add_batch(batches[0])
    with pytest.raises(ValueError, match="retroactively"):
        DeltaDedup(spark, str(tmp_path / "plain"), CFG, bench_snapshot=bench)
    with pytest.raises(ValueError, match="no benchmark snapshot"):
        plain.contamination_manifest()


def test_delta_decontam_survives_removal_and_compaction(spark, tmp_path, corpus):
    """Tombstoned ids leave the manifest (their surviving exact copies keep
    the content's score); compact() folds the contam relation without
    changing any surviving score; post-compact deliveries keep probing."""
    batches = _batches(corpus, 3)
    # leak ids from an ALREADY-INGESTED batch: an id removed before its own
    # delivery would (correctly) return when that delivery arrives —
    # remove-then-redeliver means the content is back
    leak_ids = [r["id"] for r in batches[0].orderBy("id").limit(2).collect()]
    bench = _bench_from_contents(spark, corpus, leak_ids)
    store = DeltaDedup(
        spark, str(tmp_path / "store"), CFG, bench_snapshot=bench
    )
    for b in batches[:2]:
        store.add_batch(b)
    store.remove_ids([leak_ids[0]])
    m = _manifest_dict(store.contamination_manifest(threshold=0.8))
    assert leak_ids[0] not in m
    surv_before = m

    store.compact()
    assert _manifest_dict(store.contamination_manifest(threshold=0.8)) == surv_before

    summary = store.add_batch(batches[2])
    assert "decontam" in summary
    got = _manifest_dict(store.contamination_manifest(threshold=0.8))
    expected = _manifest_dict(
        _batch_manifest(
            spark,
            corpus.join(
                spark.createDataFrame([(leak_ids[0],)], "id long"), "id", "left_anti"
            ),
            bench,
            threshold=0.8,
        )
    )
    assert got == expected


def test_delta_training_set_composes_with_succession(spark, tmp_path):
    """store.training_set: one corpus action = decontaminate FIRST, then
    dedup the survivors. A near-dup cluster whose LONGEST member is the
    benchmark leak keeps its longest CLEAN member (representative
    succession); exact copies of the leak inherit contamination through
    sha256 and never usurp the representative slot."""
    base = " ".join(f"tok{t}" for t in range(120))
    a = base + " " + " ".join(f"extra{t}" for t in range(30))   # longest, leak
    b = base                                                    # longest clean
    c = " ".join(base.split()[:96])                             # truncated dup
    d = " ".join(f"other{t}" for t in range(80))                # unrelated
    files = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, d), (5, a)],  # 5 = exact copy of the leak
        "id long, content string",
    ).localCheckpoint(eager=True)
    bench = _bench_from_contents(spark, files, [1])
    store = DeltaDedup(
        spark, str(tmp_path / "store"), CFG, bench_snapshot=bench
    )
    for batch in _batches(files, 2):
        store.add_batch(batch)
    # sanity: a/b/c/5 really are one cluster and only exact-content copies
    # of the leak flag at threshold 0.999
    labels = _clusters(store.clusters())
    assert labels[1] == labels[2] == labels[3] == labels[5] != labels[4]

    kept, manifest = store.training_set(files, threshold=0.999)
    assert {r.id for r in kept.collect()} == {2, 4}
    m = {r.id: r for r in manifest.collect()}
    assert not m[1].keep and m[1].drop_reason == "contaminated"
    assert not m[5].keep and m[5].drop_reason == "contaminated"  # sha256 inherit
    assert m[2].keep and m[2].rep_id == 2 and m[2].drop_reason is None
    assert not m[3].keep and m[3].drop_reason == "duplicate" and m[3].rep_id == 2
    assert m[4].keep and m[4].drop_reason is None
    # the batch operator over the store's own relations agrees row-for-row
    from sycl_jaccard_spark.operators.representatives import training_set

    _, expect = training_set(
        files, store.clusters(), store.contamination_manifest(threshold=0.999)
    )
    assert {tuple(r) for r in manifest.collect()} == {
        tuple(r) for r in expect.collect()
    }


def test_remove_successor_chains_succession(spark, tmp_path):
    """Review regression: removing a succession SUCCESSOR must trigger a
    second succession. Effective rep-ness is live derived rows, not the
    static files.is_rep flag — previously the group's survivors silently
    lost their identity and the store split clusters a full run keeps."""
    base = " ".join(f"tok{t}" for t in range(60))
    near = " ".join(f"tok{t}" for t in range(57)) + " zzz yyy xxx"
    files = spark.createDataFrame(
        [(1, base), (2, base), (3, base), (10, near)],
        "id long, content string",
    ).localCheckpoint(eager=True)
    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    store.add_batch(files)
    labs = _clusters(store.clusters())
    assert labs[1] == labs[2] == labs[3] == labs[10]

    store.remove_ids(spark.createDataFrame([(1,)], "id long"))
    s2 = store.remove_ids(spark.createDataFrame([(2,)], "id long"))
    assert s2["n_rep_successions"] == 1  # 2 inherited from 1, now 3 inherits
    labs = _clusters(store.clusters())
    full = DedupPipeline(spark, CFG).run(files.filter("id in (3, 10)")).clusters
    tl = _clusters(full)
    assert (labs[3] == labs[10]) == (tl[3] == tl[10])
    assert set(labs) == {3, 10}


def test_compact_refuses_incomplete_epoch(spark, tmp_path, corpus):
    """Review regression: compact() on a store with a crashed (lineage-less)
    last epoch must refuse — folding it would erase the crash marker and
    permanently orphan the half-ingested rows."""
    import os

    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    for b in _batches(corpus, 2):
        store.add_batch(b)
    # simulate the crash: drop the final-relation lineage of the last epoch
    last = store.batch_ids()[-1]
    os.remove(str(tmp_path / "store" / "edges" / f"batch={last}" / "_lineage.json"))
    assert store.incomplete_batch_ids() == [last]
    with pytest.raises(ValueError, match="incomplete batch"):
        store.compact()


def test_torn_closure_write_falls_back(spark, tmp_path, corpus):
    """Review regression: a torn label_remaps rewrite (version dir without
    _SUCCESS) must fall back to the previous complete closure, not silently
    read an empty one and resolve stale labels."""
    import os
    import shutil

    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    for b in _batches(corpus, 3):
        store.add_batch(b)
    before = _clusters(store.clusters())
    vdir = str(tmp_path / "store" / "label_remaps")
    versions = sorted(
        int(d.split("=")[1]) for d in os.listdir(vdir) if d.startswith("v=")
    )
    assert versions, "expected versioned closure layout"
    # simulate a crash mid-rewrite: a NEWER version dir with no _SUCCESS
    torn = f"{vdir}/v={versions[-1] + 1}"
    shutil.copytree(f"{vdir}/v={versions[-1]}", torn)
    os.remove(f"{torn}/_SUCCESS")
    store2 = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    assert _clusters(store2.clusters()) == before


def test_add_batch_rejects_duplicate_ids(spark, tmp_path):
    """Review regression: a duplicate id WITHIN a delivery would corrupt the
    append-only files relation — refused loudly instead."""
    files = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff gg hh"), (1, "ii jj kk ll mm nn oo pp")],
        "id long, content string",
    )
    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    with pytest.raises(ValueError, match="duplicate id"):
        store.add_batch(files)


def test_bench_snapshot_normalization(spark, tmp_path):
    """Review regression: (a) string bench ids (silent NULL cast -> zero
    contamination) are refused; (b) an int-typed bench_id reopens cleanly
    against its stored long copy (dtype-sensitive fingerprint)."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{k}" for k in range(30))) for i in range(6)],
        "id long, content string",
    )
    bench_str = spark.createDataFrame(
        [("mmlu-1", docs.collect()[0].content)], "bench_id string, content string"
    )
    from sycl_jaccard_spark.functions.shingles import doc_shingle_hashes

    def sign(b):
        return b.select(
            "bench_id", doc_shingle_hashes(F.col("content"), CFG).alias("ngram_hashes")
        )

    with pytest.raises(ValueError, match="cast to long"):
        DeltaDedup(spark, str(tmp_path / "s1"), CFG, bench_snapshot=sign(bench_str))

    bench_int = spark.createDataFrame(
        [(1, docs.collect()[0].content)], "bench_id int, content string"
    )
    store = DeltaDedup(
        spark, str(tmp_path / "s2"), CFG, bench_snapshot=sign(bench_int)
    )
    store.add_batch(docs)
    # reopen with the SAME int-typed snapshot: must not spuriously refuse
    store2 = DeltaDedup(
        spark, str(tmp_path / "s2"), CFG, bench_snapshot=sign(bench_int)
    )
    assert store2.contamination_manifest(0.5).filter("contaminated").count() == 1


def test_replay_after_closure_commit_keeps_labels(spark, tmp_path):
    """Review regression: an epoch that crashed AFTER its closure version
    committed but BEFORE lineage must replay without losing the entering
    node's base row — previously the replay's contracted edges collapsed to
    self-loops (the merge was already in the closure), CC returned nothing,
    and the overwrite erased the row, permanently splitting the component
    at the next epoch."""
    import os

    base = " ".join(f"tok{t}" for t in range(60))
    near = " ".join(f"tok{t}" for t in range(57)) + " zzz yyy xxx"
    b0 = spark.createDataFrame([(10, base), (12, base)], "id long, content string")
    b1 = spark.createDataFrame([(5, near)], "id long, content string")
    store = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    store.add_batch(b0)
    store.add_batch(b1)  # 5 < 10: the merge remaps 10 -> 5 in the closure
    before = _clusters(store.clusters())
    assert before == {10: 5, 12: 5, 5: 5}
    # simulate the crash window: lineage is the LAST write of the epoch,
    # the closure version committed just before it
    os.remove(str(tmp_path / "store" / "edges" / "batch=1" / "_lineage.json"))
    store2 = DeltaDedup(spark, str(tmp_path / "store"), CFG)
    assert store2.incomplete_batch_ids() == [1]
    store2.add_batch(b1, batch_id=1)  # healing replay
    assert _clusters(store2.clusters()) == before
    # the next epoch links a new node through 5: ONE component, not two
    store2.add_batch(
        spark.createDataFrame([(3, near)], "id long, content string")
    )
    labs = _clusters(store2.clusters())
    assert set(labs.values()) == {3}, labs
