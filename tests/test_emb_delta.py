"""Incremental embedding near-dup store: the delta runner must be
edge-for-edge and label-for-label equivalent to one batch
``embedding_near_dups`` + connected-components run over the unioned corpus
(the dense-vector twin of the text delta≡full theorem), idempotent under
batch replay, and frozen-codebook guarded."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sycl_jaccard_spark.operators.ann import (
    embedding_near_dups,
    quantized_centroids,
    train_ivf_centroids,
)
from sycl_jaccard_spark.plans.emb_delta import EmbeddingDeltaStore
from tests.conftest import UnionFind

DIM = 16
K = 8
NPROBE = 2
SEED = 42
THRESHOLD = 0.95
CAP = 10**9  # parity tests run uncapped (cap parity caveat same as text)


def _emb_corpus(spark, n=150, n_clusters=20, seed=11):
    """Deterministic synthetic embeddings: ~2/3 of ids are members of tight
    planted clusters (pairwise cosine ≳ 0.999), the rest are random unit
    vectors (near-orthogonal at dim 16 — no planted pair crosses 0.95)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        if i % 3 != 2:
            v = centers[i % n_clusters] + rng.normal(scale=0.01, size=DIM)
        else:
            v = rng.normal(size=DIM)
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint(eager=True)


def _batches(vectors, n):
    """Disjoint split by row-hash pmod — arrival order uncorrelated with id
    order (same convention as the text delta tests)."""
    return [
        vectors.filter(F.pmod(F.xxhash64("vec_id"), F.lit(n)) == i) for i in range(n)
    ]


def _batch_state(spark, vectors, cb, threshold=THRESHOLD):
    """(edge set, label dict) from the BATCH path: embedding_near_dups with
    the same frozen codebook + driver-side union-find over its edges."""
    edges = embedding_near_dups(
        vectors, dim=DIM, threshold=threshold, method="ivf",
        n_centroids=K, nprobe=NPROBE, seed=SEED, bucket_cap=CAP, centroids_q=cb,
    ).collect()
    uf = UnionFind()
    for r in edges:
        uf.union(r["a"], r["b"])
    lab = uf.labels()
    ids = [r["vec_id"] for r in vectors.select("vec_id").collect()]
    return (
        {(r["a"], r["b"]) for r in edges},
        {i: lab.get(i, i) for i in ids},
    )


def _store_state(store):
    return (
        {(r["a"], r["b"]) for r in store.edges().collect()},
        {r["id"]: r["cluster"] for r in store.clusters().collect()},
    )


@pytest.fixture(scope="module")
def corpus(spark):
    return _emb_corpus(spark)


@pytest.fixture(scope="module")
def codebook(spark, corpus):
    return train_ivf_centroids(
        corpus, dim=DIM, n_centroids=K, n_iters=2, seed=SEED
    )


def test_emb_delta_equals_batch_run(spark, tmp_path, corpus, codebook):
    """Three deliveries through the store == one batch embedding_near_dups +
    CC over the union: same edge set, same (id, cluster) labels."""
    store = EmbeddingDeltaStore(
        spark, str(tmp_path / "store"), DIM, codebook,
        threshold=THRESHOLD, nprobe=NPROBE, bucket_cap=CAP,
    )
    for b in _batches(corpus, 3):
        store.add_batch(b)
    got_edges, got_labels = _store_state(store)
    exp_edges, exp_labels = _batch_state(spark, corpus, codebook)
    assert got_edges == exp_edges
    assert got_labels == exp_labels
    # the planted clusters actually exercise the path (non-trivial graph)
    assert len(exp_edges) > 20


def test_emb_delta_incremental_cc_equals_full(spark, tmp_path, corpus, codebook):
    batches = _batches(corpus, 3)
    inc = EmbeddingDeltaStore(
        spark, str(tmp_path / "inc"), DIM, codebook,
        threshold=THRESHOLD, bucket_cap=CAP, cc_mode="incremental",
    )
    ful = EmbeddingDeltaStore(
        spark, str(tmp_path / "ful"), DIM, codebook,
        threshold=THRESHOLD, bucket_cap=CAP, cc_mode="full",
    )
    for b in batches:
        s_i = inc.add_batch(b)
        s_f = ful.add_batch(b)
        assert s_i["n_new_edges"] == s_f["n_new_edges"]
    assert _store_state(inc) == _store_state(ful)


def test_emb_delta_replay_idempotent(spark, tmp_path, corpus, codebook):
    """Replaying the LATEST delivery overwrites its partitions: same edges,
    same labels, no duplicate rows (at-least-once safety)."""
    batches = _batches(corpus, 2)
    store = EmbeddingDeltaStore(
        spark, str(tmp_path / "store"), DIM, codebook,
        threshold=THRESHOLD, bucket_cap=CAP,
    )
    store.add_batch(batches[0], batch_id=0)
    store.add_batch(batches[1], batch_id=1)
    before = _store_state(store)
    n_edge_rows = store.edges().count()
    store.add_batch(batches[1], batch_id=1)  # replay
    assert _store_state(store) == before
    assert store.edges().count() == n_edge_rows


def test_emb_redelivered_ids_dropped(spark, tmp_path, corpus, codebook):
    """An id delivered twice (crawler revisit) keeps its first row; the
    second delivery reports the drop."""
    batches = _batches(corpus, 2)
    store = EmbeddingDeltaStore(
        spark, str(tmp_path / "s"), DIM, codebook, threshold=THRESHOLD, bucket_cap=CAP
    )
    s0 = store.add_batch(batches[0])
    s1 = store.add_batch(batches[0].unionByName(batches[1]))
    assert s1["n_redelivered"] == s0["n_new"]
    assert store.clusters().count() == corpus.count()


def test_emb_codebook_and_config_guards(spark, tmp_path, corpus, codebook):
    store = EmbeddingDeltaStore(
        spark, str(tmp_path / "s"), DIM, codebook, threshold=THRESHOLD, bucket_cap=CAP
    )
    store.add_batch(_batches(corpus, 2)[0])
    # reopen without centroids: loads the persisted codebook
    re = EmbeddingDeltaStore(
        spark, str(tmp_path / "s"), DIM, threshold=THRESHOLD, bucket_cap=CAP
    )
    assert np.array_equal(re._codebook, codebook)
    # different codebook refused
    other = quantized_centroids(DIM, K, seed=SEED + 1)
    with pytest.raises(ValueError, match="different codebook"):
        EmbeddingDeltaStore(
            spark, str(tmp_path / "s"), DIM, other, threshold=THRESHOLD, bucket_cap=CAP
        )
    # different scoring config refused (threshold changes the fingerprint)
    with pytest.raises(ValueError, match="different config"):
        EmbeddingDeltaStore(
            spark, str(tmp_path / "s"), DIM, threshold=0.5, bucket_cap=CAP
        )
    # a NEW store requires an explicit codebook
    with pytest.raises(ValueError, match="requires centroids_q"):
        EmbeddingDeltaStore(spark, str(tmp_path / "fresh"), DIM, threshold=THRESHOLD)


def test_emb_remove_equals_batch_over_survivors(spark, tmp_path, corpus, codebook):
    """Tombstone epoch + affected-component relabel == batch run over the
    surviving vectors (same frozen codebook)."""
    store = EmbeddingDeltaStore(
        spark, str(tmp_path / "s"), DIM, codebook, threshold=THRESHOLD, bucket_cap=CAP
    )
    for b in _batches(corpus, 2):
        store.add_batch(b)
    _, labels = _store_state(store)
    # remove the min-id member of some clusters (forces relabeling) plus a
    # singleton and an unknown id (idempotence by state)
    clustered = sorted({v for k, v in labels.items() if k != v})
    rm = clustered[:3] + [max(labels) + 1000]
    summary = store.remove_ids(rm)
    assert summary["n_already_absent"] == 1
    assert summary["n_members_fixed"] > 0
    survivors = corpus.filter(~F.col("vec_id").isin([int(x) for x in rm]))
    exp_edges, exp_labels = _batch_state(spark, survivors, codebook)
    got_edges, got_labels = _store_state(store)
    assert got_edges == exp_edges
    assert got_labels == exp_labels


def test_emb_compact_preserves_state_and_continues(spark, tmp_path, corpus, codebook):
    """compact() folds batch partitions + purges tombstones; labels and
    edges are invariant and later deliveries keep working."""
    batches = _batches(corpus, 3)
    store = EmbeddingDeltaStore(
        spark, str(tmp_path / "s"), DIM, codebook, threshold=THRESHOLD, bucket_cap=CAP
    )
    store.add_batch(batches[0])
    store.add_batch(batches[1])
    _, labels = _store_state(store)
    rm = [min(labels)]
    store.remove_ids(rm)
    before = _store_state(store)
    summary = store.compact()
    assert summary["compacted"]
    assert _store_state(store) == before
    # tombstoned rows physically purged
    purged = store._read("vectors", store._relations["vectors"])
    assert purged.filter(F.col("id").isin([int(x) for x in rm])).count() == 0
    # store keeps working post-compaction and still matches batch
    store.add_batch(batches[2])
    survivors = corpus.filter(~F.col("vec_id").isin([int(x) for x in rm]))
    exp = _batch_state(spark, survivors, codebook)
    assert _store_state(store) == exp
    # replay window closed for folded ids
    with pytest.raises(ValueError, match="compaction horizon"):
        store.add_batch(batches[0], batch_id=0)


def test_emb_exact_duplicate_vectors_connect(spark, tmp_path, codebook):
    """Identical embeddings delivered under different ids in different
    batches connect through the IVF path itself (cosine 1.0) — the embedding
    store needs no sha256 pre-pass."""
    rng = np.random.default_rng(5)
    v = rng.normal(size=DIM)
    v = [float(x) for x in v / np.linalg.norm(v)]
    w = rng.normal(size=DIM)
    w = [float(x) for x in w / np.linalg.norm(w)]
    store = EmbeddingDeltaStore(
        spark, str(tmp_path / "s"), DIM, codebook, threshold=THRESHOLD, bucket_cap=CAP
    )
    store.add_batch(
        spark.createDataFrame([(1, v), (2, w)], "vec_id long, embedding array<float>")
    )
    store.add_batch(
        spark.createDataFrame([(3, v)], "vec_id long, embedding array<float>")
    )
    edges = {(r["a"], r["b"]): r["cosine"] for r in store.edges().collect()}
    assert edges[(1, 3)] == pytest.approx(1.0)
    labels = {r["id"]: r["cluster"] for r in store.clusters().collect()}
    assert labels == {1: 1, 2: 2, 3: 1}


def test_emb_streaming_store_equals_batch(spark, tmp_path, corpus, codebook):
    """Streaming leg: two availableNow waves through
    foreachBatch(emb_store_batch_writer) must leave the store edge-for-edge
    and label-for-label equal to the batch path over all vectors — the
    dense-vector twin of test_streaming_delta_store_equals_full_run."""
    from sycl_jaccard_spark.streaming.ingest import emb_store_batch_writer

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    store = EmbeddingDeltaStore(
        spark, str(tmp_path / "store"), DIM, codebook,
        threshold=THRESHOLD, nprobe=NPROBE, bucket_cap=CAP,
    )
    waves = _batches(corpus, 2)
    for wave in waves:
        wave.write.mode("append").parquet(src)
        q = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .parquet(src)
            .writeStream.foreachBatch(emb_store_batch_writer(store))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    expect = _batch_state(spark, corpus, codebook)
    assert _store_state(store) == expect
    assert store.clusters().count() == corpus.count()


def test_emb_codebook_drift_reported(spark, tmp_path, corpus, codebook):
    """Codebook-fit drift: an in-distribution delivery sets the baseline; an
    out-of-distribution delivery (vectors in the null space of the trained
    codebook — cosine ~0 to EVERY centroid by construction) must report a
    positive drop_vs_baseline — the retrain signal. The baseline is frozen
    at first delivery (replays don't move it)."""
    store = EmbeddingDeltaStore(
        spark, str(tmp_path / "store"), DIM, codebook,
        threshold=THRESHOLD, nprobe=NPROBE, bucket_cap=CAP,
    )
    s0 = store.add_batch(corpus, batch_id=0)
    d0 = s0["codebook_drift"]
    assert d0["baseline_mean"] == d0["assign_cos_mean"]
    assert d0["drop_vs_baseline"] == 0.0
    assert -1.0 <= d0["assign_cos_p10"] <= d0["assign_cos_mean"] <= 1.0

    # orthonormal basis of the codebook's null space (K < DIM): every OOD
    # vector has exact float cosine 0 to every centroid; only quantization
    # rounding (~1e-4) survives
    _u, _s, vt = np.linalg.svd(codebook.astype(np.float64))
    null_basis = vt[np.linalg.matrix_rank(codebook):]
    assert len(null_basis) >= 2
    ood = spark.createDataFrame(
        [(10_000 + i, [float(x) for x in null_basis[i % len(null_basis)]])
         for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    s1 = store.add_batch(ood, batch_id=1)
    d1 = s1["codebook_drift"]
    assert d1["baseline_mean"] == d0["assign_cos_mean"]  # frozen
    assert d1["drop_vs_baseline"] > 0.1
    assert d1["assign_cos_mean"] < d0["assign_cos_mean"]

    # replay of the OOD batch reports the same numbers and keeps the baseline
    s1r = store.add_batch(ood, batch_id=1)
    assert s1r["codebook_drift"] == d1


def test_emb_migrate_retrains_and_equals_batch(spark, tmp_path, corpus, codebook):
    """migrate() — the retrain-and-reingest lifecycle: after deliveries and a
    removal on a stale seeded codebook, migrating must (a) train the same
    codebook a from-scratch training run over the survivors produces (the
    exact vq→float round-trip), (b) leave the new store edge-for-edge equal
    to a batch run over the survivors under that codebook, and (c) leave the
    old store untouched."""
    from sycl_jaccard_spark.operators.ann import _quantized

    stale = quantized_centroids(DIM, K, seed=3)  # pretend-drifted codebook
    store = EmbeddingDeltaStore(
        spark, str(tmp_path / "old"), DIM, stale,
        threshold=THRESHOLD, nprobe=NPROBE, bucket_cap=CAP,
    )
    batches = _batches(corpus, 2)
    store.add_batch(batches[0])
    store.add_batch(batches[1])
    rm = [r["vec_id"] for r in batches[0].select("vec_id").limit(10).collect()]
    store.remove_ids(rm)
    old_state = _store_state(store)
    survivors = corpus.filter(~F.col("vec_id").isin(rm)).localCheckpoint(eager=True)

    # vq -> float32 -> vq round-trip is exact (migrate's correctness hinge)
    rt = {
        (r["vec_id"], tuple(r["rq"]))
        for r in store.surviving_vectors()
        .select("vec_id", _quantized(F.col("embedding")).alias("rq")).collect()
    }
    orig = {
        (r["vec_id"], tuple(r["vq"]))
        for r in survivors.select(
            "vec_id", _quantized(F.col("embedding")).alias("vq")
        ).collect()
    }
    assert rt == orig

    new = store.migrate(str(tmp_path / "new"), n_centroids=K, n_iters=2, seed=SEED)
    cb2 = train_ivf_centroids(survivors, dim=DIM, n_centroids=K, n_iters=2, seed=SEED)
    assert np.array_equal(new._codebook, cb2)
    assert _store_state(new) == _batch_state(spark, survivors, cb2)
    assert _store_state(store) == old_state  # read-only cutover
    assert new.batch_ids() == [0]


def test_emb_add_batch_rejects_duplicate_ids(spark, tmp_path, codebook):
    """Review regression: duplicate vec_ids WITHIN a delivery would fan out
    every downstream join on the append-only vectors relation — refused
    loudly, same contract as the text store."""
    cb = codebook
    v = [float(x) for x in np.ones(DIM) / np.sqrt(DIM)]
    dup = spark.createDataFrame(
        [(7, v), (7, v)], "vec_id long, embedding array<float>"
    )
    store = EmbeddingDeltaStore(
        spark, str(tmp_path / "store"), dim=DIM, centroids_q=cb,
        threshold=THRESHOLD, nprobe=NPROBE,
    )
    with pytest.raises(ValueError, match="duplicate id"):
        store.add_batch(dup)


def test_emb_reopen_wrong_dim_is_config_error(spark, tmp_path, corpus, codebook):
    """Review regression: reopening with a smaller dim raised a raw numpy
    IndexError from the codebook scatter; now a clear config mismatch."""
    store = EmbeddingDeltaStore(
        spark, str(tmp_path / "store"), dim=DIM, centroids_q=codebook,
        threshold=THRESHOLD, nprobe=NPROBE,
    )
    store.add_batch(corpus.limit(10))
    with pytest.raises(ValueError, match="dim"):
        EmbeddingDeltaStore(
            spark, str(tmp_path / "store"), dim=DIM // 2,
            threshold=THRESHOLD, nprobe=NPROBE,
        )
