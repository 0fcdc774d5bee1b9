"""Incremental (delta) embedding near-dup store — the dense-vector sibling
of :class:`~sycl_jaccard_spark.plans.delta.DeltaDedup`, over the embedding
column instead of the text column.

The reference engine is batch-only (``main.cpp:63-361``); the batch ANN path
here (:func:`~sycl_jaccard_spark.operators.ann.embedding_near_dups`) is too:
every run re-assigns, re-joins and re-verifies the whole corpus. A living
100 TB corpus instead receives embedding deliveries continuously (new files
embedded by an upstream model), and this store keeps the near-dup edge set
and cluster labels current at per-delivery cost proportional to the DELTA:

  new batch → quantize + IVF-assign against the FROZEN codebook (one Arrow
  pass) → probe only inverted lists that gained a member (Δ-keys broadcast
  against the scan-only stored lists) → exact quantized cosine for pairs
  touching ≥1 new id (vectors fetched by a broadcast semi-join probe) →
  append edges → incremental connected components over the contracted graph.

Store layout (same storage contract as the text store — every additive
relation partitioned by ``batch=<n>``, one epoch-id sequence for additions
and removals, crash-guard lineage, two-phase compaction; all of it inherited
from :class:`~sycl_jaccard_spark.plans.store_base.DeltaStoreBase`):

  store/
    store_config            config fingerprint (mismatch = hard error)
    codebook/               (cid, pos, val)      — frozen trained centroids
    vectors/batch=N/        (id, vq)             — int64-quantized embeddings
    lists/batch=N/          (id, cid)            — probed inverted-list rows
    edges/batch=N/          (a, b, cosine)       — verified near-dup edges
    label_base/batch=N/     (node, label)        — label AT ENTRY, append-only
    label_remaps/           (old_label, new_label) — folded merge closure
    removed/batch=N/        (id)                 — tombstones (remove_ids)
    label_fix/batch=N/      (node, label)        — post-removal labels

The codebook is FROZEN at store creation, the same static-snapshot semantics
as the weighted text store's IDF snapshot: IVF list membership is a function
of the codebook, so re-training it mid-store would make stored list rows
incomparable with new ones (a vector's neighbors would silently change
lists). Construct a new store with ``centroids_q=`` (a trained codebook from
:func:`~sycl_jaccard_spark.operators.ann.train_ivf_centroids`, or the seeded
:func:`~sycl_jaccard_spark.operators.ann.quantized_centroids` stand-in);
reopening verifies the persisted codebook bit-for-bit. When the corpus
drifts from the training sample, retrain and re-ingest into a NEW store.

Correctness contract (tested label-for-label in ``tests/test_emb_delta.py``):
delivering batches B1..Bk yields the SAME edge set and cluster assignment as
one batch ``embedding_near_dups`` + connected-components run over
B1 ∪ ... ∪ Bk with the same codebook/nprobe/threshold/cap, because

* inverted-list memberships only ever grow and the cap keeps lowest ids, so
  every old×old pair inside today's capped list was inside yesterday's —
  pairs touching at least one new id are exactly the missing ones (the
  ``new_col`` filter in ``candidate_pairs``);
* the exact quantized cosine of a pair is delivery-order independent (both
  vq rows are written once, ever).

Exact-duplicate embeddings need no separate pre-pass (unlike the text
store's sha256 stage): identical vectors quantize identically, probe the
same lists, and verify at cosine 1.0 — they connect through the IVF path
itself. The redelivery drop (same id delivered twice) is still enforced.
"""

from __future__ import annotations

import hashlib
import json
import time

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sycl_jaccard_spark.config import PipelineConfig
from sycl_jaccard_spark.operators.ann import (
    VEC_SCALE,
    _dot,
    _norm2,
    _quantized,
    ivf_assign_udf,
    train_ivf_centroids,
)
from sycl_jaccard_spark.operators.lsh import candidate_pairs
from sycl_jaccard_spark.plans.store_base import DeltaStoreBase


class EmbeddingDeltaStore(DeltaStoreBase):
    """Persistent incremental embedding near-dup detection over a growing
    corpus. See the module docstring for the storage and equivalence model.

    ``skew_mode`` carries the text pipeline's inverted-list skew discipline
    to IVF lists (a centroid sitting on a dense boilerplate mode is the
    embedding-space twin of a boilerplate shingle bucket): ``"cap"`` keeps
    the ``bucket_cap`` lowest ids per list, ``"auto"`` salts mid-size lists
    with dynamic fan-out and caps only pathological ones. The label-for-label
    parity guarantee vs the batch path is for ``skew_mode="cap"`` (exact when
    no list exceeds the cap) — identical caveat to the text store."""

    _RELATIONS = {
        "vectors": "id long, vq array<long>",
        "lists": "id long, cid int",
        "edges": "a long, b long, cosine double",
        "label_base": "node long, label long",
    }
    _EPOCH_RELATIONS = {
        "removed": "id long",
        "label_fix": "node long, label long",
    }
    _EPOCH_ANCHORS = ("vectors", "removed")
    _FINAL_RELATION = "edges"
    _ID_RELATION = "vectors"

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        dim: int,
        centroids_q: np.ndarray | None = None,
        threshold: float = 0.9,
        nprobe: int = 2,
        bucket_cap: int = 4096,
        skew_mode: str = "cap",
        cc_mode: str = "incremental",
        max_cc_iterations: int = 50,
        checkpoint_every: int = 5,
    ):
        self.spark = spark
        self.root = store_dir.rstrip("/")
        self.dim = int(dim)
        self.threshold = float(threshold)
        self.nprobe = int(nprobe)
        self.bucket_cap = int(bucket_cap)
        if cc_mode not in ("incremental", "full"):
            raise ValueError(f"unknown cc_mode {cc_mode!r}")
        self.cc_mode = cc_mode
        self._cc_max_iterations = max_cc_iterations
        self._cc_checkpoint_every = checkpoint_every
        # candidate_pairs carries the tested cap/salt/auto machinery; it
        # reads bucket_cap / salt params from a PipelineConfig (validated
        # there, including skew_mode)
        self._ccfg = PipelineConfig(bucket_cap=bucket_cap, skew_mode=skew_mode)
        self._relations = dict(self._RELATIONS)
        self._epoch_relations = dict(self._EPOCH_RELATIONS)
        # the codebook joins the fingerprint as a content digest: opening a
        # store with different centroids is refused BEFORE any relation read
        self._codebook = self._init_codebook(centroids_q)
        self._init_store()

    # ---- frozen codebook ----

    def _init_codebook(self, centroids_q: np.ndarray | None) -> np.ndarray:
        """Load (and on first use persist) the frozen codebook. Persisted as
        a (cid, pos, val) parquet relation — the same layout the training
        oracle uses — and compared BIT-FOR-BIT on reopen (int64 exact, so
        equality is well-defined)."""
        path = f"{self.root}/codebook"
        if self._exists(f"{path}/_SUCCESS"):
            rows = self.spark.read.parquet(path).collect()
            if not rows:
                raise ValueError(
                    f"embedding delta store {self.root} has an empty "
                    "codebook relation — the store is unusable; retrain and "
                    "re-ingest into a new store"
                )
            stored_dim = max(r["pos"] for r in rows) + 1
            if stored_dim != self.dim:
                # raise the intended config mismatch, not an IndexError from
                # the scatter below (this check runs before _check_config)
                raise ValueError(
                    f"embedding delta store {self.root} was written with "
                    f"dim={stored_dim}, opened with dim={self.dim}"
                )
            k = max(r["cid"] for r in rows) + 1
            stored = np.zeros((k, self.dim), dtype=np.int64)
            for r in rows:
                stored[r["cid"], r["pos"]] = r["val"]
            if centroids_q is not None and not np.array_equal(
                stored, np.asarray(centroids_q, dtype=np.int64)
            ):
                raise ValueError(
                    f"embedding delta store {self.root} was created with a "
                    "different codebook; stored inverted lists are as-of "
                    "that codebook — retrain + re-ingest into a new store"
                )
            return stored
        if centroids_q is None:
            raise ValueError(
                "a new embedding delta store requires centroids_q= (a "
                "trained codebook from train_ivf_centroids, or the seeded "
                "quantized_centroids stand-in); see module docstring"
            )
        cb = np.asarray(centroids_q, dtype=np.int64)
        if cb.shape[1] != self.dim:
            raise ValueError(
                f"codebook dim {cb.shape[1]} != store dim {self.dim}"
            )
        self.spark.createDataFrame(
            [
                (int(cid), int(pos), int(v))
                for cid in range(cb.shape[0])
                for pos, v in enumerate(cb[cid])
            ],
            "cid int, pos int, val long",
        ).coalesce(1).write.mode("overwrite").parquet(path)
        return cb

    def _config_fingerprint(self) -> str:
        return json.dumps(
            {
                "dim": self.dim,
                "threshold": repr(self.threshold),
                "nprobe": self.nprobe,
                "bucket_cap": self.bucket_cap,
                "skew_mode": self._ccfg.skew_mode,
                "vec_scale": VEC_SCALE,
                "codebook_sha256": hashlib.sha256(
                    self._codebook.tobytes()
                ).hexdigest(),
            },
            sort_keys=True,
        )

    # ---- codebook-fit drift ----

    def _codebook_drift(self, delta: DataFrame) -> dict:
        """Per-delivery codebook-fit counters — the dense-vector analog of
        the text store's ``idf_drift`` block: the codebook is frozen, so when
        the corpus distribution moves away from the training sample, the
        cosine of new vectors to their nearest centroid DECLINES (vectors
        land in lists that carve their neighborhood poorly, recall decays
        silently). The first delivery's stats are persisted as the baseline;
        every summary reports the delivery's mean/p10 cosine-to-centroid and
        the drop vs baseline. When the drop is sustained, retrain and
        re-ingest into a new store (the documented codebook lifecycle)."""
        row = delta.agg(
            F.mean("assign_cos").alias("mean"),
            F.expr("percentile_approx(assign_cos, 0.1)").alias("p10"),
        ).first()
        if row is None or row["mean"] is None:
            return {}  # fully-redelivered batch: no new vectors to measure
        mean, p10 = float(row["mean"]), float(row["p10"])
        path = f"{self.root}/drift_baseline"
        first = (
            self.spark.read.text(path).first() if self._exists(path) else None
        )
        if first is not None:
            base = json.loads(first.value)
        else:
            # covers both a never-written baseline and a torn write that
            # left the directory without data files (self-heals on replay)
            base = {"assign_cos_mean": round(mean, 6), "assign_cos_p10": round(p10, 6)}
            self.spark.createDataFrame(
                [(json.dumps(base, sort_keys=True),)], "value string"
            ).coalesce(1).write.mode("overwrite").text(path)
        return {
            "assign_cos_mean": round(mean, 6),
            "assign_cos_p10": round(p10, 6),
            "baseline_mean": base["assign_cos_mean"],
            "drop_vs_baseline": round(base["assign_cos_mean"] - mean, 6),
        }

    # ---- epochs ----

    def add_batch(
        self,
        vectors: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        batch_id: int | None = None,
    ) -> dict:
        """Ingest one embedding delivery. Same replay window as the text
        store: replaying the LATEST ``batch_id`` overwrites that batch's
        partitions (at-least-once safe); earlier ids are refused."""
        existing = self.batch_ids()
        bid = self._begin_epoch(batch_id, existing)
        t0 = time.monotonic()
        t_start = t0

        # ONE pass over the delivery: JVM-side quantization + the Arrow
        # assignment matmul against the broadcast codebook (which also emits
        # the cosine-to-nearest-centroid codebook-fit diagnostic),
        # checkpointed — every write/count below would otherwise re-run the
        # input DAG (including the pandas UDF) from scratch
        delta = (
            vectors.select(
                F.col(id_col).alias("id"),
                _quantized(F.col(vec_col)).alias("vq"),
                ivf_assign_udf(self._codebook, self.nprobe, with_cos=True)(
                    F.col(vec_col)
                ).alias("asg"),
            )
            .select(
                "id",
                "vq",
                F.col("asg.cids").alias("cids"),
                F.col("asg.cos").alias("assign_cos"),
            )
            .localCheckpoint(eager=True)
        )
        n_delivered = delta.count()
        # duplicate ids WITHIN a delivery would corrupt the append-only
        # vectors relation (the redelivery guard below only checks OTHER
        # batches) — same contract as the text store's add_batch
        n_distinct_ids = delta.select("id").distinct().count()
        if n_distinct_ids != n_delivered:
            raise ValueError(
                f"delivery contains {n_delivered - n_distinct_ids} duplicate "
                "id row(s) — ids must be unique within a batch (dedupe the "
                "delivery, e.g. dropDuplicates('vec_id'), before add_batch)"
            )

        # redelivery drop — corpus-sized store relations are SCAN-ONLY in
        # the delta path (broadcast the Δ side, stream the store; see the
        # text store's add_batch for the full cost argument). A tombstoned
        # id cannot be re-ingested until compact() purges its row — same
        # replay-determinism rule as the text store.
        stored_ids = (
            self._read("vectors", self._relations["vectors"])
            .filter(F.col("batch") != bid)
            .select("id")
        )
        redelivered = stored_ids.join(F.broadcast(delta.select("id")), "id")
        # Δ-sized, consumed by five downstream actions (vectors write, count,
        # drift agg, lists write, candidate checkpoint) — without this each
        # would re-run the anti-join INCLUDING its scan of the corpus-sized
        # vectors relation, breaking the per-delivery ∝ Δ cost contract
        delta = delta.join(
            F.broadcast(redelivered), "id", "left_anti"
        ).localCheckpoint(eager=True)

        self._write_batch("vectors", delta.select("id", "vq"), bid)
        n_new = delta.count()
        drift = self._codebook_drift(delta)
        t0 = self._mark("quantize_assign", t0, rows=n_new, batch=bid, **drift)

        # inverted-list membership: nprobe rows per vector
        new_lists = delta.select("id", F.explode("cids").alias("cid"))
        self._write_batch("lists", new_lists, bid)

        # -- candidates: stored lists pruned to cids that gained a member
        # (Δ-keys broadcast; the corpus-sized lists relation is streamed
        # through a map-side hash probe, never shuffled), union the new
        # rows, then the tested cap/salt machinery with the new-pair filter.
        # (band, band_hash) = (0, cid): one IVF list IS one LSH bucket.
        tomb = self._tombstones(exclude_bid=bid)
        stored_lists = (
            self._read("lists", self._relations["lists"])
            .filter(F.col("batch") != bid)
            .join(F.broadcast(tomb), "id", "left_anti")
        )
        all_banded = stored_lists.select(
            "id",
            F.lit(0).alias("band"),
            F.col("cid").cast("long").alias("band_hash"),
            F.lit(False).alias("is_new"),
        ).unionByName(
            new_lists.select(
                "id",
                F.lit(0).alias("band"),
                F.col("cid").cast("long").alias("band_hash"),
                F.lit(True).alias("is_new"),
            )
        )
        if existing:
            new_keys = (
                all_banded.filter("is_new").select("band", "band_hash").distinct()
            )
            pruned = all_banded.join(
                F.broadcast(new_keys), ["band", "band_hash"], "left_semi"
            )
        else:
            pruned = all_banded  # bootstrap: every row is new
        cands = candidate_pairs(
            pruned, self._ccfg, "id", skew_mode=self._ccfg.skew_mode, new_col="is_new"
        ).localCheckpoint(eager=True)  # multi-consumer (ids_needed + verify)
        t0 = self._mark("candidates", t0, rows=cands.count(), batch=bid)

        # -- verify: exact quantized cosine, JVM-side (zip_with/aggregate in
        # whole-stage codegen — no Python in the verify hot path, same rule
        # as the text store). Vectors fetched from the store for exactly the
        # ids the pairs touch — broadcast semi-join probe, store scanned not
        # shuffled; this batch's rows are already part of the store.
        vec_store = self._read("vectors", self._relations["vectors"])
        ids_needed = (
            cands.select(F.col("a").alias("id"))
            .union(cands.select(F.col("b").alias("id")))
            .distinct()
        )
        items = (
            vec_store.join(F.broadcast(ids_needed), "id", "left_semi")
            .select("id", "vq")
            .localCheckpoint(eager=True)  # feeds BOTH sides of the pair join
        )
        scored = (
            cands.join(
                items.select(F.col("id").alias("a"), F.col("vq").alias("va")), "a"
            )
            .join(items.select(F.col("id").alias("b"), F.col("vq").alias("vb")), "b")
            .select(
                "a",
                "b",
                (
                    _dot(F.col("va"), F.col("vb")).cast("double")
                    / (
                        F.sqrt(_norm2(F.col("va")).cast("double"))
                        * F.sqrt(_norm2(F.col("vb")).cast("double"))
                    )
                ).alias("cosine"),
            )
        )
        verified = scored.filter(F.col("cosine") >= self.threshold)
        new_edges = self._write_batch("edges", verified, bid)
        n_new_edges = new_edges.count()
        t0 = self._mark("verify", t0, rows=n_new_edges, batch=bid)

        # -- labels: shared incremental overlay update (DeltaStoreBase) --
        cc_stats: dict = {}
        self._update_labels(new_edges.select("a", "b"), bid, cc_stats)
        t0 = self._mark("connected_components", t0, batch=bid, **cc_stats)

        summary = {
            "batch": bid,
            "n_delivered": n_delivered,
            "n_redelivered": n_delivered - n_new,
            "n_new": n_new,
            "n_new_edges": n_new_edges,
            "codebook_drift": drift,
            "cc": cc_stats,
            "wall_s": round(time.monotonic() - t_start, 3),
        }
        self._write_lineage(
            "edges", bid, {**summary, "config": json.loads(self._config_fingerprint())}
        )
        self.metrics.append({"stage": "batch_total", **summary})
        return summary

    def remove_ids(
        self,
        ids: DataFrame | list[int],
        id_col: str = "id",
        batch_id: int | None = None,
    ) -> dict:
        """Remove vectors from the living corpus — a tombstone epoch in the
        same batch-id sequence as deliveries. Simpler than the text store's
        removal: every id carries its own vector/list rows (there is no
        shared-content representative), so there is NO succession step —
        tombstone, then the shared affected-component relabel
        (:meth:`DeltaStoreBase._relabel_after_removal`). compact() physically
        purges the masked rows."""
        if not isinstance(ids, DataFrame):
            ids = self.spark.createDataFrame([(int(i),) for i in ids], "id long")
            id_col = "id"
        bid = self._begin_epoch(batch_id)
        t0 = time.monotonic()
        t_start = t0

        req = ids.select(F.col(id_col).alias("id")).distinct().localCheckpoint(eager=True)
        n_requested = req.count()
        tomb_prior = self._tombstones(exclude_bid=bid)
        rm = (
            self._read("vectors", self._relations["vectors"])
            .join(F.broadcast(req), "id")
            .join(F.broadcast(tomb_prior.join(F.broadcast(req), "id")), "id", "left_anti")
            .select("id")
            .localCheckpoint(eager=True)
        )
        n_removed = rm.count()
        self._write_batch("removed", rm, bid)
        if n_removed == 0:
            # tombstone anchor written (epoch exists, replay-consistent)
            self._write_batch(
                "edges", self.spark.createDataFrame([], self._relations["edges"]), bid
            )
            self._write_batch(
                "label_fix",
                self.spark.createDataFrame([], self._epoch_relations["label_fix"]),
                bid,
            )
            summary = {
                "batch": bid, "op": "remove", "n_requested": n_requested,
                "n_removed": 0, "wall_s": round(time.monotonic() - t_start, 3),
            }
            self._write_lineage(
                "edges", bid,
                {**summary, "config": json.loads(self._config_fingerprint())},
            )
            self.metrics.append({"stage": "remove_total", **summary})
            return summary
        t0 = self._mark("rm_tombstone", t0, rows=n_removed, batch=bid)

        rel = self._relabel_after_removal(rm, tomb_prior, bid, succ_map=None)
        t0 = self._mark(
            "rm_relabel", t0, rows=rel["n_members_fixed"], batch=bid, **rel["cc"]
        )

        summary = {
            "batch": bid,
            "op": "remove",
            "n_requested": n_requested,
            "n_removed": n_removed,
            "n_already_absent": n_requested - n_removed,
            **rel,
            "wall_s": round(time.monotonic() - t_start, 3),
        }
        self._write_lineage(
            "edges", bid, {**summary, "config": json.loads(self._config_fingerprint())}
        )
        self.metrics.append({"stage": "remove_total", **summary})
        return summary

    # ---- retrain lifecycle ----

    def surviving_vectors(self) -> DataFrame:
        """(vec_id, embedding) of every surviving row, dequantized from the
        stored int64 ``vq``. The round-trip is EXACT: ``vq`` is an integer
        with \\|vq\\| ≲ VEC_SCALE, so float32 carries ``vq / VEC_SCALE`` with
        absolute error ≪ 0.5 ulp of the integer grid, and re-quantization
        (round half away from zero) recovers ``vq`` bit-for-bit — delivering
        these rows into another store stores identical vectors."""
        tomb = self._tombstones()
        return (
            self._read("vectors", self._relations["vectors"])
            .join(F.broadcast(tomb), "id", "left_anti")
            .select(
                F.col("id").alias("vec_id"),
                F.transform(
                    "vq",
                    lambda x: (x.cast("double") / F.lit(float(VEC_SCALE))).cast(
                        "float"
                    ),
                ).alias("embedding"),
            )
        )

    def migrate(
        self,
        new_store_dir: str,
        centroids_q: np.ndarray | None = None,
        n_centroids: int | None = None,
        n_iters: int = 2,
        seed: int = 42,
    ) -> "EmbeddingDeltaStore":
        """Retrain-and-reingest — the documented response to a sustained
        ``codebook_drift`` drop. Reads the SURVIVING corpus (exact vq
        round-trip, no original floats needed), trains a fresh distributed
        Lloyd codebook on it (or uses ``centroids_q`` if given), and delivers
        everything into a NEW store under this store's
        threshold/nprobe/cap/skew config in one epoch.

        The old store is untouched — a read-only cutover: point consumers at
        the new store, then delete the old directory. Labels are recomputed
        under the new codebook (list memberships change, so edges can too);
        the new store's state equals a batch ``embedding_near_dups`` run over
        the survivors with the new codebook (tested). The drift baseline
        resets to the re-ingested corpus — by construction the post-migration
        fit, so subsequent deliveries measure drift against the NEW codebook.

        The text-store twin is ``DeltaDedup.migrate`` — same lifecycle, but
        re-signing text needs the original content, which that store does
        not retain (signatures only), so it takes the source-of-truth corpus
        relation as an argument where this store re-ingests its own rows.
        """
        vecs = self.surviving_vectors().localCheckpoint(eager=True)
        if centroids_q is None:
            k = n_centroids if n_centroids is not None else self._codebook.shape[0]
            centroids_q = train_ivf_centroids(
                vecs, dim=self.dim, n_centroids=k, n_iters=n_iters, seed=seed
            )
        new_store = EmbeddingDeltaStore(
            self.spark,
            new_store_dir,
            dim=self.dim,
            centroids_q=centroids_q,
            threshold=self.threshold,
            nprobe=self.nprobe,
            bucket_cap=self.bucket_cap,
            skew_mode=self._ccfg.skew_mode,
            cc_mode=self.cc_mode,
            max_cc_iterations=self._cc_max_iterations,
            checkpoint_every=self._cc_checkpoint_every,
        )
        summary = new_store.add_batch(vecs)
        self.metrics.append(
            {"stage": "migrate", "new_store": new_store.root, **summary}
        )
        return new_store
