"""Incremental (delta) dedup — a persistent store + per-batch runner that
keeps a living corpus deduplicated at per-batch cost proportional to the
BATCH, not the corpus.

The reference is batch-only (``main.cpp:63-361`` reads one graph, scores it,
exits); a 100 TB training corpus instead grows continuously, and re-running
the full pipeline per delivery re-pays signing + banding + verification for
every file ever seen. This runner composes the existing stages so each file
is signed ONCE, ever:

  new batch → sha256 (exact-dup vs batch AND vs store) → shingle+sign only
  never-seen contents → band → join new band rows against the persisted
  banded corpus, pruned to buckets that gained a member → verify only pairs
  touching a new id → append edges → incremental connected components
  (star rounds over affected components only).

Store layout (all parquet, every additive relation partitioned by
``batch=<n>`` so an at-least-once replay of a batch OVERWRITES its own
partition instead of duplicating rows — same idempotence contract as the
streaming leg, ``streaming/ingest.py``):

  store/
    store_config            config fingerprint (mismatch = hard error)
    files/batch=N/          (id, sha256, is_rep)    — corpus identity
    shingles/batch=N/       (id, shingle_hashes)    — reps only, signed once
    banded/batch=N/         (id, band, band_hash)   — LSH ∪ SimHash bands
    edges/batch=N/          (a, b, jaccard)         — verified + exact edges
    label_base/batch=N/     (node, label)           — label AT ENTRY, append-only
    label_remaps/           (old_label, new_label)  — folded merge closure
    removed/batch=N/        (id)                    — tombstones (remove_ids)
    label_fix/batch=N/      (node, label)           — post-removal labels, latest wins
    idf/                    (elem, w)               — frozen snapshot (weighted mode)
    volumes/batch=N/        (id, vol)               — per-rep Σw (weighted mode)
    bench/                  (bench_id, ngram_hashes) — frozen benchmark set (decontam leg)
    contam/batch=N/         (sha256, max_containment) — per-content leak scores

The decontamination leg (``bench_snapshot=``) extends the same O(Δ) economics
to benchmark-leak hygiene (``operators/decontaminate.py``): each delivery
probes ONLY its never-seen contents against the broadcast benchmark n-gram
set, scores persist keyed on sha256 so exact copies inherit them, and
:meth:`DeltaDedup.contamination_manifest` /:meth:`DeltaDedup.decontaminate`
reproduce the batch operator's manifest and drop action over the whole
corpus — tested score-for-score equivalent to one batch probe of the union.
The benchmark set is frozen corpus state like the IDF snapshot (fingerprint
checked on reopen; a NEW eval set is a batch probe or a new store), and the
drop threshold stays query-time — the store records scores, not verdicts.

The corpus also SHRINKS: :meth:`DeltaDedup.remove_ids` tombstones files
(takedown / GDPR / retention) at cost proportional to the affected
components — rep succession, edge rewrites and a localized re-labeling
through the ``label_fix`` overlay; ``compact()`` is the physical purge
point. See the method docstring for the full model.

Labels are an OVERLAY, not a snapshot: a node's base row is written once, in
the batch it first enters the edge graph, carrying the min-node label of its
component at that moment; later merges append (old_label → new_label) rows
to a folded remap closure instead of rewriting every member's row. Current
label = ``coalesce(closure[base_label], base_label)`` — one hop, because the
closure is kept folded (a batch that merges X into Y also redirects every
stored ``* → X`` row to Y, and Y is final within its own batch by
construction). The per-delivery label cost is therefore O(Δ edges + closure
size): no corpus-sized label relation is ever rewritten, and none is
shuffled (the base probe is a broadcast semi-join). ``compact()`` folds the
closure back into the base and empties it, so the closure stays bounded by
the merge events since the last compaction.

Correctness contract (tested label-for-label in ``tests/test_delta.py``):
running batches B1..Bk through ``add_batch`` yields the SAME cluster
assignment as one ``DedupPipeline.run`` over B1 ∪ ... ∪ Bk, because

* bucket memberships only ever grow and the skew cap keeps lowest ids, so
  every old×old pair inside today's capped bucket was inside yesterday's —
  pairs touching at least one new id are exactly the missing ones (the
  ``new_col`` filter in ``candidate_pairs``);
* exact-dup groups connect through their first-seen representative instead
  of the global min-id one — a different edge LIST but the same connected
  components, hence the same min-node labels;
* incremental CC re-runs star rounds only on components touched by new
  edges and keeps every other label verbatim (min-node labels of untouched
  components cannot change).

Under an engaged bucket cap the delta run is a superset: it may verify a
true dup pair the full run's cap dropped (never the reverse). The salting
modes (``skew_mode`` "salt"/"auto") hash members into sub-buckets whose
fan-out depends on the bucket size AT SIGNING TIME, which grows across
batches — delta and full runs then salt the same bucket differently, so
parity there is approximate (the other bands + SimHash recover, same as
cross-salt pairs within one run). The label-for-label guarantee is for
``skew_mode="cap"`` (exact when no bucket exceeds the cap).

The weighted (IDF/CWS) mode runs against a FROZEN IDF snapshot, the same
static-snapshot semantics as the streaming leg
(``streaming/ingest.py:weighted_signature_batch_writer``): corpus IDF drifts
as batches arrive, so signatures trained per-batch would not be comparable
with stored ones. Construct the store with ``idf_snapshot=`` (an
``idf_weights`` relation, persisted under ``store/idf`` and
fingerprint-checked on reopen); shingles the snapshot has never seen get the
snapshot's max weight (unseen = at least as rare as the rarest seen), and
every batch summary carries an ``idf_drift`` block (fraction of the batch's
distinct shingles absent from the snapshot) — the operational retrain
signal. When drift exceeds tolerance, :meth:`DeltaDedup.migrate` retrains on
the surviving corpus and re-ingests into a NEW store (read-only cutover, the
same lifecycle as ``EmbeddingDeltaStore.migrate``): stored CWS signatures
and verify scores are definitionally as-of their snapshot, so a store never
silently re-weights history.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sycl_jaccard_spark.config import PipelineConfig
from sycl_jaccard_spark.functions.minhash import minhash_simhash_udf, minhash_udf
from sycl_jaccard_spark.functions.shingles import doc_shingle_hashes
from sycl_jaccard_spark.functions.simhash import n_simhash_tables
from sycl_jaccard_spark.operators.lsh import candidate_pairs
from sycl_jaccard_spark.operators.pair_jaccard import jaccard_pairs
from sycl_jaccard_spark.operators.weighted_dedup import idf_weights, weighted_signatures
from sycl_jaccard_spark.plans.pipeline import banded_relation, substring_banded
from sycl_jaccard_spark.plans.store_base import DeltaStoreBase


def train_idf_snapshot(
    files: DataFrame,
    cfg: PipelineConfig | None = None,
    id_col: str = "id",
    content_col: str = "content",
) -> DataFrame:
    """``idf_weights`` over the post-exact-dedup uniques of ``files`` —
    exactly the relation :class:`~sycl_jaccard_spark.plans.pipeline.DedupPipeline`
    trains internally before CWS signing (``idf_weights`` is deterministic,
    so a store signed against this snapshot is label-comparable with a batch
    pipeline run over the same corpus — the tested weighted delta≡full
    parity depends on that). This is the snapshot to pass as
    ``idf_snapshot=`` when opening a weighted :class:`DeltaDedup` store or
    constructing the streaming leg's ``weighted_signature_batch_writer``."""
    from sycl_jaccard_spark.operators.exact_dedup import dedup_exact, with_sha256

    cfg = cfg or PipelineConfig()
    named = files.select(
        F.col(id_col).alias("id"), F.col(content_col).alias("content")
    )
    uniques, _ = dedup_exact(with_sha256(named), "id", "content")
    shingled = uniques.select(
        "id", doc_shingle_hashes(F.col("content"), cfg).alias("shingle_hashes")
    )
    return idf_weights(shingled)


class DeltaDedup(DeltaStoreBase):
    """Persistent incremental dedup over a growing corpus.

    ``enable_substring``: carries the batch pipeline's line-gram containment
    pass into the store — each delivery's line-gram band rows persist in the
    SAME banded relation (disjoint band id, identical layout to
    ``DedupPipeline``), and verify accepts containment ≥ threshold with the
    min-size floor. Part of the store fingerprint: a substring store and a
    plain store can never silently mix.

    ``cc_mode``: ``"incremental"`` (default) reruns connected components only
    on components touched by this batch's edges; ``"full"`` reruns CC over
    the whole edge store (the equivalence test runs both and asserts equal
    labels). Both scale with the DUP GRAPH, not the corpus; incremental
    additionally scales star rounds with the touched subgraph only.

    Long-lived stores accumulate one ``batch=N`` partition per delivery; at
    daily cadence that is thousands of directories of small files, and the
    candidate join's scan planning (file listing + footer reads) starts to
    cost more than the data. :meth:`compact` folds every batch partition of
    each additive relation into one consolidated partition — rows preserved
    verbatim, labels untouched — and closes the replay window for the
    pre-compaction batch ids (guarded, not just documented: ``add_batch``
    refuses a ``batch_id`` at or below the compaction horizon, since its
    rows now live inside the consolidated partition and an overwrite-replay
    would duplicate them).
    """

    # additive relations (partitioned by batch=N) and their schemas — the
    # single source of truth for _read/compact. Weighted stores add
    # "volumes" (per-rep Σw, computed free inside the signing UDF and read
    # back by every later batch's verify) — see __init__.
    _RELATIONS = {
        "files": "id long, sha256 string, is_rep boolean",
        "shingles": "id long, shingle_hashes array<long>",
        "banded": "id long, band int, band_hash long",
        "edges": "a long, b long, jaccard double",
        "label_base": "node long, label long",
    }
    # epoch relations written by remove_ids (same batch-id sequence and
    # replay window as add_batch deliveries); compact() folds both away —
    # tombstones by physically purging the rows they mask, fixes by applying
    # them into the consolidated label base
    _EPOCH_RELATIONS = {
        "removed": "id long",
        "label_fix": "node long, label long",
    }
    _CLOSURE_SCHEMA = "old_label long, new_label long"
    _EPOCH_ANCHORS = ("files", "removed")
    _FINAL_RELATION = "edges"

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        cfg: PipelineConfig | None = None,
        enable_simhash: bool = True,
        enable_substring: bool = False,
        cc_mode: str = "incremental",
        idf_snapshot: DataFrame | None = None,
        bench_snapshot: DataFrame | None = None,
        bench_min_overlap: int = 1,
    ):
        self.spark = spark
        self.root = store_dir.rstrip("/")
        self.cfg = cfg or PipelineConfig()
        self._weighted = self.cfg.candidate_weights == "idf"
        self._relations = dict(self._RELATIONS)
        self._epoch_relations = dict(self._EPOCH_RELATIONS)
        if self._weighted:
            self._relations["volumes"] = "id long, vol double"
        elif idf_snapshot is not None:
            raise ValueError(
                "idf_snapshot is only meaningful with candidate_weights='idf'"
            )
        # decontamination leg: engaged by a snapshot on a NEW store, or by
        # the persisted store/bench relation on reopen. Retroactive enabling
        # is refused below (_init_bench_snapshot): earlier deliveries were
        # never probed, so the manifest would silently under-report.
        self.bench_min_overlap = int(bench_min_overlap)
        has_bench = self._exists(f"{self.root}/bench/_SUCCESS")
        if (
            bench_snapshot is not None
            and not has_bench
            and self._exists(f"{self.root}/store_config")
        ):
            raise ValueError(
                f"delta store {self.root} was created without a benchmark "
                "snapshot — its earlier deliveries were never probed, so "
                "enabling decontamination retroactively would silently "
                "under-report contamination; re-ingest into a new store "
                "opened with bench_snapshot="
            )
        self._bench_enabled = bench_snapshot is not None or has_bench
        if self._bench_enabled:
            self._relations["contam"] = "sha256 string, max_containment double"
        if cc_mode not in ("incremental", "full"):
            raise ValueError(f"unknown cc_mode {cc_mode!r}")
        if enable_substring and self.cfg.substring_verify == "lcs":
            # the store persists shingle sets, not content — old sides of a
            # candidate pair have no text to re-read, so the exact-LCS
            # refinement cannot run here. Refuse loudly instead of silently
            # degrading to the shingle rule (the dead-knob failure mode).
            raise ValueError(
                "substring_verify='lcs' is a batch-pipeline mode: the delta "
                "store does not persist content, so stored pair sides cannot "
                "be LCS-scored — use substring_verify='shingle' for stores"
            )
        self.enable_simhash = enable_simhash
        self.enable_substring = enable_substring
        self.cc_mode = cc_mode
        self._cc_max_iterations = self.cfg.max_cc_iterations
        self._cc_checkpoint_every = self.cfg.checkpoint_every
        self._init_store()
        self._idf: DataFrame | None = None
        self._novel_weight: float | None = None
        if self._weighted:
            self._init_idf_snapshot(idf_snapshot)
        self._bench: DataFrame | None = None
        if self._bench_enabled:
            self._init_bench_snapshot(bench_snapshot)

    # ---- store plumbing ----

    def _idf_fingerprint(self, idf: DataFrame) -> tuple[int, int]:
        """(row count, order-free content hash) of a snapshot — doubles
        round-trip parquet exactly, so the hash is stable across persist/
        reload. One agg job, run only at store creation / reopen-with-arg.
        bit_xor (not sum) as the combiner: order-free like sum, but cannot
        overflow under ANSI mode."""
        row = idf.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("elem", "w")).alias("h"),
        ).first()
        return int(row["n"]), int(row["h"] or 0)

    def _init_idf_snapshot(self, idf_snapshot: DataFrame | None) -> None:
        """Load (and on first use persist) the frozen IDF snapshot the store
        signs against. The snapshot is corpus state exactly like the config
        fingerprint: reopening with a DIFFERENT snapshot is refused — stored
        CWS signatures would be incomparable with new ones."""
        path = f"{self.root}/idf"
        if self._exists(f"{path}/_SUCCESS"):
            stored = self.spark.read.parquet(path)
            if idf_snapshot is not None and self._idf_fingerprint(
                idf_snapshot.select("elem", "w")
            ) != self._idf_fingerprint(stored):
                raise ValueError(
                    f"delta store {self.root} was created with a different "
                    "IDF snapshot; stored CWS signatures are as-of that "
                    "snapshot — migrate() (retrain + re-ingest into a new "
                    "store) is the supported re-weighting path"
                )
            self._idf = stored
        else:
            if idf_snapshot is None:
                raise ValueError(
                    "candidate_weights='idf' requires idf_snapshot= on a new "
                    "store (an idf_weights relation trained on a batch "
                    "corpus; see module docstring)"
                )
            idf_snapshot.select("elem", "w").write.mode("overwrite").parquet(path)
            self._idf = self.spark.read.parquet(path)
        # unseen shingles are by definition at least as rare as the rarest
        # seen one — same default as the streaming leg
        max_w = self._idf.agg(F.max("w")).first()[0]
        if max_w is None:
            raise ValueError(
                "empty IDF snapshot — train idf_weights on a non-empty "
                "corpus before opening a weighted delta store"
            )
        self._novel_weight = float(max_w)

    def _bench_fingerprint(self, bench: DataFrame) -> tuple[int, int]:
        """(item count, order-free content hash) of a benchmark snapshot —
        same estimator family as :meth:`_idf_fingerprint`, over the exploded
        (bench_id, n-gram) relation so array element ORDER does not matter
        (the probe is set-semantic either way)."""
        row = (
            bench.select(
                "bench_id", F.explode(F.array_distinct("ngram_hashes")).alias("h")
            )
            .agg(
                F.count_distinct("bench_id").alias("n"),
                F.bit_xor(F.xxhash64("bench_id", "h")).alias("h"),
            )
            .first()
        )
        return int(row["n"]), int(row["h"] or 0)

    def _init_bench_snapshot(self, bench_snapshot: DataFrame | None) -> None:
        """Load (and on first use persist) the benchmark n-gram relation the
        store probes every delivery against — (bench_id, ngram_hashes), the
        hashes computed with the SAME shingle config as the store (callers
        use :func:`~sycl_jaccard_spark.functions.shingles.doc_shingle_hashes`
        with this store's cfg). Corpus state exactly like the IDF snapshot:
        reopening with a DIFFERENT benchmark set is refused — earlier
        deliveries were probed against the stored one."""
        path = f"{self.root}/bench"
        norm = None
        if bench_snapshot is not None:
            # normalize BEFORE fingerprinting or persisting: the probe joins
            # on a long bench_id, and xxhash64 is dtype-sensitive (an int32
            # snapshot would spuriously mismatch its own stored long copy).
            # A bench_id that casts to NULL (string benchmark names) would
            # silently match NOTHING in the size join — refuse it loudly,
            # with the same clear message under ANSI and non-ANSI casting
            norm = bench_snapshot.select(
                F.col("bench_id").try_cast("long").alias("bench_id"),
                F.array_distinct("ngram_hashes").alias("ngram_hashes"),
            )
            if norm.filter(F.col("bench_id").isNull()).limit(1).count() > 0:
                raise ValueError(
                    "bench_id must cast to long without nulls — map string "
                    "benchmark names to stable numeric ids (e.g. xxhash64) "
                    "before snapshotting"
                )
        if self._exists(f"{path}/_SUCCESS"):
            stored = self.spark.read.parquet(path)
            if norm is not None and self._bench_fingerprint(
                norm
            ) != self._bench_fingerprint(stored):
                raise ValueError(
                    f"delta store {self.root} was created with a different "
                    "benchmark snapshot; stored contamination scores are "
                    "as-of that set — probe a NEW benchmark set in batch "
                    "(operators/decontaminate.py) or re-ingest into a new "
                    "store to change it"
                )
            self._bench = stored
        else:
            norm.write.mode("overwrite").parquet(path)
            self._bench = self.spark.read.parquet(path)
        if self._bench.isEmpty():
            raise ValueError(
                "empty benchmark snapshot — decontamination needs at least "
                "one benchmark item with a non-empty n-gram set"
            )

    def _config_fingerprint(self) -> str:
        from dataclasses import asdict

        # enable_substring joins the fingerprint only when ON so stores
        # written before the substring leg existed still open cleanly with
        # the default; a substring store and a non-substring store can never
        # silently mix (their banded relations carry different pass rows)
        fp = {"cfg": asdict(self.cfg), "enable_simhash": self.enable_simhash}
        if self.enable_substring:
            fp["enable_substring"] = True
        if self._bench_enabled:
            # min_overlap changes which scores the contam relation records,
            # so a store must keep probing under the floor it was created
            # with (the snapshot itself is fingerprinted separately)
            fp["bench_min_overlap"] = self.bench_min_overlap
        return json.dumps(fp, sort_keys=True)

    # ---- weighted (frozen-snapshot) legs ----

    def _weighted_sign(self, shingled: DataFrame, bid: int, drift_out: dict) -> DataFrame:
        """CWS-sign this batch's never-seen contents against the frozen IDF
        snapshot. Returns the checkpointed (id, sig[, sim]) relation, writes
        the per-rep ``volumes`` partition (Σw rides free inside the signing
        UDF; every LATER batch's verify reads it back instead of re-exploding
        stored shingle arrays), and fills ``drift_out`` with the snapshot
        drift counters."""
        cfg = self.cfg
        exploded = shingled.select(
            "id", F.explode("shingle_hashes").alias("elem")
        ).dropDuplicates(["id", "elem"])
        mem = exploded.join(self._idf.select("elem", "w"), "elem", "left").select(
            "id",
            "elem",
            F.col("w").isNull().alias("novel"),
            F.coalesce("w", F.lit(self._novel_weight)).alias("w"),
        )
        # Δ-sized, consumed twice (drift agg + signature groupBy): one
        # checkpoint buys ONE scan of the corpus-sized snapshot per batch.
        # (The batch pipeline measured the same materialization SLOWER —
        # there the relation is corpus-sized; here it is delivery-sized.)
        mem = mem.localCheckpoint(eager=True)
        row = mem.agg(
            F.countDistinct("elem").alias("n_elems"),
            F.countDistinct(F.when(F.col("novel"), F.col("elem"))).alias("n_novel"),
        ).first()
        n_elems, n_novel = int(row["n_elems"]), int(row["n_novel"])
        drift_out.update(
            {
                "n_elems": n_elems,
                "n_novel_elems": n_novel,
                "novel_elem_frac": round(n_novel / n_elems, 6) if n_elems else 0.0,
            }
        )
        signed = weighted_signatures(
            shingled,
            self._idf,
            cfg.num_perms,
            cfg.seed,
            materialize=True,
            with_simhash=self.enable_simhash,
            with_volume=True,
            memberships=mem.select("id", "elem", "w"),
        )
        self._write_batch("volumes", signed.select("id", "vol"), bid)
        return signed.drop("vol")

    def _weighted_verify(
        self, items: DataFrame, cands: DataFrame, with_counts: bool = False
    ) -> DataFrame:
        """Exact weighted Jaccard over the candidate-touched items. The
        weight relation is the frozen snapshot extended with the novel-weight
        default over exactly the elements these items carry (the arrays-impl
        equivalence requires a TOTAL relation); volumes are read back from
        the store — computed once at signing, never re-derived."""
        from sycl_jaccard_spark.operators.pair_jaccard import (
            jaccard_pairs_weighted_arrays,
        )

        # the IDF snapshot is corpus-vocabulary-sized: stream it against the
        # broadcast Δ element set (inner), then resolve novel-weight defaults
        # Δ×Δ — never shuffle the snapshot per delivery
        elems = (
            items.select(F.explode("set").alias("elem"))
            .distinct()
            .localCheckpoint(eager=True)  # broadcast build + left side below
        )
        idf_hits = self._idf.select("elem", "w").join(F.broadcast(elems), "elem")
        w_needed = elems.join(F.broadcast(idf_hits), "elem", "left").select(
            "elem", F.coalesce("w", F.lit(self._novel_weight)).alias("w")
        )
        vols = (
            self._read("volumes", self._relations["volumes"])
            .join(F.broadcast(items.select("id")), "id", "left_semi")
            .select("id", "vol")
        )
        return jaccard_pairs_weighted_arrays(
            items, w_needed, cands, id_col="id", set_col="set",
            with_counts=with_counts, volumes=vols,
        )

    # ---- the per-batch run ----

    def add_batch(
        self,
        files: DataFrame,
        id_col: str = "id",
        content_col: str = "content",
        batch_id: int | None = None,
    ) -> dict:
        """Ingest one delivery. Returns the batch summary dict (also appended
        to ``self.metrics``). Replaying the LATEST ``batch_id`` overwrites
        that batch's partitions — at-least-once safe; earlier batch ids are
        refused (later batches already verified cross-batch pairs against
        their rows, so a re-run would duplicate those edges)."""
        cfg = self.cfg
        existing = self.batch_ids()
        bid = self._begin_epoch(batch_id, existing)
        t0 = time.monotonic()
        t_start = t0

        new = files.select(F.col(id_col).alias("id"), F.col(content_col).alias("content"))

        # -- exact dedup: within the batch, then against the store --
        # ONE scan of the delivery, ever: sha256 over content is the dominant
        # per-batch CPU, and every write/count below is its own job that
        # would otherwise re-run the input DAG (scan + hash) from scratch
        hashed = new.select(
            "id", "content", F.sha2("content", 256).alias("sha256")
        ).localCheckpoint(eager=True)
        # drop ids the store already ingested in OTHER batches (crawler
        # revisit / re-pushed delivery): files/ is append-only corpus
        # identity, so a re-delivered id would duplicate rows there and fan
        # out every clusters()/deduplicate() join downstream. First write
        # wins; the drop count is surfaced in the batch summary.
        stored_files = self._read("files", self._relations["files"]).filter(
            F.col("batch") != bid
        )
        n_delivered = hashed.count()
        # a duplicate id WITHIN the delivery would put two rows for one id
        # into the append-only files/ relation — every downstream join keyed
        # on id fans out and nothing later can heal it (the redelivery guard
        # only checks across batches). One cheap agg on the checkpointed Δ
        n_distinct_ids = hashed.select("id").distinct().count()
        if n_distinct_ids != n_delivered:
            raise ValueError(
                f"delivery contains {n_delivered - n_distinct_ids} duplicate "
                "id row(s) — ids must be unique within a batch (dedupe the "
                "delivery, e.g. dropDuplicates('id'), before add_batch)"
            )
        # Corpus-sized store relations are SCAN-ONLY in the delta path: every
        # probe of the store streams it against a broadcast hash table built
        # from the Δ side (an inner join with the small side hinted), and the
        # Δ-sized hit set then drives ordinary Δ×Δ joins. A plain anti/outer
        # join here would have to preserve the Δ side and therefore build on
        # (i.e. SHUFFLE) the corpus side — O(corpus) shuffle bytes per
        # delivery, the exact cost class the delta store exists to avoid.
        # At cluster scale the streamed scan additionally prunes via
        # bucketing/bloom on the probe column; the broadcast is bounded by
        # the delivery size (operational guidance: split mega-deliveries).
        redelivered = stored_files.select("id").join(
            F.broadcast(hashed.select("id")), "id"
        )
        hashed = hashed.join(F.broadcast(redelivered), "id", "left_anti")
        reps_b = hashed.groupBy("sha256").agg(F.min("id").alias("rep"))
        with_rep = hashed.join(reps_b, "sha256")
        batch_exact = with_rep.filter(F.col("id") != F.col("rep")).select(
            F.col("rep").alias("a"), F.col("id").alias("b")
        )
        batch_uniq = with_rep.filter(F.col("id") == F.col("rep")).drop("rep")

        # stored_files excludes the batch being (re)written: a REPLAY must
        # see the same store view as the original run — its own earlier
        # incarnation would otherwise classify every replayed file as
        # already-stored (and the lazy read would race the partition
        # overwrite below). The batch filter is on the partition column, so
        # pruning skips those files. Tombstoned reps are excluded too — an
        # exact edge to a removed rep would be filtered out of every view and
        # the new file would silently lose its group; treating the content as
        # never-seen instead re-signs it ONCE, after which the new copy is
        # the group's discoverable rep again (self-healing succession).
        tomb = self._tombstones(exclude_bid=bid)
        stored_reps = (
            stored_files.filter("is_rep")
            .join(F.broadcast(tomb), "id", "left_anti")
            .select("sha256", F.col("id").alias("old_rep"))
        )
        # one streamed scan of the reps, Δ-sized hit set, consumed twice
        # (ju + file_rows) — materialize so the scan runs once
        old_map = stored_reps.join(
            F.broadcast(reps_b.select("sha256")), "sha256"
        ).localCheckpoint(eager=True)
        ju = batch_uniq.join(F.broadcast(old_map), "sha256", "left")
        cross_exact = ju.filter(F.col("old_rep").isNotNull()).select(
            F.col("old_rep").alias("a"), F.col("id").alias("b")
        )
        # never-seen contents: the only rows that pay shingling + signing
        new_uniques = ju.filter(F.col("old_rep").isNull()).drop("old_rep")

        file_rows = (
            with_rep
            .join(F.broadcast(old_map), "sha256", "left")
            .select(
                "id",
                "sha256",
                ((F.col("id") == F.col("rep")) & F.col("old_rep").isNull()).alias("is_rep"),
            )
        )
        files_out = self._write_batch("files", file_rows, bid)
        n_files = files_out.count()
        t0 = self._mark("exact_dedup", t0, rows=n_files, batch=bid)

        # -- shingle + sign only the new uniques (signed ONCE, ever) --
        shingled = new_uniques.select(
            "id", doc_shingle_hashes(F.col("content"), cfg).alias("shingle_hashes")
        )
        shingled = self._write_batch("shingles", shingled, bid)
        n_new_uniques = shingled.count()
        t0 = self._mark("shingles", t0, rows=n_new_uniques, batch=bid)

        # -- decontamination probe: ONLY the never-seen contents, against the
        # broadcast benchmark snapshot (operators/decontaminate.py — the
        # corpus side is never shuffled). Scores are keyed on sha256, so
        # every exact copy — in this batch or any later one — inherits its
        # content's score through files/(id, sha256) with no re-probe.
        decontam_block: dict = {}
        if self._bench is not None:
            from sycl_jaccard_spark.operators.decontaminate import (
                contamination_overlap,
            )

            per_doc = (
                contamination_overlap(
                    shingled,
                    self._bench,
                    id_col="id",
                    ngrams_col="shingle_hashes",
                    min_overlap=self.bench_min_overlap,
                )
                .groupBy("doc_id")
                .agg(F.max("containment").alias("max_containment"))
            )
            # leak-sized (docs sharing >= min_overlap bench n-grams) —
            # broadcast it against the Δ-sized id→sha256 map
            contam_rows = (
                new_uniques.select(F.col("id").alias("doc_id"), "sha256")
                .join(F.broadcast(per_doc), "doc_id")
                .select("sha256", "max_containment")
            )
            contam_out = self._write_batch("contam", contam_rows, bid)
            n_overlapping = contam_out.count()
            decontam_block = {
                "n_probed": n_new_uniques,
                "n_overlapping": n_overlapping,
            }
            t0 = self._mark("decontam", t0, rows=n_overlapping, batch=bid)

        idf_drift: dict = {}
        if self._weighted:
            # CWS against the frozen snapshot; returns checkpointed
            # (id, sig[, sim]), persists per-rep volumes, fills idf_drift
            signed = self._weighted_sign(shingled, bid, idf_drift)
        else:
            if self.enable_simhash:
                fused = minhash_simhash_udf(cfg.num_perms, cfg.seed)
                signed = shingled.select(
                    "id", fused(F.col("shingle_hashes")).alias("ms")
                ).select("id", F.col("ms.sig").alias("sig"), F.col("ms.sim").alias("sim"))
            else:
                signed = shingled.select(
                    "id",
                    minhash_udf(cfg.num_perms, cfg.seed)(F.col("shingle_hashes")).alias("sig"),
                )
            # materialize before banding: a pandas-UDF column cannot feed the
            # banding explode (Catalyst cannot host Python UDFs in a generator)
            signed = signed.localCheckpoint(eager=True)
        new_banded = banded_relation(signed, cfg, self.enable_simhash)
        if self.enable_substring:
            # substring pass (suffix-array analog) — SAME banding helper and
            # band-id layout as the batch pipeline (cfg.bands +
            # n_simhash_tables, regardless of whether SimHash is on) so the
            # two runners can never drift. Substring fingerprints are
            # computed from this delivery's content at signing time; only
            # (id, band, band_hash) rows persist — the store never carries
            # content.
            new_banded = new_banded.unionByName(
                substring_banded(
                    new_uniques, cfg,
                    cfg.bands
                    + n_simhash_tables(cfg.simhash_blocks, cfg.simhash_max_hamming),
                )
            )
        self._write_batch("banded", new_banded, bid)
        t0 = self._mark("banding", t0, batch=bid)

        # -- candidates: all banded rows, pruned to buckets that gained a
        # member this batch (the new batch's bucket keys are small —
        # broadcast), capped/salted over the FULL current membership, pairs
        # filtered to those touching >=1 new id. The new side is the
        # in-session relation (a cheap explode of the checkpointed
        # signatures) rather than a read-back of the partition just written —
        # one less store round-trip per delivery; replay semantics are
        # unchanged because the stored side excludes this batch id either way.
        all_banded = (
            self._read("banded", "id long, band int, band_hash long")
            .filter(F.col("batch") != bid)
            # tombstoned ids must not seed candidates: their shingle rows are
            # masked (pre-purge) and an edge to them would be view-filtered;
            # rep successors carry copied banded rows under their own id
            .join(F.broadcast(tomb), "id", "left_anti")
            .select("id", "band", "band_hash", F.lit(False).alias("is_new"))
            .unionByName(
                new_banded.select(
                    "id", "band", "band_hash", F.lit(True).alias("is_new")
                )
            )
        )
        if existing:
            # prune the stored scan to buckets that gained a member. The new
            # batch's bucket keys are Δ×bands distinct rows — broadcast them
            # so the corpus-sized banded store is STREAMED through a map-side
            # hash probe instead of shuffled into a sort-merge semi-join
            # (AQE would make the same call at runtime, but the bench
            # protocol runs AQE off, and at 100 TB the stored side must
            # never be shuffle-repartitioned per delivery regardless)
            new_keys = all_banded.filter("is_new").select("band", "band_hash").distinct()
            pruned = all_banded.join(
                F.broadcast(new_keys), ["band", "band_hash"], "left_semi"
            )
        else:
            pruned = all_banded  # bootstrap: every row is new, prune is identity
        # cands is a MULTI-consumer intermediate (ids_needed + the pairs side
        # of verify): left lazy, the whole candidate DAG — stored-banded scan,
        # bucket-gain prune, rank window, self-join, cross-band dedup — would
        # recompute once per consumer (measured: verify wall ~2x). Δ-sized
        # (pairs touching this batch), so the checkpoint is cheap; a durable
        # cluster run would persist()/write the same relation.
        cands = candidate_pairs(
            pruned, cfg, "id", skew_mode=cfg.skew_mode, new_col="is_new"
        ).localCheckpoint(eager=True)
        t0 = self._mark("candidates", t0, rows=cands.count(), batch=bid)

        # -- verify: shingle sets fetched from the store for exactly the ids
        # the candidate pairs touch (old sides read back; new sides are in
        # this batch's shingles partition, already part of the store) --
        shingle_store = self._read("shingles", "id long, shingle_hashes array<long>")
        ids_needed = (
            cands.select(F.col("a").alias("id"))
            .union(cands.select(F.col("b").alias("id")))
            .distinct()
        )
        # items feeds BOTH sides of the verify join (and, weighted, the
        # novel-weight relation + the volumes semi-join) — materialize or the
        # store-sized semi-join re-runs per consumer. Candidate-touched ids
        # only, so this is Δ-sized, not corpus-sized. ids_needed is broadcast
        # for the same reason as every other store probe: the shingle store
        # (the HEAVIEST relation — one array per corpus rep) must be scanned,
        # never shuffled, per delivery.
        items = (
            shingle_store.join(F.broadcast(ids_needed), "id", "left_semi")
            .select("id", F.col("shingle_hashes").alias("set"))
            .localCheckpoint(eager=True)
        )
        if self._weighted:
            # exact WEIGHTED Jaccard over the same frozen weights the
            # signatures sampled — candidate and verify agree on what
            # "similar" means, exactly as in the batch pipeline's idf route
            scored = self._weighted_verify(
                items, cands, with_counts=self.enable_substring
            )
            thr = (
                cfg.weighted_verify_threshold
                if cfg.weighted_verify_threshold is not None
                else cfg.verify_threshold
            )
        else:
            scored = jaccard_pairs(items, cands, id_col="id", set_col="set", impl="arrays")
            thr = cfg.verify_threshold
        accept = F.col("jaccard") >= thr
        if self.enable_substring:
            # containment acceptance — identical expression to the batch
            # pipeline's: the substring pass exists to surface pairs whose
            # symmetric J is low (a file embedded in a larger one), so
            # J-only verify would reject everything it found; the min-size
            # floor keeps trivially-contained stubs from gluing components
            from sycl_jaccard_spark.functions.jaccard import containment_from_counts

            containment = containment_from_counts(
                F.col("inter"), F.col("size_a"), F.col("size_b")
            )
            accept = accept | (
                (containment >= cfg.containment_threshold)
                & (F.least("size_a", "size_b") >= cfg.containment_min_size)
            )
        verified = scored.filter(accept).select("a", "b", "jaccard")

        new_edges = verified.unionByName(
            batch_exact.select("a", "b", F.lit(1.0).alias("jaccard"))
        ).unionByName(cross_exact.select("a", "b", F.lit(1.0).alias("jaccard")))
        new_edges = self._write_batch("edges", new_edges, bid)
        n_new_edges = new_edges.count()
        t0 = self._mark("verify", t0, rows=n_new_edges, batch=bid)

        # -- labels: incremental (Δ-sized overlay update) or full CC --
        cc_stats: dict = {}
        self._update_labels(new_edges.select("a", "b"), bid, cc_stats)
        t0 = self._mark("connected_components", t0, batch=bid, **cc_stats)

        summary = {
            "batch": bid,
            "n_files": n_files,
            "n_redelivered": n_delivered - n_files,
            "n_new_uniques": n_new_uniques,
            "n_new_edges": n_new_edges,
            "cc": cc_stats,
            "wall_s": round(time.monotonic() - t_start, 3),
        }
        if self._weighted:
            # retrain signal: when the fraction of never-snapshotted shingles
            # grows past tolerance, the frozen weights have drifted from the
            # corpus — retrain idf_weights in batch and re-ingest (new store)
            summary["idf_drift"] = idf_drift
        if decontam_block:
            summary["decontam"] = decontam_block
        self._write_lineage("edges", bid, {**summary, "config": json.loads(self._config_fingerprint())})
        self.metrics.append({"stage": "batch_total", **summary})
        return summary

    def remove_ids(
        self,
        ids: DataFrame | list[int],
        id_col: str = "id",
        batch_id: int | None = None,
    ) -> dict:
        """Remove files from the living corpus (takedown / GDPR / retention)
        — the shrink half of the delta store, at cost proportional to the
        AFFECTED components, not the corpus.

        Removal is a tombstone epoch in the same batch-id sequence as
        deliveries (same replay window, same compaction horizon, same
        crash-guard lineage): every read path masks tombstoned ids via a
        broadcast anti-join, and :meth:`compact` physically purges the masked
        rows — the purge point for content-derived data (sha256, shingles,
        signatures), exactly the LSM delete model.

        What a removal must repair beyond masking:

        * **rep succession** — a removed exact-dup representative carries the
          group's ONLY shingle/banded(/volume) rows and all its near-dup
          edges. The min surviving same-sha256 id inherits: identity rows are
          copied under the successor's id (identical content, so this leaks
          nothing the survivors don't already carry) and every edge through
          the removed rep is rewritten to the successor (same jaccard —
          identical content). A group removed wholly gets no successor; its
          rows purge at compact().
        * **component splits** — labels are min-node labels and components
          can lose their min node or a bridge node, neither of which the
          merge-only closure can express. Connected components re-runs over
          the AFFECTED components' surviving subgraph only (members found by
          a broadcast-probe scan of the base, edges by a broadcast semi-join
          scan of the edge store), and every surviving member gets a row in
          the ``label_fix`` overlay: resolution precedence is
          ``closure[fix ?? base] ?? (fix ?? base)``, so fixes supersede the
          stale closure hops while later merges still resolve through the
          closure. Stale closure rows become unreachable (every node that
          could route through them now has a fix) and fold away at compact().

        A removed id cannot be re-ingested until a compact() purges its
        ``files/`` row (``add_batch``'s redelivery drop sees it as stored) —
        intentional: re-admitting an id inside the epoch that removed it
        would make replay order-dependent.

        Equivalence contract (tested in ``tests/test_delta.py``): after
        ``remove_ids(R)``, ``clusters()`` equals a full ``DedupPipeline`` run
        over the surviving corpus, label for label — same caveats on engaged
        skew caps as :class:`DeltaDedup` itself.
        """
        if not isinstance(ids, DataFrame):
            ids = self.spark.createDataFrame([(int(i),) for i in ids], "id long")
            id_col = "id"
        bid = self._begin_epoch(batch_id)
        t0 = time.monotonic()
        t_start = t0

        req = ids.select(F.col(id_col).alias("id")).distinct().localCheckpoint(eager=True)
        n_requested = req.count()
        tomb_prior = self._tombstones(exclude_bid=bid)
        # stored, not already tombstoned — unknown/already-removed ids are
        # counted and skipped (removal requests are idempotent by state)
        rm = (
            self._read("files", self._RELATIONS["files"])
            .join(F.broadcast(req), "id")
            .join(F.broadcast(tomb_prior.join(F.broadcast(req), "id")), "id", "left_anti")
            .select("id", "sha256", "is_rep")
            .localCheckpoint(eager=True)
        )
        n_removed = rm.count()
        self._write_batch("removed", rm.select("id"), bid)
        if n_removed == 0:
            # tombstone anchor written (epoch exists, replay-consistent);
            # nothing to repair
            self._write_batch(
                "edges", self.spark.createDataFrame([], "a long, b long, jaccard double"), bid
            )
            self._write_batch(
                "label_fix", self.spark.createDataFrame([], self._EPOCH_RELATIONS["label_fix"]), bid
            )
            summary = {
                "batch": bid, "op": "remove", "n_requested": n_requested,
                "n_removed": 0, "wall_s": round(time.monotonic() - t_start, 3),
            }
            self._write_lineage("edges", bid, {**summary, "config": json.loads(self._config_fingerprint())})
            self.metrics.append({"stage": "remove_total", **summary})
            return summary
        t0 = self._mark("rm_tombstone", t0, rows=n_removed, batch=bid)

        # -- rep succession: min surviving same-sha id inherits the removed
        # rep's identity rows and edges. Effective rep-ness is detected by
        # LIVE derived rows (shingles presence), not files.is_rep: a
        # SUCCESSOR from an earlier removal carries the group's shingle/
        # banded rows but keeps is_rep=false in the append-only files
        # relation, and removing it must trigger a second succession or the
        # group's surviving members silently lose their identity (the
        # store would split clusters a full run keeps together) --
        rm_live = (
            self._read("shingles", self._relations["shingles"])
            .join(F.broadcast(rm.select("id")), "id", "left_semi")
            .select("id")
            .distinct()
        )
        rm_reps = rm.join(F.broadcast(rm_live), "id", "left_semi").select(
            F.col("id").alias("old"), "sha256"
        )
        survivors = (
            self._read("files", self._RELATIONS["files"])
            .join(F.broadcast(rm_reps.select("sha256")), "sha256")
            .join(F.broadcast(tomb_prior), "id", "left_anti")
            .join(F.broadcast(rm.select("id")), "id", "left_anti")
            .groupBy("sha256")
            .agg(F.min("id").alias("succ"))
        )
        succ_map = (
            rm_reps.join(survivors, "sha256")
            .select("old", "succ")
            .localCheckpoint(eager=True)
        )
        n_successions = succ_map.count()
        copy_rels = ["shingles", "banded"] + (["volumes"] if self._weighted else [])
        for name in copy_rels:
            src = self._read(name, self._relations[name]).filter(F.col("batch") != bid)
            copies = (
                src.withColumnRenamed("id", "old")
                .join(F.broadcast(succ_map), "old")
                .select(F.col("succ").alias("id"), *[c for c in src.columns if c not in ("id", "batch")])
            )
            self._write_batch(name, copies, bid)
        t0 = self._mark("rm_succession", t0, rows=n_successions, batch=bid)

        # -- affected-component relabel (shared machinery; see
        # DeltaStoreBase._relabel_after_removal) with the succession
        # endpoint rewrites applied to the surviving subgraph --
        rel = self._relabel_after_removal(
            rm.select("id"), tomb_prior, bid, succ_map=succ_map
        )
        t0 = self._mark(
            "rm_relabel", t0, rows=rel["n_members_fixed"], batch=bid, **rel["cc"]
        )

        summary = {
            "batch": bid,
            "op": "remove",
            "n_requested": n_requested,
            "n_removed": n_removed,
            "n_already_absent": n_requested - n_removed,
            "n_rep_successions": n_successions,
            **rel,
            "wall_s": round(time.monotonic() - t_start, 3),
        }
        self._write_lineage("edges", bid, {**summary, "config": json.loads(self._config_fingerprint())})
        self.metrics.append({"stage": "remove_total", **summary})
        return summary

    # ---- store maintenance (compaction hooks; machinery in DeltaStoreBase) ----

    def compact(self, files_per_relation: int = 32) -> dict:
        """Fold every ``batch=N`` partition into one consolidated partition
        (see :meth:`DeltaStoreBase.compact` for the two-phase mechanics).
        ``label_base`` is consolidated with the fix overlay and the merge
        closure applied (``label_remaps`` then resets to empty — every label
        is final as of the compaction), and tombstoned rows are PHYSICALLY
        purged from every relation: compact() is the purge point for removed
        content's derived data (sha256/shingles/signatures/edges), exactly
        the LSM delete model.

        Run it when the store is quiescent (no live stream mid-epoch): the
        streaming leg's at-least-once window only ever spans the LAST epoch,
        whose id equals the compaction target, so a stream restarted from
        its checkpoint resumes at target+1 and never collides."""
        return super().compact(files_per_relation)

    # ---- retrain lifecycle ----

    def surviving_ids(self) -> DataFrame:
        """(id) of every surviving corpus row — the store's identity relation
        with tombstones masked (their rows purge physically at compact())."""
        tomb = self._tombstones()
        return (
            self._read("files", self._relations["files"])
            .join(F.broadcast(tomb), "id", "left_anti")
            .select("id")
        )

    def migrate(
        self,
        new_store_dir: str,
        files: DataFrame,
        idf_snapshot: DataFrame | None = None,
        id_col: str = "id",
        content_col: str = "content",
    ) -> "DeltaDedup":
        """Retrain-and-reingest — the documented response to a sustained
        ``idf_drift`` rise (the dense-vector twin is
        ``EmbeddingDeltaStore.migrate``). Weighted stores only: unweighted
        signatures are content-deterministic, so a rebuild would reproduce
        the store bit-for-bit (use :meth:`compact` for store hygiene).

        Unlike the embedding store — whose quantized vectors round-trip
        exactly, so it re-ingests from its own rows — this store persists
        signatures, not content: pass the source-of-truth corpus relation
        (id, content), the same relation :meth:`deduplicate` takes. It must
        carry exactly one row per surviving id (validated; signing fewer
        files than the store labels would silently shrink the corpus, and a
        duplicate id would fan out every downstream join). IDF retrains on
        the survivors' post-exact-dedup uniques via
        :func:`train_idf_snapshot` (or ``idf_snapshot`` is used verbatim),
        and everything delivers into a NEW store under this store's config
        in one epoch.

        The old store is untouched — a read-only cutover: point consumers at
        the new store, then delete the old directory. Labels are recomputed
        under the new weights (CWS signatures and verify scores change, so
        edges can too); the new store's state equals a batch weighted
        ``DedupPipeline`` run over the survivors (tested), whose internal
        training the retrained snapshot reproduces. The new store's
        ``idf_drift`` counters are as-of the fresh snapshot by construction.

        Cost: O(corpus) by definition — one validation count plus one
        delivery over the full surviving corpus (two scans of the source
        table; nothing corpus-sized is collected or pinned). Migration is
        the rare full-rebuild event the per-delivery O(Δ) path exists to
        amortize."""
        if not self._weighted:
            raise ValueError(
                "migrate() is the idf_drift response — only weighted "
                "(candidate_weights='idf') stores have a snapshot to "
                "retrain; unweighted signatures are content-deterministic, "
                "so a rebuild would reproduce the same state (use compact() "
                "for store hygiene)"
            )
        surv = self.surviving_ids()
        n_surv = surv.count()
        corpus = files.select(
            F.col(id_col).alias("id"), F.col(content_col).alias("content")
        ).join(surv, "id")
        # one aggregation checks both halves — row count alone would accept a
        # corpus where a duplicated id masks a missing survivor (counts cancel)
        cov = corpus.agg(
            F.count(F.lit(1)).alias("n"), F.count_distinct("id").alias("d")
        ).first()
        if cov["n"] != n_surv or cov["d"] != n_surv:
            raise ValueError(
                f"source corpus must carry exactly one row per surviving id "
                f"(store labels {n_surv} survivors, the join matched "
                f"{cov['n']} rows over {cov['d']} distinct ids) — the store "
                "persists signatures, not content, so migrate() needs the "
                "source-of-truth relation covering every survivor exactly once"
            )
        if idf_snapshot is None:
            idf_snapshot = train_idf_snapshot(corpus, self.cfg)
        new_store = DeltaDedup(
            self.spark,
            new_store_dir,
            self.cfg,
            enable_simhash=self.enable_simhash,
            enable_substring=self.enable_substring,
            cc_mode=self.cc_mode,
            idf_snapshot=idf_snapshot,
            # the benchmark snapshot carries over unchanged: contamination
            # scores are weight-independent (set containment), so the new
            # store re-probes the re-ingested corpus against the same set
            bench_snapshot=self._bench,
            bench_min_overlap=self.bench_min_overlap,
        )
        summary = new_store.add_batch(corpus)
        self.metrics.append(
            {"stage": "migrate", "new_store": new_store.root, **summary}
        )
        return new_store

    # ---- outputs ----

    def deduplicate(
        self,
        files: DataFrame,
        strategy: str = "longest",
        id_col: str = "id",
        content_col: str = "content",
    ) -> tuple[DataFrame, DataFrame]:
        """Corpus-level dedup ACTION over the store's current labels — the
        same (kept_files, manifest) contract as the batch pipeline's
        :func:`~sycl_jaccard_spark.operators.representatives.deduplicate_corpus`.
        The store keeps identity (sha256/shingles/edges/labels), not
        content, so pass the corpus ``files`` relation (id, content) —
        typically the same Iceberg/parquet table the deliveries were
        ingested from. ``strategy="min_id"`` needs no content column."""
        from sycl_jaccard_spark.operators.representatives import deduplicate_corpus

        return deduplicate_corpus(
            files, self.clusters(), strategy, id_col=id_col, content_col=content_col
        )

    def contamination_manifest(self, threshold: float = 0.5) -> DataFrame:
        """(doc_id, max_containment, contaminated) for every SURVIVING file —
        the same per-document drop manifest as the batch operator
        (:func:`~sycl_jaccard_spark.operators.decontaminate.decontamination_manifest`),
        maintained incrementally: each delivery probed only its never-seen
        contents, and every exact copy inherits its content's score through
        the sha256 key. ``threshold`` is a QUERY-time parameter (the store
        persists raw scores, not verdicts), so tightening the drop rule
        never needs a re-probe.

        Tested equivalent, score-for-score, to the batch manifest over the
        unioned corpus (tests/test_delta.py)."""
        if not self._bench_enabled:
            raise ValueError(
                "this store has no benchmark snapshot — open a NEW store "
                "with bench_snapshot= to maintain a contamination manifest "
                "(retroactive enabling is refused: earlier deliveries were "
                "never probed)"
            )
        # fold re-probe duplicates (a tombstoned rep's content re-delivered
        # later is probed again, with identical scores) to one row per content
        contam = (
            self._read("contam", "sha256 string, max_containment double")
            .groupBy("sha256")
            .agg(F.max("max_containment").alias("max_containment"))
        )
        tomb = self._tombstones()
        surv = self._read("files", self._RELATIONS["files"]).join(
            F.broadcast(tomb), "id", "left_anti"
        )
        # contam is leak-sized by construction (only contents sharing >=
        # min_overlap benchmark n-grams have rows) — broadcast it so the
        # corpus identity relation streams through unshuffled
        return surv.join(F.broadcast(contam), "sha256", "left").select(
            F.col("id").alias("doc_id"),
            F.coalesce("max_containment", F.lit(0.0)).alias("max_containment"),
            (F.coalesce("max_containment", F.lit(0.0)) >= threshold).alias(
                "contaminated"
            ),
        )

    def decontaminate(
        self, files: DataFrame, threshold: float = 0.5, id_col: str = "id"
    ) -> tuple[DataFrame, DataFrame]:
        """Corpus action: ``(training_set, manifest)`` — ``files`` minus every
        row whose content leaks a benchmark item at ``threshold``, via the
        same broadcast anti-join as the batch
        :func:`~sycl_jaccard_spark.operators.decontaminate.drop_contaminated`.
        Like :meth:`deduplicate`, the store keeps identity, not content —
        pass the source-of-truth corpus relation."""
        from sycl_jaccard_spark.operators.decontaminate import drop_contaminated

        manifest = self.contamination_manifest(threshold)
        return drop_contaminated(files, manifest, id_col), manifest

    def training_set(
        self,
        files: DataFrame,
        threshold: float = 0.5,
        strategy: str = "longest",
        quality=None,
        id_col: str = "id",
        content_col: str = "content",
    ) -> tuple[DataFrame, DataFrame]:
        """The store's corpus actions composed in one pass
        (:func:`~sycl_jaccard_spark.operators.representatives.training_set`):
        drop benchmark leaks FIRST at ``threshold``, drop documents failing
        the optional ``quality`` gate
        (:class:`~sycl_jaccard_spark.operators.representatives.QualityGate`)
        second, then keep one ``strategy`` representative per near-dup
        cluster among the survivors — a cluster whose best member is a leak
        or junk keeps its best clean member instead of disappearing.
        Returns ``(training_files, manifest)`` with per-row keep/drop_reason
        ('contaminated'/'low_quality'/'duplicate'). Requires a bench-enabled
        store; like :meth:`deduplicate`, pass the source-of-truth
        (id, content) relation."""
        from sycl_jaccard_spark.operators.representatives import training_set

        return training_set(
            files,
            self.clusters(),
            self.contamination_manifest(threshold),
            strategy,
            quality=quality,
            id_col=id_col,
            content_col=content_col,
        )

    def _compact_transform(self, name: str, df: DataFrame, ctx: dict) -> DataFrame:
        if name == "contam":
            # content-keyed scores: tombstones are id-scoped and do not
            # invalidate a content fact (surviving copies keep their score;
            # a lingering row for fully-removed content is harmless and
            # sparse). Fold re-probe duplicates to one row per content.
            return df.groupBy("sha256").agg(
                F.max("max_containment").alias("max_containment")
            )
        return super()._compact_transform(name, df, ctx)
