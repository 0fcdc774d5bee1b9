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
signal. When drift exceeds tolerance, retrain IDF in batch and re-ingest
into a NEW store: stored CWS signatures and verify scores are definitionally
as-of their snapshot, so a store never silently re-weights history.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sycl_jaccard_spark.config import PipelineConfig
from sycl_jaccard_spark.functions.minhash import minhash_simhash_udf, minhash_udf
from sycl_jaccard_spark.functions.shingles import doc_shingle_hashes, line_gram_hashes
from sycl_jaccard_spark.functions.simhash import n_simhash_tables
from sycl_jaccard_spark.operators.components import connected_components
from sycl_jaccard_spark.operators.lsh import candidate_pairs
from sycl_jaccard_spark.operators.pair_jaccard import jaccard_pairs
from sycl_jaccard_spark.operators.weighted_dedup import weighted_signatures
from sycl_jaccard_spark.plans.pipeline import banded_relation

class DeltaDedup:
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

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        cfg: PipelineConfig | None = None,
        enable_simhash: bool = True,
        enable_substring: bool = False,
        cc_mode: str = "incremental",
        idf_snapshot: DataFrame | None = None,
    ):
        self.spark = spark
        self.root = store_dir.rstrip("/")
        self.cfg = cfg or PipelineConfig()
        self._weighted = self.cfg.candidate_weights == "idf"
        self._relations = dict(self._RELATIONS)
        if self._weighted:
            self._relations["volumes"] = "id long, vol double"
        elif idf_snapshot is not None:
            raise ValueError(
                "idf_snapshot is only meaningful with candidate_weights='idf'"
            )
        if cc_mode not in ("incremental", "full"):
            raise ValueError(f"unknown cc_mode {cc_mode!r}")
        self.enable_simhash = enable_simhash
        self.enable_substring = enable_substring
        self.cc_mode = cc_mode
        self.metrics: list[dict] = []
        if self._exists(f"{self.root}/_compact_tmp"):
            raise ValueError(
                f"delta store {self.root} has a leftover _compact_tmp — a "
                "compaction was interrupted before the swap completed; "
                "inspect which relations were already swapped (the tmp dir "
                "holds complete consolidated copies) before deleting it"
            )
        self._check_config()
        self._idf: DataFrame | None = None
        self._novel_weight: float | None = None
        if self._weighted:
            self._init_idf_snapshot(idf_snapshot)

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
                    "snapshot — retrain + re-ingest into a new store instead"
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

    def _fs(self, path: str):
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        return hpath.getFileSystem(self.spark._jsc.hadoopConfiguration()), hpath

    def _exists(self, path: str) -> bool:
        fs, hpath = self._fs(path)
        return bool(fs.exists(hpath))

    def _config_fingerprint(self) -> str:
        from dataclasses import asdict

        # enable_substring joins the fingerprint only when ON so stores
        # written before the substring leg existed still open cleanly with
        # the default; a substring store and a non-substring store can never
        # silently mix (their banded relations carry different pass rows)
        fp = {"cfg": asdict(self.cfg), "enable_simhash": self.enable_simhash}
        if self.enable_substring:
            fp["enable_substring"] = True
        return json.dumps(fp, sort_keys=True)

    def _check_config(self) -> None:
        """A delta store is long-lived corpus state: on fingerprint mismatch
        we REFUSE (unlike the batch pipeline, which purges and recomputes) —
        silently mixing shingle/band configs across batches would make stored
        signatures incomparable with new ones."""
        path = f"{self.root}/store_config"
        fp = self._config_fingerprint()
        if self._exists(path):
            stored = self.spark.read.text(path).first()
            if stored is None or stored.value != fp:
                raise ValueError(
                    f"delta store {self.root} was written under a different "
                    "config; re-signing the corpus requires a new store"
                )
            return
        self.spark.createDataFrame([(fp,)], "value string").coalesce(1).write.mode(
            "overwrite"
        ).text(path)

    def _read(self, name: str, schema: str) -> DataFrame:
        """Read an additive store relation (batch=N partition discovery),
        keeping the ``batch`` partition column; empty DataFrame with the
        right schema when the store has no batches yet."""
        path = f"{self.root}/{name}"
        if self._exists(path):
            fs, hpath = self._fs(path)
            has_batch = any(
                s.getPath().getName().startswith("batch=") for s in fs.listStatus(hpath)
            )
            if has_batch:
                return self.spark.read.parquet(path)
        return self.spark.createDataFrame([], schema + ", batch int")

    def batch_ids(self) -> list[int]:
        """Every epoch id the store has seen — additions anchor in ``files/``
        partitions, removals in ``removed/`` partitions; both draw from ONE
        id sequence so the replay-window and horizon guards compose."""
        out: set[int] = set()
        for rel in ("files", "removed"):
            path = f"{self.root}/{rel}"
            if not self._exists(path):
                continue
            fs, hpath = self._fs(path)
            for s in fs.listStatus(hpath):
                name = s.getPath().getName()
                if name.startswith("batch="):
                    out.add(int(name.split("=", 1)[1]))
        return sorted(out)

    def incomplete_batch_ids(self) -> list[int]:
        """Epochs whose anchor partition (``files/`` for a delivery,
        ``removed/`` for a removal) exists but whose ``edges/`` lineage
        (written LAST in both ``add_batch`` and ``remove_ids``) is missing —
        the signature of a crash mid-epoch. An incomplete delivery holds
        ``is_rep`` rows whose content was never shingled/signed; an
        incomplete removal holds tombstones whose label fixes were never
        written (survivor clusters would read stale). New epochs are refused
        until the incomplete one is replayed (replaying overwrites its
        partitions — at-least-once)."""
        return [
            bid
            for bid in self.batch_ids()
            if not self._exists(f"{self.root}/edges/batch={bid}/_lineage.json")
        ]

    def _tombstones(self, exclude_bid: int | None = None) -> DataFrame:
        """Removed ids (Δ removals since the last compaction — compact()
        physically purges the masked rows and resets this). Small by the same
        operational bound as a delivery: split mega-removals, compact between
        epochs — every read path broadcasts it as an anti-join probe so store
        relations stay scan-only."""
        tomb = self._read("removed", self._EPOCH_RELATIONS["removed"])
        if exclude_bid is not None:
            tomb = tomb.filter(F.col("batch") != exclude_bid)
        return tomb.select("id")

    def _latest_fixes(self, exclude_bid: int | None = None) -> DataFrame:
        """Post-removal corrected labels, latest epoch per node (a node can
        be re-fixed by a later removal). Resolution precedence everywhere:
        ``closure[fix ?? base] ?? (fix ?? base)`` — a fix supersedes the base
        label AND any closure hop recorded for it (removals can SPLIT
        components, which the merge-only closure cannot express), while later
        merges of a fixed label still resolve through the closure."""
        fixes = self._read("label_fix", self._EPOCH_RELATIONS["label_fix"])
        if exclude_bid is not None:
            fixes = fixes.filter(F.col("batch") != exclude_bid)
        return fixes.groupBy("node").agg(
            F.max_by("label", "batch").alias("fix_label")
        )

    def _begin_epoch(self, batch_id: int | None) -> int:
        """Allocate/validate an epoch id under the shared replay-window,
        horizon and incomplete-epoch guards (see :meth:`add_batch`)."""
        existing = self.batch_ids()
        bid = batch_id if batch_id is not None else (existing[-1] + 1 if existing else 0)
        horizon = self.compacted_through()
        if bid <= horizon:
            raise ValueError(
                f"batch_id {bid} is at or below the compaction horizon "
                f"({horizon}): its rows were folded into the consolidated "
                "partition, so an overwrite-replay would duplicate them — "
                "compact() closes the replay window for prior batch ids"
            )
        if existing and bid < existing[-1]:
            raise ValueError(
                f"batch_id {bid} precedes the latest stored batch "
                f"({existing[-1]}): later batches already verified their "
                "pairs against this batch's rows, so re-running it would "
                "re-emit those cross-batch edges into a second partition — "
                "only the LATEST batch id is replayable (the at-least-once "
                "window); new deliveries must use a higher id"
            )
        stale = [x for x in self.incomplete_batch_ids() if x != bid]
        if stale:
            raise ValueError(
                f"delta store {self.root} has incomplete batch(es) {stale}: "
                "a prior add_batch/remove_ids crashed after writing its "
                "anchor partition (files/ or removed/) but before edges/ "
                "lineage completed — replay exactly that batch_id (same "
                "delivery / same removal set) to heal the store before "
                "adding new epochs"
            )
        return bid

    def _write_batch(self, name: str, df: DataFrame, bid: int) -> DataFrame:
        path = f"{self.root}/{name}/batch={bid}"
        df.write.mode("overwrite").parquet(path)
        # a batch REPLAY overwrites a path this session has already read;
        # Spark's FileStatusCache would otherwise serve the deleted file list
        self.spark.catalog.refreshByPath(f"{self.root}/{name}")
        return self.spark.read.parquet(path)

    def _write_lineage(self, name: str, bid: int, record: dict) -> None:
        fs, hpath = self._fs(f"{self.root}/{name}/batch={bid}/_lineage.json")
        stream = fs.create(hpath, True)
        try:
            stream.write(bytearray(json.dumps(record, sort_keys=True).encode()))
        finally:
            stream.close()

    def _mark(self, stage: str, t0: float, **extra) -> float:
        now = time.monotonic()
        self.metrics.append(
            {"stage": stage, "wall_s": round(now - t0, 3), **extra}
        )
        return now

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
        bid = self._begin_epoch(batch_id)
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
            # substring pass (suffix-array analog) — SAME band-id layout as
            # the batch pipeline (cfg.bands + n_simhash_tables, regardless of
            # whether SimHash is on) so the two runners can never drift.
            # Line grams are computed from this delivery's content at signing
            # time; only (id, band, band_hash) rows persist — the store never
            # carries content.
            sub_banded = new_uniques.select(
                "id",
                F.explode(
                    line_gram_hashes(F.col("content"), cfg.substring_lines)
                ).alias("band_hash"),
            ).select(
                "id",
                F.lit(
                    cfg.bands
                    + n_simhash_tables(cfg.simhash_blocks, cfg.simhash_max_hamming)
                ).alias("band"),
                "band_hash",
            )
            new_banded = new_banded.unionByName(sub_banded)
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
        cfg = self.cfg
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
        # rep's identity rows and edges --
        rm_reps = rm.filter("is_rep").select(F.col("id").alias("old"), "sha256")
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

        # -- affected components: current labels of removed edge-graph nodes --
        base = self._read("label_base", self._RELATIONS["label_base"])
        closure = self._closure()
        fixes = self._latest_fixes(exclude_bid=bid)
        def _resolve(nodes: DataFrame) -> DataFrame:
            """(node, cur) — current label under fix/closure precedence."""
            return (
                nodes.join(F.broadcast(fixes), "node", "left")
                .select("node", "label", "fix_label")
                .select("node", F.coalesce("fix_label", "label").alias("lab0"))
                .join(F.broadcast(closure), F.col("lab0") == F.col("old_label"), "left")
                .select("node", F.coalesce("new_label", "lab0").alias("cur"))
            )
        rm_nodes = base.join(
            F.broadcast(rm.select(F.col("id").alias("node"))), "node"
        ).select("node", "label")
        affected = (
            _resolve(rm_nodes).select("cur").distinct().localCheckpoint(eager=True)
        )
        # every member of an affected component: one scan of the base with
        # broadcast fix/closure hops and a broadcast filter on the resolved
        # label — scan-only, no shuffle of the base (same cost language as
        # every other store probe); Δ' = affected component sizes
        members = (
            _resolve(base.select("node", "label"))
            .join(F.broadcast(affected), "cur", "left_semi")
            .select("node")
            .localCheckpoint(eager=True)
        )

        # -- surviving subgraph of the affected components --
        all_tomb = tomb_prior.unionByName(rm.select("id")).localCheckpoint(eager=True)
        # semi-join on ONE endpoint suffices: members covers affected
        # components in full, and an edge's endpoints share a component by
        # construction (rows touching earlier-removed ids are dead either
        # way — the anti-join below drops them)
        sub = (
            self._read("edges", "a long, b long, jaccard double")
            .filter(F.col("batch") != bid)
            .join(F.broadcast(members.withColumnRenamed("node", "a")), "a", "left_semi")
            .withColumnRenamed("a", "ea")
            .withColumnRenamed("b", "eb")
            .join(F.broadcast(succ_map.withColumnsRenamed({"old": "ea", "succ": "sa"})), "ea", "left")
            .join(F.broadcast(succ_map.withColumnsRenamed({"old": "eb", "succ": "sb"})), "eb", "left")
            .select(
                F.coalesce("sa", "ea").alias("a"),
                F.coalesce("sb", "eb").alias("b"),
                "jaccard",
                (F.col("sa").isNotNull() | F.col("sb").isNotNull()).alias("rewritten"),
            )
            .join(F.broadcast(all_tomb.withColumnRenamed("id", "a")), "a", "left_anti")
            .join(F.broadcast(all_tomb.withColumnRenamed("id", "b")), "b", "left_anti")
            .filter(F.col("a") != F.col("b"))
            .localCheckpoint(eager=True)
        )
        # persist ONLY the rewritten rows — the unchanged survivors already
        # live in the store; views mask the originals they replace
        n_rewritten = self._write_batch(
            "edges", sub.filter("rewritten").select("a", "b", "jaccard"), bid
        ).count()

        # -- relabel the affected components' survivors --
        cc_stats: dict = {}
        sub_labels = connected_components(
            sub.select("a", "b"),
            max_iterations=cfg.max_cc_iterations,
            checkpoint_every=cfg.checkpoint_every,
            stats=cc_stats,
        )
        fixes_rows = (
            members.join(F.broadcast(all_tomb.withColumnRenamed("id", "node")), "node", "left_anti")
            .join(sub_labels, "node", "left")
            .select("node", F.coalesce("label", "node").alias("label"))
        )
        n_fixed = self._write_batch("label_fix", fixes_rows, bid).count()
        t0 = self._mark("rm_relabel", t0, rows=n_fixed, batch=bid, **cc_stats)

        summary = {
            "batch": bid,
            "op": "remove",
            "n_requested": n_requested,
            "n_removed": n_removed,
            "n_already_absent": n_requested - n_removed,
            "n_rep_successions": n_successions,
            "n_edges_rewritten": n_rewritten,
            "n_affected_components": affected.count(),
            "n_members_fixed": n_fixed,
            "cc": cc_stats,
            "wall_s": round(time.monotonic() - t_start, 3),
        }
        self._write_lineage("edges", bid, {**summary, "config": json.loads(self._config_fingerprint())})
        self.metrics.append({"stage": "remove_total", **summary})
        return summary

    def _closure(self) -> DataFrame:
        """The folded (old_label → new_label) merge closure; empty on a
        store that has never merged across batches."""
        path = f"{self.root}/label_remaps"
        if self._exists(f"{path}/_SUCCESS"):
            return self.spark.read.parquet(path)
        return self.spark.createDataFrame([], self._CLOSURE_SCHEMA)

    def _write_closure(self, closure: DataFrame) -> None:
        # cut lineage first: the new closure is derived from the parquet
        # directory the write below overwrites
        closure = closure.localCheckpoint(eager=True)
        closure.write.mode("overwrite").parquet(f"{self.root}/label_remaps")
        self.spark.catalog.refreshByPath(f"{self.root}/label_remaps")

    def _update_labels(self, new_edges: DataFrame, bid: int, stats: dict) -> None:
        cfg = self.cfg
        if self.cc_mode == "full":
            # O(edge store) by declaration: recompute every label, rewrite the
            # base as one partition, clear the closure (the equivalence tests
            # run this mode side-by-side with incremental stores)
            all_edges = self._read("edges", "a long, b long, jaccard double").select("a", "b")
            stats["mode"] = "full"
            labels = connected_components(
                all_edges, max_iterations=cfg.max_cc_iterations,
                checkpoint_every=cfg.checkpoint_every, stats=stats,
            ).localCheckpoint(eager=True)  # cut lineage to edges/ + old base
            fs, base_dir = self._fs(f"{self.root}/label_base")
            fs.delete(base_dir, True)
            self._write_batch("label_base", labels, bid)
            self._write_closure(self.spark.createDataFrame([], self._CLOSURE_SCHEMA))
            return

        # incremental: CC over the CONTRACTED graph. A stored label is by
        # construction the MIN NODE of its component, so mapping each new
        # edge's endpoints through their current labels (identity for
        # never-seen nodes) yields a Δ-sized super-node graph whose
        # components are exactly the merged ones, and whose min-node labels
        # are the correct global minima (every old member is >= its
        # component's label). Edges accumulate — components merge, never
        # split — so neither the edge store nor any corpus-sized label
        # relation is re-read or re-written: the endpoint set is Δ-sized and
        # broadcast into a semi-join probe of the base (scan, no shuffle),
        # and the merge outcome lands as closure rows, not member rewrites.
        stats["mode"] = "incremental"
        eps = (
            new_edges.select(F.col("a").alias("node"))
            .union(new_edges.select(F.col("b").alias("node")))
            .distinct()
            # consumed by the base probe, the resolve join and the entering
            # anti-join — Δ-sized, so the materialization is cheap
            .localCheckpoint(eager=True)
        )
        # base rows for exactly the endpoints this delivery touches. The
        # broadcast keeps the probe a scan (no exchange on the base side); a
        # delivery's endpoint set is Δ-sized by construction — a delivery too
        # big to broadcast is split upstream, the same operational bound as
        # the candidate prune. At cluster scale the scan itself prunes via
        # bucketing/bloom on `node`.
        base = self._read("label_base", self._RELATIONS["label_base"]).filter(
            F.col("batch") != bid
        )
        base_hits = base.join(F.broadcast(eps), "node", "left_semi").select(
            "node", "label"
        ).localCheckpoint(eager=True)
        closure = self._closure()
        # post-removal fixes supersede the base label (and its closure hop):
        # a removal may have SPLIT the component the base/closure still
        # describe. The probe is Δ-sized (fix rows for exactly these eps).
        fix_hits = self._latest_fixes(exclude_bid=bid).join(
            F.broadcast(eps), "node"
        )
        resolved = (
            eps.join(base_hits, "node", "left")
            .join(fix_hits, "node", "left")
            .select(
                "node", F.coalesce("fix_label", "label", "node").alias("lab0")
            )
            .join(
                F.broadcast(closure),
                F.col("lab0") == F.col("old_label"),
                "left",
            )
            .select("node", F.coalesce("new_label", "lab0").alias("cur"))
        )
        contracted = (
            new_edges
            .join(resolved.select(F.col("node").alias("a"), F.col("cur").alias("ca")), "a")
            .join(resolved.select(F.col("node").alias("b"), F.col("cur").alias("cb")), "b")
            .select(F.col("ca").alias("a"), F.col("cb").alias("b"))
            # Δ-sized, two consumers inside connected_components (count +
            # collect/star rounds) — materialize so the resolve joins run once
            .localCheckpoint(eager=True)
        )
        sub_labels = connected_components(
            contracted,
            max_iterations=cfg.max_cc_iterations,
            checkpoint_every=cfg.checkpoint_every,
            stats=stats,
        ).localCheckpoint(eager=True)  # consumed by entering + remap below

        # super-nodes with no base row are exactly the nodes entering the
        # edge graph this delivery (a stored current label is itself a node
        # with a base row); their sub-label is already final
        new_nodes = eps.join(base_hits.select("node"), "node", "left_anti")
        entering = sub_labels.join(F.broadcast(new_nodes), "node", "left_semi")
        self._write_batch("label_base", entering, bid)

        # merges: an existing current label contracted into a smaller one.
        # Fold into the closure: redirect stored rows whose target was
        # merged this batch (one hop stays sufficient — this batch's targets
        # are final within the batch), then append the new remaps.
        remaps = (
            sub_labels.filter(F.col("node") != F.col("label"))
            .join(F.broadcast(new_nodes), "node", "left_anti")
            .select(F.col("node").alias("old_label"), F.col("label").alias("new_label"))
        )
        updated = (
            closure.join(
                F.broadcast(remaps.withColumnsRenamed(
                    {"old_label": "r_old", "new_label": "r_new"}
                )),
                F.col("new_label") == F.col("r_old"),
                "left",
            )
            .select("old_label", F.coalesce("r_new", "new_label").alias("new_label"))
        )
        self._write_closure(updated.unionByName(remaps))

    # ---- store maintenance ----

    def compacted_through(self) -> int:
        """Highest batch id folded into a consolidated partition by
        :meth:`compact`; -1 when the store has never been compacted.
        ``add_batch`` refuses batch ids at or below this horizon."""
        # NOT underscore-prefixed: Spark file sources treat _-prefixed
        # paths as hidden (explicit top-level reads work but WARN)
        path = f"{self.root}/compaction_horizon"
        if not self._exists(path):
            return -1
        row = self.spark.read.text(path).first()
        return int(row.value) if row is not None else -1

    def compact(self, files_per_relation: int = 32) -> dict:
        """Fold every ``batch=N`` partition of each additive relation into
        ONE consolidated partition (``batch=<max existing id>``), rows
        preserved verbatim except ``label_base``, which is consolidated with
        the merge closure applied (``label_remaps`` then resets to empty —
        every label is final as of the compaction). Future ``add_batch``
        calls continue from max+1 exactly as before; replays of
        pre-compaction batch ids are refused (see class docstring).

        Run it when the store is quiescent (no live stream mid-epoch): the
        streaming leg's at-least-once window only ever spans the LAST
        epoch, whose id equals the compaction target, so a stream restarted
        from its checkpoint resumes at target+1 and never collides.

        Two-phase: all consolidated copies are written to
        ``_compact_tmp/`` first, then each relation directory is swapped
        via delete+rename. A crash mid-swap leaves ``_compact_tmp`` in
        place (complete copies of every relation) and the constructor
        refuses the store until it is resolved — no window loses rows.

        ``files_per_relation`` bounds the output file count per relation
        (the point of compacting: O(batches × partitions) small files →
        O(1) right-sized ones)."""
        bids = self.batch_ids()
        t0 = time.monotonic()
        if len(bids) <= 1:
            return {"compacted": False, "n_batches": len(bids)}
        target = bids[-1]
        summary: dict = {
            "compacted": True,
            "into_batch": target,
            "n_batches": len(bids),
            "rows": {},
        }
        # phase 1: write every consolidated copy (no destructive step yet).
        # label_base is consolidated WITH the fix overlay and the closure
        # applied (both reset below) — compaction is what bounds the closure
        # to the merge events and the fixes/tombstones to the removals of
        # the current epoch. Tombstoned rows are PHYSICALLY dropped from
        # every relation here: compact() is the purge point for removed
        # content's derived data (sha256/shingles/signatures/edges).
        closure = self._closure().localCheckpoint(eager=True)
        tomb = self._tombstones().localCheckpoint(eager=True)
        fixes = self._latest_fixes().localCheckpoint(eager=True)
        for name, schema in self._relations.items():
            tmp = f"{self.root}/_compact_tmp/{name}/batch={target}"
            df = self._read(name, schema).drop("batch")
            if name == "edges":
                df = df.join(
                    F.broadcast(tomb.withColumnRenamed("id", "a")), "a", "left_anti"
                ).join(F.broadcast(tomb.withColumnRenamed("id", "b")), "b", "left_anti")
            elif name == "label_base":
                df = (
                    df.join(F.broadcast(tomb.withColumnRenamed("id", "node")), "node", "left_anti")
                    .join(F.broadcast(fixes), "node", "left")
                    .select("node", F.coalesce("fix_label", "label").alias("lab0"))
                    .join(F.broadcast(closure), F.col("lab0") == F.col("old_label"), "left")
                    .select("node", F.coalesce("new_label", "lab0").alias("label"))
                )
            else:
                df = df.join(F.broadcast(tomb), "id", "left_anti")
            df.repartition(files_per_relation).write.mode("overwrite").parquet(tmp)
            summary["rows"][name] = self.spark.read.parquet(tmp).count()
        self.spark.createDataFrame([], self._CLOSURE_SCHEMA).write.mode(
            "overwrite"
        ).parquet(f"{self.root}/_compact_tmp/label_remaps")
        # epoch relations fold away: tombstones are now applied (purged) and
        # fixes live inside the consolidated base. batch=target keeps the
        # directory shape uniform for _read's partition discovery.
        for name, schema in self._EPOCH_RELATIONS.items():
            self.spark.createDataFrame([], schema).write.mode("overwrite").parquet(
                f"{self.root}/_compact_tmp/{name}/batch={target}"
            )
        # advance the horizon BEFORE any destructive swap: a crash between
        # the swap and a trailing horizon write would silently reopen the
        # replay window for folded batch ids (a replay would then duplicate
        # rows already inside the consolidated partition). Advancing early
        # errs the safe way — a crash before the swap leaves replays of
        # still-unfolded ids refused, and the constructor's _compact_tmp
        # guard forces manual resolution there anyway.
        self.spark.createDataFrame([(str(target),)], "value string").coalesce(
            1
        ).write.mode("overwrite").text(f"{self.root}/compaction_horizon")
        # phase 2: swap directories (metadata-only; crash leaves tmp intact,
        # and the constructor refuses the store until resolved). label_fix
        # and label_remaps swap to empty AFTER label_base swaps to the
        # applied copy — re-applying an old fix or closure row to
        # already-final labels is a no-op (a fix of a since-merged label
        # still resolves through the closure, which swaps last; a final
        # label is never an old_label of the folded closure).
        for name in [*self._relations, *self._EPOCH_RELATIONS, "label_remaps"]:
            fs, old = self._fs(f"{self.root}/{name}")
            fs.delete(old, True)
            _, tmp_path = self._fs(f"{self.root}/_compact_tmp/{name}")
            fs.rename(tmp_path, old)
            self.spark.catalog.refreshByPath(f"{self.root}/{name}")
        fs, tmp_root = self._fs(f"{self.root}/_compact_tmp")
        fs.delete(tmp_root, True)
        summary["wall_s"] = round(time.monotonic() - t0, 3)
        self._write_lineage("edges", target, {"compaction": summary})
        self.metrics.append({"stage": "compact", **summary})
        return summary

    # ---- outputs ----

    def edges(self) -> DataFrame:
        """Verified dup edges between SURVIVING files: tombstoned endpoints
        are masked at read time (their rows purge physically at compact());
        rep-succession rewrites live as ordinary edge rows under the removal
        epoch's partition."""
        tomb = self._tombstones()
        return (
            self._read("edges", "a long, b long, jaccard double")
            .join(F.broadcast(tomb.withColumnRenamed("id", "a")), "a", "left_anti")
            .join(F.broadcast(tomb.withColumnRenamed("id", "b")), "b", "left_anti")
            .select("a", "b", "jaccard")
        )

    def clusters(self) -> DataFrame:
        """(id, cluster) for every SURVIVING file — cluster = min id of the
        connected component, id itself for singletons (same contract as
        ``DedupPipeline.run().clusters``). Resolves the label overlay at read
        time with removal-fix precedence: ``closure[fix ?? base] ?? (fix ??
        base)`` (fixes express the component splits the merge-only closure
        cannot — see :meth:`remove_ids`)."""
        tomb = self._tombstones()
        files = (
            self._read("files", self._RELATIONS["files"])
            .join(F.broadcast(tomb), "id", "left_anti")
            .select("id")
        )
        base = self._read("label_base", self._RELATIONS["label_base"])
        labels = (
            base.join(self._latest_fixes(), "node", "left")
            .select("node", F.coalesce("fix_label", "label").alias("lab0"))
            .join(
                F.broadcast(self._closure()),
                F.col("lab0") == F.col("old_label"),
                "left",
            )
            .select("node", F.coalesce("new_label", "lab0").alias("label"))
        )
        return files.join(labels, files.id == labels.node, "left").select(
            "id", F.coalesce("label", F.col("id")).alias("cluster")
        )

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

    def write_metrics(self, path: str) -> None:
        with open(path, "w") as f:
            for m in self.metrics:
                f.write(json.dumps(m) + "\n")
