"""Shared plumbing for persistent delta stores (text dedup and embedding
near-dup): batch-partitioned parquet relations, one epoch-id sequence for
additions and removals, at-least-once replay windows, crash-guard lineage,
and two-phase compaction.

Both stores follow one storage contract (see ``plans/delta.py`` for the full
rationale — the reference engine is batch-only, ``main.cpp:63-361``, and this
layer is what lets a living 100 TB corpus pay per-delivery cost proportional
to the DELTA):

* every additive relation is partitioned by ``batch=<n>`` so replaying a
  batch OVERWRITES its own partition instead of duplicating rows;
* additions and removals draw epoch ids from ONE sequence, so the replay
  window (only the LATEST epoch is replayable) and the compaction horizon
  (epochs at or below it are folded and non-replayable) compose;
* the FINAL relation's per-batch ``_lineage.json`` (written last) is the
  epoch commit record — an anchor partition without it marks a mid-epoch
  crash, and new epochs are refused until the incomplete one is replayed;
* ``compact()`` is two-phase: consolidated copies land in ``_compact_tmp/``
  first, the horizon advances, then directories swap via delete+rename; a
  crash mid-swap leaves complete copies in the tmp dir and the constructor
  refuses the store until it is resolved.

Subclasses set (before calling :meth:`_init_store`):

* ``self._relations`` — ``{name: schema}`` for the additive relations;
* ``self._epoch_relations`` — ``{name: schema}`` for the epoch-scoped
  relations written by removals (folded away at compaction);
* class attrs ``_EPOCH_ANCHORS`` (relations whose ``batch=`` partitions
  enumerate epochs) and ``_FINAL_RELATION`` (carries the lineage record);

and implement ``_config_fingerprint()``.

Both stores are *labeled incremental graph stores* — they accumulate a
verified similarity edge set and maintain min-node connected-component
labels as an OVERLAY (append-only ``label_base`` + folded merge closure
``label_remaps`` + post-removal ``label_fix`` rows) so no corpus-sized
label relation is ever rewritten or shuffled per epoch. That machinery
(:meth:`_update_labels`, :meth:`_relabel_after_removal`, the closure and
fix helpers, and the compaction transforms that fold the overlay back into
the base) lives here; subclasses contribute only the domain legs — what a
"document" is, how it is signed, how candidates are generated, and how a
candidate pair is exactly verified. Subclasses that use the label
machinery also set ``self.cc_mode`` / ``self._cc_max_iterations`` /
``self._cc_checkpoint_every`` before calling :meth:`_init_store`.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sycl_jaccard_spark.operators.components import connected_components


class DeltaStoreBase:
    """Generic batch-partitioned store machinery; see module docstring."""

    # relations whose batch= partitions enumerate the store's epochs
    _EPOCH_ANCHORS: tuple[str, ...] = ()
    # the relation whose per-batch _lineage.json commits an epoch
    _FINAL_RELATION: str = "edges"
    # (old_label -> new_label) folded merge-closure schema
    _CLOSURE_SCHEMA: str = "old_label long, new_label long"
    # the relation enumerating corpus identity (one row per live id)
    _ID_RELATION: str = "files"

    # ---- construction ----

    def _init_store(self) -> None:
        """Common constructor tail — run after the subclass has set
        ``spark``, ``root``, ``_relations`` and ``_epoch_relations``."""
        self.metrics: list[dict] = []
        if self._exists(f"{self.root}/_compact_tmp"):
            raise ValueError(
                f"delta store {self.root} has a leftover _compact_tmp — a "
                "compaction was interrupted before the swap completed; "
                "inspect which relations were already swapped (the tmp dir "
                "holds complete consolidated copies) before deleting it"
            )
        self._check_config()

    # ---- filesystem plumbing ----

    def _fs(self, path: str):
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        return hpath.getFileSystem(self.spark._jsc.hadoopConfiguration()), hpath

    def _exists(self, path: str) -> bool:
        fs, hpath = self._fs(path)
        return bool(fs.exists(hpath))

    def _config_fingerprint(self) -> str:
        raise NotImplementedError

    def _check_config(self) -> None:
        """A delta store is long-lived corpus state: on fingerprint mismatch
        we REFUSE (unlike the batch pipeline, which purges and recomputes) —
        silently mixing signing configs across batches would make stored
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

    # ---- epoch sequence ----

    def batch_ids(self) -> list[int]:
        """Every epoch id the store has seen — additions anchor in the first
        anchor relation's partitions, removals in ``removed/``; both draw
        from ONE id sequence so the replay-window and horizon guards
        compose."""
        out: set[int] = set()
        for rel in self._EPOCH_ANCHORS:
            path = f"{self.root}/{rel}"
            if not self._exists(path):
                continue
            fs, hpath = self._fs(path)
            for s in fs.listStatus(hpath):
                name = s.getPath().getName()
                if name.startswith("batch="):
                    out.add(int(name.split("=", 1)[1]))
        return sorted(out)

    def incomplete_batch_ids(self, known: list[int] | None = None) -> list[int]:
        """Epochs whose anchor partition exists but whose final-relation
        lineage (written LAST in both the add and remove paths) is missing —
        the signature of a crash mid-epoch. New epochs are refused until the
        incomplete one is replayed (replaying overwrites its partitions —
        at-least-once). ``known`` lets a caller that already listed the
        anchor partitions pass its result through (ADVICE r5: _begin_epoch's
        ``existing`` passthrough otherwise re-listed them here, so the
        claimed saving was mostly unrealized)."""
        return [
            bid
            for bid in (self.batch_ids() if known is None else known)
            if not self._exists(
                f"{self.root}/{self._FINAL_RELATION}/batch={bid}/_lineage.json"
            )
        ]

    def _begin_epoch(
        self, batch_id: int | None, existing: list[int] | None = None
    ) -> int:
        """Allocate/validate an epoch id under the shared replay-window,
        horizon and incomplete-epoch guards. ``existing`` lets a caller that
        already listed the partition directories pass its result through —
        pre-compaction stores hold many batch= dirs and the listing is the
        scan-planning cost compact() exists to bound."""
        if existing is None:
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
        stale = [x for x in self.incomplete_batch_ids(known=existing) if x != bid]
        if stale:
            raise ValueError(
                f"delta store {self.root} has incomplete batch(es) {stale}: "
                "a prior epoch crashed after writing its anchor partition "
                f"({'/'.join(self._EPOCH_ANCHORS)}) but before "
                f"{self._FINAL_RELATION}/ lineage completed — replay exactly "
                "that batch_id (same delivery / same removal set) to heal "
                "the store before adding new epochs"
            )
        return bid

    # ---- writes ----

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

    def write_metrics(self, path: str) -> None:
        with open(path, "w") as f:
            for m in self.metrics:
                f.write(json.dumps(m, sort_keys=True) + "\n")

    # ---- compaction ----

    def compacted_through(self) -> int:
        """Highest batch id folded into a consolidated partition by
        :meth:`compact`; -1 when the store has never been compacted.
        ``_begin_epoch`` refuses batch ids at or below this horizon."""
        # NOT underscore-prefixed: Spark file sources treat _-prefixed
        # paths as hidden (explicit top-level reads work but WARN)
        path = f"{self.root}/compaction_horizon"
        if not self._exists(path):
            return -1
        row = self.spark.read.text(path).first()
        return int(row.value) if row is not None else -1

    def _compact_context(self) -> dict:
        """Materialized overlay relations the fold needs. Default: the
        labeled-graph trio (tombstones, merge closure, latest label fixes)."""
        return {
            "closure": self._closure().localCheckpoint(eager=True),
            "tomb": self._tombstones().localCheckpoint(eager=True),
            "fixes": self._latest_fixes().localCheckpoint(eager=True),
        }

    def _compact_transform(self, name: str, df: DataFrame, ctx: dict) -> DataFrame:
        """Per-relation consolidation transform. Default (labeled-graph):
        tombstoned rows are PHYSICALLY purged from every relation (edges on
        both endpoints, everything else on ``id``) — compact() is the purge
        point for removed content's derived data, exactly the LSM delete
        model — and ``label_base`` is consolidated WITH the fix overlay and
        the merge closure applied (both reset by :meth:`_compact_extras`):
        compaction is what bounds the closure to the merge events and the
        fixes/tombstones to the removals of the current epoch."""
        tomb, fixes, closure = ctx["tomb"], ctx["fixes"], ctx["closure"]
        if name == "edges":
            return df.join(
                F.broadcast(tomb.withColumnRenamed("id", "a")), "a", "left_anti"
            ).join(F.broadcast(tomb.withColumnRenamed("id", "b")), "b", "left_anti")
        if name == "label_base":
            return (
                df.join(F.broadcast(tomb.withColumnRenamed("id", "node")), "node", "left_anti")
                .join(F.broadcast(fixes), "node", "left")
                .select("node", F.coalesce("fix_label", "label").alias("lab0"))
                .join(F.broadcast(closure), F.col("lab0") == F.col("old_label"), "left")
                .select("node", F.coalesce("new_label", "lab0").alias("label"))
            )
        return df.join(F.broadcast(tomb), "id", "left_anti")

    def _compact_extras(self, target: int, ctx: dict) -> None:
        """Extra tmp-dir writes beyond the additive + epoch relations.
        Default: reset the merge closure (its hops are now applied inside
        the consolidated ``label_base``), written in the versioned layout
        the post-compaction reads expect."""
        self.spark.createDataFrame([], self._CLOSURE_SCHEMA).write.mode(
            "overwrite"
        ).parquet(f"{self.root}/_compact_tmp/label_remaps/v=0")

    def _compact_swap_names(self) -> list[str]:
        """Directories to swap in phase 2, in order. label_fix and
        label_remaps swap to empty AFTER label_base swaps to the applied
        copy — re-applying an old fix or closure row to already-final labels
        is a no-op (a fix of a since-merged label still resolves through the
        closure, which swaps last; a final label is never an old_label of
        the folded closure)."""
        return [*self._relations, *self._epoch_relations, "label_remaps"]

    def compact(self, files_per_relation: int = 32) -> dict:
        """Fold every ``batch=N`` partition of each additive relation into
        ONE consolidated partition (``batch=<max existing id>``), applying
        the store-specific transforms (tombstone purge, label overlays).
        Future epochs continue from max+1 exactly as before; replays of
        pre-compaction batch ids are refused.

        Two-phase: all consolidated copies are written to ``_compact_tmp/``
        first, the horizon advances, then each relation directory is swapped
        via delete+rename. A crash mid-swap leaves ``_compact_tmp`` in place
        (complete consolidated copies of every relation) and the constructor
        refuses the store until it is resolved — no window loses rows.

        ``files_per_relation`` bounds the output file count per relation
        (the point of compacting: O(batches × partitions) small files →
        O(1) right-sized ones)."""
        bids = self.batch_ids()
        t0 = time.monotonic()
        incomplete = self.incomplete_batch_ids()
        if incomplete:
            # the crashed epoch is always bids[-1] (the compaction target):
            # folding it would consolidate half-written partitions AND the
            # trailing lineage write below would erase the crash marker —
            # the store would look healthy with unhealable half-ingested rows
            raise ValueError(
                f"delta store {self.root} has incomplete batch(es) "
                f"{incomplete}: replay exactly that batch_id to heal the "
                "store before compacting (compaction closes the replay "
                "window and would erase the crash marker)"
            )
        if len(bids) <= 1:
            return {"compacted": False, "n_batches": len(bids)}
        target = bids[-1]
        summary: dict = {
            "compacted": True,
            "into_batch": target,
            "n_batches": len(bids),
            "rows": {},
        }
        # phase 1: write every consolidated copy (no destructive step yet)
        ctx = self._compact_context()
        for name, schema in self._relations.items():
            tmp = f"{self.root}/_compact_tmp/{name}/batch={target}"
            df = self._compact_transform(name, self._read(name, schema).drop("batch"), ctx)
            df.repartition(files_per_relation).write.mode("overwrite").parquet(tmp)
            summary["rows"][name] = self.spark.read.parquet(tmp).count()
        self._compact_extras(target, ctx)
        # epoch relations fold away: tombstones are now applied (purged).
        # batch=target keeps the directory shape uniform for _read's
        # partition discovery.
        for name, schema in self._epoch_relations.items():
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
        # and the constructor refuses the store until resolved)
        for name in self._compact_swap_names():
            fs, old = self._fs(f"{self.root}/{name}")
            fs.delete(old, True)
            _, tmp_path = self._fs(f"{self.root}/_compact_tmp/{name}")
            fs.rename(tmp_path, old)
            self.spark.catalog.refreshByPath(f"{self.root}/{name}")
        fs, tmp_root = self._fs(f"{self.root}/_compact_tmp")
        fs.delete(tmp_root, True)
        summary["wall_s"] = round(time.monotonic() - t0, 3)
        self._write_lineage(self._FINAL_RELATION, target, {"compaction": summary})
        self.metrics.append({"stage": "compact", **summary})
        return summary

    # ---- tombstones (shared by every read path) ----

    def _tombstones(self, exclude_bid: int | None = None) -> DataFrame:
        """Removed ids (Δ removals since the last compaction — compact()
        physically purges the masked rows and resets this). Small by the same
        operational bound as a delivery: split mega-removals, compact between
        epochs — every read path broadcasts it as an anti-join probe so store
        relations stay scan-only."""
        tomb = self._read("removed", self._epoch_relations["removed"])
        if exclude_bid is not None:
            tomb = tomb.filter(F.col("batch") != exclude_bid)
        return tomb.select("id")

    # ---- label overlay (shared by both labeled graph stores) ----

    def _closure_versions(self) -> list[tuple[int, bool]]:
        """(version, complete) per ``label_remaps/v=N`` dir, ascending."""
        path = f"{self.root}/label_remaps"
        out = []
        if self._exists(path):
            fs, hpath = self._fs(path)
            for s in fs.listStatus(hpath):
                name = s.getPath().getName()
                if name.startswith("v="):
                    v = int(name.split("=", 1)[1])
                    out.append((v, self._exists(f"{path}/v={v}/_SUCCESS")))
        return sorted(out)

    def _closure(self) -> DataFrame:
        """The folded (old_label → new_label) merge closure; empty on a
        store that has never merged across batches.

        The closure is epoch-critical mutable state rewritten on every
        merging epoch, so it is stored VERSIONED (``label_remaps/v=N``):
        the read takes the latest version whose ``_SUCCESS`` marker landed,
        so a crash mid-rewrite falls back to the previous complete closure
        (the incomplete-epoch guard then forces a replay, which re-derives
        the new version from it) instead of silently reading a torn write
        as an EMPTY closure and resolving stale labels forever."""
        complete = [v for v, done in self._closure_versions() if done]
        if complete:
            return self.spark.read.parquet(
                f"{self.root}/label_remaps/v={complete[-1]}"
            )
        # pre-versioning layout (flat parquet dir) — stores written before
        # the versioned scheme keep reading
        path = f"{self.root}/label_remaps"
        if self._exists(f"{path}/_SUCCESS"):
            return self.spark.read.parquet(path)
        return self.spark.createDataFrame([], self._CLOSURE_SCHEMA)

    def _write_closure(self, closure: DataFrame) -> None:
        # cut lineage first: the new closure is derived from the version
        # directory the GC below deletes
        closure = closure.localCheckpoint(eager=True)
        versions = self._closure_versions()
        nxt = (versions[-1][0] + 1) if versions else 0
        path = f"{self.root}/label_remaps/v={nxt}"
        closure.write.mode("overwrite").parquet(path)
        self.spark.catalog.refreshByPath(f"{self.root}/label_remaps")
        # GC superseded (and torn) versions AFTER v=nxt's _SUCCESS landed;
        # a crash before this loop leaves extra complete versions behind —
        # harmless, the read takes the max complete one. Pre-versioning flat
        # files (legacy layout) are superseded the same way: deleted only
        # once the first version is durably in place
        fs, _ = self._fs(path)
        for v, _done in versions:
            _, old = self._fs(f"{self.root}/label_remaps/v={v}")
            fs.delete(old, True)
        _, top = self._fs(f"{self.root}/label_remaps")
        for s in fs.listStatus(top):
            if not s.getPath().getName().startswith("v="):
                fs.delete(s.getPath(), True)

    def _latest_fixes(self, exclude_bid: int | None = None) -> DataFrame:
        """Post-removal corrected labels, latest epoch per node (a node can
        be re-fixed by a later removal). Resolution precedence everywhere:
        ``closure[fix ?? base] ?? (fix ?? base)`` — a fix SUPERSEDES the base
        label AND any closure hop recorded for it (removals can SPLIT
        components, which the merge-only closure cannot express), while later
        merges of a fixed label still resolve through the closure."""
        fixes = self._read("label_fix", self._epoch_relations["label_fix"])
        if exclude_bid is not None:
            fixes = fixes.filter(F.col("batch") != exclude_bid)
        return fixes.groupBy("node").agg(
            F.max_by("label", "batch").alias("fix_label")
        )

    def _update_labels(self, new_edges: DataFrame, bid: int, stats: dict) -> None:
        """Fold one epoch's verified edges into the label overlay — either a
        full CC recompute (``cc_mode="full"``, the equivalence-test mode) or
        the Δ-sized contracted-graph update (see the incremental branch)."""
        if self.cc_mode == "full":
            # O(edge store) by declaration: recompute every label, rewrite the
            # base as one partition, clear the closure (the equivalence tests
            # run this mode side-by-side with incremental stores)
            all_edges = self._read("edges", self._relations["edges"]).select("a", "b")
            stats["mode"] = "full"
            labels = connected_components(
                all_edges, max_iterations=self._cc_max_iterations,
                checkpoint_every=self._cc_checkpoint_every, stats=stats,
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
        base = self._read("label_base", self._relations["label_base"]).filter(
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
            # Δ-sized, consumed three times (both contracted endpoints + the
            # entering fallback below)
            .localCheckpoint(eager=True)
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
            max_iterations=self._cc_max_iterations,
            checkpoint_every=self._cc_checkpoint_every,
            stats=stats,
        ).localCheckpoint(eager=True)  # consumed by entering + remap below

        # super-nodes with no base row are exactly the nodes entering the
        # edge graph this delivery (a stored current label is itself a node
        # with a base row); their sub-label is already final. EVERY new node
        # must get a base row: on a REPLAY of an epoch that crashed after
        # its closure version committed but before lineage, the new node's
        # merge is already inside the closure, so its contracted edges
        # collapse to self-loops and CC returns no row for it — the resolved
        # current label is then the correct final label (without the
        # fallback, the replay would overwrite the node's base partition
        # with nothing and a later epoch would silently split its component)
        new_nodes = eps.join(base_hits.select("node"), "node", "left_anti")
        entering = (
            new_nodes.join(sub_labels, "node", "left")
            .join(resolved, "node")
            .select("node", F.coalesce("label", "cur").alias("label"))
        )
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

    # ---- outputs (shared read views) ----

    def edges(self) -> DataFrame:
        """Verified similarity edges between SURVIVING rows: tombstoned
        endpoints are masked at read time (their rows purge physically at
        compact()); removal-epoch endpoint rewrites live as ordinary edge
        rows under that epoch's partition."""
        tomb = self._tombstones()
        score_cols = [
            c.split()[0]
            for c in self._relations["edges"].split(",")
            if c.split()[0] not in ("a", "b")
        ]
        return (
            self._read("edges", self._relations["edges"])
            .join(F.broadcast(tomb.withColumnRenamed("id", "a")), "a", "left_anti")
            .join(F.broadcast(tomb.withColumnRenamed("id", "b")), "b", "left_anti")
            .select("a", "b", *score_cols)
        )

    def clusters(self) -> DataFrame:
        """(id, cluster) for every SURVIVING row — cluster = min id of the
        connected component, id itself for singletons. Resolves the label
        overlay at read time with removal-fix precedence: ``closure[fix ??
        base] ?? (fix ?? base)`` (fixes express the component splits the
        merge-only closure cannot — see :meth:`_relabel_after_removal`)."""
        tomb = self._tombstones()
        ids = (
            self._read(self._ID_RELATION, self._relations[self._ID_RELATION])
            .join(F.broadcast(tomb), "id", "left_anti")
            .select("id")
        )
        base = self._read("label_base", self._relations["label_base"])
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
        return ids.join(labels, ids.id == labels.node, "left").select(
            "id", F.coalesce("label", F.col("id")).alias("cluster")
        )

    def _relabel_after_removal(
        self,
        rm_ids: DataFrame,
        tomb_prior: DataFrame,
        bid: int,
        succ_map: DataFrame | None = None,
    ) -> dict:
        """Repair labels after a tombstone epoch, at cost proportional to
        the AFFECTED components: labels are min-node labels and components
        can lose their min node or a bridge node, neither of which the
        merge-only closure can express. Connected components re-runs over
        the affected components' surviving subgraph only (members found by a
        broadcast-probe scan of the base, edges by a broadcast semi-join
        scan of the edge store), and every surviving member gets a
        ``label_fix`` row — fixes supersede the stale closure hops while
        later merges still resolve through the closure; stale closure rows
        become unreachable and fold away at compact().

        ``succ_map``: optional (old, succ) endpoint rewrites (the text
        store's rep succession); rewritten edge rows are persisted in this
        epoch's ``edges/`` partition, masking the originals. Writes the
        epoch's ``edges/`` and ``label_fix`` partitions; returns stats."""
        # -- affected components: current labels of removed edge-graph nodes --
        base = self._read("label_base", self._relations["label_base"])
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
            F.broadcast(rm_ids.select(F.col("id").alias("node"))), "node"
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
        all_tomb = tomb_prior.unionByName(rm_ids.select("id")).localCheckpoint(eager=True)
        score_cols = [
            c.split()[0]
            for c in self._relations["edges"].split(",")
            if c.split()[0] not in ("a", "b")
        ]
        # semi-join on ONE endpoint suffices: members covers affected
        # components in full, and an edge's endpoints share a component by
        # construction (rows touching earlier-removed ids are dead either
        # way — the anti-join below drops them)
        sub = (
            self._read("edges", self._relations["edges"])
            .filter(F.col("batch") != bid)
            .join(F.broadcast(members.withColumnRenamed("node", "a")), "a", "left_semi")
            .withColumnRenamed("a", "ea")
            .withColumnRenamed("b", "eb")
        )
        if succ_map is not None:
            sub = (
                sub.join(F.broadcast(succ_map.withColumnsRenamed({"old": "ea", "succ": "sa"})), "ea", "left")
                .join(F.broadcast(succ_map.withColumnsRenamed({"old": "eb", "succ": "sb"})), "eb", "left")
                .select(
                    F.coalesce("sa", "ea").alias("a"),
                    F.coalesce("sb", "eb").alias("b"),
                    *score_cols,
                    (F.col("sa").isNotNull() | F.col("sb").isNotNull()).alias("rewritten"),
                )
            )
        else:
            sub = sub.select(
                F.col("ea").alias("a"), F.col("eb").alias("b"), *score_cols,
                F.lit(False).alias("rewritten"),
            )
        sub = (
            sub.join(F.broadcast(all_tomb.withColumnRenamed("id", "a")), "a", "left_anti")
            .join(F.broadcast(all_tomb.withColumnRenamed("id", "b")), "b", "left_anti")
            .filter(F.col("a") != F.col("b"))
            .localCheckpoint(eager=True)
        )
        # persist ONLY the rewritten rows — the unchanged survivors already
        # live in the store; views mask the originals they replace
        n_rewritten = self._write_batch(
            "edges", sub.filter("rewritten").select("a", "b", *score_cols), bid
        ).count()

        # -- relabel the affected components' survivors --
        cc_stats: dict = {}
        sub_labels = connected_components(
            sub.select("a", "b"),
            max_iterations=self._cc_max_iterations,
            checkpoint_every=self._cc_checkpoint_every,
            stats=cc_stats,
        )
        fixes_rows = (
            members.join(F.broadcast(all_tomb.withColumnRenamed("id", "node")), "node", "left_anti")
            .join(sub_labels, "node", "left")
            .select("node", F.coalesce("label", "node").alias("label"))
        )
        n_fixed = self._write_batch("label_fix", fixes_rows, bid).count()
        return {
            "n_edges_rewritten": n_rewritten,
            "n_affected_components": affected.count(),
            "n_members_fixed": n_fixed,
            "cc": cc_stats,
        }
