"""The end-to-end dedup pipeline — the engine's ``main`` driver
(reference A8, ``main.cpp:63-361``) as a staged DataFrame DAG:

  ingest → sha256 exact-dedup → shingle → MinHash signatures → LSH bands →
  candidate pairs (± SimHash pass, ± sampled-substring pass) →
  exact-Jaccard verify (jaccard_list semantics) → threshold →
  connected components → cluster assignments

Per-stage wall time + row counts are recorded (the EVENT_PROFILE analog,
``standalone_algorithms.hpp:37-47``); each stage can checkpoint to parquet
under ``checkpoint_dir/stage=<name>`` and a rerun resumes from completed
stages (north-rule resumability).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sycl_jaccard_spark.config import PipelineConfig
from sycl_jaccard_spark.functions.shingles import (
    doc_shingle_hashes,
    substring_band_hashes,
)
from sycl_jaccard_spark.functions.simhash import (
    n_simhash_tables,
    simhash_band_keys,
)
from sycl_jaccard_spark.functions.minhash import minhash_simhash_udf
from sycl_jaccard_spark.operators.components import connected_components
from sycl_jaccard_spark.operators.exact_dedup import dedup_exact, with_sha256
from sycl_jaccard_spark.operators.lsh import band_hashes, candidate_pairs, minhash_signatures
from sycl_jaccard_spark.operators.pair_jaccard import jaccard_pairs
from sycl_jaccard_spark.operators.weighted_dedup import idf_weights, weighted_signatures


def banded_relation(signed: DataFrame, cfg: PipelineConfig, enable_simhash: bool) -> DataFrame:
    """The unified (id, band, band_hash) relation of the LSH pass and (when
    enabled) the SimHash block-table pass, with disjoint band-id ranges —
    the SHARED candidate space of the batch pipeline and the delta
    (incremental) runner, factored so the two can never drift.

    ``signed`` must carry ``sig`` (and ``sim`` when ``enable_simhash``) and
    must already be materialized (a pandas-UDF column cannot feed the
    posexplode below)."""
    banded = band_hashes(signed, cfg, "id", portable=cfg.portable_hashes)
    if enable_simhash:
        sim_banded = signed.select(
            "id",
            F.posexplode(F.array(*simhash_band_keys(
                F.col("sim"), cfg.simhash_blocks, cfg.simhash_max_hamming, cfg.simhash_bits
            ))),
        ).select(
            "id", (F.col("pos") + cfg.bands).alias("band"), F.col("col").alias("band_hash")
        )
        banded = banded.unionByName(sim_banded)
    return banded


def substring_banded(files_df: DataFrame, cfg: PipelineConfig, band_id: int) -> DataFrame:
    """The substring pass's (id, band, band_hash) rows — SHARED by the batch
    pipeline and the delta runner (so the two can never band substrings
    differently; ``cfg.substring_pass`` is part of the store fingerprint).

    * ``"linegram"`` — one JVM explode of the w-line-gram hashes.
    * ``"winnow"`` — gram hashing stays JVM-side (``winnow_grams``), the
      sliding window-min runs in ONE vectorized Arrow batch
      (``winnow_min_udf`` — the HOF expression form allocates a w-slice per
      window and measured 6.4× the pipeline wall at 100k files; the UDF is
      bit-identical, dual-impl tested). TWO materialization barriers are
      load-bearing, not optional: the gram ARRAYS are checkpointed before
      the UDF (CollapseProject otherwise re-inlines the lambda-bearing HOF
      expression as the Python UDF's child, which ExtractPythonUDFs cannot
      split — interpreted-projection INTERNAL_ERROR at run time), and the
      fingerprint column is checkpointed before the explode (Catalyst
      cannot host a Python UDF inside a generator — the r1 error shape).
      Both barriers are Δ-sized and transient; only (id, band, band_hash)
      rows persist.
    """
    from sycl_jaccard_spark.functions.shingles import winnow_grams, winnow_min_udf

    if cfg.substring_pass == "linegram":
        src = files_df.select(
            "id",
            F.explode(substring_band_hashes(F.col("content"), cfg)).alias("band_hash"),
        )
    else:
        grams = files_df.select(
            "id",
            winnow_grams(
                F.col("content"), cfg.winnow_k, portable=cfg.portable_hashes
            ).alias("grams"),
        ).localCheckpoint(eager=True)
        fps = grams.select(
            "id", winnow_min_udf(cfg.winnow_w)(F.col("grams")).alias("fps")
        ).localCheckpoint(eager=True)
        # the gram arrays are ~one int64 PER CHARACTER of every unique file
        # (~8× corpus bytes); their checkpointed blocks are released by the
        # ContextCleaner once `grams` goes out of scope (ADVICE r5: a
        # DataFrame.unpersist() here was a no-op — localCheckpoint persists
        # at the RDD level, outside the cacheManager that call clears)
        src = fps.select("id", F.explode("fps").alias("band_hash"))
    return src.select("id", F.lit(band_id).alias("band"), "band_hash")


@dataclass
class PipelineResult:
    clusters: DataFrame          # (id, cluster) — cluster = min id in component
    verified_pairs: DataFrame    # (a, b, jaccard) above threshold
    metrics: list[dict] = field(default_factory=list)


class DedupPipeline:
    """files_df must have columns (id:long, content:string); use
    sources.tables.with_file_id / documents_as_files to adapt inputs."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: PipelineConfig | None = None,
        checkpoint_dir: str | None = None,
        enable_simhash: bool = True,
        enable_substring: bool = False,
        count_rows: bool = True,
        collect_pass_stats: bool = False,
    ):
        self.spark = spark
        self.cfg = cfg or PipelineConfig()
        self.checkpoint_dir = checkpoint_dir
        self.enable_simhash = enable_simhash
        self.enable_substring = enable_substring
        self.count_rows = count_rows  # False: skip per-stage count jobs (bench mode)
        # True: record per-pass candidate attribution (LSH / SimHash /
        # substring memberships, buckets, raw pair bound) + the skew-mode drop
        # counter into metrics — the observability a band/cap tuning decision
        # needs before a full-scale run. Costs two extra aggregation jobs over
        # the banded relation.
        self.collect_pass_stats = collect_pass_stats
        self.metrics: list[dict] = []
        self._resume_ok = True  # cleared when the stored checkpoint config mismatches

    # ---- stage plumbing (EVENT_PROFILE + checkpoint/resume) ----

    def _config_fingerprint(self) -> str:
        from dataclasses import asdict

        return json.dumps(
            {
                "cfg": asdict(self.cfg),
                "enable_simhash": self.enable_simhash,
                "enable_substring": self.enable_substring,
            },
            sort_keys=True,
        )

    def _check_checkpoint_config(self) -> None:
        """Stage schemas depend on the config (e.g. the shingles stage carries
        `content` only when the substring pass is on, the minhash stage carries
        `sim` only with SimHash). Resuming a checkpoint written under a
        different config would fail later with a missing-column error — or,
        worse, silently produce wrong clusters from same-schema stages (e.g. a
        num_perms change). Two rules close every such window:

        * stale stages are DELETED (not merely ignored) before the new
          fingerprint is written — otherwise a crash after rewriting some
          stages leaves old-config parquet that the NEXT run (now fingerprint-
          matching) would resume;
        * stage data with NO fingerprint (a pre-fingerprint checkpoint, or a
          crash before the fingerprint write) is treated as a mismatch."""
        if not self.checkpoint_dir:
            return
        root = self.checkpoint_dir.rstrip("/")
        path = f"{root}/pipeline_config"
        fp = self._config_fingerprint()
        if self._stage_done(path):
            stored = self.spark.read.text(path).first()
            if stored is not None and stored.value == fp:
                return
            self._resume_ok = False
        # mismatch, or no fingerprint: purge any stage dirs so a partial
        # rewrite can never interleave configs, then stamp the new config
        jvm = self.spark._jvm
        rootp = jvm.org.apache.hadoop.fs.Path(root)
        fs = rootp.getFileSystem(self.spark._jsc.hadoopConfiguration())
        if fs.exists(rootp):
            for status in fs.listStatus(rootp):
                name = status.getPath().getName()
                if name.startswith("stage="):
                    self._resume_ok = False  # unfingerprinted stage data found
                    fs.delete(status.getPath(), True)
        self.spark.createDataFrame([(fp,)], "value string").coalesce(1).write.mode(
            "overwrite"
        ).text(path)

    def _stage_done(self, path: str) -> bool:
        """_SUCCESS probe through the Hadoop FileSystem API, so resume works
        on any supported URI (hdfs://, s3a://, file:/...), not only
        driver-local paths os.path.exists can see."""
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(f"{path}/_SUCCESS")
        fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return bool(fs.exists(hpath))

    def _write_lineage(self, path: str, record: dict) -> None:
        """Per-partition lineage record, written INSIDE the stage directory as
        ``_lineage.json`` — the underscore prefix makes parquet readers skip
        it, and the Hadoop FS API keeps it working on hdfs:// and s3a://."""
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(f"{path}/_lineage.json")
        fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        stream = fs.create(hpath, True)
        try:
            stream.write(bytearray(json.dumps(record, sort_keys=True).encode()))
        finally:
            stream.close()

    def _bucket_table(self, name: str) -> str:
        import hashlib

        digest = hashlib.md5(self.checkpoint_dir.encode()).hexdigest()[:12]
        return f"jacspark_{digest}_{name}"

    def _read_bucketed(self, name: str, path: str, df: DataFrame) -> DataFrame:
        """(Re-)register the stage's bucketed external table and read through
        it — a plain ``read.parquet`` of the same files would LOSE the bucket
        metadata and every downstream join would re-shuffle (``df`` supplies
        the schema for re-registration in a fresh session)."""
        tbl = self._bucket_table(name)
        if not self.spark.catalog.tableExists(tbl):
            ddl = df._jdf.schema().toDDL()
            self.spark.sql(
                f"CREATE TABLE {tbl} ({ddl}) USING PARQUET "
                f"CLUSTERED BY (id) SORTED BY (id) INTO {self.cfg.shingle_buckets} BUCKETS "
                f"LOCATION '{path}'"
            )
        return self.spark.table(tbl)

    def _stage(
        self,
        name: str,
        df: DataFrame,
        materialize: bool = True,
        upstream: tuple[str, ...] = (),
        bucket_by_id: bool = False,
    ) -> DataFrame:
        t0 = time.monotonic()
        bucketed = bucket_by_id and self.cfg.shingle_buckets > 0
        if self.checkpoint_dir:
            path = f"{self.checkpoint_dir.rstrip('/')}/stage={name}"
            if self._resume_ok and self._stage_done(path):
                out = (
                    self._read_bucketed(name, path, df)
                    if bucketed
                    else self.spark.read.parquet(path)
                )
                self.metrics.append(
                    {"stage": name, "wall_s": 0.0, "rows": out.count(), "resumed": True}
                )
                return out
            if bucketed:
                tbl = self._bucket_table(name)
                self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
                # a crashed prior write leaves a non-empty dir without
                # _SUCCESS; CTAS into a non-empty external location throws
                # (allowNonEmptyLocationInCTAS defaults false) — clear it,
                # matching the plain path's overwrite-recovery semantics
                jvm = self.spark._jvm
                hpath = jvm.org.apache.hadoop.fs.Path(path)
                fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
                if fs.exists(hpath):
                    fs.delete(hpath, True)
                (
                    df.write.mode("overwrite")
                    .format("parquet")
                    .option("path", path)
                    .bucketBy(self.cfg.shingle_buckets, "id")
                    .sortBy("id")
                    .saveAsTable(tbl)
                )
                out = self.spark.table(tbl)
            else:
                df.write.mode("overwrite").parquet(path)
                out = self.spark.read.parquet(path)
            # per-partition row histogram of the DURABLE stage (north-rule
            # lineage + metrics): one cheap agg job whose sum doubles as the
            # stage row count; max/mean is the skew observability signal a
            # 1000-executor operator needs before the next shuffle.
            hist = {
                int(r["pid"]): int(r["n"])
                for r in out.groupBy(F.spark_partition_id().alias("pid"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            rows = sum(hist.values())
            n_parts = len(hist)
            self._write_lineage(
                path,
                {
                    "stage": name,
                    "upstream": list(upstream),
                    "rows": rows,
                    "n_partitions": n_parts,
                    "partition_rows": hist,
                    "max_partition_rows": max(hist.values(), default=0),
                    "skew_ratio": round(
                        max(hist.values(), default=0) / (rows / n_parts), 3
                    )
                    if rows
                    else 1.0,
                    "config": json.loads(self._config_fingerprint()),
                },
            )
        elif materialize:
            out = df.localCheckpoint(eager=True)
            rows = out.count() if self.count_rows else -1
        else:
            out, rows = df, -1
        self.metrics.append(
            {"stage": name, "wall_s": round(time.monotonic() - t0, 3), "rows": rows, "resumed": False}
        )
        return out

    # ---- the pipeline ----

    def run(self, files: DataFrame, id_col: str = "id", content_col: str = "content") -> PipelineResult:
        """Checkpoint discipline: only multi-consumer intermediates are
        materialized (uniques -> shingle+pairs, shingled -> minhash+simhash+
        verify, signatures -> banding [also required: a pandas-UDF column
        cannot feed a generator un-materialized], verified -> CC+output).
        Single-consumer stages (sha256 projection, candidate pairs) stay lazy
        — every materialization is a full job of scheduling latency that
        parallelism cannot amortize."""
        cfg = self.cfg
        self._check_checkpoint_config()
        files = files.select(F.col(id_col).alias("id"), F.col(content_col).alias("content"))

        # stage 1: exact dedup by sha256 (reps flow on; dup pairs are free
        # edges). `uniques` has exactly one consumer (the shingle stage), so
        # in-memory runs keep it LAZY — an eager localCheckpoint would copy
        # the full corpus content for nothing. Durable runs still write the
        # stage: it carries the per-row sha256 integrity record (north-rule
        # invariant) and the resume point before shingling.
        hashed = with_sha256(files)
        uniques, exact_pairs = dedup_exact(hashed, "id", "content")
        # Scale-adaptive spread (guide §2.5 input skew): when the input scan
        # has fewer splits than the session has cores (the single-small-file
        # shape — a tiny parquet is ONE split and the dedup join broadcasts,
        # so without this the whole shingle→minhash chain runs on one core),
        # hash-repartition the POST-dedup uniques by id. Spreading after
        # dedup shuffles each distinct content once; the r5-rejected variant
        # repartitioned the raw input BEFORE dedup (ledger: 5.2s -> 14.4s),
        # paying the shuffle for every duplicate too. At production scale the
        # scan has >= cores splits and this is a no-op decision.
        n_in = files.rdd.getNumPartitions()
        target = self.spark.sparkContext.defaultParallelism
        if n_in < target:
            uniques = uniques.repartition(target, "id")
        if self.checkpoint_dir:
            uniques = self._stage("exact_dedup", uniques, upstream=("ingest",))

        # stage 2: shingle sets (JVM-side; 64-bit hashes for exact verify).
        # `content` is carried through the checkpoint ONLY when the substring
        # pass needs it: at 100 TB the contents dominate checkpoint bytes and
        # executor memory, and minhash/simhash/verify read only the hashes.
        shingle_cols = [
            F.col("id"),
            doc_shingle_hashes(F.col("content"), cfg).alias("shingle_hashes"),
        ]
        if self.enable_substring:
            shingle_cols.append(F.col("content"))
        shingled = self._stage(
            "shingles", uniques.select(*shingle_cols), upstream=("exact_dedup",),
            bucket_by_id=True,
        )

        # stage 3: MinHash signatures (Arrow pandas UDF). With SimHash on, the
        # two reductions over the same shingle arrays are FUSED into one UDF —
        # one Arrow round-trip, one Python-worker pass (the measured sub-linear
        # stage at higher parallelism). Only (id, sig[, sim]) is materialized:
        # the shingle arrays already live in the shingles stage and dominate
        # the checkpoint bytes if carried through.
        #
        # Weighted (candidate_weights="idf") route: corpus IDF → CWS weighted
        # MinHash signatures (collision prob = weighted Jaccard Σmin/Σmax) —
        # same signature shape, so banding/bucketing/skew handling below is
        # shared verbatim; verification then scores the exact WEIGHTED Jaccard
        # over the same IDF weights (the reference's weighted pipeline half,
        # main.cpp:211-275, standalone_algorithms.hpp:109-124).
        weighted = cfg.candidate_weights == "idf"
        sig_input = shingled.select("id", "shingle_hashes")
        if weighted:
            # corpus size: reuse the shingles stage's row count (uniques are
            # 1:1 with shingled) instead of paying another count job
            n_docs = next(
                (m["rows"] for m in reversed(self.metrics) if m["stage"] == "shingles"),
                -1,
            )
            idf = self._stage(
                "idf",
                idf_weights(sig_input, n_docs=n_docs if n_docs >= 0 else None),
                upstream=("shingles",),
            )
            # SimHash stays an UNweighted bit-vote over the distinct shingle
            # elements — its near-miss recall role is orthogonal to candidate
            # weighting — but it is computed in the SAME fused Arrow pass as
            # the CWS signatures (one JVM↔Python round-trip, no id-join).
            # with_volume: the stage also emits vol = Σw as a free array
            # aggregate over the weight arrays it already built — the verify
            # volumes read THIS materialized stage, so the shingle relation
            # is exploded exactly once per weighted run (VERDICT r4 #3;
            # materializing the full membership relation instead measured
            # SLOWER — 0.7 GB of checkpoint memory pressure at 100k).
            signed = self._stage(
                "minhash",
                weighted_signatures(
                    sig_input, idf, cfg.num_perms, cfg.seed,
                    materialize=False, with_simhash=self.enable_simhash,
                    with_volume=True,
                ),
                upstream=("shingles", "idf"),
            )
        elif self.enable_simhash:
            fused = minhash_simhash_udf(cfg.num_perms, cfg.seed)
            signed = self._stage(
                "minhash",
                sig_input.select("id", fused(F.col("shingle_hashes")).alias("ms")).select(
                    "id", F.col("ms.sig").alias("sig"), F.col("ms.sim").alias("sim")
                ),
                upstream=("shingles",),
            )
        else:
            signed = self._stage(
                "minhash", minhash_signatures(sig_input, cfg).select("id", "sig"),
                upstream=("shingles",),
            )

        # stage 4: candidate generation — ALL passes (LSH bands, SimHash
        # bands, substring line-grams) union into ONE (id, band, band_hash)
        # relation with disjoint band-id ranges, so the bucket-cap window,
        # the bucket self-join and the pair dedup are paid once, not per
        # pass. `signed` is materialized by its stage, so the SimHash
        # posexplode never sees an inlined pandas-UDF column (the r1
        # INTERNAL_ERROR shape — Catalyst cannot host Python UDFs inside a
        # generator). Shared with the delta runner (banded_relation).
        banded = banded_relation(signed, cfg, self.enable_simhash)
        n_sim_tables = n_simhash_tables(cfg.simhash_blocks, cfg.simhash_max_hamming)

        if self.enable_substring:
            # substring pass (suffix-array analog): shared runs produce
            # candidates regardless of byte offset (containment/near-miss).
            # linegram/winnow dispatch lives in substring_banded — shared
            # with the delta runner so the two can never drift.
            banded = banded.unionByName(
                substring_banded(shingled, cfg, cfg.bands + n_sim_tables)
            )

        if self.collect_pass_stats:
            from sycl_jaccard_spark.operators.lsh import candidate_pass_stats, capped_docs

            t_ps = time.monotonic()
            stats = candidate_pass_stats(
                banded, cfg, n_sim_tables if self.enable_simhash else 0
            ).collect()
            self.metrics.append(
                {
                    "stage": "candidate_pass_stats",
                    "wall_s": round(time.monotonic() - t_ps, 3),
                    "rows": -1,
                    "resumed": False,
                    "skew_mode": cfg.skew_mode,
                    "bucket_cap": cfg.bucket_cap,
                    "passes": {
                        r["pass"]: {
                            "memberships": int(r["memberships"]),
                            "buckets": int(r["buckets"]),
                            "multi_buckets": int(r["multi_buckets"]),
                            "raw_pairs": int(r["raw_pairs"]),
                        }
                        for r in stats
                    },
                    "capped_memberships": capped_docs(banded, cfg, "id"),
                }
            )

        cands = candidate_pairs(banded, cfg, "id", skew_mode=cfg.skew_mode)  # bounded + deduped, lazy

        # stage 5: exact-Jaccard verification (sygraph::jaccard_list semantics).
        # With the substring pass on, containment pairs (a file embedded in a
        # larger one — low symmetric J, ~1.0 inter/min) are ALSO accepted:
        # they are exactly what that pass generates, and J-only verify would
        # reject every one of them.
        # Weighted route: the exact WEIGHTED Jaccard Wi/(vol_a+vol_b−Wi) over
        # the same IDF weights the signatures sampled — candidate and verify
        # agree on what "similar" means, so boilerplate-only pairs fail verify
        # even when a stray band collides them. Containment stays count-based
        # (with_counts=True rides the same aggregations, no extra shuffle).
        if weighted:
            # array-attach impl: intersect in codegen, explode ONLY the
            # intersection before the weight join (Σ|A∩B| rows, not Σ|A|) —
            # dual-impl-tested against jaccard_pairs_weighted
            from sycl_jaccard_spark.operators.pair_jaccard import (
                jaccard_pairs_weighted_arrays,
            )

            scored = jaccard_pairs_weighted_arrays(
                shingled.select("id", F.col("shingle_hashes").alias("set")),
                idf,
                cands,
                with_counts=self.enable_substring,
                volumes=signed.select("id", "vol"),
            )
            accept = F.col("jaccard") >= (
                cfg.weighted_verify_threshold
                if cfg.weighted_verify_threshold is not None
                else cfg.verify_threshold
            )
        else:
            scored = jaccard_pairs(
                shingled.select("id", F.col("shingle_hashes").alias("set")), cands,
                id_col="id", set_col="set", impl="arrays",
            )
            accept = F.col("jaccard") >= cfg.verify_threshold
        if self.enable_substring:
            from sycl_jaccard_spark.functions.jaccard import containment_from_counts

            containment = containment_from_counts(
                F.col("inter"), F.col("size_a"), F.col("size_b")
            )
            # min-size floor: a tiny stub is contained ~1.0 in MANY unrelated
            # files, and CC would transitively glue them into one giant
            # cluster — containment only counts for non-trivial small sides
            containment_rule = (containment >= cfg.containment_threshold) & (
                F.least("size_a", "size_b") >= cfg.containment_min_size
            )
            if cfg.substring_verify == "lcs":
                # exact suffix-array refinement: the count-based rule is
                # order-blind (lines cherry-picked from many places score
                # ~1.0 with no contiguous shared region); re-score ONLY the
                # pairs it would add — pairs failing J but passing the
                # shingle rule, a tiny subset — with the exact byte-level
                # LCS and keep those literally embedded. Never adds pairs.
                # The accepted pair set is materialized BEFORE the split:
                # filtering `scored` twice would re-run the whole verify
                # aggregation (the dominant stage) once per branch.
                from sycl_jaccard_spark.functions.suffix import pair_lcs

                pre = scored.filter(accept | containment_rule).select(
                    "a", "b", "jaccard", accept.alias("_j_pass")
                ).localCheckpoint(eager=True)
                j_pass = pre.filter("_j_pass").select("a", "b", "jaccard")
                refine = pre.filter(~F.col("_j_pass")).select("a", "b", "jaccard")
                kept = pair_lcs(
                    refine, shingled.select("id", "content")
                ).filter(F.col("lcs_frac") >= cfg.containment_threshold)
                verified_df = j_pass.unionByName(kept.select("a", "b", "jaccard"))
            else:
                verified_df = scored.filter(accept | containment_rule).select(
                    "a", "b", "jaccard"
                )
        else:
            verified_df = scored.filter(accept).select("a", "b", "jaccard")
        verified = self._stage(
            "verify", verified_df,
            upstream=("shingles", "minhash"),
        )

        # stage 6: clustering — exact-dup pairs join the verified near-dup graph.
        # Materialized: CC consumes it twice (count + collect/star rounds), and
        # exact_pairs' lineage otherwise re-runs the full sha256 scan per use.
        all_pairs = self._stage(
            "pair_graph", verified.select("a", "b").union(exact_pairs.select("a", "b")),
            upstream=("verify", "exact_dedup"),
        )
        t_cc = time.monotonic()
        labels = connected_components(
            all_pairs, max_iterations=cfg.max_cc_iterations, checkpoint_every=cfg.checkpoint_every
        )
        self.metrics.append(
            {"stage": "connected_components", "wall_s": round(time.monotonic() - t_cc, 3),
             "rows": -1, "resumed": False}
        )
        clusters = self._stage(
            "clusters",
            files.select("id").join(labels, files.id == labels.node, "left").select(
                "id", F.coalesce("label", F.col("id")).alias("cluster")
            ),
            upstream=("pair_graph",),
        )

        all_verified = verified.unionByName(
            exact_pairs.select("a", "b", F.lit(1.0).alias("jaccard"))
        )
        return PipelineResult(clusters=clusters, verified_pairs=all_verified, metrics=self.metrics)

    def write_metrics(self, path: str) -> None:
        with open(path, "w") as f:
            for m in self.metrics:
                f.write(json.dumps(m) + "\n")
