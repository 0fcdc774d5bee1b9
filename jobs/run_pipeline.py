"""CLI driver for the dedup pipeline — the reference's ``main`` analog
(``/root/reference/main.cpp:63-361``): parse → ingest → normalize → execute →
emit, as a spark-submit job.

Usage (cluster):
    spark-submit --py-files dist/sycl_jaccard_spark.zip jobs/run_pipeline.py \
        --input my_catalog.db.source_files --output /warehouse/dedup_out \
        --checkpoint-dir /warehouse/dedup_ckpt --threshold 0.7

Usage (local sandbox):
    python jobs/run_pipeline.py --input /root/testdata/sf0.001/documents.parquet \
        --input-kind documents --output /tmp/dedup_out

The reference's env-var knobs map to flags: JACCARD_FORCE_* implementation
selection → --verify-impl (A7, main.cpp:40-61); output format choice by
extension → --output is always parquet/Iceberg (S6); device selection argv[3]
→ --cores (local only).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="MinHash-LSH near-duplicate detection pipeline")
    p.add_argument("--input", default=None, help="parquet path or catalog table of source files")
    p.add_argument(
        "--input-kind",
        choices=["source_files", "documents"],
        default="source_files",
        help="source_files: (repo,path,commit,lang,content); documents: driver testdata shape",
    )
    p.add_argument("--output", required=True, help="output dir: clusters/ verified_pairs/ metrics.jsonl")
    p.add_argument("--checkpoint-dir", default=None, help="stage checkpoint/resume dir")
    p.add_argument("--shingle-k", type=int, default=5)
    p.add_argument("--num-perms", type=int, default=128)
    p.add_argument("--bands", type=int, default=32)
    p.add_argument("--threshold", type=float, default=0.7, help="verify Jaccard threshold")
    p.add_argument("--bucket-cap", type=int, default=64, help="max docs per LSH bucket")
    p.add_argument(
        "--simhash-blocks", type=int, default=4,
        help="combinatorial SimHash blocks (4=classic 16-bit bands; 6=20 ~32-bit tables for 1e9+ docs)",
    )
    p.add_argument(
        "--portable-hashes", action="store_true",
        help="md5-prefix hashes replayable in DuckDB (slower; for oracle-diff runs)",
    )
    p.add_argument("--no-simhash", action="store_true")
    p.add_argument("--substring", action="store_true", help="enable substring containment pass")
    p.add_argument(
        "--substring-pass", choices=["linegram", "winnow"], default="linegram",
        help="substring candidate pass: w-line grams (cheap, needs whole "
             "unmodified lines) or MOSS winnowed fingerprints (re-wrap robust)",
    )
    p.add_argument(
        "--substring-verify", choices=["shingle", "lcs"], default="shingle",
        help="containment acceptance: count-based inter/min, or + exact "
             "suffix-array LCS refinement (batch only; rejects order-blind merges)",
    )
    p.add_argument(
        "--weighted", action="store_true",
        help="IDF-weighted candidates + weighted-Jaccard verify (CWS signatures; "
             "boilerplate-robust dedup — the reference's weighted pipeline half)",
    )
    p.add_argument(
        "--weighted-threshold", type=float, default=None,
        help="weighted-Jaccard accept threshold (default: --threshold)",
    )
    p.add_argument("--verify-impl", choices=["arrays", "exploded"], default="arrays")
    p.add_argument(
        "--rep-strategy", choices=["none", "longest", "min_id"], default="none",
        help="also write the DEDUPLICATED corpus (deduped/) + keep/drop audit "
             "manifest (manifest/): one representative per cluster",
    )
    p.add_argument(
        "--pass-stats", action="store_true",
        help="record per-pass candidate attribution (LSH/SimHash/substring "
             "memberships, buckets, raw pair bound) + skew drop counter into "
             "metrics.jsonl — band/cap tuning observability (two extra agg jobs)",
    )
    p.add_argument(
        "--delta-store", default=None, metavar="DIR",
        help="INCREMENTAL mode: treat --input as one delivery into this "
             "persistent DeltaDedup store (signed once ever, banded against "
             "the stored corpus, incremental connected components) instead "
             "of a full pipeline run; clusters/ covers the WHOLE store",
    )
    p.add_argument(
        "--delta-batch-id", type=int, default=None,
        help="explicit batch id for --delta-store (replaying the LATEST id "
             "overwrites its partitions — at-least-once safe; earlier ids "
             "are refused); default: next",
    )
    p.add_argument(
        "--delta-remove", action="store_true",
        help="with --delta-store: treat --input as a relation of file IDs "
             "to REMOVE (tombstone epoch — rep succession, component "
             "re-labeling; compact() physically purges) instead of a "
             "delivery",
    )
    p.add_argument(
        "--delta-compact", action="store_true",
        help="with --delta-store: MAINTENANCE epoch, no input — fold batch "
             "partitions into one consolidated partition per relation, apply "
             "the label closure/fix overlays into the base, and physically "
             "purge tombstoned rows (the GDPR purge point); closes the "
             "replay window for folded batch ids",
    )
    p.add_argument(
        "--idf-snapshot", default=None, metavar="PARQUET",
        help="with --delta-store --weighted: persisted (elem, w) idf_weights "
             "relation for a NEW store (reopening loads the store's frozen "
             "snapshot and fingerprint-checks this one if given)",
    )
    p.add_argument(
        "--idf-train", action="store_true",
        help="with --delta-store --weighted: train the frozen IDF snapshot "
             "on this first delivery (train_idf_snapshot) instead of "
             "loading --idf-snapshot — the text twin of run_emb_store's "
             "--train",
    )
    p.add_argument(
        "--delta-migrate", default=None, metavar="NEW_DIR",
        help="with --delta-store --weighted: retrain IDF on the surviving "
             "corpus and re-ingest into a NEW store at this path (the "
             "sustained-idf_drift response; read-only cutover). --input is "
             "the source-of-truth corpus covering every survivor",
    )
    p.add_argument(
        "--compact-files", type=int, default=32, metavar="N",
        help="parquet part files per relation written by --delta-compact",
    )
    p.add_argument(
        "--bench", default=None, metavar="PARQUET",
        help="with --delta-store: benchmark/eval set (id, content) to freeze "
             "into the store as the decontamination snapshot — shingled with "
             "this run's config on creation, fingerprint-checked on reopen. "
             "One-shot (batch) decontamination is jobs/run_decontam.py",
    )
    p.add_argument(
        "--bench-kind", choices=["files", "documents"], default="files",
        help="'documents' adapts the testdata documents table for --bench",
    )
    p.add_argument(
        "--bench-min-overlap", type=int, default=1,
        help="record contamination scores for pairs sharing >= this many "
             "n-grams (store config, fixed at creation — a reopen must pass "
             "the same value)",
    )
    p.add_argument(
        "--contam-manifest-out", default=None, metavar="DIR",
        help="with --delta-store on a bench-enabled store: write the "
             "whole-store (doc_id, max_containment, contaminated) manifest "
             "after this epoch",
    )
    p.add_argument(
        "--contam-threshold", type=float, default=0.5,
        help="drop rule on max containment for --contam-manifest-out "
             "(query-time — the store persists scores, not verdicts)",
    )
    p.add_argument(
        "--training-set-out", default=None, metavar="DIR",
        help="with --delta-store on a bench-enabled store: READ-ONLY query "
             "epoch (no delivery) — --input is the source-of-truth "
             "(id, content) corpus covering the store, like --delta-migrate. "
             "Writes DIR/files (the training corpus) + DIR/manifest (per-doc "
             "keep/drop_reason: contaminated > low_quality > duplicate): "
             "decontaminate at --contam-threshold, apply the optional "
             "quality gate, then keep one --training-rep-strategy "
             "representative per near-dup cluster among the survivors",
    )
    p.add_argument(
        "--training-rep-strategy", choices=["longest", "min_id"],
        default="longest",
        help="representative choice for --training-set-out",
    )
    p.add_argument(
        "--quality-min-tokens", type=int, default=None, metavar="N",
        help="with --training-set-out: drop docs with < N whitespace tokens "
             "as low_quality (giving ANY --quality-* flag enables the gate; "
             "this one then defaults to 1, dropping empty docs)",
    )
    p.add_argument(
        "--quality-max-avg-tok-len", type=float, default=None, metavar="X",
        help="with --training-set-out: drop docs whose mean token length "
             "exceeds X (minified/binary-ish blobs)",
    )
    p.add_argument(
        "--quality-min-distinct-ratio", type=float, default=None, metavar="X",
        help="with --training-set-out: drop docs whose distinct/total token "
             "ratio is below X (boilerplate repetition)",
    )
    p.add_argument(
        "--mix", default=None, metavar="JSON",
        help="with --training-set-out: water-filled stratified mix of the "
             "kept files, e.g. '{\"python\": 6, \"go\": 3, \"rust\": 1}' — "
             "relative shares by --mix-by value; the scarcest source is "
             "taken whole, others thin to proportion (deterministic "
             "portable-hash sampling, operators/mixing.py). DIR/files "
             "becomes the MIXED corpus; DIR/mix_rates records the per-"
             "source rates. The manifest stays the full hygiene manifest "
             "(mixing is sampling, not a drop reason)",
    )
    p.add_argument(
        "--mix-by", default="lang", metavar="COL",
        help="column of the files relation holding the mix source value "
             "(default: lang; repo also works for source-table inputs)",
    )
    p.add_argument(
        "--mix-weight", choices=["chars", "rows"], default="chars",
        help="weight driving the mix proportions: content chars or row "
             "count",
    )
    p.add_argument("--mix-seed", type=int, default=0,
                   help="sampling seed for --mix (same seed -> same rows)")
    p.add_argument(
        "--shingle-mode", choices=["token", "char"], default="token",
        help="char: whitespace-stripped char k-grams — robust to "
             "minified/reformatted code where token boundaries move",
    )
    p.add_argument("--cores", type=int, default=None, help="local[] cores (ignored under spark-submit)")
    args = p.parse_args(argv)
    if args.weighted_threshold is not None and not args.weighted:
        p.error("--weighted-threshold only applies with --weighted "
                "(the unweighted verify uses --threshold)")
    if not args.substring and (
        args.substring_pass != "linegram" or args.substring_verify != "shingle"
    ):
        p.error("--substring-pass/--substring-verify only apply with --substring "
                "(the containment pass is off without it)")
    if args.delta_store is not None and args.substring_verify == "lcs":
        p.error("--substring-verify lcs is a batch-pipeline mode (the delta "
                "store does not persist content to LCS-score stored sides)")
    if args.delta_compact:
        if args.delta_store is None:
            p.error("--delta-compact only applies with --delta-store "
                    "(compaction is an operation on the persistent store)")
        if args.input is not None:
            p.error("--delta-compact takes no --input (it folds the store "
                    "in place; deliveries and removals are separate runs)")
        if args.delta_remove or args.delta_batch_id is not None:
            p.error("--delta-compact cannot be combined with --delta-remove "
                    "or --delta-batch-id (one epoch per run)")
    elif args.input is None:
        p.error("--input is required (only --delta-compact runs without one)")
    if args.delta_store is not None:
        for flag, val, default in (
            ("--pass-stats", args.pass_stats, False),
            ("--rep-strategy", args.rep_strategy, "none"),
            ("--checkpoint-dir", args.checkpoint_dir, None),
        ):
            if val != default:
                p.error(f"{flag} is not available in --delta-store mode")
        if args.delta_migrate is not None:
            if args.delta_remove or args.delta_compact or args.delta_batch_id is not None:
                p.error("--delta-migrate cannot be combined with "
                        "--delta-remove/--delta-compact/--delta-batch-id "
                        "(one epoch per run)")
            if args.idf_train or args.idf_snapshot is not None:
                p.error("--delta-migrate retrains its snapshot internally on "
                        "the surviving corpus (the old store's frozen "
                        "snapshot loads from the store)")
    elif args.delta_batch_id is not None:
        p.error("--delta-batch-id only applies with --delta-store "
                "(a batch id is meaningless for a one-shot pipeline run)")
    elif args.delta_remove:
        p.error("--delta-remove only applies with --delta-store "
                "(removal is an operation on the persistent store)")
    elif args.delta_migrate is not None:
        p.error("--delta-migrate only applies with --delta-store "
                "(migration is an operation on the persistent store)")
    if (args.idf_snapshot is not None or args.idf_train) and not (
        args.weighted and args.delta_store is not None
    ):
        p.error("--idf-snapshot/--idf-train only apply with --delta-store "
                "--weighted (the batch pipeline trains IDF internally)")
    if args.idf_snapshot is not None and args.idf_train:
        p.error("--idf-snapshot and --idf-train are mutually exclusive "
                "(load a persisted snapshot OR train one on this delivery)")
    if args.idf_train and (args.delta_remove or args.delta_compact):
        p.error("--idf-train only applies to a delivery epoch (removal "
                "input is ids, compaction has none — nothing to train on)")
    if args.delta_migrate is not None and not args.weighted:
        p.error("--delta-migrate only applies with --weighted (unweighted "
                "signatures are content-deterministic — a rebuild would "
                "reproduce the same store; use --delta-compact for hygiene)")
    if args.delta_store is None:
        for flag, val, default in (
            ("--bench", args.bench, None),
            ("--bench-kind", args.bench_kind, "files"),
            ("--bench-min-overlap", args.bench_min_overlap, 1),
            ("--contam-manifest-out", args.contam_manifest_out, None),
            ("--contam-threshold", args.contam_threshold, 0.5),
        ):
            if val != default:
                p.error(f"{flag} only applies with --delta-store "
                        "(one-shot decontamination is jobs/run_decontam.py)")
    if args.contam_threshold != 0.5 and (
        args.contam_manifest_out is None and args.training_set_out is None
    ):
        p.error("--contam-threshold only applies with --contam-manifest-out "
                "or --training-set-out")
    if args.training_set_out is not None:
        if args.delta_store is None:
            p.error("--training-set-out only applies with --delta-store "
                    "(the one-shot composition is the training_set operator)")
        if (args.delta_remove or args.delta_compact
                or args.delta_migrate is not None
                or args.delta_batch_id is not None or args.idf_train):
            p.error("--training-set-out is a READ-ONLY query epoch — it "
                    "cannot be combined with a delivery/removal/compaction/"
                    "migration flag (one epoch per run)")
        if args.bench is not None:
            p.error("--training-set-out queries an EXISTING bench-enabled "
                    "store (--bench freezes the snapshot at store creation)")
    else:
        for flag, val in (
            ("--training-rep-strategy", args.training_rep_strategy == "longest"),
            ("--quality-min-tokens", args.quality_min_tokens is None),
            ("--quality-max-avg-tok-len", args.quality_max_avg_tok_len is None),
            ("--quality-min-distinct-ratio",
             args.quality_min_distinct_ratio is None),
            ("--mix", args.mix is None),
            ("--mix-by", args.mix_by == "lang"),
            ("--mix-weight", args.mix_weight == "chars"),
            ("--mix-seed", args.mix_seed == 0),
        ):
            if not val:
                p.error(f"{flag} only applies with --training-set-out")
    args.mix_parsed = None
    if args.mix is not None:
        import json as _json

        try:
            parsed = _json.loads(args.mix)
        except ValueError:
            p.error("--mix must be a JSON object of source -> share")
        if not isinstance(parsed, dict) or not parsed or any(
            isinstance(v, bool) or not isinstance(v, (int, float)) or v <= 0
            for v in parsed.values()
        ):
            p.error("--mix must map at least one source to a positive share")
        args.mix_parsed = {str(k): float(v) for k, v in parsed.items()}
    elif args.mix_by != "lang" or args.mix_weight != "chars" or args.mix_seed != 0:
        p.error("--mix-by/--mix-weight/--mix-seed only apply with --mix")
    if args.bench is not None and args.delta_migrate is not None:
        p.error("--bench cannot be combined with --delta-migrate (the "
                "benchmark snapshot carries over to the new store unchanged)")
    return args


def main(argv=None) -> int:
    args = parse_args(argv)
    from pyspark.sql import SparkSession

    from sycl_jaccard_spark.config import PipelineConfig
    from sycl_jaccard_spark.plans.pipeline import DedupPipeline
    from sycl_jaccard_spark.session import get_spark
    from sycl_jaccard_spark.sources.tables import (
        documents_as_files,
        read_source_table,
        with_file_id,
    )

    active = SparkSession.getActiveSession()
    spark = active or get_spark("dedup_pipeline", cores=args.cores)

    files = None
    if args.input is not None:
        raw = read_source_table(spark, args.input)
        files = (
            documents_as_files(raw)
            if args.input_kind == "documents"
            else with_file_id(raw)
        )

    cfg = PipelineConfig(
        shingle_k=args.shingle_k,
        shingle_mode=args.shingle_mode,
        num_perms=args.num_perms,
        bands=args.bands,
        rows_per_band=args.num_perms // args.bands,
        verify_threshold=args.threshold,
        bucket_cap=args.bucket_cap,
        simhash_blocks=args.simhash_blocks,
        portable_hashes=args.portable_hashes,
        candidate_weights="idf" if args.weighted else "none",
        weighted_verify_threshold=args.weighted_threshold,
        substring_pass=args.substring_pass,
        substring_verify=args.substring_verify,
    )

    if args.delta_store is not None:
        from sycl_jaccard_spark.plans.delta import DeltaDedup, train_idf_snapshot

        idf_snapshot = None
        if args.idf_snapshot is not None:
            idf_snapshot = spark.read.parquet(args.idf_snapshot)
        elif args.idf_train:
            idf_snapshot = train_idf_snapshot(files, cfg)
        bench_snapshot = None
        if args.bench is not None:
            from pyspark.sql import functions as F

            from sycl_jaccard_spark.functions.shingles import doc_shingle_hashes

            braw = read_source_table(spark, args.bench)
            if args.bench_kind == "documents":
                braw = documents_as_files(braw)
            elif "id" not in braw.columns:
                # eval sets usually ship (id, content); a source-table-shaped
                # set (repo, path, commit, ...) gets the standard derived id
                braw = with_file_id(braw)
            bench_snapshot = braw.select(
                F.col("id").alias("bench_id"),
                doc_shingle_hashes(F.col("content"), cfg).alias("ngram_hashes"),
            )
        store = DeltaDedup(
            spark, args.delta_store, cfg,
            enable_simhash=not args.no_simhash,
            enable_substring=args.substring,
            idf_snapshot=idf_snapshot,
            bench_snapshot=bench_snapshot,
            bench_min_overlap=args.bench_min_overlap,
        )
        t0 = time.monotonic()
        if args.delta_compact:
            summary = store.compact(files_per_relation=args.compact_files)
        elif args.delta_remove:
            summary = store.remove_ids(
                files.select("id"), batch_id=args.delta_batch_id
            )
        elif args.delta_migrate is not None:
            new_store = store.migrate(args.delta_migrate, files)
            summary = {"op": "migrate", "new_store": new_store.root}
            # clusters/ and metrics.jsonl below describe the cutover target
            new_store.metrics.append({"stage": "migrate", "old_store": store.root})
            store = new_store
        elif args.training_set_out is not None:
            gate = None
            if (args.quality_min_tokens is not None
                    or args.quality_max_avg_tok_len is not None
                    or args.quality_min_distinct_ratio is not None):
                from sycl_jaccard_spark.operators.representatives import QualityGate

                gate = QualityGate(
                    min_tokens=(1 if args.quality_min_tokens is None
                                else args.quality_min_tokens),
                    max_avg_tok_len=args.quality_max_avg_tok_len,
                    min_distinct_ratio=args.quality_min_distinct_ratio,
                )
            kept, manifest = store.training_set(
                files,
                threshold=args.contam_threshold,
                strategy=args.training_rep_strategy,
                quality=gate,
            )
            mix_rate_rows = None
            if args.mix is not None:
                from pyspark.sql import functions as F

                from sycl_jaccard_spark.operators.mixing import stratified_mix

                targets = args.mix_parsed
                mixin, wcol = kept, None
                if args.mix_weight == "chars":
                    mixin = kept.withColumn("_mix_w", F.length("content"))
                    wcol = "_mix_w"
                kept, mix_rates = stratified_mix(
                    mixin, targets, source_col=args.mix_by,
                    weight_col=wcol, seed=args.mix_seed,
                )
                kept = kept.drop("_mix_w")
                mix_rates.write.mode("overwrite").parquet(
                    os.path.join(args.training_set_out, "mix_rates")
                )
                mix_rate_rows = spark.read.parquet(
                    os.path.join(args.training_set_out, "mix_rates")
                ).collect()  # <= |targets| rows, read back once
                if not mix_rate_rows:
                    raise ValueError(
                        f"--mix: none of the target sources "
                        f"{sorted(targets)} occur in column "
                        f"{args.mix_by!r} of the kept files — the mix "
                        "would be empty (check --mix-by and the share keys)"
                    )
            kept.write.mode("overwrite").parquet(
                os.path.join(args.training_set_out, "files")
            )
            manifest.write.mode("overwrite").parquet(
                os.path.join(args.training_set_out, "manifest")
            )
            reasons = {
                (r.drop_reason or "kept"): r["count"]
                for r in spark.read.parquet(
                    os.path.join(args.training_set_out, "manifest")
                ).groupBy("drop_reason").count().collect()
            }
            summary = {"op": "training_set", "rows": reasons}
            if mix_rate_rows is not None:
                summary["mix"] = {
                    # parquet row count is footer-metadata only — no re-scan
                    "sampled": spark.read.parquet(
                        os.path.join(args.training_set_out, "files")
                    ).count(),
                    "rates": {
                        r[args.mix_by]: round(r.rate, 6) for r in mix_rate_rows
                    },
                }
        else:
            summary = store.add_batch(files, batch_id=args.delta_batch_id)
        store.clusters().write.mode("overwrite").parquet(
            os.path.join(args.output, "clusters")
        )
        if args.contam_manifest_out is not None:
            store.contamination_manifest(
                threshold=args.contam_threshold
            ).write.mode("overwrite").parquet(args.contam_manifest_out)
            summary = dict(summary)
            summary["contam_dropped"] = (
                spark.read.parquet(args.contam_manifest_out)
                .filter("contaminated").count()
            )
        wall = time.monotonic() - t0
        os.makedirs(args.output, exist_ok=True)
        store.metrics.append(
            {"stage": "TOTAL", "wall_s": round(wall, 3), "rows": -1, "resumed": False}
        )
        store.write_metrics(os.path.join(args.output, "metrics.jsonl"))
        print(json.dumps({"wall_s": round(wall, 3), "output": args.output, "batch": summary}))
        if active is None:
            spark.stop()
        return 0

    pipe = DedupPipeline(
        spark,
        cfg,
        checkpoint_dir=args.checkpoint_dir,
        enable_simhash=not args.no_simhash,
        enable_substring=args.substring,
        collect_pass_stats=args.pass_stats,
    )
    t0 = time.monotonic()
    result = pipe.run(files)
    result.clusters.write.mode("overwrite").parquet(os.path.join(args.output, "clusters"))
    result.verified_pairs.write.mode("overwrite").parquet(
        os.path.join(args.output, "verified_pairs")
    )
    if args.rep_strategy != "none":
        from sycl_jaccard_spark.operators.representatives import deduplicate_corpus

        kept, manifest = deduplicate_corpus(
            files, result.clusters, strategy=args.rep_strategy
        )
        kept.write.mode("overwrite").parquet(os.path.join(args.output, "deduped"))
        manifest.write.mode("overwrite").parquet(os.path.join(args.output, "manifest"))
    wall = time.monotonic() - t0
    os.makedirs(args.output, exist_ok=True)
    pipe.metrics.append({"stage": "TOTAL", "wall_s": round(wall, 3), "rows": -1, "resumed": False})
    pipe.write_metrics(os.path.join(args.output, "metrics.jsonl"))
    print(json.dumps({"wall_s": round(wall, 3), "output": args.output}))
    if active is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
