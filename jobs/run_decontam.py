"""CLI driver for benchmark decontamination — the operational surface of
``operators/decontaminate.py``. One run: shingle the corpus, probe it against
a benchmark/eval parquet (broadcast side), write the scored overlap pairs and
the per-document keep/drop manifest.

    probe (always)      --input corpus.parquet --bench bench.parquet --pairs-out DIR
    + drop manifest     --manifest-out DIR

Usage (cluster):
    spark-submit --py-files dist/sycl_jaccard_spark.zip jobs/run_decontam.py \
        --input /lake/source_files --bench /warehouse/eval_sets/all \
        --pairs-out /warehouse/contam_pairs --manifest-out /warehouse/contam_drop \
        --threshold 0.5

Usage (local sandbox, documents testdata as both corpus and benchmark):
    python jobs/run_decontam.py --input /root/testdata/sf0.001/documents.parquet \
        --input-kind documents --bench /root/testdata/sf0.001/documents.parquet \
        --bench-kind documents --pairs-out /tmp/contam_pairs

The benchmark side is ALWAYS broadcast (eval sets are small); the corpus is
never shuffled before the probe — per-delivery decontamination of a delta
batch is therefore this same job pointed at the batch parquet.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Benchmark decontamination")
    p.add_argument("--input", required=True,
                   help="corpus parquet path or catalog table")
    p.add_argument("--input-kind", choices=["files", "documents"], default="files",
                   help="'documents' adapts the testdata documents table "
                        "(doc_id -> id, text -> content)")
    p.add_argument("--id-col", default="id")
    p.add_argument("--content-col", default="content")
    p.add_argument("--bench", required=True,
                   help="benchmark parquet path or catalog table")
    p.add_argument("--bench-kind", choices=["files", "documents"], default="files")
    p.add_argument("--bench-id-col", default="id")
    p.add_argument("--bench-content-col", default="content")
    p.add_argument("--pairs-out", required=True,
                   help="scored (doc, bench, overlap, containment) parquet dir")
    p.add_argument("--manifest-out", default=None,
                   help="per-doc (doc_id, max_containment, contaminated) parquet dir")
    p.add_argument("--shingle-k", type=int, default=7,
                   help="n-gram size (tokens) for both sides")
    p.add_argument("--min-overlap", type=int, default=1,
                   help="emit pairs sharing >= this many n-grams")
    p.add_argument("--threshold", type=float, default=0.5,
                   help="manifest drop rule on max containment")
    p.add_argument("--cores", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from sycl_jaccard_spark.config import PipelineConfig
    from sycl_jaccard_spark.functions.shingles import doc_shingle_hashes
    from sycl_jaccard_spark.operators.decontaminate import (
        contamination_overlap,
        decontamination_manifest,
    )
    from sycl_jaccard_spark.session import get_spark
    from sycl_jaccard_spark.sources.tables import read_source_table

    active = SparkSession.getActiveSession()
    spark = active or get_spark("decontam", cores=args.cores)
    t0 = time.monotonic()

    cfg = PipelineConfig(shingle_k=args.shingle_k)

    def load(path, kind, id_col, content_col, out_id):
        df = read_source_table(spark, path)
        if kind == "documents":
            df = df.select(F.col("doc_id").alias("id"), F.col("text").alias("content"))
            id_col, content_col = "id", "content"
        return df.select(
            F.col(id_col).alias(out_id),
            doc_shingle_hashes(F.col(content_col), cfg).alias("ngram_hashes"),
        )

    corpus = load(args.input, args.input_kind, args.id_col, args.content_col, "doc_id")
    bench = load(args.bench, args.bench_kind, args.bench_id_col,
                 args.bench_content_col, "bench_id")

    overlaps = contamination_overlap(
        corpus, bench, min_overlap=args.min_overlap
    ).localCheckpoint(eager=True)  # pairs-out write + manifest agg both consume it
    overlaps.write.mode("overwrite").parquet(args.pairs_out)
    n_pairs = overlaps.count()

    n_dropped = None
    if args.manifest_out is not None:
        manifest = decontamination_manifest(
            corpus.select("doc_id"), overlaps, threshold=args.threshold
        )
        manifest.write.mode("overwrite").parquet(args.manifest_out)
        n_dropped = (
            spark.read.parquet(args.manifest_out)
            .filter(F.col("contaminated")).count()
        )

    metrics = {
        "contam_pairs": n_pairs,
        "dropped_docs": n_dropped,
        "wall_s": round(time.monotonic() - t0, 2),
    }
    print(json.dumps(metrics))
    if active is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
