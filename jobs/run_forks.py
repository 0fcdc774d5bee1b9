"""CLI driver for COLLECTION-level (repo/fork/mirror) similarity — the
operational surface of ``operators/collections.py``. One run: shingle the
member files, score collection pairs with exact Jaccard + containment, and
optionally fold them into fork lineages and a drop manifest.

    score (always)      --input files.parquet --pairs-out DIR
    + lineages          --threshold 0.9 --clusters-out DIR
    + drop manifest     --manifest-out DIR        (needs --clusters-out)

Candidate generation (``--candidates``):

    index (default)  inverted index over rare shingles (collection-df <=
                     --max-df) — exact-recall within the df cap
    lsh              union-closure collection MinHash (elementwise min of
                     per-file signatures) + LSH banding — the
                     10^8-collection scale path; probabilistic recall set
                     by --num-perms/--bands, exact scoring unchanged

Usage (cluster):
    spark-submit --py-files dist/sycl_jaccard_spark.zip jobs/run_forks.py \
        --input /lake/source_files --group-col repo \
        --pairs-out /warehouse/fork_pairs --threshold 0.92 \
        --clusters-out /warehouse/fork_lineages --manifest-out /warehouse/fork_drop

Usage (local sandbox):
    python jobs/run_forks.py --input /root/testdata/sf0.001/documents.parquet \
        --input-kind documents --pairs-out /tmp/fork_pairs
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Collection-level fork/mirror detection")
    p.add_argument("--input", required=True,
                   help="parquet path or catalog table of member files")
    p.add_argument("--input-kind", choices=["files", "documents"], default="files",
                   help="'documents' adapts the testdata documents table "
                        "(source -> collection, text -> content)")
    p.add_argument("--group-col", default="repo",
                   help="collection key column (repo, org, source, ...)")
    p.add_argument("--content-col", default="content")
    p.add_argument("--pairs-out", required=True, help="scored pairs parquet dir")
    p.add_argument("--clusters-out", default=None,
                   help="fork-lineage (collection, rep) parquet dir")
    p.add_argument("--manifest-out", default=None,
                   help="per-file keep/drop manifest parquet dir")
    p.add_argument("--candidates", choices=["index", "lsh"], default="index")
    p.add_argument("--max-df", type=int, default=10,
                   help="index mode: max collections sharing a shingle")
    p.add_argument("--shingle-k", type=int, default=7)
    p.add_argument("--num-perms", type=int, default=128, help="lsh mode")
    p.add_argument("--bands", type=int, default=32, help="lsh mode")
    p.add_argument("--threshold", type=float, default=0.9,
                   help="lineage edge threshold on the jaccard score")
    p.add_argument("--score-col", choices=["jaccard", "containment"], default="jaccard",
                   help="which score gates lineage edges (containment "
                        "merges embedded forks the symmetric score misses)")
    p.add_argument("--cores", type=int, default=None)
    args = p.parse_args(argv)
    if args.manifest_out is not None and args.clusters_out is None:
        p.error("--manifest-out requires --clusters-out (the manifest joins "
                "the lineages onto the member files)")
    if args.num_perms % args.bands != 0:
        p.error("--num-perms must be divisible by --bands")
    return args


def main(argv=None) -> int:
    args = parse_args(argv)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from sycl_jaccard_spark.config import PipelineConfig
    from sycl_jaccard_spark.functions.minhash import minhash_udf
    from sycl_jaccard_spark.functions.shingles import doc_shingle_hashes
    from sycl_jaccard_spark.operators.collections import (
        collection_candidates,
        collection_clusters,
        collection_memberships,
        collection_minhash,
        collection_pair_jaccard,
        drop_fork_members,
    )
    from sycl_jaccard_spark.operators.lsh import band_hashes, candidate_pairs
    from sycl_jaccard_spark.operators.pair_jaccard import jaccard_pairs_memberships
    from sycl_jaccard_spark.functions.jaccard import containment_from_counts
    from sycl_jaccard_spark.session import get_spark
    from sycl_jaccard_spark.sources.tables import read_source_table

    active = SparkSession.getActiveSession()
    spark = active or get_spark("forks", cores=args.cores)
    t0 = time.monotonic()

    files = read_source_table(spark, args.input)
    group_col, content_col = args.group_col, args.content_col
    if args.input_kind == "documents":
        files = files.select(
            F.col("source").alias("collection_key"), F.col("text").alias("content")
        )
        group_col, content_col = "collection_key", "content"

    cfg = PipelineConfig(
        shingle_k=args.shingle_k, num_perms=args.num_perms, bands=args.bands,
        rows_per_band=args.num_perms // args.bands,
    )
    # materialized (as in the pipeline's shingles stage): the signer UDF and
    # the membership explode both need a concrete column, not the HOF
    # expression chain (Catalyst cannot evaluate a Python UDF whose argument
    # is still the unextracted lambda tree)
    shingled = files.select(
        F.col(group_col).alias("collection_key"),
        doc_shingle_hashes(F.col(content_col), cfg).alias("shingle_hashes"),
    ).localCheckpoint(eager=True)
    # one explode+distinct, four consumers (df counts / candidates / sizes /
    # intersections) — materialize it once
    mem = collection_memberships(
        shingled, "collection_key", "shingle_hashes"
    ).localCheckpoint(eager=True)

    if args.candidates == "index":
        pairs = collection_candidates(mem, args.max_df)
        scored = collection_pair_jaccard(
            shingled, "collection_key", "shingle_hashes",
            max_df=args.max_df, memberships=mem,
        )
    else:
        signed = shingled.select(
            "collection_key",
            minhash_udf(cfg.num_perms, cfg.seed)(F.col("shingle_hashes")).alias("sig"),
        ).localCheckpoint(eager=True)  # a pandas-UDF column cannot feed
        # element_at/explode consumers un-materialized (Catalyst inlines it)
        csig = collection_minhash(signed, "collection_key", cfg.num_perms)
        banded = band_hashes(csig, cfg, "collection")
        pairs = candidate_pairs(banded, cfg, "collection")
        scored = jaccard_pairs_memberships(mem, pairs, id_col="collection").withColumn(
            "containment",
            containment_from_counts(F.col("inter"), F.col("size_a"), F.col("size_b")),
        )

    scored = scored.localCheckpoint(eager=True)  # pairs-out + lineages both read it
    scored.write.mode("overwrite").parquet(args.pairs_out)
    n_pairs = scored.count()
    summary = {
        "n_collections": mem.select("collection").distinct().count(),
        "n_scored_pairs": n_pairs,
        "candidates": args.candidates,
    }

    if args.clusters_out is not None:
        allc = mem.select("collection").distinct()
        clusters = collection_clusters(
            scored, threshold=args.threshold, score_col=args.score_col,
            collections=allc,
        ).localCheckpoint(eager=True)
        clusters.write.mode("overwrite").parquet(args.clusters_out)
        summary["n_lineages"] = clusters.select("rep").distinct().count()
        if args.manifest_out is not None:
            manifest = drop_fork_members(
                files.withColumnRenamed(group_col, "collection_key")
                if group_col != "collection_key" else files,
                clusters, "collection_key",
            ).drop(content_col)
            manifest.write.mode("overwrite").parquet(args.manifest_out)
            summary["n_dropped_members"] = manifest.filter(~F.col("keep")).count()

    summary["wall_s"] = round(time.monotonic() - t0, 3)
    print(json.dumps(summary))
    if active is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
