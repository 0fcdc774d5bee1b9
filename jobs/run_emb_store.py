"""CLI driver for the EMBEDDING delta store — the operational surface of
:class:`~sycl_jaccard_spark.plans.emb_delta.EmbeddingDeltaStore`, mirroring
the text pipeline CLI's ``--delta-*`` epochs (``jobs/run_pipeline.py``) for
dense vectors. One epoch per run:

deliver (default)   --store DIR --input vectors.parquet [--train | --codebook P]
remove              --store DIR --input ids.parquet --remove
compact             --store DIR --compact                  (no --input)
migrate             --store DIR --migrate NEW_DIR [--train-k K]  (no --input)

The first delivery must supply a codebook: ``--train`` runs distributed Lloyd
k-means on that delivery (k = --train-k), ``--codebook`` loads a persisted
(cid, pos, val) parquet relation. Reopening an existing store needs neither —
the frozen codebook is loaded and fingerprint-checked from the store.

Usage (cluster):
    spark-submit --py-files dist/sycl_jaccard_spark.zip jobs/run_emb_store.py \
        --store /warehouse/emb_store --input /lake/embeddings/2026-08-19 \
        --dim 768 --threshold 0.92 --nprobe 4

Usage (local sandbox):
    python jobs/run_emb_store.py --store /tmp/emb_store \
        --input /root/testdata/sf0.001/embeddings.parquet --dim 64 --train
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Incremental embedding near-dup store")
    p.add_argument("--store", required=True, metavar="DIR", help="store directory")
    p.add_argument("--input", default=None,
                   help="parquet path/table: (vec_id, embedding) for a delivery, "
                        "or one id column for --remove")
    p.add_argument("--dim", type=int, default=None,
                   help="embedding dimension (required for a NEW store)")
    p.add_argument("--threshold", type=float, default=0.9)
    p.add_argument("--nprobe", type=int, default=2)
    p.add_argument("--bucket-cap", type=int, default=4096)
    p.add_argument("--skew-mode", choices=["cap", "auto", "salt"], default="cap")
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--codebook", default=None, metavar="PARQUET",
                   help="persisted (cid, pos, val) codebook for a NEW store")
    p.add_argument("--train", action="store_true",
                   help="NEW store: train the codebook on this first delivery")
    p.add_argument("--train-k", type=int, default=256,
                   help="centroids for --train / --migrate retraining")
    p.add_argument("--train-iters", type=int, default=2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--batch-id", type=int, default=None,
                   help="explicit epoch id (replaying the LATEST id is "
                        "idempotent; earlier ids are refused)")
    p.add_argument("--remove", action="store_true",
                   help="treat --input as ids to tombstone (takedown epoch)")
    p.add_argument("--compact", action="store_true",
                   help="MAINTENANCE epoch, no input: fold batch partitions, "
                        "purge tombstoned rows, close the replay window")
    p.add_argument("--migrate", default=None, metavar="NEW_DIR",
                   help="retrain on the surviving corpus and re-ingest into "
                        "NEW_DIR (read-only cutover; responds to "
                        "codebook_drift)")
    p.add_argument("--metrics-out", default=None, help="write metrics.jsonl here")
    p.add_argument("--cores", type=int, default=None)
    args = p.parse_args(argv)

    n_modes = sum([args.remove, args.compact, args.migrate is not None])
    if n_modes > 1:
        p.error("--remove / --compact / --migrate are mutually exclusive "
                "(one epoch per run)")
    if args.compact or args.migrate is not None:
        if args.input is not None:
            p.error("--compact/--migrate take no --input (they operate on "
                    "the store itself)")
        if args.batch_id is not None:
            p.error("--batch-id only applies to delivery/removal epochs")
    elif args.input is None:
        p.error("--input is required (only --compact/--migrate run without one)")
    if args.train and args.codebook is not None:
        p.error("--train and --codebook are mutually exclusive")
    if (args.train or args.codebook is not None) and args.dim is None:
        p.error("--dim is required when creating a new store")
    return args


def _load_codebook(spark, path: str, dim: int):
    import numpy as np

    rows = spark.read.parquet(path).collect()
    k = max(r["cid"] for r in rows) + 1
    cb = np.zeros((k, dim), dtype=np.int64)
    for r in rows:
        cb[r["cid"], r["pos"]] = r["val"]
    return cb


def main(argv=None) -> int:
    args = parse_args(argv)
    from pyspark.sql import SparkSession

    from sycl_jaccard_spark.operators.ann import train_ivf_centroids
    from sycl_jaccard_spark.plans.emb_delta import EmbeddingDeltaStore
    from sycl_jaccard_spark.session import get_spark
    from sycl_jaccard_spark.sources.tables import read_source_table

    active = SparkSession.getActiveSession()
    spark = active or get_spark("emb_store", cores=args.cores)

    vectors = None
    if args.input is not None:
        vectors = read_source_table(spark, args.input)

    centroids_q = None
    if args.codebook is not None:
        centroids_q = _load_codebook(spark, args.codebook, args.dim)
    elif args.train:
        if args.remove:
            raise SystemExit("--train only applies to a delivery epoch")
        centroids_q = train_ivf_centroids(
            vectors, dim=args.dim, n_centroids=args.train_k,
            n_iters=args.train_iters, seed=args.seed,
            id_col=args.id_col, vec_col=args.vec_col,
        )

    # reopening infers dim from the persisted codebook when not given
    dim = args.dim
    if dim is None:
        probe = spark.read.parquet(f"{args.store.rstrip('/')}/codebook")
        dim = probe.agg({"pos": "max"}).collect()[0][0] + 1

    store = EmbeddingDeltaStore(
        spark, args.store, dim=dim, centroids_q=centroids_q,
        threshold=args.threshold, nprobe=args.nprobe,
        bucket_cap=args.bucket_cap, skew_mode=args.skew_mode,
    )

    if args.compact:
        summary = store.compact()
    elif args.migrate is not None:
        new_store = store.migrate(
            args.migrate, n_centroids=args.train_k,
            n_iters=args.train_iters, seed=args.seed,
        )
        summary = {"op": "migrate", "new_store": new_store.root,
                   "n_vectors": new_store.clusters().count()}
    elif args.remove:
        id_col = vectors.columns[0]
        summary = store.remove_ids(vectors, id_col=id_col, batch_id=args.batch_id)
    else:
        summary = store.add_batch(
            vectors, id_col=args.id_col, vec_col=args.vec_col,
            batch_id=args.batch_id,
        )

    if args.metrics_out:
        store.write_metrics(args.metrics_out)
    print(json.dumps(summary, sort_keys=True))
    if active is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
