"""CLI driver (jobs/run_pipeline.py) — the reference main.cpp flow as a job."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_run_pipeline_cli(spark, tmp_path):
    from jobs.run_pipeline import main

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rc = main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--input-kind", "documents",
            "--output", out,
            "--checkpoint-dir", ckpt,
            "--num-perms", "64",
            "--bands", "16",
        ]
    )
    assert rc == 0
    clusters = spark.read.parquet(os.path.join(out, "clusters"))
    assert clusters.count() == 500
    assert set(clusters.columns) == {"id", "cluster"}
    pairs = spark.read.parquet(os.path.join(out, "verified_pairs"))
    assert set(pairs.columns) == {"a", "b", "jaccard"}
    metrics = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    stages = {m["stage"] for m in metrics}
    assert {"exact_dedup", "shingles", "minhash", "verify", "clusters", "TOTAL"} <= stages
    # resume: second run reuses every checkpointed stage
    rc2 = main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--input-kind", "documents",
            "--output", str(tmp_path / "out2"),
            "--checkpoint-dir", ckpt,
            "--num-perms", "64",
            "--bands", "16",
        ]
    )
    assert rc2 == 0
    c2 = spark.read.parquet(os.path.join(str(tmp_path / "out2"), "clusters"))
    a = {(r.id, r.cluster) for r in clusters.collect()}
    b = {(r.id, r.cluster) for r in c2.collect()}
    assert a == b
