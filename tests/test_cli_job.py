"""CLI driver (jobs/run_pipeline.py) — the reference main.cpp flow as a job."""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import functions as F

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


def test_spark_submit_pyfiles_artifact(tmp_path):
    """The north-rule run mode, end-to-end: build dist/sycl_jaccard_spark.zip
    (scripts/make_pyfiles.py), copy ONLY the job script into a bare temp dir,
    and run real `spark-submit --py-files <zip>` from there — the package can
    then resolve exclusively through the shipped artifact, exactly as on a
    multi-executor cluster. Subprocess-isolated so the session fixture's JVM
    is untouched."""
    import shutil
    import subprocess

    repo = os.path.join(os.path.dirname(__file__), "..")
    zip_path = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "make_pyfiles.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    assert os.path.exists(zip_path)

    workdir = tmp_path / "submit_cwd"
    workdir.mkdir()
    shutil.copy(os.path.join(repo, "jobs", "run_pipeline.py"), workdir / "run_pipeline.py")
    out = str(tmp_path / "out")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            str(workdir / "run_pipeline.py"),
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--input-kind", "documents",
            "--output", out,
            "--num-perms", "32",
            "--bands", "8",
            "--cores", "2",
        ],
        cwd=str(workdir),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    metrics = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert any(m["stage"] == "TOTAL" for m in metrics)
    # result parquet exists and is non-trivial (full validation lives in
    # test_run_pipeline_cli; this test is about the packaging path)
    import glob

    assert glob.glob(os.path.join(out, "clusters", "*.parquet"))


def test_run_pipeline_cli_rep_strategy(spark, tmp_path):
    """--rep-strategy also writes the deduplicated corpus + audit manifest."""
    from jobs.run_pipeline import main

    out = str(tmp_path / "out")
    rc = main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--input-kind", "documents",
            "--output", out,
            "--num-perms", "32",
            "--bands", "8",
            "--rep-strategy", "longest",
        ]
    )
    assert rc == 0
    deduped = spark.read.parquet(os.path.join(out, "deduped"))
    manifest = spark.read.parquet(os.path.join(out, "manifest"))
    assert manifest.count() == 500  # every input row audited
    n_kept = manifest.filter("kept = 1").count()
    assert deduped.count() == n_kept
    # kept ids are exactly the representatives
    reps = {r.rep_id for r in manifest.collect()}
    assert {r.id for r in deduped.select("id").collect()} == reps


def test_run_pipeline_cli_weighted(spark, tmp_path):
    """--weighted routes the IDF/CWS candidate path through the CLI; the idf
    and CWS stages land in metrics.jsonl and clusters cover every input."""
    from jobs.run_pipeline import main

    out = str(tmp_path / "wout")
    rc = main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--input-kind", "documents",
            "--output", out,
            "--num-perms", "32",
            "--bands", "8",
            "--weighted",
            "--weighted-threshold", "0.6",
        ]
    )
    assert rc == 0
    clusters = spark.read.parquet(os.path.join(out, "clusters"))
    assert clusters.count() == 500
    metrics = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert "idf" in {m["stage"] for m in metrics}


def test_run_pipeline_cli_pass_stats(spark, tmp_path):
    """--pass-stats lands the per-pass candidate attribution + drop counter
    in metrics.jsonl (VERDICT r3 #7: the observability existed as an operator
    but never reached the CLI output)."""
    from jobs.run_pipeline import main

    out = str(tmp_path / "pout")
    rc = main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--input-kind", "documents",
            "--output", out,
            "--num-perms", "32",
            "--bands", "8",
            "--pass-stats",
        ]
    )
    assert rc == 0
    metrics = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    ps = next(m for m in metrics if m["stage"] == "candidate_pass_stats")
    assert {"lsh", "simhash"} <= set(ps["passes"])
    for rec in ps["passes"].values():
        assert rec["memberships"] > 0 and rec["buckets"] > 0
        assert rec["raw_pairs"] >= rec["multi_buckets"]
    assert ps["capped_memberships"] >= 0 and ps["skew_mode"] == "cap"


def test_weighted_threshold_requires_weighted_flag():
    """--weighted-threshold without --weighted is a parse-time error, not a
    silently ignored flag."""
    import pytest

    from jobs.run_pipeline import parse_args

    with pytest.raises(SystemExit):
        parse_args(["--input", "x", "--output", "y", "--weighted-threshold", "0.6"])
    args = parse_args(["--input", "x", "--output", "y", "--weighted", "--weighted-threshold", "0.6"])
    assert args.weighted_threshold == 0.6


def test_run_pipeline_cli_delta_mode(spark, tmp_path):
    """--delta-store: two CLI deliveries into one store equal one full CLI
    run over the whole corpus, and replaying the second batch id is
    idempotent."""
    from jobs.run_pipeline import main

    store = str(tmp_path / "store")
    full_out = str(tmp_path / "full")
    rc = main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--input-kind", "documents",
            "--output", full_out,
            "--num-perms", "64",
            "--bands", "16",
        ]
    )
    assert rc == 0

    # split the documents by doc_id parity into two parquet deliveries
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d0, d1 = str(tmp_path / "d0"), str(tmp_path / "d1")
    docs.filter(F.pmod("doc_id", F.lit(2)) == 0).write.parquet(d0)
    docs.filter(F.pmod("doc_id", F.lit(2)) == 1).write.parquet(d1)
    for i, src in enumerate((d0, d1)):
        rc = main(
            [
                "--input", src,
                "--input-kind", "documents",
                "--output", str(tmp_path / f"delta{i}"),
                "--delta-store", store,
                "--num-perms", "64",
                "--bands", "16",
            ]
        )
        assert rc == 0
    delta = spark.read.parquet(str(tmp_path / "delta1" / "clusters"))
    full = spark.read.parquet(os.path.join(full_out, "clusters"))
    assert {(r.id, r.cluster) for r in delta.collect()} == {
        (r.id, r.cluster) for r in full.collect()
    }
    # replay batch 1 explicitly — store state must not change
    rc = main(
        [
            "--input", d1,
            "--input-kind", "documents",
            "--output", str(tmp_path / "delta_replay"),
            "--delta-store", store,
            "--delta-batch-id", "1",
            "--num-perms", "64",
            "--bands", "16",
        ]
    )
    assert rc == 0
    replay = spark.read.parquet(str(tmp_path / "delta_replay" / "clusters"))
    assert {(r.id, r.cluster) for r in replay.collect()} == {
        (r.id, r.cluster) for r in full.collect()
    }

    # --delta-remove: tombstone every doc_id ≡ 2 (mod 7); the store must
    # then equal a full CLI run over the SURVIVING corpus
    rm_src, surv_src = str(tmp_path / "rm"), str(tmp_path / "surv")
    docs.filter(F.pmod("doc_id", F.lit(7)) == 2).write.parquet(rm_src)
    docs.filter(F.pmod("doc_id", F.lit(7)) != 2).write.parquet(surv_src)
    rc = main(
        [
            "--input", rm_src,
            "--input-kind", "documents",
            "--output", str(tmp_path / "delta_rm"),
            "--delta-store", store,
            "--delta-remove",
            "--num-perms", "64",
            "--bands", "16",
        ]
    )
    assert rc == 0
    rc = main(
        [
            "--input", surv_src,
            "--input-kind", "documents",
            "--output", str(tmp_path / "full_surv"),
            "--num-perms", "64",
            "--bands", "16",
        ]
    )
    assert rc == 0
    after_rm = spark.read.parquet(str(tmp_path / "delta_rm" / "clusters"))
    full_surv = spark.read.parquet(str(tmp_path / "full_surv" / "clusters"))
    assert {(r.id, r.cluster) for r in after_rm.collect()} == {
        (r.id, r.cluster) for r in full_surv.collect()
    }

    # --delta-compact: maintenance epoch, no input — clusters unchanged,
    # tombstoned rows physically purged, epoch relations folded away
    rc = main(
        [
            "--output", str(tmp_path / "delta_compact"),
            "--delta-store", store,
            "--delta-compact",
            "--compact-files", "2",
            "--num-perms", "64",
            "--bands", "16",
        ]
    )
    assert rc == 0
    compacted = spark.read.parquet(str(tmp_path / "delta_compact" / "clusters"))
    assert {(r.id, r.cluster) for r in compacted.collect()} == {
        (r.id, r.cluster) for r in full_surv.collect()
    }
    assert spark.read.parquet(store + "/removed").count() == 0
    removed_ids = [r.doc_id for r in docs.filter(F.pmod("doc_id", F.lit(7)) == 2).collect()]
    files_rel = spark.read.parquet(store + "/files")
    assert files_rel.filter(F.col("id").isin(removed_ids)).count() == 0


def test_run_pipeline_cli_weighted_delta_lifecycle(spark, tmp_path):
    """Weighted delta lifecycle through the CLI: --idf-train creates the
    store's frozen snapshot on the first delivery, a reopen-delivery loads
    it from the store, and --delta-migrate retrains on the survivors and
    cuts over to a new store that equals a full --weighted CLI run."""
    from jobs.run_pipeline import main

    store, new_store = str(tmp_path / "w"), str(tmp_path / "w2")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d0, d1 = str(tmp_path / "d0"), str(tmp_path / "d1")
    docs.filter(F.pmod("doc_id", F.lit(2)) == 0).write.parquet(d0)
    docs.filter(F.pmod("doc_id", F.lit(2)) == 1).write.parquet(d1)
    common = ["--input-kind", "documents", "--num-perms", "64",
              "--bands", "16", "--weighted"]
    rc = main(["--input", d0, "--output", str(tmp_path / "o0"),
               "--delta-store", store, "--idf-train", *common])
    assert rc == 0
    rc = main(["--input", d1, "--output", str(tmp_path / "o1"),
               "--delta-store", store, *common])  # snapshot loads from store
    assert rc == 0
    rc = main(["--input", "/root/testdata/sf0.001/documents.parquet",
               "--output", str(tmp_path / "mig"), "--delta-store", store,
               "--delta-migrate", new_store, *common])
    assert rc == 0
    rc = main(["--input", "/root/testdata/sf0.001/documents.parquet",
               "--output", str(tmp_path / "full"), *common])
    assert rc == 0
    migrated = spark.read.parquet(str(tmp_path / "mig" / "clusters"))
    full = spark.read.parquet(str(tmp_path / "full" / "clusters"))
    assert {(r.id, r.cluster) for r in migrated.collect()} == {
        (r.id, r.cluster) for r in full.collect()
    }
    # the cutover target is a real store at the new path
    assert spark.read.parquet(new_store + "/idf").count() > 0


def test_cli_delta_remove_requires_store():
    import pytest

    from jobs.run_pipeline import parse_args

    with pytest.raises(SystemExit):
        parse_args(["--input", "x", "--output", "y", "--delta-remove"])


def test_cli_delta_compact_flag_validation(tmp_path):
    import pytest

    from jobs.run_pipeline import parse_args

    store = str(tmp_path / "s")
    # requires --delta-store
    with pytest.raises(SystemExit):
        parse_args(["--output", "y", "--delta-compact"])
    # takes no input
    with pytest.raises(SystemExit):
        parse_args(["--input", "x", "--output", "y",
                    "--delta-store", store, "--delta-compact"])
    # one epoch per run
    with pytest.raises(SystemExit):
        parse_args(["--output", "y", "--delta-store", store,
                    "--delta-compact", "--delta-remove"])
    # --input still required for every non-compact run
    with pytest.raises(SystemExit):
        parse_args(["--output", "y"])
    args = parse_args(["--output", "y", "--delta-store", store, "--delta-compact"])
    assert args.delta_compact and args.input is None


def test_delta_mode_rejects_unsupported_flags(tmp_path):
    import pytest as _pytest

    from jobs.run_pipeline import parse_args

    base = [
        "--input", "x", "--output", "y", "--delta-store", str(tmp_path / "s"),
    ]
    for extra in (["--pass-stats"], ["--checkpoint-dir", "c"]):
        with _pytest.raises(SystemExit):
            parse_args(base + extra)
    # --substring IS available in delta mode (the store carries the
    # containment pass — tests/test_delta.py proves batch parity)
    assert parse_args(base + ["--substring"]).substring
    # --weighted IS available in delta mode (snapshot via --idf-snapshot /
    # --idf-train on a new store, loaded from the store on reopen)
    assert parse_args(base + ["--weighted", "--idf-train"]).idf_train


def test_cli_idf_and_migrate_flag_validation(tmp_path):
    """--idf-snapshot/--idf-train/--delta-migrate preconditions are
    parse-time errors, not deep runtime failures."""
    import pytest as _pytest

    from jobs.run_pipeline import parse_args

    store = str(tmp_path / "s")
    base = ["--input", "x", "--output", "y", "--delta-store", store]
    # idf flags need --delta-store AND --weighted
    for bad in (
        ["--input", "x", "--output", "y", "--weighted", "--idf-train"],
        base + ["--idf-train"],
        base + ["--idf-snapshot", "p"],
        # mutually exclusive
        base + ["--weighted", "--idf-train", "--idf-snapshot", "p"],
        # training input must be a delivery
        base + ["--weighted", "--idf-train", "--delta-remove"],
        # migrate: store + weighted, no other epoch, no idf flags, no
        # batch id (the new store's first epoch is internal)
        ["--input", "x", "--output", "y", "--delta-migrate", "n"],
        base + ["--delta-migrate", "n"],  # missing --weighted
        base + ["--weighted", "--delta-migrate", "n", "--delta-remove"],
        base + ["--weighted", "--delta-migrate", "n", "--delta-batch-id", "3"],
        base + ["--weighted", "--delta-migrate", "n", "--idf-train"],
    ):
        with _pytest.raises(SystemExit):
            parse_args(bad)
    args = parse_args(base + ["--weighted", "--delta-migrate", "n"])
    assert args.delta_migrate == "n" and args.weighted


def test_cli_emb_store_full_lifecycle(spark, tmp_path):
    """jobs/run_emb_store.py: train+deliver, second delivery, removal,
    compaction and migration epochs through the CLI, state preserved."""
    import pytest

    from jobs.run_emb_store import main as emb_main
    from jobs.run_emb_store import parse_args as emb_parse

    # flag validation
    with pytest.raises(SystemExit):
        emb_parse(["--store", "s"])  # no input, not compact/migrate
    with pytest.raises(SystemExit):
        emb_parse(["--store", "s", "--input", "x", "--compact"])
    with pytest.raises(SystemExit):
        emb_parse(["--store", "s", "--input", "x", "--remove", "--compact"])
    with pytest.raises(SystemExit):
        emb_parse(["--store", "s", "--input", "x", "--train",
                   "--codebook", "cb"])
    with pytest.raises(SystemExit):
        emb_parse(["--store", "s", "--input", "x", "--train"])  # no --dim

    src = str(tmp_path / "vecs")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    ).write.parquet(src)
    store_dir = str(tmp_path / "store")
    common = ["--store", store_dir, "--threshold", "0.95", "--nprobe", "2",
              "--bucket-cap", str(10**9)]

    # epoch 0: train on the first delivery (even vec_ids)
    w0, w1 = str(tmp_path / "w0"), str(tmp_path / "w1")
    df = spark.read.parquet(src)
    df.filter(F.pmod("vec_id", F.lit(2)) == 0).write.parquet(w0)
    df.filter(F.pmod("vec_id", F.lit(2)) == 1).write.parquet(w1)
    assert emb_main(common + ["--input", w0, "--dim", "64", "--train",
                              "--train-k", "16"]) == 0
    # epoch 1: reopen (codebook loaded from the store), deliver the rest
    assert emb_main(common + ["--input", w1]) == 0

    from sycl_jaccard_spark.plans.emb_delta import EmbeddingDeltaStore
    store = EmbeddingDeltaStore(
        spark, store_dir, dim=64, threshold=0.95, nprobe=2, bucket_cap=10**9
    )
    n_all = df.count()
    assert store.clusters().count() == n_all

    # epoch 2: removal by id relation
    ids = str(tmp_path / "rm")
    df.select("vec_id").limit(5).write.parquet(ids)
    assert emb_main(common + ["--input", ids, "--remove"]) == 0
    assert store.clusters().count() == n_all - 5

    # epoch 3: compaction (no input)
    assert emb_main(common + ["--compact"]) == 0
    assert store.clusters().count() == n_all - 5

    # migration into a new store (retrains on survivors)
    new_dir = str(tmp_path / "store2")
    assert emb_main(common + ["--migrate", new_dir, "--train-k", "16"]) == 0
    new = EmbeddingDeltaStore(
        spark, new_dir, dim=64, threshold=0.95, nprobe=2, bucket_cap=10**9
    )
    assert new.clusters().count() == n_all - 5


def test_substring_knobs_require_substring_flag():
    """--substring-pass/--substring-verify without --substring are parse-time
    errors (the pass is off — silently ignored flags are the dead-knob
    failure mode), and --substring-verify lcs is refused in delta mode at
    parse time (the store persists shingles, not content)."""
    import pytest

    from jobs.run_pipeline import parse_args

    with pytest.raises(SystemExit):
        parse_args(["--input", "x", "--output", "y", "--substring-pass", "winnow"])
    with pytest.raises(SystemExit):
        parse_args(["--input", "x", "--output", "y", "--substring-verify", "lcs"])
    with pytest.raises(SystemExit):
        parse_args([
            "--input", "x", "--output", "y", "--delta-store", "d",
            "--substring", "--substring-verify", "lcs",
        ])
    args = parse_args([
        "--input", "x", "--output", "y", "--substring",
        "--substring-pass", "winnow", "--substring-verify", "lcs",
    ])
    assert args.substring_pass == "winnow" and args.substring_verify == "lcs"


def test_run_pipeline_cli_delta_decontam(spark, tmp_path):
    """--bench on store creation freezes the decontamination snapshot; a
    reopen delivery (no --bench) keeps probing; --contam-manifest-out writes
    the whole-store manifest with exactly the planted leak flagged and the
    half-leak scored below threshold."""
    from jobs.run_pipeline import main

    def content(i):
        return " ".join(f"tok{i}_{t}" for t in range(30))

    # doc 3 is a verbatim benchmark leak; doc 7 embeds the first half of the
    # bench window (containment 11/26 with shingle_k=5: scored, not flagged)
    rows = []
    for i in range(10):
        if i == 7:
            c = " ".join(
                [f"tok3_{t}" for t in range(15)]
                + [f"tok7_{t}" for t in range(15, 30)]
            )
        else:
            c = content(i)
        rows.append((i, c, "python"))
    corpus = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    d0, d1 = str(tmp_path / "d0"), str(tmp_path / "d1")
    corpus.filter("doc_id < 5").write.parquet(d0)
    corpus.filter("doc_id >= 5").write.parquet(d1)
    bench = str(tmp_path / "bench")
    spark.createDataFrame(
        [(0, content(3))], "id long, content string"
    ).write.parquet(bench)

    store = str(tmp_path / "store")
    manifest_out = str(tmp_path / "contam")
    assert main([
        "--input", d0, "--input-kind", "documents",
        "--output", str(tmp_path / "o0"),
        "--delta-store", store, "--bench", bench,
        "--num-perms", "64", "--bands", "16",
    ]) == 0
    assert main([
        "--input", d1, "--input-kind", "documents",
        "--output", str(tmp_path / "o1"),
        "--delta-store", store,
        "--contam-manifest-out", manifest_out,
        "--num-perms", "64", "--bands", "16",
    ]) == 0

    m = {r.doc_id: r for r in spark.read.parquet(manifest_out).collect()}
    assert set(m) == set(range(10))
    assert {i for i in m if m[i].contaminated} == {3}
    assert m[3].max_containment == 1.0
    assert 0.0 < m[7].max_containment < 0.5
    assert m[0].max_containment == 0.0


def test_cli_decontam_flags_require_delta_store():
    """--bench / --contam-manifest-out / their knobs without --delta-store
    are parse-time errors (one-shot decontamination is run_decontam.py), and
    --contam-threshold without --contam-manifest-out is refused."""
    import pytest

    from jobs.run_pipeline import parse_args

    for extra in (
        ["--bench", "b"],
        ["--bench-kind", "documents"],
        ["--bench-min-overlap", "3"],
        ["--contam-manifest-out", "m"],
        ["--contam-threshold", "0.6"],
    ):
        with pytest.raises(SystemExit):
            parse_args(["--input", "x", "--output", "y"] + extra)
    with pytest.raises(SystemExit):
        parse_args([
            "--input", "x", "--output", "y", "--delta-store", "d",
            "--contam-threshold", "0.6",
        ])
    with pytest.raises(SystemExit):
        parse_args([
            "--input", "x", "--output", "y", "--delta-store", "d",
            "--weighted", "--bench", "b", "--delta-migrate", "n",
        ])
    args = parse_args([
        "--input", "x", "--output", "y", "--delta-store", "d",
        "--bench", "b", "--bench-min-overlap", "3",
        "--contam-manifest-out", "m", "--contam-threshold", "0.6",
    ])
    assert args.bench == "b" and args.contam_threshold == 0.6


def test_run_pipeline_cli_training_set(spark, tmp_path):
    """--training-set-out: READ-ONLY query epoch on a bench-enabled store —
    one manifest composing decontamination, the quality gate and
    dedup-survivor representative selection; the store itself is not
    mutated."""
    from jobs.run_pipeline import main, parse_args

    def content(i):
        return " ".join(f"tok{i}_{t}" for t in range(30))

    # doc 3 = verbatim benchmark leak; doc 5 = repetitive junk (1 distinct
    # token); doc 8 = exact copy of doc 9 (sha256 pass clusters them)
    rows = []
    for i in range(10):
        if i == 5:
            c = "zz " * 40
        elif i == 8:
            c = content(9)
        else:
            c = content(i)
        rows.append((i, c, "python"))
    corpus = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    src = str(tmp_path / "src")
    corpus.write.parquet(src)
    bench = str(tmp_path / "bench")
    spark.createDataFrame(
        [(0, content(3))], "id long, content string"
    ).write.parquet(bench)

    store = str(tmp_path / "store")
    assert main([
        "--input", src, "--input-kind", "documents",
        "--output", str(tmp_path / "o0"),
        "--delta-store", store, "--bench", bench,
        "--num-perms", "64", "--bands", "16",
    ]) == 0
    clusters_before = {
        (r.id, r.cluster)
        for r in spark.read.parquet(str(tmp_path / "o0" / "clusters")).collect()
    }

    ts_out = str(tmp_path / "ts")
    assert main([
        "--input", src, "--input-kind", "documents",
        "--output", str(tmp_path / "o1"),
        "--delta-store", store,
        "--training-set-out", ts_out,
        "--quality-min-distinct-ratio", "0.5",
        "--num-perms", "64", "--bands", "16",
    ]) == 0

    m = {r.id: r for r in spark.read.parquet(ts_out + "/manifest").collect()}
    assert set(m) == set(range(10))
    assert m[3].drop_reason == "contaminated" and not m[3].keep
    assert m[5].drop_reason == "low_quality" and not m[5].keep
    # exact-dup pair: longest ties -> min id represents, 9 drops
    assert m[8].keep and m[8].rep_id == 8
    assert m[9].drop_reason == "duplicate" and m[9].rep_id == 8
    kept_ids = {r.id for r in spark.read.parquet(ts_out + "/files").collect()}
    assert kept_ids == {0, 1, 2, 4, 6, 7, 8}
    # read-only: the store's clusters are unchanged by the query epoch
    clusters_after = {
        (r.id, r.cluster)
        for r in spark.read.parquet(str(tmp_path / "o1" / "clusters")).collect()
    }
    assert clusters_after == clusters_before


def test_cli_training_set_flag_validation(tmp_path):
    """--training-set-out requires --delta-store and excludes mutation
    epochs; the --quality-*/--training-rep-strategy knobs require it."""
    import pytest

    from jobs.run_pipeline import parse_args

    base = ["--input", "x", "--output", "y"]
    with pytest.raises(SystemExit):
        parse_args(base + ["--training-set-out", "t"])  # no --delta-store
    for extra in (
        ["--quality-min-tokens", "5"],
        ["--quality-max-avg-tok-len", "6.0"],
        ["--quality-min-distinct-ratio", "0.4"],
        ["--training-rep-strategy", "min_id"],
    ):
        with pytest.raises(SystemExit):
            parse_args(base + ["--delta-store", "d"] + extra)
    for clash in (
        ["--delta-remove"],
        ["--delta-batch-id", "1"],
        ["--bench", "b"],
    ):
        with pytest.raises(SystemExit):
            parse_args(base + ["--delta-store", "d",
                               "--training-set-out", "t"] + clash)
    args = parse_args(base + [
        "--delta-store", "d", "--training-set-out", "t",
        "--quality-min-tokens", "5", "--contam-threshold", "0.9",
    ])
    assert args.training_set_out == "t" and args.quality_min_tokens == 5


def test_run_pipeline_cli_training_set_mix(spark, tmp_path):
    """--mix on the training-set epoch: the kept files are water-fill
    sampled to the target lang shares — the scarce lang is taken whole,
    the abundant one thins — and DIR/mix_rates records the rates."""
    import json

    from jobs.run_pipeline import main

    def content(i):
        return " ".join(f"tok{i}_{t}" for t in range(30))

    rows = [(i, content(i), "python" if i < 8 else "go") for i in range(12)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    src = str(tmp_path / "src")
    corpus.write.parquet(src)
    bench = str(tmp_path / "bench")
    spark.createDataFrame(
        [(0, content(0))], "id long, content string"
    ).write.parquet(bench)

    store = str(tmp_path / "store")
    assert main([
        "--input", src, "--input-kind", "documents",
        "--output", str(tmp_path / "o0"),
        "--delta-store", store, "--bench", bench,
        "--num-perms", "64", "--bands", "16",
    ]) == 0
    ts_out = str(tmp_path / "ts")
    assert main([
        "--input", src, "--input-kind", "documents",
        "--output", str(tmp_path / "o1"),
        "--delta-store", store,
        "--training-set-out", ts_out,
        "--mix", json.dumps({"python": 1, "go": 1}),
        "--mix-seed", "3",
        "--num-perms", "64", "--bands", "16",
    ]) == 0

    rates = {r.lang: r for r in spark.read.parquet(ts_out + "/mix_rates").collect()}
    assert set(rates) == {"python", "go"}
    assert rates["go"].rate == 1.0  # scarce lang taken whole
    assert 0 < rates["python"].rate < 1
    kept = spark.read.parquet(ts_out + "/files")
    by_lang = {r.lang: r["count"] for r in kept.groupBy("lang").count().collect()}
    assert by_lang["go"] == 4  # every clean go doc survives the mix
    assert 0 < by_lang.get("python", 0) < 7  # doc 0 contaminated; rest thinned
    # the manifest is the FULL hygiene manifest (mixing is not a drop reason)
    m = spark.read.parquet(ts_out + "/manifest")
    assert m.count() == 12
    assert {r.drop_reason for r in m.collect()} <= {None, "contaminated", "duplicate"}


def test_cli_mix_flag_validation():
    """--mix requires --training-set-out, its knobs require --mix, and a
    malformed JSON or non-positive share is a parse error."""
    import pytest

    from jobs.run_pipeline import parse_args

    base = ["--input", "x", "--output", "y", "--delta-store", "d"]
    with pytest.raises(SystemExit):
        parse_args(base + ["--mix", '{"a": 1}'])  # no --training-set-out
    ts = base + ["--training-set-out", "t"]
    for bad in ('not json', '{}', '{"a": 0}', '{"a": -2}', '["a"]'):
        with pytest.raises(SystemExit):
            parse_args(ts + ["--mix", bad])
    for knob in (["--mix-by", "repo"], ["--mix-weight", "rows"],
                 ["--mix-seed", "5"]):
        with pytest.raises(SystemExit):
            parse_args(ts + knob)  # knobs without --mix
    args = parse_args(ts + ["--mix", '{"python": 2, "go": 1}',
                            "--mix-by", "repo", "--mix-weight", "rows"])
    assert args.mix_by == "repo" and args.mix_weight == "rows"


def test_cli_mix_no_matching_source_fails_loudly(spark, tmp_path):
    """--mix naming only sources absent from --mix-by must FAIL the run
    (an empty training corpus from a typo'd source name is the silent
    failure mode), and DIR/files is not written."""
    import json
    import os

    import pytest

    from jobs.run_pipeline import main

    def content(i):
        return " ".join(f"tok{i}_{t}" for t in range(30))

    corpus = spark.createDataFrame(
        [(i, content(i), "python") for i in range(6)],
        "doc_id long, text string, lang string",
    )
    src = str(tmp_path / "src")
    corpus.write.parquet(src)
    bench = str(tmp_path / "bench")
    spark.createDataFrame(
        [(0, content(0))], "id long, content string"
    ).write.parquet(bench)
    store = str(tmp_path / "store")
    assert main([
        "--input", src, "--input-kind", "documents",
        "--output", str(tmp_path / "o0"),
        "--delta-store", store, "--bench", bench,
        "--num-perms", "64", "--bands", "16",
    ]) == 0
    ts_out = str(tmp_path / "ts")
    with pytest.raises(ValueError, match="none of the target sources"):
        main([
            "--input", src, "--input-kind", "documents",
            "--output", str(tmp_path / "o1"),
            "--delta-store", store,
            "--training-set-out", ts_out,
            "--mix", json.dumps({"pyton": 1}),  # typo'd source
            "--num-perms", "64", "--bands", "16",
        ])
    assert not os.path.exists(os.path.join(ts_out, "files"))
