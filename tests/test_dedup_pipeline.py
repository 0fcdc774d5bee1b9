"""Dedup-layer tests: exact dedup, LSH candidate generation, connected
components vs a union-find oracle, and the end-to-end recall gate
(dup-pair recall >= 0.99, BASELINE.md) on the planted-cluster corpus."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sycl_jaccard_spark.config import PipelineConfig
from sycl_jaccard_spark.operators.components import connected_components
from sycl_jaccard_spark.operators.exact_dedup import dedup_exact, exact_dup_groups
from sycl_jaccard_spark.operators.lsh import (
    band_hashes,
    candidate_pairs,
    capped_docs,
    minhash_signatures,
)
from sycl_jaccard_spark.plans.pipeline import DedupPipeline
from sycl_jaccard_spark.sources.corpus import CorpusSpec, synth_source_files, truth_pairs
from sycl_jaccard_spark.sources.tables import with_file_id

from tests.conftest import UnionFind


def test_exact_dedup(spark):
    rows = [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "aaa"), (5, "ccc")]
    df = spark.createDataFrame(rows, ["id", "content"])
    groups = {r.sha256: (r.n_docs, r.rep_id, r.members) for r in exact_dup_groups(df).collect()}
    assert len(groups) == 1
    (n, rep, members) = next(iter(groups.values()))
    assert (n, rep, members) == (3, 1, [1, 3, 4])
    uniques, pairs = dedup_exact(df)
    assert sorted(r.id for r in uniques.collect()) == [1, 2, 5]
    assert {(r.a, r.b) for r in pairs.collect()} == {(1, 3), (1, 4)}
    assert all(r.jaccard == 1.0 for r in pairs.collect())


def test_lsh_candidates_find_identical_sets(spark):
    cfg = PipelineConfig(num_perms=32, bands=8, rows_per_band=4, bucket_cap=16)
    items = [
        (1, [10, 20, 30, 40, 50]),
        (2, [10, 20, 30, 40, 50]),     # identical -> must be candidate
        (3, [10, 20, 30, 40, 99]),     # J=2/3 -> likely candidate
        (4, [1000, 2000, 3000, 4000]), # unrelated
    ]
    df = spark.createDataFrame(items, ["id", "shingle_hashes"])
    signed = minhash_signatures(df, cfg)
    banded = band_hashes(signed, cfg, "id")
    cands = {(r.a, r.b) for r in candidate_pairs(banded, cfg, "id").collect()}
    assert (1, 2) in cands
    assert (1, 4) not in cands and (2, 4) not in cands
    assert capped_docs(banded, cfg, "id") == 0


def test_lsh_salt_mode_bounds_pairs(spark):
    """Salting splits an oversized bucket into sub-buckets: every member
    still participates, pair count shrinks ~s-fold, small buckets intact."""
    cfg = PipelineConfig(num_perms=32, bands=8, rows_per_band=4, bucket_cap=8, salt_buckets=4)
    same = [20, 21, 22, 23, 24]
    rows = [(i, same) for i in range(100)]          # one giant bucket per band
    rows += [(1000, [7, 8, 9]), (1001, [7, 8, 9])]  # small bucket must survive
    df = spark.createDataFrame(rows, ["id", "shingle_hashes"])
    banded = band_hashes(minhash_signatures(df, cfg), cfg, "id")
    cands = candidate_pairs(banded, cfg, "id", skew_mode="salt")
    pairs = {(r.a, r.b) for r in cands.collect()}
    assert (1000, 1001) in pairs
    giant = [p for p in pairs if p[0] < 1000]
    # unsalted would be C(100,2) = 4950; 4 salts -> ~4 * C(25,2) = 1200
    assert 800 < len(giant) < 2500
    participants = {x for p in giant for x in p}
    assert len(participants) == 100  # nobody dropped (unlike cap mode)


def test_lsh_auto_mode_grades_by_bucket_size(spark):
    """Auto skew mode: small buckets untouched; mid-size (boilerplate) buckets
    dynamically salted — EVERY member keeps participating and the pair graph
    stays connected (cap mode would drop docs 9..99 from all bands entirely);
    pathological buckets (> salt_threshold) fall back to the cap."""
    from sycl_jaccard_spark.operators.components import connected_components

    cfg = PipelineConfig(
        num_perms=32, bands=8, rows_per_band=4, bucket_cap=8, salt_threshold=500
    )
    same = [20, 21, 22, 23, 24]
    rows = [(i, same) for i in range(100)]          # one 100-member bucket per band
    rows += [(1000, [7, 8, 9]), (1001, [7, 8, 9])]  # small bucket must survive
    df = spark.createDataFrame(rows, ["id", "shingle_hashes"])
    banded = band_hashes(minhash_signatures(df, cfg), cfg, "id")

    # cap mode measurably loses members: only the 8 lowest ids ever pair up
    cap_pairs = {
        (r.a, r.b)
        for r in candidate_pairs(banded, cfg, "id", skew_mode="cap").collect()
    }
    cap_participants = {x for p in cap_pairs if p[0] < 1000 for x in p}
    assert cap_participants == set(range(8))

    auto_pairs = {
        (r.a, r.b)
        for r in candidate_pairs(banded, cfg, "id", skew_mode="auto").collect()
    }
    assert (1000, 1001) in auto_pairs
    giant = [p for p in auto_pairs if p[0] < 1000]
    participants = {x for p in giant for x in p}
    assert len(participants) == 100          # nobody dropped
    assert len(giant) < 4950 / 2             # pair cost well below quadratic
    # the salted sub-cliques overlap across bands: CC reunites the bucket
    edges = spark.createDataFrame(sorted(giant), ["a", "b"])
    labels = connected_components(edges)
    assert labels.select("label").distinct().count() == 1

    # pathological leg: salt_threshold below the bucket size -> cap behavior
    cfg_patho = PipelineConfig(
        num_perms=32, bands=8, rows_per_band=4, bucket_cap=8, salt_threshold=50
    )
    patho_pairs = {
        (r.a, r.b)
        for r in candidate_pairs(banded, cfg_patho, "id", skew_mode="auto").collect()
    }
    patho_participants = {x for p in patho_pairs if p[0] < 1000 for x in p}
    assert patho_participants == set(range(8))


def test_pipeline_checkpoint_config_mismatch_invalidates(spark, tmp_path):
    """A checkpoint written under one config must not be resumed under
    another (stage schemas differ — e.g. the shingles stage carries `content`
    only when the substring pass is on): the recorded config fingerprint
    invalidates stale stages instead of resuming into a missing-column
    error."""
    files, _ = synth_source_files(spark, CorpusSpec(n_files=40, n_clusters=5))
    files = with_file_id(files)
    ckpt = str(tmp_path / "ckpt")
    p1 = DedupPipeline(spark, checkpoint_dir=ckpt, enable_substring=False)
    p1.run(files)
    # same config resumes; changed config rewrites (and must not crash)
    p2 = DedupPipeline(spark, checkpoint_dir=ckpt, enable_substring=True)
    r2 = p2.run(files)
    assert not any(m["resumed"] for m in p2.metrics)
    assert r2.clusters.count() == 40
    # and the rewritten checkpoint resumes under the new config
    p3 = DedupPipeline(spark, checkpoint_dir=ckpt, enable_substring=True)
    p3.run(files)
    assert any(m["resumed"] for m in p3.metrics)


def test_lsh_bucket_cap_bounds_pairs(spark):
    """Skew fixture (FIXTURES.md §4): one degenerate bucket; cap bounds the
    self-join and the drop count is observable."""
    cfg = PipelineConfig(num_perms=32, bands=8, rows_per_band=4, bucket_cap=8)
    same = [20, 21, 22, 23, 24]
    df = spark.createDataFrame([(i, same) for i in range(100)], ["id", "shingle_hashes"])
    banded = band_hashes(minhash_signatures(df, cfg), cfg, "id")
    cands = candidate_pairs(banded, cfg, "id")
    # each of the 8 identical buckets holds the same lowest-8 ids after cap
    assert cands.count() == 8 * 7 / 2
    assert capped_docs(banded, cfg, "id") == 8 * (100 - 8)


@pytest.mark.parametrize("driver_threshold", [0, 2_000_000])
@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (4, 5)],
        [(i, i + 1) for i in range(30)],                    # long chain
        [(0, i) for i in range(1, 10)],                     # star
        [(a, b) for a in range(6) for b in range(a + 1, 6)],# clique
        [(10, 2), (2, 30), (30, 4), (100, 200)],            # unsorted ids
    ],
)
def test_connected_components_vs_union_find(spark, edges, driver_threshold):
    """Both paths (driver union-find and distributed star rounds) must match
    the oracle exactly — the dual-implementation consistency discipline."""
    df = spark.createDataFrame(edges, ["a", "b"])
    got = {
        r.node: r.label
        for r in connected_components(df, driver_threshold=driver_threshold).collect()
    }
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    expect = uf.labels()
    assert got == expect


@pytest.mark.parametrize("driver_threshold", [0, 2_000_000])
def test_connected_components_random(spark, driver_threshold):
    rng = random.Random(11)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["a", "b"])
    got = {
        r.node: r.label
        for r in connected_components(df, driver_threshold=driver_threshold).collect()
    }
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    assert got == uf.labels()


def _recall(spark, spec: CorpusSpec, **pipe_kw) -> tuple[float, int]:
    files, truth = synth_source_files(spark, spec)
    files = with_file_id(files)
    key_of = {}
    for r in files.select("repo", "path", "commit", "id").collect():
        key_of[(r.repo, r.path, r.commit)] = r.id
    result = DedupPipeline(spark, PipelineConfig(), **pipe_kw).run(files)
    labels = {r.id: r.cluster for r in result.clusters.collect()}
    expect_pairs = truth_pairs(truth)
    hit = sum(
        1 for (ka, kb) in expect_pairs if labels[key_of[ka]] == labels[key_of[kb]]
    )
    return hit / len(expect_pairs), len(expect_pairs)


def test_pipeline_recall_on_planted_clusters(spark):
    """The headline gate: dup-pair recall >= 0.99 on the planted corpus."""
    recall, n = _recall(spark, CorpusSpec(n_files=200, n_clusters=30, seed=42))
    assert n > 50
    assert recall >= 0.99, f"recall {recall} over {n} pairs"


def test_pipeline_recall_with_boilerplate_skew(spark):
    """Shared license headers (FIXTURES.md §4) must not break recall."""
    spec = CorpusSpec(n_files=150, n_clusters=20, boilerplate_frac=0.6, seed=7)
    recall, n = _recall(spark, spec)
    assert recall >= 0.99, f"recall {recall} over {n} pairs"


def test_pipeline_no_false_merges_of_unrelated(spark):
    """Precision sanity: distinct singletons stay singletons."""
    files, truth = synth_source_files(
        spark, CorpusSpec(n_files=60, n_clusters=0, seed=3)
    )
    files = with_file_id(files)
    result = DedupPipeline(spark, PipelineConfig()).run(files)
    n_clusters = result.clusters.select("cluster").distinct().count()
    assert n_clusters == 60  # every file its own cluster


def test_pipeline_checkpoint_resume(spark, tmp_path):
    files, _ = synth_source_files(spark, CorpusSpec(n_files=80, n_clusters=10))
    files = with_file_id(files)
    ckpt = str(tmp_path / "ckpt")
    p1 = DedupPipeline(spark, checkpoint_dir=ckpt)
    r1 = p1.run(files)
    c1 = {(r.id, r.cluster) for r in r1.clusters.collect()}
    p2 = DedupPipeline(spark, checkpoint_dir=ckpt)
    r2 = p2.run(files)
    c2 = {(r.id, r.cluster) for r in r2.clusters.collect()}
    assert c1 == c2
    assert any(m["resumed"] for m in p2.metrics)
    # sha256 integrity: checkpointed stage preserves content hashes
    sha_ck = spark.read.parquet(f"{ckpt}/stage=exact_dedup")
    orig = files.withColumn("sha", F.sha2("content", 256)).select("id", "sha")
    joined = sha_ck.join(orig, "id")
    assert joined.filter(F.col("sha256") != F.col("sha")).count() == 0


def test_pipeline_checkpoint_lineage_records(spark, tmp_path):
    """Every durable stage writes a _lineage.json (per-partition row
    histogram + upstream edges + config), the north rule's 'per-partition
    lineage and metrics'. The histogram must sum to the stage row count,
    the upstream graph must chain back to ingest, and parquet readers must
    not see the record (underscore-prefixed)."""
    import json as _json

    files, _ = synth_source_files(spark, CorpusSpec(n_files=60, n_clusters=8))
    files = with_file_id(files)
    ckpt = str(tmp_path / "ckpt")
    p = DedupPipeline(spark, checkpoint_dir=ckpt)
    p.run(files)

    recs = {}
    for m in p.metrics:
        name = m["stage"]
        path = tmp_path / "ckpt" / f"stage={name}" / "_lineage.json"
        if name == "connected_components":
            continue  # driver-side stage, no parquet checkpoint
        assert path.exists(), f"missing lineage for {name}"
        rec = _json.loads(path.read_text())
        assert sum(rec["partition_rows"].values()) == rec["rows"] == m["rows"]
        assert rec["n_partitions"] >= 1 or rec["rows"] == 0
        assert rec["config"]["enable_simhash"] is True
        recs[name] = rec

    assert recs["shingles"]["upstream"] == ["exact_dedup"]
    assert recs["verify"]["upstream"] == ["shingles", "minhash"]
    assert recs["clusters"]["upstream"] == ["pair_graph"]
    # parquet read of the stage dir is unaffected by the extra file
    assert spark.read.parquet(f"{ckpt}/stage=clusters").count() == 60


def test_pipeline_unfingerprinted_checkpoint_invalidated(spark, tmp_path):
    """Stage data with NO pipeline_config record (pre-fingerprint layout, or
    a crash before the fingerprint write) must be treated as a config
    mismatch: stages are purged and rewritten, never resumed."""
    import shutil

    files, _ = synth_source_files(spark, CorpusSpec(n_files=50, n_clusters=6))
    files = with_file_id(files)
    ckpt = str(tmp_path / "ckpt")
    p1 = DedupPipeline(spark, checkpoint_dir=ckpt)
    c1 = {(r.id, r.cluster) for r in p1.run(files).clusters.collect()}
    shutil.rmtree(str(tmp_path / "ckpt" / "pipeline_config"))

    p2 = DedupPipeline(spark, checkpoint_dir=ckpt)
    c2 = {(r.id, r.cluster) for r in p2.run(files).clusters.collect()}
    assert c1 == c2
    assert not any(m["resumed"] for m in p2.metrics)  # nothing resumed


def test_pipeline_config_mismatch_purges_stale_stages(spark, tmp_path):
    """A config change must DELETE the old stages, not merely ignore them:
    if a rewrite crashes mid-run, the next run (whose fingerprint now
    matches) would otherwise resume old-config parquet with silently wrong
    signatures."""
    files, _ = synth_source_files(spark, CorpusSpec(n_files=50, n_clusters=6))
    files = with_file_id(files)
    ckpt = str(tmp_path / "ckpt")
    DedupPipeline(spark, PipelineConfig(num_perms=64, bands=16), checkpoint_dir=ckpt).run(files)
    assert (tmp_path / "ckpt" / "stage=minhash" / "_SUCCESS").exists()

    # config B: invalidation happens at _check_checkpoint_config time —
    # BEFORE any stage rewrite — so no stale stage dir survives the purge
    p = DedupPipeline(spark, PipelineConfig(num_perms=32, bands=8), checkpoint_dir=ckpt)
    p._check_checkpoint_config()
    assert not (tmp_path / "ckpt" / "stage=minhash").exists()
    assert not p._resume_ok


def test_containment_floor_blocks_tiny_hub_merge(spark):
    """A tiny stub contained ~1.0 in two UNRELATED large files must not
    transitively merge them: containment acceptance requires the smaller
    side to have >= containment_min_size shingles."""
    big_a = "\n".join(f"alpha{i} = compute_a({i}) + {i * 3}" for i in range(120))
    big_b = "\n".join(f"beta{i} -> transform_b({i}) * {i * 7}" for i in range(120))
    stub = "\n".join(f"alpha{i} = compute_a({i}) + {i * 3}" for i in range(4))
    rows = [(0, big_a), (1, big_b + "\n" + stub)]
    # the stub is literally contained in file 1 and shares its lines with
    # file 0's prefix -> containment vs BOTH, but only ~18 shingles
    rows += [(2, stub)]
    files = spark.createDataFrame(rows, ["id", "content"])
    res = DedupPipeline(
        spark, PipelineConfig(bucket_cap=10**9), enable_simhash=True, enable_substring=True
    ).run(files)
    lab = {r.id: r.cluster for r in res.clusters.collect()}
    assert lab[0] != lab[1], "tiny hub must not glue unrelated files"


def test_capped_docs_is_skew_mode_aware(spark):
    """The drop counter grades buckets by the SAME policy as candidate_pairs:
    salt/auto retain members the cap-only counter would report as dropped."""
    from sycl_jaccard_spark.operators.lsh import capped_docs

    # one 12-member bucket, cap 4, salt_threshold 100
    banded = spark.createDataFrame(
        [(i, 0, 7) for i in range(12)], "id long, band int, band_hash long"
    )
    cfg = PipelineConfig(bucket_cap=4, salt_threshold=100)
    assert capped_docs(banded, cfg, skew_mode="cap") == 8
    assert capped_docs(banded, cfg, skew_mode="salt") == 0
    assert capped_docs(banded, cfg, skew_mode="auto") == 0  # salted band: kept
    tiny = PipelineConfig(bucket_cap=4, salt_threshold=8)
    assert capped_docs(banded, tiny, skew_mode="auto") == 8  # pathological: capped


def test_candidate_pass_stats_attribution(spark):
    """Pass attribution over the unified banded relation: band-id ranges map
    to lsh/simhash/substring, raw_pairs is the exact sum of C(sz, 2)."""
    from sycl_jaccard_spark.operators.lsh import candidate_pass_stats

    cfg = PipelineConfig(bands=4, num_perms=16, rows_per_band=4)
    rows = (
        [(i, 0, 5) for i in range(3)]        # lsh bucket of 3 -> 3 pairs
        + [(9, 2, 6)]                        # lsh singleton
        + [(i, 4, 7) for i in range(2)]      # simhash bucket of 2 -> 1 pair
        + [(i, 4 + 20, 8) for i in range(4)] # substring bucket of 4 -> 6 pairs
    )
    banded = spark.createDataFrame(rows, "id long, band int, band_hash long")
    got = {
        r["pass"]: (r.memberships, r.buckets, r.multi_buckets, r.raw_pairs)
        for r in candidate_pass_stats(banded, cfg, n_sim_tables=20).collect()
    }
    assert got == {
        "lsh": (4, 2, 1, 3),
        "simhash": (2, 1, 1, 1),
        "substring": (4, 1, 1, 6),
    }


def test_deduplicate_corpus_strategies(spark):
    """Representative selection + manifest: longest keeps the fullest
    variant (ties -> min id), min_id keeps the label, kept rows partition
    the corpus exactly."""
    from sycl_jaccard_spark.operators.representatives import deduplicate_corpus

    files = spark.createDataFrame(
        [
            (1, "short"), (2, "the longest variant here"), (3, "middle one"),
            (10, "solo"),
            (20, "tie"), (21, "pie"),  # equal lengths -> min id wins
        ],
        ["id", "content"],
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (20, 20), (21, 20)], ["id", "cluster"]
    )
    kept, manifest = deduplicate_corpus(files, clusters, strategy="longest")
    m = {r.id: (r.rep_id, r.kept) for r in manifest.collect()}
    assert m == {1: (2, 0), 2: (2, 1), 3: (2, 0), 10: (10, 1), 20: (20, 1), 21: (20, 0)}
    assert {r.id for r in kept.collect()} == {2, 10, 20}

    kept2, manifest2 = deduplicate_corpus(files, clusters, strategy="min_id")
    assert {r.id for r in kept2.collect()} == {1, 10, 20}
    # manifest covers every input row exactly once under both strategies
    assert manifest.count() == manifest2.count() == 6


def test_idf_weighted_candidates_boilerplate_robust(spark):
    """IDF weighting makes dedup boilerplate-robust: two files sharing only
    a big license header (unweighted J ~0.75 -> always a candidate) get a
    LOW weighted Jaccard and drop out of the candidate set, while true
    near-dups (shared rare body) stay in."""
    from sycl_jaccard_spark.functions.shingles import shingle_hashes, shingles, tokens
    from sycl_jaccard_spark.operators.weighted_dedup import (
        idf_weighted_candidates,
        idf_weights,
    )

    header = " ".join(f"license word{i} reserved" for i in range(40))
    body_a = " ".join(f"alpha{i} compute{i * 3}" for i in range(12))
    body_b = " ".join(f"beta{i} transform{i * 7}" for i in range(12))
    body_c = " ".join(f"gamma{i} reduce{i * 11}" for i in range(40))
    rows = (
        # 1, 2: header-only overlap (distinct small bodies)
        [(1, f"{header} {body_a}"), (2, f"{header} {body_b}")]
        # 3, 4: true near-dups: same big RARE body, no header
        + [(3, body_c), (4, body_c + " extra tail9")]
        # background corpus so the header's document frequency is HIGH
        + [(10 + i, f"{header} unique{i} filler{i * 13}") for i in range(10)]
    )
    files = spark.createDataFrame(rows, ["id", "content"])
    shingled = files.select(
        "id", shingle_hashes(shingles(tokens(F.col("content")), 3)).alias("shingle_hashes")
    )
    cfg = PipelineConfig(num_perms=32, bands=8, rows_per_band=4, bucket_cap=10**9)
    cands = {(r.a, r.b) for r in idf_weighted_candidates(shingled, cfg).collect()}
    assert (3, 4) in cands, "true near-dup must stay a candidate"
    assert (1, 2) not in cands, "header-only pair must drop out under IDF"

    # and the IDF itself orders as designed: boilerplate << rare shingles
    idf = {r.elem: r.w for r in idf_weights(shingled).collect()}
    sh = {r.id: set(r.shingle_hashes) for r in shingled.collect()}
    header_shingles = sh[1] & sh[2] & sh[10]
    rare_shingles = sh[3] - sh[1] - sh[2]
    import statistics

    assert statistics.mean(idf[e] for e in header_shingles) < statistics.mean(
        idf[e] for e in rare_shingles
    )


def _boilerplate_corpus(spark, n_background=60, n_pairs=12, seed=3):
    """Corpus where a large shared license header dominates small distinct
    bodies: unweighted shingle-Jaccard of two UNRELATED files is ~0.72 (above
    the 0.7 default threshold — false merges), while planted near-dup pairs
    share a rare body. Returns (files_df, planted_pairs)."""
    rng = random.Random(seed)
    header = " ".join(f"license clause{i} reserved notice{i % 7}" for i in range(75))
    rows, planted = [], set()
    fid = 0
    for p in range(n_pairs):
        body = " ".join(f"pairbody{p}_{i} op{rng.randint(0, 9)}" for i in range(30))
        rows.append((fid, f"{header} {body}"))
        rows.append((fid + 1, f"{header} {body} tail{p} extra"))
        planted.add((fid, fid + 1))
        fid += 2
    for b in range(n_background):
        body = " ".join(f"uniq{b}_{i} fn{rng.randint(0, 999)}" for i in range(15))
        rows.append((fid, f"{header} {body}"))
        fid += 1
    return spark.createDataFrame(rows, ["id", "content"]), planted


def _cluster_pairs(clusters_df):
    by_c: dict[int, list[int]] = {}
    for r in clusters_df.collect():
        by_c.setdefault(r.cluster, []).append(r.id)
    out = set()
    for ms in by_c.values():
        ms = sorted(ms)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                out.add((ms[i], ms[j]))
    return out


def test_weighted_pipeline_mode_boilerplate_recall_gate(spark):
    """The promoted DedupPipeline weighted mode (candidate_weights="idf"):
    on a boilerplate-dominated corpus the UNWEIGHTED pipeline at the default
    threshold falsely merges unrelated files (header J ~0.72 > 0.7) while the
    weighted mode keeps pairwise recall AND precision at 1.0 vs planted truth
    — the end-to-end gate VERDICT r3 asked for (reference weighted pipeline,
    main.cpp:211-275, standalone_algorithms.hpp:109-124)."""
    files, planted = _boilerplate_corpus(spark)
    cfg_w = PipelineConfig(candidate_weights="idf")
    res_w = DedupPipeline(spark, cfg_w, enable_simhash=True, count_rows=False).run(files)
    pred_w = _cluster_pairs(res_w.clusters)
    assert planted <= pred_w, f"weighted recall < 1: missing {planted - pred_w}"
    assert pred_w == planted, f"weighted false merges: {sorted(pred_w - planted)[:5]}"

    # the unweighted twin at the SAME threshold demonstrably over-merges
    res_u = DedupPipeline(
        spark, PipelineConfig(), enable_simhash=True, count_rows=False
    ).run(files)
    pred_u = _cluster_pairs(res_u.clusters)
    assert pred_u - planted, "corpus no longer discriminates: unweighted had no false merges"


def test_weighted_pipeline_checkpoint_resume(spark, tmp_path):
    """Weighted stages (idf, CWS minhash) checkpoint and resume like the
    unweighted ones, and a config flip (weighted <-> unweighted) purges the
    stale stages instead of resuming them."""
    files, planted = _boilerplate_corpus(spark, n_background=20, n_pairs=4)
    ckpt = str(tmp_path / "ckpt")
    cfg = PipelineConfig(candidate_weights="idf")
    r1 = DedupPipeline(spark, cfg, checkpoint_dir=ckpt, enable_simhash=False).run(files)
    c1 = {(r.id, r.cluster) for r in r1.clusters.collect()}

    pipe2 = DedupPipeline(spark, cfg, checkpoint_dir=ckpt, enable_simhash=False)
    r2 = pipe2.run(files)
    assert {(r.id, r.cluster) for r in r2.clusters.collect()} == c1
    resumed = {m["stage"] for m in pipe2.metrics if m.get("resumed")}
    assert {"idf", "minhash", "verify"} <= resumed

    # config flip: unweighted rerun must NOT resume the CWS signature stage
    pipe3 = DedupPipeline(
        spark, PipelineConfig(), checkpoint_dir=ckpt, enable_simhash=False
    )
    pipe3.run(files)
    assert not any(m.get("resumed") for m in pipe3.metrics)


def test_idf_weights_n_docs_hint_and_df(spark):
    """idf_weights: the n_docs hint skips the count job but must not change
    the result; df column is the exact document frequency."""
    from sycl_jaccard_spark.operators.weighted_dedup import idf_weights

    rows = [(1, [10, 20, 20]), (2, [10, 30]), (3, [10])]
    sh = spark.createDataFrame(rows, ["id", "shingle_hashes"])
    base = {r.elem: (r.df, r.w) for r in idf_weights(sh).collect()}
    hinted = {r.elem: (r.df, r.w) for r in idf_weights(sh, n_docs=3).collect()}
    assert base == hinted
    assert base[10][0] == 3 and base[20][0] == 1 and base[30][0] == 1
    import math

    assert base[20][1] == pytest.approx(math.log(1 + 3 / 1))
    assert base[10][1] == pytest.approx(math.log(2))


def test_substring_pass_recovers_planted_containment(spark):
    """The planted shifted-containment corpus (small file embedded verbatim
    in a much larger host — symmetric J ≈ 0.15): MinHash+SimHash miss every
    pair by construction; the line-gram substring pass recovers them all, and
    fillers stay singletons (no hub-merge from the containment accept)."""
    from sycl_jaccard_spark.sources.corpus import synth_containment_files

    files, planted = synth_containment_files(spark, n_files=300, pair_frac=0.2, seed=5)
    files = files.localCheckpoint(eager=True)

    res_off = DedupPipeline(
        spark, PipelineConfig(), enable_simhash=True, count_rows=False
    ).run(files)
    lab_off = {r.id: r.cluster for r in res_off.clusters.collect()}
    assert sum(1 for a, b in planted if lab_off[a] == lab_off[b]) == 0

    res_on = DedupPipeline(
        spark, PipelineConfig(), enable_simhash=True, enable_substring=True,
        count_rows=False,
    ).run(files)
    lab_on = {r.id: r.cluster for r in res_on.clusters.collect()}
    assert all(lab_on[a] == lab_on[b] for a, b in planted)
    # precision: only the planted pairs cluster together
    from collections import Counter

    sizes = Counter(Counter(lab_on.values()).values())
    assert sizes[2] == len(planted) and set(sizes) == {1, 2}


def test_connected_components_stats_observability(spark):
    """The stats dict reports which path ran and, for the distributed
    large-star/small-star path, the rounds to convergence — the observability
    the >2M-edge capacity smoke (scripts/cc_capacity_smoke.py) records."""
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["a", "b"])
    s1: dict = {}
    lab1 = {(r.node, r.label) for r in connected_components(pairs, stats=s1).collect()}
    assert s1["path"] == "driver" and s1["n_pairs"] == 3
    s2: dict = {}
    lab2 = {
        (r.node, r.label)
        for r in connected_components(pairs, driver_threshold=0, stats=s2).collect()
    }
    assert s2["path"] == "distributed" and s2["rounds"] >= 1
    assert lab1 == lab2 == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_weighted_mode_with_substring_containment(spark):
    """Weighted mode composes with the substring pass: the containment accept
    rule runs on the UNweighted counts (with_counts rides the weighted verify
    aggregations), so planted containment pairs are recovered under
    candidate_weights="idf" too."""
    from sycl_jaccard_spark.sources.corpus import synth_containment_files

    files, planted = synth_containment_files(spark, n_files=120, pair_frac=0.3, seed=9)
    files = files.localCheckpoint(eager=True)
    cfg = PipelineConfig(candidate_weights="idf")
    res = DedupPipeline(
        spark, cfg, enable_simhash=False, enable_substring=True, count_rows=False
    ).run(files)
    lab = {r.id: r.cluster for r in res.clusters.collect()}
    assert all(lab[a] == lab[b] for a, b in planted)
    # verified pair schema unchanged (a, b, jaccard)
    assert set(res.verified_pairs.columns) == {"a", "b", "jaccard"}


def test_char_mode_catches_minified_duplicates(spark):
    """A formatted/minified pair is invisible to token shingles (every token
    boundary moves) but exact under char shingles — the corpus case
    cfg.shingle_mode='char' exists for (VERDICT r4 #2)."""
    import random

    from sycl_jaccard_spark.sources.corpus import _base_file

    rng = random.Random(5)
    rows = []
    for i in range(12):
        code = "\n".join(_base_file(rng, n_funcs=6))
        minified = " ".join(code.replace(" ", "").split("\n"))
        rows.append((2 * i, code))
        rows.append((2 * i + 1, minified))
    files = spark.createDataFrame(rows, "id long, content string")

    def dup_pairs(mode):
        cfg = PipelineConfig(shingle_mode=mode)
        res = DedupPipeline(spark, cfg, enable_simhash=False).run(files)
        return {
            (r["a"], r["b"]) for r in res.verified_pairs.collect()
        }

    char_pairs = dup_pairs("char")
    token_pairs = dup_pairs("token")
    planted = {(2 * i, 2 * i + 1) for i in range(12)}
    assert planted <= char_pairs, f"char mode missed {planted - char_pairs}"
    assert not (planted & token_pairs), "token mode unexpectedly caught minified pairs"


def test_lcs_verify_rejects_order_blind_containment(spark):
    """The scattered-excerpt corpus (lines cherry-picked from many places in
    a host — shingle containment ≈0.93, no contiguous shared region): the
    count-based rule merges every planted pair (an order-blind false merge
    for a SUBSTRING pass); substring_verify="lcs" re-scores them with the
    exact suffix-array LCS and rejects them all, while the genuinely embedded
    pairs of the containment corpus stay merged (pure refinement)."""
    from sycl_jaccard_spark.sources.corpus import (
        synth_containment_files,
        synth_scattered_files,
    )

    files, planted = synth_scattered_files(spark, n_files=200, pair_frac=0.2, seed=11)
    files = files.localCheckpoint(eager=True)

    res_shingle = DedupPipeline(
        spark, PipelineConfig(), enable_simhash=True, enable_substring=True,
        count_rows=False,
    ).run(files)
    lab_s = {r.id: r.cluster for r in res_shingle.clusters.collect()}
    assert all(lab_s[a] == lab_s[b] for a, b in planted)  # the false merges

    res_lcs = DedupPipeline(
        spark, PipelineConfig(substring_verify="lcs"), enable_simhash=True,
        enable_substring=True, count_rows=False,
    ).run(files)
    lab_l = {r.id: r.cluster for r in res_lcs.clusters.collect()}
    assert sum(1 for a, b in planted if lab_l[a] == lab_l[b]) == 0
    assert len(set(lab_l.values())) == len(lab_l)  # everything singleton

    # refinement, not regression: true shifted-containment pairs (small file
    # embedded VERBATIM in the host) still merge in lcs mode — lcs_frac = 1.0
    cfiles, cplanted = synth_containment_files(spark, n_files=200, pair_frac=0.2, seed=11)
    cfiles = cfiles.localCheckpoint(eager=True)
    res_c = DedupPipeline(
        spark, PipelineConfig(substring_verify="lcs"), enable_simhash=True,
        enable_substring=True, count_rows=False,
    ).run(cfiles)
    lab_c = {r.id: r.cluster for r in res_c.clusters.collect()}
    assert all(lab_c[a] == lab_c[b] for a, b in cplanted)


def test_lcs_verify_config_validation(spark, tmp_path):
    """Unknown substring_verify values are rejected; the delta store refuses
    the lcs mode (it does not persist content to re-score stored sides)."""
    import pytest as _pytest

    from sycl_jaccard_spark.plans.delta import DeltaDedup

    with _pytest.raises(ValueError, match="substring_verify"):
        PipelineConfig(substring_verify="fuzzy")
    with _pytest.raises(ValueError, match="batch-pipeline mode"):
        DeltaDedup(
            spark, str(tmp_path / "store"),
            cfg=PipelineConfig(substring_verify="lcs"), enable_substring=True,
        )
    # harmless when the substring pass is off — the knob is inert by design
    DeltaDedup(spark, str(tmp_path / "store2"), cfg=PipelineConfig(substring_verify="lcs"))


def test_winnow_pass_recovers_rewrapped_containment(spark):
    """Re-wrapped containment (the embedded copy's lines joined 3-per-line in
    the host): token shingles are preserved — exact verify would accept — but
    not one physical line is shared, so the line-gram pass finds ZERO
    candidates; the winnowed-fingerprint pass (substring_pass="winnow",
    whitespace-normalized) recovers every planted pair."""
    from sycl_jaccard_spark.sources.corpus import synth_containment_files

    files, planted = synth_containment_files(
        spark, n_files=200, pair_frac=0.2, seed=7, rewrap=3
    )
    files = files.localCheckpoint(eager=True)

    res_lg = DedupPipeline(
        spark, PipelineConfig(), enable_simhash=True, enable_substring=True,
        count_rows=False,
    ).run(files)
    lab_lg = {r.id: r.cluster for r in res_lg.clusters.collect()}
    assert sum(1 for a, b in planted if lab_lg[a] == lab_lg[b]) == 0

    res_wn = DedupPipeline(
        spark, PipelineConfig(substring_pass="winnow"), enable_simhash=True,
        enable_substring=True, count_rows=False,
    ).run(files)
    lab_wn = {r.id: r.cluster for r in res_wn.clusters.collect()}
    assert all(lab_wn[a] == lab_wn[b] for a, b in planted)
    # precision: only the planted pairs merged
    from collections import Counter

    sizes = Counter(Counter(lab_wn.values()).values())
    assert sizes[2] == len(planted) and set(sizes) == {1, 2}
