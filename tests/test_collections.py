"""Collection-level (fork/mirror) similarity — operators/collections.py.

Pure-Python set oracles per pair (conftest.exact_jaccard), plus the df-cap
fan-out contract: boilerplate elements generate no pairs but still count
toward exact scores.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sycl_jaccard_spark.operators.collections import (
    collection_candidates,
    collection_memberships,
    collection_pair_jaccard,
)
from sycl_jaccard_spark.operators.pair_jaccard import (
    jaccard_pairs,
    jaccard_pairs_memberships,
)
from tests.conftest import exact_jaccard


def _members(spark, data):
    """data: dict collection -> list of member element-lists."""
    rows = [(c, elems) for c, groups in data.items() for elems in groups]
    return spark.createDataFrame(rows, "src string, elems array<string>")


def _scored(spark, data, max_df=10):
    df = collection_pair_jaccard(_members(spark, data), "src", "elems", max_df=max_df)
    return {(r["a"], r["b"]): r for r in df.collect()}


def _sets(data):
    return {c: {e for elems in groups for e in elems} for c, groups in data.items()}


def test_mirror_and_embedded_fork(spark):
    # r2 is an exact mirror of r1 (members sliced differently — union equal);
    # r3 is r1 embedded in a larger repo (containment 1, low jaccard)
    data = {
        "r1": [["a", "b"], ["c", "d"]],
        "r2": [["a", "b", "c"], ["d"]],
        "r3": [["a", "b", "c", "d"], ["e", "f", "g", "h", "i", "j"]],
    }
    got = _scored(spark, data)
    sets = _sets(data)
    assert got[("r1", "r2")]["jaccard"] == 1.0
    assert got[("r1", "r2")]["containment"] == 1.0
    assert got[("r1", "r3")]["containment"] == 1.0
    assert got[("r1", "r3")]["jaccard"] == exact_jaccard(sets["r1"], sets["r3"]) == 0.4
    for (a, b), r in got.items():
        assert r["jaccard"] == exact_jaccard(sets[a], sets[b])
        assert r["inter"] == len(sets[a] & sets[b])
        assert r["size_a"] == len(sets[a]) and r["size_b"] == len(sets[b])


def test_df_cap_prunes_pairs_but_not_scores(spark):
    # 'LICENSE' is in every collection (df 4 > cap 3): alone it must not
    # generate pairs — only r1/r2 share the rare 'x' — but it still counts
    # in r1/r2's exact intersection and sizes.
    data = {
        "r1": [["LICENSE", "x", "p"]],
        "r2": [["LICENSE", "x", "q"]],
        "r3": [["LICENSE", "m"]],
        "r4": [["LICENSE", "n"]],
    }
    got = _scored(spark, data, max_df=3)
    assert set(got) == {("r1", "r2")}
    r = got[("r1", "r2")]
    assert r["inter"] == 2  # LICENSE + x: capped element still scored
    assert r["size_a"] == r["size_b"] == 3
    assert r["jaccard"] == 0.5


def test_memberships_distinct_and_candidates(spark):
    # the same element in many members of ONE collection counts once
    data = {"r1": [["a", "a", "b"], ["a"]], "r2": [["a"]]}
    mem = collection_memberships(_members(spark, data), "src", "elems")
    rows = {(r["collection"], r["elem"]) for r in mem.collect()}
    assert rows == {("r1", "a"), ("r1", "b"), ("r2", "a")}
    cands = collection_candidates(mem, max_df=10).collect()
    assert [(c["a"], c["b"]) for c in cands] == [("r1", "r2")]


def test_collection_minhash_union_closure(spark):
    # minhash(A ∪ B) == elementwise_min(minhash(A), minhash(B)) — the
    # property collection_minhash relies on, bit-for-bit against signing
    # the union directly with the same UDF/seed
    from sycl_jaccard_spark.functions.minhash import minhash_udf
    from sycl_jaccard_spark.operators.collections import collection_minhash

    members = [
        ("r1", [11, 22, 33, 44]),
        ("r1", [33, 55, 77]),
        ("r1", [2, 99]),
        ("r2", [5, 6]),
        ("r2", [7]),
    ]
    perms, seed = 32, 42
    mdf = spark.createDataFrame(members, "src string, hashes array<long>")
    signed = mdf.withColumn("sig", minhash_udf(perms, seed)(F.col("hashes")))
    got = {
        r["collection"]: r["sig"]
        for r in collection_minhash(signed, "src", perms).collect()
    }
    unions = {}
    for c, hs in members:
        unions.setdefault(c, set()).update(hs)
    udf_rows = spark.createDataFrame(
        [(c, sorted(s)) for c, s in unions.items()], "src string, hashes array<long>"
    ).withColumn("sig", minhash_udf(perms, seed)(F.col("hashes"))).collect()
    want = {r["src"]: r["sig"] for r in udf_rows}
    assert got == want


def test_mirror_collections_collide_in_lsh(spark):
    # two sources with identical shingle unions get identical collection
    # signatures -> at least one shared band -> a candidate pair; the
    # disjoint third source never pairs
    from sycl_jaccard_spark.config import PipelineConfig
    from sycl_jaccard_spark.functions.minhash import minhash_udf
    from sycl_jaccard_spark.operators.collections import collection_minhash
    from sycl_jaccard_spark.operators.lsh import band_hashes, candidate_pairs

    cfg = PipelineConfig(num_perms=16, bands=4, rows_per_band=4, bucket_cap=10**9)
    rows = [
        ("m1", list(range(100, 160))),
        ("m1", list(range(160, 200))),
        ("m2", list(range(100, 150))),
        ("m2", list(range(150, 200))),
        ("other", list(range(900, 980))),
    ]
    mdf = spark.createDataFrame(rows, "src string, hashes array<long>")
    signed = mdf.withColumn("sig", minhash_udf(cfg.num_perms, cfg.seed)(F.col("hashes")))
    csig = collection_minhash(signed, "src", cfg.num_perms).localCheckpoint(eager=True)
    banded = band_hashes(csig, cfg, "collection")
    pairs = {(r["a"], r["b"]) for r in candidate_pairs(banded, cfg, "collection").collect()}
    assert pairs == {("m1", "m2")}


def test_collection_clusters_and_drop_action(spark):
    # m1≡m2 and m2~m3 chain into ONE lineage (transitivity) even though
    # m1/m3 alone may score lower; z stays a singleton via the collections
    # arg; drop_fork_members keeps only the rep's files
    from sycl_jaccard_spark.operators.collections import (
        collection_clusters,
        drop_fork_members,
    )

    data = {
        "m1": [["a", "b", "c", "d"]],
        "m2": [["a", "b", "c", "d", "e"]],
        "m3": [["b", "c", "d", "e"]],
        "z": [["q", "r"]],
    }
    scored = collection_pair_jaccard(_members(spark, data), "src", "elems")
    allc = spark.createDataFrame([(c,) for c in data], "src string")
    clusters = collection_clusters(scored, threshold=0.75, collections=allc)
    got = {r["collection"]: r["rep"] for r in clusters.collect()}
    assert got == {"m1": "m1", "m2": "m1", "m3": "m1", "z": "z"}

    members = spark.createDataFrame(
        [("m1", "f1"), ("m2", "f2"), ("m3", "f3"), ("z", "f4"), ("w", "f5")],
        "src string, path string",
    )
    manifest = drop_fork_members(members, clusters, "src")
    keep = {r["path"]: r["keep"] for r in manifest.collect()}
    # w is absent from clusters -> its own rep -> kept
    assert keep == {"f1": True, "f2": False, "f3": False, "f4": True, "f5": True}


def test_run_forks_cli(spark, tmp_path):
    # planted forks: repo f2 mirrors f1 (same files, re-split), f3 disjoint;
    # both candidate modes find the mirror, lineages + manifest agree
    import json as _json

    from jobs.run_forks import main

    body = " ".join(f"tok{i}" for i in range(60))
    other = " ".join(f"alt{i}" for i in range(60))
    rows = [
        ("f1", "a.py", body[:200]),
        ("f1", "b.py", body[200:]),
        ("f2", "x.py", body[:200]),
        ("f2", "y.py", body[200:]),
        ("f3", "z.py", other),
    ]
    src = str(tmp_path / "files")
    spark.createDataFrame(rows, "repo string, path string, content string").write.parquet(src)
    for mode in ("index", "lsh"):
        pairs_out = str(tmp_path / f"pairs_{mode}")
        clusters_out = str(tmp_path / f"clusters_{mode}")
        manifest_out = str(tmp_path / f"manifest_{mode}")
        rc = main([
            "--input", src, "--group-col", "repo", "--shingle-k", "3",
            "--candidates", mode, "--num-perms", "16", "--bands", "4",
            "--threshold", "0.8", "--pairs-out", pairs_out,
            "--clusters-out", clusters_out, "--manifest-out", manifest_out,
        ])
        assert rc == 0
        scored = {(r["a"], r["b"]): r["jaccard"]
                  for r in spark.read.parquet(pairs_out).collect()}
        assert scored.get(("f1", "f2")) == 1.0
        clusters = {r["collection"]: r["rep"]
                    for r in spark.read.parquet(clusters_out).collect()}
        assert clusters == {"f1": "f1", "f2": "f1", "f3": "f3"}
        manifest = spark.read.parquet(manifest_out)
        assert "content" not in manifest.columns
        dropped = {r["path"] for r in manifest.filter("NOT keep").collect()}
        assert dropped == {"x.py", "y.py"}


def test_memberships_core_matches_arrays_impl(spark):
    # jaccard_pairs_memberships is the relational core of impl="exploded";
    # its scores must be identical to the arrays impl on the same pairs
    items = spark.createDataFrame(
        [("u", ["1", "2", "3"]), ("v", ["2", "3", "4"]), ("w", ["9"])],
        "id string, set array<string>",
    )
    pairs = spark.createDataFrame(
        [("u", "v"), ("u", "w")], "a string, b string"
    )
    mem = items.select("id", F.explode("set").alias("elem"))
    via_mem = {
        (r["a"], r["b"]): (r["inter"], r["size_a"], r["size_b"], r["jaccard"])
        for r in jaccard_pairs_memberships(mem, pairs).collect()
    }
    via_arr = {
        (r["a"], r["b"]): (r["inter"], r["size_a"], r["size_b"], r["jaccard"])
        for r in jaccard_pairs(items, pairs, impl="arrays").collect()
    }
    assert via_mem == via_arr
