"""Graph-operator tests: N1-N5, K3, K4-K6 (both impls), K9 — replayed against
a pure-Python oracle with 1e-9 tolerance (the compareCoords methodology,
/root/reference/compareCoords.cpp:217-227) on hand-built + random graphs.
"""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from sycl_jaccard_spark.operators.graph_jaccard import jaccard_all_edges, nonzero_pair_count
from sycl_jaccard_spark.operators.normalize import (
    canonical_pairs,
    dedup_edges,
    drop_self_loops,
    invert_direction,
    symmetrize,
)
from sycl_jaccard_spark.operators.pair_jaccard import jaccard_pairs
from sycl_jaccard_spark.operators.rowsum import degrees, volumes

TOL = 1e-9

# hand-built graphs (undirected, as canonical pair lists) — FIXTURES.md §2
TRIANGLE = [(0, 1), (1, 2), (0, 2)]
STAR = [(0, i) for i in range(1, 6)]
PATH = [(i, i + 1) for i in range(5)]
CLIQUE4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
TWO_PAIRS = [(0, 1), (2, 3)]


def py_jaccard_edges(undirected_pairs):
    """Oracle: per directed edge, J of neighbor sets."""
    nbrs: dict[int, set[int]] = {}
    for a, b in undirected_pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    out = {}
    for a, b in undirected_pairs:
        for u, v in ((a, b), (b, a)):
            inter = len(nbrs[u] & nbrs[v])
            union = len(nbrs[u]) + len(nbrs[v]) - inter
            out[(u, v)] = inter / union if union else None
    return out


def sym_edges_df(spark, pairs):
    df = spark.createDataFrame(pairs, ["src", "dst"])
    return symmetrize(df)


@pytest.mark.parametrize("pairs", [TRIANGLE, STAR, PATH, CLIQUE4, TWO_PAIRS])
@pytest.mark.parametrize("impl", ["arrays", "exploded"])
def test_jaccard_all_edges_vs_oracle(spark, pairs, impl):
    edges = sym_edges_df(spark, pairs)
    got = {(r.src, r.dst): r.jaccard for r in jaccard_all_edges(edges, impl=impl).collect()}
    expect = py_jaccard_edges(pairs)
    assert set(got) == set(expect)  # zero missing / zero added (compareCoords)
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, abs=TOL), k


def test_jaccard_random_graph_dual_impl_consistency(spark):
    """EC-vs-VC analog (run_proteus.sh): both impls identical on G(n,p)."""
    rng = random.Random(42)
    n = 60
    pairs = [(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.1]
    edges = sym_edges_df(spark, pairs)
    a = {(r.src, r.dst): r.jaccard for r in jaccard_all_edges(edges, impl="arrays").collect()}
    b = {(r.src, r.dst): r.jaccard for r in jaccard_all_edges(edges, impl="exploded").collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=0)  # bit-identical
    expect = py_jaccard_edges(pairs)
    for k, v in expect.items():
        assert a[k] == pytest.approx(v, abs=TOL)


@pytest.mark.parametrize("impl", ["arrays", "exploded"])
def test_weighted_jaccard_vs_oracle(spark, impl):
    """Weighted J = Wi/(vol_a+vol_b-Wi) with per-vertex weights, BOTH kernels
    (standalone_algorithms.hpp:52-69; the reference runs weighted EC and VC,
    jaccard.cpp:990-1119)."""
    pairs = CLIQUE4 + [(3, 4), (4, 5)]
    w = {v: 1.0 + 0.5 * v for v in range(6)}
    edges = sym_edges_df(spark, pairs)
    wdf = spark.createDataFrame([(v, wv) for v, wv in w.items()], ["vertex", "w"])
    got = {
        (r.src, r.dst): r.jaccard
        for r in jaccard_all_edges(edges, vertex_weights=wdf, impl=impl).collect()
    }

    nbrs: dict[int, set[int]] = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    for a, b in pairs:
        for u, v in ((a, b), (b, a)):
            wi = sum(w[x] for x in nbrs[u] & nbrs[v])
            ws = sum(w[x] for x in nbrs[u]) + sum(w[x] for x in nbrs[v])
            expect = wi / (ws - wi)
            assert got[(u, v)] == pytest.approx(expect, abs=TOL), (u, v)


def test_weighted_random_graph_dual_impl_consistency(spark):
    """Weighted EC-vs-VC parity on G(n,p) with integer-valued weights —
    bit-identical scores (integer-valued doubles stay exact < 2^53 in both
    impls' accumulation orders)."""
    rng = random.Random(7)
    n = 40
    pairs = [(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.15]
    edges = sym_edges_df(spark, pairs)
    wdf = spark.createDataFrame(
        [(v, float(rng.randint(1, 9))) for v in range(n)], ["vertex", "w"]
    )
    a = {
        (r.src, r.dst): r.jaccard
        for r in jaccard_all_edges(edges, vertex_weights=wdf, impl="arrays").collect()
    }
    b = {
        (r.src, r.dst): r.jaccard
        for r in jaccard_all_edges(edges, vertex_weights=wdf, impl="exploded").collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=TOL), k


def test_jaccard_pairs_explicit_list(spark):
    """jaccard_list semantics (standalone_algorithms.hpp:109-133): explicit
    candidate pairs over items with set columns, both impls."""
    items = [
        (1, [1, 2, 3, 4]),
        (2, [3, 4, 5, 6]),
        (3, [1, 2, 3, 4]),
        (4, [100]),
    ]
    cand = [(1, 2), (1, 3), (1, 4), (2, 3)]
    items_df = spark.createDataFrame(items, ["id", "set"])
    pairs_df = spark.createDataFrame(cand, ["a", "b"])
    expect = {}
    sets = {i: set(s) for i, s in items}
    for a, b in cand:
        inter = len(sets[a] & sets[b])
        expect[(a, b)] = inter / (len(sets[a]) + len(sets[b]) - inter)
    for impl in ("arrays", "exploded"):
        got = {(r.a, r.b): r.jaccard for r in jaccard_pairs(items_df, pairs_df, impl=impl).collect()}
        assert set(got) == set(expect)
        for k in expect:
            assert got[k] == pytest.approx(expect[k], abs=TOL), (impl, k)


def test_jaccard_pairs_weighted_explicit_list(spark):
    """Weighted jaccard_list (standalone_algorithms.hpp:109-124): explicit
    pairs over weighted memberships, Jw = W∩ / (vol_a + vol_b − W∩), checked
    against a pure-Python oracle (per-element weights)."""
    from sycl_jaccard_spark.operators.pair_jaccard import jaccard_pairs_weighted

    w_of = {1: 10, 2: 7, 3: 5, 4: 2, 5: 9, 100: 3}
    members = {1: [1, 2, 3, 4], 2: [3, 4, 5], 3: [1, 2, 3, 4], 4: [100]}
    cand = [(1, 2), (1, 3), (1, 4), (2, 3)]
    rows = [(i, e, w_of[e]) for i, es in members.items() for e in es]
    m_df = spark.createDataFrame(rows, ["id", "elem", "w"])
    pairs_df = spark.createDataFrame(cand, ["a", "b"])
    got = {
        (r.a, r.b): (r.wi, r.vol_a, r.vol_b, r.jaccard)
        for r in jaccard_pairs_weighted(m_df, pairs_df).collect()
    }
    assert set(got) == set(cand)
    for a, b in cand:
        wi = sum(w_of[e] for e in set(members[a]) & set(members[b]))
        va = sum(w_of[e] for e in members[a])
        vb = sum(w_of[e] for e in members[b])
        exp_j = wi / (va + vb - wi)
        assert got[(a, b)][0] == wi and got[(a, b)][1] == va and got[(a, b)][2] == vb
        assert got[(a, b)][3] == pytest.approx(exp_j, abs=TOL), (a, b)
    # constant weight 1 degenerates to the unweighted operator
    ones = m_df.withColumn("w", F.lit(1).cast("long"))
    uw_items = spark.createDataFrame(
        [(i, es) for i, es in members.items()], ["id", "set"]
    )
    uw = {(r.a, r.b): r.jaccard for r in jaccard_pairs(uw_items, pairs_df).collect()}
    wd = {(r.a, r.b): r.jaccard for r in jaccard_pairs_weighted(ones, pairs_df).collect()}
    assert uw == wd


def test_normalize_ops(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 1), (3, 4), (3, 4), (4, 3), (5, 6)], ["src", "dst"]
    )
    assert {(r.src, r.dst) for r in invert_direction(edges).collect()} == {
        (2, 1), (1, 2), (1, 1), (4, 3), (3, 4), (6, 5)
    }
    sym = {(r.src, r.dst) for r in symmetrize(edges).collect()}
    assert sym == {(1, 2), (2, 1), (1, 1), (3, 4), (4, 3), (5, 6), (6, 5)}
    canon = {(r.src, r.dst) for r in canonical_pairs(edges).collect()}
    assert canon == {(1, 2), (3, 4), (5, 6)}
    assert (1, 1) not in {(r.src, r.dst) for r in drop_self_loops(edges).collect()}
    assert dedup_edges(edges).count() == 6  # (3,4) dup collapsed


def test_rowsum_k3(spark):
    edges = sym_edges_df(spark, STAR)
    deg = {r.vertex: r.degree for r in degrees(edges).collect()}
    assert deg[0] == 5 and all(deg[i] == 1 for i in range(1, 6))
    wdf = spark.createDataFrame([(v, float(v + 1)) for v in range(6)], ["vertex", "w"])
    vol = {r.vertex: r.volume for r in volumes(edges, wdf).collect()}
    assert vol[0] == pytest.approx(sum(range(2, 7)), abs=TOL)
    assert vol[3] == pytest.approx(1.0, abs=TOL)


def test_nonzero_pair_count_k9(spark):
    edges = sym_edges_df(spark, PATH)
    scored = jaccard_all_edges(edges)
    n = nonzero_pair_count(scored, 1e-5)
    expect = sum(1 for v in py_jaccard_edges(PATH).values() if v and v > 1e-5)
    assert n == expect


def test_jaccard_pairs_weighted_float_weights_not_truncated(spark):
    """ADVICE r3: with float (e.g. IDF) weights the reported wi/vol sums must
    stay double — a long cast would truncate them and report components
    inconsistent with the jaccard they imply."""
    from sycl_jaccard_spark.operators.pair_jaccard import jaccard_pairs_weighted

    rows = [(1, 10, 0.5), (1, 11, 1.25), (2, 10, 0.5), (2, 12, 2.75)]
    m = spark.createDataFrame(rows, ["id", "elem", "w"])
    pairs = spark.createDataFrame([(1, 2)], ["a", "b"])
    out = jaccard_pairs_weighted(m, pairs).collect()[0]
    assert out.wi == pytest.approx(0.5)
    assert out.vol_a == pytest.approx(1.75)
    assert out.vol_b == pytest.approx(3.25)
    assert out.jaccard == pytest.approx(0.5 / (1.75 + 3.25 - 0.5))
    # integral weights keep the long dtype (k5 oracle contract)
    mi = spark.createDataFrame([(1, 10, 3), (2, 10, 3)], ["id", "elem", "w"])
    sch = {f.name: f.dataType.simpleString() for f in jaccard_pairs_weighted(mi, pairs).schema.fields}
    assert sch["wi"] == "bigint" and sch["vol_a"] == "bigint"


def test_jaccard_pairs_weighted_dual_impl_consistency(spark):
    """The array-attach weighted verify (intersect in codegen, explode only
    the intersection) must agree with the exploded hash-probe impl — the
    weighted twin of the EC-vs-VC consistency runs. Float sums may differ in
    summation order, so compare at 1e-12 relative tolerance; integer weights
    must agree exactly."""
    import random as _random

    from sycl_jaccard_spark.operators.pair_jaccard import (
        jaccard_pairs_weighted,
        jaccard_pairs_weighted_arrays,
    )

    rng = _random.Random(13)
    n_items, universe = 40, 120
    members = {
        i: sorted(rng.sample(range(universe), rng.randint(3, 25))) for i in range(n_items)
    }
    w_float = {e: rng.uniform(0.3, 6.0) for e in range(universe)}
    pairs = [(a, b) for a in range(n_items) for b in range(a + 1, n_items) if rng.random() < 0.2]
    items = spark.createDataFrame(
        [(i, es) for i, es in members.items()], ["id", "set"]
    )
    pairs_df = spark.createDataFrame(pairs, ["a", "b"])

    for weights in (w_float, {e: rng.randint(1, 9) for e in range(universe)}):
        idf = spark.createDataFrame(list(weights.items()), ["elem", "w"])
        memberships = spark.createDataFrame(
            [(i, e, weights[e]) for i, es in members.items() for e in es],
            ["id", "elem", "w"],
        )
        for wc in (False, True):
            exp = {
                (r.a, r.b): r.asDict()
                for r in jaccard_pairs_weighted(
                    memberships, pairs_df, with_counts=wc
                ).collect()
            }
            got = {
                (r.a, r.b): r.asDict()
                for r in jaccard_pairs_weighted_arrays(
                    items, idf, pairs_df, with_counts=wc
                ).collect()
            }
            # memberships= / volumes= variants: volumes from a
            # pre-materialized relation instead of a second explode
            # (volumes= — the signature stage's free array aggregate — is
            # the pipeline hot path)
            got_m = {
                (r.a, r.b): r.asDict()
                for r in jaccard_pairs_weighted_arrays(
                    items, idf, pairs_df, with_counts=wc, memberships=memberships
                ).collect()
            }
            vols = spark.createDataFrame(
                [(i, float(sum(weights[e] for e in es))) for i, es in members.items()],
                "id long, vol double",
            )
            got_v = {
                (r.a, r.b): r.asDict()
                for r in jaccard_pairs_weighted_arrays(
                    items, idf, pairs_df, with_counts=wc, volumes=vols
                ).collect()
            }
            assert set(exp) == set(got) == set(got_m) == set(got_v) == set(pairs)
            for k in pairs:
                for col in exp[k]:
                    assert got[k][col] == pytest.approx(exp[k][col], rel=1e-12), (k, col)
                    assert got_m[k][col] == pytest.approx(exp[k][col], rel=1e-12), (k, col)
                    assert got_v[k][col] == pytest.approx(exp[k][col], rel=1e-12), (k, col)


def test_candidate_pairs_uncapped_skips_window_same_pairs(spark):
    """r6: a declared-uncapped bucket_cap (>= UNCAPPED, 10^9) must produce
    the same pair set as a binding-free finite cap, while the plan drops the
    rank window entirely."""
    from sycl_jaccard_spark.config import PipelineConfig
    from sycl_jaccard_spark.operators.lsh import UNCAPPED, candidate_pairs

    rows = [(i, b, (i % 3) + 100 * b) for i in range(12) for b in range(2)]
    banded = spark.createDataFrame(rows, "id long, band int, band_hash long")
    cfg_unc = PipelineConfig(bucket_cap=10**9)
    cfg_fin = PipelineConfig(bucket_cap=64)
    assert cfg_unc.bucket_cap >= UNCAPPED
    pairs_unc = sorted(
        (r["a"], r["b"]) for r in candidate_pairs(banded, cfg_unc, "id").collect()
    )
    pairs_fin = sorted(
        (r["a"], r["b"]) for r in candidate_pairs(banded, cfg_fin, "id").collect()
    )
    assert pairs_unc == pairs_fin and len(pairs_unc) > 0
    plan = candidate_pairs(banded, cfg_unc, "id")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
