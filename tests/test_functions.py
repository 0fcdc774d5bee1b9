"""Unit tests for functions/: shingles, portable hash, jaccard exprs,
minhash, simhash, textstats."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sycl_jaccard_spark.functions.jaccard import jaccard_of_arrays
from sycl_jaccard_spark.functions.minhash import MERSENNE, make_perms, minhash_batch, minhash_udf
from sycl_jaccard_spark.functions.shingles import md5_long, shingle_hashes, shingles, tokens
from sycl_jaccard_spark.functions.simhash import simhash_batch
from sycl_jaccard_spark.functions import textstats


def py_md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_shingles(text: str, k: int) -> set[str]:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_md5_long_matches_python(spark):
    rows = [("hello world",), ("",), ("ünïcode ok",)]
    df = spark.createDataFrame(rows, ["t"])
    got = {r.t: r.h for r in df.select("t", md5_long("t").alias("h")).collect()}
    for (t,) in rows:
        assert got[t] == py_md5_long(t)


def test_shingles_match_python_oracle(spark):
    texts = [
        "a b c d e f g",
        "a a a a a",
        "one two",          # shorter than k
        "  padded   spacing\tweird  ",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    out = df.select("t", shingles(tokens(F.col("t")), 3).alias("sh")).collect()
    for row in out:
        expect = py_shingles(" ".join(row.t.split()), 3)
        assert set(row.sh) == expect
        assert row.sh == sorted(set(row.sh))  # sorted, distinct


def test_shingle_hashes_portable(spark):
    df = spark.createDataFrame([("x y z w v",)], ["t"])
    row = df.select(
        shingle_hashes(shingles(tokens(F.col("t")), 3), portable=True).alias("h")
    ).collect()[0]
    expect = sorted({py_md5_long(s) for s in py_shingles("x y z w v", 3)})
    assert row.h == expect


def test_jaccard_of_arrays_k6_semantics(spark):
    df = spark.createDataFrame(
        [(list("abcd"), list("cdef")), (list("ab"), list("ab")), (["x"], ["y"])],
        ["a", "b"],
    )
    got = [r.j for r in df.select(jaccard_of_arrays(F.col("a"), F.col("b")).alias("j")).collect()]
    # |{c,d}| / (4+4-2) = 2/6
    assert got[0] == pytest.approx(2 / 6, abs=1e-12)
    assert got[1] == 1.0
    assert got[2] == 0.0


def test_minhash_deterministic_and_bounded():
    a, b = make_perms(16, seed=42)
    sig1 = minhash_batch(pd.Series([[1, 2, 3], []]), a, b)
    sig2 = minhash_batch(pd.Series([[1, 2, 3], []]), a, b)
    assert list(sig1[0]) == list(sig2[0])
    assert all(0 <= v < MERSENNE for v in sig1[0])
    assert list(sig1[1]) == [MERSENNE] * 16  # empty set sentinel


def test_minhash_estimates_jaccard():
    """MinHash collision rate ≈ exact Jaccard (statistical, fixed seed)."""
    a, b = make_perms(256, seed=42)
    rng = np.random.default_rng(7)
    s1 = set(rng.integers(0, 1 << 32, 300).tolist())
    s2 = set(list(s1)[:200]) | set(rng.integers(0, 1 << 32, 100).tolist())
    sigs = minhash_batch(pd.Series([list(s1), list(s2)]), a, b)
    est = np.mean(np.array(sigs[0]) == np.array(sigs[1]))
    exact = len(s1 & s2) / len(s1 | s2)
    assert abs(est - exact) < 0.1


def test_minhash_udf_in_spark(spark):
    df = spark.createDataFrame([(1, [10, 20, 30]), (2, [10, 20, 30]), (3, [99])], ["id", "h"])
    out = df.select("id", minhash_udf(32, 42)(F.col("h")).alias("sig")).collect()
    by_id = {r.id: r.sig for r in out}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[3]
    a, b = make_perms(32, 42)
    assert by_id[1] == list(minhash_batch(pd.Series([[10, 20, 30]]), a, b)[0])


def test_simhash_similarity_property():
    rng = np.random.default_rng(3)
    base = rng.integers(0, 1 << 63, 200).tolist()
    near = base[:-5] + rng.integers(0, 1 << 63, 5).tolist()
    far = rng.integers(0, 1 << 63, 200).tolist()
    h = simhash_batch(pd.Series([base, near, far]))
    d_near = bin((int(h[0]) ^ int(h[1])) & ((1 << 64) - 1)).count("1")
    d_far = bin((int(h[0]) ^ int(h[2])) & ((1 << 64) - 1)).count("1")
    assert d_near < d_far


def test_textstats_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame([("a b c",), ("c b a",), ("a b c",)], ["t"])
    fps = [r.fp for r in df.select(textstats.fingerprint(F.col("t")).alias("fp")).collect()]
    assert fps[0] == fps[2]
    assert fps[0] != fps[1]


def test_lang_id_votes(spark):
    df = spark.createDataFrame(
        [("the cat and the dog is here",), ("el que de la los y en",), ("zzz qqq",)], ["t"]
    )
    out = [r.l for r in df.select(textstats.lang_id(F.col("t")).alias("l")).collect()]
    assert out == ["en", "es", "und"]


def test_simhash_combinatorial_band_keys(spark):
    """Manku-style block tables: Hamming<=3 pairs share >=1 of the C(6,3)=20
    keys; a pair with 4 flips spread over 4 distinct blocks shares none."""
    from pyspark.sql import functions as F

    from sycl_jaccard_spark.functions.simhash import _block_bounds, simhash_band_keys

    base = 0x0123456789ABCDEF
    bounds = _block_bounds(6, 64)
    # 3 flips inside one block -> within Hamming 3
    near = base ^ (0b111 << bounds[2][0])
    # 4 flips in 4 distinct blocks -> every 3-block combo hits >=1 flip
    far = base
    for off, _size in bounds[:4]:
        far ^= 1 << off

    df = spark.createDataFrame([(0, base), (1, near), (2, far)], ["id", "sim"])
    keys = df.select("id", *simhash_band_keys(F.col("sim"), blocks=6, max_hamming=3))
    rows = {r["id"]: [r[c] for c in keys.columns[1:]] for r in keys.collect()}
    assert len(keys.columns) == 1 + 20
    shared_near = sum(1 for a, b in zip(rows[0], rows[1]) if a == b)
    shared_far = sum(1 for a, b in zip(rows[0], rows[2]) if a == b)
    assert shared_near >= 1      # pigeonhole guarantee
    assert shared_far == 0


def test_weighted_minhash_cws(spark):
    """Consistent Weighted Sampling: (1) slot-collision rate estimates the
    exact weighted Jaccard (Ioffe 2010 — the probability statement itself);
    (2) deterministic across runs; (3) the signature column bands with the
    EXISTING LSH machinery, so weighted near-dup candidates come from the
    same bucket join the unweighted path uses."""
    import numpy as np
    import pandas as pd

    from sycl_jaccard_spark.config import PipelineConfig
    from sycl_jaccard_spark.functions.weighted_minhash import cws_batch, weighted_minhash_udf
    from sycl_jaccard_spark.operators.lsh import band_hashes, candidate_pairs

    rng = np.random.default_rng(5)
    shared = {int(e): float(rng.uniform(0.5, 3.0)) for e in range(100, 140)}
    only_a = {int(e): float(rng.uniform(0.5, 3.0)) for e in range(200, 210)}
    only_b = {int(e): float(rng.uniform(0.5, 3.0)) for e in range(300, 310)}
    wa = {**shared, **only_a}
    wb = {**shared, **only_b}
    inter = sum(min(wa[e], wb[e]) for e in set(wa) & set(wb))
    union = sum(max(wa.get(e, 0.0), wb.get(e, 0.0)) for e in set(wa) | set(wb))
    exact = inter / union

    P = 256
    sigs = cws_batch(
        pd.Series([list(wa.keys()), list(wb.keys())]),
        pd.Series([list(wa.values()), list(wb.values())]),
        P, seed=42,
    )
    est = sum(1 for x, y in zip(sigs[0], sigs[1]) if x == y) / P
    assert abs(est - exact) < 0.12  # ~4 sigma at P=256
    assert list(sigs[0]) == list(
        cws_batch(pd.Series([list(wa.keys())]), pd.Series([list(wa.values())]), P, 42)[0]
    )

    # Spark path: weighted docs -> CWS sigs -> band_hashes -> candidate_pairs.
    # High-Jw pairs (planted twins, Jw ~0.8) must bucket together; the
    # disjoint-weight doc must not pair with anything.
    docs = [
        (1, list(wa.keys()), list(wa.values())),
        (2, list(wb.keys()), list(wb.values())),
        (3, list(only_b.keys()), list(only_b.values())),  # disjoint from 1
    ]
    df = spark.createDataFrame(docs, "id long, elems array<long>, weights array<double>")
    cfg = PipelineConfig(num_perms=32, bands=8, rows_per_band=4, bucket_cap=10**9)
    signed = df.select(
        "id", weighted_minhash_udf(32, seed=42)(F.col("elems"), F.col("weights")).alias("sig")
    ).localCheckpoint(eager=True)
    cands = {(r.a, r.b) for r in candidate_pairs(band_hashes(signed, cfg), cfg).collect()}
    assert (1, 2) in cands      # Jw ~0.8 -> shares a band w.h.p.
    assert (1, 3) not in cands  # Jw = 0


def test_weighted_fused_udf_bit_equality(spark):
    """weighted_minhash_simhash_udf must be bit-identical to the standalone
    CWS and SimHash UDFs (the weighted twin of the unweighted fusion gate)."""
    from pyspark.sql import functions as F

    from sycl_jaccard_spark.functions.simhash import simhash_udf
    from sycl_jaccard_spark.functions.weighted_minhash import (
        weighted_minhash_simhash_udf,
        weighted_minhash_udf,
    )

    rows = [
        (1, [10, 20, 30], [0.7, 2.0, 5.5]),
        (2, [10, 40], [0.7, 3.3]),
        (3, [], []),
    ]
    df = spark.createDataFrame(rows, "id long, elems array<long>, weights array<double>")
    fused = df.select(
        "id", weighted_minhash_simhash_udf(32, 7)(F.col("elems"), F.col("weights")).alias("ms")
    ).select("id", F.col("ms.sig").alias("sig"), F.col("ms.sim").alias("sim")).collect()
    sig_alone = df.select(
        "id", weighted_minhash_udf(32, 7)(F.col("elems"), F.col("weights")).alias("sig")
    ).collect()
    sim_alone = df.select("id", simhash_udf(F.col("elems")).alias("sim")).collect()
    assert {r.id: r.sig for r in fused} == {r.id: r.sig for r in sig_alone}
    assert {r.id: r.sim for r in fused} == {r.id: r.sim for r in sim_alone}


# ---- char-shingle mode (cfg.shingle_mode="char") ----

_FORMATTED = "\n".join(
    [
        "def compute_total ( items , rate ) :",
        "    total = 0",
        "    for item in items :",
        "        total = total + item * rate",
        "    return total",
        "def apply_discount ( price , pct ) :",
        "    value = price - price * pct",
        "    return value",
    ]
)
# same code after whitespace mangling: indentation gone, single-space joins —
# every token boundary shifts, so token shingles share almost nothing
_MINIFIED = " ".join(_FORMATTED.replace(" ", "").split("\n"))


def test_char_shingles_survive_whitespace_mangling(spark):
    from sycl_jaccard_spark.config import PipelineConfig
    from sycl_jaccard_spark.functions.shingles import doc_shingle_hashes

    df = spark.createDataFrame(
        [(1, _FORMATTED), (2, _MINIFIED)], "id long, content string"
    )
    for mode, expect in (("char", 1.0), ("token", 0.2)):
        cfg = PipelineConfig(shingle_mode=mode)
        rows = {
            r["id"]: set(r["sh"])
            for r in df.select(
                "id", doc_shingle_hashes(F.col("content"), cfg).alias("sh")
            ).collect()
        }
        a, b = rows[1], rows[2]
        j = len(a & b) / len(a | b)
        if mode == "char":
            # whitespace is stripped before gramming: identical sets
            assert j == expect, f"char-mode J={j}"
        else:
            assert j < expect, f"token-mode J={j} unexpectedly high"


def test_char_shingle_stride_samples(spark):
    from sycl_jaccard_spark.functions.shingles import char_shingle_hashes

    text = "abcdefghij" * 10  # 100 chars
    df = spark.createDataFrame([(text,)], "t string")
    n1 = len(df.select(char_shingle_hashes(F.col("t"), 10, stride=1).alias("g")).first()["g"])
    n5 = len(df.select(char_shingle_hashes(F.col("t"), 10, stride=5).alias("g")).first()["g"])
    # periodic text: 100-10+1=91 start offsets but only 10 distinct grams at
    # stride 1, and ceil(91/5)=19 starts -> <=10 distinct at stride 5
    assert n1 == 10
    assert 0 < n5 <= 10


def test_short_text_char_shingles(spark):
    from sycl_jaccard_spark.config import PipelineConfig
    from sycl_jaccard_spark.functions.shingles import doc_shingle_hashes

    cfg = PipelineConfig(shingle_mode="char")
    df = spark.createDataFrame([(1, "tiny"), (2, "")], "id long, content string")
    rows = {
        r["id"]: r["sh"]
        for r in df.select(
            "id", doc_shingle_hashes(F.col("content"), cfg).alias("sh")
        ).collect()
    }
    assert len(rows[1]) == 1  # whole text as one gram
    assert rows[2] is not None  # empty text must not error


def test_config_rejects_unknown_shingle_mode():
    from sycl_jaccard_spark.config import PipelineConfig

    with pytest.raises(ValueError, match="shingle_mode"):
        PipelineConfig(shingle_mode="word")


def _winnow_py(text: str, k: int, w: int) -> set[int]:
    """Independent pure-Python winnowing oracle (portable md5-60bit hash)."""
    import re

    t = re.sub(r"\s+", " ", text.strip(" "))
    if len(t) >= k:
        grams = [
            int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:15], 16)
            for i in range(len(t) - k + 1)
        ]
    else:
        grams = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16)]
    if len(grams) >= w:
        return {min(grams[j : j + w]) for j in range(len(grams) - w + 1)}
    return {min(grams)}


def test_winnow_hashes_matches_python_oracle(spark):
    """Winnowed fingerprints (MOSS/Schleimer SIGMOD'03): the full
    normalize -> char-gram-hash -> sliding-window-min chain agrees with an
    independent pure-Python implementation, including the short-text arms."""
    from sycl_jaccard_spark.functions.shingles import winnow_hashes

    texts = [
        "def f(x):\n    return x + 1\n\n\ndef g(y):\n\treturn y * 2\n",
        "  leading and trailing   ",
        "tiny",
        "",
        "x" * 200,
        "\n".join(f"line_{i} = compute({i})" for i in range(40)),
    ]
    k, w = 8, 5
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    rows = df.select(
        "i", winnow_hashes(F.col("t"), k, w, portable=True).alias("fps")
    ).collect()
    for r in rows:
        assert set(r["fps"]) == _winnow_py(texts[r["i"]], k, w), texts[r["i"]][:30]
        assert r["fps"] == sorted(set(r["fps"]))  # distinct + sorted


def test_winnow_guarantee_shared_run_fires(spark):
    """The winnowing guarantee: two texts sharing a normalized run of
    >= w + k - 1 chars share at least one fingerprint — REGARDLESS of where
    line breaks fall (the case that zeroes out line grams)."""
    from sycl_jaccard_spark.functions.shingles import winnow_hashes

    k, w = 8, 5
    shared_lines = [f"common_{i} = shared({i})" for i in range(4)]
    a = "\n".join(["prefix_a = 1"] + shared_lines + ["suffix_a = 2"])
    # same logical content, re-wrapped onto ONE physical line inside b
    b = "other_b = 9\n" + " ".join(shared_lines) + "\nmore_b = 8"
    assert len(" ".join(shared_lines)) >= w + k - 1
    df = spark.createDataFrame([(0, a), (1, b), (2, "unrelated = 0")], ["i", "t"])
    fps = {
        r["i"]: set(r["fps"])
        for r in df.select(
            "i", winnow_hashes(F.col("t"), k, w).alias("fps")
        ).collect()
    }
    assert fps[0] & fps[1], "shared normalized run must produce a shared fingerprint"
    assert not (fps[0] & fps[2])


def test_config_rejects_unknown_substring_pass():
    from sycl_jaccard_spark.config import PipelineConfig

    with pytest.raises(ValueError, match="substring_pass"):
        PipelineConfig(substring_pass="suffixtree")


def test_winnow_arrow_impl_bit_equals_expression(spark):
    """The pipeline's Arrow window-min (winnow_min_udf over JVM-hashed grams)
    is bit-identical to the golden HOF expression form (winnow_hashes) — the
    dual-implementation discipline every other kernel follows. Covers the
    short-gram arm (n_grams <= w) and multi-window rows, both hash families."""
    from sycl_jaccard_spark.functions.shingles import (
        winnow_grams,
        winnow_hashes,
        winnow_min_udf,
    )

    texts = [
        "tiny",
        " ".join(f"tok{i}" for i in range(5)),
        "\n".join(f"line_{i} = compute({i}) + offset_{i % 7}" for i in range(60)),
        "x" * 400,
        "a b " * 300,
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    k, w = 12, 9
    for portable in (False, True):
        expr = df.select(
            "i", winnow_hashes(F.col("t"), k, w, portable=portable).alias("fps")
        )
        # the gram arrays are materialized before the UDF, exactly as the
        # pipeline helper does — CollapseProject otherwise re-inlines the
        # lambda-bearing HOF expression as the UDF's child, which
        # ExtractPythonUDFs cannot split (run-time INTERNAL_ERROR)
        grams = df.select(
            "i", winnow_grams(F.col("t"), k, portable=portable).alias("grams")
        ).localCheckpoint(eager=True)
        arrow = grams.select("i", winnow_min_udf(w)(F.col("grams")).alias("fps"))
        e = {r["i"]: r["fps"] for r in expr.collect()}
        a = {r["i"]: r["fps"] for r in arrow.collect()}
        assert e == a, f"portable={portable}"


def test_minhash_expr_matches_udf(spark):
    """r6 optimization gate: the pure-JVM expression MinHash must be
    bit-identical to the Arrow-UDF impl, including the empty/null-array
    all-P fill, for both narrow and wide signatures."""
    from sycl_jaccard_spark.functions.minhash import minhash_expr

    rng = np.random.default_rng(7)
    rows = [
        (0, [int(x) for x in rng.integers(0, 2**61, size=37)]),
        (1, [int(x) for x in rng.integers(0, 2**61, size=5)]),
        (2, []),
        (3, None),
        (4, [0, MERSENNE, (1 << 61) - 1]),
    ]
    df = spark.createDataFrame(rows, "id long, h array<long>")
    for n_perms in (16, 32):
        both = df.select(
            "id",
            minhash_udf(n_perms, 42)(F.col("h")).alias("sig_udf"),
            minhash_expr(F.col("h"), n_perms, 42).alias("sig_expr"),
        ).collect()
        for r in both:
            assert r["sig_udf"] == r["sig_expr"], f"id={r['id']} n_perms={n_perms}"


def test_minhash_signatures_impl_dispatch(spark):
    """minhash_impl config knob: expr/udf/auto all yield identical sigs."""
    from sycl_jaccard_spark.config import PipelineConfig
    from sycl_jaccard_spark.operators.lsh import minhash_signatures

    df = spark.createDataFrame(
        [(0, [11, 22, 33]), (1, [44])], "id long, shingle_hashes array<long>"
    )
    sigs = {}
    for impl in ("auto", "udf", "expr"):
        cfg = PipelineConfig(num_perms=16, bands=4, rows_per_band=4, minhash_impl=impl)
        out = minhash_signatures(df, cfg).select("id", "sig").collect()
        sigs[impl] = {r["id"]: r["sig"] for r in out}
    assert sigs["auto"] == sigs["udf"] == sigs["expr"]
    with pytest.raises(ValueError):
        PipelineConfig(minhash_impl="nope")
