"""Suffix-array LCS — the substring pass's exact verification kernel.

The suffix-array construction and LCP lifting are property-tested against an
independent O(n*m) dynamic-programming oracle (the compareCoords discipline:
two independent implementations must agree bit-for-bit), then the Spark-side
pair operator is checked end-to-end.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sycl_jaccard_spark.functions.suffix import (
    adjacent_lcp,
    lcs_bytes,
    lcs_bytes_brute,
    pair_lcs,
    suffix_array,
)


def test_suffix_array_orders_suffixes():
    t = np.frombuffer(b"banana", dtype=np.uint8).astype(np.int64)
    sa, _ = suffix_array(t)
    suf = [bytes(t[i:].astype(np.uint8)) for i in sa]
    assert suf == sorted(bytes(t[i:].astype(np.uint8)) for i in range(6))


def test_adjacent_lcp_banana():
    t = np.frombuffer(b"banana", dtype=np.uint8).astype(np.int64)
    sa, levels = suffix_array(t)
    lcp = adjacent_lcp(sa, levels, t.size)
    # SA of banana: a, ana, anana, banana, na, nana -> LCPs 1, 3, 0, 0, 2
    assert lcp.tolist() == [1, 3, 0, 0, 2]


def test_lcs_edges():
    assert lcs_bytes(b"", b"") == 0
    assert lcs_bytes(b"", b"xyz") == 0
    assert lcs_bytes(b"xyz", b"") == 0
    assert lcs_bytes(b"abc", b"abc") == 3
    assert lcs_bytes(b"abcdef", b"qrstu") == 0
    assert lcs_bytes(b"aaaa", b"aa") == 2


# small alphabets force long repeated runs — the adversarial regime for
# doubling constructions (many rank ties deep into the levels)
_bytestr = st.integers(min_value=2, max_value=4).flatmap(
    lambda k: st.binary(max_size=90).map(
        lambda raw: bytes(97 + (c % k) for c in raw)
    )
)


@settings(max_examples=150, deadline=None)
@given(_bytestr, _bytestr)
def test_lcs_matches_dp_oracle(a: bytes, b: bytes):
    assert lcs_bytes(a, b) == lcs_bytes_brute(a, b)


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=1, max_size=120), st.data())
def test_contained_slice_scores_full_length(big: bytes, data):
    i = data.draw(st.integers(0, len(big) - 1))
    j = data.draw(st.integers(i + 1, len(big)))
    small = big[i:j]
    assert lcs_bytes(small, big) == len(small)
    # symmetric
    assert lcs_bytes(big, small) == len(small)


def test_lcs_utf8_multibyte():
    a = "préfixe-δοκιμή-commun".encode("utf-8")
    b = "XX-δοκιμή-commun-YY".encode("utf-8")
    want = len("-δοκιμή-commun".encode("utf-8"))
    assert lcs_bytes(a, b) == want


def test_pair_lcs_operator(spark):
    docs = spark.createDataFrame(
        [
            (1, "line one\nline two\nline three\nline four\nline five"),
            (2, "PREFIX\nline two\nline three\nline four\nSUFFIX"),
            (3, "totally different content here"),
            (4, "line one\nline two\nline three\nline four\nline five"),
        ],
        ["id", "content"],
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], ["a", "b"])
    out = {
        (r["a"], r["b"]): r
        for r in pair_lcs(pairs, docs).collect()
    }
    # shared middle run of 1&2 (the newlines bordering the run match too)
    shared = "\nline two\nline three\nline four\n"
    assert out[(1, 2)]["lcs_len"] == len(shared)
    # no meaningful overlap (single shared chars at most)
    assert out[(1, 3)]["lcs_len"] <= 3
    # identical docs: full containment, frac exactly 1.0
    r14 = out[(1, 4)]
    assert r14["lcs_len"] == r14["min_bytes"]
    assert r14["lcs_frac"] == pytest.approx(1.0)


def test_pair_lcs_null_text(spark):
    docs = spark.createDataFrame([(1, "abc"), (2, None)], ["id", "content"])
    pairs = spark.createDataFrame([(1, 2)], ["a", "b"])
    row = pair_lcs(pairs, docs).collect()[0]
    assert row["lcs_len"] == 0 and row["lcs_frac"] == 0.0
