"""Property-based tests (Hypothesis) for the pure NumPy kernels — the
engine's arithmetic core, checked against straight-line Python-int oracles
over randomized inputs. Spark-free, so hundreds of examples run in seconds.

The reference pins kernel arithmetic with golden files + compareCoords
tolerance sweeps (`/root/reference/compareCoords.cpp`); randomized oracles
are the same idea with the input space widened.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from sycl_jaccard_spark.functions.minhash import LANE_MASK, MERSENNE, make_perms, minhash_batch
from sycl_jaccard_spark.functions.simhash import simhash_batch
from sycl_jaccard_spark.operators.ann import _half_away_div

# int64-representable shingle hashes, including negatives (xxhash64 family)
hash_val = st.integers(min_value=-(2**63), max_value=2**63 - 1)
doc = st.lists(hash_val, min_size=0, max_size=30)
docs = st.lists(doc, min_size=1, max_size=8)


@settings(max_examples=150, deadline=None)
@given(docs=docs, seed=st.integers(0, 2**31 - 1))
def test_minhash_batch_matches_python_int_oracle(docs, seed):
    """Each signature slot is exactly min((a·(x & LANE_MASK) + b) mod P) in
    unbounded Python-int arithmetic — the ÷-free shift/mask Mersenne fold and
    the reduceat segmentation must be invisible."""
    a, b = make_perms(4, seed)
    got = minhash_batch(pd.Series(docs), a, b)
    for d, sig in zip(docs, got):
        for j in range(4):
            if d:
                want = min((int(a[j]) * (x & LANE_MASK) + int(b[j])) % MERSENNE for x in d)
            else:
                want = MERSENNE  # empty docs sign as the identity of min
            assert sig[j] == want


@settings(max_examples=100, deadline=None)
@given(docs=docs)
def test_simhash_batch_matches_bit_vote_oracle(docs):
    """Bit b of the signature is set iff strictly more than half the
    elements have bit b set (votes 2·set − n > 0), computed per-element in
    Python ints; element ORDER must not matter (it's a vote)."""
    got = simhash_batch(pd.Series(docs))
    shuffled = simhash_batch(pd.Series([list(reversed(d)) for d in docs]))
    for d, sig, sig_r in zip(docs, got, shuffled):
        assert sig == sig_r  # order invariance
        want = 0
        n = len(d)
        for bit in range(64):
            set_cnt = sum((x >> bit) & 1 for x in np.asarray(d, dtype=np.int64).astype(np.uint64).tolist())
            if 2 * set_cnt - n > 0:
                want |= 1 << bit
        # reinterpret as signed int64 like the kernel's LongType output
        want = np.int64(np.uint64(want))
        assert sig == want


@settings(max_examples=100, deadline=None)
@given(docs=docs)
def test_minhash_duplicate_elements_are_invisible(docs):
    """MinHash is a SET signature: repeating elements must not change it."""
    a, b = make_perms(4, seed=7)
    got = minhash_batch(pd.Series(docs), a, b)
    doubled = minhash_batch(pd.Series([d + d for d in docs]), a, b)
    for s1, s2 in zip(got, doubled):
        assert s1 == s2


@settings(max_examples=200, deadline=None)
@given(
    s=st.integers(min_value=-(2**40), max_value=2**40),
    n=st.integers(min_value=1, max_value=2**20),
)
def test_half_away_div_matches_decimal_oracle(s, n):
    """sign(s)·((2|s|+n) // (2n)) must equal round-half-away-from-zero of
    the exact rational s/n (the k-means centroid update rule shared with the
    DuckDB replay)."""
    from fractions import Fraction

    got = int(_half_away_div(np.array([s]), np.array([n]))[0])
    q = Fraction(s, n)
    floor_q = q.numerator // q.denominator
    frac = q - floor_q
    if frac > Fraction(1, 2):
        want = floor_q + 1
    elif frac < Fraction(1, 2):
        want = floor_q
    else:  # exactly .5 -> away from zero
        want = floor_q + 1 if q >= 0 else floor_q
    assert got == want, (s, n, got, want)


# --- media codec properties (Spark-free) ---

from sycl_jaccard_spark.operators.multimodal import (  # noqa: E402
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    split_ppm_stream,
)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 24), h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1), n_frames=st.integers(1, 4),
)
def test_ppm_round_trip_and_stream_split(w, h, seed, n_frames):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n_frames)]
    for f in frames:
        assert np.array_equal(decode_ppm(encode_ppm(f)), f)
    stream = b"".join(encode_ppm(f) for f in frames)
    offs = split_ppm_stream(stream)
    assert len(offs) == n_frames
    assert sum(ln for _, ln in offs) == len(stream)
    for (o, ln), f in zip(offs, frames):
        assert np.array_equal(decode_ppm(stream[o : o + ln]), f)


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 500), ch=st.integers(1, 2),
    sr=st.sampled_from([8000, 16000, 44100]), seed=st.integers(0, 2**31 - 1),
)
def test_wav_round_trip(n, ch, sr, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-0.99, 0.99, (n, ch)).astype(np.float32)
    dec, got_sr = decode_wav(encode_wav(x, sr))
    assert got_sr == sr and dec.shape == (n, ch)
    assert np.abs(dec - x).max() <= 1 / 32768  # 16-bit quantization bound


@settings(max_examples=120, deadline=None)
@given(junk=st.binary(min_size=0, max_size=64))
def test_decoders_reject_garbage_cleanly(junk):
    """Arbitrary bytes must raise ValueError (or parse, for inputs that
    happen to be valid) — never hang, segfault, or raise anything else.
    split_ppm_stream is included: it is the one decoder that LOOPED forever
    on crafted negative-dimension headers before the w/h guard."""
    for dec in (decode_ppm, decode_wav, split_ppm_stream):
        try:
            dec(junk)
        except ValueError:
            pass  # rejected cleanly


def test_split_ppm_stream_negative_dims_regression():
    """int(b'-4') parses, the frame length went non-positive, and the stream
    splitter spun forever on 12 bytes of garbage — must raise promptly."""
    import pytest as _pytest

    with _pytest.raises(ValueError):
        split_ppm_stream(b"P6 -4 1 255 ")
    with _pytest.raises(ValueError):
        decode_wav(
            b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00\x00\x00"
            + b"\x01\x00\x00\x00"  # format=1, channels=0
            + b"\x00\x00\x00\x00" + b"\x00\x00\x00\x00" + b"\x02\x00\x10\x00"
            + b"data\x00\x00\x00\x00"
        )


def test_recall_md_section_replacement_preserves_other_sections(tmp_path, monkeypatch):
    """_replace_section must keep the headline and every OTHER section no
    matter the order — the naive split-at-marker truncation deleted whatever
    followed the replaced section."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from eval_recall import _replace_section

    monkeypatch.chdir(tmp_path)
    os.makedirs("BENCH")
    base = "# headline\n\nstuff"
    sub = "\n\n## Substring (containment) pass X\n\nold sub"
    wtd = "\n\n## Weighted (IDF/CWS) pipeline mode\n\nold wtd"
    with open("BENCH/RECALL.md", "w") as f:
        f.write(base + sub + wtd)
    # replace the FIRST section: the one after it must survive
    _replace_section("\n\n## Substring (containment) pass", "\n\n## Substring (containment) pass X\n\nNEW sub")
    got = open("BENCH/RECALL.md").read()
    assert "NEW sub" in got and "old wtd" in got and "old sub" not in got
    # replace the LAST section
    _replace_section("\n\n## Weighted (IDF/CWS) pipeline mode", "\n\n## Weighted (IDF/CWS) pipeline mode\n\nNEW wtd")
    got = open("BENCH/RECALL.md").read()
    assert "NEW sub" in got and "NEW wtd" in got and "old wtd" not in got
    # append when absent
    _replace_section("\n\n## Brand-new section", "\n\n## Brand-new section\n\nhello")
    got = open("BENCH/RECALL.md").read()
    assert got.count("## ") == 3 + 0 or "hello" in got
