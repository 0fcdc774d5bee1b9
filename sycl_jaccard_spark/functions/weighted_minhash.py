"""Weighted MinHash via Consistent Weighted Sampling (Ioffe, ICML 2010,
"Improved Consistent Sampling, Weighted Minhash and L1 Sketching") — the
candidate-generation sibling of the weighted verify kernel.

Collision probability of one signature slot equals the weighted Jaccard
J_w = Σ_e min(w_a(e), w_b(e)) / Σ_e max(w_a(e), w_b(e)). Under the
reference's per-element weight model (one weight per element, shared by
every owner — ``jaccard.cpp:254-256`` vertex weights) this is EXACTLY
Wi / (vol_a + vol_b − Wi), the quantity ``jaccard_pairs_weighted`` verifies
— so CWS signatures band/bucket with the existing LSH machinery and the
exact weighted verify confirms survivors, completing the weighted
candidate→verify loop.

Determinism without stored state: all randomness is counter-based —
splitmix64 over (element, perm, slot) → uniforms → Gamma(2,1) via
−ln(u1)−ln(u2). Same (element, weight, perm) always produces the same
sample on every machine (no RNG stream ordering to break).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based 64-bit mix (public splitmix64 constants)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    x ^= x >> np.uint64(31)
    return x


def _uniform(elems_u: np.ndarray, perm_salt: np.ndarray, slot: int, seed: int) -> np.ndarray:
    """(n, P) deterministic uniforms in (0, 1) keyed by (element, perm, slot)."""
    h = _splitmix64(
        elems_u[:, None]
        ^ perm_salt[None, :]
        ^ np.uint64(_splitmix64(np.array([slot * 0x9E37 + seed], dtype=np.uint64))[0])
    )
    # 53-bit mantissa -> (0, 1); +0.5 ulp offset keeps log() finite
    return ((h >> np.uint64(11)).astype(np.float64) + 0.5) / float(1 << 53)


def cws_batch(
    elem_arrays: pd.Series,
    weight_arrays: pd.Series,
    num_perms: int,
    seed: int,
) -> pd.Series:
    """Batch CWS signatures: per document, per permutation k the sampled
    "active index" is argmin_e c_e / (y_e · exp(r_e)) with
    t = ⌊ln w_e / r_e + β_e⌋, y = exp(r_e (t − β_e)); the emitted slot value
    hashes (element, t) so equal samples collide exactly (Ioffe §4).
    Fully vectorized: flat (Σ n_e, P) matrices + segmented argmin via
    minimum.reduceat on (value, first-index) pairs."""
    n_docs = len(elem_arrays)
    lens = np.fromiter(
        ((len(v) if v is not None else 0) for v in elem_arrays), dtype=np.int64, count=n_docs
    )
    out = np.zeros((n_docs, num_perms), dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return pd.Series(out.tolist())
    elems = np.concatenate(
        [np.asarray(v, dtype=np.int64) for v in elem_arrays if v is not None and len(v)]
    ).astype(np.uint64)
    weights = np.concatenate(
        [np.asarray(v, dtype=np.float64) for v in weight_arrays if v is not None and len(v)]
    )
    if not np.isfinite(weights).all() or (weights <= 0).any():
        raise ValueError("CWS requires strictly positive finite weights")
    doc_idx = np.flatnonzero(lens > 0)
    seg_lens = lens[doc_idx]
    bounds = np.zeros(len(seg_lens) + 1, dtype=np.int64)
    np.cumsum(seg_lens, out=bounds[1:])

    perm_salt = _splitmix64(np.arange(num_perms, dtype=np.uint64) + np.uint64(seed * 0x10001))
    # chunk on doc boundaries so the (chunk_elems, P) float64 temporaries
    # stay ~16 MB regardless of batch size (same discipline as minhash_batch
    # — concurrent workers allocating GB temporaries cause an mmap storm)
    target = max(1, (16 << 20) // (8 * num_perms))
    d0 = 0
    while d0 < len(seg_lens):
        d1 = d0
        while d1 < len(seg_lens) and (bounds[d1 + 1] - bounds[d0]) <= target:
            d1 += 1
        d1 = max(d1, d0 + 1)  # at least one doc per chunk
        lo, hi = bounds[d0], bounds[d1]
        e = elems[lo:hi]
        n = hi - lo
        starts = bounds[d0:d1] - lo
        sl = seg_lens[d0:d1]
        # The per-(element, perm) samples depend ONLY on the element, so draw
        # them once per UNIQUE element and gather — bit-identical to drawing
        # per membership (same splitmix inputs), and the expensive part
        # (5 uniforms + 5 logs per perm) shrinks by the corpus repetition
        # factor, which is exactly what is large on the boilerplate-heavy
        # corpora the weighted mode exists for.
        uniq, inv = np.unique(e, return_inverse=True)
        # Gamma(2,1) = -ln u1 - ln u2 (two uniforms each for r and c), beta ~ U.
        # The algebraically-equivalent fused form -ln(u1*u2) was tried and
        # measured SLOWER on an isolated single-threaded rerun (5.89 s vs
        # 6.74 s per 1000 docs; an earlier "2.5x faster" microbench ran
        # under concurrent load and measured the box, not the code) — the
        # two-log form stays. Ledger: BENCH/BASELINE.md CWS section.
        r_u = -np.log(_uniform(uniq, perm_salt, 0, seed)) - np.log(_uniform(uniq, perm_salt, 1, seed))
        ln_c_u = np.log(
            -np.log(_uniform(uniq, perm_salt, 2, seed)) - np.log(_uniform(uniq, perm_salt, 3, seed))
        )
        beta_u = _uniform(uniq, perm_salt, 4, seed)
        r, ln_c, beta = r_u[inv], ln_c_u[inv], beta_u[inv]
        t = np.floor(np.log(weights[lo:hi])[:, None] / r + beta)
        # minimize ln a = ln c - r(t - beta) - r  (monotone in a; log space)
        ln_a = ln_c - r * (t - beta) - r

        # segmented argmin: min value per (doc, perm), then the FIRST flat
        # index attaining it (minimum.reduceat over masked indices)
        seg_min = np.minimum.reduceat(ln_a, starts, axis=0)
        mask = ln_a == np.repeat(seg_min, sl, axis=0)
        flat_idx = np.where(mask, np.arange(n, dtype=np.int64)[:, None], n)
        first = np.minimum.reduceat(flat_idx, starts, axis=0)

        chosen_elem = e[first]
        chosen_t = t[first, np.arange(num_perms)[None, :]].astype(np.int64).astype(np.uint64)
        out[doc_idx[d0:d1]] = _splitmix64(_splitmix64(chosen_elem) ^ chosen_t).astype(np.int64)
        d0 = d1
    return pd.Series(out.tolist())


def vol_batch(weight_arrays: pd.Series) -> pd.Series:
    """Per-doc volume Σw — computed INSIDE the Arrow pass where the weight
    arrays already live. A JVM-side ``F.aggregate`` column next to the
    pandas UDF was measured +20-45% on the signature stage at 100k: the
    arrays are then BOTH shipped to Python and re-consumed JVM-side."""
    return pd.Series(
        [float(np.sum(v)) if v is not None and len(v) else 0.0 for v in weight_arrays]
    )


def weighted_minhash_udf(num_perms: int, seed: int = 42, with_volume: bool = False):
    """pandas UDF: (elems array<long>, weights array<double>) -> sig
    array<long> (band-compatible with ``band_hashes``), or
    struct(sig, vol) with ``with_volume=True``."""

    if with_volume:

        @F.pandas_udf("sig array<bigint>, vol double")
        def _cws_v(elems: pd.Series, weights: pd.Series) -> pd.DataFrame:
            return pd.DataFrame(
                {"sig": cws_batch(elems, weights, num_perms, seed), "vol": vol_batch(weights)}
            )

        return _cws_v

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _cws(elems: pd.Series, weights: pd.Series) -> pd.Series:
        return cws_batch(elems, weights, num_perms, seed)

    return _cws


def weighted_minhash_simhash_udf(num_perms: int, seed: int = 42, with_volume: bool = False):
    """Fused pandas UDF: (elems, weights) -> struct(sig: array<long>,
    sim: long[, vol: double]) — the weighted-mode twin of
    ``minhash_simhash_udf``: CWS and the (unweighted) SimHash bit-vote
    reduce the same element arrays, so one Arrow round-trip and one
    Python-worker pass serve both (and the Σw volume with
    ``with_volume=True`` — see :func:`vol_batch`). SimHash bit votes are
    order-independent sums over DISTINCT elements, so computing them on the
    sorted-distinct ``elems`` is bit-identical to the standalone
    ``simhash_udf`` over the (already-distinct) shingle arrays."""
    from sycl_jaccard_spark.functions.simhash import simhash_batch

    if with_volume:

        @F.pandas_udf("sig array<bigint>, sim bigint, vol double")
        def _fused_v(elems: pd.Series, weights: pd.Series) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "sig": cws_batch(elems, weights, num_perms, seed),
                    "sim": simhash_batch(elems),
                    "vol": vol_batch(weights),
                }
            )

        return _fused_v

    @F.pandas_udf("sig: array<bigint>, sim: bigint")
    def _fused(elems: pd.Series, weights: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            {"sig": cws_batch(elems, weights, num_perms, seed), "sim": simhash_batch(elems)}
        )

    return _fused
