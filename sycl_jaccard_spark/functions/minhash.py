"""MinHash signatures as an Arrow-vectorized pandas UDF.

Replaces the reference's per-edge CSR intersection probe
(``jaccard.cpp:315-400``) as the *approximate* first pass; exact Jaccard
(functions/jaccard.py) remains the verification step, exactly like
``sygraph::jaccard_list`` verifies explicit candidate pairs
(``standalone_algorithms.hpp:109-133``).

Arithmetic is chosen to be **exactly replayable in SQL** (Spark SQL *and*
DuckDB BIGINT):

    sig[j] = min over shingles x of (A[j] * (x & 0x7FFFFFFF) + B[j]) % P

with P = 2^31 - 1 (Mersenne-31), A[j] in [1, P), B[j] in [0, P). The product
A*x < 2^62 wraps mod P ~2^31 times (good min-wise mixing — a 61-bit prime
with int64-bounded multipliers does NOT wrap and correlates minima with raw
key values), and every intermediate fits a signed 64-bit integer, so NumPy
int64 here, Spark SQL BIGINT, and DuckDB BIGINT all agree bit-for-bit — that
is how the driver's DuckDB oracle verifies the signatures (compareCoords
analog, SURVEY.md §5). The 31-bit lane reduction only perturbs the MinHash
*estimate* (per-doc collision prob ~n²/2^32); exact verification uses the
full 64-bit shingle hashes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

MERSENNE = (1 << 31) - 1
LANE_MASK = 0x7FFFFFFF


def make_perms(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic permutation constants: a in [1, P), b in [0, P)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_perms, dtype=np.int64)
    b = rng.integers(0, MERSENNE, size=num_perms, dtype=np.int64)
    return a, b


def _mod_mersenne31(v: np.ndarray, scratch: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """v % (2^31-1) for 0 <= v < 2^62, fully in place (shift/mask folding,
    ÷-free, no fresh allocations — many concurrent workers each allocating
    100MB temporaries cause an mmap/page-fault storm that anti-scales)."""
    p = np.int64(MERSENNE)
    t = scratch[: v.shape[0]]
    m = mask[: v.shape[0]]
    np.right_shift(v, np.int64(31), out=t)
    v &= p
    v += t
    np.right_shift(v, np.int64(31), out=t)
    v &= p
    v += t
    # v <= p+1 now (v == p must become 0, so a shift-fold is not enough)
    np.greater_equal(v, p, out=m)
    np.subtract(v, p, out=v, where=m)
    return v


def minhash_batch(hash_arrays: pd.Series, a: np.ndarray, b: np.ndarray) -> pd.Series:
    """Vectorized batch MinHash: documents' shingles are concatenated and
    hashed as flat (chunk, num_perms) matrices — no per-row Python loop —
    with per-document segment minima via ``np.minimum.reduceat``. Chunked so
    temporaries stay ~100 MB regardless of batch size; Mersenne-31 reduction
    uses shift/mask folding (÷-free), identical results to ``% p``."""
    p = MERSENNE
    num_perms = len(a)
    n_docs = len(hash_arrays)
    lens = np.fromiter(
        ((len(v) if v is not None else 0) for v in hash_arrays), dtype=np.int64, count=n_docs
    )
    out = np.full((n_docs, num_perms), p, dtype=np.int64)
    if lens.sum() > 0:
        flat = np.concatenate(
            [np.asarray(v, dtype=np.int64) for v in hash_arrays if v is not None and len(v)]
        ) & np.int64(LANE_MASK)
        doc_idx = np.flatnonzero(lens > 0)
        seg_lens = lens[doc_idx]
        bounds = np.zeros(len(seg_lens) + 1, dtype=np.int64)
        np.cumsum(seg_lens, out=bounds[1:])
        # chunk on document boundaries; small chunks + preallocated buffers
        # keep every worker inside its malloc arena (no mmap churn)
        target = max(1, (16 << 20) // (8 * num_perms))
        h = np.empty((target + 1024, num_perms), dtype=np.int64)
        scratch = np.empty_like(h)
        mask = np.empty(h.shape, dtype=bool)
        d0 = 0
        while d0 < len(seg_lens):
            d1 = d0
            while d1 < len(seg_lens) and (bounds[d1 + 1] - bounds[d0]) <= target:
                d1 += 1
            d1 = max(d1, d0 + 1)  # at least one doc per chunk
            x = flat[bounds[d0] : bounds[d1]]
            n = x.shape[0]
            if n > h.shape[0]:  # single oversized doc
                h = np.empty((n, num_perms), dtype=np.int64)
                scratch = np.empty_like(h)
                mask = np.empty(h.shape, dtype=bool)
            hv = h[:n]
            np.multiply(x[:, None], a[None, :], out=hv)
            hv += b[None, :]
            _mod_mersenne31(hv, scratch, mask)
            starts = (bounds[d0:d1] - bounds[d0])
            out[doc_idx[d0:d1]] = np.minimum.reduceat(hv, starts, axis=0)
            d0 = d1
    return pd.Series(out.tolist())


def minhash_expr(col, num_perms: int, seed: int):
    """Pure-JVM MinHash: the same ``min((a*(x & lane) + b) % P)`` per perm as
    :func:`minhash_batch`, as a codegen'd ``array_min(transform(...))`` chain
    — NO Python boundary (guide §4.1: prefer built-ins). Bit-identical to the
    UDF (dual-impl-tested); empty/null shingle arrays yield the all-P
    signature exactly like the UDF's fill value.

    One array traversal per perm, so cost grows linearly in ``num_perms``
    while the UDF's Arrow round-trip is ~flat: measured crossover is around
    32 perms (OPTIMIZATION_r06.md) — ``PipelineConfig.minhash_impl`` picks.
    """
    a, b = make_perms(num_perms, seed)
    lane = F.lit(LANE_MASK)
    p = F.lit(MERSENNE)
    def perm_min(aj: int, bj: int):
        # closure factory: pyspark reads the lambda's arity, so the constants
        # must be captured, not passed as defaulted parameters
        return F.array_min(
            F.transform(col, lambda x: (F.lit(aj) * x.bitwiseAND(lane) + F.lit(bj)) % p)
        )

    mins = [perm_min(int(a[j]), int(b[j])) for j in range(num_perms)]
    empty_sig = F.array(*[F.lit(MERSENNE).cast("long") for _ in range(num_perms)])
    return F.when(F.size(col) > 0, F.array(*mins)).otherwise(empty_sig)


def minhash_udf(num_perms: int, seed: int):
    """pandas UDF: array<long> shingle hashes -> array<long> signature."""
    a, b = make_perms(num_perms, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _minhash(hashes: pd.Series) -> pd.Series:
        return minhash_batch(hashes, a, b)

    return _minhash


def minhash_simhash_udf(num_perms: int, seed: int):
    """Fused pandas UDF: shingle hashes -> struct(sig: array<long>, sim: long).

    MinHash and SimHash both reduce the same per-document shingle-hash arrays;
    computing them in ONE UDF halves the Arrow IPC (the arrays cross the
    JVM<->Python boundary once, not twice) and the Python-worker passes — the
    measured sub-linear stage of the pipeline at higher parallelism. Both
    kernels are unchanged (bit-identical to the standalone UDFs)."""
    from sycl_jaccard_spark.functions.simhash import simhash_batch

    a, b = make_perms(num_perms, seed)

    @F.pandas_udf("sig: array<bigint>, sim: bigint")
    def _fused(hashes: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            {"sig": minhash_batch(hashes, a, b), "sim": simhash_batch(hashes)}
        )

    return _fused
