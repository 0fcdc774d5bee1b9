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


def minhash_batch(hash_arrays: pd.Series, a: np.ndarray, b: np.ndarray) -> pd.Series:
    """Vectorized batch MinHash: one NumPy matmul-shaped pass per document."""
    out = []
    p = MERSENNE
    for arr in hash_arrays:
        if arr is None or len(arr) == 0:
            out.append([int(p)] * len(a))
            continue
        x = np.asarray(arr, dtype=np.int64) & np.int64(LANE_MASK)  # 31-bit lanes
        # (n_shingles, num_perms) — all values < 2^62, exact in int64
        hashed = (x[:, None] * a[None, :] + b[None, :]) % p
        out.append(hashed.min(axis=0).tolist())
    return pd.Series(out)


def minhash_udf(num_perms: int, seed: int):
    """pandas UDF: array<long> shingle hashes -> array<long> signature."""
    a, b = make_perms(num_perms, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _minhash(hashes: pd.Series) -> pd.Series:
        return minhash_batch(hashes, a, b)

    return _minhash
