"""64-bit SimHash as an Arrow-vectorized pandas UDF.

Near-miss recall booster (SURVEY.md §7 step 8 / north_rule): documents whose
shingle sets differ slightly get SimHash values within a small Hamming
distance; banding the 64 bits into 4 x 16-bit keys catches all pairs with
Hamming distance <= 3 (pigeonhole), which the verify stage then scores with
exact Jaccard.

Bit source: the shingle's int64 hash bits themselves (already uniform), so
SimHash needs no second hash family and is deterministic given the shingle
hashes. Ties (bit sum == 0) resolve to bit 0 — fixed, engine-independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def simhash_batch(hash_arrays: pd.Series) -> pd.Series:
    out = []
    for arr in hash_arrays:
        if arr is None or len(arr) == 0:
            out.append(0)
            continue
        x = np.asarray(arr, dtype=np.uint64)
        # (n, 64) sign matrix: +1 where bit set, -1 where clear
        bits = ((x[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        for i in range(64):
            if votes[i] > 0:
                sim |= np.uint64(1) << np.uint64(i)
        out.append(int(sim.astype(np.int64)))  # reinterpret as signed for LongType
    return pd.Series(out)


@F.pandas_udf(T.LongType())
def simhash_udf(hashes: pd.Series) -> pd.Series:
    return simhash_batch(hashes)


def simhash_band_cols(sim_col, n_bands: int = 4, bits: int = 64):
    """Split a signed-64 SimHash column into ``n_bands`` unsigned band keys
    (JVM-side bit ops: shiftrightunsigned + mask)."""
    width = bits // n_bands
    mask = (1 << width) - 1
    return [
        (F.shiftrightunsigned(sim_col, b * width).bitwiseAND(F.lit(mask))).alias(f"band{b}")
        for b in range(n_bands)
    ]


def hamming64(a, b):
    """Hamming distance between two signed-64 columns (JVM-side bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))
