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
    """Fully vectorized batch SimHash: all documents' shingle hashes are
    concatenated, the (n_total, 64) sign matrix is built in chunks, and
    per-document bit votes come from ``np.add.reduceat`` — no per-row Python
    loop (the naive per-doc 64-iteration loop dominated pipeline wall)."""
    n_docs = len(hash_arrays)
    lens = np.fromiter(
        ((len(v) if v is not None else 0) for v in hash_arrays), dtype=np.int64, count=n_docs
    )
    out = np.zeros(n_docs, dtype=np.int64)
    total = int(lens.sum())
    if total > 0:
        flat = np.concatenate(
            [np.asarray(v, dtype=np.int64) for v in hash_arrays if v is not None and len(v)]
        ).astype(np.uint64)
        doc_idx = np.flatnonzero(lens > 0)
        seg_lens = lens[doc_idx]
        bounds = np.zeros(len(seg_lens) + 1, dtype=np.int64)
        np.cumsum(seg_lens, out=bounds[1:])
        shifts = np.arange(64, dtype=np.uint64)[None, :]
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
        target = max(1, (16 << 20) // (8 * 64))
        votes = np.empty((len(seg_lens), 64), dtype=np.int64)
        d0 = 0
        while d0 < len(seg_lens):
            d1 = d0
            while d1 < len(seg_lens) and (bounds[d1 + 1] - bounds[d0]) <= target:
                d1 += 1
            d1 = max(d1, d0 + 1)
            x = flat[bounds[d0] : bounds[d1]]
            bits = ((x[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            starts = bounds[d0:d1] - bounds[d0]
            seg_sums = np.add.reduceat(bits, starts, axis=0)  # count of set bits
            # votes = 2*set - n  (±1 votes); >0 => bit set in the signature
            votes[d0:d1] = 2 * seg_sums - seg_lens[d0:d1, None]
            d0 = d1
        sigs = np.bitwise_or.reduce(
            np.where(votes > 0, weights, np.uint64(0)), axis=1
        )
        out[doc_idx] = sigs.astype(np.int64)  # reinterpret as signed for LongType
    return pd.Series(out.tolist())


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
