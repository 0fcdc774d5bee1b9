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


def _block_bounds(blocks: int, bits: int) -> list[tuple[int, int]]:
    """(offset, size) per block; sizes differ by at most 1 when bits % blocks."""
    base, rem = divmod(bits, blocks)
    bounds, off = [], 0
    for i in range(blocks):
        size = base + (1 if i < rem else 0)
        bounds.append((off, size))
        off += size
    return bounds


def simhash_band_keys(sim_col, blocks: int = 4, max_hamming: int = 3, bits: int = 64):
    """Combinatorial block keys (Manku/Jain/Das Sarma, WWW'07 §3): split the
    signature into ``blocks`` blocks; two signatures within ``max_hamming``
    agree on ALL blocks of at least one (blocks - max_hamming)-subset by
    pigeonhole, so keying every such subset guarantees a shared bucket.

    Each key spans ~(1 - k/B) * 64 bits of keyspace. With the default
    B=4, k=3 this reduces to the classic 4 single 16-bit bands — fine at
    sandbox scale, but 2^16 buckets per table degenerate at 10^9+ docs
    (every bucket ~n/65k members, the cap would drop the pass entirely).
    B=6, k=3 gives C(6,3)=20 tables of ~32-bit keys: bounded buckets at
    10^12 docs for 5x the table count — set ``PipelineConfig.simhash_blocks=6``
    there. Key = xxhash64(combo_id, block values...), JVM-side."""
    from itertools import combinations

    keep = blocks - max_hamming
    if keep < 1:
        raise ValueError("simhash blocks must exceed max_hamming")
    bounds = _block_bounds(blocks, bits)
    block_cols = [
        F.shiftrightunsigned(sim_col, off).bitwiseAND(F.lit((1 << size) - 1))
        for off, size in bounds
    ]
    return [
        F.xxhash64(F.lit(ci), *[block_cols[j] for j in combo]).alias(f"simband{ci}")
        for ci, combo in enumerate(combinations(range(blocks), keep))
    ]


def n_simhash_tables(blocks: int = 4, max_hamming: int = 3) -> int:
    from math import comb

    return comb(blocks, blocks - max_hamming)


def hamming64(a, b):
    """Hamming distance between two signed-64 columns (JVM-side bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))
