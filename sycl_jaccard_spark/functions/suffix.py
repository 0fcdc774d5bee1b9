"""Suffix arrays and exact longest-common-substring (LCS) scoring.

The north-star pipeline names three candidate/near-miss passes: MinHash-LSH,
SimHash, and a *suffix-array substring* pass. Candidate **generation** for
the substring pass is the content-anchored line-gram banding
(functions/shingles.py:line_gram_hashes — any shared run of >= w lines
collides regardless of byte offset). This module is the substring pass's
exact **verification** half: a genuine suffix array over the concatenation
of a candidate pair, giving the exact longest common substring in
O(n log^2 n) — the same role the reference's exact CSR intersection kernel
(``jaccard.cpp:315-400``) plays for the set-Jaccard passes: an approximate
pass proposes, an exact kernel decides.

Why exact LCS and not shingle containment: ``inter/min`` over token-shingle
sets is *order-blind* — a small file whose lines were cherry-picked from
many places in a big file scores ~1.0 containment without ANY contiguous
shared region (no substring relation at all). Token granularity also
inflates short overlaps. ``lcs_len / min(len)`` is the exact, order-aware
containment fraction: 1.0 iff one file is literally embedded in the other.

Everything here is driver/executor-side NumPy over byte arrays — each pair's
LCS is fully vectorized (lexsort-based Manber-Myers doubling + binary-lifted
adjacent LCP), batched through one Arrow pandas UDF; there is no per-row
Python in the hot loop beyond the per-pair dispatch.

Byte-level vs char-level: we score UTF-8 bytes. For the *contained* boundary
(lcs == min length) byte containment is equivalent to character containment
— UTF-8 lead/ASCII bytes can never appear as continuation bytes, so a full
byte-match of a valid encoded string always starts on a codepoint boundary.
That equivalence is what lets the driver's DuckDB oracle cross-check the
suffix array with an independent ``position(short IN long)`` predicate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def suffix_array(t: np.ndarray) -> tuple[np.ndarray, list[np.ndarray]]:
    """Manber-Myers prefix doubling over an int array ``t``.

    Returns ``(sa, levels)``: ``sa`` is the suffix array (indices of suffixes
    in ascending lexicographic order) and ``levels[k]`` is the rank array
    after comparing prefixes of length ``2**k``.

    Rank equality at level k is *exact* prefix equality: out-of-bounds
    positions compare as -1 (below every byte value), so two different
    suffixes can share a rank only when both genuinely extend >= 2**k
    positions with identical content. That property makes ``levels`` a
    binary-lifting oracle for pairwise LCP (see :func:`adjacent_lcp`).

    The loop stops once all ranks are distinct — at that point every
    pairwise LCP is provably < the current prefix length, so higher levels
    can never fire in the lifting descent.
    """
    n = int(t.size)
    if n == 0:
        return np.empty(0, dtype=np.int64), [np.empty(0, dtype=np.int64)]
    order = np.argsort(t, kind="stable")
    rank = np.empty(n, dtype=np.int64)
    sorted_vals = t[order]
    rank[order] = np.cumsum(
        np.concatenate(([0], (np.diff(sorted_vals) != 0).astype(np.int64)))
    )
    levels = [rank]
    k = 1
    while k < n and rank[order[-1]] != n - 1:
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        r1 = rank[order]
        r2 = second[order]
        changed = np.concatenate(
            ([0], ((np.diff(r1) != 0) | (np.diff(r2) != 0)).astype(np.int64))
        )
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.cumsum(changed)
        levels.append(rank)
        k *= 2
    return order, levels


def adjacent_lcp(sa: np.ndarray, levels: list[np.ndarray], n: int) -> np.ndarray:
    """LCP of each adjacent suffix pair in SA order, vectorized.

    Binary-lifting descent over the doubling rank arrays: at level k
    (prefix length L = 2**k), pairs whose current positions still share an
    L-prefix (rank equality — exact, see :func:`suffix_array`) advance both
    positions by L and add L to their LCP. All pairs descend together; each
    level is one vectorized gather + compare.
    """
    if n < 2:
        return np.empty(0, dtype=np.int64)
    x = sa[:-1].copy()
    y = sa[1:].copy()
    lcp = np.zeros(n - 1, dtype=np.int64)
    for k in range(len(levels) - 1, -1, -1):
        step = np.int64(1) << k
        rank = levels[k]
        alive = (x < n) & (y < n)
        idx = np.nonzero(alive)[0]
        if idx.size == 0:
            break
        eq = rank[x[idx]] == rank[y[idx]]
        hit = idx[eq]
        lcp[hit] += step
        x[hit] += step
        y[hit] += step
    return lcp


def lcs_bytes(a: bytes, b: bytes) -> int:
    """Exact longest common substring length (in bytes) of ``a`` and ``b``.

    Generalized suffix array over ``a + SEP + b`` with a sentinel value 256
    (outside the byte alphabet, so no common substring can span it): the LCS
    is the maximum adjacent LCP between suffixes owned by different sides —
    the classic reduction (Gusfield §7.4, public algorithmics).
    """
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0
    t = np.empty(la + 1 + lb, dtype=np.int64)
    t[:la] = np.frombuffer(a, dtype=np.uint8)
    t[la] = 256
    t[la + 1 :] = np.frombuffer(b, dtype=np.uint8)
    sa, levels = suffix_array(t)
    lcp = adjacent_lcp(sa, levels, t.size)
    cross = (sa[:-1] < la) != (sa[1:] < la)
    if not cross.any():
        return 0
    return int(lcp[cross].max())


def lcs_bytes_brute(a: bytes, b: bytes) -> int:
    """O(|a|*|b|) dynamic-programming LCS — the independent test oracle for
    :func:`lcs_bytes` (row-vectorized; only used in tests and tiny inputs)."""
    if not a or not b:
        return 0
    bb = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
    prev = np.zeros(len(b) + 1, dtype=np.int64)
    best = 0
    for ca in np.frombuffer(a, dtype=np.uint8).astype(np.int64):
        cur = np.zeros(len(b) + 1, dtype=np.int64)
        cur[1:] = np.where(bb == ca, prev[:-1] + 1, 0)
        m = int(cur.max())
        if m > best:
            best = m
        prev = cur
    return best


def lcs_len_udf() -> Column:
    """Factory for the Arrow-batched pandas UDF ``(text_a, text_b) ->
    lcs_bytes`` — built lazily so importing this module never touches a
    SparkSession."""

    @F.pandas_udf(T.LongType())
    def _lcs(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.empty(len(a), dtype=np.int64)
        av = a.to_numpy(dtype=object)
        bv = b.to_numpy(dtype=object)
        for i in range(len(a)):
            sa_ = av[i]
            sb_ = bv[i]
            if sa_ is None or sb_ is None:
                out[i] = 0
            else:
                out[i] = lcs_bytes(sa_.encode("utf-8"), sb_.encode("utf-8"))
        return pd.Series(out)

    return _lcs


def pair_lcs(
    pairs, items, id_col: str = "id", text_col: str = "content"
) -> "pyspark.sql.DataFrame":  # noqa: F821 (annotation only)
    """Attach exact LCS scores to candidate pairs ``(a, b)``.

    Two narrow attach joins pull each side's text (same shape as the exact
    set-Jaccard verify's array-attach joins — the pair side is the small
    relation and drives the build side), then ONE Arrow batch computes
    per-pair LCS. Returns ``(a, b, lcs_len, min_bytes, lcs_frac)`` where
    ``lcs_frac = lcs_len / min_bytes`` is the exact containment fraction
    (1.0 iff the smaller file is literally embedded in the larger).
    """
    texts = items.select(
        F.col(id_col).alias("_lcs_id"), F.col(text_col).alias("_lcs_text")
    )
    lcs = lcs_len_udf()
    joined = (
        pairs.join(texts.withColumnRenamed("_lcs_id", "a"), "a")
        .withColumnRenamed("_lcs_text", "_text_a")
        .join(texts.withColumnRenamed("_lcs_id", "b"), "b")
        .withColumnRenamed("_lcs_text", "_text_b")
    )
    min_bytes = F.least(F.octet_length("_text_a"), F.octet_length("_text_b"))
    return (
        joined.withColumn("lcs_len", lcs(F.col("_text_a"), F.col("_text_b")))
        .withColumn("min_bytes", min_bytes)
        .withColumn(
            "lcs_frac",
            F.when(F.col("min_bytes") > 0, F.col("lcs_len") / F.col("min_bytes")).otherwise(
                F.lit(0.0)
            ),
        )
        .drop("_text_a", "_text_b")
    )
