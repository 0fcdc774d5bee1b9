"""Tokenization + k-shingling as pure JVM-side column expressions.

The reference's "neighbor set of a vertex" (``standalone_csr.hpp:73-84``)
becomes "shingle set of a document". Everything here stays inside
whole-stage codegen — no Python on the hot path.

Two hash families:

* ``xxhash64`` — the scale path (fast, JVM built-in).
* ``md5_long`` — the *portable* path: the identical value is computable in
  DuckDB as ``('0x' || substr(md5(x),1,15))::BIGINT``, which is what lets the
  driver's DuckDB oracle replay MinHash/LSH bit-for-bit (SURVEY.md §5's
  compareCoords analog).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WHITESPACE = r"\s+"


def md5_long(col: Column | str) -> Column:
    """60-bit integer hash portable between Spark and DuckDB.

    Spark:  conv(substring(md5(x), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT
    15 hex digits = 60 bits < 2^63: no sign ambiguity in either engine.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def let(value: Column, body) -> Column:
    """Bind ``value`` once and use it many times inside ``body``.

    Spark evaluates expressions that appear inside a higher-order-function
    lambda *per array element* (no CSE, no codegen inside lambdas), so e.g.
    ``transform(sequence(...), i -> slice(toks, i+1, k))`` re-computes
    ``toks`` — a full tokenize of the document — once per shingle: O(n²)
    per row. Wrapping the value as a 1-element array and transforming over
    it binds it to a lambda variable, which IS materialized once:
    ``element_at(transform(array(value), v -> body(v)), 1)``.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def tokens(text: Column | str, lowercase: bool = False) -> Column:
    """Whitespace tokenization; empties removed (split on regex keeps no empty
    trailing fields but can keep a leading one for texts starting with space).
    """
    c = F.col(text) if isinstance(text, str) else text
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(F.trim(c), WHITESPACE), lambda t: t != F.lit(""))


def shingles(toks: Column, k: int) -> Column:
    """Distinct, sorted k-token shingle strings (space-joined).

    Sortedness mirrors the reference's sorted-adjacency invariant
    (``jaccard.cpp:353`` "column indices are sorted within each row") and
    makes downstream intersection deterministic. Documents shorter than k
    tokens contribute their whole token string as a single shingle, so every
    non-empty document has a non-empty set (a vertex with an empty neighbor
    set would never appear in any pair anyway).

    ``toks`` is let-bound: it is referenced inside the per-shingle lambda,
    which would otherwise re-evaluate it per shingle (see :func:`let`).
    """

    def body(t: Column) -> Column:
        whole = F.array(F.concat_ws(" ", t))
        grams = F.transform(
            F.sequence(F.lit(0), F.size(t) - k),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, k)),
        )
        return F.when(F.size(t) >= k, grams).otherwise(whole)

    return F.array_sort(F.array_distinct(let(toks, body)))


def shingle_hashes(shingle_strs: Column, portable: bool = False) -> Column:
    """Hash each shingle string to int64; distinct + sorted (set semantics).

    ``portable=True`` uses :func:`md5_long` (DuckDB-replayable); default is
    ``xxhash64`` (seed 42, Spark's default) for the scale path.
    """
    if portable:
        hash_one = lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")  # noqa: E731
    else:
        hash_one = lambda s: F.xxhash64(s)  # noqa: E731  (pyspark rejects *cols fns as HOF lambdas)
    return F.array_sort(F.array_distinct(F.transform(shingle_strs, hash_one)))


def line_gram_hashes(text: Column, w: int = 4, portable: bool = False) -> Column:
    """Hashed w-line grams — the sampled-substring (suffix-array analog)
    candidate pass (SURVEY.md §7 step 8).

    Content-anchored: any two files sharing >= w consecutive (trimmed,
    non-empty) lines produce a common hash *regardless of byte offset* —
    position-strided char sampling misses shifted containment. Lines are the
    natural substring unit for source code.
    """
    lines = F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )

    def body(ls: Column) -> Column:
        whole = F.array(F.concat_ws("\n", ls))
        grams = F.transform(
            F.sequence(F.lit(0), F.size(ls) - w),
            lambda i: F.concat_ws("\n", F.slice(ls, i + 1, w)),
        )
        return F.when(F.size(ls) >= w, grams).otherwise(whole)

    hash_one = (
        (lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"))
        if portable
        else (lambda s: F.xxhash64(s))
    )
    return F.array_sort(F.array_distinct(F.transform(let(lines, body), hash_one)))


def winnow_hashes(
    text: Column, k: int = 30, w: int = 50, portable: bool = False
) -> Column:
    """Winnowed char-k-gram fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS local fingerprinting scheme) over
    whitespace-NORMALIZED text: the alternative substring candidate pass
    (``cfg.substring_pass="winnow"``).

    Guarantee: any two files sharing a normalized run of >= w + k - 1 chars
    share at least one fingerprint — regardless of byte offset AND of where
    line breaks fall. Line grams (:func:`line_gram_hashes`) are cheaper
    (~one hash per line vs ~2n/w here) but require w whole UNMODIFIED lines;
    re-wrapped or re-indented embeds produce zero shared line grams. Density
    is ~2/w fingerprints per position, so the banded relation stays bounded.

    Entirely JVM-side (nested let-bound higher-order functions, no UDF), and
    with ``portable=True`` replayable verbatim in DuckDB SQL — the driver
    oracle cross-checks the full fingerprint relation (`doc_winnow_fps`).

    SCALE NOTE: the HOF window-min allocates a w-element slice per window
    (HOF lambdas are interpreted, no codegen), measured 6.4× the line-gram
    pipeline wall at 100k×6KB files — the PIPELINES therefore compute the
    same grams JVM-side (:func:`winnow_grams`) and run the sliding min in
    one vectorized Arrow batch (:func:`winnow_min_udf`), bit-identical to
    this expression (dual-impl equality test). This full-expression form is
    the oracle/golden path, not the hot path.
    """

    def body(grams: Column) -> Column:
        return winnow_select_expr(grams, w)

    return let(winnow_grams(text, k, portable=portable), body)


def winnow_grams(text: Column, k: int, portable: bool = False) -> Column:
    """Rolling char-k-gram hash array over whitespace-normalized text — the
    JVM half of the winnow pass (cheap: one substr+hash per position)."""
    norm = F.regexp_replace(F.trim(text), r"\s+", " ")

    hash_one = (
        (lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"))
        if portable
        else (lambda s: F.xxhash64(s))
    )

    def body(t: Column) -> Column:
        n = F.length(t)
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - k + 1), lambda i: hash_one(t.substr(i, F.lit(k)))
            ),
        ).otherwise(F.array(hash_one(t)))

    return let(norm, body)


def winnow_select_expr(grams: Column, w: int) -> Column:
    """Sliding-window minima of a gram array as a column expression —
    O(n·w) with a per-window slice allocation; the golden form the Arrow
    implementation is equality-tested against."""
    ng = F.size(grams)
    fps = F.when(
        ng >= w,
        F.transform(
            F.sequence(F.lit(1), ng - w + 1),
            lambda j: F.array_min(F.slice(grams, j, w)),
        ),
    ).otherwise(F.array(F.array_min(grams)))
    return F.array_sort(F.array_distinct(fps))


def winnow_min_udf(w: int):
    """Arrow-batched sliding-window minima: distinct sorted minima of every
    w-window of each gram array, vectorized per row with NumPy's C sliding
    window (the gram HASHING stays JVM-side — only int64 arrays cross the
    Arrow boundary, the same shape as the MinHash signature UDF). Returns
    exactly :func:`winnow_select_expr`'s value (bit-equality tested)."""
    import numpy as np
    import pandas as pd  # noqa: F401 (type hint target)
    from numpy.lib.stride_tricks import sliding_window_view
    from pyspark.sql import types as T

    def _winnow(grams):
        out = []
        for arr in grams:
            a = np.asarray(arr, dtype=np.int64)
            if a.size <= w:
                out.append(np.array([a.min()], dtype=np.int64))
            else:
                out.append(np.unique(sliding_window_view(a, w).min(axis=1)))
        return pd.Series(out)

    _winnow.__annotations__ = {"grams": pd.Series, "return": pd.Series}
    return F.pandas_udf(T.ArrayType(T.LongType()))(_winnow)


def substring_band_hashes(content: Column, cfg) -> Column:
    """The substring candidate pass's band-hash array, dispatched on
    ``cfg.substring_pass`` — the ONE place the linegram/winnow choice lives,
    shared by the batch pipeline and the delta store (so a store and its
    deliveries can never band substrings differently; the choice is part of
    the store's config fingerprint).

    * ``"linegram"`` — hashed w-line grams: content-anchored, ~1 hash/line,
      needs ``substring_lines`` whole unmodified lines to fire.
    * ``"winnow"`` — MOSS winnowed char fingerprints over normalized text:
      fires on any shared normalized run >= winnow_w + winnow_k - 1 chars,
      robust to re-wrapping/re-indentation, ~2/winnow_w hashes per char.
    """
    portable = bool(getattr(cfg, "portable_hashes", False))
    if cfg.substring_pass == "linegram":
        return line_gram_hashes(content, cfg.substring_lines, portable=portable)
    if cfg.substring_pass == "winnow":
        return winnow_hashes(
            content, cfg.winnow_k, cfg.winnow_w, portable=portable
        )
    raise ValueError(f"unknown substring_pass {cfg.substring_pass!r}")


def doc_shingle_hashes(content: Column, cfg) -> Column:
    """The pipeline's shingle-set column, dispatched on
    ``cfg.shingle_mode`` — the ONE place the token/char choice lives, shared
    by the batch pipeline, the delta store and both streaming legs (so a
    store and its deliveries can never shingle differently).

    * ``"token"`` — whitespace tokens, ``shingle_k``-token grams: the
      natural unit for formatted source code.
    * ``"char"`` — ``char_shingle_k``-char grams every
      ``char_shingle_stride`` chars: survives whitespace mangling and
      minification, where re-joined token boundaries destroy every token
      shingle (recall measured in BENCH/RECALL.md).
    """
    if cfg.shingle_mode == "token":
        return shingle_hashes(
            shingles(tokens(content), cfg.shingle_k), portable=cfg.portable_hashes
        )
    if cfg.shingle_mode == "char":
        # strip ALL whitespace first: the whole point of char mode is
        # robustness to reformatting/minification, and grams over the raw
        # text would still contain the mangled whitespace bytes
        return char_shingle_hashes(
            F.regexp_replace(content, r"\s+", ""), cfg.char_shingle_k,
            stride=cfg.char_shingle_stride, portable=cfg.portable_hashes,
        )
    raise ValueError(f"unknown shingle_mode {cfg.shingle_mode!r}")


def char_shingle_hashes(text: Column, k: int, stride: int = 1, portable: bool = False) -> Column:
    """Hashed character k-grams sampled every ``stride`` chars (offset-
    sensitive; prefer :func:`line_gram_hashes` for containment candidates).

    ``text`` is let-bound: it is referenced inside the per-gram lambda, and
    a computed expression (e.g. a whitespace-stripping regexp_replace) would
    otherwise re-evaluate per gram — O(n²) per row (see :func:`let`).
    """

    def body(t: Column) -> Column:
        n = F.length(t)
        starts = F.when(
            n >= k,
            F.sequence(F.lit(1), n - k + 1, F.lit(stride)),
        ).otherwise(F.array(F.lit(1)))
        return F.transform(starts, lambda i: t.substr(i, F.lit(k)))

    hash_one = (
        (lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"))
        if portable
        else (lambda s: F.xxhash64(s))
    )
    return F.array_sort(F.array_distinct(F.transform(let(text, body), hash_one)))
