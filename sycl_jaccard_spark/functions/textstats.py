"""Text-analysis column expressions for training-data pipelines.

All JVM-side (codegen'd) so each is also expressible as a DuckDB oracle:
token counting, quality ratios, stopword-vote language ID, and an
order-sensitive document fingerprint.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from sycl_jaccard_spark.functions.shingles import let, tokens

# Tiny deterministic stopword lists (public common words). Votes, not ML.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "on"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "se", "del", "las"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "de": ("der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "des"),
}

MOD_P = (1 << 61) - 1
FP_BASE = 1_000_003  # small prime base; base*char < 2^63 always


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("long")


BPE_ISH_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: runs of word chars OR single punctuation
    marks (the usual pre-tokenization step of BPE tokenizers). Same regex
    evaluates identically under Java regex and DuckDB RE2 (ASCII classes
    only, on purpose)."""
    return F.size(F.regexp_extract_all(text, F.lit(f"({BPE_ISH_PATTERN})"), 1)).cast("long")


def quality_stats(text: Column) -> dict[str, Column]:
    """Length / distinctness / mean-token-length stats.

    Ratios are emitted as exact integer pairs divided once at the end, so a
    SQL oracle reproduces them bit-for-bit (single double division of exact
    ints is IEEE-deterministic).
    """
    toks = tokens(text)
    n = F.size(toks).cast("long")
    char_sum = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)).alias("char_sum")
    return {
        "n_tokens": n,
        "n_distinct": F.size(F.array_distinct(toks)).cast("long"),
        "tok_char_sum": char_sum,
        "avg_tok_len": F.when(n > 0, char_sum.cast("double") / n.cast("double")),
        "distinct_ratio": F.when(n > 0, F.size(F.array_distinct(toks)).cast("double") / n.cast("double")),
    }


def lang_scores(text: Column) -> dict[str, Column]:
    """Stopword-vote count per language over lowercased tokens."""
    toks = tokens(text, lowercase=True)
    out = {}
    for lang, words in STOPWORDS.items():
        lst = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(lst, t))).cast("long")
    return out


def lang_id(text: Column) -> Column:
    """argmax language by stopword votes; ties and zero votes -> 'und'.

    Deterministic tie-break: languages compared in sorted key order, strict
    `>` keeps the earlier winner.
    """
    scores = lang_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang in sorted(scores):
        s = scores[lang]
        cond = s > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
    return best_lang


def fingerprint(text: Column) -> Column:
    """Order-sensitive 61-bit document fingerprint.

    fp = ( Σ_i i * h32(token_i) ) % (2^61-1) with h32 = md5_60(token) % 2^32 —
    position-weighted sum of portable token hashes. i * h32 < 2^32 * n stays
    far below 2^63 (no silent Spark wrap / DuckDB overflow error), so the
    DuckDB oracle replays it exactly.
    """
    def body(tk: Column) -> Column:
        # zip token with 1-based position via transform over indices; tk is a
        # let-bound lambda var so element_at doesn't re-tokenize per element
        terms = F.transform(
            F.sequence(F.lit(1), F.size(tk)),
            lambda i: (
                i.cast("long")
                * (
                    F.conv(F.substring(F.md5(F.element_at(tk, i)), 1, 15), 16, 10).cast("long")
                    % F.lit(4294967296)
                )
                % MOD_P
            ),
        )
        summed = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, t: (acc + t) % MOD_P)
        return F.when(F.size(tk) > 0, summed).otherwise(F.lit(0).cast("long"))

    return let(tokens(text), body)
