"""Pipeline configuration.

Mirrors the reference's compile-time/env-var knobs (``main.cpp:40-61``
``selectImplementation``, ``Makefile:33`` type selection) as one dataclass.
All randomness is seeded — the reference's kernels are deterministic and we
keep that property (SURVEY.md §7.2 determinism).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PipelineConfig:
    # --- shingling ---
    shingle_k: int = 5              # tokens per shingle (k-gram)
    # "token" (default): whitespace tokens, k-token shingles — the natural
    # unit for formatted source. "char": character k-grams — robust to
    # whitespace mangling/minification, where re-joined token boundaries
    # destroy every token shingle (measured in BENCH/RECALL.md). Flows
    # through pipeline, delta store and streaming via doc_shingle_hashes.
    shingle_mode: str = "token"
    char_shingle_k: int = 20        # chars per shingle in char mode
    char_shingle_stride: int = 1    # sample a char shingle every N chars

    # --- MinHash ---
    num_perms: int = 128
    bands: int = 32
    rows_per_band: int = 4          # bands * rows_per_band == num_perms
    seed: int = 42
    # (a*x + b) % P with P = 2^31-1, a,b < P over 31-bit lanes: every
    # intermediate < 2^62, exactly representable in int64 on NumPy, Spark SQL
    # BIGINT and DuckDB BIGINT alike -> bit-identical oracles, and the product
    # wraps mod P ~2^31 times (min-wise mixing).
    mersenne_prime: int = (1 << 31) - 1
    # MinHash execution strategy (bit-identical results, different plans):
    # "udf" — one vectorized NumPy pass per Arrow batch (the 128-perm
    # production winner: one boundary crossing amortizes over a wide
    # signature). "expr" — pure JVM codegen (array_min over transform, one
    # pass per perm): no Python boundary at all, which wins for narrow
    # signatures where the per-perm passes are cheaper than the Arrow
    # round-trip + worker fork. "auto" (default) picks expr for
    # num_perms <= 32, udf above (measured crossover, OPTIMIZATION_r06.md).
    minhash_impl: str = "auto"

    # --- SimHash ---
    simhash_bits: int = 64
    simhash_bands: int = 4          # legacy contiguous banding (simhash_band_cols)
    simhash_max_hamming: int = 3
    # combinatorial block tables (Manku WWW'07): C(blocks, blocks-max_hamming)
    # tables, each keyed on (blocks-max_hamming) blocks. blocks=4 == classic
    # 4x16-bit bands; blocks=6 -> 20 tables of ~32-bit keys, the 10^9+-doc
    # setting where 2^16 buckets per table would degenerate.
    simhash_blocks: int = 4

    # --- candidate generation / skew control (SURVEY.md §7.2) ---
    bucket_cap: int = 64            # max docs per LSH bucket before capping
    salt_buckets: int = 8           # fixed salt fan-out (skew_mode="salt")
    # "cap" (default): rank-window cap, WindowGroupLimit pushdown, drops
    # observable. "salt": fixed-fanout salting, all members kept. "auto":
    # size-graded — untouched <= cap, dynamic salt (linear pair cost, zero
    # membership loss) up to salt_threshold, cap beyond (pathological
    # boilerplate). Default stays "cap": cheapest plan, and the 31 other
    # bands + SimHash recover capped pairs (recall >= 0.99 holds on the skew
    # corpora); switch to "auto" when single-band recall matters.
    skew_mode: str = "cap"
    salt_threshold: int = 100_000   # auto mode: salt band upper bound

    # --- hashing family ---
    # False: xxhash64 (fast JVM builtin — the scale path). True: md5-prefix
    # 60-bit hashes for shingles AND band keys, replayable bit-for-bit in
    # DuckDB — lets the driver oracle verify the END-TO-END pipeline output.
    portable_hashes: bool = False

    # --- verification ---
    verify_threshold: float = 0.7   # J >= threshold => duplicate pair
    nonzero_threshold: float = 1e-5  # reference EC epilogue (jaccard.cpp:811-819)

    # --- weighted (IDF/CWS) candidate path ---
    # "idf": shingles are weighted by corpus IDF (ln(1 + N/df)) BEFORE
    # hashing — CWS (Ioffe) signatures band with the same LSH machinery and
    # verification scores the exact weighted Jaccard Σmin/Σmax, so
    # boilerplate (license headers, generated preambles) stops producing
    # candidates or accepts at all. Mirrors the reference's weighted pipeline
    # half (standalone_algorithms.hpp:109-124, jaccard.cpp:254-256).
    candidate_weights: str = "none"  # "none" | "idf"
    # weighted-Jaccard accept threshold; None -> verify_threshold. Jw of a
    # boilerplate-only pair is much lower than its unweighted J, so the same
    # numeric threshold is usually right — the knob exists for tuning.
    weighted_verify_threshold: float | None = None

    # --- connected components ---
    max_cc_iterations: int = 50
    checkpoint_every: int = 3

    # --- substring (suffix-array analog) pass ---
    # "linegram" (default): hashed runs of `substring_lines` whole lines —
    # ~1 hash/line, but zero shared grams if the embed was re-wrapped or
    # re-indented (every physical line differs). "winnow": MOSS winnowed
    # char-k-gram fingerprints (Schleimer SIGMOD'03) over whitespace-
    # normalized text — any shared normalized run >= winnow_w + winnow_k - 1
    # chars fires regardless of line breaks, at ~2/winnow_w hashes per char.
    # Part of the delta-store config fingerprint: a linegram store and a
    # winnow store can never silently mix.
    substring_pass: str = "linegram"
    substring_lines: int = 4        # w-line gram width (content-anchored)
    winnow_k: int = 30              # winnow: char-gram length
    winnow_w: int = 50              # winnow: window width (guarantee k+w-1)
    # when the substring pass is on, verify ALSO accepts containment pairs:
    # inter / min(|A|, |B|) >= threshold (a file embedded in a larger file has
    # low symmetric Jaccard but ~1.0 containment — the case the suffix-array
    # pass exists to catch; J-only verify would reject every candidate it adds)
    containment_threshold: float = 0.9
    # containment floor: accept inter/min only when the SMALLER side has at
    # least this many shingles. Without it a tiny stub (license header, empty
    # __init__) is contained at ~1.0 in MANY unrelated files and connected
    # components transitively glues them all into one giant cluster — the
    # small-hub failure mode of containment scoring.
    containment_min_size: int = 50
    # "shingle" (default): containment acceptance is the count-based
    # inter/min rule above — order-blind, so a file whose lines were
    # cherry-picked from MANY places in a bigger file scores ~1.0 without
    # any contiguous shared region. "lcs": pairs passing the shingle rule
    # (but failing the J threshold) are additionally verified with an exact
    # suffix-array longest-common-substring (functions/suffix.py) and kept
    # only when lcs_bytes/min_bytes >= containment_threshold — order-aware,
    # 1.0 iff the smaller file is literally embedded in the larger. A pure
    # refinement: never adds pairs, only removes order-blind false merges.
    # Batch-pipeline mode only: the delta store does not persist content,
    # so it refuses this setting (DeltaDedup raises at construction).
    substring_verify: str = "shingle"

    # --- execution ---
    shuffle_partitions: int = 32
    # >0: the durable shingles checkpoint is written as a BUCKETED external
    # table (CLUSTERED BY id), so verify's two array-attach joins read
    # pre-partitioned data — only the (small) pair side shuffles, the
    # corpus-sized shingle relation is never exchanged again. Verify is the
    # dominant cost at scale (72% of the 1M-file wall, BENCH/BASELINE.md);
    # this trades one bucketed write for zero re-shuffles in every consumer.
    # 0 (default) keeps plain parquet (in-memory runs cannot bucket).
    shingle_buckets: int = 0

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perms:
            raise ValueError("bands * rows_per_band must equal num_perms")
        if self.candidate_weights not in ("none", "idf"):
            raise ValueError(f"unknown candidate_weights {self.candidate_weights!r}")
        if self.shingle_mode not in ("token", "char"):
            raise ValueError(f"unknown shingle_mode {self.shingle_mode!r}")
        if self.substring_verify not in ("shingle", "lcs"):
            raise ValueError(f"unknown substring_verify {self.substring_verify!r}")
        if self.substring_pass not in ("linegram", "winnow"):
            raise ValueError(f"unknown substring_pass {self.substring_pass!r}")
        if self.minhash_impl not in ("auto", "udf", "expr"):
            raise ValueError(f"unknown minhash_impl {self.minhash_impl!r}")

    @property
    def lsh_threshold(self) -> float:
        """Approximate LSH S-curve threshold (1/b)^(1/r)."""
        return (1.0 / self.bands) ** (1.0 / self.rows_per_band)


DEFAULT = PipelineConfig()
