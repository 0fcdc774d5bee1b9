"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship dedup pipeline on sf0.001 documents.
``queries()``/``oracle_sql()`` map one entry per implemented operator from
SURVEY.md §2 onto the driver-provided tables, each with a DuckDB-replayable
ANSI-SQL oracle where the semantics are SQL-expressible. Column names are
aligned on both sides; doubles are only ever produced by a single division /
sqrt of exact integers so both engines agree bit-for-bit.

ALL 38 queries are hash-checked, including the END-TO-END pipeline twice
(``dedup_pipeline_clusters``: MinHash-LSH only; ``dedup_pipeline_full``:
plus the SimHash near-miss pass — its bit-voting and combinatorial block
tables replayed in plain SQL — both on portable hashes with WITH RECURSIVE
connected components) and the ANN family (hyperplane LSH, IVF coarse
quantizer, and cosine near-dup verify — all on integer-quantized arithmetic,
with seeded planes/centroids embedded as SQL VALUES literals). The
production xxhash64/128-perm pipeline config is exercised by ``entry()``,
bench.py, and the recall tests.

Graph encoding used throughout: lineitem is a bipartite order->part edge set
(src = l_orderkey, dst = l_partkey + 10_000_000 where disjoint id spaces are
needed); co-part order pairs replay the reference's jaccard_list semantics
(/root/reference/standalone_algorithms.hpp:109-133).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sycl_jaccard_spark.config import PipelineConfig
from sycl_jaccard_spark.functions.minhash import MERSENNE, make_perms
from sycl_jaccard_spark.functions.shingles import md5_long, shingle_hashes, shingles, tokens
from sycl_jaccard_spark.functions import textstats
from sycl_jaccard_spark.operators.ann import (
    cosine_topk,
    embedding_near_dups,
    ivf_candidates,
    lsh_cosine_candidates,
)
from sycl_jaccard_spark.operators.graph_jaccard import jaccard_all_edges
from sycl_jaccard_spark.operators.lsh import band_hashes, candidate_pairs, minhash_signatures
from sycl_jaccard_spark.operators.normalize import canonical_pairs, invert_direction, symmetrize
from sycl_jaccard_spark.operators.collections import (
    collection_memberships,
    collection_minhash,
    collection_pair_jaccard,
)
from sycl_jaccard_spark.operators.decontaminate import (
    contamination_overlap,
    decontamination_manifest,
)
from sycl_jaccard_spark.operators.pair_jaccard import jaccard_pairs
from sycl_jaccard_spark.plans.pipeline import DedupPipeline
from sycl_jaccard_spark.sources.tables import documents_as_files, load_table

# ---- shared constants (must match the SQL text below) ----
K = 3                      # word-shingle size for document queries
DF_CAP = 50                # max shingle document-frequency joined in pair-gen
SRC_DF_CAP = 10            # max shingle COLLECTION-frequency in source pair-gen
N_PERMS = 16               # portable minhash perms (oracle-replayed)
N_BANDS = 4                # portable LSH bands (rows_per_band = 4)
WINNOW_K = 30              # winnow fingerprint char-gram length
WINNOW_W = 50              # winnow window width (guarantee = k + w - 1 chars)
PART_OFFSET = 10_000_000   # disjoint id space for part vertices
PAIR_MOD = 5               # order-pair subset filter for bounded outputs
TOPK = 5                   # ann top-k
IVF_TRAIN_K = 8            # trained-codebook clusters (ann_ivf_train)
IVF_TRAIN_ITERS = 2        # Lloyd iterations (unrolled in the oracle SQL)
LANE = 0x7FFFFFFF
VERIFY_THRESHOLD = 0.7     # pipeline verify threshold (PipelineConfig default)
EMB_THRESHOLD = 0.35       # emb near-dup cosine cutoff (testdata is near-orthogonal)
BENCH_MOD, BENCH_REM = 7, 3  # synthetic benchmark set: docs with doc_id % 7 == 3
BENCH_TOK_OFF = 10         # benchmark snippet = tokens [11, 50] of the source doc
BENCH_TOK_LEN = 40
DECON_MIN_OVERLAP = 5      # emit contamination pairs sharing >= 5 shingles
DECON_THRESHOLD = 0.5      # drop rule: max containment >= 0.5
QUAL_MIN_TOKENS = 20       # quality gate: < 20 whitespace tokens fails
QUAL_MAX_AVG_TOK_LEN = 4.9   # mean token length above this fails (minified)
QUAL_MIN_DISTINCT_RATIO = 0.35  # distinct/total token ratio below this fails
# stratified mix: relative shares by source, weighted by n_chars; src0's
# share is largest relative to its weight, so it water-fills to rate 1
MIX_TARGETS = {"src0": 4.0, "src1": 2.0, "src17": 3.0, "src3": 1.0}
MIX_SEED = 42
SPLIT_TEST_SHARE = 0.25    # leakage-safe split: expected fraction of clusters
SPLIT_SEED = 9

_PA, _PB = make_perms(N_PERMS, seed=42)

# Session-scoped memo for shared sub-computations: the driver (and bench.py)
# run the contract queries one after another in ONE process, and several
# queries share an expensive prefix (k9 re-scores k4's pairs, the two
# portable-pipeline queries re-run the same pipeline, both IVF consumers
# re-train the same k-means codebook). Results are deterministic, so reuse
# is purely an efficiency matter; keyed by SparkContext identity so a fresh
# session never sees another session's localCheckpointed RDDs.
_MEMO: dict = {}
# observability for bench.py: per-process counters of memo reuse, so bench
# walls can be labeled memo-assisted vs cold (VERDICT r4 #4 — cross-round
# comparisons must not conflate cache hits with engine speedups)
_MEMO_STATS = {"hits": 0, "misses": 0}


def _memo(spark, sf_dir: str, name: str, build):
    # stable context identity (ADVICE r4): id(sc) can be REUSED by CPython
    # after the old context is garbage-collected, which would serve a stale
    # entry holding dead localCheckpointed RDDs to a new session
    sc = spark.sparkContext
    ctx = (sc.applicationId, sc.startTime)
    # evict entries from other SparkContexts: after a session restart they
    # are unreachable (new ctx identity) but would otherwise pin the old
    # context's localCheckpointed blocks for the life of the process
    stale = [k for k in _MEMO if k[0] != ctx]
    for k in stale:
        del _MEMO[k]
    key = (ctx, sf_dir, name)
    val = _MEMO.get(key)
    if val is None:
        _MEMO_STATS["misses"] += 1
        val = build()
        if isinstance(val, DataFrame):
            val = val.localCheckpoint(eager=True)
        _MEMO[key] = val
    else:
        _MEMO_STATS["hits"] += 1
    return val


# =====================================================================
# Spark-side building blocks
# =====================================================================

def _li_edges(spark: SparkSession, sf_dir: str, offset: bool = True) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dst = (F.col("l_partkey") + PART_OFFSET) if offset else F.col("l_partkey")
    return li.select(
        F.col("l_orderkey").cast("long").alias("src"), dst.cast("long").alias("dst")
    ).dropDuplicates(["src", "dst"])


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh: array<string>) word-K-gram shingle sets (lazy builder —
    its only consumer is the memoized hashed relation below)."""
    # the documents parquet is a single small file -> a single input
    # split -> the tokenize+shingle expression chain (the most expensive
    # per-row work in the doc family) runs on ONE core; spread it before
    # computing (measured at sf0.1: the memo build drops 4.5s -> 0.6s)
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return docs.select(
        F.col("doc_id").alias("doc_id"),
        shingles(tokens(F.col("text")), K).alias("sh"),
    )


def _doc_shingle_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle_hashes: array<long>) portable md5-60bit hashes.
    Memoized (r6): the memo used to sit one level DOWN on the shingle
    strings, so all seven consumers re-ran the md5 transform per query;
    hashing once and checkpointing the 8-byte-long arrays is both less work
    and a smaller checkpoint than the ~25-char shingle strings."""
    return _memo(
        spark, sf_dir, "doc_shingle_hashes",
        lambda: _doc_shingles(spark, sf_dir).select(
            "doc_id", shingle_hashes(F.col("sh"), portable=True).alias("shingle_hashes")
        ),
    )


def _portable_cfg() -> PipelineConfig:
    # bucket_cap is set far beyond any sf's bucket size: the DuckDB oracle for
    # lsh_candidates self-joins buckets UNcapped, so the Spark side must not
    # truncate (ADVICE r1: default cap=64 silently diverges once a bucket
    # exceeds it at larger sf).
    return PipelineConfig(
        num_perms=N_PERMS, bands=N_BANDS, rows_per_band=N_PERMS // N_BANDS,
        bucket_cap=10**9,
    )


# =====================================================================
# queries()
# =====================================================================

def q_n1_invert_direction(spark, sf_dir):
    return invert_direction(_li_edges(spark, sf_dir)).orderBy("src", "dst")


def q_n2_symmetrize(spark, sf_dir):
    return symmetrize(_li_edges(spark, sf_dir))


def q_n3_canonical_pairs(spark, sf_dir):
    # no offset: order/part key spaces overlap -> exercises self-loop drop (N4)
    return canonical_pairs(_li_edges(spark, sf_dir, offset=False))


def q_k3_rowsum_degree(spark, sf_dir):
    edges = _li_edges(spark, sf_dir)
    return edges.groupBy(F.col("src").alias("vertex")).agg(F.count("*").alias("degree"))


def q_k3_rowsum_weighted(spark, sf_dir):
    """Weighted rowsum: vol(order) = Σ integer-quantized p_retailprice over
    its distinct parts (K3 weighted, jaccard.cpp:254-256)."""
    edges = _li_edges(spark, sf_dir, offset=False)
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("dst"),
        F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long").alias("w"),
    )
    return (
        edges.join(part, "dst")
        .groupBy(F.col("src").alias("vertex"))
        .agg(F.sum("w").alias("volume"))
    )


def _copart_pairs(spark, sf_dir):
    """Restricted co-part order pairs (both keys ≡ 0 mod PAIR_MOD)."""
    adj = _li_edges(spark, sf_dir, offset=False).filter(F.col("src") % PAIR_MOD == 0)
    a = adj.select(F.col("src").alias("a"), "dst")
    b = adj.select(F.col("src").alias("b"), "dst")
    return (
        a.join(b, "dst").filter(F.col("a") < F.col("b")).select("a", "b").dropDuplicates(["a", "b"])
    )


def _copart_base(spark, sf_dir):
    """Shared K4/K5 base (r6 optimization): ONE co-part self-join scores both
    the unweighted intersection (``inter`` = shared-part count) and the
    weighted one (``wi`` = Σ w over shared parts) per (a, b) pair, plus the
    per-vertex degree and weighted volume. The r5 shape ran the lineitem
    distinct + self-join chain separately per query (k4: pair-gen, then
    RE-derived the intersection via collect_set + array_intersect; k5:
    pair-gen again, then a second element-probe join) — the pair-generating
    self-join already enumerates exactly the shared elements, so counting/
    summing in its groupBy replaces both re-derivations (guide §2.4: two
    operations keyed the same way share one exchange; §2.3: aggregate before
    you shuffle).

    Weight-null semantics mirror the DuckDB oracle exactly: ``w`` is LEFT-
    joined before the pair groupBy (a pair sharing only weightless parts
    keeps inter > 0 with wi -> null -> COALESCE 0, the oracle's
    ``cpairs LEFT JOIN wint``), while ``vol`` comes from the INNER weight
    join (the oracle's ``vol`` CTE over ``wadj``)."""

    def build():
        adj = (
            _li_edges(spark, sf_dir, offset=False)
            .filter(F.col("src") % PAIR_MOD == 0)
            .localCheckpoint(eager=True)
        )
        part = load_table(spark, sf_dir, "part").select(
            F.col("p_partkey").alias("dst"),
            F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long").alias("w"),
        )
        a = adj.join(F.broadcast(part), "dst", "left").select(
            F.col("src").alias("a"), "dst", "w"
        )
        b = adj.select(F.col("src").alias("b"), "dst")
        scored = (
            a.join(b, "dst")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("inter"), F.sum("w").alias("wi"))
        )
        # ONE per-vertex aggregation serves both queries (measured ~40%
        # cheaper than separate deg/vol passes): deg counts every distinct
        # part (left join keeps weightless ones), vol sums the weighted
        # subset (sum skips nulls). Restricting vol to non-null rows
        # reproduces the oracle's INNER-join `vol` CTE exactly — a vertex
        # with zero weighted parts has no vol row and its pairs drop.
        pervertex = (
            a.groupBy(F.col("a").alias("v"))
            .agg(F.count("*").alias("deg"), F.sum("w").alias("vol"))
            .localCheckpoint(eager=True)
        )
        return {
            "scored": scored.localCheckpoint(eager=True),
            "deg": pervertex.select("v", "deg"),
            "vol": pervertex.filter(F.col("vol").isNotNull()).select("v", "vol"),
        }

    return _memo(spark, sf_dir, "copart_base", build)


def q_k4_k6_edge_jaccard(spark, sf_dir):
    """Unweighted exact Jaccard over co-part order pairs — K4+K6 replay.
    Memoized: q_k9_threshold_count thresholds this same scored relation.
    Scored off the fused ``_copart_base`` (inter counted in the pair-gen
    groupBy itself); the degree sides are per-vertex aggregates of the
    PAIR_MOD-restricted adjacency — |V|-sized by construction — so they
    broadcast (guide §3.1)."""
    from sycl_jaccard_spark.functions.jaccard import jaccard_from_counts

    def build():
        base = _copart_base(spark, sf_dir)
        da = base["deg"].select(F.col("v").alias("a"), F.col("deg").alias("size_a"))
        db = base["deg"].select(F.col("v").alias("b"), F.col("deg").alias("size_b"))
        return (
            base["scored"].select("a", "b", "inter")
            .join(F.broadcast(da), "a")
            .join(F.broadcast(db), "b")
            .select(
                "a", "b", "inter", "size_a", "size_b",
                jaccard_from_counts(
                    F.col("inter"), F.col("size_a"), F.col("size_b")
                ).alias("jaccard"),
            )
        )

    return _memo(spark, sf_dir, "k4_scored", build)


def q_k5_weighted_pairs(spark, sf_dir):
    """Weighted pair Jaccard: Wi/(vol_a+vol_b-Wi) with integer part weights
    (K5 weighted + K6, standalone_algorithms.hpp:52-69). Scored off the fused
    ``_copart_base`` (wi summed in the pair-gen groupBy — the r5 shape paid a
    second per-element probe join; the relational probe impl remains
    ``jaccard_pairs_weighted``, dual-impl-tested in tests/test_graph_operators
    .py). Volume sides broadcast like k4's degrees."""
    from sycl_jaccard_spark.functions.jaccard import weighted_jaccard_from_sums

    base = _copart_base(spark, sf_dir)
    va = base["vol"].select(F.col("v").alias("a"), F.col("vol").alias("vol_a"))
    vb = base["vol"].select(F.col("v").alias("b"), F.col("vol").alias("vol_b"))
    zero = F.lit(0).cast("long")
    return (
        base["scored"].select("a", "b", "wi")
        .join(F.broadcast(va), "a")
        .join(F.broadcast(vb), "b")
        .select(
            "a",
            "b",
            F.coalesce("wi", zero).alias("wi"),
            "vol_a",
            "vol_b",
            weighted_jaccard_from_sums(
                F.coalesce("wi", zero), F.col("vol_a"), F.col("vol_b")
            ).alias("jaccard"),
        )
    )


def q_k9_threshold_count(spark, sf_dir):
    scored = q_k4_k6_edge_jaccard(spark, sf_dir)
    return scored.filter(F.col("jaccard") > 1e-5).agg(F.count("*").alias("nonzero_pairs"))


def q_exact_dup_groups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.sha2("text", 256).alias("sha"))
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("rep_id"))
        .filter(F.col("n_docs") > 1)
    )


def q_doc_shingle_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(shingles(tokens(F.col("text")), K)).cast("long").alias("n_shingles"),
        textstats.token_count(F.col("text")).alias("n_tokens"),
    )


def _rare_shingle_scored(spark, sf_dir):
    """Shared candidate-gen + verify for the doc-pair queries: pairs sharing
    a rare (df<=DF_CAP) shingle via the inverted index, scored with exact
    shingle-set counts. Both q_doc_pair_jaccard and q_doc_pair_containment
    must stay on THIS one candidate set (their oracles assume it).

    Elements are the portable md5-60bit HASHES of the shingles, not the
    ~25-char strings: the distinct/self-join/array_intersect chain is
    elementwise-comparison-bound, and 8-byte longs keep it long-typed end
    to end (counts are identical — the hash is injective on the corpus
    vocabulary; the oracles compare the same integer counts)."""
    def build():
        # r6 shape: ONE lazy plan — the r5 build eagerly checkpointed the
        # exploded relation and the rare-filtered index (two extra jobs); the
        # explode now derives from the memoized doc_shingle_hashes checkpoint
        # (cheap to recompute) and the df-count, the rare filter join and the
        # pair self-join all hash on `s`, so ReuseExchange shares one
        # Exchange(s) across them (guide §2.4). Measured ~equal to a forced
        # broadcast of the rare keys, without hinting a vocabulary-sized
        # relation broadcastable (a count-window variant measured slower —
        # the per-bucket sort costs more than the reused aggregate).
        shh = _doc_shingle_hashes(spark, sf_dir)
        sh = shh.select("doc_id", F.explode("shingle_hashes").alias("s"))
        rare = (
            sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= DF_CAP)
            .select("s")
        )
        sh_r = sh.join(rare, "s")
        pairs = (
            sh_r.select(F.col("doc_id").alias("a"), "s")
            .join(sh_r.select(F.col("doc_id").alias("b"), "s"), "s")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .dropDuplicates(["a", "b"])
        )
        items = shh.select(
            F.col("doc_id").alias("id"), F.col("shingle_hashes").alias("set")
        )
        return jaccard_pairs(items, pairs)

    return _memo(spark, sf_dir, "rare_shingle_scored", build)


def q_doc_pair_jaccard(spark, sf_dir):
    """Exact shingle Jaccard for doc pairs sharing a (df<=DF_CAP) shingle —
    the verify stage over an inverted-index candidate set."""
    return _rare_shingle_scored(spark, sf_dir).select(
        "a", "b", "inter", "size_a", "size_b", "jaccard"
    )


def q_doc_pair_containment(spark, sf_dir):
    """Containment score C = inter/min(|A|,|B|) over the same rare-shingle
    candidate set as doc_pair_jaccard — the substring pass's acceptance rule
    (a doc embedded in a larger doc scores ~1.0 here with low symmetric J)."""
    from sycl_jaccard_spark.functions.jaccard import containment_from_counts

    return _rare_shingle_scored(spark, sf_dir).select(
        "a", "b",
        containment_from_counts(F.col("inter"), F.col("size_a"), F.col("size_b")).alias(
            "containment"
        ),
    )


def q_doc_pair_lcs_contained(spark, sf_dir):
    """Suffix-array exact-LCS verification of the substring pass
    (functions/suffix.py) on the same rare-shingle candidate set:
    ``contained`` is True iff byte-LCS == min byte length, i.e. the smaller
    text is literally a substring of the larger (or the texts are equal).

    The Spark side derives the flag from a genuine generalized suffix array
    (Manber-Myers doubling + binary-lifted LCP); the DuckDB oracle checks the
    same boundary with an independent ``position(short IN long)`` predicate —
    byte and character containment coincide for valid UTF-8 (lead/ASCII bytes
    never appear as continuation bytes), so a hash match here SQL-certifies
    the suffix array at the containment boundary. The LCS length itself is
    property-tested against an O(n·m) DP oracle in tests/test_suffix.py."""
    from sycl_jaccard_spark.functions.suffix import pair_lcs

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), F.col("text").alias("content")
    )
    pairs = _rare_shingle_scored(spark, sf_dir).select("a", "b")
    return pair_lcs(pairs, docs).select(
        "a",
        "b",
        F.col("min_bytes").cast("long").alias("min_bytes"),
        (F.col("lcs_len") == F.col("min_bytes")).alias("contained"),
    )


def _bench_set(spark, sf_dir):
    """Deterministic synthetic benchmark set: for every document with
    ``doc_id % BENCH_MOD == BENCH_REM`` and ≥ BENCH_TOK_OFF+BENCH_TOK_LEN
    tokens, the item's text is the contiguous token window
    [BENCH_TOK_OFF, BENCH_TOK_OFF+BENCH_TOK_LEN) — a faithful stand-in for an
    eval prompt extracted from a leaked source document (its K-gram set is by
    construction a subset of the source doc's, so the planted positives score
    containment 1.0). Returns (bench_id, ngram_hashes: array<long>)."""

    def build():
        docs = load_table(spark, sf_dir, "documents")
        toks = tokens(F.col("text"))
        snippet = F.slice(toks, BENCH_TOK_OFF + 1, BENCH_TOK_LEN)
        return (
            docs.filter(F.col("doc_id") % BENCH_MOD == BENCH_REM)
            .select(
                F.col("doc_id").alias("bench_id"),
                toks.alias("tk"),
                shingle_hashes(shingles(snippet, K), portable=True).alias(
                    "ngram_hashes"
                ),
            )
            .filter(F.size("tk") >= BENCH_TOK_OFF + BENCH_TOK_LEN)
            .select("bench_id", "ngram_hashes")
        )

    return _memo(spark, sf_dir, "bench_set", build)


def q_decontam_overlap(spark, sf_dir):
    """Benchmark decontamination probe (operators/decontaminate.py): n-gram
    overlap + one-sided containment of every document against the synthetic
    benchmark set. The benchmark side is broadcast — the corpus scan never
    shuffles, which is the whole 100 TB design of the operator."""
    docs = _doc_shingle_hashes(spark, sf_dir).select(
        "doc_id", F.col("shingle_hashes").alias("ngram_hashes")
    )
    return contamination_overlap(
        docs, _bench_set(spark, sf_dir), min_overlap=DECON_MIN_OVERLAP
    )


def q_decontam_manifest(spark, sf_dir):
    """Per-document drop manifest over ALL documents: max containment vs any
    benchmark item, and the contaminated flag at DECON_THRESHOLD."""
    docs = _doc_shingle_hashes(spark, sf_dir).select(
        "doc_id", F.col("shingle_hashes").alias("ngram_hashes")
    )
    overlaps = contamination_overlap(
        docs, _bench_set(spark, sf_dir), min_overlap=DECON_MIN_OVERLAP
    )
    return decontamination_manifest(
        load_table(spark, sf_dir, "documents"), overlaps, threshold=DECON_THRESHOLD
    )


def q_src_pair_jaccard(spark, sf_dir):
    """Collection-level (fork/mirror) similarity: exact Jaccard + containment
    between SOURCES, where a source's set is the distinct union of its
    documents' word-K-gram shingles (operators/collections.py). Candidate
    pairs share at least one shingle present in ≤ SRC_DF_CAP sources — the
    inverted-index df-cap discipline one granularity up; scores are exact
    over the FULL sets (capped shingles still count in sizes/intersections).
    Elements are the portable md5-60bit shingle HASHES, not the strings:
    the membership relation is join-heavy and 8-byte keys keep every probe
    long-typed (the DuckDB oracle replays the same hash). The membership
    relation feeds four consumers, so it is memoized/checkpointed once
    rather than re-exploded per consumer."""

    def build():
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
        return collection_memberships(
            _doc_shingle_hashes(spark, sf_dir).join(docs, "doc_id"),
            "source",
            "shingle_hashes",
        )

    mem = _memo(spark, sf_dir, "src_memberships", build)
    return collection_pair_jaccard(
        mem, "source", "shingle_hashes", max_df=SRC_DF_CAP, memberships=mem
    )


def q_doc_winnow_fps(spark, sf_dir):
    """Winnowed char-gram fingerprints (Schleimer SIGMOD'03 — the MOSS
    scheme; functions/shingles.py:winnow_hashes) over whitespace-normalized
    text: the substring pass's re-wrap-robust candidate variant
    (cfg.substring_pass="winnow"). Entirely JVM-side (nested let-bound
    higher-order functions, no UDF); the DuckDB oracle replays the full
    normalize → char-gram-hash → sliding-window-min chain bit-for-bit."""
    from sycl_jaccard_spark.functions.shingles import winnow_hashes

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(
            winnow_hashes(F.col("text"), WINNOW_K, WINNOW_W, portable=True)
        ).alias("fp"),
    )


def q_idf_weights(spark, sf_dir):
    """Corpus IDF over the portable shingle relation — the weight source of
    the weighted (CWS) dedup pipeline mode (candidate_weights="idf"; the
    reference's weighted pipeline half, standalone_algorithms.hpp:109-124).
    w = ln(1 + N/df) is a libm log, NOT bit-identical between JVM and DuckDB
    (measured: ~5% of values differ by 1 ulp) — so the contract row compares
    the MICRO-quantized weight floor(w*1e6 + 0.5) (flip risk ~1e-9/row)
    alongside the exact integer df. CWS itself stays statistically gated
    (functions/weighted_minhash.py) since exp/log floats aren't SQL-portable."""
    from sycl_jaccard_spark.operators.weighted_dedup import idf_weights

    idf = idf_weights(_doc_shingle_hashes(spark, sf_dir), id_col="doc_id")
    return idf.select(
        "elem",
        F.col("df").cast("long").alias("df"),
        F.floor(F.col("w") * 1e6 + F.lit(0.5)).cast("long").alias("w_micro"),
    )


def _portable_signed(spark, sf_dir):
    """Shared portable MinHash signatures — memoized across the three
    signature/banding/candidate queries (identical prefix)."""
    return _memo(
        spark, sf_dir, "portable_signed",
        lambda: minhash_signatures(
            _doc_shingle_hashes(spark, sf_dir), _portable_cfg(), "shingle_hashes"
        ),
    )


def q_minhash_signatures(spark, sf_dir):
    """(doc_id, perm, sig) — portable MinHash, oracle-replayed in SQL."""
    signed = _portable_signed(spark, sf_dir)
    return signed.select(
        "doc_id", F.posexplode("sig").alias("perm", "sig")
    ).select("doc_id", F.col("perm").cast("long").alias("perm"), "sig")


def q_lsh_band_hashes(spark, sf_dir):
    cfg = _portable_cfg()
    signed = _portable_signed(spark, sf_dir)
    return band_hashes(signed, cfg, "doc_id", portable=True).select(
        "doc_id", F.col("band").cast("long").alias("band"), "band_hash"
    )


def q_lsh_candidates(spark, sf_dir):
    cfg = _portable_cfg()
    signed = _portable_signed(spark, sf_dir)
    banded = band_hashes(signed, cfg, "doc_id", portable=True)
    return candidate_pairs(banded, cfg, "doc_id")


def _src_signed(spark, sf_dir):
    """Collection (source) portable MinHash signatures by union closure —
    one groupBy of elementwise mins over the memoized per-doc signatures
    (operators/collections.collection_minhash)."""
    def build():
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
        signed = _portable_signed(spark, sf_dir).join(docs, "doc_id")
        return collection_minhash(signed, "source", N_PERMS)

    return _memo(spark, sf_dir, "src_signed", build)


def q_src_minhash_sigs(spark, sf_dir):
    """(source, perm, sig) — collection-level MinHash lifted from the
    per-doc signatures via the min-wise union-closure property; the oracle
    replays it as min(sig) per (source, perm) over the per-doc SQL
    signatures, which equals the MinHash of the source's shingle union."""
    return (
        _src_signed(spark, sf_dir)
        .select(F.col("collection").alias("source"), F.posexplode("sig").alias("perm", "sig"))
        .select("source", F.col("perm").cast("long").alias("perm"), "sig")
    )


def q_src_lsh_candidates(spark, sf_dir):
    """Fork/mirror CANDIDATE pairs at collection granularity: LSH banding
    over the union-closure signatures — the 10^8-collection scale path
    (band the 128-long signature, never the raw membership relation)."""
    cfg = _portable_cfg()
    banded = band_hashes(
        _src_signed(spark, sf_dir), cfg, "collection", portable=True
    )
    return candidate_pairs(banded, cfg, "collection")


def q_doc_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", textstats.fingerprint(F.col("text")).alias("fp"))


def q_lang_id(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", textstats.lang_id(F.col("text")).alias("lang_pred"))


def q_quality_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    st = textstats.quality_stats(F.col("text"))
    return docs.select(
        "doc_id",
        st["n_tokens"].alias("n_tokens"),
        st["n_distinct"].alias("n_distinct"),
        st["tok_char_sum"].alias("tok_char_sum"),
        st["avg_tok_len"].alias("avg_tok_len"),
    )


def q_token_stats_bpe(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", textstats.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens")
    )


def q_token_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(20)
    )


def q_ann_cosine_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 30)
    return cosine_topk(queries, emb, TOPK).orderBy("query_id", "rank")


def _portable_clusters(spark, sf_dir, simhash: bool) -> DataFrame:
    """Shared portable-hash pipeline clusters — memoized per (session, sf,
    simhash): q_dedup_pipeline_clusters and q_dedup_rep_selection consume the
    identical no-simhash run."""

    def build():
        docs = load_table(spark, sf_dir, "documents")
        files = documents_as_files(docs)
        cfg = PipelineConfig(
            num_perms=N_PERMS, bands=N_BANDS, rows_per_band=N_PERMS // N_BANDS,
            shingle_k=K, bucket_cap=10**9, portable_hashes=True,
        )
        return DedupPipeline(spark, cfg, enable_simhash=simhash).run(files).clusters

    return _memo(spark, sf_dir, f"portable_clusters_simhash={simhash}", build)


def q_dedup_pipeline_clusters(spark, sf_dir):
    """END-TO-END pipeline flagship, portable-hash config: exact dedup →
    shingle → MinHash → LSH → exact-Jaccard verify (>= 0.7) → connected
    components. Every stage is replayed by the DuckDB oracle below (the
    compareCoords golden-output analog, compareCoords.cpp:174-320), with CC
    as a WITH RECURSIVE min-label reachability closure."""
    return _portable_clusters(spark, sf_dir, simhash=False).orderBy("id")


def q_dedup_pipeline_full(spark, sf_dir):
    """Flagship with the FULL feature set — SimHash near-miss pass enabled on
    top of MinHash-LSH — on the portable hash family, so the ENTIRE pipeline
    (SimHash bit-voting + combinatorial block tables included) is replayed by
    the DuckDB oracle: bit b of a doc's SimHash is set iff
    ``2 * sum((h >> b) & 1) > n`` over its shingle hashes (plain SQL), and the
    block-table buckets join on the block values directly (Spark's
    xxhash64(combo, blocks...) key is equal iff the block values are equal).
    The production xxhash64/128-perm twin of this exact plan is exercised by
    ``entry()``, bench.py, and the recall/consistency tests."""
    return _portable_clusters(spark, sf_dir, simhash=True).orderBy("id")


def q_delta_dedup_clusters(spark, sf_dir):
    """INCREMENTAL (delta) dedup runner over the same corpus, delivered in
    TWO batches (doc_id parity split) to a persistent store
    (plans/delta.py): each batch is signed once, banded against the stored
    corpus, verified only on pairs touching a new id, and labels are merged
    by incremental connected components. Label-for-label equivalent to one
    full pipeline run (the tested delta≡full theorem), so the oracle is the
    SAME end-to-end DuckDB replay as dedup_pipeline_clusters."""
    import shutil
    import tempfile

    from sycl_jaccard_spark.plans.delta import DeltaDedup

    docs = load_table(spark, sf_dir, "documents")
    files = documents_as_files(docs).select("id", "content")
    cfg = PipelineConfig(
        num_perms=N_PERMS, bands=N_BANDS, rows_per_band=N_PERMS // N_BANDS,
        shingle_k=K, bucket_cap=10**9, portable_hashes=True,
    )
    store_dir = tempfile.mkdtemp(prefix="delta_contract_")
    try:
        store = DeltaDedup(spark, f"{store_dir}/store", cfg, enable_simhash=False)
        for parity in (0, 1):
            store.add_batch(files.filter(F.pmod("id", F.lit(2)) == parity))
        # materialize BEFORE the store dir is removed — the clusters() plan
        # reads the store's parquet lazily
        return store.clusters().orderBy("id").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(store_dir, ignore_errors=True)


def q_delta_remove_clusters(spark, sf_dir):
    """The SHRINK half of the delta store (plans/delta.py remove_ids):
    ingest the corpus in two deliveries, then tombstone every doc_id ≡ 3
    (mod 17) — exercising rep succession (removed exact-dup reps hand their
    shingle/banded rows and edges to the min surviving duplicate) and
    component re-labeling through the label_fix overlay. By the tested
    removal≡full theorem (tests/test_delta.py), clusters() over the
    survivors equals one full pipeline run over the surviving corpus, so the
    oracle is the SAME end-to-end DuckDB replay restricted to survivors."""
    import shutil
    import tempfile

    from sycl_jaccard_spark.plans.delta import DeltaDedup

    docs = load_table(spark, sf_dir, "documents")
    files = documents_as_files(docs).select("id", "content")
    cfg = PipelineConfig(
        num_perms=N_PERMS, bands=N_BANDS, rows_per_band=N_PERMS // N_BANDS,
        shingle_k=K, bucket_cap=10**9, portable_hashes=True,
    )
    store_dir = tempfile.mkdtemp(prefix="delta_rm_contract_")
    try:
        store = DeltaDedup(spark, f"{store_dir}/store", cfg, enable_simhash=False)
        for parity in (0, 1):
            store.add_batch(files.filter(F.pmod("id", F.lit(2)) == parity))
        store.remove_ids(files.filter(F.pmod("id", F.lit(17)) == 3).select("id"))
        return store.clusters().orderBy("id").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(store_dir, ignore_errors=True)


def q_delta_compact_clusters(spark, sf_dir):
    """The MAINTENANCE epoch of the delta store (plans/delta.py compact):
    the full lifecycle — two deliveries, a tombstone epoch (doc_id ≡ 3 mod
    17), then compact(), which folds every batch partition into one
    consolidated partition per relation, applies the label closure/fix
    overlays into the base, and physically purges tombstoned rows. Labels
    are invariant under compaction (tested in tests/test_delta.py), so the
    post-compaction clusters() must STILL equal a full pipeline run over
    the survivors — the oracle is the same survivor-restricted DuckDB
    replay as delta_remove_clusters, now checked against a store whose
    overlay relations have been folded away."""
    import shutil
    import tempfile

    from sycl_jaccard_spark.plans.delta import DeltaDedup

    docs = load_table(spark, sf_dir, "documents")
    files = documents_as_files(docs).select("id", "content")
    cfg = PipelineConfig(
        num_perms=N_PERMS, bands=N_BANDS, rows_per_band=N_PERMS // N_BANDS,
        shingle_k=K, bucket_cap=10**9, portable_hashes=True,
    )
    store_dir = tempfile.mkdtemp(prefix="delta_cp_contract_")
    try:
        store = DeltaDedup(spark, f"{store_dir}/store", cfg, enable_simhash=False)
        for parity in (0, 1):
            store.add_batch(files.filter(F.pmod("id", F.lit(2)) == parity))
        store.remove_ids(files.filter(F.pmod("id", F.lit(17)) == 3).select("id"))
        store.compact(files_per_relation=4)
        return store.clusters().orderBy("id").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(store_dir, ignore_errors=True)


def q_delta_contam_manifest(spark, sf_dir):
    """INCREMENTAL decontamination (plans/delta.py bench_snapshot= leg): a
    bench-enabled delta store ingests the corpus in TWO deliveries, probing
    only each delivery's never-seen contents against the frozen benchmark
    set; exact copies inherit their content's score through sha256. The
    store manifest is score-for-score the batch operator's manifest over the
    union (tested in tests/test_delta.py), so the oracle is the SAME DuckDB
    probe replay as decontam_manifest."""
    import shutil
    import tempfile

    from sycl_jaccard_spark.plans.delta import DeltaDedup

    docs = load_table(spark, sf_dir, "documents")
    files = documents_as_files(docs).select("id", "content")
    cfg = PipelineConfig(
        num_perms=N_PERMS, bands=N_BANDS, rows_per_band=N_PERMS // N_BANDS,
        shingle_k=K, bucket_cap=10**9, portable_hashes=True,
    )
    store_dir = tempfile.mkdtemp(prefix="delta_decon_contract_")
    try:
        store = DeltaDedup(
            spark, f"{store_dir}/store", cfg, enable_simhash=False,
            bench_snapshot=_bench_set(spark, sf_dir),
            bench_min_overlap=DECON_MIN_OVERLAP,
        )
        for parity in (0, 1):
            store.add_batch(files.filter(F.pmod("id", F.lit(2)) == parity))
        return (
            store.contamination_manifest(threshold=DECON_THRESHOLD)
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(store_dir, ignore_errors=True)


def q_dedup_rep_selection(spark, sf_dir):
    """Corpus-level dedup ACTION on top of the portable pipeline clusters:
    longest-content representative per cluster (ties -> min id) and a full
    (id, cluster, rep_id, kept) manifest — operators/representatives.py.
    The oracle replays the whole pipeline AND the rep selection in SQL."""
    from sycl_jaccard_spark.operators.representatives import deduplicate_corpus

    docs = load_table(spark, sf_dir, "documents")
    files = documents_as_files(docs)
    clusters = _portable_clusters(spark, sf_dir, simhash=False)
    _, manifest = deduplicate_corpus(
        files.select("id", "content"), clusters, strategy="longest"
    )
    return manifest.select(
        F.col("id").cast("long"),
        F.col("cluster").cast("long"),
        F.col("rep_id").cast("long"),
        F.col("kept").cast("int"),
    )


def q_clean_training_manifest(spark, sf_dir):
    """The composed corpus ACTION (operators/representatives.py
    training_set): decontaminate FIRST (drop every document leaking a
    benchmark item at DECON_THRESHOLD), then keep one longest-content
    representative per near-dup cluster among the SURVIVORS — a cluster
    whose longest member is a leak keeps its best clean member
    (representative succession). One manifest row per document: (id,
    cluster, rep_id, max_containment, keep, drop_reason). The oracle
    replays the whole pipeline, the benchmark probe AND the
    succession-aware rep selection in one SQL statement."""
    from sycl_jaccard_spark.operators.representatives import training_set

    docs = load_table(spark, sf_dir, "documents")
    files = documents_as_files(docs)
    clusters = _portable_clusters(spark, sf_dir, simhash=False)
    contam = q_decontam_manifest(spark, sf_dir)
    _, manifest = training_set(
        files.select("id", "content"), clusters, contam, strategy="longest"
    )
    return manifest.select(
        F.col("id").cast("long"),
        F.col("cluster").cast("long"),
        F.col("rep_id").cast("long"),
        F.col("max_containment").cast("double"),
        F.col("keep").cast("boolean"),
        F.col("drop_reason").cast("string"),
    )


def q_training_manifest_quality(spark, sf_dir):
    """training_set with the QualityGate enabled — the three-reason
    manifest (contaminated / low_quality / duplicate, precedence in that
    order). Representatives are ranked among members that pass BOTH gates,
    so a cluster whose longest member is a leak or junk keeps its best
    surviving member. The oracle replays clustering, the benchmark probe,
    the token-statistics gate and the succession-aware rep selection in one
    SQL statement."""
    from sycl_jaccard_spark.operators.representatives import (
        QualityGate,
        training_set,
    )

    docs = load_table(spark, sf_dir, "documents")
    files = documents_as_files(docs)
    clusters = _portable_clusters(spark, sf_dir, simhash=False)
    contam = q_decontam_manifest(spark, sf_dir)
    gate = QualityGate(
        min_tokens=QUAL_MIN_TOKENS,
        max_avg_tok_len=QUAL_MAX_AVG_TOK_LEN,
        min_distinct_ratio=QUAL_MIN_DISTINCT_RATIO,
    )
    _, manifest = training_set(
        files.select("id", "content"), clusters, contam,
        strategy="longest", quality=gate,
    )
    return manifest.select(
        F.col("id").cast("long"),
        F.col("cluster").cast("long"),
        F.col("rep_id").cast("long"),
        F.col("max_containment").cast("double"),
        F.col("keep").cast("boolean"),
        F.col("drop_reason").cast("string"),
    )


def q_corpus_mix_sample(spark, sf_dir):
    """Water-filled stratified mix (operators/mixing.py): deterministic
    portable-hash sampling of the documents table to MIX_TARGETS source
    shares weighted by n_chars. The scarcest source (src0: largest share
    per unit weight) is taken whole; the others thin to proportion. The
    oracle replays the per-source weights, the fill level, the rates and
    the md5-threshold filter in one SQL statement."""
    from sycl_jaccard_spark.operators.mixing import stratified_mix

    docs = load_table(spark, sf_dir, "documents")
    sampled, _rates = stratified_mix(
        docs.select("doc_id", "source", "n_chars"),
        MIX_TARGETS,
        source_col="source",
        weight_col="n_chars",
        id_col="doc_id",
        seed=MIX_SEED,
    )
    return sampled.select(
        F.col("doc_id").cast("long"), F.col("source").cast("string")
    )


def q_cluster_split_assign(spark, sf_dir):
    """Leakage-safe train/test split (operators/mixing.py
    leakage_safe_split): every member of a near-dup cluster is assigned to
    the same side by hashing the CLUSTER label — a doc-level split would
    leak near-duplicates of training docs into eval. The oracle replays
    clustering and the md5 threshold on the label in one SQL statement."""
    from sycl_jaccard_spark.operators.mixing import leakage_safe_split

    clusters = _portable_clusters(spark, sf_dir, simhash=False)
    return leakage_safe_split(
        clusters, SPLIT_TEST_SHARE, seed=SPLIT_SEED
    ).select(
        F.col("id").cast("long"),
        F.col("cluster").cast("long"),
        F.col("split").cast("string"),
    )


def q_ann_lsh_candidates(spark, sf_dir):
    # bucket_cap is non-triggering here: the DuckDB oracle self-joins buckets
    # uncapped, so both sides must keep every member (cap behavior is tested
    # separately in tests/test_ann_multimodal_streaming.py).
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_cosine_candidates(emb, dim=64, n_planes=32, bands=4, seed=42, bucket_cap=10**9)


def _trained_centroids(spark, sf_dir, emb):
    """The trained Lloyd codebook both IVF consumer queries run on — the
    production default VERDICT r3 #4 asked for (train_ivf_centroids replaces
    the seeded random stand-in; the oracle reuses the unrolled training CTEs
    as its centroid source, so training AND consumption are replayed).
    Memoized: training is deterministic, so the second consumer (and
    ann_ivf_train itself) reuses the codebook instead of re-running Lloyd."""
    from sycl_jaccard_spark.operators.ann import train_ivf_centroids

    return _memo(
        spark, sf_dir, "ivf_codebook",
        lambda: train_ivf_centroids(
            emb, dim=64, n_centroids=IVF_TRAIN_K, n_iters=IVF_TRAIN_ITERS, seed=42
        ),
    )


def q_ann_ivf_candidates(spark, sf_dir):
    # uncapped for oracle parity (cap behavior covered by the skew test);
    # TRAINED codebook (distributed Lloyd k-means), not the random stand-in
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_candidates(
        emb, dim=64, n_centroids=IVF_TRAIN_K, nprobe=2, seed=42,
        bucket_cap=10**9, centroids_q=_trained_centroids(spark, sf_dir, emb),
    )


def q_ann_ivf_train(spark, sf_dir):
    """Distributed Lloyd k-means codebook training (operators/ann.py:
    train_ivf_centroids) — the trained coarse quantizer that replaces the
    seeded random stand-in via ``ivf_candidates(centroids_q=...)``. Exact
    int64 arithmetic end-to-end (quantized vectors, integer argmin, half-
    away-from-zero integer means), so DuckDB replays the full unrolled
    training bit-for-bit. Returns the codebook as (cid, pos, val) rows."""
    from sycl_jaccard_spark.operators.ann import train_ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _trained_centroids(spark, sf_dir, emb)
    rows = [
        (int(cid), int(pos), int(val))
        for cid in range(cents.shape[0])
        for pos, val in enumerate(cents[cid])
    ]
    return spark.createDataFrame(rows, "cid INT, pos INT, val BIGINT")


def q_emb_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs: IVF candidates -> exact quantized
    cosine filter (the dense-vector sibling of MinHash->exact-Jaccard).
    Threshold 0.35: the driver's embeddings are near-orthogonal randoms
    (pairwise max ~0.51), so a production 0.9 would select nothing — the
    query exercises the full candidate->verify->filter path instead."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dups(
        emb, dim=64, threshold=EMB_THRESHOLD, method="ivf",
        n_centroids=IVF_TRAIN_K, nprobe=2, seed=42, bucket_cap=10**9,
        centroids_q=_trained_centroids(spark, sf_dir, emb),
    )


def q_emb_delta_near_dups(spark, sf_dir):
    """INCREMENTAL embedding near-dup store (plans/emb_delta.py) — the
    dense-vector twin of delta_dedup_clusters: the embeddings table is
    delivered in TWO batches (vec_id parity split) to a persistent store
    holding quantized vectors, frozen-codebook IVF list memberships and
    verified cosine edges; each delivery probes only lists that gained a
    member and verifies only pairs touching a new id. Edge-for-edge
    equivalent to one batch embedding_near_dups run (the tested delta≡batch
    theorem, tests/test_emb_delta.py), so the oracle is the SAME trained-IVF
    + exact-cosine DuckDB replay as emb_near_dups."""
    import shutil
    import tempfile

    from sycl_jaccard_spark.plans.emb_delta import EmbeddingDeltaStore

    emb = load_table(spark, sf_dir, "embeddings")
    store_dir = tempfile.mkdtemp(prefix="emb_delta_contract_")
    try:
        store = EmbeddingDeltaStore(
            spark, f"{store_dir}/store", dim=64,
            centroids_q=_trained_centroids(spark, sf_dir, emb),
            threshold=EMB_THRESHOLD, nprobe=2, bucket_cap=10**9,
        )
        for parity in (0, 1):
            store.add_batch(emb.filter(F.pmod("vec_id", F.lit(2)) == parity))
        # materialize BEFORE the store dir is removed — edges() reads the
        # store's parquet lazily
        return store.edges().orderBy("a", "b").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(store_dir, ignore_errors=True)


# =====================================================================
# driver contract
# =====================================================================

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full dedup pipeline (shingle → MinHash-LSH + SimHash →
    exact-Jaccard verify → connected components) on sf0.001 documents, at the
    PRODUCTION configuration (xxhash64 shingles, MinHash 128, LSH 32x4) — the
    same config bench.py measures."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    result = DedupPipeline(spark, PipelineConfig(), enable_simhash=True).run(
        documents_as_files(docs)
    )
    return result.clusters.orderBy("id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "n1_invert_direction": q_n1_invert_direction,
        "n2_symmetrize": q_n2_symmetrize,
        "n3_canonical_pairs": q_n3_canonical_pairs,
        "k3_rowsum_degree": q_k3_rowsum_degree,
        "k3_rowsum_weighted": q_k3_rowsum_weighted,
        "k4_k6_edge_jaccard": q_k4_k6_edge_jaccard,
        "k5_weighted_pairs": q_k5_weighted_pairs,
        "k9_threshold_count": q_k9_threshold_count,
        "exact_dup_groups": q_exact_dup_groups,
        "doc_shingle_stats": q_doc_shingle_stats,
        "doc_pair_jaccard": q_doc_pair_jaccard,
        "doc_pair_containment": q_doc_pair_containment,
        "doc_pair_lcs_contained": q_doc_pair_lcs_contained,
        "decontam_overlap": q_decontam_overlap,
        "decontam_manifest": q_decontam_manifest,
        "src_pair_jaccard": q_src_pair_jaccard,
        "src_minhash_sigs": q_src_minhash_sigs,
        "src_lsh_candidates": q_src_lsh_candidates,
        "doc_winnow_fps": q_doc_winnow_fps,
        "idf_weights": q_idf_weights,
        "minhash_signatures": q_minhash_signatures,
        "lsh_band_hashes": q_lsh_band_hashes,
        "lsh_candidates": q_lsh_candidates,
        "doc_fingerprint": q_doc_fingerprint,
        "lang_id": q_lang_id,
        "quality_stats": q_quality_stats,
        "token_stats_bpe": q_token_stats_bpe,
        "token_topk": q_token_topk,
        "ann_cosine_topk": q_ann_cosine_topk,
        "dedup_pipeline_clusters": q_dedup_pipeline_clusters,
        "delta_dedup_clusters": q_delta_dedup_clusters,
        "delta_remove_clusters": q_delta_remove_clusters,
        "delta_compact_clusters": q_delta_compact_clusters,
        "delta_contam_manifest": q_delta_contam_manifest,
        "dedup_rep_selection": q_dedup_rep_selection,
        "clean_training_manifest": q_clean_training_manifest,
        "training_manifest_quality": q_training_manifest_quality,
        "corpus_mix_sample": q_corpus_mix_sample,
        "cluster_split_assign": q_cluster_split_assign,
        "dedup_pipeline_full": q_dedup_pipeline_full,
        "ann_lsh_candidates": q_ann_lsh_candidates,
        "ann_ivf_candidates": q_ann_ivf_candidates,
        "ann_ivf_train": q_ann_ivf_train,
        "emb_near_dups": q_emb_near_dups,
        "emb_delta_near_dups": q_emb_delta_near_dups,
    }


# =====================================================================
# oracle_sql() — DuckDB replays
# =====================================================================

_TOKS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')"

# distinct sorted word-K-gram shingles per doc (K = 3)
_SH = f"""
sh AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= {K}
              THEN list_sort(list_distinct(list_transform(range(1, len(tk) - {K} + 2),
                   i -> array_to_string(tk[i:i+{K - 1}], ' '))))
              ELSE [array_to_string(tk, ' ')] END AS s
  FROM (SELECT doc_id, {_TOKS} AS tk FROM documents)
)"""

def _shh_cte() -> str:
    """CTEs: toks -> sh (shingle strings) -> shh (portable 60-bit hashes)."""
    return f"""
WITH {_SH.strip()},
shx AS (SELECT doc_id, unnest(s) AS s1 FROM sh),
shh AS (SELECT doc_id, ('0x' || substr(md5(s1), 1, 15))::BIGINT AS h FROM shx)"""


def _perm_values() -> str:
    rows = ", ".join(f"({i}, {int(_PA[i])}, {int(_PB[i])})" for i in range(N_PERMS))
    return f"(VALUES {rows}) AS perms(perm, pa, pb)"


def _sig_cte() -> str:
    """CTE ``sig``: (doc_id, perm, sig) portable MinHash."""
    return f"""{_shh_cte()},
sig AS (
  SELECT doc_id, perm,
         min((pa * (h & {LANE}) + pb) % {MERSENNE}) AS sig
  FROM shh CROSS JOIN {_perm_values()}
  GROUP BY doc_id, perm
)"""


def _band_cte() -> str:
    """CTE ``bands``: (doc_id, band, band_hash) portable band hashes."""
    r = N_PERMS // N_BANDS
    return f"""{_sig_cte()},
sigl AS (
  SELECT doc_id, list(sig ORDER BY perm) AS sigs FROM sig GROUP BY doc_id
),
bands AS (
  SELECT doc_id, band,
         ('0x' || substr(md5(array_to_string(sigs[band*{r}+1 : band*{r}+{r}], '_')), 1, 15))::BIGINT AS band_hash
  FROM sigl CROSS JOIN (VALUES {", ".join(f"({b})" for b in range(N_BANDS))}) AS bb(band)
)"""


def _src_sig_cte() -> str:
    """CTE ``ssig``: (src, perm, sig) collection-level portable MinHash —
    min over the per-doc sigs per (source, perm), which by the min-wise
    union-closure property equals the MinHash of the source's shingle
    union (the independent replay of operators/collections.
    collection_minhash)."""
    return f"""{_sig_cte()},
ssig AS (
  SELECT d.source AS src, perm, min(sig) AS sig
  FROM sig JOIN documents d USING (doc_id)
  GROUP BY 1, 2
)"""


def _src_band_cte() -> str:
    """CTE ``sbands``: (src, band, band_hash) over the collection sigs."""
    r = N_PERMS // N_BANDS
    return f"""{_src_sig_cte()},
ssigl AS (
  SELECT src, list(sig ORDER BY perm) AS sigs FROM ssig GROUP BY src
),
sbands AS (
  SELECT src, band,
         ('0x' || substr(md5(array_to_string(sigs[band*{r}+1 : band*{r}+{r}], '_')), 1, 15))::BIGINT AS band_hash
  FROM ssigl CROSS JOIN (VALUES {", ".join(f"({b})" for b in range(N_BANDS))}) AS bb(band)
)"""


_LI_EDGES = f"SELECT DISTINCT l_orderkey AS src, l_partkey + {PART_OFFSET} AS dst FROM lineitem"
_LI_EDGES_RAW = "SELECT DISTINCT l_orderkey AS src, l_partkey AS dst FROM lineitem"
_COPART = f"""
adj AS (SELECT DISTINCT l_orderkey AS v, l_partkey AS p FROM lineitem WHERE l_orderkey % {PAIR_MOD} = 0),
deg AS (SELECT v, count(*) AS d FROM adj GROUP BY v),
pairs AS (SELECT a.v AS a, b.v AS b, count(*) AS inter
          FROM adj a JOIN adj b ON a.p = b.p AND a.v < b.v GROUP BY 1, 2)"""


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["n1_invert_direction"] = (
        f"SELECT dst AS src, src AS dst FROM ({_LI_EDGES}) ORDER BY src, dst"
    )
    sql["n2_symmetrize"] = (
        f"WITH e AS ({_LI_EDGES}) SELECT src, dst FROM e UNION SELECT dst, src FROM e"
    )
    sql["n3_canonical_pairs"] = f"""
WITH e AS ({_LI_EDGES_RAW})
SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
FROM e WHERE src <> dst"""
    sql["k3_rowsum_degree"] = (
        f"SELECT src AS vertex, count(*) AS degree FROM ({_LI_EDGES}) GROUP BY src"
    )
    sql["k3_rowsum_weighted"] = f"""
WITH e AS ({_LI_EDGES_RAW}),
pw AS (SELECT p_partkey AS dst, CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS w FROM part)
SELECT e.src AS vertex, CAST(sum(w) AS BIGINT) AS volume FROM e JOIN pw USING (dst) GROUP BY e.src"""
    sql["k4_k6_edge_jaccard"] = f"""
WITH {_COPART.strip()}
SELECT p.a, p.b, p.inter,
       da.d AS size_a, db.d AS size_b,
       CAST(p.inter AS DOUBLE) / CAST(da.d + db.d - p.inter AS DOUBLE) AS jaccard
FROM pairs p JOIN deg da ON da.v = p.a JOIN deg db ON db.v = p.b"""
    sql["k5_weighted_pairs"] = f"""
WITH adj AS (SELECT DISTINCT l_orderkey AS v, l_partkey AS p FROM lineitem WHERE l_orderkey % {PAIR_MOD} = 0),
pw AS (SELECT p_partkey AS p, CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS w FROM part),
wadj AS (SELECT v, adj.p, w FROM adj JOIN pw USING (p)),
vol AS (SELECT v, CAST(sum(w) AS BIGINT) AS vol FROM wadj GROUP BY v),
cpairs AS (SELECT a.v AS a, b.v AS b FROM adj a JOIN adj b ON a.p = b.p AND a.v < b.v GROUP BY 1, 2),
wint AS (SELECT a.v AS a, b.v AS b, CAST(sum(pw.w) AS BIGINT) AS wi
         FROM adj a JOIN adj b ON a.p = b.p AND a.v < b.v JOIN pw ON pw.p = a.p
         GROUP BY 1, 2)
SELECT c.a, c.b, CAST(COALESCE(w.wi, 0) AS BIGINT) AS wi, va.vol AS vol_a, vb.vol AS vol_b,
       CAST(COALESCE(w.wi, 0) AS DOUBLE) / CAST(va.vol + vb.vol - COALESCE(w.wi, 0) AS DOUBLE) AS jaccard
FROM cpairs c LEFT JOIN wint w ON w.a = c.a AND w.b = c.b
JOIN vol va ON va.v = c.a JOIN vol vb ON vb.v = c.b"""
    sql["k9_threshold_count"] = f"""
WITH {_COPART.strip()}
SELECT count(*) AS nonzero_pairs
FROM pairs p JOIN deg da ON da.v = p.a JOIN deg db ON db.v = p.b
WHERE CAST(p.inter AS DOUBLE) / CAST(da.d + db.d - p.inter AS DOUBLE) > 1e-5"""
    sql["exact_dup_groups"] = """
SELECT sha256(text) AS sha, count(*) AS n_docs, min(doc_id) AS rep_id
FROM documents GROUP BY sha256(text) HAVING count(*) > 1"""
    sql["doc_shingle_stats"] = f"""
WITH {_SH.strip()},
tok AS (SELECT doc_id, len({_TOKS}) AS n_tokens FROM documents)
SELECT sh.doc_id, CAST(len(sh.s) AS BIGINT) AS n_shingles, CAST(tok.n_tokens AS BIGINT) AS n_tokens
FROM sh JOIN tok USING (doc_id)"""
    sql["doc_pair_jaccard"] = f"""
WITH {_SH.strip()},
shx AS (SELECT doc_id, unnest(s) AS s1 FROM sh),
rare AS (SELECT s1 FROM shx GROUP BY s1 HAVING count(*) <= {DF_CAP}),
shr AS (SELECT doc_id, s1 FROM shx JOIN rare USING (s1)),
cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         FROM shr a JOIN shr b ON a.s1 = b.s1 AND a.doc_id < b.doc_id),
sz AS (SELECT doc_id, len(s) AS sz FROM sh),
inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
          FROM cand JOIN shx x ON x.doc_id = cand.a JOIN shx y ON y.doc_id = cand.b AND y.s1 = x.s1
          GROUP BY 1, 2)
SELECT c.a, c.b, COALESCE(i.inter, 0) AS inter,
       CAST(sa.sz AS BIGINT) AS size_a, CAST(sb.sz AS BIGINT) AS size_b,
       CAST(COALESCE(i.inter, 0) AS DOUBLE) / CAST(sa.sz + sb.sz - COALESCE(i.inter, 0) AS DOUBLE) AS jaccard
FROM cand c LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
JOIN sz sa ON sa.doc_id = c.a JOIN sz sb ON sb.doc_id = c.b"""
    sql["doc_pair_containment"] = f"""
WITH {_SH.strip()},
shx AS (SELECT doc_id, unnest(s) AS s1 FROM sh),
rare AS (SELECT s1 FROM shx GROUP BY s1 HAVING count(*) <= {DF_CAP}),
shr AS (SELECT doc_id, s1 FROM shx JOIN rare USING (s1)),
cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         FROM shr a JOIN shr b ON a.s1 = b.s1 AND a.doc_id < b.doc_id),
sz AS (SELECT doc_id, len(s) AS sz FROM sh),
inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
          FROM cand JOIN shx x ON x.doc_id = cand.a JOIN shx y ON y.doc_id = cand.b AND y.s1 = x.s1
          GROUP BY 1, 2)
SELECT c.a, c.b,
       CAST(COALESCE(i.inter, 0) AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE) AS containment
FROM cand c LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
JOIN sz sa ON sa.doc_id = c.a JOIN sz sb ON sb.doc_id = c.b"""
    sql["doc_pair_lcs_contained"] = f"""
WITH {_SH.strip()},
shx AS (SELECT doc_id, unnest(s) AS s1 FROM sh),
rare AS (SELECT s1 FROM shx GROUP BY s1 HAVING count(*) <= {DF_CAP}),
shr AS (SELECT doc_id, s1 FROM shx JOIN rare USING (s1)),
cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         FROM shr a JOIN shr b ON a.s1 = b.s1 AND a.doc_id < b.doc_id)
SELECT c.a, c.b,
       CAST(least(strlen(da.text), strlen(db.text)) AS BIGINT) AS min_bytes,
       (CASE WHEN strlen(da.text) <= strlen(db.text)
             THEN position(da.text IN db.text) > 0
             ELSE position(db.text IN da.text) > 0 END) AS contained
FROM cand c
JOIN documents da ON da.doc_id = c.a
JOIN documents db ON db.doc_id = c.b"""
    _BENCH_CTES = f"""
bsnip AS (SELECT doc_id AS bench_id, tk[{BENCH_TOK_OFF + 1}:{BENCH_TOK_OFF + BENCH_TOK_LEN}] AS bt
          FROM (SELECT doc_id, {_TOKS} AS tk FROM documents)
          WHERE doc_id % {BENCH_MOD} = {BENCH_REM} AND len(tk) >= {BENCH_TOK_OFF + BENCH_TOK_LEN}),
bsh AS (SELECT bench_id, list_distinct(list_transform(range(1, len(bt) - {K} + 2),
             i -> array_to_string(bt[i:i+{K - 1}], ' '))) AS s FROM bsnip),
bx AS (SELECT bench_id, ('0x' || substr(md5(s1), 1, 15))::BIGINT AS h
       FROM (SELECT bench_id, unnest(s) AS s1 FROM bsh)),
bsz AS (SELECT bench_id, count(*) AS bench_size FROM bx GROUP BY bench_id),
ov AS (SELECT shh.doc_id, bx.bench_id, count(*) AS overlap
       FROM shh JOIN bx USING (h) GROUP BY 1, 2)"""
    sql["decontam_overlap"] = f"""{_shh_cte()},{_BENCH_CTES}
SELECT ov.doc_id, ov.bench_id, CAST(ov.overlap AS BIGINT) AS overlap,
       CAST(bsz.bench_size AS BIGINT) AS bench_size,
       CAST(ov.overlap AS DOUBLE) / CAST(bsz.bench_size AS DOUBLE) AS containment
FROM ov JOIN bsz USING (bench_id)
WHERE ov.overlap >= {DECON_MIN_OVERLAP}"""
    sql["decontam_manifest"] = f"""{_shh_cte()},{_BENCH_CTES},
cont AS (SELECT ov.doc_id,
                max(CAST(ov.overlap AS DOUBLE) / CAST(bsz.bench_size AS DOUBLE)) AS mc
         FROM ov JOIN bsz USING (bench_id)
         WHERE ov.overlap >= {DECON_MIN_OVERLAP}
         GROUP BY ov.doc_id)
SELECT d.doc_id, COALESCE(cont.mc, 0.0) AS max_containment,
       COALESCE(cont.mc, 0.0) >= {DECON_THRESHOLD} AS contaminated
FROM documents d LEFT JOIN cont USING (doc_id)"""
    sql["src_pair_jaccard"] = f"""{_shh_cte()},
mem AS (SELECT DISTINCT d.source AS src, shh.h
        FROM shh JOIN documents d USING (doc_id)),
rare AS (SELECT h FROM mem GROUP BY h HAVING count(*) <= {SRC_DF_CAP}),
memr AS (SELECT src, h FROM mem JOIN rare USING (h)),
cand AS (SELECT DISTINCT a.src AS a, b.src AS b
         FROM memr a JOIN memr b ON a.h = b.h AND a.src < b.src),
sz AS (SELECT src, count(*) AS sz FROM mem GROUP BY src),
inter AS (SELECT x.src AS a, y.src AS b, count(*) AS inter
          FROM cand JOIN mem x ON x.src = cand.a
                    JOIN mem y ON y.src = cand.b AND y.h = x.h
          GROUP BY 1, 2)
SELECT c.a, c.b, COALESCE(i.inter, 0) AS inter,
       CAST(sa.sz AS BIGINT) AS size_a, CAST(sb.sz AS BIGINT) AS size_b,
       CAST(COALESCE(i.inter, 0) AS DOUBLE)
         / CAST(sa.sz + sb.sz - COALESCE(i.inter, 0) AS DOUBLE) AS jaccard,
       CAST(COALESCE(i.inter, 0) AS DOUBLE)
         / CAST(least(sa.sz, sb.sz) AS DOUBLE) AS containment
FROM cand c LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
JOIN sz sa ON sa.src = c.a JOIN sz sb ON sb.src = c.b"""
    sql["doc_winnow_fps"] = f"""
WITH nrm AS (SELECT doc_id, regexp_replace(trim(text), '\\s+', ' ', 'g') AS t FROM documents),
g AS (SELECT doc_id,
        CASE WHEN length(t) >= {WINNOW_K}
             THEN list_transform(range(1, length(t) - {WINNOW_K} + 2),
                  i -> ('0x' || substr(md5(substr(t, i, {WINNOW_K})), 1, 15))::BIGINT)
             ELSE [('0x' || substr(md5(t), 1, 15))::BIGINT] END AS gr
      FROM nrm),
f AS (SELECT doc_id,
        CASE WHEN len(gr) >= {WINNOW_W}
             THEN list_transform(range(1, len(gr) - {WINNOW_W} + 2),
                  j -> list_min(gr[j:j+{WINNOW_W - 1}]))
             ELSE [list_min(gr)] END AS fp
      FROM g)
SELECT DISTINCT doc_id, unnest(fp) AS fp FROM f"""
    sql["idf_weights"] = f"""
{_shh_cte()},
shd AS (SELECT DISTINCT doc_id, h FROM shh),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
SELECT h AS elem, CAST(count(*) AS BIGINT) AS df,
       CAST(floor(ln(1 + (SELECT n FROM nd) / count(*)) * 1000000 + 0.5) AS BIGINT) AS w_micro
FROM shd GROUP BY h"""
    sql["minhash_signatures"] = f"""
{_sig_cte()}
SELECT doc_id, CAST(perm AS BIGINT) AS perm, sig FROM sig"""
    sql["lsh_band_hashes"] = f"""
{_band_cte()}
SELECT doc_id, CAST(band AS BIGINT) AS band, band_hash FROM bands"""
    sql["lsh_candidates"] = f"""
{_band_cte()}
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
FROM bands x JOIN bands y ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id"""
    sql["src_minhash_sigs"] = f"""
{_src_sig_cte()}
SELECT src AS source, CAST(perm AS BIGINT) AS perm, sig FROM ssig"""
    sql["src_lsh_candidates"] = f"""
{_src_band_cte()}
SELECT DISTINCT x.src AS a, y.src AS b
FROM sbands x JOIN sbands y ON x.band = y.band AND x.band_hash = y.band_hash AND x.src < y.src"""
    sql["doc_fingerprint"] = f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS tk FROM documents)
SELECT doc_id,
       CAST(CASE WHEN len(tk) = 0 THEN 0 ELSE
         list_sum(list_transform(range(1, len(tk) + 1),
           i -> (i * (('0x' || substr(md5(tk[i]), 1, 15))::BIGINT % 4294967296)) % {textstats.MOD_P}))
         % {textstats.MOD_P} END AS BIGINT) AS fp
FROM tok"""
    # lang_id: stopword votes, argmax in sorted-lang order with strict >
    langs = sorted(textstats.STOPWORDS)
    vote_cols = []
    for lang in langs:
        words = ", ".join(f"'{w}'" for w in textstats.STOPWORDS[lang])
        vote_cols.append(
            f"len(list_filter(ltk, t -> list_contains([{words}], t))) AS v_{lang}"
        )
    case_expr = "'und'"
    best = "0"
    for lang in langs:
        case_expr = f"CASE WHEN v_{lang} > {best} THEN '{lang}' ELSE {case_expr} END"
        best = f"greatest(v_{lang}, {best})"
    sql["lang_id"] = f"""
WITH tok AS (SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t <> '') AS ltk FROM documents),
votes AS (SELECT doc_id, {", ".join(vote_cols)} FROM tok)
SELECT doc_id, {case_expr} AS lang_pred FROM votes"""
    sql["quality_stats"] = f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS tk FROM documents)
SELECT doc_id,
       CAST(len(tk) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct,
       CAST(COALESCE(list_sum(list_transform(tk, t -> len(t))), 0) AS BIGINT) AS tok_char_sum,
       CASE WHEN len(tk) > 0 THEN
         CAST(COALESCE(list_sum(list_transform(tk, t -> len(t))), 0) AS DOUBLE) / CAST(len(tk) AS DOUBLE)
       END AS avg_tok_len
FROM tok"""
    sql["token_stats_bpe"] = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '({textstats.BPE_ISH_PATTERN})', 1)) AS BIGINT) AS n_bpe_tokens
FROM documents"""
    sql["token_topk"] = f"""
SELECT token, count(*) AS cnt
FROM (SELECT unnest({_TOKS}) AS token FROM documents)
GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 20"""
    sql["ann_cosine_topk"] = f"""
WITH q AS (SELECT vec_id, list_transform(embedding, e -> CAST(round(CAST(e AS DOUBLE) * 10000) AS BIGINT)) AS v
           FROM embeddings),
s AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS DOUBLE)
             / (sqrt(CAST(list_sum(list_transform(a.v, x -> x * x)) AS DOUBLE))
                * sqrt(CAST(list_sum(list_transform(b.v, x -> x * x)) AS DOUBLE))) AS cosine
      FROM q a JOIN q b ON a.vec_id <> b.vec_id
      WHERE a.vec_id < 30),
r AS (SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM s)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
FROM r WHERE rank <= {TOPK} ORDER BY query_id, rank"""
    # ann_lsh_candidates: the seeded quantized hyperplanes are embedded as
    # VALUES literals (same pattern as _perm_values); the int64 dot product
    # makes sign bits engine-exact, so the full LSH replay is SQL-expressible.
    from sycl_jaccard_spark.operators.ann import VEC_SCALE, quantized_planes

    planes_q = quantized_planes(dim=64, n_planes=32, seed=42)
    plane_rows = ", ".join(
        f"({i}, [{', '.join(str(int(x)) for x in planes_q[i])}]::BIGINT[])"
        for i in range(planes_q.shape[0])
    )
    band_width = 32 // 4
    band_mask = (1 << band_width) - 1
    sql["ann_lsh_candidates"] = f"""
WITH q AS (SELECT vec_id, list_transform(embedding, e -> CAST(round(CAST(e AS DOUBLE) * {VEC_SCALE}) AS BIGINT)) AS v
           FROM embeddings),
planes(pidx, pv) AS (VALUES {plane_rows}),
dots AS (SELECT vec_id, pidx,
                CAST(list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * pv[i])) AS BIGINT) AS dot
         FROM q CROSS JOIN planes),
sig AS (SELECT vec_id, CAST(sum(CASE WHEN dot >= 0 THEN CAST(1 AS BIGINT) << pidx ELSE 0 END) AS BIGINT) AS s
        FROM dots GROUP BY vec_id),
banded AS (SELECT vec_id, band, (s >> (band * {band_width})) & {band_mask} AS band_hash
           FROM sig CROSS JOIN (VALUES {", ".join(f"({b})" for b in range(4))}) AS bb(band))
SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
FROM banded x JOIN banded y ON x.band = y.band AND x.band_hash = y.band_hash AND x.vec_id < y.vec_id"""
    # ann_ivf_train: the FULL Lloyd k-means training loop unrolled — init
    # codebook as VALUES, per-iteration CTEs (integer argmin assignment,
    # exact half-away-from-zero integer mean, empty clusters keep their
    # centroid), bit-for-bit against operators/ann.py:train_ivf_centroids.
    # The SAME CTE prefix is the centroid source of ann_ivf_candidates and
    # emb_near_dups below (trained codebook is the production default —
    # VERDICT r3 #4), so the oracles replay training AND consumption.
    from sycl_jaccard_spark.operators.ann import init_centroids

    ic = init_centroids(dim=64, n_centroids=IVF_TRAIN_K, seed=42)
    c0_rows = ", ".join(
        f"({cid}, {pos}, {int(v)})"
        for cid in range(IVF_TRAIN_K)
        for pos, v in enumerate(ic[cid])
    )
    train_iters = []
    for i in range(IVF_TRAIN_ITERS):
        train_iters.append(f""",
s{i} AS MATERIALIZED (
  SELECT e.vec_id, c.cid, SUM(c.val * c.val - 2 * e.val * c.val) AS score
  FROM ex e JOIN c{i} c ON e.pos = c.pos GROUP BY e.vec_id, c.cid),
a{i} AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rn
    FROM s{i}) WHERE rn = 1),
u{i} AS MATERIALIZED (
  SELECT a.cid, e.pos, SUM(e.val) AS s, COUNT(*) AS n
  FROM a{i} a JOIN ex e ON a.vec_id = e.vec_id GROUP BY a.cid, e.pos),
c{i + 1} AS MATERIALIZED (
  SELECT c.cid, c.pos,
         COALESCE(CASE WHEN u.s >= 0 THEN (2 * u.s + u.n) // (2 * u.n)
                       ELSE -((2 * (-u.s) + u.n) // (2 * u.n)) END,
                  CAST(c.val AS BIGINT)) AS val
  FROM c{i} c LEFT JOIN u{i} u ON c.cid = u.cid AND c.pos = u.pos)""")
    train_prefix = f"""
WITH vq AS MATERIALIZED (SELECT vec_id, list_transform(embedding, e -> CAST(round(CAST(e AS DOUBLE) * {VEC_SCALE}) AS BIGINT)) AS v
            FROM embeddings),
ex AS MATERIALIZED (SELECT vec_id, unnest(v) AS val, unnest(range(len(v))) AS pos FROM vq),
c0(cid, pos, val) AS (VALUES {c0_rows}){"".join(train_iters)}"""
    sql["ann_ivf_train"] = f"""
{train_prefix}
SELECT CAST(cid AS INTEGER) AS cid, CAST(pos AS INTEGER) AS pos, CAST(val AS BIGINT) AS val
FROM c{IVF_TRAIN_ITERS} ORDER BY cid, pos"""
    # trained-codebook consumers: collect c{N} back into (cid, cv, c2) and
    # run the same integer-argmin assignment / nprobe-2 probing as before
    _assign_ctes = f""",
centl AS MATERIALIZED (
  SELECT cid, list(val ORDER BY pos) AS cv, CAST(sum(val * val) AS BIGINT) AS c2
  FROM c{IVF_TRAIN_ITERS} GROUP BY cid),
scored AS (SELECT vec_id, cid,
                  -2 * CAST(list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * cv[i])) AS BIGINT) + c2 AS score
           FROM vq CROSS JOIN centl),
assign AS (SELECT vec_id, cid FROM (
             SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rn
             FROM scored) WHERE rn <= 2)"""
    sql["ann_ivf_candidates"] = f"""
{train_prefix}{_assign_ctes}
SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
FROM assign x JOIN assign y ON x.cid = y.cid AND x.vec_id < y.vec_id"""
    # emb_near_dups: trained-IVF candidate chain + exact quantized cosine
    sql["emb_near_dups"] = f"""
{train_prefix}{_assign_ctes},
cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
         FROM assign x JOIN assign y ON x.cid = y.cid AND x.vec_id < y.vec_id),
cs AS (SELECT c.a, c.b,
              CAST(list_sum(list_transform(range(1, len(qa.v) + 1), i -> qa.v[i] * qb.v[i])) AS DOUBLE)
              / (sqrt(CAST(list_sum(list_transform(qa.v, x -> x * x)) AS DOUBLE))
                 * sqrt(CAST(list_sum(list_transform(qb.v, x -> x * x)) AS DOUBLE))) AS cosine
       FROM cand c JOIN vq qa ON qa.vec_id = c.a JOIN vq qb ON qb.vec_id = c.b)
SELECT a, b, cosine FROM cs WHERE cosine >= {EMB_THRESHOLD}"""
    # emb_delta_near_dups: the incremental store is edge-for-edge equivalent
    # to the batch IVF run by the tested delta≡batch theorem
    # (tests/test_emb_delta.py), so the SAME trained-IVF + exact-cosine
    # replay verifies it — the oracle checks the two-delivery store against
    # the one-shot SQL semantics
    sql["emb_delta_near_dups"] = sql["emb_near_dups"]
    # dedup_pipeline_clusters / dedup_pipeline_full: end-to-end replays.
    # Candidate/verify CTEs over ALL docs are a superset of the pipeline's
    # uniques-only pass, but exact-dup twins share signatures, so the extra
    # verified pairs stay inside the same components — final (id, cluster)
    # labels are identical. CC = WITH RECURSIVE min-label reachability closure
    # over the verified ∪ exact-dup edge set (dup clusters are small, so the
    # closure's O(component²) state is bounded).
    sql["dedup_pipeline_clusters"] = _cluster_replay_sql(with_simhash=False)
    # delta runner: label-for-label equivalent to the full batch run by the
    # tested delta≡full theorem (tests/test_delta.py), so the SAME replay
    # verifies it — the oracle checks the batched store against the
    # one-shot SQL semantics
    sql["delta_dedup_clusters"] = _cluster_replay_sql(with_simhash=False)
    # delta REMOVALS: by the tested removal≡full theorem the store after
    # remove_ids(doc_id ≡ 3 mod 17) equals a full run over the survivors,
    # so the oracle is the same replay with every `documents` read shadowed
    # by the survivor set (string surgery is safe here: with_simhash=False +
    # default tail reads the table via "FROM documents" only)
    sql["delta_remove_clusters"] = _cluster_replay_sql(with_simhash=False).replace(
        "FROM documents", "FROM survivors"
    ).replace(
        "WITH RECURSIVE",
        "WITH RECURSIVE survivors AS (SELECT * FROM documents WHERE doc_id % 17 <> 3),",
        1,
    )
    # delta COMPACTION: labels are invariant under compact() (tested), so
    # the post-fold store answers to the identical survivor-restricted
    # replay — a hash mismatch here would catch a fold that loses, double-
    # applies, or mis-orders the closure/fix overlays it folds into the base
    sql["delta_compact_clusters"] = sql["delta_remove_clusters"]
    # delta DECONTAMINATION: the store manifest is score-for-score the batch
    # probe over the unioned corpus (probe only never-seen contents, inherit
    # through sha256 — tested), so it answers to the identical oracle
    sql["delta_contam_manifest"] = sql["decontam_manifest"]
    sql["dedup_pipeline_full"] = _cluster_replay_sql(with_simhash=True)
    # dedup_rep_selection: the same cluster replay, extended with longest-
    # content representative selection (ties -> min id) and the keep/drop
    # manifest — the corpus-level dedup ACTION, SQL end to end.
    sql["dedup_rep_selection"] = _cluster_replay_sql(
        with_simhash=False,
        tail=""",
clus AS MATERIALIZED (SELECT node AS id, min(lab) AS cluster FROM reach GROUP BY node),
reps AS (SELECT cluster, id AS rep_id FROM (
           SELECT c.cluster, c.id,
                  row_number() OVER (PARTITION BY c.cluster
                                     ORDER BY length(d.text) DESC, c.id) AS rn
           FROM clus c JOIN documents d ON d.doc_id = c.id) WHERE rn = 1)
SELECT CAST(c.id AS BIGINT) AS id, CAST(c.cluster AS BIGINT) AS cluster,
       CAST(r.rep_id AS BIGINT) AS rep_id,
       CAST(c.id = r.rep_id AS INTEGER) AS kept
FROM clus c JOIN reps r ON r.cluster = c.cluster""",
    )
    # clean_training_manifest: the composed corpus action — the same cluster
    # replay, extended with the benchmark probe CTEs (rebased onto shd, the
    # replay's DISTINCT (doc_id, h) relation — the chain's shh feeds MinHash
    # and may carry duplicates) and a succession-aware rep selection: reps
    # are ranked among NON-contaminated members only, so a cluster whose
    # longest member is a leak keeps its best clean member
    _BENCH_ON_SHD = _BENCH_CTES.replace("shh", "shd")
    sql["clean_training_manifest"] = _cluster_replay_sql(
        with_simhash=False,
        tail=f""",{_BENCH_ON_SHD},
cont AS (SELECT ov.doc_id,
                max(CAST(ov.overlap AS DOUBLE) / CAST(bsz.bench_size AS DOUBLE)) AS mc
         FROM ov JOIN bsz USING (bench_id)
         WHERE ov.overlap >= {DECON_MIN_OVERLAP}
         GROUP BY ov.doc_id),
clus AS MATERIALIZED (SELECT node AS id, min(lab) AS cluster FROM reach GROUP BY node),
flag AS (SELECT d.doc_id AS id, COALESCE(cont.mc, 0.0) AS mc,
                COALESCE(cont.mc, 0.0) >= {DECON_THRESHOLD} AS contaminated
         FROM documents d LEFT JOIN cont ON cont.doc_id = d.doc_id),
reps AS (SELECT cluster, id AS rep_id FROM (
           SELECT c.cluster, c.id,
                  row_number() OVER (PARTITION BY c.cluster
                                     ORDER BY length(d.text) DESC, c.id) AS rn
           FROM clus c JOIN flag f ON f.id = c.id AND NOT f.contaminated
           JOIN documents d ON d.doc_id = c.id) WHERE rn = 1)
SELECT CAST(c.id AS BIGINT) AS id, CAST(c.cluster AS BIGINT) AS cluster,
       CAST(CASE WHEN f.contaminated THEN NULL ELSE r.rep_id END AS BIGINT) AS rep_id,
       f.mc AS max_containment,
       (NOT f.contaminated AND c.id = r.rep_id) AS keep,
       CASE WHEN f.contaminated THEN 'contaminated'
            WHEN c.id <> r.rep_id THEN 'duplicate' END AS drop_reason
FROM clus c JOIN flag f ON f.id = c.id
LEFT JOIN reps r ON r.cluster = c.cluster""",
    )
    # training_manifest_quality: the same composition with the QualityGate
    # enabled — a qual CTE replays quality_stats' exact-integer statistics
    # (single double division, IEEE-identical across engines) and the reps
    # ranking excludes BOTH contaminated and low-quality members; reason
    # precedence contaminated > low_quality > duplicate
    sql["training_manifest_quality"] = _cluster_replay_sql(
        with_simhash=False,
        tail=f""",{_BENCH_ON_SHD},
cont AS (SELECT ov.doc_id,
                max(CAST(ov.overlap AS DOUBLE) / CAST(bsz.bench_size AS DOUBLE)) AS mc
         FROM ov JOIN bsz USING (bench_id)
         WHERE ov.overlap >= {DECON_MIN_OVERLAP}
         GROUP BY ov.doc_id),
clus AS MATERIALIZED (SELECT node AS id, min(lab) AS cluster FROM reach GROUP BY node),
flag AS (SELECT d.doc_id AS id, COALESCE(cont.mc, 0.0) AS mc,
                COALESCE(cont.mc, 0.0) >= {DECON_THRESHOLD} AS contaminated
         FROM documents d LEFT JOIN cont ON cont.doc_id = d.doc_id),
qual AS (SELECT doc_id AS id,
                (len(tk) < {QUAL_MIN_TOKENS}
                 OR (len(tk) > 0 AND
                     CAST(list_sum(list_transform(tk, t -> len(t))) AS DOUBLE)
                       / CAST(len(tk) AS DOUBLE) > CAST({QUAL_MAX_AVG_TOK_LEN} AS DOUBLE))
                 OR (len(tk) > 0 AND
                     CAST(len(list_distinct(tk)) AS DOUBLE)
                       / CAST(len(tk) AS DOUBLE) < CAST({QUAL_MIN_DISTINCT_RATIO} AS DOUBLE))) AS lowq
         FROM (SELECT doc_id, {_TOKS} AS tk FROM documents)),
reps AS (SELECT cluster, id AS rep_id FROM (
           SELECT c.cluster, c.id,
                  row_number() OVER (PARTITION BY c.cluster
                                     ORDER BY length(d.text) DESC, c.id) AS rn
           FROM clus c JOIN flag f ON f.id = c.id AND NOT f.contaminated
           JOIN qual q ON q.id = c.id AND NOT q.lowq
           JOIN documents d ON d.doc_id = c.id) WHERE rn = 1)
SELECT CAST(c.id AS BIGINT) AS id, CAST(c.cluster AS BIGINT) AS cluster,
       CAST(CASE WHEN f.contaminated OR q.lowq THEN NULL ELSE r.rep_id END AS BIGINT) AS rep_id,
       f.mc AS max_containment,
       (NOT f.contaminated AND NOT q.lowq AND c.id = r.rep_id) AS keep,
       CASE WHEN f.contaminated THEN 'contaminated'
            WHEN q.lowq THEN 'low_quality'
            WHEN c.id <> r.rep_id THEN 'duplicate' END AS drop_reason
FROM clus c JOIN flag f ON f.id = c.id
JOIN qual q ON q.id = c.id
LEFT JOIN reps r ON r.cluster = c.cluster""",
    )
    # corpus_mix_sample: water-filled stratified sampling — per-source
    # weights, fill level T = min(weight/share), rate = min(1, share/weight·T),
    # then the portable md5 hash threshold (md5_long contract). Every float
    # is a single division/multiply of exact values in the SAME expression
    # shape as the Spark plan, so the kept set matches row-for-row
    _mix_values = ", ".join(
        f"('{s}', CAST({v} AS DOUBLE))" for s, v in sorted(MIX_TARGETS.items())
    )
    sql["corpus_mix_sample"] = f"""
WITH t(source, share) AS (VALUES {_mix_values}),
w AS (SELECT d.source, CAST(sum(d.n_chars) AS DOUBLE) AS wt
      FROM documents d JOIN t USING (source) GROUP BY d.source
      HAVING sum(d.n_chars) > 0),
f AS (SELECT min(w.wt / t.share) AS fill_t FROM w JOIN t USING (source)),
r AS (SELECT w.source,
             least(CAST(1.0 AS DOUBLE), (t.share / w.wt) * f.fill_t) AS rate
      FROM w JOIN t USING (source) CROSS JOIN f)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.source AS source
FROM documents d JOIN r ON r.source = d.source
WHERE CAST(CAST(('0x' || substr(md5('{MIX_SEED}#' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE)
      < r.rate * {float(2**60)!r}"""
    # cluster_split_assign: the cluster replay + the md5 threshold on the
    # CLUSTER label (not the doc id) — the whole point: near-dup members
    # share a label, so they can never straddle train/test
    sql["cluster_split_assign"] = _cluster_replay_sql(
        with_simhash=False,
        tail=f""",
clus AS (SELECT node AS id, min(lab) AS cluster FROM reach GROUP BY node)
SELECT CAST(id AS BIGINT) AS id, CAST(cluster AS BIGINT) AS cluster,
       CASE WHEN CAST(CAST(('0x' || substr(md5('{SPLIT_SEED}#' || CAST(cluster AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE)
                 < {float(SPLIT_TEST_SHARE)!r} * {float(2**60)!r}
            THEN 'test' ELSE 'train' END AS split
FROM clus""",
    )
    return sql


def _simhash_ctes() -> str:
    """SimHash pass in plain SQL, bit-for-bit against functions/simhash.py:

    * bit b of a doc's SimHash is set iff ``2 * sum((h >> b) & 1) > n`` over
      its distinct shingle hashes (the ±1 bit-vote rule, votes = 2*set - n);
      portable hashes are 60-bit md5 prefixes, so bits 60-63 have zero set
      counts and provably vote 0 — ``range(60)`` covers every live bit.
    * the combinatorial block tables (Manku WWW'07) bucket docs on the raw
      block values: Spark keys buckets with xxhash64(combo_id, blocks...),
      which is equal iff the block values are equal, so the SQL replay joins
      on the '_'-joined block values directly — identical pair sets.
    """
    from itertools import combinations

    from sycl_jaccard_spark.functions.simhash import _block_bounds

    cfg = PipelineConfig()  # block geometry knobs: defaults match _full cfg
    bounds = _block_bounds(cfg.simhash_blocks, cfg.simhash_bits)
    keep = cfg.simhash_blocks - cfg.simhash_max_hamming
    combos = list(combinations(range(cfg.simhash_blocks), keep))
    simb_selects = []
    for ci, combo in enumerate(combos):
        parts = " || '_' || ".join(
            f"CAST((s >> {bounds[j][0]}) & {(1 << bounds[j][1]) - 1} AS VARCHAR)" for j in combo
        )
        simb_selects.append(f"SELECT doc_id, {ci} AS cb, {parts} AS bk FROM simsig")
    return f"""
simbits AS (
  SELECT doc_id, b, CASE WHEN 2 * sum((h >> b) & 1) > count(*)
                         THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END AS bitv
  FROM shd CROSS JOIN range(60) t(b)
  GROUP BY doc_id, b
),
simsig AS MATERIALIZED (SELECT doc_id, CAST(sum(bitv) AS BIGINT) AS s FROM simbits GROUP BY doc_id),
simb AS ({" UNION ALL ".join(simb_selects)}),
simcand AS (SELECT x.doc_id AS a, y.doc_id AS b
            FROM simb x JOIN simb y ON x.cb = y.cb AND x.bk = y.bk AND x.doc_id < y.doc_id)"""


def _cluster_replay_sql(with_simhash: bool, tail: str | None = None) -> str:
    """Full-pipeline DuckDB replay (the compareCoords golden-output analog,
    compareCoords.cpp:174-320). MATERIALIZED hints: DuckDB inlines CTEs by
    default, so the sig/bands chain would be recomputed for every downstream
    reference (cand joins bands twice, shd feeds sz/inter/simbits) — ~10x
    slower replay without them."""
    chain = _band_cte().replace("WITH", "WITH RECURSIVE", 1)
    for _cte in ("sh", "shx", "shh", "sig", "sigl", "bands"):
        chain = chain.replace(f"{_cte} AS (", f"{_cte} AS MATERIALIZED (")
    lsh_cand = """SELECT x.doc_id AS a, y.doc_id AS b
FROM bands x JOIN bands y ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id"""
    if with_simhash:
        sim_ctes = "," + _simhash_ctes()
        cand = f"SELECT DISTINCT a, b FROM (({lsh_cand}) UNION ALL (SELECT a, b FROM simcand))"
    else:
        sim_ctes = ""
        cand = f"SELECT DISTINCT a, b FROM ({lsh_cand})"
    return f"""
{chain},
shd AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM shh){sim_ctes},
cand AS MATERIALIZED ({cand}),
sz AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
inter AS (SELECT c.a, c.b, count(*) AS i
          FROM cand c JOIN shd x ON x.doc_id = c.a JOIN shd y ON y.doc_id = c.b AND y.h = x.h
          GROUP BY 1, 2),
ver AS (SELECT i.a, i.b FROM inter i JOIN sz sa ON sa.doc_id = i.a JOIN sz sb ON sb.doc_id = i.b
        WHERE sa.sz + sb.sz - i.i > 0
          AND CAST(i.i AS DOUBLE) / CAST(sa.sz + sb.sz - i.i AS DOUBLE) >= {VERIFY_THRESHOLD}),
shas AS (SELECT doc_id, sha256(text) AS s FROM documents),
exact AS (SELECT x.doc_id AS a, y.doc_id AS b FROM shas x JOIN shas y ON x.s = y.s AND x.doc_id < y.doc_id),
allp AS (SELECT a, b FROM ver UNION SELECT a, b FROM exact),
edges AS (SELECT a AS src, b AS dst FROM allp UNION SELECT b AS src, a AS dst FROM allp),
reach AS (
  SELECT doc_id AS node, doc_id AS lab FROM documents
  UNION
  SELECT e.dst AS node, r.lab FROM reach r JOIN edges e ON e.src = r.node
)
{tail or DEFAULT_CLUSTER_TAIL}"""


DEFAULT_CLUSTER_TAIL = """SELECT CAST(node AS BIGINT) AS id, CAST(min(lab) AS BIGINT) AS cluster
FROM reach GROUP BY node"""
