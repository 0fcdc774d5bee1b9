"""MinHash-LSH candidate generation: signatures → band hashes → buckets →
candidate pairs, with explicit skew handling (SURVEY.md §7.2).

The reference enumerates pairs as graph edges; LSH *generates* the pair list
that ``jaccard_pairs`` (the ``sygraph::jaccard_list`` analog) then verifies.

Scale notes (the part that matters at 10^12 files):
- banding is a JVM-side posexplode over the signature array — no Python;
- bucket membership is the only wide shuffle (groupBy band_key);
- candidate pairs come from a bucket self-join; bucket size is capped FIRST
  via a window rank so a boilerplate bucket of 10^6 docs can never produce
  10^12 pairs — dropped docs per bucket are observable (``lsh_bucket_stats``),
  no silent truncation;
- cross-band duplicate pairs are deduped BEFORE the (expensive) verify join —
  the one place a barrier is genuinely required;
- AQE skew-join handles residual imbalance (session.py enables it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sycl_jaccard_spark.config import PipelineConfig
from sycl_jaccard_spark.functions.minhash import minhash_expr, minhash_udf
from sycl_jaccard_spark.functions.shingles import md5_long

# minhash_impl="auto" crossover: JVM-expression minhash traverses the shingle
# array once per perm, the Arrow UDF pays one ~flat boundary crossing — the
# expression wins up to ~32 perms (measured, OPTIMIZATION_r06.md).
_EXPR_MAX_PERMS = 32

# bucket caps at or above this are "declared uncapped" — the cap can never
# bind (a 10^9-member bucket's self-join is ~10^18 pairs, out of reach by
# construction), so cap-mode candidate joins skip the rank window entirely.
# 10^9 exactly matches the oracle-parity contract's "never truncate" value.
UNCAPPED = 10**9


def minhash_signatures(
    items: DataFrame, cfg: PipelineConfig, hash_col: str = "shingle_hashes",
    materialize: bool = False,
) -> DataFrame:
    """Adds ``sig: array<long>`` (num_perms MinHash values).

    Implementation is picked by ``cfg.minhash_impl`` (results bit-identical,
    dual-impl-tested): the vectorized Arrow UDF, or the pure-JVM expression
    chain for narrow signatures — no Python boundary at all (guide §4.1).

    ``materialize=True`` cuts the plan with an eager localCheckpoint. Needed
    when the result feeds a generator (``explode``) WITHOUT an intervening
    checkpoint: Catalyst inlines the Python UDF into the generator expression,
    which cannot host Python UDFs (INTERNAL_ERROR: Cannot evaluate _minhash).
    The staged pipeline checkpoints signatures anyway, so it passes False.
    (The expression impl has no such constraint, but the checkpoint contract
    is honored either way so callers don't depend on the dispatch.)
    """
    impl = getattr(cfg, "minhash_impl", "auto")
    use_expr = impl == "expr" or (impl == "auto" and cfg.num_perms <= _EXPR_MAX_PERMS)
    if use_expr:
        out = items.withColumn("sig", minhash_expr(F.col(hash_col), cfg.num_perms, cfg.seed))
    else:
        out = items.withColumn("sig", minhash_udf(cfg.num_perms, cfg.seed)(F.col(hash_col)))
    return out.localCheckpoint(eager=True) if materialize else out


def band_hashes(signed: DataFrame, cfg: PipelineConfig, id_col: str = "id", portable: bool = False) -> DataFrame:
    """(id, band, band_hash): one row per (doc, band). JVM-side.

    ``portable=True`` hashes the band slice via the DuckDB-replayable
    md5-prefix of the '_'-joined values; default is xxhash64 over the slice.
    """
    r = cfg.rows_per_band
    if portable:
        one_band = lambda b: md5_long(  # noqa: E731
            F.concat_ws("_", *[F.element_at("sig", b * r + i + 1).cast("string") for i in range(r)])
        )
    else:
        one_band = lambda b: F.xxhash64(  # noqa: E731
            F.lit(b), *[F.element_at("sig", b * r + i + 1) for i in range(r)]
        )
    bands = F.array(*[
        F.struct(F.lit(b).alias("band"), one_band(b).alias("band_hash"))
        for b in range(cfg.bands)
    ])
    return (
        signed.select(id_col, F.explode(bands).alias("bh"))
        .select(id_col, F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash"))
    )


def lsh_bucket_stats(banded: DataFrame) -> DataFrame:
    """Bucket-size distribution — the skew observability hook."""
    return (
        banded.groupBy("band", "band_hash")
        .agg(F.count("*").alias("bucket_size"))
        .groupBy("bucket_size")
        .agg(F.count("*").alias("n_buckets"))
        .orderBy("bucket_size")
    )


def candidate_pairs(
    banded: DataFrame,
    cfg: PipelineConfig,
    id_col: str = "id",
    skew_mode: str = "cap",
    new_col: str | None = None,
) -> DataFrame:
    """Distinct candidate (a, b) pairs (a < b) from shared LSH buckets.

    ``new_col``: delta-mode filter — name of a boolean column on ``banded``
    marking newly-arrived docs; only pairs touching at least one new doc are
    emitted (old×old pairs in any shared bucket were generated by a previous
    run: bucket memberships only ever grow, and the cap keeps lowest ids, so
    an old×old pair inside today's capped bucket was inside yesterday's too).

    Skew handling for degenerate (boilerplate) buckets — both modes bound
    the per-bucket self-join quadratically, with observable loss:

    * ``skew_mode="cap"`` (default): buckets larger than ``cfg.bucket_cap``
      keep only the ``bucket_cap`` lowest ids (WindowGroupLimit pushdown —
      no full sort); dropped memberships are countable via ``capped_docs``.
    * ``skew_mode="salt"``: members of oversized buckets are *salted* into
      ``cfg.salt_buckets`` sub-buckets by id hash; pairs are generated within
      sub-buckets, so a B-member bucket yields ~B²/(2s) pairs instead of
      B²/2 while every member still participates (cross-salt pairs for true
      near-dups are recovered by the other 31 bands / SimHash / substring
      passes). Normal-size buckets are untouched in both modes.
    * ``skew_mode="auto"``: size-graded policy — buckets up to ``bucket_cap``
      untouched; the boilerplate band (``bucket_cap`` < B ≤
      ``cfg.salt_threshold``) is salted with DYNAMIC fan-out s = ⌈B /
      bucket_cap⌉ so sub-buckets stay ~bucket_cap and pair cost is LINEAR in
      B (~B·bucket_cap/2) with every member retained; pathological buckets
      (B > salt_threshold — e.g. an empty-file shingle at 10^12 docs) are
      capped to the ``bucket_cap`` lowest ids (drops observable via
      ``capped_docs``). Costs one extra count-window over the same partition
      key (no extra shuffle; the cap-only mode's WindowGroupLimit pushdown is
      traded for full-membership recall on mid-size buckets).

    The rank window and the self-join share the (band, band_hash)
    partitioning (exchange reuse); residual imbalance is AQE skew-join's job
    (enabled in session.py).
    """
    w = Window.partitionBy("band", "band_hash").orderBy(F.col(id_col))
    if skew_mode == "cap":
        if cfg.bucket_cap >= UNCAPPED:
            # declared-uncapped (the oracle-parity contract passes 10^9 to
            # mean "never truncate"): the rank window would keep every row
            # anyway, so skip its per-bucket sort outright — the self-join
            # below then runs straight off one exchange (guide §2.4). Any
            # bucket actually reaching 10^9 members would have made the
            # quadratic self-join unrunnable long before the cap mattered.
            capped = banded
        else:
            ranked = banded.withColumn("rn", F.row_number().over(w))
            capped = ranked.filter(F.col("rn") <= cfg.bucket_cap).drop("rn")
    elif skew_mode == "auto":
        wsz = Window.partitionBy("band", "band_hash")
        graded = (
            banded.withColumn("rn", F.row_number().over(w))
            .withColumn("bsz", F.count(F.lit(1)).over(wsz))
        )
        capped = (
            graded.filter(
                (F.col("bsz") <= cfg.salt_threshold) | (F.col("rn") <= cfg.bucket_cap)
            )
            .withColumn(
                "band_hash",
                F.when(
                    (F.col("bsz") > cfg.bucket_cap) & (F.col("bsz") <= cfg.salt_threshold),
                    # dynamic salt: sub-buckets of ~bucket_cap members. The
                    # salt hash includes the BAND so each band partitions the
                    # bucket differently — per-band sub-cliques then overlap
                    # across bands and connected components reunites the full
                    # bucket (a band-independent salt would cut identical
                    # buckets into the same disjoint cliques in every band).
                    F.xxhash64(
                        F.col("band_hash"),
                        F.pmod(
                            F.xxhash64(F.col("band"), F.col(id_col)),
                            F.ceil(F.col("bsz") / cfg.bucket_cap).cast("long"),
                        ),
                    ),
                ).otherwise(F.col("band_hash")),
            )
            .drop("rn", "bsz")
        )
    elif skew_mode == "salt":
        sizes = banded.groupBy("band", "band_hash").agg(F.count("*").alias("bsz"))
        capped = (
            banded.join(sizes, ["band", "band_hash"])
            .withColumn(
                "band_hash",
                F.when(
                    F.col("bsz") > cfg.bucket_cap,
                    # fold the salt into the bucket key: disjoint sub-buckets
                    F.xxhash64(
                        F.col("band_hash"),
                        F.pmod(F.xxhash64(F.col(id_col)), F.lit(cfg.salt_buckets)),
                    ),
                ).otherwise(F.col("band_hash")),
            )
            .drop("bsz")
        )
    else:
        raise ValueError(f"unknown skew_mode {skew_mode!r}")
    if new_col is None:
        left = capped.select("band", "band_hash", F.col(id_col).alias("a"))
        right = capped.select("band", "band_hash", F.col(id_col).alias("b"))
        joined = left.join(right, ["band", "band_hash"]).filter(F.col("a") < F.col("b"))
    else:
        left = capped.select(
            "band", "band_hash", F.col(id_col).alias("a"), F.col(new_col).alias("_a_new")
        )
        right = capped.select(
            "band", "band_hash", F.col(id_col).alias("b"), F.col(new_col).alias("_b_new")
        )
        joined = (
            left.join(right, ["band", "band_hash"])
            .filter((F.col("a") < F.col("b")) & (F.col("_a_new") | F.col("_b_new")))
        )
    return (
        joined.select("a", "b")
        .dropDuplicates(["a", "b"])  # cross-band dedup — required barrier
    )


def capped_docs(
    banded: DataFrame,
    cfg: PipelineConfig,
    id_col: str = "id",
    skew_mode: str | None = None,
) -> int:
    """How many (doc, bucket) memberships ``candidate_pairs`` actually
    dropped under the given skew mode — no silent caps, and no PHANTOM ones:

    * ``cap``: members ranked past ``bucket_cap`` in any bucket;
    * ``salt``: zero — salting retains every member;
    * ``auto``: only members of pathological buckets (> ``salt_threshold``)
      past the cap; the salted mid-size band retains everyone.

    ``skew_mode`` defaults to ``cfg.skew_mode`` so the counter and the
    candidate join always grade buckets by the same policy."""
    mode = skew_mode if skew_mode is not None else getattr(cfg, "skew_mode", "cap")
    if mode == "salt":
        return 0
    w = Window.partitionBy("band", "band_hash").orderBy(F.col(id_col))
    ranked = banded.withColumn("rn", F.row_number().over(w))
    dropped = ranked.filter(F.col("rn") > cfg.bucket_cap)
    if mode == "auto":
        wsz = Window.partitionBy("band", "band_hash")
        dropped = (
            ranked.withColumn("bsz", F.count(F.lit(1)).over(wsz))
            .filter((F.col("bsz") > cfg.salt_threshold) & (F.col("rn") > cfg.bucket_cap))
        )
    return dropped.count()


def candidate_pass_stats(
    banded: DataFrame, cfg: PipelineConfig, n_sim_tables: int = 0
) -> DataFrame:
    """Per-PASS candidate attribution over the unified (id, band, band_hash)
    relation: how many bucket memberships, multi-member buckets, and raw
    within-bucket pairs each pass (MinHash-LSH bands / SimHash block tables /
    substring line-grams) contributes — the observability a band/block/cap
    tuning decision needs before anything runs at full scale. Pure
    aggregation (one shuffle), no pair materialization.

    Band-id ranges follow the pipeline's layout (plans/pipeline.py):
    [0, bands) = LSH, [bands, bands + n_sim_tables) = SimHash, the rest =
    substring. Returns (pass, memberships, buckets, multi_buckets,
    raw_pairs) where raw_pairs = Σ C(bucket_size, 2) UNCAPPED — an upper
    bound on what the self-join would see without skew handling.
    """
    pass_col = (
        F.when(F.col("band") < cfg.bands, "lsh")
        .when(F.col("band") < cfg.bands + n_sim_tables, "simhash")
        .otherwise("substring")
    )
    per_bucket = (
        banded.select(pass_col.alias("pass"), "band", "band_hash")
        .groupBy("pass", "band", "band_hash")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    return (
        per_bucket.groupBy("pass")
        .agg(
            F.sum("sz").cast("long").alias("memberships"),
            F.count(F.lit(1)).cast("long").alias("buckets"),
            F.sum((F.col("sz") > 1).cast("long")).cast("long").alias("multi_buckets"),
            F.sum(F.col("sz") * (F.col("sz") - 1) / 2).cast("long").alias("raw_pairs"),
        )
        .orderBy("pass")
    )
