"""Deterministic corpus sampling + stratified source mixing — the step a
training-data pipeline runs AFTER hygiene (training_set) to hit a target
source composition: "60% web, 30% code, 10% wiki, reproducibly, at the
largest total the corpus supports".

Both operators sample by thresholding a portable 60-bit md5 hash of
(seed, id) — a pure column predicate, so sampling is a filter on the
corpus scan: no shuffle, no RNG state, reproducible across runs/cluster
sizes, and replayable in a SQL oracle
(:func:`~sycl_jaccard_spark.functions.shingles.md5_long` contract). Two
properties fall out of hash thresholding that per-row RNG cannot give:

* **determinism** — the same (corpus, targets, seed) always selects the
  same rows, on any cluster layout;
* **nesting** — the sample at rate r is a SUBSET of the sample at rate
  r' > r (same seed), so scaling a mix up or down never churns
  previously selected rows (stable training-set diffs).

The mix is *water-filled*: the total is scaled to the point where the
scarcest source (max target share relative to its available weight) is
taken WHOLE (rate 1), and every other source is down-sampled to match the
target proportions at that total — the largest achievable corpus honoring
the requested composition with no source oversampled.

The reference engine has no sampling surface (its pipeline ends at pair
scores, ``jaccard.cpp:811-819``); this is part of the LLM-pipeline layer
the brief asks for beyond it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sycl_jaccard_spark.functions.shingles import md5_long

#: size of the portable hash space: md5_long yields 15 hex digits = 60 bits
HASH_SPACE = float(2**60)


def sample_hash(id_col: Column | str, seed: int = 0) -> Column:
    """Portable 60-bit hash of ``(seed, id)``, uniform on [0, 2^60).

    DuckDB replay: ``('0x' || substr(md5(seed || '#' || CAST(id AS
    VARCHAR)), 1, 15))::BIGINT`` — the md5_long contract.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    # F.concat (not concat_ws): the oracle's `seed || '#' || id` is
    # NULL-propagating, so a NULL id must hash to NULL (row dropped by the
    # `<` filter) on the Spark side too — concat_ws would silently skip the
    # NULL and hash every NULL-id row to the same md5(seed#) value (ADVICE
    # r5). Identical bytes, and an identical hash, for non-null ids.
    return md5_long(F.concat(F.lit(f"{int(seed)}#"), c.cast("string")))


def deterministic_sample(
    df: DataFrame, rate: Column | float, id_col: str = "id", seed: int = 0
) -> DataFrame:
    """Keep each row iff ``hash(seed, id) < rate * 2^60`` — a reproducible,
    nested Bernoulli(rate) sample as a pure scan filter (no shuffle, no
    RNG state). ``rate`` may be a literal or a column (per-row rates, as
    :func:`stratified_mix` uses)."""
    r = rate if isinstance(rate, Column) else F.lit(float(rate))
    return df.filter(
        sample_hash(id_col, seed).cast("double") < r * F.lit(HASH_SPACE)
    )


def stratified_mix(
    files: DataFrame,
    targets: dict[str, float],
    source_col: str = "source",
    weight_col: str | None = None,
    id_col: str = "id",
    seed: int = 0,
    total: float | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Water-filled stratified sample: the largest deterministic sample of
    ``files`` whose per-source WEIGHT (``weight_col``, e.g. a token or char
    count; row count when None) is proportional to ``targets``.

    ``targets`` maps source values to relative shares (any positive
    numbers — only ratios matter). Sources not named in ``targets`` are
    excluded; named sources absent from the corpus are ignored (they
    contribute no weight, so they cannot constrain the fill level).

    Let ``w_s`` be source s's available weight and ``p_s`` its normalized
    share. The fill level is ``T = min_s(w_s / p_s)`` — the largest total
    at which no source needs rate > 1 — and each source samples at
    ``rate_s = min(1, (p_s / w_s) · T)``: the scarcest source is taken
    whole, every other is thinned to proportion. Expected sampled weight
    per source is ``p_s · T``.

    ``total`` (optional) caps the mix at a fixed BUDGET: the expected total
    sampled weight becomes ``min(total, max feasible)`` while preserving
    the target proportions — "give me at most B tokens at this mix". With
    ``total=None`` the mix fills to the maximum the corpus supports.

    Returns ``(sampled, rates)``; ``rates`` is the small (source, weight,
    share, rate) relation for observability. Execution shape: one tiny
    per-source aggregate (≤ |targets| rows), a broadcast join of the rates
    onto the corpus, and the inline hash filter — the corpus is never
    shuffled.
    """
    if not targets:
        raise ValueError("targets must name at least one source")
    if any(v <= 0 for v in targets.values()):
        raise ValueError("target shares must be positive")
    if total is not None and total <= 0:
        raise ValueError("total budget must be positive")
    spark = files.sparkSession
    tdf = spark.createDataFrame(
        [(s, float(v)) for s, v in sorted(targets.items())],
        f"{source_col} string, share double",
    )
    weight = (
        F.lit(1).cast("long") if weight_col is None else F.col(weight_col)
    )
    weights = (
        files.join(F.broadcast(tdf.select(source_col)), source_col)
        .groupBy(source_col)
        .agg(F.sum(weight).alias("weight"))
        # a zero-weight source cannot be sampled by weight: treat it like an
        # absent one (otherwise 0/0 poisons the fill level and the rate)
        .filter(F.col("weight") > 0)
    )
    per_source = weights.join(F.broadcast(tdf), source_col).select(
        source_col,
        "weight",
        "share",
        (F.col("weight").cast("double") / F.col("share")).alias("_fill"),
    )
    fill = per_source.agg(
        F.min("_fill").alias("fill_t"), F.sum("share").alias("_share_sum")
    )
    fill_expr = F.col("fill_t")
    if total is not None:
        # fill level is weight-per-unit-share: expected total = T · Σshares,
        # where the sum runs over sources actually PRESENT in the corpus
        # (absent/zero-weight targets are ignored, per the contract above)
        fill_expr = F.least(
            fill_expr, F.lit(float(total)) / F.col("_share_sum")
        )
    rates = per_source.crossJoin(F.broadcast(fill)).select(
        source_col,
        "weight",
        "share",
        F.least(
            F.lit(1.0),
            (F.col("share") / F.col("weight").cast("double")) * fill_expr,
        ).alias("rate"),
    )
    sampled = deterministic_sample(
        files.join(
            F.broadcast(
                rates.select(source_col, F.col("rate").alias("__mix_rate"))
            ),
            source_col,
        ),
        F.col("__mix_rate"),
        id_col=id_col,
        seed=seed,
    ).select(*files.columns)
    return sampled, rates


def leakage_safe_split(
    clusters: DataFrame,
    test_share: float,
    seed: int = 0,
    id_col: str = "id",
    cluster_col: str = "cluster",
) -> DataFrame:
    """(id, cluster, split) — train/test assignment by CLUSTER hash, so
    every member of a near-dup cluster lands on the SAME side.

    A doc-level random split leaks: near-duplicates of training documents
    end up in the eval set and inflate every metric. Hashing the cluster
    label instead makes straddling impossible by construction — the unit
    of assignment is the duplicate class the dedup pipeline already
    computed. ``test_share`` is the expected fraction of CLUSTERS (≈ docs
    when cluster sizes are small relative to the corpus); the same
    seed/threshold semantics as :func:`deterministic_sample` apply, so the
    test set at share s is NESTED in the test set at any larger share
    (growing the eval set never moves a cluster back to train). A pure
    column expression on the clusters relation — no join, no shuffle.
    """
    if not (0.0 <= test_share <= 1.0):
        raise ValueError("test_share must be in [0, 1]")
    h = sample_hash(F.col(cluster_col), seed).cast("double")
    return clusters.select(
        id_col,
        cluster_col,
        F.when(
            h < F.lit(float(test_share)) * F.lit(HASH_SPACE), F.lit("test")
        )
        .otherwise(F.lit("train"))
        .alias("split"),
    )
