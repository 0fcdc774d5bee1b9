"""Approximate-nearest-neighbor search over an embedding column —
embedding-cosine near-dup detection (the training-data-pipeline sibling of
shingle Jaccard; same candidate→verify shape).

* ``cosine_topk`` — brute-force baseline: query×corpus join with a JVM-side
  dot product (``F.zip_with`` + ``F.aggregate``, codegen'd — no Python). The
  correctness oracle; O(Q·N) so callers bound Q.
* ``lsh_cosine_candidates`` — scale path: random-hyperplane LSH (SimHash for
  vectors). Sign-pattern band keys bucket the corpus; only same-bucket pairs
  are scored. Planes are seeded and broadcast as literals.

Quantization note: embeddings are float32; both engines' float→double sums
can differ in last bits, so scores are computed on integer-quantized values
(round(x*10000)) making results engine-exact (the DuckDB oracle replays them).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _quantized(col, scale: int = 10_000):
    return F.transform(col, lambda e: F.round(e.cast("double") * scale).cast("long"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def _norm2(a):
    return F.aggregate(a, F.lit(0).cast("long"), lambda acc, v: acc + v * v)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine) — exact top-k by quantized cosine,
    self-matches excluded, ties broken by neighbor id (deterministic)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _quantized(F.col(vec_col)).alias("qv")
    )
    # NOTE (r6 ledger): repartitioning a single-split corpus side before the
    # crossJoin was measured and REJECTED — with the driver's count
    # estimator the warm probe is slightly FASTER unspread (1.32-1.43s vs
    # 1.52-1.63s at sf0.1): the dot-product pass over a <=128MB split is
    # cheaper than the extra exchange, and larger inputs split naturally.
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _quantized(F.col(vec_col)).alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qv"), F.col("cv")).cast("double")
                / (F.sqrt(_norm2(F.col("qv")).cast("double")) * F.sqrt(_norm2(F.col("cv")).cast("double")))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine")
    )


PLANE_SCALE = 1_000_000   # hyperplane coeffs quantized to int64 (×1e6)
VEC_SCALE = 10_000        # embeddings quantized to int64 (×1e4)


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """Round-half-away-from-zero to int64. np.round is banker's (half-to-even)
    while Spark's F.round and DuckDB's round() are half-away — a component
    landing exactly on .5 after scaling would quantize differently across
    engines and could flip an LSH sign bit / IVF assignment. All three engines
    share this one rule."""
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


def quantized_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Seeded hyperplanes, integer-quantized: dot(vec_q, plane_q) stays exact
    in int64 (|dot| < dim * 1e4 * 1e6 * few-sigma ≈ 1e14 for dim ≤ 4096), so
    the sign bit is bit-identical in NumPy, Spark SQL and the DuckDB oracle —
    float summation order can flip near-zero signs between engines."""
    rng = np.random.default_rng(seed)
    return np.round(rng.standard_normal((n_planes, dim)) * PLANE_SCALE).astype(np.int64)


def hyperplane_signature_udf(planes_q: np.ndarray):
    """pandas UDF: array<float> embedding -> long sign-bit signature via ONE
    NumPy int64 matmul per Arrow batch (r1 built n_planes inline literal-array
    aggregates — ~50k literals in one projection at real embedding dims)."""
    pt = planes_q.T.copy()  # (dim, n_planes)

    @F.pandas_udf(T.LongType())
    def _sig(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        m = _round_half_away(np.stack(vecs.to_numpy()).astype(np.float64) * VEC_SCALE)
        bits = (m @ pt) >= 0  # (B, n_planes)
        weights = np.int64(1) << np.arange(pt.shape[1], dtype=np.int64)
        return pd.Series(bits @ weights)

    return _sig


def lsh_cosine_candidates(
    vectors: DataFrame,
    dim: int,
    n_planes: int = 32,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int = 256,
) -> DataFrame:
    """Candidate (a, b) pairs whose hyperplane sign patterns share a band —
    the IVF/LSH scale path; score survivors with cosine afterwards.

    ``dim`` is required (no driver-side ``.first()`` during plan building —
    array columns carry no static length). Buckets larger than ``bucket_cap``
    keep only the ``bucket_cap`` lowest ids before the self-join — the same
    rank-window skew bound as the text path (operators/lsh.py:106-128):
    correlated embeddings routinely concentrate in one dominant sign-pattern
    bucket whose uncapped self-join goes quadratic.
    """
    from sycl_jaccard_spark.operators.lsh import UNCAPPED

    banded = _hyperplane_banded(vectors, dim, n_planes, bands, seed, id_col, vec_col)
    if bucket_cap >= UNCAPPED:
        # declared-uncapped contract call — the rank window would keep every
        # row; skip its per-bucket sort (same rule as operators/lsh.py)
        capped = banded
    else:
        w = Window.partitionBy("band", "band_hash").orderBy(F.col("id"))
        capped = banded.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= bucket_cap
        ).drop("rn")
    left = capped.select("band", "band_hash", F.col("id").alias("a"))
    right = capped.select("band", "band_hash", F.col("id").alias("b"))
    return (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )


def _hyperplane_banded(
    vectors: DataFrame, dim: int, n_planes: int, bands: int, seed: int,
    id_col: str, vec_col: str,
) -> DataFrame:
    """(id, band, band_hash) sign-pattern band membership (shared by the
    candidate join and the drop counter)."""
    planes_q = quantized_planes(dim, n_planes, seed)
    sig = vectors.select(
        F.col(id_col).alias("id"),
        hyperplane_signature_udf(planes_q)(F.col(vec_col)).alias("sig"),
    ).localCheckpoint(eager=True)  # pandas-UDF column cannot feed a generator
    width = n_planes // bands
    mask = (1 << width) - 1
    return sig.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned("sig", b * width).bitwiseAND(F.lit(mask)).alias("band_hash"),
                )
                for b in range(bands)
            ])
        ).alias("bh"),
    ).select("id", "bh.band", "bh.band_hash")


def lsh_capped_members(
    vectors: DataFrame,
    dim: int,
    n_planes: int = 32,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int = 256,
    banded: DataFrame | None = None,
) -> int:
    """How many (vector, bucket) memberships ``lsh_cosine_candidates``' cap
    dropped — the embedding path's "no silent caps" counter (the text path's
    ``operators.lsh.capped_docs`` applied to hyperplane buckets).

    Pass ``banded`` (from :func:`hyperplane_banded`) to share the signature
    pass with the candidate join — the pandas-UDF matmul over the corpus is
    the expensive part, and recomputing it just to count drops doubles it."""
    if banded is None:
        banded = _hyperplane_banded(vectors, dim, n_planes, bands, seed, id_col, vec_col)
    w = Window.partitionBy("band", "band_hash").orderBy(F.col("id"))
    return (
        banded.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > bucket_cap)
        .count()
    )


def quantized_centroids(dim: int, n_centroids: int, seed: int) -> np.ndarray:
    """Seeded coarse-quantizer centroids, int64-quantized like the vectors.

    Deterministic random centroids stand in for a trained k-means codebook
    (the IVF pattern, e.g. FAISS IndexIVF): the *structure* — coarse assign,
    nprobe probing, within-list candidate join — is identical, and a trained
    codebook can be dropped in as the literal array without touching the
    plan. Random centroids keep the operator seeded + oracle-replayable.

    Rows are L2-normalized BEFORE quantization: with raw gaussian centroids
    in high dim the |c|^2 spread (~sqrt(2d)·scale²) dominates the dot term,
    so every vector would pick the same smallest-norm centroids and the
    index degenerates to one list. Equal norms make assignment directional
    (spherical Voronoi), the standard shape for cosine-metric IVF."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_centroids, dim))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    return np.round(c * PLANE_SCALE).astype(np.int64)


def _half_away_div(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Exact integer mean with half-away-from-zero rounding: sign(s) *
    ((2|s| + n) // (2n)). Pure int64 — bit-identical between the NumPy driver
    update and the DuckDB replay's `//` (both floor non-negative operands)."""
    s = s.astype(np.int64)
    n = n.astype(np.int64)
    return np.sign(s) * ((2 * np.abs(s) + n) // (2 * n))


def init_centroids(dim: int, n_centroids: int, seed: int) -> np.ndarray:
    """Seeded unit-norm init codebook in the VECTOR quantization space
    (×VEC_SCALE, not PLANE_SCALE): Lloyd updates replace centroids with means
    of assigned quantized vectors, so init and updates must share one scale
    for the -2·v·c + |c|² argmin to stay a squared-L2 ranking."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_centroids, dim))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    return np.round(c * VEC_SCALE).astype(np.int64)


def _assign_cid_udf(centroids_q: np.ndarray):
    """pandas UDF: quantized vector array<long> -> nearest centroid id.
    Score -2·v·c + |c|² (int-exact in float64: |score| < dim·1e8 « 2^53);
    np.argmin returns the FIRST minimum, so ties break to the lowest cid —
    the same rule as the SQL replay's ORDER BY score, cid."""
    ct = centroids_q.T.astype(np.float64).copy()              # (dim, K)
    c2 = (centroids_q * centroids_q).sum(axis=1).astype(np.float64)

    @F.pandas_udf(T.IntegerType())
    def _assign(vqs: pd.Series) -> pd.Series:
        if len(vqs) == 0:
            return pd.Series([], dtype="int32")
        m = np.stack(vqs.to_numpy()).astype(np.float64)
        scores = -2.0 * (m @ ct) + c2[None, :]
        return pd.Series(np.argmin(scores, axis=1).astype("int32"))

    return _assign


def train_ivf_centroids(
    vectors: DataFrame,
    dim: int,
    n_centroids: int = 16,
    n_iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed Lloyd k-means over the quantized embedding space — the
    trained codebook that drops into :func:`ivf_candidates` via
    ``centroids_q=`` (replacing the seeded random stand-in).

    Fully deterministic and engine-exact: vectors and centroids live in int64
    at VEC_SCALE; assignment is the exact integer argmin (ties → lowest cid);
    the mean is the exact half-away-from-zero integer division; empty
    clusters keep their previous centroid. A DuckDB oracle replays the whole
    unrolled training bit-for-bit (``oracle_sql()['ann_ivf_train']``).

    Scale shape: one Arrow-batched matmul pass assigns (no shuffle), then
    posexplode→groupBy(cid, pos) rides Spark's map-side partial aggregation —
    each task emits ≤ K·dim partials, the driver collects K·dim sums
    (codebook-sized, ~16·768 rows at production dims) per iteration. Train on
    a ``.sample()`` of the corpus for 10^12-row tables, standard IVF practice."""
    cents = init_centroids(dim, n_centroids, seed)
    vq = vectors.select(
        F.col(id_col).alias("id"), _quantized(F.col(vec_col)).alias("vq")
    ).localCheckpoint(eager=True)  # reused every iteration — cut lineage once
    for _ in range(n_iters):
        assigned = vq.select("vq", _assign_cid_udf(cents)(F.col("vq")).alias("cid"))
        rows = (
            assigned.select("cid", F.posexplode("vq").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        sums = np.zeros((n_centroids, dim), dtype=np.int64)
        counts = np.zeros(n_centroids, dtype=np.int64)
        for r in rows:
            sums[r["cid"], r["pos"]] = r["s"]
            counts[r["cid"]] = r["n"]
        new = cents.copy()
        nonempty = counts > 0
        new[nonempty] = _half_away_div(sums[nonempty], counts[nonempty, None])
        cents = new
    return cents


def ivf_assign_udf(centroids_q: np.ndarray, nprobe: int, with_cos: bool = False):
    """pandas UDF: embedding -> array<int> of the ``nprobe`` nearest centroid
    ids. Ranking key is the exact integer score -2*v.c + |c|^2 (adding the
    per-row constant |v|^2 gives squared L2, which cannot change the order),
    ties broken by centroid id — bit-identical to the SQL replay.

    ``with_cos=True`` returns ``struct<cids: array<int>, cos: double>``
    instead, where ``cos`` is the cosine of the vector to its NEAREST
    centroid — a codebook-fit diagnostic (how well the frozen codebook still
    covers incoming data), computed from the same matmul at zero extra
    passes. The cids ranking stays the exact integer argmin; only the
    diagnostic is floating-point."""
    ct = centroids_q.T.copy()                      # (dim, K)
    c2 = (centroids_q * centroids_q).sum(axis=1)   # (K,)
    cnorm = np.sqrt(c2.astype(np.float64))

    def _rank(vecs: pd.Series):
        m = _round_half_away(np.stack(vecs.to_numpy()).astype(np.float64) * VEC_SCALE)
        dots = m @ ct
        scores = -2 * dots + c2[None, :]
        order = np.argsort(scores, axis=1, kind="stable")[:, :nprobe]
        return m, dots, order

    if not with_cos:

        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def _assign(vecs: pd.Series) -> pd.Series:
            if len(vecs) == 0:
                return pd.Series([], dtype="object")
            _m, _dots, order = _rank(vecs)
            return pd.Series([row.astype("int32").tolist() for row in order])

        return _assign

    out_type = T.StructType(
        [
            T.StructField("cids", T.ArrayType(T.IntegerType())),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    @F.pandas_udf(out_type)
    def _assign_cos(vecs: pd.Series) -> pd.DataFrame:
        if len(vecs) == 0:
            return pd.DataFrame({"cids": pd.Series([], dtype="object"),
                                 "cos": pd.Series([], dtype="float64")})
        m, dots, order = _rank(vecs)
        best = order[:, 0]
        vnorm = np.sqrt((m * m).sum(axis=1))
        denom = vnorm * cnorm[best]
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = np.where(denom > 0, dots[np.arange(len(best)), best] / denom, 0.0)
        return pd.DataFrame(
            {"cids": [row.astype("int32").tolist() for row in order], "cos": cos}
        )

    return _assign_cos


def ivf_candidates(
    vectors: DataFrame,
    dim: int,
    n_centroids: int = 16,
    nprobe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int = 4096,
    centroids_q: np.ndarray | None = None,
) -> DataFrame:
    """IVF-style candidate pairs: vectors sharing a probed inverted list.

    The scale path next to :func:`lsh_cosine_candidates` — K lists partition
    the corpus so the self-join is bounded by the largest list (capped), and
    ``nprobe > 1`` recovers neighbors that straddle a Voronoi boundary. One
    shuffle to the list key, rank-window cap, self-join, pair dedup — the
    same shape (and skew discipline) as the text LSH path.

    ``centroids_q``: a trained codebook from :func:`train_ivf_centroids`
    (int64, VEC_SCALE space); defaults to the seeded random quantizer."""
    from sycl_jaccard_spark.operators.lsh import UNCAPPED

    listed = _ivf_listed(
        vectors, dim, n_centroids, nprobe, seed, id_col, vec_col, centroids_q
    )
    if bucket_cap >= UNCAPPED:
        capped = listed  # declared-uncapped: skip the no-op rank window
    else:
        w = Window.partitionBy("cid").orderBy(F.col("id"))
        capped = listed.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= bucket_cap
        ).drop("rn")
    left = capped.select("cid", F.col("id").alias("a"))
    right = capped.select("cid", F.col("id").alias("b"))
    return (
        left.join(right, "cid")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )


def _ivf_listed(
    vectors: DataFrame, dim: int, n_centroids: int, nprobe: int, seed: int,
    id_col: str, vec_col: str, centroids_q: np.ndarray | None = None,
) -> DataFrame:
    """(id, cid) probed inverted-list membership (shared by the candidate
    join and the drop counter)."""
    cents = centroids_q if centroids_q is not None else quantized_centroids(
        dim, n_centroids, seed
    )
    assign = vectors.select(
        F.col(id_col).alias("id"),
        ivf_assign_udf(cents, nprobe)(
            F.col(vec_col)
        ).alias("cids"),
    ).localCheckpoint(eager=True)  # pandas-UDF column cannot feed a generator
    return assign.select("id", F.explode("cids").alias("cid"))


# public aliases — callers share these intermediates between the candidate
# join and the drop counters (one pandas-UDF pass instead of two)
def hyperplane_banded(*args, **kwargs) -> DataFrame:
    return _hyperplane_banded(*args, **kwargs)


def ivf_listed(*args, **kwargs) -> DataFrame:
    return _ivf_listed(*args, **kwargs)


def ivf_capped_members(
    vectors: DataFrame,
    dim: int,
    n_centroids: int = 16,
    nprobe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int = 4096,
    centroids_q: np.ndarray | None = None,
    listed: DataFrame | None = None,
) -> int:
    """How many (vector, list) memberships ``ivf_candidates``' cap dropped —
    no silent caps on the IVF path either. Pass ``listed`` (from
    :func:`ivf_listed`) to reuse the assignment pass instead of paying the
    pandas-UDF matmul a second time."""
    if listed is None:
        listed = _ivf_listed(
            vectors, dim, n_centroids, nprobe, seed, id_col, vec_col, centroids_q
        )
    w = Window.partitionBy("cid").orderBy(F.col("id"))
    return (
        listed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > bucket_cap)
        .count()
    )


def cosine_pairs(
    vectors: DataFrame,
    pairs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact quantized cosine for an explicit candidate-pair list — the
    embedding-space mirror of ``jaccard_pairs`` (candidate→verify shape):
    LSH/IVF emit (a, b); this scores them with the engine-exact integer-
    quantized cosine. Returns (a, b, cosine)."""
    a = vectors.select(F.col(id_col).alias("a"), _quantized(F.col(vec_col)).alias("va"))
    b = vectors.select(F.col(id_col).alias("b"), _quantized(F.col(vec_col)).alias("vb"))
    return (
        pairs.select("a", "b")
        .join(a, "a")
        .join(b, "b")
        .select(
            "a",
            "b",
            (
                _dot(F.col("va"), F.col("vb")).cast("double")
                / (F.sqrt(_norm2(F.col("va")).cast("double")) * F.sqrt(_norm2(F.col("vb")).cast("double")))
            ).alias("cosine"),
        )
    )


def embedding_near_dups(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.9,
    method: str = "ivf",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kwargs,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidate generation (IVF lists
    or hyperplane LSH) then exact cosine verification >= threshold — the
    dense-vector sibling of the MinHash→exact-Jaccard text pipeline."""
    if method == "ivf":
        cands = ivf_candidates(vectors, dim, id_col=id_col, vec_col=vec_col, **kwargs)
    elif method == "lsh":
        cands = lsh_cosine_candidates(vectors, dim, id_col=id_col, vec_col=vec_col, **kwargs)
    else:
        raise ValueError(f"unknown method {method!r}")
    scored = cosine_pairs(vectors, cands, id_col=id_col, vec_col=vec_col)
    return scored.filter(F.col("cosine") >= threshold)
