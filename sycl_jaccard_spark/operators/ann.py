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
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def hyperplane_signature(vec_col, planes: np.ndarray):
    """n_planes sign bits as a long (JVM-side: one aggregate per plane over
    literal plane arrays — fully codegen'd for moderate n_planes)."""
    bits = []
    for i, p in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(vec_col, lit, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_cosine_candidates(
    vectors: DataFrame,
    n_planes: int = 32,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Candidate (a, b) pairs whose hyperplane sign patterns share a band —
    the IVF/LSH scale path; score survivors with cosine afterwards."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    planes = _planes(dim, n_planes, seed)
    sig = vectors.select(
        F.col(id_col).alias("id"), hyperplane_signature(F.col(vec_col), planes).alias("sig")
    )
    width = n_planes // bands
    mask = (1 << width) - 1
    banded = sig.select(
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
    left = banded.select("band", "band_hash", F.col("id").alias("a"))
    right = banded.select("band", "band_hash", F.col("id").alias("b"))
    return (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
