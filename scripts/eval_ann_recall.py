"""ANN candidate-generation recall@k vs the exact cosine top-k baseline at
a scale where the curves mean something (VERDICT r4 #7: the IVF/hyperplane
families were oracle-exact but had no recall evidence).

Corpus: N (default 100k) clustered synthetic embeddings (mixture of C
Gaussian centers — uniform-random vectors make nearest neighbors degenerate
and every ANN method look alike). Baseline: exact ``cosine_topk`` for Q
query vectors. A (q, n) neighbor pair is RECOVERED by a method iff the two
ids share a probed IVF list / a hyperplane band — candidate-generation
recall, computed from list membership joins without materializing the full
pair set.

Sweeps: IVF (trained Lloyd codebook) over nprobe; hyperplane LSH over
(n_planes, bands). Writes the '## ANN candidate recall@k' section of
BENCH/ANN_RECALL.md.

Usage: python scripts/eval_ann_recall.py
       SPARK_GRAFT_ANN_N=20000 SPARK_GRAFT_CPUS=8 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from scripts._bench_md import replace_section  # noqa: E402
from sycl_jaccard_spark.operators.ann import (  # noqa: E402
    cosine_topk,
    hyperplane_banded,
    ivf_listed,
    train_ivf_centroids,
)
from sycl_jaccard_spark.session import get_spark  # noqa: E402

DIM = 64
N_CENTERS = 200     # mixture components (ground-truth cluster structure)
# noise radius ~ NOISE*sqrt(DIM) = 16 vs pairwise center distance
# ~ sqrt(2*DIM) = 11.3: clusters overlap heavily, so true neighbors straddle
# Voronoi/sign boundaries and the nprobe/bands tradeoff is visible. Probed
# at 20k: NOISE<=1.5 saturates IVF (recall ~1.0 even at nprobe=1 — every
# cluster fits one trained cell); 3.0 is nearly unclustered (0.09 at
# nprobe=1). 2.0 yields a readable curve.
NOISE = 2.0
TOPK = 10
N_QUERIES = 100
SEED = 42
IVF_K = 256         # inverted lists
IVF_ITERS = 2


def synth_embeddings(spark, n: int):
    """Deterministic clustered embeddings, generated DISTRIBUTED: vector(id)
    = center[id % C] + noise(id), both seeded — same id, same vector, on any
    partitioning."""
    centers = np.random.default_rng(SEED).standard_normal((N_CENTERS, DIM))

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def vec_of(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids.to_numpy():
            rng = np.random.default_rng(SEED * 1_000_003 + int(i))
            v = centers[int(i) % N_CENTERS] + NOISE * rng.standard_normal(DIM)
            out.append(v.astype(np.float32).tolist())
        return pd.Series(out)

    return (
        spark.range(n)
        .select(F.col("id").cast("long").alias("vec_id"), vec_of("id").alias("embedding"))
        .localCheckpoint(eager=True)
    )


def recall_from_membership(exact_pairs, membership) -> float:
    """Fraction of exact (query, neighbor) pairs whose two ids share at
    least one membership key (list id / (band, band_hash))."""
    keys = [c for c in membership.columns if c != "id"]
    ma = membership.select(F.col("id").alias("query_id"), *keys)
    mb = membership.select(F.col("id").alias("neighbor_id"), *keys)
    hit = (
        exact_pairs.join(ma, "query_id")
        .join(mb, ["neighbor_id", *keys], "left_semi")
        .select("query_id", "neighbor_id")
        .distinct()
        .count()
    )
    return hit / exact_pairs.count()


def main() -> int:
    n = int(os.environ.get("SPARK_GRAFT_ANN_N", "100000"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("eval_ann_recall", cores=cores, shuffle_partitions=cores)

    vecs = synth_embeddings(spark, n)
    queries = vecs.filter(F.col("vec_id") < N_QUERIES)

    t0 = time.monotonic()
    exact = (
        cosine_topk(queries, vecs, TOPK)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    n_exact = exact.count()
    exact_wall = time.monotonic() - t0
    print(f"exact top-{TOPK} baseline: {n_exact} pairs, {exact_wall:.1f}s")

    ivf_rows = []
    cents = train_ivf_centroids(vecs, DIM, IVF_K, IVF_ITERS, SEED)
    for nprobe in (1, 2, 4, 8):
        t0 = time.monotonic()
        listed = ivf_listed(vecs, DIM, IVF_K, nprobe, SEED, "vec_id", "embedding", cents)
        r = recall_from_membership(exact, listed.select("id", "cid"))
        ivf_rows.append((nprobe, r, time.monotonic() - t0))
        print(f"IVF K={IVF_K} nprobe={nprobe}: recall@{TOPK}={r:.3f}")

    lsh_rows = []
    for n_planes, bands in ((32, 4), (32, 8), (64, 8), (64, 16)):
        t0 = time.monotonic()
        banded = hyperplane_banded(vecs, DIM, n_planes, bands, SEED, "vec_id", "embedding")
        r = recall_from_membership(exact, banded.select("id", "band", "band_hash"))
        lsh_rows.append((n_planes, bands, n_planes // bands, r, time.monotonic() - t0))
        print(f"LSH planes={n_planes} bands={bands}: recall@{TOPK}={r:.3f}")

    ivf_tbl = "\n".join(
        f"| {p} | {r:.3f} | {w:.1f} |" for p, r, w in ivf_rows
    )
    lsh_tbl = "\n".join(
        f"| {pl} | {b} | {pl // b} | {r:.3f} | {w:.1f} |" for pl, b, _, r, w in lsh_rows
    )
    replace_section("BENCH/ANN_RECALL.md", "\n\n## ANN candidate recall@k", f"""

## ANN candidate recall@k vs exact baseline (scripts/eval_ann_recall.py)

{n:,} clustered embeddings (dim {DIM}, {N_CENTERS}-center Gaussian mixture,
noise {NOISE}), {N_QUERIES} queries, exact quantized-cosine top-{TOPK}
baseline ({n_exact} truth pairs, {exact_wall:.1f}s brute force at local[{cores}]).
Recall = fraction of exact (query, neighbor) pairs co-located by the
method's candidate structure (shared probed list / shared band).

IVF — trained Lloyd codebook, K={IVF_K} lists, {IVF_ITERS} iterations:

| nprobe | recall@{TOPK} | wall (s) |
|---|---|---|
{ivf_tbl}

Hyperplane LSH (sign-bit bands):

| planes | bands | bits/band | recall@{TOPK} | wall (s) |
|---|---|---|---|---|
{lsh_tbl}

Reading: pick nprobe / band config from these curves for a target recall;
the exact path stays the correctness oracle (both families are
oracle-replayed bit-for-bit in the driver contract).
""")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
