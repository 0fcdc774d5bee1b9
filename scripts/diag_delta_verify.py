"""One-off diagnostic: why does the delta verify join not scale with cores?

Bootstraps the SAME store/probe shape as eval_delta_scaling (120k/40k by
default), then replays the identical probe delivery at local[4] under
different runtime shuffle-partition counts (AQE off, fresh store clone per
trial) and prints the per-stage walls. Not part of the curated evidence —
a measurement harness for the fix.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sycl_jaccard_spark.config import PipelineConfig  # noqa: E402
from sycl_jaccard_spark.plans.delta import DeltaDedup  # noqa: E402
from sycl_jaccard_spark.session import get_spark  # noqa: E402
from sycl_jaccard_spark.sources.corpus import CorpusSpec, synth_source_files  # noqa: E402
from sycl_jaccard_spark.sources.tables import with_file_id  # noqa: E402


def main() -> int:
    n_store = int(os.environ.get("SPARK_GRAFT_DELTA_STORE", "120000"))
    n_probe = int(os.environ.get("SPARK_GRAFT_DELTA_PROBE", "40000"))
    cores = int(os.environ.get("SPARK_GRAFT_DIAG_CORES", "4"))
    parts = [int(x) for x in os.environ.get("SPARK_GRAFT_DIAG_PARTS", "4,16,32").split(",")]
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")

    work = tempfile.mkdtemp(prefix="delta_diag_")
    store_src = f"{work}/store"

    gen = get_spark("delta_diag_gen", cores=8, shuffle_partitions=8)
    spec = CorpusSpec(
        n_files=n_store, n_clusters=n_store // 8, cluster_min=2, cluster_max=6,
        edit_rate=0.06, exact_dup_rate=0.25, seed=777,
    )
    files, _ = synth_source_files(gen, spec)
    files = with_file_id(files).localCheckpoint(eager=True)
    DeltaDedup(gen, store_src, PipelineConfig()).add_batch(files)
    probe_path = f"{work}/probe.parquet"
    (
        files.limit(n_probe)
        .select(
            F.col("id").bitwiseXOR(F.lit(1 << 41)).alias("id"),
            F.concat(F.col("content"), F.lit("\nprobe = scale")).alias("content"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(probe_path)
    )
    gen.stop()

    spark = get_spark(f"delta_diag{cores}", cores=cores, shuffle_partitions=parts[0])
    probe = spark.read.parquet(probe_path).localCheckpoint(eager=True)
    # warmup: UDF worker fork
    from sycl_jaccard_spark.operators.lsh import minhash_signatures

    warm = probe.limit(max(cores * 8, 64)).repartition(cores).select(
        "id", F.array(F.xxhash64("content")).alias("shingle_hashes")
    )
    minhash_signatures(warm, PipelineConfig()).count()

    for p in parts:
        spark.conf.set("spark.sql.shuffle.partitions", str(p))
        clone = f"{work}/clone_{p}"
        shutil.copytree(store_src, clone)
        store = DeltaDedup(spark, clone, PipelineConfig())
        t0 = time.monotonic()
        summary = store.add_batch(probe)
        wall = time.monotonic() - t0
        stages = {m["stage"]: m["wall_s"] for m in store.metrics if m["stage"] != "batch_total"}
        print(json.dumps({
            "shuffle_partitions": p, "wall_s": round(wall, 1),
            "stages": stages, "n_new_edges": summary["n_new_edges"],
            "n_cand": next((m.get("rows") for m in store.metrics if m["stage"] == "candidates"), None),
        }), flush=True)
        shutil.rmtree(clone, ignore_errors=True)
        spark._jvm.System.gc()
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
