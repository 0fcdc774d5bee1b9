"""SparkSession factory tuned for the dedup pipeline.

Local mode here; on a real cluster the same confs apply per-executor and the
session is created by ``spark-submit --py-files`` (SURVEY.md §3.1 analog of the
reference's device selection, ``main.cpp:157-187``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sycl_jaccard_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with AQE + Arrow enabled.

    ``cores=None`` -> ``local[$SPARK_GRAFT_CPUS or *]``. On a cluster, callers
    pass master via spark-submit and this function only applies SQL confs.
    ``master`` overrides entirely (e.g. ``local-cluster[8,1,8192]`` — real
    separate executor JVMs, the in-box analog of N executors).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    if master is None:
        master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cores or 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", os.environ.get("SPARK_GRAFT_AQE", "true"))
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # explicit (it is the default): forked Python UDF workers are reused
        # across tasks — re-fork + re-import per task would serialize the
        # pandas-UDF stages at higher parallelism
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # let the planner pick shuffled-hash over sort-merge when its size
        # conditions hold (guide §3.1): the pipeline's joins are dominated by
        # small-to-mid keyed relations (pairs, per-vertex aggregates) where
        # the per-partition sort is pure overhead; sort-merge remains the
        # fallback whenever the build side estimate is too large to hash.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        # zstd for parquet writes (guide §6): measured on the delta-store
        # ingest at sf0.1 — wall-neutral, ~5% fewer bytes on disk; the ratio
        # grows with the shingle relations that dominate store bytes at scale
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "zstd"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
