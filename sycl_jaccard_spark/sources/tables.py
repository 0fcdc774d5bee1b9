"""Table access — the engine's source layer (reference S1-S4 analog).

The reference dispatches on file extension (``filetypes.cpp:27-56``) between
a text format and a self-describing binary format; Spark's analog is format
dispatch + schema-carrying scans. Production target is Iceberg
(``spark.read.table``); this sandbox has no Iceberg jars, so ``read_source_table``
falls back to parquet transparently — the pipeline code is identical either
way (only the session catalog config differs on a real cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_source_table(spark: SparkSession, source: str) -> DataFrame:
    """Iceberg table name (catalog.db.table) or a parquet path/dir."""
    if os.path.exists(source) or source.endswith(".parquet"):
        return spark.read.parquet(source)
    try:
        return spark.read.table(source)
    except Exception as exc:  # no catalog configured in sandbox
        raise ValueError(
            f"cannot read {source!r}: not a path and no table catalog; "
            "configure spark.sql.catalog.* for Iceberg on a real cluster"
        ) from exc


def documents_as_files(docs: DataFrame) -> DataFrame:
    """Adapt the driver's ``documents`` table to the pipeline's input shape
    (repo, path, commit, lang, content) + stable long id."""
    return docs.select(
        F.lit("testdata/documents").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.sha2(F.concat_ws(":", F.lit("doc"), F.col("doc_id").cast("string")), 256).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.col("doc_id").cast("long").alias("id"),
    )


def with_file_id(files: DataFrame) -> DataFrame:
    """Stable 64-bit id = xxhash64(repo, path, commit) — the reference's
    int32 vertex ids don't scale to 10^12 rows (SURVEY.md §7.0)."""
    return files.withColumn("id", F.xxhash64("repo", "path", "commit"))
