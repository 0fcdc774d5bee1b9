"""MatrixMarket-style text source/sink + checkpoint introspection —
reference operators S1-S7, S10 (SURVEY.md §2.1) re-expressed on DataFrames.

The reference reads `%%MatrixMarket matrix coordinate <field> <symmetry>`
headers (``readMtxToCSR.cpp:49-115``), treats field ∈ {real,double,integer}
as weighted and symmetry != general as undirected, shifts 1-indexed ids to
0-indexed, and writes output sorted destination-major via a custom
comparator (``mtx_less``, ``readMtxToCSR.cpp:22-32``). Same semantics here;
the distributed text scan replaces the sequential ifstream parse.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WEIGHTED_FIELDS = {"real", "double", "integer"}


@dataclass(frozen=True)
class MtxHeader:
    field: str = "real"
    symmetry: str = "general"

    @property
    def is_weighted(self) -> bool:
        return self.field in WEIGHTED_FIELDS

    @property
    def is_directed(self) -> bool:
        return self.symmetry == "general"


def read_mtx(spark: SparkSession, path: str) -> tuple[DataFrame, MtxHeader]:
    """Parse an .mtx coordinate file into (edges(src,dst,weight), header).

    Header/dims parsing happens on the driver (two small head lines, like the
    reference); edge lines are a distributed text scan. 1-indexed ids become
    0-indexed (``readMtxToCSR.cpp:161-162``); unweighted edges get weight 1.0
    (``readCoord``, ``readMtxToCSR.cpp:41-44``); complex fields are rejected
    (``readMtxToCSR.cpp:78-81``); duplicate coordinates are dropped (std::set
    semantics).
    """
    head = spark.read.text(path).limit(1).collect()[0].value.strip()
    parts = head.split()
    if len(parts) < 5 or not head.startswith("%%MatrixMarket"):
        raise ValueError(f"not a MatrixMarket header: {head!r}")
    field, symmetry = parts[3].lower(), parts[4].lower()
    if field == "complex":
        raise ValueError("complex MTX fields are unsupported (as in the reference)")
    header = MtxHeader(field=field, symmetry=symmetry)

    lines = (
        spark.read.text(path)
        .filter(~F.col("value").startswith("%"))
        .filter(F.trim("value") != "")
        .select(F.split(F.trim("value"), r"\s+").alias("f"))
    )
    # first non-comment line is the dims line "rows cols nnz": drop exactly
    # one occurrence by tagging with monotonically increasing order
    lines = lines.withColumn("_ord", F.monotonically_increasing_id())
    dims_ord = lines.agg(F.min("_ord")).collect()[0][0]
    body = lines.filter(F.col("_ord") != dims_ord)
    w = (
        F.element_at("f", 3).cast("double")
        if header.is_weighted
        else F.lit(1.0)
    )
    edges = body.select(
        (F.element_at("f", 1).cast("long") - 1).alias("src"),
        (F.element_at("f", 2).cast("long") - 1).alias("dst"),
        F.coalesce(w, F.lit(1.0)).alias("weight"),
    ).dropDuplicates(["src", "dst"])
    return edges, header


def write_mtx(
    edges: DataFrame,
    path: str,
    n_vertices: int | None = None,
    weighted: bool = True,
    symmetric: bool = False,
) -> None:
    """Write edges as a single .mtx file, destination-major sorted
    (``mtxSetToFile``, ``readMtxToCSR.cpp:249-283``): header field is
    ``pattern`` when unweighted, symmetry per flag; ids re-shifted to
    1-indexed. Driver-side stitch of the globally sorted partitions — use
    only for tool-sized outputs (the reference's sink is sequential too);
    engine-scale checkpoints go to parquet."""
    field = "real" if weighted else "pattern"
    symmetry = "symmetric" if symmetric else "general"
    if n_vertices is None:
        row = edges.agg(
            F.max(F.greatest("src", "dst")).alias("m")
        ).collect()[0]
        n_vertices = int(row.m) + 1
    rows = edges.orderBy("dst", "src").collect()  # dest-major global sort
    with open(path, "w") as f:
        f.write(f"%%MatrixMarket matrix coordinate {field} {symmetry}\n")
        f.write(f"{n_vertices} {n_vertices} {len(rows)}\n")
        for r in rows:
            if weighted:
                f.write(f"{r.src + 1} {r.dst + 1} {r.weight}\n")
            else:
                f.write(f"{r.src + 1} {r.dst + 1}\n")


def describe_checkpoint(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """readCSRHeader analog (``readCSRHeader.cpp:28-53``): introspect every
    ``stage=<name>`` checkpoint — schema summary + row count."""
    out = []
    for entry in sorted(os.listdir(checkpoint_dir)):
        if not entry.startswith("stage="):
            continue
        p = os.path.join(checkpoint_dir, entry)
        df = spark.read.parquet(p)
        out.append(
            (
                entry.removeprefix("stage="),
                df.count(),
                ", ".join(f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields),
            )
        )
    return spark.createDataFrame(out, "stage string, rows long, schema string")
