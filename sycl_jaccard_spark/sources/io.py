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
    import glob as _glob
    import os as _os

    # single-file-only guard: the dims-line detection below relies on
    # monotonically_increasing_id ordering, which tracks line order only
    # within ONE text file — a multi-file glob would make "min id = dims
    # line" undefined (and an .mtx is a single sequential artifact anyway).
    # Glob METACHARACTERS are rejected outright: spark.read.text expands
    # Hadoop globs ({a,b}, *, ?, [..]) that Python's glob.glob would miss on
    # remote URIs (s3a://, hdfs://), so "expands to >1 file" cannot be
    # checked portably — require one literal path instead.
    if any(c in path for c in "*?[]{}"):
        raise ValueError(f"read_mtx expects one literal .mtx path, not a glob: {path!r}")
    if _os.path.isdir(path) or len(_glob.glob(path)) > 1:
        raise ValueError(f"read_mtx expects exactly one .mtx file, got {path!r}")
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


# ---------------------------------------------------------------------------
# Binary CSR source/sink — byte-compatible with the reference's CSRToFile /
# FileToCSR (readMtxToCSR.cpp:285-395, header struct readMtxToCSR.hpp:44-64):
# 4 little-endian int64s (version=2, numVerts, numEdges, flag bits
# {0:isWeighted, 1:isZeroIndexed, 2:isDirected, 3:hasReverseEdges,
#  4:isVertexT64, 5:isEdgeT64, 6:isWeightT64}), then numVerts+1 offsets (ET),
# numEdges indices (VT), and numEdges weights (WT) when weighted. Lets a user
# replay the reference's HPEC'22 CSR corpus directly. Tool-sized driver-side
# NumPy I/O, like the reference's sequential ifstream/ofstream; engine-scale
# data lives in parquet.
# ---------------------------------------------------------------------------

CSR_BINARY_FORMAT_VERSION = 2


@dataclass(frozen=True)
class CSRHeader:
    num_verts: int
    num_edges: int
    is_weighted: bool = False
    is_zero_indexed: bool = True
    is_directed: bool = False
    has_reverse_edges: bool = True
    vertex_t64: bool = False
    edge_t64: bool = False
    weight_t64: bool = False
    version: int = CSR_BINARY_FORMAT_VERSION

    @property
    def flags(self) -> int:
        bits = (
            self.is_weighted, self.is_zero_indexed, self.is_directed,
            self.has_reverse_edges, self.vertex_t64, self.edge_t64, self.weight_t64,
        )
        return sum(1 << i for i, b in enumerate(bits) if b)


def read_csr_header(path: str) -> CSRHeader:
    """readCSRHeader tool analog (``readCSRHeader.cpp:28-53``)."""
    import numpy as np

    raw = np.fromfile(path, dtype="<i8", count=4)
    if len(raw) < 4:
        raise ValueError(f"{path}: truncated CSR header")
    version, nv, ne, flags = (int(x) for x in raw)
    if version != CSR_BINARY_FORMAT_VERSION:
        raise ValueError(f"{path}: unsupported CSR format version {version}")
    return CSRHeader(
        num_verts=nv, num_edges=ne,
        is_weighted=bool(flags & 1), is_zero_indexed=bool(flags & 2),
        is_directed=bool(flags & 4), has_reverse_edges=bool(flags & 8),
        vertex_t64=bool(flags & 16), edge_t64=bool(flags & 32),
        weight_t64=bool(flags & 64), version=version,
    )


def read_csr_binary(spark: SparkSession, path: str) -> tuple[DataFrame, CSRHeader]:
    """FileToCSR + CSRToMtx analog: load a reference binary CSR file and
    expand to an edge DataFrame (src, dst, weight), 0-indexed ids."""
    import numpy as np

    header = read_csr_header(path)
    et = "<i8" if header.edge_t64 else "<i4"
    vt = "<i8" if header.vertex_t64 else "<i4"
    wt = "<f8" if header.weight_t64 else "<f4"
    with open(path, "rb") as f:
        f.seek(32)  # header
        offsets = np.fromfile(f, dtype=et, count=header.num_verts + 1).astype(np.int64)
        indices = np.fromfile(f, dtype=vt, count=header.num_edges).astype(np.int64)
        if header.is_weighted:
            weights = np.fromfile(f, dtype=wt, count=header.num_edges).astype(np.float64)
        else:
            weights = np.ones(header.num_edges, dtype=np.float64)
    src = np.repeat(np.arange(header.num_verts, dtype=np.int64), np.diff(offsets))
    import pandas as pd

    pdf = pd.DataFrame({"src": src, "dst": indices, "weight": weights})
    edges = spark.createDataFrame(pdf, "src long, dst long, weight double")
    return edges, header


def promote_csr_dtypes(
    n_vertices: int, n_edges: int, vertex_t64: bool, edge_t64: bool
) -> tuple[bool, bool]:
    """Dtype range guard: ids / edge counts beyond int32 would silently wrap
    into a structurally valid but corrupt CSR file — auto-promote to the
    64-bit legs (the reference's VERTEX_T64/EDGE_T64 build flags) instead.
    n_vertices covers BOTH id spaces (max(src, dst) + 1), so guarding on it
    catches a graph whose src ids exceed int32 while dst fits (ADVICE r3)."""
    import numpy as np

    if not vertex_t64 and n_vertices - 1 > np.iinfo(np.int32).max:
        vertex_t64 = True
    if not edge_t64 and n_edges > np.iinfo(np.int32).max:
        edge_t64 = True
    return vertex_t64, edge_t64


def write_csr_binary(
    edges: DataFrame,
    path: str,
    n_vertices: int | None = None,
    weighted: bool = False,
    directed: bool = False,
    has_reverse_edges: bool = True,
    vertex_t64: bool = False,
    edge_t64: bool = False,
    weight_t64: bool = False,
) -> CSRHeader:
    """CSRToFile analog: sorted-adjacency CSR (``jaccard.cpp:353`` invariant)
    from an edge DataFrame; dtypes default to the reference's int32/float32
    build (``Makefile:33`` type selection)."""
    import numpy as np

    pdf = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long"),
        (F.col("weight") if "weight" in edges.columns else F.lit(1.0)).cast("double").alias("weight"),
    ).orderBy("src", "dst").toPandas()
    src = pdf["src"].to_numpy(np.int64)
    dst = pdf["dst"].to_numpy(np.int64)
    w = pdf["weight"].to_numpy(np.float64)
    if n_vertices is None:
        n_vertices = int(max(src.max(), dst.max())) + 1 if len(src) else 0
    vertex_t64, edge_t64 = promote_csr_dtypes(n_vertices, len(src), vertex_t64, edge_t64)
    header = CSRHeader(
        num_verts=n_vertices, num_edges=len(src), is_weighted=weighted,
        is_zero_indexed=True, is_directed=directed, has_reverse_edges=has_reverse_edges,
        vertex_t64=vertex_t64, edge_t64=edge_t64, weight_t64=weight_t64,
    )
    et = "<i8" if edge_t64 else "<i4"
    vt = "<i8" if vertex_t64 else "<i4"
    wt = "<f8" if weight_t64 else "<f4"
    offsets = np.zeros(n_vertices + 1, dtype=np.int64)
    np.add.at(offsets, src + 1, 1)
    np.cumsum(offsets, out=offsets)
    with open(path, "wb") as f:
        np.array(
            [header.version, header.num_verts, header.num_edges, header.flags], dtype="<i8"
        ).tofile(f)
        offsets.astype(et).tofile(f)
        dst.astype(vt).tofile(f)
        if weighted:
            w.astype(wt).tofile(f)
    return header


def file_convert(
    spark: SparkSession, src_path: str, dst_path: str, weighted: bool = False
) -> None:
    """fileConvert tool analog (``fileConvert.cpp:28-174``): convert between
    .mtx text and .csr binary in any direction, inferred from extensions."""
    s_bin, d_bin = src_path.endswith(".csr"), dst_path.endswith(".csr")
    if s_bin:
        edges, hdr = read_csr_binary(spark, src_path)
        weighted = weighted or hdr.is_weighted
        directed = hdr.is_directed
    else:
        edges, mhdr = read_mtx(spark, src_path)
        weighted = weighted or mhdr.is_weighted
        directed = mhdr.is_directed
    if d_bin:
        write_csr_binary(edges, dst_path, weighted=weighted, directed=directed)
    else:
        write_mtx(edges, dst_path, weighted=weighted, symmetric=not directed)


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
