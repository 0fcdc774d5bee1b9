"""MTX source/sink round-trip tests (reference S1-S7 semantics) + the
checkpoint introspection tool (S10) + full reference-CLI-style flow:
read mtx -> normalize -> jaccard -> write mtx."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sycl_jaccard_spark.operators.graph_jaccard import jaccard_all_edges
from sycl_jaccard_spark.operators.normalize import canonical_pairs, symmetrize
from sycl_jaccard_spark.plans.pipeline import DedupPipeline
from sycl_jaccard_spark.sources.corpus import CorpusSpec, synth_source_files
from sycl_jaccard_spark.sources.io import describe_checkpoint, read_mtx, write_mtx
from sycl_jaccard_spark.sources.tables import with_file_id

MTX_SYM = """%%MatrixMarket matrix coordinate pattern symmetric
% comment line
4 4 4
1 2
1 3
2 3
3 4
"""

MTX_WEIGHTED = """%%MatrixMarket matrix coordinate real general
3 3 3
1 2 0.5
2 3 1.5
3 1 2.0
"""


def test_read_mtx_symmetric_pattern(spark, tmp_path):
    p = str(tmp_path / "g.mtx")
    open(p, "w").write(MTX_SYM)
    edges, header = read_mtx(spark, p)
    assert not header.is_weighted and not header.is_directed
    got = {(r.src, r.dst, r.weight) for r in edges.collect()}
    assert got == {(0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0), (2, 3, 1.0)}


def test_read_mtx_weighted_general(spark, tmp_path):
    p = str(tmp_path / "w.mtx")
    open(p, "w").write(MTX_WEIGHTED)
    edges, header = read_mtx(spark, p)
    assert header.is_weighted and header.is_directed
    got = {(r.src, r.dst, r.weight) for r in edges.collect()}
    assert got == {(0, 1, 0.5), (1, 2, 1.5), (2, 0, 2.0)}


def test_mtx_round_trip(spark, tmp_path):
    p1 = str(tmp_path / "a.mtx")
    p2 = str(tmp_path / "b.mtx")
    open(p1, "w").write(MTX_WEIGHTED)
    edges, _ = read_mtx(spark, p1)
    write_mtx(edges, p2, weighted=True)
    edges2, header2 = read_mtx(spark, p2)
    assert header2.is_weighted
    assert {tuple(r) for r in edges.collect()} == {tuple(r) for r in edges2.collect()}
    # dest-major ordering in the file body (mtx_less comparator semantics)
    body = [l.split() for l in open(p2).read().splitlines()[2:]]
    dsts = [int(x[1]) for x in body]
    assert dsts == sorted(dsts)


def test_reference_cli_flow(spark, tmp_path):
    """main.cpp flow: read undirected mtx -> materialize reverse edges ->
    jaccard -> strip reverse for symmetric output -> write."""
    p1 = str(tmp_path / "in.mtx")
    p2 = str(tmp_path / "out.mtx")
    open(p1, "w").write(MTX_SYM)
    edges, header = read_mtx(spark, p1)
    sym = symmetrize(edges)
    scored = jaccard_all_edges(sym)
    out = canonical_pairs(scored.withColumnRenamed("jaccard", "weight"))
    write_mtx(out, p2, weighted=True, symmetric=True)
    edges2, header2 = read_mtx(spark, p2)
    assert header2.is_weighted and not header2.is_directed
    got = {(r.src, r.dst): r.weight for r in edges2.collect()}
    # triangle 0-1-2 plus pendant 3 on vertex 2
    assert got[(0, 1)] == pytest.approx(1 / 3)   # N(0)={1,2}, N(1)={0,2}
    assert got[(0, 2)] == pytest.approx(0.25)    # N(2)={0,1,3}
    assert got[(2, 3)] == pytest.approx(0.0)


def test_describe_checkpoint(spark, tmp_path):
    files, _ = synth_source_files(spark, CorpusSpec(n_files=40, n_clusters=5))
    files = with_file_id(files)
    ckpt = str(tmp_path / "ck")
    DedupPipeline(spark, checkpoint_dir=ckpt).run(files)
    desc = {r.stage: (r.rows, r.schema) for r in describe_checkpoint(spark, ckpt).collect()}
    assert {"exact_dedup", "shingles", "minhash", "verify", "clusters"} <= set(desc)
    assert desc["clusters"][0] == 40
    assert "sig:array<bigint>" in desc["minhash"][1]


def test_csr_binary_round_trip(spark, tmp_path):
    """S4/S6: binary CSR sink -> source round-trip, reference byte layout
    (readMtxToCSR.cpp:285-395): header fields + edge set + weights survive."""
    from sycl_jaccard_spark.sources.io import (
        CSR_BINARY_FORMAT_VERSION,
        read_csr_binary,
        read_csr_header,
        write_csr_binary,
    )

    pairs = [(0, 1, 0.5), (0, 2, 1.5), (1, 2, 2.0), (3, 0, 4.0)]
    edges = spark.createDataFrame(pairs, ["src", "dst", "weight"])
    p = str(tmp_path / "g.csr")
    hdr = write_csr_binary(edges, p, weighted=True, directed=True, weight_t64=True)
    assert hdr.num_verts == 4 and hdr.num_edges == 4

    got_hdr = read_csr_header(p)
    assert got_hdr == hdr
    assert got_hdr.version == CSR_BINARY_FORMAT_VERSION
    back, _ = read_csr_binary(spark, p)
    assert {(r.src, r.dst, r.weight) for r in back.collect()} == set(pairs)


def test_csr_binary_int32_float32_legs(spark, tmp_path):
    """Default reference build types (int32 verts/edges, float32 weights)."""
    from sycl_jaccard_spark.sources.io import read_csr_binary, write_csr_binary

    pairs = [(0, 1, 1.0), (1, 0, 1.0), (2, 0, 1.0)]
    edges = spark.createDataFrame(pairs, ["src", "dst", "weight"])
    p = str(tmp_path / "g32.csr")
    write_csr_binary(edges, p, weighted=True)
    back, hdr = read_csr_binary(spark, p)
    assert not (hdr.vertex_t64 or hdr.edge_t64 or hdr.weight_t64)
    assert {(r.src, r.dst) for r in back.collect()} == {(0, 1), (1, 0), (2, 0)}


def test_file_convert_mtx_csr_mtx(spark, tmp_path):
    """fileConvert binary legs (fileConvert.cpp:28-174): mtx -> csr -> mtx
    preserves the edge set."""
    from sycl_jaccard_spark.sources.io import file_convert

    p_mtx = str(tmp_path / "in.mtx")
    with open(p_mtx, "w") as f:
        f.write(MTX_WEIGHTED)
    p_csr = str(tmp_path / "mid.csr")
    p_out = str(tmp_path / "out.mtx")
    file_convert(spark, p_mtx, p_csr)
    file_convert(spark, p_csr, p_out)
    first, _ = read_mtx(spark, p_mtx)
    last, _ = read_mtx(spark, p_out)
    assert {(r.src, r.dst, r.weight) for r in first.collect()} == {
        (r.src, r.dst, r.weight) for r in last.collect()
    }


def test_read_source_table_dispatch(spark, tmp_path):
    """The source layer's three branches: parquet path, catalog table name
    (driven via the session catalog — a temp view resolves through the same
    spark.read.table call an Iceberg name would), and the diagnostic error
    for an unresolvable name."""
    import pytest as _pytest

    from sycl_jaccard_spark.sources.tables import read_source_table

    p = str(tmp_path / "files.parquet")
    spark.createDataFrame([(1, "a")], "id long, content string").write.parquet(p)
    assert read_source_table(spark, p).count() == 1

    spark.createDataFrame([(2, "b")], "id long, content string").createOrReplaceTempView(
        "src_files_view"
    )
    assert read_source_table(spark, "src_files_view").count() == 1

    with _pytest.raises(ValueError, match="no table catalog"):
        read_source_table(spark, "iceberg_cat.db.missing_table")


def test_csr_dtype_promotion_guard():
    """ADVICE r3: promotion must key on n_vertices (covers BOTH id spaces),
    not dst.max() — src ids beyond int32 with small dst must still promote."""
    import numpy as np

    from sycl_jaccard_spark.sources.io import promote_csr_dtypes

    i32max = np.iinfo(np.int32).max
    # src id space exceeds int32, dst fits: n_vertices = src.max()+1 > int32
    assert promote_csr_dtypes(i32max + 2, 10, False, False) == (True, False)
    # everything in range: no promotion
    assert promote_csr_dtypes(1000, 10, False, False) == (False, False)
    # boundary: largest id == int32 max is still representable
    assert promote_csr_dtypes(i32max + 1, 10, False, False) == (False, False)
    # edge count beyond int32 promotes the edge leg
    assert promote_csr_dtypes(1000, i32max + 1, False, False) == (False, True)
    # explicit 64-bit requests are never downgraded
    assert promote_csr_dtypes(10, 10, True, True) == (True, True)
