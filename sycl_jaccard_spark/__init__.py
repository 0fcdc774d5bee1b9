"""sycl_jaccard_spark — a PySpark-native near-duplicate detection + clustering engine.

A from-scratch Spark engine with the query/data-processing capabilities of
vtsynergy/SYCL-Jaccard (HPEC'22): exact pairwise Jaccard over neighbor/shingle
sets (reference kernels K3-K6/K9, ``/root/reference/jaccard.cpp``), generalized
to a web-scale dedup pipeline: k-shingles -> MinHash/LSH + SimHash + sampled
substring candidate generation -> exact-Jaccard verification (the reference's
``sygraph::jaccard_list`` semantics) -> iterative connected-component clustering.

Everything is DataFrame-first: built-in ``pyspark.sql.functions`` on the hot
path, Arrow-vectorized pandas UDFs where Spark lacks a primitive (MinHash,
SimHash), and zero per-row Python.
"""

from sycl_jaccard_spark.config import PipelineConfig
from sycl_jaccard_spark.session import get_spark

__all__ = ["PipelineConfig", "get_spark"]
__version__ = "0.1.0"
