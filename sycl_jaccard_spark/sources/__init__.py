from sycl_jaccard_spark.sources.corpus import synth_source_files
from sycl_jaccard_spark.sources.tables import load_table, read_source_table

__all__ = ["synth_source_files", "load_table", "read_source_table"]
