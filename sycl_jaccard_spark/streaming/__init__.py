from sycl_jaccard_spark.streaming.ingest import incremental_exact_dedup, incremental_signatures

__all__ = ["incremental_exact_dedup", "incremental_signatures"]
