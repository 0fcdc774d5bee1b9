from sycl_jaccard_spark.streaming.ingest import (
    delta_store_batch_writer,
    emb_store_batch_writer,
    incremental_exact_dedup,
    incremental_signatures,
    weighted_signature_batch_writer,
)

__all__ = [
    "delta_store_batch_writer",
    "emb_store_batch_writer",
    "incremental_exact_dedup",
    "incremental_signatures",
    "weighted_signature_batch_writer",
]
