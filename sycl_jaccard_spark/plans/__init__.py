from sycl_jaccard_spark.plans.delta import DeltaDedup, train_idf_snapshot
from sycl_jaccard_spark.plans.emb_delta import EmbeddingDeltaStore
from sycl_jaccard_spark.plans.pipeline import DedupPipeline, PipelineResult

__all__ = [
    "DedupPipeline",
    "DeltaDedup",
    "EmbeddingDeltaStore",
    "PipelineResult",
    "train_idf_snapshot",
]
