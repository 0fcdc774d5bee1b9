from sycl_jaccard_spark.plans.pipeline import DedupPipeline, PipelineResult

__all__ = ["DedupPipeline", "PipelineResult"]
