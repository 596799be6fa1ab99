from volga_spark.api.pipeline import PipelineSpec, SourceSpec

__all__ = ["PipelineSpec", "SourceSpec"]
