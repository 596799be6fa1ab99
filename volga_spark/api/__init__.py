from volga_spark.api.datastream import LinearPipeline
from volga_spark.api.pipeline import PipelineSpec, SourceSpec

__all__ = ["LinearPipeline", "PipelineSpec", "SourceSpec"]
