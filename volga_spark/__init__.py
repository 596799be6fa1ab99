"""volga_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of volga-project/volga (streaming/batch/request
feature computation), re-expressed Spark-first.

Layout:
  session       SparkSession factory tuned for local[N] and cluster scale
  tables        testdata table registry (parquet sources)
  operators/    sliding-window operator, dedup, similarity, text, multimodal
  functions/    ML window UDAF library (_where/_cate/top families)
  streaming/    Structured Streaming wrappers (watermark, stateful window, sinks)
  api/          PipelineSpec-style front end (SQL + ML-UDAF rewrite)
  workloads/    the query inventory wired into __spark_entry__ (driver contract)
"""

from volga_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
