"""Sink workloads (SURVEY §2.2): parquet sink round-trip.

Reference ParquetSinkConfig writes per-task part files to an object store
(reference src/runtime/functions/sink/parquet/mod.rs:45-70); Spark's parquet
sink is the same layout (one part file per task) with committed-output
exactly-once."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from volga_spark.tables import load_table
from volga_spark.workloads import workload
from volga_spark.workloads._util import dsum, duck_dsum


@workload(
    "q_sink_parquet_roundtrip",
    oracle=f"""
        SELECT o_orderpriority, count(*) AS n, {duck_dsum('o_totalprice')} AS total
        FROM orders GROUP BY o_orderpriority
    """,
    tags=("sink",),
)
def q_sink_parquet_roundtrip(spark, sf_dir):
    """Aggregate → parquet sink (partitioned write) → re-scan. The returned
    frame is the re-read of what the sink wrote, so the oracle checks the
    full write path."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("total")
    )
    out = os.path.join(tempfile.gettempdir(), "volga_spark_sink", "orders_agg")
    agg.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)
