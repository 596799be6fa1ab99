"""Partition-width control for Python-heavy stages.

Two local-vs-scale effects starve Arrow/Pandas stages of parallelism:

1. A small parquet file scans as 1 partition (file splitting can't go below
   a row group), so a mapInPandas directly over the scan runs on one core.
2. AQE's byte-based coalescing folds a "small" shuffle (a few MB) down to
   1-2 partitions — its 64MB advisory size assumes JVM-speed consumers,
   while a Python stage consumes ~100x slower per byte.

``widen_for_python`` round-robin repartitions to the configured shuffle
width only when the input is narrower — on a real cluster where the scan
already has thousands of partitions it is a no-op, so it never *adds* a
shuffle at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_for_python(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition `df` to the session shuffle width before a Python-heavy
    stage if (and only if) it currently has fewer partitions. The explicit
    count keeps AQE from coalescing the exchange back down."""
    spark = df.sparkSession
    n = min_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
