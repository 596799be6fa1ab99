"""Incremental tile maintenance on the streaming write path.

The reference maintains multi-granularity pre-aggregated tiles *inside* the
window operator's state as rows arrive (reference
src/runtime/operators/window/state/tiles.rs:59-118), so request-mode reads
and cold restores never rescan raw rows. This module is the Spark-first
equivalent: a ``foreachBatch`` sink that folds each micro-batch's partial
tile aggregates into an accumulating tile table.

Each micro-batch is reduced JVM-side to per-(key, bucket) partials
(count / exact cents sum / min / max) — the same shuffle-light shape as the
batch ``build_tiles`` — and only those partials cross to the driver to be
merged. Merging is associative (n+=n, cents+=cents, min=min, max=max), so
the result is bit-identical to a one-shot batch build over the union of all
micro-batches, regardless of how rows were split across batches.

At 100 TB the driver-side pandas merge becomes a ``MERGE INTO`` a
(key-hash-partitioned) Delta/Iceberg tile table — the per-batch partials are
tiny (one row per key×bucket touched in the batch), so the merge cost is
independent of raw stream volume.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from volga_spark.operators.window import interval_to_micros
from volga_spark.streaming.runner import _checkpoint_dir, _stream_shuffle

_TILE_SCHEMA = "t_cnt bigint, t_cents bigint, t_min double, t_max double"


def stream_build_tiles(
    stream: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    value_col: str,
    granularity: str = "1 minute",
    timeout_s: int = 300,
) -> DataFrame:
    """Drain `stream` (availableNow), folding each micro-batch into the tile
    table; return the final tiles as a batch DataFrame with the same schema
    as ``operators.tiles.build_tiles`` (keys + __b + t_cnt/t_cents/t_min/t_max).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    g = interval_to_micros(granularity)
    spark: SparkSession = stream.sparkSession
    state = {"tiles": None}  # pandas DataFrame, merged across batches

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        partial = (
            batch_df.withColumn(
                "__b", (F.unix_micros(F.col(ts_col)) / F.lit(g)).cast("long")
            )
            .groupBy(*keys, "__b")
            .agg(
                F.count(value_col).alias("t_cnt"),
                F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("t_cents"),
                F.min(value_col).alias("t_min"),
                F.max(value_col).alias("t_max"),
            )
            .toPandas()
        )
        if partial.empty:
            return
        prev = state["tiles"]
        both = partial if prev is None else pd.concat([prev, partial])
        state["tiles"] = (
            both.groupby(keys + ["__b"], as_index=False, dropna=False)
            .agg(
                t_cnt=("t_cnt", "sum"),
                t_cents=("t_cents", "sum"),
                t_min=("t_min", "min"),
                t_max=("t_max", "max"),
            )
        )

    ckpt = _checkpoint_dir()
    with _stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout_s)
        finally:
            if q.isActive:
                q.stop()

    tiles = state["tiles"]
    key_schema = ", ".join(
        f"{k} {t}" for k, t in stream.select(*keys).dtypes
    )
    schema = f"{key_schema}, __b bigint, {_TILE_SCHEMA}"
    if tiles is None:
        return spark.createDataFrame([], schema=schema)
    return spark.createDataFrame(tiles, schema=schema)
