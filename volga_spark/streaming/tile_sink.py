"""Incremental tile maintenance on the streaming write path.

The reference maintains multi-granularity pre-aggregated tiles *inside* the
window operator's state as rows arrive (reference
src/runtime/operators/window/state/tiles.rs:59-118), so request-mode reads
and cold restores never rescan raw rows. This module is the Spark-first
equivalent: a ``foreachBatch`` sink that folds each micro-batch's partial
tile aggregates into an accumulating VERSIONED PARQUET tile table —
entirely executor-side (no ``toPandas``/driver merge anywhere).

Each micro-batch is reduced JVM-side to per-(key, bucket) partials
(count / exact cents sum / min / max) — the same shuffle-light shape as the
batch ``build_tiles`` — then unioned with the previous tile version and
re-aggregated (n+=n, cents+=cents, min=min, max=max; associative), so the
result is bit-identical to a one-shot batch build over the union of all
micro-batches, regardless of how rows were split across batches.

At 100 TB the versioned rewrite becomes a ``MERGE INTO`` a
key-hash-partitioned Delta/Iceberg tile table — the per-batch partials are
tiny (one row per key×bucket touched in the batch), so the merge cost is
independent of raw stream volume; the rewrite variant here is O(tiles) per
batch, the documented trade for not shipping a table format in this image.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from volga_spark.operators.tiles import fdiv
from volga_spark.operators.window import interval_to_micros
from volga_spark.streaming.runner import _state_root, run_foreach_batch

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
    root = _state_root()
    cur = {"version": None}

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        merged = (
            batch_df.withColumn(
                # exact long floor-division (r11): must bucket identically
                # to operators/tiles.build_tiles — negative (pre-1970) µs
                # AND past the double 2^53 precision bound
                "__b",
                fdiv(F.unix_micros(F.col(ts_col)), g),
            )
            .groupBy(*keys, "__b")
            .agg(
                F.count(value_col).alias("t_cnt"),
                F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("t_cents"),
                F.min(value_col).alias("t_min"),
                F.max(value_col).alias("t_max"),
            )
        )
        prev_version = cur["version"]
        if prev_version == epoch_id:
            # epoch already committed, Spark is retrying: folding the batch
            # partials in again would double-count them — reuse the version
            return
        if prev_version is not None:
            prev = batch_df.sparkSession.read.parquet(f"{root}/v{prev_version}")
            merged = (
                merged.unionByName(prev)
                .groupBy(*keys, "__b")
                .agg(
                    F.sum("t_cnt").alias("t_cnt"),
                    F.sum("t_cents").alias("t_cents"),
                    F.min("t_min").alias("t_min"),
                    F.max("t_max").alias("t_max"),
                )
            )
        merged.write.mode("overwrite").parquet(f"{root}/v{epoch_id}")
        cur["version"] = epoch_id
        if prev_version is not None and prev_version != epoch_id:
            shutil.rmtree(f"{root}/v{prev_version}", ignore_errors=True)

    run_foreach_batch(stream, fold, timeout_s)

    if cur["version"] is None:
        key_schema = ", ".join(f"{k} {t}" for k, t in stream.select(*keys).dtypes)
        return spark.createDataFrame([], schema=f"{key_schema}, __b bigint, {_TILE_SCHEMA}")
    return spark.read.parquet(f"{root}/v{cur['version']}")
