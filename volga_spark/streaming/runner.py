"""Streaming execution helpers + sinks (SURVEY §2.2, §2.12).

``run_available_now_to_memory`` reproduces the reference's end-of-stream
semantics (emit on MAX_WATERMARK — reference
src/runtime/operators/aggregate/aggregate_operator.rs:253-268) with the
``availableNow`` trigger: process everything, flush, stop.

``upsert_by_key`` is the reference's keyed upsert sink
(InMemoryStorageGrpcSinkConfig upsert path — reference
src/runtime/functions/sink/in_memory_storage_sink.rs): ``foreachBatch``
maintains latest-row-per-key state. On a cluster this would MERGE into
Delta/Iceberg; locally it keeps a driver-side dict (test harness parity).
"""

from __future__ import annotations

import os
import shutil
import uuid
from contextlib import contextmanager

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

# 8 measured fastest on local[32] at sf0.1 (vs 16: -22% on the stateful
# sliding query, -20% on streaming agg; vs 4: stateful loses parallelism).
# On a real cluster size this to ~2-3x total cores via the env var.
STREAM_SHUFFLE = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8")

# offset/commit logs + state snapshots go to tmpfs when available: the logs
# are per-micro-batch fsync'd small files, pure latency on a local run (a
# cluster would point this at fast local/HDFS storage via config instead)
_CKPT_ROOT = (
    "/dev/shm/volga_spark_ckpt"
    if os.access("/dev/shm", os.W_OK)
    else "/tmp/volga_spark_ckpt"
)


def _checkpoint_dir() -> str:
    return os.path.join(_CKPT_ROOT, uuid.uuid4().hex[:12])


@contextmanager
def _stream_shuffle(spark: SparkSession):
    """Bound state-store instance count for local streaming runs (the default
    200 shuffle partitions mean 200 state stores per stateful query — pure
    overhead under local[N]; on a real cluster size this to ~2-3x cores)."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, STREAM_SHUFFLE)
    try:
        yield
    finally:
        spark.conf.set(key, old)


def run_available_now_to_memory(
    df: DataFrame, output_mode: str = "complete", timeout_s: int = 300
) -> DataFrame:
    """Run a streaming DataFrame to completion into a memory sink; return the
    result as a (batch) DataFrame."""
    name = f"vs_mem_{uuid.uuid4().hex[:10]}"
    spark = df.sparkSession
    ckpt = _checkpoint_dir()
    with _stream_shuffle(spark):
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout_s)
        finally:
            if q.isActive:
                q.stop()
            shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def upsert_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    timeout_s: int = 300,
) -> pd.DataFrame:
    """Run the stream with a foreachBatch keyed-upsert sink; return the final
    state (latest row per key, ordered within each batch by ``order_cols``)."""
    state: dict[tuple, tuple] = {}
    cols: list[str] = df.columns

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        pdf = batch_df.toPandas()
        if pdf.empty:
            return
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        for row in pdf.itertuples(index=False):
            d = dict(zip(cols, row))
            k = tuple(d[c] for c in key_cols)
            state[k] = tuple(d[c] for c in cols)

    ckpt = _checkpoint_dir()
    with _stream_shuffle(df.sparkSession):
        q = (
            df.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout_s)
        finally:
            if q.isActive:
                q.stop()
            shutil.rmtree(ckpt, ignore_errors=True)
    return pd.DataFrame(list(state.values()), columns=cols)


def to_spark(spark: SparkSession, pdf: pd.DataFrame, schema=None) -> DataFrame:
    return spark.createDataFrame(pdf, schema=schema)
