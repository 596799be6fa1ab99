"""Streaming sources (SURVEY §2.1).

| Reference source            | Here |
|-----------------------------|------|
| KafkaSourceConfig           | ``kafka_json_stream`` (needs kafka jars — gated) |
| ParquetSourceConfig         | ``parquet_stream`` / ``chunked_file_stream`` |
| DatagenSourceConfig         | ``rate_stream`` (rate source + column exprs) |
| VectorSourceConfig (tests)  | chunked files driving deterministic micro-batches |

``chunked_file_stream`` re-chunks a testdata table into N time-ordered
parquet files so a local run produces a deterministic multi-micro-batch
stream (each file = one batch via ``maxFilesPerTrigger=1``) — the local
stand-in for a partitioned Kafka topic. Optional *flush punctuation* rows
mirror the reference's MAX_WATERMARK end-of-stream flush (reference
src/common/message.rs:191-199): two trailing rounds of far-future rows per
key advance the watermark past all real data so every key's state drains;
punctuation rows carry ``sentinel_id`` and are filtered from results.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from volga_spark.tables import load_table

SENTINEL_ID = -1


def parquet_stream(
    spark: SparkSession, path: str, schema, files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(path)
    )


def rate_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Datagen stand-in: monotonically increasing (timestamp, value)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def kafka_json_stream(
    spark: SparkSession, bootstrap: str, topic: str, schema, starting_offsets="earliest"
) -> DataFrame:
    """Kafka consumer → JSON decode (reference KafkaSourceConfig,
    src/runtime/functions/source/kafka/mod.rs:22-48). Requires the
    spark-sql-kafka package on the classpath; raises otherwise."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("j")
    ).select("j.*")


def chunked_file_stream(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    ts_col: str,
    n_chunks: int = 5,
    key_col: str | None = None,
    id_col: str | None = None,
    flush: bool = False,
    scratch_root: str = "/tmp/volga_spark_stream",
    files_per_trigger: int = 1,
) -> tuple[DataFrame, str]:
    """Write `table` as N time-ordered parquet chunk files; return the
    streaming DataFrame (one file per micro-batch) and the chunk dir.

    ``flush=True`` appends two punctuation files (+1h/+2h after max ts, one
    row per distinct ``key_col``, ``id_col``=SENTINEL_ID) so the watermark
    passes all real rows and stateful operators drain — filter them out of
    results with ``id_col != SENTINEL_ID``.
    """
    df = load_table(spark, sf_dir, table)
    tag = hashlib.md5(
        f"{sf_dir}:{table}:{ts_col}:{n_chunks}:{flush}:{key_col}:{id_col}".encode()
    ).hexdigest()[:12]
    out_dir = os.path.join(scratch_root, tag)
    done_marker = os.path.join(out_dir, "_DONE")
    if not os.path.exists(done_marker):
        os.makedirs(out_dir, exist_ok=True)
        pdf = df.orderBy(ts_col).toPandas()
        for c in pdf.columns:  # write µs timestamps (ns would round-trip badly)
            if str(pdf[c].dtype).startswith("datetime64"):
                pdf[c] = pdf[c].astype("datetime64[us]")
        n = len(pdf)
        per = max(1, n // n_chunks)
        import pyarrow as pa
        import pyarrow.parquet as pq

        chunks = [pdf.iloc[i : i + per] for i in range(0, n, per)]
        if flush:
            import pandas as pd

            keys = sorted(pdf[key_col].unique())
            max_ts = pdf[ts_col].max()
            def _default(dtype):
                # non-null defaults: nulls would poison downstream numeric
                # state columns (int64+null → float64 NaN round-trips)
                kind = dtype.kind if hasattr(dtype, "kind") else "O"
                if kind in "iu":
                    return 0
                if kind == "f":
                    return 0.0
                if kind == "b":
                    return False
                return ""

            for k, delta in ((1, "1h"), (2, "2h")):
                s = pd.DataFrame(
                    {c: [_default(pdf[c].dtype)] * len(keys) for c in pdf.columns}
                )
                s[key_col] = keys
                s[ts_col] = max_ts + pd.Timedelta(delta)
                if id_col:
                    s[id_col] = SENTINEL_ID
                for c in pdf.columns:  # keep dtypes identical to real chunks
                    s[c] = s[c].astype(pdf[c].dtype, errors="ignore")
                chunks.append(s)
        # one schema for every chunk — sentinel chunks have all-null columns
        # whose inferred type would otherwise drift
        pa_schema = pa.Table.from_pandas(pdf, preserve_index=False).schema
        for i, chunk in enumerate(chunks):
            p = os.path.join(out_dir, f"chunk_{i:04d}.parquet")
            pq.write_table(
                pa.Table.from_pandas(chunk, preserve_index=False, schema=pa_schema), p
            )
            os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))  # stable order
        with open(done_marker, "w") as f:
            f.write("ok")
    schema = df.schema
    stream = parquet_stream(spark, out_dir, schema, files_per_trigger)
    return stream, out_dir
