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
        _write_chunks(spark, df, out_dir, ts_col, n_chunks, key_col, id_col, flush)
        with open(done_marker, "w") as f:
            f.write("ok")
    schema = df.schema
    stream = parquet_stream(spark, out_dir, schema, files_per_trigger)
    return stream, out_dir


def _write_chunks(spark, df, out_dir, ts_col, n_chunks, key_col, id_col, flush):
    """Write time-ordered chunk files EXECUTOR-SIDE: ``repartitionByRange``
    on the event time splits the table into N contiguous time ranges whose
    part files (range order == partition id == part index) become the chunk
    files. No driver materialization — at sf10+ the old ``orderBy().
    toPandas()`` would OOM the driver; this path only ever collects the
    distinct key list for the punctuation rows (bounded by key cardinality,
    not table size)."""
    import glob
    import shutil

    from pyspark.sql import types as T

    os.makedirs(out_dir, exist_ok=True)
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    df.repartitionByRange(n_chunks, F.col(ts_col)).write.mode("overwrite").parquet(tmp)
    chunk_no = 0
    for p in sorted(glob.glob(os.path.join(tmp, "part-*"))):
        dst = os.path.join(out_dir, f"chunk_{chunk_no:04d}.parquet")
        shutil.move(p, dst)
        os.utime(dst, (1_700_000_000 + chunk_no,) * 2)  # stable file order
        chunk_no += 1
    shutil.rmtree(tmp, ignore_errors=True)

    if flush:
        # two rounds of far-future punctuation rows per key (MAX_WATERMARK
        # stand-in); non-null defaults — nulls would poison numeric state.
        # Built DISTRIBUTEDLY (r13, VERDICT #5): distinct keys + literal
        # default columns, written straight to parquet — the old
        # collect-keys-then-createDataFrame round trip was
        # data-proportional in key cardinality, so at 100x keys the
        # HARNESS (not the engine) became the bottleneck. The only driver
        # materialization left is the single-row max(ts) aggregate.
        import datetime

        max_ts = df.agg(F.max(ts_col)).first()[0]
        kdf = df.select(key_col).distinct()

        for delta_h in (1, 2):
            # punctuation means "end of stream": EVERY time column jumps
            # to the far-future mark, not just the chunk-order column —
            # with a separate arrival/event-time pair, leaving event time
            # at max_ts would hold the watermark one lateness short of
            # closing the final window
            punct_ts = max_ts + datetime.timedelta(hours=delta_h)
            cols = []
            for f in df.schema.fields:
                if f.name == key_col:
                    cols.append(F.col(key_col))
                    continue
                dt = f.dataType
                if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
                    v = F.lit(punct_ts).cast(dt)
                elif id_col and f.name == id_col:
                    v = F.lit(SENTINEL_ID).cast(dt)
                elif isinstance(
                    dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
                ):
                    v = F.lit(0).cast(dt)
                elif isinstance(dt, (T.FloatType, T.DoubleType)):
                    v = F.lit(0.0).cast(dt)
                elif isinstance(dt, T.BooleanType):
                    v = F.lit(False)
                else:
                    v = F.lit("").cast(dt)
                cols.append(v.alias(f.name))
            # coalesce(1): a punctuation round must be ONE chunk file (the
            # stream replays files in order) — a single write task over
            # one row per key, never a driver-side row list
            kdf.select(*cols).coalesce(1).write.mode("overwrite").parquet(tmp)
            part = sorted(glob.glob(os.path.join(tmp, "part-*")))[0]
            dst = os.path.join(out_dir, f"chunk_{chunk_no:04d}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (1_700_000_000 + chunk_no,) * 2)
            chunk_no += 1
            shutil.rmtree(tmp, ignore_errors=True)


def decode_json_with_quarantine(
    raw: DataFrame,
    schema,
    value_col: str = "value",
) -> tuple[DataFrame, DataFrame]:
    """Split a (kafka-shaped) frame into decoded rows and a quarantine.

    `from_json` is PERMISSIVE: a malformed payload decodes to a NULL
    struct instead of failing the query — the right default for an
    unbounded stream (one bad producer must not kill ingestion), but
    silently DROPPING those rows loses the evidence. This helper returns
    (good, quarantined): good carries the decoded columns, quarantined
    the ORIGINAL raw payload + a capture timestamp for replay after a
    schema fix. Both frames are plain filters over one decode projection,
    so the split works identically on batch and streaming inputs (write
    the quarantine with its own sink in a stream).

    A payload whose every field is null (e.g. the JSON literal ``{}``
    against a non-nullable business schema) also lands in quarantine:
    indistinguishable from a decode failure at the engine level, and
    operationally the same event.
    """
    decoded = raw.withColumn(
        "__j", F.from_json(F.col(value_col).cast("string"), schema)
    )
    is_bad = F.col("__j").isNull() | (F.to_json(F.col("__j")) == "{}")
    good = decoded.filter(~is_bad).select("__j.*")
    quarantined = decoded.filter(is_bad).select(
        F.col(value_col).cast("string").alias("raw_payload"),
        F.current_timestamp().alias("quarantined_at"),
    )
    return good, quarantined
