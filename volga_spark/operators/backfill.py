"""Partition-level incremental processing (backfill ledger).

The orchestration primitive every derived 100 TB dataset needs: the
source arrives as hive partitions (dt=2026-08-14/...); the derived table
must process each partition exactly once, catch up after downtime, and
re-run failed partitions without touching finished ones. State is a
LEDGER of processed partitions — one marker file per partition, written
AFTER the partition's output commits, all through the Hadoop FileSystem
API (same-FS discipline as `operators/publish`).

- :func:`list_partitions` / :func:`pending_partitions`: Hadoop-FS listing
  of `part_col=value` dirs; pending = source ∖ ledger. O(#partitions)
  driver work, no data read.
- :func:`run_backfill`: processes ALL pending partitions in ONE Spark job
  (a partition-pruned scan with `part_col IN (pending)` — not a
  per-partition job loop; the cluster sees one plan with full
  parallelism), writes the derived output partitioned by the same column,
  then marks each newly-processed partition in the ledger.
- Crash contract: output-partition writes are per-partition overwrites
  (`partitionOverwriteMode=dynamic`), the ledger marker is written last —
  a crash between output and marker re-processes that partition on the
  next run and overwrites the same dir (idempotent); a marked partition
  is never re-read.

The transform is any DataFrame→DataFrame function that preserves
`part_col` — the same contract as a streaming foreachBatch body, which is
the point: batch backfill and streaming ingest share the transform, the
ledger replaces the checkpoint.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from volga_spark.operators.publish import _HadoopFs

_LEDGER_DIR = "_backfill_ledger"


def list_partitions(spark: SparkSession, path: str, part_col: str) -> list[str]:
    """Partition values present under `path` (hive layout), sorted."""
    fs = _HadoopFs(spark, path)
    pref = f"{part_col}="
    return sorted(
        name[len(pref):]
        for name in fs.listdir(path)
        if name.startswith(pref)
    )


def processed_partitions(
    spark: SparkSession, target_root: str, part_col: str
) -> list[str]:
    fs = _HadoopFs(spark, target_root)
    ledger = f"{target_root.rstrip('/')}/{_LEDGER_DIR}"
    pref = f"{part_col}="
    return sorted(
        name[len(pref):]
        for name in fs.listdir(ledger)
        if name.startswith(pref)
    )


def pending_partitions(
    spark: SparkSession, source_path: str, target_root: str, part_col: str
) -> list[str]:
    done = set(processed_partitions(spark, target_root, part_col))
    return [
        p
        for p in list_partitions(spark, source_path, part_col)
        if p not in done
    ]


def run_backfill(
    spark: SparkSession,
    source_path: str,
    target_root: str,
    part_col: str,
    transform: Callable[[DataFrame], DataFrame],
    max_partitions: int | None = None,
) -> list[str]:
    """Process every pending partition in one pruned job; returns the list
    of partitions processed this run (empty = caught up). `transform` must
    keep `part_col` in its output."""
    pending = pending_partitions(spark, source_path, target_root, part_col)
    if max_partitions is not None:
        pending = pending[:max_partitions]
    if not pending:
        return []

    src = spark.read.parquet(source_path).filter(
        F.col(part_col).isin(pending)
    )
    out = transform(src)
    if part_col not in out.columns:
        raise ValueError(f"transform dropped the partition column {part_col!r}")

    data_root = f"{target_root.rstrip('/')}/data"
    # clear crashed partial output first: a pending (= unmarked) partition
    # by definition committed nothing, so anything under its dir is debris
    # from an interrupted run. Dynamic overwrite alone cannot clean it —
    # it only replaces partitions PRESENT in this run's output, so a
    # transform that now emits 0 rows for the partition would leave the
    # debris in place and the marker below would freeze it in forever.
    fs = _HadoopFs(spark, target_root)
    for p in pending:
        fs.delete(f"{data_root}/{part_col}={p}")

    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").partitionBy(part_col).parquet(data_root)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)

    # mark AFTER the data commit — crash in between re-processes (and
    # the pre-write clear + dynamic overwrite make the re-run idempotent)
    ledger = f"{target_root.rstrip('/')}/{_LEDGER_DIR}"
    fs.mkdirs(ledger)
    for p in pending:
        fs.write_text(f"{ledger}/{part_col}={p}", "done")
    return pending


def read_backfilled(spark: SparkSession, target_root: str) -> DataFrame:
    return spark.read.parquet(f"{target_root.rstrip('/')}/data")
