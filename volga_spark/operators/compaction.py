"""Small-file compaction for parquet datasets.

The operational reality of a 100 TB lake: streaming sinks, incremental
ingest, and fine-grained partitioning leave datasets as millions of
KB-sized files, and scan cost becomes footer-reads + task-scheduling
instead of IO (every file is a task and a round of footer/stat fetches).
Compaction rewrites a dataset into ~target-sized files.

- :func:`plan_compaction` inspects the dataset through the Hadoop
  FileSystem API (the same FS Spark reads — works on file://, HDFS, s3a)
  and returns the measured layout + the target file count. Read-only.
- :func:`compact_version` executes it ON A PUBLISHED DATASET
  (`operators/publish` layout): reads LATEST, rewrites at the planned
  width, and publishes the result as the NEXT version with a row-count
  preservation audit. The pointer swap makes the compaction ATOMIC for
  readers, and the old layout stays time-travelable — compaction is a
  layout change, never a data change, and the version history proves it.
- `sort_cols` preserves/establishes range clustering during the rewrite
  (`repartitionByRange` — each output file covers a disjoint key range,
  so the rewrite doubles as a zone-map clustering pass; see
  `operators/layout`).

Scale: one read + one write of the dataset — the floor for any rewrite —
with no driver materialization; the planner only lists file statuses
(O(#files) driver memory, the same listing any scan performs).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from volga_spark.operators.publish import (
    _HadoopFs,
    latest_version,
    publish_version,
    read_version,
)

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def plan_compaction(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict:
    """Measure a dataset directory and plan the rewrite: returns
    {n_files, total_bytes, small_files, target_files}. Read-only."""
    fs = _HadoopFs(spark, path)
    statuses = [
        st
        for st in fs._fs.listStatus(fs._p(path))
        if st.getPath().getName().endswith(".parquet")
    ]
    sizes = [int(st.getLen()) for st in statuses]
    total = sum(sizes)
    return {
        "n_files": len(sizes),
        "total_bytes": total,
        "small_files": sum(1 for s in sizes if s < target_bytes // 2),
        "target_files": max(1, math.ceil(total / target_bytes)),
    }


def compact_df(
    df: DataFrame,
    target_files: int,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """The rewrite plan: range-repartition on `sort_cols` (clustered
    output, disjoint per-file zone maps) or round-robin to equal-size
    files."""
    if sort_cols:
        return df.repartitionByRange(target_files, *[F.col(c) for c in sort_cols])
    return df.repartition(target_files)


def compact_version(
    spark: SparkSession,
    root: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    sort_cols: list[str] | None = None,
) -> dict:
    """Compact the LATEST published version of `root` into the next
    version (atomic pointer swap; old layout stays time-travelable).
    Returns the plan dict + {'version', 'rows'}. Raises if nothing is
    published."""
    from volga_spark.operators.expectations import min_rows

    v = latest_version(root, spark)
    if v is None:
        raise FileNotFoundError(f"no published version under {root}")
    src = f"{root.rstrip('/')}/v{v}"
    plan = plan_compaction(spark, src, target_bytes)
    df = read_version(spark, root, v)
    n_rows = df.count()
    compacted = compact_df(df, plan["target_files"], sort_cols)
    # audit: the rewrite must preserve every row (>= is == here because a
    # rewrite cannot invent rows; the staged-files re-scan counts them)
    new_v = publish_version(compacted, root, checks=[min_rows(n_rows)])
    return {**plan, "version": new_v, "rows": n_rows}
