"""Table-layout writers for the 100 TB scan path.

The layout disciplines every large-scale pipeline needs on its WRITE side
so the read side can prune:

1. **Hive partitioning** (`write_partitioned`) — coarse categorical/date
   dirs; Catalyst turns `WHERE event_date = X` into `PartitionFilters`
   (zero I/O for non-matching partitions).
2. **Bucketing** (`write_bucketed`) — hash-bucket + sort a table on its
   dominant join/group key at WRITE time; every later join or aggregation
   on that key then reads pre-partitioned (and pre-sorted) input and skips
   its shuffle entirely. At 100 TB a fact⋈fact join's shuffle IS the cost —
   bucketing amortizes it across every downstream query of the table.
3. **Range clustering** (`write_range_clustered`) — `repartitionByRange` +
   `sortWithinPartitions` on the clustering key before the write, so each
   parquet file covers a narrow, mostly disjoint key range; min/max footer
   stats then let ANY engine (Spark row-group skipping, DuckDB zone maps)
   skip files for selective predicates. This is the poor-man's Z-order: for
   a single dominant predicate column it is strictly better (perfect
   1-D clustering), and it composes with hive partitioning for the
   two-level date/key layout a 100 TB event table actually uses.
4. **Z-order clustering** (`write_zorder_clustered`) — Morton-interleaved
   multi-column clustering: bounded per-file min/max ranges on EVERY
   clustering column, for tables filtered on several keys.

All return the re-read DataFrame so callers can verify the round trip;
`compact_files` is the paired maintenance job (small-files rewrite).
The reference writes per-task parquet part files with no layout control
(reference src/runtime/functions/sink/parquet/mod.rs:45-70); layout-aware
writes are part of the beyond-reference scale tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> DataFrame:
    """Hive-style partitioned parquet write; returns the re-read table.

    Scale note: keep partition columns LOW-cardinality (dates, sources —
    O(10³) dirs); per-key dirs at corpus scale create the small-files
    problem. Pair with `write_range_clustered` inside each partition for
    fine-grained skipping.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    return df.sparkSession.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Hash-bucketed (and optionally sorted) parquet table write; returns
    the re-read catalog table.

    Spark's bucketing records `HashPartitioning(bucket_cols, num_buckets)`
    in the table catalog; a scan of the table then SATISFIES that output
    partitioning, so a sort-merge join (or aggregation) keyed on
    `bucket_cols` against an equally-bucketed table needs NO Exchange on
    either side — and with `sort_cols == bucket_cols` no Sort either. The
    table is written as an EXTERNAL table at `path` (bucketing metadata
    requires the catalog; the explicit path keeps data placement under
    caller control, as any cluster deployment would).

    Scale rules:
    - `num_buckets` must MATCH between co-joined tables (Spark only elides
      the shuffle on equal bucket counts) — standardize per key domain,
      e.g. 4096 buckets for user-keyed tables.
    - Pick num_buckets so one bucket ≈ 100-500 MB at full scale: buckets
      are the read parallelism floor (one task per bucket when the join
      uses bucketing), so too few buckets caps the cluster.
    - Bucket pruning: equality predicates on the bucket column scan 1/N of
      the files (Catalyst's `SELECT * WHERE user_id = k` → one bucket).

    The reference has no write-side layout control (its storage tier is a
    row-oriented state store, reference src/storage/mod.rs); bucketing is
    part of the beyond-reference batch scale tier.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer.saveAsTable(table_name)
    return spark.table(table_name)


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int,
    mode: str = "overwrite",
) -> DataFrame:
    """Range-cluster on `cluster_cols` into ~`n_files` files, sorted within
    each, then write; returns the re-read table.

    `repartitionByRange` samples the key distribution, so output files get
    balanced ROW counts even under key skew (a hash layout would not), and
    file key-ranges are disjoint by construction — footer min/max stats
    become precise zone maps.

    Timestamp gotcha: Spark's legacy INT96 timestamp encoding writes NO
    min/max stats, silently disabling the skipping this layout exists for —
    the write is forced to INT64 micros here (also the factory default in
    `session.py`).
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        (
            df.repartitionByRange(n_files, *cluster_cols)
            .sortWithinPartitions(*cluster_cols)
            .write.mode(mode)
            .parquet(path)
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    return spark.read.parquet(path)


def file_column_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) footer statistics of `column` per parquet data file —
    the zone-map view a scan planner sees. Driver-side metadata read only
    (footers, not data); used by tests to PROVE clustering happened."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(
                next(
                    i
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == column
                )
            )
            st = col.statistics
            if st is None:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((lo, hi))
    return out


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int,
    bits_per_col: int = 4,
    mode: str = "overwrite",
) -> DataFrame:
    """Multi-column (Z-order) clustering: interleave per-column quantile
    bucket bits into one Morton key, range-cluster on it, write; returns
    the re-read table.

    1-D range clustering gives perfect skipping on ONE column and none on
    the rest; Z-order trades a little of that for bounded min/max ranges
    on EVERY clustering column — the multi-predicate layout (Delta/
    Iceberg's OPTIMIZE ZORDER) for tables queried on several keys.

    Mechanics, all scale-safe:
    - per-column quantile boundaries come from `approxQuantile` (one
      bounded sample-based pass, the same driver-side-training discipline
      as the IVF quantizer — 2^bits numbers per column, never the data);
    - bucket assignment + bit interleaving are pure native expressions
      (comparisons, shifts, adds — codegen'd, map-side);
    - `repartitionByRange` on the Morton key balances file ROW counts even
      when the key-space is occupied unevenly (a fixed-grid split would
      not be).

    `bits_per_col` caps the grid (default 16 buckets/column); finer grids
    sharpen skipping until file count, not grid, is the binding limit.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    probs = [i / (1 << bits_per_col) for i in range(1, 1 << bits_per_col)]
    zbits = []
    for ci, col in enumerate(cluster_cols):
        cuts = df.selectExpr(f"CAST({col} AS DOUBLE) AS __c").approxQuantile(
            "__c", probs, 0.001
        )
        bucket = F.lit(0)
        for cut in cuts:
            bucket = bucket + F.when(
                F.col(col).cast("double") > F.lit(cut), 1
            ).otherwise(0)
        # interleave: bit i of this column lands at position
        # i*len(cols)+ci of the Morton key
        for i in range(bits_per_col):
            zbits.append(
                F.shiftleft(
                    F.shiftright(bucket, i).bitwiseAND(F.lit(1)),
                    i * len(cluster_cols) + ci,
                )
            )
    zval = zbits[0]
    for zb in zbits[1:]:
        zval = zval + zb
    clustered = df.withColumn("__z", zval)
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        (
            clustered.repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
            .write.mode(mode)
            .parquet(path)
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    return spark.read.parquet(path)


def compact_files(
    path: str,
    spark: SparkSession,
    target_file_mb: int = 256,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    out_path: str | None = None,
) -> DataFrame:
    """Small-files compaction: rewrite a parquet dataset into files of
    ~``target_file_mb`` (by on-disk size), optionally re-sorted.

    Streaming sinks and per-batch writers leave thousands of small files;
    at 100 TB that means footer-fetch storms and task-launch overhead on
    every scan (the classic lakehouse maintenance job — Delta OPTIMIZE /
    Iceberg rewrite_data_files). File count is sized from the CURRENT
    on-disk bytes (compressed), not row counts — the one signal that
    predicts output size; re-sorting composes with
    `write_range_clustered`'s zone-map story.

    Writes to ``out_path`` (default: in-place via an overwrite of `path` —
    safe in Spark only because the read materializes before the write
    job starts is NOT guaranteed; pass out_path for production and swap
    atomically).
    """
    import glob
    import os

    files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    dest = out_path or path
    if dest == path:
        # in-place: Spark cannot read and overwrite the same path in one
        # job — pin the input first
        df = df.localCheckpoint()
    if sort_cols:
        (
            df.repartitionByRange(n_files, *sort_cols)
            .sortWithinPartitions(*sort_cols)
            .write.mode(mode)
            .parquet(dest)
        )
    else:
        df.repartition(n_files).write.mode(mode).parquet(dest)
    return spark.read.parquet(dest)
