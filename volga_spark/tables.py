"""Testdata table registry (parquet sources).

Mirrors the reference's source registration (VolgaTableProvider per source —
reference src/api/planner.rs:176-186): each table is declared with an explicit
schema-bearing parquet scan and registered as a temp view so both the
DataFrame and SQL entry points see the same catalog.

At 100 TB these would be partitioned/bucketed external tables; the scan path
(predicate pushdown + column pruning into the parquet reader) is identical.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables that should always be broadcast in joins.
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}


@lru_cache(maxsize=None)
def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet timestamp[ns] (Spark can't read those natively)."""
    import glob
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        # Spark-written dataset: a directory of part files (all share one
        # schema — read the first). Keeps the ns-detection working for
        # derived/scaled copies of the testdata, not just the single-file
        # driver-generated parquet.
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            return ()
        path = parts[0]
    schema = pq.read_schema(path)
    return tuple(
        field.name
        for field in schema
        if str(field.type) == "timestamp[ns]"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan with explicit nanosecond-timestamp handling.

    ``events.ts`` is timestamp[ns]; Spark rejects it, DuckDB truncates it to
    microseconds. We read nanos as long (``nanosAsLong``) and truncate to
    microseconds ourselves so both engines see identical values. The column
    stays a projection over the scan — pushdown/pruning are unaffected.
    """
    path = f"{sf_dir}/{name}.parquet"
    ns_cols = _nanos_ts_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        # integer div — float division would round near µs boundaries
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # timestamp[us] without isAdjustedToUTC infers as TIMESTAMP_NTZ under the
    # default session config; normalize to plain TIMESTAMP (session tz is UTC)
    # so epoch arithmetic (unix_micros etc.) works under ANY caller session
    for field in df.schema.fields:
        if field.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def register_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table and register temp views.

    Returns the dict of DataFrames keyed by table name.
    """
    dfs: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
