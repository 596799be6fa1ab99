"""Per-key time-series preparation — resample, gap-fill, forward-fill,
rolling features.

Feature pipelines consume REGULAR series (one row per key per interval),
but event streams are irregular; these operators bridge the two, Spark-
native and exact (every step is window/groupBy arithmetic, DuckDB-oracle-
able — no UDFs, no per-key driver loops):

- `resample`: bucket events to a fixed grid (floor(ts/step)*step) and
  aggregate per (key, bucket) — one shuffle, the same epoch-bucket
  arithmetic the tile store uses (`operators/tiles.py`).
- `fill_gaps`: materialize EMPTY buckets between each key's first and last
  observed bucket via `sequence()` + explode — generation is per-key
  map-side after the resample agg; output rows = grid size, which the
  caller bounds by choosing the step (the honest cost of a dense grid; at
  100 TB you resample to coarse grids, not milliseconds).
- `forward_fill`: carry the last non-null observation forward per key —
  `last(col, ignorenulls=True)` over an unbounded-preceding window; one
  exchange shared by any number of filled columns.
- `rolling`: trailing-window mean/min/max/count over the REGULAR grid in
  ROWS terms (N buckets), the feature-engineering staple; plain window
  functions over the same single exchange.

The composition (resample → fill_gaps → forward_fill → rolling) plans as
ONE hash exchange on the key + per-key sorts: every stage declares the
same (key) partitioning, so Catalyst reuses the exchange. This mirrors the
reference's windowed-feature pitch (sliding aggregates over event time)
re-expressed for the regular-grid case, where plain ROWS windows beat the
RANGE machinery.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    step: int,
    aggs: Mapping[str, Column],
) -> DataFrame:
    """(key, bucket, **aggs) at one row per observed (key, bucket); `ts_col`
    is epoch-based integer (seconds/millis — caller's unit), `step` the grid
    in the same unit, `aggs` named aggregate expressions (e.g.
    {"v_sum": F.sum("value")})."""
    bucket = (F.col(ts_col) - (F.col(ts_col) % step)).alias("bucket")
    return (
        events.groupBy(F.col(key_col), bucket)
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )


def fill_gaps(
    regular: DataFrame,
    key_col: str,
    step: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Densify: one row per key per grid step between that key's first and
    last observed bucket; unobserved buckets carry NULL aggregates."""
    span = regular.groupBy(key_col).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    grid = span.select(
        key_col,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))
        ).alias(bucket_col),
    )
    return grid.join(regular, [key_col, bucket_col], "left")


def forward_fill(
    df: DataFrame,
    key_col: str,
    order_col: str,
    cols: list[str],
) -> DataFrame:
    """Carry each column's last non-null value forward per key (leading
    nulls stay null)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def rolling(
    df: DataFrame,
    key_col: str,
    order_col: str,
    col: str,
    n: int,
    stats: tuple[str, ...] = ("mean", "min", "max", "count"),
) -> DataFrame:
    """Trailing n-row window features over the regular grid:
    `{col}_roll_{stat}_{n}` columns. `count` counts non-null observations
    (gap buckets don't count)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    fns = {
        "mean": F.avg,
        "min": F.min,
        "max": F.max,
        "sum": F.sum,
        "count": F.count,
    }
    out = df
    for s in stats:
        out = out.withColumn(f"{col}_roll_{s}_{n}", fns[s](col).over(w))
    return out
