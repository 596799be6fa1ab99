"""Banded range join — `left ⋈ right ON key AND right_ts ∈ [left_ts+lower,
left_ts+upper]` without a quadratic cross product.

Spark has no native range join (DuckDB's IEJoin equivalent); the scalable
composition buckets the right side by time (bucket width = the range span)
and explodes each left row into the ≤2 buckets its range can touch, turning
the range condition into an equi-join on (key, bucket) plus a cheap residual
filter. Join volume is |left|×2 ⋈ bucketed-right — linear, shuffle on
(key, bucket), skew-safe under AQE.

This is the batch analogue of the reference's time-bucketed state lookup
(BatchId{key_hash, time_bucket} — reference src/storage/batch_store.rs:18-24).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    how: str = "inner",
) -> DataFrame:
    """Rows paired when right_ts ∈ [left_ts + lower_us, left_ts + upper_us]
    (microsecond offsets, inclusive). Columns: all left + all right."""
    if upper_us <= lower_us:
        raise ValueError("upper_us must be > lower_us")
    if how != "inner":
        # the residual time filter runs post-join (drops null-extended rows)
        # and the 2-bucket explode duplicates unmatched left rows — both
        # break outer semantics; implement via unmatched re-join if needed
        raise NotImplementedError("range_join supports how='inner' only")
    keys = [on] if isinstance(on, str) else list(on)
    width = upper_us - lower_us

    lt = F.unix_micros(F.col(left_ts))
    rt = F.unix_micros(F.col(right_ts))

    l = left.withColumn(
        "__lb",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((lt + F.lit(lower_us)) / F.lit(width)).cast("long"),
                    F.floor((lt + F.lit(upper_us)) / F.lit(width)).cast("long"),
                )
            )
        ),
    )
    r = right.withColumn("__lb", F.floor(rt / F.lit(width)).cast("long"))
    joined = l.join(r, keys + ["__lb"], how).filter(
        (F.unix_micros(F.col(right_ts)) >= F.unix_micros(F.col(left_ts)) + F.lit(lower_us))
        & (F.unix_micros(F.col(right_ts)) <= F.unix_micros(F.col(left_ts)) + F.lit(upper_us))
    )
    return joined.drop("__lb")
