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

from volga_spark.operators.tiles import fdiv


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
    (microsecond offsets, inclusive). Columns: all left + all right.

    ``how``: 'inner' or 'left' ('left_outer'). The naive approach of passing
    an outer ``how`` into the bucketed equi-join is WRONG twice over — the
    residual time filter would drop null-extended rows, and the 2-bucket
    explode would emit unmatched left rows once per bucket — so the outer
    form is composed instead: inner result ∪ (left ∖ matched) with
    null-extended right columns, matched-ness tracked by an internal
    surrogate id. The anti side is a cheap (id)-keyed semi-join against the
    inner OUTPUT's id set (ids + nothing else shuffles for it).
    """
    if upper_us <= lower_us:
        raise ValueError("upper_us must be > lower_us")
    if how not in ("inner", "left", "left_outer"):
        raise NotImplementedError(
            "range_join supports how='inner' and 'left'/'left_outer' only"
        )
    keys = [on] if isinstance(on, str) else list(on)
    width = upper_us - lower_us

    outer = how != "inner"
    if outer:
        # the stamped left feeds BOTH the inner branch and the anti branch;
        # monotonically_increasing_id is only stable if the plan beneath it
        # evaluates identically in both, so pin it (lazy localCheckpoint —
        # same discipline as dedup/CC; blocks released via
        # caching.release_cached_blocks)
        left = left.withColumn(
            "__rjid", F.monotonically_increasing_id()
        ).localCheckpoint(eager=False)

    lt = F.unix_micros(F.col(left_ts))
    rt = F.unix_micros(F.col(right_ts))

    l = left.withColumn(
        "__lb",
        F.explode(
            F.array_distinct(
                F.array(
                    fdiv(lt + F.lit(lower_us), width),
                    fdiv(lt + F.lit(upper_us), width),
                )
            )
        ),
    )
    r = right.withColumn("__lb", fdiv(rt, width))
    inner = (
        l.join(r, keys + ["__lb"], "inner")
        .filter(
            (F.unix_micros(F.col(right_ts)) >= F.unix_micros(F.col(left_ts)) + F.lit(lower_us))
            & (F.unix_micros(F.col(right_ts)) <= F.unix_micros(F.col(left_ts)) + F.lit(upper_us))
        )
        .drop("__lb")
    )
    if not outer:
        return inner

    matched = inner.select("__rjid").distinct()
    right_only = [c for c in r.columns if c not in keys + ["__lb"]]
    unmatched = left.join(matched, "__rjid", "left_anti").select(
        "*", *[F.lit(None).cast(r.schema[c].dataType).alias(c) for c in right_only]
    )
    return inner.unionByName(unmatched.select(inner.columns)).drop("__rjid")
