"""Sliding-window workloads (SURVEY §2.8) over the `events` stream table.

Maps the reference's window benchmark/test shapes:
  - retractable aggs (SUM/COUNT/AVG) over RANGE frames
    (reference src/runtime/tests/window_operator_benchmark.rs:73-92)
  - plain aggs (MIN/MAX) over ROWS frames (benchmark :590-618)
  - multiple WINDOW clauses per query (reference README.md:107-150)
  - VAR/STDDEV retractables
    (reference src/runtime/operators/window/aggregates/mod.rs:88-140)

Oracle parity: windowed sums accumulate integer cents (value is 2-decimal),
surfaced as double with identical expressions on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.window import (
    avg_cents_over,
    cents,
    event_window,
    range_frame,
    rows_frame,
    stddev_samp_cents_over,
    var_samp_cents_over,
)
from volga_spark.tables import load_table
from volga_spark.workloads import workload

_DUCK_CENTS = "CAST(round(value * 100) AS BIGINT)"


@workload(
    "q_window_range_sum_cnt_avg",
    oracle=f"""
        SELECT event_id, user_id, ts,
               count(*) OVER w AS cnt_1h,
               sum({_DUCK_CENTS}) OVER w / 100.0 AS sum_1h,
               sum({_DUCK_CENTS}) OVER w / 100.0 / count(value) OVER w AS avg_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def q_window_range_sum_cnt_avg(spark, sf_dir):
    """Retractable SUM/COUNT/AVG over RANGE 1h PRECEDING (one row per input)."""
    ev = load_table(spark, sf_dir, "events")
    w = event_window("user_id", "ts", range_frame("1 hour"))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("cnt_1h"),
        (F.sum(cents("value")).over(w) / F.lit(100.0)).alias("sum_1h"),
        avg_cents_over("value", w).alias("avg_1h"),
    )


@workload(
    "q_window_rows_minmax",
    oracle="""
        SELECT event_id, user_id, ts,
               min(value) OVER w AS min_100,
               max(value) OVER w AS max_100,
               count(*) OVER w AS cnt_100
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 100 PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def q_window_rows_minmax(spark, sf_dir):
    """Plain MIN/MAX over ROWS 100 PRECEDING (reference 'plain accumulator'
    kind — recompute-per-frame; deterministic (ts, event_id) tiebreak)."""
    ev = load_table(spark, sf_dir, "events")
    w = event_window("user_id", "ts", rows_frame(100), tiebreak="event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.min("value").over(w).alias("min_100"),
        F.max("value").over(w).alias("max_100"),
        F.count("*").over(w).alias("cnt_100"),
    )


@workload(
    "q_window_multi",
    oracle=f"""
        SELECT event_id, user_id, ts,
               sum({_DUCK_CENTS}) OVER w_short / 100.0 AS sum_10m,
               count(*) OVER w_long AS cnt_6h,
               min(value) OVER w_rows AS min_50
        FROM events
        WINDOW
          w_short AS (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW),
          w_long  AS (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 6 HOUR PRECEDING AND CURRENT ROW),
          w_rows  AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 50 PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def q_window_multi(spark, sf_dir):
    """Multiple WINDOW clauses with distinct frames in one query (reference
    README example w_short/w_long/w_rows). Catalyst shares the single
    shuffle+sort across frames with the same partitioning."""
    ev = load_table(spark, sf_dir, "events")
    w_short = event_window("user_id", "ts", range_frame("10 minutes"))
    w_long = event_window("user_id", "ts", range_frame("6 hours"))
    w_rows = event_window("user_id", "ts", rows_frame(50), tiebreak="event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.sum(cents("value")).over(w_short) / F.lit(100.0)).alias("sum_10m"),
        F.count("*").over(w_long).alias("cnt_6h"),
        F.min("value").over(w_rows).alias("min_50"),
    )


@workload(
    "q_window_var_stddev",
    oracle=f"""
        SELECT event_id, user_id, ts,
               CASE WHEN count(value) OVER w > 1 THEN
                 (sum({_DUCK_CENTS} * {_DUCK_CENTS}) OVER w / 10000.0
                  - (sum({_DUCK_CENTS}) OVER w / 100.0)
                    * (sum({_DUCK_CENTS}) OVER w / 100.0)
                    / count(value) OVER w)
                 / (count(value) OVER w - 1)
               END AS var_samp_1h,
               sqrt(CASE WHEN count(value) OVER w > 1 THEN
                 (sum({_DUCK_CENTS} * {_DUCK_CENTS}) OVER w / 10000.0
                  - (sum({_DUCK_CENTS}) OVER w / 100.0)
                    * (sum({_DUCK_CENTS}) OVER w / 100.0)
                    / count(value) OVER w)
                 / (count(value) OVER w - 1)
               END) AS stddev_samp_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def q_window_var_stddev(spark, sf_dir):
    """VAR_SAMP/STDDEV_SAMP retractables over RANGE 1h, computed from exact
    integer sums so both engines produce bit-identical doubles."""
    ev = load_table(spark, sf_dir, "events")
    w = event_window("user_id", "ts", range_frame("1 hour"))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        var_samp_cents_over("value", w).alias("var_samp_1h"),
        stddev_samp_cents_over("value", w).alias("stddev_samp_1h"),
    )


@workload(
    "q_window_rank_nav",
    oracle="""
        SELECT event_id, user_id, ts,
               row_number() OVER w AS rn,
               lag(value, 1) OVER w AS prev_value,
               lead(value, 1) OVER w AS next_value,
               first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND CURRENT ROW) AS first_20
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window",),
)
def q_window_rank_nav(spark, sf_dir):
    """Ranking + navigation functions (beyond the reference's surface —
    free on Spark, included for engine completeness)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w20 = event_window("user_id", "ts", rows_frame(20), tiebreak="event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.row_number().over(w).alias("rn"),
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        F.first("value").over(w20).alias("first_20"),
    )
