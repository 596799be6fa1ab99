"""Sliding-window workloads (SURVEY §2.8) over the `events` stream table.

Maps the reference's window benchmark/test shapes:
  - retractable aggs (SUM/COUNT/AVG) over RANGE frames
    (reference src/runtime/tests/window_operator_benchmark.rs:73-92)
  - plain aggs (MIN/MAX) over ROWS frames (benchmark :590-618)
  - multiple WINDOW clauses per query (reference README.md:107-150)
  - VAR/STDDEV retractables
    (reference src/runtime/operators/window/aggregates/mod.rs:88-140)

Consolidated to two queries (r03): each produces one row per event, so the
per-capability columns live side by side and share one exchange+sort —
Catalyst reuses a single hash partitioning on user_id across every frame
with the same partitioning, which is also the plan you'd want at 100 TB.

Oracle parity: windowed sums accumulate integer cents (value is 2-decimal),
surfaced as double with identical expressions on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.window import (
    avg_cents_over,
    cents,
    count_distinct_over,
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
    "q_window_core",
    oracle=f"""
        SELECT event_id, user_id, ts,
               count(*) OVER w AS cnt_1h,
               sum({_DUCK_CENTS}) OVER w / 100.0 AS sum_1h,
               sum({_DUCK_CENTS}) OVER w / 100.0 / count(value) OVER w AS avg_1h,
               min(value) OVER w_rows AS min_100,
               max(value) OVER w_rows AS max_100,
               count(*) OVER w_rows AS cnt_100
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW),
               w_rows AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 100 PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def q_window_core(spark, sf_dir):
    """Retractable SUM/COUNT/AVG over RANGE 1h PRECEDING plus plain MIN/MAX
    over ROWS 100 PRECEDING (reference retractable + plain accumulator kinds;
    deterministic (ts, event_id) tiebreak on the ROWS frame). One row per
    input event; both frames share the single user_id exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = event_window("user_id", "ts", range_frame("1 hour"))
    w_rows = event_window("user_id", "ts", rows_frame(100), tiebreak="event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("cnt_1h"),
        (F.sum(cents("value")).over(w) / F.lit(100.0)).alias("sum_1h"),
        avg_cents_over("value", w).alias("avg_1h"),
        F.min("value").over(w_rows).alias("min_100"),
        F.max("value").over(w_rows).alias("max_100"),
        F.count("*").over(w_rows).alias("cnt_100"),
    )


@workload(
    "q_window_advanced",
    oracle=f"""
        SELECT event_id, user_id, ts,
               sum({_DUCK_CENTS}) OVER w_short / 100.0 AS sum_10m,
               count(*) OVER w_long AS cnt_6h,
               min(value) OVER w_rows AS min_50,
               CASE WHEN count(value) OVER w_long > 1 THEN
                 (sum({_DUCK_CENTS} * {_DUCK_CENTS}) OVER w_long / 10000.0
                  - (sum({_DUCK_CENTS}) OVER w_long / 100.0)
                    * (sum({_DUCK_CENTS}) OVER w_long / 100.0)
                    / count(value) OVER w_long)
                 / (count(value) OVER w_long - 1)
               END AS var_samp_6h,
               sqrt(CASE WHEN count(value) OVER w_long > 1 THEN
                 (sum({_DUCK_CENTS} * {_DUCK_CENTS}) OVER w_long / 10000.0
                  - (sum({_DUCK_CENTS}) OVER w_long / 100.0)
                    * (sum({_DUCK_CENTS}) OVER w_long / 100.0)
                    / count(value) OVER w_long)
                 / (count(value) OVER w_long - 1)
               END) AS stddev_samp_6h,
               count(DISTINCT event_type) OVER w_long AS cd_types_6h,
               row_number() OVER w_full AS rn,
               lag(value, 1) OVER w_full AS prev_value,
               lead(value, 1) OVER w_full AS next_value,
               first_value(value) OVER w_rows20 AS first_20
        FROM events
        WINDOW
          w_short AS (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW),
          w_long  AS (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 6 HOUR PRECEDING AND CURRENT ROW),
          w_rows  AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 50 PRECEDING AND CURRENT ROW),
          w_rows20 AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 20 PRECEDING AND CURRENT ROW),
          w_full AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window",),
)
def q_window_advanced(spark, sf_dir):
    """Multiple WINDOW clauses with distinct frames in one query (reference
    README example w_short/w_long/w_rows), VAR_SAMP/STDDEV_SAMP retractables
    computed from exact integer sums (bit-identical doubles on both engines),
    and ranking/navigation functions (row_number/lag/lead/first_value —
    beyond the reference's surface, free on Spark). Catalyst shares the
    single user_id exchange across all five frames."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w_short = event_window("user_id", "ts", range_frame("10 minutes"))
    w_long = event_window("user_id", "ts", range_frame("6 hours"))
    w_rows = event_window("user_id", "ts", rows_frame(50), tiebreak="event_id")
    w_rows20 = event_window("user_id", "ts", rows_frame(20), tiebreak="event_id")
    w_full = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.sum(cents("value")).over(w_short) / F.lit(100.0)).alias("sum_10m"),
        F.count("*").over(w_long).alias("cnt_6h"),
        F.min("value").over(w_rows).alias("min_50"),
        var_samp_cents_over("value", w_long).alias("var_samp_6h"),
        stddev_samp_cents_over("value", w_long).alias("stddev_samp_6h"),
        count_distinct_over("event_type", w_long).alias("cd_types_6h"),
        F.row_number().over(w_full).alias("rn"),
        F.lag("value", 1).over(w_full).alias("prev_value"),
        F.lead("value", 1).over(w_full).alias("next_value"),
        F.first("value").over(w_rows20).alias("first_20"),
    )
