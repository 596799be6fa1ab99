"""Sessionization + multi-dimensional aggregation coverage.

Session windows are absent from the reference (only OVER-style sliding
windows — SURVEY §2.12 notes tumbling/sliding/session *group* windows don't
exist there); they're table stakes for an events engine, and free on Spark.
Batch sessionization = gap-threshold lag/cumsum (oracle-able); streaming
uses session_window() (see streaming workloads).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from volga_spark.tables import load_table
from volga_spark.workloads import workload


@workload(
    "q_sessionize",
    oracle="""
        WITH marked AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL 30 MINUTE OR
                             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sess AS (
            SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
            FROM marked
        )
        SELECT user_id, session_no,
               count(*) AS n_events,
               min(ts) AS session_start,
               max(ts) AS session_end,
               sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS session_value
        FROM sess GROUP BY user_id, session_no
    """,
    tags=("session",),
)
def q_sessionize(spark, sf_dir):
    """30-minute-gap sessionization: lag → new-session flag → running count
    as session id → per-session aggregates. One shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0)).alias(
            "session_value"
        ),
    )


@workload(
    "q_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def q_rollup(spark, sf_dir):
    """ROLLUP subtotals (beyond the reference's SQL surface — its planner
    errors on grouping sets; native on Spark)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty"),
    )


@workload(
    "q_percentiles",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.95), 6) AS p95,
               min(value) AS vmin, max(value) AS vmax
        FROM events GROUP BY event_type
    """,
    tags=("agg",),
)
def q_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (Spark percentile ≡ DuckDB
    quantile_cont; rounded to 6 for interpolation-arithmetic neutrality)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
