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
            SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
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
    "q_rollup_decimal",
    oracle="""
        SELECT 'rollup' AS leg, l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(24,2))
                    AS VARCHAR) AS price_dec,
               CAST(sum(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS linenum_sum
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        UNION ALL
        SELECT 'cube' AS leg, l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(24,2))
                    AS VARCHAR) AS price_dec,
               CAST(sum(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS linenum_sum
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        UNION ALL
        SELECT 'gsets' AS leg, l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(24,2))
                    AS VARCHAR) AS price_dec,
               CAST(sum(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS linenum_sum
        FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    tags=("agg", "decimal"),
)
def q_rollup_decimal(spark, sf_dir):
    """Multi-grouping aggregation in one leg-tagged union — ROLLUP, CUBE,
    and explicit GROUPING SETS, each with the ANSI GROUPING bitmask (gid:
    rightmost grouping column = least-significant bit, identical encoding
    on Spark and DuckDB). Beyond the reference's SQL surface — its planner
    errors on grouping sets; native on Spark. Carries Decimal128 and
    integer-widening parity columns (SURVEY §1.2: the reference widens
    Decimal sums to Decimal128 and unsigned ints to u64 —
    reference src/runtime/operators/window/top/format.rs:31-32):
    ``price_dec`` accumulates DECIMAL(12,2), widens to an explicit
    DECIMAL(24,2), and is surfaced as its exact decimal string on both
    engines (the pandas bridges render decimals differently — Decimal vs
    float64 — so the string form is the representation-stable exact check);
    ``linenum_sum`` widens a 32-bit int to BIGINT."""
    li = load_table(spark, sf_dir, "lineitem")

    def aggs():
        return [
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("decimal(24,2)")
            .cast("string")
            .alias("price_dec"),
            F.sum(F.col("l_linenumber").cast("bigint"))
            .cast("bigint")
            .alias("linenum_sum"),
        ]

    cols = ["l_returnflag", "l_linestatus", "gid", "n", "qty", "price_dec",
            "linenum_sum"]
    r = li.rollup("l_returnflag", "l_linestatus").agg(*aggs()).select(
        F.lit("rollup").alias("leg"), *cols
    )
    c = li.cube("l_returnflag", "l_linestatus").agg(*aggs()).select(
        F.lit("cube").alias("leg"), *cols
    )
    g = (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"]],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(*aggs())
        .select(F.lit("gsets").alias("leg"), *cols)
    )
    return r.unionByName(c).unionByName(g)
