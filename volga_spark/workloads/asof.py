"""Temporal join workloads: as-of join (latest order at-or-before each
event) and symmetric range join (±10min neighborhood aggregate), merged in
r07 into ONE leg-tagged union (q_temporal_join) to free a registry slot for
the SFT/conversation tier — the driver gate records at most 50 rows.
Oracle: DuckDB native ASOF JOIN for the 'asof' leg, an explicit interval
self-join for the 'range' leg."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from volga_spark.operators.asof import asof_join
from volga_spark.tables import load_table
from volga_spark.workloads import workload


@workload(
    "q_temporal_join",
    oracle="""
        WITH od AS (
            SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
            FROM (
                SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                             ORDER BY o_orderkey DESC) AS rn
                FROM orders
            ) WHERE rn = 1
        ),
        pairs AS (
            SELECT a.event_id, b.event_id AS other_id,
                   CAST(round(b.value * 100) AS BIGINT) AS vc
            FROM events a JOIN events b
              ON b.user_id = a.user_id
             AND b.ts BETWEEN a.ts - INTERVAL 10 MINUTE AND a.ts + INTERVAL 10 MINUTE
             AND b.event_id != a.event_id
        )
        SELECT 'asof' AS leg, e.event_id, e.user_id,
               o.o_orderkey AS k1,
               o.o_totalprice AS v1
        FROM events e ASOF LEFT JOIN od o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        UNION ALL
        SELECT 'range', e.event_id, e.user_id,
               coalesce(p.n, 0) AS k1,
               p.s / 100.0 AS v1
        FROM events e LEFT JOIN (
            SELECT event_id, count(*) AS n, sum(vc) AS s FROM pairs GROUP BY event_id
        ) p ON p.event_id = e.event_id
    """,
    tags=("join", "asof", "range"),
)
def q_temporal_join(spark, sf_dir):
    """Temporal-join capability in one leg-tagged union:

    - 'asof' leg: union-and-carry-forward as-of join (one shuffle on the
      key; right side deduped to unique (key, ts) for determinism) — each
      event enriched with the latest order of the same customer at or
      before the event time.
    - 'range' leg: symmetric ±10min range join (same user, excluding self)
      via bucketized equi-join — count and exact integer-accumulated sum of
      nearby event values.
    """
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")

    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    od = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderdate",
            F.col("o_orderkey").alias("k1"),
            F.col("o_totalprice").alias("v1"),
        )
    )
    asof_leg = (
        asof_join(
            ev.select("event_id", "user_id", "ts").withColumnRenamed(
                "user_id", "custkey"
            ),
            od.withColumnRenamed("o_custkey", "custkey"),
            on="custkey",
            left_ts="ts",
            right_ts="o_orderdate",
            value_cols=["k1", "v1"],
        )
        .select(
            F.lit("asof").alias("leg"),
            "event_id",
            F.col("custkey").alias("user_id"),
            "k1",
            "v1",
        )
    )

    from volga_spark.operators.range_join import range_join

    left = ev.select("event_id", "user_id", "ts")
    right = ev.select(
        F.col("event_id").alias("other_id"),
        F.col("user_id"),
        F.col("ts").alias("other_ts"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    ten_min = 10 * 60 * 1_000_000
    pairs = range_join(
        left, right, on="user_id", left_ts="ts", right_ts="other_ts",
        lower_us=-ten_min, upper_us=ten_min,
    ).filter(F.col("other_id") != F.col("event_id"))
    agg = pairs.groupBy("event_id").agg(
        F.count("*").alias("n"), F.sum("vc").alias("s")
    )
    range_leg = (
        ev.select("event_id", "user_id")
        .join(agg, "event_id", "left")
        .select(
            F.lit("range").alias("leg"),
            "event_id",
            "user_id",
            F.coalesce("n", F.lit(0)).alias("k1"),
            (F.col("s") / F.lit(100.0)).alias("v1"),
        )
    )

    return asof_leg.unionByName(range_leg)
