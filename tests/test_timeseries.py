"""Time-series prep: the full resample → fill_gaps → forward_fill →
rolling composition hash-matches a DuckDB twin over `events` (integer-cents
discipline for float parity), edge semantics are pinned on crafted frames,
and the composition plans with ONE hash exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.timeseries import (
    fill_gaps,
    forward_fill,
    resample,
    rolling,
)
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

STEP = 6 * 3_600 * 1_000_000  # 6h grid in epoch-µs

_ORACLE = f"""
WITH r AS (
    SELECT user_id,
           epoch_us(ts) - (epoch_us(ts) % {STEP}) AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v_cents,
           count(*) AS n
    FROM events WHERE user_id < 40 GROUP BY 1, 2
),
span AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM r GROUP BY 1),
grid AS (SELECT user_id, unnest(range(lo, hi + {STEP}, {STEP})) AS bucket
         FROM span),
g AS (SELECT grid.user_id, grid.bucket, r.v_cents, r.n
      FROM grid LEFT JOIN r USING (user_id, bucket)),
ff AS (
    SELECT user_id, bucket, n,
           last_value(v_cents IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_cents
    FROM g
)
SELECT user_id, bucket, v_cents, n,
       CAST(sum(v_cents) OVER w4 AS BIGINT) AS v_cents_roll_sum_4,
       min(v_cents) OVER w4 AS v_cents_roll_min_4,
       max(v_cents) OVER w4 AS v_cents_roll_max_4,
       count(v_cents) OVER w4 AS v_cents_roll_count_4
FROM ff
WINDOW w4 AS (PARTITION BY user_id ORDER BY bucket
              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


def _pipeline(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    ev = ev.withColumn("ts_us", F.unix_micros("ts"))
    reg = resample(
        ev, "user_id", "ts_us", STEP,
        {
            "v_cents": F.sum(F.round(F.col("value") * 100).cast("bigint")),
            "n": F.count("*"),
        },
    )
    dense = fill_gaps(reg, "user_id", STEP)
    filled = forward_fill(dense, "user_id", "bucket", ["v_cents"])
    return rolling(
        filled, "user_id", "bucket", "v_cents", 4,
        stats=("sum", "min", "max", "count"),
    )


def test_composition_matches_duckdb(spark, sf_dir):
    got = _pipeline(spark, sf_dir).toPandas()
    oracle = run_oracle(_ORACLE, sf_dir)
    assert len(got) > 0
    assert not compare_frames(got, oracle)


def test_composition_plans_one_hash_exchange(spark, sf_dir):
    df = _pipeline(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # resample's groupBy, the span agg, the grid join, both windows — all
    # share one hash partitioning on user_id (plus its AQE reuse); a second
    # DISTINCT key would betray a lost co-partitioning
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash <= 2, plan  # agg partial/final pair at most


def test_fill_gaps_densifies_and_only_inside_span(spark):
    reg = spark.createDataFrame(
        [(1, 0, 10.0), (1, 30, 20.0), (2, 10, 5.0)],
        "k bigint, bucket bigint, v double",
    )
    dense = fill_gaps(reg, "k", 10).orderBy("k", "bucket").collect()
    got = [(r["k"], r["bucket"], r["v"]) for r in dense]
    assert got == [
        (1, 0, 10.0), (1, 10, None), (1, 20, None), (1, 30, 20.0),
        (2, 10, 5.0),
    ]


def test_forward_fill_carries_and_leading_nulls_stay(spark):
    df = spark.createDataFrame(
        [(1, 0, None), (1, 1, 7.0), (1, 2, None), (1, 3, None), (1, 4, 9.0)],
        "k bigint, t bigint, v double",
    )
    out = forward_fill(df, "k", "t", ["v"]).orderBy("t").collect()
    assert [r["v"] for r in out] == [None, 7.0, 7.0, 7.0, 9.0]


def test_rolling_mean_exact_on_ints(spark):
    df = spark.createDataFrame(
        [(1, i, (i + 1) * 10) for i in range(5)],
        "k bigint, t bigint, v bigint",
    )
    out = rolling(df, "k", "t", "v", 3, stats=("mean", "count")).orderBy(
        "t"
    ).collect()
    assert [r["v_roll_mean_3"] for r in out] == [10.0, 15.0, 20.0, 30.0, 40.0]
    assert [r["v_roll_count_3"] for r in out] == [1, 2, 3, 3, 3]
