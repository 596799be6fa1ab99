"""Left-outer banded range join vs a DuckDB LEFT JOIN oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.range_join import range_join
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

TEN_MIN_US = 10 * 60 * 1_000_000


def _spark_result(spark, sf_dir, how):
    ev = load_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "ts")
    # thin the right side so a real unmatched population exists (a full
    # self-join matches itself and would never exercise the outer branch)
    right = ev.filter(F.col("event_id") % 7 == 0).select(
        F.col("event_id").alias("other_id"),
        "user_id",
        F.col("ts").alias("other_ts"),
    )
    out = range_join(
        left, right, on="user_id", left_ts="ts", right_ts="other_ts",
        lower_us=-TEN_MIN_US, upper_us=TEN_MIN_US, how=how,
    )
    return out.select("event_id", "user_id", "other_id")


def test_left_outer_range_join_matches_duckdb(spark, sf_dir):
    got = _spark_result(spark, sf_dir, "left").toPandas()
    oracle = run_oracle(
        """
        SELECT a.event_id, a.user_id, b.event_id AS other_id
        FROM events a LEFT JOIN (SELECT * FROM events WHERE event_id % 7 = 0) b
          ON b.user_id = a.user_id
         AND b.ts BETWEEN a.ts - INTERVAL 10 MINUTE
                      AND a.ts + INTERVAL 10 MINUTE
        """,
        sf_dir,
    )
    assert got["other_id"].isna().any(), "outer branch never exercised"
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(problems)


def test_left_outer_covers_every_left_row_once_or_matched(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n_left = ev.count()
    got = _spark_result(spark, sf_dir, "left")
    # every left event appears; unmatched exactly once with null other_id
    assert got.select("event_id").distinct().count() == n_left
    unmatched = got.filter(F.col("other_id").isNull())
    assert unmatched.count() > 0, "outer branch never exercised"
    dup_unmatched = (
        unmatched.groupBy("event_id").count().filter("count > 1").count()
    )
    assert dup_unmatched == 0
    # inner subset identical to how='inner'
    inner = _spark_result(spark, sf_dir, "inner").toPandas()
    outer_matched = got.filter(F.col("other_id").isNotNull()).toPandas()
    assert not compare_frames(outer_matched, inner)


def test_rejects_unknown_how(spark, sf_dir):
    import pytest

    with pytest.raises(NotImplementedError):
        _spark_result(spark, sf_dir, "full")
