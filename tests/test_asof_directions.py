"""asof_join direction/tolerance variants vs DuckDB correlated-subquery
oracles (DuckDB's native ASOF JOIN is backward-only, so forward/nearest/
tolerance oracle via explicit min/max subqueries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.asof import asof_join
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

# right side: thinned events (unique (user_id, ts) by construction of the
# generator at sf0.001; verified in the fixture assertion below)
_RIGHT_FILTER = "event_id % 5 = 0"


def _frames(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "ts")
    right = ev.filter(F.expr(_RIGHT_FILTER)).select(
        "user_id",
        F.col("ts").alias("rts"),
        F.col("event_id").alias("matched_id"),
    )
    dup = right.groupBy("user_id", "rts").count().filter("count > 1").count()
    assert dup == 0, "right (key, ts) not unique — oracle would be ambiguous"
    return left, right


def _run(spark, sf_dir, direction, tolerance_us=None):
    left, right = _frames(spark, sf_dir)
    return asof_join(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="rts",
        value_cols=["matched_id"],
        direction=direction,
        tolerance_us=tolerance_us,
    ).select("event_id", "matched_id")


def _oracle(sf_dir, match_expr):
    return run_oracle(
        f"""
        WITH r AS (SELECT user_id, ts AS rts, event_id AS matched_id
                   FROM events WHERE {_RIGHT_FILTER})
        SELECT e.event_id, ({match_expr}) AS matched_id
        FROM events e
        """,
        sf_dir,
    )


def test_forward_matches_duckdb(spark, sf_dir):
    got = _run(spark, sf_dir, "forward").toPandas()
    oracle = _oracle(
        sf_dir,
        """SELECT r.matched_id FROM r
           WHERE r.user_id = e.user_id AND r.rts >= e.ts
           ORDER BY r.rts ASC LIMIT 1""",
    )
    assert got["matched_id"].notna().any() and got["matched_id"].isna().any()
    assert not compare_frames(got, oracle)


def test_nearest_matches_duckdb(spark, sf_dir):
    got = _run(spark, sf_dir, "nearest").toPandas()
    # nearest = smaller |gap|, backward wins ties (epoch_us arithmetic)
    oracle = _oracle(
        sf_dir,
        """SELECT r.matched_id FROM r
           WHERE r.user_id = e.user_id
           ORDER BY abs(epoch_us(r.rts) - epoch_us(e.ts)) ASC,
                    (r.rts > e.ts) ASC, r.rts ASC
           LIMIT 1""",
    )
    assert not compare_frames(got, oracle)


def test_backward_tolerance_matches_duckdb(spark, sf_dir):
    hour_us = 3_600_000_000
    got = _run(spark, sf_dir, "backward", tolerance_us=hour_us).toPandas()
    oracle = _oracle(
        sf_dir,
        f"""SELECT r.matched_id FROM r
            WHERE r.user_id = e.user_id AND r.rts <= e.ts
              AND epoch_us(e.ts) - epoch_us(r.rts) <= {hour_us}
            ORDER BY r.rts DESC LIMIT 1""",
    )
    # the bound actually bites: strictly more nulls than unbounded backward
    unbounded = _run(spark, sf_dir, "backward").toPandas()
    assert got["matched_id"].isna().sum() > unbounded["matched_id"].isna().sum()
    assert not compare_frames(got, oracle)


def test_backward_unchanged_vs_original_semantics(spark, sf_dir):
    """direction='backward', no tolerance == the pre-existing oracled
    behavior (q_temporal_join's asof-leg oracle pins it too; this is the direct check)."""
    got = _run(spark, sf_dir, "backward").toPandas()
    oracle = _oracle(
        sf_dir,
        """SELECT r.matched_id FROM r
           WHERE r.user_id = e.user_id AND r.rts <= e.ts
           ORDER BY r.rts DESC LIMIT 1""",
    )
    assert not compare_frames(got, oracle)


def test_rejects_unknown_direction(spark, sf_dir):
    import pytest

    with pytest.raises(ValueError):
        _run(spark, sf_dir, "sideways")
