"""Pivot/unpivot: DuckDB hash-parity on testdata, round-trip property,
explicit-values contract, and plan shape (pivot = one shuffle, unpivot =
zero)."""

from __future__ import annotations

import pytest

from volga_spark.operators.reshape import (
    pivot_agg,
    pivot_oracle_sql,
    unpivot_long,
    unpivot_oracle_sql,
)
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def test_pivot_matches_duckdb(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    got = pivot_agg(
        o, ["o_orderstatus"], "o_orderpriority", PRIOS, "o_orderkey", "count"
    )
    sql = pivot_oracle_sql(
        "SELECT * FROM orders", ["o_orderstatus"], "o_orderpriority",
        PRIOS, "o_orderkey", "count",
    )
    problems = compare_frames(got.toPandas(), run_oracle(sql, sf_dir))
    assert not problems, problems


def test_unpivot_matches_duckdb(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").limit(0)  # schema probe
    cols = [c for c in ev.columns]
    assert "value" in cols
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_id", "CAST(value AS DOUBLE) AS v1", "CAST(user_id AS DOUBLE) AS v2"
    )
    got = unpivot_long(ev, ["event_id"], ["v1", "v2"], "var", "val")
    sql = unpivot_oracle_sql(
        "SELECT event_id, CAST(value AS DOUBLE) AS v1, "
        "CAST(user_id AS DOUBLE) AS v2 FROM events",
        ["event_id"], ["v1", "v2"], "var", "val",
    )
    problems = compare_frames(got.toPandas(), run_oracle(sql, sf_dir))
    assert not problems, problems


def test_pivot_unpivot_round_trip(spark):
    rows = [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0)]
    df = spark.createDataFrame(rows, "k string, cat string, v double")
    wide = pivot_agg(df, ["k"], "cat", ["x", "y"], "v", "sum")
    long_again = unpivot_long(
        wide, ["k"], ["x", "y"], "cat", "v", drop_nulls=True
    )
    assert sorted(map(tuple, long_again.collect())) == sorted(rows)


def test_dynamic_pivot_rejected():
    with pytest.raises(ValueError, match="explicit"):
        pivot_agg(None, ["k"], "cat", [], "v")


def test_plan_shapes(spark):
    rows = [("a", "x", 1.0)] * 10
    df = spark.createDataFrame(rows, "k string, cat string, v double")
    import contextlib
    import io

    def fmt_plan(frame):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            frame.explain("formatted")
        return buf.getvalue()

    wide = pivot_agg(df, ["k"], "cat", ["x", "y"], "v")
    # ONE exchange (conditional-agg pivot) with map-side partial agg.
    # Spark's native groupBy().pivot() plans TWO aggregations —
    # groupBy(k, cat) then pivotfirst(k), two exchanges — which is why
    # pivot_agg compiles the CASE form instead.
    plan = fmt_plan(wide)
    assert plan.count("hashpartitioning(") == 1, plan[:3000]
    assert "partial_sum" in plan

    lng = unpivot_long(df, ["k"], ["v"])
    plan2 = fmt_plan(lng)
    assert "Exchange" not in plan2  # pure map-side expand
