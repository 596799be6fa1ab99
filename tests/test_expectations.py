"""Data-quality expectation suite: one-agg-pass plan, DuckDB report parity,
hard-gate raise, and the same-action observe() variant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from volga_spark.operators.expectations import (
    accepted_values,
    evaluate_observed,
    in_range,
    matches_regex,
    min_rows,
    not_null,
    observed_checks,
    report_oracle_sql,
    unique,
    validate,
)
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table


def _suite():
    return [
        min_rows(100),
        not_null("doc_id"),
        unique("doc_id"),
        in_range("n_chars", 1, 10**7),
        matches_regex("source", "^src[0-9]+$"),
        accepted_values("lang", ["en", "de", "fr", "es", "zh", "hi", "ar", "ru"],
                        max_violation_fraction=1.0),  # report-only threshold
    ]


def test_report_matches_duckdb(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    report = validate(df, _suite())
    sql = report_oracle_sql(f"read_parquet('{sf_dir}/documents.parquet')", _suite())
    assert not compare_frames(report.toPandas(), run_oracle(sql, sf_dir))
    # the clean corpus passes the key checks
    got = {r["check_name"]: r["passed"] for r in report.collect()}
    assert got["not_null(doc_id)"] and got["unique(doc_id)"] and got["min_rows(100)"]


def test_single_pass_plan(spark, sf_dir):
    """All non-distinct checks fold into ONE aggregation over ONE scan."""
    df = load_table(spark, sf_dir, "documents")
    checks = [min_rows(1), not_null("doc_id"), in_range("n_chars", 1, 10**7)]
    agg = df.agg(*[c.metric.cast("double").alias(f"m{i}") for i, c in enumerate(checks)])
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE prints the plan twice
    assert final.count("FileScan") == 1, final
    assert final.count("Exchange") <= 1, final  # partial agg + one final gather


def test_hard_gate_raises_with_failed_names(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    bad = [min_rows(10**9), not_null("doc_id")]
    with pytest.raises(ValueError, match=r"min_rows\(1000000000\)"):
        validate(df, bad, on_fail="raise")
    # report mode returns the row instead
    rep = validate(df, bad).collect()
    by = {r["check_name"]: r for r in rep}
    assert not by["min_rows(1000000000)"]["passed"]
    assert by["not_null(doc_id)"]["passed"]


def test_violations_are_counted_not_just_flagged(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "b", -1), (2, None, 3), (4, "zz", 900)],
        "id bigint, cat string, v bigint",
    )
    rep = validate(
        df,
        [
            unique("id"),
            not_null("cat", max_null_fraction=0.5),
            in_range("v", 0, 100, max_violation_fraction=0.25),
            accepted_values("cat", ["a", "b"]),
        ],
    )
    by = {r["check_name"]: r for r in rep.collect()}
    assert by["unique(id)"]["observed"] == 1.0 and not by["unique(id)"]["passed"]
    assert by["not_null(cat)"]["observed"] == 0.25 and by["not_null(cat)"]["passed"]
    # two of four v values violate [0,100] → 0.5 > 0.25 → fail
    assert by["in_range(v,0,100)"]["observed"] == 0.5
    assert not by["in_range(v,0,100)"]["passed"]
    assert by["accepted_values(cat)"]["observed"] == 0.25  # 'zz' of 4 rows


def test_observe_variant_rides_one_action(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    checks = [min_rows(1), not_null("doc_id"), in_range("n_chars", 1, 10**7)]
    out, obs = observed_checks(df, checks)
    n = out.count()  # the only action
    results = evaluate_observed(obs, checks)
    assert results[0][1] == float(n) and all(ok for _, _, ok in results)
    # distinct-based checks are rejected up front
    with pytest.raises(ValueError, match="unique"):
        observed_checks(df, [unique("doc_id")])


def test_empty_frame_semantics(spark):
    df = spark.createDataFrame([], "id bigint, v double")
    rep = validate(df, [not_null("id"), in_range("v", 0, 1), min_rows(1)])
    by = {r["check_name"]: r for r in rep.collect()}
    # fraction checks define 0/0 as 0 violations → pass; min_rows fails
    assert by["not_null(id)"]["passed"] and by["in_range(v,0,1)"]["passed"]
    assert not by["min_rows(1)"]["passed"]
