"""Exact windowed discrete quantiles across the four surfaces (the
count_distinct discipline): batch native = DuckDB quantile_disc, SQL front
end (sweep engine) = DuckDB in write mode, request mode = write path row
for row. The streaming (tiled) surface is pinned in test_tiled_window."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.api import PipelineSpec, SourceSpec
from volga_spark.operators.window import event_window, quantile_disc_over, range_frame
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

_DUCK = """
SELECT event_id,
       quantile_disc(value, 0.5) OVER w AS p50,
       quantile_disc(value, 0.95) OVER w AS p95
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 6 HOUR PRECEDING AND CURRENT ROW)
"""


def test_batch_quantile_matches_duckdb(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = event_window(["user_id"], "ts", range_frame("6 hours"))
    got = ev.select(
        "event_id",
        quantile_disc_over("value", 0.5, w).alias("p50"),
        quantile_disc_over("value", 0.95, w).alias("p95"),
    ).toPandas()
    oracle = run_oracle(_DUCK, sf_dir)
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(problems[:5])


SQL = """
SELECT event_id, user_id, ts,
       quantile_disc(value, 0.5) OVER w AS p50,
       quantile_disc(value, 0.95) OVER w AS p95
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '6' HOUR PRECEDING AND CURRENT ROW)
"""


def test_pipeline_quantile_matches_duckdb(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    spec = PipelineSpec(sql=SQL, sources=[SourceSpec("events", dataframe=events)])
    got = spec.build(spark).toPandas()[["event_id", "p50", "p95"]]
    oracle = run_oracle(_DUCK, sf_dir)
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(problems[:5])


def test_request_mode_quantile_matches_write_path(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    spec = PipelineSpec(sql=SQL, sources=[SourceSpec("events", dataframe=events)])
    expected = {
        r.event_id: (r.p50, r.p95)
        for r in spec.build(spark).filter(F.col("event_id") % 17 == 0).collect()
    }
    assert expected
    svc = spec.build_request_service(spark)
    try:
        requests = events.filter(F.col("event_id") % 17 == 0).select(
            F.col("event_id").alias("request_id"), "user_id", "ts"
        )
        got = {
            r.request_id: (r.p50, r.p95)
            for r in svc.lookup(requests).collect()
        }
    finally:
        svc.close()
    assert got == expected


def test_quantile_validation():
    import pytest

    from volga_spark.functions.cate_top import quantile_disc

    with pytest.raises(ValueError):
        quantile_disc("x", "v", 0.0)
    with pytest.raises(ValueError):
        quantile_disc("x", "v", 1.2)
    with pytest.raises(ValueError):
        quantile_disc_over("v", -0.5, None)
