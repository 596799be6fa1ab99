"""count_distinct(col) OVER w through the PipelineSpec SQL front end — both
execution modes vs the DuckDB count(DISTINCT) window oracle."""

from __future__ import annotations

from volga_spark.api import PipelineSpec, SourceSpec
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table

SQL = """
SELECT event_id, user_id, ts,
       count_distinct(event_type) OVER w AS cd_types,
       sum_cate(value, event_type) OVER w AS sum_cate_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
"""


def test_pipeline_count_distinct_matches_duckdb(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    spec = PipelineSpec(sql=SQL, sources=[SourceSpec("events", dataframe=events)])
    got = spec.build(spark).toPandas()[["event_id", "cd_types"]]
    oracle = run_oracle(
        """
        SELECT event_id, count(DISTINCT event_type) OVER w AS cd_types
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """,
        sf_dir,
    )
    assert got["cd_types"].max() > 1
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(problems)


def test_request_mode_count_distinct_matches_write_path(spark, sf_dir):
    """A lookup at an existing event's own (key, ts) returns exactly that
    row's write-path cd_types (request rows never contribute)."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    spec = PipelineSpec(sql=SQL, sources=[SourceSpec("events", dataframe=events)])
    write_path = spec.build(spark)
    expected = {
        r.event_id: (r.cd_types, r.sum_cate_1h)
        for r in write_path.filter(F.col("event_id") % 13 == 0).collect()
    }
    assert expected

    svc = spec.build_request_service(spark)
    try:
        requests = events.filter(F.col("event_id") % 13 == 0).select(
            F.col("event_id").alias("request_id"), "user_id", "ts"
        )
        got = {
            r.request_id: (r.cd_types, r.sum_cate_1h)
            for r in svc.lookup(requests).collect()
        }
    finally:
        svc.close()
    assert set(got) == set(expected)
    for rid, exp in expected.items():
        assert got[rid] == exp, (rid, got[rid], exp)
