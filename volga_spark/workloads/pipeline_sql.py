"""PipelineSpec-path workload: the reference's product entry point (JSON/SQL
spec → engine) running inside the driver's correctness gate. The SQL mixes a
native window agg, a rewritten _where agg, and a sweep-compiled cate UDAF —
all three compilation routes in one query (reference README.md:107-150)."""

from __future__ import annotations

from volga_spark.api import PipelineSpec, SourceSpec
from volga_spark.formatting import DUCK_FMT

_SQL = """
SELECT event_id, user_id, ts,
       count(value) OVER w_short AS cnt_10m,
       sum_where(CAST(round(value * 100) AS BIGINT), value > 100.0) OVER w_long AS sumc_big_1h,
       sum_cate(CAST(round(value * 100) AS BIGINT), event_type) OVER w_long AS sum_cate_1h
FROM events
WINDOW w_short AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL '600' SECOND PRECEDING AND CURRENT ROW),
       w_long AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
"""

_fmt = DUCK_FMT.format(expr="s / 100.0")


def _oracle() -> str:
    return f"""
        WITH pairs AS (
            SELECT e.event_id AS eid, e2.event_type AS cat,
                   CAST(round(e2.value * 100) AS BIGINT) AS vc
            FROM events e JOIN events e2
              ON e2.user_id = e.user_id
             AND e2.ts >= e.ts - INTERVAL 1 HOUR AND e2.ts <= e.ts
        ),
        per_cat AS (
            SELECT eid, cat, CAST(sum(vc) AS BIGINT) AS sc FROM pairs GROUP BY eid, cat
        ),
        strs AS (
            SELECT eid,
                   string_agg(cat || ':' || CAST(sc AS VARCHAR), ','
                              ORDER BY cat || ':' || CAST(sc AS VARCHAR)) AS sum_cate_1h
            FROM per_cat GROUP BY eid
        )
        SELECT e.event_id, e.user_id, e.ts,
               count(e.value) OVER w_short AS cnt_10m,
               CAST(sum(CASE WHEN e.value > 100.0
                        THEN CAST(round(e.value * 100) AS BIGINT) END) OVER w_long
                    AS BIGINT) AS sumc_big_1h,
               coalesce(s.sum_cate_1h, '') AS sum_cate_1h
        FROM events e LEFT JOIN strs s ON s.eid = e.event_id
        WINDOW w_short AS (PARTITION BY e.user_id ORDER BY e.ts
                           RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW),
               w_long AS (PARTITION BY e.user_id ORDER BY e.ts
                           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """


from volga_spark.workloads import workload


@workload("q_pipeline_sql", oracle=_oracle(), tags=("pipeline", "ml_udaf"))
def q_pipeline_sql(spark, sf_dir):
    from volga_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    spec = PipelineSpec(sql=_SQL, sources=[SourceSpec("events", dataframe=events)])
    return spec.build(spark)
