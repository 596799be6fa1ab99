"""ML window-UDAF workloads (SURVEY §2.9) over `events`.

Maps the reference's 30-UDAF product surface: the ``_where`` family runs
fully native (when() compositions, codegen'd); the cate/top families run on
the incremental sweep engine (functions/sliding.py). Every query here has a
DuckDB oracle built from a range self-join + string_agg that reproduces the
reference's CSV formats exactly (format rules: reference
src/runtime/operators/window/top/format.rs:3-41,
cate/accumulator.rs:273-296).

Consolidated to five queries (r03): all specs that share the same
partition/order/frame ride ONE sweep call (single exchange + sort + one
mapInPandas stage regardless of spec count — tests/test_plans.py asserts
this), so merging variants costs nothing at runtime and keeps the whole
30-function surface inside the driver's 50-entry correctness-gate window.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.formatting import DUCK_FMT
from volga_spark.functions.cate_top import (
    avg_cate,
    count_cate,
    max_cate,
    min_cate,
    sum_cate,
    top,
    top1_ratio,
    top_n_cate_where,
    top_n_ratio_cate,
    topn_frequency,
)
from volga_spark.functions.sliding import apply_sliding_aggs
from volga_spark.functions.where_funcs import count_where, max_where, min_where
from volga_spark.operators.window import cents, event_window, range_frame, rows_frame
from volga_spark.tables import load_table
from volga_spark.workloads import workload

PASS = ["event_id", "user_id", "ts"]
_COND = 100.0  # condition: value > 100.0


def fmt(expr: str) -> str:
    return DUCK_FMT.format(expr=expr)


# 1h RANGE pairs: one row per (event, window-member) — DuckDB planner turns
# the inequality pair into an IEJoin, fine at oracle scale.
_PAIRS = f"""
    pairs AS (
        SELECT e.event_id AS eid, e2.event_type AS cat, e2.value AS v,
               CAST(round(e2.value * 100) AS BIGINT) AS vc,
               (e2.value > {_COND}) AS cond
        FROM events e JOIN events e2
          ON e2.user_id = e.user_id
         AND e2.ts >= e.ts - INTERVAL 1 HOUR AND e2.ts <= e.ts
    )
"""


def _left_join_tail(cols: list[str], default: str = "''") -> str:
    sel = ", ".join(f"coalesce(s.{c}, {default}) AS {c}" for c in cols)
    return f"""
        SELECT e.event_id, e.user_id, e.ts, {sel}
        FROM events e LEFT JOIN strs s ON s.eid = e.event_id
    """


@workload(
    "q_ml_where_family",
    oracle=f"""
        SELECT event_id, user_id, ts,
               sum(CASE WHEN value > {_COND} THEN CAST(round(value*100) AS BIGINT) END)
                   OVER w / 100.0 AS sum_where_1h,
               count(CASE WHEN value > {_COND} THEN value END) OVER w AS count_where_1h,
               sum(CASE WHEN value > {_COND} THEN CAST(round(value*100) AS BIGINT) END)
                   OVER w / 100.0
                 / count(CASE WHEN value > {_COND} THEN value END) OVER w AS avg_where_1h,
               min(CASE WHEN value > {_COND} THEN value END) OVER w AS min_where_1h,
               max(CASE WHEN value > {_COND} THEN value END) OVER w AS max_where_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    tags=("ml_udaf",),
)
def q_ml_where_family(spark, sf_dir):
    """{sum,count,avg,min,max}_where — fully native (no Python in the plan)."""
    ev = load_table(spark, sf_dir, "events")
    w = event_window("user_id", "ts", range_frame("1 hour"))
    cond = F.col("value") > _COND
    sum_w = F.sum(F.when(cond, cents("value"))).over(w) / F.lit(100.0)
    cnt_w = count_where("value", cond).over(w)
    return ev.select(
        *PASS,
        sum_w.alias("sum_where_1h"),
        cnt_w.alias("count_where_1h"),
        (sum_w / cnt_w).alias("avg_where_1h"),
        min_where("value", cond).over(w).alias("min_where_1h"),
        max_where("value", cond).over(w).alias("max_where_1h"),
    )


@workload(
    "q_ml_cate_full",
    oracle=f"""
        WITH {_PAIRS},
        per_cat AS (
            SELECT eid, cat, sum(vc) AS s, count(*) AS c, min(v) AS mn, max(v) AS mx
            FROM pairs GROUP BY eid, cat
        ),
        parts AS (
            SELECT eid,
                   cat || ':' || {fmt("s / 100.0")} AS p_sum,
                   cat || ':' || CAST(c AS VARCHAR) AS p_cnt,
                   cat || ':' || {fmt("s / 100.0 / c")} AS p_avg,
                   cat || ':' || {fmt("mn")} AS p_min,
                   cat || ':' || {fmt("mx")} AS p_max
            FROM per_cat
        ),
        strs AS (
            SELECT eid,
                   string_agg(p_sum, ',' ORDER BY p_sum) AS sum_cate_1h,
                   string_agg(p_cnt, ',' ORDER BY p_cnt) AS count_cate_1h,
                   string_agg(p_avg, ',' ORDER BY p_avg) AS avg_cate_1h,
                   string_agg(p_min, ',' ORDER BY p_min) AS min_cate_1h,
                   string_agg(p_max, ',' ORDER BY p_max) AS max_cate_1h
            FROM parts GROUP BY eid
        )
        {_left_join_tail(["sum_cate_1h", "count_cate_1h", "avg_cate_1h",
                          "min_cate_1h", "max_cate_1h"])}
    """,
    tags=("ml_udaf",),
)
def q_ml_cate_full(spark, sf_dir):
    """The full unconditioned _cate family in one sweep: sum/count/avg
    (retractable accumulators) + min/max (lazy-deletion heaps) per category,
    RANGE 1h, CSV per-category output."""
    ev = load_table(spark, sf_dir, "events")
    return apply_sliding_aggs(
        ev,
        partition_by="user_id",
        order_by="ts",
        frame=range_frame("1 hour"),
        specs=[
            sum_cate("sum_cate_1h", "vc", "event_type", scale=100.0),
            count_cate("count_cate_1h", "vc", "event_type", scale=100.0),
            avg_cate("avg_cate_1h", "vc", "event_type", scale=100.0),
            min_cate("min_cate_1h", "value", "event_type"),
            max_cate("max_cate_1h", "value", "event_type"),
        ],
        passthrough=PASS,
        prepared={"vc": cents("value")},
    )


@workload(
    "q_ml_cate_where_full",
    oracle=f"""
        WITH {_PAIRS},
        per_cat AS (
            SELECT eid, cat, sum(vc) AS s, count(*) AS c, min(v) AS mn, max(v) AS mx
            FROM pairs WHERE cond GROUP BY eid, cat
        ),
        parts AS (
            SELECT eid,
                   cat || ':' || {fmt("s / 100.0")} AS p_sum,
                   cat || ':' || CAST(c AS VARCHAR) AS p_cnt,
                   cat || ':' || {fmt("s / 100.0 / c")} AS p_avg,
                   cat || ':' || {fmt("mn")} AS p_min,
                   cat || ':' || {fmt("mx")} AS p_max
            FROM per_cat
        ),
        strs AS (
            SELECT eid,
                   string_agg(p_sum, ',' ORDER BY p_sum) AS sum_cate_where_1h,
                   string_agg(p_cnt, ',' ORDER BY p_cnt) AS count_cate_where_1h,
                   string_agg(p_avg, ',' ORDER BY p_avg) AS avg_cate_where_1h,
                   string_agg(p_min, ',' ORDER BY p_min) AS min_cate_where_1h,
                   string_agg(p_max, ',' ORDER BY p_max) AS max_cate_where_1h
            FROM parts GROUP BY eid
        )
        {_left_join_tail(["sum_cate_where_1h", "count_cate_where_1h",
                          "avg_cate_where_1h", "min_cate_where_1h",
                          "max_cate_where_1h"])}
    """,
    tags=("ml_udaf",),
)
def q_ml_cate_where_full(spark, sf_dir):
    """The full conditioned _cate_where family in one sweep — completes the
    15-function _cate(_where) matrix (reference cate/udf.rs:287-380);
    condition evaluated JVM-side before the Python stage."""
    ev = load_table(spark, sf_dir, "events")
    return apply_sliding_aggs(
        ev,
        partition_by="user_id",
        order_by="ts",
        frame=range_frame("1 hour"),
        specs=[
            sum_cate("sum_cate_where_1h", "vc", "event_type", cond="cond", scale=100.0),
            count_cate("count_cate_where_1h", "vc", "event_type", cond="cond", scale=100.0),
            avg_cate("avg_cate_where_1h", "vc", "event_type", cond="cond", scale=100.0),
            min_cate("min_cate_where_1h", "value", "event_type", cond="cond"),
            max_cate("max_cate_where_1h", "value", "event_type", cond="cond"),
        ],
        passthrough=PASS,
        prepared={"vc": cents("value"), "cond": F.col("value") > _COND},
    )


@workload(
    "q_ml_top_full",
    oracle=f"""
        WITH {_PAIRS},
        ranked_v AS (
            SELECT eid, v,
                   row_number() OVER (PARTITION BY eid ORDER BY v DESC) AS rk
            FROM pairs
        ),
        top_v AS (
            SELECT eid, string_agg({fmt("v")}, ',' ORDER BY v DESC) AS top3_value
            FROM ranked_v WHERE rk <= 3 GROUP BY eid
        ),
        freq AS (
            SELECT eid, cat, count(*) AS c FROM pairs GROUP BY eid, cat
        ),
        ranked_f AS (
            SELECT eid, cat, c,
                   row_number() OVER (PARTITION BY eid ORDER BY c DESC, cat DESC) AS rk,
                   sum(c) OVER (PARTITION BY eid) AS total
            FROM freq
        ),
        top_f AS (
            SELECT eid,
                   string_agg(cat, ',' ORDER BY c DESC, cat DESC) AS top3_type
            FROM ranked_f WHERE rk <= 3 GROUP BY eid
        ),
        ratio1 AS (
            SELECT eid, CAST(max(CASE WHEN rk = 1 THEN c END) AS DOUBLE)
                        / max(total) AS top1_ratio_type
            FROM ranked_f GROUP BY eid
        ),
        per_cat AS (
            SELECT eid, cat, sum(vc) AS s, count(*) AS c, min(v) AS mn, max(v) AS mx
            FROM pairs WHERE cond GROUP BY eid, cat
        ),
        ranked AS (
            SELECT eid, cat, s, c, mn, mx,
                   row_number() OVER (PARTITION BY eid ORDER BY cat DESC) AS rk_key,
                   row_number() OVER (PARTITION BY eid ORDER BY s DESC, cat DESC) AS rk_sum,
                   row_number() OVER (PARTITION BY eid
                       ORDER BY s / 100.0 / c DESC, cat DESC) AS rk_avg,
                   row_number() OVER (PARTITION BY eid ORDER BY c DESC, cat DESC) AS rk_cnt,
                   row_number() OVER (PARTITION BY eid ORDER BY mn DESC, cat DESC) AS rk_min,
                   row_number() OVER (PARTITION BY eid ORDER BY mx DESC, cat DESC) AS rk_max
            FROM per_cat
        ),
        key_sum AS (
            SELECT eid, string_agg(cat || ':' || {fmt("s / 100.0")}, ',' ORDER BY cat DESC)
                       AS top2_key_sum
            FROM ranked WHERE rk_key <= 2 GROUP BY eid
        ),
        val_sum AS (
            SELECT eid, string_agg(cat || ':' || {fmt("s / 100.0")}, ',' ORDER BY s DESC, cat DESC)
                       AS top2_val_sum
            FROM ranked WHERE rk_sum <= 2 GROUP BY eid
        ),
        key_cnt AS (
            SELECT eid, string_agg(cat || ':' || CAST(c AS VARCHAR), ',' ORDER BY cat DESC)
                       AS top2_key_count
            FROM ranked WHERE rk_key <= 2 GROUP BY eid
        ),
        val_cnt AS (
            SELECT eid, string_agg(cat || ':' || CAST(c AS VARCHAR), ','
                       ORDER BY c DESC, cat DESC) AS top2_val_count
            FROM ranked WHERE rk_cnt <= 2 GROUP BY eid
        ),
        key_avg AS (
            SELECT eid, string_agg(cat || ':' || {fmt("s / 100.0 / c")}, ','
                       ORDER BY cat DESC) AS top2_key_avg
            FROM ranked WHERE rk_key <= 2 GROUP BY eid
        ),
        val_avg AS (
            SELECT eid, string_agg(cat || ':' || {fmt("s / 100.0 / c")}, ','
                       ORDER BY s / 100.0 / c DESC, cat DESC) AS top2_val_avg
            FROM ranked WHERE rk_avg <= 2 GROUP BY eid
        ),
        key_min AS (
            SELECT eid, string_agg(cat || ':' || {fmt("mn")}, ','
                       ORDER BY cat DESC) AS top2_key_min
            FROM ranked WHERE rk_key <= 2 GROUP BY eid
        ),
        val_min AS (
            SELECT eid, string_agg(cat || ':' || {fmt("mn")}, ','
                       ORDER BY mn DESC, cat DESC) AS top2_val_min
            FROM ranked WHERE rk_min <= 2 GROUP BY eid
        ),
        key_max AS (
            SELECT eid, string_agg(cat || ':' || {fmt("mx")}, ','
                       ORDER BY cat DESC) AS top2_key_max
            FROM ranked WHERE rk_key <= 2 GROUP BY eid
        ),
        val_max AS (
            SELECT eid, string_agg(cat || ':' || {fmt("mx")}, ','
                       ORDER BY mx DESC, cat DESC) AS top2_val_max
            FROM ranked WHERE rk_max <= 2 GROUP BY eid
        ),
        ratio_cat AS (
            SELECT eid, cat,
                   CAST(count(CASE WHEN cond THEN 1 END) AS DOUBLE) / count(*) AS r
            FROM pairs GROUP BY eid, cat
        ),
        ratio_ranked AS (
            SELECT eid, cat, r,
                   row_number() OVER (PARTITION BY eid ORDER BY cat DESC) AS rk_key,
                   row_number() OVER (PARTITION BY eid ORDER BY r DESC, cat DESC) AS rk_val
            FROM ratio_cat
        ),
        key_ratio AS (
            SELECT eid, string_agg(cat || ':' || {fmt("r")}, ',' ORDER BY cat DESC)
                       AS top2_key_ratio
            FROM ratio_ranked WHERE rk_key <= 2 GROUP BY eid
        ),
        val_ratio AS (
            SELECT eid, string_agg(cat || ':' || {fmt("r")}, ',' ORDER BY r DESC, cat DESC)
                       AS top2_val_ratio
            FROM ratio_ranked WHERE rk_val <= 2 GROUP BY eid
        ),
        strs AS (
            SELECT b.eid,
                   t.top3_value, f.top3_type, r1.top1_ratio_type,
                   ks.top2_key_sum, vs.top2_val_sum,
                   kc.top2_key_count, vc2.top2_val_count,
                   ka.top2_key_avg, va.top2_val_avg,
                   kn.top2_key_min, vn.top2_val_min,
                   kx.top2_key_max, vx.top2_val_max,
                   kr.top2_key_ratio, vr.top2_val_ratio
            FROM (SELECT DISTINCT eid FROM pairs) b
            LEFT JOIN top_v t ON t.eid = b.eid
            LEFT JOIN top_f f ON f.eid = b.eid
            LEFT JOIN ratio1 r1 ON r1.eid = b.eid
            LEFT JOIN key_sum ks ON ks.eid = b.eid
            LEFT JOIN val_sum vs ON vs.eid = b.eid
            LEFT JOIN key_cnt kc ON kc.eid = b.eid
            LEFT JOIN val_cnt vc2 ON vc2.eid = b.eid
            LEFT JOIN key_avg ka ON ka.eid = b.eid
            LEFT JOIN val_avg va ON va.eid = b.eid
            LEFT JOIN key_min kn ON kn.eid = b.eid
            LEFT JOIN val_min vn ON vn.eid = b.eid
            LEFT JOIN key_max kx ON kx.eid = b.eid
            LEFT JOIN val_max vx ON vx.eid = b.eid
            LEFT JOIN key_ratio kr ON kr.eid = b.eid
            LEFT JOIN val_ratio vr ON vr.eid = b.eid
        )
        SELECT e.event_id, e.user_id, e.ts,
               coalesce(s.top3_value, '') AS top3_value,
               coalesce(s.top3_type, '') AS top3_type,
               coalesce(s.top1_ratio_type, 0.0) AS top1_ratio_type,
               coalesce(s.top2_key_sum, '') AS top2_key_sum,
               coalesce(s.top2_val_sum, '') AS top2_val_sum,
               coalesce(s.top2_key_count, '') AS top2_key_count,
               coalesce(s.top2_val_count, '') AS top2_val_count,
               coalesce(s.top2_key_avg, '') AS top2_key_avg,
               coalesce(s.top2_val_avg, '') AS top2_val_avg,
               coalesce(s.top2_key_min, '') AS top2_key_min,
               coalesce(s.top2_val_min, '') AS top2_val_min,
               coalesce(s.top2_key_max, '') AS top2_key_max,
               coalesce(s.top2_val_max, '') AS top2_val_max,
               coalesce(s.top2_key_ratio, '') AS top2_key_ratio,
               coalesce(s.top2_val_ratio, '') AS top2_val_ratio
        FROM events e LEFT JOIN strs s ON s.eid = e.event_id
    """,
    tags=("ml_udaf",),
)
def q_ml_top_full(spark, sf_dir):
    """The complete top family in ONE sweep (15 specs, still a single
    exchange + one mapInPandas): top(value,3), topn_frequency(event_type,3),
    top1_ratio(event_type), all 10 top_n_{key,value}_{sum,count,avg,min,max}
    _cate_where combos, and both top_n_{key,value}_ratio_cate variants
    (reference cate/udf.rs:287-417, top/format.rs:3-41)."""
    ev = load_table(spark, sf_dir, "events")
    return apply_sliding_aggs(
        ev,
        partition_by="user_id",
        order_by="ts",
        frame=range_frame("1 hour"),
        specs=[
            top("top3_value", "value", 3),
            topn_frequency("top3_type", "event_type", 3),
            top1_ratio("top1_ratio_type", "event_type"),
            top_n_cate_where("top2_key_sum", "sum", "key", "vc", "cond", "event_type", 2, scale=100.0),
            top_n_cate_where("top2_val_sum", "sum", "value", "vc", "cond", "event_type", 2, scale=100.0),
            top_n_cate_where("top2_key_count", "count", "key", "vc", "cond", "event_type", 2, scale=100.0),
            top_n_cate_where("top2_val_count", "count", "value", "vc", "cond", "event_type", 2, scale=100.0),
            top_n_cate_where("top2_key_avg", "avg", "key", "vc", "cond", "event_type", 2, scale=100.0),
            top_n_cate_where("top2_val_avg", "avg", "value", "vc", "cond", "event_type", 2, scale=100.0),
            top_n_cate_where("top2_key_min", "min", "key", "valraw", "cond", "event_type", 2),
            top_n_cate_where("top2_val_min", "min", "value", "valraw", "cond", "event_type", 2),
            top_n_cate_where("top2_key_max", "max", "key", "valraw", "cond", "event_type", 2),
            top_n_cate_where("top2_val_max", "max", "value", "valraw", "cond", "event_type", 2),
            top_n_ratio_cate("top2_key_ratio", "key", "value", "cond", "event_type", 2),
            top_n_ratio_cate("top2_val_ratio", "value", "value", "cond", "event_type", 2),
        ],
        passthrough=PASS,
        prepared={
            "vc": cents("value"),
            "valraw": F.col("value"),
            "cond": F.col("value") > _COND,
        },
    )


@workload(
    "q_ml_cate_rows",
    oracle=f"""
        WITH ordered AS (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events
        ),
        pairs AS (
            SELECT o1.event_id AS eid, o2.event_type AS cat,
                   CAST(round(o2.value * 100) AS BIGINT) AS vc
            FROM ordered o1 JOIN ordered o2
              ON o2.user_id = o1.user_id AND o2.rn BETWEEN o1.rn - 50 AND o1.rn
        ),
        per_cat AS (
            SELECT eid, cat, sum(vc) AS s FROM pairs GROUP BY eid, cat
        ),
        strs AS (
            SELECT eid, string_agg(cat || ':' || {fmt("s / 100.0")}, ','
                       ORDER BY cat || ':' || {fmt("s / 100.0")}) AS sum_cate_50r
            FROM per_cat GROUP BY eid
        )
        {_left_join_tail(["sum_cate_50r"])}
    """,
    tags=("ml_udaf",),
)
def q_ml_cate_rows(spark, sf_dir):
    """sum_cate over a ROWS 50 PRECEDING frame (tiebreak on event_id —
    reference (ts, __seq_no) cursor semantics)."""
    ev = load_table(spark, sf_dir, "events")
    return apply_sliding_aggs(
        ev,
        partition_by="user_id",
        order_by="ts",
        frame=rows_frame(50),
        specs=[sum_cate("sum_cate_50r", "vc", "event_type", scale=100.0)],
        passthrough=PASS,
        prepared={"vc": cents("value")},
        tiebreak="event_id",
    )
