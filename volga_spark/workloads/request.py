"""Request-mode workloads (SURVEY §2.10): point-in-time window aggregates at
virtual request timestamps, matching a DuckDB range-join oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.formatting import DUCK_FMT
from volga_spark.operators.request import (
    masked,
    point_in_time_lookup,
    point_in_time_ml_lookup,
)
from volga_spark.operators.window import cents, range_frame, rows_frame
from volga_spark.tables import load_table
from volga_spark.workloads import workload


@workload(
    "q_request_point_lookup",
    oracle="""
        WITH req AS (
            SELECT event_id AS request_id, user_id,
                   ts + INTERVAL 1 SECOND AS rts
            FROM events WHERE event_id % 10 = 0
        ),
        base AS (
            SELECT q.request_id, q.user_id,
                   count(e.value) AS cnt_1h,
                   sum(CAST(round(e.value * 100) AS BIGINT)) / 100.0 AS sum_1h,
                   min(e.value) AS min_1h,
                   max(e.value) AS max_1h
            FROM req q LEFT JOIN events e
              ON e.user_id = q.user_id
             AND e.ts >= q.rts - INTERVAL 1 HOUR AND e.ts <= q.rts
            GROUP BY q.request_id, q.user_id
        ),
        rows_pairs AS (
            SELECT q.request_id, e.value AS v,
                   row_number() OVER (PARTITION BY q.request_id
                       ORDER BY e.ts DESC, e.event_id DESC) AS rk
            FROM req q JOIN events e
              ON e.user_id = q.user_id AND e.ts <= q.rts
        ),
        rows_agg AS (
            SELECT request_id, count(*) AS cnt_r100,
                   sum(CAST(round(v * 100) AS BIGINT)) / 100.0 AS sum_r100,
                   min(v) AS min_r100,
                   max(v) AS max_r100
            FROM rows_pairs WHERE rk <= 100 GROUP BY request_id
        )
        SELECT b.request_id, b.user_id, b.cnt_1h, b.sum_1h, b.min_1h, b.max_1h,
               coalesce(ra.cnt_r100, 0) AS cnt_r100,
               ra.sum_r100, ra.min_r100, ra.max_r100,
               coalesce(ra.cnt_r100, 0) AS cnt_r100b,
               ra.sum_r100 AS sum_r100b, ra.min_r100 AS min_r100b,
               ra.max_r100 AS max_r100b
        FROM base b LEFT JOIN rows_agg ra ON ra.request_id = b.request_id
    """,
    tags=("request",),
)
def q_request_point_lookup(spark, sf_dir):
    """Every 10th event +1s becomes a request point; SUM/COUNT/MIN/MAX over
    the trailing 1h of state evaluated at that virtual timestamp (reference
    request_source_e2e_test shape). r13 'rows' leg: the same natives over
    ``ROWS 100 PRECEDING`` — the reference's own request-benchmark frame
    shape (window_operator_benchmark.rs:609-612 runs ROWS 10000 PRECEDING
    in Request mode, planned by plan_rows_points): the frame at a virtual
    point is the last 100 state rows at-or-before rts by (ts, event_id),
    request rows never consuming stored positions."""
    ev = load_table(spark, sf_dir, "events")
    state = ev.select("user_id", "ts", "value")
    requests = ev.filter(F.col("event_id") % 10 == 0).select(
        F.col("event_id").alias("request_id"),
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 1 SECOND")).alias("ts"),
    )
    base = point_in_time_lookup(
        state,
        requests,
        key_cols="user_id",
        ts_col="ts",
        frame=range_frame("1 hour"),
        agg_builder=lambda w: {
            "cnt_1h": F.count(masked("value")).over(w),
            "sum_1h": F.sum(F.round(masked("value") * 100).cast("long")).over(w)
            / F.lit(100.0),
            "min_1h": F.min(masked("value")).over(w),
            "max_1h": F.max(masked("value")).over(w),
        },
    ).select("request_id", "user_id", "cnt_1h", "sum_1h", "min_1h", "max_1h")
    # the ROWS leg runs the BLOCK-DECOMPOSED position index — the serving
    # default for this frame shape (the naive union-window pays Spark's
    # O(n·N) sliding-frame recompute; see operators/rows_index.py). The
    # two-pass native path is pinned equal to the same brute-force model
    # in tests/test_rows_request_serving.py.
    from volga_spark.operators.rows_index import rows_lookup

    rows_leg = rows_lookup(
        ev.select("user_id", "ts", "event_id", "value"),
        requests,
        key_cols="user_id",
        ts_col="ts",
        value_col="value",
        frame=rows_frame(100),
        tiebreak="event_id",
    ).select(
        "request_id",
        F.col("cnt").alias("cnt_r100"),
        F.col("sum_value").alias("sum_r100"),
        F.col("min_value").alias("min_r100"),
        F.col("max_value").alias("max_r100"),
    )
    # 'rows-bucketed' leg (r13): the SAME frame answered through the
    # bucketed as-of (in-bucket edge probe + dense previous-bucket carry
    # summary — the reference's bucket-index seek, bucket_span_for_rows
    # _window); must hash-match the identical DuckDB aggregation. The odd
    # granularity exercises bucket-boundary clamping at every sf.
    rows_bkt = rows_lookup(
        ev.select("user_id", "ts", "event_id", "value"),
        requests,
        key_cols="user_id",
        ts_col="ts",
        value_col="value",
        frame=rows_frame(100),
        tiebreak="event_id",
        bucket="7 minutes",
    ).select(
        "request_id",
        F.col("cnt").alias("cnt_r100b"),
        F.col("sum_value").alias("sum_r100b"),
        F.col("min_value").alias("min_r100b"),
        F.col("max_value").alias("max_r100b"),
    )
    return (
        base.join(rows_leg, "request_id")
        .join(rows_bkt, "request_id")
        .select(
            "request_id", "user_id", "cnt_1h", "sum_1h", "min_1h", "max_1h",
            "cnt_r100", "sum_r100", "min_r100", "max_r100",
            "cnt_r100b", "sum_r100b", "min_r100b", "max_r100b",
        )
    )


@workload(
    "q_request_ml_lookup",
    oracle=f"""
        WITH req AS (
            SELECT event_id AS request_id, user_id,
                   ts + INTERVAL 1 SECOND AS rts
            FROM events WHERE event_id % 10 = 0
        ),
        pairs AS (
            SELECT q.request_id, e.event_type AS cat, e.value AS v,
                   CAST(round(e.value * 100) AS BIGINT) AS vc
            FROM req q JOIN events e
              ON e.user_id = q.user_id
             AND e.ts >= q.rts - INTERVAL 1 HOUR AND e.ts <= q.rts
        ),
        per_cat AS (
            SELECT request_id, cat, CAST(sum(vc) AS BIGINT) AS s, count(*) AS c
            FROM pairs GROUP BY request_id, cat
        ),
        cate_strs AS (
            SELECT request_id,
                   string_agg(cat || ':' || CAST(s AS VARCHAR), ','
                              ORDER BY cat || ':' || CAST(s AS VARCHAR))
                       AS sum_cate_1h
            FROM per_cat GROUP BY request_id
        ),
        ranked_v AS (
            SELECT request_id, v,
                   row_number() OVER (PARTITION BY request_id ORDER BY v DESC) AS rk
            FROM pairs
        ),
        top_strs AS (
            SELECT request_id,
                   string_agg({DUCK_FMT.format(expr="v")}, ',' ORDER BY v DESC) AS top3_value
            FROM ranked_v WHERE rk <= 3 GROUP BY request_id
        ),
        freq AS (
            SELECT request_id, cat, count(*) AS c FROM pairs GROUP BY request_id, cat
        ),
        ranked_f AS (
            SELECT request_id, c,
                   row_number() OVER (PARTITION BY request_id ORDER BY c DESC, cat DESC) AS rk,
                   sum(c) OVER (PARTITION BY request_id) AS total
            FROM freq
        ),
        ratio AS (
            SELECT request_id, CAST(max(CASE WHEN rk = 1 THEN c END) AS DOUBLE)
                               / max(total) AS top1_ratio_type
            FROM ranked_f GROUP BY request_id
        ),
        cnt10 AS (
            SELECT q.request_id,
                   count(CASE WHEN e.value > 100.0 THEN e.value END) AS cnt_big_10m
            FROM req q LEFT JOIN events e
              ON e.user_id = q.user_id
             AND e.ts >= q.rts - INTERVAL 10 MINUTE AND e.ts <= q.rts
            GROUP BY q.request_id
        )
        SELECT q.request_id, q.user_id,
               coalesce(cs.sum_cate_1h, '') AS sum_cate_1h,
               coalesce(ts_.top3_value, '') AS top3_value,
               coalesce(r.top1_ratio_type, 0.0) AS top1_ratio_type,
               coalesce(c10.cnt_big_10m, 0) AS cnt_big_10m
        FROM req q
        LEFT JOIN cate_strs cs ON cs.request_id = q.request_id
        LEFT JOIN top_strs ts_ ON ts_.request_id = q.request_id
        LEFT JOIN ratio r ON r.request_id = q.request_id
        LEFT JOIN cnt10 c10 ON c10.request_id = q.request_id
    """,
    tags=("request", "ml_udaf"),
)
def q_request_ml_lookup(spark, sf_dir):
    """The full ML UDAF library evaluated at virtual request points —
    sum_cate + top + top1_ratio features as of each request timestamp
    (reference window_request_operator.rs evaluates its complete UDAF
    surface at request points, not just native aggs). r12: routed through
    the MULTI-WINDOW ``PipelineSpec`` request compiler (two RANGE windows:
    the 1h UDAF window plus a 10-minute conditioned native — the rewritten
    ``count_where`` exercises the NaN-safe sweep accumulator), so the
    driver gate covers the SQL→service path, the per-frame sweep split and
    the request_id join, not just the bare operator."""
    from volga_spark.api import PipelineSpec, SourceSpec

    ev = load_table(spark, sf_dir, "events")
    requests = ev.filter(F.col("event_id") % 10 == 0).select(
        F.col("event_id").alias("request_id"),
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 1 SECOND")).alias("ts"),
    )
    sql = """
        SELECT event_id, user_id,
               sum_cate(CAST(round(value * 100) AS BIGINT), event_type)
                   OVER w1h AS sum_cate_1h,
               top(value, 3) OVER w1h AS top3_value,
               top1_ratio(event_type) OVER w1h AS top1_ratio_type,
               count_where(value, value > 100.0) OVER w10m AS cnt_big_10m
        FROM events
        WINDOW w1h AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW),
               w10m AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL '10' MINUTE PRECEDING AND CURRENT ROW)
    """
    spec = PipelineSpec(
        sql=sql, sources=[SourceSpec("events", dataframe=ev)], execution_mode="request"
    )
    svc = spec.build_request_service(spark)
    return svc.lookup(requests).select(
        "request_id",
        "user_id",
        "sum_cate_1h",
        "top3_value",
        "top1_ratio_type",
        "cnt_big_10m",
    )


@workload(
    "q_request_tiled_lookup",
    oracle="""
        WITH req AS (
            SELECT event_id AS request_id, user_id,
                   ts + INTERVAL 1 SECOND AS rts
            FROM events WHERE event_id % 10 = 0
        )
        SELECT q.request_id, q.user_id,
               count(e.value) AS cnt,
               sum(CAST(round(e.value * 100) AS BIGINT)) / 100.0 AS sum_value,
               min(e.value) AS min_value,
               max(e.value) AS max_value
        FROM req q LEFT JOIN events e
          ON e.user_id = q.user_id
         AND e.ts >= q.rts - INTERVAL 1 HOUR AND e.ts <= q.rts
        GROUP BY q.request_id, q.user_id
    """,
    tags=("request", "tiles"),
)
def q_request_tiled_lookup(spark, sf_dir):
    """Same point-in-time semantics as q_request_point_lookup but answered
    from a [1m, 10m] pre-aggregated tile LADDER + raw edge rows (reference
    multi-granularity tiling, state/tiles.rs): each request's interior is
    the canonical coarsest-tiles-that-fit cover (`cover_buckets`), so
    per-request probe volume is O(Σ level branching + W/g_max) and stays
    bounded as windows grow. r07: the ladder path itself is what the
    driver oracle hash-checks here (the answer must equal the raw SQL
    window regardless of how the cover decomposes it). r12: this query
    probes through the PRECOMPUTED COVER TEMPLATE (the serving default),
    while q_request_stream_tiles keeps the carry-chain fallback — both
    cover decompositions stay under the driver's hash gate."""
    from volga_spark.operators.tiles import (
        build_cover_template,
        tiled_lookup,
    )
    from volga_spark.operators.window import interval_to_micros

    ev = load_table(spark, sf_dir, "events")
    requests = ev.filter(F.col("event_id") % 10 == 0).select(
        F.col("event_id").alias("request_id"),
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 1 SECOND")).alias("ts"),
    )
    gs = ["1 minute", "10 minutes"]
    tpl = build_cover_template(
        spark,
        range_frame("1 hour").micros,
        [interval_to_micros(x) for x in gs],
    )
    return tiled_lookup(
        ev.select("user_id", "ts", "value"),
        requests,
        key_cols="user_id",
        ts_col="ts",
        value_col="value",
        frame=range_frame("1 hour"),
        granularity="1 minute",
        granularities=gs,
        cover_template=tpl,
    )


@workload(
    "q_request_stream_tiles",
    oracle="""
        WITH req AS (
            SELECT event_id AS request_id, user_id,
                   ts + INTERVAL 1 SECOND AS rts
            FROM events WHERE event_id % 10 = 0
        )
        SELECT q.request_id, q.user_id,
               count(e.value) AS cnt,
               sum(CAST(round(e.value * 100) AS BIGINT)) / 100.0 AS sum_value,
               min(e.value) AS min_value,
               max(e.value) AS max_value
        FROM req q LEFT JOIN events e
          ON e.user_id = q.user_id
         AND e.ts >= q.rts - INTERVAL 1 HOUR AND e.ts <= q.rts
        GROUP BY q.request_id, q.user_id
    """,
    tags=("request", "tiles", "streaming"),
)
def q_request_stream_tiles(spark, sf_dir):
    """Tiled point-in-time lookup answered from tiles built INCREMENTALLY by
    the streaming write path (foreachBatch fold per micro-batch — reference
    state/tiles.rs:59-118 maintains tiles on ingest, not by rescanning), so
    request mode can serve over live state / after a cold restore without
    touching raw rows. Must hash-match the same oracle as the batch-built
    tile query."""
    from volga_spark.operators.tiles import tiled_lookup
    from volga_spark.streaming.sources import chunked_file_stream
    from volga_spark.streaming.tile_sink import stream_build_tiles

    stream, _ = chunked_file_stream(spark, sf_dir, "events", "ts", n_chunks=5, files_per_trigger=2)
    tiles = stream_build_tiles(
        stream.select("user_id", "ts", "value"),
        key_cols="user_id",
        ts_col="ts",
        value_col="value",
        granularity="1 minute",
    )
    ev = load_table(spark, sf_dir, "events")
    requests = ev.filter(F.col("event_id") % 10 == 0).select(
        F.col("event_id").alias("request_id"),
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 1 SECOND")).alias("ts"),
    )
    return tiled_lookup(
        ev.select("user_id", "ts", "value"),
        requests,
        key_cols="user_id",
        ts_col="ts",
        value_col="value",
        frame=range_frame("1 hour"),
        granularity="1 minute",
        tiles=tiles,
    )
