"""Streaming-mode workloads (SURVEY §2.12, §3.1 Streaming execution mode).

Each callable runs a real Structured Streaming query to completion
(availableNow — the reference's MAX_WATERMARK end-of-stream flush) over a
deterministic multi-micro-batch file stream, then returns the result as a
batch DataFrame, so streaming execution sits inside the same DuckDB
correctness gate as batch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.formatting import DUCK_FMT
from volga_spark.functions.accumulators import MinMaxAcc
from volga_spark.functions.cate_top import sum_cate
from volga_spark.functions.sliding import SlidingSpec
from volga_spark.operators.window import cents, range_frame, rows_frame
from volga_spark.streaming.runner import (
    python_handler_width,
    run_available_now_to_memory,
    upsert_by_key,
)
from volga_spark.streaming.sources import SENTINEL_ID, chunked_file_stream
from volga_spark.streaming.stateful_window import sliding_window_stream
from volga_spark.workloads import workload
from volga_spark.workloads._util import duck_dsum


@workload(
    "q_stream_groupby_count",
    oracle="""
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY event_type
    """,
    tags=("streaming",),
)
def q_stream_groupby_count(spark, sf_dir):
    """Streaming GROUP BY over 5 micro-batches, complete mode — equals the
    batch aggregate once the stream is drained (reference word-count
    pipeline, emit-at-MAX_WATERMARK semantics)."""
    stream, _ = chunked_file_stream(spark, sf_dir, "events", "ts", n_chunks=5, files_per_trigger=2)
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )
    return run_available_now_to_memory(agg, output_mode="complete")


@workload(
    "q_stream_tumbling_day",
    oracle=f"""
        SELECT date_trunc('day', ts) AS day_start, event_type,
               count(*) AS n, {duck_dsum("value")} AS total_value
        FROM events GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def q_stream_tumbling_day(spark, sf_dir):
    """Watermarked tumbling event-time window (group window — beyond the
    reference's OVER-only surface; native in Spark)."""
    stream, _ = chunked_file_stream(spark, sf_dir, "events", "ts", n_chunks=5, files_per_trigger=2)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
    res = run_available_now_to_memory(agg, output_mode="complete")
    return res.select(
        F.col("win.start").alias("day_start"), "event_type", "n", "total_value"
    )


@workload(
    "q_stream_sliding_window",
    oracle="""
        WITH pairs AS (
            SELECT e.event_id AS eid, e2.event_type AS cat,
                   CAST(round(e2.value * 100) AS BIGINT) AS vc
            FROM events e JOIN events e2
              ON e2.user_id = e.user_id
             AND e2.ts >= e.ts - INTERVAL 1 HOUR AND e2.ts <= e.ts
        ),
        per_cat AS (SELECT eid, cat, sum(vc) AS s FROM pairs GROUP BY eid, cat),
        strs AS (
            SELECT eid, string_agg(
                cat || ':' || CASE WHEN rtrim(rtrim(printf('%.6f', s / 100.0), '0'), '.') = ''
                              THEN '0' ELSE rtrim(rtrim(printf('%.6f', s / 100.0), '0'), '.') END,
                ',' ORDER BY cat || ':' || CASE WHEN rtrim(rtrim(printf('%.6f', s / 100.0), '0'), '.') = ''
                              THEN '0' ELSE rtrim(rtrim(printf('%.6f', s / 100.0), '0'), '.') END
            ) AS sum_cate_1h
            FROM per_cat GROUP BY eid
        )
        SELECT e.event_id, e.user_id, e.ts,
               count(*) OVER w AS cnt_1h,
               sum(CAST(round(e.value * 100) AS BIGINT)) OVER w / 100.0 AS sum_1h,
               coalesce(s.sum_cate_1h, '') AS sum_cate_1h
        FROM events e LEFT JOIN strs s ON s.eid = e.event_id
        WINDOW w AS (PARTITION BY e.user_id ORDER BY e.ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    tags=("streaming", "stateful", "ml_udaf"),
)
def q_stream_sliding_window(spark, sf_dir):
    """Per-row sliding window computed STATEFULLY over the stream
    (applyInPandasWithState), flushed by punctuation rows — must equal the
    batch window query exactly (reference brute-force model test,
    window_operator_tests.rs:894-1012). Carries plain retractables
    (count/sum) AND the ML sum_cate UDAF — the reference's headline
    capability (README.md:107-150) — in the SAME stateful sweep, so one
    stream run verifies both accumulator kinds."""

    class _CntSum:
        def __init__(self):
            self.n = 0
            self.s = 0

        def add(self, vc):
            self.n += 1
            self.s += vc

        def retract(self, vc):
            self.n -= 1
            self.s -= vc

    stream, _ = chunked_file_stream(
        spark, sf_dir, "events", "ts", n_chunks=5,
        key_col="user_id", id_col="event_id", flush=True, files_per_trigger=2,
    )
    out = sliding_window_stream(
        stream,
        key_cols="user_id",
        ts_col="ts",
        frame=range_frame("1 hour"),
        specs=[
            SlidingSpec("cnt_1h", _CntSum, ["vc"], "bigint", finish=lambda a: a.n),
            SlidingSpec("sum_1h", _CntSum, ["vc"], "double", finish=lambda a: a.s / 100.0),
            sum_cate("sum_cate_1h", "vc", "event_type", scale=100.0),
        ],
        passthrough=["event_id"],
        lateness="0 seconds",
        prepared={"vc": cents("value")},
    )
    res = run_available_now_to_memory(out, output_mode="append")
    return res.filter(F.col("event_id") != SENTINEL_ID).select(
        "event_id", "user_id", "ts", "cnt_1h", "sum_1h", "sum_cate_1h"
    )


def _tfmt(expr: str) -> str:
    return DUCK_FMT.format(expr=expr)


@workload(
    "q_stream_tiled_window",
    oracle=f"""
        WITH pairs AS (
            SELECT e.event_id AS eid, e2.event_type AS cat,
                   CAST(round(e2.value * 100) AS BIGINT) AS vc,
                   (e2.value > 100.0) AS cond
            FROM events e JOIN events e2
              ON e2.user_id = e.user_id
             AND e2.ts >= e.ts - INTERVAL 7 DAY AND e2.ts <= e.ts
        ),
        per_cat AS (SELECT eid, cat, sum(vc) AS s FROM pairs GROUP BY eid, cat),
        sc AS (
            SELECT eid, string_agg(
                cat || ':' || {{f1}}, ',' ORDER BY cat || ':' || {{f1}}
            ) AS sum_cate_7d
            FROM per_cat GROUP BY eid
        ),
        freq AS (SELECT eid, cat, count(*) AS c FROM pairs GROUP BY eid, cat),
        ranked_f AS (
            SELECT eid, cat, c,
                   row_number() OVER (PARTITION BY eid ORDER BY c DESC, cat DESC) AS rk,
                   sum(c) OVER (PARTITION BY eid) AS total
            FROM freq
        ),
        top_f AS (
            SELECT eid, string_agg(cat, ',' ORDER BY c DESC, cat DESC) AS topf_7d
            FROM ranked_f WHERE rk <= 2 GROUP BY eid
        ),
        ratio1 AS (
            SELECT eid, CAST(max(CASE WHEN rk = 1 THEN c END) AS DOUBLE)
                        / max(total) AS t1r_7d
            FROM ranked_f GROUP BY eid
        ),
        cond_cat AS (
            SELECT eid, cat, sum(vc) AS s FROM pairs WHERE cond GROUP BY eid, cat
        ),
        ranked_k AS (
            SELECT eid, cat, s,
                   row_number() OVER (PARTITION BY eid ORDER BY cat DESC) AS rk_key
            FROM cond_cat
        ),
        key_sum AS (
            SELECT eid, string_agg(cat || ':' || {{f2}}, ',' ORDER BY cat DESC)
                       AS top2_key_sum_7d
            FROM ranked_k WHERE rk_key <= 2 GROUP BY eid
        ),
        ratio_cat AS (
            SELECT eid, cat,
                   CAST(count(CASE WHEN cond THEN 1 END) AS DOUBLE) / count(*) AS r
            FROM pairs GROUP BY eid, cat
        ),
        ratio_ranked AS (
            SELECT eid, cat, r,
                   row_number() OVER (PARTITION BY eid ORDER BY r DESC, cat DESC) AS rk_val
            FROM ratio_cat
        ),
        val_ratio AS (
            SELECT eid, string_agg(cat || ':' || {{f3}}, ',' ORDER BY r DESC, cat DESC)
                       AS top2_val_ratio_7d
            FROM ratio_ranked WHERE rk_val <= 2 GROUP BY eid
        )
        SELECT e.event_id, e.user_id, e.ts,
               count(*) OVER w AS cnt_7d,
               sum(CAST(round(e.value * 100) AS BIGINT)) OVER w / 100.0 AS sum_7d,
               (sum(CAST(round(e.value * 100) AS BIGINT)) OVER w
                    / count(*) OVER w) / 100.0 AS avg_7d,
               min(e.value) OVER w AS min_7d,
               max(e.value) OVER w AS max_7d,
               coalesce(sc.sum_cate_7d, '') AS sum_cate_7d,
               coalesce(tf.topf_7d, '') AS topf_7d,
               coalesce(r1.t1r_7d, 0.0) AS t1r_7d,
               coalesce(ks.top2_key_sum_7d, '') AS top2_key_sum_7d,
               coalesce(vr.top2_val_ratio_7d, '') AS top2_val_ratio_7d
        FROM events e
        LEFT JOIN sc ON sc.eid = e.event_id
        LEFT JOIN top_f tf ON tf.eid = e.event_id
        LEFT JOIN ratio1 r1 ON r1.eid = e.event_id
        LEFT JOIN key_sum ks ON ks.eid = e.event_id
        LEFT JOIN val_ratio vr ON vr.eid = e.event_id
        WINDOW w AS (PARTITION BY e.user_id ORDER BY e.ts
                     RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
    """.format(
        f1=_tfmt("s / 100.0"), f2=_tfmt("s / 100.0"), f3=_tfmt("r")
    ),
    tags=("streaming", "stateful", "tiled", "ml_udaf"),
)
def q_stream_tiled_window(spark, sf_dir):
    """LONG-window (7-day) per-row sliding aggregates computed statefully
    with TILED state (reference tiles.rs:59-118): closed 12-hour buckets
    collapse to per-key partials in the state column — (n, Σ, Σ², min, max)
    for the scalar aggs AND per-category (n, Σ, min, max) maps for the ML
    ``sum_cate`` UDAF (the reference tiles arbitrary accumulator state via
    merge_accumulator_state; this is that capability Spark-side). Raw rows of
    closed buckets move to the spilled row store, so per-key hot state is
    O(window/granularity + open-bucket rows) instead of O(rows in 7 days) —
    the reference's headline months-long-window design point. Results are
    exact (integer-cents tiles + raw edge sweep; CSV category rendering
    shared with the untiled path) and must hash-match the batch DuckDB
    oracle."""
    from volga_spark.streaming.tiled_window import (
        TiledCateSpec,
        TiledRatioSpec,
        TiledSpec,
        TiledTopSpec,
        tiled_sliding_window_stream,
    )

    # 3 files/trigger → 3 micro-batches (batch 2 closes ~18 days of buckets,
    # batch 3 emits through tile interiors + spill edge reads) — per-batch
    # framework fixed cost is the measured dominator, and 3 batches still
    # exercise every tile/spill/GC path. Granularity 12h, not auto (L/256 ≈
    # 39min): this corpus runs ~2 events/user/day, so finer buckets hold <1
    # row and are pure tile-count overhead; 12h tiles average ~1 row and
    # halve the state round-trip.
    stream, _ = chunked_file_stream(
        spark, sf_dir, "events", "ts", n_chunks=5,
        key_col="user_id", id_col="event_id", flush=True, files_per_trigger=3,
    )
    out = tiled_sliding_window_stream(
        stream,
        key_cols="user_id",
        ts_col="ts",
        frame=range_frame("7 days"),
        granularity="12 hours",
        specs=[
            TiledSpec("cnt_7d", "count", "vc", "bigint"),
            TiledSpec("sum_7d", "sum", "vc", "double", finish=lambda s: s / 100.0),
            TiledSpec("avg_7d", "avg", "vc", "double", finish=lambda a: a / 100.0),
            TiledSpec("min_7d", "min", "value", "double"),
            TiledSpec("max_7d", "max", "value", "double"),
            TiledCateSpec("sum_cate_7d", "sum", "vc", "event_type", scale=100.0),
            TiledTopSpec("topf_7d", "topn_frequency", "event_type", k=2),
            TiledTopSpec("t1r_7d", "top1_ratio", "event_type", out_type="double"),
            TiledCateSpec(
                "top2_key_sum_7d", "sum", "vc", "event_type",
                cond_col="cond", scale=100.0, order="key", k=2,
            ),
            TiledRatioSpec(
                "top2_val_ratio_7d", "value", 2, "value", "cond", "event_type"
            ),
        ],
        passthrough=["event_id"],
        lateness="0 seconds",
        prepared={"vc": cents("value"), "cond": F.col("value") > 100.0},
    )
    # full-core width, not the stateful default 8: this query's per-batch
    # payload is the PYTHON tile handler (~16 CPU-s of numpy sweep per
    # run), so the full core count wins (~16% at sf0.1); JVM-stateful
    # queries keep 8. Width derives from the scheduler's parallelism
    # (r13: scale-adaptive — the driver also benches at lower core counts)
    res = run_available_now_to_memory(
        out, output_mode="append", stream_shuffle=python_handler_width(spark)
    )
    return res.filter(F.col("event_id") != SENTINEL_ID).select(
        "event_id", "user_id", "ts", "cnt_7d", "sum_7d", "avg_7d",
        "min_7d", "max_7d", "sum_cate_7d", "topf_7d", "t1r_7d",
        "top2_key_sum_7d", "top2_val_ratio_7d",
    )


@workload(
    "q_stream_tiled_window_month",
    oracle=f"""
        WITH pairs AS (
            SELECT e.event_id AS eid, e2.event_type AS cat,
                   CAST(round(e2.value * 100) AS BIGINT) AS vc
            FROM events e JOIN events e2
              ON e2.user_id = e.user_id
             AND e2.ts >= e.ts - INTERVAL 21 DAY AND e2.ts <= e.ts
        ),
        per_cat AS (SELECT eid, cat, sum(vc) AS s FROM pairs GROUP BY eid, cat),
        sc AS (
            SELECT eid, string_agg(
                cat || ':' || {{f1}}, ',' ORDER BY cat || ':' || {{f1}}
            ) AS sum_cate_21d
            FROM per_cat GROUP BY eid
        )
        SELECT e.event_id, e.user_id, e.ts,
               count(*) OVER w AS cnt_21d,
               sum(CAST(round(e.value * 100) AS BIGINT)) OVER w / 100.0 AS sum_21d,
               min(e.value) OVER w AS min_21d,
               max(e.value) OVER w AS max_21d,
               coalesce(sc.sum_cate_21d, '') AS sum_cate_21d
        FROM events e
        LEFT JOIN sc ON sc.eid = e.event_id
        WINDOW w AS (PARTITION BY e.user_id ORDER BY e.ts
                     RANGE BETWEEN INTERVAL 21 DAY PRECEDING AND CURRENT ROW)
    """.format(f1=_tfmt("s / 100.0")),
    tags=("streaming", "stateful", "tiled", "ml_udaf"),
)
def q_stream_tiled_window_month(spark, sf_dir):
    """MONTH-scale sliding window (21 days over a 30-day corpus) through the
    tiled stateful handler — the reference's headline hours-to-months design
    point (reference README.md:17, tiles.rs:59-118). 21 days, not 30: this
    corpus spans exactly 30 days, so a >=30-day window would degenerate to
    expanding-from-origin and the window's start edge would NEVER sweep a
    closed bucket — no spill-tier reads, no tile GC, a vacuous pass. At 21
    days every month-scale state path stays live: ~2-hour tiles carry the
    interior, start edges re-read spilled raw buckets, and tiles a full
    window behind the horizon are GC'd. Exact (integer-cents tiles) and
    hash-matched against the batch DuckDB oracle; the sub-linear state-size
    bound at this window length is asserted by
    tests/test_tiled_window.py::test_state_sublinear_month_scale."""
    from volga_spark.streaming.tiled_window import (
        TiledCateSpec,
        TiledSpec,
        tiled_sliding_window_stream,
    )

    # 3 files/trigger → 3 micro-batches (same structure as the 7d query):
    # batch 2 emits days 0-18 from the raw head then closes their buckets;
    # the flush batch emits days 18-30 through tile interiors + spill edge
    # reads and GCs tiles behind the horizon — every month-scale state path
    # stays live with one fewer trigger (per-trigger framework fixed cost
    # was the measured dominator, not handler CPU)
    stream, _ = chunked_file_stream(
        spark, sf_dir, "events", "ts", n_chunks=5,
        key_col="user_id", id_col="event_id", flush=True, files_per_trigger=3,
    )
    out = tiled_sliding_window_stream(
        stream,
        key_cols="user_id",
        ts_col="ts",
        frame=range_frame("21 days"),
        # multi-granularity ladder (reference tiles.rs tree): interiors
        # merge 1-day tiles, edges descend to 2-hour resolution — fewer
        # tile merges than fine-only AND fewer raw edge rows than
        # coarse-only, bit-equal to both (asserted in test_tiled_window)
        granularity=["2 hours", "1 day"],
        specs=[
            TiledSpec("cnt_21d", "count", "vc", "bigint"),
            TiledSpec("sum_21d", "sum", "vc", "double", finish=lambda s: s / 100.0),
            TiledSpec("min_21d", "min", "value", "double"),
            TiledSpec("max_21d", "max", "value", "double"),
            TiledCateSpec("sum_cate_21d", "sum", "vc", "event_type", scale=100.0),
        ],
        passthrough=["event_id"],
        lateness="0 seconds",
        prepared={"vc": cents("value")},
    )
    # full-core width: python-handler-bound, same rationale (and the same
    # scale-adaptive derivation) as q_stream_tiled_window
    res = run_available_now_to_memory(
        out, output_mode="append", stream_shuffle=python_handler_width(spark)
    )
    return res.filter(F.col("event_id") != SENTINEL_ID).select(
        "event_id", "user_id", "ts", "cnt_21d", "sum_21d",
        "min_21d", "max_21d", "sum_cate_21d",
    )


@workload(
    "q_stream_sessionize",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts, value, event_id,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL 30 MINUTE OR
                             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sess AS (
            SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
            FROM marked
        )
        SELECT user_id,
               min(ts) AS session_start,
               count(*) AS n_events,
               sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS session_value
        FROM sess GROUP BY user_id, session_no
    """,
    tags=("streaming", "session"),
)
def q_stream_sessionize(spark, sf_dir):
    """STREAMING sessionization via Spark's native ``session_window`` (gap
    merge in the state store — session *group* windows are absent from the
    reference entirely, SURVEY §2.12; free on Spark). Must equal the batch
    gap-sessionization oracle: a session's start, event count, and exact
    cents value per (user, 30-minute-gap session). Watermarked; drained with
    availableNow so every session closes."""
    stream, _ = chunked_file_stream(spark, sf_dir, "events", "ts", n_chunks=5, files_per_trigger=2)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0)).alias(
                "session_value"
            ),
            F.min("ts").alias("session_start"),
        )
    )
    res = run_available_now_to_memory(agg, output_mode="complete")
    return res.select("user_id", "session_start", "n_events", "session_value")


@workload(
    "q_stream_upsert_sink",
    oracle="""
        SELECT 'upsert' AS leg, user_id, event_id, event_type, value
        FROM (
            SELECT user_id, event_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
            FROM events
        ) WHERE rk = 1
        UNION ALL
        SELECT 'cdc' AS leg, user_id, seq AS event_id, event_type, value
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id
                ORDER BY seq DESC,
                         (CASE op WHEN 'D' THEN 2 ELSE 1 END) DESC,
                         event_type DESC NULLS LAST, value DESC NULLS LAST
            ) AS rk
            FROM (
                SELECT user_id, event_id AS seq, event_type, value,
                       CASE WHEN event_id % 10 = 0 THEN 'D'
                            WHEN event_id % 2 = 0 THEN 'U'
                            ELSE 'I' END AS op
                FROM events
            )
        ) WHERE rk = 1 AND op <> 'D'
    """,
    tags=("streaming", "sink", "cdc"),
)
def q_stream_upsert_sink(spark, sf_dir):
    """Two legs over the same keyed-state idea, one leg-tagged union.

    'upsert': keyed upsert sink via foreachBatch (reference in-memory
    upsert sink): final state = latest row per key, maintained as an
    executor-side versioned parquet state table (no driver-side state).

    'cdc' (r07): the CDC-apply tier driven end-to-end through the driver
    oracle. Events become a change feed (op from event_id: %10==0 → D,
    even → U, else I; seq = event_id), split into two batches with some
    batch-1 changes REDELIVERED in batch 2 (at-least-once). `apply_cdc`
    folds batch 1 into empty state with tombstones retained, then batch 2
    on top; the oracle replays the whole log once — the two-batch
    tombstoned fold must hash-match the one-shot replay, including keys
    whose final op is D staying deleted despite redelivered older I/U."""
    stream, _ = chunked_file_stream(spark, sf_dir, "events", "ts", n_chunks=5, files_per_trigger=2)
    final = upsert_by_key(
        stream.select("user_id", "event_id", "event_type", "value", "ts"),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
    )
    upsert = final.drop("ts").select(
        F.lit("upsert").alias("leg"), "user_id", "event_id", "event_type", "value"
    )

    from volga_spark.operators.cdc import apply_cdc, live_rows
    from volga_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    changes = ev.select(
        "user_id",
        F.col("event_id").alias("seq"),
        "event_type",
        "value",
        F.when(F.col("event_id") % 10 == 0, "D")
        .when(F.col("event_id") % 2 == 0, "U")
        .otherwise("I")
        .alias("op"),
    )
    c1 = changes.filter(F.col("seq") % 5 != 0)
    redelivered = c1.filter(F.col("seq") % 7 == 0)
    c2 = changes.filter(F.col("seq") % 5 == 0).unionByName(redelivered)
    empty_state = (
        changes.drop("op").limit(0).withColumn("__deleted", F.lit(False))
    )
    s1 = apply_cdc(empty_state, c1, ["user_id"], keep_tombstones=True)
    s2 = apply_cdc(s1, c2, ["user_id"], keep_tombstones=True)
    cdc = live_rows(s2).select(
        F.lit("cdc").alias("leg"),
        "user_id",
        F.col("seq").alias("event_id"),
        "event_type",
        "value",
    )
    return upsert.unionByName(cdc)


# NOT a registry entry: the driver's correctness gate caps at 50 rows
# (r04 registered 51 queries and this one silently got no row). The
# ROWS-frame streaming leg keeps full oracle coverage through
# tests/test_stream_rows_frame.py, which runs this exact function against
# STREAM_SLIDING_ROWS_ORACLE at sf0.001 — the same compare the driver runs.
STREAM_SLIDING_ROWS_ORACLE = """
    SELECT event_id, user_id, ts,
           count(*) OVER w AS cnt_50r,
           min(value) OVER w AS min_50r
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 50 PRECEDING AND CURRENT ROW)
"""


def q_stream_sliding_rows(spark, sf_dir):
    """ROWS-frame sliding aggregates computed statefully on the stream
    ((user_id, ts) pairs are unique in this corpus, so ts order is total).
    Uses the engine's retractable MinMaxAcc (O(log w) per op) rather than a
    list scan, so the same pattern holds at w=10k."""

    stream, _ = chunked_file_stream(
        spark, sf_dir, "events", "ts", n_chunks=5,
        key_col="user_id", id_col="event_id", flush=True, files_per_trigger=2,
    )
    out = sliding_window_stream(
        stream,
        key_cols="user_id",
        ts_col="ts",
        frame=rows_frame(50),
        specs=[
            SlidingSpec("cnt_50r", MinMaxAcc, ["value"], "bigint", finish=lambda a: a.n),
            SlidingSpec(
                "min_50r", MinMaxAcc, ["value"], "double",
                finish=lambda a: a.min(),
            ),
        ],
        passthrough=["event_id"],
        lateness="0 seconds",
    )
    res = run_available_now_to_memory(out, output_mode="append")
    return res.filter(F.col("event_id") != SENTINEL_ID).select(
        "event_id", "user_id", "ts", "cnt_50r", "min_50r"
    )


@workload(
    "q_stream_dedup",
    oracle="""
        SELECT 'dedup' AS leg,
               user_id || '|' || event_type AS k_str,
               CAST(NULL AS BIGINT) AS n
        FROM (SELECT DISTINCT user_id, event_type FROM events)
        UNION ALL
        SELECT 'enrich' AS leg, n_name AS k_str, count(*) AS n
        FROM events e
        JOIN customer c ON c.c_custkey = e.user_id
        JOIN nation nt ON nt.n_nationkey = c.c_nationkey
        GROUP BY n_name
    """,
    tags=("streaming", "dedup"),
)
def q_stream_dedup(spark, sf_dir):
    """Streaming ingest dedup + enrichment — the two stream-side stages of a
    training-data ingest pipeline, one leg-tagged union:

    - ``dedup``: stateful exact deduplication (`dropDuplicates` keyed state)
      over the 5-micro-batch event stream; each (user_id, event_type) key is
      emitted exactly once, on first arrival — at-least-once upstream
      delivery becomes exactly-once downstream. At 100 TB the same operator
      runs with `dropDuplicatesWithinWatermark` so state is evicted past the
      lateness horizon instead of growing with the corpus
      (tests/test_streaming_semantics.py covers the eviction semantics);
      this leg keeps full state so the result is exactly batch DISTINCT.
    - ``enrich``: stream-static join against the broadcast customer/nation
      dimensions (the reference stubs joins — Spark runs them natively in
      streaming), aggregated per nation in complete mode. The static side
      is broadcast, so the stream never shuffles for the join.
    """
    from pyspark.sql.functions import broadcast

    from volga_spark.tables import load_table

    stream, _ = chunked_file_stream(
        spark, sf_dir, "events", "ts", n_chunks=5, files_per_trigger=2
    )

    dedup = run_available_now_to_memory(
        stream.select("user_id", "event_type").dropDuplicates(
            ["user_id", "event_type"]
        ),
        output_mode="append",
    ).select(
        F.lit("dedup").alias("leg"),
        F.concat_ws("|", "user_id", "event_type").alias("k_str"),
        F.lit(None).cast("bigint").alias("n"),
    )

    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    enriched = (
        stream.join(broadcast(customer), stream.user_id == customer.c_custkey)
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n"))
    )
    enrich = run_available_now_to_memory(enriched, output_mode="complete").select(
        F.lit("enrich").alias("leg"),
        F.col("n_name").alias("k_str"),
        F.col("n"),
    )
    return dedup.unionByName(enrich)
