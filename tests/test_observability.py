"""Metrics layer (reference src/runtime/observability/metrics/mod.rs):
histogram math vs numpy, batch observe() counters riding the same action,
and the streaming listener folding real QueryProgress events."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from volga_spark.observability import (
    LATENCY_BUCKET_BOUNDARIES,
    METRIC_BACKPRESSURE_RATIO,
    METRIC_BATCHES,
    METRIC_LATENCY_99,
    METRIC_LATENCY_AVG,
    METRIC_RECORDS_RECV,
    METRIC_STORAGE_INMEM_BATCHES,
    LatencyHistogram,
    attached,
    observe_records,
)
from volga_spark.streaming.runner import run_available_now_to_memory
from volga_spark.streaming.sources import chunked_file_stream
from volga_spark.tables import load_table


def test_histogram_avg_exact_and_percentiles_bucket_bounded():
    h = LatencyHistogram()
    vals = [0.5, 3.0, 3.5, 7.0, 40.0, 40.0, 90.0, 600.0, 9999.0]
    for v in vals:
        h.record(v)
    assert h.total == len(vals)
    assert abs(h.avg - float(np.mean(vals))) < 1e-9  # avg is exact, not bucketed
    # each percentile lands inside the bucket containing the true value
    for q in (0.5, 0.95, 0.99):
        est = h.percentile(q)
        true = float(np.quantile(vals, q, method="inverted_cdf"))
        import bisect

        i = bisect.bisect_left(LATENCY_BUCKET_BOUNDARIES, min(true, 5000.0))
        lo = 0.0 if i == 0 else LATENCY_BUCKET_BOUNDARIES[i - 1]
        hi = LATENCY_BUCKET_BOUNDARIES[min(i, len(LATENCY_BUCKET_BOUNDARIES) - 1)]
        assert lo <= est <= hi, (q, est, true, lo, hi)
    # +Inf bucket clamps to the last finite boundary (Prometheus convention)
    assert h.percentile(1.0) == LATENCY_BUCKET_BOUNDARIES[-1]


def test_histogram_empty_and_single_bucket():
    h = LatencyHistogram()
    assert h.avg is None and h.percentile(0.99) is None
    for _ in range(100):
        h.record(30.0)  # (25, 50] bucket
    assert 25.0 <= h.percentile(0.5) <= 50.0
    assert h.avg == 30.0


def test_prometheus_text_export():
    from volga_spark.observability import to_prometheus_text

    snap = {"volga_stream_task_records_recv": 1200, "volga_stream_task_latency_99": None}
    txt = to_prometheus_text(snap, labels={"pipeline_id": "p1", "worker_id": "w0"})
    assert 'volga_stream_task_records_recv{pipeline_id="p1",worker_id="w0"} 1200' in txt
    assert "latency_99" not in txt  # None omitted
    assert txt.endswith("\n")


def test_observe_records_rides_the_action(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100.0)
    observed, obs = observe_records(
        df, "m", F.sum("o_totalprice").alias("sum_price")
    )
    n = observed.count()  # one action; metrics come from the SAME job
    got = obs.get
    assert got["records"] == n > 0
    expected = df.agg(F.sum("o_totalprice")).collect()[0][0]
    assert abs(got["sum_price"] - expected) < 1e-6


def test_streaming_listener_folds_progress(spark, sf_dir):
    src, _ = chunked_file_stream(
        spark, sf_dir, "events", ts_col="ts", n_chunks=3, files_per_trigger=1
    )
    total = load_table(spark, sf_dir, "events").count()
    agg = (
        src.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    with attached(spark) as m:
        res = run_available_now_to_memory(agg, output_mode="complete")
        assert m.wait_for_batches(3), "listener events not delivered"
        snap = m.snapshot()
    assert snap[METRIC_RECORDS_RECV] == total
    assert snap[METRIC_BATCHES] >= 3
    assert snap[METRIC_STORAGE_INMEM_BATCHES] > 0  # state rows from the agg
    assert snap[METRIC_LATENCY_99] is not None and snap[METRIC_LATENCY_AVG] > 0
    assert 0.0 <= snap[METRIC_BACKPRESSURE_RATIO] <= 1.0
    # and the result itself is still right
    assert res.count() == load_table(spark, sf_dir, "events").select(
        "user_id"
    ).distinct().count()


def test_listener_name_filter_excludes_other_queries(spark, sf_dir):
    src, _ = chunked_file_stream(
        spark, sf_dir, "events", ts_col="ts", n_chunks=2, files_per_trigger=1
    )
    agg = src.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    with attached(spark, names={"no_such_query"}) as m:
        run_available_now_to_memory(agg, output_mode="complete")
        import time

        time.sleep(1.0)  # give delivery a chance; nothing should fold in
        assert m.snapshot()[METRIC_RECORDS_RECV] == 0


def test_watermark_lag_parses_both_timestamp_shapes():
    """Spark emits event-time stamps with OR without fractional seconds
    depending on version; both shapes must produce a lag, never a silent
    stale None."""
    import json as _json
    from types import SimpleNamespace

    from volga_spark.observability import PipelineMetrics

    m = PipelineMetrics()
    for wm, mx, want_ms in [
        ("2026-01-01T00:00:00.000Z", "2026-01-01T00:00:01.500Z", 1500.0),
        ("2026-01-01T00:00:10Z", "2026-01-01T00:00:12Z", 2000.0),
        ("2026-01-01T00:00:10Z", "2026-01-01T00:00:10.250Z", 250.0),
    ]:
        p = {"numInputRows": 0, "durationMs": {},
             "eventTime": {"watermark": wm, "max": mx}}
        ev = SimpleNamespace(progress=SimpleNamespace(json=_json.dumps(p)))
        m.watermark_lag_ms = None
        m.onQueryProgress(ev)
        assert m.watermark_lag_ms == want_ms, (wm, mx)
