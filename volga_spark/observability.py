"""Observability: the reference's metrics subsystem mapped onto Spark.

The reference ships a first-class metrics layer (reference
src/runtime/observability/metrics/mod.rs, re-exported via
src/runtime/metrics.rs): per-stream-task and per-operator counters
(records/messages/bytes sent+received), latency histograms with fixed
bucket boundaries and 50/95/99 percentile gauges, backpressure ratios,
and storage gauges (in-memory batches/bytes, dump/compaction counters).
Workers push these to Prometheus; the labels are
(pipeline_id, worker_id, vertex_id/operator_id).

Spark already *has* the transport/task tier of that telemetry (Spark UI,
task metrics, SQL metrics) — rebuilding it would be architecture-porting.
What a user of the reference actually loses when switching is the
*query-level* feed: a programmatic stream of records-in/records-out,
per-batch latency percentiles, state-store size, and watermark lag for a
running pipeline. This module restores exactly that tier with the two
idiomatic Spark hooks:

- batch: ``pyspark.sql.Observation`` / ``DataFrame.observe`` — named
  aggregates that ride the SAME action (no extra job, no extra scan),
  Spark's intended replacement for accumulator-style row counting.
- streaming: ``StreamingQueryListener`` — per-micro-batch
  ``QueryProgressEvent`` carrying numInputRows, durationMs, state-operator
  rows/bytes, and the event-time watermark; folded here into cumulative
  counters + a reference-shaped latency histogram.

Metric names and the latency bucket boundaries mirror the reference so a
dashboard keyed to its names can point at a :meth:`PipelineMetrics.snapshot`
export unchanged. Mapping (reference metric -> Spark source):

====================================  =======================================
volga_stream_task_records_recv        progress.numInputRows (cumulative)
volga_stream_task_records_sent        progress.sink.numOutputRows (cumulative)
volga_stream_task_latency_{50,95,99}  histogram over batch triggerExecution ms
volga_stream_task_latency_avg         exact mean over batch triggerExecution
volga_stream_task_backpressure_ratio  busy fraction: triggerExecution /
                                      wall-clock between progress events (a
                                      micro-batch engine has no tx-queue; a
                                      ratio ~1.0 means the trigger can't keep
                                      up = the same signal the reference's
                                      queue-full ratio carries)
volga_storage_inmem_bytes             sum(stateOperators[].memoryUsedBytes)
volga_storage_inmem_batches           sum(stateOperators[].numRowsTotal)
                                      (state ROWS — Spark state stores row
                                      granularity, not arrow batches)
====================================  =======================================

Latency semantics differ honestly: the reference times per-record path
latency through the channel; a micro-batch engine's unit of latency is the
batch, so the histogram here is over per-batch processing time. Same
boundaries, same percentile math, different (documented) unit.

At 100 TB scale nothing here touches the data path: observe() aggregates
ride existing jobs JVM-side; the listener consumes driver-side progress
events only. Zero extra shuffles, zero extra scans.
"""

from __future__ import annotations

import bisect
import json
import threading
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

# Reference LATENCY_BUCKET_BOUNDARIES (observability/metrics/mod.rs:85) — ms.
LATENCY_BUCKET_BOUNDARIES = [
    1.0, 2.0, 5.0, 10.0, 25.0, 50.0, 100.0, 250.0, 500.0, 1000.0, 2500.0, 5000.0,
]

# Reference metric names (observability/metrics/mod.rs:24-76 subset that has
# a Spark-side source; the transport-tier names — messages/bytes/queue —
# belong to the layer Spark replaces and are deliberately absent).
METRIC_RECORDS_RECV = "volga_stream_task_records_recv"
METRIC_RECORDS_SENT = "volga_stream_task_records_sent"
METRIC_LATENCY_50 = "volga_stream_task_latency_50"
METRIC_LATENCY_95 = "volga_stream_task_latency_95"
METRIC_LATENCY_99 = "volga_stream_task_latency_99"
METRIC_LATENCY_AVG = "volga_stream_task_latency_avg"
METRIC_BACKPRESSURE_RATIO = "volga_stream_task_backpressure_ratio"
METRIC_STORAGE_INMEM_BYTES = "volga_storage_inmem_bytes"
METRIC_STORAGE_INMEM_BATCHES = "volga_storage_inmem_batches"
METRIC_WATERMARK_LAG_MS = "volga_stream_task_watermark_lag_ms"  # extension
METRIC_BATCHES = "volga_stream_task_batches"  # extension: histogram count


class LatencyHistogram:
    """Fixed-boundary histogram with the reference's bucket layout.

    Percentiles interpolate linearly inside the winning bucket (the standard
    Prometheus ``histogram_quantile`` rule the reference's gauges are computed
    with); the average is exact (running sum/count, not bucket midpoints).
    """

    def __init__(self, boundaries: list[float] | None = None) -> None:
        self.boundaries = list(boundaries or LATENCY_BUCKET_BOUNDARIES)
        # counts[i] = observations <= boundaries[i]; counts[-1] = +Inf bucket
        self.counts = [0] * (len(self.boundaries) + 1)
        self.total = 0
        self.sum = 0.0

    def record(self, value: float) -> None:
        self.counts[bisect.bisect_left(self.boundaries, value)] += 1
        self.total += 1
        self.sum += value

    @property
    def avg(self) -> float | None:
        return self.sum / self.total if self.total else None

    def percentile(self, q: float) -> float | None:
        """histogram_quantile(q): rank within cumulative bucket counts, linear
        within the bucket, lower bound 0, upper bound = last finite boundary
        (Prometheus convention for the +Inf bucket)."""
        if not self.total:
            return None
        rank = q * self.total
        cum = 0
        for i, c in enumerate(self.counts):
            prev_cum = cum
            cum += c
            if cum >= rank:
                if i == len(self.boundaries):  # +Inf bucket
                    return self.boundaries[-1]
                lo = 0.0 if i == 0 else self.boundaries[i - 1]
                hi = self.boundaries[i]
                if c == 0:
                    return hi
                return lo + (hi - lo) * ((rank - prev_cum) / c)
        return self.boundaries[-1]


class PipelineMetrics(StreamingQueryListener):
    """Cumulative query-level metrics for one or more streaming queries.

    Register with ``spark.streams.addListener(m)`` (or the :func:`attached`
    context manager); read :meth:`snapshot` any time. Listener events arrive
    asynchronously on a driver thread — :meth:`wait_for_batches` blocks until
    at least ``n`` progress events have folded in, which tests need after
    ``query.awaitTermination`` returns.

    ``query_names`` (optional) filters which queries fold in; by default every
    query on the session is counted (the reference's worker-level rollup).
    """

    def __init__(self, query_names: set[str] | None = None) -> None:
        self.query_names = set(query_names) if query_names else None
        self.latency = LatencyHistogram()
        self.records_recv = 0
        self.records_sent = 0
        self.state_rows = 0
        self.state_bytes = 0
        self.watermark_lag_ms: float | None = None
        self.backpressure = 0.0
        self._last_wall: float | None = None
        self._lock = threading.Lock()

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        # progress.json is the stable cross-version surface (the typed
        # accessors moved between 3.x and 4.x); parse once per batch.
        p = json.loads(event.progress.json)
        if self.query_names is not None and p.get("name") not in self.query_names:
            return
        with self._lock:
            self.records_recv += int(p.get("numInputRows") or 0)
            sink = p.get("sink") or {}
            out = sink.get("numOutputRows")
            if out is not None and int(out) >= 0:  # -1 = sink doesn't report
                self.records_sent += int(out)
            dur = p.get("durationMs") or {}
            trigger_ms = float(dur.get("triggerExecution") or 0.0)
            self.latency.record(trigger_ms)
            now = time.monotonic()
            if self._last_wall is not None:
                wall_ms = max((now - self._last_wall) * 1000.0, trigger_ms, 1e-9)
                self.backpressure = trigger_ms / wall_ms
            self._last_wall = now
            rows = bytes_ = 0
            for op in p.get("stateOperators") or []:
                rows += int(op.get("numRowsTotal") or 0)
                bytes_ += int(op.get("memoryUsedBytes") or 0)
            # gauges: latest batch wins (reference gauges behave the same)
            if p.get("stateOperators"):
                self.state_rows, self.state_bytes = rows, bytes_
            et = p.get("eventTime") or {}
            wm, mx = et.get("watermark"), et.get("max")
            if wm and mx:
                try:
                    from datetime import datetime

                    # Spark emits these with or without fractional seconds
                    # depending on version; fromisoformat (after stripping
                    # the Z) accepts both, so lag never silently goes stale.
                    def _parse(s: str) -> datetime:
                        return datetime.fromisoformat(s.rstrip("Z"))

                    lag = _parse(mx) - _parse(wm)
                    self.watermark_lag_ms = lag.total_seconds() * 1000.0
                except ValueError:
                    pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- read side ---------------------------------------------------------
    def wait_for_batches(self, n: int, timeout_s: float = 30.0) -> bool:
        """Block until ≥n progress events have folded in (listener delivery is
        async w.r.t. query termination). True if reached, False on timeout."""
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            with self._lock:
                if self.latency.total >= n:
                    return True
            time.sleep(0.05)
        return self.latency.total >= n

    def snapshot(self) -> dict:
        """Reference-named metric dict (the Prometheus-export shape)."""
        with self._lock:
            return {
                METRIC_RECORDS_RECV: self.records_recv,
                METRIC_RECORDS_SENT: self.records_sent,
                METRIC_LATENCY_50: self.latency.percentile(0.50),
                METRIC_LATENCY_95: self.latency.percentile(0.95),
                METRIC_LATENCY_99: self.latency.percentile(0.99),
                METRIC_LATENCY_AVG: self.latency.avg,
                METRIC_BACKPRESSURE_RATIO: self.backpressure,
                METRIC_STORAGE_INMEM_BYTES: self.state_bytes,
                METRIC_STORAGE_INMEM_BATCHES: self.state_rows,
                METRIC_WATERMARK_LAG_MS: self.watermark_lag_ms,
                METRIC_BATCHES: self.latency.total,
            }


class attached:
    """``with attached(spark, names={...}) as m: ... m.snapshot()`` — listener
    lifecycle scoped to the block (removeListener on exit, so test sessions
    don't accumulate dead listeners)."""

    def __init__(self, spark: SparkSession, names: set[str] | None = None) -> None:
        self.spark = spark
        self.metrics = PipelineMetrics(names)

    def __enter__(self) -> PipelineMetrics:
        self.spark.streams.addListener(self.metrics)
        return self.metrics

    def __exit__(self, *exc) -> None:
        self.spark.streams.removeListener(self.metrics)


def to_prometheus_text(
    snapshot: dict, labels: dict[str, str] | None = None
) -> str:
    """Render a :meth:`PipelineMetrics.snapshot` in the Prometheus text
    exposition format the reference's exporter speaks (observability/metrics
    pushes gauges/counters under these same names). Labels follow the
    reference's label set (pipeline_id / worker_id / vertex_id); None-valued
    metrics (no data yet) are omitted, as an exporter would."""
    lbl = ""
    if labels:
        inner = ",".join(f'{k}="{v}"' for k, v in sorted(labels.items()))
        lbl = "{" + inner + "}"
    lines = []
    for name, value in snapshot.items():
        if value is None:
            continue
        lines.append(f"{name}{lbl} {float(value):g}")
    return "\n".join(lines) + "\n"


def observe_records(
    df: DataFrame, name: str = "volga_metrics", *extra: "F.Column"
) -> tuple[DataFrame, Observation]:
    """Batch-side records_sent counter riding the SAME action.

    Returns (df', observation); after any action on df', ``observation.get``
    holds ``{"records": n, ...extras}``. This is the batch analog of the
    reference's per-operator record counters: zero extra jobs, zero extra
    scans — the aggregate is evaluated inside the existing plan (Spark's
    CollectMetrics node), unlike a separate ``df.count()`` which would rescan.
    """
    obs = Observation(name)
    cols = [F.count(F.lit(1)).alias("records"), *extra]
    return df.observe(obs, *cols), obs
