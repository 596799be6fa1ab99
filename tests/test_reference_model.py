"""Port of the reference's brute-force window reference-model test
(reference src/runtime/operators/window/window_operator_tests.rs:894-1012):
1 key, 3000 rows at 1ms spacing, values alternating 1.0/2.0, COUNT/SUM over
RANGE 2000ms PRECEDING, lateness 250ms → cnt(i) = min(i+1, 2001) exactly,
for both the batch sweep and the stateful streaming path."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from volga_spark.functions.sliding import SlidingSpec, apply_sliding_aggs
from volga_spark.operators.window import range_frame
from volga_spark.streaming.runner import run_available_now_to_memory
from volga_spark.streaming.stateful_window import sliding_window_stream

N = 3000
WINDOW_MS = 2000
BASE_S = 1_700_000_000


def _frame() -> pd.DataFrame:
    ts = pd.to_datetime(BASE_S * 1_000_000 + np.arange(N) * 1000, unit="us")
    return pd.DataFrame(
        {
            "event_id": np.arange(N, dtype=np.int64),
            "user_id": np.int64(1),
            "ts": ts.astype("datetime64[us]"),
            "value": np.where(np.arange(N) % 2 == 0, 1.0, 2.0),
        }
    )


def _expected_cnt(i: int) -> int:
    return min(i + 1, WINDOW_MS + 1)


def test_batch_sweep_matches_reference_model(spark):
    pdf = _frame()
    df = spark.createDataFrame(pdf)

    class _Cnt:
        def __init__(self):
            self.n = 0

        def add(self, v):
            self.n += 1

        def retract(self, v):
            self.n -= 1

    out = (
        apply_sliding_aggs(
            df,
            partition_by="user_id",
            order_by="ts",
            frame=range_frame("2000 milliseconds"),
            specs=[SlidingSpec("cnt", _Cnt, ["value"], "bigint", finish=lambda a: a.n)],
            passthrough=["event_id"],
        )
        .toPandas()
        .set_index("event_id")["cnt"]
        .sort_index()
    )
    assert len(out) == N
    for i in (0, 1, 100, 1999, 2000, 2001, 2500, N - 1):
        assert out[i] == _expected_cnt(i), i
    assert (out.values == [_expected_cnt(i) for i in range(N)]).all()


def test_tiled_stream_matches_reference_model(spark, tmp_path):
    """Same brute-force model through the TILED stateful handler (reference
    tiles.rs design): closed 100ms buckets collapse to partials + spill, the
    sweep merges tile interiors with raw edges — counts must stay exact."""
    from volga_spark.streaming.tiled_window import (
        TiledSpec,
        TiledTopSpec,
        tiled_sliding_window_stream,
    )

    pdf = _frame()
    src = str(tmp_path / "src_tiled")
    os.makedirs(src)
    chunks = [pdf.iloc[i : i + 500] for i in range(0, N, 500)]
    for j, delta_ms in ((1, 3_600_000), (2, 7_200_000)):
        srow = pdf.iloc[[-1]].copy()
        srow["event_id"] = -j
        srow["ts"] = (srow["ts"] + pd.Timedelta(milliseconds=delta_ms)).astype(
            "datetime64[us]"
        )
        chunks.append(srow)
    pa_schema = pa.Table.from_pandas(pdf, preserve_index=False).schema
    for i, c in enumerate(chunks):
        p = os.path.join(src, f"chunk_{i:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(c, preserve_index=False, schema=pa_schema), p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = tiled_sliding_window_stream(
        stream,
        key_cols="user_id",
        ts_col="ts",
        frame=range_frame("2000 milliseconds"),
        specs=[
            TiledSpec("cnt", "count", "value", "bigint"),
            # values alternate 1.0/2.0 → window-distinct is exactly
            # min(i+1, 2); pins count_distinct through the FULL Spark path
            # (state schema, round-trip, render), not just the core
            TiledTopSpec("cdv", "count_distinct", "value", out_type="bigint"),
        ],
        passthrough=["event_id"],
        lateness="250 milliseconds",
        granularity="100 milliseconds",
        spill_root=str(tmp_path / "rowstore"),
    )
    res = (
        run_available_now_to_memory(out, output_mode="append")
        .filter(F.col("event_id") >= 0)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    assert len(res) == N
    assert (res["cnt"].values == [_expected_cnt(i) for i in range(N)]).all()
    assert (res["cdv"].values == [min(i + 1, 2) for i in range(N)]).all()


@pytest.mark.parametrize("batch_rows", [1000, 250])
def test_stateful_stream_matches_reference_model(spark, tmp_path, batch_rows):
    class _Cnt:
        def __init__(self):
            self.n = 0

        def add(self, v):
            self.n += 1

        def retract(self, v):
            self.n -= 1

    pdf = _frame()
    src = str(tmp_path / f"src_{batch_rows}")
    os.makedirs(src)
    chunks = [pdf.iloc[i : i + batch_rows] for i in range(0, N, batch_rows)]
    # flush punctuation: two far-future rows for the single key
    for j, delta_ms in ((1, 3_600_000), (2, 7_200_000)):
        srow = pdf.iloc[[-1]].copy()
        srow["event_id"] = -j
        srow["ts"] = (srow["ts"] + pd.Timedelta(milliseconds=delta_ms)).astype(
            "datetime64[us]"
        )
        chunks.append(srow)
    pa_schema = pa.Table.from_pandas(pdf, preserve_index=False).schema
    for i, c in enumerate(chunks):
        p = os.path.join(src, f"chunk_{i:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(c, preserve_index=False, schema=pa_schema), p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sliding_window_stream(
        stream,
        key_cols="user_id",
        ts_col="ts",
        frame=range_frame("2000 milliseconds"),
        specs=[SlidingSpec("cnt", _Cnt, ["value"], "bigint", finish=lambda a: a.n)],
        passthrough=["event_id"],
        lateness="250 milliseconds",
    )
    res = (
        run_available_now_to_memory(out, output_mode="append")
        .filter(F.col("event_id") >= 0)
        .toPandas()
        .set_index("event_id")["cnt"]
        .sort_index()
    )
    assert len(res) == N  # every row emitted exactly once after flush
    assert (res.values == [_expected_cnt(i) for i in range(N)]).all()
