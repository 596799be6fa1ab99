"""Fault tolerance: a stateful sliding-window stream killed mid-stream and
restarted from its checkpoint produces exactly the batch-equivalent output
(reference checkpoint_tests — kill+recovery with sink oracle,
src/runtime/tests/checkpoint_tests/)."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from volga_spark.functions.sliding import SlidingSpec
from volga_spark.operators.window import range_frame
from volga_spark.streaming.stateful_window import sliding_window_stream


def _write_chunk(d, rows, i):
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s").astype("datetime64[us]")
    p = os.path.join(d, f"chunk_{i:04d}.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
    os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))


def test_stateful_stream_recovers_from_checkpoint(spark, tmp_path):
    class _Sum:
        def __init__(self):
            self.s = 0

        def add(self, v):
            self.s += int(round(v * 100))

        def retract(self, v):
            self.s -= int(round(v * 100))

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    outp = str(tmp_path / "out")
    os.makedirs(src)
    base = 1_700_000_000

    def run():
        schema = "event_id bigint, user_id bigint, ts timestamp, value double"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = sliding_window_stream(
            stream,
            key_cols="user_id",
            ts_col="ts",
            frame=range_frame("10 minutes"),
            specs=[
                SlidingSpec("sum_c", _Sum, ["value"], "double", finish=lambda a: a.s / 100.0)
            ],
            passthrough=["event_id"],
            lateness="0 seconds",
        )
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", outp)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if q.isActive:
            q.stop()

    # phase 1: two batches, then the query terminates (simulated kill: the
    # remaining data arrives while the query is down)
    _write_chunk(src, [(1, 1, base + 0, 1.0), (2, 1, base + 60, 2.0)], 0)
    _write_chunk(src, [(3, 1, base + 120, 3.0), (4, 2, base + 120, 4.0)], 1)
    run()

    # phase 2: more data incl. rows whose window spans the restart boundary,
    # plus flush punctuation; restart from the same checkpoint
    _write_chunk(src, [(5, 1, base + 180, 5.0), (6, 2, base + 240, 6.0)], 2)
    _write_chunk(src, [(-1, 1, base + 3600, 0.0), (-2, 2, base + 3600, 0.0)], 3)
    _write_chunk(src, [(-3, 1, base + 7200, 0.0), (-4, 2, base + 7200, 0.0)], 4)
    run()

    res = (
        spark.read.parquet(outp)
        .filter(F.col("event_id") > 0)
        .select("event_id", "sum_c")
        .toPandas()
        .set_index("event_id")["sum_c"]
        .sort_index()
    )
    # batch-equivalent expectation: 10-minute trailing sums per user
    expected = {1: 1.0, 2: 3.0, 3: 6.0, 4: 4.0, 5: 11.0, 6: 10.0}
    assert res.to_dict() == expected
    # no duplicates across the restart (exactly-once sink semantics)
    assert res.index.is_unique


def test_tiled_stream_recovers_from_checkpoint(spark, tmp_path):
    """Same kill+restart drill through the TILED handler: the state column
    (tile partials + head + cursors) rides Spark's checkpoint, the spilled
    row store persists on disk across the restart, and windows spanning the
    restart boundary must retract spilled rows exactly once. Granularity is
    set well below the window so interior tiles + spill are actually in play
    before the kill."""
    from volga_spark.streaming.tiled_window import (
        TiledCateSpec,
        TiledSpec,
        tiled_sliding_window_stream,
    )

    src = str(tmp_path / "src_t")
    ckpt = str(tmp_path / "ckpt_t")
    outp = str(tmp_path / "out_t")
    spill = str(tmp_path / "rowstore_t")
    os.makedirs(src)
    base = 1_700_000_000

    def run():
        schema = "event_id bigint, user_id bigint, ts timestamp, value double"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = tiled_sliding_window_stream(
            stream,
            key_cols="user_id",
            ts_col="ts",
            frame=range_frame("10 minutes"),
            specs=[
                TiledSpec("cnt", "count", "vc", "bigint"),
                TiledSpec("sum_c", "sum", "vc", "double", finish=lambda s: s / 100.0),
                TiledCateSpec("sc", "sum", "vc", "cat", scale=100.0),
            ],
            passthrough=["event_id"],
            lateness="0 seconds",
            granularity="1 minute",
            spill_root=spill,
            prepared={
                "vc": (F.round(F.col("value") * 100)).cast("long"),
                "cat": F.when(F.col("value") < 3.5, "lo").otherwise("hi"),
            },
        )
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", outp)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if q.isActive:
            q.stop()

    _write_chunk(src, [(1, 1, base + 0, 1.0), (2, 1, base + 60, 2.0)], 0)
    _write_chunk(src, [(3, 1, base + 120, 3.0), (4, 2, base + 120, 4.0)], 1)
    run()
    _write_chunk(src, [(5, 1, base + 180, 5.0), (6, 2, base + 240, 6.0)], 2)
    _write_chunk(src, [(-1, 1, base + 3600, 0.0), (-2, 2, base + 3600, 0.0)], 3)
    _write_chunk(src, [(-3, 1, base + 7200, 0.0), (-4, 2, base + 7200, 0.0)], 4)
    run()

    res = (
        spark.read.parquet(outp)
        .filter(F.col("event_id") > 0)
        .select("event_id", "cnt", "sum_c", "sc")
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    assert res["sum_c"].to_dict() == {1: 1.0, 2: 3.0, 3: 6.0, 4: 4.0, 5: 11.0, 6: 10.0}
    assert res["cnt"].to_dict() == {1: 1, 2: 2, 3: 3, 4: 1, 5: 4, 6: 2}
    assert res.loc[5, "sc"] == "hi:5,lo:6"  # 5.0 is hi; 2.0+3.0+1.0? window=[t-10m]
    assert res.index.is_unique


def _tiled_restart_drill(spark, tmp_path, tag, spill_root_phase1, spill_root_phase2):
    """Two-phase kill+restart through the tiled handler with per-phase
    spill_root control; returns (phase2_exception_or_None, output_path)."""
    from volga_spark.streaming.tiled_window import (
        TiledSpec,
        tiled_sliding_window_stream,
    )

    src = str(tmp_path / f"src_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    outp = str(tmp_path / f"out_{tag}")
    os.makedirs(src)
    base = 1_700_000_000

    def run(spill_root):
        schema = "event_id bigint, user_id bigint, ts timestamp, value double"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = tiled_sliding_window_stream(
            stream,
            key_cols="user_id",
            ts_col="ts",
            frame=range_frame("10 minutes"),
            specs=[
                TiledSpec("cnt", "count", "vc", "bigint"),
                TiledSpec("sum_c", "sum", "vc", "double", finish=lambda s: s / 100.0),
            ],
            passthrough=["event_id"],
            lateness="0 seconds",
            granularity="1 minute",
            spill_root=spill_root,
            prepared={"vc": (F.round(F.col("value") * 100)).cast("long")},
        )
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", outp)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if q.isActive:
            q.stop()

    _write_chunk(src, [(1, 1, base + 0, 1.0), (2, 1, base + 60, 2.0)], 0)
    _write_chunk(src, [(3, 1, base + 120, 3.0), (4, 2, base + 120, 4.0)], 1)
    run(spill_root_phase1)
    # event 7's window start (base+30) lands INSIDE bucket [base, base+60),
    # which closed (tile + spill) during phase 1 — its emission after the
    # restart forces an edge read from the phase-1 spill tier
    _write_chunk(
        src,
        [(5, 1, base + 180, 5.0), (6, 2, base + 240, 6.0), (7, 1, base + 630, 7.0)],
        2,
    )
    _write_chunk(src, [(-1, 1, base + 3600, 0.0), (-2, 2, base + 3600, 0.0)], 3)
    _write_chunk(src, [(-3, 1, base + 7200, 0.0), (-4, 2, base + 7200, 0.0)], 4)
    err = None
    try:
        run(spill_root_phase2)
    except Exception as e:  # StreamingQueryException wrapping the guard
        err = e
    return err, outp


def test_tiled_default_spill_root_survives_restart(spark, tmp_path):
    """With NO spill_root given, the default derives from the stable
    streaming query id, so a restart from the same checkpoint finds the
    same row store and windows spanning the restart stay exact (the round-4
    default was a per-plan uuid — a restart silently lost spilled rows)."""
    err, outp = _tiled_restart_drill(spark, tmp_path, "dflt", None, None)
    assert err is None
    res = (
        spark.read.parquet(outp)
        .filter(F.col("event_id") > 0)
        .select("event_id", "cnt", "sum_c")
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    assert res["sum_c"].to_dict() == {
        1: 1.0, 2: 3.0, 3: 6.0, 4: 4.0, 5: 11.0, 6: 10.0, 7: 17.0,
    }
    assert res["cnt"].to_dict() == {1: 1, 2: 2, 3: 3, 4: 1, 5: 4, 6: 2, 7: 4}
    assert res.index.is_unique


def test_tiled_restart_with_wrong_spill_root_fails_loudly(spark, tmp_path):
    """Restarting against an empty/mismatched spill_root must RAISE (the
    checkpointed tile map knows which closed buckets need spilled rows),
    never silently compute edge windows without them."""
    err, _ = _tiled_restart_drill(
        spark,
        tmp_path,
        "wrong",
        str(tmp_path / "rowstore_a"),
        str(tmp_path / "rowstore_b"),  # fresh, empty store after the kill
    )
    assert err is not None
    assert "spill" in str(err).lower()
