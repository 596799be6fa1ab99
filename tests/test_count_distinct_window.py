"""Exact COUNT(DISTINCT) over sliding windows — batch vs DuckDB, and the
streaming tiled core's count_distinct vs the batch result (the batch/stream
twin relationship the engine maintains for every window aggregate)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from volga_spark.operators.window import count_distinct_over, event_window, range_frame
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table


def test_batch_count_distinct_matches_duckdb(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = event_window("user_id", "ts", range_frame("1 hour"))
    got = ev.select(
        "event_id",
        count_distinct_over("event_type", w).alias("cd_types"),
        count_distinct_over("value", w).alias("cd_values"),
    ).toPandas()
    oracle = run_oracle(
        """
        SELECT event_id,
               count(DISTINCT event_type) OVER w AS cd_types,
               count(DISTINCT value) OVER w AS cd_values
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        """,
        sf_dir,
    )
    assert len(got) > 0
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(problems)


def test_streaming_tiled_count_distinct_matches_batch(spark, sf_dir, tmp_path):
    """The tiled streaming core's count_distinct over the same events window
    equals the batch expression row-for-row (exactness across tiles, spill
    edges, and retraction)."""
    from volga_spark.streaming.tiled_window import TS, TiledTopSpec, _GroupCore

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias(TS),
            "event_type",
        )
        .orderBy(TS, "event_id")
        .toPandas()
    )
    hour_us = 3_600_000_000
    core = _GroupCore(
        keys=["user_id"],
        inputs=[],
        out_pass=["event_id"],
        length_us=hour_us,
        gran_us=hour_us // 16,
        specs=[],
        spill_path=str(tmp_path / "cd_spill"),
        top_specs=[
            TiledTopSpec("cd_types", "count_distinct", "event_type", out_type="bigint")
        ],
    )
    st = core.empty_state()
    outs = []
    wm = -(10**15)
    n = len(ev)
    for i in range(0, n, 400):
        chunk = ev.iloc[i : i + 400]
        out, st = core.advance(st, chunk, wm)
        st = core.load(core.dump(st))
        if out is not None:
            outs.append(out)
        wm = int(chunk[TS].max())
    out, st = core.advance(st, ev.iloc[:0], 10**18)
    if out is not None:
        outs.append(out)
    stream = pd.concat(outs, ignore_index=True)
    assert len(stream) == n  # exactly-once emission

    w = event_window("user_id", "ts", range_frame("1 hour"))
    batch = (
        load_table(spark, sf_dir, "events")
        .select("event_id", count_distinct_over("event_type", w).alias("cd_types"))
        .toPandas()
    )
    merged = batch.merge(stream[["event_id", "cd_types"]], on="event_id",
                         suffixes=("_b", "_s"))
    assert len(merged) == n
    assert (
        merged["cd_types_b"].to_numpy() == merged["cd_types_s"].to_numpy()
    ).all()
