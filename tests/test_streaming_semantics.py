"""Streaming semantics tests beyond oracle equality: late-data drop and
watermark-driven emission (reference window_operator_tests.rs:519-593
late-data keep/drop cases)."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from volga_spark.functions.sliding import SlidingSpec
from volga_spark.operators.window import range_frame
from volga_spark.streaming.runner import run_available_now_to_memory
from volga_spark.streaming.stateful_window import sliding_window_stream


def _write(path, rows, i):
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s").astype("datetime64[us]")
    p = os.path.join(path, f"chunk_{i:04d}.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
    os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))


@pytest.fixture()
def late_stream_dir(tmp_path):
    d = str(tmp_path / "late")
    os.makedirs(d)
    base = 1_700_000_000
    # batch 0: rows at t=0..2min; batch 1 advances watermark to ~1h and
    # carries one LATE row (t=+30s, far behind wm - lateness) plus sentinels.
    _write(d, [(1, 1, base, 1.0), (2, 1, base + 60, 1.0), (3, 1, base + 120, 1.0)], 0)
    _write(d, [(4, 1, base + 3600, 1.0), (90, 1, base + 30, 9.0)], 1)
    _write(d, [(-1, 1, base + 7200, 0.0)], 2)
    _write(d, [(-1, 1, base + 10800, 0.0)], 3)
    return d


def test_late_row_dropped_and_emission_watermark_driven(spark, late_stream_dir):
    class _Cnt:  # local class → cloudpickle serializes it by value
        def __init__(self):
            self.n = 0

        def add(self, v):
            self.n += 1

        def retract(self, v):
            self.n -= 1

    schema = "event_id bigint, user_id bigint, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(late_stream_dir)
    )
    out = sliding_window_stream(
        stream,
        key_cols="user_id",
        ts_col="ts",
        frame=range_frame("1 hour"),
        specs=[SlidingSpec("cnt", _Cnt, ["value"], "bigint", finish=lambda a: a.n)],
        passthrough=["event_id"],
        lateness="0 seconds",
    )
    res = run_available_now_to_memory(out, output_mode="append").toPandas()
    real = res[res.event_id > 0].sort_values("event_id")
    # late row 90 (ts far behind the emitted cursor) must be dropped
    assert 90 not in set(real.event_id)
    # rows 1..3 all in the 1h frame; row 4 one hour later sees rows 2..4
    assert real[real.event_id == 1].cnt.iloc[0] == 1
    assert real[real.event_id == 2].cnt.iloc[0] == 2
    assert real[real.event_id == 3].cnt.iloc[0] == 3
    assert real[real.event_id == 4].cnt.iloc[0] == 4  # frame [base, +3600] inclusive


def test_rate_source_datagen(spark):
    """Datagen stand-in (reference DatagenSourceConfig): rate source emits
    monotonically increasing (timestamp, value) rows."""
    from volga_spark.streaming.sources import rate_stream

    stream = rate_stream(spark, rows_per_second=500)
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("append")
        .start()
    )
    try:
        import time

        deadline = time.time() + 20
        n = 0
        while time.time() < deadline:
            n = spark.table("rate_smoke").count()
            if n > 0:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert n > 0
    row = spark.table("rate_smoke").orderBy("value").first()
    assert row.value >= 0 and row.timestamp is not None


def test_feature_service_lookup(spark, sf_dir):
    from pyspark.sql import functions as F

    from volga_spark.operators.request import REQ_FLAG, FeatureService, masked
    from volga_spark.operators.window import range_frame
    from volga_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    svc = FeatureService(
        ev.select("user_id", "ts", "value"),
        key_cols="user_id",
        ts_col="ts",
        frame=range_frame("1 hour"),
        agg_builder=lambda w: {"cnt_1h": F.count(masked("value")).over(w)},
    )
    anchor = ev.orderBy("event_id").first()
    feats = svc.get_features(spark, [(1, anchor.user_id, anchor.ts)])
    assert len(feats) == 1
    assert feats[0]["cnt_1h"] >= 1  # at least the anchor event in its window


def test_datagen_string_and_processing_ts_generators(spark):
    """The two remaining reference field generators: String (deterministic
    md5-derived, bit-identical in DuckDB) and ProcessingTimestamp
    (wall-clock; declared non-oracle-able)."""
    import duckdb
    import pytest as _pytest

    from volga_spark.sources.datagen import DatagenSpec, FieldSpec, duck_generate_sql, generate

    spec = DatagenSpec(
        n_rows=20,
        fields=[
            FieldSpec("rid", "increment"),
            FieldSpec("s", "string", seed=7, length=10),
        ],
    )
    got = {r.rid: r.s for r in generate(spark, spec).collect()}
    duck = duckdb.connect().execute(
        f"SELECT rid, s FROM {duck_generate_sql(spec)}"
    ).fetchall()
    assert got == dict(duck) and len(got) == 20
    assert all(len(v) == 10 for v in got.values())

    pspec = DatagenSpec(
        n_rows=3,
        fields=[FieldSpec("rid", "increment"), FieldSpec("pt", "processing_timestamp")],
    )
    rows = generate(spark, pspec).collect()
    assert all(r.pt is not None for r in rows)
    with _pytest.raises(ValueError, match="not oracle-able"):
        duck_generate_sql(pspec)


@pytest.fixture()
def dup_stream_dir(tmp_path):
    """Duplicate key 'k1' arrives three times: twice inside the watermark
    horizon (batch 0, batch 1 at +10min) and once far beyond it (batch 2 at
    +3h, after the watermark passed first-arrival ts + delay)."""
    d = str(tmp_path / "dups")
    os.makedirs(d)
    base = 1_700_000_000
    _write(d, [(1, 1, base, 1.0), (2, 2, base + 5, 1.0)], 0)
    # watermark (30min delay) after batch 0 ≈ base+5-30min; this dup is kept
    # in-state and dropped
    _write(d, [(3, 1, base + 600, 1.0)], 1)
    # +3h advances the watermark far past key-1's expiry (first ts + 30min);
    # eviction applies at the END of the batch that advances the watermark,
    # so the re-arrival goes one batch later
    _write(d, [(4, 3, base + 10800, 1.0)], 2)
    _write(d, [(5, 4, base + 10830, 1.0)], 3)
    # key-1 state evicted by now — this re-arrival is NEW to the operator
    _write(d, [(6, 1, base + 10860, 1.0)], 4)
    return d


def test_drop_duplicates_within_watermark_evicts_state(spark, dup_stream_dir):
    """dropDuplicatesWithinWatermark: duplicates inside the horizon dedupe,
    re-arrivals after state eviction re-emit — the bounded-state trade the
    100 TB ingest path makes (vs exact dropDuplicates whose state grows with
    the key space)."""
    schema = "event_id bigint, user_id bigint, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dup_stream_dir)
    )
    out = (
        stream.withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["user_id"])
    )
    res = run_available_now_to_memory(out, output_mode="append").toPandas()
    emitted = sorted(res.event_id.tolist())
    # event 3 (user 1 again, inside horizon) deduped; event 6 (user 1 after
    # eviction) re-emitted
    assert 3 not in emitted
    assert {1, 2, 4, 5, 6} <= set(emitted)
