"""transformWithStateInPandas backend for the tiled window.

The tile codec (``_GroupCore`` tile dict ↔ MapState value row) is pure
Python and tested here directly. The full TWS integration (bit-equality
against the applyInPandasWithState backend) needs Spark's TWS state
server, which requires ``google.protobuf`` — absent from this image, so
that test is skip-gated and runs wherever protobuf exists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from volga_spark.streaming.tiled_window import (
    TS,
    TiledCateSpec,
    TiledRatioSpec,
    TiledSpec,
    TiledTopSpec,
    _GroupCore,
)
from volga_spark.streaming.tws_window import (
    _decode_tile,
    _encode_tile,
    _tile_value_fields,
    tws_available,
)


def _full_core(tmp_path):
    return _GroupCore(
        keys=["user_id"],
        inputs=["v", "w"],
        out_pass=["rid"],
        length_us=500_000,
        gran_us=50_000,
        specs=[
            TiledSpec("cnt", "count", "v", "bigint"),
            TiledSpec("s", "sum", "v", "bigint"),
            TiledSpec("mw", "max", "w", "double"),
        ],
        spill_path=str(tmp_path / "spill"),
        cate_specs=[
            TiledCateSpec("sc", "sum", "v", "cat", scale=100.0),
            TiledCateSpec(
                "tk", "sum", "v", "cat", cond_col="cond", order="key", k=2
            ),
        ],
        top_specs=[TiledTopSpec("tf", "topn_frequency", "cat", k=2)],
        ratio_specs=[TiledRatioSpec("tr", "value", 2, "v", "cond", "cat")],
        int_inputs={"v"},
    )


def _drive_tiles(core):
    rng = np.random.default_rng(9)
    n = 2_000
    rows = pd.DataFrame(
        {
            "user_id": rng.integers(0, 7, size=n).astype(np.int64),
            TS: np.sort(rng.integers(0, 2_000_000, size=n)).astype(np.int64),
            "v": rng.integers(-10, 10, size=n).astype(np.int64),
            "w": rng.random(n) * 10,
            "cat": rng.choice(["a", "b", "c"], size=n),
            "cond": rng.random(n) > 0.5,
            "rid": np.arange(n, dtype=np.int64),
        }
    )
    st = core.empty_state()
    _, st = core.advance(st, rows, -(10**12))
    _, st = core.advance(st, rows.iloc[:0], 1_500_000)
    return st


def test_tile_codec_round_trips_every_family(tmp_path):
    core = _full_core(tmp_path)
    st = _drive_tiles(core)
    assert st["tiles"], "drive produced no tiles"
    n_fields = len(_tile_value_fields(core, {
        "user_id": "bigint", "v": "bigint", "w": "double",
        "cat": "string", "cond": "boolean",
    }).split(", "))
    for key, tile in st["tiles"].items():
        row = _encode_tile(core, tile)
        assert len(row) == n_fields, key
        back = _decode_tile(core, row)
        assert back["sc"] == [tuple(c) for c in tile["sc"]], key
        assert back["cate"] == [
            {c: tuple(v) for c, v in m.items()} for m in tile["cate"]
        ], key
        assert back["top"] == tile["top"], key
        assert back["ratio"] == [
            {c: tuple(v) for c, v in m.items()} for m in tile["ratio"]
        ], key


def test_codec_handles_all_null_bucket_partials(tmp_path):
    core = _full_core(tmp_path)
    tile = {
        "sc": [(0, 0, 0.0, None, None), (3, 7, 5.0, 1, 4)],
        "cate": [{}, {"a": (1, 2, 2, 2)}],
        "top": [__import__("collections").Counter({"a": 2})],
        "ratio": [{"b": (3, 1)}],
    }
    back = _decode_tile(core, _encode_tile(core, tile))
    assert back["sc"][0] == (0, 0, 0.0, None, None)
    assert back["sc"][1] == (3, 7, 5.0, 1, 4)
    assert back["cate"][1]["a"] == (1, 2, 2, 2)


@pytest.mark.skipif(
    not tws_available(),
    reason="transformWithStateInPandas needs google.protobuf "
    "(absent from this image; no pip — environment-blocked)",
)
def test_tws_backend_bit_equal_to_apply_backend(spark, sf_dir):
    from contextlib import contextmanager

    from pyspark.sql import functions as F

    from volga_spark.operators.window import cents, range_frame
    from volga_spark.streaming.runner import run_available_now_to_memory
    from volga_spark.streaming.sources import SENTINEL_ID, chunked_file_stream
    from volga_spark.streaming.tiled_window import tiled_sliding_window_stream
    from volga_spark.streaming.tws_window import tiled_sliding_window_stream_tws

    @contextmanager
    def rocksdb():
        key = "spark.sql.streaming.stateStore.providerClass"
        old = spark.conf.get(key)
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            yield
        finally:
            spark.conf.set(key, old)

    def build(fn):
        stream, _ = chunked_file_stream(
            spark, sf_dir, "events", "ts", n_chunks=5,
            key_col="user_id", id_col="event_id", flush=True, files_per_trigger=2,
        )
        out = fn(
            stream,
            key_cols="user_id",
            ts_col="ts",
            frame=range_frame("7 days"),
            granularity=["2 hours", "1 day"],
            specs=[
                TiledSpec("cnt", "count", "vc", "bigint"),
                TiledSpec("sum_c", "sum", "vc", "double", finish=lambda s: s / 100.0),
                TiledCateSpec("sc", "sum", "vc", "event_type", scale=100.0),
                TiledTopSpec("tf", "topn_frequency", "event_type", k=2),
            ],
            passthrough=["event_id"],
            lateness="0 seconds",
            prepared={"vc": cents("value")},
        )
        res = run_available_now_to_memory(out, output_mode="append")
        return (
            res.filter(F.col("event_id") != SENTINEL_ID)
            .select("event_id", "cnt", "sum_c", "sc", "tf")
            .toPandas()
            .set_index("event_id")
            .sort_index()
        )

    a = build(tiled_sliding_window_stream)
    with rocksdb():
        b = build(tiled_sliding_window_stream_tws)
    assert len(a) == len(b)
    for c in a.columns:
        if a[c].dtype.kind == "f":
            assert np.allclose(a[c].values, b[c].values, equal_nan=True), c
        else:
            assert (a[c].values == b[c].values).all(), c
