"""Tiled-streaming differential fuzzer (r12 — the tiled handler is the
most intricate state machine in the repo: per-bucket per-category
partials, interior tile merges, raw edge sweeps, cond masking, ladder
covers). Random (ladder × frame × tiled-spec mix) shapes run through
`tiled_sliding_window_stream` and are compared row-for-row against the
batch sweep (`apply_sliding_aggs`) with the translated cate/top/ratio
specs — which the batch spec fuzzer in turn holds to DuckDB.

Seed count: FUZZ_TILED_SEEDS env (default 3 per CI round; deep sweep 12 —
COVERAGE.md r12)."""

from __future__ import annotations

import os
import random

import pandas as pd
import pytest

from pyspark.sql import functions as F

from volga_spark.functions import cate_top
from volga_spark.functions.sliding import apply_sliding_aggs
from volga_spark.operators.window import range_frame

from test_pipeline_spec_fuzz import _source_pdf
from test_streaming_window_fuzz import SRC_DIR, fuzz_sf_dir  # noqa: F401


def _draw(rng: random.Random):
    """(tiled specs, equivalent sweep specs, ladder, frame)."""
    from volga_spark.streaming.tiled_window import (
        TiledCateSpec,
        TiledRatioSpec,
        TiledTopSpec,
    )

    g0 = rng.choice([1, 2, 5])
    ladder = [f"{g0} minutes", f"{g0 * rng.choice([4, 6, 12])} minutes"]
    w_mins = rng.randint(8, 90)
    frame = range_frame(f"{max(w_mins, g0 * 12 * 2)} minutes")

    tiled, sweep = [], []
    for i in range(rng.randint(1, 3)):
        a = f"s{i}"
        fam = rng.choice(["cate", "cate_cond", "cate_topn", "top", "ratio"])
        if fam == "cate":
            op = rng.choice(["sum", "count", "avg", "min", "max"])
            tiled.append(TiledCateSpec(a, op, "vc", "event_type"))
            sweep.append(getattr(cate_top, f"{op}_cate")(a, "vc", "event_type"))
        elif fam == "cate_cond":
            op = rng.choice(["sum", "count", "min", "max"])
            tiled.append(TiledCateSpec(a, op, "vc", "event_type", cond_col="cond"))
            sweep.append(
                getattr(cate_top, f"{op}_cate")(a, "vc", "event_type", cond="cond")
            )
        elif fam == "cate_topn":
            op = rng.choice(["sum", "count", "min", "max", "avg"])
            order, k = rng.choice(["key", "value"]), rng.randint(1, 3)
            tiled.append(
                TiledCateSpec(
                    a, op, "vc", "event_type", cond_col="cond", order=order, k=k
                )
            )
            sweep.append(
                cate_top.top_n_cate_where(a, op, order, "vc", "cond", "event_type", k)
            )
        elif fam == "top":
            shape = rng.choice(
                ["top", "topn_frequency", "top1_ratio", "count_distinct",
                 "quantile"]
            )
            if shape == "top":
                k = rng.randint(1, 4)
                tiled.append(TiledTopSpec(a, "top", "vc", k=k))
                sweep.append(cate_top.top(a, "vc", k))
            elif shape == "topn_frequency":
                k = rng.randint(1, 3)
                tiled.append(TiledTopSpec(a, "topn_frequency", "event_type", k=k))
                sweep.append(cate_top.topn_frequency(a, "event_type", k))
            elif shape == "top1_ratio":
                tiled.append(
                    TiledTopSpec(a, "top1_ratio", "event_type", out_type="double")
                )
                sweep.append(cate_top.top1_ratio(a, "event_type"))
            elif shape == "quantile":
                q = rng.choice([0.25, 0.5, 0.9, 1.0])
                tiled.append(
                    TiledTopSpec(a, "quantile", "vc", q=q, out_type="bigint")
                )
                sweep.append(cate_top.quantile_disc(a, "vc", q))
            else:
                tiled.append(
                    TiledTopSpec(a, "count_distinct", "event_type",
                                 out_type="bigint")
                )
                sweep.append(cate_top.count_distinct(a, "event_type"))
        else:
            order, k = rng.choice(["key", "value"]), rng.randint(1, 3)
            tiled.append(
                TiledRatioSpec(a, order, k, "value", "cond", "event_type")
            )
            sweep.append(
                cate_top.top_n_ratio_cate(a, order, "value", "cond", "event_type", k)
            )
    return tiled, sweep, ladder, frame


_SEEDS = int(os.environ.get("FUZZ_TILED_SEEDS", "3"))


@pytest.mark.parametrize("seed", range(_SEEDS))
def test_tiled_stream_fuzz_matches_batch_sweep(spark, fuzz_sf_dir, seed):
    from volga_spark.streaming.runner import run_available_now_to_memory
    from volga_spark.streaming.sources import SENTINEL_ID, chunked_file_stream
    from volga_spark.streaming.tiled_window import tiled_sliding_window_stream

    rng = random.Random(88_000 + seed)
    tiled, sweep, ladder, frame = _draw(rng)
    cond_c = round(rng.uniform(-5, 30), 2)
    prepared = {
        "vc": F.col("vc"),
        "cond": F.col("value") > cond_c,
    }
    aliases = [s.name for s in tiled]

    src = spark.read.parquet(os.path.join(fuzz_sf_dir, "events.parquet"))
    batch = (
        apply_sliding_aggs(
            src,
            partition_by="user_id",
            order_by="ts",
            frame=frame,
            specs=sweep,
            passthrough=["event_id"],
            prepared=dict(prepared),
        )
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )

    stream, _ = chunked_file_stream(
        spark, fuzz_sf_dir, "events", "ts", n_chunks=4,
        key_col="user_id", id_col="event_id", flush=True, files_per_trigger=2,
    )
    out = tiled_sliding_window_stream(
        stream,
        key_cols="user_id",
        ts_col="ts",
        frame=frame,
        granularity=ladder,
        specs=tiled,
        passthrough=["event_id"],
        lateness="0 seconds",
        prepared=dict(prepared),
        n_buckets=8,
    )
    got = (
        run_available_now_to_memory(out, output_mode="append", stream_shuffle=8)
        .filter(F.col("event_id") != SENTINEL_ID)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )

    assert len(got) == len(batch), (
        f"seed {seed}: {len(got)} streamed vs {len(batch)} batch rows "
        f"(ladder={ladder}, frame={frame}, specs={tiled})"
    )
    problems = []
    for a in aliases:
        for eid in batch.index:
            g, b = got[a].loc[eid], batch[a].loc[eid]
            g_nan = g is None or (isinstance(g, float) and g != g)
            b_nan = b is None or (isinstance(b, float) and b != b)
            if g_nan and b_nan:
                continue
            if isinstance(b, float) or isinstance(g, float):
                ok = (
                    not g_nan and not b_nan
                    and abs(float(g) - float(b)) <= 1e-9 * max(1.0, abs(float(b)))
                )
            else:
                ok = str(g) == str(b)
            if not ok:
                problems.append((eid, a, g, b))
    assert not problems, (
        f"seed {seed} diverged (ladder={ladder}, frame={frame}, "
        f"cond=value>{cond_c}, specs={tiled}): {len(problems)} rows, "
        f"first 5: {problems[:5]}"
    )


def test_cate_only_bigint_column_survives_state_round_trip(spark, fuzz_sf_dir):
    """r12 regression (found by this fuzzer, seeds 0-2): a TiledCateSpec
    over a bigint column with NO scalar spec on the same column used the
    float partial path in _close_buckets, and the float sums/extrema
    written into the array<array<bigint>> state slots were silently
    NULLED on the Spark state round trip (the r04 mistyped-slot gotcha) —
    the next batch's tile merge then crashed on None arithmetic. Every
    prior workload paired cate specs with a scalar spec over the same
    column, which masked it. This pins the minimal failing shape through
    the REAL streaming path (the in-process _GroupCore drive cannot catch
    it — the nulling happens in Spark's typed state store)."""
    from volga_spark.streaming.runner import run_available_now_to_memory
    from volga_spark.streaming.sources import SENTINEL_ID, chunked_file_stream
    from volga_spark.streaming.tiled_window import (
        TiledCateSpec,
        tiled_sliding_window_stream,
    )

    src = spark.read.parquet(os.path.join(fuzz_sf_dir, "events.parquet"))
    specs = [TiledCateSpec("sc", "sum", "vc", "event_type")]
    batch = (
        apply_sliding_aggs(
            src,
            partition_by="user_id",
            order_by="ts",
            frame=range_frame("120 minutes"),
            specs=[__import__("volga_spark.functions.cate_top",
                              fromlist=["sum_cate"]).sum_cate(
                "sc", "vc", "event_type")],
            passthrough=["event_id"],
            prepared={"vc": F.col("vc")},
        )
        .toPandas()
        .set_index("event_id")["sc"]
        .sort_index()
    )
    stream, _ = chunked_file_stream(
        spark, fuzz_sf_dir, "events", "ts", n_chunks=4,
        key_col="user_id", id_col="event_id", flush=True, files_per_trigger=2,
    )
    out = tiled_sliding_window_stream(
        stream, key_cols="user_id", ts_col="ts",
        frame=range_frame("120 minutes"), granularity="5 minutes",
        specs=specs, passthrough=["event_id"], lateness="0 seconds",
        prepared={"vc": F.col("vc")}, n_buckets=8,
    )
    got = (
        run_available_now_to_memory(out, output_mode="append", stream_shuffle=8)
        .filter(F.col("event_id") != SENTINEL_ID)
        .toPandas()
        .set_index("event_id")["sc"]
        .sort_index()
    )
    pd.testing.assert_series_equal(got, batch, check_names=False)
