"""Streaming-window differential fuzzer (r12, extends the r11 verdict #3
spec fuzzer to the streaming execution path).

Random (frame kind × frame size × ML-UDAF spec mix × partition key) shapes
run through the STREAMING stateful window (`sliding_window_stream`,
bucketed applyInPandasWithState, availableNow micro-batches with flush
punctuation) and through the BATCH sweep (`apply_sliding_aggs`) over the
same rows — every emitted row must match exactly. The batch sweep itself
is held to DuckDB by the batch spec fuzzer, so this transitively pins the
streaming path to SQL semantics across the random space.

Seed count: FUZZ_STREAM_SEEDS env (default 5 per CI round; the committed
deep sweep ran 30 — COVERAGE.md r12)."""

from __future__ import annotations

import os
import random

import pandas as pd
import pytest

from pyspark.sql import functions as F

from volga_spark.functions.sliding import apply_sliding_aggs
from volga_spark.operators.window import range_frame, rows_frame

from test_pipeline_spec_fuzz import _source_pdf

SRC_DIR = "/tmp/volga_spark_fuzz_src"


@pytest.fixture(scope="module")
def fuzz_sf_dir(spark):
    import os as _os

    path = os.path.join(SRC_DIR, "events.parquet")
    if not _os.path.exists(path):
        spark.createDataFrame(_source_pdf()).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
    return SRC_DIR


def _draw_specs(rng: random.Random):
    """Random ML-UDAF spec mix via the same compiler the SQL front end
    uses (_compile_sweep_call), so the fuzz space matches what a user's
    spec can express."""
    from volga_spark.api.pipeline import _compile_sweep_call

    prepared: dict = {}
    specs = []
    for i in range(rng.randint(1, 3)):
        fam = rng.choice(["cate", "cate_where", "top", "topn"])
        alias = f"s{i}"
        if fam == "cate":
            agg = rng.choice(["sum", "count", "avg", "min", "max"])
            specs.append(
                _compile_sweep_call(
                    f"{agg}_cate", ["vc", "event_type"], alias, prepared
                )
            )
        elif fam == "cate_where":
            agg = rng.choice(["sum", "count", "min", "max"])
            c = round(rng.uniform(-5, 30), 2)
            specs.append(
                _compile_sweep_call(
                    f"{agg}_cate_where",
                    ["vc", f"value > {c}", "event_type"],
                    alias,
                    prepared,
                )
            )
        elif fam == "top":
            shape = rng.choice(
                ["top", "topn_frequency", "top1_ratio", "count_distinct",
                 "quantile_disc"]
            )
            if shape == "top":
                specs.append(
                    _compile_sweep_call(
                        "top", ["vc", str(rng.randint(1, 4))], alias, prepared
                    )
                )
            elif shape == "topn_frequency":
                specs.append(
                    _compile_sweep_call(
                        "topn_frequency",
                        ["event_type", str(rng.randint(1, 3))],
                        alias,
                        prepared,
                    )
                )
            elif shape == "quantile_disc":
                q = rng.choice(["0.25", "0.5", "0.9"])
                specs.append(
                    _compile_sweep_call("quantile_disc", ["vc", q], alias, prepared)
                )
            else:
                specs.append(
                    _compile_sweep_call(shape, ["event_type"], alias, prepared)
                )
        else:
            agg = rng.choice(["sum", "count", "min", "max", "avg", "ratio"])
            order = rng.choice(["key", "value"])
            c = round(rng.uniform(-5, 30), 2)
            fn = (
                f"top_n_{order}_ratio_cate"
                if agg == "ratio"
                else f"top_n_{order}_{agg}_cate_where"
            )
            specs.append(
                _compile_sweep_call(
                    fn,
                    ["vc", f"value > {c}", "event_type", str(rng.randint(1, 3))],
                    alias,
                    prepared,
                )
            )
    return specs, prepared


_SEEDS = int(os.environ.get("FUZZ_STREAM_SEEDS", "5"))


@pytest.mark.parametrize("seed", range(_SEEDS))
def test_streaming_window_fuzz_matches_batch_sweep(spark, fuzz_sf_dir, seed):
    from volga_spark.streaming.runner import run_available_now_to_memory
    from volga_spark.streaming.sources import SENTINEL_ID, chunked_file_stream
    from volga_spark.streaming.stateful_window import sliding_window_stream

    rng = random.Random(77_000 + seed)
    pk = rng.choice(["user_id", "event_type"])
    if rng.random() < 0.6:
        frame = range_frame(f"{rng.randint(2, 70)} minutes")
    else:
        frame = rows_frame(rng.randint(1, 40))
    specs, prepared = _draw_specs(rng)
    aliases = [s.name for s in specs]

    src = spark.read.parquet(os.path.join(fuzz_sf_dir, "events.parquet"))
    batch = (
        apply_sliding_aggs(
            src,
            partition_by=pk,
            order_by="ts",
            frame=frame,
            specs=specs,
            passthrough=["event_id"],
            prepared=dict(prepared),
        )
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )

    stream, _ = chunked_file_stream(
        spark, fuzz_sf_dir, "events", "ts", n_chunks=4,
        key_col=pk, id_col="event_id", flush=True,
    )
    out = sliding_window_stream(
        stream,
        key_cols=pk,
        ts_col="ts",
        frame=frame,
        specs=specs,
        passthrough=["event_id"],
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
        f"seed {seed}: {len(got)} streamed rows vs {len(batch)} batch "
        f"(pk={pk}, frame={frame})"
    )
    problems = []
    for a in aliases:
        gv, bv = got[a], batch[a]
        for eid in batch.index:
            g, b = gv.loc[eid], bv.loc[eid]
            g_nan = g is None or (isinstance(g, float) and g != g)
            b_nan = b is None or (isinstance(b, float) and b != b)
            if g_nan and b_nan:
                continue
            if isinstance(b, float):
                ok = (
                    not g_nan
                    and abs(float(g) - float(b)) <= 1e-9 * max(1.0, abs(float(b)))
                )
            else:
                ok = str(g) == str(b)
            if not ok:
                problems.append((eid, a, g, b))
    assert not problems, (
        f"seed {seed} diverged (pk={pk}, frame={frame}): "
        f"{len(problems)} rows, first 5: {problems[:5]}"
    )
