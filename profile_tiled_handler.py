"""Sweep-level profiler for the tiled-window handler (_GroupCore.advance).

Drives the Spark-free core directly on the real events table — same spec
sets as the two bench queries, same micro-batch/watermark cadence as
chunked_file_stream — so the handler's CPU profile is measurable without
JVM/framework noise (r08 verdict #1: profile the sweep itself, not the
harness).

Usage:  python profile_tiled_handler.py [7d|month] [--cprofile]
Prints the per-stage wall split (load/advance/dump, per-batch advance, max
single call) and, with --cprofile, the top cumulative functions.

r09 findings this captured (sf0.1, 100k events, 64 buckets):
- pandas named-agg groupbys + per-cell .item() in _close_buckets were ~40%
  of advance CPU -> contiguous-run reduceat rewrite;
- per-key pandas Series builds in the vectorized sweep were a regression
  -> typed views hoisted to once per batch;
- advance CPU 12.8s -> 7.4s total; what remains is the per-emission
  category/top/ratio CSV rendering (semantically per output row) and the
  ~3.7s per-query trigger-fixed framework floor the handler cannot see.

r10 findings (same harness, ambient loadavg 4-5):
- the per-emission from-scratch sorts in _render_cate/_render_top/
  _render_ratio were the sweep's render floor -> replaced by bisect-
  maintained sorted views synced from the dirty sets, plus output-string
  reuse when no step touched a spec between emissions (38% of cate
  renders hit the cache on the 7d specs);
- advance CPU 8.31 -> 6.24s (7d) / 6.37 -> 4.46s (month) measured
  same-session before/after; render cum share (cProfile) cate 2.76 ->
  2.02, top 1.57 -> 1.17, ratio 1.43 -> 0.96;
- what remains is ~1.9s tottime in _sweep_key's numpy segment machinery
  + the add/retract step loop + _eval of dirty categories — per-row
  semantics with no batch structure left to exploit; locally the bench
  official stays framework-floor-dominated (~3.7s trigger-fixed).
"""

from __future__ import annotations

import shutil
import sys
import time

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from volga_spark.streaming.tiled_window import (
    TS,
    TiledCateSpec,
    TiledRatioSpec,
    TiledSpec,
    TiledTopSpec,
    _GroupCore,
)

DAY = 86_400_000_000
SPILL = "/tmp/volga_profile_tiled_spill"


def _specs(mode: str):
    if mode == "7d":
        scalar = [
            TiledSpec("cnt_7d", "count", "vc", "bigint"),
            TiledSpec("sum_7d", "sum", "vc", "double",
                      finish=lambda s: s / 100.0),
            TiledSpec("avg_7d", "avg", "vc", "double",
                      finish=lambda a: a / 100.0),
            TiledSpec("min_7d", "min", "value", "double"),
            TiledSpec("max_7d", "max", "value", "double"),
        ]
        cate = [
            TiledCateSpec("sum_cate_7d", "sum", "vc", "event_type",
                          scale=100.0),
            TiledCateSpec("top2_key_sum_7d", "sum", "vc", "event_type",
                          cond_col="cond", scale=100.0, order="key", k=2),
        ]
        top = [
            TiledTopSpec("topf_7d", "topn_frequency", "event_type", k=2),
            TiledTopSpec("t1r_7d", "top1_ratio", "event_type",
                         out_type="double"),
        ]
        ratio = [
            TiledRatioSpec("top2_val_ratio_7d", "value", 2, "value", "cond",
                           "event_type"),
        ]
        return 7 * DAY, [DAY // 2], scalar, cate, top, ratio, 3
    scalar = [
        TiledSpec("cnt_21d", "count", "vc", "bigint"),
        TiledSpec("sum_21d", "sum", "vc", "double",
                  finish=lambda s: s / 100.0),
        TiledSpec("min_21d", "min", "value", "double"),
        TiledSpec("max_21d", "max", "value", "double"),
    ]
    cate = [TiledCateSpec("sum_cate_21d", "sum", "vc", "event_type",
                          scale=100.0)]
    return 21 * DAY, [2 * 3_600_000_000, DAY], scalar, cate, [], [], 3


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "7d"
    use_cprofile = "--cprofile" in sys.argv
    sf_dir = "/root/testdata/sf0.1"

    pdf = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    pdf["vc"] = np.round(pdf["value"] * 100).astype("int64")
    pdf["cond"] = pdf["value"] > 100.0
    pdf[TS] = pdf["ts"].astype("int64")
    pdf = pdf.sort_values("ts", kind="stable").reset_index(drop=True)

    L, grans, scalar, cate, top, ratio, fpt = _specs(mode)
    inputs = sorted({s.col for s in scalar})
    core = _GroupCore(["user_id"], inputs, ["event_id"], L, grans, scalar,
                      None, cate, top, ratio, int_inputs={"vc"})

    n_buckets = 64
    pdf["__bkt"] = pd.util.hash_array(pdf["user_id"].to_numpy()) % n_buckets
    chunks = np.array_split(pdf, 5)
    batches = [
        pd.concat(chunks[i:i + fpt], ignore_index=True)
        for i in range(0, 5, fpt)
    ]
    wms = [0]
    for b in batches:
        wms.append(int(b[TS].max()))
    batches.append(batches[0].iloc[0:0])  # end-of-stream flush
    stored_cols = ["user_id", TS] + core.stored

    shutil.rmtree(SPILL, ignore_errors=True)
    prof = None
    if use_cprofile:
        import cProfile

        prof = cProfile.Profile()

    states: dict[int, tuple] = {}
    t_load = t_adv = t_dump = 0.0
    per_batch: dict[int, float] = {}
    mx = 0.0
    rows_out = 0
    for bi, (batch, wm) in enumerate(zip(batches, wms)):
        by_bkt = dict(list(batch.groupby("__bkt"))) if len(batch) else {}
        for bkt in sorted(set(states) | set(by_bkt)):
            core.spill_path = f"{SPILL}/b{bkt}"
            new = by_bkt.get(bkt)
            new = (new if new is not None else batch.iloc[0:0])[stored_cols]
            t0 = time.perf_counter()
            st = core.load(states[bkt]) if bkt in states else core.empty_state()
            t1 = time.perf_counter()
            if prof:
                prof.enable()
            out, st = core.advance(st, new, wm)
            if prof:
                prof.disable()
            t2 = time.perf_counter()
            states[bkt] = core.dump(st)
            t3 = time.perf_counter()
            t_load += t1 - t0
            t_adv += t2 - t1
            t_dump += t3 - t2
            per_batch[bi] = per_batch.get(bi, 0.0) + (t2 - t1)
            mx = max(mx, t2 - t1)
            if out is not None:
                rows_out += len(out)

    print(f"mode={mode} rows_out={rows_out}")
    print(f"load={t_load:.2f}s advance={t_adv:.2f}s dump={t_dump:.2f}s")
    print("advance per batch:",
          {k: round(v, 2) for k, v in per_batch.items()},
          f"max_call={mx:.3f}s")
    if prof:
        import io
        import pstats

        s = io.StringIO()
        pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(25)
        print(s.getvalue())


if __name__ == "__main__":
    main()
