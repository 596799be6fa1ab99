#!/usr/bin/env python
"""r14 — streaming floor A/B (VERDICT r13 item #3).

Interleaved config trials in ONE tuned session for the benched streaming
queries: stream-shuffle width {8 (current), 4, 2} for the JVM-stateful
queries, noDataMicroBatches off, and state-store compression codec. Each
variant's RESULT HASH is compared to the baseline run's (same bench-style
materialize), so a config that changes results is rejected on the spot.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from volga_spark.session import get_spark
import volga_spark.streaming.runner as runner

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))

QUERIES = [
    "q_stream_sliding_window",
    "q_stream_upsert_sink",
    "q_stream_groupby_count",
    "q_stream_tiled_window",
]


def result_hash(df):
    rows = df.select(
        F.bit_xor(
            F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
        ).alias("h"),
        F.count("*").alias("n"),
    ).collect()
    return (rows[0]["h"], rows[0]["n"])


def _cleanup(spark):
    import gc

    from volga_spark.caching import release_cached_blocks

    release_cached_blocks(spark)
    gc.collect()


# NOTE (post-change): the original r14 A/B set
# spark.sql.streaming.noDataMicroBatches.enabled on the SESSION, which
# worked because the runner did not touch that conf at the time. The
# runner now force-sets it per run (_stream_shuffle), so the session
# override is dead — variants express no_data_batches through the
# runner's own knob instead (patched per trial below). The recorded r14
# measurements predate the runner change and were valid as taken; the
# polarity here is flipped to match the new default (off): "nodata_on"
# variants RE-ENABLE the trailing empty batch.
CONFIGS = {
    # name: (STREAM_SHUFFLE width, no_data_batches)
    "base_w8": ("8", False),
    "w4": ("4", False),
    "w2": ("2", False),
    "w8_nodata_on": ("8", True),
    "w4_nodata_on": ("4", True),
}


def run_one(spark, reg, qname, cfg_name):
    width, no_data = CONFIGS[cfg_name]
    old_width = runner.STREAM_SHUFFLE
    orig_ctx = runner._stream_shuffle
    runner.STREAM_SHUFFLE = width
    if no_data:
        runner._stream_shuffle = (
            lambda spark, width=None, no_data_batches=False: orig_ctx(
                spark, width, True
            )
        )
    try:
        t0 = time.perf_counter()
        h = result_hash(reg[qname].fn(spark, SF_DIR))
        dt = time.perf_counter() - t0
    finally:
        runner.STREAM_SHUFFLE = old_width
        runner._stream_shuffle = orig_ctx
    _cleanup(spark)
    return dt, h


def main():
    spark = get_spark("profile_r14_streaming")
    from volga_spark.workloads import load_all

    reg = load_all()
    # warm streaming stack + pre-build chunk dirs (bench does the same)
    reg["q_stream_sliding_window"].fn(spark, "/root/testdata/sf0.001").count()
    for q in QUERIES:
        reg[q].fn(spark, SF_DIR).count()
    _cleanup(spark)

    results: dict = {}
    base_hashes: dict = {}
    for q in QUERIES:
        results[q] = {c: [] for c in CONFIGS}
        print(f"== {q} ==", flush=True)
        for r in range(ROUNDS):
            for cfg in CONFIGS:
                dt, h = run_one(spark, reg, q, cfg)
                results[q][cfg].append(round(dt, 3))
                if cfg == "base_w8" and q not in base_hashes:
                    base_hashes[q] = h
                ok = "" if base_hashes.get(q) in (None, h) else "  RESULT MISMATCH!"
                print(f"  r{r} {cfg}: {dt:.3f}s hash={h}{ok}", flush=True)
        for cfg in CONFIGS:
            ts = results[q][cfg]
            print(
                f"  {q} {cfg}: med {statistics.median(ts):.3f} min {min(ts):.3f}",
                flush=True,
            )
    with open("/tmp/profile_r14_streaming.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print("-> /tmp/profile_r14_streaming.json", flush=True)


if __name__ == "__main__":
    main()
