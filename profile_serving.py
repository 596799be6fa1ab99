#!/usr/bin/env python
"""Request-serving throughput bench (r09 verdict #5).

Measures warm lookups/s of the tiled-ladder feature service vs the naive
union+window service over sf0.1 `events`, across request batch sizes —
the reference's request bench evaluates 200k points
(window_operator_benchmark.rs:590-618), so throughput must be measured
past the local per-job scheduling floor that dominates 1k-row batches.

Per (path, batch_size): 1 cold batch, then warm avg of 4 batches of
FRESH request frames (new request_ids each batch — no result reuse),
each fully materialized. Telemetry (load/steal) rides along.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _Telemetry, materialize  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BATCHES = (1_000, 10_000, 50_000)
# r11 (r10 verdict #2): the reference's request bench evaluates 200k points
# (window_operator_benchmark.rs:590-618); the tiled path runs that scale
# here with AUTO-sharding (lookup(shards=None) splits the probe frame to
# stay under the broadcast ceiling). The naive path stays at 50k — its
# full-window recompute at 200k adds minutes without new information.
TILED_EXTRA = (200_000,)


def main():
    from pyspark.sql import functions as F

    from volga_spark.operators.request import FeatureService, masked
    from volga_spark.operators.tiles import TiledFeatureService
    from volga_spark.operators.window import range_frame
    from volga_spark.session import get_spark
    from volga_spark.tables import load_table

    spark = get_spark("profile_serving")
    ev = load_table(spark, SF, "events")
    n_ev = ev.count()
    frame = range_frame("7 DAYS")

    from volga_spark.operators.tiles import build_tile_ladder

    ladder_gs = ["1 minute", "1 hour", "12 hours"]
    evs = ev.select("user_id", "ts", "value")
    tiles = build_tile_ladder(evs, ["user_id"], "ts", "value", ladder_gs)
    tiled = TiledFeatureService(
        evs,
        tiles,
        key_cols="user_id",
        ts_col="ts",
        value_col="value",
        frame=frame,
        granularities=ladder_gs,
    )

    def agg_builder(w):
        v = masked("value")
        return {
            "cnt": F.count(v).over(w),
            "sum_value": F.sum(F.round(v * 100).cast("long")).over(w) / 100.0,
            "min_value": F.min(v).over(w),
            "max_value": F.max(v).over(w),
        }

    naive = FeatureService(
        ev.select("user_id", "ts", "value"),
        key_cols="user_id",
        ts_col="ts",
        frame=frame,
        agg_builder=agg_builder,
    )

    def req_batch(n, salt):
        # fresh ids per batch; keys/ts sampled from the event stream.
        # persist + eager count (NOT localCheckpoint): request arrival is
        # not part of the measured lookup, and the caller unpersists after
        # each trial — 30 accumulated checkpoint frames would otherwise
        # put the later (naive-path) trials under cached-block residue,
        # the exact contamination bench.py's header documents (r02).
        req = (
            ev.select("user_id", "ts")
            .orderBy(F.xxhash64("user_id", "ts", F.lit(salt)))
            .limit(n)
            .withColumn(
                "request_id",
                F.monotonically_increasing_id() + F.lit(salt * 10_000_000),
            )
            .select("request_id", "user_id", "ts")
            .persist()
        )
        req.count()
        return req

    tele = _Telemetry()
    out = {"sf": SF, "n_events": n_ev, "paths": {}}
    for label, svc in (("tiled_ladder", tiled), ("naive", naive)):
        per = {}
        batches = BATCHES + TILED_EXTRA if label == "tiled_ladder" else BATCHES
        for n in batches:
            times = []
            for i in range(5):
                req = req_batch(n, i + 1)
                dt = tele.run(
                    f"{label}_{n}", "cold" if i == 0 else "warm",
                    lambda: materialize(svc.lookup(req)),
                )
                req.unpersist()
                times.append(round(dt, 3))
            warm = times[1:]
            avg = sum(warm) / len(warm)
            per[n] = {
                "cold": times[0],
                "warm": warm,
                "warm_avg": round(avg, 3),
                "lookups_per_s": round(n / avg),
            }
            if label == "tiled_ladder":
                from volga_spark.operators.tiles import auto_shards

                per[n]["auto_shards"] = auto_shards(
                    n, tiled.probe_rows_per_request()
                )
            print(f"# {label} n={n}: cold {times[0]} warm {warm} "
                  f"-> {per[n]['lookups_per_s']}/s", file=sys.stderr)
        out["paths"][label] = per
        svc.close()
    out["trials"] = tele.trials
    print(json.dumps(out))


if __name__ == "__main__":
    main()
