#!/usr/bin/env python
"""Serving-state scale probe (r10 verdict #8): confirm tiled lookup cost
stays REQUESTS-proportional when the state side is 100×.

Replicates sf0.1 `events` FACTOR× with key shifts (cardinality scales with
volume — same discipline as scale_probe.build_scaled), builds the same
7d/[1m,1h,12h] ladder service profile_serving.py measures at 1×, and
times warm lookups at the same batch sizes. The serving-state build/cache
is the write path and is EXPECTED to scale with state; the per-batch
lookup is the claim under test: its plan probes the cached state with a
request-bounded broadcast, so warm cost should track batch size, not
state size. Auto-sharding stays on (lookup(shards=None)).

Usage: python profile_serving_scale.py [factor]   (default 100)
Prints one JSON line; recorded in SCALING.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _Telemetry, materialize  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BATCHES = (10_000, 50_000)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100

    from pyspark.sql import functions as F

    from volga_spark.operators.tiles import TiledFeatureService, build_tile_ladder
    from volga_spark.operators.window import range_frame
    from volga_spark.session import get_spark
    from volga_spark.tables import load_table

    spark = get_spark("profile_serving_scale")
    base = load_table(spark, SF, "events").select("user_id", "ts", "value")

    # key-shifted replication: user cardinality scales with volume (the
    # per-key window density stays constant — the honest 100× for a
    # serving state, vs cloning that would 100× every key's window)
    scaled_path = f"/tmp/serving_scale_{factor}x_events.parquet"
    if not os.path.exists(scaled_path):
        stride = 10_000_000
        reps = [
            base.withColumn("user_id", F.col("user_id") + F.lit(r * stride))
            for r in range(factor)
        ]
        out = reps[0]
        for rep in reps[1:]:
            out = out.unionByName(rep)
        out.write.mode("overwrite").parquet(scaled_path)
    ev = spark.read.parquet(scaled_path)

    ladder_gs = ["1 minute", "1 hour", "12 hours"]
    t0 = time.perf_counter()
    tiles = build_tile_ladder(ev, ["user_id"], "ts", "value", ladder_gs)
    svc = TiledFeatureService(
        ev,
        tiles,
        key_cols="user_id",
        ts_col="ts",
        value_col="value",
        frame=range_frame("7 DAYS"),
        granularities=ladder_gs,
    )

    def req_batch(n, salt):
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
    out = {
        "sf": SF,
        "factor": factor,
        "n_events": ev.count(),
        "per_batch": {},
    }
    # first lookup pays the state build + cache (the write path)
    first = req_batch(1_000, 99)
    dt = tele.run("state_build_plus_first", "cold",
                  lambda: materialize(svc.lookup(first)))
    first.unpersist()
    out["state_build_plus_first_s"] = round(dt, 3)
    print(f"# state build + first lookup: {dt:.1f}s "
          f"(t0+{time.perf_counter()-t0:.1f}s)", file=sys.stderr)

    for n in BATCHES:
        times = []
        for i in range(4):
            req = req_batch(n, i + 1)
            dt = tele.run(f"lookup_{n}", "cold" if i == 0 else "warm",
                          lambda: materialize(svc.lookup(req)))
            req.unpersist()
            times.append(round(dt, 3))
        warm = times[1:]
        avg = sum(warm) / len(warm)
        out["per_batch"][n] = {
            "cold": times[0],
            "warm": warm,
            "warm_avg": round(avg, 3),
            "lookups_per_s": round(n / avg),
        }
        print(f"# n={n}: cold {times[0]} warm {warm} "
              f"-> {out['per_batch'][n]['lookups_per_s']}/s", file=sys.stderr)
    svc.close()
    out["trials"] = tele.trials
    print(json.dumps(out))


if __name__ == "__main__":
    main()
