#!/usr/bin/env python
"""Decompose the small-batch serving fixed cost (r11 verdict #1).

SCALING.md r11: 1k requests = 485-557 lookups/s (~1.8-2.0s/batch) vs
28.8k/s at 200k. This script isolates the per-batch floor into its
candidate terms, each timed as its own action over the warm service:

  count      — the auto-mode requests.persist().count() pin job
  state_scan — one full pass over the cached serving state (the
               distributed side of the probe join, scanned every batch)
  lookup_1   — lookup(shards=1) on a pre-pinned batch (no count job)
  lookup_auto— the default auto path (persist + count + auto_shards)

Run: python profile_serving_floor.py   (sf0.1 by default)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import materialize  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("FLOOR_N", "1000"))


def main():
    from pyspark.sql import functions as F

    from volga_spark.operators.tiles import TiledFeatureService, build_tile_ladder
    from volga_spark.operators.window import range_frame
    from volga_spark.session import get_spark
    from volga_spark.tables import load_table

    spark = get_spark("profile_serving_floor")
    ev = load_table(spark, SF, "events")
    frame = range_frame("7 DAYS")
    ladder_gs = ["1 minute", "1 hour", "12 hours"]
    evs = ev.select("user_id", "ts", "value")
    tiles = build_tile_ladder(evs, ["user_id"], "ts", "value", ladder_gs)
    svc = TiledFeatureService(
        evs, tiles, key_cols="user_id", ts_col="ts", value_col="value",
        frame=frame, granularities=ladder_gs,
    )

    def req_batch(n, salt):
        req = (
            ev.select("user_id", "ts")
            .orderBy(F.xxhash64("user_id", "ts", F.lit(salt)))
            .limit(n)
            .withColumn("request_id",
                        F.monotonically_increasing_id() + F.lit(salt * 10_000_000))
            .select("request_id", "user_id", "ts")
            .persist()
        )
        req.count()
        return req

    # warm the service state
    warm_req = req_batch(N, 99)
    materialize(svc.lookup(warm_req))
    warm_req.unpersist()

    out = {"sf": SF, "n": N, "state_rows": None, "terms": {}}

    def timed(label, fn, reps=4):
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            ts.append(round(time.monotonic() - t0, 3))
        out["terms"][label] = {"trials": ts, "avg": round(sum(ts) / len(ts), 3)}
        print(f"# {label}: {ts} avg {out['terms'][label]['avg']}", file=sys.stderr)

    out["state_rows"] = svc._state.count()
    timed("state_scan", lambda: svc._state.count())

    reqs = [req_batch(N, i + 1) for i in range(4)]
    timed("count_job", lambda: reqs[0].count())

    it = iter(reqs)
    timed("lookup_shards1_prepinned", lambda: materialize(svc.lookup(next(it), shards=1)))

    reqs2 = [req_batch(N, 10 + i) for i in range(4)]
    it2 = iter(reqs2)
    timed("lookup_auto", lambda: materialize(svc.lookup(next(it2))))

    # noop job floor: smallest possible spark action
    timed("noop_job", lambda: spark.range(1).count())

    for r in reqs + reqs2:
        r.unpersist()
    svc.close()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
