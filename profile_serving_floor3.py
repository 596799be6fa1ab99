#!/usr/bin/env python
"""Test two floor levers on the 1k lookup: (a) truncate the serving-state
logical plan (localCheckpoint) so per-batch analysis stops re-walking the
events->ladder tree, (b) coalesce the cached state partitions so the
per-batch probe job launches ~32 tasks instead of ~100."""
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

    spark = get_spark("profile_serving_floor3")
    ev = load_table(spark, SF, "events")
    frame = range_frame("7 DAYS")
    ladder_gs = ["1 minute", "1 hour", "12 hours"]
    evs = ev.select("user_id", "ts", "value")
    tiles = build_tile_ladder(evs, ["user_id"], "ts", "value", ladder_gs)

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

    out = {"sf": SF, "n": N, "variants": {}}

    def run_variant(label, mutate):
        svc = TiledFeatureService(
            evs, tiles, key_cols="user_id", ts_col="ts", value_col="value",
            frame=frame, granularities=ladder_gs,
        )
        svc._ensure_cached()
        mutate(svc)
        warm = req_batch(N, 99)
        materialize(svc.lookup(warm, shards=1))
        warm.unpersist()
        builds, execs = [], []
        for i in range(4):
            req = req_batch(N, i + 1)
            t0 = time.monotonic()
            df = svc.lookup(req, shards=1)
            builds.append(round(time.monotonic() - t0, 3))
            t1 = time.monotonic()
            materialize(df)
            execs.append(round(time.monotonic() - t1, 3))
            req.unpersist()
        tot = [round(b + e, 3) for b, e in zip(builds, execs)]
        out["variants"][label] = {
            "build": builds, "exec": execs,
            "total_avg": round(sum(tot) / len(tot), 3),
            "lookups_per_s": round(N / (sum(tot) / len(tot))),
        }
        print(f"# {label}: build {builds} exec {execs} -> "
              f"{out['variants'][label]['lookups_per_s']}/s", file=sys.stderr)
        svc.close()

    run_variant("baseline", lambda svc: None)

    def ckpt(svc):
        st = svc._state.localCheckpoint(eager=True)
        if svc._cached:
            svc._state.unpersist()
            svc._cached = False
        svc._state = st

    run_variant("state_localCheckpoint", ckpt)

    def ckpt_coalesce(svc):
        st = svc._state.coalesce(32).localCheckpoint(eager=True)
        if svc._cached:
            svc._state.unpersist()
            svc._cached = False
        svc._state = st

    run_variant("state_ckpt_coalesce32", ckpt_coalesce)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
