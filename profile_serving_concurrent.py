#!/usr/bin/env python
"""Concurrent-caller serving probe (r11 verdict #7): K threads issue
sequential 1k-request batches against ONE TiledFeatureService — confirms
the shared cached state + per-thread pin release hold up and measures
aggregate throughput vs the single-caller baseline."""
from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import materialize  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = 1000
BATCHES_PER_CALLER = 4


def main():
    from pyspark.sql import functions as F

    from volga_spark.operators.tiles import TiledFeatureService, build_tile_ladder
    from volga_spark.operators.window import range_frame
    from volga_spark.session import get_spark
    from volga_spark.tables import load_table

    spark = get_spark("profile_serving_concurrent")
    ev = load_table(spark, SF, "events")
    gs = ["1 minute", "1 hour", "12 hours"]
    evs = ev.select("user_id", "ts", "value")
    svc = TiledFeatureService(
        evs,
        build_tile_ladder(evs, ["user_id"], "ts", "value", gs),
        key_cols="user_id",
        ts_col="ts",
        value_col="value",
        frame=range_frame("7 DAYS"),
        granularities=gs,
    )

    def req_batch(salt):
        r = (
            ev.select("user_id", "ts")
            .orderBy(F.xxhash64("user_id", "ts", F.lit(salt)))
            .limit(N)
            .withColumn(
                "request_id",
                F.monotonically_increasing_id() + F.lit(salt * 10_000_000),
            )
            .select("request_id", "user_id", "ts")
            .persist()
        )
        r.count()
        return r

    warm = req_batch(999)
    materialize(svc.lookup(warm))
    warm.unpersist()

    out = {"sf": SF, "n_per_batch": N, "batches_per_caller": BATCHES_PER_CALLER, "cells": {}}
    for k in (1, 2, 4, 8):
        errors, reqs = [], {}
        for c in range(k):
            reqs[c] = [req_batch(1000 * k + 100 * c + b) for b in range(BATCHES_PER_CALLER)]

        def caller(c):
            try:
                for req in reqs[c]:
                    materialize(svc.lookup(req, n_requests=N))
            except Exception as ex:  # noqa: BLE001
                errors.append((c, repr(ex)))

        t0 = time.monotonic()
        threads = [threading.Thread(target=caller, args=(c,)) for c in range(k)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.monotonic() - t0
        total = k * BATCHES_PER_CALLER * N
        out["cells"][k] = {
            "wall_s": round(wall, 3),
            "lookups_per_s": round(total / wall),
            "errors": errors,
        }
        print(
            f"# K={k}: {total} lookups in {wall:.2f}s -> "
            f"{out['cells'][k]['lookups_per_s']}/s errors={len(errors)}",
            file=sys.stderr,
        )
        for c in reqs:
            for r in reqs[c]:
                r.unpersist()
    svc.close()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
