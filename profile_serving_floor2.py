#!/usr/bin/env python
"""Job-timeline decomposition of one warm 1k-request tiled lookup.

Pulls the Spark UI REST job list for the lookup's job-group and prints
each job's duration + the gaps between jobs (driver-side planning /
broadcast construction time), so the ~1.7s floor is attributed to named
jobs instead of guessed at.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

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

    spark = get_spark(
        "profile_serving_floor2",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    sc = spark.sparkContext
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

    warm = req_batch(N, 99)
    materialize(svc.lookup(warm))
    warm.unpersist()

    req = req_batch(N, 1)
    sc.setJobGroup("floor2", "one warm lookup")
    t0 = time.monotonic()
    df = svc.lookup(req, shards=1)
    t_build = time.monotonic() - t0
    t1 = time.monotonic()
    materialize(df)
    t_exec = time.monotonic() - t1
    sc.setJobGroup(None, None)

    app_id = sc.applicationId
    url = f"{sc.uiWebUrl}/api/v1/applications/{app_id}/jobs?status=succeeded"
    jobs = json.loads(urllib.request.urlopen(url).read())
    mine = [j for j in jobs if j.get("jobGroup") == "floor2"]
    mine.sort(key=lambda j: j["jobId"])
    rows = []
    prev_end = None
    for j in mine:
        sub = j["submissionTime"]
        comp = j["completionTime"]
        from datetime import datetime
        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        s = datetime.strptime(sub.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
        e = datetime.strptime(comp.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
        gap = (s - prev_end).total_seconds() if prev_end else None
        prev_end = e
        rows.append({
            "jobId": j["jobId"],
            "dur_s": round((e - s).total_seconds(), 3),
            "gap_before_s": round(gap, 3) if gap is not None else None,
            "tasks": j["numTasks"],
            "desc": (j.get("description") or j.get("name", ""))[:130],
        })
    print(json.dumps({
        "t_build_plan": round(t_build, 3),
        "t_exec": round(t_exec, 3),
        "jobs": rows,
        "sum_job_dur": round(sum(r["dur_s"] for r in rows), 3),
        "sum_gaps": round(sum(r["gap_before_s"] or 0 for r in rows), 3),
    }, indent=1))
    req.unpersist()
    svc.close()


if __name__ == "__main__":
    main()
