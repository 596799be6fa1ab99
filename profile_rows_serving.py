"""ROWS-frame request-serving throughput at the reference's own benchmark
shape (r13): 200,000 records, 40 keys, ``ROWS 10000 PRECEDING``, plain
MIN/MAX aggregates, ExecutionMode::Request (reference
src/runtime/tests/window_operator_benchmark.rs:590-618). Compares the
naive two-pass position-axis path (FeatureService — O(n·N): Spark's
sliding frame rebuilds the aggregate buffer per row) against the
block-decomposed position index (RowsFeatureService — O(n) build once,
O(1) per request). Numbers land in SCALING.md."""

from __future__ import annotations

import sys
import time
from datetime import datetime, timedelta

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from volga_spark.operators.request import FeatureService, masked  # noqa: E402
from volga_spark.operators.rows_index import RowsFeatureService  # noqa: E402
from volga_spark.operators.window import rows_frame  # noqa: E402
from volga_spark.session import get_spark  # noqa: E402

N_RECORDS = 200_000
N_KEYS = 40
PRECEDING = 10_000


def main() -> None:
    spark = get_spark("profile_rows_serving", cpus=32, shuffle_partitions=32)
    base = datetime(2024, 1, 1)
    state = (
        spark.range(N_RECORDS)
        .select(
            (F.col("id") % N_KEYS).alias("key"),
            (
                F.lit(base) + F.make_interval(secs=(F.col("id") / 10.0))
            ).alias("ts"),
            F.col("id").alias("seq"),
            (F.pmod(F.col("id") * 37, 10_000) / 100.0).alias("value"),
        )
        .localCheckpoint(eager=True)
    )
    naive = FeatureService(
        state,
        key_cols="key",
        ts_col="ts",
        frame=rows_frame(PRECEDING),
        tiebreak="seq",
        agg_builder=lambda w: {
            "mn": F.min(masked("value")).over(w),
            "mx": F.max(masked("value")).over(w),
        },
    )
    t0 = time.time()
    indexed = RowsFeatureService(
        state,
        key_cols="key",
        ts_col="ts",
        value_col="value",
        frame=rows_frame(PRECEDING),
        tiebreak="seq",
    )
    print(f"index build+pin: {time.time() - t0:.3f}s")
    t0 = time.time()
    bucketed = RowsFeatureService(
        state,
        key_cols="key",
        ts_col="ts",
        value_col="value",
        frame=rows_frame(PRECEDING),
        tiebreak="seq",
        bucket="auto",
    )
    print(f"bucketed build+pin: {time.time() - t0:.3f}s")
    # the SQL front end at the same shape: min/max over ROWS 10000
    # PRECEDING routes through the index (r13); sweep twin for comparison
    from volga_spark.api import PipelineSpec, SourceSpec  # noqa: E402

    sql = f"""
        SELECT key, min(value) OVER w AS mn, max(value) OVER w AS mx
        FROM st
        WINDOW w AS (PARTITION BY key ORDER BY ts
                 ROWS BETWEEN {PRECEDING} PRECEDING AND CURRENT ROW)
    """
    spec = PipelineSpec(
        sql=sql,
        sources=[SourceSpec("st", dataframe=state)],
        execution_mode="request",
    )
    sql_idx = spec.build_request_service(spark, tiebreak="seq")
    sql_sweep = spec.build_request_service(spark, tiebreak="seq")
    sql_sweep._index_routed = [False]  # force the Python-sweep twin

    span_s = N_RECORDS / 10.0
    for n_req in (1_000, 10_000, 50_000, 200_000):
        req = (
            spark.range(n_req)
            .select(
                F.col("id").alias("request_id"),
                (F.col("id") % N_KEYS).alias("key"),
                (
                    F.lit(base)
                    + F.make_interval(
                        secs=F.pmod(F.col("id") * 997.0, F.lit(span_s))
                    )
                ).alias("ts"),
            )
            .localCheckpoint(eager=True)
        )
        for name, svc in (
            ("naive", naive),
            ("index", indexed),
            ("index-bkt", bucketed),
            ("sql-idx", sql_idx),
            ("sql-sweep", sql_sweep),
        ):
            if name == "sql-sweep" and n_req > 1_000:
                continue  # O(state) python sweep per batch — one point suffices
            if name == "naive" and n_req > 10_000:
                # O(n·N) path: the per-batch cost is flat (~5s) — skip the
                # big batches, the point is the comparison
                continue
            svc.lookup(req, materialize=True)  # warm-up
            times = []
            for _ in range(3):
                t0 = time.time()
                tbl = svc.lookup(req, materialize=True)
                times.append(time.time() - t0)
                assert tbl.num_rows == n_req
            best = min(times)
            print(
                f"{name} batch={n_req:>7}: best {best:6.3f}s  "
                f"{n_req / best:>10,.0f} lookups/s   "
                f"(trials {['%.3f' % t for t in times]})"
            )
    naive.close()
    indexed.close()
    bucketed.close()
    sql_idx.close()
    sql_sweep.close()
    spark.stop()


if __name__ == "__main__":
    main()
