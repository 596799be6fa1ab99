"""Backfill ledger: exactly-once partition processing, catch-up after new
arrivals, crash-window idempotency, pruned source scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.backfill import (
    pending_partitions,
    read_backfilled,
    run_backfill,
)


def _write_source(spark, path, days):
    df = spark.createDataFrame(
        [(d, i, float(i * 2)) for d in days for i in range(20)],
        "dt string, k bigint, v double",
    )
    df.write.mode("append").partitionBy("dt").parquet(path)


def _agg(df):
    return df.groupBy("dt", "k").agg(F.sum("v").alias("total"))


def test_backfill_processes_once_and_catches_up(spark, tmp_path):
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    _write_source(spark, src, ["d1", "d2", "d3"])

    done = run_backfill(spark, src, tgt, "dt", _agg)
    assert sorted(done) == ["d1", "d2", "d3"]
    assert read_backfilled(spark, tgt).count() == 60
    # caught up: second run is a no-op
    assert run_backfill(spark, src, tgt, "dt", _agg) == []

    # two new partitions arrive → only those process
    _write_source(spark, src, ["d4", "d5"])
    assert pending_partitions(spark, src, tgt, "dt") == ["d4", "d5"]
    done2 = run_backfill(spark, src, tgt, "dt", _agg)
    assert sorted(done2) == ["d4", "d5"]
    got = read_backfilled(spark, tgt)
    assert got.select("dt").distinct().count() == 5
    # derived values correct per partition
    row = got.filter("dt = 'd4' AND k = 3").collect()[0]
    assert row["total"] == 6.0


def test_crash_between_data_and_marker_is_idempotent(spark, tmp_path):
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    _write_source(spark, src, ["d1", "d2"])
    run_backfill(spark, src, tgt, "dt", _agg)

    # simulate the crash window: d2's marker vanishes after its data landed
    import os

    os.remove(f"{tgt}/_backfill_ledger/dt=d2")
    assert pending_partitions(spark, src, tgt, "dt") == ["d2"]
    done = run_backfill(spark, src, tgt, "dt", _agg)
    assert done == ["d2"]
    # dynamic overwrite → no duplicated rows for d2
    assert read_backfilled(spark, tgt).filter("dt = 'd2'").count() == 20


def test_transform_must_keep_partition_column(spark, tmp_path):
    import pytest

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    _write_source(spark, src, ["d1"])
    with pytest.raises(ValueError, match="partition column"):
        run_backfill(
            spark, src, tgt, "dt", lambda df: df.select("k", "v")
        )


def test_max_partitions_limits_a_run(spark, tmp_path):
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    _write_source(spark, src, ["d1", "d2", "d3"])
    assert run_backfill(spark, src, tgt, "dt", _agg, max_partitions=2) == [
        "d1",
        "d2",
    ]
    assert pending_partitions(spark, src, tgt, "dt") == ["d3"]


def test_crashed_debris_cleared_even_when_rerun_emits_zero_rows(spark, tmp_path):
    """Dynamic overwrite only replaces partitions PRESENT in the output;
    a re-run whose transform filters a crashed partition down to 0 rows
    must still clear that partition's debris before marking it done."""
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    _write_source(spark, src, ["d1", "d2"])

    # simulate a crashed first run: partial garbage landed under d2's
    # output dir but no marker was written
    spark.createDataFrame(
        [("d2", 999, 123.0)], "dt string, k bigint, total double"
    ).write.mode("append").partitionBy("dt").parquet(f"{tgt}/data")

    # the (fixed) transform drops every d2 row
    def agg_without_d2(df):
        return _agg(df.filter(F.col("dt") != "d2"))

    done = run_backfill(spark, src, tgt, "dt", agg_without_d2)
    assert sorted(done) == ["d1", "d2"]
    got = read_backfilled(spark, tgt)
    assert got.filter("dt = 'd2'").count() == 0  # debris gone
    assert got.filter("dt = 'd1'").count() == 20
    # and d2 is marked: no reprocessing loop
    assert pending_partitions(spark, src, tgt, "dt") == []
