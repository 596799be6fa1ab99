"""Write-path layout verification: hive partition pruning + range clustering.

At 100 TB the WRITE layout decides the read cost: these tests prove (a) a
date-partitioned write turns a date predicate into `PartitionFilters` (the
scan never opens non-matching dirs), and (b) a range-clustered write makes
per-file min/max footer stats disjoint, so selective predicates skip files.
Round-trip contents are DuckDB-checked against the original table.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from volga_spark.operators.layout import (
    file_column_ranges,
    write_bucketed,
    write_partitioned,
    write_range_clustered,
)
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table


def _tmp(name: str) -> str:
    return os.path.join(tempfile.gettempdir(), "volga_spark_layout", name)


def test_partitioned_write_prunes_and_roundtrips(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = _tmp("events_by_date")
    back = write_partitioned(ev, path, ["event_date"])

    # contents survive the round trip (per-date counts vs DuckDB on the source)
    got = (
        back.groupBy("event_date")
        .agg(F.count("*").alias("n"))
        .withColumn("event_date", F.col("event_date").cast("string"))
        .toPandas()
    )
    oracle = run_oracle(
        "SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,"
        " count(*) AS n FROM events GROUP BY 1",
        sf_dir,
    )
    assert not compare_frames(got, oracle)

    # the date predicate becomes a partition filter, not a data filter
    one_day = back.filter(F.col("event_date") == "2024-01-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_date" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    # and it actually pruned: the pruned scan reads fewer files than exist
    n_dirs = len(
        [d for d in os.listdir(path) if d.startswith("event_date=")]
    )
    assert n_dirs >= 25  # ~30 days of events
    assert one_day.count() == ev.filter(F.to_date("ts") == "2024-01-05").count()


def test_range_clustered_files_are_disjoint(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    path = _tmp("lineitem_by_shipdate")
    back = write_range_clustered(li, path, ["l_shipdate"], n_files=8)
    assert back.count() == li.count()

    ranges = file_column_ranges(path, "l_shipdate")
    assert len(ranges) >= 4
    # disjoint zone maps: sort by min; each file's max <= next file's min
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)


def test_bucketed_join_skips_both_shuffles(spark, sf_dir):
    """Co-bucketed tables join with ZERO Exchange on either side (and zero
    Sort, since sortBy matches the join key) — the write-time layout that
    amortizes a fact⋈fact shuffle across every downstream query. Control:
    the identical join over plain parquet shuffles both sides."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))

    t_events = write_bucketed(
        ev.select("event_id", "user_id", "value"),
        "events_bucketed", _tmp("events_bucketed"),
        bucket_cols=["user_id"], num_buckets=8, sort_cols=["user_id"],
    )
    t_stats = write_bucketed(
        agg, "user_stats_bucketed", _tmp("user_stats_bucketed"),
        bucket_cols=["user_id"], num_buckets=8, sort_cols=["user_id"],
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = t_events.join(t_stats, "user_id")
        n = joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:3000]
        assert "SortMergeJoin" in plan, plan[:3000]

        # control: same join over non-bucketed reads shuffles both sides
        pe = spark.read.parquet(_tmp("events_bucketed"))
        ps = spark.read.parquet(_tmp("user_stats_bucketed"))
        ctrl = pe.join(ps, "user_id")
        n_ctrl = ctrl.count()
        ctrl_plan = ctrl._jdf.queryExecution().executedPlan().toString()
        assert ctrl_plan.count("Exchange") >= 2, ctrl_plan[:3000]
        assert n == n_ctrl == ev.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS events_bucketed")
        spark.sql("DROP TABLE IF EXISTS user_stats_bucketed")


def test_bucketed_groupby_skips_shuffle_and_prunes_buckets(spark, sf_dir):
    """A bucketed scan satisfies the aggregation's required distribution
    (no Exchange before the group-by), and an equality predicate on the
    bucket column prunes the scan to 1/N of the buckets."""
    ev = load_table(spark, sf_dir, "events")
    t = write_bucketed(
        ev.select("event_id", "user_id", "value"),
        "events_bucketed_agg", _tmp("events_bucketed_agg"),
        bucket_cols=["user_id"], num_buckets=8,
    )
    try:
        grouped = t.groupBy("user_id").agg(F.sum("value").alias("s"))
        grouped.count()
        plan = grouped._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:3000]

        # bucket pruning: the planner's auto-bucketed-scan heuristic turns
        # the bucketed read OFF when no operator needs the distribution
        # (plain filter), which also forfeits pruning — pin it on, as a
        # point-lookup-heavy deployment would
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        one_key = t.filter(F.col("user_id") == 7)
        one_key.count()
        kplan = one_key._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in kplan, kplan[:3000]
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.sql("DROP TABLE IF EXISTS events_bucketed_agg")


def test_unclustered_files_overlap(spark, sf_dir):
    """Control: the same data hash-shuffled produces overlapping ranges —
    i.e. the disjointness above is the clustering, not the data."""
    li = load_table(spark, sf_dir, "lineitem")
    path = _tmp("lineitem_hashed")
    li.repartition(8, "l_orderkey").write.mode("overwrite").parquet(path)
    ranges = file_column_ranges(path, "l_shipdate")
    ranges.sort()
    overlaps = sum(1 for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]) if hi1 > lo2)
    assert overlaps > 0


def test_zorder_bounds_ranges_on_both_columns(spark, sf_dir):
    """Z-order vs 1-D range clustering on (user_id, value): the 1-D layout
    leaves `value` unclustered (every file spans ~the full value range);
    Z-order bounds the average per-file span on BOTH columns below the
    1-D layout's span on its unclustered column. Round-trip contents and
    row counts are preserved."""
    from volga_spark.operators.layout import write_zorder_clustered

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    zpath = _tmp("events_zorder")
    rpath = _tmp("events_range_1d")
    back = write_zorder_clustered(ev, zpath, ["user_id", "value"], n_files=16)
    assert back.count() == ev.count()
    write_range_clustered(ev, rpath, ["user_id"], n_files=16)

    def spans(path, column):
        ranges = file_column_ranges(path, column)
        lo = min(r[0] for r in ranges)
        hi = max(r[1] for r in ranges)
        width = (hi - lo) or 1
        return [(r[1] - r[0]) / width for r in ranges]

    def avg(xs):
        return sum(xs) / len(xs)

    # the 1-D control: value is unclustered -> files span most of the range
    ctrl_value = avg(spans(rpath, "value"))
    assert ctrl_value > 0.6, ctrl_value
    # z-order: both columns bounded, and strictly better than the control
    # on the column the 1-D layout ignores
    z_user = avg(spans(zpath, "user_id"))
    z_value = avg(spans(zpath, "value"))
    assert z_user < 0.5, z_user
    assert z_value < 0.5, z_value
    assert z_value < ctrl_value

    # contents survive (sum of values exact via cents)
    import pyspark.sql.functions as F

    a = ev.agg(F.sum(F.round(F.col("value") * 100).cast("long"))).first()[0]
    b = back.agg(F.sum(F.round(F.col("value") * 100).cast("long"))).first()[0]
    assert a == b


def test_compact_files_reduces_file_count(spark, sf_dir):
    """A deliberately fragmented write compacts to ~target size with
    contents preserved (exact cents-sum)."""
    from volga_spark.operators.layout import compact_files

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    frag = _tmp("events_fragmented")
    ev.repartition(64).write.mode("overwrite").parquet(frag)
    import glob

    n_before = len(glob.glob(os.path.join(frag, "*.parquet")))
    assert n_before >= 32

    out = _tmp("events_compacted")
    back = compact_files(frag, spark, target_file_mb=256, out_path=out)
    n_after = len(glob.glob(os.path.join(out, "*.parquet")))
    assert n_after < n_before / 4
    a = ev.agg(F.sum(F.round(F.col("value") * 100).cast("long"))).first()[0]
    b = back.agg(F.sum(F.round(F.col("value") * 100).cast("long"))).first()[0]
    assert a == b and back.count() == ev.count()

    # in-place compaction also round-trips
    back2 = compact_files(frag, spark, target_file_mb=256)
    assert back2.count() == ev.count()
    assert len(glob.glob(os.path.join(frag, "*.parquet"))) < n_before / 4
