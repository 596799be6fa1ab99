"""Compaction: many small files → planned target count, data bit-identical,
atomic version publish, clustering preserved with sort_cols."""

from __future__ import annotations

from volga_spark.operators.compaction import (
    compact_version,
    plan_compaction,
)
from volga_spark.operators.publish import (
    latest_version,
    publish_version,
    read_latest,
    read_version,
)


def _publish_fragmented(spark, root, n_rows=2000, n_files=64):
    df = spark.range(n_rows).selectExpr(
        "id AS k", "CAST(id % 97 AS DOUBLE) AS v"
    )
    publish_version(df.repartition(n_files), root)
    return df


def test_compaction_reduces_files_and_preserves_data(spark, tmp_path):
    root = str(tmp_path / "ds")
    df = _publish_fragmented(spark, root)

    before = plan_compaction(spark, f"{root}/v1", target_bytes=1 << 20)
    assert before["n_files"] >= 32  # genuinely fragmented
    stats = compact_version(spark, root, target_bytes=1 << 20)
    assert stats["version"] == 2 and latest_version(root, spark) == 2

    after = plan_compaction(spark, f"{root}/v2", target_bytes=1 << 20)
    assert after["n_files"] == stats["target_files"] < before["n_files"]

    got = sorted(map(tuple, read_latest(spark, root).collect()))
    want = sorted(map(tuple, df.collect()))
    assert got == want
    # old layout remains time-travelable
    assert read_version(spark, root, 1).count() == len(want)


def test_compaction_with_sort_cols_clusters_ranges(spark, tmp_path):
    root = str(tmp_path / "ds_sorted")
    _publish_fragmented(spark, root, n_rows=5000, n_files=40)
    compact_version(spark, root, target_bytes=64 * 1024, sort_cols=["k"])

    # per-file k-ranges are disjoint (zone-map clustering): check footer
    # min/max via a per-file aggregate
    import glob

    from pyspark.sql import functions as F

    ranges = []
    for f in sorted(glob.glob(f"{root}/v2/*.parquet")):
        r = (
            spark.read.parquet(f)
            .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
            .collect()[0]
        )
        if r["lo"] is not None:
            ranges.append((r["lo"], r["hi"]))
    ranges.sort()
    assert len(ranges) >= 2
    for (al, ah), (bl, bh) in zip(ranges, ranges[1:]):
        assert ah < bl  # disjoint, ordered


def test_compaction_requires_published_dataset(spark, tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        compact_version(spark, str(tmp_path / "nope"))
