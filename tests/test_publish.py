"""Write-audit-publish: versions commit atomically behind the LATEST
pointer, failed audits leave no new version visible, published versions are
immutable and time-travelable."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from volga_spark.operators.expectations import in_range, min_rows, not_null
from volga_spark.operators.publish import (
    latest_version,
    publish_version,
    read_latest,
    read_version,
)
from volga_spark.tables import load_table


def test_publish_and_read_roundtrip(spark, sf_dir, tmp_path):
    root = str(tmp_path / "corpus")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    v = publish_version(
        docs, root, checks=[not_null("doc_id"), min_rows(1)]
    )
    assert v == 1 and latest_version(root) == 1
    got = read_latest(spark, root)
    assert got.count() == docs.count()
    assert sorted(got.columns) == ["doc_id", "text"]


def test_versions_increment_and_time_travel(spark, sf_dir, tmp_path):
    root = str(tmp_path / "corpus")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    publish_version(docs.filter(F.col("doc_id") < 100), root)
    publish_version(docs, root)
    assert latest_version(root) == 2
    assert read_version(spark, root, 1).count() == 100
    assert read_latest(spark, root).count() == docs.count()


def test_failed_audit_publishes_nothing(spark, sf_dir, tmp_path):
    root = str(tmp_path / "corpus")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    publish_version(docs, root)
    before = latest_version(root)
    # v2 candidate fails its row-floor audit
    with pytest.raises(ValueError, match="expectations failed"):
        publish_version(
            docs.filter(F.col("doc_id") < 0), root,
            checks=[min_rows(1)],
        )
    assert latest_version(root) == before  # pointer untouched
    assert not os.path.isdir(os.path.join(root, "v2"))  # no version dir
    # staged files remain for inspection
    staged = os.listdir(os.path.join(root, "_staging"))
    assert any(s.startswith("v2-") for s in staged)
    # and the next successful publish still gets v2
    assert publish_version(docs, root) == 2


def test_audit_runs_on_staged_files(spark, tmp_path):
    """The audit reads what was WRITTEN: a value-range check fails on the
    actual staged data even though the input plan would lazily recompute."""
    root = str(tmp_path / "ds")
    df = spark.createDataFrame([(1, 5.0), (2, 99.0)], "id bigint, v double")
    with pytest.raises(ValueError, match="in_range"):
        publish_version(df, root, checks=[in_range("v", 0.0, 10.0)])
    assert latest_version(root) is None


def test_publish_on_explicit_file_uri(spark, tmp_path):
    """Publish routes every path op through the Hadoop FileSystem resolved
    from the root URI, so an explicit scheme (file://) behaves identically
    to a bare local path — the regression that motivated the Hadoop FS
    rewrite (write and publish must share one filesystem)."""
    from volga_spark.operators.expectations import min_rows
    from volga_spark.operators.publish import (
        latest_version,
        publish_version,
        read_latest,
    )

    root = "file://" + str(tmp_path / "ds_uri")
    df = spark.createDataFrame([(i,) for i in range(10)], "id int")
    v1 = publish_version(df, root, checks=[min_rows(1)])
    assert v1 == 1
    assert latest_version(root, spark) == 1
    assert read_latest(spark, root).count() == 10
    v2 = publish_version(df.limit(4), root, checks=[min_rows(1)])
    assert v2 == 2
    assert read_latest(spark, root).count() == 4


def test_rollback_and_rollforward(spark, sf_dir, tmp_path):
    from volga_spark.operators.publish import rollback

    root = str(tmp_path / "corpus")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    publish_version(docs.filter(F.col("doc_id") < 100), root)
    publish_version(docs, root)
    rollback(root, 1)
    assert latest_version(root) == 1
    assert read_latest(spark, root).count() == 100
    # newer version still on disk — re-rollforward works
    rollback(root, 2)
    assert read_latest(spark, root).count() == docs.count()
    with pytest.raises(FileNotFoundError, match="v9"):
        rollback(root, 9)


def test_vacuum_keeps_window_and_pointer_target(spark, sf_dir, tmp_path):
    from volga_spark.operators.publish import rollback, vacuum

    root = str(tmp_path / "corpus")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for n in (10, 20, 30, 40):
        publish_version(docs.filter(F.col("doc_id") < n), root)
    # pointer at v4; keep_last=2 removes v1, v2
    assert vacuum(root, keep_last=2) == [1, 2]
    assert read_version(spark, root, 3).count() == 30
    assert read_latest(spark, root).count() == 40
    assert not os.path.exists(f"{root}/v1")
    # a rolled-back pointer target is pinned even outside the keep window
    publish_version(docs.filter(F.col("doc_id") < 50), root)  # v5
    rollback(root, 3)
    assert vacuum(root, keep_last=1) == [4]  # v3 pinned by LATEST, v5 kept
    assert read_latest(spark, root).count() == 30
    assert read_version(spark, root, 5).count() == 50
