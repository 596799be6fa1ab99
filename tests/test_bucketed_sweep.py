"""The time-bucketed (hot-key-splitting) sweep must equal the unbucketed
sweep exactly — warm-up replication supplies full window context across
bucket boundaries."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from volga_spark.functions.cate_top import sum_cate, top1_ratio
from volga_spark.functions.sliding import apply_sliding_aggs
from volga_spark.operators.window import cents, range_frame
from volga_spark.tables import load_table


def _run(spark, sf_dir, bucket_by):
    ev = load_table(spark, sf_dir, "events")
    return (
        apply_sliding_aggs(
            ev,
            partition_by="user_id",
            order_by="ts",
            frame=range_frame("1 hour"),
            specs=[
                sum_cate("sc", "vc", "event_type", scale=100.0),
                top1_ratio("t1", "event_type"),
            ],
            passthrough=["event_id"],
            prepared={"vc": cents("value")},
            bucket_by=bucket_by,
        )
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )


def test_bucketed_equals_unbucketed(spark, sf_dir):
    plain = _run(spark, sf_dir, None)
    bucketed = _run(spark, sf_dir, "6 hours")
    assert len(plain) == len(bucketed)
    pd.testing.assert_frame_equal(plain, bucketed[plain.columns])


def test_bucket_shorter_than_frame_rejected(spark, sf_dir):
    import pytest

    with pytest.raises(ValueError):
        _run(spark, sf_dir, "30 minutes")
