"""SpaceSaving heavy hitters: exactness, guarantee bounds, streaming fold."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from volga_spark.operators.sketches import heavy_hitters, heavy_hitters_stream
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.streaming import run_available_now_to_memory
from volga_spark.streaming.sources import chunked_file_stream
from volga_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_exact_when_capacity_generous(spark):
    """capacity ≥ distinct → no evictions → the sketch IS the exact groupBy,
    so it hash-compares against DuckDB like any exact operator."""
    ev = load_table(spark, SF, "events")
    got = heavy_hitters(ev, "event_type", capacity=64).toPandas()
    want = run_oracle(
        """
        SELECT event_type AS item, count(*) AS est, CAST(0 AS BIGINT) AS err
        FROM events GROUP BY event_type
        """,
        SF,
    )
    assert compare_frames(got, want) == []
    assert (got["err"] == 0).all()


def _zipf_df(spark, n_items=300, scale=3000):
    rows = [(f"item_{i:04d}",) for i in range(1, n_items + 1) for _ in range(scale // i)]
    return spark.createDataFrame(rows, "v string"), Counter(r[0] for r in rows)


def test_bounds_on_skewed_corpus(spark):
    df, truth = _zipf_df(spark)
    n = sum(truth.values())
    cap = 32
    out = {r["item"]: r for r in heavy_hitters(df.repartition(8), "v", capacity=cap).collect()}
    bound = n / cap
    # completeness: every true heavy item (count > N/capacity) is reported
    for item, true in truth.items():
        if true > bound:
            assert item in out, f"heavy item {item} (true={true}) missing"
    # accuracy on everything reported
    for item, r in out.items():
        true = truth[item]
        assert r["est"] - r["err"] <= true <= r["est"] + bound
        assert abs(r["est"] - true) <= bound


def test_deterministic_given_partitioning(spark):
    df, _ = _zipf_df(spark, n_items=100, scale=1000)
    fixed = df.repartition(4, "v")  # hash-partitioned: stable item placement
    a = heavy_hitters(fixed, "v", capacity=16, k=10).collect()
    b = heavy_hitters(fixed, "v", capacity=16, k=10).collect()
    assert a == b


def test_topk_limit(spark):
    df, truth = _zipf_df(spark, n_items=50, scale=1000)
    top3 = heavy_hitters(df, "v", capacity=64, k=3).collect()
    # generous capacity → exact, so top-3 is the true top-3
    want = [i for i, _ in truth.most_common(3)]
    assert [r["item"] for r in top3] == want


def test_streaming_fold_exact_with_generous_capacity(spark):
    ev = load_table(spark, SF, "events")
    truth = {
        r["event_type"]: r["cnt"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    stream, _ = chunked_file_stream(spark, SF, "events", "ts", n_chunks=3)
    res = run_available_now_to_memory(
        heavy_hitters_stream(stream, "event_type", capacity=64),
        output_mode="update",
    ).toPandas()
    last = res[res["version"] == res["version"].max()]
    got = dict(zip(last["item"], last["est"]))
    assert got == truth
    assert (last["err"] == 0).all()
    assert res["version"].max() >= 2  # the fold genuinely ran across batches


def test_streaming_bounded_capacity_keeps_guarantees(spark):
    ev = load_table(spark, SF, "events")
    truth = {
        r["event_type"]: r["cnt"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    n = sum(truth.values())
    cap = 3
    stream, _ = chunked_file_stream(spark, SF, "events", "ts", n_chunks=3)
    res = run_available_now_to_memory(
        heavy_hitters_stream(stream, "event_type", capacity=cap),
        output_mode="update",
    ).toPandas()
    last = res[res["version"] == res["version"].max()]
    assert len(last) <= cap  # state stayed bounded
    for _, r in last.iterrows():
        true = truth[r["item"]]
        assert r["est"] - r["err"] <= true <= r["est"] + n / cap
