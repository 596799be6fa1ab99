"""Bloom semi-join reduction: zero false negatives (join equality), fpp
within theory, native map-side probe plan, determinism."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from volga_spark.operators.bloom import (
    bloom_semi_filter,
    build_bloom,
    might_contain,
)


def test_no_false_negatives_join_equality(spark, sf_dir):
    """bloom-filtered join == unfiltered join, exactly."""
    from volga_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    # selective build side: ~2% of orders
    o = (
        load_table(spark, sf_dir, "orders")
        .filter("o_orderkey % 50 = 0")
        .select("o_orderkey", "o_totalprice")
    )
    pruned = bloom_semi_filter(li, o, "l_orderkey", build_key_col="o_orderkey")
    j1 = sorted(
        map(
            tuple,
            pruned.join(o, pruned["l_orderkey"] == o["o_orderkey"]).collect(),
        )
    )
    j2 = sorted(
        map(tuple, li.join(o, li["l_orderkey"] == o["o_orderkey"]).collect())
    )
    assert j1 == j2 and len(j2) > 0


def test_fpp_within_theory(spark):
    keys = spark.range(0, 2000).select(F.col("id").alias("k"))
    bf = build_bloom(keys, "k", expected_items=2000)
    # probe with 20k keys that are all absent
    probe = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
    fp = probe.filter(might_contain(bf, "k")).count()
    theory = (1 - math.exp(-bf.k * 2000 / bf.n_bits)) ** bf.k
    assert fp / 20_000 <= max(3 * theory, 0.02), (fp, theory)
    # and every present key passes (no false negatives, directly)
    assert keys.filter(might_contain(bf, "k")).count() == 2000


def test_probe_is_native_and_mapside(spark):
    import contextlib
    import io

    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    bf = build_bloom(keys, "k", expected_items=500)
    fact = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    agg = fact.filter(might_contain(bf, "k")).groupBy().sum("v")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        agg.explain("formatted")
    p = buf.getvalue()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # the probe filter sits under the aggregate, upstream of any exchange:
    # the Filter node appears before the first Exchange in plan order
    filter_pos = p.find("Filter")
    exch_pos = p.find("Exchange")
    assert filter_pos != -1
    assert exch_pos == -1 or filter_pos > exch_pos  # formatted plan lists
    # operators leaf-last; "after" in text = upstream in dataflow


def test_deterministic_across_partitionings(spark):
    keys = spark.range(0, 1000).select(F.col("id").alias("k"))
    a = build_bloom(keys, "k", expected_items=1000)
    b = build_bloom(keys.repartition(17), "k", expected_items=1000)
    assert (a.words == b.words).all() and a.k == b.k and a.n_bits == b.n_bits


def test_mixed_int_width_keys_have_no_false_negatives(spark):
    """xxhash64 hashes int32 and int64 representations of the same value
    differently; the filter normalizes both sides to a canonical bigint
    (double for floats), so an int-keyed fact probing a bigint-built
    filter (or vice versa) loses no true matches."""
    from volga_spark.operators.bloom import build_bloom, might_contain

    build = spark.createDataFrame([(i,) for i in range(0, 200, 2)], "k bigint")
    fact = spark.range(200).select(F.col("id").cast("int").alias("k"))
    bf = build_bloom(build, "k")
    kept = {r["k"] for r in fact.filter(might_contain(bf, "k")).collect()}
    assert set(range(0, 200, 2)) <= kept  # every true match survives

    # and the reverse width direction
    bf2 = build_bloom(
        spark.createDataFrame([(i,) for i in range(0, 200, 2)], "k int"), "k"
    )
    fact2 = spark.range(200).select(F.col("id").alias("k"))
    kept2 = {r["k"] for r in fact2.filter(might_contain(bf2, "k")).collect()}
    assert set(range(0, 200, 2)) <= kept2
