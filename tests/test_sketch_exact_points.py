"""Exact-operating-point pins for the sketch surface (r08 verdict #4).

q_approx_sketches' 'sketch' leg claims exactness BY CONSTRUCTION, not by
DuckDB coincidence:

- DataSketches HLL stays in its exact coupon (LIST/SET) phase while the
  observed cardinality is far below 2^lgConfigK; at lgK=21 this corpus's
  per-group cardinalities are orders of magnitude inside the phase, so the
  estimate is the exact distinct count. The same query at lgK=12 (HLL
  phase) must NOT be exact — proving the exactness is the operating
  point's property, not an accident.
- percentile_approx with accuracy >= group size has relative rank error
  1/accuracy < 1/n, so the quantile summary retains every value and the
  result equals the exact discrete percentile.

The APPROXIMATE operating points (default rsd / default accuracy) keep
their error-bound pins here — they left the driver-oracled query but stay
first-class behavior.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.tables import load_table

SF = "/root/testdata/sf0.01"


def _exact(spark):
    li = load_table(spark, SF, "lineitem")
    return {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50_cont"),
        )
        .collect()
    }


def test_hll_lgk21_exact_but_lgk12_not(spark):
    li = load_table(spark, SF, "lineitem")
    exact = _exact(spark)
    rows = li.groupBy("l_returnflag").agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 21))").alias("e21"),
        F.expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 12))").alias("e12"),
    ).collect()
    assert all(r.e21 == exact[r.l_returnflag].parts for r in rows)
    # lgK=12 has left the coupon phase at ~7k distincts per group: still
    # within the HLL error envelope, but NOT exact — the operating-point pin
    assert any(r.e12 != exact[r.l_returnflag].parts for r in rows)
    assert all(
        abs(r.e12 - exact[r.l_returnflag].parts) / exact[r.l_returnflag].parts
        < 0.1
        for r in rows
    )


def test_percentile_exact_accuracy_matches_sorted_rank(spark):
    """accuracy >= n: percentile_approx returns an actual data element
    equal to the exact discrete percentile (checked against a sort)."""
    li = load_table(spark, SF, "lineitem")
    got = {
        r.l_returnflag: (r.p50, r.p99)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 10_000_000).alias("p50"),
            F.percentile_approx("l_extendedprice", 0.99, 10_000_000).alias("p99"),
        )
        .collect()
    }
    pdf = li.select("l_returnflag", "l_extendedprice").toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        vals = sorted(grp["l_extendedprice"])
        n = len(vals)
        for p, v in zip((0.5, 0.99), got[flag]):
            # GK summary at eps < 1/n returns the element at rank
            # ceil(p * n) (1-based) — the exact discrete percentile
            import math

            assert v == vals[max(math.ceil(p * n), 1) - 1]
            assert v in set(vals)  # an actual element, not an interpolation


def test_default_operating_points_keep_error_bounds(spark):
    """The approximate settings that LEFT the driver-oracled query: default
    rsd approx_count_distinct and default-accuracy percentile_approx."""
    li = load_table(spark, SF, "lineitem")
    exact = _exact(spark)
    rows = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("acd"),
        F.percentile_approx("l_extendedprice", 0.5).alias("p50"),
    ).collect()
    for r in rows:
        e = exact[r.l_returnflag]
        assert abs(r.acd - e.parts) / e.parts < 0.1
        assert abs(r.p50 - e.p50_cont) / e.p50_cont < 0.05
