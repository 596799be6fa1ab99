"""The reference README's flagship pipeline shape — `users u JOIN orders o`
under UDAF windows (reference README.md:107-150) — through PipelineSpec.

Correctness baseline: the identical SQL over a PRE-JOINED single view (the
single-table path, which is driver-oracled via q_pipeline_sql). The join
normalization stage must produce bit-identical results to it.

Note: `*_cate_where` takes (value, condition, category) — the order the
reference's executable tests use (reference cate/tests/basic.rs:42); its
README example writes (value, category, condition), which its own engine
would reject (non-boolean filter).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from volga_spark.api.pipeline import PipelineSpec, SourceSpec
from volga_spark.tables import load_table

README_SQL = """
SELECT user_id,
       o.event_time,
       count(*) OVER w_short AS purchases_1h,
       sum(o.amount) OVER w_long AS spent_7d,
       top(o.product_id, 3) OVER w_long AS top_products_7d,
       topn_frequency(o.product_id, 3) OVER w_long AS top_product_freq_7d,
       top1_ratio(o.product_id) OVER w_rows AS top_product_dominance,
       sum_cate(o.amount, o.product_type) OVER w_long AS spent_per_category,
       count_cate_where(o.product_id, o.product_type = 'click',
                        o.product_type) OVER w_short AS click_count_1h
FROM users u JOIN orders_fact o ON u.user_id = o.buyer_id
WINDOW w_short AS (PARTITION BY user_id ORDER BY event_time
                   RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW),
       w_long AS (PARTITION BY user_id ORDER BY event_time
                  RANGE BETWEEN INTERVAL '7 day' PRECEDING AND CURRENT ROW),
       w_rows AS (PARTITION BY user_id ORDER BY event_time
                  ROWS BETWEEN 100 PRECEDING AND CURRENT ROW)
"""


def _tables(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    orders_fact = ev.select(
        F.col("event_id").alias("order_id"),
        F.col("user_id").alias("buyer_id"),
        F.col("ts").alias("event_time"),
        F.col("value").alias("amount"),
        F.col("event_type").alias("product_type"),
        (F.col("event_id") % 20).cast("string").alias("product_id"),
    )
    users = ev.select(F.col("user_id")).distinct()
    return users, orders_fact


def test_readme_join_pipeline_matches_prejoined(spark, sf_dir):
    users, orders_fact = _tables(spark, sf_dir)
    joined_spec = PipelineSpec(
        sql=README_SQL,
        sources=[
            SourceSpec("users", dataframe=users),
            SourceSpec("orders_fact", dataframe=orders_fact),
        ],
    )
    got = joined_spec.build(spark).toPandas()

    prejoined = users.join(
        orders_fact, users["user_id"] == orders_fact["buyer_id"]
    )
    flat_sql = README_SQL.replace(
        "FROM users u JOIN orders_fact o ON u.user_id = o.buyer_id",
        "FROM joined_flat",
    ).replace("o.", "")
    baseline_spec = PipelineSpec(
        sql=flat_sql, sources=[SourceSpec("joined_flat", dataframe=prejoined)]
    )
    expect = baseline_spec.build(spark).toPandas()

    key = ["user_id", "event_time", "purchases_1h"]
    got = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
    expect = expect.sort_values(key).reset_index(drop=True)[sorted(expect.columns)]
    assert list(got.columns) == list(expect.columns)
    assert len(got) > 0
    assert got.equals(expect), "joined pipeline diverges from pre-joined baseline"


def test_join_request_mode_matches_write_path(spark, sf_dir):
    """Request mode over a joined FROM: lookups at existing (key, ts) points
    equal the write path's rows (exact-value aggregates only — the same
    discipline as the single-table request parity test)."""
    users, orders_fact = _tables(spark, sf_dir)
    spec = PipelineSpec(
        sql="""
        SELECT order_id, user_id,
               count(*) OVER w AS cnt_1h,
               min(o.amount) OVER w AS min_1h,
               sum_cate(CAST(round(o.amount * 100) AS BIGINT),
                        o.product_type) OVER w AS sc_1h
        FROM users u JOIN orders_fact o ON u.user_id = o.buyer_id
        WINDOW w AS (PARTITION BY user_id ORDER BY event_time
                     RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
        """,
        sources=[
            SourceSpec("users", dataframe=users),
            SourceSpec("orders_fact", dataframe=orders_fact),
        ],
    )
    expected = {
        r.order_id: (r.cnt_1h, r.min_1h, r.sc_1h)
        for r in spec.build(spark).filter(F.col("order_id") % 7 == 0).collect()
    }
    assert expected
    svc = spec.build_request_service(spark)
    try:
        requests = orders_fact.filter(F.col("order_id") % 7 == 0).select(
            F.col("order_id").alias("request_id"),
            F.col("buyer_id").alias("user_id"),
            "event_time",
        )
        got = {
            r.request_id: (r.cnt_1h, r.min_1h, r.sc_1h)
            for r in svc.lookup(requests).collect()
        }
    finally:
        svc.close()
    assert got == expected


def test_join_with_where_clause_and_subquery(spark, sf_dir):
    """The relation scanner must stop at a TOP-LEVEL WHERE (kept outside the
    join stage) while a WHERE inside a FROM-subquery stays inside it; a
    numeric literal like 2.5 must survive qualifier stripping."""
    users, orders_fact = _tables(spark, sf_dir)
    spec = PipelineSpec(
        sql="""
        SELECT user_id, o.event_time,
               sum_cate(CAST(round(o.amount * 100) AS BIGINT),
                        o.product_type) OVER w AS sc
        FROM users u JOIN (SELECT * FROM orders_fact WHERE amount > 0.5) o
             ON u.user_id = o.buyer_id
        WHERE o.amount > 2.5
        WINDOW w AS (PARTITION BY user_id ORDER BY event_time
                     RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
        """,
        sources=[
            SourceSpec("users", dataframe=users),
            SourceSpec("orders_fact", dataframe=orders_fact),
        ],
    )
    got = spec.build(spark).toPandas()
    base = orders_fact.filter(F.col("amount") > 0.5).toPandas()
    # windows compute over the amount>0.5 relation (FROM-subquery filter =
    # pre-window); the top-level WHERE is an EMISSION filter (documented
    # PipelineSpec semantics) — it selects which rows are emitted, not
    # which rows feed the window state
    assert len(got) == (base["amount"] > 2.5).sum()
    assert (got["sc"].str.len() > 0).all()


def test_join_with_duplicate_columns_rejected(spark, sf_dir):
    users, orders_fact = _tables(spark, sf_dir)
    dup = orders_fact.withColumn("user_id", F.col("buyer_id"))
    spec = PipelineSpec(
        sql="""
        SELECT user_id, sum(o.amount) OVER w AS s
        FROM users u JOIN orders_dup o ON u.user_id = o.buyer_id
        WINDOW w AS (PARTITION BY user_id ORDER BY event_time
                     RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
        """,
        sources=[
            SourceSpec("users", dataframe=users),
            SourceSpec("orders_dup", dataframe=dup),
        ],
    )
    with pytest.raises(ValueError, match="duplicate columns"):
        spec.build(spark)
