"""TPC-H breadth suite: the SAME SQL text runs on Spark (`spark.sql` over
temp views) and DuckDB, results hash-compared — the deepest possible
ANSI-surface parity check (multi-way joins, correlated EXISTS / NOT
EXISTS, scalar subqueries, IN-subqueries, conditional aggregation).

Queries are all 21 TPC-H shapes beyond Q1 (Q2-Q22; Q1 is the driver-oracled
`q_tpch_q1` registry query, so the full 22-query surface is covered) adapted
to the
driver testdata's reduced column set (no l_commitdate / l_shipmode /
p_container / c_phone; synthetic NATION_N names — predicates substituted
with available columns/values, shapes preserved: correlated scalar
subqueries, EXISTS+NOT EXISTS on the same table, NOT IN, HAVING vs global
scalar, derived-view max, DISTINCT counting, nation-pair disjunctions,
conditional market-share fractions, year extraction over 6-8-way joins). Monetary aggregates go through DECIMAL(18,2) so sums
are order-independent-exact on both engines (the repo's float-parity
rule); ratios divide the two exact sums as doubles.
"""

from __future__ import annotations

import pytest

from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import TABLE_NAMES, load_table

DEC = "CAST({0} AS DECIMAL(18,2))"
REV = (
    "sum(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2))))"
)

QUERIES = {
    "q3_shipping_priority": f"""
        SELECT l_orderkey, o_orderdate, CAST({REV} AS DOUBLE) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate
    """,
    "q4_order_priority_exists": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
    "q5_local_supplier_volume": f"""
        SELECT n_name, CAST({REV} AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
    """,
    "q6_forecast_revenue": """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, CAST({REV} AS DOUBLE) AS revenue,
               c_acctbal, n_name
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
    """,
    "q12_priority_lines": """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders, lineitem
        WHERE o_orderkey = l_orderkey
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_linestatus
    """,
    "q14_promo_effect": f"""
        SELECT CAST(100.00 * CAST(sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l_discount AS DECIMAL(18,2)))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                    / CAST({REV} AS DOUBLE) AS DOUBLE) AS promo_revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
    "q18_large_volume_customer": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM customer, orders, lineitem
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    "q19_discounted_revenue": f"""
        SELECT CAST({REV} AS DOUBLE) AS revenue
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 21)
            OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
                AND l_quantity BETWEEN 10 AND 30)
            OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35
                AND l_quantity BETWEEN 20 AND 40))
    """,
    "q22_dormant_customers": """
        SELECT c_nationkey, count(*) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(max(c_acctbal) AS DOUBLE) / 2 FROM customer)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY c_nationkey
    """,
    # Q2 shape: correlated scalar subquery choosing the per-part minimum
    "q2_min_cost_supplier": """
        SELECT p_partkey, s_name, s_acctbal
        FROM part, supplier, lineitem
        WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
          AND p_size < 10
          AND s_acctbal = (SELECT max(s2.s_acctbal)
                           FROM supplier s2, lineitem l2
                           WHERE l2.l_partkey = p_partkey
                             AND l2.l_suppkey = s2.s_suppkey)
        GROUP BY p_partkey, s_name, s_acctbal
    """,
    # Q11 shape: HAVING against a global scalar subquery over the same agg
    "q11_important_stock": """
        SELECT l_partkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS value
        FROM lineitem
        GROUP BY l_partkey
        HAVING sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,2)))
               > (SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))
                             * CAST(l_quantity AS DECIMAL(18,2))) * 0.001
                  FROM lineitem)
    """,
    # Q15 shape: top revenue supplier(s) via derived view + scalar max
    "q15_top_supplier": f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no, {REV} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = supplier_no
          AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    # Q16 shape: distinct-count with a NOT IN subquery exclusion
    "q16_parts_supplier_count": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_brand <> 'Brand#1' AND p_size IN (1, 4, 7, 10, 13)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
    # Q17 shape: per-part average threshold from a correlated subquery
    "q17_small_quantity_revenue": """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / 7.0 AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey AND p_brand = 'Brand#1'
          AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = p_partkey)
    """,
    # Q7 shape: nation-pair volume with year extraction
    "q7_volume_shipping": f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(sum(volume) AS DOUBLE) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   EXTRACT(YEAR FROM l_shipdate) AS l_year,
                   CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
            FROM supplier, lineitem, orders, customer, nation n1, nation n2
            WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
              AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
              AND c_nationkey = n2.n_nationkey
              AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_4')
                OR (n1.n_name = 'NATION_4' AND n2.n_name = 'NATION_3'))
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
    # Q8 shape: market share — conditional fraction of a grouped sum
    "q8_market_share": f"""
        SELECT o_year,
               CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE) AS mkt_share
        FROM (
            SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
                   CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
                   n2.n_name AS nation
            FROM part, supplier, lineitem, orders, customer,
                 nation n1, nation n2, region
            WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
              AND l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND c_nationkey = n1.n_nationkey
              AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
              AND s_nationkey = n2.n_nationkey AND p_type = 'PROMO'
        ) all_nations
        GROUP BY o_year
    """,
    # Q9 shape: profit by nation and year (expression agg over a 6-way join)
    "q9_product_profit": """
        SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
        FROM (
            SELECT n_name AS nation,
                   EXTRACT(YEAR FROM o_orderdate) AS o_year,
                   CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2)))
                   - CAST(p_retailprice AS DECIMAL(18,2))
                     * CAST(l_quantity AS DECIMAL(18,2)) AS amount
            FROM part, supplier, lineitem, orders, nation
            WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
              AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
              AND p_name LIKE '%a%'
        ) profit
        GROUP BY nation, o_year
    """,
    # Q13 shape: LEFT OUTER JOIN with an extra join-side predicate, then a
    # distribution over the per-customer counts (two-level group by; the
    # o_comment NOT LIKE filter substituted with o_orderpriority per the
    # reduced column set)
    "q13_customer_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey
             AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
    """,
    # Q20 shape: nested IN subqueries with a correlated half-of-shipped-qty
    # threshold (the availqty predicate substituted with an acctbal bound on
    # the per-(part,supplier) shipped total per the reduced column set)
    "q20_promotion_part_suppliers": """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l1.l_suppkey FROM lineitem l1
            WHERE l1.l_partkey IN (SELECT p_partkey FROM part
                                   WHERE p_name LIKE 'small%')
              AND l1.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l1.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l1.l_suppkey, l1.l_partkey
            HAVING sum(CAST(l1.l_quantity AS DECIMAL(18,2)))
                   > (SELECT 0.2 * sum(CAST(l2.l_quantity AS DECIMAL(18,2)))
                      FROM lineitem l2
                      WHERE l2.l_partkey = l1.l_partkey
                        AND l2.l_suppkey = l1.l_suppkey)
        )
          AND s_acctbal > 0
    """,
    # Q21 shape: EXISTS + NOT EXISTS on the same table with role predicates
    "q21_waiting_supplier": """
        SELECT l1.l_suppkey, count(*) AS numwait
        FROM lineitem l1, orders
        WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY l1.l_suppkey
    """,
}


@pytest.fixture(scope="module")
def tpch_views(spark, sf_dir):
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    yield
    for t in TABLE_NAMES:
        spark.catalog.dropTempView(t)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_tpch_query_matches_duckdb(spark, sf_dir, tpch_views, name):
    sql = QUERIES[name]
    got = spark.sql(sql).toPandas()
    oracle = run_oracle(sql, sf_dir)
    assert len(got) > 0, f"{name}: empty result"
    problems = compare_frames(got, oracle)
    assert not problems, f"{name}: " + "; ".join(problems)
