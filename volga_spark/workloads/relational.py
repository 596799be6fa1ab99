"""Relational surface (SURVEY §2.1-2.7, §2.3 scalar exprs).

Covers the reference's 18 e2e SQL cases (reference src/sql_testing/
sql_tests.rs:215-475: SELECT */cols, WHERE =,!=,<,>,AND,OR,IN,BETWEEN,LIKE,
GROUP BY COUNT/SUM/AVG/MIN/MAX, HAVING, computed cols, CASE WHEN, aliases),
the multi-stage CTE group-by (src/api/planner.rs:808-832), and the join
surface the reference advertises but stubs (README.md:143-148,
src/runtime/functions/join/join_function.rs:14-37) — here real Spark joins.

Scale notes: every query below is pure DataFrame API → Catalyst plans it
(pushdown, partial aggregation, broadcast joins for dims). No Python in the
hot path anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.tables import load_table
from volga_spark.workloads import workload
from volga_spark.workloads._util import davg, dec, dsum, duck_davg, duck_dsum


# --- scans / filters / scalar expressions -------------------------------------

# q_select_all was folded into q_scalar_exprs in r06 (leg-tagged union —
# the 'all' leg is the full-table SELECT * scan) to keep the registry at
# the driver gate's 50-row cap while freeing a slot for BM25 retrieval.


@workload(
    "q_filter_scan",
    oracle="""
        SELECT 'li' AS leg, l_orderkey AS k, l_quantity AS v1, l_extendedprice AS v2
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity > 25
        UNION ALL
        SELECT 'ord' AS leg, o_orderkey AS k, o_totalprice AS v1,
               CAST(NULL AS DOUBLE) AS v2
        FROM orders
        WHERE (o_orderstatus = 'F' AND o_totalprice > 200000.0)
           OR (o_orderpriority IN ('1-URGENT', '2-HIGH')
               AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
               AND o_orderpriority LIKE '%H%')
    """,
    tags=("scan", "filter"),
)
def q_filter_scan(spark, sf_dir):
    """Filter capability in one leg-tagged union (sql_tests WHERE matrix):
    the 'li' leg is projection + simple predicates pushed down to the
    parquet scan; the 'ord' leg is the AND/OR/IN/BETWEEN/LIKE matrix.
    (Formerly two registry entries, q_filter_scan + q_filter_complex —
    merged so the registry fits the driver's 50-row correctness gate.)"""
    li = load_table(spark, sf_dir, "lineitem")
    scan = (
        li.filter((F.col("l_shipdate") < "1997-01-01") & (F.col("l_quantity") > 25))
        .select(
            F.lit("li").alias("leg"),
            F.col("l_orderkey").alias("k"),
            F.col("l_quantity").alias("v1"),
            F.col("l_extendedprice").alias("v2"),
        )
    )
    o = load_table(spark, sf_dir, "orders")
    complex_ = o.filter(
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000.0))
        | (
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_orderdate").between("1996-01-01", "1998-12-31")
            & F.col("o_orderpriority").like("%H%")
        )
    ).select(
        F.lit("ord").alias("leg"),
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("v1"),
        F.lit(None).cast("double").alias("v2"),
    )
    return scan.unionByName(complex_)


@workload(
    "q_scalar_exprs",
    oracle="""
        SELECT 'sc' AS leg,
               o_orderkey AS k,
               o_totalprice * 2.0 AS num,
               upper(o_orderpriority) AS s1,
               concat(o_orderstatus, '-', o_orderpriority, '|',
                      substr(o_orderpriority, 1, 1), ':',
                      CAST(length(o_orderpriority) AS VARCHAR), ':',
                      CAST(year(o_orderdate) AS VARCHAR), '-',
                      CAST(month(o_orderdate) AS VARCHAR)) AS s2,
               date_trunc('month', o_orderdate) AS order_month_start
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT 'all' AS leg,
               r_regionkey AS k,
               CAST(NULL AS DOUBLE) AS num,
               r_name AS s1,
               CAST(NULL AS VARCHAR) AS s2,
               CAST(NULL AS TIMESTAMP) AS order_month_start
        FROM region
    """,
    tags=("scalar", "scan"),
)
def q_scalar_exprs(spark, sf_dir):
    """Scalar expression surface (arith, string, date — SURVEY §2.3) in one
    leg-tagged union: the 'sc' leg exercises arithmetic, upper/substr/
    concat/length and year/month/date_trunc over orders; the 'all' leg is
    the full-table SELECT * scan over region (sql_tests 'select_all',
    formerly its own registry entry q_select_all)."""
    o = load_table(spark, sf_dir, "orders")
    sc = o.filter(F.col("o_orderkey") % 10 == 0).select(
        F.lit("sc").alias("leg"),
        F.col("o_orderkey").alias("k"),
        (F.col("o_totalprice") * 2.0).alias("num"),
        F.upper("o_orderpriority").alias("s1"),
        F.concat(
            F.col("o_orderstatus"), F.lit("-"), F.col("o_orderpriority"),
            F.lit("|"), F.substring("o_orderpriority", 1, 1), F.lit(":"),
            F.length("o_orderpriority").cast("string"), F.lit(":"),
            F.year("o_orderdate").cast("string"), F.lit("-"),
            F.month("o_orderdate").cast("string"),
        ).alias("s2"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month_start"),
    )
    r = load_table(spark, sf_dir, "region").select(
        F.lit("all").alias("leg"),
        F.col("r_regionkey").alias("k"),
        F.lit(None).cast("double").alias("num"),
        F.col("r_name").alias("s1"),
        F.lit(None).cast("string").alias("s2"),
        F.lit(None).cast("timestamp").alias("order_month_start"),
    )
    return sc.unionByName(r)


# q_case_when was folded into q_conditional_agg in r05 (leg-tagged union —
# both are conditional-aggregation shapes) to keep the registry at the
# driver gate's 50-row cap while freeing a slot for exact substring dedup.


# --- aggregation --------------------------------------------------------------

@workload(
    "q_tpch_q1",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {duck_dsum('l_quantity')} AS sum_qty,
               {duck_dsum('l_extendedprice')} AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               {duck_davg('l_quantity')} AS avg_qty,
               {duck_davg('l_extendedprice')} AS avg_price,
               {duck_davg('l_discount')} AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 shape — the flagship GROUP BY (maps sql_tests group-by cases
    and the word-count benchmark, reference word_count_benchmark.rs:172-201)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# q_groupby_count was folded into q_groupby_minmax_having in r06 (leg-tagged
# union — both are single-shuffle GROUP BY aggregations) to keep the registry
# at the driver gate's 50-row cap while freeing a slot for mixture+packing.


@workload(
    "q_groupby_minmax_having",
    oracle=f"""
        SELECT 'cnt' AS leg, event_type AS grp, count(*) AS n,
               round(quantile_cont(value, 0.5), 6) AS m1,
               round(quantile_cont(value, 0.95), 6) AS m2,
               min(value) AS vmin, max(value) AS vmax
        FROM events GROUP BY event_type
        UNION ALL
        SELECT 'hav' AS leg, o_orderpriority AS grp,
               count(*) AS n,
               {duck_dsum('o_totalprice')} AS m1,
               {duck_davg('o_totalprice')} AS m2,
               min(o_totalprice) AS vmin,
               max(o_totalprice) AS vmax
        FROM orders
        GROUP BY o_orderpriority
        HAVING count(*) > 10
    """,
    tags=("agg",),
)
def q_groupby_minmax_having(spark, sf_dir):
    """GROUP BY aggregation in one leg-tagged union: the 'cnt' leg is the
    word-count shape (reference F7) + exact interpolated percentiles
    (Spark percentile ≡ DuckDB quantile_cont; rounded to 6 for
    interpolation-arithmetic neutrality) over events — formerly its own
    registry entry q_groupby_count; the 'hav' leg is min/max/sum/avg with
    a HAVING gate over orders. Both legs stay single-shuffle aggs."""
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("m1"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("m2"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    ).select(
        F.lit("cnt").alias("leg"), F.col("event_type").alias("grp"),
        "n", "m1", "m2", "vmin", "vmax",
    )
    o = load_table(spark, sf_dir, "orders")
    hav = (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            dsum("o_totalprice").alias("m1"),
            davg("o_totalprice").alias("m2"),
            F.min("o_totalprice").alias("vmin"),
            F.max("o_totalprice").alias("vmax"),
        )
        .filter(F.col("n") > 10)
        .select(
            F.lit("hav").alias("leg"), F.col("o_orderpriority").alias("grp"),
            "n", "m1", "m2", "vmin", "vmax",
        )
    )
    return cnt.unionByName(hav)


@workload(
    "q_agg_stages",
    oracle="""
        WITH per_supp AS (
            SELECT l_suppkey, l_returnflag,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       / count(l_quantity) AS avg_qty
            FROM lineitem GROUP BY l_suppkey, l_returnflag
        ),
        cte AS (
            SELECT l_returnflag,
                   count(*) AS n_supp_groups,
                   min(avg_qty) AS min_avg_qty,
                   max(avg_qty) AS max_avg_qty
            FROM per_supp GROUP BY l_returnflag
        ),
        dist AS (
            SELECT l_returnflag,
                   count(DISTINCT l_suppkey) AS n_supps,
                   count(DISTINCT l_partkey) AS n_parts
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT 'stages' AS leg, d.l_returnflag AS grp,
               d.n_supps AS c1, d.n_parts AS c2, c.n_supp_groups AS c3,
               c.min_avg_qty AS v1, c.max_avg_qty AS v2,
               CAST(NULL AS DOUBLE) AS v3, CAST(NULL AS DOUBLE) AS v4
        FROM dist d JOIN cte c ON c.l_returnflag = d.l_returnflag
        UNION ALL
        SELECT 'ivm' AS leg, l_returnflag AS grp,
               count(l_quantity) AS c1,
               CAST(NULL AS BIGINT) AS c2, CAST(NULL AS BIGINT) AS c3,
               CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS v1,
               CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                   / count(l_quantity) AS v2,
               min(l_quantity) AS v3, max(l_quantity) AS v4
        FROM lineitem
        WHERE l_orderkey % 3 = 2 OR l_orderkey % 7 <> 0
        GROUP BY l_returnflag
    """,
    tags=("agg", "cte", "ivm"),
)
def q_agg_stages(spark, sf_dir):
    """Two legs, one 6-row result.

    'stages': DISTINCT aggregation + chained shuffle+agg CTE stages
    (reference planner CTE test, src/api/planner.rs:808-832), joined per
    group — both multi-stage shapes.

    'ivm' (r07): the incremental-view-maintenance tier driven end-to-end
    through the driver oracle — bootstrap `init_agg` on ~2/3 of lineitem,
    fold one insert batch + one delete batch with `maintain_agg` (deletes
    dirty every group's min/max), `repair_minmax` against the surviving
    rows, then `read_view`. The oracle is a FRESH re-aggregation of the
    surviving multiset — maintenance must hash-match recomputation
    (count, exact decimal sum, read-time avg, repaired min/max)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_suppkey", "l_returnflag").agg(
        davg("l_quantity").alias("avg_qty")
    )
    cte = per_supp.groupBy("l_returnflag").agg(
        F.count("*").alias("n_supp_groups"),
        F.min("avg_qty").alias("min_avg_qty"),
        F.max("avg_qty").alias("max_avg_qty"),
    )
    dist = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )
    stages = dist.join(cte, "l_returnflag").select(
        F.lit("stages").alias("leg"),
        F.col("l_returnflag").alias("grp"),
        F.col("n_supps").alias("c1"),
        F.col("n_parts").alias("c2"),
        F.col("n_supp_groups").alias("c3"),
        F.col("min_avg_qty").alias("v1"),
        F.col("max_avg_qty").alias("v2"),
        F.lit(None).cast("double").alias("v3"),
        F.lit(None).cast("double").alias("v4"),
    )

    from volga_spark.operators.ivm import (
        init_agg,
        maintain_agg,
        read_view,
        repair_minmax,
    )

    rows = li.select("l_orderkey", "l_returnflag", "l_quantity")
    base = rows.filter(F.col("l_orderkey") % 3 != 2)
    inserts = rows.filter(F.col("l_orderkey") % 3 == 2)
    deletes = base.filter(F.col("l_orderkey") % 7 == 0)
    surviving = rows.filter(
        (F.col("l_orderkey") % 3 == 2) | (F.col("l_orderkey") % 7 != 0)
    )
    state = init_agg(base, ["l_returnflag"], "l_quantity")
    state, dirty = maintain_agg(
        state, inserts, deletes, ["l_returnflag"], "l_quantity"
    )
    state = repair_minmax(state, surviving, dirty, ["l_returnflag"], "l_quantity")
    ivm = read_view(state, ["l_returnflag"]).select(
        F.lit("ivm").alias("leg"),
        F.col("l_returnflag").alias("grp"),
        F.col("n").alias("c1"),
        F.lit(None).cast("long").alias("c2"),
        F.lit(None).cast("long").alias("c3"),
        F.col("total").alias("v1"),
        F.col("avg").alias("v2"),
        F.col("vmin").cast("double").alias("v3"),
        F.col("vmax").cast("double").alias("v4"),
    )
    return stages.unionByName(ivm)


@workload(
    "q_conditional_agg",
    oracle="""
        SELECT 'cond' AS leg, CAST(user_id AS VARCHAR) AS grp,
               count(CASE WHEN event_type = 'click' THEN 1 END) AS n1,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n2,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS n3,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS v
        FROM events GROUP BY user_id
        UNION ALL
        SELECT 'case' AS leg,
               CASE WHEN l_quantity < 10 THEN 'small'
                    WHEN l_quantity < 30 THEN 'medium'
                    ELSE 'large' END AS grp,
               count(*) AS n1,
               CAST(NULL AS BIGINT) AS n2, CAST(NULL AS BIGINT) AS n3,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS v
        FROM lineitem GROUP BY 2
    """,
    tags=("agg", "scalar"),
)
def q_conditional_agg(spark, sf_dir):
    """Conditional aggregation in one leg-tagged union: pivot-style
    conditional counts per user ('cond' leg — map-side combinable, no
    pivot pass) + CASE WHEN bucketed grouping ('case' leg — formerly
    q_case_when; merged to fit the driver's 50-row gate)."""
    ev = load_table(spark, sf_dir, "events")
    cond = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n1"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n2"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n3"),
        F.sum(F.when(F.col("event_type") == "purchase", dec("value")))
        .cast("double")
        .alias("v"),
    ).select(
        F.lit("cond").alias("leg"),
        F.col("user_id").cast("string").alias("grp"),
        "n1", "n2", "n3", "v",
    )
    li = load_table(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
        .alias("grp")
    )
    case = li.groupBy(bucket).agg(
        F.count("*").alias("n1"), dsum("l_quantity").alias("v")
    ).select(
        F.lit("case").alias("leg"),
        "grp",
        "n1",
        F.lit(None).cast("long").alias("n2"),
        F.lit(None).cast("long").alias("n3"),
        "v",
    )
    return cond.unionByName(case)


# --- joins (reference intends these; execution stubbed there — real here) -----
# Inner equi-join coverage lives in q_join_multi_broadcast (5-way inner chain)
# and q_topk_per_group (broadcast inner join + window); a standalone inner-join
# entry was consolidated away in r03 to fit the correctness-gate window.

@workload(
    "q_join_multi_broadcast",
    oracle="""
        SELECT n.n_name,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name IN ('ASIA', 'EUROPE')
        GROUP BY n.n_name
    """,
    tags=("join",),
)
def q_join_multi_broadcast(spark, sf_dir):
    """TPC-H Q5 shape: fact ⋈ chain of dims, all dims broadcast — the only
    shuffle is the final partial/final agg on n_name."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@workload(
    "q_join_semi_anti",
    oracle=f"""
        SELECT 'semi' AS kind, c_custkey, c_name AS s,
               CAST(NULL AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS total
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
        UNION ALL
        SELECT 'anti' AS kind, c_custkey, c_name AS s,
               CAST(NULL AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS total
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
        UNION ALL
        SELECT 'outer' AS kind, c.c_custkey, CAST(NULL AS VARCHAR) AS s,
               coalesce(count(o.o_orderkey), 0) AS n,
               {duck_dsum('o.o_totalprice')} AS total
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    """,
    tags=("join",),
)
def q_join_semi_anti(spark, sf_dir):
    """Join-shape surface in one leg-tagged union: semi join (customers
    with a ≥300k order), anti join (customers with no ≥400k order —
    filtered build side, so non-empty at every SF), and the LEFT OUTER
    join + aggregate that was formerly its own registry entry
    q_join_outer (folded in r06 to free a slot for hybrid RRF). All probe
    sides broadcast-able dims."""
    c = load_table(spark, sf_dir, "customer")
    semi_o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    anti_o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    nulls = [
        F.lit(None).cast("bigint").alias("n"),
        F.lit(None).cast("double").alias("total"),
    ]
    semi = (
        c.join(semi_o, c.c_custkey == semi_o.o_custkey, "left_semi")
        .select(F.lit("semi").alias("kind"), "c_custkey",
                F.col("c_name").alias("s"), *nulls)
    )
    anti = (
        c.join(anti_o, c.c_custkey == anti_o.o_custkey, "left_anti")
        .select(F.lit("anti").alias("kind"), "c_custkey",
                F.col("c_name").alias("s"), *nulls)
    )
    o = load_table(spark, sf_dir, "orders")
    outer = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(F.count("o_orderkey"), F.lit(0)).alias("n"),
            dsum("o_totalprice").alias("total"),
        )
        .select(
            F.lit("outer").alias("kind"), "c_custkey",
            F.lit(None).cast("string").alias("s"), "n", "total",
        )
    )
    return semi.unionByName(anti).unionByName(outer)


@workload(
    "q_topk_per_group",
    oracle="""
        SELECT c_mktsegment, o_orderkey, o_totalprice, rk
        FROM (
            SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                   row_number() OVER (PARTITION BY c.c_mktsegment
                                      ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ) WHERE rk <= 3
    """,
    tags=("join", "window"),
)
def q_topk_per_group(spark, sf_dir):
    """Top-K per group via ranking window (deterministic tiebreak on key)."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rk")
    )
