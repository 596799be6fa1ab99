"""Datagen source workload (reference DatagenSourceConfig parity) + approx
sketches. The generator is closed-form arithmetic, so the oracle regenerates
identical rows in DuckDB and the whole pipeline (generate → window agg) sits
in the exact-match gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.sources.datagen import DatagenSpec, FieldSpec, duck_generate_sql, generate
from volga_spark.tables import load_table
from volga_spark.workloads import workload

_SPEC = DatagenSpec(
    n_rows=20_000,
    fields=[
        FieldSpec("event_time", "incremental_timestamp", start_s=1_700_000_000, step_ms=250),
        FieldSpec("key", "key", num_unique=4),
        FieldSpec("seq", "increment"),
        FieldSpec("value", "uniform", lo=0.0, hi=100.0, seed=7),
        FieldSpec("kind", "values", values=("click", "view", "purchase")),
    ],
)


@workload(
    "q_datagen_window",
    oracle=f"""
        SELECT key, kind,
               count(*) AS n,
               CAST(sum(CAST(round(value * 10) AS BIGINT)) AS BIGINT) AS decivalue_sum,
               min(event_time) AS first_ts,
               max(seq) AS max_seq
        FROM {duck_generate_sql(_SPEC)}
        GROUP BY key, kind
    """,
    tags=("source", "datagen"),
)
def q_datagen_window(spark, sf_dir):
    """20k generated rows (the reference window-benchmark shape: 4 keys,
    rate-controlled timestamps, uniform values) → keyed aggregation.
    sf_dir unused — the source IS the generator."""
    df = generate(spark, _SPEC)
    return df.groupBy("key", "kind").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 10).cast("long")).alias("decivalue_sum"),
        F.min("event_time").alias("first_ts"),
        F.max("seq").alias("max_seq"),
    )


@workload("q_approx_sketches", tags=("agg", "approx"))
def q_approx_sketches(spark, sf_dir):
    """HLL distinct + quantile sketches (approximate → rows-only check;
    tests assert error bounds vs exact)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("p50_price"),
        F.percentile_approx("l_extendedprice", 0.99).alias("p99_price"),
    )
