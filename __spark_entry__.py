"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in ``volga_spark.workloads`` — one registered
workload per implemented capability from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape over lineitem) on sf0.001."""
    from volga_spark.workloads import load_all

    reg = load_all()
    return reg["q_tpch_q1"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from volga_spark.workloads import load_all

    return {name: wl.fn for name, wl in load_all().items()}


def oracle_sql() -> dict[str, str]:
    from volga_spark.workloads import load_all

    return {
        name: wl.oracle for name, wl in load_all().items() if wl.oracle is not None
    }
