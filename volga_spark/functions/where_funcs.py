"""``{sum,avg,count,min,max}_where(value, cond)`` — SURVEY §2.9.

Reference: the ``_where`` UDAF family (reference
src/runtime/operators/window/cate/udf.rs:287-380) — aggregate over only the
rows of the frame where ``cond`` is true; NULL result when nothing matches
(empty accumulator), matching an empty DataFusion accumulator.

Spark mapping is exact and fully native: ``agg(when(cond, value))`` —
``when`` without ``otherwise`` yields NULL, which every Spark aggregate
skips. These stay inside whole-stage codegen; use them ``.over(w)`` with any
WindowSpec from volga_spark.operators.window, or in plain groupBy aggs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _masked(value: str | Column, cond: Column) -> Column:
    v = F.col(value) if isinstance(value, str) else value
    return F.when(cond, v)


def sum_where(value: str | Column, cond: Column) -> Column:
    return F.sum(_masked(value, cond))


def avg_where(value: str | Column, cond: Column) -> Column:
    return F.avg(_masked(value, cond))


def count_where(value: str | Column, cond: Column) -> Column:
    """Counts rows where cond is true and value is non-null (reference
    count accumulator counts non-null inputs)."""
    return F.count(_masked(value, cond))


def min_where(value: str | Column, cond: Column) -> Column:
    return F.min(_masked(value, cond))


def max_where(value: str | Column, cond: Column) -> Column:
    return F.max(_masked(value, cond))
