"""Shared helpers for workloads.

Exact-arithmetic parity: testdata money/value columns are doubles holding
2-decimal values. We cast to DECIMAL(18,2) before summing (exact on both
engines), then convert to DOUBLE with identical expressions so Spark and
DuckDB produce bit-identical doubles independent of accumulation order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: str | Column) -> Column:
    """Exact decimal sum surfaced as double."""
    return F.sum(dec(col)).cast("double")


def davg(col: str | Column, count_col: Column | None = None) -> Column:
    """avg = exact-sum / count, both sides computed the same way."""
    cnt = count_col if count_col is not None else F.count(F.col(col) if isinstance(col, str) else col)
    return F.sum(dec(col)).cast("double") / cnt


# DuckDB fragments mirroring the helpers above.
def duck_dsum(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"


def duck_davg(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) / count({expr})"
