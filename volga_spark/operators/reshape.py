"""Pivot / unpivot (wide↔long reshaping) with scale-safe contracts.

Spark has both natively (`groupBy().pivot()`, `DataFrame.unpivot`); the
wrappers here pin the two contracts that matter at 100 TB:

- :func:`pivot_agg` REQUIRES an explicit pivot-value list. Spark's
  `pivot(col)` without values runs `SELECT DISTINCT col ... collect()` on
  the DRIVER before planning — an extra full pass over the fact table and
  a driver-memory hazard on high-cardinality columns. With explicit values
  the pivot compiles to one pass of conditional aggregation (the same
  single-shuffle shape as any groupBy), and unknown values are dropped
  deterministically instead of growing the schema run-to-run.
- :func:`unpivot_long` (melt) is a pure map-side explode — zero shuffles,
  schema fixed up front; nulls kept or dropped explicitly.

Both carry DuckDB oracle twins (PIVOT ... USING / UNPIVOT) so the reshaped
frames hash-compare exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_agg(
    df: DataFrame,
    group_cols: list[str],
    pivot_col: str,
    pivot_values: list[str],
    agg_col: str,
    agg: str = "sum",
) -> DataFrame:
    """One-pass pivot: group by `group_cols`, one output column per value
    in `pivot_values` (explicit — see module doc) holding `agg(agg_col)`.
    Missing combinations are NULL (ANSI pivot semantics).

    Compiled as conditional aggregation rather than Spark's native
    `groupBy().pivot()`: the native form plans TWO aggregations (groupBy
    (keys, pivot_col) then pivotfirst by keys — two exchanges, verified in
    tests/test_reshape.py's plan audit), while agg(f(CASE WHEN ...)) is
    the single-exchange plan — half the shuffle at any scale, identical
    results, and textually the same plan the DuckDB oracle runs."""
    if not pivot_values:
        raise ValueError(
            "pivot_values must be explicit — dynamic pivot collects the "
            "distinct value set on the driver (full extra pass; unbounded "
            "schema); enumerate the values or pre-aggregate them"
        )
    agg_fn = getattr(F, agg)
    cols = [
        agg_fn(
            F.when(F.col(pivot_col) == v, F.col(agg_col))
        ).alias(v)
        for v in pivot_values
    ]
    return df.groupBy(*group_cols).agg(*cols)


def pivot_oracle_sql(
    table_sql: str,
    group_cols: list[str],
    pivot_col: str,
    pivot_values: list[str],
    agg_col: str,
    agg: str = "sum",
) -> str:
    """DuckDB twin of :func:`pivot_agg` via conditional aggregation (the
    plan both engines actually execute)."""
    gcols = ", ".join(group_cols)
    vals = ", ".join(
        f"{agg}(CASE WHEN {pivot_col} = '{v}' THEN {agg_col} END) AS \"{v}\""
        for v in pivot_values
    )
    return f"SELECT {gcols}, {vals} FROM ({table_sql}) GROUP BY {gcols}"


def unpivot_long(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
    drop_nulls: bool = False,
) -> DataFrame:
    """Melt `value_cols` into (`var_name`, `value_name`) long rows —
    map-side only, no shuffle. Value columns must share a coercible type
    (Spark unpivot requirement; cast beforehand otherwise)."""
    out = df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )
    if drop_nulls:
        out = out.filter(F.col(value_name).isNotNull())
    return out


def unpivot_oracle_sql(
    table_sql: str,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
    drop_nulls: bool = False,
) -> str:
    """DuckDB twin of :func:`unpivot_long` (stack via UNION ALL — identical
    row multiset to Spark's Expand node)."""
    ids = ", ".join(id_cols)
    legs = " UNION ALL ".join(
        f"SELECT {ids}, '{c}' AS {var_name}, {c} AS {value_name} "
        f"FROM ({table_sql})"
        for c in value_cols
    )
    where = f" WHERE {value_name} IS NOT NULL" if drop_nulls else ""
    return f"SELECT * FROM ({legs}){where}"
