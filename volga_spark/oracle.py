"""Local mirror of the driver's DuckDB-oracle correctness check.

Runs a workload's Spark DataFrame and its DuckDB oracle SQL over the same
parquet tables, sorts columns by name and rows by value, and compares.
Used by tests/test_oracle_parity.py so every registered workload is verified
in-repo before the driver ever sees it.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from volga_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duck_connection(sf_dir)
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    # Stringify for a stable total order (mirrors a value-hash comparison).
    key = pdf.astype(str)
    order = key.sort_values(by=list(key.columns)).index
    return pdf.loc[order].reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # array-valued cells: pd.isna would return an ndarray (ambiguous truth);
    # compare elementwise via a stable string form instead
    a_arr = isinstance(a, (list, tuple)) or hasattr(a, "__array__")
    b_arr = isinstance(b, (list, tuple)) or hasattr(b, "__array__")
    if a_arr or b_arr:
        if not (a_arr and b_arr):
            return False
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(_values_equal(x, y) for x, y in zip(la, lb))
    if pd.isna(a) and pd.isna(b):
        return True
    return a == b


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return [f"column mismatch: spark={s_cols} oracle={o_cols}"]
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    n_bad = 0
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not _values_equal(a, b):
                n_bad += 1
                if n_bad <= 5:
                    problems.append(f"col {col} row {i}: spark={a!r} oracle={b!r}")
    if n_bad > 5:
        problems.append(f"... {n_bad} mismatched values total")
    if not problems:
        problems.extend(_representation_problems(s, o))
    return problems


def _representation_problems(s: pd.DataFrame, o: pd.DataFrame) -> list[str]:
    """The driver's correctness gate hashes *stringified* values, so a result
    that is value-equal but representation-different (bigint 3 vs float64 3.0
    — e.g. DuckDB widening a windowed sum(int) to HUGEINT→float64) still
    fails its hash. Mirror that sensitivity here so dtype drift is caught at
    sf0.001 before the driver ever sees it. Timestamps are exempt: the ns-vs-µs
    pandas unit difference stringifies identically."""
    problems: list[str] = []
    for col in s.columns:
        s_kind = s[col].dtype.kind
        o_kind = o[col].dtype.kind
        if s_kind == o_kind or "M" in (s_kind, o_kind) or "O" in (s_kind, o_kind):
            continue
        numeric = {"i", "u", "f"}
        if {s_kind, o_kind} <= numeric and s_kind != o_kind and "f" in (s_kind, o_kind):
            problems.append(
                f"col {col}: representation drift spark dtype={s[col].dtype} "
                f"oracle dtype={o[col].dtype} (driver hash is str-sensitive: 3 != 3.0)"
            )
    return problems
