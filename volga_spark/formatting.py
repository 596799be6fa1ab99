"""Output-format parity helpers for ML window UDAFs.

Mirrors the reference's CSV scalar formatting exactly
(reference src/runtime/operators/window/top/format.rs:3-41):
  - floats: printf "%.6f", trailing zeros then trailing '.' trimmed; "" -> "0"
  - ints/bools/strings: plain str()
  - None: omitted from output
  - cate CSV: "cat:val" parts joined by "," after a full-string lexicographic
    sort (reference src/runtime/operators/window/cate/accumulator.rs:273-296)
"""

from __future__ import annotations


def format_float(value: float) -> str:
    s = f"{value:.6f}"
    s = s.rstrip("0").rstrip(".")
    return s if s else "0"


def scalar_to_string(value) -> str | None:
    """Format one scalar the way the reference does; None for nulls."""
    if value is None:
        return None
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        return format_float(value)
    return str(value)


def join_csv(parts: list[str]) -> str:
    return ",".join(parts)


# DuckDB SQL fragment computing the same float formatting, for oracle parity.
# Usage: DUCK_FMT.format(expr="sum_val")
DUCK_FMT = "CASE WHEN rtrim(rtrim(printf('%.6f', {expr}), '0'), '.') = '' THEN '0' ELSE rtrim(rtrim(printf('%.6f', {expr}), '0'), '.') END"
