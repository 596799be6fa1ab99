"""As-of (point-in-time) join — stream-table enrichment.

Spark has no native as-of join; the scalable composition is the classic
union-and-carry-forward: tag left/right rows, union them on a common
(key, ts) axis, and carry the latest right-side values forward with
``last(col, ignorenulls=True)`` over an unbounded-preceding window — one
shuffle on the key, no range join, no per-row probing. Right rows sort
before left rows at equal timestamps, so "latest right with rts <= lts" is
inclusive (standard as-of semantics, matching DuckDB ASOF JOIN).

At 100 TB this beats the bucketize-and-filter range-join alternative when
the right side is large: both sides shuffle once on the key and the carry
is a linear in-partition pass. For a small right side, broadcast + max_by
is cheaper — Catalyst can't pick automatically here, so choose per call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` on the same key (left join semantics: unmatched
    left rows keep NULLs). Right (key, ts) pairs should be unique for
    determinism — dedupe upstream.
    """
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = value_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]

    l_tag = left.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    u = l_tag.unionByName(r_tag)
    kcols = [f"__k{i}" for i in range(len(keys))]
    w = (
        Window.partitionBy(*kcols)
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *left.columns,
        *[F.col(f"__asof_{c}").alias(c) for c in value_cols],
    )
