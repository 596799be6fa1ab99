"""As-of (point-in-time) join — stream-table enrichment.

Spark has no native as-of join; the scalable composition is the classic
union-and-carry-forward: tag left/right rows, union them on a common
(key, ts) axis, and carry the latest right-side values forward with
``last(col, ignorenulls=True)`` over an unbounded-preceding window — one
shuffle on the key, no range join, no per-row probing. Right rows sort
before left rows at equal timestamps, so "latest right with rts <= lts" is
inclusive (standard as-of semantics, matching DuckDB ASOF JOIN).

API shape follows pandas ``merge_asof``: ``direction`` backward (default) /
forward / nearest, and an optional ``tolerance_us`` bound on the match gap.
Forward is backward over the negated time axis (same one-shuffle plan);
nearest composes both passes and picks the closer match per row (two
shuffles — still never a range probe). Tolerance carries the matched right
timestamp alongside the values and nulls the match past the bound, which
keeps left-join semantics (rows stay, values null).

At 100 TB this beats the bucketize-and-filter range-join alternative when
the right side is large: both sides shuffle once on the key and the carry
is a linear in-partition pass. For a small right side, broadcast + max_by
is cheaper — Catalyst can't pick automatically here, so choose per call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__r___matched_ts"


def _carry(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    negate: bool,
    out_prefix: str,
) -> DataFrame:
    """One union-and-carry pass; returns left rows + ``{out_prefix}{col}``
    matched values + ``{out_prefix}ts`` matched right timestamp (µs)."""
    lt = F.unix_micros(F.col(left_ts))
    rt = F.unix_micros(F.col(right_ts))
    if negate:
        lt, rt = -lt, -rt

    l_tag = left.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
        lt.alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns],
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}")
            for c in value_cols
        ],
        F.lit(None).cast("bigint").alias(_TS),
    )
    r_tag = right.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
        rt.alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.unix_micros(F.col(right_ts)).alias(_TS),
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
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{out_prefix}{c}")
            for c in value_cols
        ],
        F.last(_TS, ignorenulls=True).over(w).alias(f"{out_prefix}ts"),
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *left.columns,
        *[F.col(f"{out_prefix}{c}") for c in value_cols],
        f"{out_prefix}ts",
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the right row nearest in time on the same
    key — ``backward``: latest with ``right_ts <= left_ts`` (ties inclusive);
    ``forward``: earliest with ``right_ts >= left_ts``; ``nearest``: the
    closer of the two (backward wins exact-distance ties, like pandas).
    ``tolerance_us`` nulls matches whose |gap| exceeds the bound. Left-join
    semantics throughout: unmatched left rows keep NULLs. Right (key, ts)
    pairs should be unique for determinism — dedupe upstream.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = value_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]

    def finish(df: DataFrame, prefix: str) -> DataFrame:
        gap = F.abs(F.unix_micros(F.col(left_ts)) - F.col(f"{prefix}ts"))
        keep = (
            F.lit(True)
            if tolerance_us is None
            else (gap <= F.lit(tolerance_us))
        )
        return df.select(
            *left.columns,
            *[
                F.when(keep, F.col(f"{prefix}{c}")).alias(c)
                for c in value_cols
            ],
        )

    if direction == "backward":
        return finish(
            _carry(left, right, keys, left_ts, right_ts, value_cols, False, "__b_"),
            "__b_",
        )
    if direction == "forward":
        return finish(
            _carry(left, right, keys, left_ts, right_ts, value_cols, True, "__f_"),
            "__f_",
        )

    # nearest: backward pass, then forward pass over its output, then pick
    b = _carry(left, right, keys, left_ts, right_ts, value_cols, False, "__b_")
    bf = _carry(b, right, keys, left_ts, right_ts, value_cols, True, "__f_")
    lt = F.unix_micros(F.col(left_ts))
    bgap = F.abs(lt - F.col("__b_ts"))
    fgap = F.abs(F.col("__f_ts") - lt)
    use_b = F.col("__f_ts").isNull() | (
        F.col("__b_ts").isNotNull() & (bgap <= fgap)
    )
    within = lambda g: (  # noqa: E731 — tiny local predicate
        F.lit(True) if tolerance_us is None else g <= F.lit(tolerance_us)
    )
    return bf.select(
        *left.columns,
        *[
            F.when(use_b & within(bgap), F.col(f"__b_{c}"))
            .when(~use_b & within(fgap), F.col(f"__f_{c}"))
            .alias(c)
            for c in value_cols
        ],
    )
