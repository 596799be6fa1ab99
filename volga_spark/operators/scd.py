"""Slowly-changing dimension (Type 2) maintenance — versioned upserts with
point-in-time reads.

Dimension data (customer tier, document license, source reputation) changes
over time, and training-set construction must see the attribute values AS OF
each fact's timestamp — the batch-warehouse twin of the online feature
store's point-in-time correctness (`api/feature_store.py`). SCD2 is the
standard encoding: one row per (key, version) with a [valid_from, valid_to)
range, open rows carry valid_to = NULL.

`scd2_apply` merges a batch of changes into a dimension WITHOUT a MERGE
statement (plain parquet tables; the lakehouse MERGE is a rewrite of the
same logic):

  1. union the existing version rows with the incoming changes (tagged),
  2. one window per key ordered by (valid_from, is_change): recompute every
     valid_to as lead(valid_from) — late-arriving changes slot into place
     and SPLIT the range they land inside, no special cases,
  3. suppress no-op changes (attrs equal to the chronologically previous
     row's) so re-delivered batches are idempotent.

Everything is native exprs over one keyed window — one shuffle on the key.
The whole operator is exact and hash-compares against a DuckDB twin.

Scale: cost is one exchange of (key, attrs, ts) rows — dimension tables are
small next to facts (even a billion-key dimension is GBs of narrow rows).
The rewrite is append-plus-replace of the affected PARTITIONS when the
dimension is written partitioned by key range; at 100 TB the fact table is
never touched. `scd2_lookup` joins facts to the dimension on
key + [valid_from, valid_to) containment — a broadcast range probe for
normal dimension sizes, the same shape as `operators/tiles` lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_init(
    changes: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str = "eff_ts",
    suppress_noops: bool = True,
    delete_col: str | None = None,
) -> DataFrame:
    """Bootstrap a dimension from an initial change set (same semantics as
    applying the changes to an empty dimension)."""
    empty = changes.select(
        F.col(key_col),
        *[F.col(c) for c in attr_cols],
        F.col(ts_col).alias("valid_from"),
        F.lit(None).cast(changes.schema[ts_col].dataType).alias("valid_to"),
    ).limit(0)
    return scd2_apply(
        empty, changes, key_col, attr_cols, ts_col,
        suppress_noops=suppress_noops, delete_col=delete_col,
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str = "eff_ts",
    suppress_noops: bool = True,
    delete_col: str | None = None,
) -> DataFrame:
    """Return the new dimension content: existing versions ∪ changes, with
    valid_to recomputed per key and (optionally) no-op changes suppressed.

    `dim` columns: key, attrs, valid_from, valid_to. `changes` columns:
    key, attrs, `ts_col` (effective timestamp). Ties on (key, valid_from)
    resolve change-last, so a change at an existing version's exact
    timestamp replaces it going forward (its range becomes empty and is
    dropped).

    `suppress_noops` caveat (hypothesis-found, pinned by
    tests/test_scd_property.py): suppression is only SOUND when each key's
    changes arrive chronologically across batches. A dropped no-op cannot
    be recovered, so a LATER batch carrying an EARLIER timestamp can make
    the discarded change significant again and point-in-time values then
    diverge from an all-at-once bootstrap (e.g. b@0 then b@2 suppresses
    the second b; a late a@1 leaves 'a' open past t=2 where bootstrap says
    'b'). For out-of-order feeds pass ``suppress_noops=False`` — every
    change row is kept, ranges stay exact for ANY arrival order, at the
    cost of redundant version boundaries.

    `delete_col` (optional, on `changes`): rows where it is true are CDC
    deletes. A delete becomes a TOMBSTONE VERSION — a row with NULL attrs
    and ``__tomb = 1`` whose [valid_from, valid_to) range covers the
    interval the key did not exist. Tombstones are kept as rows (not just
    a truncated valid_to on the predecessor) so LATE arrivals stay exact:
    a change older than an applied delete slots in with valid_to at the
    tombstone boundary instead of resurrecting the key past it — the same
    reasoning as `operators/cdc`'s retained tombstones. When deletes are
    in play the dimension schema carries ``__tomb``; `scd2_lookup`
    excludes tombstone ranges automatically (facts inside them get NULL
    attrs), and inputs without the column are treated as all-live."""
    has_tomb = delete_col is not None or "__tomb" in dim.columns
    existing = dim.select(
        F.col(key_col),
        *[F.col(c) for c in attr_cols],
        F.col("valid_from"),
        F.lit(0).alias("__chg"),
        (
            F.col("__tomb") if "__tomb" in dim.columns else F.lit(0)
        ).alias("__tomb"),
    )
    if delete_col is not None:
        is_del = F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
        incoming = changes.select(
            F.col(key_col),
            # a delete's payload (before-image or NULLs) is not state
            *[
                F.when(is_del, F.lit(None).cast(changes.schema[c].dataType))
                .otherwise(F.col(c))
                .alias(c)
                for c in attr_cols
            ],
            F.col(ts_col).alias("valid_from"),
            F.lit(1).alias("__chg"),
            is_del.cast("int").alias("__tomb"),
        )
    else:
        incoming = changes.select(
            F.col(key_col),
            *[F.col(c) for c in attr_cols],
            F.col(ts_col).alias("valid_from"),
            F.lit(1).alias("__chg"),
            F.lit(0).alias("__tomb"),
        )
    both = existing.unionByName(incoming)
    if suppress_noops:
        w = Window.partitionBy(key_col).orderBy("valid_from", "__chg")
        prev_attrs = [F.lag(c).over(w).alias(f"__p_{c}") for c in attr_cols]
        rows = both.select(
            "*",
            *prev_attrs,
            F.lag("__tomb").over(w).alias("__p_tomb"),
            F.lag(key_col).over(w).isNotNull().alias("__has_prev"),
        )
        # no-op suppression: a CHANGE row whose attrs all equal the previous
        # row's is dropped (null-safe so NULL attrs compare equal); existing
        # rows always survive (history is immutable). Tombstone state joins
        # the comparison: a re-insert equal to the pre-delete attrs is NOT
        # a no-op, and tombstone-after-tombstone IS.
        same_as_prev = F.col("__tomb").eqNullSafe(F.col("__p_tomb"))
        for c in attr_cols:
            same_as_prev = same_as_prev & F.col(c).eqNullSafe(F.col(f"__p_{c}"))
        keep = (F.col("__chg") == 0) | ~(F.col("__has_prev") & same_as_prev)
        kept = rows.filter(keep)
    else:
        # out-of-order-feed mode: every change row is kept (the docstring
        # caveat — a dropped no-op cannot be recovered once a late arrival
        # slots in front of it)
        kept = both
    # valid_to recompute must run over the KEPT rows (a suppressed no-op
    # must not split its neighbor's range)
    w2 = Window.partitionBy(key_col).orderBy("valid_from", "__chg")
    out = kept.select(
        key_col,
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "__chg",
        "__tomb",
    )
    # zero-width ranges (replaced-at-same-timestamp) drop out
    out = out.filter(
        F.col("valid_to").isNull() | (F.col("valid_from") != F.col("valid_to"))
    ).drop("__chg")
    return out if has_tomb else out.drop("__tomb")


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Point-in-time enrich: each fact row gets the dimension attrs valid
    at its `ts_col` (NULL attrs when no version covers it). Broadcast range
    probe — the dimension is the small side by construction. Tombstone
    versions (deleted intervals, `__tomb = 1`) are excluded from the probe,
    so facts inside them get NULL attrs like any uncovered timestamp."""
    if "__tomb" in dim.columns:
        dim = dim.filter(F.col("__tomb") == 0).drop("__tomb")
    d = dim.select(
        F.col(key_col).alias("__dk"),
        *[F.col(c) for c in attr_cols],
        "valid_from",
        "valid_to",
    )
    cond = (
        (facts[ts_col] >= d["valid_from"])
        & (d["valid_to"].isNull() | (facts[ts_col] < d["valid_to"]))
        & (facts[key_col] == d["__dk"])
    )
    return facts.join(F.broadcast(d), cond, "left").drop(
        "__dk", "valid_from", "valid_to"
    )


def scd2_oracle_sql(
    changes_sql: str,
    key_col: str,
    attr_cols: list[str],
    ts_col: str = "eff_ts",
    suppress_noops: bool = True,
) -> str:
    """DuckDB twin of `scd2_init` (bootstrap-from-changes): same window,
    same change-last tie order, same zero-width drop, and the same
    `suppress_noops` switch as the operator (False = keep every
    observation, the out-of-order-feed mode)."""
    attrs = ", ".join(attr_cols)
    same = " AND ".join(
        f"({c} IS NOT DISTINCT FROM lag({c}) OVER w)" for c in attr_cols
    )
    kept_filter = (
        "WHERE NOT (has_prev AND same_as_prev)" if suppress_noops else ""
    )
    return f"""
    WITH ch AS ({changes_sql}),
    seq AS (
        SELECT {key_col}, {attrs}, {ts_col} AS valid_from,
               lag({key_col}) OVER w IS NOT NULL AS has_prev,
               ({same}) AS same_as_prev
        FROM ch
        WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col})
    ),
    kept AS (
        SELECT * FROM seq {kept_filter}
    )
    SELECT {key_col}, {attrs}, valid_from,
           lead(valid_from) OVER
               (PARTITION BY {key_col} ORDER BY valid_from) AS valid_to
    FROM kept
    QUALIFY valid_to IS NULL OR valid_from <> valid_to
    """
