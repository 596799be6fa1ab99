"""CDC apply — fold a change-data-capture feed into a current-state table.

The ingest shape every warehouse mirror needs (Debezium/DMS-style): a
stream of (key, seq, op, attrs) change events with op ∈ {I, U, D}, applied
to a keyed snapshot so the result equals replaying the log in sequence
order. Semantics (standard CDC-merge contract):

- per key, the change with the HIGHEST seq wins a batch (intermediate
  flip-flops within a batch collapse — only the final op matters);
- winning op I/U → the key's new current row; winning op D → the key is
  absent from the new state;
- vs the existing state: the higher seq wins — a live state row carries
  its last-applied seq, so redelivered older changes lose the merge;
- out-of-order delivery WITHIN a batch is handled by the seq order;
- at-least-once redelivery of DELETES needs `keep_tombstones=True`: a
  dropped key leaves no row to out-rank a redelivered older I/U, so the
  maintained state must retain a tombstone row (null attrs,
  `__deleted=true`) carrying the delete's seq. `cdc_stream_apply` always
  maintains tombstoned state and strips tombstones only from the final
  result; the plain one-shot form (keep_tombstones=False) is exact for a
  log applied once and idempotent for I/U redelivery, but NOT for replays
  that rewind past a delete — use tombstones for at-least-once feeds.

Everything is one window over (key ∪ changes) — a single narrow shuffle
per batch, the same shape as `streaming/runner.upsert_by_key` with delete
support and sequence-number correctness added. DuckDB twin provided; the
whole surface hash-compares.

Scale: per batch cost is O(state + delta) narrow rows in the versioned-
rewrite form used here; against a lakehouse table format the identical
logic is MERGE INTO WHEN MATCHED/NOT MATCHED at O(delta).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OPS = ("I", "U", "D")


def apply_cdc(
    state: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    keep_tombstones: bool = False,
) -> DataFrame:
    """Return the new current-state table. `state` columns: keys + attrs +
    `seq_col` (the seq that produced each row), plus a `__deleted` bool
    column when it was produced with `keep_tombstones=True`. `changes`:
    keys + attrs + `seq_col` + `op_col`. Ties on (key, seq) resolve
    delete-over-live (a delete emitted at the same sequence point is the
    later intent in every CDC encoding); among equal-seq non-delete rows
    — changes AND the live state row, which is an earlier batch's winning
    change — the attr values themselves (desc, nulls last) break the tie,
    keeping the merge deterministic across runs and partitionings AND
    independent of micro-batch boundaries (fold == one-shot log replay).

    With `keep_tombstones=True` the result retains one row per DELETED key
    (null attrs, the delete's seq, `__deleted=true`) so that replaying any
    already-applied prefix — including one that rewinds past the delete —
    is a no-op; strip with :func:`live_rows` when serving. Without it the
    result contains live rows only (the classic one-shot merge; deletes
    are forgotten, so only I/U redelivery is idempotent)."""
    attr_cols = [
        c
        for c in state.columns
        if c not in key_cols and c not in (seq_col, "__deleted")
    ]
    # A state tombstone IS the last delete — re-enter the merge as one.
    state_op = (
        F.when(F.col("__deleted"), F.lit("D")).otherwise(F.lit("S"))
        if "__deleted" in state.columns
        else F.lit("S")
    )
    s = state.select(*key_cols, *attr_cols, seq_col, state_op.alias("__op"))
    c = changes.select(
        *key_cols, *attr_cols, seq_col, F.col(op_col).alias("__op")
    )
    both = s.unionByName(c)
    # priority: higher seq first; at equal seq, D > everything. Equal-seq
    # D-vs-D ties (a state tombstone vs its redelivered delete) produce
    # identical output rows, so the arbitrary row_number pick is immaterial.
    # Equal-seq I-vs-U (or U-vs-U) ties — a malformed but possible feed —
    # break deterministically on the attr VALUES (desc, nulls last), so the
    # winner is a pure function of the batch contents, never of the
    # partitioning; the DuckDB twin orders identically. A live state row
    # ranks EQUAL to a change (it IS an earlier batch's winning change):
    # ranking state below changes would let an equal-seq redelivered
    # conflict out-rank the state row that a one-shot replay's attr
    # tie-break picks — batch folding must equal replaying the whole log
    # regardless of micro-batch boundaries.
    prio = F.when(F.col("__op") == "D", 2).otherwise(1)
    # map-typed attrs are not orderable in Spark — exclude them from the
    # tie-break (ties then resolve on the remaining attrs; a feed whose
    # attrs are ALL maps keeps the pre-r07 arbitrary-pick behavior for
    # the malformed equal-seq case rather than failing every apply)
    from pyspark.sql.types import MapType

    orderable = [
        a for a in attr_cols if not isinstance(both.schema[a].dataType, MapType)
    ]
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(),
        prio.desc(),
        *[F.col(a).desc_nulls_last() for a in orderable],
    )
    latest = (
        both.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if not keep_tombstones:
        return latest.filter(F.col("__op") != "D").drop("__op")
    deleted = F.col("__op") == "D"
    return latest.select(
        *key_cols,
        # null the attrs on tombstones — whatever payload the delete event
        # carried is not state
        *[
            F.when(deleted, F.lit(None).cast(latest.schema[a].dataType))
            .otherwise(F.col(a))
            .alias(a)
            for a in attr_cols
        ],
        seq_col,
        deleted.alias("__deleted"),
    )


def live_rows(state: DataFrame) -> DataFrame:
    """Strip tombstones from a `keep_tombstones=True` state table."""
    if "__deleted" not in state.columns:
        return state
    return state.filter(~F.col("__deleted")).drop("__deleted")


def gc_tombstones(state: DataFrame, horizon_seq: int, seq_col: str = "seq") -> DataFrame:
    """Drop tombstones the redelivery horizon has passed. Without GC the
    tombstone set grows with every key ever deleted — unbounded at 100 TB.
    `horizon_seq` is the source's acknowledged low-water mark: the
    transport can no longer redeliver any change with seq < horizon_seq
    (Kafka committed offset, Debezium confirmed LSN), so a tombstone at a
    lower seq can never be needed to out-rank a replay and is safe to
    forget. Live rows are untouched; run periodically (e.g. per compaction
    cycle), not per batch."""
    if "__deleted" not in state.columns:
        return state
    return state.filter(
        (~F.col("__deleted")) | (F.col(seq_col) >= F.lit(horizon_seq))
    )


def apply_cdc_oracle_sql(
    state_sql: str,
    changes_sql: str,
    key_cols: list[str],
    attr_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    orderable_attr_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`apply_cdc`. `orderable_attr_cols` mirrors the
    Spark side's exclusion of unorderable (map-typed) attrs from the
    equal-seq tie-break — pass the same subset apply_cdc will order by;
    defaults to all attrs. An empty tie-break list (attr-less feed, or all
    attrs unorderable) degrades to the (seq, op-priority) ordering alone,
    exactly like the Spark window."""
    keys = ", ".join(key_cols)
    cols = ", ".join([*key_cols, *attr_cols])  # attr-less feeds stay valid
    tie = attr_cols if orderable_attr_cols is None else orderable_attr_cols
    order_terms = [
        f"{seq_col} DESC",
        "(CASE __op WHEN 'D' THEN 2 ELSE 1 END) DESC",
        *[f"{a} DESC NULLS LAST" for a in tie],
    ]
    return f"""
        WITH s AS (SELECT {cols}, {seq_col}, 'S' AS __op
                   FROM ({state_sql})),
        c AS (SELECT {cols}, {seq_col}, {op_col} AS __op
              FROM ({changes_sql})),
        both_rows AS (SELECT * FROM s UNION ALL SELECT * FROM c),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY {keys}
                ORDER BY {", ".join(order_terms)}) AS __rn
            FROM both_rows
        )
        SELECT {cols}, {seq_col}
        FROM ranked WHERE __rn = 1 AND __op <> 'D'
    """


def cdc_stream_apply(
    change_stream: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    timeout_s: int = 300,
) -> DataFrame:
    """Run a CDC change stream to completion (availableNow), maintaining
    the current-state table across micro-batches with the versioned-
    parquet/epoch-retry discipline of `streaming/runner.upsert_by_key`;
    returns the final state. Exactly-once net effect: a retried epoch
    reuses its committed version."""
    import shutil

    from volga_spark.streaming.runner import _state_root, run_foreach_batch

    spark = change_stream.sparkSession
    root = _state_root()
    cur = {"version": None}
    attr_cols = [
        c
        for c in change_stream.columns
        if c not in key_cols and c not in (seq_col, op_col)
    ]

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        prev_version = cur["version"]
        if prev_version == epoch_id:
            return
        if prev_version is not None:
            prev = batch_df.sparkSession.read.parquet(f"{root}/v{prev_version}")
        else:
            prev = (
                batch_df.select(*key_cols, *attr_cols, seq_col)
                .withColumn("__deleted", F.lit(False))
                .limit(0)
            )
        # tombstones retained across batches: a micro-batch retry (or an
        # upstream at-least-once source) may redeliver changes older than
        # an applied delete — the tombstone's seq out-ranks them.
        new_state = apply_cdc(
            prev, batch_df, key_cols, seq_col, op_col, keep_tombstones=True
        )
        new_state.write.mode("overwrite").parquet(f"{root}/v{epoch_id}")
        cur["version"] = epoch_id
        if prev_version is not None and prev_version != epoch_id:
            shutil.rmtree(f"{root}/v{prev_version}", ignore_errors=True)

    run_foreach_batch(change_stream, sink, timeout_s)
    if cur["version"] is None:
        # empty feed: mirror the non-empty path's (keys, attrs, seq) column
        # order so schema compares / positional consumers see one layout.
        return change_stream.sparkSession.createDataFrame(
            [],
            change_stream.select(*key_cols, *attr_cols, seq_col).schema,
        )
    return live_rows(spark.read.parquet(f"{root}/v{cur['version']}"))


def cdc_stream_scd2(
    change_stream: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str = "eff_ts",
    timeout_s: int = 300,
    op_col: str | None = None,
) -> DataFrame:
    """Maintain a FULL SCD2 history (not just current state) under a CDC
    change stream: each micro-batch folds into the versioned dimension via
    `operators/scd.scd2_apply` with ``suppress_noops=False`` — the only
    mode that is exact under the arbitrary cross-batch arrival order a
    stream delivers (the hypothesis-pinned late-arrival contract). Same
    versioned-parquet/epoch-retry discipline as :func:`cdc_stream_apply`;
    returns the final dimension (key, attrs, valid_from, valid_to).

    This is the warehouse bridge: the same change feed can drive BOTH the
    current-state mirror (cdc_stream_apply) and the time-travel dimension
    (this) from one checkpointed stream.

    `key_cols` must name exactly one column — SCD2 version chains are
    per-key and `operators/scd.scd2_apply` is single-key; pack a composite
    business key into one struct/concat column upstream rather than having
    this function silently drop key parts.

    `op_col` (optional): when the feed carries CDC ops, D rows become
    TOMBSTONE versions (scd2_apply's delete_col path — the key's validity
    ends at the delete's eff_ts, and the dimension carries a `__tomb`
    column that scd2_lookup filters automatically). Without it every row
    is an attribute observation, the pre-r06 contract."""
    import shutil

    if len(key_cols) != 1:
        raise ValueError(
            "cdc_stream_scd2 requires exactly one key column; got "
            f"{key_cols!r} — pack composite keys into one column upstream"
        )

    from volga_spark.operators.scd import scd2_apply
    from volga_spark.streaming.runner import _state_root, run_foreach_batch

    spark = change_stream.sparkSession
    root = _state_root()
    cur = {"version": None}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        prev_version = cur["version"]
        if prev_version == epoch_id:
            return
        key0 = key_cols[0]
        if prev_version is not None:
            prev = batch_df.sparkSession.read.parquet(f"{root}/v{prev_version}")
        else:
            prev = (
                batch_df.select(
                    *key_cols,
                    *attr_cols,
                    F.col(ts_col).alias("valid_from"),
                    F.lit(None)
                    .cast(batch_df.schema[ts_col].dataType)
                    .alias("valid_to"),
                ).limit(0)
            )
        if op_col is not None:
            batch_df = batch_df.withColumn(
                "__is_del", F.col(op_col) == F.lit("D")
            )
        new_dim = scd2_apply(
            prev,
            batch_df,
            key0,
            attr_cols,
            ts_col,
            suppress_noops=False,
            delete_col="__is_del" if op_col is not None else None,
        )
        new_dim.write.mode("overwrite").parquet(f"{root}/v{epoch_id}")
        cur["version"] = epoch_id
        if prev_version is not None and prev_version != epoch_id:
            shutil.rmtree(f"{root}/v{prev_version}", ignore_errors=True)

    run_foreach_batch(change_stream, sink, timeout_s)
    if cur["version"] is None:
        # empty change feed (a normal catch-up run): the schema must match
        # every non-empty result — keys + attrs + valid_from/valid_to in
        # the stream's own types.
        ts_type = change_stream.schema[ts_col].dataType
        empty = change_stream.sparkSession.createDataFrame(
            [], change_stream.schema
        ).select(
            *key_cols,
            *attr_cols,
            F.col(ts_col).cast(ts_type).alias("valid_from"),
            F.lit(None).cast(ts_type).alias("valid_to"),
        )
        return (
            empty.withColumn("__tomb", F.lit(0))
            if op_col is not None
            else empty
        )
    return spark.read.parquet(f"{root}/v{cur['version']}")
