"""Incremental view maintenance for aggregate materializations.

A 100 TB fact table's rollups (per-key counts, sums, min/max, avg) must
not be recomputed from scratch per ingest batch. The standard IVM algebra
for distributive/algebraic aggregates:

- COUNT/SUM are abelian-group aggregates: inserts ADD, deletes SUBTRACT —
  maintenance is exact under arbitrary insert/delete mixes.
- MIN/MAX are only semigroup: inserts merge (min of mins), but a DELETE
  of the current extremum cannot be repaired from the state alone. The
  operator therefore maintains min/max incrementally for inserts and,
  when a delete batch touches a group, flags that group for re-aggregation
  (`maintain_agg` returns the dirty-key frame; `repair_minmax` recomputes
  JUST those groups against the base table — cost ∝ affected groups, not
  the view).
- AVG rides as SUM/COUNT (never a stored float — the repo's float-parity
  rule: the division happens at READ time, from exact integers/decimals).

Every path is a map-side-combinable groupBy over (key, measures) deltas —
one narrow shuffle per batch, state never leaves the executors. The merge
result is hash-identical to a full re-aggregation (property-tested, and
the DuckDB twin mirrors the read-time AVG division).

Reference: the reference's tiles/retractable accumulators
(reference src/runtime/operators/window/state/tiles.rs, aggregates with
retract support) are the streaming-window instance of the same algebra;
this module is the batch-warehouse instance over plain frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("__cnt", "__sum", "__min", "__max")


def init_agg(base: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Bootstrap the view state from the base table: per-key
    (count, sum, min, max) with the sum carried as DECIMAL(38,6) so later
    adds/subtracts are exact regardless of order. Groups whose values are
    all NULL (count(value)=0) are excluded — the same `__cnt > 0` rule
    `maintain_agg` applies, so bootstrap-then-maintain stays hash-identical
    to a fresh re-aggregation on that edge."""
    return (
        base.groupBy(*keys)
        .agg(
            F.count(value_col).alias("__cnt"),
            F.sum(F.col(value_col).cast("decimal(38,6)")).alias("__sum"),
            F.min(value_col).alias("__min"),
            F.max(value_col).alias("__max"),
        )
        .filter(F.col("__cnt") > 0)
    )


def maintain_agg(
    state: DataFrame,
    inserts: DataFrame | None,
    deletes: DataFrame | None,
    keys: list[str],
    value_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Fold insert/delete batches into the view state.

    Returns (new_state, dirty_keys): COUNT/SUM are exact for both
    directions; MIN/MAX are exact for inserts, and any group a delete
    touched appears in `dirty_keys` with its min/max NULLED in the state —
    call :func:`repair_minmax` against the base table to restore them.
    Groups whose count reaches 0 are dropped from the state.

    A still-unrepaired dirty group (NULL min/max in the state) STAYS dirty
    through subsequent maintains — an insert-only batch must not launder
    its extrema clean (min(NULL, insert_min) would look repaired while
    covering only the new rows). NULL extrema are unambiguous dirt
    markers: a live group always has __cnt > 0 non-null values, so its
    true min/max are never NULL."""
    spark = state.sparkSession
    parts = [
        state.select(
            *keys,
            "__cnt",
            "__sum",
            "__min",
            "__max",
            F.when(F.col("__min").isNull(), 1).otherwise(0).alias("__del"),
        )
    ]
    if inserts is not None:
        parts.append(
            init_agg(inserts, keys, value_col).withColumn("__del", F.lit(0))
        )
    if deletes is not None:
        neg = deletes.groupBy(*keys).agg(
            (-F.count(value_col)).alias("__cnt"),
            (-F.sum(F.col(value_col).cast("decimal(38,6)"))).alias("__sum"),
            F.lit(None).cast(state.schema["__min"].dataType).alias("__min"),
            F.lit(None).cast(state.schema["__max"].dataType).alias("__max"),
        )
        parts.append(neg.withColumn("__del", F.lit(1)))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merged = u.groupBy(*keys).agg(
        F.sum("__cnt").alias("__cnt"),
        F.sum("__sum").alias("__sum"),
        # min/max of partial minima/maxima — valid only when no delete
        # touched the group (the __del flag travels through max())
        F.min("__min").alias("__min"),
        F.max("__max").alias("__max"),
        F.max("__del").alias("__dirty"),
    )
    merged = merged.filter(F.col("__cnt") > 0)
    new_state = merged.select(
        *keys,
        "__cnt",
        "__sum",
        F.when(F.col("__dirty") == 1, F.lit(None)).otherwise(F.col("__min")).alias("__min"),
        F.when(F.col("__dirty") == 1, F.lit(None)).otherwise(F.col("__max")).alias("__max"),
    )
    dirty = merged.filter(F.col("__dirty") == 1).select(*keys)
    _ = spark  # session retained for symmetry with other maintainers
    return new_state, dirty


def repair_minmax(
    state: DataFrame,
    base: DataFrame,
    dirty_keys: DataFrame,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Recompute min/max for the dirty groups only: the base table is
    scanned ONCE filtered to dirty keys (broadcast semi-join — dirty sets
    are small by construction), cost ∝ rows of affected groups."""
    affected = base.join(F.broadcast(dirty_keys), keys, "leftsemi")
    fixed = affected.groupBy(*keys).agg(
        F.min(value_col).alias("__fmin"), F.max(value_col).alias("__fmax")
    )
    out = state.join(F.broadcast(fixed), keys, "left")
    return out.select(
        *keys,
        "__cnt",
        "__sum",
        F.coalesce("__min", "__fmin").alias("__min"),
        F.coalesce("__max", "__fmax").alias("__max"),
    )


def read_view(state: DataFrame, keys: list[str]) -> DataFrame:
    """Consumer-facing view: count, sum (double), avg, min, max. AVG is
    computed at READ time from the exact decimal sum — never a stored
    float — as double division of (exact sum cast to double) by the count:
    correctly-rounded, order-independent, and bit-identical to DuckDB's
    `CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) / count(v)` (decimal
    division would instead round at the decimal result scale, which Spark
    and DuckDB pick differently)."""
    return state.select(
        *keys,
        F.col("__cnt").alias("n"),
        F.col("__sum").cast("double").alias("total"),
        (F.col("__sum").cast("double") / F.col("__cnt")).alias("avg"),
        F.col("__min").alias("vmin"),
        F.col("__max").alias("vmax"),
    )


# --- COUNT DISTINCT maintenance (HLL sketch state) ---------------------------
#
# COUNT DISTINCT is neither distributive nor algebraic — it cannot ride the
# (cnt, sum, min, max) state above. The mergeable form is a per-group HLL
# sketch (Spark 3.5+ ships Apache DataSketches HLL as native
# hll_sketch_agg / hll_union_agg expressions): state is a small binary per
# group, batch maintenance is one union-merge shuffle, and merge(b1, b2)
# is bit-identical to rebuild(b1 ∪ b2) (sketch union is associative and
# deterministic — asserted in tests, not just approximately equal).
# Insert-only: HLL cannot retract; route deletes through a full re-agg of
# the affected groups, the min/max repair discipline above.


def init_distinct(
    base: DataFrame, keys: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Bootstrap per-group HLL sketch state (lg_k=12 → ~1.6% rel. error,
    4 KB max per group)."""
    return base.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("__hll")
    )


def maintain_distinct(
    state: DataFrame, inserts: DataFrame, keys: list[str], value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Fold an insert batch into the sketch state: one map-side-combinable
    union-merge shuffle of (keys, sketch) rows."""
    delta = init_distinct(inserts, keys, value_col, lg_k)
    return (
        state.unionByName(delta)
        .groupBy(*keys)
        .agg(F.hll_union_agg("__hll").alias("__hll"))
    )


def read_distinct(state: DataFrame, keys: list[str]) -> DataFrame:
    """(keys, approx_distinct) view of the sketch state."""
    return state.select(
        *keys, F.hll_sketch_estimate("__hll").alias("approx_distinct")
    )


# --- streaming maintenance ----------------------------------------------------


def ivm_stream_maintain(
    stream: DataFrame,
    keys: list[str],
    value_col: str,
    op_col: str | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Maintain the aggregate view under a micro-batched feed (availableNow)
    and return the final (keys, __cnt, __sum, __min, __max) state — the
    streaming face of the batch IVM algebra above, with the same
    versioned-parquet/epoch-retry exactly-once discipline as
    `streaming/runner.upsert_by_key` and `operators/cdc.cdc_stream_apply`.

    ``op_col=None``: an append-only feed — every batch folds through
    :func:`maintain_agg` as inserts; min/max never dirty, no base table
    is kept, and per-batch cost is one narrow map-side-combinable shuffle
    of (key, 4 measures) deltas.

    With ``op_col``: rows are 'I' inserts / 'D' retractions. COUNT/SUM
    retract exactly; a delete batch NULLs the touched groups' min/max,
    and the maintainer repairs them the SAME batch against the surviving
    row base it versions alongside the agg state (multiset-exact via
    ``exceptAll``). The versioned-rewrite base is O(live rows) per batch
    here; on a lakehouse table format the identical logic is MERGE INTO
    at O(delta) — the agg-state algebra is unchanged either way.

    Result is hash-identical to a fresh :func:`init_agg` over the
    surviving multiset (asserted in tests/test_ivm.py, both feed shapes,
    including a batch that deletes a group's extremum)."""
    import shutil

    from volga_spark.streaming.runner import _state_root, run_foreach_batch

    spark = stream.sparkSession
    root = _state_root()
    cur = {"version": None}
    data_cols = [c for c in stream.columns if c != op_col]

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        prev_version = cur["version"]
        if prev_version == epoch_id:
            return  # epoch retry: the committed version already has it
        ss = batch_df.sparkSession
        if prev_version is not None:
            prev = ss.read.parquet(f"{root}/v{prev_version}/agg")
        else:
            prev = init_agg(batch_df.select(*data_cols).limit(0), keys, value_col)
        if op_col is None:
            ins, dels = batch_df, None
        else:
            ins = batch_df.filter(F.col(op_col) != "D").select(*data_cols)
            dels = batch_df.filter(F.col(op_col) == "D").select(*data_cols)
        new_state, dirty = maintain_agg(prev, ins, dels, keys, value_col)
        if op_col is not None:
            if prev_version is not None:
                prev_base = ss.read.parquet(f"{root}/v{prev_version}/base")
            else:
                prev_base = batch_df.select(*data_cols).limit(0)
            new_base = prev_base.unionByName(ins).exceptAll(dels)
            new_base.write.mode("overwrite").parquet(f"{root}/v{epoch_id}/base")
            new_base = ss.read.parquet(f"{root}/v{epoch_id}/base")
            new_state = repair_minmax(new_state, new_base, dirty, keys, value_col)
        new_state.write.mode("overwrite").parquet(f"{root}/v{epoch_id}/agg")
        cur["version"] = epoch_id
        if prev_version is not None and prev_version != epoch_id:
            shutil.rmtree(f"{root}/v{prev_version}", ignore_errors=True)

    run_foreach_batch(stream, sink, timeout_s)
    if cur["version"] is None:
        return init_agg(
            spark.createDataFrame([], stream.select(*data_cols).schema),
            keys,
            value_col,
        )
    return spark.read.parquet(f"{root}/v{cur['version']}/agg")


# --- percentile maintenance (bucketed-histogram state) ------------------------
#
# Percentiles are neither distributive nor algebraic over raw values, and
# the mergeable sketches (KLL, t-digest) cannot RETRACT — a delete would
# force a full re-aggregation, the one cost IVM exists to avoid. The
# warehouse-maintainable form is a per-group bucketed HISTOGRAM: state is
# (group, bucket) integer counts, so inserts ADD and deletes SUBTRACT
# exactly (abelian, like COUNT/SUM), merge is a map-side-combinable sum,
# and any percentile reads off the bucket CDF with error bounded by the
# bucket width — a knob the caller sets from the value domain, not a
# sketch's opaque guarantee. Empty-bucket rows never exist (sparse).


def _bucket_expr(value_col: str, edges: list[float]):
    """Bucket index by binary-search CASE chain: i = #edges below value
    (bucket 0 = (-inf, e0), bucket len(edges) = [e_last, inf))."""
    b = F.lit(0)
    for e in edges:
        b = b + F.when(F.col(value_col) >= F.lit(float(e)), 1).otherwise(0)
    return b


def init_hist(
    base: DataFrame, keys: list[str], value_col: str, edges: list[float]
) -> DataFrame:
    """Bootstrap per-(group, bucket) counts; NULL values are excluded
    (percentiles are over non-null values, matching percentile_disc)."""
    return (
        base.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, _bucket_expr(value_col, edges).alias("__bkt"))
        .agg(F.count("*").alias("__n"))
    )


def maintain_hist(
    state: DataFrame,
    inserts: DataFrame | None,
    deletes: DataFrame | None,
    keys: list[str],
    value_col: str,
    edges: list[float],
) -> DataFrame:
    """Fold insert/delete batches: one narrow (keys, bucket, ±count)
    shuffle; exact for BOTH directions (bucket counts are an abelian
    group — the property KLL/t-digest lack). Zero-count buckets drop."""
    parts = [state]
    if inserts is not None:
        parts.append(init_hist(inserts, keys, value_col, edges))
    if deletes is not None:
        parts.append(
            init_hist(deletes, keys, value_col, edges).withColumn(
                "__n", -F.col("__n")
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(*keys, "__bkt")
        .agg(F.sum("__n").alias("__n"))
        .filter(F.col("__n") != 0)
    )


def read_percentile_bucket(
    state: DataFrame, keys: list[str], q: float
) -> DataFrame:
    """(keys, bucket holding the q-th percentile, cumulative rank): the
    smallest bucket whose cumulative count reaches ceil(q * total) — the
    percentile_disc rank over the bucketed distribution. The TRUE
    percentile value lies inside the returned bucket's edge interval, so
    the answer's error is the bucket width by construction. One window
    over the (sparse) state only — the base table is never touched."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy("__bkt")
    tot = Window.partitionBy(*keys)
    ranked = state.select(
        *keys,
        "__bkt",
        F.sum("__n").over(w).alias("__cum"),
        F.sum("__n").over(tot).alias("__tot"),
    )
    target = F.ceil(F.lit(q) * F.col("__tot"))
    hit = ranked.filter(F.col("__cum") >= target)
    w2 = Window.partitionBy(*keys).orderBy("__bkt")
    return (
        hit.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") == 1)
        .select(*keys, F.col("__bkt").alias("bucket"), F.col("__cum").alias("cum_rank"))
    )


def hist_stream_maintain(
    stream: DataFrame,
    keys: list[str],
    value_col: str,
    edges: list[float],
    op_col: str | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Maintain the bucketed-histogram percentile state under a
    micro-batched feed (availableNow); returns the final sparse
    (keys, __bkt, __n) state. Unlike min/max, retraction needs NO base
    table and NO repair — bucket counts subtract exactly — so the delete
    path is as cheap as the insert path: one narrow shuffle per batch.
    Same versioned-parquet/epoch-retry exactly-once discipline as
    :func:`ivm_stream_maintain`."""
    import shutil

    from volga_spark.streaming.runner import _state_root, run_foreach_batch

    spark = stream.sparkSession
    root = _state_root()
    cur = {"version": None}
    data_cols = [c for c in stream.columns if c != op_col]

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        prev_version = cur["version"]
        if prev_version == epoch_id:
            return
        ss = batch_df.sparkSession
        if prev_version is not None:
            prev = ss.read.parquet(f"{root}/v{prev_version}")
        else:
            prev = init_hist(
                batch_df.select(*data_cols).limit(0), keys, value_col, edges
            )
        if op_col is None:
            ins, dels = batch_df, None
        else:
            ins = batch_df.filter(F.col(op_col) != "D").select(*data_cols)
            dels = batch_df.filter(F.col(op_col) == "D").select(*data_cols)
        new_state = maintain_hist(prev, ins, dels, keys, value_col, edges)
        new_state.write.mode("overwrite").parquet(f"{root}/v{epoch_id}")
        cur["version"] = epoch_id
        if prev_version is not None and prev_version != epoch_id:
            shutil.rmtree(f"{root}/v{prev_version}", ignore_errors=True)

    run_foreach_batch(stream, sink, timeout_s)
    if cur["version"] is None:
        return init_hist(
            spark.createDataFrame([], stream.select(*data_cols).schema),
            keys,
            value_col,
            edges,
        )
    return spark.read.parquet(f"{root}/v{cur['version']}")
