"""Stateful per-row sliding windows over a stream (SURVEY §2.8 streaming
path, §7 phase 4).

Reproduces the reference WindowOperator's streaming semantics (reference
src/runtime/operators/window/window_operator.rs:292-390):

- rows buffer per key; **emission is watermark-driven**: a row's window
  result is emitted once the watermark passes its event time;
- late rows at/before the per-key processed position are dropped on ingest
  (reference drop rule window_operator.rs:308-336 — cutoff is
  max(processed_pos, wm - lateness); Spark's watermark delay supplies the
  lateness term, the ``max_emitted`` cursor supplies processed_pos);
- one output row per input row, input passthrough + one column per agg;
- end-of-stream flush (MAX_WATERMARK) = flush-punctuation rows from
  ``chunked_file_stream(flush=True)`` or a final batch query.

Implementation: ``applyInPandasWithState`` keeping (ts array + input/
passthrough arrays + processed cursor) per key; each micro-batch merges new
rows, runs the same two-pointer add/retract sweep as the batch path
(functions/sliding.run_sweep — the reference's 'retractable accumulator'
design), emits rows ≤ watermark, and prunes state to the window horizon —
so state size is O(window length), equivalent to the reference's bucket
pruning (src/storage/index/bucket_index.rs), without its tile hierarchy
(nothing is ever rescanned, so tiles would only help cold restores).

Scale: state lives in the state store (HDFS/RocksDB-backed on a cluster),
partitioned by key hash — the same layout the reference persists via its
checkpoint blobs, but managed by Spark's checkpointing.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from volga_spark.functions.sliding import (
    SlidingSpec,
    _self_contained_udfs,
    run_sweep_arrays,
)
from volga_spark.operators.window import Frame, RangeFrame

TS = "__ts_us"


def sliding_window_stream(
    df: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    frame: Frame,
    specs: list[SlidingSpec],
    passthrough: list[str],
    lateness: str = "10 minutes",
    prepared: dict | None = None,
) -> DataFrame:
    """Streaming per-row sliding-window aggregation.

    ``df`` is a streaming DataFrame with event-time column ``ts_col``.
    Returns a streaming DataFrame: key cols + ``ts_col`` + ``passthrough`` +
    one column per spec. Output mode: append.
    """
    _self_contained_udfs()
    import volga_spark.streaming.stateful_window as _self
    try:
        from pyspark.cloudpickle import register_pickle_by_value

        register_pickle_by_value(_self)
        import volga_spark.functions.sliding as _sl

        register_pickle_by_value(_sl)
    except Exception:
        pass

    from pyspark.sql.streaming.state import GroupStateTimeout

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    work = df
    for name, expr in (prepared or {}).items():
        work = work.withColumn(name, expr)
    work = work.withColumn(TS, F.unix_micros(F.col(ts_col)))
    work = work.withWatermark(ts_col, lateness)

    input_cols = sorted({c for s in specs for c in s.inputs})
    stored = list(dict.fromkeys([c for c in passthrough if c not in keys and c != ts_col] + input_cols))
    schema = {f.name: f.dataType.simpleString() for f in work.schema.fields}

    key_fields = ", ".join(f"`{k}` {schema[k]}" for k in keys)
    pass_fields = "".join(
        f", `{c}` {schema[c]}" for c in passthrough if c not in keys and c != ts_col
    )
    spec_fields = "".join(f", `{s.name}` {s.out_type}" for s in specs)
    out_schema = f"{key_fields}, {TS} bigint{pass_fields}{spec_fields}"

    state_fields = [f"ts array<bigint>"] + [
        f"c{i} array<{schema[c]}>" for i, c in enumerate(stored)
    ] + ["max_emitted bigint"]
    state_schema = ", ".join(state_fields)

    is_range = isinstance(frame, RangeFrame)
    length = frame.micros if is_range else frame.preceding
    spec_data = [(s.name, s.factory, s.inputs, s.finish) for s in specs]
    out_pass = [c for c in passthrough if c not in keys and c != ts_col]

    # handler works on plain numpy arrays end to end — per-key pandas frame
    # construction dominated handler cost with many small keys
    def handler(key, pdfs, state):
        import numpy as np

        new = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            st = state.get
            buf_arrays = {TS: np.asarray(st[0], dtype=np.int64)}
            for i, c in enumerate(stored):
                buf_arrays[c] = np.asarray(st[1 + i])
            max_emitted = st[-1]
        else:
            buf_arrays = None
            max_emitted = -(1 << 62)

        # ingest drop rule (reference window_operator.rs:308-336):
        # cutoff = max(processed_pos, wm - lateness); Spark's watermark value
        # already has the delay subtracted.
        wm_us = state.getCurrentWatermarkMs() * 1000
        new_ts = new[TS].to_numpy()
        ingest = new_ts > max(max_emitted, wm_us)
        cols = {TS: new_ts[ingest]}
        for c in stored:
            cols[c] = new[c].to_numpy()[ingest]
        if buf_arrays is not None:
            for c in cols:
                cols[c] = np.concatenate([buf_arrays[c], cols[c]])
        order = np.argsort(cols[TS], kind="stable")
        cols = {c: a[order] for c, a in cols.items()}
        n = len(cols[TS])
        ts_arr = cols[TS]

        emit_mask = (ts_arr <= wm_us) & (ts_arr > max_emitted)
        # context rows are swept (add/retract) but not re-formatted
        outs = run_sweep_arrays(
            cols, n, TS, is_range, length, spec_data, emit_mask=emit_mask
        )

        if emit_mask.any():
            n_emit = int(emit_mask.sum())
            res = {k: [kv] * n_emit for k, kv in zip(keys, key)}
            res[TS] = ts_arr[emit_mask]
            for c in out_pass:
                res[c] = cols[c][emit_mask]
            for (name, _, _, _), vals in zip(spec_data, outs):
                res[name] = [v for v, m in zip(vals, emit_mask) if m]
            res = pd.DataFrame(res)
            new_max = int(ts_arr[emit_mask].max())
        else:
            res = None
            new_max = max_emitted

        # prune: keep unemitted rows + window context behind the watermark
        if is_range:
            keep = ts_arr > wm_us - length
        else:
            n_unemitted = int((ts_arr > wm_us).sum())
            keep = np.zeros(n, dtype=bool)
            keep[max(0, n - (length + n_unemitted)) :] = True
        state.update(
            (
                cols[TS][keep].tolist(),
                *[cols[c][keep].tolist() for c in stored],
                int(new_max),
            )
        )
        if res is not None:
            yield res

    out = work.groupBy(*keys).applyInPandasWithState(
        handler,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = out.withColumn(ts_col, F.timestamp_micros(F.col(TS))).drop(TS)
    return out.select(*keys, ts_col, *out_pass, *[s.name for s in specs])
