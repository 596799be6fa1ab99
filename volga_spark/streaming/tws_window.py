"""``transformWithStateInPandas`` backend for the tiled sliding window.

The ``applyInPandasWithState`` handler (streaming/tiled_window.py) serializes
the ENTIRE per-bucket state through one state column every micro-batch —
read O(state) + write O(state). Spark 4's ``transformWithStateInPandas``
(TWS) exposes composite state primitives instead, and this backend maps the
same ``_GroupCore`` state machine onto them so the per-batch WRITE cost is
O(delta), the shape the reference's store has (tiles land once, immutable;
reference src/runtime/operators/window/state/tiles.rs):

- ``head``   — ListState of open-bucket raw rows (small; rewritten per batch)
- ``tiles``  — MapState keyed (key…, level, bucket_start). Closed-bucket
  partials are IMMUTABLE, so per batch only newly closed/rolled-up tiles are
  ``updateValue``'d and GC'd tiles ``removeKey``'d — never a full rewrite.
- ``cursors``— MapState key → max-emitted cursor; only swept keys update.

Requires the RocksDB state store provider (a Spark TWS constraint) AND the
``google.protobuf`` package (Spark's TWS Python↔JVM state protocol runs a
protobuf-framed state server; ``tws_available()`` gates on it). This image
ships neither protobuf nor pip, so the integration path is
ENVIRONMENT-BLOCKED here — the same class of block as the Kafka jars. The
tile codec (encode/decode between ``_GroupCore`` tiles and the MapState
value rows) is pure Python and fully unit-tested
(tests/test_tws_window.py); the integration test against the apply-based
handler runs wherever protobuf exists and is skip-gated here. Both
backends drive the same ``_GroupCore``, so results are bit-identical by
construction.
"""

from __future__ import annotations

import os
import uuid

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from volga_spark.operators.window import RangeFrame, interval_to_micros
from volga_spark.streaming.tiled_window import (
    BKT,
    TS,
    TiledCateSpec,
    TiledRatioSpec,
    TiledSpec,
    TiledTopSpec,
    _auto_granularity_us,
    _GroupCore,
)


def tws_available() -> bool:
    """True when Spark's transformWithStateInPandas can actually run:
    its state server needs google.protobuf on the Python side."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


def _sum_t(schema, c):
    return "bigint" if schema[c] in ("bigint", "int", "smallint", "tinyint") else "double"


def _tile_value_fields(core: _GroupCore, schema: dict) -> str:
    """Flat per-tile value schema: the same component layout the apply
    backend packs into its state-column arrays, for ONE tile."""
    fields = []
    for j, c in enumerate(core.inputs):
        fields += [
            f"n{j} bigint",
            f"s{j} {_sum_t(schema, c)}",
            f"s2{j} double",
            f"mn{j} {schema[c]}",
            f"mx{j} {schema[c]}",
        ]
    for j, s in enumerate(core.cate_specs):
        fields += [
            f"gc{j} array<{schema[s.cat_col]}>",
            f"gn{j} array<bigint>",
            f"gs{j} array<{_sum_t(schema, s.col)}>",
            f"gm{j} array<{schema[s.col]}>",
            f"gx{j} array<{schema[s.col]}>",
        ]
    for j, s in enumerate(core.top_specs):
        fields += [f"hv{j} array<{schema[s.col]}>", f"hc{j} array<bigint>"]
    for j, s in enumerate(core.ratio_specs):
        fields += [
            f"rc{j} array<{schema[s.cat_col]}>",
            f"rd{j} array<bigint>",
            f"rn{j} array<bigint>",
        ]
    return ", ".join(fields)


def _encode_tile(core: _GroupCore, tile: dict) -> tuple:
    out: list = []
    for j in range(len(core.inputs)):
        out.extend(tile["sc"][j])
    for j in range(len(core.cate_specs)):
        cats = sorted(tile["cate"][j])
        comp = [tile["cate"][j][c] for c in cats]
        out.append(cats)
        for i in range(4):
            out.append([c[i] for c in comp])
    for j in range(len(core.top_specs)):
        vals = sorted(tile["top"][j])
        out.append(vals)
        out.append([tile["top"][j][v] for v in vals])
    for j in range(len(core.ratio_specs)):
        cats = sorted(tile["ratio"][j])
        out.append(cats)
        out.append([tile["ratio"][j][c][0] for c in cats])
        out.append([tile["ratio"][j][c][1] for c in cats])
    return tuple(out)


def _decode_tile(core: _GroupCore, row: tuple) -> dict:
    from collections import Counter

    pos = 0
    sc = []
    for _ in range(len(core.inputs)):
        sc.append(tuple(row[pos : pos + 5]))
        pos += 5
    cate = []
    for _ in range(len(core.cate_specs)):
        gc, gn, gs, gm, gx = row[pos : pos + 5]
        pos += 5
        cate.append(
            {c: (gn[i], gs[i], gm[i], gx[i]) for i, c in enumerate(gc)}
        )
    tops = []
    for _ in range(len(core.top_specs)):
        hv, hc = row[pos : pos + 2]
        pos += 2
        tops.append(Counter(dict(zip(hv, hc))))
    ratios = []
    for _ in range(len(core.ratio_specs)):
        rc, rd, rn = row[pos : pos + 3]
        pos += 3
        ratios.append({c: (rd[i], rn[i]) for i, c in enumerate(rc)})
    return {"sc": sc, "cate": cate, "top": tops, "ratio": ratios}


def tiled_sliding_window_stream_tws(
    df: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    frame: RangeFrame,
    specs: list,
    passthrough: list[str],
    lateness: str = "10 minutes",
    granularity: str | list[str] | None = None,
    prepared: dict | None = None,
    n_buckets: int = 64,
    spill_root: str | None = None,
) -> DataFrame:
    """Same contract (and bit-identical results) as
    ``tiled_sliding_window_stream`` — TWS composite-state backend."""
    if not isinstance(frame, RangeFrame):
        raise ValueError("tiled windows are time-bucketed; use a RANGE frame")
    import numpy as np  # noqa: F401

    import volga_spark.streaming.tiled_window as _tiled
    import volga_spark.streaming.tws_window as _self

    try:
        from pyspark.cloudpickle import register_pickle_by_value

        import volga_spark.formatting as _fmt
        import volga_spark.functions.accumulators as _acc

        register_pickle_by_value(_self)
        register_pickle_by_value(_tiled)
        register_pickle_by_value(_acc)
        register_pickle_by_value(_fmt)
    except Exception:
        pass

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    L = frame.micros
    if granularity is None:
        g = [_auto_granularity_us(L)]
    elif isinstance(granularity, (list, tuple)):
        g = [interval_to_micros(x) for x in granularity]
    else:
        g = [interval_to_micros(granularity)]
    plan_token = uuid.uuid4().hex[:12]

    work = df
    for name, expr in (prepared or {}).items():
        work = work.withColumn(name, expr)
    work = work.withColumn(TS, F.unix_micros(F.col(ts_col)))
    work = work.withColumn(
        BKT, F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast("int")
    )
    work = work.withWatermark(ts_col, lateness)

    scalar_specs = [s for s in specs if isinstance(s, TiledSpec)]
    cate_specs = [s for s in specs if isinstance(s, TiledCateSpec)]
    top_specs = [s for s in specs if isinstance(s, TiledTopSpec)]
    ratio_specs = [s for s in specs if isinstance(s, TiledRatioSpec)]
    inputs = sorted({s.col for s in scalar_specs})
    out_pass = [c for c in passthrough if c not in keys and c != ts_col]
    schema = {f.name: f.dataType.simpleString() for f in work.schema.fields}

    core = _GroupCore(
        keys,
        inputs,
        out_pass,
        L,
        g,
        scalar_specs,
        None,
        cate_specs,
        top_specs,
        ratio_specs,
        int_inputs={
            c
            for c in inputs
            if schema[c] in ("bigint", "int", "smallint", "tinyint")
        },
    )

    row_fields = keys + [TS] + core.stored
    head_schema = ", ".join(
        f"`{c}` {'bigint' if c == TS else schema[c]}" for c in row_fields
    )
    tile_key_schema = ", ".join(
        [f"`{k}` {schema[k]}" for k in keys] + ["lvl bigint", "b0 bigint"]
    )
    tile_val_schema = _tile_value_fields(core, schema)
    cursor_key_schema = ", ".join(f"`{k}` {schema[k]}" for k in keys)

    key_fields = ", ".join(f"`{k}` {schema[k]}" for k in keys)
    pass_fields = "".join(f", `{c}` {schema[c]}" for c in out_pass)
    all_specs = scalar_specs + cate_specs + top_specs + ratio_specs
    spec_fields = "".join(f", `{s.name}` {s.out_type}" for s in all_specs)
    out_schema = f"{key_fields}, {TS} bigint{pass_fields}{spec_fields}"

    nk = len(keys)

    class _TiledProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.head = handle.getListState("head", head_schema)
            self.tiles = handle.getMapState("tiles", tile_key_schema, tile_val_schema)
            self.cursors = handle.getMapState("cursors", cursor_key_schema, "cmax bigint")

        def handleInputRows(self, key, rows, timer_values):
            import numpy as np

            root = spill_root
            if root is None:
                from pyspark import TaskContext

                tc = TaskContext.get()
                qid = tc.getLocalProperty("sql.streaming.queryId") if tc else None
                root = os.path.join(
                    "/tmp/volga_spark_rowstore",
                    f"q{qid}" if qid else f"plan{plan_token}",
                )
            core.spill_path = os.path.join(root, f"b{key[0]}")

            wm_us = timer_values.getCurrentWatermarkInMs() * 1000
            st = core.empty_state()
            if self.head.exists():
                head_rows = list(self.head.get())
                if head_rows:
                    cols = list(zip(*head_rows))
                    for i, c in enumerate(row_fields):
                        arr = np.asarray(
                            cols[i], dtype="int64" if c == TS else None
                        )
                        if arr.dtype.kind not in ("i", "f", "b"):
                            arr = np.asarray(cols[i], dtype=object)
                        st["head"][c] = arr
            old_tiles = set()
            if self.tiles.exists():
                for ukey, val in self.tiles.iterator():
                    kt = tuple(ukey[:nk])
                    lvl, b0 = int(ukey[nk]), int(ukey[nk + 1])
                    st["tiles"][(kt, lvl, b0)] = _decode_tile(core, val)
                    old_tiles.add((kt, lvl, b0))
            if self.cursors.exists():
                for ukey, val in self.cursors.iterator():
                    st["cursors"][tuple(ukey)] = int(val[0])
            old_cursors = dict(st["cursors"])

            new = pd.concat(list(rows), ignore_index=True)
            out, st = core.advance(st, new, wm_us)

            # write back: head wholesale (small by design), tiles/cursors as
            # DELTAS — closed tiles are immutable, so only newly created and
            # GC'd entries touch the store
            head = st["head"]
            n_head = len(head[TS])
            if n_head:
                self.head.put(
                    [
                        tuple(
                            v.item() if hasattr(v, "item") else v
                            for v in (head[c][i] for c in row_fields)
                        )
                        for i in range(n_head)
                    ]
                )
            else:
                self.head.clear()
            new_tiles = set(st["tiles"])
            for tkey in old_tiles - new_tiles:
                kt, lvl, b0 = tkey
                self.tiles.removeKey((*kt, lvl, b0))
            for tkey in new_tiles - old_tiles:
                kt, lvl, b0 = tkey
                self.tiles.updateValue(
                    (*kt, lvl, b0), _encode_tile(core, st["tiles"][tkey])
                )
            for kt, cmax in st["cursors"].items():
                if old_cursors.get(kt) != cmax:
                    self.cursors.updateValue(kt, (int(cmax),))
            if out is not None and len(out):
                yield out

        def close(self) -> None:
            pass

    out = work.groupBy(BKT).transformWithStateInPandas(
        statefulProcessor=_TiledProcessor(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="eventTime",
    )
    out = out.withColumn(ts_col, F.timestamp_micros(F.col(TS))).drop(TS)
    return out.select(*keys, ts_col, *out_pass, *[s.name for s in all_specs])
