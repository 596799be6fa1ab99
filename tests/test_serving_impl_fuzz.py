"""Cross-implementation serving fuzzer (r13 — VERDICT #4).

The q_request_* oracles pin FIXED shapes; this harness draws randomized
(frame length × ladder geometry × state distribution × request batch)
shapes and runs the SAME lookup through every serving implementation:

  1. the native union-window path (point_in_time_lookup) — the baseline,
  2. flat single-level tiles (tiled_lookup, granularities=None),
  3. the ladder with the PRECOMPUTED COVER TEMPLATE (the serving default),
  4. the ladder with the CARRY-CHAIN cover (the >1M-template-row fallback),
  5. the TiledFeatureService with an explicit multi-shard split.

All five must agree bit-for-bit (counts are longs; sums go through the
cents rule so the doubles are exact; min/max are picks). Seed count:
FUZZ_SERVING_SEEDS env (CI default 6; deep sweeps crank it).

ROWS frames (r13) get the same treatment in
:func:`test_rows_serving_impls_agree`: the two-pass native path, the
block-decomposed position index (union as-of AND the bucketed
bucket-index seek at random granularities), and the pinned
RowsFeatureService, all against a brute-force last-n-state-rows model.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta

import pandas as pd
import pytest

from pyspark.sql import functions as F

from volga_spark.operators.request import masked, point_in_time_lookup
from volga_spark.operators.tiles import (
    TiledFeatureService,
    build_cover_template,
    build_tile_ladder,
    cover_template_eligible,
    tiled_lookup,
)
from volga_spark.operators.window import RangeFrame, interval_to_micros

_SEEDS = int(os.environ.get("FUZZ_SERVING_SEEDS", "6"))

# (frame, ladder levels) — every ladder is divisibility-valid and the
# template is eligible for some, not others, so both cover decompositions
# get drawn
_FRAMES = [
    ("30 minutes", ["1 minute", "10 minutes"]),
    ("2 hours", ["1 minute", "30 minutes"]),
    ("1 hour", ["30 seconds", "5 minutes"]),
    ("45 minutes", ["15 seconds", "3 minutes"]),
    ("3 hours", ["2 minutes", "60 minutes"]),
]


def _draw(seed: int):
    rng = random.Random(7_000 + seed)
    frame_s, levels = _FRAMES[seed % len(_FRAMES)]
    n_users = rng.randint(2, 6)
    n_rows = rng.randint(150, 500)
    base = datetime(2024, 7, 1)
    span_s = rng.randint(3600, 6 * 3600)
    state = pd.DataFrame(
        {
            "user_id": [rng.randrange(n_users) for _ in range(n_rows)],
            "ts": [
                base + timedelta(seconds=rng.randrange(span_s))
                for _ in range(n_rows)
            ],
            "value": [
                round(rng.uniform(-50, 150), 2) for _ in range(n_rows)
            ],
        }
    )
    n_req = rng.randint(20, 60)
    reqs = []
    for rid in range(n_req):
        mode = rng.random()
        if mode < 0.15:  # key with no state
            u, ts = n_users + 1, base + timedelta(seconds=rng.randrange(span_s))
        elif mode < 0.3:  # before any state
            u, ts = rng.randrange(n_users), base - timedelta(seconds=rng.randint(1, 600))
        elif mode < 0.5:  # exactly ON a state row's ts (at-or-before tie)
            row = state.iloc[rng.randrange(len(state))]
            u, ts = int(row.user_id), row.ts
        else:
            u, ts = rng.randrange(n_users), base + timedelta(
                seconds=rng.randrange(span_s + 1800)
            )
        reqs.append({"request_id": rid, "user_id": u, "ts": ts})
    return frame_s, levels, state, pd.DataFrame(reqs)


def _native(spark, state_df, reqs_df, frame: RangeFrame) -> dict:
    out = point_in_time_lookup(
        state_df,
        reqs_df,
        key_cols="user_id",
        ts_col="ts",
        frame=frame,
        agg_builder=lambda w: {
            "cnt": F.count(masked("value")).over(w),
            "sum_value": F.sum(F.round(masked("value") * 100).cast("long")).over(w)
            / F.lit(100.0),
            "min_value": F.min(masked("value")).over(w),
            "max_value": F.max(masked("value")).over(w),
        },
    ).collect()
    return {r["request_id"]: r for r in out}


def _check(name: str, got_rows, want: dict, seed: int):
    got = {r["request_id"]: r for r in got_rows}
    assert set(got) == set(want), f"seed {seed} {name}: request id sets differ"
    bad = []
    for rid, w in want.items():
        g = got[rid]
        for c in ("cnt", "sum_value", "min_value", "max_value"):
            gv, wv = g[c], w[c]
            # tiled path returns cnt=0 + NULL aggs for no-match requests,
            # the native path count() is also 0 — exact compare throughout
            if gv != wv and not (gv is None and wv is None):
                bad.append((rid, c, gv, wv))
    assert not bad, f"seed {seed} {name}: {len(bad)} mismatches, first 5: {bad[:5]}"


@pytest.mark.parametrize("seed", range(_SEEDS))
def test_all_serving_impls_agree(spark, seed):
    frame_s, levels, state_pdf, reqs_pdf = _draw(seed)
    frame = RangeFrame(frame_s)
    gs = [interval_to_micros(x) for x in levels]
    state_df = spark.createDataFrame(state_pdf).localCheckpoint()
    reqs_df = spark.createDataFrame(reqs_pdf).localCheckpoint()

    want = _native(spark, state_df, reqs_df, frame)

    # 2. flat single-level tiles
    flat = tiled_lookup(
        state_df,
        reqs_df,
        key_cols="user_id",
        ts_col="ts",
        value_col="value",
        frame=frame,
        granularity=levels[0],
    ).collect()
    _check("flat-tiles", flat, want, seed)

    # 3+4. ladder, both cover decompositions
    tiles = build_tile_ladder(state_df, ["user_id"], "ts", "value", levels)
    if cover_template_eligible(frame.micros, gs):
        tpl = build_cover_template(spark, frame.micros, gs)
        templ = tiled_lookup(
            state_df,
            reqs_df,
            key_cols="user_id",
            ts_col="ts",
            value_col="value",
            frame=frame,
            granularity=levels[0],
            granularities=levels,
            tiles=tiles,
            cover_template=tpl,
        ).collect()
        _check("ladder-template", templ, want, seed)
    chain_sink: list = []
    chain = tiled_lookup(
        state_df,
        reqs_df,
        key_cols="user_id",
        ts_col="ts",
        value_col="value",
        frame=frame,
        granularity=levels[0],
        granularities=levels,
        tiles=tiles,
        cover_template=None,
        _barrier_sink=chain_sink,
    ).collect()
    _check("ladder-carry-chain", chain, want, seed)
    for f in chain_sink:
        f.unpersist()

    # 5. the service front end with an explicit multi-shard split
    svc = TiledFeatureService(
        state_df,
        tiles,
        key_cols="user_id",
        ts_col="ts",
        value_col="value",
        frame=frame,
        granularity=levels[0],
        granularities=levels,
    )
    try:
        sharded = svc.lookup(reqs_df, shards=3).collect()
        _check("service-sharded", sharded, want, seed)
        # and the auto path with the n_requests hint (r13: pin retained)
        hinted = svc.lookup(reqs_df, n_requests=len(reqs_pdf)).collect()
        _check("service-hinted", hinted, want, seed)
    finally:
        svc.close()


def _draw_rows(seed: int):
    """ROWS-frame shapes: duplicate timestamps (the tiebreak matters), ~10%
    null values (null rows OCCUPY frame positions but don't count), co-keyed
    request floods at one shared ts (the position-displacement hazard), keys
    with no state, requests before any state, and n spanning the same-block
    prefix case (frame start exactly at a block boundary) through n larger
    than any key's history."""
    rng = random.Random(23_000 + seed)
    n = rng.choice([1, 2, 3, 5, 8, 13, 40, 10_000])
    n_users = rng.randint(2, 5)
    n_rows = rng.randint(120, 400)
    base = datetime(2024, 7, 1)
    grid = rng.choice([5, 30, 60])  # coarse grid -> frequent duplicate ts
    slots = rng.randint(20, 80)
    state = pd.DataFrame(
        {
            "user_id": [rng.randrange(n_users) for _ in range(n_rows)],
            "ts": [
                base + timedelta(seconds=grid * rng.randrange(slots))
                for _ in range(n_rows)
            ],
            "seq": list(range(n_rows)),
            "value": [
                None if rng.random() < 0.1 else round(rng.uniform(-50, 150), 2)
                for _ in range(n_rows)
            ],
        }
    )
    reqs = []
    rid = 0
    for _ in range(rng.randint(20, 50)):
        mode = rng.random()
        if mode < 0.12:
            u, ts = n_users + 1, base + timedelta(seconds=rng.randrange(grid * slots))
        elif mode < 0.24:
            u, ts = rng.randrange(n_users), base - timedelta(seconds=rng.randint(1, 600))
        elif mode < 0.5:  # exactly ON a state ts (at-or-before tie)
            row = state.iloc[rng.randrange(len(state))]
            u, ts = int(row.user_id), row.ts
        else:
            u, ts = rng.randrange(n_users), base + timedelta(
                seconds=rng.randrange(grid * slots + 900)
            )
        reqs.append({"request_id": rid, "user_id": u, "ts": ts})
        rid += 1
    flood_ts = base + timedelta(seconds=grid * (slots // 2))
    for _ in range(5):  # co-keyed co-timestamped flood
        reqs.append({"request_id": rid, "user_id": 0, "ts": flood_ts})
        rid += 1
    return n, state, pd.DataFrame(reqs)


def _rows_oracle(state: pd.DataFrame, reqs: pd.DataFrame, n: int) -> dict:
    out = {}
    for r in reqs.itertuples():
        s = state[(state.user_id == r.user_id) & (state.ts <= r.ts)]
        s = s.sort_values(["ts", "seq"]).tail(n)
        cnt = int(s.value.notna().sum())
        out[r.request_id] = {
            "cnt": cnt,
            "sum_value": None if cnt == 0 else round(float(s.value.sum()), 6),
            "min_value": None if cnt == 0 else float(s.value.min()),
            "max_value": None if cnt == 0 else float(s.value.max()),
        }
    return out


@pytest.mark.parametrize("seed", range(_SEEDS))
def test_rows_serving_impls_agree(spark, seed):
    """r13: every ROWS-frame serving implementation — the two-pass native
    path, the block-decomposed position index (fresh build AND the pinned
    RowsFeatureService with materialize=True) — against the brute-force
    last-n-state-rows model."""
    from volga_spark.operators.rows_index import RowsFeatureService, rows_lookup
    from volga_spark.operators.window import rows_frame

    n, state_pdf, reqs_pdf = _draw_rows(seed)
    state_df = spark.createDataFrame(state_pdf).localCheckpoint()
    reqs_df = spark.createDataFrame(reqs_pdf).localCheckpoint()
    want = _rows_oracle(state_pdf, reqs_pdf, n)

    def _chk(name, rows):
        got = {r["request_id"]: r for r in rows}
        assert set(got) == set(want), f"seed {seed} {name}: id sets differ"
        bad = []
        for rid, w in want.items():
            g = got[rid]
            for c in ("cnt", "min_value", "max_value"):
                if g[c] != w[c] and not (g[c] is None and w[c] is None):
                    bad.append((rid, c, g[c], w[c]))
            gs, ws = g["sum_value"], w["sum_value"]
            if (gs is None) != (ws is None) or (
                gs is not None and abs(gs - ws) > 1e-9
            ):
                bad.append((rid, "sum_value", gs, ws))
        assert not bad, f"seed {seed} n={n} {name}: {bad[:5]}"

    native = point_in_time_lookup(
        state_df,
        reqs_df,
        key_cols="user_id",
        ts_col="ts",
        frame=rows_frame(n),
        tiebreak="seq",
        agg_builder=lambda w: {
            "cnt": F.count(masked("value")).over(w),
            "sum_value": F.sum(F.round(masked("value") * 100).cast("long")).over(w)
            / F.lit(100.0),
            "min_value": F.min(masked("value")).over(w),
            "max_value": F.max(masked("value")).over(w),
        },
    ).collect()
    _chk("rows-native", native)

    idx = rows_lookup(
        state_df,
        reqs_df,
        key_cols="user_id",
        ts_col="ts",
        value_col="value",
        frame=rows_frame(n),
        tiebreak="seq",
    ).collect()
    _chk("rows-index", idx)

    bucket = random.Random(31_000 + seed).choice(
        ["auto", "30 seconds", "10 minutes", "6 hours"]
    )
    bk = rows_lookup(
        state_df,
        reqs_df,
        key_cols="user_id",
        ts_col="ts",
        value_col="value",
        frame=rows_frame(n),
        tiebreak="seq",
        bucket=bucket,
    ).collect()
    _chk(f"rows-bucketed[{bucket}]", bk)

    svc = RowsFeatureService(
        state_df,
        key_cols="user_id",
        ts_col="ts",
        value_col="value",
        frame=rows_frame(n),
        tiebreak="seq",
    )
    try:
        _chk("rows-service", svc.lookup(reqs_df, materialize=True).to_pylist())
    finally:
        svc.close()


def test_materialized_lookup_has_no_consume_cadence(spark):
    """r13 (VERDICT #3): lookup(materialize=True) returns a collected
    pyarrow.Table — holding the previous batch's materialized result past
    the caller's next lookup is safe (the eager-pin cadence applies only
    to live DataFrame results), and all three front ends agree with their
    live-plan twins."""
    import pyarrow as pa

    frame_s, levels, state_pdf, reqs_pdf = _draw(0)
    frame = RangeFrame(frame_s)
    state_df = spark.createDataFrame(state_pdf).localCheckpoint()
    reqs_df = spark.createDataFrame(reqs_pdf).localCheckpoint()
    want = _native(spark, state_df, reqs_df, frame)

    svc = TiledFeatureService(
        state_df,
        build_tile_ladder(state_df, ["user_id"], "ts", "value", levels),
        key_cols="user_id",
        ts_col="ts",
        value_col="value",
        frame=frame,
        granularity=levels[0],
        granularities=levels,
    )
    try:
        first = svc.lookup(reqs_df, n_requests=len(reqs_pdf), materialize=True)
        assert isinstance(first, pa.Table)
        # issue ANOTHER lookup, then consume the FIRST result — with a live
        # DataFrame this exact sequence raises
        # CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND; materialized results are data
        svc.lookup(reqs_df, n_requests=len(reqs_pdf), materialize=True)
        _check("materialized-stale", first.to_pylist(), want, 0)
        # no pins left behind by materialized batches
        assert sum(len(v) for v in svc._batch_pin_rdd_ids.values()) == 0
        assert sum(len(v) for v in svc._batch_pins.values()) == 0
        # get_features rides the materialized path
        pts = [
            (int(r.request_id), int(r.user_id), r.ts.to_pydatetime())
            for r in reqs_pdf.itertuples()
        ][:5]
        feats = {d["request_id"]: d for d in svc.get_features(spark, pts)}
        for rid, d in feats.items():
            assert d["cnt"] == want[rid]["cnt"]
    finally:
        svc.close()
