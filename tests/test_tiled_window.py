"""Tiled streaming window state: exactness vs a brute-force model and the
state-size bound (reference tiles.rs:59-118 — long-window state holds tile
partials + edge rows, not the raw window interior)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from volga_spark.streaming.tiled_window import TS, TiledSpec, _GroupCore

KEY = "user_id"
MS = 1000  # µs per ms


def _mk_core(tmp_path, window_ms, gran_ms, specs=None):
    specs = specs or [
        TiledSpec("cnt", "count", "v", "bigint"),
        TiledSpec("s", "sum", "v", "bigint"),
        TiledSpec("a", "avg", "v", "double"),
        TiledSpec("mn", "min", "v", "bigint"),
        TiledSpec("mx", "max", "v", "bigint"),
    ]
    return _GroupCore(
        keys=[KEY],
        inputs=["v"],
        out_pass=["rid"],
        length_us=window_ms * MS,
        gran_us=gran_ms * MS,
        specs=specs,
        spill_path=str(tmp_path / "spill"),
    )


def _batches(n_rows, batch_rows, n_keys=1, seed=7):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, n_rows * MS, size=n_rows))
    rows = pd.DataFrame(
        {
            KEY: (np.arange(n_rows) % n_keys).astype(np.int64),
            TS: ts.astype(np.int64),
            "v": rng.integers(-50, 100, size=n_rows).astype(np.int64),
            "rid": np.arange(n_rows, dtype=np.int64),
        }
    )
    # like Spark: the watermark for batch k is computed from batch k-1's data
    wm = -(10**12)
    for i in range(0, n_rows, batch_rows):
        chunk = rows.iloc[i : i + batch_rows]
        yield chunk, wm
        wm = int(chunk[TS].max())
    yield rows.iloc[:0], int(rows[TS].max()) + 10**12  # flush


def _brute(rows: pd.DataFrame, length_us: int) -> pd.DataFrame:
    out = []
    for _, g in rows.groupby(KEY):
        g = g.sort_values(TS)
        ts = g[TS].to_numpy()
        v = g["v"].to_numpy()
        for i in range(len(g)):
            m = (ts >= ts[i] - length_us) & (ts <= ts[i])
            w = v[m]
            out.append(
                {
                    "rid": g["rid"].iloc[i],
                    "cnt": int(m.sum()),
                    "s": int(w.sum()),
                    "a": w.sum() / m.sum(),
                    "mn": int(w.min()),
                    "mx": int(w.max()),
                }
            )
    return pd.DataFrame(out).set_index("rid").sort_index()


def _drive(core, batches):
    st = core.empty_state()
    outs = []
    sizes = []
    for chunk, wm in batches:
        out, st = core.advance(st, chunk, wm)
        # round-trip through the serialized form every batch, like Spark does
        st = core.load(core.dump(st))
        if out is not None:
            outs.append(out)
        n_head = len(st["head"][TS])
        sizes.append((n_head, len(st["tiles"])))
    res = pd.concat(outs, ignore_index=True)
    return res, sizes, st


@pytest.mark.parametrize("batch_rows", [500, 137])
def test_core_exact_vs_bruteforce(tmp_path, batch_rows):
    """Every row emitted exactly once with exact tile+edge window values,
    across batch boundaries, spills, and duplicate timestamps."""
    n = 3000
    window_ms = 400  # window 400ms, granularity 50ms → interior tiles in play
    core = _mk_core(tmp_path, window_ms, 50)
    rows = []
    batches = list(_batches(n, batch_rows))
    for chunk, _ in batches:
        rows.append(chunk)
    all_rows = pd.concat(rows, ignore_index=True)

    res, _, _ = _drive(core, batches)
    got = res.set_index("rid").sort_index()
    assert len(got) == n  # exactly-once emission
    exp = _brute(all_rows, window_ms * MS)
    for c in ("cnt", "s", "mn", "mx"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    assert np.allclose(got["a"].to_numpy(), exp["a"].to_numpy())


def test_null_scalar_inputs_skipna_everywhere(tmp_path):
    """Null/NaN scalar inputs must be skipped identically by BOTH evaluation
    paths — tile partials (pandas skipna) and the raw edge/head sweep — so
    count counts non-nulls, sums aren't NaN-poisoned, and an ALL-null closed
    bucket round-trips as the empty partial (not NaN in the state slot)."""
    core = _mk_core(tmp_path, 400, 50)
    rng = np.random.default_rng(11)
    n = 1200
    ts = np.sort(rng.integers(0, n * MS, size=n)).astype(np.int64)
    v = rng.integers(-50, 100, size=n).astype("float64")
    v[rng.random(n) < 0.2] = np.nan  # scattered nulls
    v[(ts >= 100 * MS) & (ts < 150 * MS)] = np.nan  # one all-null bucket
    rows = pd.DataFrame(
        {KEY: np.zeros(n, dtype=np.int64), TS: ts, "v": v,
         "rid": np.arange(n, dtype=np.int64)}
    )
    wm = -(10**12)
    batches = []
    for i in range(0, n, 211):
        chunk = rows.iloc[i : i + 211]
        batches.append((chunk, wm))
        wm = int(chunk[TS].max())
    batches.append((rows.iloc[:0], int(rows[TS].max()) + 10**12))

    res, _, _ = _drive(core, batches)
    got = res.set_index("rid").sort_index()
    assert len(got) == n
    # null-skipping brute force (SQL aggregate semantics)
    L = 400 * MS
    for i in rng.choice(n, size=120, replace=False):
        m = (ts >= ts[i] - L) & (ts <= ts[i])
        w = v[m]
        w = w[~np.isnan(w)]
        assert got.loc[i, "cnt"] == len(w), i
        if len(w):
            assert got.loc[i, "s"] == w.sum(), i
            assert got.loc[i, "mn"] == w.min() and got.loc[i, "mx"] == w.max(), i
        else:
            assert pd.isna(got.loc[i, "mn"]) and pd.isna(got.loc[i, "mx"]), i


def test_core_multi_key_exact(tmp_path):
    n = 2000
    core = _mk_core(tmp_path, 300, 50)
    batches = list(_batches(n, 311, n_keys=5))
    all_rows = pd.concat([c for c, _ in batches], ignore_index=True)
    res, _, _ = _drive(core, batches)
    got = res.set_index("rid").sort_index()
    assert len(got) == n
    exp = _brute(all_rows, 300 * MS)
    for c in ("cnt", "s", "mn", "mx"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_state_sublinear_in_window_length(tmp_path):
    """The whole point of tiling: at fixed granularity, a 50x longer window
    must not hold 50x the raw rows in state — head stays bounded by the open
    bucket + unemitted rows, and only the tile count scales (at L/g, which is
    itself capped by auto-granularity in the public API)."""
    n = 20_000  # ~20s of data at ~1 row/ms
    short_ms, long_ms = 200, 10_000
    peaks = {}
    tiles_peak = {}
    for wms in (short_ms, long_ms):
        core = _mk_core(tmp_path / f"w{wms}", wms, 100)
        _, sizes, _ = _drive(core, _batches(n, 1000))
        peaks[wms] = max(h for h, _ in sizes)
        tiles_peak[wms] = max(t for _, t in sizes)
    # raw rows in the long window ≈ 10k; head must stay ~batch-sized
    assert peaks[long_ms] < 2_500, peaks
    # and must NOT scale with the window (50x window ≤ ~2x head state)
    assert peaks[long_ms] <= 2 * peaks[short_ms] + 500, peaks
    # tiles scale with L/g, not rows: 10s / 100ms ≈ 100 + horizon slack
    assert tiles_peak[long_ms] <= 10_000 // 100 + 20, tiles_peak


def test_state_sublinear_month_scale(tmp_path):
    """Month-scale bound backing q_stream_tiled_window_month: a 21-day
    window over 30 days of data must hold tile partials (~window/
    granularity ≈ 256) + open head rows in state — never the ~70% of all
    raw rows a 21-day window spans — while staying exact."""
    DAY_MS = 86_400 * 1000
    window_ms = 21 * DAY_MS
    gran_ms = window_ms // 256
    core = _mk_core(tmp_path, window_ms, gran_ms)
    n = 30_000
    batch_rows = 2_000
    rng = np.random.default_rng(3)
    ts = np.sort(rng.integers(0, 30 * DAY_MS * MS, size=n)).astype(np.int64)
    v = rng.integers(-50, 100, size=n).astype(np.int64)
    rows = pd.DataFrame(
        {KEY: np.zeros(n, dtype=np.int64), TS: ts, "v": v,
         "rid": np.arange(n, dtype=np.int64)}
    )
    wm = -(10**15)
    batches = []
    for i in range(0, n, batch_rows):
        chunk = rows.iloc[i : i + batch_rows]
        batches.append((chunk, wm))
        wm = int(chunk[TS].max())
    batches.append((rows.iloc[:0], int(rows[TS].max()) + 10**15))

    res, sizes, _ = _drive(core, batches)
    got = res.set_index("rid").sort_index()
    assert len(got) == n  # exactly-once at month scale
    # head stays ~batch-sized + open bucket, not O(rows in 21 days)
    peak_head = max(h for h, _ in sizes)
    assert peak_head < 3 * batch_rows, peak_head
    # tiles scale with L/g (≈256) + horizon slack, not with rows
    peak_tiles = max(t for _, t in sizes)
    assert peak_tiles <= 300, peak_tiles
    # spot-check exactness against the brute force
    L_us = window_ms * MS
    for i in rng.choice(n, size=60, replace=False):
        m = (ts >= ts[i] - L_us) & (ts <= ts[i])
        w = v[m]
        assert got.loc[i, "cnt"] == int(m.sum()), i
        assert got.loc[i, "s"] == int(w.sum()), i
        assert got.loc[i, "mn"] == int(w.min()), i
        assert got.loc[i, "mx"] == int(w.max()), i


def _mk_ladder_core(tmp_path, window_ms, gran_ms, tag):
    specs = [
        TiledSpec("cnt", "count", "v", "bigint"),
        TiledSpec("s", "sum", "v", "bigint"),
        TiledSpec("mn", "min", "v", "bigint"),
        TiledSpec("mx", "max", "v", "bigint"),
    ]
    grans = (
        [g * MS for g in gran_ms] if isinstance(gran_ms, list) else gran_ms * MS
    )
    return _GroupCore(
        keys=[KEY],
        inputs=["v"],
        out_pass=["rid"],
        length_us=window_ms * MS,
        gran_us=grans,
        specs=specs,
        spill_path=str(tmp_path / f"spill_{tag}"),
    )


def test_multi_granularity_ladder_bit_equal_and_fewer_edge_rows(tmp_path):
    """Reference tiles.rs multi-granularity tree: a [fine, coarse] ladder
    must (a) be bit-equal to both single-granularity runs, (b) read FEWER
    raw edge rows than the coarse-only store (edges descend to the fine
    level), and (c) merge FEWER interior tiles than the fine-only store
    (interiors use the coarse level)."""
    n = 8_000
    window_ms = 4_000
    fine_ms, coarse_ms = 100, 1_000
    batches = list(_batches(n, 700, seed=13))
    all_rows = pd.concat([c for c, _ in batches], ignore_index=True)

    outs = {}
    cores = {}
    for tag, gran in (
        ("fine", fine_ms),
        ("coarse", coarse_ms),
        ("ladder", [fine_ms, coarse_ms]),
    ):
        core = _mk_ladder_core(tmp_path, window_ms, gran, tag)
        res, _, _ = _drive(core, batches)
        outs[tag] = res.set_index("rid").sort_index()
        cores[tag] = core

    # (a) all three paths bit-equal (and equal to the brute force)
    exp = _brute(all_rows, window_ms * MS)
    for tag, got in outs.items():
        assert len(got) == n, tag
        for c in ("cnt", "s", "mn", "mx"):
            assert (got[c].to_numpy() == exp[c].to_numpy()).all(), (tag, c)

    # (b) ladder edges read at FINE resolution: strictly fewer raw rows
    # than the coarse-only store pulls back
    assert cores["ladder"].edge_rows_read < cores["coarse"].edge_rows_read, (
        cores["ladder"].edge_rows_read,
        cores["coarse"].edge_rows_read,
    )
    # (c) ladder interiors use the COARSE level: strictly fewer tile merges
    # than fine-only
    assert cores["ladder"].tiles_merged < cores["fine"].tiles_merged, (
        cores["ladder"].tiles_merged,
        cores["fine"].tiles_merged,
    )


def test_ladder_validation():
    with pytest.raises(ValueError, match="ascending"):
        _mk_ladder_core(__import__("pathlib").Path("/tmp"), 1000, [100, 50], "bad1")
    with pytest.raises(ValueError, match="multiple"):
        _mk_ladder_core(__import__("pathlib").Path("/tmp"), 1000, [100, 250], "bad2")


def test_spill_gc_and_tile_prune(tmp_path):
    """Tiles a full window behind the watermark are dropped from state and
    their spill files garbage-collected (retention rule: wm - L - 2g)."""
    import os

    core = _mk_core(tmp_path, 500, 100)
    _, sizes, st = _drive(core, _batches(8000, 1000))
    # after the flush watermark, no tile can be inside any future window
    assert len(st["tiles"]) == 0
    spill = tmp_path / "spill"
    files = [f for f in os.listdir(spill)] if spill.exists() else []
    assert files == [], files


def test_stddev_matches_numpy(tmp_path):
    core = _mk_core(
        tmp_path,
        300,
        50,
        specs=[
            TiledSpec("sd", "stddev_samp", "v", "double"),
            TiledSpec("vp", "var_pop", "v", "double"),
        ],
    )
    n = 1500
    batches = list(_batches(n, 400))
    all_rows = pd.concat([c for c, _ in batches], ignore_index=True)
    res, _, _ = _drive(core, batches)
    got = res.set_index("rid").sort_index()
    ts = all_rows.sort_values(TS)[TS].to_numpy()
    v = all_rows.sort_values(TS)["v"].to_numpy()
    rid = all_rows.sort_values(TS)["rid"].to_numpy()
    exp_sd, exp_vp = {}, {}
    for i in range(n):
        m = (ts >= ts[i] - 300 * MS) & (ts <= ts[i])
        w = v[m].astype("float64")
        exp_sd[rid[i]] = np.std(w, ddof=1) if m.sum() > 1 else None
        exp_vp[rid[i]] = np.var(w)
    got_sd = got["sd"].to_numpy(dtype="float64")
    exp_sd_a = np.array([np.nan if exp_sd[r] is None else exp_sd[r] for r in got.index])
    mask = ~np.isnan(exp_sd_a)
    assert np.allclose(got_sd[mask], exp_sd_a[mask], rtol=1e-9, atol=1e-9)
    assert np.allclose(
        got["vp"].to_numpy(dtype="float64"),
        np.array([exp_vp[r] for r in got.index]),
        rtol=1e-9,
        atol=1e-9,
    )


def test_cate_specs_exact_vs_bruteforce(tmp_path):
    """sum/count/min_cate(_where) through the tiled core: interior category
    partials + raw-edge SubAcc sweep must render the same CSV the untiled
    CateAccumulator would (reference cate/accumulator.rs semantics)."""
    from volga_spark.formatting import join_csv, scalar_to_string
    from volga_spark.streaming.tiled_window import TiledCateSpec, _GroupCore

    n = 2500
    rng = np.random.default_rng(11)
    ts = np.sort(rng.integers(0, n * MS, size=n))
    rows = pd.DataFrame(
        {
            KEY: (np.arange(n) % 3).astype(np.int64),
            TS: ts.astype(np.int64),
            "v": rng.integers(-40, 90, size=n).astype(np.int64),
            "cat": rng.choice(["a", "b", "c", "d"], size=n),
            "cond": rng.random(size=n) > 0.4,
            "rid": np.arange(n, dtype=np.int64),
        }
    )
    specs = [
        TiledCateSpec("sc", "sum", "v", "cat", scale=1.0),
        TiledCateSpec("cc", "count", "v", "cat"),
        TiledCateSpec("mw", "min", "v", "cat", cond_col="cond"),
    ]
    core = _GroupCore(
        keys=[KEY],
        inputs=[],
        out_pass=["rid"],
        length_us=400 * MS,
        gran_us=50 * MS,
        specs=[],
        spill_path=str(tmp_path / "spill"),
        cate_specs=specs,
    )

    def batches():
        wm = -(10**12)
        for i in range(0, n, 400):
            chunk = rows.iloc[i : i + 400]
            yield chunk, wm
            wm = int(chunk[TS].max())
        yield rows.iloc[:0], int(rows[TS].max()) + 10**12

    res, _, _ = _drive(core, batches())
    got = res.set_index("rid").sort_index()
    assert len(got) == n

    # brute-force reference rendering
    def render(sub: pd.DataFrame, op, cond=False):
        if cond:
            sub = sub[sub["cond"]]
        parts = []
        for cat, g in sub.groupby("cat"):
            if op == "sum":
                m = float(g["v"].sum())
            elif op == "count":
                m = int(len(g))
            else:
                m = float(g["v"].min())
            parts.append(f"{scalar_to_string(cat)}:{scalar_to_string(m)}")
        parts.sort()
        return join_csv(parts)

    check = rows.sample(n=120, random_state=5)
    for _, r in check.iterrows():
        g = rows[
            (rows[KEY] == r[KEY])
            & (rows[TS] >= r[TS] - 400 * MS)
            & (rows[TS] <= r[TS])
        ]
        rid = r["rid"]
        assert got.loc[rid, "sc"] == render(g, "sum"), rid
        assert got.loc[rid, "cc"] == render(g, "count"), rid
        assert got.loc[rid, "mw"] == render(g, "min", cond=True), rid


def test_top_ratio_ordered_specs_vs_untiled_accumulators(tmp_path):
    """top / topn_frequency / top1_ratio / top_n_key_sum_cate_where /
    top_n_value_ratio_cate through the tiled core must render exactly what
    the untiled accumulators produce over the same window contents."""
    from volga_spark.functions.accumulators import (
        FrequencyAccumulator,
        GroupedAggTopK,
        RatioTopK,
        TopValueAccumulator,
    )
    from volga_spark.streaming.tiled_window import (
        TiledCateSpec,
        TiledRatioSpec,
        TiledTopSpec,
        _GroupCore,
    )

    n = 2200
    rng = np.random.default_rng(23)
    ts = np.sort(rng.integers(0, n * MS, size=n))
    rows = pd.DataFrame(
        {
            KEY: (np.arange(n) % 2).astype(np.int64),
            TS: ts.astype(np.int64),
            "v": rng.integers(-30, 70, size=n).astype(np.int64),
            "cat": rng.choice(["x", "y", "z"], size=n),
            "cond": rng.random(size=n) > 0.5,
            "rid": np.arange(n, dtype=np.int64),
        }
    )
    core = _GroupCore(
        keys=[KEY],
        inputs=[],
        out_pass=["rid"],
        length_us=350 * MS,
        gran_us=40 * MS,
        specs=[],
        spill_path=str(tmp_path / "spill"),
        cate_specs=[
            TiledCateSpec("tks", "sum", "v", "cat", cond_col="cond",
                          order="key", k=2),
        ],
        top_specs=[
            TiledTopSpec("t3", "top", "cat", k=3),
            TiledTopSpec("tf", "topn_frequency", "cat", k=2),
            TiledTopSpec("t1r", "top1_ratio", "cat", out_type="double"),
            TiledTopSpec("cd", "count_distinct", "cat", out_type="bigint"),
            TiledTopSpec("cdv", "count_distinct", "v", out_type="bigint"),
        ],
        ratio_specs=[
            TiledRatioSpec("tvr", "value", 2, "v", "cond", "cat"),
        ],
    )

    def batches():
        wm = -(10**12)
        for i in range(0, n, 350):
            chunk = rows.iloc[i : i + 350]
            yield chunk, wm
            wm = int(chunk[TS].max())
        yield rows.iloc[:0], int(rows[TS].max()) + 10**12

    res, _, _ = _drive(core, batches())
    got = res.set_index("rid").sort_index()
    assert len(got) == n

    check = rows.sample(n=100, random_state=9)
    for _, r in check.iterrows():
        g = rows[
            (rows[KEY] == r[KEY])
            & (rows[TS] >= r[TS] - 350 * MS)
            & (rows[TS] <= r[TS])
        ]
        rid = r["rid"]
        tv = TopValueAccumulator(3)
        fr = FrequencyAccumulator(2)
        ga = GroupedAggTopK("sum", "key", 2)
        rt = RatioTopK("value", 2)
        for _, w in g.iterrows():
            tv.add(w["cat"])
            fr.add(w["cat"])
            ga.add(w["v"], w["cond"], w["cat"])
            rt.add(w["v"], w["cond"], w["cat"])
        assert got.loc[rid, "t3"] == tv.result(), rid
        assert got.loc[rid, "tf"] == fr.topn(), rid
        assert got.loc[rid, "t1r"] == fr.top1_ratio(), rid
        assert got.loc[rid, "tks"] == ga.result(), rid
        assert got.loc[rid, "tvr"] == rt.result(), rid
        # count_distinct = size of the same merged multiset, exact across
        # tiles + spill edges + retraction
        assert got.loc[rid, "cd"] == g["cat"].nunique(), rid
        assert got.loc[rid, "cdv"] == g["v"].nunique(), rid


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @st.composite
    def _scenario(draw):
        n = draw(st.integers(min_value=30, max_value=250))
        n_keys = draw(st.integers(min_value=1, max_value=3))
        window_ms = draw(st.sampled_from([40, 170, 400, 1000]))
        # single granularities AND multi-granularity ladders (fine→coarse,
        # each level a multiple of the finer)
        gran_ms = draw(
            st.sampled_from(
                [25, 50, 100, (25, 100), (25, 50, 200), (50, 500)]
            )
        )
        ts = sorted(
            draw(
                st.lists(
                    st.integers(min_value=0, max_value=n * 40),
                    min_size=n,
                    max_size=n,
                )
            )
        )
        vals = draw(
            st.lists(
                st.integers(min_value=-99, max_value=99), min_size=n, max_size=n
            )
        )
        cuts = sorted(
            draw(
                st.lists(
                    st.integers(min_value=1, max_value=n - 1),
                    min_size=0,
                    max_size=5,
                    unique=True,
                )
            )
        ) if n > 1 else []
        return n, n_keys, window_ms, gran_ms, ts, vals, cuts

    @settings(max_examples=40, deadline=None)
    @given(_scenario())
    def test_property_tiled_core_matches_bruteforce(tmp_path_factory, scen):
        """Random rows, duplicate timestamps, random batch boundaries, random
        window/granularity ratios (window below, equal to, and far above the
        granularity): the tiled core must emit every row exactly once with
        exact count/sum/min values."""
        n, n_keys, window_ms, gran_ms, ts, vals, cuts = scen
        tmp = tmp_path_factory.mktemp("prop")
        rows = pd.DataFrame(
            {
                KEY: (np.arange(n) % n_keys).astype(np.int64),
                TS: np.array(ts, dtype=np.int64) * MS,
                "v": np.array(vals, dtype=np.int64),
                "rid": np.arange(n, dtype=np.int64),
            }
        )
        core = _GroupCore(
            keys=[KEY],
            inputs=["v"],
            out_pass=["rid"],
            length_us=window_ms * MS,
            gran_us=(
                [g * MS for g in gran_ms]
                if isinstance(gran_ms, tuple)
                else gran_ms * MS
            ),
            specs=[
                TiledSpec("cnt", "count", "v", "bigint"),
                TiledSpec("s", "sum", "v", "bigint"),
                TiledSpec("mn", "min", "v", "bigint"),
            ],
            spill_path=str(tmp / "spill"),
        )

        def batches():
            bounds = [0] + cuts + [n]
            wm = -(10**12)
            for i in range(len(bounds) - 1):
                chunk = rows.iloc[bounds[i] : bounds[i + 1]]
                yield chunk, wm
                if len(chunk):
                    wm = max(wm, int(chunk[TS].max()))
            yield rows.iloc[:0], int(rows[TS].max()) + 10**12

        res, _, _ = _drive(core, batches())
        got = res.set_index("rid").sort_index()

        # simulate the handler's ingest/emit contract exactly (shared with
        # the untiled handler): a row ingests iff ts > max(key cursor, batch
        # watermark); buffered rows emit once the watermark passes them, and
        # the cursor then blocks later-batch rows at or before it
        cursor: dict = {}
        buffered: list = []
        survivors: set = set()
        for chunk, wm in batches():
            for k, t, rid in zip(chunk[KEY], chunk[TS], chunk["rid"]):
                if t > max(cursor.get(k, -(10**18)), wm):
                    buffered.append((k, int(t), int(rid)))
            still = []
            for k, t, rid in buffered:
                if t <= wm and t > cursor.get(k, -(10**18)):
                    survivors.add(rid)
                else:
                    still.append((k, t, rid))
            for k, t, rid in buffered:
                if rid in survivors:
                    cursor[k] = max(cursor.get(k, -(10**18)), t)
            buffered = still
        assert set(got.index) == survivors
        surv_rows = rows[rows["rid"].isin(survivors)]
        exp = _brute(surv_rows, window_ms * MS)
        for rid in got.index:
            for c in ("cnt", "s", "mn"):
                assert got.loc[rid, c] == exp.loc[rid, c], (rid, c)


def test_quantile_spec_exact_vs_duckdb_and_bruteforce(tmp_path):
    """op='quantile' rides the same merged multiset: per-row sliding-window
    discrete quantiles must equal BOTH a rank-rule brute force and DuckDB's
    windowed quantile_disc over the same rows (pinning the ceil(q*n) rule
    to the engine the oracles use), across batches and state round-trips."""
    import duckdb
    import math as _math

    from volga_spark.streaming.tiled_window import TiledTopSpec, _GroupCore

    n = 2200
    rng = np.random.default_rng(31)
    ts = np.sort(rng.integers(0, n * MS, size=n))
    rows = pd.DataFrame(
        {
            KEY: (np.arange(n) % 2).astype(np.int64),
            TS: ts.astype(np.int64),
            "v": rng.integers(-30, 70, size=n).astype(np.int64),
            "rid": np.arange(n, dtype=np.int64),
        }
    )
    window_ms, gran_ms = 350, 40
    core = _GroupCore(
        keys=[KEY],
        inputs=[],
        out_pass=["rid"],
        length_us=window_ms * MS,
        gran_us=gran_ms * MS,
        specs=[],
        spill_path=str(tmp_path / "spill"),
        top_specs=[
            TiledTopSpec("p50", "quantile", "v", q=0.5, out_type="bigint"),
            TiledTopSpec("p95", "quantile", "v", q=0.95, out_type="bigint"),
        ],
    )
    batches = []
    wm = -(10**12)
    for i in range(0, n, 300):
        batches.append((rows.iloc[i : i + 300], wm))
        wm = int(rows.iloc[i : i + 300][TS].max())
    batches.append((rows.iloc[:0], int(rows[TS].max()) + 10**12))
    res, _, _ = _drive(core, batches)
    got = res.set_index("rid").sort_index()
    assert len(got) == n

    # brute force with the ceil(q*n) rank rule
    def brute_q(q):
        out = np.empty(n, dtype=np.int64)
        for _, g in rows.groupby(KEY):
            gts = g[TS].to_numpy()
            gv = g["v"].to_numpy()
            for i in range(len(g)):
                w = np.sort(gv[(gts >= gts[i] - window_ms * MS) & (gts <= gts[i])])
                out[g["rid"].iloc[i]] = w[_math.ceil(q * len(w)) - 1]
        return out

    for name, q in (("p50", 0.5), ("p95", 0.95)):
        exp = brute_q(q)[got.index.to_numpy()]
        assert (got[name].to_numpy() == exp).all(), name

    # and the same numbers from DuckDB's windowed quantile_disc
    con = duckdb.connect()
    con.register("rows_tbl", rows.rename(columns={KEY: "k", TS: "t"}))
    duck = con.execute(
        f"""
        SELECT rid,
               quantile_disc(v, 0.5) OVER w AS p50,
               quantile_disc(v, 0.95) OVER w AS p95
        FROM rows_tbl
        WINDOW w AS (PARTITION BY k ORDER BY t
                     RANGE BETWEEN {window_ms * MS} PRECEDING AND CURRENT ROW)
        """
    ).fetchdf().set_index("rid").sort_index()
    assert (got["p50"].to_numpy() == duck["p50"].to_numpy()).all()
    assert (got["p95"].to_numpy() == duck["p95"].to_numpy()).all()


def test_quantile_spec_validation():
    from volga_spark.streaming.tiled_window import TiledTopSpec

    with pytest.raises(ValueError):
        TiledTopSpec("bad", "quantile", "v")  # missing q
    with pytest.raises(ValueError):
        TiledTopSpec("bad", "quantile", "v", q=1.5)
    TiledTopSpec("ok", "quantile", "v", q=0.99)
