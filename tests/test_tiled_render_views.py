"""r10 regression net for the tiled sweep's incremental render views.

The cate/top/ratio renders keep bisect-maintained sorted views synced
from dirty sets instead of re-sorting per emission
(`streaming/tiled_window.py::_render_*`). These tests drive long random
add/retract sequences through the exact calling protocol the sweep uses
and compare EVERY intermediate render against an independent
from-scratch recomputation (the pre-r10 formulas, reimplemented here) —
so any drift in the view maintenance (stale entry, missed removal,
tie-order change) fails on the first divergent emission."""

from __future__ import annotations

import math
import random
from collections import Counter

from volga_spark.formatting import format_float, join_csv, scalar_to_string
from volga_spark.functions.accumulators import SubAcc
from volga_spark.streaming.tiled_window import TiledRatioSpec, TiledTopSpec, _GroupCore


def _scratch_top(spec, merged, total):
    """The pre-r10 from-scratch _render_top."""
    if spec.op == "count_distinct":
        return len(merged)
    if spec.op == "quantile":
        if not merged:
            return None
        rank = math.ceil(spec.q * total)
        cum = 0
        for v in sorted(merged):
            cum += merged[v]
            if cum >= rank:
                return v
        return v
    if spec.op == "top":
        if spec.k <= 0:
            return ""
        parts = []
        for v in sorted(merged, reverse=True):
            take = min(spec.k - len(parts), merged[v])
            parts.extend([scalar_to_string(v) or ""] * take)
            if len(parts) >= spec.k:
                break
        return join_csv(parts)
    if spec.op == "top1_ratio":
        if total <= 0 or not merged:
            return 0.0
        return max(merged.values()) / total
    ranked = sorted(
        merged.items(), key=lambda kv: (kv[1], kv[0]), reverse=True
    )[: spec.k or 0]
    return join_csv([scalar_to_string(v) or "" for v, _ in ranked])


def test_top_render_views_match_scratch_under_random_ops():
    rng = random.Random(7)
    specs = [
        TiledTopSpec("t", "top", "c", k=3),
        TiledTopSpec("f", "topn_frequency", "c", k=2),
        TiledTopSpec("r1", "top1_ratio", "c", out_type="double"),
        TiledTopSpec("cd", "count_distinct", "c", out_type="bigint"),
        TiledTopSpec("q", "quantile", "c", q=0.5, out_type="bigint"),
    ]
    for spec in specs:
        merged: Counter = Counter()
        total = 0
        view: dict = {}
        vals: list = []
        cv: list = []
        dirty: set = set()
        live: list = []  # multiset of currently-added values for retracts
        for step in range(800):
            if live and rng.random() < 0.45:
                v = live.pop(rng.randrange(len(live)))
                merged[v] -= 1
                total -= 1
                dirty.add(v)
                if merged[v] == 0:
                    del merged[v]
            else:
                v = rng.randrange(12)
                live.append(v)
                merged[v] += 1
                total += 1
                dirty.add(v)
            if rng.random() < 0.6:  # render at varying cadences
                got = _GroupCore._render_top(
                    spec, merged, total, view, vals, cv, dirty
                )
                dirty.clear()
                want = _scratch_top(spec, merged, total)
                assert got == want, (spec.op, step, got, want)


def test_ratio_render_views_match_scratch_under_random_ops():
    rng = random.Random(11)
    for order in ("key", "value"):
        spec = TiledRatioSpec("rr", order, 2, "v", "cond", "c")
        merged: dict = {}
        view: dict = {}
        sview: list = []
        dirty: set = set()
        live: list = []
        for step in range(800):
            if live and rng.random() < 0.45:
                cat, cond = live.pop(rng.randrange(len(live)))
                cur = merged[cat]
                cur[0] -= 1
                if cond:
                    cur[1] -= 1
                dirty.add(cat)
            else:
                cat, cond = rng.randrange(8), rng.random() < 0.4
                live.append((cat, cond))
                cur = merged.setdefault(cat, [0, 0])
                cur[0] += 1
                if cond:
                    cur[1] += 1
                dirty.add(cat)
            if rng.random() < 0.6:
                got = _GroupCore._render_ratio(spec, merged, view, sview, dirty)
                dirty.clear()
                # pre-r10 from-scratch formula
                items = [
                    (c, n / d) for c, (d, n) in merged.items() if d > 0
                ]
                if order == "key":
                    items.sort(key=lambda cm: cm[0], reverse=True)
                else:
                    items.sort(key=lambda cm: (cm[1], cm[0]), reverse=True)
                want = join_csv(
                    [
                        f"{scalar_to_string(c)}:{format_float(r)}"
                        for c, r in items[: spec.k]
                    ]
                )
                assert got == want, (order, step, got, want)


class _CateSpecStub:
    def __init__(self, op, order=None, k=None, scale=1.0):
        self.op = op
        self.order = order
        self.k = k
        self.scale = scale


def test_cate_render_views_match_scratch_under_random_ops():
    rng = random.Random(13)
    cases = [
        _CateSpecStub("sum", scale=100.0),
        _CateSpecStub("count"),
        _CateSpecStub("min"),
        _CateSpecStub("sum", order="key", k=2, scale=100.0),
        _CateSpecStub("sum", order="value", k=2, scale=100.0),
    ]
    for spec in cases:
        # random static tile partials for half the categories
        static = {}
        for cat in range(0, 8, 2):
            n = rng.randrange(1, 5)
            s = sum(rng.randrange(1, 500) for _ in range(n))
            mn = rng.randrange(1, 100)
            static[cat] = (n, s, mn, mn + rng.randrange(100))
        dyn: dict = {}
        parts: dict = {}
        sview: list = []
        dirty = set(static)
        live: list = []

        def scratch():
            out = {}
            for cat in set(static) | set(dyn):
                sn, ss, smn, smx = static.get(cat, (0, 0, None, None))
                acc = dyn.get(cat)
                dn = acc.sum.n if acc is not None else 0
                ds = acc.sum.s if acc is not None else 0
                N = sn + dn
                if N == 0:
                    continue
                if spec.op == "count":
                    m = N
                elif spec.op == "sum":
                    m = (ss + ds) / spec.scale
                else:  # min
                    dmm = (
                        acc.mm.min()
                        if acc is not None and acc.mm is not None
                        else None
                    )
                    cands = [v for v in (smn, dmm) if v is not None]
                    if not cands:
                        continue
                    m = min(cands) / spec.scale
                out[cat] = (m, f"{scalar_to_string(cat)}:{scalar_to_string(m)}")
            if spec.order is None:
                return join_csv(sorted(p for _, p in out.values()))
            items = [(c, m, p) for c, (m, p) in out.items()]
            if spec.order == "key":
                items.sort(key=lambda it: it[0], reverse=True)
            else:
                items.sort(key=lambda it: (it[1], it[0]), reverse=True)
            return join_csv([p for _, _, p in items[: spec.k]])

        for step in range(600):
            if live and rng.random() < 0.45:
                cat, v = live.pop(rng.randrange(len(live)))
                acc = dyn[cat]
                acc.retract(v)
                if acc.empty:
                    del dyn[cat]
                dirty.add(cat)
            else:
                cat, v = rng.randrange(8), rng.randrange(1, 500)
                live.append((cat, v))
                acc = dyn.get(cat)
                if acc is None:
                    acc = dyn[cat] = SubAcc(spec.op)
                acc.add(v)
                dirty.add(cat)
            if rng.random() < 0.6:
                got = _GroupCore._render_cate(
                    spec, static, dyn, parts, sview, dirty
                )
                dirty.clear()
                want = scratch()
                assert got == want, (spec.op, spec.order, step, got, want)


def test_nan_static_partial_cannot_corrupt_views():
    """r10 review repro: a NaN metric used to enter the sorted view and
    break bisect invariants (all NaN comparisons are False), deleting the
    WRONG category's entry on its next change. NaN now renders as
    no-value and the other categories survive every subsequent change."""
    spec = _CateSpecStub("sum", scale=1.0)
    static = {
        "a": (1, 10, None, None),
        "b": (1, 5, None, None),
        "c": (1, float("nan"), None, None),
    }
    dyn: dict = {}
    parts: dict = {}
    sview: list = []
    dirty = set(static)
    out = _GroupCore._render_cate(spec, static, dyn, parts, sview, dirty)
    assert out == "a:10,b:5"
    dirty = {"c"}  # touch the NaN category again — pre-fix this deleted 'a'
    acc = dyn["c"] = SubAcc("sum")
    acc.add(1)
    out = _GroupCore._render_cate(spec, static, dyn, parts, sview, dirty)
    assert out == "a:10,b:5"  # nan + 1 is still NaN -> still no-value
    dirty = {"b"}
    dyn["b"] = SubAcc("sum")
    dyn["b"].add(2)
    out = _GroupCore._render_cate(spec, static, dyn, parts, sview, dirty)
    assert out == "a:10,b:7"


def test_cover_segments_guards():
    """r10 review: the native cover must refuse what cover_buckets
    refused — a non-divisible ladder at plan time, a misaligned interval
    at run time — instead of silently serving a wrong cover."""
    import pytest
    from pyspark.sql import functions as F

    from volga_spark.operators.tiles import add_cover_segments
    from volga_spark.session import get_spark

    spark = get_spark("test_cover_guards")
    df = spark.createDataFrame([(60, 180)], "lo long, hi long")
    with pytest.raises(ValueError, match="not a multiple"):
        add_cover_segments(df, F.col("lo"), F.col("hi"), [60, 90])
    with pytest.raises(ValueError, match="ascending"):
        add_cover_segments(df, F.col("lo"), F.col("hi"), [60, 30])
    bad = spark.createDataFrame([(61, 180)], "lo long, hi long")
    with pytest.raises(Exception, match="finest-level aligned"):
        add_cover_segments(bad, F.col("lo"), F.col("hi"), [60, 120]).collect()


def test_nan_is_null_engine_wide():
    """r10 high-review: the tiled sweep drops NaN at its steps; the
    UNTILED accumulators must agree (NaN ≡ null everywhere — the Arrow
    float path cannot even distinguish them), or the two window paths
    diverge on NaN-bearing float columns."""
    from volga_spark.functions.accumulators import (
        CateAccumulator,
        FrequencyAccumulator,
        RatioTopK,
        TopValueAccumulator,
    )

    nan = float("nan")
    top = TopValueAccumulator(3)
    top.add(nan)
    top.add(1.0)
    assert top.result() == "1"
    freq = FrequencyAccumulator(2)
    freq.add(nan)
    freq.add(2.0)
    assert freq.total == 1
    cate = CateAccumulator("sum", 1.0)
    cate.add(nan, True, "a")
    cate.add(3.0, True, "a")
    assert cate.result() == "a:3"
    cate.add(5.0, True, nan)  # NaN CATEGORY is equally absent
    assert cate.result() == "a:3"
    ratio = RatioTopK("key", 3)
    ratio.add(nan, True, "a")
    ratio.add(1.0, False, "a")
    assert ratio.result() == "a:0"


def test_nan_cond_is_cond_false_engine_wide():
    """r11 (advisor): an ABSENT cond (None or float NaN riding a float
    column through Arrow) is truthy in Python — `not nan` is False — so
    without masking, a null cond would count as cond-SATISFIED, the
    opposite of SQL WHERE-null. Absent cond must mean: skip for the cate/
    top_where families, count denominator-only for ratio. Tiled and
    untiled paths must both obey (tiled pinned via the property sweep in
    this file reusing these accumulators as its reference model)."""
    from volga_spark.functions.accumulators import (
        CateAccumulator,
        GroupedAggTopK,
        RatioTopK,
    )

    nan = float("nan")
    for bad in (nan, None):
        cate = CateAccumulator("sum", 1.0)
        cate.add(3.0, bad, "a")
        assert cate.result() == "", bad
        cate.add(2.0, True, "a")
        cate.add(4.0, bad, "a")  # absent cond skipped, not summed
        assert cate.result() == "a:2", bad
        cate.retract(4.0, bad, "a")  # symmetric on retract
        assert cate.result() == "a:2", bad

        top = GroupedAggTopK("sum", "key", 3, 1.0)
        top.add(5.0, bad, "x")
        assert top.result() == "", bad
        top.add(1.0, 1.0, "x")
        top.retract(1.0, bad, "x")
        assert top.result() == "x:1", bad

        ratio = RatioTopK("key", 3)
        ratio.add(1.0, bad, "a")  # denominator-only
        assert ratio.result() == "a:0", bad
        ratio.add(1.0, True, "a")
        assert ratio.result() == "a:0.5", bad
        ratio.retract(1.0, bad, "a")
        assert ratio.result() == "a:1", bad
