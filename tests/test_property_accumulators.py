"""Property-based tests (hypothesis): accumulator add/retract sequences must
equal brute-force recomputation over the live multiset, and the float
formatter must match DuckDB's printf-trim exactly for arbitrary doubles."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from volga_spark.formatting import format_float
from volga_spark.functions.accumulators import (
    CateAccumulator,
    FrequencyAccumulator,
    TopValueAccumulator,
)

# integer cents values + small category alphabet, interleaved add/retract
_ops = st.lists(
    st.tuples(
        st.integers(min_value=-500, max_value=500),  # value (cents)
        st.booleans(),  # cond
        st.sampled_from(["a", "b", "c", "dd"]),
    ),
    min_size=1,
    max_size=60,
)


def _apply_with_retracts(acc, ops):
    """Add everything, then retract a deterministic half; return live rows."""
    for op in ops:
        acc.add(*op)
    live = []
    for i, op in enumerate(ops):
        if i % 2 == 0:
            acc.retract(*op)
        else:
            live.append(op)
    return live


@settings(max_examples=200, deadline=None)
@given(_ops)
def test_sum_cate_matches_bruteforce(ops):
    acc = CateAccumulator("sum", scale=100.0)
    live = _apply_with_retracts(acc, ops)
    expect = {}
    for v, cond, cat in live:
        if cond:
            expect[cat] = expect.get(cat, 0) + v
    parts = sorted(f"{c}:{format_float(s / 100.0)}" for c, s in expect.items())
    assert acc.result() == ",".join(parts)


@settings(max_examples=200, deadline=None)
@given(_ops)
def test_minmax_cate_matches_bruteforce(ops):
    for kind, pick in (("min", min), ("max", max)):
        acc = CateAccumulator(kind)
        live = _apply_with_retracts(acc, ops)
        groups: dict = {}
        for v, cond, cat in live:
            if cond:
                groups.setdefault(cat, []).append(v)
        parts = sorted(
            f"{c}:{format_float(float(pick(vs)))}" for c, vs in groups.items()
        )
        assert acc.result() == ",".join(parts), kind


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-20, max_value=20), min_size=1, max_size=60), st.integers(1, 5))
def test_top_value_matches_bruteforce(values, k):
    acc = TopValueAccumulator(k)
    for v in values:
        acc.add(float(v))
    live = []
    for i, v in enumerate(values):
        if i % 3 == 0:
            acc.retract(float(v))
        else:
            live.append(float(v))
    expect = sorted(live, reverse=True)[:k]
    assert acc.result() == ",".join(format_float(v) for v in expect)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=8), min_size=1, max_size=60))
def test_top1_ratio_matches_bruteforce(values):
    acc = FrequencyAccumulator()
    for v in values:
        acc.add(float(v))
    from collections import Counter

    c = Counter(float(v) for v in values)
    assert acc.top1_ratio() == max(c.values()) / len(values)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@settings(max_examples=300, deadline=None)
@given(
    st.floats(
        min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
    )
)
def test_format_float_matches_duckdb_printf(duck, x):
    got = format_float(x)
    want = duck.execute(
        "SELECT CASE WHEN rtrim(rtrim(printf('%.6f', ?::DOUBLE), '0'), '.') = '' "
        "THEN '0' ELSE rtrim(rtrim(printf('%.6f', ?::DOUBLE), '0'), '.') END",
        [x, x],
    ).fetchone()[0]
    assert got == want, x
