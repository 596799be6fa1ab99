"""Golden tests mirroring the reference's cate/top accumulator suites
(reference src/runtime/operators/window/cate/tests/{basic,ratio,top_n_key}.rs
and top/tests/{top_value,topn_frequency,top1_ratio}.rs — same inputs, same
expected CSV strings)."""

from __future__ import annotations

from volga_spark.formatting import format_float
from volga_spark.functions.accumulators import (
    CateAccumulator,
    FrequencyAccumulator,
    GroupedAggTopK,
    RatioTopK,
    TopValueAccumulator,
)


def feed(acc, rows):
    for r in rows:
        acc.add(*r)


def test_format_float():
    assert format_float(4.0) == "4"
    assert format_float(3.5) == "3.5"
    assert format_float(0.0) == "0"
    assert format_float(1 / 3) == "0.333333"
    assert format_float(-2.500000) == "-2.5"


def test_sum_cate_where_outputs_string():
    # cate/tests/basic.rs: values (1,"a"),(3,"b"),(4,"a"), cond value>2 -> "a:4,b:3"
    acc = CateAccumulator("sum")
    feed(acc, [(1.0, 1.0 > 2, "a"), (3.0, 3.0 > 2, "b"), (4.0, 4.0 > 2, "a")])
    assert acc.result() == "a:4,b:3"


def test_sum_cate_retracts():
    acc = CateAccumulator("sum")
    rows = [(1.0, False, "a"), (3.0, True, "b"), (4.0, True, "a")]
    feed(acc, rows)
    acc.retract(*rows[1])
    assert acc.result() == "a:4"
    acc.retract(*rows[2])
    assert acc.result() == ""


def test_top_n_key_cate_where_by_agg():
    # cate/tests/top_n_key.rs: a:1 b:3 b:5 c:2 c:4, cond>0, k=2, key-desc order
    rows = [(1.0, True, "a"), (3.0, True, "b"), (5.0, True, "b"),
            (2.0, True, "c"), (4.0, True, "c")]
    expected = {"sum": "c:6,b:8", "count": "c:2,b:2", "avg": "c:3,b:4",
                "min": "c:2,b:3", "max": "c:4,b:5"}
    for kind, want in expected.items():
        acc = GroupedAggTopK(kind, "key", 2)
        feed(acc, rows)
        assert acc.result() == want, kind


def test_top_n_key_ratio_cate():
    # cate/tests/ratio.rs: a:1 b:2 b:3 c:1, cond value>1, k=2 -> "c:0,b:1"
    rows = [(1.0, False, "a"), (2.0, True, "b"), (3.0, True, "b"), (1.0, False, "c")]
    acc = RatioTopK("key", 2)
    feed(acc, rows)
    assert acc.result() == "c:0,b:1"


def test_top_n_value_ratio_cate():
    rows = [(1.0, False, "a"), (2.0, True, "b"), (3.0, True, "b"), (1.0, False, "c")]
    acc = RatioTopK("value", 2)
    feed(acc, rows)
    assert acc.result() == "b:1,c:0"


def test_top_n_value_ratio_all_match():
    acc = RatioTopK("value", 1)
    feed(acc, [(1.0, True, "a"), (2.0, True, "a"), (3.0, True, "a")])
    assert acc.result() == "a:1"


def test_top_value():
    # top/tests/top_value.rs: [1,2,4,4,3] k=3 -> "4,4,3"
    acc = TopValueAccumulator(3)
    for v in [1.0, 2.0, 4.0, 4.0, 3.0]:
        acc.add(v)
    assert acc.result() == "4,4,3"
    # [2,1,3,3,2] k=4 -> "3,3,2,2"
    acc = TopValueAccumulator(4)
    for v in [2.0, 1.0, 3.0, 3.0, 2.0]:
        acc.add(v)
    assert acc.result() == "3,3,2,2"


def test_top_value_retract():
    acc = TopValueAccumulator(2)
    for v in [5.0, 5.0, 1.0]:
        acc.add(v)
    assert acc.result() == "5,5"
    acc.retract(5.0)
    assert acc.result() == "5,1"


def test_topn_frequency():
    # top/tests/topn_frequency.rs: [1,1,2,2,2,3] k=2 -> "2,1"
    acc = FrequencyAccumulator(2)
    for v in [1.0, 1.0, 2.0, 2.0, 2.0, 3.0]:
        acc.add(v)
    assert acc.topn() == "2,1"
    # ties [1,2,3,1,2,3] k=3 -> "3,2,1" (count tie -> value desc)
    acc = FrequencyAccumulator(3)
    for v in [1.0, 2.0, 3.0, 1.0, 2.0, 3.0]:
        acc.add(v)
    assert acc.topn() == "3,2,1"


def test_top1_ratio():
    # top/tests/top1_ratio.rs: [1,1,2,2,2,3] -> 0.5
    acc = FrequencyAccumulator()
    for v in [1.0, 1.0, 2.0, 2.0, 2.0, 3.0]:
        acc.add(v)
    assert acc.top1_ratio() == 0.5
    acc2 = FrequencyAccumulator()
    for v in [7.0, 7.0]:
        acc2.add(v)
    assert acc2.top1_ratio() == 1.0
    assert FrequencyAccumulator().top1_ratio() == 0.0


def test_min_max_cate_retract():
    acc = CateAccumulator("max")
    rows = [(5.0, True, "a"), (3.0, True, "a"), (9.0, True, "b")]
    feed(acc, rows)
    assert acc.result() == "a:5,b:9"
    acc.retract(5.0, True, "a")
    assert acc.result() == "a:3,b:9"
