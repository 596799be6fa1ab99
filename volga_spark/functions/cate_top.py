"""Spec builders for the cate/top UDAF families (SURVEY §2.9).

Each helper returns a ``SlidingSpec`` for ``apply_sliding_aggs``. Argument
conventions follow the reference UDAF signatures:
  {sum,avg,count,min,max}_cate(value, category)
  {sum,avg,count,min,max}_cate_where(value, cond, category)
  top(value, k) / topn_frequency(value, k) / top1_ratio(value)
  top_n_{key,value}_{agg}_cate_where(value, cond, category, k)
  top_n_{key,value}_ratio_cate(value, cond, category, k)
(reference src/runtime/operators/window/cate/udf.rs:287-417,
top/udf.rs:131-141).

``value`` / ``cond`` / ``category`` are column names of the prepared frame
(evaluate condition expressions JVM-side into a boolean column first).
``scale``: pass 100.0 when the value column was pre-scaled to integer cents
for float-parity; metric output is divided back by it.
"""

from __future__ import annotations

import math

from volga_spark.functions.accumulators import (
    CateAccumulator,
    FrequencyAccumulator,
    GroupedAggTopK,
    RatioTopK,
    TopValueAccumulator,
)
from volga_spark.functions.sliding import SlidingSpec


class _NoCond:
    """Adapts a (value, cond, cat) accumulator to (value, cat) inputs."""

    __slots__ = ("inner",)

    def __init__(self, inner):
        self.inner = inner

    def add(self, value, cat):
        self.inner.add(value, True, cat)

    def retract(self, value, cat):
        self.inner.retract(value, True, cat)

    def result(self):
        return self.inner.result()


def _cate(kind, name, value, category, cond=None, scale=1.0) -> SlidingSpec:
    if cond is None:
        return SlidingSpec(
            name=name,
            factory=lambda: _NoCond(CateAccumulator(kind, scale)),
            inputs=[value, category],
        )
    return SlidingSpec(
        name=name,
        factory=lambda: CateAccumulator(kind, scale),
        inputs=[value, cond, category],
    )


def sum_cate(name, value, category, cond=None, scale=1.0):
    return _cate("sum", name, value, category, cond, scale)


def avg_cate(name, value, category, cond=None, scale=1.0):
    return _cate("avg", name, value, category, cond, scale)


def count_cate(name, value, category, cond=None, scale=1.0):
    return _cate("count", name, value, category, cond, scale)


def min_cate(name, value, category, cond=None, scale=1.0):
    return _cate("min", name, value, category, cond, scale)


def max_cate(name, value, category, cond=None, scale=1.0):
    return _cate("max", name, value, category, cond, scale)


def top(name, value, k: int) -> SlidingSpec:
    return SlidingSpec(name=name, factory=lambda: TopValueAccumulator(k), inputs=[value])


def topn_frequency(name, value, k: int) -> SlidingSpec:
    return SlidingSpec(
        name=name,
        factory=lambda: FrequencyAccumulator(k),
        inputs=[value],
        finish=lambda acc: acc.topn(),
    )


def top1_ratio(name, value) -> SlidingSpec:
    return SlidingSpec(
        name=name,
        factory=lambda: FrequencyAccumulator(),
        inputs=[value],
        out_type="double",
        finish=lambda acc: acc.top1_ratio(),
    )


def count_distinct(name, value) -> SlidingSpec:
    """Exact windowed COUNT(DISTINCT value): the size of the retractable
    value→count multiset FrequencyAccumulator already maintains (streaming
    twin: ``TiledTopSpec(op="count_distinct")``; native batch twin:
    ``operators.window.count_distinct_over``)."""
    return SlidingSpec(
        name=name,
        factory=lambda: FrequencyAccumulator(),
        inputs=[value],
        out_type="bigint",
        finish=lambda acc: len(acc.counts),
    )


def quantile_disc(name, value, q, out_type="double") -> SlidingSpec:
    """Exact windowed discrete quantile off the retractable value->count
    multiset (rank = ceil(q*n), percentile_disc semantics — the streaming
    twin is ``TiledTopSpec(op="quantile")``, the native batch twin
    ``operators.window.quantile_disc_over``). Returned as float for a
    stable sweep-output dtype (exact for integer-valued inputs <= 2^53)."""
    if not (0.0 < q <= 1.0):
        raise ValueError("q must be in (0, 1]")

    def _finish(acc):
        m = sum(acc.counts.values())
        if m == 0:
            return None
        rank = math.ceil(q * m)
        cum = 0
        for v in sorted(acc.counts):
            cum += acc.counts[v]
            if cum >= rank:
                return float(v)
        return float(v)

    return SlidingSpec(
        name=name,
        factory=lambda: FrequencyAccumulator(),
        inputs=[value],
        out_type=out_type,
        finish=_finish,
    )


def top_n_cate_where(name, agg, order, value, cond, category, k, scale=1.0) -> SlidingSpec:
    """top_n_{key|value}_{agg}_cate_where."""
    return SlidingSpec(
        name=name,
        factory=lambda: GroupedAggTopK(agg, order, k, scale),
        inputs=[value, cond, category],
    )


def top_n_ratio_cate(name, order, value, cond, category, k) -> SlidingSpec:
    """top_n_{key|value}_ratio_cate."""
    return SlidingSpec(
        name=name,
        factory=lambda: RatioTopK(order, k),
        inputs=[value, cond, category],
    )
