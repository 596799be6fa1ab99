"""Incremental add/retract accumulators for the cate/top UDAF families.

Python mirrors of the reference's accumulator semantics (NOT ports of its
code): CateAccumulator (reference src/runtime/operators/window/cate/
accumulator.rs — per-category sub-accumulator map, empty accumulators
removed, CSV output sorted on the full "cat:val" string),
TopValueAccumulator / FrequencyTopKAccumulator (top/accumulators/
{value,frequency}.rs — multiset with KeyDesc / MetricDesc order),
GroupedAggTopK / RatioTopK (top/accumulators/{grouped_agg,ratio}.rs).

All values arriving here were pre-scaled to exact integers (cents) by the
caller when float parity matters; metrics are surfaced as doubles with
fixed expressions so the DuckDB oracle reproduces them bit-for-bit.

The reference keeps a lazy-invalidation heap per accumulator; window sizes
in our sweep are bounded and categories are low-cardinality, so sorted()
at evaluate time is simpler and O(u log u) with tiny u. The streaming path
reuses these same classes inside the stateful handler.
"""

from __future__ import annotations

import heapq
from collections import Counter

from volga_spark.formatting import format_float, join_csv, scalar_to_string


def _absent(v) -> bool:
    """NULL check shared by every accumulator entry point: None, or float
    NaN (``v != v`` — false for every non-float and every real number).
    Engine-wide rule (r10): NaN ≡ null. The Arrow float path cannot even
    distinguish the two (a null double arrives as NaN in pandas), the
    tiled scalar families already mask NaN via notna, and NaN dict keys /
    sort keys are ill-defined — so every family treats NaN as no-value."""
    return v is None or v != v


# --- scalar sub-accumulators --------------------------------------------------

class SumAcc:
    __slots__ = ("s", "n")

    def __init__(self):
        self.s = 0
        self.n = 0

    def add(self, v):
        self.s += v
        self.n += 1

    def retract(self, v):
        self.s -= v
        self.n -= 1

    @property
    def empty(self):
        return self.n == 0


class MinMaxAcc:
    """Retractable min/max: lazy-deletion heaps over a live Counter."""

    __slots__ = ("live", "minheap", "maxheap", "n")

    def __init__(self):
        self.live = Counter()
        self.minheap: list = []
        self.maxheap: list = []
        self.n = 0

    def add(self, v):
        self.live[v] += 1
        heapq.heappush(self.minheap, v)
        heapq.heappush(self.maxheap, -v)
        self.n += 1

    def retract(self, v):
        self.live[v] -= 1
        if self.live[v] <= 0:
            del self.live[v]
        self.n -= 1

    @property
    def empty(self):
        return self.n == 0

    def min(self):
        while self.minheap and self.live.get(self.minheap[0], 0) <= 0:
            heapq.heappop(self.minheap)
        return self.minheap[0] if self.minheap else None

    def max(self):
        while self.maxheap and self.live.get(-self.maxheap[0], 0) <= 0:
            heapq.heappop(self.maxheap)
        return -self.maxheap[0] if self.maxheap else None


class SubAcc:
    """One per (category); dispatches on agg kind."""

    __slots__ = ("kind", "sum", "mm")

    def __init__(self, kind: str):
        self.kind = kind
        self.sum = SumAcc()
        self.mm = MinMaxAcc() if kind in ("min", "max") else None

    def add(self, v):
        if self.kind == "count":
            # count ignores the value's magnitude AND type — the reference
            # counts string values too (README count_cate_where(product_id…))
            self.sum.n += 1
            return
        self.sum.add(v)
        if self.mm is not None:
            self.mm.add(v)

    def retract(self, v):
        if self.kind == "count":
            self.sum.n -= 1
            return
        self.sum.retract(v)
        if self.mm is not None:
            self.mm.retract(v)

    @property
    def empty(self):
        return self.sum.empty

    def metric(self, scale: float):
        """Evaluate; ``scale`` divides integer-scaled sums back to value units
        (100.0 for cents, 1.0 for raw)."""
        k = self.kind
        if k == "count":
            return self.sum.n
        if k == "sum":
            return self.sum.s / scale
        if k == "avg":
            return self.sum.s / scale / self.sum.n
        if k == "min":
            v = self.mm.min()
        else:
            v = self.mm.max()
        return None if v is None else v / scale


# --- cate families ------------------------------------------------------------

class CateAccumulator:
    """{sum,avg,count,min,max}_cate[_where](value[, cond], category) → CSV.

    Output: "cat:val" parts sorted lexicographically on the full part string,
    joined with ","; empty map → "".
    """

    def __init__(self, kind: str, scale: float = 1.0):
        self.kind = kind
        self.scale = scale
        self.cats: dict = {}
        # per-category rendered "cat:val" part, invalidated only when that
        # category's accumulator changes — a sliding step touches one or two
        # categories, so result() re-formats O(changed), not O(categories)
        self._parts: dict = {}

    def add(self, value, cond, cat):
        if _absent(cat) or _absent(value) or _absent(cond) or not cond:
            return
        acc = self.cats.get(cat)
        if acc is None:
            acc = self.cats[cat] = SubAcc(self.kind)
        acc.add(value)
        self._parts[cat] = None

    def retract(self, value, cond, cat):
        if _absent(cat) or _absent(value) or _absent(cond) or not cond:
            return
        acc = self.cats.get(cat)
        if acc is None:
            return
        acc.retract(value)
        if acc.empty:
            del self.cats[cat]
            self._parts.pop(cat, None)
        else:
            self._parts[cat] = None

    def result(self) -> str:
        parts = []
        for cat, acc in self.cats.items():
            p = self._parts.get(cat)
            if p is None:
                cat_s = scalar_to_string(cat)
                if cat_s is None:
                    continue
                m_s = scalar_to_string(acc.metric(self.scale))
                if m_s is None:
                    continue
                p = f"{cat_s}:{m_s}"
                self._parts[cat] = p
            parts.append(p)
        parts.sort()
        return join_csv(parts)


# --- top families -------------------------------------------------------------

class TopValueAccumulator:
    """top(value, k): top-k values (desc) with multiplicity, CSV."""

    def __init__(self, k: int):
        self.k = k
        self.counts = Counter()

    def add(self, value):
        if _absent(value):
            return
        self.counts[value] += 1

    def retract(self, value):
        if _absent(value):
            return
        self.counts[value] -= 1
        if self.counts[value] <= 0:
            del self.counts[value]

    def result(self) -> str:
        if self.k <= 0:
            return ""
        parts: list[str] = []
        for value in sorted(self.counts, reverse=True):
            take = min(self.k - len(parts), self.counts[value])
            s = scalar_to_string(value) or ""
            parts.extend([s] * take)
            if len(parts) >= self.k:
                break
        return join_csv(parts)


class FrequencyAccumulator:
    """topn_frequency(value, k) → CSV of top-k values by frequency
    (count desc, value desc tiebreak); top1_ratio(value) → mode freq / total."""

    def __init__(self, k: int | None = None):
        self.k = k
        self.counts = Counter()
        self.total = 0

    def add(self, value):
        if _absent(value):
            return
        self.counts[value] += 1
        self.total += 1

    def retract(self, value):
        if _absent(value):
            return
        self.counts[value] -= 1
        if self.counts[value] <= 0:
            del self.counts[value]
        self.total -= 1

    def _ranked(self):
        # count desc, then value desc (reference MetricDesc tie → key cmp)
        return sorted(self.counts.items(), key=lambda kv: (kv[1], kv[0]), reverse=True)

    def topn(self) -> str:
        n = self.k or 0
        ranked = self._ranked()[:n]
        return join_csv([scalar_to_string(v) or "" for v, _ in ranked])

    def top1_ratio(self) -> float:
        if self.total <= 0 or not self.counts:
            return 0.0
        top_count = self._ranked()[0][1]
        return top_count / self.total


class GroupedAggTopK:
    """top_n_{key,value}_{agg}_cate_where(value, cond, category, k) → CSV
    "cat:metric" ordered by category desc (key mode) or metric desc with
    category-desc tiebreak (value mode), limited to k."""

    def __init__(self, kind: str, order: str, k: int, scale: float = 1.0):
        assert order in ("key", "value")
        self.order = order
        self.k = k
        self.kind = kind
        self.scale = scale
        self.cats: dict = {}
        self._rendered: dict = {}  # cat -> (metric, "cat:metric") cache

    def add(self, value, cond, cat):
        if _absent(cat) or _absent(value) or _absent(cond) or not cond:
            return
        acc = self.cats.get(cat)
        if acc is None:
            acc = self.cats[cat] = SubAcc(self.kind)
        acc.add(value)
        self._rendered[cat] = None

    def retract(self, value, cond, cat):
        if _absent(cat) or _absent(value) or _absent(cond) or not cond:
            return
        acc = self.cats.get(cat)
        if acc is None:
            return
        acc.retract(value)
        if acc.empty:
            del self.cats[cat]
            self._rendered.pop(cat, None)
        else:
            self._rendered[cat] = None

    def result(self) -> str:
        items = []
        for cat, acc in self.cats.items():
            r = self._rendered.get(cat)
            if r is None:
                m = acc.metric(self.scale)
                if m is None:
                    continue
                cs, ms = scalar_to_string(cat), scalar_to_string(m)
                if cs is None or ms is None:
                    continue
                r = (m, f"{cs}:{ms}")
                self._rendered[cat] = r
            items.append((cat, r[0], r[1]))
        if self.order == "key":
            items.sort(key=lambda it: it[0], reverse=True)
        else:
            items.sort(key=lambda it: (it[1], it[0]), reverse=True)
        return join_csv([p for _, _, p in items[: self.k]])


class RatioTopK:
    """top_n_{key,value}_ratio_cate(value, cond, category, k) → CSV
    "cat:ratio" where ratio = (#cond-true rows) / (#rows) per category;
    categories with zero passing rows stay (ratio 0)."""

    def __init__(self, order: str, k: int):
        assert order in ("key", "value")
        self.order = order
        self.k = k
        self.num = Counter()
        self.den = Counter()

    def add(self, value, cond, cat):
        if _absent(cat) or _absent(value):
            return
        self.den[cat] += 1
        if not _absent(cond) and cond:
            self.num[cat] += 1

    def retract(self, value, cond, cat):
        if _absent(cat) or _absent(value):
            return
        self.den[cat] -= 1
        if self.den[cat] <= 0:
            del self.den[cat]
            self.num.pop(cat, None)
            return
        if not _absent(cond) and cond:
            self.num[cat] -= 1
            if self.num[cat] <= 0:
                del self.num[cat]

    def result(self) -> str:
        items = [(cat, self.num.get(cat, 0) / d) for cat, d in self.den.items()]
        if self.order == "key":
            items.sort(key=lambda cm: cm[0], reverse=True)
        else:
            items.sort(key=lambda cm: (cm[1], cm[0]), reverse=True)
        parts = []
        for cat, r in items[: self.k]:
            cs = scalar_to_string(cat)
            if cs is None:
                continue
            parts.append(f"{cs}:{format_float(r)}")
        return join_csv(parts)
