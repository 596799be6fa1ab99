"""Sliding-window operator (batch path) — SURVEY §2.8.

Reproduces the reference WindowOperator's SQL semantics (reference
src/runtime/operators/window/window_operator.rs, frame extraction
src/storage/index/bucket_index.rs:466-499):

  ``OVER (PARTITION BY k ORDER BY ts RANGE BETWEEN INTERVAL 'N' ...
  PRECEDING AND CURRENT ROW)``  and  ``ROWS BETWEEN N PRECEDING AND
  CURRENT ROW`` — one output row per input row, only
  Preceding..CurrentRow frames.

Spark-first mapping: a plain ``pyspark.sql.Window`` spec. RANGE frames need
a numeric ORDER BY, so we order by ``unix_micros(ts)`` — microsecond
precision preserved (the reference's ms-epoch timestamps are a subset).
Catalyst plans this as a single shuffle on the partition keys followed by an
in-partition sort — the same hash-partitioning the reference's KeyBy does
(reference src/runtime/partition.rs:86-93), but with whole-stage codegen.

Scale: the shuffle is keyed on ``partition_by``; skew in a hot key is the
main risk at 100 TB — mitigate by salting the key and re-merging, or route
long windows to the streaming/stateful path (volga_spark.streaming) whose
tiled state never rescans the window interior.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import Window as W
from pyspark.sql import WindowSpec
from pyspark.sql import functions as F

_UNIT_MICROS = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def interval_to_micros(spec: str) -> int:
    """Parse '1 hour', '10 minutes', '1000 milliseconds' → microseconds."""
    # IGNORECASE: without it the optional plural 's' only matched
    # lowercase, so "7 DAYS" fell through to unit 'days' and raised
    m = re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]+?)s?\s*", spec, re.IGNORECASE)
    if not m:
        raise ValueError(f"cannot parse interval: {spec!r}")
    qty, unit = int(m.group(1)), m.group(2).lower()
    if unit not in _UNIT_MICROS:
        raise ValueError(f"unknown interval unit: {unit!r}")
    return qty * _UNIT_MICROS[unit]


@dataclass(frozen=True)
class RangeFrame:
    """RANGE BETWEEN INTERVAL <length> PRECEDING AND CURRENT ROW."""

    length: str  # e.g. "1 hour"

    @property
    def micros(self) -> int:
        return interval_to_micros(self.length)


@dataclass(frozen=True)
class RowsFrame:
    """ROWS BETWEEN <preceding> PRECEDING AND CURRENT ROW."""

    preceding: int


Frame = RangeFrame | RowsFrame


def range_frame(length: str) -> RangeFrame:
    return RangeFrame(length)


def rows_frame(preceding: int) -> RowsFrame:
    return RowsFrame(preceding)


def event_window(
    partition_by: list[str] | str,
    order_by: str,
    frame: Frame,
    tiebreak: list[str] | str | None = None,
) -> WindowSpec:
    """Build the Spark WindowSpec for a Volga-style sliding window.

    ``order_by`` is the event-time timestamp column. For ROWS frames a
    deterministic ``tiebreak`` column list replicates the reference's
    ``(ts, __seq_no)`` cursor total order (reference
    src/runtime/operators/window/mod.rs:23).
    """
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    if isinstance(frame, RangeFrame):
        w = W.partitionBy(*keys).orderBy(F.unix_micros(F.col(order_by)))
        return w.rangeBetween(-frame.micros, 0)
    ties = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    w = W.partitionBy(*keys).orderBy(F.col(order_by), *[F.col(t) for t in ties])
    return w.rowsBetween(-frame.preceding, 0)


# --- exact-parity aggregate helpers over windows ------------------------------
# Money/value doubles hold 2-decimal values; accumulate integer cents so the
# sum is exact, then derive doubles with fixed expressions (see workloads
# float-parity rule).

def cents(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def sum_cents_over(col: str | Column, w: WindowSpec) -> Column:
    """Exact windowed SUM surfaced as double."""
    return F.sum(cents(col)).over(w) / F.lit(100.0)


def avg_cents_over(col: str | Column, w: WindowSpec) -> Column:
    """Exact windowed AVG: (cents_sum / 100) / count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(cents(col)).over(w) / F.lit(100.0) / F.count(c).over(w)


def var_samp_cents_over(col: str | Column, w: WindowSpec) -> Column:
    """VAR_SAMP from exact integer sums: (s2/1e4 - (s1/1e2)^2/n) / (n-1).

    Both engines evaluate this identical expression over identical integers,
    so the resulting double is bit-identical (unlike engine-native stddev,
    whose accumulation order differs).
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).over(w)
    s1 = F.sum(cents(col)).over(w)
    s2 = F.sum(cents(col) * cents(col)).over(w)
    return F.when(
        n > 1,
        (s2 / F.lit(10000.0) - (s1 / F.lit(100.0)) * (s1 / F.lit(100.0)) / n)
        / (n - F.lit(1)),
    )


def stddev_samp_cents_over(col: str | Column, w: WindowSpec) -> Column:
    return F.sqrt(var_samp_cents_over(col, w))


def count_distinct_over(col: str | Column, w: WindowSpec) -> Column:
    """Exact windowed COUNT(DISTINCT col) — beyond the reference's aggregate
    set (its streaming twin is ``TiledTopSpec(op="count_distinct")``).

    Spark rejects ``countDistinct().over``; ``size(collect_set())`` is the
    supported exact form (nulls excluded by collect_set, matching COUNT
    DISTINCT semantics). State per frame is the distinct set — the same
    O(distinct-in-window) bound as the streaming multiset. DuckDB oracles it
    directly as ``count(DISTINCT col) OVER w``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.collect_set(c).over(w)).cast("bigint")


def quantile_disc_over(col: str | Column, q: float, w: WindowSpec) -> Column:
    """Exact windowed discrete quantile — the batch twin of
    ``TiledTopSpec(op="quantile")`` (rank = ceil(q·n), percentile_disc /
    DuckDB ``quantile_disc`` semantics; the result is an actual data value,
    so no float-parity scaling is needed).

    Spark's native ``percentile`` window aggregate INTERPOLATES (a
    different rule), so the supported exact form is
    ``element_at(sort_array(collect_list(col)), ceil(q·n))`` — nulls
    excluded by collect_list, matching the aggregate's null semantics.
    State per frame is the value list, the same O(rows-in-window) bound the
    sort-based frame evaluation already pays; the streaming twin holds the
    multiset instead (O(distinct))."""
    if not (0.0 < q <= 1.0):
        raise ValueError("q must be in (0, 1]")
    c = F.col(col) if isinstance(col, str) else col
    arr = F.sort_array(F.collect_list(c).over(w))
    n = F.size(arr)
    rank = F.ceil(F.lit(float(q)) * n).cast("int")
    return F.when(n > 0, F.element_at(arr, rank))
