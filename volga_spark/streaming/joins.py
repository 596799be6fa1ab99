"""Stream-stream watermarked interval joins (SURVEY §2.7 / §2.12).

The reference declares a join operator but stubs its implementation
(reference src/runtime/functions/join/join_function.rs:14-18 — the
JoinFunction trait exists, no executable path behind it). Structured
Streaming provides the full stream-stream join semantics natively: both
sides are buffered in the state store, matches emit as rows arrive, and
the combination of per-side watermarks + a time-interval join condition
lets Spark PROVE when a buffered row can no longer match and evict it —
bounded state, which is what makes the operator viable at 100 TB/day
stream volumes.

``stream_interval_join`` packages the pattern:

- equality keys (the shuffle/co-partitioning keys — both sides hash
  exchange on them, exactly like the reference's KeyBy before a join),
- an event-time interval constraint
  ``left_ts + lower <= right_ts <= left_ts + upper``
  (attribution-style: "right events within X of a left event"),
- watermarks on BOTH sides (required by Spark for state eviction; for
  outer joins also required for null-emission),
- right-side columns renamed with a prefix so the self-join-over-one-
  table case (e.g. view→click attribution over the same events stream)
  has an unambiguous output schema.

State bound: each side keeps rows until
``watermark > row_ts + max(|lower|, |upper|) + delay`` — i.e. O(input
rate × (interval + watermark delay)), independent of total stream
length. Scale knobs are the watermark delays, NOT the corpus size.

Outer-join caveat (inherited from Spark): unmatched rows emit only once
the watermark passes their eviction point, so a finite replay must
advance the watermark past the last real row — ``chunked_file_stream``'s
``flush=True`` punctuation rows (streaming/sources.py) do exactly that;
filter ``SENTINEL_ID`` rows from both sides of the OUTPUT (a sentinel
left row would otherwise surface as an unmatched outer row, and the two
sides' sentinels — same key, same far-future ts — would match each
other).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_VALID_HOW = {"inner", "left_outer", "right_outer", "full_outer", "left_semi"}


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_ms: int = 0,
    upper_ms: int = 30 * 60 * 1000,
    left_delay: str = "2 hours",
    right_delay: str = "2 hours",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join two streaming DataFrames on equality ``keys`` plus the event-time
    interval ``left_ts + lower_ms <= right_prefix+right_ts <= left_ts +
    upper_ms`` (bounds in milliseconds, inclusive; ``lower_ms`` may be
    negative for "right before left" windows).

    Right columns come back prefixed (``right_prefix``); the join keys keep
    both copies so ``how='right_outer'`` rows retain their key values.
    Watermark delays should exceed the cross-stream disorder you expect —
    for replayed time-ordered chunks, anything > ``upper_ms - lower_ms`` is
    safe.
    """
    if how not in _VALID_HOW:
        raise ValueError(f"how={how!r} not in {sorted(_VALID_HOW)}")
    if lower_ms > upper_ms:
        raise ValueError(f"lower_ms={lower_ms} > upper_ms={upper_ms}")
    missing = [k for k in keys if k not in left.columns or k not in right.columns]
    if missing:
        raise ValueError(f"join keys absent from a side: {missing}")

    renamed = right.select(
        [F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    )
    lw = left.withWatermark(left_ts, left_delay)
    rw = renamed.withWatermark(f"{right_prefix}{right_ts}", right_delay)

    r_ts = F.col(f"{right_prefix}{right_ts}")
    l_ts = F.col(left_ts)
    cond: Column = reduce(
        lambda a, b: a & b,
        [F.col(k) == F.col(f"{right_prefix}{k}") for k in keys],
    )
    cond = (
        cond
        & (r_ts >= l_ts + F.expr(f"INTERVAL {lower_ms} MILLISECOND"))
        & (r_ts <= l_ts + F.expr(f"INTERVAL {upper_ms} MILLISECOND"))
    )
    return lw.join(rw, cond, how)
