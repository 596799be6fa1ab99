"""Heavy hitters (SpaceSaving) — bounded-state top-k frequency, batch + stream.

Spark has native sketches for distinct counts (`approx_count_distinct`) and
quantiles (`percentile_approx`) but nothing for FREQUENT ITEMS — the "top
domains / tokens / users without a full groupBy shuffle" question a corpus
report asks constantly at 100 TB. This implements SpaceSaving (Metwally,
Agrawal & El Abbadi 2005) in its mergeable-summaries form (Agarwal et al.
2012):

- ``heavy_hitters`` (batch): each partition builds a capacity-bounded
  sketch in one mapInPandas pass (per-Arrow-batch ``value_counts``
  pre-aggregation, then weighted SpaceSaving inserts), and only the tiny
  summaries — ≤ capacity rows per partition — shuffle to the final merge.
  The full-item-set shuffle of an exact groupBy never happens.

- ``heavy_hitters_stream``: the same partial sketches per micro-batch,
  folded into ONE sketch held in ``applyInPandasWithState`` state — state
  is O(capacity) forever, unlike a streaming groupBy count whose state
  grows with the distinct-item universe.

Guarantees (tests assert both empirically, and exactness when
``capacity ≥ distinct``):

- completeness: every item with true count > N/capacity is reported;
- accuracy: |est − true| ≤ N/capacity for every reported item, and
  ``est − err ≤ true`` (err is the accumulated evict-inheritance bound).

Both follow from the per-partition SpaceSaving invariants (Σ counters =
N_p, every counter ≤ true_p + min_p, min_p ≤ N_p/capacity) summed across
partitions; merging summaries preserves them (mergeable-summaries
composition), which is also why the streaming fold is exact-same-math.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ss_insert(sk: dict[str, list[int]], item: str, w: int, e: int, capacity: int):
    """Weighted SpaceSaving insert of (item, weight, inherited error)."""
    slot = sk.get(item)
    if slot is not None:
        slot[0] += w
        slot[1] += e
    elif len(sk) < capacity:
        sk[item] = [w, e]
    else:
        # evict the min counter; the newcomer inherits its value as both
        # count floor and error (the classic SpaceSaving replacement),
        # deterministic via (count, item) tie-break
        victim = min(sk.items(), key=lambda kv: (kv[1][0], kv[0]))
        m = victim[1][0]
        del sk[victim[0]]
        sk[item] = [m + w, m + e]


def _partition_sketches(
    df: DataFrame, col: str, capacity: int
) -> DataFrame:
    """(item, cnt, err) partial summaries, ≤ capacity rows per partition."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk: dict[str, list[int]] = {}
        for pdf in batches:
            # exact pre-aggregation inside the Arrow batch, then weighted
            # inserts — the Python loop runs per DISTINCT item per batch
            for item, w in pdf[col].value_counts().items():
                _ss_insert(sk, item, int(w), 0, capacity)
        yield pd.DataFrame(
            {
                "item": list(sk.keys()),
                "cnt": [v[0] for v in sk.values()],
                "err": [v[1] for v in sk.values()],
            }
        )

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        gen, schema="item string, cnt bigint, err bigint"
    )


def heavy_hitters(
    df: DataFrame, col: str, capacity: int = 256, k: int | None = None
) -> DataFrame:
    """Approximate top-k of `col`: (item, est, err), est descending.

    ``est`` sums the per-partition overestimates; ``err`` the inherited
    evict bounds — ``est − err ≤ true ≤ est + N/capacity`` and any item
    with true count > N/capacity is present (see module docstring). With
    ``capacity ≥`` the partition-distinct count the sketch never evicts and
    the result is EXACT (err = 0, est = groupBy count).

    Plan shape: one map-side pass + a shuffle of ≤ capacity×partitions
    summary rows. The exact groupBy alternative shuffles every distinct
    item with its partial counts.
    """
    merged = (
        _partition_sketches(df, col, capacity)
        .groupBy("item")
        .agg(F.sum("cnt").alias("est"), F.sum("err").alias("err"))
        .orderBy(F.col("est").desc(), F.col("item"))
    )
    return merged.limit(k) if k is not None else merged


def heavy_hitters_stream(
    stream_df: DataFrame, col: str, capacity: int = 256
) -> DataFrame:
    """Streaming heavy hitters with O(capacity) state, ever.

    Per micro-batch: stateless partition sketches (same generator as
    batch), then a fold of those partials into one SpaceSaving sketch in
    ``applyInPandasWithState``. Emits the full summary every batch tagged
    with a monotone ``version`` — the live top-k is the max-version slice.
    The single state key is not a throughput bottleneck: what reaches it is
    pre-reduced partials (≤ capacity rows per upstream partition), not the
    stream itself — the same topology as a global streaming aggregate's
    final combine.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    partials = _partition_sketches(stream_df, col, capacity).withColumn(
        "__k", F.lit(0)
    )

    def handler(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            items, cnts, errs, version = state.get
            sk = {i: [c, e] for i, c, e in zip(items, cnts, errs)}
        else:
            sk, version = {}, 0
        for pdf in pdfs:
            # deterministic fold order regardless of partial arrival
            pdf = pdf.sort_values(["cnt", "item"], ascending=[False, True])
            for item, cnt, err in zip(pdf["item"], pdf["cnt"], pdf["err"]):
                _ss_insert(sk, str(item), int(cnt), int(err), capacity)
        version += 1
        state.update(
            (
                list(sk.keys()),
                [int(v[0]) for v in sk.values()],
                [int(v[1]) for v in sk.values()],
                version,
            )
        )
        yield pd.DataFrame(
            {
                "item": list(sk.keys()),
                "est": [v[0] for v in sk.values()],
                "err": [v[1] for v in sk.values()],
                "version": version,
            }
        )

    return partials.groupBy("__k").applyInPandasWithState(
        handler,
        outputStructType="item string, est bigint, err bigint, version int",
        stateStructType=(
            "items array<string>, cnts array<bigint>, errs array<bigint>, "
            "version int"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
