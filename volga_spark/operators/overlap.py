"""Cross-corpus overlap estimation via KMV (bottom-k) sketches.

The 100 TB question this answers: "how much of corpus B is already in
corpus A?" — across snapshots, across crawl dumps, between a training mix
and a benchmark suite — WITHOUT joining the corpora. Each corpus reduces
to a k-row sketch (its k smallest distinct md5 values); distinct counts,
union sizes, and intersection sizes then come from sketch-only arithmetic
(Beyer et al. 2007, "On synopses for distinct-value estimation under
multiset operations" — the KMV estimator; Dasgupta et al. 2016 theta
sketches are the same construction generalized). Two 100 TB corpora
compare in O(k) after one scan each, and sketches persist: yesterday's
sketch is reusable against every future corpus.

Why KMV and not HLL: HLL union-merges, but has no working intersection
(inclusion-exclusion error explodes for small overlaps). KMV's bottom-k
of a union IS bottom-k of the merged sketches, and membership of the
union sketch in both input sketches gives a direct Jaccard estimator
x/k with relative error ~1/sqrt(k) — multiset set-ops compose.

Determinism — the property the driver oracle leans on: the sketch is an
EXACT function of the corpus (the k smallest distinct md5 hex strings —
fixed-width lowercase hex, so string order == 128-bit numeric order, and
Spark and DuckDB md5 agree byte-for-byte). The estimators are pure
integer arithmetic (`div` on 60-bit hash prefixes), so estimates are
bit-identical across engines too: an "approximate" operator with an
exact-match oracle.

Plan shape (the scale story): one map-side pass builds per-partition
bottom-k partial sketches — every hash in the global bottom-k distinct
set is necessarily in its own partition's bottom-k distinct set, so only
<= k rows per partition shuffle; the global merge sorts <= k x P summary
rows. The exact-join alternative shuffles both corpora. Mirrors the
mergeable-summaries shape of `operators/sketches.py` (SpaceSaving).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 60-bit hash prefix (15 hex chars) — fits BIGINT in both engines; the
# split-shift estimator below keeps every intermediate under 2^63.
_PREFIX_HEX = 15
_NUM_SHIFT = 33  # numerator scale 2^33
_DEN_SHIFT = 27  # denominator truncation 2^27 (33 + 27 = 60)


def _hash_int(h: Column) -> Column:
    """First 15 hex chars of an md5 string as a 60-bit BIGINT (Spark side;
    the DuckDB twin is ``CAST('0x' || substr(h,1,15) AS BIGINT)``)."""
    return F.conv(F.substring(h, 1, _PREFIX_HEX), 16, 10).cast("long")


def kmv_sketch(df: DataFrame, col: str, k: int = 128) -> DataFrame:
    """The k smallest DISTINCT md5 values of `col`: one map-side partial
    bottom-k pass (<= k summary rows leave each partition), then a tiny
    global merge. Returns (h string, rank int), rank 1..k ascending —
    fewer than k rows iff the corpus has fewer than k distinct values
    (in which case the sketch IS the exact distinct set).
    """
    hashed = df.select(F.md5(F.col(col).cast("string")).alias("h")).filter(
        F.col("h").isNotNull()
    )
    partials = hashed.mapInPandas(_partial_gen(k), schema="h string")
    # <= k x P summary rows: ONE exchange — partial collect_set map-side,
    # sort + truncate + explode native (no distinct pass, no window)
    return _bottom_k_of(partials, k)


def _partial_gen(k: int):
    """Per-partition bottom-k distinct generator — the ONE sketch
    construction, shared by the batch scan and the streaming fold so the
    two can never diverge (the stream==batch closure claim depends on
    identical partials)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best = np.asarray([], dtype=object)
        for pdf in batches:
            u = pdf["h"].dropna().unique()
            best = np.unique(np.concatenate([best, u]))[:k]  # sorted, deduped
        yield pd.DataFrame({"h": pd.Series(best, dtype=object)})

    return gen


def _bottom_k_of(partials: DataFrame, k: int) -> DataFrame:
    """(h, rank) bottom-k distinct of a small summary frame in one
    aggregation: collect_set -> array_sort -> slice -> posexplode."""
    return (
        partials.agg(
            F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("hs")
        )
        .select(F.posexplode("hs").alias("pos", "h"))
        .select("h", (F.col("pos") + 1).cast("int").alias("rank"))
    )


def kmv_sketch_by(
    df: DataFrame, col: str, side: Column | str, k: int = 128
) -> DataFrame:
    """Per-group bottom-k sketches in ONE corpus scan: (side, h, rank) with
    rank 1..k ascending within each side. The multi-corpus shape — N corpus
    splits (snapshots, sources, halves) sketch in a single pass instead of
    N scans; per partition at most k x n_sides summary rows leave, and the
    global per-side bottom-k is one small shuffle over the summaries.
    Exactly equal to running :func:`kmv_sketch` per side (tested)."""
    side_col = F.col(side) if isinstance(side, str) else side
    hashed = df.select(
        side_col.cast("string").alias("side"),
        F.md5(F.col(col).cast("string")).alias("h"),
    ).filter(F.col("h").isNotNull() & F.col("side").isNotNull())

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: dict[str, np.ndarray] = {}
        for pdf in batches:
            for s, g in pdf.groupby("side"):
                u = g["h"].dropna().unique()
                prev = best.get(s)
                cat = np.concatenate([prev, u]) if prev is not None else u
                best[s] = np.unique(cat)[:k]
        sides = [s for s in best for _ in best[s]]
        hs = np.concatenate(list(best.values())) if best else []
        yield pd.DataFrame(
            {
                "side": pd.Series(sides, dtype=object),
                "h": pd.Series(hs, dtype=object),
            }
        )

    partials = hashed.mapInPandas(gen, schema="side string, h string")
    # one exchange on side: partial collect_set map-side, sort/slice/explode
    return (
        partials.groupBy("side")
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("hs"))
        .select("side", F.posexplode("hs").alias("pos", "h"))
        .select("side", "h", (F.col("pos") + 1).cast("int").alias("rank"))
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 128) -> DataFrame:
    """Union sketch: bottom-k of the merged sketches == the sketch of the
    union corpus (the KMV closure property; asserted exactly in tests)."""
    return _bottom_k_of(a.select("h").unionByName(b.select("h")), k)


def _est_expr(n_col: Column, k: int) -> Column:
    """Distinct estimate, pure integer: exact count when the sketch is
    under-full (n < k — the sketch saw every distinct value), else
    (k-1) / (vk / 2^60) evaluated as ((k-1) << 33) div (vk >> 27).
    Truncation adds <= 2^-27 relative error — noise next to the sketch's
    ~1/sqrt(k). Same expression textually in the DuckDB oracle.
    Requires a ``__vk`` column in scope (the kth hash prefix).

    The denominator is clamped to >= 1: a full sketch whose kth hash prefix
    is below 2^27 (kth order statistic that small means ~> 5e11 distinct
    values at k=128 — inside the stated 100 TB design point) would otherwise
    divide by zero (NULL under non-ANSI Spark, an error under ANSI/DuckDB).
    The clamp caps the estimate at (k-1)*2^33 — the numerator with the
    denominator pinned at 1 (~1.09e12 at k=128; the truncated denominator
    saturates 2^27 early, so the cap is NOT (k-1)*2^60) — rather than
    corrupting it."""
    return F.when(n_col < k, n_col.cast("long")).otherwise(
        F.expr(
            f"CAST(({k} - 1) * CAST({2 ** _NUM_SHIFT} AS BIGINT) "
            f"div greatest(1, __vk div {2 ** _DEN_SHIFT}) AS BIGINT)"
        )
    )


def kmv_distinct_estimate(sketch: DataFrame, k: int = 128) -> DataFrame:
    """One row: (n_sketch, vk, est) — distinct-count estimate from the
    sketch alone. `vk` is the kth (max) hash prefix as a 60-bit int."""
    agg = sketch.agg(
        F.count("*").cast("int").alias("n_sketch"),
        F.max(_hash_int(F.col("h"))).alias("__vk"),
    )
    return agg.select(
        "n_sketch",
        F.col("__vk").alias("vk"),
        _est_expr(F.col("n_sketch"), k).alias("est"),
    )


def kmv_stream_maintain(
    stream_df: DataFrame, col: str, k: int = 128
) -> DataFrame:
    """Streaming KMV: per micro-batch partial sketches (same map-side
    bottom-k generator as batch) folded into ONE bottom-k set held in
    ``applyInPandasWithState`` — state is O(k) forever, and because the
    sketch is closed under union (``kmv_merge`` closure, tested exactly),
    the streamed sketch equals the batch sketch of everything ingested.
    Emits the full sketch each batch tagged with a monotone ``version``;
    the live sketch is the max-version slice. The single state key sees
    only pre-reduced partials (<= k rows per upstream partition)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    hashed = stream_df.select(
        F.md5(F.col(col).cast("string")).alias("h")
    ).filter(F.col("h").isNotNull())
    partials = hashed.mapInPandas(_partial_gen(k), schema="h string").withColumn(
        "__k", F.lit(0)
    )

    def handler(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            (held, version) = state.get
            best = np.asarray(held, dtype=object)
        else:
            best, version = np.asarray([], dtype=object), 0
        for pdf in pdfs:
            u = pdf["h"].dropna().unique()
            best = np.unique(np.concatenate([best, u]))[:k]
        version += 1
        state.update(([str(h) for h in best], version))
        yield pd.DataFrame(
            {
                "h": best,
                "rank": np.arange(1, len(best) + 1, dtype="int32"),
                "version": version,
            }
        )

    return partials.groupBy("__k").applyInPandasWithState(
        handler,
        outputStructType="h string, rank int, version int",
        stateStructType="held array<string>, version int",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def kmv_overlap(a: DataFrame, b: DataFrame, k: int = 128) -> DataFrame:
    """Overlap of two corpora from their sketches only. One row:

    - ``x``: members of the union sketch present in BOTH input sketches
      (the KMV Jaccard numerator — x/k estimates J(A,B));
    - ``n_union`` / ``vk``: union-sketch fill and kth hash prefix;
    - ``est_union``: distinct-count estimate of |A u B|;
    - ``est_intersection``: (x * est_union) div k.

    All integers, all exact functions of the two corpora — the driver
    oracle replays the same pipeline in SQL and hash-matches.
    """
    u = kmv_merge(a, b, k)
    flagged = (
        u.join(a.select(F.col("h").alias("h_a")), u.h == F.col("h_a"), "left")
        .join(b.select(F.col("h").alias("h_b")), u.h == F.col("h_b"), "left")
        .select(
            "h",
            (F.col("h_a").isNotNull() & F.col("h_b").isNotNull()).alias(
                "in_both"
            ),
        )
    )
    agg = flagged.agg(
        F.sum(F.col("in_both").cast("long")).alias("x"),
        F.count("*").cast("int").alias("n_union"),
        F.max(_hash_int(F.col("h"))).alias("__vk"),
    )
    return (
        agg.select(
            "x",
            "n_union",
            F.col("__vk").alias("vk"),
            _est_expr(F.col("n_union"), k).alias("est_union"),
        ).withColumn("est_intersection", _est_intersection_expr(k))
    )


def _est_intersection_expr(k: int) -> Column:
    """x/k of the union estimate; an under-full union sketch saw the whole
    union, so divide by its true size instead of k. Requires ``x``,
    ``est_union``, ``n_union`` columns in scope."""
    return F.expr(
        f"CAST(x * est_union div (CASE WHEN n_union = 0 THEN 1 "
        f"WHEN n_union < {k} THEN n_union ELSE {k} END) AS BIGINT)"
    )
