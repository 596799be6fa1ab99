"""Partition-width control for Python-heavy stages.

Two local-vs-scale effects starve Arrow/Pandas stages of parallelism:

1. A small parquet file scans as 1 partition (file splitting can't go below
   a row group), so a mapInPandas directly over the scan runs on one core.
2. AQE's byte-based coalescing folds a "small" shuffle (a few MB) down to
   1-2 partitions — its 64MB advisory size assumes JVM-speed consumers,
   while a Python stage consumes ~100x slower per byte.

``widen_for_python`` therefore repartitions to the configured shuffle width
UNCONDITIONALLY before a Python-heavy stage. This is a plan-side decision:
no ``DataFrame.rdd`` probe (with AQE enabled, touching ``.rdd`` finalizes
the physical plan and can materialize upstream query stages as extra jobs —
a silent double-execution hazard for post-shuffle inputs). The explicit
partition count also keeps AQE from coalescing the exchange back down.

Scale note: shuffle width is the RIGHT width for a Python consumer — on a
real cluster ``spark.sql.shuffle.partitions`` is sized to 2-3× total cores,
so this exchange sizes the Arrow batches to the cluster, and its cost is one
round-robin pass over an already-pruned projection (the callers all pass
narrow id+payload projections, never full rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_for_python(
    df: DataFrame, min_parts: int | None = None, known_wide: bool = False
) -> DataFrame:
    """Repartition `df` to the session shuffle width (or ``min_parts``)
    before a Python-heavy stage.

    ``known_wide=True``: the caller asserts the input is already at least
    shuffle-width partitioned (e.g. a large multi-file scan on a cluster) —
    skip the exchange entirely. Without the hint, the width is
    ``max(shuffle.partitions, defaultParallelism)`` so a repartition never
    *narrows* an input on a cluster whose core count exceeds the configured
    shuffle width (plan-side sizing only — no ``.rdd`` probe, which would
    finalize the AQE plan and can re-execute upstream stages)."""
    if known_wide:
        return df
    spark = df.sparkSession
    n = min_parts or max(
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        spark.sparkContext.defaultParallelism,
    )
    return df.repartition(n)


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    col: str,
    out: str = "n_distinct",
    n_salts: int = 64,
) -> DataFrame:
    """Skew-proof exact COUNT(DISTINCT col) per group.

    For {sum,count,min,max}, Catalyst's map-side partial aggregation already
    neutralizes hot keys — no salting needed, and this module deliberately
    does not wrap those. The aggregate that DOES die on a hot key is
    count-distinct: the single reduce task for the hot group must hold the
    whole distinct set. `groupBy(k).agg(countDistinct(x))` on a key with 10⁹
    rows behind it is the classic 100 TB stage-killer.

    Fix: shard the VALUE space, not the rows — salt = hash(col) % n_salts,
    partial `count_distinct` at (keys, salt), merge by SUM at (keys). Exact,
    because a hash-partitioned value space makes the per-salt distinct sets
    provably disjoint; the hot group's state is split across n_salts tasks
    and each partial set is ~1/n_salts of the original — expressed as an
    explicit two-level plan so it composes with other aggregates.
    """
    from pyspark.sql import functions as F

    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(col)), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count_distinct(F.col(col)).alias("__pn")
    )
    return partial.groupBy(*keys).agg(F.sum("__pn").cast("bigint").alias(out))
