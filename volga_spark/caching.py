"""Cached-block lifecycle for iterative/reused-subtree operators.

Several operators pin executor storage via ``localCheckpoint`` so a subtree
feeding multiple plan branches (LSH banding self-joins, the shared-shingle
join, connected-components rounds) executes once instead of N times. Spark
has no DataFrame-level API to release those blocks (``DataFrame.unpersist``
only drops the catalog cache entry, and touching ``.rdd`` to unpersist the
underlying RDD is banned engine-wide — it finalizes the AQE plan and can
re-execute upstream stages).

Retention contract: checkpointed blocks live until the session ends or
``release_cached_blocks`` is called. Library callers running many dedup /
clustering queries in one long-lived session should call it between queries
(it is what ``bench.py`` does per trial); a one-query-per-job deployment can
ignore it.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def release_cached_blocks(spark: SparkSession) -> None:
    """Release every persistent RDD (including ``localCheckpoint`` blocks)
    plus the catalog cache. Safe to call between queries; never raises."""
    try:
        spark.catalog.clearCache()
    except Exception:  # noqa: BLE001 — cleanup must never fail the caller
        pass
    try:
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist()
    except Exception:  # noqa: BLE001
        pass
