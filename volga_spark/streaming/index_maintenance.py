"""Streaming BM25 index maintenance — a standing inverted index kept
current under document-stream ingest.

`operators/retrieval.bm25_index` produces three ADDITIVE frames (postings,
doclen, stats); this module folds each micro-batch's delta index into a
versioned parquet state table from `foreachBatch`, the same executor-side
merge + epoch-retry discipline as `streaming/runner.upsert_by_key`:

  - per batch: delta = bm25_index(batch_docs); merged = merge_index(prev,
    delta) — one map-side-combinable groupBy-sum per frame, executed by
    the executors (no driver state beyond an integer version);
  - the new version is written BEFORE the old one is dropped; a retried
    epoch whose version already committed is reused, not re-merged
    (exactly-once net effect under Spark's at-least-once foreachBatch);
  - corpus contract: append-only NEW doc ids (the dedup tier upstream owns
    identity — same contract as `merge_index`).

Scale: per batch the merge cost is O(state + delta) rows of (id, term, tf)
— the versioned-rewrite trade documented in runner.py; on a cluster the
same logic against a Delta/Iceberg postings table is MERGE INTO with
O(delta) cost. Query serving reads the committed version (a consistent
snapshot) via `bm25_topk_from_index` — index maintenance and query load
never contend on state.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession

from volga_spark.operators.retrieval import bm25_index, merge_index
from volga_spark.streaming.runner import _state_root, run_foreach_batch

_FRAMES = ("postings", "doclen", "stats")


def _read_index(spark: SparkSession, base: str):
    return tuple(spark.read.parquet(f"{base}/{f}") for f in _FRAMES)


def _write_index(index, base: str) -> None:
    for frame, name in zip(index, _FRAMES):
        frame.write.mode("overwrite").parquet(f"{base}/{name}")


def maintain_bm25_index(
    doc_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    timeout_s: int = 300,
):
    """Run the document stream to completion (availableNow), maintaining
    the standing BM25 index across micro-batches; returns the final
    (postings, doclen, stats) frames — identical to bm25_index over the
    full corpus (tested)."""
    spark = doc_stream.sparkSession
    root = _state_root()
    cur = {"version": None}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        prev_version = cur["version"]
        if prev_version == epoch_id:
            return  # retried epoch, already committed — reuse
        delta = bm25_index(batch_df, id_col, text_col)
        if prev_version is not None:
            merged = merge_index(
                _read_index(batch_df.sparkSession, f"{root}/v{prev_version}"),
                delta,
            )
        else:
            merged = delta
        _write_index(merged, f"{root}/v{epoch_id}")
        cur["version"] = epoch_id
        if prev_version is not None and prev_version != epoch_id:
            shutil.rmtree(f"{root}/v{prev_version}", ignore_errors=True)

    run_foreach_batch(doc_stream, sink, timeout_s)
    if cur["version"] is None:
        empty = spark.createDataFrame([], f"{id_col} bigint, term string, tf bigint")
        return (
            empty,
            spark.createDataFrame([], f"{id_col} bigint, dl bigint"),
            spark.createDataFrame([], "n_docs bigint, sum_dl bigint"),
        )
    return _read_index(spark, f"{root}/v{cur['version']}")
