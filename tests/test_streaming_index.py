"""Streaming BM25 index maintenance: the index folded batch-by-batch from
a document stream equals the batch-built index over the full corpus, and
serves identical top-k results."""

from __future__ import annotations

from volga_spark.operators.retrieval import (
    bm25_index,
    bm25_topk_from_index,
)
from volga_spark.streaming.index_maintenance import maintain_bm25_index
from volga_spark.streaming.sources import chunked_file_stream
from volga_spark.tables import load_table


def _norm(df):
    return sorted(map(tuple, df.collect()))


def test_streamed_index_equals_batch_index(spark, sf_dir):
    stream, _ = chunked_file_stream(
        spark, sf_dir, "documents", ts_col="doc_id", n_chunks=4
    )
    streamed = maintain_bm25_index(stream)
    batch = bm25_index(load_table(spark, sf_dir, "documents"))

    for got, want, name in zip(streamed, batch, ("postings", "doclen", "stats")):
        assert _norm(got) == _norm(want), name

    qs = spark.createDataFrame(
        [(1, "spark window agg"), (2, "dup merge")], "query_id int, qtext string"
    )
    assert _norm(bm25_topk_from_index(streamed, qs, k=5)) == _norm(
        bm25_topk_from_index(batch, qs, k=5)
    )


def test_empty_stream_yields_empty_index(spark, tmp_path):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    src = str(tmp_path / "empty_src")
    import os

    os.makedirs(src, exist_ok=True)
    stream = spark.readStream.schema(schema).parquet(src)
    postings, doclen, stats = maintain_bm25_index(stream)
    assert postings.count() == 0 and doclen.count() == 0
