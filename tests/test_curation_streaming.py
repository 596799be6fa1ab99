"""Batch/stream unification for the curation expressions (the reference's
one-query-N-modes pitch): the SAME pii/url/quality Column expressions run
unchanged inside a Structured Streaming query, and the streamed result is
row-identical to the batch result.

Native expressions are mode-agnostic by construction in Spark — this test
pins that property for the curation tier so a refactor that sneaks in a
batch-only construct (e.g. a window over the whole corpus) fails loudly.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

from volga_spark.operators.pii import pii_total, redact_pii
from volga_spark.operators.text import quality_score, token_count
from volga_spark.operators.urls import blocklisted_expr, first_host
from volga_spark.streaming.runner import run_available_now_to_memory
from volga_spark.tables import load_table

_INJECT = (
    "concat(substring(text, 1, 40),"
    " CASE WHEN doc_id % 2 = 0 THEN concat(' u', CAST(doc_id AS STRING),"
    "   '@example.com') ELSE '' END,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' https://www.site',"
    "   CAST(doc_id % 7 AS STRING), '.example.com/p') ELSE '' END)"
)

_DOMAINS = ("site1.example.com", "site4.example.com")


def _curate(df):
    """One curation projection, applied identically to batch and stream."""
    seeded = df.select("doc_id", F.expr(_INJECT).alias("text"))
    return seeded.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.round(quality_score("text"), 6).alias("quality"),
        pii_total("text"),
        redact_pii("text").alias("redacted"),
        first_host("text").alias("host"),
        blocklisted_expr("text", _DOMAINS).alias("blocklisted"),
    )


def test_stream_curation_equals_batch(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = _curate(docs).toPandas()

    # 4 time-ordered parquet chunks → file stream, 2 files per trigger
    root = os.path.join(
        tempfile.gettempdir(), "volga_spark_curation_stream", uuid.uuid4().hex[:8]
    )
    os.makedirs(root, exist_ok=True)
    try:
        n = docs.count()
        per = (n + 3) // 4
        pdf = docs.orderBy("doc_id").toPandas()
        for i in range(4):
            chunk = pdf.iloc[i * per : (i + 1) * per]
            spark.createDataFrame(chunk).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(root, f"chunk{i}"))
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(os.path.join(root, "chunk*"))
        )
        streamed = run_available_now_to_memory(
            _curate(stream), output_mode="append"
        ).toPandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)

    assert len(streamed) == len(batch) == n
    b = batch.sort_values("doc_id").reset_index(drop=True)
    s = streamed.sort_values("doc_id").reset_index(drop=True)
    for col in b.columns:
        assert b[col].tolist() == s[col].tolist(), col
    assert b["blocklisted"].any() and not b["blocklisted"].all()
