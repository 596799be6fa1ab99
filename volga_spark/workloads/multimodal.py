"""Multimodal-column workloads: binary payload plumbing over `documents`.

The decode step is stubbed (no codec libs in this image) but the Spark-side
schema/batching/fan-out is real and oracle-checked where deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.multimodal import (
    attach_payload,
    extract_features,
    frame_sample,
)
from volga_spark.tables import load_table
from volga_spark.workloads import workload


@workload(
    "q_multimodal_meta",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS payload_size,
               md5(text) AS payload_md5,
               'application/octet-stream' AS content_type
        FROM documents
    """,
    tags=("multimodal",),
)
def q_multimodal_meta(spark, sf_dir):
    """Typed metadata over an opaque binary payload column — metadata-only
    readers never touch the payload bytes (parquet column pruning)."""
    d = load_table(spark, sf_dir, "documents")
    return attach_payload(d).select(
        "doc_id",
        F.col("payload_size").cast("bigint").alias("payload_size"),
        "payload_md5",
        "content_type",
    )


@workload(
    "q_multimodal_features",
    oracle=r"""
        SELECT doc_id,
               CAST(length(text) - length(regexp_replace(text, '[\x00-\x0f]', '', 'g'))
                    AS DOUBLE) AS f0,
               CAST(length(text) - length(regexp_replace(text, '[\x60-\x6f]', '', 'g'))
                    AS DOUBLE) AS f6,
               CAST(strlen(text) AS DOUBLE) AS f_sum
        FROM documents
    """,
    tags=("multimodal",),
)
def q_multimodal_features(spark, sf_dir):
    """Arrow-batched feature extraction (stub decoder: 16-bin byte
    histogram). Swap the decoder for PIL/ffmpeg in production — plumbing
    unchanged. The stub is deterministic, so it IS oracle-able: bin k counts
    payload bytes in [16k, 16(k+1)), which DuckDB reproduces with per-range
    regexp strip-and-measure (the corpus is pure ASCII — strlen==length —
    so char classes == byte classes), and the histogram total equals the
    byte length."""
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_payload(d))
    return feats.select(
        "doc_id",
        F.element_at("features", 1).alias("f0"),
        F.element_at("features", 7).alias("f6"),
        F.aggregate("features", F.lit(0.0), lambda a, v: a + v).alias("f_sum"),
    )


@workload(
    "q_multimodal_frames",
    oracle="""
        WITH exploded AS (
            SELECT doc_id, text,
                   unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT))) AS i
            FROM documents
        )
        SELECT doc_id, CAST(i AS INTEGER) AS frame_no,
               md5(substr(text, CAST(i * 64 + 1 AS INTEGER), 64)) AS frame_md5
        FROM exploded
    """,
    tags=("multimodal",),
)
def q_multimodal_frames(spark, sf_dir):
    """Frame-sampling fan-out: one row per 64-byte chunk with a digest —
    the shape of video frame extraction (row explosion, repartition after)."""
    d = load_table(spark, sf_dir, "documents")
    return frame_sample(attach_payload(d), every_n_bytes=64)
