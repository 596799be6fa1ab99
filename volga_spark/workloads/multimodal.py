"""Multimodal-column workloads: binary payload plumbing over `documents`.

The decode step is stubbed (no codec libs in this image) but the Spark-side
schema/batching/fan-out is real and oracle-checked where deterministic.

r05: the three multimodal capabilities (typed metadata, Arrow-batched
feature extraction, frame-sampling fan-out) are consolidated into ONE
leg-tagged union query with a common `(leg, doc_id, idx, num_val, str_val)`
schema, mirrored leg-for-leg by a UNION ALL DuckDB oracle — the registry is
sized to the driver gate's 50-row cap, and each leg stays exactly oracled.
"""

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
    "q_multimodal",
    oracle=r"""
        SELECT 'meta' AS leg, doc_id, CAST(0 AS BIGINT) AS idx,
               CAST(octet_length(encode(text)) AS DOUBLE) AS num_val,
               md5(text) || '|application/octet-stream' AS str_val
        FROM documents
        UNION ALL
        SELECT 'feat' AS leg, doc_id, CAST(0 AS BIGINT) AS idx,
               CAST(length(text) - length(regexp_replace(text, '[\x00-\x0f]', '', 'g'))
                    AS DOUBLE) AS num_val,
               NULL AS str_val
        FROM documents
        UNION ALL
        SELECT 'feat' AS leg, doc_id, CAST(6 AS BIGINT) AS idx,
               CAST(length(text) - length(regexp_replace(text, '[\x60-\x6f]', '', 'g'))
                    AS DOUBLE) AS num_val,
               NULL AS str_val
        FROM documents
        UNION ALL
        SELECT 'feat' AS leg, doc_id, CAST(-1 AS BIGINT) AS idx,
               CAST(strlen(text) AS DOUBLE) AS num_val,
               NULL AS str_val
        FROM documents
        UNION ALL
        SELECT 'frame' AS leg, doc_id, CAST(i AS BIGINT) AS idx,
               NULL AS num_val,
               md5(substr(text, CAST(i * 64 + 1 AS INTEGER), 64)) AS str_val
        FROM (
            SELECT doc_id, text,
                   unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT))) AS i
            FROM documents
        )
    """,
    tags=("multimodal",),
)
def q_multimodal(spark, sf_dir):
    """The full multimodal surface in one leg-tagged union:

    - ``meta``: typed metadata over an opaque binary payload column
      (size / digest / content type) — metadata-only readers never touch
      the payload bytes (parquet column pruning).
    - ``feat``: Arrow-batched feature extraction (stub decoder: 16-bin byte
      histogram; swap for PIL/ffmpeg in production — plumbing unchanged).
      The stub is deterministic, so it IS oracle-able: bin k counts payload
      bytes in [16k, 16(k+1)), which DuckDB reproduces with per-range regexp
      strip-and-measure (the corpus is pure ASCII — strlen==length — so
      char classes == byte classes); the histogram total equals the byte
      length. Legs emitted: bin 0 (idx=0), bin 6 (idx=6), total (idx=-1).
    - ``frame``: frame-sampling fan-out — one row per 64-byte chunk with a
      digest (the shape of video frame extraction: row explosion, widened
      Python stage).
    """
    d = load_table(spark, sf_dir, "documents")
    p = attach_payload(d)

    meta = p.select(
        F.lit("meta").alias("leg"),
        "doc_id",
        F.lit(0).cast("bigint").alias("idx"),
        F.col("payload_size").cast("double").alias("num_val"),
        F.concat_ws("|", "payload_md5", "content_type").alias("str_val"),
    )

    feats = extract_features(p).select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).cast("bigint").alias("idx"),
                    F.element_at("features", 1).alias("v"),
                ),
                F.struct(
                    F.lit(6).cast("bigint").alias("idx"),
                    F.element_at("features", 7).alias("v"),
                ),
                F.struct(
                    F.lit(-1).cast("bigint").alias("idx"),
                    F.aggregate("features", F.lit(0.0), lambda a, v: a + v).alias("v"),
                ),
            )
        ).alias("e"),
    ).select(
        F.lit("feat").alias("leg"),
        "doc_id",
        F.col("e.idx").alias("idx"),
        F.col("e.v").alias("num_val"),
        F.lit(None).cast("string").alias("str_val"),
    )

    frames = frame_sample(p, every_n_bytes=64).select(
        F.lit("frame").alias("leg"),
        "doc_id",
        F.col("frame_no").cast("bigint").alias("idx"),
        F.lit(None).cast("double").alias("num_val"),
        F.col("frame_md5").alias("str_val"),
    )

    return meta.unionByName(feats).unionByName(frames)
