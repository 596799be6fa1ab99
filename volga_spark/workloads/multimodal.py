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
    extract_audio_features,
    extract_features,
    frame_sample,
    image_pixel_stats,
    transform_images,
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
        UNION ALL
        -- 'xform' (r12): decode->resize->re-encode->RE-DECODE round trip.
        -- The synthesized PGM is CONSTANT c = 32 + length%95 over a
        -- doc-varying geometry, and bilinear resampling of a constant
        -- image is that constant, so the re-decoded 12x10 PNG has
        -- sum = 120c and min = max = c; every 97th doc gets a truncated
        -- header and must come back as a quarantined ValueError row.
        SELECT 'xform' AS leg, doc_id, CAST(x.idx AS BIGINT) AS idx,
               CASE WHEN doc_id % 97 = 0 THEN NULL
                    WHEN x.idx = 0 THEN 12010.0
                    WHEN x.idx = 1 THEN (32 + length(text) % 95) * 120.0
                    ELSE (32 + length(text) % 95) * 1001.0 END AS num_val,
               CASE WHEN doc_id % 97 = 0 THEN 'ValueError' END AS str_val
        FROM documents, (SELECT unnest([0, 1, 2]) AS idx) x
        UNION ALL
        -- 'mel' (r12): WAV -> STFT frame geometry. n_samples = 128m with
        -- m = 32 + doc_id%8, so frames = 1 + (128m - 256)/128 = m - 1;
        -- rate and mel-vector width are schema invariants. Every 89th doc
        -- gets a 6-byte RIFF stub -> quarantined ValueError row.
        SELECT 'mel' AS leg, doc_id, CAST(a.idx AS BIGINT) AS idx,
               CASE WHEN doc_id % 89 = 0 THEN NULL
                    WHEN a.idx = 0 THEN 31.0 + doc_id % 8
                    WHEN a.idx = 1 THEN 8192.0
                    ELSE 16.0 END AS num_val,
               CASE WHEN doc_id % 89 = 0 THEN 'ValueError' END AS str_val
        FROM documents, (SELECT unnest([0, 1, 2]) AS idx) a
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

    # --- 'xform' (r12, r11 verdict #2): REAL decode→resize→re-encode over
    # synthesized PGMs (constant pixel c = 32 + len%95, doc-varying dims),
    # then image_pixel_stats RE-DECODES the emitted PNG — the whole round
    # trip sits under the driver oracle because bilinear resampling of a
    # constant image is that constant (sum = 120c, min = max = c). Every
    # 97th doc carries a truncated header to oracle the quarantine path.
    synth_img = d.selectExpr(
        "doc_id",
        """CASE WHEN doc_id % 97 = 0
             THEN encode('P5\n9 7\n255\n', 'utf-8')
             ELSE encode(concat(
               'P5\n', cast(6 + doc_id % 7 as string), ' ',
               cast(5 + doc_id % 5 as string), '\n255\n',
               repeat(char(32 + length(text) % 95),
                      (6 + doc_id % 7) * (5 + doc_id % 5))), 'utf-8')
           END as payload""",
    )
    xf = transform_images(synth_img, size=(12, 10))
    xf0 = xf.selectExpr(
        "'xform' as leg",
        "doc_id",
        "CAST(0 AS BIGINT) as idx",
        "CAST(height * 1000 + width AS DOUBLE) as num_val",
        "err as str_val",
    )
    xf_stats = image_pixel_stats(xf).select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).cast("bigint").alias("idx"),
                    F.col("px_sum").alias("v"),
                ),
                F.struct(
                    F.lit(2).cast("bigint").alias("idx"),
                    (F.col("px_min") * 1000 + F.col("px_max"))
                    .cast("double")
                    .alias("v"),
                ),
            )
        ).alias("e"),
        "err",
    ).select(
        F.lit("xform").alias("leg"),
        "doc_id",
        F.col("e.idx").alias("idx"),
        F.col("e.v").alias("num_val"),
        F.col("err").alias("str_val"),
    )

    # --- 'mel' (r12): WAV synthesized natively in SQL (PCM16 mono, rate
    # 8192, constant sample, n = 128·(32 + doc_id%8)) → log-mel extraction;
    # the oracled invariants are the STFT frame geometry (frames = m − 1),
    # the rate passthrough, and the mel-vector width (transcendental mel
    # VALUES stay off the hash surface per the float-parity rule). Every
    # 89th doc is a 6-byte RIFF stub → quarantined ValueError row.
    synth_wav = d.selectExpr(
        "doc_id",
        """CASE WHEN doc_id % 89 = 0
             THEN encode('RIFFxx', 'utf-8')
             ELSE encode(concat(
               'RIFF', char(36), char(32 + doc_id % 8), char(0), char(0),
               'WAVEfmt ', char(16), char(0), char(0), char(0),
               char(1), char(0), char(1), char(0),
               char(0), char(32), char(0), char(0),
               char(0), char(64), char(0), char(0),
               char(2), char(0), char(16), char(0),
               'data', char(0), char(32 + doc_id % 8), char(0), char(0),
               repeat(concat(char(64), char(0)), 128 * (32 + doc_id % 8))
             ), 'utf-8')
           END as payload""",
    )
    mel = extract_audio_features(synth_wav).select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).cast("bigint").alias("idx"),
                    F.col("n_frames").cast("double").alias("v"),
                ),
                F.struct(
                    F.lit(1).cast("bigint").alias("idx"),
                    F.col("sample_rate").cast("double").alias("v"),
                ),
                F.struct(
                    F.lit(2).cast("bigint").alias("idx"),
                    F.when(F.col("err").isNull(), F.size("log_mel"))
                    .cast("double")
                    .alias("v"),
                ),
            )
        ).alias("e"),
        "err",
    ).select(
        F.lit("mel").alias("leg"),
        "doc_id",
        F.col("e.idx").alias("idx"),
        F.col("e.v").alias("num_val"),
        F.col("err").alias("str_val"),
    )

    return (
        meta.unionByName(feats)
        .unionByName(frames)
        .unionByName(xf0)
        .unionByName(xf_stats)
        .unionByName(mel)
    )
