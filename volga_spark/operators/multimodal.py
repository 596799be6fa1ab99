"""Multimodal column plumbing (image/audio/video as opaque binary).

The Spark-side machinery is real and tested: binary payload columns with
typed metadata, Arrow-batched ``mapInPandas`` decode/feature/resize stages
with explicit schemas and partition-size control. The actual codec calls are
STUBBED (``decode_image`` raises NotImplementedError unless a decoder
callback is injected) because no image/audio libraries exist in this image —
swap ``decoder=`` for PIL/ffmpeg in production; nothing else changes.

At 100 TB: binaries should ride in parquet with
``spark.sql.files.maxPartitionBytes`` sized so a task's Arrow batch of
payloads fits executor memory; metadata-only queries never touch the bytes
(parquet column pruning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from volga_spark.partitioning import widen_for_python

from volga_spark._pickle import register_by_value


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test fixture: treat utf-8 bytes of `text` as an opaque media payload
    with typed metadata — the schema/partitioning shape of a real corpus."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        "*",
        payload.alias("payload"),
        F.length(payload).alias("payload_size"),
        F.md5(payload).alias("payload_md5"),
        F.lit("application/octet-stream").alias("content_type"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    raise NotImplementedError(
        "image decoding requires PIL/opencv — not present in this image; "
        "inject decoder= into extract_features instead"
    )


def _fake_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in 'decoder': byte histogram as a 16-dim feature.
    Exercises the full Arrow batch path with real numbers."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=16, range=(0, 256))
    return hist.astype(np.float64)


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: Callable[[bytes], np.ndarray] | None = None,
    n_features: int = 16,
) -> DataFrame:
    """payload → fixed-width feature vector via mapInPandas (batched)."""
    import volga_spark.operators.multimodal as _self

    register_by_value(_self)
    dec = decoder or _fake_decoder
    schema = f"{id_col} bigint, features array<double>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [dec(bytes(p)).tolist() for p in pdf[payload_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return widen_for_python(df.select(id_col, payload_col)).mapInPandas(gen, schema=schema)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n_bytes: int = 64,
) -> DataFrame:
    """'Frame sampling' stub: chunk the payload every N bytes and emit one
    row per chunk with a chunk digest — the schema/fan-out shape of video
    frame extraction (explode multiplies rows; partition accordingly)."""
    import volga_spark.operators.multimodal as _self

    register_by_value(_self)
    schema = f"{id_col} bigint, frame_no int, frame_md5 string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, digests = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                for fno, off in enumerate(range(0, len(raw), every_n_bytes)):
                    ids.append(i)
                    nos.append(fno)
                    digests.append(hashlib.md5(raw[off : off + every_n_bytes]).hexdigest())
            yield pd.DataFrame({id_col: ids, "frame_no": nos, "frame_md5": digests})

    return widen_for_python(df.select(id_col, payload_col)).mapInPandas(gen, schema=schema)
