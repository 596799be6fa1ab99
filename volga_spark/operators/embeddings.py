"""Embedding-column utilities: normalize, truncate, int8-quantize.

The storage-side embedding transforms a 100 TB vector pipeline applies
before indexing (`operators/similarity.py` consumes the results):

- **l2_normalize** — unit-length vectors turn cosine into dot product;
  every downstream scorer here assumes it.
- **matryoshka_truncate** (Kusupati et al. 2022, "Matryoshka
  Representation Learning") — MRL-trained embeddings keep most quality in
  their prefix, so storing/searching dim 64 of 768 is a 12× I/O cut; the
  truncated prefix must be re-normalized (slice THEN normalize — the
  prefix of a unit vector is not unit).
- **int8 quantization** — symmetric per-vector scaling to [-127, 127]
  (the standard vector-DB storage codec; 4× smaller than float32, ~1%
  recall cost at search time). Stored as (scale, array<tinyint>); the
  paired `int8_dequantize` reconstructs within one quantization step.

All pure native Column expressions (`transform`/`aggregate` HOFs) —
map-side, fused into the scan, no Python. These are column codecs, not
pairwise math: the quadratic-context HOF caveat (SCALING.md) does not
apply, since each row is touched once.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def l2_norm(vec: str | Column) -> Column:
    v = _col(vec)
    return F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def l2_normalize(vec: str | Column) -> Column:
    """vec / ||vec||; the zero vector stays zero (no NaNs downstream)."""
    v = _col(vec)
    n = l2_norm(v)
    return F.when(n == 0.0, v).otherwise(
        F.transform(v, lambda x: x / n)
    )


def matryoshka_truncate(vec: str | Column, dim: int) -> Column:
    """First `dim` components, re-normalized to unit length."""
    return l2_normalize(F.slice(_col(vec), 1, dim))


def int8_quantize(vec: str | Column) -> Column:
    """struct<scale: double, q: array<tinyint>> with
    q[i] = round(vec[i] / scale), scale = max|vec| / 127.

    Symmetric per-vector scaling: no zero-point, sign preserved, the
    largest component maps to ±127 exactly. An all-zero vector gets
    scale 0 and zero codes.
    """
    v = _col(vec)
    amax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = amax / F.lit(127.0)
    q = F.when(scale == 0.0, F.transform(v, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(v, lambda x: F.round(x / scale).cast("tinyint"))
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def int8_dequantize(quant: str | Column) -> Column:
    """array<double> reconstruction: q[i] * scale."""
    s = _col(quant)
    return F.transform(
        s["q"], lambda x: x.cast("double") * s["scale"]
    )
