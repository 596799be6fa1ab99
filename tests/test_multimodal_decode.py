"""r10: the from-scratch image/audio decoders (PNG/BMP/PPM/WAV).

Each test ENCODES a random array into the container from the format spec
(independent code written forward from the spec, not shared with the
decoder) and asserts the decode round-trips bit-exactly — including every
PNG filter type, BMP padding/orientation, PPM header comments, and WAV
sample widths."""

from __future__ import annotations

import io
import random
import struct
import wave
import zlib

import numpy as np
import pytest

from volga_spark.operators.multimodal import (
    decode_bmp,
    decode_image,
    decode_png,
    decode_ppm,
    decode_wav,
)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _encode_png(img: np.ndarray, filters: list[int]) -> bytes:
    """Forward PNG encoder from RFC 2083: applies the REQUESTED filter type
    per scanline (the decoder must invert all five)."""
    if img.ndim == 2:
        h, w = img.shape
        ch, ctype = 1, 0
    else:
        h, w, ch = img.shape
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = img.reshape(h, w * ch).astype(np.int64)
    stride = w * ch
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = filters[y % len(filters)]
        line = flat[y]
        if f == 0:
            enc = line
        elif f == 1:
            left = np.concatenate([np.zeros(ch, dtype=np.int64), line[:-ch]])
            enc = (line - left) % 256
        elif f == 2:
            enc = (line - prev) % 256
        elif f == 3:
            left = np.concatenate([np.zeros(ch, dtype=np.int64), line[:-ch]])
            enc = (line - (left + prev) // 2) % 256
        else:  # Paeth
            enc = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (line[x] - pred) % 256
        out.append(f)
        out.extend(enc.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_all_filters(ch):
    rng = np.random.default_rng(5 + ch)
    shape = (11, 7) if ch == 1 else (11, 7, ch)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    # cycle through every filter type across scanlines
    payload = _encode_png(img, filters=[0, 1, 2, 3, 4])
    got = decode_png(payload)
    assert got.shape == img.shape
    assert (got == img).all()
    # dispatch through the public entry too
    assert (decode_image(payload) == img).all()


def test_png_single_filter_each():
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    for f in range(5):
        got = decode_png(_encode_png(img, filters=[f]))
        assert (got == img).all(), f"filter {f}"


def _encode_bmp(img: np.ndarray, top_down: bool) -> bytes:
    h, w, ch = img.shape
    row = w * ch
    pad = (-row) % 4
    order = [2, 1, 0] if ch == 3 else [2, 1, 0, 3]  # RGB(A) -> BGR(A)
    px = img[:, :, order]
    rows = px if top_down else px[::-1]
    body = b"".join(
        rows[y].tobytes() + b"\x00" * pad for y in range(h)
    )
    dib = struct.pack(
        "<IiiHHIIiiII",
        40, w, (-h if top_down else h), 1, ch * 8, 0, len(body), 2835, 2835,
        0, 0,
    )
    off = 14 + len(dib)
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return hdr + dib + body


@pytest.mark.parametrize("ch", [3, 4])
@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_roundtrip(ch, top_down):
    rng = np.random.default_rng(3 * ch + top_down)
    img = rng.integers(0, 256, size=(5, 7, ch), dtype=np.uint8)
    payload = _encode_bmp(img, top_down)
    got = decode_bmp(payload)
    assert (got == img).all()
    assert (decode_image(payload) == img).all()


def test_ppm_roundtrip_with_comments():
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    payload = (
        b"P6\n# a comment\n6 4\n# another\n255\n" + img.tobytes()
    )
    assert (decode_ppm(payload) == img).all()
    grey = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    assert (decode_ppm(b"P5 6 4 255\n" + grey.tobytes()) == grey).all()


@pytest.mark.parametrize("width,dtype", [(1, np.uint8), (2, "<i2"), (4, "<i4")])
def test_wav_roundtrip(width, dtype):
    rng = np.random.default_rng(31 + width)
    info = np.iinfo(np.dtype(dtype))
    samples = rng.integers(
        info.min, info.max + 1, size=(50, 2)
    ).astype(dtype)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(width)
        wf.setframerate(16000)
        wf.writeframes(samples.tobytes())
    got, rate = decode_wav(buf.getvalue())
    assert rate == 16000
    assert (got == samples).all()


def test_entropy_coded_formats_still_gate():
    # r11: baseline JPEG and GIF now decode for real (test_jpeg_decode.py,
    # test_gif_decode.py); WebP remains the honestly-gated entropy codec
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"\x00" * 32)


def test_extract_features_with_real_decoder(spark):
    """The Arrow-batched mapInPandas path runs the REAL decoder end-to-end:
    per-doc PNG payloads decode inside executors and the mean pixel value
    comes back exactly."""
    from pyspark.sql import functions as F

    from volga_spark.operators.multimodal import extract_features

    rng = random.Random(41)
    rows = []
    imgs = {}
    for doc_id in range(8):
        arr = np.array(
            [
                [[rng.randrange(256) for _ in range(3)] for _ in range(5)]
                for _ in range(4)
            ],
            dtype=np.uint8,
        )
        imgs[doc_id] = arr
        rows.append((doc_id, bytearray(_encode_png(arr, filters=[0, 1, 2, 3, 4]))))
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")

    def mean_pixels(payload: bytes) -> np.ndarray:
        img = decode_image(payload)
        return img.reshape(-1, img.shape[-1]).mean(axis=0)

    out = {
        r["doc_id"]: r["features"]
        for r in extract_features(df, decoder=mean_pixels, n_features=3).collect()
    }
    for doc_id, arr in imgs.items():
        want = arr.reshape(-1, 3).mean(axis=0)
        assert np.allclose(out[doc_id], want), doc_id
