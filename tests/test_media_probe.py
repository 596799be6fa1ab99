"""Header-level image probing: crafted minimal containers for all five
formats, truncation/garbage robustness, and the Spark census pass."""

from __future__ import annotations

import struct
import zlib

from volga_spark.operators.multimodal import probe_image, probe_media


def _png(w, h):
    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def _bmp(w, h):
    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h) + b"\x00" * 10


def _jpeg(w, h):
    # SOI + APP0 stub + SOF0 frame header
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _webp_vp8x(w, h):
    # 4-byte flags+reserved then 3+3 bytes canvas (w-1, h-1), little-endian
    payload = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 4 + struct.pack(
        "<I", w - 1
    )[:3] + struct.pack("<I", h - 1)[:3]
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload


def _webp_vp8l(w, h):
    bits = (w - 1) | ((h - 1) << 14)
    payload = b"VP8L" + struct.pack("<I", 5) + b"\x2f" + struct.pack("<I", bits)
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload


def test_probe_known_headers():
    assert probe_image(_png(640, 480)) == ("png", 640, 480)
    assert probe_image(_gif(13, 37)) == ("gif", 13, 37)
    assert probe_image(_bmp(800, 600)) == ("bmp", 800, 600)
    assert probe_image(_bmp(800, -600)) == ("bmp", 800, 600)  # top-down BMP
    assert probe_image(_jpeg(1920, 1080)) == ("jpeg", 1920, 1080)
    assert probe_image(_webp_vp8x(320, 240)) == ("webp", 320, 240)
    assert probe_image(_webp_vp8l(100, 50)) == ("webp", 100, 50)


def test_probe_garbage_and_truncation():
    assert probe_image(b"") == (None, None, None)
    assert probe_image(b"not an image at all") == (None, None, None)
    assert probe_image(_png(640, 480)[:10]) == (None, None, None)  # too short
    # JPEG with no SOF before EOF: format detected, dims unknown
    assert probe_image(b"\xff\xd8\xff\xd9") == ("jpeg", None, None)
    # random high bytes that start like a marker stream must not loop/crash
    assert probe_image(b"\xff\xd8" + b"\xff" * 50)[0] == "jpeg"


def test_probe_media_census(spark):
    rows = [
        (1, bytearray(_png(640, 480))),
        (2, bytearray(_jpeg(32, 16))),
        (3, bytearray(b"garbage bytes")),
        (4, bytearray(_gif(5, 6))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r["doc_id"]: (r["format"], r["width"], r["height"])
           for r in probe_media(df).collect()}
    assert got[1] == ("png", 640, 480)
    assert got[2] == ("jpeg", 32, 16)
    assert got[3] == (None, None, None)
    assert got[4] == ("gif", 5, 6)
