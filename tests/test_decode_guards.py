"""r11 advisor fixes, pinned: decompression-bomb caps fire BEFORE
allocation, JPEG fill bytes (T.81 B.1.1.2) are legal, and GIF first
frames composite onto the logical screen so pixels agree with
probe_image's dimensions."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from volga_spark.operators.multimodal import (
    MAX_DECODE_PIXELS,
    decode_gif,
    decode_image,
    decode_jpeg,
    decode_png,
    probe_image,
)


def _png_chunks(*chunks: tuple[bytes, bytes]) -> bytes:
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    for typ, data in chunks:
        out += len(data).to_bytes(4, "big") + typ + data + b"\x00\x00\x00\x00"
    return bytes(out)


def _ihdr(w: int, h: int, depth: int = 8, ctype: int = 0) -> bytes:
    return (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([depth, ctype, 0, 0, 0])
    )


def test_jpeg_declared_bomb_rejected_before_allocation():
    """A ~20-byte payload declaring 65535x65535 in SOF would allocate
    ~34 GB of coefficient state — the cap must raise ValueError (the
    quarantinable class) at the SOF parse, before any allocation."""
    sof = bytes([8]) + (65535).to_bytes(2, "big") + (65535).to_bytes(2, "big")
    sof += bytes([1, 1, 0x11, 0])  # 1 component, 1x1 sampling, qtable 0
    payload = b"\xff\xd8\xff\xc0" + (2 + len(sof)).to_bytes(2, "big") + sof
    with pytest.raises(ValueError, match="decode cap"):
        decode_jpeg(payload)


def test_png_declared_bomb_rejected():
    payload = _png_chunks((b"IHDR", _ihdr(60_000, 60_000)))
    with pytest.raises(ValueError, match="decode cap"):
        decode_png(payload)


def test_png_zlib_bomb_bounded_by_declared_geometry():
    """A 2x2 greyscale PNG whose IDAT inflates to 10 MB must fail as a
    length mismatch with the inflate BOUNDED at the declared raster size
    (max_length), never materializing the bomb."""
    bomb = zlib.compress(b"\x00" * 10_000_000)
    payload = _png_chunks(
        (b"IHDR", _ihdr(2, 2)), (b"IDAT", bomb), (b"IEND", b"")
    )
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(payload)


def test_cap_is_generous_for_real_media():
    # sanity: the cap clears 8K video frames (33 MP) with headroom
    assert MAX_DECODE_PIXELS >= 7680 * 4320 * 2


def test_jpeg_fill_bytes_before_markers_decode_identically():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker;
    some encoders pad with them. Insert fill runs before a table marker
    AND before EOI (inside the entropy region) — pixels must not change."""
    from test_jpeg_decode import encode_jpeg

    rng = np.random.default_rng(11)
    plane = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    payload, _ = encode_jpeg([plane.astype(np.float64)], [(1, 1)], 16, 16)
    base = decode_jpeg(payload)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    padded = (
        payload[:2]
        + b"\xff\xff"  # fill before the first table marker's id
        + payload[3:-2]
        + b"\xff\xff\xff\xd9"  # fill run before EOI, after entropy data
    )
    np.testing.assert_array_equal(decode_jpeg(padded), base)


def _gif_bytes(screen, frame, offset, bg_idx, palette, plane):
    from test_gif_decode import _LzwWriter

    sw, sh = screen
    w, h = frame
    left, top = offset
    bits = max(1, int(len(palette) - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += sw.to_bytes(2, "little") + sh.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), bg_idx, 0])
    out += palette.tobytes()
    out += b"\x2c"
    out += left.to_bytes(2, "little") + top.to_bytes(2, "little")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0])  # no local table, not interlaced
    min_code = max(2, bits)
    out += bytes([min_code])
    data = _LzwWriter(min_code).compress(plane.reshape(-1).tolist())
    out += bytes([len(data)]) + data + b"\x00\x3b"
    return bytes(out)


def test_gif_offset_frame_composites_onto_logical_screen():
    palette = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250], [9, 9, 9]], np.uint8)
    plane = np.array([[2, 3, 2], [3, 2, 3]], np.uint8)  # 3x2 frame
    payload = _gif_bytes((6, 5), (3, 2), (2, 1), 1, palette, plane)
    img = decode_gif(payload)
    fmt, pw, ph = probe_image(payload)
    assert fmt == "gif" and (ph, pw) == img.shape[:2] == (5, 6)
    np.testing.assert_array_equal(img[1:3, 2:5], palette[plane])
    np.testing.assert_array_equal(img[0], np.tile(palette[1], (6, 1)))
    # dispatch through decode_image agrees
    np.testing.assert_array_equal(decode_image(payload), img)


def test_gif_frame_past_logical_screen_raises():
    palette = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    plane = np.zeros((2, 3), np.uint8)
    payload = _gif_bytes((4, 2), (3, 2), (2, 1), 0, palette, plane)
    with pytest.raises(ValueError, match="logical screen"):
        decode_gif(payload)
