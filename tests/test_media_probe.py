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


def _wav(ch, rate, bits, n_samples):
    data_len = n_samples * ch * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", data_len) + b"\x00" * data_len
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _flac(ch, rate, total):
    # fLaC + STREAMINFO block (type 0, length 34): 10 bytes block/frame
    # sizes, then the packed 64-bit rate(20)/channels(3)/bps(5)/total(36)
    # field, then the md5 signature
    si = b"\x00" * 10
    si += bytes(
        [
            (rate >> 12) & 0xFF,
            (rate >> 4) & 0xFF,
            ((rate & 0x0F) << 4) | ((ch - 1) << 1),  # + bps high bit (0)
            (total >> 32) & 0x0F,  # bps low nibble (0) | total bits 35..32
        ]
    )
    si += struct.pack(">I", total & 0xFFFFFFFF)  # total bits 31..0
    block = b"\x00" + struct.pack(">I", 34)[1:] + si + b"\x00" * (34 - len(si))
    return b"fLaC" + block


def _mp3_id3(rate_code=0):
    tag = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10  # syncsafe size 10
    frame = bytes([0xFF, 0xFB, 0x90 | (rate_code << 2), 0xC0])  # stereo→code 3? hdr
    return tag + frame + b"\x00" * 16


def _mp4(duration, timescale):
    mvhd = (
        struct.pack(">I", 108)
        + b"mvhd"
        + b"\x00\x00\x00\x00"  # version 0 + flags
        + b"\x00" * 8  # ctime/mtime
        + struct.pack(">II", timescale, duration)
        + b"\x00" * 80
    )
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00\x00\x02\x00"
    return ftyp + moov


def test_probe_audio_headers():
    from volga_spark.operators.multimodal import probe_audio

    fmt, ch, rate, dur = probe_audio(_wav(2, 44100, 16, 44100))
    assert (fmt, ch, rate) == ("wav", 2, 44100)
    assert abs(dur - 1.0) < 1e-9

    fmt, ch, rate, dur = probe_audio(_flac(2, 48000, 96000))
    assert (fmt, ch, rate) == ("flac", 2, 48000)
    assert abs(dur - 2.0) < 1e-9

    fmt, ch, rate, dur = probe_audio(_mp3_id3())
    assert fmt == "mp3" and rate == 44100 and dur is None

    assert probe_audio(b"OggS\x00junk")[0] == "ogg"
    assert probe_audio(b"nonsense") == (None, None, None, None)
    assert probe_audio(b"RIFF\x00\x00\x00\x00WAVE")[0] == "wav"  # truncated


def test_probe_video_headers():
    from volga_spark.operators.multimodal import probe_video

    fmt, dur = probe_video(_mp4(3000, 1000))
    assert fmt == "mp4" and abs(dur - 3.0) < 1e-9
    assert probe_video(b"\x1a\x45\xdf\xa3rest") == ("webm", None)
    assert probe_video(b"RIFF\x00\x00\x00\x00AVI junk") == ("avi", None)
    assert probe_video(b"plain text") == (None, None)
    # malformed box size must not loop forever
    bad = struct.pack(">I", 16) + b"ftyp" + b"isom\x00\x00\x02\x00" + struct.pack(">I", 2) + b"moov"
    assert probe_video(bad) == ("mp4", None)
