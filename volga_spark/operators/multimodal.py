"""Multimodal column plumbing (image/audio/video as opaque binary).

The Spark-side machinery is real and tested: binary payload columns with
typed metadata, Arrow-batched ``mapInPandas`` decode/feature/resize stages
with explicit schemas and partition-size control. Pixel/sample decode is
REAL for every format numpy + the stdlib can honestly express — PNG
(zlib inflate + spec unfilter), uncompressed BMP, binary PPM/PGM, PCM
WAV (r10; round-trip pinned by tests/test_multimodal_decode.py), and
baseline sequential JPEG (r11: T.81 Huffman + dequant + IDCT + YCbCr,
pinned against an independent forward encoder in tests/test_jpeg_decode.py),
and GIF (r11: from-scratch LZW + palettes + interlacing,
tests/test_gif_decode.py). The residual codecs (progressive JPEG, WebP,
video) remain behind the injectable ``decoder=`` gate because no
image/audio libraries exist in this image — swap in PIL/ffmpeg in
production; nothing else changes.

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


# Decompression-bomb guard (r11 advisor): a few-hundred-byte payload can
# DECLARE an enormous raster (65535×65535 SOF ≈ 34 GB of JPEG coefficient
# state; a small zlib-bomb PNG inflates unbounded) — one adversarial row
# would then kill the whole task with MemoryError, which is not a
# quarantinable decode error. Every decoder validates declared dimensions
# against this cap BEFORE allocating and raises ValueError (quarantined).
# Module attribute, overridable for genuinely huge media.
MAX_DECODE_PIXELS = 100_000_000


def _check_raster(w: int, h: int, fmt: str) -> None:
    if w < 0 or h < 0 or w * h > MAX_DECODE_PIXELS:
        raise ValueError(
            f"{fmt} declares a {w}x{h} raster past the "
            f"{MAX_DECODE_PIXELS}-pixel decode cap"
        )


def decode_image(payload: bytes) -> "np.ndarray":
    """REAL pixel decode for the formats pure numpy/stdlib can express —
    PNG (zlib inflate + per-spec scanline unfilter), baseline sequential
    JPEG (r11: Huffman + dequant + IDCT + YCbCr, from the T.81 spec), BMP
    (uncompressed BI_RGB), and PPM/PGM binary — returning an (h, w[, c])
    uint8 array, plus GIF via the from-scratch LZW decoder. The remaining
    gated formats (progressive JPEG, WebP, video) raise the injectable
    NotImplementedError: their codecs need PIL/opencv/ffmpeg, absent here;
    swap ``decoder=`` in :func:`extract_features` for them."""
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(b)
    if b[:2] == b"\xff\xd8":
        return decode_jpeg(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:2] in (b"P5", b"P6"):
        return decode_ppm(b)
    raise NotImplementedError(
        "decoding this format requires PIL/opencv — not present in this "
        "image; inject decoder= into extract_features instead"
    )


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters (None/Sub/Up/Average/Paeth) over one
    (sub-)image: `raw` is h*(stride+1) filter-prefixed bytes; `bpp` is the
    FILTER left-offset in bytes (channels x bytes-per-sample — PNG filters
    operate on bytes, whatever the bit depth). Returns (h, stride) uint8."""
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    lines = raw[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f, line = int(filters[y]), lines[y]
        if f == 0:
            rec = line
        elif f == 1:  # Sub: left-dependence — per-byte-column cumsum mod 256
            rec = line.reshape(-1, bpp).cumsum(axis=0) % 256
            rec = rec.reshape(stride)
        elif f == 2:  # Up
            rec = (line + prev) % 256
        elif f == 3:  # Average
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (line[x] + (left + prev[x]) // 2) % 256
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                bb = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                rec[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"PNG filter type {f}")
        out[y] = rec
        prev = out[y]
    return out.astype(np.uint8)


_PNG_ADAM7 = [  # (x0, y0, dx, dy) per pass, RFC 2083 §2.6
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def decode_png(b: bytes) -> np.ndarray:
    """From-scratch PNG decoder (RFC 2083): greyscale (1/2/4/8/16-bit),
    RGB / grey+alpha / RGBA (8/16-bit), and PLTE palette images
    (1/2/4/8-bit indices → (h, w, 3) RGB), non-interlaced or Adam7.
    Chunk walk → concatenated IDAT → zlib inflate → per-scanline unfilter
    (byte-wise, per spec, shared by every depth — sub-byte rows unfilter
    on PACKED bytes with a 1-byte offset, then unpack MSB-first) →
    16-bit samples reassembled big-endian. Returns uint8 (or uint16 at
    depth 16), shape (h, w[, c]); greyscale sub-byte returns RAW sample
    values 0..2^d−1 (lossless, no 255-rescale). tRNS alpha is ignored.
    Sub/Up are vectorized; Average/Paeth carry the spec\'s left-dependence
    per pixel — correctness is the contract here, a production hot path
    injects a native codec via ``decoder=``."""
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    i, w = 8, None
    idat = []
    plte = None
    while i + 8 <= len(b):
        ln = int.from_bytes(b[i : i + 4], "big")
        typ = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + ln]
        if typ == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, ctype, comp, filt, interlace = data[8:13]
            if comp or filt:
                raise ValueError("nonstandard PNG compression/filter method")
            ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
            if ch is None:
                raise NotImplementedError(f"PNG color type {ctype}")
            ok_depths = {
                0: (1, 2, 4, 8, 16),  # greyscale
                2: (8, 16),  # RGB
                3: (1, 2, 4, 8),  # palette indices
                4: (8, 16),  # grey+alpha
                6: (8, 16),  # RGBA
            }[ctype]
            if depth not in ok_depths:
                raise NotImplementedError(
                    f"PNG bit depth {depth} for color type {ctype}"
                )
            _check_raster(w, h, "PNG")
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        i += 12 + ln  # length + type + data + crc
    if w is None:
        raise ValueError("PNG missing IHDR")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    import zlib

    # filter left-offset in bytes; sub-byte depths round up to 1 (spec 6.2)
    bpp = max(1, ch * depth // 8)

    def pass_stride(pw: int) -> int:
        return -(-pw * ch * depth // 8)  # packed bytes per scanline

    # bound the inflate by the EXACT raw size the declared geometry needs
    # (zlib-bomb guard — max_length caps the output allocation; anything
    # longer is a malformed payload, reported like any length mismatch)
    if not interlace:
        expected = h * (pass_stride(w) + 1)
    else:
        expected = 0
        for x0, y0, dx, dy in _PNG_ADAM7:
            pw = -(-(w - x0) // dx) if w > x0 else 0
            ph = -(-(h - y0) // dy) if h > y0 else 0
            if pw and ph:
                expected += ph * (pass_stride(pw) + 1)
    dec = zlib.decompressobj()
    inflated = dec.decompress(b"".join(idat), expected + 1)
    if len(inflated) > expected:
        raise ValueError("PNG data length mismatch")
    raw = np.frombuffer(inflated, dtype=np.uint8)

    def to_samples(bytes2d: np.ndarray, ph: int, pw: int) -> np.ndarray:
        if depth == 8:
            return bytes2d.reshape(ph, pw, ch)
        if depth == 16:
            u16 = bytes2d.reshape(ph, pw, ch, 2).astype(np.uint16)
            return (u16[..., 0] << 8) | u16[..., 1]  # network byte order
        # sub-byte: unpack MSB-first bit groups per scanline, trim pad bits
        bits = np.unpackbits(bytes2d, axis=1)[:, : pw * depth]
        groups = bits.reshape(ph, pw, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        return (groups * weights).sum(axis=2, dtype=np.uint16).astype(
            np.uint8
        )[:, :, None]

    if not interlace:
        stride = pass_stride(w)
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG data length mismatch")
        img = to_samples(_png_unfilter(raw, h, stride, bpp), h, w)
    elif interlace == 1:  # Adam7
        dtype = np.uint16 if depth == 16 else np.uint8
        img = np.zeros((h, w, ch), dtype=dtype)
        off = 0
        for x0, y0, dx, dy in _PNG_ADAM7:
            pw = -(-(w - x0) // dx) if w > x0 else 0
            ph = -(-(h - y0) // dy) if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            stride = pass_stride(pw)
            need = ph * (stride + 1)
            if off + need > len(raw):
                raise ValueError("PNG data length mismatch")
            sub = _png_unfilter(raw[off : off + need], ph, stride, bpp)
            img[y0::dy, x0::dx] = to_samples(sub, ph, pw)
            off += need
        if off != len(raw):
            raise ValueError("PNG data length mismatch")
    else:
        raise ValueError(f"PNG interlace method {interlace}")
    if ctype == 3:
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        return plte[idx]  # (h, w, 3)
    return img[:, :, 0] if ch == 1 else img


def decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed BI_RGB BMP, 24/32-bit: (h, w, 3|4) uint8, rows
    un-padded and flipped per the bottom-up convention (negative height =
    top-down), BGR(A) reordered to RGB(A)."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if comp != 0:
        raise NotImplementedError(f"BMP compression {comp} (only BI_RGB)")
    if bpp not in (24, 32):
        raise NotImplementedError(f"BMP {bpp}bpp (only 24/32)")
    ch = bpp // 8
    top_down = h < 0
    h = abs(h)
    _check_raster(w, h, "BMP")
    row_bytes = (w * ch + 3) & ~3  # rows pad to 4 bytes
    px = np.frombuffer(b, dtype=np.uint8, count=h * row_bytes, offset=off)
    px = px.reshape(h, row_bytes)[:, : w * ch].reshape(h, w, ch)
    if not top_down:
        px = px[::-1]
    # BGR(A) -> RGB(A)
    order = [2, 1, 0] if ch == 3 else [2, 1, 0, 3]
    return np.ascontiguousarray(px[:, :, order])


def decode_ppm(b: bytes) -> np.ndarray:
    """Binary PPM (P6, (h, w, 3)) / PGM (P5, (h, w)), maxval ≤ 255;
    header tokens may be separated by whitespace and # comments."""
    if b[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM payload")
    toks, i = [], 2
    while len(toks) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if i < len(b) and b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        toks.append(int(b[i:j]))
        i = j
    w, h, maxval = toks
    _check_raster(w, h, "PPM")
    if maxval > 255:
        raise NotImplementedError("16-bit PPM")
    ch = 3 if b[:2] == b"P6" else 1
    # the spec mandates a SINGLE whitespace byte after maxval; tolerate the
    # common nonconforming "\r\n" — but disambiguate by LENGTH (r11, advisor):
    # a conforming lone-'\r' separator whose first raster byte is 0x0A also
    # looks like "\r\n", and a blind 2-byte skip would shift the raster. A
    # 1-byte skip that leaves exactly h*w*ch bytes is the conforming read.
    need = h * w * ch
    i += 2 if (b[i : i + 2] == b"\r\n" and len(b) - (i + 1) != need) else 1
    px = np.frombuffer(b, dtype=np.uint8, count=h * w * ch, offset=i)
    return px.reshape(h, w, 3) if ch == 3 else px.reshape(h, w)


# --- GIF (87a/89a), from scratch ---------------------------------------------
#
# r11: GIF's "entropy coding" is LZW — table-driven, no transform math, so a
# from-scratch decoder is honestly expressible in pure Python/numpy. Scope:
# the FIRST image frame, decoded to an (h, w, 3) uint8 RGB array over its
# own rectangle (animation compositing/disposal is a player concern, not a
# pixel-decode one). Global + local color tables, interlacing, and the
# GCE transparency index (transparent pixels take the palette color —
# callers needing alpha read the index plane via decode_gif(..., rgb=False)).
# Round-trip pinned against an independent spec-forward LZW compressor in
# tests/test_gif_decode.py.


def _gif_lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    """GIF LZW (89a spec appendix F): variable code width from
    min_code_size+1, CLEAR resets the table, dict caps at 4096 entries."""
    clear = 1 << min_code_size
    end = clear + 1

    def fresh():
        return {i: (i,) for i in range(clear)}

    table = fresh()
    width = min_code_size + 1
    next_code = end + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits  # LSB-first bit packing
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = fresh()
                width = min_code_size + 1
                next_code = end + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + (prev[0],)  # the KwKwK case
            else:
                raise ValueError("GIF LZW code out of range")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table[next_code] = prev + (entry[0],)
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= n_pixels:
                return out
    return out


def decode_gif(payload: bytes, rgb: bool = True) -> np.ndarray:
    """From-scratch GIF decoder: first frame → uint8 RGB (or the raw
    palette-index plane with ``rgb=False``). Handles 87a/89a, global and
    local color tables, interlacing, and sub-block chained LZW data.

    The first frame is COMPOSITED onto the logical screen (r11 advisor):
    a frame whose image descriptor carries a left/top offset or smaller
    dims is placed at its offset on a background-color canvas, so the
    returned shape always matches :func:`probe_image`'s (logical-screen)
    dimensions."""
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw = int.from_bytes(b[6:8], "little")
    sh = int.from_bytes(b[8:10], "little")
    _check_raster(sw, sh, "GIF")
    flags = b[10]
    bg_idx = b[11]
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b, np.uint8, n * 3, i).reshape(n, 3)
        i += n * 3
    while i < len(b):
        block = b[i]
        if block == 0x21:  # extension: label + sub-block chain
            i += 2
            while b[i]:
                i += 1 + b[i]
            i += 1
        elif block == 0x2C:  # image descriptor
            left = int.from_bytes(b[i + 1 : i + 3], "little")
            top = int.from_bytes(b[i + 3 : i + 5], "little")
            w = int.from_bytes(b[i + 5 : i + 7], "little")
            h = int.from_bytes(b[i + 7 : i + 9], "little")
            _check_raster(w, h, "GIF")
            if left + w > sw or top + h > sh:
                raise ValueError("GIF frame exceeds the logical screen")
            iflags = b[i + 9]
            i += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(b, np.uint8, n * 3, i).reshape(n, 3)
                i += n * 3
            min_code = b[i]
            i += 1
            chunks = []
            while b[i]:
                chunks.append(b[i + 1 : i + 1 + b[i]])
                i += 1 + b[i]
            idx = _gif_lzw_decode(min_code, b"".join(chunks), h * w)
            if len(idx) < h * w:
                raise ValueError("GIF LZW stream truncated")
            plane = np.array(idx[: h * w], dtype=np.uint8).reshape(h, w)
            if iflags & 0x40:  # interlaced: 4-pass row shuffle
                out_rows = np.empty((h, w), dtype=np.uint8)
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                out_rows[order] = plane
                plane = out_rows
            if (left, top) != (0, 0) or (w, h) != (sw, sh):
                # composite onto the logical screen: per GIF89a the header
                # background color index is defined against the GLOBAL
                # color table only — when the frame brought its own local
                # palette the index would land on an unrelated color, so
                # fill with 0 instead (r13 advisor)
                fill = (
                    bg_idx
                    if gct is not None and pal is gct and bg_idx < len(pal)
                    else 0
                )
                canvas = np.full((sh, sw), fill, dtype=np.uint8)
                canvas[top : top + h, left : left + w] = plane
                plane = canvas
            if not rgb:
                return plane
            if pal is None:
                raise ValueError("GIF image has no color table")
            return pal[plane]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF has no image frame")


# --- JPEG (ITU-T T.81 / ISO 10918-1), from scratch ---------------------------
#
# r11: baseline sequential (SOF0/SOF1) AND progressive (SOF2 — spectral
# selection + successive approximation, Annex G): 8-bit samples, Huffman
# coding, restart intervals, grayscale or YCbCr with any divisible h/v
# sampling factors, single-component scans non-interleaved per spec.
# Arithmetic coding and lossless/differential modes stay gated. The
# lossless layers are pinned bit-exactly against independent spec-forward
# test encoders: baseline entropy+dequant in tests/test_jpeg_decode.py;
# progressive scan convergence (the decoder's final coefficient state must
# equal the full-precision quantized array after all scans) in
# tests/test_jpeg_progressive.py, with baseline==progressive pixel
# cross-checks. Honest caveat for progressive: encoder and decoder are
# both written here (no codec library exists to cross-validate against),
# so the pin is convergence-to-the-independent-coefficient-state plus the
# baseline cross-check, not a third-party byte stream. IDCT/color pinned
# against a direct-form reconstruction. Reference parity target: the
# reference's media ingestion treats images as opaque payloads + metadata;
# this closes the decode gap for the dominant crawl format without PIL.

_JPEG_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)  # index k in zigzag scan order -> position in the natural (row-major) 8x8


def _jpeg_idct_matrix() -> np.ndarray:
    """A[u, x] = alpha(u)/2 * cos((2x+1) u pi / 16) — spec A.3.3; the 2-D
    IDCT of block F is A.T @ F @ A."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    a = np.cos((2 * x + 1) * u * np.pi / 16.0) / 2.0
    a[0, :] *= 1.0 / np.sqrt(2.0)
    return a


class _JpegHuffTable:
    """Canonical Huffman table in the spec's DECODE form (F.2.2.3)."""

    def __init__(self, counts: list[int], values: bytes) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.values = values
        code, k = 0, 0
        for ln in range(1, 17):
            n = counts[ln - 1]
            self.valptr[ln] = k
            self.mincode[ln] = code
            self.maxcode[ln] = code + n - 1 if n else -1
            code = (code + n) << 1
            k += n


class _JpegBitReader:
    """MSB-first bit reader over one entropy-coded (restart) segment, with
    the 0xFF 0x00 stuffing already stripped by the caller."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            # past-the-end reads pad with 1s (spec F.2.2.5 handling of the
            # final partial byte / truncated streams fail on table lookup)
            return 1
        v = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return v

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _JpegHuffTable) -> int:
        code, ln = self.read_bit(), 1
        while code > table.maxcode[ln]:
            ln += 1
            if ln > 16:
                raise ValueError("invalid JPEG Huffman code")
            code = (code << 1) | self.read_bit()
        return table.values[table.valptr[ln] + code - table.mincode[ln]]

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.read_bits(s)
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_parse(b: bytes) -> dict:
    """Marker walk + entropy decode for BASELINE (SOF0/SOF1, one scan) and
    PROGRESSIVE (SOF2, multiple scans — spectral selection + successive
    approximation, T.81 Annex G). Returns frame geometry plus, per
    component, the DEQUANTIZED coefficient blocks in natural order, shape
    (blocks_y, blocks_x, 8, 8) float64 — the lossless half of the decoder.

    Coefficients are accumulated across scans in ZIGZAG order (progressive
    bands are zigzag ranges) and mapped to natural order at finalize."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _JpegHuffTable] = {}
    frame = None
    restart_interval = 0
    saw_scan = False
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError("JPEG marker expected")
        # T.81 B.1.1.2: any number of 0xFF FILL bytes may precede a marker
        # id — some encoders pad with them (r11 advisor); skip the run
        while i + 4 <= len(b) and b[i + 1] == 0xFF:
            i += 1
        marker = b[i + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        if seg_len < 2:
            raise ValueError("JPEG marker segment length < 2")
        seg = b[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT (tables kept in zigzag order, like coefz)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(np.int64)
                    j += 64
                else:
                    tbl = np.frombuffer(seg[j : j + 128], dtype=">u2").astype(np.int64)
                    j += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = list(seg[j + 1 : j + 17])
                n = sum(counts)
                huff[(tc, th)] = _JpegHuffTable(counts, seg[j + 17 : j + 17 + n])
                j += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            if seg[0] != 8:
                raise NotImplementedError(f"JPEG precision {seg[0]} (only 8)")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            _check_raster(w, h, "JPEG")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            for c in comps:
                c["bx"] = mcus_x * c["h"]
                c["by"] = mcus_y * c["v"]
                # the non-interleaved (single-component-scan) block grid:
                # ceil over the component's OWN sample dims (spec A.2.2)
                cw = -(-w * c["h"] // hmax)
                chh = -(-h * c["v"] // vmax)
                c["nw8"] = -(-cw // 8)
                c["nh8"] = -(-chh // 8)
                c["coefz"] = np.zeros((c["by"] * c["bx"], 64), dtype=np.int64)
            frame = {
                "h": h,
                "w": w,
                "hmax": hmax,
                "vmax": vmax,
                "mcus_x": mcus_x,
                "mcus_y": mcus_y,
                "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline/extended-sequential/progressive Huffman JPEG "
                "(SOF0/1/2) — arithmetic/lossless/differential need PIL; "
                "inject decoder= instead"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            i = _jpeg_decode_scan(b, i + 2 + seg_len, seg, frame, huff, restart_interval)
            saw_scan = True
            continue
        i += 2 + seg_len
    if frame is None or not saw_scan:
        raise ValueError("JPEG has no SOS scan")
    for c in frame["comps"]:
        table = qt.get(c["tq"])
        if table is None:
            raise ValueError("JPEG frame references a missing quant table")
        deq = np.zeros_like(c["coefz"], dtype=np.float64)
        deq[:, _JPEG_ZIGZAG] = (c["coefz"] * table).astype(np.float64)
        c["deq"] = deq.reshape(c["by"], c["bx"], 8, 8)
        del c["coefz"]
    return {
        "h": frame["h"],
        "w": frame["w"],
        "hmax": frame["hmax"],
        "vmax": frame["vmax"],
        "comps": frame["comps"],
    }


def _jpeg_entropy_segments(b: bytes, start: int) -> tuple[list[bytes], int]:
    """Split one scan's entropy stream into restart segments (0xFF00
    unstuffed). Returns (segments, index of the terminating marker's 0xFF
    or len(b) if the stream is truncated)."""
    segments, seg_start, j = [], start, start
    n = len(b)
    while j < n - 1:
        if b[j] == 0xFF and b[j + 1] != 0x00:
            # a run of 0xFF is FILL preceding the marker id (T.81
            # B.1.1.2) — the entropy segment ends at the FIRST fill byte,
            # the marker id is the first non-FF after the run
            k = j + 1
            while k < n and b[k] == 0xFF:
                k += 1
            if k >= n:
                break  # truncated inside a fill run
            m = b[k]
            if m == 0x00:
                # ...unless the run closes with a stuffed zero: the last
                # 0xFF is entropy data, keep scanning past the pair
                j = k + 1
                continue
            segments.append(b[seg_start:j].replace(b"\xff\x00", b"\xff"))
            if 0xD0 <= m <= 0xD7:
                seg_start = j = k + 1
                continue
            return segments, k - 1
        j += 1
    segments.append(b[seg_start:].replace(b"\xff\x00", b"\xff"))
    return segments, n


def _jpeg_dec_seq_block(reader, coef, dct, act, pred: list) -> None:
    """Sequential (baseline) DC+AC for one block; coef is zigzag-ordered."""
    t = reader.decode_symbol(dct)
    pred[0] += reader.receive_extend(t)
    coef[0] = pred[0]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                break  # EOB
            k += 16  # ZRL
            continue
        k += r
        if k > 63:
            raise ValueError("JPEG AC index overrun")
        coef[k] = reader.receive_extend(s)
        k += 1


def _jpeg_dec_ac_first(reader, coef, act, ss, se, al, eobrun: list) -> None:
    """Progressive AC initial scan for one block (G.2 / spec figure G.3)."""
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode_symbol(act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r < 15:
                eobrun[0] = (1 << r) - 1
                if r:
                    eobrun[0] += reader.read_bits(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG AC index overrun")
        coef[k] = reader.receive_extend(s) << al
        k += 1


def _jpeg_dec_ac_refine(reader, coef, act, ss, se, al, eobrun: list) -> None:
    """Progressive AC refinement for one block: correction bits for
    history-nonzero coefficients, ±1<<Al insertions for newly-significant
    ones, EOB runs carrying the correction bits of the blocks they skip."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(k: int) -> None:
        if reader.read_bit() and not (int(coef[k]) & p1):
            coef[k] += p1 if coef[k] > 0 else m1

    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = reader.decode_symbol(act)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:
                    eobrun[0] = 1 << r
                    if r:
                        eobrun[0] += reader.read_bits(r)
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("JPEG AC refine magnitude != 1")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if coef[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("JPEG AC refine overrun")
                coef[k] = val
            k += 1
    if eobrun[0] > 0:
        while k <= se:  # current block's tail rides the EOB run
            if coef[k] != 0:
                correct(k)
            k += 1
        eobrun[0] -= 1


def _jpeg_decode_scan(
    b: bytes,
    start: int,
    seg: bytes,
    frame: dict,
    huff: dict,
    restart_interval: int,
) -> int:
    """Decode ONE scan's entropy data into the frame's coefficient state;
    returns the stream index just past the scan (at the next marker)."""
    ns = seg[0]
    scomps = []
    by_id = {c["id"]: c for c in frame["comps"]}
    for c in range(ns):
        cid, tt = seg[1 + 2 * c : 3 + 2 * c]
        if cid not in by_id:
            raise ValueError("JPEG scan references unknown component")
        scomps.append((by_id[cid], tt >> 4, tt & 15))
    ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 15
    prog = frame["progressive"]
    if not prog:
        ss, se, ah, al = 0, 63, 0, 0
    if prog and ss == 0 and se != 0:
        raise ValueError("JPEG progressive DC scan must have Se=0")
    if prog and ss > 0 and ns != 1:
        raise ValueError("JPEG progressive AC scan must be single-component")

    tabs = {}
    for comp, tdc, tac in scomps:
        dct = huff.get((0, tdc))
        act = huff.get((1, tac))
        need_dc = ss == 0 and ah == 0
        need_ac = (not prog) or ss > 0
        if (need_dc and dct is None) or (need_ac and act is None):
            raise ValueError("JPEG scan references a missing Huffman table")
        tabs[comp["id"]] = (dct, act)

    mcus_x = frame["mcus_x"]
    if ns == 1:
        # single-component scans are NON-interleaved (spec A.2.2): the
        # unit walk covers the component's own ceil block grid, not the
        # MCU-padded grid
        comp = scomps[0][0]
        uw, uh = comp["nw8"], comp["nh8"]
        units_total = uw * uh
    else:
        units_total = mcus_x * frame["mcus_y"]

    segments, end = _jpeg_entropy_segments(b, start)
    per_seg = restart_interval if restart_interval else units_total
    unit = 0
    for seg_data in segments:
        if unit >= units_total:
            break
        reader = _JpegBitReader(seg_data)
        preds = {c["id"]: [0] for c, _, _ in scomps}
        eobrun = [0]
        for _ in range(min(per_seg, units_total - unit)):
            if ns == 1:
                comp = scomps[0][0]
                row, col = divmod(unit, uw)
                blocks = [(comp, row * comp["bx"] + col)]
            else:
                my, mx = divmod(unit, mcus_x)
                blocks = [
                    (c, (my * c["v"] + vy) * c["bx"] + (mx * c["h"] + vx))
                    for c, _, _ in scomps
                    for vy in range(c["v"])
                    for vx in range(c["h"])
                ]
            for comp, bi in blocks:
                coef = comp["coefz"][bi]
                dct, act = tabs[comp["id"]]
                if not prog:
                    _jpeg_dec_seq_block(reader, coef, dct, act, preds[comp["id"]])
                elif ss == 0:
                    if ah == 0:  # DC initial
                        t = reader.decode_symbol(dct)
                        preds[comp["id"]][0] += reader.receive_extend(t)
                        coef[0] = preds[comp["id"]][0] << al
                    else:  # DC refinement: one bit
                        coef[0] |= reader.read_bit() << al
                elif ah == 0:
                    _jpeg_dec_ac_first(reader, coef, act, ss, se, al, eobrun)
                else:
                    _jpeg_dec_ac_refine(reader, coef, act, ss, se, al, eobrun)
            unit += 1
    if unit != units_total:
        raise ValueError("JPEG truncated entropy stream")
    return end


def jpeg_dequantized_blocks(payload: bytes) -> list[np.ndarray]:
    """The lossless half of the JPEG decode — per-component dequantized
    coefficient blocks (blocks_y, blocks_x, 8, 8) in natural order. Exposed
    so tests can pin Huffman+dequant BIT-exactly against an independent
    forward encoder (the IDCT half is float and pinned separately)."""
    return [c["deq"] for c in _jpeg_parse(bytes(payload))["comps"]]


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential OR progressive JPEG → (h, w) uint8 grayscale or
    (h, w, 3) uint8 RGB (JFIF YCbCr, BT.601 full-range). Chroma upsampling
    is sample replication — the spec leaves the filter to the decoder;
    replication is the deterministic choice tests can reproduce."""
    info = _jpeg_parse(bytes(payload))
    a = _jpeg_idct_matrix()
    h, w = info["h"], info["w"]
    planes = []
    for c in info["comps"]:
        blocks = c["deq"]  # (by, bx, 8, 8)
        pix = a.T @ blocks @ a  # broadcasted 2-D IDCT per block
        by, bx = blocks.shape[:2]
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        if info["hmax"] % c["h"] or info["vmax"] % c["v"]:
            # e.g. 3:2 — integer replication cannot express it; fail loud
            # rather than silently mis-upsample
            raise NotImplementedError(
                "JPEG sampling factors must divide the maxima "
                f"({c['h']}x{c['v']} vs {info['hmax']}x{info['vmax']})"
            )
        sx, sy = info["hmax"] // c["h"], info["vmax"] // c["v"]
        if sx > 1 or sy > 1:
            plane = np.repeat(np.repeat(plane, sy, axis=0), sx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise NotImplementedError(f"JPEG with {len(planes)} components")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, bl], axis=-1)), 0, 255).astype(
        np.uint8
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV → ((n_frames, channels) array, sample_rate). PCM (format 1:
    8-bit unsigned, 16/32-bit signed little-endian) via the stdlib ``wave``
    reader; IEEE float (format 3: float32/float64 — r11) via a direct RIFF
    fmt/data chunk walk, which the stdlib reader rejects."""
    import io
    import wave

    b = bytes(payload)
    try:
        with wave.open(io.BytesIO(b)) as wf:
            ch = wf.getnchannels()
            width = wf.getsampwidth()
            rate = wf.getframerate()
            frames = wf.readframes(wf.getnframes())
        dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(width)
        if dtype is None:
            raise NotImplementedError(f"WAV sample width {width}")
        arr = np.frombuffer(frames, dtype=dtype).reshape(-1, ch)
        return arr, rate
    except (wave.Error, EOFError):
        # EOFError: the stdlib reader hits end-of-stream before the fmt
        # chunk on truncated headers (r12) — fall through to the RIFF
        # chunk walk, which classifies it as a ValueError like every
        # other malformed payload
        pass
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    i, fmt = 12, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        clen = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt ":
            fmt = (
                int.from_bytes(b[i + 8 : i + 10], "little"),  # audio format
                int.from_bytes(b[i + 10 : i + 12], "little"),  # channels
                int.from_bytes(b[i + 12 : i + 16], "little"),  # rate
                int.from_bytes(b[i + 22 : i + 24], "little"),  # bits/sample
            )
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data before fmt")
            afmt, ch, rate, bits = fmt
            data = b[i + 8 : i + 8 + clen]
            if afmt == 3 and bits == 32:
                dtype = np.dtype("<f4")
            elif afmt == 3 and bits == 64:
                dtype = np.dtype("<f8")
            else:
                raise NotImplementedError(
                    f"WAV format {afmt} at {bits} bits (PCM rides the stdlib "
                    "path; only IEEE float is decoded here)"
                )
            return np.frombuffer(data, dtype=dtype).reshape(-1, ch), rate
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    raise ValueError("WAV has no data chunk")


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


# --- Real header probing (no codec libraries needed) ------------------------
#
# Dimensions and format live in the CONTAINER HEADER, not the pixel data —
# parsing them needs byte arithmetic, not a decoder. This is what PIL's lazy
# `Image.open().size` does; implementing it directly removes the "stub" from
# the most common multimodal metadata query (format/size census over a
# crawl) while heavyweight decoding stays injectable.


def probe_image(payload: bytes) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) from container magic + header fields for
    PNG / JPEG / GIF / BMP / WebP (VP8, VP8L, VP8X); (None, None, None) for
    anything unrecognized or truncated. Pure bytes — no codec call."""
    try:
        b = payload
        if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
            # IHDR is the mandatory first chunk: length(4) type(4) data
            if b[12:16] == b"IHDR":
                w = int.from_bytes(b[16:20], "big")
                h = int.from_bytes(b[20:24], "big")
                return "png", w, h
            return "png", None, None
        if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
            return (
                "gif",
                int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"),
            )
        if len(b) >= 26 and b[:2] == b"BM":
            return (
                "bmp",
                int.from_bytes(b[18:22], "little", signed=True),
                abs(int.from_bytes(b[22:26], "little", signed=True)),
            )
        if len(b) >= 2 and b[:2] == b"\xff\xd8":
            # JPEG: walk marker segments to the first SOFn frame header
            i = 2
            sof = {
                0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
            }
            while i + 9 < len(b):
                if b[i] != 0xFF:
                    i += 1
                    continue
                marker = b[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
                if marker in sof:
                    h = int.from_bytes(b[i + 5 : i + 7], "big")
                    w = int.from_bytes(b[i + 7 : i + 9], "big")
                    return "jpeg", w, h
                i += 2 + seg_len
            return "jpeg", None, None
        if len(b) >= 16 and b[:4] == b"RIFF" and b[8:12] == b"WEBP":
            kind = b[12:16]
            if kind == b"VP8X" and len(b) >= 30:
                w = int.from_bytes(b[24:27], "little") + 1
                h = int.from_bytes(b[27:30], "little") + 1
                return "webp", w, h
            if kind == b"VP8L" and len(b) >= 25 and b[20] == 0x2F:
                bits = int.from_bytes(b[21:25], "little")
                return "webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
            if kind == b"VP8 " and len(b) >= 30 and b[23:26] == b"\x9d\x01\x2a":
                return (
                    "webp",
                    int.from_bytes(b[26:28], "little") & 0x3FFF,
                    int.from_bytes(b[28:30], "little") & 0x3FFF,
                )
            return "webp", None, None
        return None, None, None
    except (IndexError, ValueError):
        return None, None, None


def probe_media(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Format/dimension census over a binary corpus: one Arrow-batched pass,
    header bytes only (a real crawl pipeline would read just the first KB per
    object — parquet binary columns hand us the payload either way)."""
    import volga_spark.operators.multimodal as _self

    register_by_value(_self)
    schema = f"{id_col} bigint, format string, width int, height int"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs = [], [], []
            for p in pdf[payload_col]:
                f_, w_, h_ = probe_image(bytes(p))
                fmts.append(f_)
                ws.append(w_)
                hs.append(h_)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "format": fmts, "width": ws, "height": hs}
            )

    return widen_for_python(df.select(id_col, payload_col)).mapInPandas(
        gen, schema=schema
    )


def probe_audio(payload: bytes) -> tuple[str | None, int | None, int | None, float | None]:
    """(format, channels, sample_rate, duration_s) from audio container
    headers: WAV (RIFF fmt/data chunks), FLAC (STREAMINFO), MP3 (first
    MPEG-1 Layer III frame header; duration unknowable without a full scan
    for VBR, so None), OGG (magic only). No codec call."""
    try:
        b = payload
        if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i, ch, rate, bits, data_len = 12, None, None, None, None
            while i + 8 <= len(b):
                cid = b[i : i + 4]
                clen = int.from_bytes(b[i + 4 : i + 8], "little")
                if cid == b"fmt " and i + 24 <= len(b):
                    ch = int.from_bytes(b[i + 10 : i + 12], "little")
                    rate = int.from_bytes(b[i + 12 : i + 16], "little")
                    bits = int.from_bytes(b[i + 22 : i + 24], "little")
                elif cid == b"data":
                    data_len = clen
                i += 8 + clen + (clen & 1)  # chunks are word-aligned
            dur = None
            if None not in (ch, rate, bits, data_len) and ch and rate and bits:
                dur = data_len / (rate * ch * (bits // 8))
            return "wav", ch, rate, dur
        if len(b) >= 26 and b[:4] == b"fLaC":
            # STREAMINFO is the mandatory first metadata block (type 0)
            if b[4] & 0x7F == 0:
                rate = (int.from_bytes(b[18:21], "big") >> 4) & 0xFFFFF
                ch = ((b[20] >> 1) & 0x07) + 1
                total = (
                    ((b[21] & 0x0F) << 32) | int.from_bytes(b[22:26], "big")
                )
                dur = total / rate if rate and total else None
                return "flac", ch, rate, dur
            return "flac", None, None, None
        if len(b) >= 4 and (b[:3] == b"ID3" or (b[0] == 0xFF and (b[1] & 0xE0) == 0xE0)):
            i = 0
            if b[:3] == b"ID3" and len(b) >= 10:
                # syncsafe tag size, then the first audio frame follows
                size = (
                    (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
                )
                i = 10 + size
            if i + 4 <= len(b) and b[i] == 0xFF and (b[i + 1] & 0xE0) == 0xE0:
                rates = {0: 44100, 1: 48000, 2: 32000}
                rate = rates.get((b[i + 2] >> 2) & 0x03)
                ch = 1 if (b[i + 3] >> 6) & 0x03 == 3 else 2
                return "mp3", ch, rate, None
            return "mp3", None, None, None
        if len(b) >= 4 and b[:4] == b"OggS":
            return "ogg", None, None, None
        return None, None, None, None
    except (IndexError, ValueError, ZeroDivisionError):
        return None, None, None, None


def probe_video(payload: bytes) -> tuple[str | None, float | None]:
    """(format, duration_s) from video container headers: MP4/MOV (walk
    top-level boxes to moov/mvhd — duration/timescale live there), WebM/
    Matroska and AVI (magic only; EBML duration needs element parsing)."""
    try:
        b = payload
        if len(b) >= 12 and b[4:8] == b"ftyp":

            def walk(lo: int, hi: int, depth: int = 0):
                i = lo
                while i + 8 <= hi and depth < 6:
                    size = int.from_bytes(b[i : i + 4], "big")
                    box = b[i + 4 : i + 8]
                    if size < 8:
                        return None
                    if box == b"moov":
                        got = walk(i + 8, min(i + size, hi), depth + 1)
                        if got is not None:
                            return got
                    if box == b"mvhd" and i + 28 <= hi:
                        ver = b[i + 8]
                        if ver == 1 and i + 40 <= hi:
                            ts = int.from_bytes(b[i + 28 : i + 32], "big")
                            dur = int.from_bytes(b[i + 32 : i + 40], "big")
                        else:
                            ts = int.from_bytes(b[i + 20 : i + 24], "big")
                            dur = int.from_bytes(b[i + 24 : i + 28], "big")
                        return dur / ts if ts else None
                    i += size
                return None

            return "mp4", walk(0, len(b))
        if len(b) >= 4 and b[:4] == b"\x1a\x45\xdf\xa3":
            return "webm", None
        if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"AVI ":
            return "avi", None
        return None, None
    except (IndexError, ValueError, ZeroDivisionError):
        return None, None


# --- Image transform ops (r11): resize + re-encode ---------------------------
#
# The resize/re-encode stage of a multimodal ingest pipeline (decode →
# normalize size → store), pure numpy end to end: nearest and bilinear
# resampling plus a minimal REAL PNG encoder (filter 0 + zlib) so the
# output of `transform_images` is a self-describing standard container,
# not a bespoke blob. encode→decode is the identity (PNG is lossless;
# the decoder is independently spec-pinned).


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG writer: 8-bit grey / grey+alpha / RGB / RGBA, filter
    type 0 on every scanline, one zlib IDAT. Small and real — the decoder
    side (and any external PNG reader) round-trips it losslessly."""
    import struct
    import zlib

    if img.dtype != np.uint8:
        raise ValueError("encode_png expects uint8 samples")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if ctype is None:
        raise ValueError(f"unsupported channel count {ch}")
    raw = bytearray()
    flat = np.ascontiguousarray(img).reshape(h, w * ch)
    for y in range(h):
        raw.append(0)  # filter: None
        raw.extend(flat[y].tobytes())

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def resize_image(
    img: np.ndarray, size: tuple[int, int], method: str = "bilinear"
) -> np.ndarray:
    """Resample to (out_h, out_w): 'nearest' (index mapping) or 'bilinear'
    (align-corners=False convention — sample at pixel centers, edge-clamped;
    the convention torch/TF/PIL default to). Vectorized numpy throughout."""
    out_h, out_w = size
    if out_h <= 0 or out_w <= 0:
        raise ValueError("resize target must be positive")
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, ch = img.shape
    if method == "nearest":
        ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
        xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
        out = img[ys[:, None], xs[None, :]]
    elif method == "bilinear":
        fy = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
        fx = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
        y0 = np.clip(np.floor(fy), 0, h - 1).astype(np.int64)
        x0 = np.clip(np.floor(fx), 0, w - 1).astype(np.int64)
        y1 = np.minimum(y0 + 1, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
        wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
        p = img.astype(np.float64)
        top = p[y0[:, None], x0[None, :]] * (1 - wx) + p[y0[:, None], x1[None, :]] * wx
        bot = p[y1[:, None], x0[None, :]] * (1 - wx) + p[y1[:, None], x1[None, :]] * wx
        blended = top * (1 - wy) + bot * wy
        if np.issubdtype(img.dtype, np.integer):
            info = np.iinfo(img.dtype)  # clamp to the INPUT dtype's range
            out = np.clip(np.round(blended), info.min, info.max).astype(img.dtype)
        else:
            out = blended.astype(img.dtype)
    else:
        raise ValueError(f"unknown resize method {method!r}")
    return out[:, :, 0] if squeeze else out


def transform_images(
    df: DataFrame,
    size: tuple[int, int],
    id_col: str = "doc_id",
    payload_col: str = "payload",
    method: str = "bilinear",
    decoder: Callable[[bytes], np.ndarray] | None = None,
) -> DataFrame:
    """decode → resize → re-encode (PNG) over mapInPandas: the standard
    image-normalization pass of a multimodal training pipeline. Output rows
    carry the resized payload plus its dims; undecodable payloads yield a
    null payload and the error class name (quarantine-friendly, matching
    the ingest layer's malformed-row discipline)."""
    import zlib

    import volga_spark.operators.multimodal as _self

    register_by_value(_self)
    dec = decoder or decode_image
    out_h, out_w = size
    schema = (
        f"{id_col} bigint, payload binary, height int, width int, err string"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, hs, ws, errs = [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                ids.append(i)
                try:
                    img = dec(bytes(p))
                    if img.dtype != np.uint8:
                        if np.issubdtype(img.dtype, np.floating):
                            # injected ML decoders commonly emit 0..1 floats
                            img = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
                        elif img.dtype == np.uint16:
                            img = (img // 257).astype(np.uint8)  # 16-bit PNG
                        else:
                            raise ValueError(
                                f"decoder returned dtype {img.dtype}"
                            )
                    resized = resize_image(img, (out_h, out_w), method)
                    payloads.append(encode_png(resized))
                    hs.append(out_h)
                    ws.append(out_w)
                    errs.append(None)
                except (
                    ValueError,
                    NotImplementedError,
                    KeyError,  # corrupt GIF LZW code
                    IndexError,  # truncated headers
                    zlib.error,  # corrupt PNG IDAT
                    MemoryError,  # belt-and-braces under _check_raster
                ) as ex:
                    payloads.append(None)
                    hs.append(None)
                    ws.append(None)
                    errs.append(type(ex).__name__)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "payload": payloads,
                    "height": hs,
                    "width": ws,
                    "err": errs,
                }
            )

    return widen_for_python(df.select(id_col, payload_col)).mapInPandas(
        gen, schema=schema
    )


def image_pixel_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: Callable[[bytes], np.ndarray] | None = None,
) -> DataFrame:
    """Decode → per-image pixel statistics (dims, sum, min, max) over
    mapInPandas — the verification half of an image-normalization pass:
    chained after :func:`transform_images` it closes the decode→resize→
    re-encode loop (the stats of the RE-DECODED output are predictable for
    structured inputs, which is how the driver oracle pins the round trip;
    see workloads/multimodal.py 'xform' leg). Quarantine discipline
    matches the other media ops: one corrupt (or null) payload yields an
    error-class row, never a task failure."""
    import zlib

    import volga_spark.operators.multimodal as _self

    register_by_value(_self)
    dec = decoder or decode_image
    schema = (
        f"{id_col} bigint, height int, width int, px_sum double, "
        "px_min int, px_max int, err string"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ws, sums, mins, maxs, errs = [], [], [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                ids.append(i)
                try:
                    if p is None:
                        raise ValueError("null payload")
                    img = dec(bytes(p))
                    hs.append(int(img.shape[0]))
                    ws.append(int(img.shape[1]))
                    sums.append(float(img.sum()))
                    mins.append(int(img.min()))
                    maxs.append(int(img.max()))
                    errs.append(None)
                except (
                    ValueError,
                    NotImplementedError,
                    KeyError,
                    IndexError,
                    zlib.error,
                    MemoryError,
                ) as ex:
                    hs.append(None)
                    ws.append(None)
                    sums.append(None)
                    mins.append(None)
                    maxs.append(None)
                    errs.append(type(ex).__name__)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "height": hs,
                    "width": ws,
                    "px_sum": sums,
                    "px_min": mins,
                    "px_max": maxs,
                    "err": errs,
                }
            )

    return widen_for_python(df.select(id_col, payload_col)).mapInPandas(
        gen, schema=schema
    )


# --- Audio feature ops (r11): spectrogram / log-mel --------------------------


def frame_signal(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """(n,) mono signal → (frames, n_fft) windowed frames (Hann, periodic),
    frame count = 1 + floor((n - n_fft)/hop); no padding (a streaming
    framer would carry the remainder into the next batch)."""
    n = len(x)
    if n < n_fft:
        return np.zeros((0, n_fft))
    n_frames = 1 + (n - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    return x[idx] * win


def spectrogram(x: np.ndarray, n_fft: int = 256, hop: int = 128) -> np.ndarray:
    """Magnitude-squared STFT, (frames, n_fft//2 + 1) float64."""
    frames = frame_signal(np.asarray(x, dtype=np.float64), n_fft, hop)
    spec = np.fft.rfft(frames, axis=1)
    return (spec.real**2 + spec.imag**2)


def mel_filterbank(
    n_mels: int, n_fft: int, rate: int, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """(n_mels, n_fft//2+1) triangular filters on the HTK mel scale
    (mel = 2595 log10(1 + f/700)), peak-normalized to 1."""
    fmax = fmax if fmax is not None else rate / 2.0

    def to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def from_mel(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    mel_pts = np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2)
    hz_pts = from_mel(mel_pts)
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / rate)
    fb = np.zeros((n_mels, len(freqs)))
    for m in range(n_mels):
        lo, mid, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (freqs - lo) / max(mid - lo, 1e-12)
        down = (hi - freqs) / max(hi - mid, 1e-12)
        fb[m] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def extract_audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_fft: int = 256,
    hop: int = 128,
    n_mels: int = 16,
) -> DataFrame:
    """WAV payload → per-document log-mel summary via mapInPandas: decode
    (PCM or IEEE float), mix to mono, STFT → mel → log, then mean over
    frames — the fixed-width acoustic fingerprint shape a speech-corpus
    curation pass runs at scale (one Arrow batch per task, no shuffle)."""
    import volga_spark.operators.multimodal as _self

    register_by_value(_self)
    schema = (
        f"{id_col} bigint, n_frames int, sample_rate int, "
        "log_mel array<double>, err string"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fbs: dict[int, np.ndarray] = {}  # per-rate filterbanks, built once
        for pdf in batches:
            ids, nfr, rates, feats, errs = [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                ids.append(i)
                try:
                    arr, rate = decode_wav(bytes(p))
                    if np.issubdtype(arr.dtype, np.integer):
                        info = np.iinfo(arr.dtype)
                        x = arr.astype(np.float64)
                        if arr.dtype == np.uint8:
                            x = (x - 128.0) / 128.0
                        else:
                            x = x / max(abs(info.min), info.max)
                    else:
                        x = arr.astype(np.float64)
                    mono = x.mean(axis=1)
                    spec = spectrogram(mono, n_fft, hop)
                    fb = fbs.get(rate)
                    if fb is None:
                        fb = fbs[rate] = mel_filterbank(n_mels, n_fft, rate)
                    logmel = np.log10(spec @ fb.T + 1e-10)
                    nfr.append(spec.shape[0])
                    rates.append(rate)
                    feats.append(
                        logmel.mean(axis=0).tolist()
                        if len(logmel)
                        else [0.0] * n_mels
                    )
                    errs.append(None)
                except (
                    ValueError,
                    NotImplementedError,
                    EOFError,
                    IndexError,
                    MemoryError,  # belt-and-braces under _check_raster
                ) as ex:
                    # quarantine, matching transform_images: one corrupt
                    # payload must not fail the task (r11 review)
                    nfr.append(None)
                    rates.append(None)
                    feats.append(None)
                    errs.append(type(ex).__name__)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_frames": nfr,
                    "sample_rate": rates,
                    "log_mel": feats,
                    "err": errs,
                }
            )

    return widen_for_python(df.select(id_col, payload_col)).mapInPandas(
        gen, schema=schema
    )
