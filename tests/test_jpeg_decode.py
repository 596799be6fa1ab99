"""r11: from-scratch baseline JPEG decoder, pinned against an INDEPENDENT
forward encoder written here straight from ITU-T T.81.

The test encoder shares no code with the decoder: direct-form O(64^2) FDCT
sums (spec A.3.3 forward formula), its own canonical-Huffman code
assignment, its own bit/byte-stuffing writer, and its own marker emitter.
Two layers are pinned:

1. LOSSLESS layer (Huffman entropy coding + dequantization): the decoder's
   ``jpeg_dequantized_blocks`` must reproduce the encoder's quantized
   coefficients times the quant table BIT-exactly (integer compare) —
   grayscale, 4:4:4 and 4:2:0 color, with and without restart intervals.
2. LOSSY layer (IDCT + level shift + upsample + YCbCr->RGB): the decoder's
   pixels must match an independent direct-form IDCT reconstruction.
"""

from __future__ import annotations

import numpy as np
import pytest

from volga_spark.operators.multimodal import (
    decode_image,
    decode_jpeg,
    jpeg_dequantized_blocks,
)

# --- independent forward encoder (spec-forward, no decoder code shared) ----

# Annex K.1/K.2 example quantization tables (natural order)
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99]
    + [18, 21, 26, 66, 99, 99, 99, 99]
    + [24, 26, 56, 99, 99, 99, 99, 99]
    + [47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32,
    dtype=np.int64,
)

# zigzag scan: position k -> natural index, written out from the spec figure
# (independent of the decoder's table on purpose: derived programmatically
# from the diagonal walk instead of transcribed)


def _zigzag_order() -> list[int]:
    order = []
    for d in range(15):
        rng = range(d + 1)
        for t in rng if d % 2 else reversed(rng):
            r, c = t, d - t
            if r < 8 and c < 8:
                order.append(r * 8 + c)
    return order


ZZ = _zigzag_order()


def _fdct(block: np.ndarray) -> np.ndarray:
    """Direct-form forward DCT, spec A.3.3: S(v,u) = 1/4 C(u)C(v) sum sum
    s(y,x) cos((2x+1)u pi/16) cos((2y+1)v pi/16). O(64^2) on purpose."""
    out = np.zeros((8, 8))
    s = block.astype(np.float64) - 128.0
    for v in range(8):
        for u in range(8):
            acc = 0.0
            for y in range(8):
                for x in range(8):
                    acc += (
                        s[y, x]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            out[v, u] = acc * cu * cv / 4.0
    return out


def _idct_direct(coef: np.ndarray) -> np.ndarray:
    """Direct-form inverse, spec A.3.3 — the independent pixel reference."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for v in range(8):
                for u in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    acc += (
                        cu
                        * cv
                        * coef[v, u]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[y, x] = acc / 4.0
    return out


class _HuffSpec:
    """Canonical table with every symbol at one code length: counts has a
    single nonzero entry, codes are 0..n-1 at that length — valid canonical
    JPEG tables built without the decoder's machinery."""

    def __init__(self, symbols: list[int], length: int) -> None:
        assert len(symbols) < (1 << length)  # the all-ones code must be free
        self.length = length
        self.symbols = symbols
        self.codes = {sym: (i, length) for i, sym in enumerate(symbols)}

    def dht_payload(self, tc: int, th: int) -> bytes:
        counts = [0] * 16
        counts[self.length - 1] = len(self.symbols)
        return bytes([tc << 4 | th]) + bytes(counts) + bytes(self.symbols)


DC_TABLE = _HuffSpec(list(range(12)), 5)
AC_TABLE = _HuffSpec(
    [(r << 4) | s for r in range(16) for s in range(1, 11)] + [0x00, 0xF0], 9
)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def align(self) -> None:
        while self.nbits:
            self.put(1, 1)  # pad with 1s per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, q: np.ndarray, pred: int) -> int:
    """Quantized natural-order 8x8 -> entropy bits; returns new DC pred."""
    zz = [int(q.flat[idx]) for idx in ZZ]
    diff = zz[0] - pred
    s = _category(diff)
    bw.put(*DC_TABLE.codes[s])
    if s:
        bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            bw.put(*AC_TABLE.codes[0xF0])  # ZRL
            run -= 16
        s = _category(zz[k])
        bw.put(*AC_TABLE.codes[(run << 4) | s])
        v = zz[k]
        bw.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        bw.put(*AC_TABLE.codes[0x00])  # EOB
    return zz[0]


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _pad_blocks(plane: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    """Edge-replicate pad a component plane to (bh*8, bw_*8)."""
    h, w = plane.shape
    out = np.empty((bh * 8, bw_ * 8), dtype=plane.dtype)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


def encode_jpeg(
    planes: list[np.ndarray],
    sampling: list[tuple[int, int]],
    h: int,
    w: int,
    restart_interval: int = 0,
):
    """Spec-forward baseline encoder. `planes[i]` is component i's samples at
    ITS OWN resolution (the encoder is handed already-downsampled chroma so
    no downsample filter enters the contract). Returns (bytes, quantized
    coefficient arrays per component, shape (by, bx, 8, 8) int64)."""
    ncomp = len(planes)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    qts = [QT_LUMA] + [QT_CHROMA] * (ncomp - 1)
    quantized = []
    for i, plane in enumerate(planes):
        sh, sv = sampling[i]
        by, bx = mcus_y * sv, mcus_x * sh
        padded = _pad_blocks(plane, by, bx)
        qarr = np.zeros((by, bx, 8, 8), dtype=np.int64)
        qt = qts[i].reshape(8, 8)
        for r in range(by):
            for c in range(bx):
                f = _fdct(padded[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8])
                # round half away from zero (libjpeg's convention)
                qarr[r, c] = np.sign(f) * np.floor(np.abs(f) / qt + 0.5)
        quantized.append(qarr)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0x00]) + bytes(QT_LUMA[ZZ].tolist()))
    if ncomp > 1:
        out += _seg(0xDB, bytes([0x01]) + bytes(QT_CHROMA[ZZ].tolist()))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for i in range(ncomp):
        sof += bytes([i + 1, (sampling[i][0] << 4) | sampling[i][1], min(i, 1)])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, DC_TABLE.dht_payload(0, 0) + AC_TABLE.dht_payload(1, 0))
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])  # all components use table 0/0
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.align()
            out += bw.out
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            bw = _BitWriter()
            preds = [0] * ncomp
        my, mx = divmod(mcu, mcus_x)
        for i in range(ncomp):
            sh, sv = sampling[i]
            for vy in range(sv):
                for vx in range(sh):
                    blk = quantized[i][my * sv + vy, mx * sh + vx]
                    preds[i] = _encode_block(bw, blk, preds[i])
    bw.align()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out), quantized


def _reference_pixels(
    quantized: list[np.ndarray],
    sampling: list[tuple[int, int]],
    h: int,
    w: int,
) -> np.ndarray:
    """Independent reconstruction: dequant -> direct-form IDCT -> +128 ->
    replicate-upsample -> (BT.601 YCbCr->RGB if 3 planes) -> round/clip."""
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    qts = [QT_LUMA] + [QT_CHROMA] * (len(quantized) - 1)
    planes = []
    for i, qarr in enumerate(quantized):
        by, bx = qarr.shape[:2]
        plane = np.zeros((by * 8, bx * 8))
        qt = qts[i].reshape(8, 8)
        for r in range(by):
            for c in range(bx):
                plane[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = (
                    _idct_direct(qarr[r, c] * qt) + 128.0
                )
        sy, sx = vmax // sampling[i][1], hmax // sampling[i][0]
        if sx > 1 or sy > 1:
            plane = np.repeat(np.repeat(plane, sy, axis=0), sx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    rgb = np.stack(
        [
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- tests ------------------------------------------------------------------


def _random_planes(rng, h, w, sampling):
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    planes = []
    for sh, sv in sampling:
        ph = -(-h * sv // vmax)
        pw = -(-w * sh // hmax)
        planes.append(rng.integers(0, 256, size=(ph, pw), dtype=np.uint8))
    return planes


CASES = [
    ("gray", (21, 17), [(1, 1)], 0),
    ("gray_restart", (16, 24), [(1, 1)], 3),
    ("ycc444", (13, 19), [(1, 1), (1, 1), (1, 1)], 0),
    ("ycc420", (35, 29), [(2, 2), (1, 1), (1, 1)], 0),
    ("ycc420_restart", (33, 31), [(2, 2), (1, 1), (1, 1)], 2),
    ("ycc422", (18, 27), [(2, 1), (1, 1), (1, 1)], 0),
]


@pytest.mark.parametrize("name,dims,sampling,ri", CASES, ids=[c[0] for c in CASES])
def test_jpeg_lossless_layer_bit_exact(name, dims, sampling, ri):
    """Huffman decode + dequant must reproduce the encoder's quantized
    coefficients * Q exactly — the lossless half of JPEG."""
    h, w = dims
    rng = np.random.default_rng(hash(name) % 2**32)
    planes = _random_planes(rng, h, w, sampling)
    payload, quantized = encode_jpeg(planes, sampling, h, w, restart_interval=ri)
    got = jpeg_dequantized_blocks(payload)
    assert len(got) == len(quantized)
    qts = [QT_LUMA] + [QT_CHROMA] * (len(quantized) - 1)
    for comp, (g, q) in enumerate(zip(got, quantized)):
        want = q * qts[comp].reshape(8, 8)
        assert g.shape == want.shape, (name, comp)
        assert np.array_equal(g.astype(np.int64), want), (name, comp)


@pytest.mark.parametrize("name,dims,sampling,ri", CASES, ids=[c[0] for c in CASES])
def test_jpeg_pixel_layer_vs_direct_idct(name, dims, sampling, ri):
    """Full decode_jpeg vs the independent direct-form reconstruction."""
    h, w = dims
    rng = np.random.default_rng(hash(name) % 2**32)
    planes = _random_planes(rng, h, w, sampling)
    payload, quantized = encode_jpeg(planes, sampling, h, w, restart_interval=ri)
    got = decode_jpeg(payload)
    want = _reference_pixels(quantized, sampling, h, w)
    assert got.shape == want.shape
    # both sides are float64 pipelines differing only in IDCT factorization
    # (~1e-12); after round+clip they agree exactly at these fixed seeds
    assert np.array_equal(got, want), np.abs(
        got.astype(int) - want.astype(int)
    ).max()


def test_jpeg_via_decode_image_dispatch():
    rng = np.random.default_rng(7)
    planes = _random_planes(rng, 9, 11, [(1, 1)])
    payload, _ = encode_jpeg(planes, [(1, 1)], 9, 11)
    img = decode_image(payload)
    assert img.shape == (9, 11)
    assert img.dtype == np.uint8


def test_arithmetic_jpeg_still_gates():
    """SOF9 (arithmetic coding) must keep raising the injectable gate —
    progressive (SOF2) decodes for real since r11 (tests below)."""
    body = bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big") + bytes(
        [1, 1, 0x11, 0]
    )
    payload = b"\xff\xd8" + _seg(0xC9, body)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(payload)


def test_jpeg_truncated_stream_fails_loudly():
    rng = np.random.default_rng(11)
    planes = _random_planes(rng, 16, 16, [(1, 1)])
    payload, _ = encode_jpeg(planes, [(1, 1)], 16, 16)
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) // 2])
