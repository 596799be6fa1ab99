"""r11: from-scratch GIF decoder, pinned against an INDEPENDENT forward
encoder written here straight from the GIF89a spec (appendix F).

The test encoder shares no code with the decoder: its own LZW compressor
(string table keyed by byte tuples, CLEAR emission on table overflow, the
spec's variable code-width growth), its own LSB-first bit packer, its own
container writer. GIF is LOSSLESS, so decode must round-trip the index
plane and the palette mapping bit-exactly — plain, interlaced, local
color tables, mid-stream CLEAR codes, and sub-block splits all covered.
"""

from __future__ import annotations

import numpy as np
import pytest

from volga_spark.operators.multimodal import decode_gif, decode_image


# --- independent spec-forward encoder ---------------------------------------


class _LzwWriter:
    def __init__(self, min_code_size: int) -> None:
        self.min = min_code_size
        self.clear = 1 << min_code_size
        self.end = self.clear + 1
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0
        self._reset()

    def _reset(self) -> None:
        self.table = {(i,): i for i in range(self.clear)}
        self.width = self.min + 1
        self.next = self.end + 1

    def _emit(self, code: int) -> None:
        self.acc |= code << self.nbits  # LSB-first
        self.nbits += self.width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def compress(self, idx: list[int]) -> bytes:
        self._emit(self.clear)
        cur = (idx[0],)
        for px in idx[1:]:
            nxt = cur + (px,)
            if nxt in self.table:
                cur = nxt
                continue
            self._emit(self.table[cur])
            if self.next < 4096:
                self.table[nxt] = self.next
                # width grows when the next code to ASSIGN crosses the
                # current width's capacity (spec: after assigning 2^w - 1)
                if self.next == (1 << self.width) and self.width < 12:
                    self.width += 1
                self.next += 1
            else:
                self._emit(self.clear)
                self._reset()
            cur = (px,)
        self._emit(self.table[cur])
        self._emit(self.end)
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def encode_gif(
    plane: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    local_palette: bool = False,
    sub_block: int = 255,
) -> bytes:
    """Spec-forward single-frame GIF89a writer; `plane` is (h, w) uint8
    palette indices, `palette` is (n, 3) uint8 with n a power of two ≥ 2."""
    h, w = plane.shape
    n = len(palette)
    bits = max(1, int(n - 1).bit_length())
    assert n == 1 << bits
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    if local_palette:
        out += bytes([0x00, 0, 0])  # no GCT
    else:
        out += bytes([0x80 | (bits - 1), 0, 0])
        out += palette.tobytes()
    # a GCE extension so the decoder's extension skip is exercised
    out += bytes([0x21, 0xF9, 0x04, 0, 0, 0, 0, 0x00])
    out += b"\x2c" + bytes(4)  # image descriptor at (0, 0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    iflags = (0x40 if interlace else 0) | (0x80 | (bits - 1) if local_palette else 0)
    out += bytes([iflags])
    if local_palette:
        out += palette.tobytes()
    rows = plane
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        rows = plane[order]
    min_code = max(2, bits)  # spec: LZW min code size >= 2
    out += bytes([min_code])
    data = _LzwWriter(min_code).compress(rows.reshape(-1).tolist())
    for off in range(0, len(data), sub_block):
        chunk = data[off : off + sub_block]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# --- tests -------------------------------------------------------------------


CASES = [
    ("tiny_2color", (5, 7), 2, False, False, 255),
    ("plain_16", (13, 9), 16, False, False, 255),
    ("interlaced", (23, 11), 8, True, False, 255),
    ("local_palette", (9, 14), 32, False, True, 255),
    ("small_subblocks", (17, 19), 4, False, False, 7),
    ("table_overflow_clear", (64, 64), 2, False, False, 255),
]


@pytest.mark.parametrize(
    "name,dims,ncolors,interlace,local,sub", CASES, ids=[c[0] for c in CASES]
)
def test_gif_roundtrip(name, dims, ncolors, interlace, local, sub):
    rng = np.random.default_rng(abs(hash(name)) % 2**32)
    h, w = dims
    plane = rng.integers(0, ncolors, size=(h, w), dtype=np.uint8)
    palette = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    payload = encode_gif(
        plane, palette, interlace=interlace, local_palette=local, sub_block=sub
    )
    got_idx = decode_gif(payload, rgb=False)
    assert np.array_equal(got_idx, plane), name
    got_rgb = decode_gif(payload)
    assert np.array_equal(got_rgb, palette[plane]), name


def test_gif_runs_force_table_growth():
    """Long runs maximize LZW string lengths and the KwKwK case."""
    plane = np.zeros((40, 50), dtype=np.uint8)
    plane[::3, :] = 1
    palette = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    payload = encode_gif(plane, palette)
    assert np.array_equal(decode_gif(payload, rgb=False), plane)


def test_gif_via_decode_image_dispatch():
    rng = np.random.default_rng(3)
    plane = rng.integers(0, 4, size=(6, 8), dtype=np.uint8)
    palette = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    img = decode_image(encode_gif(plane, palette))
    assert img.shape == (6, 8, 3)
    assert np.array_equal(img, palette[plane])


def test_gif_truncated_fails_loudly():
    rng = np.random.default_rng(5)
    plane = rng.integers(0, 8, size=(12, 12), dtype=np.uint8)
    palette = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    payload = encode_gif(plane, palette)
    with pytest.raises((ValueError, IndexError)):
        decode_gif(payload[: len(payload) // 2])


def test_gif_lzw_raw_layer_width_boundaries():
    """Raw LZW layer, every min code size: sequences long enough to cross
    several code-width boundaries (and the 4096 table cap with mid-stream
    CLEAR) must round-trip exactly. The encoder bumps width when the
    ASSIGNED code == 2^w while the decoder bumps at post-increment ==
    2^w — correct because the decoder's table runs one assignment behind
    the encoder at read time; this pins that synchronization."""
    from volga_spark.operators.multimodal import _gif_lzw_decode

    rng = np.random.default_rng(42)
    for mcs in (2, 3, 4, 8):
        nsym = 1 << mcs
        for kind in range(4):
            n = 2500
            if kind == 0:
                seq = rng.integers(0, nsym, n).tolist()
            elif kind == 1:
                seq = (np.arange(n) % nsym).tolist()
            elif kind == 2:
                seq = [0] * n  # maximal runs: the KwKwK chain case
            else:
                seq = np.repeat(
                    rng.integers(0, nsym, n // 7 + 1), 7
                )[:n].tolist()
            data = _LzwWriter(mcs).compress(seq)
            assert _gif_lzw_decode(mcs, data, len(seq)) == seq, (mcs, kind)


def _encode_subframe_gif(
    screen: tuple[int, int],
    frame_plane: np.ndarray,
    frame_pos: tuple[int, int],
    gct: np.ndarray | None,
    bg_idx: int,
    local_pal: np.ndarray | None,
) -> bytes:
    """Single sub-screen frame at (left, top) with independent global/local
    color tables and an explicit header background color index."""
    sh, sw = screen
    h, w = frame_plane.shape
    out = bytearray(b"GIF89a")
    out += sw.to_bytes(2, "little") + sh.to_bytes(2, "little")
    if gct is not None:
        bits = max(1, int(len(gct) - 1).bit_length())
        out += bytes([0x80 | (bits - 1), bg_idx, 0])
        out += gct.tobytes()
    else:
        out += bytes([0x00, bg_idx, 0])
    top, left = frame_pos
    out += b"\x2c"
    out += left.to_bytes(2, "little") + top.to_bytes(2, "little")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    pal = local_pal if local_pal is not None else gct
    bits = max(1, int(len(pal) - 1).bit_length())
    out += bytes([(0x80 | (bits - 1)) if local_pal is not None else 0])
    if local_pal is not None:
        out += local_pal.tobytes()
    min_code = max(2, bits)
    out += bytes([min_code])
    data = _LzwWriter(min_code).compress(frame_plane.reshape(-1).tolist())
    out += bytes([len(data)]) + data + b"\x00\x3b"
    return bytes(out)


def test_gif_local_palette_frame_ignores_header_background_index():
    """r13 advisor: the GIF89a background color index is defined against
    the GLOBAL color table only; a sub-screen frame carrying a LOCAL
    palette must composite onto fill 0, not local_pal[bg_idx]."""
    gct = np.array(
        [[10, 10, 10], [20, 20, 20], [200, 0, 0], [0, 200, 0]], dtype=np.uint8
    )
    lpal = np.array(
        [[1, 2, 3], [50, 60, 70], [99, 99, 99], [7, 8, 9]], dtype=np.uint8
    )
    frame = np.array([[1, 2], [3, 1]], dtype=np.uint8)
    payload = _encode_subframe_gif((6, 6), frame, (1, 1), gct, 2, lpal)
    img = decode_gif(payload)
    # background = local palette index 0, NOT lpal[2] (and certainly not a
    # GCT color — the frame's pixels resolve through the local table)
    assert np.array_equal(img[0, 0], lpal[0])
    assert np.array_equal(img[5, 5], lpal[0])
    assert np.array_equal(img[1, 1], lpal[1])
    assert np.array_equal(img[1, 2], lpal[2])
    assert np.array_equal(img[2, 2], lpal[1])


def test_gif_global_palette_frame_keeps_header_background_index():
    """Counterpart: with the GCT active, the header bg index IS the fill."""
    gct = np.array(
        [[10, 10, 10], [20, 20, 20], [200, 0, 0], [0, 200, 0]], dtype=np.uint8
    )
    frame = np.array([[1, 0], [0, 1]], dtype=np.uint8)
    payload = _encode_subframe_gif((5, 5), frame, (2, 2), gct, 3, None)
    img = decode_gif(payload)
    assert np.array_equal(img[0, 0], gct[3])
    assert np.array_equal(img[2, 2], gct[1])
