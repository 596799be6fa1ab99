"""r11: progressive JPEG decode (T.81 Annex G — spectral selection +
successive approximation), pinned against an INDEPENDENT spec-forward
progressive encoder written here.

Shares the quantization/FDCT/bit-writer/table scaffolding with the
baseline test encoder (tests/test_jpeg_decode.py) but implements the
progressive scan protocols — DC initial/refinement, AC initial with EOB
runs, AC refinement with correction bits and buffered-bit EOB runs —
forward from the spec. Two invariants are pinned:

1. ROUND-TRIP: the decoder's final coefficient state after ALL scans must
   equal the encoder's full-precision quantized coefficients bit-exactly
   (successive approximation is lossless once every refinement lands).
   AC scans never visit MCU-padding blocks (single-component scans are
   non-interleaved over the component's own ceil grid), so padding-block
   AC is expected zero.
2. PIXELS: decode_jpeg output equals the independent direct-form IDCT
   reconstruction of that expected coefficient state.
"""

from __future__ import annotations

import numpy as np
import pytest

from volga_spark.operators.multimodal import decode_jpeg, jpeg_dequantized_blocks

from test_jpeg_decode import (
    DC_TABLE,
    QT_CHROMA,
    QT_LUMA,
    ZZ,
    _BitWriter,
    _HuffSpec,
    _category,
    _random_planes,
    _reference_pixels,
    _seg,
    encode_jpeg,
)

# AC table for progressive scans needs the EOBn symbols (r<<4 | 0 for
# r=0..14) on top of the baseline set
PROG_AC_TABLE = _HuffSpec(
    [(r << 4) for r in range(15)]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [0xF0],
    9,
)


class _ScanWriter:
    """Entropy writer for one progressive scan: bit emission via the
    baseline _BitWriter (byte stuffing included) plus the EOB-run state —
    the run counter and the correction bits buffered by blocks that ended
    inside the run (emitted after the EOBn symbol, spec G.1.2.3)."""

    def __init__(self) -> None:
        self.bw = _BitWriter()
        self.eobrun = 0
        self.pending: list[int] = []

    def sym(self, table: _HuffSpec, s: int) -> None:
        self.bw.put(*table.codes[s])

    def bits(self, v: int, n: int) -> None:
        self.bw.put(v, n)

    def flush_eobrun(self, actab: _HuffSpec) -> None:
        if self.eobrun == 0:
            return
        rb = self.eobrun.bit_length() - 1
        self.sym(actab, rb << 4)
        if rb:
            self.bits(self.eobrun & ((1 << rb) - 1), rb)
        for bit in self.pending:
            self.bits(bit, 1)
        self.eobrun = 0
        self.pending = []

    def finish(self, actab: _HuffSpec | None) -> bytes:
        if actab is not None:
            self.flush_eobrun(actab)
        self.bw.align()
        return bytes(self.bw.out)


def _enc_dc_first(wr, coefz, al, pred, comp_id) -> None:
    v = int(coefz[0]) >> al  # arithmetic shift (G.1.2.1 point transform)
    diff = v - pred[comp_id]
    pred[comp_id] = v
    s = _category(diff)
    wr.sym(DC_TABLE, s)
    if s:
        wr.bits(diff if diff > 0 else diff + (1 << s) - 1, s)


def _enc_ac_first(wr, coefz, ss, se, al) -> None:
    r = 0
    for k in range(ss, se + 1):
        v = int(coefz[k])
        t = abs(v) >> al  # AC point transform truncates toward zero
        if t == 0:
            r += 1
            continue
        wr.flush_eobrun(PROG_AC_TABLE)
        while r > 15:
            wr.sym(PROG_AC_TABLE, 0xF0)
            r -= 16
        s = t.bit_length()
        wr.sym(PROG_AC_TABLE, (r << 4) | s)
        wr.bits(t if v > 0 else -t + (1 << s) - 1, s)
        r = 0
    if r > 0:
        wr.eobrun += 1
        if wr.eobrun == 0x7FFF:
            wr.flush_eobrun(PROG_AC_TABLE)


def _enc_ac_refine(wr, coefz, ss, se, al) -> None:
    absv = [abs(int(coefz[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1  # position of the last NEWLY-significant coefficient
    for i, t in enumerate(absv):
        if t == 1:
            eob = ss + i
    r = 0
    br: list[int] = []
    for i, k in enumerate(range(ss, se + 1)):
        t = absv[i]
        if t == 0:
            r += 1
            continue
        # ZRLs, unless the run can fold into the EOB (spec G.1.2.3 /
        # the canonical refinement procedure)
        while r > 15 and k <= eob:
            wr.flush_eobrun(PROG_AC_TABLE)
            wr.sym(PROG_AC_TABLE, 0xF0)
            r -= 16
            for bit in br:
                wr.bits(bit, 1)
            br = []
        if t > 1:  # history-nonzero: buffer the correction bit
            br.append(t & 1)
            continue
        # newly significant at this precision
        wr.flush_eobrun(PROG_AC_TABLE)
        wr.sym(PROG_AC_TABLE, (r << 4) | 1)
        wr.bits(1 if int(coefz[k]) > 0 else 0, 1)
        for bit in br:
            wr.bits(bit, 1)
        br = []
        r = 0
    if r > 0 or br:
        wr.eobrun += 1
        wr.pending.extend(br)
        if wr.eobrun == 0x7FFF:
            wr.flush_eobrun(PROG_AC_TABLE)


def encode_jpeg_progressive(
    planes: list[np.ndarray],
    sampling: list[tuple[int, int]],
    h: int,
    w: int,
    restart_interval: int = 0,
):
    """Spec-forward progressive encoder. Scan script: interleaved DC at
    Al=1 + DC refinement, then per component AC bands [1,5] and [6,63] at
    Al=2 followed by two full-band refinements 2→1→0. Returns
    (payload bytes, expected final coefficient state per component in
    natural order — quantized values with MCU-padding-block AC zeroed,
    since non-interleaved AC scans never visit padding blocks)."""
    ncomp = len(planes)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    _, quantized = encode_jpeg(planes, sampling, h, w)  # reuse FDCT+quant
    qz = []  # zigzag-order per-block coefficient vectors
    grids = []
    for ci, q in enumerate(quantized):
        by, bx = q.shape[:2]
        qn = q.reshape(by * bx, 64)
        qz.append(qn[:, ZZ])
        cw = -(-w * sampling[ci][0] // hmax)
        chh = -(-h * sampling[ci][1] // vmax)
        grids.append((by, bx, -(-chh // 8), -(-cw // 8)))

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(QT_LUMA[ZZ].tolist()))
    if ncomp > 1:
        out += _seg(0xDB, bytes([0x01]) + bytes(QT_CHROMA[ZZ].tolist()))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for i in range(ncomp):
        sof += bytes([i + 1, (sampling[i][0] << 4) | sampling[i][1], min(i, 1)])
    out += _seg(0xC2, sof)  # SOF2: progressive
    out += _seg(
        0xC4, DC_TABLE.dht_payload(0, 0) + PROG_AC_TABLE.dht_payload(1, 0)
    )
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))

    def emit_scan(comp_ids, ss, se, ah, al):
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        nonlocal out
        out += _seg(0xDA, sos)
        ac = ss > 0
        actab = PROG_AC_TABLE if ac else None
        if len(comp_ids) == 1:
            ci = comp_ids[0] - 1
            by, bx, nh8, nw8 = grids[ci]
            units = [(ci, r * bx + c) for r in range(nh8) for c in range(nw8)]
        else:
            units = []
            for mcu in range(mcus_x * mcus_y):
                my, mx = divmod(mcu, mcus_x)
                blk = []
                for cid in comp_ids:
                    ci = cid - 1
                    sh, sv = sampling[ci]
                    bx = grids[ci][1]
                    blk += [
                        (ci, (my * sv + vy) * bx + (mx * sh + vx))
                        for vy in range(sv)
                        for vx in range(sh)
                    ]
                units.append(blk)
        # flatten per restart unit: for interleaved scans a unit is an MCU
        # (list of blocks); for non-interleaved, a single block
        wr = _ScanWriter()
        pred = {cid - 1: 0 for cid in comp_ids}
        rst = 0
        for u_i, unit in enumerate(units):
            if restart_interval and u_i and u_i % restart_interval == 0:
                out += wr.finish(actab)
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                wr = _ScanWriter()
                pred = {cid - 1: 0 for cid in comp_ids}
            blocks = unit if isinstance(unit, list) else [unit]
            for ci, bi in blocks:
                coefz = qz[ci][bi]
                if ss == 0:
                    if ah == 0:
                        _enc_dc_first(wr, coefz, al, pred, ci)
                    else:
                        wr.bits((int(coefz[0]) >> al) & 1, 1)
                elif ah == 0:
                    _enc_ac_first(wr, coefz, ss, se, al)
                else:
                    _enc_ac_refine(wr, coefz, ss, se, al)
        out += wr.finish(actab)

    all_ids = list(range(1, ncomp + 1))
    emit_scan(all_ids, 0, 0, 0, 1)  # DC initial at Al=1
    emit_scan(all_ids, 0, 0, 1, 0)  # DC refinement
    for cid in all_ids:
        emit_scan([cid], 1, 5, 0, 2)
        emit_scan([cid], 6, 63, 0, 2)
    for cid in all_ids:
        emit_scan([cid], 1, 63, 2, 1)
        emit_scan([cid], 1, 63, 1, 0)
    out += b"\xff\xd9"

    expected = []
    for ci, q in enumerate(quantized):
        e = q.copy()
        by, bx, nh8, nw8 = grids[ci]
        mask = np.zeros((by, bx), dtype=bool)
        mask[nh8:, :] = True
        mask[:, nw8:] = True
        dc = e[:, :, 0, 0].copy()
        e[mask] = 0
        e[:, :, 0, 0] = dc  # DC scans are interleaved: padding keeps DC
        expected.append(e)
    return bytes(out), expected


CASES = [
    ("gray", (21, 17), [(1, 1)], 0),
    ("gray_restart", (24, 16), [(1, 1)], 5),
    ("ycc444", (13, 19), [(1, 1), (1, 1), (1, 1)], 0),
    ("ycc420", (35, 29), [(2, 2), (1, 1), (1, 1)], 0),
    ("ycc420_restart", (33, 31), [(2, 2), (1, 1), (1, 1)], 3),
    ("ycc422", (18, 27), [(2, 1), (1, 1), (1, 1)], 0),
]


@pytest.mark.parametrize("name,dims,sampling,ri", CASES, ids=[c[0] for c in CASES])
def test_progressive_converges_to_exact_coefficients(name, dims, sampling, ri):
    """After every scan lands, the decoder's coefficient state must equal
    the full-precision quantized coefficients bit-exactly."""
    h, w = dims
    rng = np.random.default_rng(abs(hash("p" + name)) % 2**32)
    planes = _random_planes(rng, h, w, sampling)
    payload, expected = encode_jpeg_progressive(
        planes, sampling, h, w, restart_interval=ri
    )
    got = jpeg_dequantized_blocks(payload)
    qts = [QT_LUMA] + [QT_CHROMA] * (len(expected) - 1)
    assert len(got) == len(expected)
    for comp, (g, e) in enumerate(zip(got, expected)):
        want = e * qts[comp].reshape(8, 8)
        assert g.shape == want.shape, (name, comp)
        assert np.array_equal(g.astype(np.int64), want), (name, comp)


@pytest.mark.parametrize("name,dims,sampling,ri", CASES, ids=[c[0] for c in CASES])
def test_progressive_pixels_match_direct_idct(name, dims, sampling, ri):
    h, w = dims
    rng = np.random.default_rng(abs(hash("p" + name)) % 2**32)
    planes = _random_planes(rng, h, w, sampling)
    payload, expected = encode_jpeg_progressive(
        planes, sampling, h, w, restart_interval=ri
    )
    got = decode_jpeg(payload)
    want = _reference_pixels(expected, sampling, h, w)
    assert got.shape == want.shape
    assert np.array_equal(got, want), np.abs(
        got.astype(int) - want.astype(int)
    ).max()


def test_progressive_equals_baseline_pixels_inside_image():
    """Baseline and progressive encodings of the same quantized
    coefficients must decode to the same pixels in the REAL image area
    (they differ only in MCU-padding blocks, which are cropped)."""
    rng = np.random.default_rng(77)
    sampling = [(2, 2), (1, 1), (1, 1)]
    h, w = 19, 23
    planes = _random_planes(rng, h, w, sampling)
    base_payload, _ = encode_jpeg(planes, sampling, h, w)
    prog_payload, _ = encode_jpeg_progressive(planes, sampling, h, w)
    assert np.array_equal(decode_jpeg(base_payload), decode_jpeg(prog_payload))


def test_progressive_truncated_fails_loudly():
    rng = np.random.default_rng(9)
    planes = _random_planes(rng, 16, 16, [(1, 1)])
    payload, _ = encode_jpeg_progressive(planes, [(1, 1)], 16, 16)
    with pytest.raises(ValueError):
        decode_jpeg(payload[: int(len(payload) * 0.6)])
