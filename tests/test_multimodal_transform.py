"""r11: image resize/re-encode and audio feature ops.

References are independent: bilinear against a direct per-pixel loop,
spectrogram against a naive O(n^2) DFT, mel filterbank against the HTK
formula evaluated pointwise, PNG encode via decode round-trip (the
decoder is spec-pinned separately)."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from volga_spark.operators.multimodal import (
    decode_png,
    encode_png,
    frame_signal,
    mel_filterbank,
    resize_image,
    spectrogram,
)


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_encode_png_roundtrip(ch):
    rng = np.random.default_rng(ch)
    shape = (9, 7) if ch == 1 else (9, 7, ch)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


def test_resize_nearest_integer_upscale_is_replication():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    up = resize_image(img, (8, 10), "nearest")
    assert (up == np.repeat(np.repeat(img, 2, 0), 2, 1)).all()
    # downscale back picks one representative from each 2x2 cell
    down = resize_image(up, (4, 5), "nearest")
    assert (down == img).all()


def test_resize_bilinear_matches_direct_loop():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    out_h, out_w = 11, 4
    got = resize_image(img, (out_h, out_w), "bilinear")
    h, w = img.shape[:2]
    want = np.empty((out_h, out_w, 3), dtype=np.uint8)
    for oy in range(out_h):
        for ox in range(out_w):
            fy = (oy + 0.5) * h / out_h - 0.5
            fx = (ox + 0.5) * w / out_w - 0.5
            y0 = int(np.clip(np.floor(fy), 0, h - 1))
            x0 = int(np.clip(np.floor(fx), 0, w - 1))
            y1 = min(y0 + 1, h - 1)
            x1 = min(x0 + 1, w - 1)
            wy = min(max(fy - y0, 0.0), 1.0)
            wx = min(max(fx - x0, 0.0), 1.0)
            px = (
                img[y0, x0].astype(float) * (1 - wy) * (1 - wx)
                + img[y0, x1].astype(float) * (1 - wy) * wx
                + img[y1, x0].astype(float) * wy * (1 - wx)
                + img[y1, x1].astype(float) * wy * wx
            )
            want[oy, ox] = np.clip(np.round(px), 0, 255)
    assert (got == want).all()


def test_resize_identity_is_noop_bilinear():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 8), dtype=np.uint8)
    assert (resize_image(img, (5, 8), "bilinear") == img).all()
    assert (resize_image(img, (5, 8), "nearest") == img).all()


def test_spectrogram_matches_naive_dft_and_peaks_at_tone():
    rng = np.random.default_rng(4)
    n_fft, hop = 64, 32
    x = rng.standard_normal(256)
    got = spectrogram(x, n_fft, hop)
    frames = frame_signal(x, n_fft, hop)
    assert got.shape == (len(frames), n_fft // 2 + 1)
    # naive DFT on the first frame
    f0 = frames[0]
    for k in range(n_fft // 2 + 1):
        re = sum(f0[t] * np.cos(-2 * np.pi * k * t / n_fft) for t in range(n_fft))
        im = sum(f0[t] * np.sin(-2 * np.pi * k * t / n_fft) for t in range(n_fft))
        assert got[0, k] == pytest.approx(re * re + im * im, rel=1e-9, abs=1e-9)
    # a pure tone at bin 8 must peak at bin 8
    tone = np.sin(2 * np.pi * 8 * np.arange(256) / n_fft)
    s = spectrogram(tone, n_fft, hop)
    assert (s.mean(axis=0).argmax()) == 8


def test_mel_filterbank_formula_and_coverage():
    fb = mel_filterbank(10, 128, 16000)
    assert fb.shape == (10, 65)
    # triangles are peak-normalized to 1 at their CENTER frequency; on the
    # discrete bin grid the sampled max sits just under it
    assert fb.min() >= 0 and 0.95 <= fb.max() <= 1.0 + 1e-12
    # every filter peaks at its center frequency per the HTK formula
    def from_mel(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    def to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)
    pts = np.linspace(to_mel(0.0), to_mel(8000.0), 12)
    freqs = np.fft.rfftfreq(128, d=1.0 / 16000)
    for m in range(10):
        center = from_mel(pts[m + 1])
        peak_bin = fb[m].argmax()
        # the peak bin is the closest bin to the center frequency (ties
        # aside at the coarse 125 Hz grid)
        assert abs(freqs[peak_bin] - center) <= 16000 / 128 + 1e-9


def _wav_bytes(samples: np.ndarray, rate: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_transform_images_on_spark(spark):
    from volga_spark.operators.multimodal import decode_image, transform_images

    rng = np.random.default_rng(5)
    rows = []
    originals = {}
    for doc_id in range(6):
        img = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
        originals[doc_id] = img
        rows.append((doc_id, bytearray(encode_png(img))))
    rows.append((99, bytearray(b"not an image at all")))
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r["doc_id"]: r for r in transform_images(df, (6, 5)).collect()}
    assert out[99]["payload"] is None and out[99]["err"] == "NotImplementedError"
    for doc_id, img in originals.items():
        row = out[doc_id]
        assert row["err"] is None
        assert (row["height"], row["width"]) == (6, 5)
        got = decode_image(bytes(row["payload"]))
        assert (got == resize_image(img, (6, 5))).all()


def test_extract_audio_features_on_spark(spark):
    from volga_spark.operators.multimodal import extract_audio_features

    rate, n_fft = 8000, 256
    rows = []
    for doc_id, freq_bin in ((0, 10), (1, 40)):
        t = np.arange(rate)  # 1s
        tone = (
            (np.sin(2 * np.pi * freq_bin * t / n_fft) * 20000)
            .astype("<i2")
            .reshape(-1, 1)
        )
        rows.append((doc_id, bytearray(_wav_bytes(tone, rate))))
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {
        r["doc_id"]: r
        for r in extract_audio_features(df, n_fft=n_fft, hop=128, n_mels=12).collect()
    }
    assert out[0]["sample_rate"] == rate
    assert out[0]["n_frames"] == 1 + (rate - n_fft) // 128
    # the higher tone concentrates energy in higher mel bands: the argmax
    # band of doc 1 must exceed doc 0's
    assert int(np.argmax(out[1]["log_mel"])) > int(np.argmax(out[0]["log_mel"]))


def test_resize_bilinear_uint16_keeps_range():
    """16-bit inputs must clamp to the uint16 range, not 255."""
    img = np.full((4, 4), 60000, dtype=np.uint16)
    out = resize_image(img, (2, 2), "bilinear")
    assert out.dtype == np.uint16
    assert (out == 60000).all()


def test_transform_images_quarantines_corrupt_containers(spark):
    """Corrupt-but-magic-valid payloads (bad zlib stream, bad LZW code,
    truncated header) must land in the err column, not fail the task."""
    from volga_spark.operators.multimodal import transform_images

    rng = np.random.default_rng(6)
    good = encode_png(rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8))
    corrupt_png = good[:40] + b"\x00" * 10 + good[50:]  # wreck the IDAT
    truncated_gif = b"GIF89a" + b"\x05\x00\x05\x00"  # header cut short
    df = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytearray(corrupt_png)),
            (3, bytearray(truncated_gif)),
        ],
        "doc_id bigint, payload binary",
    )
    out = {r["doc_id"]: r for r in transform_images(df, (3, 3)).collect()}
    assert out[1]["err"] is None and out[1]["payload"] is not None
    assert out[2]["err"] is not None and out[2]["payload"] is None
    assert out[3]["err"] is not None and out[3]["payload"] is None


def test_extract_audio_features_quarantines_corrupt_wav(spark):
    from volga_spark.operators.multimodal import extract_audio_features

    t = np.arange(4000)
    tone = (np.sin(2 * np.pi * 10 * t / 256) * 20000).astype("<i2").reshape(-1, 1)
    df = spark.createDataFrame(
        [
            (1, bytearray(_wav_bytes(tone, 8000))),
            (2, bytearray(b"RIFF\x10\x00\x00\x00WAVEjunk")),
            (3, bytearray(b"definitely not audio")),
        ],
        "doc_id bigint, payload binary",
    )
    out = {r["doc_id"]: r for r in extract_audio_features(df).collect()}
    assert out[1]["err"] is None and out[1]["log_mel"] is not None
    assert out[2]["err"] is not None and out[2]["log_mel"] is None
    assert out[3]["err"] is not None


def test_transform_images_float_decoder_scales_not_blackens(spark):
    """An injected decoder returning 0..1 floats must scale to 0..255,
    not floor-divide to all-black (r11 review)."""
    from volga_spark.operators.multimodal import decode_image, transform_images

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)

    def float_decoder(payload: bytes) -> np.ndarray:
        return decode_image(payload).astype(np.float64) / 255.0

    df = spark.createDataFrame(
        [(1, bytearray(encode_png(img)))], "doc_id bigint, payload binary"
    )
    row = transform_images(df, (8, 8), decoder=float_decoder).collect()[0]
    assert row["err"] is None
    got = decode_png(bytes(row["payload"]))
    assert (got == img).all()  # identity resize + exact 255-rescale
