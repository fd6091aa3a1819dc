"""Image resize (nearest + bilinear) and audio STFT spectrogram: numpy
kernels against loop-reference/golden values, and the Spark mapInPandas
paths end-to-end (decode → transform → re-encode), with the stub
fallback contract for undecodable payloads."""

from __future__ import annotations

import numpy as np
import pytest

from processor_edf_spark.operators.media_codecs import (
    decode_image,
    encode_ppm,
    encode_wav_pcm16,
    resize_bilinear,
)
from processor_edf_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_audio_spectrogram,
    resize_images,
)


def _bilinear_ref(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Per-pixel loop reference for the vectorized kernel (pixel-center,
    edge-clamped)."""
    h, w = img.shape[:2]
    out = np.zeros((out_h, out_w) + img.shape[2:], dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            sy = (i + 0.5) * h / out_h - 0.5
            sx = (j + 0.5) * w / out_w - 0.5
            y0 = min(max(int(np.floor(sy)), 0), h - 1)
            x0 = min(max(int(np.floor(sx)), 0), w - 1)
            y1 = min(y0 + 1, h - 1)
            x1 = min(x0 + 1, w - 1)
            wy = min(max(sy - y0, 0.0), 1.0)
            wx = min(max(sx - x0, 0.0), 1.0)
            top = img[y0, x0] * (1 - wx) + img[y0, x1] * wx
            bot = img[y1, x0] * (1 - wx) + img[y1, x1] * wx
            out[i, j] = top * (1 - wy) + bot * wy
    return out


def test_bilinear_matches_loop_reference():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    for out_w, out_h in ((3, 4), (14, 10), (7, 5)):
        # float path: bit-tight against the loop reference (the kernel's
        # lerp form a+(b-a)·w differs from a·(1-w)+b·w by ≤1 ulp)
        np.testing.assert_allclose(
            resize_bilinear(img.astype(np.float64), out_w, out_h),
            _bilinear_ref(img, out_w, out_h),
            rtol=1e-12,
            atol=1e-9,
        )
        # uint8 path: a 1-ulp float difference may flip rint at an exact
        # .5 boundary — allow ±1 count there, nowhere else
        got = resize_bilinear(img, out_w, out_h)
        ref = np.clip(np.rint(_bilinear_ref(img, out_w, out_h)), 0, 255)
        assert np.abs(got.astype(np.int64) - ref.astype(np.int64)).max() <= 1


def test_bilinear_constant_and_identity():
    img = np.full((6, 6, 3), 77, dtype=np.uint8)
    assert (resize_bilinear(img, 13, 3) == 77).all()
    ramp = np.tile(np.arange(8, dtype=np.float64), (8, 1))
    np.testing.assert_allclose(resize_bilinear(ramp, 8, 8), ramp)


def test_spark_resize_images_roundtrips_png(spark):
    grad = (
        np.arange(8)[:, None, None] * 32
        + np.arange(8)[None, :, None] * np.array([0, 1, 2])[None, None, :]
    ).astype(np.uint8)
    rows = [
        (1, "image", encode_ppm(grad), "image/x-portable-pixmap", None),
        (2, "image", b"RIFFxxxxWEBP" + bytes(32), "image/webp", None),
        (3, "audio", b"\x01", "audio/wav", None),  # filtered out by kind
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in resize_images(media, 4, 4).collect()}
    assert set(out) == {1, 2}
    r = out[1]
    assert r["decoded"] and (r["src_width"], r["src_height"]) == (8, 8)
    assert (r["width"], r["height"]) == (4, 4)
    # PNG is lossless: decoding the sink bytes reproduces the resize exactly
    np.testing.assert_array_equal(
        decode_image(bytes(r["png"])), resize_bilinear(grad, 4, 4)
    )
    assert not out[2]["decoded"] and out[2]["png"] is None


def test_spark_resize_images_nearest_and_bad_method(spark):
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    media = spark.createDataFrame(
        [(1, "image", encode_ppm(img), None, None)], MEDIA_SCHEMA
    )
    r = resize_images(media, 2, 2, method="nearest").collect()[0]
    np.testing.assert_array_equal(
        decode_image(bytes(r["png"])), img[::2, ::2]  # exact integer stride
    )
    with pytest.raises(ValueError, match="bilinear|nearest"):
        resize_images(media, 2, 2, method="bicubic")


def test_spark_spectrogram_golden_sine_peak(spark):
    rate, freq, n_fft = 8000, 1000.0, 256
    sig = 0.5 * np.sin(2 * np.pi * freq * np.arange(4 * rate) / rate)
    rows = [
        (1, "audio", encode_wav_pcm16(sig, rate), "audio/wav", None),
        (2, "audio", b"ID3\x04" + b"\0" * 60, "audio/mpeg", None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r["media_id"]: r
        for r in extract_audio_spectrogram(media, n_fft=n_fft).collect()
    }
    r = out[1]
    assert r["decoded"] and r["sample_rate"] == rate
    # peak bin within one FFT bin (rate/n_fft Hz) of the true tone
    assert abs(r["peak_freq_hz"] - freq) <= rate / n_fft
    # the band holding 1 kHz dominates; a far band is way down
    bands = r["band_energy_db"]
    assert len(bands) == 16
    # band containing the tone's rfft bin, under the same array_split
    # partition of the n_fft//2+1 bins the operator uses
    tone_bin = round(freq * n_fft / rate)
    splits = np.array_split(np.arange(n_fft // 2 + 1), 16)
    tone_band = next(i for i, s in enumerate(splits) if tone_bin in s)
    assert int(np.argmax(bands)) == tone_band
    assert bands[tone_band] - bands[-1] > 30.0  # ≥30 dB above the top band
    assert not out[2]["decoded"] and out[2]["band_energy_db"] is None


def test_spectrogram_short_clip_pads_to_one_frame(spark):
    rate = 8000
    sig = 0.3 * np.sin(2 * np.pi * 500 * np.arange(100) / rate)  # < n_fft
    media = spark.createDataFrame(
        [(1, "audio", encode_wav_pcm16(sig, rate), None, None)], MEDIA_SCHEMA
    )
    r = extract_audio_spectrogram(media).collect()[0]
    assert r["decoded"] and r["n_fft_frames"] == 1
