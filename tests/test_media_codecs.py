"""Real-decode tests for the uncompressed-media codecs: numpy decoders
round-trip synthetic fixtures with golden values (a sine's RMS is A/√2),
and the Spark mapInPandas paths route real vs stubbed payloads per row.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from processor_edf_spark.operators.media_codecs import (
    UnsupportedMediaError,
    decode_image,
    decode_wav_pcm,
    encode_ppm,
    encode_wav_pcm16,
    resize_nearest,
)
from processor_edf_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_audio_features,
    extract_image_features,
)


def _bmp24(img: np.ndarray) -> bytes:
    """Minimal bottom-up 24-bit BMP writer for fixtures."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for row in img[::-1]:  # bottom-up
        line = row[:, ::-1].tobytes()  # RGB → BGR
        raster += line + b"\0" * (stride - len(line))
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(raster), 0, 0, off)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return hdr + bytes(raster)


def test_wav_pcm16_roundtrip_and_sine_rms():
    rate, freq, amp, n = 8000, 440.0, 0.5, 8000
    t = np.arange(n) / rate
    sig = amp * np.sin(2 * np.pi * freq * t)
    payload = encode_wav_pcm16(sig, rate)

    got_rate, n_ch, samples = decode_wav_pcm(payload)
    assert (got_rate, n_ch, len(samples)) == (rate, 1, n)
    np.testing.assert_allclose(samples[:, 0], sig, atol=1 / 32767 + 1e-9)
    # golden: RMS of A·sin = A/√2
    rms = np.sqrt(np.mean(samples**2))
    assert abs(rms - amp / np.sqrt(2)) < 1e-3


def test_wav_stereo_and_vendor_chunk():
    rate = 4000
    stereo = np.stack([np.linspace(-1, 1, 100), np.linspace(1, -1, 100)], axis=1)
    payload = encode_wav_pcm16(stereo, rate)
    # splice an odd-sized vendor chunk (+1 alignment pad) between fmt and
    # data — the walker must skip it, including the pad byte
    fmt_end = 12 + 8 + 16
    vendor = b"LIST" + struct.pack("<I", 5) + b"junk4" + b"\0"
    payload = payload[:fmt_end] + vendor + payload[fmt_end:]
    got_rate, n_ch, samples = decode_wav_pcm(payload)
    assert (got_rate, n_ch, samples.shape) == (rate, 2, (100, 2))


def test_wav_rejects_non_pcm():
    bad = bytearray(encode_wav_pcm16(np.zeros(10), 8000))
    struct.pack_into("<H", bad, 20, 3)  # audio_format = IEEE float
    with pytest.raises(UnsupportedMediaError):
        decode_wav_pcm(bytes(bad))


def test_bmp_and_ppm_decode_identical_image():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(_bmp24(img)), img)
    np.testing.assert_array_equal(decode_image(encode_ppm(img)), img)


def test_ppm_header_comments():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = encode_ppm(img).replace(b"P6\n", b"P6\n# a comment\n", 1)
    np.testing.assert_array_equal(decode_image(payload), img)


def test_decode_image_rejects_compressed():
    with pytest.raises(UnsupportedMediaError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\0" * 64)


def test_resize_nearest_exact_on_integer_scale():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8)
    np.testing.assert_array_equal(up[::2, ::2], img)


def test_spark_image_path_routes_real_and_stub(spark):
    img = np.full((4, 4, 3), 128, dtype=np.uint8)
    rows = [
        (1, "image", encode_ppm(img), "image/x-portable-pixmap", None),
        (2, "image", b"\xff\xd8\xff\xe0" + bytes(range(96)), "image/jpeg", None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_image_features(media).collect()}
    assert out[1]["decoded"] and (out[1]["width"], out[1]["height"]) == (4, 4)
    assert abs(out[1]["feature"][0] - 128 / 255) < 1e-6  # real channel mean
    assert not out[2]["decoded"]  # compressed → stub, flagged


def test_spark_audio_path_golden_rms(spark):
    rate, amp = 8000, 0.25
    sig = amp * np.sin(2 * np.pi * 440 * np.arange(8000) / rate)
    rows = [
        (1, "audio", encode_wav_pcm16(sig, rate), "audio/wav", None),
        (2, "audio", b"ID3\x04" + b"\0" * 60, "audio/mpeg", None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    r = out[1]
    assert r["decoded"] and r["sample_rate"] == rate and r["n_frames"] == 8000
    assert r["duration_usec"] == 1_000_000
    assert abs(r["rms"] - amp / np.sqrt(2)) < 1e-3
    assert not out[2]["decoded"] and out[2]["rms"] is None


def test_avi_demux_roundtrip():
    from processor_edf_spark.operators.media_codecs import (
        demux_avi_frames,
        encode_avi_raw,
    )

    frames = [bytes([i] * (10 + i)) for i in range(5)]  # odd+even sizes
    payload = encode_avi_raw(frames, usec_per_frame=40_000)  # 25 fps
    upf, got = demux_avi_frames(payload)
    assert upf == 40_000
    assert got == frames


def test_spark_video_path_samples_real_avi_frames(spark):
    from processor_edf_spark.operators.media_codecs import encode_avi_raw
    from processor_edf_spark.operators.multimodal import sample_frames

    frames = [bytes([i]) * 8 for i in range(50)]  # 50 frames @ 25 fps = 2 s
    avi = encode_avi_raw(frames, usec_per_frame=40_000)
    rows = [
        (1, "video", avi, "video/x-msvideo", None),
        (2, "video", bytes(range(200)), "video/mp4", None),  # stub path
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = sample_frames(media, every_usec=1_000_000, max_frames=16).collect()
    real = sorted(
        (r for r in out if r["media_id"] == 1), key=lambda r: r["frame_idx"]
    )
    # 1 s spacing over 25 fps → every 25th frame: indices 0 and 25
    assert [(r["frame_idx"], r["t_usec"]) for r in real] == [
        (0, 0), (25, 1_000_000),
    ]
    assert bytes(real[1]["frame"]) == frames[25]
    assert any(r["media_id"] == 2 for r in out)  # stub path still emits


def test_malformed_payloads_fall_back_not_crash(spark):
    """The one-exception contract: every malformed container must surface
    as UnsupportedMediaError inside the decoders, so the Spark paths fall
    back to the stub row instead of killing the task (struct.error /
    bare ValueError / degenerate dimensions all reproduce the old crash)."""
    import struct as _s

    truncated_fmt = b"RIFF" + _s.pack("<I", 20) + b"WAVE" + b"fmt " + _s.pack("<I", 4) + b"\0\0\0\0"
    zero_rate = bytearray(encode_wav_pcm16(np.zeros(4), 8000))
    _s.pack_into("<I", zero_rate, 12 + 8 + 4, 0)  # sample_rate = 0
    garbage_ppm = b"P6 abc def 255 xxxx"
    neg_width_bmp = bytearray(_bmp24(np.zeros((2, 2, 3), dtype=np.uint8)))
    _s.pack_into("<i", neg_width_bmp, 18, -5)
    lying_avi = b"RIFF" + _s.pack("<I", 100) + b"AVI " + b"LIST" + _s.pack("<I", 1 << 30) + b"hdrl"

    for payload in (truncated_fmt, bytes(zero_rate)):
        with pytest.raises(UnsupportedMediaError):
            decode_wav_pcm(bytes(payload))
    for payload in (garbage_ppm, bytes(neg_width_bmp)):
        with pytest.raises(UnsupportedMediaError):
            decode_image(bytes(payload))
    from processor_edf_spark.operators.media_codecs import demux_avi_frames
    with pytest.raises(UnsupportedMediaError):
        demux_avi_frames(lying_avi)

    # end-to-end: the audio path emits decoded=false rows, no task failure
    media = spark.createDataFrame(
        [(1, "audio", bytes(truncated_fmt), None, None),
         (2, "audio", bytes(zero_rate), None, None)],
        MEDIA_SCHEMA,
    )
    out = extract_audio_features(media).collect()
    assert len(out) == 2 and not any(r["decoded"] for r in out)

def test_avi_deep_list_nesting_no_recursion_error():
    """~1500 nested LIST headers must not blow the interpreter stack: the
    demux walk is iterative (explicit continuation stack), so a crafted
    ~24 KB payload parses (or raises UnsupportedMediaError) instead of
    escaping as RecursionError and killing the mapInPandas task."""
    from processor_edf_spark.operators.media_codecs import demux_avi_frames

    depth = 1500
    # innermost: a real avih chunk so the parse can succeed end-to-end
    body = b"avih" + struct.pack("<I", 56) + struct.pack("<I", 40_000) + b"\0" * 52
    for _ in range(depth):
        body = b"LIST" + struct.pack("<I", len(body) + 4) + b"nest" + body
    payload = b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body
    upf, frames = demux_avi_frames(payload)
    assert upf == 40_000 and frames == []


def test_avi_frame_order_preserved_across_split_movi_lists():
    """Frames split across two movi LISTs (the AVIX pattern) must demux in
    container order — pins the pre-order traversal of the iterative walk."""
    from processor_edf_spark.operators.media_codecs import demux_avi_frames

    def movi(frames):
        body = b"movi"
        for f in frames:
            body += b"00db" + struct.pack("<I", len(f)) + f + (b"\0" if len(f) & 1 else b"")
        return b"LIST" + struct.pack("<I", len(body)) + body

    avih = b"avih" + struct.pack("<I", 56) + struct.pack("<I", 40_000) + b"\0" * 52
    hdrl = b"LIST" + struct.pack("<I", len(avih) + 4) + b"hdrl" + avih
    first, second = [b"aa", b"bbb"], [b"cccc", b"d\0"]
    riff_body = b"AVI " + hdrl + movi(first) + movi(second)
    payload = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
    _, frames = demux_avi_frames(payload)
    assert frames == first + second


def test_wav_data_chunk_size_overrun_rejected():
    """A data chunk whose declared size overruns the payload must raise
    UnsupportedMediaError, not silently decode fewer samples as
    decoded=true (and a lying size must not skip later real chunks)."""
    good = bytearray(encode_wav_pcm16(np.zeros(100), 8000))
    # data chunk header sits right after the 16-byte fmt body
    data_hdr = 12 + 8 + 16
    assert bytes(good[data_hdr : data_hdr + 4]) == b"data"
    struct.pack_into("<I", good, data_hdr + 4, 10_000)  # declares past EOF
    with pytest.raises(UnsupportedMediaError):
        decode_wav_pcm(bytes(good))


# ---------------------------------------------------------------------------
# Baseline JPEG (operators/jpeg.py)
# ---------------------------------------------------------------------------


def _gradient_img(h=48, w=64):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = np.linspace(0, 255, w)[None, :].astype(np.uint8)
    img[:, :, 1] = np.linspace(0, 255, h)[:, None].astype(np.uint8)
    img[:, :, 2] = 128
    return img


def test_jpeg_roundtrip_444_and_420_golden():
    """Encoder and decoder are independent implementations of
    DCT/Huffman/zigzag sharing only the T.81 spec constants — a tight
    round-trip bound is a real golden check, not self-confirmation."""
    from processor_edf_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    img = _gradient_img()
    for sub, bound in (("444", 1.5), ("420", 3.5)):
        out = decode_jpeg(encode_jpeg_baseline(img, quality=92, subsampling=sub))
        assert out.shape == img.shape and out.dtype == np.uint8
        err = np.abs(out.astype(float) - img.astype(float))
        assert err.mean() < bound, (sub, err.mean())


def test_jpeg_solid_color_near_exact():
    from processor_edf_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    solid = np.full((16, 16, 3), [120, 130, 140], dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(solid, quality=90))
    assert np.abs(out.astype(int) - solid.astype(int)).max() <= 1


def test_jpeg_odd_dimensions_and_grayscale():
    from processor_edf_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    odd = _gradient_img()[:41, :53]
    out = decode_jpeg(encode_jpeg_baseline(odd, quality=92, subsampling="420"))
    assert out.shape == (41, 53, 3)
    assert np.abs(out.astype(float) - odd.astype(float)).mean() < 3.5

    gray = np.linspace(10, 240, 40 * 56).reshape(40, 56).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(gray, quality=92))
    assert out.shape == (40, 56, 3)
    np.testing.assert_array_equal(out[:, :, 0], out[:, :, 1])
    assert np.abs(out[:, :, 0].astype(float) - gray).mean() < 1.0


def test_jpeg_malformed_and_progressive_raise_media_error_only():
    """The one-exception hardening contract extends to JPEG: truncation,
    garbage after SOI, and non-baseline SOF markers all surface as
    UnsupportedMediaError (never struct/Index/KeyError)."""
    from processor_edf_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    good = encode_jpeg_baseline(_gradient_img(16, 16), quality=85)
    for payload in (
        good[: len(good) // 2],          # truncated mid-scan
        good[:2] + bytes(200),            # garbage after SOI
        good.replace(b"\xff\xc0", b"\xff\xc2", 1),  # progressive SOF2
        b"\xff\xd8\xff\xe0" + bytes(range(96)),     # APP0 then junk
    ):
        with pytest.raises(UnsupportedMediaError):
            decode_jpeg(payload)


def test_spark_image_path_decodes_real_jpeg(spark):
    """decode_image routes baseline JPEG for real now: the multimodal
    feature extractor reports decoded=true with correct dimensions and
    channel means (was: every JPEG fell to the stub)."""
    from processor_edf_spark.operators.jpeg import encode_jpeg_baseline

    img = np.full((12, 10, 3), [200, 100, 50], dtype=np.uint8)
    rows = [
        (1, "image", encode_jpeg_baseline(img, quality=95), "image/jpeg", None),
        (2, "image", encode_jpeg_baseline(img, 95, "420"), "image/jpeg", None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_image_features(media).collect()}
    for mid in (1, 2):
        assert out[mid]["decoded"]
        assert (out[mid]["width"], out[mid]["height"]) == (10, 12)
        assert abs(out[mid]["feature"][0] - 200 / 255) < 0.02


# ---------------------------------------------------------------------------
# PNG (operators/png.py)
# ---------------------------------------------------------------------------


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def test_png_lossless_roundtrip_all_filters():
    """PNG is lossless, so the round-trip pins EXACT equality; the
    encoder cycles filter types 0-4 per row, so a >=5-row image
    exercises every unfilter path (None/Sub/Up/Average/Paeth)."""
    from processor_edf_spark.operators.png import decode_png, encode_png

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (37, 53, 3), dtype=np.uint8)  # random = worst case
    np.testing.assert_array_equal(decode_png(encode_png(img)), img)

    gray = rng.randint(0, 256, (21, 33), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png(encode_png(gray)), np.repeat(gray[:, :, None], 3, axis=2)
    )
    rgba = rng.randint(0, 256, (10, 11, 4), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(rgba)), rgba[:, :, :3])


def test_png_palette_and_subbyte_depths():
    """Hand-built PLTE + 8/4/1-bit index payloads: palette resolution
    and sub-byte sample unpacking decode exactly."""
    import zlib

    from processor_edf_spark.operators.png import PNG_SIG, decode_png

    palette = np.array(
        [[250, 10, 20], [30, 200, 40], [5, 60, 250], [128, 128, 128]],
        dtype=np.uint8,
    )
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 3, 0]], dtype=np.uint8)

    def build(depth):
        h, w = idx.shape
        lines = bytearray()
        for y in range(h):
            lines.append(0)  # filter None
            packed = np.packbits(
                np.unpackbits(idx[y][:, None], axis=1, count=8)[:, 8 - depth :]
            )
            lines += packed.tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
        return (
            PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", palette.tobytes())
            + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
            + _png_chunk(b"IEND", b"")
        )

    for depth in (8, 4, 2):
        np.testing.assert_array_equal(decode_png(build(depth)), palette[idx])


def test_png_rejects_bad_interlace_16bit_and_malformed():
    from processor_edf_spark.operators.png import decode_png, encode_png

    good = bytearray(encode_png(np.zeros((8, 8, 3), dtype=np.uint8)))
    # IHDR body starts at 8 (sig) + 8 (len+type); interlace byte is its 13th
    bad_interlace = bytearray(good)
    bad_interlace[8 + 8 + 12] = 2  # only methods 0/1 exist
    lying_interlace = bytearray(good)
    # claims Adam7 but carries a non-interlaced scanline layout: the
    # pass layout needs MORE bytes (per-pass filter bytes), so the
    # bounded inflate comes up short — rejected, never misdecoded
    lying_interlace[8 + 8 + 12] = 1
    deep = bytearray(good)
    # claims 16-bit over an 8-bit layout: scanlines need 2x the bytes,
    # the bounded inflate comes up short — rejected, never misdecoded
    deep[8 + 8 + 8] = 16
    for payload in (
        bytes(bad_interlace),
        bytes(lying_interlace),
        bytes(deep),
        bytes(good[: len(good) // 2]),   # truncated chunk declaration
        b"\x89PNG\r\n\x1a\n" + bytes(50),  # garbage chunks
    ):
        with pytest.raises(UnsupportedMediaError):
            decode_png(payload)


def test_png_adam7_interlace_roundtrip():
    """Adam7 decode parity: the interlaced encoding of an image decodes
    byte-identically to its non-interlaced decode — every geometry
    here exercises a different subset of the seven passes (1x1 hits
    only pass 1, 2x3 leaves passes 2-5 empty, 20x11 hits all seven)."""
    from processor_edf_spark.operators.png import ADAM7, decode_png, encode_png

    # the pass table must reproduce the spec's canonical 8x8 pattern
    pat = np.zeros((8, 8), int)
    for i, (x0, y0, xs, ys) in enumerate(ADAM7, 1):
        pat[y0::ys, x0::xs] = i
    canon = np.array([
        [1, 6, 4, 6, 2, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [3, 6, 4, 6, 3, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
    ])
    assert np.array_equal(pat, canon)

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (2, 3), (7, 9), (8, 8), (20, 11), (5, 1), (1, 5)]:
        for ch in (1, 3, 4):
            img = rng.integers(
                0, 256, (h, w) if ch == 1 else (h, w, ch), dtype=np.uint8
            )
            assert np.array_equal(
                decode_png(encode_png(img)),
                decode_png(encode_png(img, interlace=True)),
            ), (h, w, ch)


def test_png_adam7_subbyte_gray():
    """Sub-byte interlaced decode: hand-assembled 2-bit gray Adam7
    (each pass's rows packed at 2 bits/sample, filter None) must equal
    the scaled gray expansion — the per-pass packing boundary is where
    a naive full-width unpack would corrupt samples."""
    import struct
    import zlib

    from processor_edf_spark.operators.png import (
        ADAM7,
        PNG_SIG,
        decode_png,
    )

    rng = np.random.default_rng(13)
    h, w, depth = 9, 7, 2
    gray_idx = rng.integers(0, 4, (h, w), dtype=np.uint8)
    lines = bytearray()
    for x0, y0, xs, ys in ADAM7:
        sub = gray_idx[y0::ys, x0::xs]
        if not sub.shape[0] or not sub.shape[1]:
            continue
        for r in range(sub.shape[0]):
            bits = np.unpackbits(sub[r][:, None], axis=1)[:, 6:8].reshape(-1)
            lines.append(0)  # filter None
            lines += np.packbits(bits).tobytes()

    def chunk(t, b):
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b))
        )

    payload = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )
    want = np.repeat((gray_idx * 85).astype(np.uint8)[:, :, None], 3, axis=2)
    assert np.array_equal(decode_png(payload), want)


def test_spark_image_path_decodes_real_png(spark):
    """decode_image routes PNG for real: decoded=true with exact
    dimensions and channel means (PNG is lossless, so the mean is exact
    to float rounding)."""
    from processor_edf_spark.operators.png import encode_png

    img = np.full((14, 9, 3), [60, 120, 240], dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image", encode_png(img), "image/png", None)], MEDIA_SCHEMA
    )
    row = extract_image_features(media).collect()[0]
    assert row["decoded"]
    assert (row["width"], row["height"]) == (9, 14)
    assert abs(row["feature"][0] - 60 / 255) < 1e-6


def test_jpeg_restart_intervals_decode_identically():
    """DRI streams (RSTn marker + DC-predictor reset every N MCUs — the
    layout camera firmware commonly writes) must decode to exactly the
    same pixels as the marker-free encoding of the same image; this is
    the only coverage of the decoder's restart realignment path."""
    from processor_edf_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    img = _gradient_img()
    for sub in ("444", "420"):
        base = decode_jpeg(encode_jpeg_baseline(img, 92, sub))
        for ri in (1, 3):
            with_dri = encode_jpeg_baseline(img, 92, sub, restart_interval=ri)
            assert b"\xff\xdd" in with_dri  # DRI segment present
            np.testing.assert_array_equal(decode_jpeg(with_dri), base)


# ---------------------------------------------------------------------------
# GIF (operators/gif.py)
# ---------------------------------------------------------------------------


def test_gif_lossless_roundtrip_and_animation():
    """LZW is lossless for palette content: single-frame round-trip pins
    exact equality; a 3-frame animation composites draw-over frames
    exactly and preserves per-frame delays."""
    from processor_edf_spark.operators.gif import (
        decode_gif,
        demux_gif_frames,
        encode_gif,
    )

    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    img = pal[rng.randint(0, 16, (33, 47))]
    np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)

    f2 = img.copy()
    f2[5:15, 5:20] = pal[0]
    f3 = f2.copy()
    f3[20:30, 30:40] = pal[1]
    delays, frames = demux_gif_frames(encode_gif([img, f2, f3], [10, 20, 30]))
    assert delays == [10, 20, 30]
    for got, want in zip(frames, [img, f2, f3]):
        np.testing.assert_array_equal(got, want)
    # frame sampling never decodes past max_frames
    _, head = demux_gif_frames(encode_gif([img, f2, f3]), max_frames=2)
    assert len(head) == 2


def test_gif_interlace_and_transparency():
    """Hand-built interlaced frame with a transparency index: the
    4-pass row reorder and the transparent-shows-background compositing
    both decode exactly."""
    from processor_edf_spark.operators.gif import _lzw_encode, decode_gif

    rng = np.random.RandomState(4)
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8
    )
    idx = rng.randint(0, 4, (16, 8)).astype(np.uint8)
    order = np.concatenate(
        [np.arange(s, 16, p) for s, p in ((0, 8), (4, 8), (2, 4), (1, 2))]
    )
    out = bytearray(b"GIF89a") + struct.pack("<HH", 8, 16) + bytes([0x81, 0, 0])
    out += pal.tobytes()
    out += bytes([0x21, 0xF9, 4, 0x01]) + struct.pack("<H", 5) + bytes([3, 0])
    out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, 8, 16) + bytes([0x40])
    data = _lzw_encode(idx[order].reshape(-1), 2)
    out += bytes([2])
    for i in range(0, len(data), 255):
        c = data[i : i + 255]
        out += bytes([len(c)]) + c
    out += bytes([0, 0x3B])

    got = decode_gif(bytes(out))
    expect = pal[idx].copy()
    expect[idx == 3] = pal[0]  # transparent pixels show the background
    np.testing.assert_array_equal(got, expect)


def test_gif_rejects_malformed():
    from processor_edf_spark.operators.gif import decode_gif, encode_gif

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    good = encode_gif(img)
    for payload in (
        good[: len(good) // 2],     # truncated sub-blocks
        b"GIF89a" + bytes(20),       # degenerate screen/no data
        b"NOTGIF" + good[6:],        # wrong signature
    ):
        with pytest.raises(UnsupportedMediaError):
            decode_gif(payload)


def test_spark_image_path_decodes_real_gif(spark):
    from processor_edf_spark.operators.gif import encode_gif

    img = np.full((11, 7, 3), [10, 250, 30], dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image", encode_gif(img), "image/gif", None)], MEDIA_SCHEMA
    )
    row = extract_image_features(media).collect()[0]
    assert row["decoded"]
    assert (row["width"], row["height"]) == (7, 11)
    assert abs(row["feature"][0] - 10 / 255) < 1e-6


def test_jpeg_progressive_decodes_identically_to_baseline():
    """Progressive (SOF2) and baseline streams of the same image share
    one quantization, so their decodes must be PIXEL-IDENTICAL — this
    single equality pins every progressive path: DC successive
    approximation, AC spectral-selection bands with EOB runs, and the
    G.1.2.3 AC refinement pass (noisy content makes every band dense)."""
    from processor_edf_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(0)
    grad = _gradient_img()
    noisy = rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
    gray = rng.randint(0, 256, (24, 40), dtype=np.uint8)
    cases = [
        (grad, 92, "444"), (grad, 92, "420"), (grad[:41, :53], 92, "420"),
        (noisy, 75, "444"), (noisy, 75, "420"), (noisy, 50, "444"),
    ]
    for im, q, sub in cases:
        np.testing.assert_array_equal(
            decode_jpeg(encode_jpeg_progressive(im, q, sub)),
            decode_jpeg(encode_jpeg_baseline(im, q, sub)),
        )
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg_progressive(gray, 92)),
        decode_jpeg(encode_jpeg_baseline(gray, 92)),
    )


def test_spark_image_path_decodes_progressive_jpeg(spark):
    from processor_edf_spark.operators.jpeg import encode_jpeg_progressive

    img = np.full((12, 10, 3), [200, 100, 50], dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image", encode_jpeg_progressive(img, 95), "image/jpeg", None)],
        MEDIA_SCHEMA,
    )
    row = extract_image_features(media).collect()[0]
    assert row["decoded"]
    assert (row["width"], row["height"]) == (10, 12)
    assert abs(row["feature"][0] - 200 / 255) < 0.02


# ---------------------------------------------------------------------------
# TIFF (operators/tiff.py)
# ---------------------------------------------------------------------------


def test_tiff_lossless_roundtrip_and_photometrics():
    """Uncompressed TIFF is lossless: strip-layout round-trips pin
    exact equality for RGB and gray; WhiteIsZero inverts."""
    from processor_edf_spark.operators.tiff import decode_tiff, encode_tiff

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (37, 53, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_tiff(encode_tiff(img)), img)
    np.testing.assert_array_equal(
        decode_tiff(encode_tiff(img, rows_per_strip=100)), img
    )
    gray = rng.randint(0, 256, (21, 33), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_tiff(encode_tiff(gray)), np.repeat(gray[:, :, None], 3, axis=2)
    )
    # WhiteIsZero: flip the photometric tag in place → inverted gray
    p = bytearray(encode_tiff(gray))
    n_tags = struct.unpack_from("<H", p, 8)[0]
    for i in range(n_tags):
        base = 10 + 12 * i
        if struct.unpack_from("<H", p, base)[0] == 262:
            struct.pack_into("<H", p, base + 8, 0)
    np.testing.assert_array_equal(decode_tiff(bytes(p))[:, :, 0], 255 - gray)


def test_tiff_rejects_lying_compression_and_malformed():
    from processor_edf_spark.operators.tiff import decode_tiff, encode_tiff

    good = bytearray(encode_tiff(np.zeros((8, 8, 3), dtype=np.uint8)))
    n_tags = struct.unpack_from("<H", good, 8)[0]

    def with_compression(scheme):
        p = bytearray(good)
        for i in range(n_tags):
            base = 10 + 12 * i
            if struct.unpack_from("<H", p, base)[0] == 259:
                struct.pack_into("<H", p, base + 8, scheme)
        return bytes(p)

    for payload in (
        with_compression(7),  # claims JPEG-in-TIFF but strips aren't JPEG
        with_compression(5),  # claims LZW but strips are raw garbage
        bytes(good[: len(good) // 2]),
        b"II*\x00" + bytes(20),
        b"XX*\x00" + bytes(good[4:]),
    ):
        with pytest.raises(UnsupportedMediaError):
            decode_tiff(payload)


def test_spark_image_path_decodes_real_tiff(spark):
    from processor_edf_spark.operators.tiff import encode_tiff

    img = np.full((13, 17, 3), [5, 90, 180], dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image", encode_tiff(img), "image/tiff", None)], MEDIA_SCHEMA
    )
    row = extract_image_features(media).collect()[0]
    assert row["decoded"]
    assert (row["width"], row["height"]) == (17, 13)
    assert abs(row["feature"][0] - 5 / 255) < 1e-6


def test_wav_g711_ulaw_alaw_decode():
    """G.711 companded WAV (formats 7/6): decode tables match the
    reference algorithm's known points, and a µ-law-encoded sine
    round-trips within companding error through the audio path."""
    from processor_edf_spark.operators.media_codecs import (
        _ALAW_DECODE,
        _ULAW_DECODE,
        encode_wav_ulaw,
    )

    # classic ulaw2linear/alaw2linear reference points
    assert _ULAW_DECODE[0xFF] == 0 and _ULAW_DECODE[0x7F] == 0
    assert _ULAW_DECODE[0x80] == 32124 and _ULAW_DECODE[0x00] == -32124
    assert _ALAW_DECODE[0x55] == -8 and _ALAW_DECODE[0xD5] == 8

    rate, amp = 8000, 0.5
    sig = amp * np.sin(2 * np.pi * 440 * np.arange(8000) / rate)
    got_rate, ch, out = decode_wav_pcm(encode_wav_ulaw(sig, rate))
    assert (got_rate, ch) == (rate, 1)
    # companding error bound at this amplitude: one µ-law segment step
    assert np.abs(out[:, 0] - sig).max() < 0.02
    assert abs(np.sqrt(np.mean(out**2)) - amp / np.sqrt(2)) < 2e-3


def test_spark_audio_path_decodes_g711(spark):
    from processor_edf_spark.operators.media_codecs import encode_wav_ulaw

    rate, amp = 8000, 0.25
    sig = amp * np.sin(2 * np.pi * 440 * np.arange(8000) / rate)
    media = spark.createDataFrame(
        [(1, "audio", encode_wav_ulaw(sig, rate), "audio/basic", None)],
        MEDIA_SCHEMA,
    )
    r = extract_audio_features(media).collect()[0]
    assert r["decoded"] and r["sample_rate"] == rate and r["n_frames"] == 8000
    assert abs(r["rms"] - amp / np.sqrt(2)) < 2e-3


def test_spark_video_path_samples_animated_gif(spark):
    """Animated GIFs go through the video frame-sampling path for real:
    frames composited, sampled on cumulative delays, emitted as
    lossless PNG bytes that decode back to the exact frame."""
    from processor_edf_spark.operators.gif import encode_gif
    from processor_edf_spark.operators.multimodal import sample_frames
    from processor_edf_spark.operators.png import decode_png

    pal = np.array([[0, 0, 0], [255, 255, 255], [200, 30, 40]], dtype=np.uint8)
    rng = np.random.RandomState(6)
    frames = [pal[rng.randint(0, 3, (12, 16))] for _ in range(6)]
    # 50 cs per frame = 0.5 s; sampling every 1 s picks frames 0, 2, 4
    gif = encode_gif(frames, delays_cs=[50] * 6)
    media = spark.createDataFrame(
        [(1, "video", gif, "image/gif", None)], MEDIA_SCHEMA
    )
    got = sorted(
        sample_frames(media, every_usec=1_000_000, max_frames=16).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [(r["frame_idx"], r["t_usec"]) for r in got] == [
        (0, 0), (2, 1_000_000), (4, 2_000_000),
    ]
    np.testing.assert_array_equal(decode_png(bytes(got[1]["frame"])), frames[2])


def test_wav_ima_adpcm_roundtrip():
    """IMA ADPCM (wav format 0x11): block headers carry the predictor
    and step index, nibbles decode with the spec's reference inner
    loop; a sine round-trips within one adaptation step, including the
    partial final block."""
    from processor_edf_spark.operators.media_codecs import (
        encode_wav_ima_adpcm,
    )

    rate, amp = 8000, 0.5
    sig = amp * np.sin(2 * np.pi * 440 * np.arange(8000) / rate)
    got_rate, ch, out = decode_wav_pcm(encode_wav_ima_adpcm(sig, rate))
    assert (got_rate, ch) == (rate, 1)
    assert len(out) >= len(sig)  # nibble padding may add a few samples
    n = len(sig)
    assert np.abs(out[:n, 0] - sig).max() < 0.03
    assert abs(np.sqrt(np.mean(out[:n] ** 2)) - amp / np.sqrt(2)) < 2e-3


def test_wav_adpcm_rejects_malformed():
    from processor_edf_spark.operators.media_codecs import (
        encode_wav_ima_adpcm,
    )

    good = bytearray(encode_wav_ima_adpcm(np.zeros(600), 8000))
    # corrupt the step index of the first block header past 88
    data_off = 12 + 8 + 16 + 8
    good[data_off + 2] = 99
    with pytest.raises(UnsupportedMediaError):
        decode_wav_pcm(bytes(good))


def test_spark_audio_path_decodes_adpcm(spark):
    from processor_edf_spark.operators.media_codecs import (
        encode_wav_ima_adpcm,
    )

    rate, amp = 8000, 0.25
    sig = amp * np.sin(2 * np.pi * 440 * np.arange(8000) / rate)
    media = spark.createDataFrame(
        [(1, "audio", encode_wav_ima_adpcm(sig, rate), "audio/wav", None)],
        MEDIA_SCHEMA,
    )
    r = extract_audio_features(media).collect()[0]
    assert r["decoded"] and r["sample_rate"] == rate
    assert abs(r["rms"] - amp / np.sqrt(2)) < 2e-3


# ---------------------------------------------------------------------------
# Optional external codec libraries (the deployment seam)
# ---------------------------------------------------------------------------


def _webp_payload() -> bytes:
    return b"RIFF" + (20).to_bytes(4, "little") + b"WEBPVP8 " + b"\x00" * 12


def test_optional_codec_detection_absent_path():
    """With no optional codec libs installed (this container), the seam
    must report the import-probed formats absent and their decoders
    must raise the one-exception contract NAMING the missing extra —
    never a crash, never a silent wrong decode.  (Plugin-backed formats
    like compressed_tiff_deflate stay available; the present-path test
    below drives one for real.)"""
    from processor_edf_spark.operators.media_codecs import (
        OPTIONAL_CODEC_LIBS,
        decode_audio,
        decode_webp,
        optional_codec_support,
    )

    support = optional_codec_support()
    assert set(support) == set(OPTIONAL_CODEC_LIBS)
    probed = {f for f, mods in OPTIONAL_CODEC_LIBS.items() if mods}
    if any(support[f] for f in probed):
        pytest.skip("optional codec libs installed; absent path untestable")
    # r13: lossy VP8 keyframes decode for REAL (operators/vp8.py), so
    # a malformed VP8 chunk raises the decoder's own one-exception
    # message, while a WebP with NO decodable chunk (VP8X-only) still
    # names the optional extra
    with pytest.raises(UnsupportedMediaError, match="vp8"):
        decode_webp(_webp_payload())
    vp8x_only = (
        b"RIFF" + (22).to_bytes(4, "little") + b"WEBPVP8X"
        + (10).to_bytes(4, "little") + b"\x00" * 10
    )
    with pytest.raises(UnsupportedMediaError, match="optional codec"):
        decode_webp(vp8x_only)
    # r13: MPEG-2/2.5 and Layer II decode for REAL too, so the
    # seam-naming contract now applies to the last honest residue —
    # a free-format stream (bitrate index 0) names the missing extra
    with pytest.raises(UnsupportedMediaError, match="free-format"):
        decode_audio(b"\xff\xfb\x00\x00" + b"\x00" * 64)
    # and a sniffed-as-MP3 payload with no actual frame is a malformed-
    # stream error from the real decoder, not a seam miss
    with pytest.raises(UnsupportedMediaError, match="mp3"):
        decode_audio(b"ID3\x04\x00" + b"\x00" * 64)
    # magic-byte router sends WebP into the same contracts
    with pytest.raises(UnsupportedMediaError, match="vp8"):
        decode_image(_webp_payload())
    with pytest.raises(UnsupportedMediaError, match="optional codec"):
        decode_image(vp8x_only)


def test_optional_codec_absent_keeps_decoded_false_contract(spark):
    """A WebP image and an MP3 audio payload flow through the Spark
    extractors as honest decoded=false rows while real payloads beside
    them decode — the per-row routing the README documents."""
    from processor_edf_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_features,
        extract_image_features,
    )

    sine = np.sin(np.linspace(0, 2 * np.pi * 55, 8000))
    rows = [
        (1, "image", encode_ppm(np.full((4, 6, 3), 7, np.uint8)), "image/x-portable-pixmap", None),
        (2, "image", _webp_payload(), "image/webp", None),
        (3, "audio", encode_wav_pcm16(sine, 8000), "audio/wav", None),
        (4, "audio", b"ID3\x04\x00" + b"\x00" * 64, "audio/mpeg", None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    img = {r["media_id"]: r["decoded"] for r in extract_image_features(media).collect()}
    aud = {r["media_id"]: r["decoded"] for r in extract_audio_features(media).collect()}
    assert img == {1: True, 2: False}
    assert aud == {3: True, 4: False}


def test_optional_codec_present_path_real_decode():
    """The PRESENT half of the seam, running for real in every
    environment: the stdlib-backed compressed_tiff_deflate plugin is
    registered by default, so a Deflate-compressed TIFF payload decodes
    decoded=true through the SAME routing that stubs the other
    compressed formats.  When Pillow is additionally installed, the
    same assertion extends to WebP — install-only, no code change."""
    import importlib.util

    from processor_edf_spark.operators.media_codecs import (
        optional_codec_support,
    )
    from processor_edf_spark.operators.tiff import encode_tiff_deflate

    support = optional_codec_support()
    assert support["compressed_tiff_deflate"] is True

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (13, 9, 3), np.uint8)
    for predictor in (1, 2):
        payload = encode_tiff_deflate(arr, rows_per_strip=5,
                                      predictor=predictor)
        assert (decode_image(payload) == arr).all(), predictor

    if importlib.util.find_spec("PIL") is not None:
        import io

        from PIL import Image

        from processor_edf_spark.operators.media_codecs import decode_webp

        warr = np.zeros((8, 8, 3), np.uint8)
        warr[:4] = (255, 0, 0)
        buf = io.BytesIO()
        Image.fromarray(warr).save(buf, format="WEBP", lossless=True)
        assert (decode_webp(buf.getvalue()) == warr).all()
        assert (decode_image(buf.getvalue()) == warr).all()


def test_deflate_tiff_plugin_spark_extractor_decodes_true(spark):
    """End-to-end through the Spark extractor: a deflate TIFF payload
    produces decoded=true with correct dims beside an uncompressed
    sibling.  Un-registering the plugin flips the SAME payload to the
    one-exception contract — checked driver-side, because plugin
    registration is a module-import-time (cluster-image) decision and
    already-running executor workers keep their imported default, which
    is exactly the deployment story."""
    from processor_edf_spark.operators.media_codecs import (
        register_codec_plugin,
        _tiff_deflate_strip_plugin,
    )
    from processor_edf_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_image_features,
    )
    from processor_edf_spark.operators.tiff import (
        encode_tiff,
        encode_tiff_deflate,
    )

    arr = np.arange(10 * 6 * 3, dtype=np.uint8).reshape(10, 6, 3)
    rows = [
        (1, "image", encode_tiff(arr), "image/tiff", None),
        (2, "image", encode_tiff_deflate(arr), "image/tiff", None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: (r["decoded"], r["width"], r["height"])
        for r in extract_image_features(media).collect()
    }
    assert got == {1: (True, 6, 10), 2: (True, 6, 10)}

    from processor_edf_spark.operators.tiff import decode_tiff

    register_codec_plugin("compressed_tiff_deflate", None)
    try:
        with pytest.raises(UnsupportedMediaError, match="plugin"):
            decode_tiff(encode_tiff_deflate(arr))
        assert (decode_tiff(encode_tiff(arr)) == arr).all()  # path intact
    finally:
        register_codec_plugin(
            "compressed_tiff_deflate", _tiff_deflate_strip_plugin
        )


def test_deflate_tiff_bomb_strip_bounded():
    """A strip that inflates far past its rows is truncated at the
    expected raster bytes (the bounded-inflate guard), and a strip that
    inflates SHORT raises the one-exception contract."""
    import struct
    import zlib

    from processor_edf_spark.operators.tiff import (
        decode_tiff,
        encode_tiff_deflate,
    )

    arr = np.full((4, 4, 3), 9, np.uint8)
    raster = arr.tobytes()  # 48 bytes
    payload = bytearray(encode_tiff_deflate(arr, rows_per_strip=4,
                                            predictor=1))
    # locate the single strip (it is the tail) and replace it
    strip = zlib.compress(raster)
    assert payload.endswith(strip)
    bomb = zlib.compress(raster + bytes(10_000_000))
    short = zlib.compress(raster[:10])
    base = bytes(payload[: len(payload) - len(strip)])

    def patch_counts(blob, n):
        # tag 279 (StripByteCounts) single-value: rewrite its value field
        out = bytearray(blob)
        ifd_off = struct.unpack_from("<I", out, 4)[0]
        (n_tags,) = struct.unpack_from("<H", out, ifd_off)
        for i in range(n_tags):
            b = ifd_off + 2 + 12 * i
            tag = struct.unpack_from("<H", out, b)[0]
            if tag == 279:
                struct.pack_into("<I", out, b + 8, n)
        return bytes(out)

    bombed = patch_counts(base + bomb, len(bomb))
    assert (decode_tiff(bombed) == arr).all()  # truncated, not inflated
    shorted = patch_counts(base + short, len(short))
    with pytest.raises(UnsupportedMediaError, match="inflates short"):
        decode_tiff(shorted)


def test_registered_plugin_takes_precedence_over_import_probe():
    """The seam's contract: whatever made optional_codec_support report
    a format available must be what decodes.  A registered webp plugin
    is invoked by decode_webp/decode_image (never a blind PIL import),
    and unregistering restores the absent-path contract."""
    from processor_edf_spark.operators.media_codecs import (
        optional_codec_support,
        register_codec_plugin,
    )

    marker = np.full((2, 3, 3), 9, np.uint8)
    register_codec_plugin("webp", lambda payload: marker)
    try:
        assert optional_codec_support()["webp"] is True
        from processor_edf_spark.operators.media_codecs import decode_webp

        assert (decode_webp(_webp_payload()) == marker).all()
        assert (decode_image(_webp_payload()) == marker).all()
    finally:
        register_codec_plugin("webp", None)


def test_lzw_tiff_plugin_real_decode_and_stress():
    """The pure-python compressed_tiff_lzw plugin is registered by
    default, so an LZW TIFF — the scheme most real scanned-document
    corpora use — decodes decoded=true in every environment.  The big
    image forces the 9→10→11→12-bit width ladder AND a mid-strip
    ClearCode table reset on both sides of the round trip."""
    from processor_edf_spark.operators.media_codecs import (
        optional_codec_support,
    )
    from processor_edf_spark.operators.tiff import encode_tiff_lzw

    assert optional_codec_support()["compressed_tiff_lzw"] is True

    rng = np.random.default_rng(11)
    for predictor in (1, 2):
        arr = rng.integers(0, 256, (13, 9, 3), np.uint8)
        payload = encode_tiff_lzw(arr, rows_per_strip=5,
                                  predictor=predictor)
        assert (decode_image(payload) == arr).all(), predictor

    # incompressible 120x120 RGB in ONE strip: 43200 raster bytes of
    # random data assign >4000 table entries — through every width bump
    # and past the 12-bit clear threshold
    big = rng.integers(0, 256, (120, 120, 3), np.uint8)
    payload = encode_tiff_lzw(big, rows_per_strip=120, predictor=1)
    assert (decode_image(payload) == big).all()


def test_lzw_bitstream_msb_first_pin():
    """Pin the wire format, not just self-consistency: one literal byte
    compresses to exactly Clear(256)·lit(7)·EOI(257) packed MSB-first
    at 9 bits — bytes computed by hand so an LSB-first or width-skewed
    implementation (GIF-style) cannot round-trip its way past this."""
    from processor_edf_spark.operators.tiff import _lzw_compress

    # 100000000 000000111 100000001 + 5 pad zeros
    # -> 10000000 00000001 11100000 00100000
    assert _lzw_compress(b"\x07") == bytes([0x80, 0x01, 0xE0, 0x20])


def test_lzw_tiff_spark_extractor_decodes_true(spark):
    """End-to-end through the Spark extractor: an LZW TIFF payload
    produces decoded=true with correct dims beside uncompressed and
    deflate siblings; un-registering the plugin flips the SAME payload
    to the one-exception contract (driver-side, same deployment story
    as the deflate twin test)."""
    from processor_edf_spark.operators.media_codecs import (
        _tiff_lzw_strip_plugin,
        register_codec_plugin,
    )
    from processor_edf_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_image_features,
    )
    from processor_edf_spark.operators.tiff import (
        decode_tiff,
        encode_tiff,
        encode_tiff_lzw,
    )

    arr = np.arange(10 * 6 * 3, dtype=np.uint8).reshape(10, 6, 3)
    rows = [
        (1, "image", encode_tiff(arr), "image/tiff", None),
        (2, "image", encode_tiff_lzw(arr), "image/tiff", None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: (r["decoded"], r["width"], r["height"])
        for r in extract_image_features(media).collect()
    }
    assert got == {1: (True, 6, 10), 2: (True, 6, 10)}

    register_codec_plugin("compressed_tiff_lzw", None)
    try:
        with pytest.raises(UnsupportedMediaError, match="plugin"):
            decode_tiff(encode_tiff_lzw(arr))
        assert (decode_tiff(encode_tiff(arr)) == arr).all()  # path intact
    finally:
        register_codec_plugin(
            "compressed_tiff_lzw", _tiff_lzw_strip_plugin
        )


def test_lzw_tiff_bomb_strip_bounded():
    """An LZW strip that expands far past its rows is truncated at the
    expected raster bytes (the bounded-inflate guard shared with the
    deflate path), and a strip that expands SHORT raises."""
    from processor_edf_spark.operators.tiff import (
        _lzw_compress,
        decode_tiff,
        encode_tiff_lzw,
    )

    arr = np.full((4, 4, 3), 9, np.uint8)
    raster = arr.tobytes()  # 48 bytes
    payload = bytearray(encode_tiff_lzw(arr, rows_per_strip=4,
                                        predictor=1))
    strip = _lzw_compress(raster)
    assert payload.endswith(strip)
    base = bytes(payload[: len(payload) - len(strip)])
    bomb = _lzw_compress(raster + bytes(1_000_000))
    short = _lzw_compress(raster[:10])

    def patch_counts(blob, n):
        out = bytearray(blob)
        ifd_off = struct.unpack_from("<I", out, 4)[0]
        (n_tags,) = struct.unpack_from("<H", out, ifd_off)
        for i in range(n_tags):
            b0 = ifd_off + 2 + 12 * i
            if struct.unpack_from("<H", out, b0)[0] == 279:
                struct.pack_into("<I", out, b0 + 8, n)
        return bytes(out)

    bombed = patch_counts(base, len(bomb)) + bomb
    assert (decode_tiff(bombed) == arr).all()  # truncated at 48 bytes
    shorted = patch_counts(base, len(short)) + short
    with pytest.raises(UnsupportedMediaError, match="short"):
        decode_tiff(shorted)


def test_unsupported_predictor_routes_to_optional_not_strip_gate():
    """An LZW TIFF claiming floating-point predictor 3 must route to
    the whole-payload optional path (one-exception contract naming the
    extra when Pillow is absent, a real decode when present) — NOT be
    rejected by the strip path's predictor gate, which only governs
    payloads decoded here."""
    from processor_edf_spark.operators.tiff import (
        decode_tiff,
        encode_tiff_lzw,
    )

    payload = bytearray(encode_tiff_lzw(
        np.zeros((6, 6, 3), np.uint8), predictor=2))
    ifd_off = struct.unpack_from("<I", payload, 4)[0]
    (n_tags,) = struct.unpack_from("<H", payload, ifd_off)
    for i in range(n_tags):
        b0 = ifd_off + 2 + 12 * i
        if struct.unpack_from("<H", payload, b0)[0] == 317:
            struct.pack_into("<H", payload, b0 + 8, 3)
    import importlib.util

    if importlib.util.find_spec("PIL") is None:
        with pytest.raises(UnsupportedMediaError,
                           match="optional codec library"):
            decode_tiff(bytes(payload))
    else:  # with the extra installed the optional route must decode
        decode_tiff(bytes(payload))


def test_lzw_eoi_at_width_boundary():
    """A stream whose FINAL data code lands the decoder's table exactly
    on the early-change boundary (next_code == 2^w−1) must still
    terminate cleanly when max_len exceeds the decoded size — the
    decoder bumps its width after that code's table add while a naive
    encoder would write EOI one bit narrower (the libtiff
    LZWPostEncode off-by-one).  254 distinct bytes = 254 data codes =
    253 adds → next_code 511 right before EOI."""
    from processor_edf_spark.operators.media_codecs import (
        _tiff_lzw_strip_plugin,
    )
    from processor_edf_spark.operators.tiff import _lzw_compress

    data = bytes(range(254))
    blob = _lzw_compress(data)
    assert _tiff_lzw_strip_plugin(blob, 10_000) == data
    # the discriminating case: a byte-padded strip (conservative
    # writers pad; slicing gives the decoder bits beyond EOI) — a
    # narrow EOI misreads as code 514 here and raised pre-fix
    assert _tiff_lzw_strip_plugin(blob + b"\x00", 10_000) == data
    # and one add short / one past the boundary round-trip too
    for n in (253, 255):
        d = (bytes(range(256)) * 2)[:n]
        b2 = _lzw_compress(d)
        assert _tiff_lzw_strip_plugin(b2 + b"\x00", 10_000) == d


def test_jpeg_tiff_strip_parity_and_tables():
    """New-style JPEG-in-TIFF (compression 7): the TIFF path must equal
    decoding each strip standalone and stacking — exact pixel parity,
    no lossy tolerance, because both sides run the SAME JPEG decoder.
    The JPEGTables (tag 347) abbreviated layout must decode to the same
    pixels AND be materially smaller (the tables dedup is its point)."""
    from processor_edf_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )
    from processor_edf_spark.operators.tiff import (
        decode_tiff,
        encode_tiff_jpeg,
    )

    x = np.arange(40)[None, :, None]
    y = np.arange(48)[:, None, None]
    img = ((x * 3 + y * 2 + np.arange(3)[None, None, :] * 40) % 256).astype(
        np.uint8
    )
    for sub in ("444", "420"):
        want = np.vstack(
            [
                decode_jpeg(encode_jpeg_baseline(img[r : r + 16], 90, sub))
                for r in range(0, 48, 16)
            ]
        )
        plain = encode_tiff_jpeg(
            img, quality=90, rows_per_strip=16, subsampling=sub
        )
        abbrev = encode_tiff_jpeg(
            img,
            quality=90,
            rows_per_strip=16,
            use_jpeg_tables=True,
            subsampling=sub,
        )
        assert np.array_equal(decode_tiff(plain), want)
        assert np.array_equal(decode_tiff(abbrev), want)
        assert len(abbrev) < len(plain) - 500  # shared tables dedup

    # grayscale + uneven last strip (40 rows over 16-row strips)
    g = ((np.arange(40)[None, :] * 5 + np.arange(40)[:, None]) % 256).astype(
        np.uint8
    )
    want = np.vstack(
        [
            decode_jpeg(encode_jpeg_baseline(g[r : r + 16], 85, "444"))
            for r in range(0, 40, 16)
        ]
    )
    payload = encode_tiff_jpeg(
        g, quality=85, rows_per_strip=16, use_jpeg_tables=True
    )
    assert np.array_equal(decode_tiff(payload), want)


def test_jpeg_tiff_spark_extractor_decodes_true(spark):
    """End-to-end through the Spark extractor: a JPEG-in-TIFF payload
    produces decoded=true with correct dims; un-registering the plugin
    flips the SAME payload to the one-exception contract (the same
    deployment story as the deflate/lzw twins)."""
    from processor_edf_spark.operators.media_codecs import (
        _tiff_jpeg_strip_plugin,
        optional_codec_support,
        register_codec_plugin,
    )
    from processor_edf_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_image_features,
    )
    from processor_edf_spark.operators.tiff import (
        decode_tiff,
        encode_tiff_jpeg,
    )

    assert optional_codec_support()["compressed_tiff_jpeg"] is True
    x = np.arange(24)[None, :, None]
    y = np.arange(32)[:, None, None]
    img = ((x * 7 + y * 3 + np.arange(3)[None, None, :] * 20) % 256).astype(
        np.uint8
    )
    payload = encode_tiff_jpeg(img, rows_per_strip=16, use_jpeg_tables=True)
    media = spark.createDataFrame(
        [(1, "image", payload, "image/tiff", None)], MEDIA_SCHEMA
    )
    got = {
        r["media_id"]: (r["decoded"], r["width"], r["height"])
        for r in extract_image_features(media).collect()
    }
    assert got == {1: (True, 24, 32)}

    register_codec_plugin("compressed_tiff_jpeg", None)
    try:
        with pytest.raises(UnsupportedMediaError, match="plugin"):
            decode_tiff(payload)
    finally:
        register_codec_plugin(
            "compressed_tiff_jpeg", _tiff_jpeg_strip_plugin
        )


def test_jpeg_tiff_malformed_guards():
    """Structural guards: a JPEGTables blob that isn't an abbreviated
    JPEG stream, an abbreviated strip missing its SOI, and a strip
    whose decoded geometry contradicts ImageWidth all raise the
    one-exception contract; truncation never escapes it."""
    from processor_edf_spark.operators.jpeg import encode_jpeg_baseline
    from processor_edf_spark.operators.tiff import (
        _assemble_tiff,
        decode_tiff,
        encode_tiff_jpeg,
    )

    strip = encode_jpeg_baseline(np.zeros((16, 8, 3), np.uint8))
    bad_tables = _assemble_tiff(
        8, 16, 3, False, [strip], 16, compression=7,
        jpeg_tables=b"\x00" * 12,
    )
    with pytest.raises(UnsupportedMediaError, match="abbreviated"):
        decode_tiff(bad_tables)

    no_soi = _assemble_tiff(
        8, 16, 3, False, [strip[2:]], 16, compression=7,
        jpeg_tables=b"\xff\xd8" + b"\xff\xdb\x00\x04\x00\x00" + b"\xff\xd9",
    )
    with pytest.raises(UnsupportedMediaError, match="SOI"):
        decode_tiff(no_soi)

    lies_about_width = _assemble_tiff(
        12, 16, 3, False, [strip], 16, compression=7
    )
    with pytest.raises(UnsupportedMediaError, match="geometry"):
        decode_tiff(lies_about_width)

    img = np.zeros((32, 16, 3), np.uint8)
    payload = encode_tiff_jpeg(img, rows_per_strip=16, use_jpeg_tables=True)
    for cut in range(0, len(payload), 37):
        try:
            decode_tiff(payload[:cut])
        except UnsupportedMediaError:
            pass


def test_png_16bit_high_byte_decode():
    """16-bit channels decode to their high byte (the spec's
    sample-depth scaling for an 8-bit consumer): sequential RGB,
    Adam7 gray, and RGBA under the Up filter (bpp is 8 bytes at
    16-bit RGBA — the filter distance the depth doubles)."""
    import struct
    import zlib

    from processor_edf_spark.operators.png import (
        ADAM7,
        PNG_SIG,
        decode_png,
    )

    def chunk(t, b):
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b))
        )

    def png(w, h, depth, color, interlace, lines):
        return (
            PNG_SIG
            + chunk(
                b"IHDR",
                struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace),
            )
            + chunk(b"IDAT", zlib.compress(bytes(lines)))
            + chunk(b"IEND", b"")
        )

    rng = np.random.default_rng(17)
    h, w = 6, 5
    img16 = rng.integers(0, 65536, (h, w, 3), dtype=np.uint16)
    lines = bytearray()
    for r in img16.astype(">u2"):
        lines.append(0)
        lines += r.tobytes()
    got = decode_png(png(w, h, 16, 2, 0, lines))
    assert np.array_equal(got, (img16 >> 8).astype(np.uint8))

    h, w = 9, 7
    g16 = rng.integers(0, 65536, (h, w), dtype=np.uint16)
    lines = bytearray()
    for x0, y0, xs, ys in ADAM7:
        sub = g16[y0::ys, x0::xs].astype(">u2")
        if not sub.shape[0] or not sub.shape[1]:
            continue
        for r in sub:
            lines.append(0)
            lines += r.tobytes()
    got = decode_png(png(w, h, 16, 0, 1, lines))
    want = np.repeat(((g16 >> 8).astype(np.uint8))[:, :, None], 3, axis=2)
    assert np.array_equal(got, want)

    h, w = 4, 3
    rgba16 = rng.integers(0, 65536, (h, w, 4), dtype=np.uint16)
    rows = [r.tobytes() for r in rgba16.astype(">u2")]
    lines = bytearray()
    prev = bytes(len(rows[0]))
    for r in rows:
        lines.append(2)  # Up filter
        cur = np.frombuffer(r, np.uint8).astype(int)
        pv = np.frombuffer(prev, np.uint8)
        lines += ((cur - pv) & 0xFF).astype(np.uint8).tobytes()
        prev = r
    got = decode_png(png(w, h, 16, 6, 0, lines))
    assert np.array_equal(got, (rgba16[:, :, :3] >> 8).astype(np.uint8))


def test_tiff_tiled_layout_all_compressions():
    """Tiled layout (TIFF 6.0 §15): lossless schemes round-trip exactly
    through padded edge tiles and the per-tile predictor; JPEG tiles
    pin exact parity against per-tile JPEG decode (same decoder both
    sides, no lossy tolerance)."""
    from processor_edf_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )
    from processor_edf_spark.operators.tiff import (
        decode_tiff,
        encode_tiff_tiled,
    )

    rng = np.random.default_rng(23)
    for comp in (1, 8, 5):
        for pred in (1, 2) if comp in (5, 8) else (1,):
            for shape in ((40, 56, 3), (17, 19, 3), (33, 20)):
                img = rng.integers(0, 256, shape, dtype=np.uint8)
                payload = encode_tiff_tiled(
                    img, 16, 16, compression=comp, predictor=pred
                )
                got = decode_tiff(payload)
                want = (
                    img if img.ndim == 3
                    else np.repeat(img[:, :, None], 3, axis=2)
                )
                assert np.array_equal(got, want), (comp, pred, shape)

    img = (
        (np.arange(40)[:, None, None] * 3
         + np.arange(56)[None, :, None] * 2
         + np.arange(3) * 30) % 256
    ).astype(np.uint8)
    got = decode_tiff(encode_tiff_tiled(img, 16, 16, compression=7,
                                        quality=92))
    want = np.zeros_like(img)
    for ty in range(3):
        for tx in range(4):
            t = np.zeros((16, 16, 3), np.uint8)
            sub = img[ty * 16 : (ty + 1) * 16, tx * 16 : (tx + 1) * 16]
            t[: sub.shape[0], : sub.shape[1]] = sub
            dec = decode_jpeg(encode_jpeg_baseline(t, 92))
            want[
                ty * 16 : min((ty + 1) * 16, 40),
                tx * 16 : min((tx + 1) * 16, 56),
            ] = dec[: 40 - ty * 16, : 56 - tx * 16]
    assert np.array_equal(got, want)


def test_tiff_tiled_guards():
    from processor_edf_spark.operators.tiff import (
        decode_tiff,
        encode_tiff_tiled,
    )

    img = np.zeros((20, 20, 3), np.uint8)
    good = bytearray(encode_tiff_tiled(img, 16, 16))
    n_tags = struct.unpack_from("<H", good, 8)[0]

    def patch_tag(payload, tag, value):
        p = bytearray(payload)
        for i in range(n_tags):
            base = 10 + 12 * i
            if struct.unpack_from("<H", p, base)[0] == tag:
                struct.pack_into("<I", p, base + 8, value)
        return bytes(p)

    # tile size not a multiple of 16
    with pytest.raises(UnsupportedMediaError, match="tile geometry"):
        decode_tiff(patch_tag(good, 322, 12))
    # ImageLength grown past what the tile grid covers
    with pytest.raises(UnsupportedMediaError, match="fewer tiles"):
        decode_tiff(patch_tag(good, 257, 100))
    # truncation never escapes the one-exception contract
    for cut in range(0, len(good), 41):
        try:
            decode_tiff(bytes(good[:cut]))
        except UnsupportedMediaError:
            pass


def _hand_tiff(endian, w, h, bits, photometric, spp, data, extra_tags=()):
    """Minimal single-strip TIFF in either byte order — the hand
    builder for forms the fixture encoders don't write (16-bit
    samples, palette ColorMap, big-endian variants thereof)."""
    e = endian
    ext = bytearray()
    ifd_off = 8
    all_tags = sorted(
        [256, 257, 258, 259, 262, 273, 277, 278, 279]
        + [t for t, _, _ in extra_tags]
    )
    n = len(all_tags)
    ext_off = ifd_off + 2 + 12 * n + 4
    bps_off = None
    if spp > 1:
        bps_off = ext_off + len(ext)
        ext += struct.pack(e + "H" * spp, *([bits] * spp))
    extras = {}
    for t, vtype, vals in extra_tags:
        fmt = {3: "H", 4: "I"}[vtype]
        if struct.calcsize(fmt) * len(vals) > 4:
            extras[t] = (vtype, len(vals), ext_off + len(ext), None)
            ext += struct.pack(e + fmt * len(vals), *vals)
        else:
            extras[t] = (vtype, len(vals), None, vals)
    data_off = ext_off + len(ext)

    def entry(tag, vtype, count, value):
        return struct.pack(e + "HHI", tag, vtype, count) + value

    def sv(v):
        return struct.pack(e + "HH", v, 0)

    def lv(v):
        return struct.pack(e + "I", v)

    ifd = struct.pack(e + "H", n)
    for t in all_tags:
        if t == 256:
            ifd += entry(256, 4, 1, lv(w))
        elif t == 257:
            ifd += entry(257, 4, 1, lv(h))
        elif t == 258:
            ifd += (
                entry(258, 3, 1, sv(bits))
                if spp == 1
                else entry(258, 3, spp, lv(bps_off))
            )
        elif t == 259:
            ifd += entry(259, 3, 1, sv(1))
        elif t == 262:
            ifd += entry(262, 3, 1, sv(photometric))
        elif t == 273:
            ifd += entry(273, 4, 1, lv(data_off))
        elif t == 277:
            ifd += entry(277, 3, 1, sv(spp))
        elif t == 278:
            ifd += entry(278, 4, 1, lv(h))
        elif t == 279:
            ifd += entry(279, 4, 1, lv(len(data)))
        else:
            vtype, count, off, inline = extras[t]
            if off is not None:
                ifd += entry(t, vtype, count, lv(off))
            else:
                fmt = {3: "H", 4: "I"}[vtype]
                packed = struct.pack(e + fmt * count, *inline)
                ifd += entry(t, vtype, count, packed.ljust(4, b"\0"))
    ifd += struct.pack(e + "I", 0)
    head = (b"II" if e == "<" else b"MM") + struct.pack(e + "HI", 42, 8)
    return head + ifd + bytes(ext) + data


def test_tiff_16bit_high_byte_both_byte_orders():
    """16-bit samples reduce to their high byte, honouring the FILE
    byte order — a little-endian read of big-endian samples would
    return the LOW byte, so the II/MM pair pins endian handling."""
    from processor_edf_spark.operators.tiff import decode_tiff

    rng = np.random.default_rng(31)
    for e, np_e in (("<", "<u2"), (">", ">u2")):
        g16 = rng.integers(0, 65536, (9, 7), dtype=np.uint16)
        got = decode_tiff(
            _hand_tiff(e, 7, 9, 16, 1, 1, g16.astype(np_e).tobytes())
        )
        want = np.repeat(((g16 >> 8).astype(np.uint8))[:, :, None], 3, axis=2)
        assert np.array_equal(got, want), e
        rgb16 = rng.integers(0, 65536, (5, 4, 3), dtype=np.uint16)
        got = decode_tiff(
            _hand_tiff(e, 4, 5, 16, 2, 3, rgb16.astype(np_e).tobytes())
        )
        assert np.array_equal(got, (rgb16 >> 8).astype(np.uint8)), e


def test_tiff_palette_colormap():
    """Photometric 3: 8-bit indices resolve through the 3 x 256 16-bit
    ColorMap (tag 320), entries reduced to their high byte."""
    from processor_edf_spark.operators.tiff import decode_tiff

    rng = np.random.default_rng(33)
    idx = rng.integers(0, 256, (6, 8), dtype=np.uint8)
    cmap16 = rng.integers(0, 65536, (3, 256), dtype=np.uint16)
    payload = _hand_tiff(
        "<", 8, 6, 8, 3, 1, idx.tobytes(),
        extra_tags=[(320, 3, [int(v) for v in cmap16.reshape(-1)])],
    )
    got = decode_tiff(payload)
    assert np.array_equal(got, (cmap16.T >> 8).astype(np.uint8)[idx])

    # a short ColorMap is rejected, not misindexed
    bad = _hand_tiff(
        "<", 8, 6, 8, 3, 1, idx.tobytes(),
        extra_tags=[(320, 3, [0] * 100)],
    )
    with pytest.raises(UnsupportedMediaError, match="ColorMap"):
        decode_tiff(bad)


def _hand_wav(fmt_body, data):
    hdr = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(data))
        + b"WAVE"
    )
    hdr += b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def test_wav_24bit_float_and_extensible():
    """The pro-audio WAV layouts: 24-bit packed PCM (3-byte
    little-endian, sign-extended at bit 23), IEEE float (formats 3 /
    32- and 64-bit), and WAVE_FORMAT_EXTENSIBLE (0xFFFE) whose real
    code lives in the SubFormat GUID — a non-standard GUID suffix is
    rejected, never misread."""
    from processor_edf_spark.operators.media_codecs import decode_wav_pcm

    rng = np.random.default_rng(19)
    n = 40
    vals = rng.integers(-(1 << 23), 1 << 23, n * 2, dtype=np.int32)
    b = np.zeros((n * 2, 3), np.uint8)
    b[:, 0] = vals & 0xFF
    b[:, 1] = (vals >> 8) & 0xFF
    b[:, 2] = (vals >> 16) & 0xFF
    want = vals.reshape(-1, 2).astype(np.float64) / (1 << 23)

    fmt24 = struct.pack("<HHIIHH", 1, 2, 16000, 16000 * 6, 6, 24)
    rate, ch, dec = decode_wav_pcm(_hand_wav(fmt24, b.tobytes()))
    assert (rate, ch) == (16000, 2)
    assert np.array_equal(dec, want)

    f4 = rng.uniform(-1, 1, 50).astype("<f4")
    fmt3 = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    _, _, dec = decode_wav_pcm(_hand_wav(fmt3, f4.tobytes()))
    assert np.array_equal(dec[:, 0], f4.astype(np.float64))

    f8 = rng.uniform(-1, 1, 60).astype("<f8")
    fmt3b = struct.pack("<HHIIHH", 3, 2, 8000, 8000 * 16, 16, 64)
    _, _, dec = decode_wav_pcm(_hand_wav(fmt3b, f8.tobytes()))
    assert np.array_equal(dec, f8.reshape(-1, 2))

    guid = (
        struct.pack("<H", 1)
        + b"\x00\x00"
        + b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    )
    ext = (
        struct.pack("<HHIIHH", 0xFFFE, 2, 16000, 16000 * 6, 6, 24)
        + struct.pack("<HHI", 22, 24, 0x3)
        + guid
    )
    _, _, dec = decode_wav_pcm(_hand_wav(ext, b.tobytes()))
    assert np.array_equal(dec, want)

    bad = bytearray(ext)
    bad[30] ^= 0xFF
    with pytest.raises(UnsupportedMediaError, match="GUID"):
        decode_wav_pcm(_hand_wav(bytes(bad), b.tobytes()))
    short = ext[:30]
    with pytest.raises(UnsupportedMediaError, match="extensible"):
        decode_wav_pcm(_hand_wav(short, b.tobytes()))


def _hand_bmp(width, height, bpp, comp, pal, pixel_data, top_down=False):
    hdr_size = 40
    pal_bytes = b"".join(
        struct.pack("<BBBB", b, g, r, 0) for r, g, b in pal
    )
    data_offset = 14 + hdr_size + len(pal_bytes)
    h = height if not top_down else -height
    info = struct.pack(
        "<IiiHHIIiiII", hdr_size, width, h, 1, bpp, comp,
        len(pixel_data), 0, 0, len(pal), 0,
    )
    head = b"BM" + struct.pack(
        "<IHHI", data_offset + len(pixel_data), 0, 0, data_offset
    )
    return head + info + pal_bytes + pixel_data


def test_bmp_palette_and_rle_layouts():
    """BMP beyond 24/32-bit: 1/4/8-bit palette rows (stride-padded,
    MSB-first sub-byte indices), RLE8 runs and RLE4 absolute mode
    (word-aligned literals, alternating-nibble runs), and the
    RLE-vs-bpp pairing guard."""
    from processor_edf_spark.operators.media_codecs import decode_image

    rng = np.random.default_rng(41)
    w, h = 7, 5
    pal = [tuple(int(v) for v in rng.integers(0, 256, 3))
           for _ in range(256)]
    idx = rng.integers(0, 256, (h, w), dtype=np.uint8)
    want = np.array(pal, np.uint8)[idx]

    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w] = idx[::-1]  # stored bottom-up
    assert np.array_equal(
        decode_image(_hand_bmp(w, h, 8, 0, pal, rows.tobytes())), want
    )

    pal16 = [tuple(int(v) for v in rng.integers(0, 256, 3))
             for _ in range(16)]
    idx4 = rng.integers(0, 16, (h, w), dtype=np.uint8)
    packed = []
    for r in idx4[::-1]:
        bits = np.zeros(((w + 1) // 2) * 2, np.uint8)
        bits[:w] = r
        by = (bits[0::2] << 4) | bits[1::2]
        row = np.zeros(((len(by) + 3) & ~3,), np.uint8)
        row[: len(by)] = by
        packed.append(row.tobytes())
    assert np.array_equal(
        decode_image(_hand_bmp(w, h, 4, 0, pal16, b"".join(packed))),
        np.array(pal16, np.uint8)[idx4],
    )

    pal2 = [(0, 0, 0), (255, 255, 255)]
    idx1 = rng.integers(0, 2, (h, w), dtype=np.uint8)
    packed = []
    for r in idx1[::-1]:
        by = np.packbits(r)
        row = np.zeros(((len(by) + 3) & ~3,), np.uint8)
        row[: len(by)] = by
        packed.append(row.tobytes())
    assert np.array_equal(
        decode_image(_hand_bmp(w, h, 1, 0, pal2, b"".join(packed))),
        np.array(pal2, np.uint8)[idx1],
    )

    rle = bytearray()
    for r in idx[::-1]:
        x = 0
        while x < w:
            run = 1
            while x + run < w and r[x + run] == r[x] and run < 255:
                run += 1
            rle += bytes([run, r[x]])
            x += run
        rle += b"\x00\x00"  # end of line
    rle += b"\x00\x01"  # end of bitmap
    assert np.array_equal(
        decode_image(_hand_bmp(w, h, 8, 1, pal, bytes(rle))), want
    )

    rle4 = bytearray()
    for r in idx4[::-1]:
        rle4 += bytes([0, w])  # absolute run of the whole row
        nibs = list(r) + ([0] if w % 2 else [])
        for a, b in zip(nibs[0::2], nibs[1::2]):
            rle4 += bytes([(a << 4) | b])
        if ((w + 1) // 2) % 2:
            rle4 += b"\x00"  # word alignment
        rle4 += b"\x00\x00"
    rle4 += b"\x00\x01"
    assert np.array_equal(
        decode_image(_hand_bmp(w, h, 4, 2, pal16, bytes(rle4))),
        np.array(pal16, np.uint8)[idx4],
    )

    with pytest.raises(UnsupportedMediaError, match="RLE"):
        decode_image(_hand_bmp(w, h, 24, 1, [], b"\x00\x01"))
    # truncation under the one-exception contract
    good = _hand_bmp(w, h, 8, 1, pal, bytes(rle))
    for cut in range(0, len(good), 53):
        try:
            decode_image(good[:cut])
        except UnsupportedMediaError:
            pass


def test_pgm_p5_graymap():
    from processor_edf_spark.operators.media_codecs import decode_image

    rng = np.random.default_rng(43)
    g = rng.integers(0, 256, (6, 9), dtype=np.uint8)
    payload = b"P5\n# comment\n9 6\n255\n" + g.tobytes()
    assert np.array_equal(
        decode_image(payload), np.repeat(g[:, :, None], 3, axis=2)
    )
    with pytest.raises(UnsupportedMediaError, match="truncated"):
        decode_image(b"P5\n9 6\n255\n" + g.tobytes()[:-1])


def test_packbits_tiff_plugin_roundtrip_and_long_runs():
    """The pure-python compressed_tiff_packbits plugin (TIFF 6.0 §9,
    compression 32773 — common in scanned-document corpora) is
    registered by default.  Round trips cover both predictors,
    multi-strip layouts, and >128-byte runs that must split across
    replicate codes."""
    from processor_edf_spark.operators.media_codecs import (
        decode_image,
        optional_codec_support,
    )
    from processor_edf_spark.operators.tiff import encode_tiff_packbits

    assert optional_codec_support()["compressed_tiff_packbits"] is True

    rng = np.random.default_rng(23)
    for predictor in (1, 2):
        arr = rng.integers(0, 256, (13, 9, 3), np.uint8)
        payload = encode_tiff_packbits(
            arr, rows_per_strip=5, predictor=predictor
        )
        assert (decode_image(payload) == arr).all(), predictor

    # a 200-pixel-wide constant row = a 600-byte run per row: the
    # packer must split it into 128-byte replicate groups
    flat = np.full((7, 200, 3), 0x5A, np.uint8)
    payload = encode_tiff_packbits(flat, rows_per_strip=3)
    assert (decode_image(payload) == flat).all()

    # grayscale single-strip
    g = rng.integers(0, 256, (6, 11), np.uint8)
    assert (
        decode_image(encode_tiff_packbits(g, rows_per_strip=6))
        == np.repeat(g[:, :, None], 3, axis=2)
    ).all()


def test_packbits_wire_format_spec_example_pin():
    """Pin the wire format against the TIFF 6.0 §9 worked example —
    both directions — so a sign-flipped or off-by-one control-byte
    scheme cannot round-trip its way past this."""
    from processor_edf_spark.operators.media_codecs import (
        _tiff_packbits_strip_plugin,
    )
    from processor_edf_spark.operators.tiff import _packbits_compress

    unpacked = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22" + "AA" * 10)
    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    assert _packbits_compress(unpacked) == packed
    assert _tiff_packbits_strip_plugin(packed, 1 << 10) == unpacked
    # -128 control byte is a no-op per the spec
    assert _tiff_packbits_strip_plugin(b"\x80\x00A", 16) == b"A"


def test_packbits_malformed_and_bomb_bounded():
    """A literal run past the strip end and a replicate code with no
    operand raise the one exception type; output is bounded at the
    expected raster bytes so an expanding strip cannot inflate."""
    from processor_edf_spark.operators.media_codecs import (
        UnsupportedMediaError,
        _tiff_packbits_strip_plugin,
    )

    with pytest.raises(UnsupportedMediaError, match="literal"):
        _tiff_packbits_strip_plugin(b"\x05AB", 64)
    with pytest.raises(UnsupportedMediaError, match="replicate"):
        _tiff_packbits_strip_plugin(b"\xfe", 64)
    # 4 replicate codes of 128 bytes each, bound at 100 — stops early
    bomb = b"\x81\xff" * 4
    assert _tiff_packbits_strip_plugin(bomb, 100) == b"\xff" * 100
