"""Property-based fuzz of the image decoders' one-exception contract:
for ARBITRARY bytes (random, truncated-valid, bit-flipped-valid), every
decoder either returns a valid HxWx3 uint8 array or raises
UnsupportedMediaError — never struct/Index/Key/Value/zlib errors and
never a wrong-shaped result.  The mapInPandas stub fallbacks catch
exactly UnsupportedMediaError, so any other escape would kill a whole
Arrow batch at corpus scale (the TAL-fuzz discipline applied to the
media path)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from processor_edf_spark.operators.jpeg import decode_jpeg, encode_jpeg_baseline
from processor_edf_spark.operators.media_codecs import (
    UnsupportedMediaError,
    decode_image,
)
from processor_edf_spark.operators.png import decode_png, encode_png

_SETTINGS = dict(max_examples=60, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


def _check(decoder, payload):
    try:
        out = decoder(payload)
    except UnsupportedMediaError:
        return
    assert isinstance(out, np.ndarray) and out.dtype == np.uint8
    assert out.ndim == 3 and out.shape[2] == 3


_IMG = np.arange(16 * 24 * 3, dtype=np.uint8).reshape(16, 24, 3)
_GOOD_JPEG = encode_jpeg_baseline(_IMG, quality=80)
_GOOD_PNG = encode_png(_IMG)


@settings(**_SETTINGS)
@given(st.binary(min_size=0, max_size=400))
def test_random_bytes_never_escape_media_error(data):
    for prefix in (b"", b"\xff\xd8", b"\x89PNG\r\n\x1a\n", b"BM", b"P6"):
        _check(decode_image, prefix + data)


@settings(**_SETTINGS)
@given(st.integers(min_value=0, max_value=len(_GOOD_JPEG) - 1))
def test_truncated_jpeg_never_escapes(cut):
    _check(decode_jpeg, _GOOD_JPEG[:cut])


@settings(**_SETTINGS)
@given(st.integers(min_value=0, max_value=len(_GOOD_PNG) - 1))
def test_truncated_png_never_escapes(cut):
    _check(decode_png, _GOOD_PNG[:cut])


@settings(**_SETTINGS)
@given(
    st.integers(min_value=2, max_value=len(_GOOD_JPEG) - 1),
    st.integers(min_value=0, max_value=7),
)
def test_bitflipped_jpeg_never_escapes(pos, bit):
    b = bytearray(_GOOD_JPEG)
    b[pos] ^= 1 << bit
    _check(decode_jpeg, bytes(b))


@settings(**_SETTINGS)
@given(
    st.integers(min_value=8, max_value=len(_GOOD_PNG) - 1),
    st.integers(min_value=0, max_value=7),
)
def test_bitflipped_png_never_escapes(pos, bit):
    b = bytearray(_GOOD_PNG)
    b[pos] ^= 1 << bit
    _check(decode_png, bytes(b))


def test_lying_dimensions_rejected_before_allocation():
    """Headers declaring absurd dimensions must raise the media error
    BEFORE any proportional allocation: a few flipped header bits must
    not cost gigabytes on an executor."""
    import struct
    import zlib

    from processor_edf_spark.operators.png import PNG_SIG

    # PNG: IHDR says 2^15 x 2^15 (1 GP) with a tiny IDAT
    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b))

    ihdr = struct.pack(">IIBBBBB", 1 << 15, 1 << 15, 8, 2, 0, 0, 0)
    huge_png = (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\0" * 64))
        + chunk(b"IEND", b"")
    )
    _check(decode_png, huge_png)  # must raise, and fast

    # JPEG: rewrite SOF0 dims of a valid stream to 65000 x 65000
    b = bytearray(_GOOD_JPEG)
    sof = bytes(b).index(b"\xff\xc0")
    struct.pack_into(">HH", b, sof + 5, 65000, 65000)
    _check(decode_jpeg, bytes(b))


def test_png_deflate_bomb_bounded():
    """An IDAT that inflates far past the declared image size must not
    materialize: the inflate is capped at exactly the bytes the image
    needs."""
    import struct
    import zlib

    from processor_edf_spark.operators.png import PNG_SIG

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b))

    # 2x2 RGB image, but the IDAT inflates to 64 MB of zeros
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bomb = zlib.compress(b"\0" * (64 << 20), 9)  # ~64 KB compressed
    payload = (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", bomb)
        + chunk(b"IEND", b"")
    )
    out = decode_png(payload)  # decodes the 2x2 prefix, ignores the rest
    assert out.shape == (2, 2, 3)


from processor_edf_spark.operators.gif import decode_gif, encode_gif  # noqa: E402

_GOOD_GIF = encode_gif(_IMG[:8, :8] // 32 * 32)  # ≤256 colors


@settings(**_SETTINGS)
@given(st.binary(min_size=0, max_size=400))
def test_random_bytes_gif_never_escapes(data):
    for prefix in (b"", b"GIF89a", b"GIF87a"):
        _check(decode_gif, prefix + data)


@settings(**_SETTINGS)
@given(st.integers(min_value=0, max_value=len(_GOOD_GIF) - 1))
def test_truncated_gif_never_escapes(cut):
    _check(decode_gif, _GOOD_GIF[:cut])


@settings(**_SETTINGS)
@given(
    st.integers(min_value=6, max_value=len(_GOOD_GIF) - 1),
    st.integers(min_value=0, max_value=7),
)
def test_bitflipped_gif_never_escapes(pos, bit):
    b = bytearray(_GOOD_GIF)
    b[pos] ^= 1 << bit
    _check(decode_gif, bytes(b))


from processor_edf_spark.operators.jpeg import encode_jpeg_progressive  # noqa: E402

_GOOD_PROG = encode_jpeg_progressive(_IMG, quality=80)


@settings(**_SETTINGS)
@given(st.integers(min_value=0, max_value=len(_GOOD_PROG) - 1))
def test_truncated_progressive_never_escapes(cut):
    _check(decode_jpeg, _GOOD_PROG[:cut])


@settings(**_SETTINGS)
@given(
    st.integers(min_value=2, max_value=len(_GOOD_PROG) - 1),
    st.integers(min_value=0, max_value=7),
)
def test_bitflipped_progressive_never_escapes(pos, bit):
    b = bytearray(_GOOD_PROG)
    b[pos] ^= 1 << bit
    _check(decode_jpeg, bytes(b))


from processor_edf_spark.operators.tiff import decode_tiff, encode_tiff  # noqa: E402

_GOOD_TIFF = encode_tiff(_IMG)


@settings(**_SETTINGS)
@given(st.binary(min_size=0, max_size=400))
def test_random_bytes_tiff_never_escapes(data):
    for prefix in (b"", b"II*\x00", b"MM\x00*"):
        _check(decode_tiff, prefix + data)


@settings(**_SETTINGS)
@given(
    st.integers(min_value=4, max_value=len(_GOOD_TIFF) - 1),
    st.integers(min_value=0, max_value=7),
)
def test_bitflipped_tiff_never_escapes(pos, bit):
    b = bytearray(_GOOD_TIFF)
    b[pos] ^= 1 << bit
    _check(decode_tiff, bytes(b))


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    gray=st.booleans(),
    rows_per_strip=st.integers(1, 6),
    predictor=st.sampled_from([1, 2]),
    seed=st.integers(0, 2**31 - 1),
)
def test_deflate_tiff_roundtrip_property(h, w, gray, rows_per_strip,
                                         predictor, seed):
    """Property: ANY 8-bit image round-trips the deflate TIFF path
    losslessly, every strip split, both predictors, gray and RGB."""
    from processor_edf_spark.operators.tiff import (
        decode_tiff,
        encode_tiff_deflate,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, shape, np.uint8)
    out = decode_tiff(
        encode_tiff_deflate(img, rows_per_strip=rows_per_strip,
                            predictor=predictor)
    )
    want = np.repeat(img[:, :, None], 3, axis=2) if gray else img
    assert (out == want).all()


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    gray=st.booleans(),
    rows_per_strip=st.integers(1, 6),
    predictor=st.sampled_from([1, 2]),
    seed=st.integers(0, 2**31 - 1),
)
def test_lzw_tiff_roundtrip_property(h, w, gray, rows_per_strip,
                                     predictor, seed):
    """Property: ANY 8-bit image round-trips the LZW TIFF path
    losslessly, every strip split, both predictors, gray and RGB."""
    from processor_edf_spark.operators.tiff import (
        decode_tiff,
        encode_tiff_lzw,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, shape, np.uint8)
    out = decode_tiff(
        encode_tiff_lzw(img, rows_per_strip=rows_per_strip,
                        predictor=predictor)
    )
    want = np.repeat(img[:, :, None], 3, axis=2) if gray else img
    assert (out == want).all()


@settings(max_examples=60, deadline=None)
@given(data=st.binary(max_size=300))
def test_lzw_strip_garbage_never_escapes(data):
    """Property: arbitrary bytes fed to the LZW strip plugin either
    decode to a bounded result or raise the one-exception contract —
    never IndexError/OverflowError/hang."""
    from processor_edf_spark.operators.media_codecs import (
        _tiff_lzw_strip_plugin,
    )

    try:
        out = _tiff_lzw_strip_plugin(data, 4096)
        assert len(out) <= 4096
    except UnsupportedMediaError:
        pass
