"""FLAC codec tests.

Round-trips pin the encoder↔decoder pair bit-exactly across every
subframe type, stereo decorrelation, Rice partition layout and bit
depth the encoder can emit; hand-assembled streams pin the DECODER
against header forms the fixture encoder deliberately never writes
(table-coded blocksizes, explicit sample-rate forms, 8-bit blocksize);
integrity tests prove the CRC-8/CRC-16/MD5 checks actually reject;
malformed-input fuzz keeps the one-exception contract.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from processor_edf_spark.operators.flac import (
    MAX_TOTAL_SAMPLES,
    MSBBitReader,
    MSBBitWriter,
    _encode_subframe,
    _pcm_bytes,
    _write_utf8_coded,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)
from processor_edf_spark.operators.media_codecs import (
    UnsupportedMediaError,
    decode_audio,
    optional_codec_support,
)


def _ints(rng, n, lo=-3000, hi=3000, ch=None):
    shape = n if ch is None else (n, ch)
    return rng.integers(lo, hi, shape)


def _assert_roundtrip(samples, rate=8000, **kw):
    payload = encode_flac(samples, rate, **kw)
    got_rate, got_ch, dec = decode_flac(payload)
    bps = kw.get("bps", 16)
    got = np.round(dec * float(1 << (bps - 1))).astype(np.int64)
    want = np.asarray(samples, dtype=np.int64)
    if want.ndim == 1:
        want = want[:, None]
    assert got_rate == rate
    assert got_ch == want.shape[1]
    assert got.shape == want.shape
    assert (got == want).all()
    return payload


# ---------------------------------------------------------------------------
# round-trips (encoder paths)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "mode",
    ["auto", "verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4", "lpc"],
)
def test_roundtrip_mono_subframe_types(mode):
    rng = np.random.default_rng(hash(mode) % 2**31)
    _assert_roundtrip(_ints(rng, 1000), blocksize=256, subframe=mode)


@pytest.mark.parametrize(
    "stereo", ["independent", "left_side", "right_side", "mid_side"]
)
def test_roundtrip_stereo_decorrelation(stereo):
    rng = np.random.default_rng(11)
    _assert_roundtrip(
        _ints(rng, 777, ch=2), blocksize=200, stereo=stereo, partition_order=2
    )


@pytest.mark.parametrize("porder", [0, 1, 2, 3])
def test_roundtrip_partition_orders(porder):
    rng = np.random.default_rng(porder)
    _assert_roundtrip(
        _ints(rng, 1024), blocksize=512, subframe="fixed2", partition_order=porder
    )


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24])
def test_roundtrip_bit_depths(bps):
    rng = np.random.default_rng(bps)
    half = 1 << (bps - 1)
    _assert_roundtrip(
        _ints(rng, 300, lo=-half, hi=half), blocksize=128, bps=bps
    )


def test_roundtrip_constant_and_empty():
    _assert_roundtrip(np.full(500, 123))
    _assert_roundtrip(np.zeros(0, dtype=np.int64))


def test_roundtrip_wasted_bits():
    rng = np.random.default_rng(5)
    payload = _assert_roundtrip(
        _ints(rng, 400, lo=-700, hi=700) * 8,
        blocksize=128,
        use_wasted=True,
    )
    plain = encode_flac(
        np.asarray(_ints(np.random.default_rng(5), 400, lo=-700, hi=700)) * 8,
        8000,
        blocksize=128,
        use_wasted=False,
    )
    assert len(payload) < len(plain)  # the wasted-bit prefix actually packed


def test_roundtrip_lpc_sine_compresses():
    t = np.arange(5000)
    sine = np.round(3000 * np.sin(t * 0.01)).astype(np.int64)
    payload = _assert_roundtrip(
        sine, subframe="lpc", lpc_coefs=(2, -1), lpc_shift=0,
        partition_order=3, blocksize=1024,
    )
    assert len(payload) < 2 * len(sine)  # ≥5× under the 16-bit raw size


def test_roundtrip_many_frames_utf8_numbers():
    """>128 frames pushes the frame number into multi-byte UTF-8 coding."""
    rng = np.random.default_rng(3)
    _assert_roundtrip(_ints(rng, 3000), blocksize=16)


def test_roundtrip_short_last_block():
    rng = np.random.default_rng(4)
    _assert_roundtrip(_ints(rng, 1000 + 37), blocksize=250)


def test_escape_partition_roundtrip():
    """±2^22-scale swings push fixed-order residuals past the encoder's
    Rice cutoff, so it falls to escape partitions — and the decoder's
    raw-residual path reconstructs exactly."""
    rng = np.random.default_rng(6)
    wild = rng.integers(-(1 << 22), 1 << 22, 256).astype(np.int64)
    _assert_roundtrip(wild, bps=32, blocksize=64, subframe="fixed2")


# ---------------------------------------------------------------------------
# hand-assembled streams (decoder-only header forms)
# ---------------------------------------------------------------------------


def _hand_stream(
    samples: np.ndarray,
    rate: int,
    bs_code: int,
    bs_tail_bits: tuple[int, int] | None,
    sr_code: int,
    sr_tail_bits: tuple[int, int] | None,
) -> bytes:
    """Single-frame stream writing the given blocksize/sample-rate
    header codes verbatim — the forms encode_flac never emits."""
    arr = np.asarray(samples, dtype=np.int64)[:, None]
    info = MSBBitWriter()
    info.write(len(arr), 16)
    info.write(len(arr), 16)
    info.write(0, 48)
    info.write(rate, 20)
    info.write(0, 3)
    info.write(15, 5)  # 16-bit
    info.write(len(arr), 36)
    body = info.getvalue() + hashlib.md5(_pcm_bytes(arr, 2)).digest()
    out = bytearray(b"fLaC") + b"\x80" + len(body).to_bytes(3, "big") + body
    w = MSBBitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(bs_code, 4)
    w.write(sr_code, 4)
    w.write(0, 4)  # mono
    w.write(4, 3)  # 16-bit
    w.write(0, 1)
    _write_utf8_coded(w, 0)
    if bs_tail_bits is not None:
        w.write(*bs_tail_bits)
    if sr_tail_bits is not None:
        w.write(*sr_tail_bits)
    header = w.getvalue()
    w.write(crc8(header), 8)
    _encode_subframe(w, [int(v) for v in arr[:, 0]], 16, "fixed2", 0, (), 0, False)
    w.align()
    frame = w.getvalue()
    return bytes(out + frame + struct.pack(">H", crc16(frame)))


@pytest.mark.parametrize(
    "n,bs_code,tail",
    [
        (192, 0x1, None),          # table: 192
        (576, 0x2, None),          # table: 576<<0
        (256, 0x8, None),          # table: 256<<0
        (100, 0x6, (99, 8)),       # 8-bit end-of-header form
    ],
)
def test_hand_blocksize_codes(n, bs_code, tail):
    rng = np.random.default_rng(n)
    samples = _ints(rng, n)
    payload = _hand_stream(samples, 44100, bs_code, tail, 0, None)
    rate, ch, dec = decode_flac(payload)
    assert rate == 44100 and ch == 1
    assert (np.round(dec[:, 0] * 32768).astype(np.int64) == samples).all()


@pytest.mark.parametrize(
    "rate,sr_code,tail",
    [
        (44100, 0x9, None),        # table code
        (8000, 0x4, None),         # table code
        (32000, 0xC, (32, 8)),     # kHz form
        (22050, 0xD, (22050, 16)),  # Hz form
        (44100, 0xE, (4410, 16)),  # daHz form
    ],
)
def test_hand_sample_rate_codes(rate, sr_code, tail):
    rng = np.random.default_rng(rate)
    samples = _ints(rng, 64)
    payload = _hand_stream(samples, rate, 0x6, (63, 8), sr_code, tail)
    got_rate, _, dec = decode_flac(payload)
    assert got_rate == rate
    assert (np.round(dec[:, 0] * 32768).astype(np.int64) == samples).all()


# ---------------------------------------------------------------------------
# integrity checks actually reject
# ---------------------------------------------------------------------------


def _valid_payload():
    rng = np.random.default_rng(9)
    return bytearray(encode_flac(_ints(rng, 300), 8000, blocksize=128))


def test_frame_crc16_rejects_corruption():
    payload = _valid_payload()
    payload[-3] ^= 0x10  # inside the last frame's subframe bits
    with pytest.raises(UnsupportedMediaError):
        decode_flac(bytes(payload))


def test_header_crc8_rejects_corruption():
    payload = _valid_payload()
    # find the first frame sync after the 42-byte header+STREAMINFO
    pos = bytes(payload).index(b"\xff\xf8", 42)
    payload[pos + 1] ^= 0x01  # flip the blocking-strategy bit
    with pytest.raises(UnsupportedMediaError):
        decode_flac(bytes(payload))


def test_streaminfo_md5_rejects_mismatch():
    payload = _valid_payload()
    payload[30] ^= 0xFF  # inside the 16-byte MD5 field (bytes 26..42)
    with pytest.raises(UnsupportedMediaError, match="md5"):
        decode_flac(bytes(payload))


def test_zero_md5_skips_verification():
    payload = _valid_payload()
    payload[26:42] = bytes(16)  # MD5 field zeroed = unknown, per spec
    rate, ch, dec = decode_flac(bytes(payload))
    assert dec.shape == (300, 1)


def test_total_samples_guard():
    info = MSBBitWriter()
    info.write(4096, 32)
    info.write(0, 48)
    info.write(44100, 20)
    info.write(0, 3)
    info.write(15, 5)
    info.write(MAX_TOTAL_SAMPLES + 1, 36)
    body = info.getvalue() + bytes(16)
    payload = b"fLaC" + b"\x80" + len(body).to_bytes(3, "big") + body
    with pytest.raises(UnsupportedMediaError, match="sample"):
        decode_flac(payload)


def test_missing_streaminfo_rejected():
    body = bytes(4)
    payload = b"fLaC" + b"\x81" + len(body).to_bytes(3, "big") + body
    with pytest.raises(UnsupportedMediaError, match="STREAMINFO"):
        decode_flac(payload)


def test_short_stream_rejected():
    payload = _valid_payload()
    # keep only magic + STREAMINFO: 0 decoded < STREAMINFO total of 300
    with pytest.raises(UnsupportedMediaError, match="shorter"):
        decode_flac(bytes(payload[:42]))


# ---------------------------------------------------------------------------
# router + support surface
# ---------------------------------------------------------------------------


def test_decode_audio_routes_flac():
    rng = np.random.default_rng(12)
    samples = _ints(rng, 200, ch=2)
    payload = encode_flac(samples, 16000, stereo="mid_side")
    rate, ch, dec = decode_audio(payload)
    assert (rate, ch) == (16000, 2)
    assert (np.round(dec * 32768).astype(np.int64) == samples).all()


def test_flac_reports_available_without_extras():
    assert optional_codec_support()["flac"] is True


# ---------------------------------------------------------------------------
# malformed-input fuzz: the one-exception contract
# ---------------------------------------------------------------------------


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=150, deadline=None)
def test_random_bytes_never_escape(data):
    try:
        decode_flac(b"fLaC" + data)
    except UnsupportedMediaError:
        pass


@given(st.integers(min_value=1, max_value=400))
@settings(max_examples=100, deadline=None)
def test_truncation_never_escapes(cut):
    payload = bytes(_valid_payload())
    try:
        decode_flac(payload[: max(0, len(payload) - cut)])
    except UnsupportedMediaError:
        pass


@given(st.integers(min_value=0, max_value=10_000), st.integers(0, 7))
@settings(max_examples=200, deadline=None)
def test_bitflip_never_escapes(pos, bit):
    payload = _valid_payload()
    payload[pos % len(payload)] ^= 1 << bit
    try:
        decode_flac(bytes(payload))
    except UnsupportedMediaError:
        pass


# ---------------------------------------------------------------------------
# unit pins
# ---------------------------------------------------------------------------


def test_crc_vectors():
    # linearity/zero fixpoints plus a couple of closed-form checks:
    # CRC-8 poly 0x07 of a single zero byte is 0, of 0x01 is 0x07
    assert crc8(b"\x00") == 0
    assert crc8(b"\x01") == 0x07
    assert crc16(b"\x00\x00") == 0
    # CRC-16/BUYPASS (poly 0x8005, init 0, no reflection) of "123456789"
    assert crc16(b"123456789") == 0xFEE8


def test_utf8_coded_roundtrip():
    for v in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF, (1 << 36) - 1]:
        w = MSBBitWriter()
        _write_utf8_coded(w, v)
        from processor_edf_spark.operators.flac import _read_utf8_coded

        assert _read_utf8_coded(MSBBitReader(w.getvalue()), 7) == v


def test_bit_reader_msb_order():
    r = MSBBitReader(bytes([0b10110011, 0b01000000]))
    assert r.read(3) == 0b101
    assert r.read_signed(4) == 0b1001 - 16  # sign-extended
    assert r.read_unary() == 0  # byte 0's trailing 1
    assert r.read_unary() == 1  # byte 1: one 0, then 1
