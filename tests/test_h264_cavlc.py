"""CAVLC intra H.264 (r11): table properties, the published worked
example, residual-codec round trips, and bit-exact encode→decode
parity against the encoder's reconstruction loop.

Reference semantics: ITU-T H.264 §9.2 (CAVLC), §8.3 (intra
prediction), §8.5 (transform/dequant).  The reference repo has no
video path; this is part of the multimodal corpus surface (SURVEY §8).
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from processor_edf_spark.operators.h264 import (
    _BitReader,
    _BitWriter,
    _CT_CHROMA_DC,
    _CT_NC0,
    _CT_NC2,
    _CT_NC4,
    _RUN_BEFORE,
    _TOTAL_ZEROS_4x4,
    _TOTAL_ZEROS_CDC,
    _decode_residual,
    _encode_residual,
    decode_h264_ipcm,
    encode_h264_cavlc,
    encode_h264_cavlc_recon,
)
from processor_edf_spark.operators.media_codecs import UnsupportedMediaError


def _all_tables():
    yield "CT_NC0", list(_CT_NC0.values())
    yield "CT_NC2", list(_CT_NC2.values())
    yield "CT_NC4", list(_CT_NC4.values())
    yield "CT_CHROMA_DC", list(_CT_CHROMA_DC.values())
    for i, t in enumerate(_TOTAL_ZEROS_4x4):
        yield f"TZ4[{i + 1}]", list(t)
    for i, t in enumerate(_TOTAL_ZEROS_CDC):
        yield f"TZC[{i + 1}]", list(t)
    for i, t in enumerate(_RUN_BEFORE):
        yield f"RB[{i + 1}]", list(t)


def test_vlc_tables_prefix_free_with_spec_kraft():
    """Every VLC table must be prefix-free (decodability), and its
    Kraft sum must equal the spec table's exact deficit — a strong
    transcription check: any wrong length OR value collides or shifts
    the sum."""
    expect_kraft = {
        # the spec leaves exactly these codewords unused
        "CT_NC0": 1.0 - 2.0 ** -15,
        "CT_NC2": 1.0 - 2.0 ** -13,
        "CT_NC4": 1.0 - 2.0 ** -10,
        "CT_CHROMA_DC": 1.0,
        "TZ4[1]": 1.0 - 2.0 ** -9,
        "RB[7]": 1.0 - 2.0 ** -11,
    }
    for name, entries in _all_tables():
        strs = [format(v, f"0{l}b") for l, v in entries]
        assert len(strs) == len(set(strs)), f"{name}: duplicate codeword"
        for i, a in enumerate(strs):
            for j, b in enumerate(strs):
                assert i == j or not b.startswith(a), (
                    f"{name}: {a} prefixes {b}"
                )
        kraft = sum(2.0 ** -l for l, _ in entries)
        assert kraft == pytest.approx(
            expect_kraft.get(name, 1.0), abs=1e-12
        ), f"{name}: kraft {kraft}"


def test_published_cavlc_worked_example():
    """The standard textbook CAVLC example: zig-zag coefficients
    0,3,0,1,-1,-1,0,1,0... (TotalCoeffs 5, T1s 3, total_zeros 3) at
    nC=0 serializes to the published 24-bit string — pins coeff_token
    row (5,3), the level coder, total_zeros(3|5) and three run_before
    rows against spec-external ground truth."""
    coeffs = [0, 3, 0, 1, -1, -1, 0, 1] + [0] * 8
    w = _BitWriter()
    _encode_residual(w, 0, coeffs)
    bits = "".join(f"{b:08b}" for b in w.getvalue())
    assert bits.startswith("000010001110010111101101")
    # and it decodes back
    w.write(1, 1)
    w.align_zero()
    assert _decode_residual(_BitReader(w.getvalue()), 0, 16) == coeffs


def test_residual_codec_round_trip_property():
    rng = random.Random(7)
    for _ in range(3000):
        max_coeff = rng.choice([16, 15, 4])
        nc = -1 if max_coeff == 4 else rng.choice([0, 1, 2, 3, 5, 7, 9, 20])
        coeffs = [0] * max_coeff
        for p in rng.sample(range(max_coeff), rng.randint(0, max_coeff)):
            coeffs[p] = rng.choice(
                [1, 1, 1, 2, 3, 5, 9, 17, 40, 300, 2000]
            ) * rng.choice([1, -1])
        w = _BitWriter()
        _encode_residual(w, nc, coeffs)
        w.write(1, 1)
        w.align_zero()
        assert _decode_residual(
            _BitReader(w.getvalue()), nc, max_coeff
        ) == coeffs


def _frames(rng, H, W, n=2):
    out = []
    for f in range(n):
        ys, xs = np.mgrid[0:H, 0:W]
        y = (
            ((ys * 3 + xs * 5 + f * 17) // 4) % 180
            + 30
            + rng.integers(0, 20, (H, W))
        ).astype(np.uint8)
        u = (128 + rng.integers(-20, 20, (H // 2, W // 2))).astype(np.uint8)
        v = (
            (ys[: H // 2, : W // 2] % 100 + 80)
            + rng.integers(-10, 10, (H // 2, W // 2))
        ).astype(np.uint8)
        out.append((y, u, v))
    return out


@pytest.mark.parametrize("qp", [10, 16, 28, 40])
def test_encode_decode_bit_exact_and_err_scales(qp):
    """decode(encode(x)) must equal the encoder's reconstruction
    BIT-exactly at every QP, and the reconstruction error vs the
    source must scale with the quantisation step (a correct lossy
    intra codec)."""
    rng = np.random.default_rng(qp)
    frames = _frames(rng, 48, 64)
    stream, recons = encode_h264_cavlc_recon(frames, 64, 48, qp=qp)
    w, h, decoded = decode_h264_ipcm(stream)
    assert (w, h) == (64, 48) and len(decoded) == 2
    for rec, dec in zip(recons, decoded):
        for a, b in zip(rec, dec):
            assert np.array_equal(a, b)
    err = max(
        np.abs(r[0].astype(int) - f0[0].astype(int)).max()
        for r, f0 in zip(recons, frames)
    )
    bound = {10: 4, 16: 8, 28: 24, 40: 60}[qp]
    assert err <= bound, (qp, err)


def test_cropped_dimensions_round_trip():
    rng = np.random.default_rng(5)
    frames = _frames(rng, 34, 52, n=1)  # non-multiple-of-16, even
    stream, recons = encode_h264_cavlc_recon(frames, 52, 34, qp=24)
    w, h, decoded = decode_h264_ipcm(stream)
    assert (w, h) == (52, 34)
    for a, b in zip(recons[0], decoded[0]):
        assert np.array_equal(a, b)


def test_encoder_mixes_mb_types():
    """The fixture encoder must exercise I_NxN, I_16x16 AND I_PCM in
    one picture (the deterministic kind mix), so decode covers the
    cross-type nC / mode-prediction neighbor rules."""
    rng = np.random.default_rng(6)
    frames = _frames(rng, 64, 64, n=1)  # 16 MBs: kinds 0..6 all hit
    stream = encode_h264_cavlc(frames, 64, 64, qp=26)
    _, _, decoded = decode_h264_ipcm(stream)
    assert len(decoded) == 1


def test_bitstream_corruption_never_escapes_typed_error():
    rng = np.random.default_rng(8)
    frames = _frames(rng, 32, 32, n=1)
    stream = bytearray(encode_h264_cavlc(frames, 32, 32, qp=26))
    random.seed(9)
    hits = 0
    for _ in range(60):
        pos = random.randrange(40, len(stream))  # keep SPS/PPS intact
        mut = bytearray(stream)
        mut[pos] ^= 1 << random.randrange(8)
        try:
            decode_h264_ipcm(bytes(mut))
        except UnsupportedMediaError:
            hits += 1
        # any other exception type escaping is the bug this test hunts
    assert hits > 0  # corruption was actually detected at least once


def test_qp_guard():
    rng = np.random.default_rng(10)
    frames = _frames(rng, 32, 32, n=1)
    with pytest.raises(UnsupportedMediaError):
        encode_h264_cavlc(frames, 32, 32, qp=50)


def test_cavlc_stream_routes_through_media_seam():
    """The media router's h264 path (magic-byte sniff → registered
    pure-python plugin) now serves CAVLC streams too."""
    from processor_edf_spark.operators.media_codecs import (
        decode_h264_video,
        is_annexb_h264,
    )

    rng = np.random.default_rng(11)
    frames = _frames(rng, 32, 32, n=1)
    stream, recons = encode_h264_cavlc_recon(frames, 32, 32, qp=26)
    assert is_annexb_h264(stream)
    w, h, decoded = decode_h264_video(stream)
    assert (w, h) == (32, 32)
    for a, b in zip(recons[0], decoded[0]):
        assert np.array_equal(a, b)
