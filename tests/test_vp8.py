"""VP8 (lossy WebP) keyframe intra decode (operators/vp8.py, r13).

Validation model (the CABAC/MP3 discipline): the boolean coder is
property-pinned directly; the inverse transforms are pinned against
hand-computed RFC 6386 §14 vectors (shared-helper bugs cannot cancel
there); whole frames are checked BIT-EXACT in the plane domain against
the encoder's reconstruction loop, which runs the decoder's exact
dequant/inverse-transform/prediction path; seams and malformed input
raise the one exception type.  The derived-table deviations are stated
in the module docstring.  Reference scope: Pennsieve/processor-EDF has
no image surface (builder's-brief multimodal axis)."""

import numpy as np
import pytest

from processor_edf_spark.operators.media_codecs import (
    UnsupportedMediaError,
)
from processor_edf_spark.operators.vp8 import (
    _BoolDec,
    _BoolEnc,
    _idct4x4,
    _iwht4x4,
    decode_vp8_keyframe,
    decode_vp8_planes,
    encode_vp8_keyframe,
)


def _planes(W, H, seed=0):
    r = np.arange(H)[:, None]
    c = np.arange(W)[None, :]
    y = (((r * 3 + c * 5 + seed) % 160) + 40).astype(np.uint8)
    ch, cw = -(-H // 2), -(-W // 2)
    r2 = np.arange(ch)[:, None]
    c2 = np.arange(cw)[None, :]
    u = (((r2 * 7 + c2 * 11 + seed) % 100) + 78).astype(np.uint8)
    v = (((r2 * 5 + c2 * 3 + 2 * seed) % 120) + 60).astype(np.uint8)
    return y, u, v


# ---------------------------------------------------------------------------
# engine + transform pins
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [1, 9])
def test_bool_coder_round_trip(seed):
    rng = np.random.default_rng(seed)
    be = _BoolEnc()
    seq = []
    for _ in range(8000):
        p = int(rng.integers(1, 255))
        b = int(rng.integers(0, 2))
        be.write(b, p)
        seq.append((p, b))
    bd = _BoolDec(be.finish())
    assert all(bd.read(p) == b for p, b in seq)


def test_bool_coder_skew_compresses():
    be = _BoolEnc()
    for _ in range(4000):
        be.write(0, 250)  # highly probable zero
    data = be.finish()
    assert len(data) < 60  # ~0.035 bits/bin at p=250/256
    bd = _BoolDec(data)
    assert all(bd.read(250) == 0 for _ in range(4000))


def test_idct_hand_vectors():
    """RFC 6386 §14.3: a lone DC of 8 inverse-transforms to a constant
    ((8+8+4)>>3 = 2... computed by hand through both passes); a lone
    coefficient at (1,0) uses the 20091/35468 multipliers."""
    blk = np.zeros((4, 4), np.int64)
    blk[0, 0] = 8
    # pass1: col0 a1=b1=8, c1=d1=0 -> tmp[*,0]=8; pass2 row r: a1=b1=8
    # -> out = (8+4)>>3 = 1 in all 16 positions
    assert (_idct4x4(blk) == 1).all()
    blk = np.zeros((4, 4), np.int64)
    blk[1, 0] = 4
    out = _idct4x4(blk)
    # col pass: t1=(4*35468)>>16=2, c1=2; t1=4+((4*20091)>>16)=5, d1=5
    # tmp col0 = [5, 2, -2, -5]; row pass of [x,0,0,0]: all a1=b1=x,
    # out row = (x+4)>>3 each -> rows [1,1,1,1],[0..],[0,0,0,0],[-1??]
    # (-2+4)>>3 = 0; (-5+4)>>3 = -1 (floor shift)
    assert list(out[:, 0]) == [1, 0, 0, -1]
    assert (out[:, 1:] == out[:, :1]).all()  # rows are constant


def test_iwht_hand_vector():
    blk = np.zeros((4, 4), np.int64)
    blk[0, 0] = 16
    # both passes double-accumulate DC: col a1=b1=16 -> tmp row0 = 32?
    # col pass: a1=16,b1=0,c1=0,d1=16 -> tmp[0,0]=16, tmp[1,0]=16,
    # tmp[2,0]=16, tmp[3,0]=16; row pass each row [16,0,0,0]:
    # a1=16,b1=0,c1=0,d1=16 -> out = [(16+3)>>3, (16+3)>>3, ...] = 2
    assert (_iwht4x4(blk) == 2).all()


# ---------------------------------------------------------------------------
# whole-frame round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("qi", [10, 40, 80, 120])
def test_round_trip_qi_sweep_planes_bit_exact(qi):
    y, u, v = _planes(64, 48, seed=qi)
    frame, (rY, rU, rV) = encode_vp8_keyframe(y, u, v, qi=qi)
    dw, dh, dY, dU, dV = decode_vp8_planes(frame)
    assert (dw, dh) == (64, 48)
    assert np.array_equal(dY, rY)
    assert np.array_equal(dU, rU)
    assert np.array_equal(dV, rV)


def test_error_grows_with_qi():
    y, u, v = _planes(64, 48, seed=3)
    errs = []
    for qi in (10, 60, 120):
        _, (rY, _u, _v) = encode_vp8_keyframe(y, u, v, qi=qi)
        errs.append(
            float(np.abs(rY[:48, :64].astype(int) - y.astype(int)).mean())
        )
    assert errs[0] < errs[1] < errs[2]


def test_odd_geometry_and_rgb_entry():
    y, u, v = _planes(50, 34, seed=7)
    frame, _ = encode_vp8_keyframe(y, u, v, qi=30)
    w, h, rgb = decode_vp8_keyframe(frame)
    assert (w, h) == (50, 34)
    assert rgb.shape == (34, 50, 3) and rgb.dtype == np.uint8


def test_flat_image_all_skip():
    """A constant image quantizes to zero everywhere: every MB is a
    skip MB (prediction only) and the stream is tiny."""
    y = np.full((48, 64), 90, np.uint8)
    u = np.full((24, 32), 110, np.uint8)
    v = np.full((24, 32), 130, np.uint8)
    frame, (rY, rU, rV) = encode_vp8_keyframe(y, u, v, qi=60)
    assert len(frame) < 300
    dw, dh, dY, dU, dV = decode_vp8_planes(frame)
    assert np.array_equal(dY, rY) and np.array_equal(dU, rU)
    # DC prediction propagates the constant exactly after the first MB
    assert np.abs(rY.astype(int) - 90).max() <= 3


def test_seams_raise_named():
    y, u, v = _planes(32, 32, seed=1)
    frame, _ = encode_vp8_keyframe(y, u, v, qi=40)
    # interframe tag
    bad = bytearray(frame)
    bad[0] |= 1
    with pytest.raises(UnsupportedMediaError, match="interframe"):
        decode_vp8_planes(bytes(bad))
    # bad start code
    bad = bytearray(frame)
    bad[3] = 0
    with pytest.raises(UnsupportedMediaError, match="start code"):
        decode_vp8_planes(bytes(bad))


def test_corruption_fuzz_never_escapes():
    y, u, v = _planes(48, 32, seed=4)
    frame, _ = encode_vp8_keyframe(y, u, v, qi=50)
    data = bytearray(frame)
    rng = np.random.default_rng(11)
    for _ in range(250):
        i = int(rng.integers(0, len(data)))
        old = data[i]
        data[i] = int(rng.integers(0, 256))
        try:
            decode_vp8_planes(bytes(data))
        except UnsupportedMediaError:
            pass
        data[i] = old
    for cut in range(0, len(frame), 37):
        try:
            decode_vp8_planes(frame[:cut])
        except UnsupportedMediaError:
            pass


def test_through_webp_container_and_spark(spark):
    """A lossy WebP (RIFF 'VP8 ' chunk) decodes decoded=true through
    the image extractor — previously the optional-Pillow route."""
    from processor_edf_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_image_features,
    )
    from processor_edf_spark.operators.vp8 import encode_webp_lossy

    y, u, v = _planes(48, 32, seed=2)
    payload = encode_webp_lossy(y, u, v, qi=40)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WEBP"
    rows = [(1, "image", payload, "image/webp", None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_image_features(media).collect()
    assert out[0]["decoded"] and out[0]["width"] == 48
