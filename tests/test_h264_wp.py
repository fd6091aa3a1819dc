"""H.264 weighted prediction (r13): explicit P/B + implicit B.

Round trips are bit-exact against the encoder recon (shared helpers),
so the WP formulas are ALSO pinned by hand-computed §8.4.2.3 vectors
that a shared-helper bug cannot cancel, and a differential check
proves the weights actually reach the output (a decoder that ignored
the pred_weight_table would still round-trip an identity-weight
stream).  Reference scope: Pennsieve/processor-EDF has no video
surface (builder's-brief multimodal axis)."""

import numpy as np
import pytest

from processor_edf_spark.operators.h264 import (
    _implicit_weights,
    _wp_bi,
    _wp_single,
    decode_h264_ipcm,
    encode_h264_bipred_recon,
)


def _frames(nf, W=64, H=48, seed=0):
    out = []
    for f in range(nf):
        r = np.arange(H)[:, None]
        c = np.arange(W)[None, :]
        y = (((r * 3 + c * 5 + f * 17 + seed) % 160) + 40).astype(np.uint8)
        r2 = np.arange(H // 2)[:, None]
        c2 = np.arange(W // 2)[None, :]
        u = (((r2 * 7 + c2 * 11 + f * 5 + seed) % 100) + 78).astype(np.uint8)
        v = (((r2 * 5 + c2 * 3 + f * 9) % 120) + 60).astype(np.uint8)
        out.append((y, u, v))
    return out


def _roundtrip(frames, W, H, **kw):
    stream, recons, stats = encode_h264_bipred_recon(frames, W, H, **kw)
    dw, dh, dec = decode_h264_ipcm(stream)
    assert (dw, dh) == (W, H)
    assert len(dec) == len(recons)
    for rec, d in zip(recons, dec):
        for a, b in zip(rec, d):
            assert np.array_equal(a, b)
    return stream, dec, stats


# ---------------------------------------------------------------------------
# hand-computed spec vectors (§8.4.2.3.1/.3)
# ---------------------------------------------------------------------------


def test_wp_single_spec_vectors():
    x = np.array([[100]], np.uint8)
    # logWD=5, w=40, o=3: ((100*40 + 16) >> 5) + 3 = 125 + 3 = 128
    assert _wp_single(x, 40, 3, 5)[0, 0] == 128
    # logWD=0: plain x*w + o, clipped
    assert _wp_single(x, 2, -10, 0)[0, 0] == 190
    assert _wp_single(x, 3, 0, 0)[0, 0] == 255  # clip high
    assert _wp_single(x, -1, 0, 5)[0, 0] == 0   # clip low, floor shift
    # negative product floor-shifts: ((100*-1 + 16) >> 5) = -84>>5 = -3
    assert _wp_single(x, -1, 4, 5)[0, 0] == 1   # -3 + 4


def test_wp_bi_spec_vector():
    a = np.array([[120]], np.uint8)
    b = np.array([[80]], np.uint8)
    # logWD=5: ((120*30 + 80*34 + 32) >> 6) + ((3 + -1 + 1) >> 1)
    #        = ((3600 + 2720 + 32) >> 6) + 1 = 99 + 1 = 100
    assert _wp_bi(a, b, 30, 34, 3, -1, 5)[0, 0] == 100
    # defaults (32/32, o 0) reproduce the unweighted average exactly
    for av, bv in ((120, 80), (0, 255), (17, 18)):
        aa = np.array([[av]], np.uint8)
        bb = np.array([[bv]], np.uint8)
        assert _wp_bi(aa, bb, 32, 32, 0, 0, 5)[0, 0] == (av + bv + 1) >> 1


def test_implicit_weights_spec_vectors():
    # cur 2 between poc0=0 and poc1=4: tb=2, td=4, tx=(16384+2)//4=4096,
    # dsf=(2*4096+32)>>6=128, w1=32 -> (32, 32)
    assert _implicit_weights(2, 0, 4) == (32, 32)
    # cur 1, poc0=0, poc1=4: tb=1, dsf=(4096+32)>>6=64, w1=16 -> (48,16)
    assert _implicit_weights(1, 0, 4) == (48, 16)
    # cur 3: tb=3, dsf=(3*4096+32)>>6=192, w1=48 -> (16, 48)
    assert _implicit_weights(3, 0, 4) == (16, 48)
    # coincident references -> default
    assert _implicit_weights(2, 4, 4) == (32, 32)
    # out-of-range scaled weight -> default: poc1 just after poc0,
    # current far away: tb=127, td=1 -> tx=16386, dsf clamps 1023,
    # w1=255 > 128 -> default
    assert _implicit_weights(127, 0, 1) == (32, 32)


# ---------------------------------------------------------------------------
# round trips + differential proof the weights reach the output
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["explicit", "implicit"])
@pytest.mark.parametrize("spatial", [True, False])
def test_weighted_round_trip_bit_exact(mode, spatial):
    frames = _frames(7, seed=5)
    _, _, stats = _roundtrip(
        frames, 64, 48, qp=28, weighted=mode, spatial_direct=spatial
    )
    assert stats["bi_parts"] > 0  # weighted bi paths actually ran


def test_weighted_round_trip_with_deblocking_and_slices():
    frames = _frames(6, seed=11)
    _roundtrip(frames, 64, 48, qp=30, weighted="explicit", deblock=True)
    _roundtrip(frames, 64, 48, qp=30, weighted="explicit",
               slices_per_pic=2)
    _roundtrip(frames, 64, 48, qp=30, weighted="implicit", deblock=True)


def test_explicit_weights_change_decoded_output():
    """The same content encoded weighted vs unweighted must decode to
    DIFFERENT reference-picture samples (the fixture weights are not
    identity), proving the pred_weight_table is parsed and applied —
    not skipped-and-lucky.  P pictures are weighted too
    (weighted_pred_flag covers P slices)."""
    frames = _frames(5, seed=2)
    _, dec_w, _ = _roundtrip(frames, 64, 48, qp=24, weighted="explicit")
    _, dec_d, _ = _roundtrip(frames, 64, 48, qp=24, weighted=None)
    # display index 1 is a B picture, 2 is a P picture
    assert not np.array_equal(dec_w[1][0], dec_d[1][0])
    assert not np.array_equal(dec_w[2][0], dec_d[2][0])


def test_implicit_weights_differ_from_default_on_asymmetric_b():
    """A past-only trailing B (L0 == L1 == the same past picture after
    the window) keeps default weights, but a mid-GOP B at POC distance
    1:3 from its two references gets (48, 16)/(16, 48) implicit
    weights — its decode must differ from the unweighted stream."""
    frames = _frames(4, seed=9)  # coded I0 P2 B1 P? -> order [0,2,1,3]
    _, dec_i, _ = _roundtrip(frames, 64, 48, qp=24, weighted="implicit")
    _, dec_d, _ = _roundtrip(frames, 64, 48, qp=24, weighted=None)
    # B at display 1 sits midway (tb/td = 1/2 -> 32/32): identical
    assert np.array_equal(dec_i[1][0], dec_d[1][0])
    # the trailing past-only B (display 3, POC 6) predicts from refs
    # at POC 4 and 0: tb=2, td=-4 -> DistScaleFactor -128, w1=-32,
    # w0=96 — NOT the default, so its decode must differ
    assert not np.array_equal(dec_i[3][0], dec_d[3][0])


def test_malformed_wp_table_raises_cleanly():
    """Out-of-range log2_weight_denom in the table raises the one
    exception type, not an IndexError."""
    from processor_edf_spark.operators.media_codecs import (
        UnsupportedMediaError,
    )

    frames = _frames(3, W=48, H=32, seed=1)
    stream, _, _ = encode_h264_bipred_recon(
        frames, 48, 32, qp=28, weighted="explicit"
    )
    # truncate mid-stream at many offsets: only UnsupportedMediaError
    for cut in range(30, len(stream), 97):
        try:
            decode_h264_ipcm(stream[:cut])
        except UnsupportedMediaError:
            pass
