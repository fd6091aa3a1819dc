"""H.264 CABAC entropy layer (r13): I slices.

Validation model: the arithmetic ENGINE is property-pinned directly
(random bin sequences round-trip through encode->decode across all
three bin kinds; the derived state machine reproduces the published
transIdxLPS values where recall is certain), the residual kernel is
round-tripped over adversarial coefficient lists (escape levels, long
zero runs, last-position corners), and whole streams are checked
BIT-EXACT against the encoder's reconstruction loop — which reuses the
decoder's own dequant/IDCT/prediction helpers, so entropy bugs cannot
cancel.  The documented deviations (derived LPS table, equiprobable
context init) are covered in the module section comment in
operators/h264.py.  Reference scope: Pennsieve/processor-EDF has no
video surface (builder's-brief multimodal axis)."""

import numpy as np
import pytest

from processor_edf_spark.operators.h264 import (
    _BitReader,
    _CABAC_LPS,
    _CABAC_TRANS_LPS,
    _cabac_init_ctxs,
    _CabacDec,
    _CabacEnc,
    _N_CABAC_CTX,
    decode_h264_ipcm,
    encode_h264_cabac_recon,
)
from processor_edf_spark.operators.media_codecs import (
    UnsupportedMediaError,
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


def _pack(bits):
    data = bytearray()
    acc = n = 0
    for b in bits:
        acc = (acc << 1) | b
        n += 1
        if n == 8:
            data.append(acc)
            acc = n = 0
    if n:
        data.append(acc << (8 - n))
    return bytes(data)


# ---------------------------------------------------------------------------
# engine properties
# ---------------------------------------------------------------------------


def test_derived_tables_shape_and_published_spot_checks():
    """The derived LPS subdivision table is monotone (down states,
    up quantized ranges), bounded to keep codIRange valid, and the
    derived LPS state transition reproduces the published
    Table 9-45 values at the spot-checked states."""
    assert _CABAC_LPS.shape == (63, 4)
    assert (_CABAC_LPS >= 2).all() and (_CABAC_LPS <= 240).all()
    # decreasing probability down the states
    assert (np.diff(_CABAC_LPS.astype(int), axis=0) <= 0).all()
    # wider quantized range -> larger LPS share
    assert (np.diff(_CABAC_LPS.astype(int), axis=1) > 0).all()
    # published transIdxLPS spot checks (certain recall)
    assert _CABAC_TRANS_LPS[0] == 0
    assert _CABAC_TRANS_LPS[1] == 0
    assert _CABAC_TRANS_LPS[2] == 1
    assert _CABAC_TRANS_LPS[62] == 38
    # LPS never advances past MPS saturation
    assert (_CABAC_TRANS_LPS <= 62).all()
    assert (np.diff(_CABAC_TRANS_LPS) >= 0).all()


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_engine_random_sequence_round_trip(seed):
    """Random mixes of context-coded decisions, bypass bins, and
    terminate(0) probes decode back exactly; the final terminate(1)
    flush carries the tail."""
    rng = np.random.default_rng(seed)
    ce = _CabacEnc(_cabac_init_ctxs())
    seq = []
    for _ in range(5000):
        kind = int(rng.integers(0, 10))
        b = int(rng.integers(0, 2))
        if kind < 6:
            idx = int(rng.integers(0, _N_CABAC_CTX))
            ce.decision(idx, b)
            seq.append(("d", idx, b))
        elif kind < 9:
            ce.bypass(b)
            seq.append(("b", 0, b))
        else:
            ce.terminate(0)
            seq.append(("t", 0, 0))
    ce.terminate(1)
    seq.append(("t", 0, 1))
    cd = _CabacDec(_BitReader(_pack(ce.bits)), _cabac_init_ctxs())
    for k, idx, b in seq:
        got = cd.decision(idx) if k == "d" else (
            cd.bypass() if k == "b" else cd.terminate()
        )
        assert got == b


def test_engine_skewed_stream_compresses():
    """A heavily-skewed decision stream must ADAPT: 4000 MPS bins on
    one context compress far below 1 bit/bin — the probability
    estimator is real, not pass-through."""
    ce = _CabacEnc(_cabac_init_ctxs())
    for _ in range(4000):
        ce.decision(0, 0)
    ce.terminate(1)
    assert len(ce.bits) < 600  # < 0.15 bits/bin after adaptation
    cd = _CabacDec(_BitReader(_pack(ce.bits)), _cabac_init_ctxs())
    assert all(cd.decision(0) == 0 for _ in range(4000))
    assert cd.terminate() == 1


def test_residual_kernel_adversarial_levels():
    """The residual coder round-trips escape levels (UEG0 suffix),
    +-1 runs, a lone last-position coefficient, and all-zero blocks,
    on every block category."""
    from processor_edf_spark.operators.h264 import (
        _CAT_CAC,
        _CAT_CDC,
        _CAT_L4,
        _CAT_L16AC,
        _CAT_L16DC,
        _decode_res_cabac,
        _enc_res_cabac,
        _PicCtx,
        _SPS,
    )

    sps = _SPS()
    sps.mb_width = sps.mb_height = 1
    sps.monochrome = False

    cases = [
        (_CAT_L4, 16, [3, 0, -1, 1] + [0] * 11 + [2]),   # last at n-1
        (_CAT_L4, 16, [900, -77, 16, -15, 14, 1] + [0] * 10),  # escapes
        (_CAT_L16DC, 16, [0] * 15 + [-1]),
        (_CAT_L16AC, 15, [1] * 15),
        (_CAT_CDC, 4, [0, 0, 0, 5]),
        (_CAT_CDC, 4, [0, 0, 0, 0]),
        (_CAT_CAC, 15, [0] * 14 + [100000]),
        (_CAT_L4, 16, [0] * 16),
    ]
    for cat, n, coeffs in cases:
        enc_ctx = _PicCtx(sps)
        enc_ctx.mb_slice[:] = 1
        dec_ctx = _PicCtx(sps)
        dec_ctx.mb_slice[:] = 1
        ce = _CabacEnc(_cabac_init_ctxs())
        _enc_res_cabac(ce, enc_ctx, cat, 0, 0, 0, 0, list(coeffs))
        ce.terminate(1)
        cd = _CabacDec(_BitReader(_pack(ce.bits)), _cabac_init_ctxs())
        got = _decode_res_cabac(cd, dec_ctx, cat, 0, 0, 0, 0, n)
        assert got == list(coeffs), (cat, coeffs, got)


# ---------------------------------------------------------------------------
# whole-stream round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("qp", [8, 20, 28, 36, 44])
def test_cabac_round_trip_qp_sweep(qp):
    frames = _frames(3, seed=qp)
    stream, recons = encode_h264_cabac_recon(frames, 64, 48, qp=qp)
    dw, dh, dec = decode_h264_ipcm(stream)
    assert (dw, dh) == (64, 48)
    assert len(dec) == 3
    for rec, d in zip(recons, dec):
        for a, b in zip(rec, d):
            assert np.array_equal(a, b)
    # recon error stays inside the quantisation bound
    for rec, frm in zip(recons, frames):
        err = np.abs(
            rec[0].astype(np.int64) - frm[0].astype(np.int64)
        ).max()
        assert err <= (4 if qp <= 12 else (64 if qp <= 36 else 160))


def test_cabac_round_trip_odd_geometry_and_many_frames():
    for W, H, nf in ((50, 34, 2), (96, 64, 2), (16, 16, 5), (128, 96, 1)):
        frames = _frames(nf, W, H, seed=W + nf)
        stream, recons = encode_h264_cabac_recon(frames, W, H, qp=26)
        dw, dh, dec = decode_h264_ipcm(stream)
        assert (dw, dh) == (W, H) and len(dec) == nf
        for rec, d in zip(recons, dec):
            for a, b in zip(rec, d):
                assert np.array_equal(a, b)


def test_cabac_error_grows_with_qp():
    frames = _frames(2, seed=3)
    errs = []
    for qp in (12, 28, 40):
        _, recons = encode_h264_cabac_recon(frames, 64, 48, qp=qp)
        errs.append(
            float(
                np.mean(
                    [
                        np.abs(
                            r[0].astype(np.int64)
                            - f[0].astype(np.int64)
                        ).mean()
                        for r, f in zip(recons, frames)
                    ]
                )
            )
        )
    assert errs[0] < errs[1] < errs[2]


def test_cabac_smaller_than_cavlc_ballpark():
    """CABAC with adaptation should not be wildly LARGER than CAVLC on
    the same content — a sanity check that context modeling works (the
    derived tables make exact spec-parity claims impossible, but a
    broken adapter would balloon the stream)."""
    from processor_edf_spark.operators.h264 import encode_h264_cavlc_recon

    frames = _frames(3, seed=2)
    cabac, _ = encode_h264_cabac_recon(frames, 64, 48, qp=28)
    cavlc, _ = encode_h264_cavlc_recon(frames, 64, 48, qp=28)
    assert len(cabac) < 1.15 * len(cavlc)


# ---------------------------------------------------------------------------
# seams + malformed input
# ---------------------------------------------------------------------------


def test_cabac_p_slice_without_reference_raises():
    """CABAC P slices decode for real since r14 — the old seam test is
    replaced by the standard reference validation: a well-formed CABAC
    P slice with an EMPTY DPB (it arrives before any reference
    picture) must raise the no-reference error, same as CAVLC."""
    from processor_edf_spark.operators.h264 import (
        _BitWriter,
        _nal,
        _split_annexb,
    )

    frames = _frames(1, seed=1)
    stream, _ = encode_h264_cabac_recon(frames, 64, 48, qp=28)
    nals = [n for n in _split_annexb(stream) if n]
    w = _BitWriter()
    w.ue(0)  # first_mb_in_slice
    w.ue(5)  # slice_type: P
    w.ue(0)  # pic_parameter_set_id
    w.write(0, 4)  # frame_num
    w.write(0, 1)  # num_ref_idx_active_override_flag
    w.write(0, 1)  # ref_pic_list_modification_flag_l0
    w.write(0, 1)  # adaptive_ref_pic_marking_mode_flag
    w.se(0)  # slice_qp_delta
    w.ue(1)  # disable_deblocking_filter_idc
    w.trailing_bits()
    out = (
        b"\x00\x00\x00\x01" + nals[0]      # SPS
        + b"\x00\x00\x00\x01" + nals[1]    # PPS (CABAC)
        + _nal(2, 1, w.getvalue())         # P before any reference
    )
    with pytest.raises(UnsupportedMediaError, match="reference"):
        decode_h264_ipcm(out)


def test_cabac_corruption_fuzz_never_escapes():
    frames = _frames(2, W=48, H=32, seed=11)
    stream, _ = encode_h264_cabac_recon(frames, 48, 32, qp=30)
    data = bytearray(stream)
    rng = np.random.default_rng(77)
    for _ in range(300):
        i = int(rng.integers(40, len(data)))
        old = data[i]
        data[i] = int(rng.integers(0, 256))
        try:
            decode_h264_ipcm(bytes(data))
        except UnsupportedMediaError:
            pass
        data[i] = old
    for cut in range(20, len(stream), 41):
        try:
            decode_h264_ipcm(stream[:cut])
        except UnsupportedMediaError:
            pass


def test_cabac_through_video_plugin(spark):
    """End-to-end: a raw Annex-B CABAC stream decodes decoded=true
    through the Spark video extractor (the is_annexb_h264 route)."""
    from processor_edf_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    from processor_edf_spark.operators.png import decode_png

    frames = _frames(2, W=48, H=32, seed=5)
    stream, recons = encode_h264_cabac_recon(frames, 48, 32, qp=28)
    rows = [(1, "video", stream, "video/h264", None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = sorted(sample_frames(media).collect(),
                 key=lambda r: r["frame_idx"])
    assert len(out) == 2
    for r, rec in zip(out, recons):
        luma = decode_png(bytes(r["frame"]))
        assert np.array_equal(luma[:, :, 0], rec[0])


# ---------------------------------------------------------------------------
# r14: CABAC P/B slices
# ---------------------------------------------------------------------------


def _decode_all(stream):
    from processor_edf_spark.operators.h264 import decode_h264

    return decode_h264(stream)


def _assert_bitexact(dec, recons):
    assert len(dec) == len(recons)
    for d, r in zip(dec, recons):
        assert np.array_equal(d[0], r[0])
        assert np.array_equal(d[1], r[1])
        assert np.array_equal(d[2], r[2])


@pytest.mark.parametrize("qp", [20, 28, 36])
def test_cabac_pb_round_trip_bit_exact(qp):
    from processor_edf_spark.operators.h264 import (
        encode_h264_cabac_pb_recon,
    )

    fs = _frames(5, seed=2)
    stream, recons, stats = encode_h264_cabac_pb_recon(fs, 64, 48, qp=qp)
    dw, dh, dec = _decode_all(stream)
    assert (dw, dh) == (64, 48)
    _assert_bitexact(dec, recons)
    # the mix really ran: every P shape, B direct, bi partitions,
    # intra-in-P and intra-in-B, multi-ref bins
    for key in ("P_16x16", "P_16x8", "P_8x16", "P_8x8", "intra_in_p",
                "multiref", "B_Direct", "B_16x16", "B_16x8", "B_8x16",
                "B_8x8", "intra_in_b", "bi_parts"):
        assert stats[key] > 0, key


def test_cabac_pb_static_content_forms_skips():
    """Identical frames quantize to zero residuals: mb_skip_flag = 1
    macroblocks (P and B) form and the stream stays bit-exact."""
    from processor_edf_spark.operators.h264 import (
        encode_h264_cabac_pb_recon,
    )

    # flat planes: every residual quantizes to zero, so each kind-0
    # macroblock's skip attempt succeeds in both P and B pictures
    base = (
        np.full((48, 64), 100, np.uint8),
        np.full((24, 32), 110, np.uint8),
        np.full((24, 32), 120, np.uint8),
    )
    fs = [base] * 6
    stream, recons, stats = encode_h264_cabac_pb_recon(fs, 64, 48, qp=30)
    _, _, dec = _decode_all(stream)
    _assert_bitexact(dec, recons)
    assert stats["P_Skip"] > 0
    assert stats["B_Skip"] > 0


@pytest.mark.parametrize("spatial", [True, False])
def test_cabac_pb_direct_modes(spatial):
    from processor_edf_spark.operators.h264 import (
        encode_h264_cabac_pb_recon,
    )

    fs = _frames(7, W=80, H=64, seed=6)
    stream, recons, stats = encode_h264_cabac_pb_recon(
        fs, 80, 64, qp=26, spatial_direct=spatial
    )
    _, _, dec = _decode_all(stream)
    _assert_bitexact(dec, recons)
    assert stats["B_Direct"] > 0
    if spatial:
        # B_Direct_8x8 sub-partitions ran (temporal-direct 8x8 quads
        # may legitimately fall back when the colocated reference is
        # not mappable, as in the CAVLC bipred encoder)
        assert stats["direct_sub"] > 0


def test_cabac_pb_odd_crop_geometry():
    from processor_edf_spark.operators.h264 import (
        encode_h264_cabac_pb_recon,
    )

    fs = _frames(4, W=52, H=36, seed=9)
    stream, recons, _stats = encode_h264_cabac_pb_recon(fs, 52, 36, qp=28)
    dw, dh, dec = _decode_all(stream)
    assert (dw, dh) == (52, 36)
    _assert_bitexact(dec, recons)


def test_cabac_pb_corruption_fuzz_never_escapes():
    from processor_edf_spark.operators.h264 import (
        encode_h264_cabac_pb_recon,
    )

    fs = _frames(3, W=48, H=32, seed=5)
    stream, _, _ = encode_h264_cabac_pb_recon(fs, 48, 32, qp=30)
    data = bytearray(stream)
    rng = np.random.default_rng(17)
    for _ in range(200):
        i = int(rng.integers(0, len(data)))
        old = data[i]
        data[i] = int(rng.integers(0, 256))
        try:
            _decode_all(bytes(data))
        except UnsupportedMediaError:
            pass
        data[i] = old
    for cut in range(0, len(stream), 53):
        try:
            _decode_all(stream[:cut])
        except UnsupportedMediaError:
            pass


# ---------------------------------------------------------------------------
# r14: I_PCM inside CABAC slices
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [3, 21])
def test_engine_position_equals_emitted_after_terminate(seed):
    """The invariant the I_PCM byte-alignment rests on: after
    terminate() == 1 the decoder's reader position equals the
    encoder's emitted-bit count EXACTLY (the 9-bit init lookahead is
    balanced by the discarded first bit and the flush structure)."""
    rng = np.random.default_rng(seed)
    ce = _CabacEnc(_cabac_init_ctxs())
    ops = []
    for _ in range(int(rng.integers(5, 500))):
        k = int(rng.integers(0, 3))
        b = int(rng.integers(0, 2))
        if k == 0:
            i = int(rng.integers(0, 60))
            ce.decision(i, b)
            ops.append(("d", i, b))
        elif k == 1:
            ce.bypass(b)
            ops.append(("b", 0, b))
        else:
            ce.terminate(0)
            ops.append(("t", 0, 0))
    ce.terminate(1)
    n_emitted = len(ce.bits)
    r = _BitReader(_pack(list(ce.bits) + [0] * 24))
    cd = _CabacDec(r, _cabac_init_ctxs())
    for k, i, b in ops:
        got = cd.decision(i) if k == "d" else (
            cd.bypass() if k == "b" else cd.terminate()
        )
        assert got == b
    assert cd.terminate() == 1
    assert r.pos == n_emitted


def test_cabac_ipcm_macroblocks_decode_raw():
    """The CABAC intra mix codes kind-6 macroblocks as I_PCM since
    r14: those regions decode to the SOURCE samples exactly (raw
    bytes, no quantization), the engine re-initialises mid-slice, and
    the whole frame stays bit-exact vs the encoder recon."""
    frames = _frames(2, W=64, H=48, seed=13)
    stream, recons = encode_h264_cabac_recon(frames, 64, 48, qp=40)
    dw, dh, dec = decode_h264_ipcm(stream)
    assert (dw, dh) == (64, 48)
    for rec, d in zip(recons, dec):
        for a, b in zip(rec, d):
            assert np.array_equal(a, b)
    # kind = (mb*5 + f_idx) % 7 == 6 -> I_PCM; frame 0, mb 4 qualifies
    # (4*5 + 0 = 20... use the known mapping to find one)
    mb_w = 4
    found = False
    for f_idx in range(2):
        for mb in range(12):
            if (mb * 5 + f_idx) % 7 == 6:
                my, mx = divmod(mb, mb_w)
                src = frames[f_idx][0][
                    my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16
                ]
                got = dec[f_idx][0][
                    my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16
                ]
                if src.shape == (16, 16):
                    assert np.array_equal(got, src)
                    found = True
    assert found
