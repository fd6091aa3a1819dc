"""H.264 B-slice decode (r12 second ratchet).

Round trips are checked bit-exact against the encoder's reconstruction
loop (which reuses the decoder's own derivation/MC/dequant helpers), so
the direct-mode derivations are ALSO pinned by hand-computed spec
vectors (§8.4.1.2.2/.3) that cannot cancel a shared-helper bug:
DistScaleFactor scaling, colZeroFlag, MinPositive reference selection,
and the §8.2.4.2.3 default-list construction including the L1
first-two swap.  Reference behaviors: Pennsieve/processor-EDF has no
video surface (builder's-brief multimodal axis; see SURVEY.md §2
extension table)."""

import numpy as np
import pytest

from processor_edf_spark.operators.h264 import (
    _b_default_lists,
    _BitWriter,
    _derive_direct,
    _nal,
    _PicCtx,
    _RefPic,
    _split_annexb,
    _SPS,
    decode_h264_ipcm,
    encode_h264_bipred_recon,
)
from processor_edf_spark.operators.media_codecs import (
    UnsupportedMediaError,
)


def _frames(nf, W=64, H=48, seed=0, static=False):
    out = []
    for f in range(nf):
        fi = 0 if static else f
        r = np.arange(H)[:, None]
        c = np.arange(W)[None, :]
        y = (((r * 3 + c * 5 + fi * 17 + seed) % 160) + 40).astype(
            np.uint8
        )
        r2 = np.arange(H // 2)[:, None]
        c2 = np.arange(W // 2)[None, :]
        u = (((r2 * 7 + c2 * 11 + fi * 5 + seed) % 100) + 78).astype(
            np.uint8
        )
        v = (((r2 * 5 + c2 * 3 + fi * 9) % 120) + 60).astype(np.uint8)
        out.append((y, u, v))
    return out


def _assert_bit_exact(frames, W, H, **kw):
    stream, recons, stats = encode_h264_bipred_recon(frames, W, H, **kw)
    dw, dh, dec = decode_h264_ipcm(stream)
    assert (dw, dh) == (W, H)
    assert len(dec) == len(recons)
    for rec, d in zip(recons, dec):
        for a, b in zip(rec, d):
            assert np.array_equal(a, b)
    return stream, recons, stats


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("spatial", [True, False])
@pytest.mark.parametrize("inference", [True, False])
def test_round_trip_bit_exact(spatial, inference):
    frames = _frames(7, seed=3)
    _, _, stats = _assert_bit_exact(
        frames, 64, 48, qp=28, spatial_direct=spatial,
        inference=inference,
    )
    # the 12-kind mix reaches every explicit B macroblock family
    assert stats["B_Direct"] > 0
    assert stats["B_16x16"] > 0
    assert stats["B_16x8"] > 0
    assert stats["B_8x16"] > 0
    assert stats["B_8x8"] > 0
    assert stats["intra_in_b"] > 0
    assert stats["bi_parts"] > 0


@pytest.mark.parametrize("qp", [20, 28, 36])
def test_round_trip_qp_sweep(qp):
    frames = _frames(5, seed=qp)
    _, recons, _ = _assert_bit_exact(frames, 64, 48, qp=qp)
    # recon error stays inside the quantisation bound; recons (and the
    # decode they were checked bit-exact against) are in DISPLAY order
    for rec, frame in zip(recons, frames):
        err = np.abs(
            rec[0].astype(np.int64) - frame[0].astype(np.int64)
        ).max()
        assert err <= 64


def test_round_trip_with_deblocking():
    frames = _frames(6, seed=9)
    _assert_bit_exact(frames, 64, 48, qp=30, deblock=True)
    _assert_bit_exact(
        frames, 64, 48, qp=30, deblock=True, spatial_direct=False
    )


def test_all_13_sub_types_covered():
    frames = _frames(9, W=96, H=64, seed=1)
    _, _, stats = _assert_bit_exact(frames, 96, 64, qp=28)
    assert stats["sub_kinds"] == set(range(13))
    assert stats["direct_sub"] > 0


def test_static_scene_emits_b_skip():
    # zero_motion emulates motion search on static content: residuals
    # vanish, P_Skip runs form in the reference P pictures, colZeroFlag
    # zeroes the direct MVs, and kind-0 B macroblocks become B_Skip
    frames = _frames(5, seed=0, static=True)
    _, _, stats = _assert_bit_exact(
        frames, 64, 48, qp=32, zero_motion=True
    )
    assert stats["B_Skip"] > 0


def test_trailing_past_only_b_uses_l1_swap():
    # even frame count -> the last display frame is a past-only B,
    # whose L1 equals L0 and gets the §8.2.4.2.3 first-two swap
    frames = _frames(4, seed=7)
    _, _, stats = _assert_bit_exact(frames, 64, 48, qp=28)
    assert stats["l1_swapped"] >= 1
    assert ("B" == k for _d, k in stats["order"])


def test_single_reference_b_both_lists_same_picture():
    # two frames: I0 then a past-only B whose L0 == L1 == [I0]
    frames = _frames(2, W=48, H=32, seed=5)
    _, _, stats = _assert_bit_exact(frames, 48, 32, qp=28)
    assert stats["order"] == [(0, "I"), (1, "B")]


def test_odd_geometry_cropping():
    frames = _frames(5, W=50, H=34, seed=2)
    _assert_bit_exact(frames, 50, 34, qp=28)


# ---------------------------------------------------------------------------
# hand-computed spec vectors (cannot cancel shared-helper bugs)
# ---------------------------------------------------------------------------


def _sps_1mb():
    sps = _SPS()
    sps.mb_width = sps.mb_height = 1
    sps.monochrome = False
    return sps


def _refpic(poc, serial, ref0=None, mv0=None):
    ctx = _PicCtx(_sps_1mb())
    ctx.poc, ctx.serial = poc, serial
    if ref0 is not None:
        ctx.ref[:] = ref0
    if mv0 is not None:
        ctx.mv[:, :, 0] = mv0[0]
        ctx.mv[:, :, 1] = mv0[1]
    return _RefPic(ctx)


def test_temporal_direct_scaling_spec_vector():
    # colPic poc 4 references pic0 poc 0; current B poc 2; mvCol (8,-6)
    # td=4, tb=2 -> tx = (16384+2)//4 = 4096, DSF = (2*4096+32)>>6 = 128
    # mvL0 = ((128*8+128)>>8, (128*-6+128)>>8) = (4, -3)   [floor shift]
    # mvL1 = mvL0 - mvCol = (-4, 3)
    pic0 = _refpic(poc=0, serial=1)
    col = _refpic(poc=4, serial=2, ref0=0, mv0=(8, -6))
    col.refpic[:, :, 0] = 1  # colocated blocks reference pic0
    ctx = _PicCtx(_sps_1mb())
    ctx.poc = 2
    ctx.mb_slice[:] = 1
    entries = _derive_direct(
        ctx, 0, [pic0], [col], spatial=False, inference=True
    )
    assert len(entries) == 4  # one per 8x8 quadrant
    for _ro, _co, _h4, _w4, r0, mv0, r1, mv1 in entries:
        assert (r0, r1) == (0, 0)
        assert mv0 == (4, -3)
        assert mv1 == (-4, 3)


def test_temporal_direct_intra_colocated_zero_mv():
    pic0 = _refpic(poc=0, serial=1)
    col = _refpic(poc=4, serial=2)  # all blocks intra (ref -2 < 0)
    ctx = _PicCtx(_sps_1mb())
    ctx.poc = 2
    ctx.mb_slice[:] = 1
    entries = _derive_direct(
        ctx, 0, [pic0], [col], spatial=False, inference=True
    )
    for _ro, _co, _h4, _w4, r0, mv0, r1, mv1 in entries:
        assert (r0, r1) == (0, 0)
        assert mv0 == (0, 0) and mv1 == (0, 0)


def test_spatial_direct_col_zero_flag():
    # no MB neighbors (single-MB picture): refIdxLX = -1 for both ->
    # directZeroPrediction: refs 0/0, mv 0 regardless of colocated
    pic0 = _refpic(poc=0, serial=1)
    col = _refpic(poc=4, serial=2, ref0=0, mv0=(40, 40))
    col.refpic[:, :, 0] = 1
    ctx = _PicCtx(_sps_1mb())
    ctx.poc = 2
    ctx.mb_slice[:] = 1
    for ro, co, h4, w4, r0, mv0, r1, mv1 in _derive_direct(
        ctx, 0, [pic0], [col], spatial=True, inference=True
    ):
        assert (r0, r1) == (0, 0)
        assert mv0 == (0, 0) and mv1 == (0, 0)


def test_spatial_direct_neighbor_refs_and_col_zero():
    # 2x1-MB picture: decode MB1 with MB0 as its A neighbor carrying
    # refIdxL0 0 / mv (12, 4); colocated block is ref-0 near-zero
    # motion -> colZeroFlag zeroes the ref-0 list, keeps the median
    # where refIdx != 0
    sps = _SPS()
    sps.mb_width, sps.mb_height = 2, 1
    sps.monochrome = False
    ctx = _PicCtx(sps)
    ctx.poc = 2
    ctx.mb_slice[:] = 1
    # MB0 decoded inter: L0 ref 0 mv (12,4); L1 ref 1 mv (-8, 2)
    ctx.ref[:, :4] = 0
    ctx.mv[:, :4, 0] = 12
    ctx.mv[:, :4, 1] = 4
    ctx.ref1[:, :4] = 1
    ctx.mv1[:, :4, 0] = -8
    ctx.mv1[:, :4, 1] = 2

    mk = _PicCtx(sps)
    mk.poc = 0
    pic0 = _RefPic(mk)
    mk2 = _PicCtx(sps)
    mk2.poc = 8
    mk2.serial = 2
    mk2.ref[:] = 0
    mk2.mv[:, :, 0] = 1  # |mv| <= 1 -> colZeroFlag
    mk2.refpic[:, :, 0] = 1
    col = _RefPic(mk2)
    pic1 = _refpic(poc=6, serial=3)

    entries = _derive_direct(
        ctx, 1, [pic0, pic1], [col, pic0], spatial=True,
        inference=True,
    )
    for _ro, _co, _h4, _w4, r0, mv0, r1, mv1 in entries:
        # MinPositive over (A=0, B=-1, C=-1) -> 0; list1 (A=1,...) -> 1
        assert (r0, r1) == (0, 1)
        assert mv0 == (0, 0)  # ref 0 + colZeroFlag -> zeroed
        assert mv1 == (-8, 2)  # ref 1: median (A only available)


def test_b_default_list_construction_and_swap():
    past1 = _refpic(poc=0, serial=1)
    past2 = _refpic(poc=2, serial=2)
    fut1 = _refpic(poc=6, serial=3)
    l0, l1 = _b_default_lists([fut1, past2, past1], cur_poc=4)
    assert [p.serial for p in l0] == [2, 1, 3]  # past desc, future asc
    assert [p.serial for p in l1] == [3, 2, 1]  # future asc, past desc
    # all-past: lists coincide -> L1 swaps its first two entries
    l0, l1 = _b_default_lists([past2, past1], cur_poc=4)
    assert [p.serial for p in l0] == [2, 1]
    assert [p.serial for p in l1] == [1, 2]
    # single ref: no swap possible
    l0, l1 = _b_default_lists([past1], cur_poc=4)
    assert [p.serial for p in l0] == [1]
    assert [p.serial for p in l1] == [1]


# ---------------------------------------------------------------------------
# seam gates and robustness
# ---------------------------------------------------------------------------


def test_b_slice_without_references_fails_cleanly():
    frames = _frames(3, seed=4)
    stream, _, _ = encode_h264_bipred_recon(frames, 64, 48, qp=28)
    nals = [n for n in _split_annexb(stream) if n]
    # SPS + PPS + the B slice only (nal_ref_idc 0, type 1)
    assert (nals[-1][0] & 0x1F) == 1 and (nals[-1][0] >> 5) == 0
    spliced = b"".join(
        b"\x00\x00\x00\x01" + n for n in (nals[0], nals[1], nals[-1])
    )
    with pytest.raises(UnsupportedMediaError, match="no decoded ref"):
        decode_h264_ipcm(spliced)


def _weighted_pps(weighted_pred, bipred_idc):
    w = _BitWriter()
    w.ue(0)
    w.ue(0)
    w.write(0, 1)  # CAVLC
    w.write(0, 1)
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.write(weighted_pred, 1)
    w.write(bipred_idc, 2)
    w.se(0)
    w.se(0)
    w.se(0)
    w.write(0, 1)  # deblocking_filter_control_present
    w.write(0, 1)
    w.write(0, 1)
    w.trailing_bits()
    return _nal(3, 8, w.getvalue())


@pytest.mark.parametrize(
    "wp,idc,slice_ue",
    [
        (1, 0, 5),  # weighted P
        (0, 1, 6),  # explicit weighted B
        (0, 2, 6),  # implicit weighted B
    ],
)
def test_weighted_slice_headers_parse_and_fail_cleanly(wp, idc, slice_ue):
    """Weighted prediction decodes for REAL since r13
    (tests/test_h264_wp.py pins the formulas and full round trips);
    these minimal WP-flagged slices — headers with no reference
    pictures and truncated tables — must get PAST the old seam raise
    and fail with the ONE exception type for a downstream reason, not
    a raw parse error."""
    frames = _frames(3, seed=4)
    stream, _, _ = encode_h264_bipred_recon(frames, 64, 48, qp=28)
    nals = [n for n in _split_annexb(stream) if n]
    sps_nal = b"\x00\x00\x00\x01" + nals[0]
    w = _BitWriter()
    w.ue(0)  # first_mb_in_slice
    w.ue(slice_ue)  # slice_type
    w.ue(0)  # pic_parameter_set_id
    w.write(0, 4)  # frame_num
    w.write(0, 8)  # pic_order_cnt_lsb (SPS uses poc type 0, 8 bits)
    w.trailing_bits()
    payload = (
        sps_nal
        + _weighted_pps(wp, idc)
        + _nal(0 if slice_ue == 6 else 2, 1, w.getvalue())
    )
    with pytest.raises(UnsupportedMediaError) as ei:
        decode_h264_ipcm(payload)
    assert "weighted" not in str(ei.value)  # the seam raise is gone


def test_idr_cannot_contain_b_slices():
    frames = _frames(3, seed=4)
    stream, _, _ = encode_h264_bipred_recon(frames, 64, 48, qp=28)
    nals = [n for n in _split_annexb(stream) if n]
    w = _BitWriter()
    w.ue(0)
    w.ue(6)  # slice_type B inside an IDR NAL
    w.ue(0)
    w.write(0, 4)
    w.ue(0)  # idr_pic_id
    w.write(0, 8)
    w.trailing_bits()
    payload = b"".join(
        b"\x00\x00\x00\x01" + n for n in (nals[0], nals[1])
    ) + _nal(3, 5, w.getvalue())
    with pytest.raises(UnsupportedMediaError, match="IDR"):
        decode_h264_ipcm(payload)


def test_corruption_fuzz_never_escapes():
    frames = _frames(4, W=48, H=32, seed=11)
    stream, _, _ = encode_h264_bipred_recon(frames, 48, 32, qp=30)
    data = bytearray(stream)
    rng = np.random.default_rng(1234)
    for _ in range(250):
        pos = int(rng.integers(5, len(data)))
        old = data[pos]
        data[pos] = int(rng.integers(0, 256))
        try:
            decode_h264_ipcm(bytes(data))
        except UnsupportedMediaError:
            pass
        data[pos] = old


def test_truncation_fuzz_never_escapes():
    frames = _frames(4, W=48, H=32, seed=12)
    stream, _, _ = encode_h264_bipred_recon(frames, 48, 32, qp=30)
    for cut in range(8, len(stream), max(1, len(stream) // 97)):
        try:
            decode_h264_ipcm(stream[:cut])
        except UnsupportedMediaError:
            pass


@pytest.mark.parametrize("seed", range(6))
def test_randomized_geometry_content_round_trip(seed):
    """Property-style sweep: random even geometry (incl. non-MB-aligned
    crops), GOP length, QP, deblock flag, direct mode and NOISE frames
    (worst case for CAVLC level coding) — decode must stay bit-exact
    against the encoder recon in every draw."""
    import random as _random

    rng = _random.Random(4000 + seed)
    W = 2 * rng.randint(8, 48)
    H = 2 * rng.randint(8, 40)
    nf = rng.randint(2, 6)
    qp = rng.randint(18, 42)
    rng_np = np.random.default_rng(seed)
    frames = [
        (
            rng_np.integers(0, 256, (H, W)).astype(np.uint8),
            rng_np.integers(0, 256, (H // 2, W // 2)).astype(np.uint8),
            rng_np.integers(0, 256, (H // 2, W // 2)).astype(np.uint8),
        )
        for _ in range(nf)
    ]
    _assert_bit_exact(
        frames, W, H, qp=qp,
        deblock=rng.random() < 0.5,
        spatial_direct=rng.random() < 0.5,
        inference=rng.random() < 0.5,
        zero_motion=rng.random() < 0.3,
    )


# ---------------------------------------------------------------------------
# multi-slice pictures (cross-slice prediction barriers, §6.4.11)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_slices", [2, 3])
@pytest.mark.parametrize("deblock", [False, True])
def test_multi_slice_round_trip(n_slices, deblock):
    frames = _frames(5, seed=n_slices)
    _assert_bit_exact(
        frames, 64, 48, qp=28, slices_per_pic=n_slices, deblock=deblock
    )
    _assert_bit_exact(
        frames, 64, 48, qp=28, slices_per_pic=n_slices,
        deblock=deblock, spatial_direct=False,
    )


def test_slice_barriers_change_prediction():
    """The cross-slice unavailability must actually engage: the same
    frames encoded as 1 vs 2 slices per picture reconstruct
    DIFFERENTLY (boundary macroblocks lose their top neighbors for
    intra/MV/direct prediction), while each stream round-trips
    bit-exactly against its own reconstruction."""
    frames = _frames(5, seed=2)
    _, r1, _ = _assert_bit_exact(frames, 64, 48, qp=28, slices_per_pic=1)
    _, r2, _ = _assert_bit_exact(frames, 64, 48, qp=28, slices_per_pic=2)
    diffs = sum(
        int((a != b).sum()) for x, y in zip(r1, r2) for a, b in zip(x, y)
    )
    assert diffs > 0


def test_bipred_stream_routes_through_media_seam():
    """The media router's h264 path (magic-byte sniff → registered
    pure-python plugin) serves B-slice streams too — the route a
    corpus job's video frame-sampling actually takes."""
    from processor_edf_spark.operators.media_codecs import (
        decode_h264_video,
        is_annexb_h264,
    )

    frames = _frames(5, seed=13)
    stream, recons, _ = encode_h264_bipred_recon(frames, 64, 48, qp=28)
    assert is_annexb_h264(stream)
    w, h, decoded = decode_h264_video(stream)
    assert (w, h) == (64, 48)
    assert len(decoded) == 5
    for rec, dec in zip(recons, decoded):
        for a, b in zip(rec, dec):
            assert np.array_equal(a, b)


def test_decoder_output_is_display_order():
    """The plugin contract (ADVICE r12): frames come back POC-sorted
    within each IDR GOP — display order, as a PyAV replacement plugin
    would return them — NOT bitstream (decode) order.  The coded order
    here is I0 P2 B1 P4 B3; a decode-order return would put frame 2
    before frame 1."""
    from processor_edf_spark.operators.h264 import (
        decode_h264_ipcm,
        encode_h264_bipred_recon,
    )

    frames = _frames(5, seed=3)
    stream, recons, stats = encode_h264_bipred_recon(
        frames, 64, 48, qp=24
    )
    assert [d for d, _k in stats["order"]] == [0, 2, 1, 4, 3]
    _, _, dec = decode_h264_ipcm(stream)
    assert len(dec) == 5
    # display order == input order: recon error per-position bounded,
    # and strictly SMALLER against the matching display frame than
    # against the decode-order frame at the two swapped positions
    for pos in (1, 2):
        d = dec[pos][0].astype(np.int64)
        err_display = np.abs(d - frames[pos][0].astype(np.int64)).mean()
        other = [0, 2, 1, 4, 3][pos]
        err_decode = np.abs(d - frames[other][0].astype(np.int64)).mean()
        assert err_display < err_decode
    # and bit-exact against the (display-ordered) encoder recon
    for rec, d in zip(recons, dec):
        for a, b in zip(rec, d):
            assert np.array_equal(a, b)
