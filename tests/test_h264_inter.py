"""H.264 P-slice (inter prediction) layer — r12.

Validation strategy, mirroring tests/test_h264_cavlc.py:

- the quarter-pel luma and eighth-pel chroma interpolators are checked
  against INDEPENDENT scalar transcriptions of spec §8.4.2.2 (per-sample
  loops with their own clamping and position logic — a windowing or
  offset slip in the vectorized kernel cannot also be present here);
- the median MV predictor's rules (§8.4.1.3) and the P_Skip motion rule
  (§8.4.1.1) are pinned on handcrafted neighbor configurations;
- encode→decode round trips are BIT-EXACT against the encoder's own
  reconstruction loop (which calls the decoder's MC/dequant/IDCT
  helpers) across QPs, sizes, cropping, and every P macroblock kind,
  with recon-vs-source error scaling with the quantisation step;
- malformed/truncated inter streams never escape UnsupportedMediaError.

Reference behavior cited for parity: the reference repo has no video
codecs at all (SURVEY.md §2.9 — multimodal decode is builder's-brief
surface beyond processor-EDF).
"""

import numpy as np
import pytest

from processor_edf_spark.operators.h264 import (
    _CBP_INTER,
    _CBP_INTER_INV,
    _interp_chroma,
    _interp_luma,
    _mvp,
    _PicCtx,
    _skip_mv,
    _SPS,
    decode_h264_ipcm,
    encode_h264_cavlc_recon,
    encode_h264_inter_recon,
)
from processor_edf_spark.operators.media_codecs import (
    UnsupportedMediaError,
    decode_h264_video,
)


# ---------------------------------------------------------------------------
# scalar spec transcriptions (independent of the vectorized kernels)
# ---------------------------------------------------------------------------


def _scalar_luma_sample(plane, y, x, mvy, mvx):
    """One predicted luma sample per spec §8.4.2.2.1 / Table 8-12."""
    hh, ww = plane.shape

    def p(yy, xx):
        return int(plane[min(max(yy, 0), hh - 1), min(max(xx, 0), ww - 1)])

    def filt6(v):
        return v[0] - 5 * v[1] + 20 * v[2] + 20 * v[3] - 5 * v[4] + v[5]

    def clip(v):
        return max(0, min(255, v))

    iy, ix = y + (mvy >> 2), x + (mvx >> 2)
    fy, fx = mvy & 3, mvx & 3
    g = p(iy, ix)
    if fx == 0 and fy == 0:
        return g

    def half_h(yy, xx):  # unrounded b at (yy, xx)..(yy, xx+1)
        return filt6([p(yy, xx + k) for k in range(-2, 4)])

    def half_v(yy, xx):
        return filt6([p(yy + k, xx) for k in range(-2, 4)])

    b = clip((half_h(iy, ix) + 16) >> 5)
    h = clip((half_v(iy, ix) + 16) >> 5)
    if fy == 0:
        if fx == 1:
            return (g + b + 1) >> 1
        if fx == 2:
            return b
        return (p(iy, ix + 1) + b + 1) >> 1
    if fx == 0:
        if fy == 1:
            return (g + h + 1) >> 1
        if fy == 2:
            return h
        return (p(iy + 1, ix) + h + 1) >> 1
    j = clip((filt6([half_h(iy + k, ix) for k in range(-2, 4)]) + 512) >> 10)
    if fx == 2 and fy == 2:
        return j
    m = clip((half_v(iy, ix + 1) + 16) >> 5)
    s = clip((half_h(iy + 1, ix) + 16) >> 5)
    if fy == 1:
        other = {1: h, 2: j, 3: m}[fx]
        return (b + other + 1) >> 1
    if fy == 2:
        return (j + (h if fx == 1 else m) + 1) >> 1
    other = {1: h, 2: j, 3: m}[fx]
    return (s + other + 1) >> 1


def _scalar_chroma_sample(plane, y, x, mvy, mvx):
    """One predicted chroma sample per spec §8.4.2.2.2."""
    hh, ww = plane.shape

    def p(yy, xx):
        return int(plane[min(max(yy, 0), hh - 1), min(max(xx, 0), ww - 1)])

    iy, ix = y + (mvy >> 3), x + (mvx >> 3)
    fy, fx = mvy & 7, mvx & 7
    return (
        (8 - fx) * (8 - fy) * p(iy, ix)
        + fx * (8 - fy) * p(iy, ix + 1)
        + (8 - fx) * fy * p(iy + 1, ix)
        + fx * fy * p(iy + 1, ix + 1)
        + 32
    ) >> 6


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_interp_luma_matches_scalar_reference(seed):
    rng = np.random.default_rng(seed)
    plane = rng.integers(0, 256, (40, 40), dtype=np.uint8)
    for fy in range(4):
        for fx in range(4):
            mvx = int(rng.integers(-3, 4)) * 4 + fx
            mvy = int(rng.integers(-3, 4)) * 4 + fy
            y0, x0 = int(rng.integers(0, 32)), int(rng.integers(0, 32))
            got = _interp_luma(plane, y0, x0, 8, 8, mvy, mvx)
            want = np.array(
                [
                    [
                        _scalar_luma_sample(plane, y0 + r, x0 + c, mvy, mvx)
                        for c in range(8)
                    ]
                    for r in range(8)
                ],
                np.uint8,
            )
            assert np.array_equal(got, want), (fx, fy, mvx, mvy)


@pytest.mark.parametrize("seed", [0, 1])
def test_interp_luma_boundary_clamp(seed):
    rng = np.random.default_rng(100 + seed)
    plane = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    # vectors far outside the picture in every direction
    for mvx, mvy in [(-200, -200), (200, 200), (-201, 197), (99, -150)]:
        got = _interp_luma(plane, 0, 0, 16, 16, mvy, mvx)
        want = np.array(
            [
                [
                    _scalar_luma_sample(plane, r, c, mvy, mvx)
                    for c in range(16)
                ]
                for r in range(16)
            ],
            np.uint8,
        )
        assert np.array_equal(got, want), (mvx, mvy)


def test_interp_chroma_matches_scalar_reference():
    rng = np.random.default_rng(9)
    plane = rng.integers(0, 256, (20, 20), dtype=np.uint8)
    for fy in range(8):
        for fx in range(8):
            mvx = int(rng.integers(-2, 3)) * 8 + fx
            mvy = int(rng.integers(-2, 3)) * 8 + fy
            y0, x0 = int(rng.integers(0, 12)), int(rng.integers(0, 12))
            got = _interp_chroma(plane, y0, x0, 4, 4, mvy, mvx)
            want = np.array(
                [
                    [
                        _scalar_chroma_sample(
                            plane, y0 + r, x0 + c, mvy, mvx
                        )
                        for c in range(4)
                    ]
                    for r in range(4)
                ],
                np.uint8,
            )
            assert np.array_equal(got, want), (fx, fy)


# ---------------------------------------------------------------------------
# MV predictor rules (§8.4.1.3) and P_Skip motion (§8.4.1.1)
# ---------------------------------------------------------------------------


def _ctx(mb_w=4, mb_h=4):
    sps = _SPS()
    sps.mb_width, sps.mb_height = mb_w, mb_h
    sps.monochrome = False
    ctx = _PicCtx(sps)
    ctx.mb_slice[:] = 1
    return ctx


def _set_inter(ctx, r, c, mvx, mvy):
    ctx.ref[r, c] = 0
    ctx.mv[r, c] = (mvx, mvy)


def test_mvp_median_of_three():
    ctx = _ctx()
    # current MB is MB 5 (row 1, col 1): top-left 4x4 block at (4, 4)
    _set_inter(ctx, 4, 3, 10, -2)   # A (left)
    _set_inter(ctx, 3, 4, 2, 6)     # B (above)
    _set_inter(ctx, 3, 8, -6, 2)    # C (above-right)
    assert _mvp(ctx, 5, 4, 4, 4, 4) == (2, 2)  # component medians


def test_mvp_exactly_one_inter_neighbor_wins():
    ctx = _ctx()
    _set_inter(ctx, 4, 3, 7, -3)    # A inter
    ctx.ref[3, 4] = -1              # B intra (address-available)
    ctx.ref[3, 8] = -1              # C intra
    assert _mvp(ctx, 5, 4, 4, 4, 4) == (7, -3)


def test_mvp_top_row_uses_a_when_bcd_unavailable():
    ctx = _ctx()
    # MB 1 (top row): B, C, D outside the picture; A decoded
    _set_inter(ctx, 0, 3, -5, 9)
    assert _mvp(ctx, 1, 0, 4, 4, 4) == (-5, 9)


def test_mvp_directional_16x8_8x16():
    ctx = _ctx()
    _set_inter(ctx, 4, 3, 3, 3)     # A
    _set_inter(ctx, 3, 4, -8, 1)    # B
    _set_inter(ctx, 3, 8, 5, 5)     # C
    # 16x8 top -> B when B references the current picture
    assert _mvp(ctx, 5, 4, 4, 4, 2, "T16x8") == (-8, 1)
    # 8x16 left -> A
    assert _mvp(ctx, 5, 4, 4, 2, 4, "L8x16") == (3, 3)
    # 8x16 right -> C (C of the right partition is at c+2+2)
    _set_inter(ctx, 3, 10, 5, 5)
    assert _mvp(ctx, 5, 4, 6, 2, 4, "R8x16") == (5, 5)
    # directional neighbor intra -> falls back to the median rule
    ctx.ref[3, 4] = -1
    assert _mvp(ctx, 5, 4, 4, 4, 2, "T16x8") == (3, 3)  # median(3,0,5)=3


def test_skip_mv_zero_conditions():
    ctx = _ctx()
    # MB 5: both neighbors inter and non-zero -> the median predictor
    _set_inter(ctx, 4, 3, 4, 4)
    _set_inter(ctx, 3, 4, 8, 8)
    _set_inter(ctx, 3, 8, 12, 12)
    assert _skip_mv(ctx, 5) == (8, 8)
    # zero-motion ref-0 neighbor forces (0, 0)
    _set_inter(ctx, 4, 3, 0, 0)
    assert _skip_mv(ctx, 5) == (0, 0)
    # unavailable neighbor (top row) forces (0, 0)
    assert _skip_mv(ctx, 1) == (0, 0)


def test_cbp_inter_table_is_a_permutation():
    assert sorted(_CBP_INTER) == list(range(48))
    assert all(_CBP_INTER[_CBP_INTER_INV[v]] == v for v in range(48))


# ---------------------------------------------------------------------------
# encode -> decode round trips
# ---------------------------------------------------------------------------


def _moving_frames(w, h, nf, seed=7):
    rng = np.random.default_rng(seed)
    by = rng.integers(20, 230, (h + 64, w + 64), dtype=np.uint8)
    bu = rng.integers(50, 200, ((h + 64) // 2, (w + 64) // 2),
                      dtype=np.uint8)
    bv = rng.integers(50, 200, ((h + 64) // 2, (w + 64) // 2),
                      dtype=np.uint8)
    frames = []
    for f in range(nf):
        oy, ox = 8 + f * 2, 8 + f * 3
        frames.append((
            by[oy : oy + h, ox : ox + w],
            bu[oy // 2 : oy // 2 + h // 2, ox // 2 : ox // 2 + w // 2],
            bv[oy // 2 : oy // 2 + h // 2, ox // 2 : ox // 2 + w // 2],
        ))
    return frames


def _assert_round_trip(frames, w, h, qp):
    stream, recons, stats = encode_h264_inter_recon(frames, w, h, qp=qp)
    dw, dh, dec = decode_h264_ipcm(stream)
    assert (dw, dh) == (w, h)
    assert len(dec) == len(frames)
    for rec, d in zip(recons, dec):
        for a, b in zip(rec, d):
            assert np.array_equal(a, b)
    return recons, stats


@pytest.mark.parametrize("qp", [12, 20, 28, 36, 44])
def test_round_trip_bit_exact_across_qps(qp):
    frames = _moving_frames(48, 48, 4)
    _assert_round_trip(frames, 48, 48, qp)


@pytest.mark.parametrize("dims", [(16, 16), (40, 24), (64, 48), (34, 18)])
def test_round_trip_bit_exact_across_sizes(dims):
    w, h = dims
    frames = _moving_frames(w, h, 3, seed=w * 100 + h)
    _assert_round_trip(frames, w, h, 28)


def test_recon_error_scales_with_qp():
    frames = _moving_frames(48, 48, 3, seed=3)
    errs = []
    for qp in (12, 28, 44):
        recons, _ = _assert_round_trip(frames, 48, 48, qp)
        errs.append(max(
            int(np.abs(r[0].astype(int) - f[0].astype(int)).max())
            for r, f in zip(recons, frames)
        ))
    assert errs[0] < errs[1] < errs[2]
    assert errs[0] <= 6  # near-transparent at QP 12


def test_every_p_mb_kind_and_fraction_covered():
    frames = _moving_frames(96, 96, 4, seed=11)
    _, stats = _assert_round_trip(frames, 96, 96, 28)
    for kind in ("P_16x16", "P_16x8", "P_8x16", "P_8x8", "intra_in_p"):
        assert stats[kind] > 0, kind
    assert stats["fracs"] == {(fx, fy) for fx in range(4)
                              for fy in range(4)}


def test_skip_coverage_on_static_scene():
    r = np.arange(64)[:, None]
    c = np.arange(64)[None, :]
    y = ((r * 2 + c * 3) % 128 + 60).astype(np.uint8)
    u = np.full((32, 32), 120, np.uint8)
    v = np.full((32, 32), 130, np.uint8)
    frames = [(y, u, v)] * 4
    _, stats = _assert_round_trip(frames, 64, 64, 32)
    assert stats["P_Skip"] > 0


def test_router_decodes_inter_streams():
    frames = _moving_frames(32, 32, 3, seed=5)
    stream, recons, _ = encode_h264_inter_recon(frames, 32, 32, qp=28)
    dw, dh, dec = decode_h264_video(stream)  # the production router
    assert (dw, dh) == (32, 32) and len(dec) == 3
    assert np.array_equal(dec[-1][0], recons[-1][0])


def test_intra_only_round_trip_unchanged():
    # the r11 intra encoder still round-trips through the extended loop
    frames = _moving_frames(32, 32, 2, seed=13)
    stream, recons = encode_h264_cavlc_recon(frames, 32, 32, qp=28)
    dw, dh, dec = decode_h264_ipcm(stream)
    assert (dw, dh) == (32, 32)
    for rec, d in zip(recons, dec):
        for a, b in zip(rec, d):
            assert np.array_equal(a, b)


# ---------------------------------------------------------------------------
# error paths + fuzz
# ---------------------------------------------------------------------------


def test_p_slice_before_reference_raises():
    frames = _moving_frames(32, 32, 3, seed=1)
    stream, _, _ = encode_h264_inter_recon(frames, 32, 32, qp=28)
    # drop the IDR slice NAL (keep SPS+PPS) -> first slice is P
    starts = []
    i = 0
    while True:
        i = stream.find(b"\x00\x00\x00\x01", i)
        if i < 0:
            break
        starts.append(i)
        i += 4
    nals = [
        stream[s : e]
        for s, e in zip(starts, starts[1:] + [len(stream)])
    ]
    no_idr = b"".join(n for n in nals if n[4] & 0x1F != 5)
    with pytest.raises(UnsupportedMediaError):
        decode_h264_ipcm(no_idr)


def test_truncation_fuzz_never_escapes():
    frames = _moving_frames(48, 32, 3, seed=2)
    stream, _, _ = encode_h264_inter_recon(frames, 48, 32, qp=30)
    for cut in range(8, len(stream), max(1, len(stream) // 97)):
        try:
            decode_h264_ipcm(stream[:cut])
        except UnsupportedMediaError:
            pass


def test_corruption_fuzz_never_escapes():
    frames = _moving_frames(32, 32, 3, seed=4)
    stream, _, _ = encode_h264_inter_recon(frames, 32, 32, qp=30)
    data = bytearray(stream)
    rng = np.random.default_rng(42)
    for _ in range(250):
        pos = int(rng.integers(5, len(data)))
        old = data[pos]
        data[pos] = int(rng.integers(0, 256))
        try:
            decode_h264_ipcm(bytes(data))
        except UnsupportedMediaError:
            pass
        data[pos] = old


# ---------------------------------------------------------------------------
# multiple reference frames (r12)
# ---------------------------------------------------------------------------


def test_read_te_single_bit_range():
    from processor_edf_spark.operators.h264 import _BitReader, _read_te

    # te(v) with range [0,1] is one flipped bit (spec §9.1.1)
    r = _BitReader(bytes([0b10000000]))
    assert _read_te(r, 1) == 0
    r = _BitReader(bytes([0b00000000]))
    assert _read_te(r, 1) == 1


def test_edge_bs_different_refs():
    from processor_edf_spark.operators.h264 import _edge_bs

    ctx = _ctx()
    ctx.ref[:] = 0
    ctx.nc_y[:] = 0
    # r12: bS compares reference-picture IDENTITY (decode serial),
    # not the list index — two indices can name the same picture
    ctx.refpic[:, :, 0] = 7
    ctx.refpic[0, 1, 0] = 9  # same MV, different reference picture
    assert _edge_bs(ctx, 0, 0, 0, 1, mb_edge=False) == 1
    ctx.refpic[0, 1, 0] = 7
    ctx.ref[0, 1] = 1  # different index, SAME picture -> bS 0
    assert _edge_bs(ctx, 0, 0, 0, 1, mb_edge=False) == 0


@pytest.mark.parametrize("nrefs,deblock", [(2, False), (3, False),
                                           (2, True), (3, True)])
def test_multiref_round_trip_bit_exact(nrefs, deblock):
    frames = _moving_frames(48, 48, 6, seed=nrefs * 10 + deblock)
    stream, recons, stats = encode_h264_inter_recon(
        frames, 48, 48, qp=30, deblock=deblock, num_refs=nrefs
    )
    assert stats["multiref"] > 0  # non-zero ref_idx partitions exercised
    dw, dh, dec = decode_h264_ipcm(stream)
    assert (dw, dh) == (48, 48) and len(dec) == 6
    for rec, d in zip(recons, dec):
        for a, b in zip(rec, d):
            assert np.array_equal(a, b)


def test_num_ref_exceeding_dpb_fails_cleanly():
    frames = _moving_frames(32, 32, 3, seed=4)
    stream, _, _ = encode_h264_inter_recon(
        frames, 32, 32, qp=30, num_refs=2
    )
    # drop the FIRST P picture's NAL: the remaining P slice claims
    # num_ref_idx_l0_active = 2 against a 1-deep DPB
    starts = []
    i = 0
    while True:
        i = stream.find(b"\x00\x00\x00\x01", i)
        if i < 0:
            break
        starts.append(i)
        i += 4
    nals = [
        stream[s:e] for s, e in zip(starts, starts[1:] + [len(stream)])
    ]
    p_seen = 0
    kept = []
    for n in nals:
        if n[4] & 0x1F == 1:
            p_seen += 1
            if p_seen == 1:
                continue
        kept.append(n)
    with pytest.raises(UnsupportedMediaError,
                       match="fewer decoded reference"):
        decode_h264_ipcm(b"".join(kept))
