"""H.264 I_PCM-subset codec tests.

Round-trips pin the encoder↔decoder pair bit-exactly across frame
geometry (macroblock-aligned, cropped, minimum 2x2), multi-slice
pictures and multi-frame streams; forced zero runs prove the
emulation-prevention escaping path really fires; hand-assembled
streams pin the DECODER against syntax the fixture encoder never
writes (high-profile SPS, pic_order_cnt_type 0/1, non-IDR I slices,
3-byte start codes, interleaved SEI/AUD/filler NALs); every
unsupported-feature gate names the optional extra; malformed-input
fuzz keeps the one-exception contract.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from processor_edf_spark.operators.h264 import (
    _IPCM_MB_TYPE,
    _BitReader,
    _BitWriter,
    _escape_rbsp,
    _nal,
    _split_annexb,
    _unescape_rbsp,
    decode_h264_ipcm,
    encode_h264_ipcm,
)
from processor_edf_spark.operators.media_codecs import (
    UnsupportedMediaError,
    decode_h264_video,
    is_annexb_h264,
    optional_codec_support,
)


def _frames(rng, w, h, n):
    return [
        (
            rng.integers(0, 256, (h, w), dtype=np.uint8),
            rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
            rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
        )
        for _ in range(n)
    ]


def _assert_roundtrip(frames, w, h, slices_per_frame=1):
    payload = encode_h264_ipcm(frames, w, h, slices_per_frame=slices_per_frame)
    dw, dh, dec = decode_h264_ipcm(payload)
    assert (dw, dh) == (w, h)
    assert len(dec) == len(frames)
    for (y, u, v), (dy, du, dv) in zip(frames, dec):
        assert np.array_equal(np.asarray(y, np.uint8), dy)
        assert np.array_equal(np.asarray(u, np.uint8), du)
        assert np.array_equal(np.asarray(v, np.uint8), dv)
    return payload


# ---------------------------------------------------------------------------
# round-trips (encoder paths)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "w,h",
    [(16, 16), (32, 48), (38, 22), (34, 18), (2, 2), (16, 2), (2, 16)],
)
def test_roundtrip_geometries(w, h):
    rng = np.random.default_rng(w * 100 + h)
    _assert_roundtrip(_frames(rng, w, h, 1), w, h)


@pytest.mark.parametrize("slices", [1, 2, 3, 7])
def test_roundtrip_multi_slice(slices):
    rng = np.random.default_rng(slices)
    # 48x32 = 6 macroblocks → slice counts that divide unevenly too
    _assert_roundtrip(_frames(rng, 48, 32, 1), 48, 32, slices_per_frame=slices)


def test_roundtrip_multi_frame():
    rng = np.random.default_rng(9)
    _assert_roundtrip(_frames(rng, 38, 22, 5), 38, 22, slices_per_frame=2)


def test_zero_planes_force_emulation_prevention():
    # All-zero PCM guarantees 00 00 00 runs in the RBSP: the escaped
    # stream must carry emulation_prevention_three_byte AND still
    # round-trip bit-exactly (decoder unescape path exercised for real).
    z = np.zeros((16, 16), np.uint8)
    zc = np.zeros((8, 8), np.uint8)
    payload = _assert_roundtrip([(z, zc, zc)], 16, 16)
    assert b"\x00\x00\x03" in payload


def test_odd_dimensions_rejected():
    rng = np.random.default_rng(1)
    with pytest.raises(UnsupportedMediaError, match="even"):
        encode_h264_ipcm(_frames(rng, 16, 16, 1), 15, 16)


def test_plane_shape_mismatch_rejected():
    y = np.zeros((16, 16), np.uint8)
    c = np.zeros((8, 8), np.uint8)
    with pytest.raises(UnsupportedMediaError, match="shape"):
        encode_h264_ipcm([(y, c, c)], 32, 16)


# ---------------------------------------------------------------------------
# escaping primitives
# ---------------------------------------------------------------------------


@given(st.binary(max_size=300))
@settings(max_examples=200, deadline=None)
def test_escape_unescape_inverse(data):
    esc = _escape_rbsp(data)
    assert _unescape_rbsp(esc) == data
    # escaped form never contains a start-code or escape-trigger run
    for bad in (b"\x00\x00\x00", b"\x00\x00\x01", b"\x00\x00\x02"):
        assert bad not in esc


def test_split_annexb_forms():
    # 3-byte codes, leading zero runs, trailing zeros after the last NAL
    stream = (
        b"\x00\x00\x01" + b"\x65\x11"
        + b"\x00\x00\x00\x00\x00\x01" + b"\x41\x22"
        + b"\x00\x00\x01" + b"\x06\x33" + b"\x00\x00"
    )
    assert _split_annexb(stream) == [b"\x65\x11", b"\x41\x22", b"\x06\x33"]
    with pytest.raises(UnsupportedMediaError, match="start code"):
        _split_annexb(b"\x01\x02\x03")


# ---------------------------------------------------------------------------
# hand-assembled decoder-only syntax (forms the encoder never writes)
# ---------------------------------------------------------------------------


def _hand_sps(profile=66, poc_type=2, mb_w=1, mb_h=1, crop=None):
    w = _BitWriter()
    w.write(profile, 8)
    w.write(0, 8)
    w.write(30, 8)
    w.ue(0)  # seq_parameter_set_id
    if profile == 100:
        w.ue(1)  # chroma_format_idc 4:2:0
        w.ue(0)  # bit_depth_luma_minus8
        w.ue(0)  # bit_depth_chroma_minus8
        w.write(0, 1)  # qpprime_y_zero_transform_bypass_flag
        w.write(0, 1)  # seq_scaling_matrix_present_flag
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(poc_type)
    if poc_type == 0:
        w.ue(0)  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        w.write(0, 1)  # delta_pic_order_always_zero_flag
        w.se(0)  # offset_for_non_ref_pic
        w.se(0)  # offset_for_top_to_bottom_field
        w.ue(2)  # num_ref_frames_in_pic_order_cnt_cycle
        w.se(1)
        w.se(-1)
    w.ue(0)  # max_num_ref_frames
    w.write(0, 1)  # gaps_in_frame_num_value_allowed_flag
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.write(1, 1)  # frame_mbs_only_flag
    w.write(1, 1)  # direct_8x8_inference_flag
    if crop:
        w.write(1, 1)
        for v in crop:  # left, right, top, bottom (chroma units)
            w.ue(v)
    else:
        w.write(0, 1)
    w.write(0, 1)  # vui_parameters_present_flag
    w.trailing_bits()
    return _nal(3, 7, w.getvalue())


def _hand_pps(cabac=False, deblock_present=True, slice_groups=0):
    w = _BitWriter()
    w.ue(0)
    w.ue(0)
    w.write(1 if cabac else 0, 1)
    w.write(0, 1)  # bottom_field_pic_order_in_frame_present_flag
    w.ue(slice_groups)
    if slice_groups == 0:
        pass
    w.ue(0)
    w.ue(0)
    w.write(0, 1)
    w.write(0, 2)
    w.se(0)
    w.se(0)
    w.se(0)
    w.write(1 if deblock_present else 0, 1)
    w.write(0, 1)
    w.write(0, 1)
    w.trailing_bits()
    return _nal(3, 8, w.getvalue())


def _hand_slice(
    pcm,
    *,
    idr=True,
    nal_ref_idc=3,
    poc_type=2,
    slice_type=7,
    first_mb=0,
    deblock_idc=1,
    deblock_present=True,
    mb_type=_IPCM_MB_TYPE,
    adaptive_marking=0,
):
    w = _BitWriter()
    w.ue(first_mb)
    w.ue(slice_type)
    w.ue(0)  # pic_parameter_set_id
    w.write(0, 4)  # frame_num
    if idr:
        w.ue(0)  # idr_pic_id
    if poc_type == 0:
        w.write(0, 4)  # pic_order_cnt_lsb
    elif poc_type == 1:
        w.se(0)  # delta_pic_order_cnt[0] (always_zero_flag is 0)
    if slice_type % 5 == 0:  # P (r12): ref count + list-mod fields
        w.write(0, 1)  # num_ref_idx_active_override_flag
        w.write(0, 1)  # ref_pic_list_modification_flag_l0
    if idr:
        w.write(0, 2)  # no_output_of_prior_pics + long_term_reference
    elif nal_ref_idc:
        w.write(adaptive_marking, 1)
    w.se(0)  # slice_qp_delta
    if deblock_present:
        w.ue(deblock_idc)
        if deblock_idc != 1:  # r12: offsets follow when filtering is on
            w.se(0)  # slice_alpha_c0_offset_div2
            w.se(0)  # slice_beta_offset_div2
    if slice_type % 5 == 2:
        for y, u, v in pcm:
            w.ue(mb_type)
            w.align_zero()
            w.write_bytes(bytes(y))
            w.write_bytes(bytes(u))
            w.write_bytes(bytes(v))
    w.trailing_bits()
    return _nal(nal_ref_idc, 5 if idr else 1, w.getvalue())


def _one_mb():
    y = bytes((7 * i + 3) % 256 for i in range(256))
    u = bytes((5 * i + 1) % 256 for i in range(64))
    v = bytes((11 * i + 2) % 256 for i in range(64))
    return [(y, u, v)]


def _check_one_mb(payload, w=16, h=16, off=(0, 0)):
    dw, dh, dec = decode_h264_ipcm(payload)
    assert (dw, dh) == (w, h)
    (y, u, v) = dec[0]
    (ytop, yleft) = off
    want_y = np.frombuffer(_one_mb()[0][0], np.uint8).reshape(16, 16)
    assert np.array_equal(y, want_y[ytop : ytop + h, yleft : yleft + w])
    want_u = np.frombuffer(_one_mb()[0][1], np.uint8).reshape(8, 8)
    assert np.array_equal(
        u, want_u[ytop // 2 : (ytop + h) // 2, yleft // 2 : (yleft + w) // 2]
    )


def test_hand_high_profile_sps():
    payload = _hand_sps(profile=100) + _hand_pps() + _hand_slice(_one_mb())
    _check_one_mb(payload)


@pytest.mark.parametrize("poc", [0, 1])
def test_hand_poc_types(poc):
    payload = (
        _hand_sps(poc_type=poc)
        + _hand_pps()
        + _hand_slice(_one_mb(), poc_type=poc)
    )
    _check_one_mb(payload)


def test_hand_non_idr_i_slice():
    payload = (
        _hand_sps()
        + _hand_pps()
        + _hand_slice(_one_mb(), idr=False, slice_type=2)
    )
    _check_one_mb(payload)


def test_hand_non_idr_non_ref_slice():
    # nal_ref_idc == 0: dec_ref_pic_marking absent entirely
    payload = (
        _hand_sps()
        + _hand_pps()
        + _hand_slice(_one_mb(), idr=False, nal_ref_idc=0)
    )
    _check_one_mb(payload)


def test_hand_cropping_offsets():
    # crop 2 px off left and 4 off top (1 and 2 chroma units)
    payload = (
        _hand_sps(crop=(1, 1, 2, 1))
        + _hand_pps()
        + _hand_slice(_one_mb())
    )
    _check_one_mb(payload, w=16 - 4, h=16 - 6, off=(4, 2))


def test_hand_sei_aud_filler_skipped():
    payload = (
        _nal(0, 9, b"\x10")  # AUD
        + _hand_sps()
        + _nal(0, 6, b"\x05\x00\x80")  # SEI
        + _hand_pps()
        + _nal(0, 12, b"\xff\xff\x80")  # filler
        + _hand_slice(_one_mb())
        + _nal(0, 10, b"\x80")  # end of sequence
    )
    _check_one_mb(payload)


# ---------------------------------------------------------------------------
# unsupported-feature gates name the optional extra
# ---------------------------------------------------------------------------


def _expect_extra(payload, match):
    with pytest.raises(UnsupportedMediaError, match=match):
        decode_h264_ipcm(payload)


def test_cabac_pps_accepted_ipcm_inside_cabac_gated():
    """CABAC decodes for real since r13, so a CABAC PPS no longer
    raises at parse.  A slice whose bits are NOT valid CABAC data (this
    hand slice carries CAVLC-layout I_PCM bytes) must fail with the one
    exception type — here the I_PCM-inside-CABAC seam or a structural
    CABAC error, never a raw parse error."""
    from processor_edf_spark.operators.media_codecs import (
        UnsupportedMediaError,
    )

    with pytest.raises(UnsupportedMediaError):
        decode_h264_ipcm(
            _hand_sps() + _hand_pps(cabac=True) + _hand_slice(_one_mb())
        )


def test_slice_groups_name_extra():
    w = _BitWriter()
    w.ue(0)
    w.ue(0)
    w.write(0, 1)
    w.write(0, 1)
    w.ue(1)  # num_slice_groups_minus1 = 1 → FMO
    w.trailing_bits()
    _expect_extra(
        _hand_sps() + _nal(3, 8, w.getvalue()) + _hand_slice(_one_mb()),
        "FMO.*av",
    )


def test_sp_slice_names_extra():
    # r12 third session: P AND B slices decode for real; SP/SI still
    # name the extra.  A B slice inside an IDR NAL is a stream error.
    _expect_extra(
        _hand_sps() + _hand_pps() + _hand_slice([], slice_type=3),
        "SP/SI.*av",
    )
    _expect_extra(
        _hand_sps() + _hand_pps() + _hand_slice([], slice_type=1),
        "IDR pictures cannot contain P/B slices",
    )


def test_p_slice_without_reference_fails_cleanly():
    # r12: a P slice is decodable syntax now, but with no reference
    # picture it must fail loudly, not produce garbage
    _expect_extra(
        _hand_sps() + _hand_pps()
        + _hand_slice([], slice_type=0, idr=False),
        "no decoded reference",
    )


def test_idr_p_slice_rejected():
    _expect_extra(
        _hand_sps() + _hand_pps() + _hand_slice([], slice_type=0),
        "IDR pictures cannot contain P/B slices",
    )


def test_deblocking_enabled_now_decodes():
    """r12: the in-loop filter is implemented, so idc=0 streams decode.
    An all-I_PCM picture filters with QPY=0 (alpha index 0 -> alpha 0),
    so the PCM samples survive bit-exactly."""
    _check_one_mb(
        _hand_sps() + _hand_pps() + _hand_slice(_one_mb(), deblock_idc=0)
    )


def test_deblocking_control_absent_now_decodes():
    """r12: no deblocking_filter_control_present_flag -> default idc 0,
    zero offsets — previously this whole stream class was rejected."""
    _check_one_mb(
        _hand_sps()
        + _hand_pps(deblock_present=False)
        + _hand_slice(_one_mb(), deblock_present=False)
    )


def test_entropy_coded_macroblock_enters_cavlc_path():
    """r11: mb_type 3 (I_16x16) no longer names the optional extra —
    entropy-coded intra macroblocks decode for real (the CAVLC suite,
    tests/test_h264_cavlc.py).  A hand-built slice whose payload is
    raw PCM bytes where CAVLC syntax should be is now MALFORMED input,
    and must surface as the typed error, never a raw crash."""
    with pytest.raises(UnsupportedMediaError):
        decode_h264_ipcm(
            _hand_sps() + _hand_pps() + _hand_slice(_one_mb(), mb_type=3)
        )


def test_adaptive_ref_marking_names_extra():
    _expect_extra(
        _hand_sps()
        + _hand_pps()
        + _hand_slice(_one_mb(), idr=False, adaptive_marking=1),
        "marking.*av",
    )


def test_interlaced_names_extra():
    w = _BitWriter()
    w.write(66, 8)
    w.write(0, 8)
    w.write(30, 8)
    w.ue(0)
    w.ue(0)
    w.ue(2)
    w.ue(0)
    w.write(0, 1)
    w.ue(0)
    w.ue(0)
    w.write(0, 1)  # frame_mbs_only_flag = 0 → fields
    w.write(0, 1)  # mb_adaptive_frame_field_flag
    w.write(1, 1)
    w.write(0, 1)
    w.write(0, 1)
    w.trailing_bits()
    _expect_extra(
        _nal(3, 7, w.getvalue()) + _hand_pps() + _hand_slice(_one_mb()),
        "interlaced|field",
    )


def test_high_profile_rejections():
    for patch, match in [
        ({"chroma": 2}, "4:2:0"),
        ({"depth": 2}, "8-bit"),
        ({"scaling": 1}, "scaling"),
    ]:
        w = _BitWriter()
        w.write(100, 8)
        w.write(0, 8)
        w.write(30, 8)
        w.ue(0)
        w.ue(patch.get("chroma", 1))
        if patch.get("chroma", 1) == 1:
            w.ue(patch.get("depth", 0))
            w.ue(0)
            w.write(0, 1)
            w.write(patch.get("scaling", 0), 1)
        w.trailing_bits()
        _expect_extra(
            _nal(3, 7, w.getvalue()) + _hand_pps() + _hand_slice(_one_mb()),
            match,
        )


# ---------------------------------------------------------------------------
# structural guards
# ---------------------------------------------------------------------------


def test_slice_before_sps_rejected():
    _expect_extra(_hand_slice(_one_mb()), "before SPS")


def test_forbidden_zero_bit_rejected():
    nal = _hand_sps()
    bad = nal[:4] + bytes([nal[4] | 0x80]) + nal[5:]
    _expect_extra(bad, "forbidden")


def test_pixel_guard():
    _expect_extra(
        _hand_sps(mb_w=4000, mb_h=4000) + _hand_pps() + _hand_slice(_one_mb()),
        "pixel guard",
    )


def test_frame_count_guard(monkeypatch):
    import processor_edf_spark.operators.h264 as h264mod

    rng = np.random.default_rng(3)
    frames = _frames(rng, 16, 16, 3)
    payload = encode_h264_ipcm(frames, 16, 16)
    monkeypatch.setattr(h264mod, "MAX_FRAMES", 2)
    _expect_extra(payload, "frame-count guard")


def test_missing_macroblocks_rejected():
    # 2-mb picture, slice carries only mb 0 → next IDR flushes short
    sps = _hand_sps(mb_w=2)
    sl0 = _hand_slice(_one_mb())  # first_mb=0, one mb of two
    _expect_extra(sps + _hand_pps() + sl0 + sl0, "missing macroblocks")


def test_out_of_order_slices_rejected():
    sps = _hand_sps(mb_w=2)
    sl_late = _hand_slice(_one_mb(), first_mb=1)
    _expect_extra(
        sps + _hand_pps() + _hand_slice(_one_mb()) + sl_late + sl_late,
        "out of macroblock order|missing",
    )


def test_too_many_macroblocks_rejected():
    _expect_extra(
        _hand_sps() + _hand_pps() + _hand_slice(_one_mb() * 2),
        "more macroblocks",
    )


def test_crop_removes_everything_rejected():
    _expect_extra(
        _hand_sps(crop=(4, 4, 0, 0)) + _hand_pps() + _hand_slice(_one_mb()),
        "cropping",
    )


def test_no_pictures_rejected():
    _expect_extra(_hand_sps() + _hand_pps(), "no decodable pictures")


# ---------------------------------------------------------------------------
# router + plugin seam
# ---------------------------------------------------------------------------


def test_router_decodes_annexb():
    rng = np.random.default_rng(5)
    frames = _frames(rng, 38, 22, 2)
    payload = encode_h264_ipcm(frames, 38, 22)
    assert is_annexb_h264(payload)
    w, h, dec = decode_h264_video(payload)
    assert (w, h, len(dec)) == (38, 22, 2)
    assert np.array_equal(dec[1][0], frames[1][0])


def test_router_rejects_non_annexb():
    assert not is_annexb_h264(b"RIFF\x00\x00\x00\x00AVI ")
    with pytest.raises(UnsupportedMediaError):
        decode_h264_video(b"\x12\x34\x56\x78" * 8)


def test_h264_ipcm_reports_available_without_extras():
    support = optional_codec_support()
    assert support["h264_ipcm"] is True


def test_spark_video_path_decodes_annexb_h264(spark):
    from processor_edf_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )
    from processor_edf_spark.operators.png import decode_png

    rng = np.random.default_rng(11)
    frames = _frames(rng, 32, 16, 3)
    payload = encode_h264_ipcm(frames, 32, 16)
    rows = [(1, "video", payload, "video/h264", None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = sorted(
        sample_frames(media, every_usec=500_000, max_frames=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [(r["frame_idx"], r["t_usec"]) for r in out] == [
        (0, 0), (1, 500_000),
    ]
    luma = decode_png(bytes(out[1]["frame"]))  # HxWx3, gray replicated
    assert np.array_equal(luma[:, :, 0], frames[1][0])
    assert np.array_equal(luma[:, :, 1], luma[:, :, 0])


# ---------------------------------------------------------------------------
# malformed-input fuzz: the one-exception contract
# ---------------------------------------------------------------------------


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_random_bytes_never_escape(data):
    try:
        decode_h264_ipcm(data)
    except UnsupportedMediaError:
        pass


@given(st.integers(min_value=0, max_value=499))
@settings(max_examples=120, deadline=None)
def test_truncation_never_escapes(cut):
    rng = np.random.default_rng(2)
    payload = encode_h264_ipcm(_frames(rng, 34, 18, 1), 34, 18)
    try:
        decode_h264_ipcm(payload[: min(cut, len(payload))])
    except UnsupportedMediaError:
        pass


@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=0, max_value=7),
)
@settings(max_examples=200, deadline=None)
def test_bitflip_never_escapes(pos, bit):
    rng = np.random.default_rng(4)
    payload = bytearray(encode_h264_ipcm(_frames(rng, 38, 22, 1), 38, 22))
    payload[pos % len(payload)] ^= 1 << bit
    try:
        decode_h264_ipcm(bytes(payload))
    except UnsupportedMediaError:
        pass


# ---------------------------------------------------------------------------
# bit primitives
# ---------------------------------------------------------------------------


@given(st.lists(st.integers(min_value=0, max_value=500), max_size=30))
@settings(max_examples=100, deadline=None)
def test_exp_golomb_roundtrip(values):
    w = _BitWriter()
    for v in values:
        w.ue(v)
    w.trailing_bits()
    r = _BitReader(w.getvalue())
    assert [r.ue() for _ in values] == values


@given(st.lists(st.integers(min_value=-200, max_value=200), max_size=30))
@settings(max_examples=100, deadline=None)
def test_signed_exp_golomb_roundtrip(values):
    w = _BitWriter()
    for v in values:
        w.se(v)
    w.trailing_bits()
    r = _BitReader(w.getvalue())
    assert [r.se() for _ in values] == values


# ---------------------------------------------------------------------------
# 4:0:0 monochrome
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "w,h,slices,nf",
    [(16, 16, 1, 1), (37, 23, 2, 3), (5, 9, 1, 2), (48, 32, 3, 1)],
)
def test_roundtrip_monochrome(w, h, slices, nf):
    # odd dimensions are LEGAL in 4:0:0 (crop unit is 1 sample)
    rng = np.random.default_rng(w * 31 + h)
    frames = [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(nf)]
    payload = encode_h264_ipcm(
        frames, w, h, slices_per_frame=slices, monochrome=True
    )
    dw, dh, dec = decode_h264_ipcm(payload)
    assert (dw, dh) == (w, h)
    assert len(dec) == nf
    for y, (dy, du, dv) in zip(frames, dec):
        assert du is None and dv is None
        assert np.array_equal(y, dy)


def test_monochrome_through_router_and_sampler(spark):
    from processor_edf_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )
    from processor_edf_spark.operators.png import decode_png

    rng = np.random.default_rng(21)
    frames = [rng.integers(0, 256, (17, 21), dtype=np.uint8)
              for _ in range(2)]
    payload = encode_h264_ipcm(frames, 21, 17, monochrome=True)
    w, h, dec = decode_h264_video(payload)
    assert (w, h) == (21, 17) and dec[0][1] is None

    media = spark.createDataFrame(
        [(1, "video", payload, "video/h264", None)], MEDIA_SCHEMA
    )
    out = sorted(
        sample_frames(media, every_usec=250_000, max_frames=4).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert len(out) == 2
    luma = decode_png(bytes(out[1]["frame"]))
    assert np.array_equal(luma[:, :, 0], frames[1])
