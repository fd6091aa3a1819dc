"""Pure-python H.264/AVC decoder for the I_PCM profile + fixture encoder.

H.264 is the dominant video codec in real crawl/training corpora, and
the one video format the codec seam still routed entirely to the
optional PyAV extra.  A full inter/intra transform decoder needs the
spec's CAVLC coeff_token tables (large tabulated constants that cannot
be re-derived, so they stay behind the optional seam — the MP3
precedent).  But a genuine, spec-compliant SUBSET is fully
algorithmic: Annex-B framing, NAL emulation-prevention unescaping,
Exp-Golomb entropy coding, SPS/PPS/slice-header syntax, and the I_PCM
macroblock — raw uncompressed samples carried inside a real H.264
bitstream (spec §7.3.5 ``pcm_sample_luma/chroma``).  Every byte of
that path is exact, so this module decodes all-I_PCM streams for REAL
in every environment — the video twin of the VP8L/FLAC plugins — and
raises the honest one-exception contract naming the optional extra
the moment a stream uses entropy-coded macroblocks, CABAC, fields, or
in-loop deblocking (which would alter I_PCM edges and make a
filter-less decode quietly wrong).

Decoder coverage:

- Annex-B byte-stream scan (3- and 4-byte start codes, leading zero
  runs) and emulation_prevention_three_byte removal (spec §7.4.1.1).
- NAL dispatch: SPS (7), PPS (8), IDR / non-IDR I slices (5 / 1),
  SEI (6) / AUD (9) / filler (12) and unknown types skipped.
- SPS: baseline AND the high-profile branch (chroma_format_idc,
  bit-depth fields, scaling-matrix flag), all three
  pic_order_cnt_type layouts, frame cropping (2-sample chroma crop
  units), VUI presence tolerated.
- PPS: full syntax through redundant_pic_cnt_present_flag; CABAC
  (entropy_coding_mode_flag) and slice groups rejected as
  unsupported-named-extra.
- Slice header: multi-slice pictures via first_mb_in_slice, IDR and
  non-IDR forms, dec_ref_pic_marking, per-slice QP, deblocking
  control (only disable_deblocking_filter_idc == 1 is decodable
  without a filter implementation — anything else names the extra).
- Macroblock layer: I_PCM (mb_type 25 in I slices) — alignment bits,
  256 luma + 2x64 chroma raw samples per macroblock (4:2:0, 8-bit),
  or luma-only for 4:0:0 monochrome streams (chroma_format_idc 0,
  crop units of 1 sample — the surveillance/medical profile).

The encoder writes the same subset honestly: baseline-profile SPS
(with real frame cropping for non-multiple-of-16 dimensions), CAVLC
PPS with deblocking control present, one or more I_PCM slices per
IDR picture, emulation-prevention escaping on every NAL — so the
decoder's real-structure paths (escaping, cropping, multi-slice
reassembly) are exercised by round-trip property tests rather than
hand-trusted.  I_PCM is lossless by construction, so round trips are
bit-exact and the driver row's oracle is closed-form.

Same contracts as the sibling codecs (jpeg.py / webp.py / flac.py):
one exception type (UnsupportedMediaError), a pixel-inflation guard,
malformed input never escapes as a raw IndexError/struct.error.
"""

from __future__ import annotations

import numpy as np

from processor_edf_spark.operators.media_codecs import UnsupportedMediaError

#: inflation guard — same spirit as jpeg.MAX_PIXELS: header-declared
#: geometry must not make us allocate unbounded frame memory.
MAX_PIXELS = 1 << 26
MAX_FRAMES = 1 << 12

_IPCM_MB_TYPE = 25  # I_PCM in I slices (spec table 7-11)

_HIGH_PROFILES = frozenset(
    {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}
)


class _BitReader:
    """MSB-first bit reader over an unescaped RBSP (H.264 bit order)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise UnsupportedMediaError("h264: bitstream truncated")
        v = 0
        p = self.pos
        data = self.data
        while n > 0 and p & 7:
            v = (v << 1) | ((data[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
            n -= 1
        while n >= 8:
            v = (v << 8) | data[p >> 3]
            p += 8
            n -= 8
        while n > 0:
            v = (v << 1) | ((data[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
            n -= 1
        self.pos = end
        return v

    def ue(self) -> int:
        """Exp-Golomb unsigned (spec §9.1): k leading zeros, then the
        k+1-bit binary of value+1."""
        data, nbits = self.data, len(self.data) * 8
        p = self.pos
        zeros = 0
        while True:
            if p >= nbits:
                raise UnsupportedMediaError("h264: bitstream truncated")
            if (data[p >> 3] >> (7 - (p & 7))) & 1:
                break
            p += 1
            zeros += 1
            if zeros > 31:
                raise UnsupportedMediaError("h264: exp-golomb overrun")
        self.pos = p + 1
        return (1 << zeros) - 1 + (self.read(zeros) if zeros else 0)

    def se(self) -> int:
        """Exp-Golomb signed (spec §9.1.1): 1→1, 2→-1, 3→2, 4→-2, …"""
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def bytes_at(self, n: int) -> bytes:
        """n aligned raw bytes (the PCM fast path)."""
        if self.pos & 7:
            raise AssertionError("unaligned PCM read")
        start = self.pos >> 3
        if start + n > len(self.data):
            raise UnsupportedMediaError("h264: bitstream truncated")
        self.pos += n * 8
        return self.data[start : start + n]


class _BitWriter:
    """MSB-first bit writer — the encoder twin."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def ue(self, v: int) -> None:
        zeros = (v + 1).bit_length() - 1
        self.write(0, zeros)
        self.write(v + 1, zeros + 1)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align_zero(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def write_bytes(self, data: bytes) -> None:
        if self.nacc:
            raise AssertionError("unaligned PCM write")
        self.buf.extend(data)

    def trailing_bits(self) -> None:
        """rbsp_trailing_bits: stop-one then zero pad (spec §7.3.2.11)."""
        self.write(1, 1)
        self.align_zero()

    def getvalue(self) -> bytes:
        if self.nacc:
            raise AssertionError("unaligned h264 writer")
        return bytes(self.buf)


def _unescape_rbsp(nal: bytes) -> bytes:
    """Remove emulation_prevention_three_byte: a 0x03 after two zero
    bytes is an escape, not payload (spec §7.4.1.1)."""
    out = bytearray()
    zeros = 0
    i = 0
    n = len(nal)
    while i < n:
        b = nal[i]
        if zeros >= 2 and b == 0x03:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def _escape_rbsp(rbsp: bytes) -> bytes:
    """Insert emulation_prevention_three_byte wherever the RBSP would
    otherwise contain 0x000000..0x000003 (spec §7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 0x03:
            out.append(0x03)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _rbsp_stop_bit(data: bytes) -> int:
    """Bit position of the rbsp_stop_one_bit — the FINAL 1 bit in the
    RBSP; everything before it is slice payload (spec §7.2
    more_rbsp_data)."""
    for i in range(len(data) - 1, -1, -1):
        b = data[i]
        if b:
            tz = (b & -b).bit_length() - 1
            return i * 8 + 7 - tz
    raise UnsupportedMediaError("h264: slice has no rbsp_stop_one_bit")


def _split_annexb(payload: bytes) -> list[bytes]:
    """Split an Annex-B byte stream into NAL units (start codes
    00 00 01 with any number of leading zeros)."""
    nals = []
    i = payload.find(b"\x00\x00\x01")
    if i < 0:
        raise UnsupportedMediaError("h264: no Annex-B start code")
    i += 3
    while True:
        j = payload.find(b"\x00\x00\x01", i)
        if j < 0:
            chunk = payload[i:]
            if chunk:
                nals.append(chunk.rstrip(b"\x00") or chunk)
            return nals
        end = j
        while end > i and payload[end - 1] == 0:
            end -= 1
        if end > i:
            nals.append(payload[i:end])
        i = j + 3


class _SPS:
    __slots__ = (
        "mb_width", "mb_height", "log2_max_frame_num",
        "poc_type", "log2_max_poc_lsb", "delta_pic_order_always_zero",
        "crop_left", "crop_right", "crop_top", "crop_bottom",
        "monochrome",
    )


def _parse_sps(r: _BitReader) -> _SPS:
    sps = _SPS()
    profile_idc = r.read(8)
    r.read(8)  # constraint flags + reserved
    r.read(8)  # level_idc
    r.ue()  # seq_parameter_set_id
    sps.monochrome = False
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 0:
            # 4:0:0 monochrome (spec §6.2): I_PCM macroblocks carry
            # luma samples only — surveillance/medical streams
            sps.monochrome = True
        elif chroma_format_idc != 1:
            raise UnsupportedMediaError(
                "h264: only 4:2:0 / 4:0:0 chroma is decodable without "
                "the optional codec library (av)"
            )
        if r.ue() or r.ue():  # bit_depth_luma/chroma_minus8
            raise UnsupportedMediaError(
                "h264: >8-bit depth needs the optional codec library (av)"
            )
        r.read(1)  # qpprime_y_zero_transform_bypass_flag
        if r.read(1):  # seq_scaling_matrix_present_flag
            raise UnsupportedMediaError(
                "h264: scaling matrices need the optional codec library (av)"
            )
    sps.log2_max_frame_num = r.ue() + 4
    sps.poc_type = r.ue()
    sps.log2_max_poc_lsb = 0
    sps.delta_pic_order_always_zero = 1
    if sps.poc_type == 0:
        sps.log2_max_poc_lsb = r.ue() + 4
    elif sps.poc_type == 1:
        sps.delta_pic_order_always_zero = r.read(1)
        r.se()  # offset_for_non_ref_pic
        r.se()  # offset_for_top_to_bottom_field
        for _ in range(r.ue()):
            r.se()  # offset_for_ref_frame[i]
    r.ue()  # max_num_ref_frames
    r.read(1)  # gaps_in_frame_num_value_allowed_flag
    sps.mb_width = r.ue() + 1
    sps.mb_height = r.ue() + 1
    if sps.mb_width * sps.mb_height * 256 > MAX_PIXELS:
        raise UnsupportedMediaError("h264: frame exceeds pixel guard")
    if not r.read(1):  # frame_mbs_only_flag
        raise UnsupportedMediaError(
            "h264: interlaced (field) coding needs the optional codec "
            "library (av)"
        )
    r.read(1)  # direct_8x8_inference_flag
    sps.crop_left = sps.crop_right = sps.crop_top = sps.crop_bottom = 0
    if r.read(1):  # frame_cropping_flag — offsets in crop units:
        # 2 samples for 4:2:0 (SubWidthC/SubHeightC), 1 for monochrome
        # (spec §7.4.2.1.1 CropUnitX/Y)
        unit = 1 if sps.monochrome else 2
        sps.crop_left = r.ue() * unit
        sps.crop_right = r.ue() * unit
        sps.crop_top = r.ue() * unit
        sps.crop_bottom = r.ue() * unit
    # vui_parameters_present_flag and the VUI itself are irrelevant to
    # sample reconstruction — tolerated, not parsed.
    return sps


class _PPS:
    __slots__ = ("bottom_field_poc_present", "deblocking_control_present")


def _parse_pps(r: _BitReader) -> _PPS:
    pps = _PPS()
    r.ue()  # pic_parameter_set_id
    r.ue()  # seq_parameter_set_id
    if r.read(1):  # entropy_coding_mode_flag
        raise UnsupportedMediaError(
            "h264: CABAC entropy coding needs the optional codec "
            "library (av)"
        )
    pps.bottom_field_poc_present = r.read(1)
    if r.ue():  # num_slice_groups_minus1
        raise UnsupportedMediaError(
            "h264: slice groups (FMO) need the optional codec library (av)"
        )
    r.ue()  # num_ref_idx_l0_default_active_minus1
    r.ue()  # num_ref_idx_l1_default_active_minus1
    r.read(1)  # weighted_pred_flag
    r.read(2)  # weighted_bipred_idc
    r.se()  # pic_init_qp_minus26
    r.se()  # pic_init_qs_minus26
    r.se()  # chroma_qp_index_offset
    pps.deblocking_control_present = r.read(1)
    r.read(1)  # constrained_intra_pred_flag
    r.read(1)  # redundant_pic_cnt_present_flag
    # optional high-profile PPS tail (transform_8x8_mode etc.) does not
    # affect I_PCM reconstruction — tolerated, not parsed.
    return pps


def decode_h264_ipcm(payload: bytes):
    """Annex-B H.264 → (width, height, [(Y, U, V)]) for all-I_PCM
    streams; raises UnsupportedMediaError naming the optional extra on
    any entropy-coded macroblock or filter-dependent stream."""
    sps: _SPS | None = None
    pps: _PPS | None = None
    frames: list[tuple] = []
    cur = None  # (Y, U, V, filled_mbs) of the picture being assembled
    n_mbs = 0

    def flush():
        nonlocal cur
        if cur is not None:
            y, u, v, filled = cur
            if filled != n_mbs:
                raise UnsupportedMediaError(
                    "h264: picture ended with missing macroblocks"
                )
            if len(frames) >= MAX_FRAMES:
                raise UnsupportedMediaError("h264: frame-count guard")
            frames.append((y, u, v))
            cur = None

    for nal in _split_annexb(payload):
        if not nal:
            continue
        hdr = nal[0]
        if hdr & 0x80:
            raise UnsupportedMediaError("h264: forbidden_zero_bit set")
        nal_type = hdr & 0x1F
        if nal_type == 7:
            sps = _parse_sps(_BitReader(_unescape_rbsp(nal[1:])))
            n_mbs = sps.mb_width * sps.mb_height
        elif nal_type == 8:
            pps = _parse_pps(_BitReader(_unescape_rbsp(nal[1:])))
        elif nal_type in (1, 5):
            if sps is None or pps is None:
                raise UnsupportedMediaError("h264: slice before SPS/PPS")
            r = _BitReader(_unescape_rbsp(nal[1:]))
            first_mb = r.ue()
            slice_type = r.ue()
            if slice_type % 5 != 2:  # 2/7 = I (spec table 7-6)
                raise UnsupportedMediaError(
                    "h264: P/B/SP/SI slices need the optional codec "
                    "library (av)"
                )
            r.ue()  # pic_parameter_set_id
            r.read(sps.log2_max_frame_num)  # frame_num
            if nal_type == 5:
                r.ue()  # idr_pic_id
            if sps.poc_type == 0:
                r.read(sps.log2_max_poc_lsb)
                if pps.bottom_field_poc_present:
                    r.se()
            elif sps.poc_type == 1 and not sps.delta_pic_order_always_zero:
                r.se()
                if pps.bottom_field_poc_present:
                    r.se()
            if nal_type == 5:
                r.read(2)  # no_output_of_prior_pics + long_term_reference
            elif (hdr >> 5) & 0x3:  # nal_ref_idc > 0
                if r.read(1):  # adaptive_ref_pic_marking_mode_flag
                    raise UnsupportedMediaError(
                        "h264: adaptive ref-pic marking needs the "
                        "optional codec library (av)"
                    )
            r.se()  # slice_qp_delta
            if pps.deblocking_control_present:
                if r.ue() != 1:  # disable_deblocking_filter_idc
                    raise UnsupportedMediaError(
                        "h264: in-loop deblocking (which filters I_PCM "
                        "edges) needs the optional codec library (av)"
                    )
            else:
                raise UnsupportedMediaError(
                    "h264: deblocking not disabled — filtered output "
                    "needs the optional codec library (av)"
                )
            if first_mb == 0:
                flush()
                cur = (
                    np.empty((sps.mb_height * 16, sps.mb_width * 16), np.uint8),
                    None if sps.monochrome else np.empty(
                        (sps.mb_height * 8, sps.mb_width * 8), np.uint8
                    ),
                    None if sps.monochrome else np.empty(
                        (sps.mb_height * 8, sps.mb_width * 8), np.uint8
                    ),
                    0,
                )
            if cur is None or first_mb != cur[3]:
                raise UnsupportedMediaError(
                    "h264: slices out of macroblock order"
                )
            y_pl, u_pl, v_pl, filled = cur
            mb = first_mb
            # more_rbsp_data (spec §7.2): data remains strictly before
            # the final 1 bit (the rbsp_stop_one_bit) — this is what
            # ends a slice that covers only part of the picture.
            stop = _rbsp_stop_bit(r.data)
            while r.pos < stop:
                if mb >= n_mbs:
                    raise UnsupportedMediaError(
                        "h264: more macroblocks than the picture holds"
                    )
                if r.ue() != _IPCM_MB_TYPE:
                    raise UnsupportedMediaError(
                        "h264: entropy-coded macroblocks need the "
                        "optional codec library (av)"
                    )
                r.align()  # pcm_alignment_zero_bit
                my, mx = divmod(mb, sps.mb_width)
                luma = np.frombuffer(r.bytes_at(256), np.uint8)
                y_pl[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = (
                    luma.reshape(16, 16)
                )
                if u_pl is not None:  # 4:2:0; monochrome carries no chroma
                    cb = np.frombuffer(r.bytes_at(64), np.uint8)
                    cr = np.frombuffer(r.bytes_at(64), np.uint8)
                    u_pl[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (
                        cb.reshape(8, 8)
                    )
                    v_pl[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (
                        cr.reshape(8, 8)
                    )
                mb += 1
            cur = (y_pl, u_pl, v_pl, mb)
        # SEI (6), AUD (9), filler (12), end-of-seq/stream, unknown:
        # skipped — none carry sample data.
    flush()
    if sps is None or not frames:
        raise UnsupportedMediaError("h264: no decodable pictures")
    w = sps.mb_width * 16 - sps.crop_left - sps.crop_right
    h = sps.mb_height * 16 - sps.crop_top - sps.crop_bottom
    if w <= 0 or h <= 0:
        raise UnsupportedMediaError("h264: cropping removes every sample")
    out = []
    for y_pl, u_pl, v_pl in frames:
        cy = y_pl[sps.crop_top : sps.crop_top + h,
                  sps.crop_left : sps.crop_left + w]
        if u_pl is None:  # monochrome: luma only
            out.append((cy, None, None))
            continue
        out.append((
            cy,
            u_pl[sps.crop_top // 2 : (sps.crop_top + h) // 2,
                 sps.crop_left // 2 : (sps.crop_left + w) // 2],
            v_pl[sps.crop_top // 2 : (sps.crop_top + h) // 2,
                 sps.crop_left // 2 : (sps.crop_left + w) // 2],
        ))
    return w, h, out


def _nal(nal_ref_idc: int, nal_type: int, rbsp: bytes) -> bytes:
    return (
        b"\x00\x00\x00\x01"
        + bytes([(nal_ref_idc << 5) | nal_type])
        + _escape_rbsp(rbsp)
    )


def encode_h264_ipcm(frames, width: int, height: int,
                     slices_per_frame: int = 1,
                     monochrome: bool = False) -> bytes:
    """Annex-B all-I_PCM encoder (tests + fixtures): baseline SPS with
    real frame cropping, CAVLC PPS, one IDR picture per frame split
    into ``slices_per_frame`` slices.  ``frames`` is a list of
    (Y, U, V) uint8 arrays at the CROPPED (display) size — width and
    height must be even (4:2:0 crop units are 2 samples); padding up
    to the 16-px macroblock grid is zero-filled and cropped back out
    by any compliant decoder.  With ``monochrome`` the stream is
    4:0:0 (high-profile SPS, chroma_format_idc 0): each frame is a
    bare HxW luma array, crop units are 1 sample so odd dimensions
    are legal, and I_PCM macroblocks carry 256 luma bytes only."""
    if not monochrome and (width % 2 or height % 2):
        raise UnsupportedMediaError("h264 encoder: dimensions must be even")
    mb_w = -(-width // 16)
    mb_h = -(-height // 16)
    crop_right = mb_w * 16 - width
    crop_bottom = mb_h * 16 - height
    crop_unit = 1 if monochrome else 2

    w = _BitWriter()
    if monochrome:
        w.write(100, 8)  # profile_idc: high (carries chroma_format_idc)
        w.write(0x00, 8)
        w.write(30, 8)  # level_idc
        w.ue(0)  # seq_parameter_set_id
        w.ue(0)  # chroma_format_idc: 4:0:0
        w.ue(0)  # bit_depth_luma_minus8
        w.ue(0)  # bit_depth_chroma_minus8
        w.write(0, 1)  # qpprime_y_zero_transform_bypass_flag
        w.write(0, 1)  # seq_scaling_matrix_present_flag
    else:
        w.write(66, 8)  # profile_idc: baseline
        w.write(0xC0, 8)  # constraint_set0+1, reserved zeros
        w.write(30, 8)  # level_idc
        w.ue(0)  # seq_parameter_set_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type: 2 (decode-order output)
    w.ue(0)  # max_num_ref_frames
    w.write(0, 1)  # gaps_in_frame_num_value_allowed_flag
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.write(1, 1)  # frame_mbs_only_flag
    w.write(1, 1)  # direct_8x8_inference_flag
    if crop_right or crop_bottom:
        w.write(1, 1)
        w.ue(0)
        w.ue(crop_right // crop_unit)
        w.ue(0)
        w.ue(crop_bottom // crop_unit)
    else:
        w.write(0, 1)
    w.write(0, 1)  # vui_parameters_present_flag
    w.trailing_bits()
    out = bytearray(_nal(3, 7, w.getvalue()))

    w = _BitWriter()
    w.ue(0)  # pic_parameter_set_id
    w.ue(0)  # seq_parameter_set_id
    w.write(0, 1)  # entropy_coding_mode_flag: CAVLC
    w.write(0, 1)  # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)  # num_slice_groups_minus1
    w.ue(0)
    w.ue(0)  # num_ref_idx_l0/l1_default_active_minus1
    w.write(0, 1)  # weighted_pred_flag
    w.write(0, 2)  # weighted_bipred_idc
    w.se(0)
    w.se(0)  # pic_init_qp/qs_minus26
    w.se(0)  # chroma_qp_index_offset
    w.write(1, 1)  # deblocking_filter_control_present_flag
    w.write(0, 1)  # constrained_intra_pred_flag
    w.write(0, 1)  # redundant_pic_cnt_present_flag
    w.trailing_bits()
    out += _nal(3, 8, w.getvalue())

    n_mbs = mb_w * mb_h
    for f_idx, frame in enumerate(frames):
        if monochrome:
            y, u, v = frame, None, None
        else:
            y, u, v = frame
        y = np.asarray(y, np.uint8)
        if y.shape != (height, width):
            raise UnsupportedMediaError("h264 encoder: plane shape mismatch")
        y_pad = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
        y_pad[:height, :width] = y
        u_pad = v_pad = None
        if not monochrome:
            u = np.asarray(u, np.uint8)
            v = np.asarray(v, np.uint8)
            if u.shape != (height // 2, width // 2):
                raise UnsupportedMediaError(
                    "h264 encoder: plane shape mismatch"
                )
            u_pad = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
            v_pad = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
            u_pad[: height // 2, : width // 2] = u
            v_pad[: height // 2, : width // 2] = v

        bounds = [
            (n_mbs * s) // slices_per_frame
            for s in range(slices_per_frame + 1)
        ]
        for s in range(slices_per_frame):
            first_mb, end_mb = bounds[s], bounds[s + 1]
            if first_mb == end_mb:
                continue
            w = _BitWriter()
            w.ue(first_mb)
            w.ue(7)  # slice_type: I (all slices in picture are I)
            w.ue(0)  # pic_parameter_set_id
            w.write(0, 4)  # frame_num (log2_max_frame_num = 4)
            w.ue(f_idx % 16)  # idr_pic_id — differs between IDR pics
            w.write(0, 2)  # no_output_of_prior_pics + long_term_reference
            w.se(0)  # slice_qp_delta
            w.ue(1)  # disable_deblocking_filter_idc: off (PCM-exact)
            for mb in range(first_mb, end_mb):
                w.ue(_IPCM_MB_TYPE)
                w.align_zero()  # pcm_alignment_zero_bit
                my, mx = divmod(mb, mb_w)
                w.write_bytes(
                    y_pad[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16]
                    .tobytes()
                )
                if not monochrome:
                    w.write_bytes(
                        u_pad[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                        .tobytes()
                    )
                    w.write_bytes(
                        v_pad[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                        .tobytes()
                    )
            w.trailing_bits()
            out += _nal(3, 5, w.getvalue())
    return bytes(out)
