"""Pure-python H.264/AVC decoder (I_PCM + CAVLC intra + P-slice inter)
+ fixture encoders.

H.264 is the dominant video codec in real crawl/training corpora, and
was the one video format the codec seam still routed entirely to the
optional PyAV extra.  Coverage grew in three steps:

- **I_PCM subset** (r10): Annex-B framing, NAL emulation-prevention
  unescaping, Exp-Golomb entropy coding, SPS/PPS/slice-header syntax,
  and the I_PCM macroblock — raw uncompressed samples inside a real
  H.264 bitstream (spec §7.3.5) — bit-exact round trips.
- **CAVLC intra** (r11): entropy-coded I slices decode for REAL —
  I_NxN macroblocks (all nine 4x4 intra prediction modes), I_16x16
  (V/H/DC/Plane), CAVLC residual parsing (coeff_token / total_zeros /
  run_before VLC tables transcribed from the public spec Tables 9-5,
  9-7/9-8, 9-9(a), 9-10; level coding §9.2.2 is algorithmic),
  flat-matrix dequantisation, the 4x4 inverse integer transform, the
  luma-DC Hadamard and chroma-DC 2x2 paths, per-MB QP deltas, and
  same-slice neighbor availability for nC and mode prediction.

- **P-slice inter prediction** (r12): most real video is
  inter-coded, so this is the step that moves typical crawl streams
  from `decoded=false` to real samples — quarter-sample luma motion
  compensation (6-tap half-pel filter + quarter averaging, spec
  §8.4.2.2.1), eighth-sample bilinear chroma (§8.4.2.2.2), the median
  motion-vector predictor with the 16x8/8x16 directional cases
  (§8.4.1.3), P_Skip with its zero-motion conditions (§8.4.1.1),
  mb_skip_run, P_L0_16x16 / 16x8 / 8x16 / P_8x8(ref0) with all four
  sub-partition types, intra-in-P macroblocks, the inter CBP mapping
  (Table 9-4), MULTIPLE reference frames (sliding-window DPB per
  §8.2.5.3, te(v)-coded per-partition ref_idx, ref-aware MV
  prediction and boundary strengths), and the in-loop deblocking
  filter (§8.7 — see the section comment above `_DB_ALPHA`).

Validation for the CAVLC layer (tests/test_h264_cavlc.py): every VLC
table is property-checked prefix-free with the spec's exact Kraft
deficit; the serialized bits are pinned against the published worked
CAVLC example; encode→decode round trips are BIT-EXACT against the
encoder's own reconstruction loop (which calls the decoder's
dequant/IDCT helpers, so the two sides cannot drift) across QPs,
sizes, and mixed I_PCM/I_NxN/I_16x16 pictures, with reconstruction
error scaling with the quantisation step as a correct lossy intra
codec must.  The inter layer (tests/test_h264_inter.py) adds
independent scalar-transcription checks of both interpolators,
handcrafted MV-predictor/P_Skip rule pins, and the same bit-exact
round-trip discipline over every P macroblock kind and all 16
quarter-pel fractions.  The in-loop deblocking filter (§8.7, r12)
is implemented — see the section comment above `_DB_ALPHA` — so
filtered streams decode for real too.  B slices (r12), weighted
prediction in all three modes (r13), CABAC I slices (r13) and CABAC
P/B slices + I_PCM-in-CABAC (r14) decode for real — see the section
comments.  Intra 8x8 (the High-profile
transform_size_8x8_flag path) decodes for real under CAVLC since the
r14 continuation — syntax, the interleaved 4x4 residual partitions,
the generated 8x8 zigzag, §8.3.2 prediction with the [1,2,1]
reference filter all exact; ONLY the dequant weights and the §8.5.8
butterfly roundings are derived (see _dequant8x8/_itransform8x8 —
third-party High-profile streams parse exactly but reconstruct with
deviating residual amplitudes).  The honest one-exception contract
still names the optional extra for SP/SI slices, reference-list
reordering, adaptive (MMCO) reference marking, fields, CABAC-coded
8x8 transforms, deblocking over 8x8-transform pictures, scaling
matrices, >8-bit depth, and entropy-coded 4:0:0.

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
  control (r12: disable_deblocking_filter_idc 0/1/2 all decodable —
  the in-loop filter §8.7 is implemented, incl. the slice alpha/beta
  offsets and idc=2 slice-boundary suppression).
- Macroblock layer: I_PCM (mb_type 25 in I slices) — alignment bits,
  256 luma + 2x64 chroma raw samples per macroblock (4:2:0, 8-bit),
  or luma-only for 4:0:0 monochrome streams (chroma_format_idc 0,
  crop units of 1 sample — the surveillance/medical profile); and
  (r11) CAVLC-coded I_NxN / I_16x16 macroblocks per the module
  docstring above.

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
        "monochrome", "max_num_ref_frames", "direct_8x8",
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
    sps.max_num_ref_frames = r.ue()
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
    sps.direct_8x8 = bool(r.read(1))  # direct_8x8_inference_flag
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
    __slots__ = (
        "bottom_field_poc_present", "deblocking_control_present",
        "pic_init_qp", "chroma_qp_index_offset", "transform_8x8",
        "num_ref_l0_default", "num_ref_l1_default",
        "weighted_pred", "weighted_bipred_idc", "cabac",
    )


def _parse_pps(r: _BitReader) -> _PPS:
    pps = _PPS()
    r.ue()  # pic_parameter_set_id
    r.ue()  # seq_parameter_set_id
    # entropy_coding_mode_flag: CABAC decodes for real — I slices
    # since r13, P/B slices since r14 (see the CABAC section comment)
    pps.cabac = bool(r.read(1))
    pps.bottom_field_poc_present = r.read(1)
    if r.ue():  # num_slice_groups_minus1
        raise UnsupportedMediaError(
            "h264: slice groups (FMO) need the optional codec library (av)"
        )
    pps.num_ref_l0_default = r.ue() + 1  # num_ref_idx_l0_default_active
    pps.num_ref_l1_default = r.ue() + 1
    # stored, enforced at slice level: explicit weights add a
    # pred_weight_table to the slice header (P with weighted_pred,
    # B with weighted_bipred_idc == 1) and implicit bi weights
    # (idc == 2) change the §8.4.2.3 prediction math — both
    # seam-gated rather than silently misdecoded
    pps.weighted_pred = bool(r.read(1))
    pps.weighted_bipred_idc = r.read(2)
    pps.pic_init_qp = 26 + r.se()
    r.se()  # pic_init_qs_minus26
    pps.chroma_qp_index_offset = r.se()
    pps.deblocking_control_present = r.read(1)
    r.read(1)  # constrained_intra_pred_flag
    r.read(1)  # redundant_pic_cnt_present_flag
    # optional high-profile PPS tail (spec §7.3.2.2): present iff data
    # remains before the rbsp stop bit
    pps.transform_8x8 = False
    if r.pos < _rbsp_stop_bit(r.data):
        pps.transform_8x8 = bool(r.read(1))
        if r.read(1):  # pic_scaling_matrix_present_flag
            raise UnsupportedMediaError(
                "h264: scaling matrices need the optional codec library (av)"
            )
        r.se()  # second_chroma_qp_index_offset
    return pps


# ---------------------------------------------------------------------------
# CAVLC entropy layer (spec §9.2) — r11: entropy-coded intra macroblocks
# decode for real.  The VLC tables below are transcribed from the public
# ITU-T H.264 spec (Tables 9-5, 9-7/9-8, 9-9(a), 9-10); each is stored
# ONCE as the encode map and the decoder derives its prefix-tree from the
# same constants, so encoder and decoder cannot drift apart.  The level
# coding, zig-zag, quantisation and transforms are algorithmic (spec
# §9.2.2, §8.5) — no further tabulated constants.  Validation:
# encode→decode round trips are bit-exact against the encoder's own
# reconstruction loop, the tables are property-checked prefix-free and
# complete, and the encoder's serialized bits are pinned against the
# public worked CAVLC example (tests/test_h264_cavlc.py).
# ---------------------------------------------------------------------------

# Table 9-5 coeff_token, (TotalCoeff, TrailingOnes) -> (length, value),
# one map per nC class.  nC >= 8 is a fixed 6-bit code handled in code.
_CT_NC0 = {  # 0 <= nC < 2
    (0, 0): (1, 1),
    (1, 0): (6, 5), (1, 1): (2, 1),
    (2, 0): (8, 7), (2, 1): (6, 4), (2, 2): (3, 1),
    (3, 0): (9, 7), (3, 1): (8, 6), (3, 2): (7, 5), (3, 3): (5, 3),
    (4, 0): (10, 7), (4, 1): (9, 6), (4, 2): (8, 5), (4, 3): (6, 3),
    (5, 0): (11, 7), (5, 1): (10, 6), (5, 2): (9, 5), (5, 3): (7, 4),
    (6, 0): (13, 15), (6, 1): (11, 6), (6, 2): (10, 5), (6, 3): (8, 4),
    (7, 0): (13, 11), (7, 1): (13, 14), (7, 2): (11, 5), (7, 3): (9, 4),
    (8, 0): (13, 8), (8, 1): (13, 10), (8, 2): (13, 13), (8, 3): (10, 4),
    (9, 0): (14, 15), (9, 1): (14, 14), (9, 2): (13, 9), (9, 3): (11, 4),
    (10, 0): (14, 11), (10, 1): (14, 10), (10, 2): (14, 13),
    (10, 3): (13, 12),
    (11, 0): (15, 15), (11, 1): (15, 14), (11, 2): (14, 9),
    (11, 3): (14, 12),
    (12, 0): (15, 11), (12, 1): (15, 10), (12, 2): (15, 13),
    (12, 3): (14, 8),
    (13, 0): (16, 15), (13, 1): (15, 1), (13, 2): (15, 9),
    (13, 3): (15, 12),
    (14, 0): (16, 11), (14, 1): (16, 14), (14, 2): (16, 13),
    (14, 3): (15, 8),
    (15, 0): (16, 7), (15, 1): (16, 10), (15, 2): (16, 9),
    (15, 3): (16, 12),
    (16, 0): (16, 4), (16, 1): (16, 6), (16, 2): (16, 5), (16, 3): (16, 8),
}
_CT_NC2 = {  # 2 <= nC < 4
    (0, 0): (2, 3),
    (1, 0): (6, 11), (1, 1): (2, 2),
    (2, 0): (6, 7), (2, 1): (5, 7), (2, 2): (3, 3),
    (3, 0): (7, 7), (3, 1): (6, 10), (3, 2): (6, 9), (3, 3): (4, 5),
    (4, 0): (8, 7), (4, 1): (6, 6), (4, 2): (6, 5), (4, 3): (4, 4),
    (5, 0): (8, 4), (5, 1): (7, 6), (5, 2): (7, 5), (5, 3): (5, 6),
    (6, 0): (9, 7), (6, 1): (8, 6), (6, 2): (8, 5), (6, 3): (6, 8),
    (7, 0): (11, 15), (7, 1): (9, 6), (7, 2): (9, 5), (7, 3): (6, 4),
    (8, 0): (11, 11), (8, 1): (11, 14), (8, 2): (11, 13), (8, 3): (7, 4),
    (9, 0): (12, 15), (9, 1): (11, 10), (9, 2): (11, 9), (9, 3): (9, 4),
    (10, 0): (12, 11), (10, 1): (12, 14), (10, 2): (12, 13),
    (10, 3): (11, 12),
    (11, 0): (12, 8), (11, 1): (12, 10), (11, 2): (12, 9),
    (11, 3): (11, 8),
    (12, 0): (13, 15), (12, 1): (13, 14), (12, 2): (13, 13),
    (12, 3): (12, 12),
    (13, 0): (13, 11), (13, 1): (13, 10), (13, 2): (13, 9),
    (13, 3): (13, 12),
    (14, 0): (13, 7), (14, 1): (14, 11), (14, 2): (13, 6), (14, 3): (13, 8),
    (15, 0): (14, 9), (15, 1): (14, 8), (15, 2): (14, 10), (15, 3): (13, 1),
    (16, 0): (14, 7), (16, 1): (14, 6), (16, 2): (14, 5), (16, 3): (14, 4),
}
_CT_NC4 = {  # 4 <= nC < 8
    (0, 0): (4, 15),
    (1, 0): (6, 15), (1, 1): (4, 14),
    (2, 0): (6, 11), (2, 1): (5, 15), (2, 2): (4, 13),
    (3, 0): (6, 8), (3, 1): (5, 12), (3, 2): (5, 14), (3, 3): (4, 12),
    (4, 0): (7, 15), (4, 1): (5, 10), (4, 2): (5, 11), (4, 3): (4, 11),
    (5, 0): (7, 11), (5, 1): (5, 8), (5, 2): (5, 9), (5, 3): (4, 10),
    (6, 0): (7, 9), (6, 1): (6, 14), (6, 2): (6, 13), (6, 3): (4, 9),
    (7, 0): (7, 8), (7, 1): (6, 10), (7, 2): (6, 9), (7, 3): (4, 8),
    (8, 0): (8, 15), (8, 1): (7, 14), (8, 2): (7, 13), (8, 3): (5, 13),
    (9, 0): (8, 11), (9, 1): (8, 14), (9, 2): (7, 10), (9, 3): (6, 12),
    (10, 0): (9, 15), (10, 1): (8, 10), (10, 2): (8, 13), (10, 3): (7, 12),
    (11, 0): (9, 11), (11, 1): (9, 14), (11, 2): (8, 9), (11, 3): (8, 12),
    (12, 0): (9, 8), (12, 1): (9, 10), (12, 2): (9, 13), (12, 3): (8, 8),
    (13, 0): (10, 13), (13, 1): (9, 7), (13, 2): (9, 9), (13, 3): (9, 12),
    (14, 0): (10, 9), (14, 1): (10, 12), (14, 2): (10, 11),
    (14, 3): (10, 10),
    (15, 0): (10, 5), (15, 1): (10, 8), (15, 2): (10, 7), (15, 3): (10, 6),
    (16, 0): (10, 1), (16, 1): (10, 4), (16, 2): (10, 3), (16, 3): (10, 2),
}
_CT_CHROMA_DC = {  # nC == -1 (4:2:0 chroma DC, max 4 coeffs)
    (0, 0): (2, 1),
    (1, 0): (6, 7), (1, 1): (1, 1),
    (2, 0): (6, 4), (2, 1): (6, 6), (2, 2): (3, 1),
    (3, 0): (6, 3), (3, 1): (7, 3), (3, 2): (7, 2), (3, 3): (6, 5),
    (4, 0): (6, 2), (4, 1): (8, 3), (4, 2): (8, 2), (4, 3): (7, 0),
}

# Tables 9-7/9-8: total_zeros for 4x4 blocks, indexed [TotalCoeff-1]
# [total_zeros] -> (length, value)
_TOTAL_ZEROS_4x4 = [
    # TotalCoeff == 1
    [(1, 1), (3, 3), (3, 2), (4, 3), (4, 2), (5, 3), (5, 2), (6, 3),
     (6, 2), (7, 3), (7, 2), (8, 3), (8, 2), (9, 3), (9, 2), (9, 1)],
    # 2
    [(3, 7), (3, 6), (3, 5), (3, 4), (3, 3), (4, 5), (4, 4), (4, 3),
     (4, 2), (5, 3), (5, 2), (6, 3), (6, 2), (6, 1), (6, 0)],
    # 3
    [(4, 5), (3, 7), (3, 6), (3, 5), (4, 4), (4, 3), (3, 4), (3, 3),
     (4, 2), (5, 3), (5, 2), (6, 1), (5, 1), (6, 0)],
    # 4
    [(5, 3), (3, 7), (4, 5), (4, 4), (3, 6), (3, 5), (3, 4), (4, 3),
     (3, 3), (4, 2), (5, 2), (5, 1), (5, 0)],
    # 5
    [(4, 5), (4, 4), (4, 3), (3, 7), (3, 6), (3, 5), (3, 4), (3, 3),
     (4, 2), (5, 1), (4, 1), (5, 0)],
    # 6
    [(6, 1), (5, 1), (3, 7), (3, 6), (3, 5), (3, 4), (3, 3), (3, 2),
     (4, 1), (3, 1), (6, 0)],
    # 7
    [(6, 1), (5, 1), (3, 5), (3, 4), (3, 3), (2, 3), (3, 2), (4, 1),
     (3, 1), (6, 0)],
    # 8
    [(6, 1), (4, 1), (5, 1), (3, 3), (2, 3), (2, 2), (3, 2), (3, 1),
     (6, 0)],
    # 9
    [(6, 1), (6, 0), (4, 1), (2, 3), (2, 2), (3, 1), (2, 1), (5, 1)],
    # 10
    [(5, 1), (5, 0), (3, 1), (2, 3), (2, 2), (2, 1), (4, 1)],
    # 11
    [(4, 0), (4, 1), (3, 1), (3, 2), (1, 1), (3, 3)],
    # 12
    [(4, 0), (4, 1), (2, 1), (1, 1), (3, 1)],
    # 13
    [(3, 0), (3, 1), (1, 1), (2, 1)],
    # 14
    [(2, 0), (2, 1), (1, 1)],
    # 15
    [(1, 0), (1, 1)],
]

# Table 9-9(a): total_zeros for 2x2 chroma DC (4:2:0), [TotalCoeff-1]
_TOTAL_ZEROS_CDC = [
    [(1, 1), (2, 1), (3, 1), (3, 0)],
    [(1, 1), (2, 1), (2, 0)],
    [(1, 1), (1, 0)],
]

# Table 9-10: run_before, [min(zerosLeft,7)-1][run] -> (length, value)
_RUN_BEFORE = [
    [(1, 1), (1, 0)],
    [(1, 1), (2, 1), (2, 0)],
    [(2, 3), (2, 2), (2, 1), (2, 0)],
    [(2, 3), (2, 2), (2, 1), (3, 1), (3, 0)],
    [(2, 3), (2, 2), (3, 3), (3, 2), (3, 1), (3, 0)],
    [(2, 3), (3, 0), (3, 1), (3, 3), (3, 2), (3, 5), (3, 4)],
    [(3, 7), (3, 6), (3, 5), (3, 4), (3, 3), (3, 2), (3, 1),
     (4, 1), (5, 1), (6, 1), (7, 1), (8, 1), (9, 1), (10, 1), (11, 1)],
]


def _vlc_tree(table) -> dict:
    """(length, value) map -> decode dict keyed by (length, value).

    r15: the dict additionally carries a 256-entry first-level table
    under the string key "f8": entry w = (symbol, length) for the unique
    code of length <= 8 that prefixes the 8-bit window w (codes are
    prefix-free; shortest-first fill mirrors the sequential bit scan).
    _read_vlc resolves almost every code with ONE list index instead of
    a per-bit loop; codes longer than 8 bits fall back to the dict."""
    if isinstance(table, dict):
        tree = {lv: k for k, lv in table.items()}
    else:
        tree = {lv: i for i, lv in enumerate(table)}
    f8 = [None] * 256
    for (length, value), hit in sorted(tree.items()):
        if length > 8:
            continue
        base = value << (8 - length)
        for wdw in range(base, base + (1 << (8 - length))):
            if f8[wdw] is None:
                f8[wdw] = (hit, length)
    tree["f8"] = f8
    return tree


_CT_DECODE = {
    0: _vlc_tree(_CT_NC0),
    2: _vlc_tree(_CT_NC2),
    4: _vlc_tree(_CT_NC4),
    -1: _vlc_tree(_CT_CHROMA_DC),
}
_TZ4_DECODE = [_vlc_tree(t) for t in _TOTAL_ZEROS_4x4]
_TZC_DECODE = [_vlc_tree(t) for t in _TOTAL_ZEROS_CDC]
_RB_DECODE = [_vlc_tree(t) for t in _RUN_BEFORE]


def _ct_class(nc: int) -> int:
    if nc == -1:
        return -1
    if nc < 2:
        return 0
    if nc < 4:
        return 2
    if nc < 8:
        return 4
    return 8


def _read_vlc(r: _BitReader, tree: dict, what: str):
    # r15 kernel pass: peek an 8-bit window and resolve short codes with
    # ONE first-level table index (see _vlc_tree) — the per-bit read(1)
    # loop paid a method call per bit and dominated the CAVLC decode
    # profile.  Decoded (length, value) pairs are exactly the old
    # loop's; truncation raises at the same bit positions.
    data = r.data
    pos = r.pos
    avail = len(data) * 8 - pos
    byt = pos >> 3
    b2 = data[byt : byt + 2]
    win8 = (
        (int.from_bytes(b2, "big") << (16 - 8 * len(b2))) >> (8 - (pos & 7))
    ) & 0xFF
    ent = tree["f8"][win8]
    if ent is not None:
        hit, length = ent
        if length <= avail:
            r.pos = pos + length
            return hit
        raise UnsupportedMediaError("h264: bitstream truncated")
    # long codes (9..32 bits): walk prefix lengths over a 32-bit window
    chunk = data[byt : byt + 5]
    win = int.from_bytes(chunk, "big") << ((5 - len(chunk)) * 8)
    win = (win >> (8 - (pos & 7))) & 0xFFFFFFFF
    get = tree.get
    limit = 32 if avail >= 32 else avail
    for length in range(9, limit + 1):
        hit = get((length, win >> (32 - length)))
        if hit is not None:
            r.pos = pos + length
            return hit
    if avail < 32:
        raise UnsupportedMediaError("h264: bitstream truncated")
    raise UnsupportedMediaError(f"h264: invalid {what} code")


def _read_coeff_token(r: _BitReader, nc: int):
    """-> (TotalCoeff, TrailingOnes)."""
    cls = _ct_class(nc)
    if cls == 8:
        code = r.read(6)
        if code == 3:
            return 0, 0
        return (code >> 2) + 1, code & 3
    return _read_vlc(r, _CT_DECODE[cls], "coeff_token")


def _write_coeff_token(w: _BitWriter, nc: int, tc: int, t1: int) -> None:
    cls = _ct_class(nc)
    if cls == 8:
        w.write(3 if tc == 0 else ((tc - 1) << 2) | t1, 6)
        return
    table = {0: _CT_NC0, 2: _CT_NC2, 4: _CT_NC4, -1: _CT_CHROMA_DC}[cls]
    length, value = table[(tc, t1)]
    w.write(value, length)


def _read_level(r: _BitReader, suffix_len: int) -> int:
    """One non-trailing level (spec §9.2.2.1)."""
    # leading-zero scan inline over the byte array (the per-bit read(1)
    # loop paid a method call per prefix bit) — same truncation/overrun
    # raises at the same bit positions.
    data, nbits = r.data, len(r.data) * 8
    p = r.pos
    prefix = 0
    while True:
        if p >= nbits:
            raise UnsupportedMediaError("h264: bitstream truncated")
        if data[p >> 3] & (0x80 >> (p & 7)):
            break
        p += 1
        prefix += 1
        if prefix > 47:
            raise UnsupportedMediaError("h264: level_prefix overrun")
    r.pos = p + 1
    if prefix == 14 and suffix_len == 0:
        suffix_size = 4
    elif prefix >= 15:
        suffix_size = prefix - 3
    else:
        suffix_size = suffix_len
    code = min(15, prefix) << suffix_len
    if suffix_size:
        code += r.read(suffix_size)
    if prefix >= 15 and suffix_len == 0:
        code += 15
    if prefix >= 16:
        code += (1 << (prefix - 3)) - 4096
    return (code + 2) >> 1 if code % 2 == 0 else -((code + 1) >> 1)


def _write_level(w: _BitWriter, level: int, suffix_len: int) -> None:
    """Inverse of _read_level for the magnitudes the encoder emits."""
    code = 2 * level - 2 if level > 0 else -2 * level - 1
    if suffix_len == 0:
        if code < 14:
            w.write(1, code + 1)  # prefix=code, suffix none
            return
        if code < 30:
            w.write(1, 15)  # prefix 14, 4-bit suffix
            w.write(code - 14, 4)
            return
        code -= 30  # escape: prefix 15, 12-bit suffix (decode adds 15+15)
        if code >= 1 << 12:
            raise UnsupportedMediaError("h264 encoder: level magnitude guard")
        w.write(1, 16)
        w.write(code, 12)
        return
    if (code >> suffix_len) < 15:
        w.write(1, (code >> suffix_len) + 1)
        w.write(code & ((1 << suffix_len) - 1), suffix_len)
        return
    if code - (15 << suffix_len) >= 1 << 12:
        raise UnsupportedMediaError("h264 encoder: level magnitude guard")
    w.write(1, 16)  # prefix 15, 12-bit suffix
    w.write(code - (15 << suffix_len), 12)


def _decode_residual(r: _BitReader, nc: int, max_coeff: int) -> list[int]:
    """One CAVLC residual block -> coefficient list (scan order),
    ``max_coeff`` long.  Also returns TotalCoeff via len of nonzeros."""
    tc, t1 = _read_coeff_token(r, nc)
    coeffs = [0] * max_coeff
    if tc == 0:
        return coeffs
    if tc > max_coeff:
        raise UnsupportedMediaError("h264: coeff_token exceeds block size")
    levels = []
    for _ in range(t1):
        levels.append(-1 if r.read(1) else 1)
    suffix_len = 1 if tc > 10 and t1 < 3 else 0
    for i in range(tc - t1):
        lvl = _read_level(r, suffix_len)
        if i == 0 and t1 < 3:
            lvl += 1 if lvl > 0 else -1
        levels.append(lvl)
        if suffix_len == 0:
            suffix_len = 1
        if abs(lvl) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    if tc < max_coeff:
        if max_coeff == 4:  # chroma DC
            total_zeros = _read_vlc(
                r, _TZC_DECODE[tc - 1], "total_zeros"
            )
        else:
            total_zeros = _read_vlc(
                r, _TZ4_DECODE[tc - 1], "total_zeros"
            )
    else:
        total_zeros = 0
    zeros_left = total_zeros
    pos = tc - 1 + total_zeros
    if pos >= max_coeff:
        raise UnsupportedMediaError("h264: total_zeros exceeds block")
    for i in range(tc):
        if zeros_left > 0 and i < tc - 1:
            run = _read_vlc(
                r, _RB_DECODE[min(zeros_left, 7) - 1], "run_before"
            )
            if run > zeros_left:
                raise UnsupportedMediaError(
                    "h264: run_before exceeds zeros left"
                )
        elif i == tc - 1:
            run = zeros_left
        else:
            run = 0
        if pos < 0:
            raise UnsupportedMediaError("h264: residual scan underrun")
        coeffs[pos] = levels[i]
        pos -= 1 + run
        zeros_left -= run
    return coeffs


def _encode_residual(w: _BitWriter, nc: int, coeffs: list[int]) -> int:
    """Inverse of _decode_residual; returns TotalCoeff (for nC
    bookkeeping)."""
    max_coeff = len(coeffs)
    nz = [(i, c) for i, c in enumerate(coeffs) if c != 0]
    tc = len(nz)
    t1 = 0
    for _, c in reversed(nz):
        if abs(c) == 1 and t1 < 3:
            t1 += 1
        else:
            break
    _write_coeff_token(w, nc, tc, t1)
    if tc == 0:
        return 0
    rev = [c for _, c in reversed(nz)]  # highest frequency first
    for c in rev[:t1]:
        w.write(1 if c < 0 else 0, 1)
    suffix_len = 1 if tc > 10 and t1 < 3 else 0
    for i, lvl in enumerate(rev[t1:]):
        out = lvl
        if i == 0 and t1 < 3:
            out -= 1 if out > 0 else -1
        _write_level(w, out, suffix_len)
        if suffix_len == 0:
            suffix_len = 1
        if abs(lvl) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    total_zeros = nz[-1][0] + 1 - tc
    if tc < max_coeff:
        table = (
            _TOTAL_ZEROS_CDC[tc - 1]
            if max_coeff == 4
            else _TOTAL_ZEROS_4x4[tc - 1]
        )
        length, value = table[total_zeros]
        w.write(value, length)
    zeros_left = total_zeros
    positions = [i for i, _ in reversed(nz)]
    for i in range(tc):
        if zeros_left > 0 and i < tc - 1:
            run = positions[i] - positions[i + 1] - 1
            length, value = _RUN_BEFORE[min(zeros_left, 7) - 1][run]
            w.write(value, length)
            zeros_left -= run
    return tc


# ---------------------------------------------------------------------------
# Transforms, (de)quantisation and intra prediction (spec §8.3, §8.5).
# All algorithmic: the only constants are the spec's LevelScale V matrix
# (dequant) and the reference forward MF matrix (encoder side).
# ---------------------------------------------------------------------------

# zig-zag scan, (row, col) per coefficient index (spec figure 8-8)
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3),
]

_DEQUANT_V = [
    (10, 16, 13), (11, 18, 14), (13, 20, 16),
    (14, 23, 18), (16, 25, 20), (18, 29, 23),
]
_QUANT_MF = [
    (13107, 5243, 8066), (11916, 4660, 7490), (10082, 4194, 6554),
    (9362, 3647, 5825), (8192, 3355, 5243), (7282, 2893, 4559),
]

# chroma QP from luma QP index (spec table 8-15, qPi 30..51)
_CHROMA_QP = [
    29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36,
    36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39,
]


def _chroma_qp(qp: int, offset: int) -> int:
    qpi = min(51, max(0, qp + offset))
    return qpi if qpi < 30 else _CHROMA_QP[qpi - 30]


def _pos_class(i: int, j: int) -> int:
    if i % 2 == 0 and j % 2 == 0:
        return 0
    if i % 2 == 1 and j % 2 == 1:
        return 1
    return 2


# (i, j, position class) per zig-zag scan index — hoists the _pos_class
# branch out of the per-coefficient loops (r15 kernel pass)
_ZZ_POSCLS = [(i, j, _pos_class(i, j)) for i, j in _ZIGZAG]


def _dequant4x4(coeffs: list[int], qp: int, skip_dc: bool) -> list[list[int]]:
    """Scan-order CAVLC coefficients -> dequantized 4x4 row lists (spec
    §8.5.12.1).  ``skip_dc``: position (0,0) left at 0 (its value comes
    from the separate DC transform for I_16x16 / chroma)."""
    rows = [[0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]]
    v = _DEQUANT_V[qp % 6]
    shift = qp // 6
    first = 1 if skip_dc else 0
    offs = first  # AC blocks carry 15 coeffs starting at scan index 1
    for s in range(first, 16):
        c = coeffs[s - offs]
        if c == 0:
            continue
        i, j, pc = _ZZ_POSCLS[s]
        # pairs with _itransform4x4's final (f + 32) >> 6 rounding
        rows[i][j] = (c * v[pc]) << shift
    # returns plain-int rows (r15): _itransform4x4 consumes them
    # directly, skipping one ndarray construction per residual block
    return rows


def _itransform4x4(d) -> np.ndarray:
    """Inverse core transform (spec §8.5.12.2), result pre-clip
    residual (already includes the (x+32)>>6 rounding).  Butterflies
    run on plain python ints (python's >> floors exactly like the int64
    arithmetic shift) — per-element ndarray indexing made this the
    hottest non-entropy function of the codec family.  Accepts either
    an ndarray or the plain row lists _dequant4x4 now returns.  Fully
    unrolled (r15): loop/tuple scaffolding was ~40% of the call."""
    r0, r1, r2, r3 = d.tolist() if isinstance(d, np.ndarray) else d
    a0, a1, a2, a3 = r0
    b0, b1, b2, b3 = r1
    c0, c1, c2, c3 = r2
    d0, d1, d2, d3 = r3
    # horizontal butterflies (per input row)
    e0, e1 = a0 + a2, a0 - a2
    e2, e3 = (a1 >> 1) - a3, a1 + (a3 >> 1)
    a0, a1, a2, a3 = e0 + e3, e1 + e2, e1 - e2, e0 - e3
    e0, e1 = b0 + b2, b0 - b2
    e2, e3 = (b1 >> 1) - b3, b1 + (b3 >> 1)
    b0, b1, b2, b3 = e0 + e3, e1 + e2, e1 - e2, e0 - e3
    e0, e1 = c0 + c2, c0 - c2
    e2, e3 = (c1 >> 1) - c3, c1 + (c3 >> 1)
    c0, c1, c2, c3 = e0 + e3, e1 + e2, e1 - e2, e0 - e3
    e0, e1 = d0 + d2, d0 - d2
    e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
    d0, d1, d2, d3 = e0 + e3, e1 + e2, e1 - e2, e0 - e3
    # vertical butterflies (per column) + rounding
    out = [[0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]]
    o0, o1, o2, o3 = out
    e0, e1 = a0 + c0, a0 - c0
    e2, e3 = (b0 >> 1) - d0, b0 + (d0 >> 1)
    o0[0] = (e0 + e3 + 32) >> 6
    o1[0] = (e1 + e2 + 32) >> 6
    o2[0] = (e1 - e2 + 32) >> 6
    o3[0] = (e0 - e3 + 32) >> 6
    e0, e1 = a1 + c1, a1 - c1
    e2, e3 = (b1 >> 1) - d1, b1 + (d1 >> 1)
    o0[1] = (e0 + e3 + 32) >> 6
    o1[1] = (e1 + e2 + 32) >> 6
    o2[1] = (e1 - e2 + 32) >> 6
    o3[1] = (e0 - e3 + 32) >> 6
    e0, e1 = a2 + c2, a2 - c2
    e2, e3 = (b2 >> 1) - d2, b2 + (d2 >> 1)
    o0[2] = (e0 + e3 + 32) >> 6
    o1[2] = (e1 + e2 + 32) >> 6
    o2[2] = (e1 - e2 + 32) >> 6
    o3[2] = (e0 - e3 + 32) >> 6
    e0, e1 = a3 + c3, a3 - c3
    e2, e3 = (b3 >> 1) - d3, b3 + (d3 >> 1)
    o0[3] = (e0 + e3 + 32) >> 6
    o1[3] = (e1 + e2 + 32) >> 6
    o2[3] = (e1 - e2 + 32) >> 6
    o3[3] = (e0 - e3 + 32) >> 6
    return np.array(out, np.int64)


# ---- 8x8 transform path (High profile, r14 continuation) ------------
# The 8x8 zigzag is generated by the classic diagonal rule (even
# diagonals walk up-right, odd walk down-left) — the same generator
# reproduces the 4x4 _ZIGZAG above, which test_h264_intra8x8 pins.


def _make_zigzag(n: int):
    return sorted(
        ((i, j) for i in range(n) for j in range(n)),
        key=lambda ij: (
            ij[0] + ij[1],
            -ij[0] if (ij[0] + ij[1]) % 2 == 0 else ij[0],
        ),
    )


_ZIGZAG8 = _make_zigzag(8)

#: the widely published 8-point integer transform basis of the High
#: profile (even rows {8, 4}, odd rows {12, 10, 6, 3})
_B8 = np.array(
    [
        [8, 8, 8, 8, 8, 8, 8, 8],
        [12, 10, 6, 3, -3, -6, -10, -12],
        [8, 4, -4, -8, -8, -4, 4, 8],
        [10, -3, -12, -6, 6, 12, 3, -10],
        [8, -8, -8, 8, 8, -8, -8, 8],
        [6, -12, 3, 10, -10, -3, 12, -6],
        [4, -8, 8, -4, -4, 8, -8, 4],
        [3, -6, 10, -12, 12, -10, 6, -3],
    ],
    np.int64,
)
#: per-row squared norms of _B8 (the forward-quant normalizers)
_B8_N2 = np.array([int((r * r).sum()) for r in _B8], np.int64)


def _dequant8x8(coeffs: list[int], qp: int) -> np.ndarray:
    """64 scan-order CAVLC coefficients -> dequantized 8x8.

    DERIVED scheme (module-docstring deviation list): a flat scalar
    Qstep ``V0[qp % 6] << (qp // 6)`` (V0 = the published 4x4 DC
    ramp) replaces the normative per-position LevelScale8x8 weight
    table, whose integers were not transcribable with total
    confidence.  The fixture encoder normalizes by the exact basis
    norms in its forward quantizer, so round trips are bit-exact and
    recon error scales with Qstep; third-party High-profile streams
    PARSE exactly (syntax, interleave, scan are exact) but
    reconstruct with deviating residual amplitudes."""
    d = np.zeros((8, 8), np.int64)
    ls = _DEQUANT_V[qp % 6][0]
    for se in range(64):
        c = coeffs[se]
        if c == 0:
            continue
        i, j = _ZIGZAG8[se]
        d[i, j] = (c * ls) << (qp // 6)
    return d


def _itransform8x8(d: np.ndarray) -> np.ndarray:
    """Inverse 8x8 transform: exact integer evaluation
    ``(B8^T d B8 + 2^11) >> 12`` — the >>12 pairs the basis DC gain
    (64) with the 4x4 path's >>6 granularity at equal Qstep.  The
    normative §8.5.8 in-place butterfly (whose interleaved >>1 floor
    roundings differ on odd intermediates) is NOT reproduced — a
    documented deviation alongside the _dequant8x8 one."""
    return (_B8.T @ d @ _B8 + 2048) >> 12


def _ftransform8x8(x: np.ndarray) -> np.ndarray:
    """Forward companion (encoder side): exact ``B8 x B8^T``."""
    return _B8 @ x.astype(np.int64) @ _B8.T


def _quant8x8(f: np.ndarray, qp: int) -> list[int]:
    """Forward quantizer for the derived 8x8 scheme: normalize by the
    exact per-position basis-norm product and the scalar Qstep, round
    to nearest (ties away from zero) — scan-order levels out."""
    ls = _DEQUANT_V[qp % 6][0] << (qp // 6)
    out = []
    for se in range(64):
        i, j = _ZIGZAG8[se]
        num = int(f[i, j]) << 12
        den = int(_B8_N2[i]) * int(_B8_N2[j]) * ls
        q = (abs(num) + den // 2) // den
        out.append(-q if num < 0 else q)
    return out


def _filter_refs8(top, tr, left, tl):
    """§8.3.2.2.1 reference-sample low-pass for Intra_8x8: [1, 2, 1]
    over the 16 above samples (above + above-right, with the 4x4
    substitution rule already applied by the caller), the 8 left
    samples and the corner; end samples use the 3:1 taps; a missing
    side folds its corner tap onto the available side."""
    ftop = fleft = fcorner = None
    if top is not None:
        a16 = np.concatenate([top, tr])
        f = np.empty(16, np.int64)
        first = (
            (tl + 2 * a16[0] + a16[1] + 2) >> 2
            if tl is not None
            else (3 * a16[0] + a16[1] + 2) >> 2
        )
        f[0] = first
        for x in range(1, 15):
            f[x] = (a16[x - 1] + 2 * a16[x] + a16[x + 1] + 2) >> 2
        f[15] = (a16[14] + 3 * a16[15] + 2) >> 2
        ftop = f
    if left is not None:
        f = np.empty(8, np.int64)
        f[0] = (
            (tl + 2 * left[0] + left[1] + 2) >> 2
            if tl is not None
            else (3 * left[0] + left[1] + 2) >> 2
        )
        for y in range(1, 7):
            f[y] = (left[y - 1] + 2 * left[y] + left[y + 1] + 2) >> 2
        f[7] = (left[6] + 3 * left[7] + 2) >> 2
        fleft = f
    if tl is not None:
        if top is not None and left is not None:
            fcorner = (top[0] + 2 * tl + left[0] + 2) >> 2
        elif top is not None:
            fcorner = (3 * tl + top[0] + 2) >> 2
        elif left is not None:
            fcorner = (3 * tl + left[0] + 2) >> 2
        else:
            fcorner = tl
    return ftop, fleft, fcorner


def _pred8x8(plane, y0, x0, mode, a_left, a_top, a_tl, a_tr):
    """Intra 8x8 prediction (spec §8.3.2): the nine 4x4 mode
    geometries generalized to 8 samples over the FILTERED reference
    set.  Above-right substitution mirrors the 4x4 rule (replicate
    the rightmost above sample when unavailable)."""
    left = (
        plane[y0 : y0 + 8, x0 - 1].astype(np.int64) if a_left else None
    )
    top = plane[y0 - 1, x0 : x0 + 8].astype(np.int64) if a_top else None
    tl = int(plane[y0 - 1, x0 - 1]) if a_tl else None
    if a_top:
        if a_tr:
            tr = plane[y0 - 1, x0 + 8 : x0 + 16].astype(np.int64)
            if tr.shape[0] < 8:
                pad = np.full(8 - tr.shape[0], int(top[7]), np.int64)
                tr = np.concatenate([tr, pad])
        else:
            tr = np.full(8, int(top[7]), np.int64)
    else:
        tr = None
    top, left, tl = _filter_refs8(top, tr, left, tl)
    if top is not None:
        a16 = top  # filtered above + above-right, 16 samples
        top = top[:8]
    else:
        a16 = None
    p = np.empty((8, 8), np.int64)
    if mode == 0:  # vertical
        if top is None:
            raise UnsupportedMediaError("h264: intra mode needs above row")
        p[:] = top[None, :]
    elif mode == 1:  # horizontal
        if left is None:
            raise UnsupportedMediaError("h264: intra mode needs left column")
        p[:] = left[:, None]
    elif mode == 2:  # DC
        if top is not None and left is not None:
            p[:] = (int(top.sum()) + int(left.sum()) + 8) >> 4
        elif left is not None:
            p[:] = (int(left.sum()) + 4) >> 3
        elif top is not None:
            p[:] = (int(top.sum()) + 4) >> 3
        else:
            p[:] = 128
    elif mode == 3:  # diagonal down-left
        if a16 is None:
            raise UnsupportedMediaError("h264: intra mode needs above row")
        for y in range(8):
            for x in range(8):
                if x == 7 and y == 7:
                    p[y, x] = (a16[14] + 3 * a16[15] + 2) >> 2
                else:
                    p[y, x] = (
                        a16[x + y] + 2 * a16[x + y + 1]
                        + a16[x + y + 2] + 2
                    ) >> 2
    elif mode in (4, 5, 6):  # ddr / vertical-right / horizontal-down
        if left is None or top is None or tl is None:
            raise UnsupportedMediaError(
                "h264: intra mode needs left+above+corner"
            )

        def ref(x, y):
            if y == -1:
                return tl if x == -1 else int(top[x])
            return int(left[y])

        for y in range(8):
            for x in range(8):
                if mode == 4:
                    if x > y:
                        p[y, x] = (
                            ref(x - y - 2, -1) + 2 * ref(x - y - 1, -1)
                            + ref(x - y, -1) + 2
                        ) >> 2
                    elif x < y:
                        p[y, x] = (
                            ref(-1, y - x - 2) + 2 * ref(-1, y - x - 1)
                            + ref(-1, y - x) + 2
                        ) >> 2
                    else:
                        p[y, x] = (
                            ref(0, -1) + 2 * tl + ref(-1, 0) + 2
                        ) >> 2
                elif mode == 5:
                    z = 2 * x - y
                    if z >= 0 and z % 2 == 0:
                        p[y, x] = (
                            ref(x - (y >> 1) - 1, -1)
                            + ref(x - (y >> 1), -1) + 1
                        ) >> 1
                    elif z >= 0:
                        p[y, x] = (
                            ref(x - (y >> 1) - 2, -1)
                            + 2 * ref(x - (y >> 1) - 1, -1)
                            + ref(x - (y >> 1), -1) + 2
                        ) >> 2
                    elif z == -1:
                        p[y, x] = (
                            ref(-1, 0) + 2 * tl + ref(0, -1) + 2
                        ) >> 2
                    else:
                        p[y, x] = (
                            ref(-1, y - 1) + 2 * ref(-1, y - 2)
                            + ref(-1, y - 3) + 2
                        ) >> 2
                else:
                    z = 2 * y - x
                    if z >= 0 and z % 2 == 0:
                        p[y, x] = (
                            ref(-1, y - (x >> 1) - 1)
                            + ref(-1, y - (x >> 1)) + 1
                        ) >> 1
                    elif z >= 0:
                        p[y, x] = (
                            ref(-1, y - (x >> 1) - 2)
                            + 2 * ref(-1, y - (x >> 1) - 1)
                            + ref(-1, y - (x >> 1)) + 2
                        ) >> 2
                    elif z == -1:
                        p[y, x] = (
                            ref(-1, 0) + 2 * tl + ref(0, -1) + 2
                        ) >> 2
                    else:
                        p[y, x] = (
                            ref(x - 1, -1) + 2 * ref(x - 2, -1)
                            + ref(x - 3, -1) + 2
                        ) >> 2
    elif mode == 7:  # vertical-left
        if a16 is None:
            raise UnsupportedMediaError("h264: intra mode needs above row")
        for y in range(8):
            for x in range(8):
                i = x + (y >> 1)
                if y % 2 == 0:
                    p[y, x] = (a16[i] + a16[i + 1] + 1) >> 1
                else:
                    p[y, x] = (
                        a16[i] + 2 * a16[i + 1] + a16[i + 2] + 2
                    ) >> 2
    elif mode == 8:  # horizontal-up
        if left is None:
            raise UnsupportedMediaError("h264: intra mode needs left column")
        for y in range(8):
            for x in range(8):
                z = x + 2 * y
                i = y + (x >> 1)
                if z % 2 == 0 and z < 13:
                    p[y, x] = (left[i] + left[i + 1] + 1) >> 1
                elif z < 13:
                    p[y, x] = (
                        left[i] + 2 * left[i + 1]
                        + left[min(7, i + 2)] + 2
                    ) >> 2
                elif z == 13:
                    p[y, x] = (left[6] + 3 * left[7] + 2) >> 2
                else:
                    p[y, x] = left[7]
    else:
        raise UnsupportedMediaError("h264: invalid intra 8x8 mode")
    return p


def _hadamard4x4(d: np.ndarray) -> np.ndarray:
    e = np.empty((4, 4), np.int64)
    for i in range(4):
        d0, d1, d2, d3 = (int(x) for x in d[i])
        e0, e1, e2, e3 = d0 + d2, d0 - d2, d1 - d3, d1 + d3
        e[i] = (e0 + e3, e1 + e2, e1 - e2, e0 - e3)
    f = np.empty((4, 4), np.int64)
    for j in range(4):
        d0, d1, d2, d3 = (int(x) for x in e[:, j])
        e0, e1, e2, e3 = d0 + d2, d0 - d2, d1 - d3, d1 + d3
        f[:, j] = (e0 + e3, e1 + e2, e1 - e2, e0 - e3)
    return f


def _scale_luma_dc(f: np.ndarray, qp: int) -> np.ndarray:
    """Post-Hadamard luma DC scaling (spec §8.5.10 normalisation,
    expressed in this module's flat-matrix dequant convention — the
    encoder halves the forward-Hadamard DC inside its quantiser, the
    standard reference-encoder arrangement, and this shift restores
    it; calibrated end-to-end in tests/test_h264_cavlc.py)."""
    return (((f * _DEQUANT_V[qp % 6][0]) << (qp // 6)) + 4) >> 3


def _hadamard2x2(c: np.ndarray) -> np.ndarray:
    a, b = int(c[0, 0]), int(c[0, 1])
    cc, d = int(c[1, 0]), int(c[1, 1])
    return np.array(
        [[a + b + cc + d, a - b + cc - d],
         [a + b - cc - d, a - b - cc + d]],
        np.int64,
    )


def _scale_chroma_dc(f: np.ndarray, qpc: int) -> np.ndarray:
    """Post-Hadamard chroma DC scaling (spec §8.5.11 normalisation in
    the same flat-matrix convention as :func:`_scale_luma_dc`).

    §8.5.11 TRUNCATES (``(f·LevelScale << qPc/6) >> 5`` in spec
    convention — no rounding term), unlike the luma-DC §8.5.10 path,
    so this shift must not add one: for qPc >= 6 the pre-shift value is
    even and a rounding term is a no-op, but for qPc < 6 with odd f·V
    it decoded one unit high vs a conformant decoder on third-party
    streams (invisible to round trips only because the fixture
    encoder's reconstruction shares this helper)."""
    ls = _DEQUANT_V[qpc % 6][0]
    return ((f * ls) << (qpc // 6)) >> 1


def _clip_u8(x: np.ndarray) -> np.ndarray:
    # ndarray method form: np.clip routes through two dispatch wrappers
    # per call, measurable at one call per residual block
    return x.clip(0, 255).astype(np.uint8)


def _pred4x4(plane, y0, x0, mode, a_left, a_top, a_tl, a_tr):
    """One intra 4x4 prediction block (spec §8.3.1.2, all nine modes).
    Availability flags follow §6.4.11/§8.3.1: when the above-right
    samples are unavailable but the above row is, they substitute the
    rightmost above sample."""
    # python lists + plain ints throughout (r15 kernel pass): the mode
    # 3-8 branches are per-pixel loops, and per-element ndarray reads/
    # writes (~1 µs each) dominated them; arithmetic is unchanged.
    left = plane[y0 : y0 + 4, x0 - 1].tolist() if a_left else None
    top = plane[y0 - 1, x0 : x0 + 4].tolist() if a_top else None
    tl = int(plane[y0 - 1, x0 - 1]) if a_tl else None
    if a_top:
        if a_tr:
            tr = plane[y0 - 1, x0 + 4 : x0 + 8].tolist()
        else:
            tr = [top[3]] * 4
        a8 = top + tr  # p[0..7, -1]
    else:
        a8 = None
    if mode == 0:  # vertical
        if top is None:
            raise UnsupportedMediaError("h264: intra mode needs above row")
        p = [list(top) for _ in range(4)]
    elif mode == 1:  # horizontal
        if left is None:
            raise UnsupportedMediaError("h264: intra mode needs left column")
        p = [[v] * 4 for v in left]
    elif mode == 2:  # DC
        if top is not None and left is not None:
            dcv = (sum(top) + sum(left) + 4) >> 3
        elif left is not None:
            dcv = (sum(left) + 2) >> 2
        elif top is not None:
            dcv = (sum(top) + 2) >> 2
        else:
            dcv = 128
        p = [[dcv] * 4 for _ in range(4)]
    elif mode == 3:  # diagonal down-left
        if a8 is None:
            raise UnsupportedMediaError("h264: intra mode needs above row")
        p = [[0] * 4 for _ in range(4)]
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    p[y][x] = (a8[6] + 3 * a8[7] + 2) >> 2
                else:
                    p[y][x] = (
                        a8[x + y] + 2 * a8[x + y + 1] + a8[x + y + 2] + 2
                    ) >> 2
    elif mode in (4, 5, 6):  # need left + top + top-left
        if left is None or top is None or tl is None:
            raise UnsupportedMediaError(
                "h264: intra mode needs left+above+corner"
            )
        p = [[0] * 4 for _ in range(4)]

        def ref(x, y):  # p[x, -1] / p[-1, y] / p[-1, -1]
            if y == -1:
                return tl if x == -1 else top[x]
            return left[y]

        for y in range(4):
            for x in range(4):
                if mode == 4:  # diagonal down-right
                    if x > y:
                        p[y][x] = (
                            ref(x - y - 2, -1) + 2 * ref(x - y - 1, -1)
                            + ref(x - y, -1) + 2
                        ) >> 2
                    elif x < y:
                        p[y][x] = (
                            ref(-1, y - x - 2) + 2 * ref(-1, y - x - 1)
                            + ref(-1, y - x) + 2
                        ) >> 2
                    else:
                        p[y][x] = (
                            ref(0, -1) + 2 * tl + ref(-1, 0) + 2
                        ) >> 2
                elif mode == 5:  # vertical-right
                    z = 2 * x - y
                    if z >= 0 and z % 2 == 0:
                        p[y][x] = (
                            ref(x - (y >> 1) - 1, -1)
                            + ref(x - (y >> 1), -1) + 1
                        ) >> 1
                    elif z >= 0:
                        p[y][x] = (
                            ref(x - (y >> 1) - 2, -1)
                            + 2 * ref(x - (y >> 1) - 1, -1)
                            + ref(x - (y >> 1), -1) + 2
                        ) >> 2
                    elif z == -1:
                        p[y][x] = (
                            ref(-1, 0) + 2 * tl + ref(0, -1) + 2
                        ) >> 2
                    else:
                        p[y][x] = (
                            ref(-1, y - 1) + 2 * ref(-1, y - 2)
                            + ref(-1, y - 3) + 2
                        ) >> 2
                else:  # horizontal-down
                    z = 2 * y - x
                    if z >= 0 and z % 2 == 0:
                        p[y][x] = (
                            ref(-1, y - (x >> 1) - 1)
                            + ref(-1, y - (x >> 1)) + 1
                        ) >> 1
                    elif z >= 0:
                        p[y][x] = (
                            ref(-1, y - (x >> 1) - 2)
                            + 2 * ref(-1, y - (x >> 1) - 1)
                            + ref(-1, y - (x >> 1)) + 2
                        ) >> 2
                    elif z == -1:
                        p[y][x] = (
                            ref(-1, 0) + 2 * tl + ref(0, -1) + 2
                        ) >> 2
                    else:
                        p[y][x] = (
                            ref(x - 1, -1) + 2 * ref(x - 2, -1)
                            + ref(x - 3, -1) + 2
                        ) >> 2
    elif mode == 7:  # vertical-left
        if a8 is None:
            raise UnsupportedMediaError("h264: intra mode needs above row")
        p = [[0] * 4 for _ in range(4)]
        for y in range(4):
            for x in range(4):
                i = x + (y >> 1)
                if y % 2 == 0:
                    p[y][x] = (a8[i] + a8[i + 1] + 1) >> 1
                else:
                    p[y][x] = (a8[i] + 2 * a8[i + 1] + a8[i + 2] + 2) >> 2
    elif mode == 8:  # horizontal-up
        if left is None:
            raise UnsupportedMediaError("h264: intra mode needs left column")
        p = [[0] * 4 for _ in range(4)]
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                i = y + (x >> 1)
                if z % 2 == 0 and z < 5:
                    p[y][x] = (left[i] + left[i + 1] + 1) >> 1
                elif z < 5:
                    p[y][x] = (
                        left[i] + 2 * left[i + 1] + left[min(3, i + 2)] + 2
                    ) >> 2
                elif z == 5:
                    p[y][x] = (left[2] + 3 * left[3] + 2) >> 2
                else:
                    p[y][x] = left[3]
    else:
        raise UnsupportedMediaError("h264: invalid intra 4x4 mode")
    return np.array(p, np.int64)


def _pred_block16(plane, y0, x0, mode, a_left, a_top, size):
    """Intra 16x16 luma (modes V/H/DC/Plane, §8.3.3) and — with
    ``size=8`` and the chroma mode order mapped by the caller — the
    full-block chroma H/V/Plane predictions (§8.3.4)."""
    left = (
        plane[y0 : y0 + size, x0 - 1].astype(np.int64) if a_left else None
    )
    top = plane[y0 - 1, x0 : x0 + size].astype(np.int64) if a_top else None
    p = np.empty((size, size), np.int64)
    if mode == 0:  # vertical
        if top is None:
            raise UnsupportedMediaError("h264: intra pred needs above row")
        p[:] = top[None, :]
    elif mode == 1:  # horizontal
        if left is None:
            raise UnsupportedMediaError("h264: intra pred needs left column")
        p[:] = left[:, None]
    elif mode == 2:  # DC
        if top is not None and left is not None:
            p[:] = (int(top.sum()) + int(left.sum()) + size) >> (
                size.bit_length()
            )
        elif left is not None:
            p[:] = (int(left.sum()) + size // 2) >> (size.bit_length() - 1)
        elif top is not None:
            p[:] = (int(top.sum()) + size // 2) >> (size.bit_length() - 1)
        else:
            p[:] = 128
    else:  # plane
        if top is None or left is None or not (a_left and a_top):
            raise UnsupportedMediaError(
                "h264: plane prediction needs left+above"
            )
        tl = int(plane[y0 - 1, x0 - 1])
        half = size // 2
        hh = sum(
            (x + 1)
            * (
                int(top[half + x])
                - (int(top[half - 2 - x]) if half - 2 - x >= 0 else tl)
            )
            for x in range(half)
        )
        vv = sum(
            (y + 1)
            * (
                int(left[half + y])
                - (int(left[half - 2 - y]) if half - 2 - y >= 0 else tl)
            )
            for y in range(half)
        )
        if size == 16:
            b = (5 * hh + 32) >> 6
            c = (5 * vv + 32) >> 6
        else:
            b = (34 * hh + 32) >> 6
            c = (34 * vv + 32) >> 6
        a = 16 * (int(left[size - 1]) + int(top[size - 1]))
        ys, xs = np.mgrid[0:size, 0:size]
        p = np.clip(
            (a + b * (xs - half + 1) + c * (ys - half + 1) + 16) >> 5,
            0,
            255,
        )
    return p


def _pred_chroma_dc(plane, y0, x0, a_left, a_top):
    """Chroma DC prediction, per-4x4-block neighbor rules (§8.3.4.1)."""
    p = np.empty((8, 8), np.int64)
    for by in range(2):
        for bx in range(2):
            yy, xx = y0 + by * 4, x0 + bx * 4
            left = (
                plane[yy : yy + 4, x0 - 1].astype(np.int64)
                if a_left
                else None
            )
            top = (
                plane[y0 - 1, xx : xx + 4].astype(np.int64)
                if a_top
                else None
            )
            if bx == 1 and by == 0:  # prefer above, then left
                if top is not None:
                    val = (int(top.sum()) + 2) >> 2
                elif left is not None:
                    val = (int(left.sum()) + 2) >> 2
                else:
                    val = 128
            elif bx == 0 and by == 1:  # prefer left, then above
                if left is not None:
                    val = (int(left.sum()) + 2) >> 2
                elif top is not None:
                    val = (int(top.sum()) + 2) >> 2
                else:
                    val = 128
            elif top is not None and left is not None:
                val = (int(top.sum()) + int(left.sum()) + 4) >> 3
            elif top is not None:
                val = (int(top.sum()) + 2) >> 2
            elif left is not None:
                val = (int(left.sum()) + 2) >> 2
            else:
                val = 128
            p[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = val
    return p


# 4x4 luma block coding order within a macroblock: (row, col) in units
# of 4 samples (spec figure 6-10)
_BLK4_ORDER = [
    (0, 0), (0, 1), (1, 0), (1, 1), (0, 2), (0, 3), (1, 2), (1, 3),
    (2, 0), (2, 1), (3, 0), (3, 1), (2, 2), (2, 3), (3, 2), (3, 3),
]

# Table 9-4, intra column: coded_block_pattern me(v) codeNum -> cbp
_CBP_INTRA = [
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41,
]
_CBP_INTRA_INV = {cbp: i for i, cbp in enumerate(_CBP_INTRA)}

# Table 9-4, inter column (r12: P slices): codeNum -> cbp
_CBP_INTER = [
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
    14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
    17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41,
]
_CBP_INTER_INV = {cbp: i for i, cbp in enumerate(_CBP_INTER)}


class _PicCtx:
    """Per-picture CAVLC decode state: planes, per-4x4 TotalCoeff and
    intra-mode maps (for nC derivation and mode prediction), per-MB
    slice ids (cross-slice neighbors are unavailable, §6.4.11)."""

    __slots__ = (
        "y", "u", "v", "nc_y", "nc_c", "mode4", "mb_slice",
        "mb_w", "mb_h", "filled", "qp", "mv", "ref",
        "mv1", "ref1", "refpic", "poc", "serial",
        "mb_qp", "db_idc", "db_aoff", "db_boff",
        "wp_mode", "wp_l0", "wp_l1", "wp_logwd",
        "mb_kind", "mb_cpm", "mb_cbp", "cbf_dc",
        # r14 CABAC P/B conditioning state (lazily allocated)
        "camvd", "cref", "cskip", "cdirect",
        # r14 continuation: picture contains 8x8-transform MBs
        "has_8x8",
    )

    def __init__(self, sps: _SPS):
        self.mb_w, self.mb_h = sps.mb_width, sps.mb_height
        self.y = np.empty((self.mb_h * 16, self.mb_w * 16), np.uint8)
        if sps.monochrome:
            self.u = self.v = None
        else:
            self.u = np.empty((self.mb_h * 8, self.mb_w * 8), np.uint8)
            self.v = np.empty((self.mb_h * 8, self.mb_w * 8), np.uint8)
        self.nc_y = np.full((self.mb_h * 4, self.mb_w * 4), -1, np.int32)
        self.nc_c = [
            np.full((self.mb_h * 2, self.mb_w * 2), -1, np.int32),
            np.full((self.mb_h * 2, self.mb_w * 2), -1, np.int32),
        ]
        self.mode4 = np.full((self.mb_h * 4, self.mb_w * 4), -1, np.int32)
        self.mb_slice = np.full(self.mb_h * self.mb_w, -1, np.int32)
        self.has_8x8 = False
        # r12 inter state, 4x4-block granularity: L0 motion vectors
        # (quarter-pel, [...,0]=x, [...,1]=y) and reference indices —
        # -2 = not yet decoded, -1 = intra, 0 = the single L0 ref
        self.mv = np.zeros((self.mb_h * 4, self.mb_w * 4, 2), np.int32)
        self.ref = np.full((self.mb_h * 4, self.mb_w * 4), -2, np.int8)
        # r12 B-slice state: list-1 motion field (ref1 -2 = list-1
        # data never written — a block is "decoded" iff ref[...] > -2;
        # P/intra paths leave ref1 untouched and any negative value
        # reads as "no list-1 prediction") plus per-list reference
        # PICTURE identity (decode-order serial, -1 = none) — the
        # deblock bS rule and direct modes compare pictures, not
        # list indices (spec §8.7.2.1, §8.4.1.2).
        self.mv1 = np.zeros((self.mb_h * 4, self.mb_w * 4, 2), np.int32)
        self.ref1 = np.full((self.mb_h * 4, self.mb_w * 4), -2, np.int8)
        self.refpic = np.full(
            (self.mb_h * 4, self.mb_w * 4, 2), -1, np.int32
        )
        self.poc = 0  # PicOrderCnt (§8.2.1) — B list construction
        self.serial = 0  # decode-order picture identity
        # r12 deblocking state, MB granularity: QPY for filtering
        # (0 for I_PCM), per-MB slice filter params (idc default 1 =
        # off, so fixture contexts that never set them skip the pass)
        n_mb = self.mb_h * self.mb_w
        self.mb_qp = np.zeros(n_mb, np.int32)
        self.db_idc = np.ones(n_mb, np.int8)
        self.db_aoff = np.zeros(n_mb, np.int32)
        self.db_boff = np.zeros(n_mb, np.int32)
        self.filled = 0
        self.qp = 0
        # r13 CABAC neighbor state, MB granularity: decoded kind
        # (-1 undecoded, 0 I_NxN, 1 I_16x16, 2 I_PCM), chroma pred
        # mode, coded_block_pattern, and the DC coded_block_flags
        # (luma16 DC, Cb DC, Cr DC; -1 = none) — the §9.3.3.1 context
        # increments read these
        self.mb_kind = np.full(n_mb, -1, np.int8)
        self.mb_cpm = np.zeros(n_mb, np.int8)
        self.mb_cbp = np.zeros(n_mb, np.int16)
        self.cbf_dc = np.full((n_mb, 3), -1, np.int8)
        # r13 weighted prediction, per-slice (§8.4.2.3): 0 = default,
        # 1 = explicit (wp_lX[ref] = (wY,oY,wCb,oCb,wCr,oCr), wp_logwd
        # = (luma_log2_weight_denom, chroma_log2_weight_denom)),
        # 2 = implicit (POC-derived bi weights, single-list default)
        self.wp_mode = 0
        self.wp_l0 = None
        self.wp_l1 = None
        self.wp_logwd = (0, 0)

    def _same_slice(self, mb_idx: int, other_mb: int) -> bool:
        return (
            0 <= other_mb < self.mb_slice.shape[0]
            and self.mb_slice[other_mb] == self.mb_slice[mb_idx]
        )

    def _blk_avail(self, nc, row, col, mb_idx, blk_per_mb_row) -> bool:
        if row < 0 or col < 0 or col >= nc.shape[1]:
            return False
        if nc[row, col] < 0:
            return False
        other_mb = (row // blk_per_mb_row) * self.mb_w + (
            col // blk_per_mb_row
        )
        # _same_slice inlined (hot: several probes per residual block)
        ms = self.mb_slice
        return ms[other_mb] == ms[mb_idx]

    def _blk_at(self, nc, row, col, mb_idx, blk_per_mb_row) -> int:
        """Value at (row, col) when that block is available in the same
        slice, else -1 — fuses _blk_avail with the value read (the
        availability probe and the follow-up read each paid a ~1 µs
        ndarray scalar access; every stored value is >= 0, so -1 is a
        safe sentinel)."""
        if row < 0 or col < 0 or col >= nc.shape[1]:
            return -1
        v = nc[row, col]
        if v < 0:
            return -1
        other_mb = (row // blk_per_mb_row) * self.mb_w + (
            col // blk_per_mb_row
        )
        ms = self.mb_slice
        return int(v) if ms[other_mb] == ms[mb_idx] else -1

    def luma_nc(self, row, col, mb_idx) -> int:
        """nC for the luma 4x4 block at block coords (row, col)."""
        a = self._blk_at(self.nc_y, row, col - 1, mb_idx, 4)
        b = self._blk_at(self.nc_y, row - 1, col, mb_idx, 4)
        if a >= 0 and b >= 0:
            return (a + b + 1) >> 1
        if a >= 0:
            return a
        if b >= 0:
            return b
        return 0

    def chroma_nc(self, comp, row, col, mb_idx) -> int:
        nc = self.nc_c[comp]
        a = self._blk_at(nc, row, col - 1, mb_idx, 2)
        b = self._blk_at(nc, row - 1, col, mb_idx, 2)
        if a >= 0 and b >= 0:
            return (a + b + 1) >> 1
        if a >= 0:
            return a
        if b >= 0:
            return b
        return 0

    def pred_mode4(self, row, col, mb_idx) -> int:
        """Predicted Intra4x4PredMode = min(modeA, modeB), DC when a
        neighbor is unavailable (§8.3.1.1)."""
        a = self._blk_at(self.mode4, row, col - 1, mb_idx, 4)
        b = self._blk_at(self.mode4, row - 1, col, mb_idx, 4)
        if a < 0 or b < 0:
            return 2
        return a if a < b else b


def _decode_intra_mb(
    r: _BitReader,
    ctx: _PicCtx,
    pps: _PPS,
    mb_idx: int,
    mb_type: int,
) -> None:
    """One entropy-coded intra macroblock: I_NxN (mb_type 0) or
    I_16x16 (1..24), CAVLC, 4:2:0 — parse, dequantise, inverse
    transform, intra-predict, reconstruct (spec §7.3.5, §8.3, §8.5)."""
    if ctx.u is None:
        raise UnsupportedMediaError(
            "h264: entropy-coded 4:0:0 macroblocks need the optional "
            "codec library (av) — monochrome decodes I_PCM only"
        )
    my, mx = divmod(mb_idx, ctx.mb_w)
    br, bc = my * 4, mx * 4        # luma 4x4-block coords
    crow, ccol = my * 2, mx * 2    # chroma 4x4-block coords
    y0, x0 = my * 16, mx * 16
    cy0, cx0 = my * 8, mx * 8
    ctx.ref[br : br + 4, bc : bc + 4] = -1  # intra: no motion, either list
    ctx.ref1[br : br + 4, bc : bc + 4] = -1

    if mb_type == 0 and pps.transform_8x8 and r.read(1):
        # ---- I_NxN with the 8x8 transform (High profile, CAVLC)
        ctx.has_8x8 = True
        modes8 = []
        for blk8 in range(4):
            q8r, q8c = (blk8 // 2) * 2, (blk8 % 2) * 2
            pred = ctx.pred_mode4(br + q8r, bc + q8c, mb_idx)
            if r.read(1):  # prev_intra8x8_pred_mode_flag
                mode = pred
            else:
                rem = r.read(3)
                mode = rem if rem < pred else rem + 1
            modes8.append(mode)
            ctx.mode4[
                br + q8r : br + q8r + 2, bc + q8c : bc + q8c + 2
            ] = mode
        chroma_mode = r.ue()
        if chroma_mode > 3:
            raise UnsupportedMediaError("h264: invalid chroma pred mode")
        cbp_code = r.ue()
        if cbp_code >= 48:
            raise UnsupportedMediaError("h264: invalid coded_block_pattern")
        cbp = _CBP_INTRA[cbp_code]
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        if cbp:
            ctx.qp = (ctx.qp + r.se() + 52) % 52
        qpc = _chroma_qp(ctx.qp, pps.chroma_qp_index_offset)
        for blk8 in range(4):
            q8r, q8c = (blk8 // 2) * 2, (blk8 % 2) * 2
            rb, cb_ = br + q8r, bc + q8c
            if cbp_luma & (1 << blk8):
                # four interleaved 4x4 CAVLC partitions: scan
                # position 4*i + part (spec §7.4.5.3.3), each with
                # the normal 4x4 neighbor nC
                coeffs64 = [0] * 64
                for part in range(4):
                    dy, dx = _BLK4_ORDER[blk8 * 4 + part]
                    nc = ctx.luma_nc(br + dy, bc + dx, mb_idx)
                    sub = _decode_residual(r, nc, 16)
                    ctx.nc_y[br + dy, bc + dx] = 16 - sub.count(0)
                    for i, c in enumerate(sub):
                        coeffs64[4 * i + part] = c
                res = _itransform8x8(_dequant8x8(coeffs64, ctx.qp))
            else:
                for part in range(4):
                    dy, dx = _BLK4_ORDER[blk8 * 4 + part]
                    ctx.nc_y[br + dy, bc + dx] = 0
                res = 0
            py, px = rb * 4, cb_ * 4
            pred_px = _pred8x8(
                ctx.y, py, px, modes8[blk8],
                ctx._blk_avail(ctx.nc_y, rb, cb_ - 1, mb_idx, 4),
                ctx._blk_avail(ctx.nc_y, rb - 1, cb_, mb_idx, 4),
                ctx._blk_avail(ctx.nc_y, rb - 1, cb_ - 1, mb_idx, 4),
                ctx._blk_avail(ctx.nc_y, rb - 1, cb_ + 2, mb_idx, 4),
            )
            ctx.y[py : py + 8, px : px + 8] = _clip_u8(pred_px + res)
        _intra_chroma(
            r, ctx, mb_idx, chroma_mode, cbp_chroma, qpc,
            crow, ccol, cy0, cx0,
        )
        return

    if mb_type == 0:  # I_NxN
        for blk in range(16):
            dy, dx = _BLK4_ORDER[blk]
            pred = ctx.pred_mode4(br + dy, bc + dx, mb_idx)
            if r.read(1):  # prev_intra4x4_pred_mode_flag
                mode = pred
            else:
                rem = r.read(3)
                mode = rem if rem < pred else rem + 1
            ctx.mode4[br + dy, bc + dx] = mode
        chroma_mode = r.ue()
        if chroma_mode > 3:
            raise UnsupportedMediaError("h264: invalid chroma pred mode")
        cbp_code = r.ue()
        if cbp_code >= 48:
            raise UnsupportedMediaError("h264: invalid coded_block_pattern")
        cbp = _CBP_INTRA[cbp_code]
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        if cbp:
            ctx.qp = (ctx.qp + r.se() + 52) % 52
        qpc = _chroma_qp(ctx.qp, pps.chroma_qp_index_offset)
        for blk in range(16):
            dy, dx = _BLK4_ORDER[blk]
            rb, cb_ = br + dy, bc + dx
            if cbp_luma & (1 << (blk // 4)):
                nc = ctx.luma_nc(rb, cb_, mb_idx)
                coeffs = _decode_residual(r, nc, 16)
                tc = 16 - coeffs.count(0)
                res = _itransform4x4(_dequant4x4(coeffs, ctx.qp, False))
            else:
                tc, res = 0, 0
            py, px = rb * 4, cb_ * 4
            pred_px = _pred4x4(
                ctx.y, py, px, int(ctx.mode4[rb, cb_]),
                ctx._blk_avail(ctx.nc_y, rb, cb_ - 1, mb_idx, 4),
                ctx._blk_avail(ctx.nc_y, rb - 1, cb_, mb_idx, 4),
                ctx._blk_avail(ctx.nc_y, rb - 1, cb_ - 1, mb_idx, 4),
                ctx._blk_avail(ctx.nc_y, rb - 1, cb_ + 1, mb_idx, 4),
            )
            ctx.y[py : py + 4, px : px + 4] = _clip_u8(pred_px + res)
            ctx.nc_y[rb, cb_] = tc
    else:  # I_16x16
        m = mb_type - 1
        pred16_mode = m % 4
        cbp_chroma = (m // 4) % 3
        cbp_luma = 15 if m >= 12 else 0
        chroma_mode = r.ue()
        if chroma_mode > 3:
            raise UnsupportedMediaError("h264: invalid chroma pred mode")
        ctx.qp = (ctx.qp + r.se() + 52) % 52  # always present for I16
        qpc = _chroma_qp(ctx.qp, pps.chroma_qp_index_offset)
        a_l = ctx._blk_avail(ctx.nc_y, br, bc - 1, mb_idx, 4)
        a_t = ctx._blk_avail(ctx.nc_y, br - 1, bc, mb_idx, 4)
        pred16 = _pred_block16(ctx.y, y0, x0, pred16_mode, a_l, a_t, 16)
        # Intra16x16DCLevel: nC as for luma block 0 (spec §9.2.1)
        dc_coeffs = _decode_residual(
            r, ctx.luma_nc(br, bc, mb_idx), 16
        )
        dmat = np.zeros((4, 4), np.int64)
        for s, c in enumerate(dc_coeffs):
            i, j = _ZIGZAG[s]
            dmat[i, j] = c
        dc = _scale_luma_dc(_hadamard4x4(dmat), ctx.qp)
        for blk in range(16):
            dy, dx = _BLK4_ORDER[blk]
            rb, cb_ = br + dy, bc + dx
            if cbp_luma:
                nc = ctx.luma_nc(rb, cb_, mb_idx)
                ac = _decode_residual(r, nc, 15)
                tc = 15 - ac.count(0)
                d = _dequant4x4(ac, ctx.qp, True)
            else:
                tc, d = 0, [[0, 0, 0, 0] for _ in range(4)]
            d[0][0] = int(dc[dy, dx])
            res = _itransform4x4(d)
            py, px = rb * 4, cb_ * 4
            ctx.y[py : py + 4, px : px + 4] = _clip_u8(
                pred16[dy * 4 : dy * 4 + 4, dx * 4 : dx * 4 + 4] + res
            )
            ctx.nc_y[rb, cb_] = tc
        # modes for neighbor prediction: non-I_NxN intra MB counts as DC
        ctx.mode4[br : br + 4, bc : bc + 4] = 2

    _intra_chroma(
        r, ctx, mb_idx, chroma_mode, cbp_chroma, qpc,
        crow, ccol, cy0, cx0,
    )


def _intra_chroma(r, ctx, mb_idx, chroma_mode, cbp_chroma, qpc,
                  crow, ccol, cy0, cx0):
    """Chroma residual + reconstruction shared by every intra
    macroblock flavor (4x4 / 8x8 / 16x16), 4:2:0."""
    dc_lists = [[0] * 4, [0] * 4]
    if cbp_chroma:
        for comp in range(2):  # Cb then Cr
            dc_lists[comp] = _decode_residual(r, -1, 4)
    ac_lists = [[None] * 4, [None] * 4]
    if cbp_chroma & 2:
        for comp in range(2):
            for blk in range(4):
                cdy, cdx = divmod(blk, 2)
                nc = ctx.chroma_nc(comp, crow + cdy, ccol + cdx, mb_idx)
                ac_lists[comp][blk] = _decode_residual(r, nc, 15)
                ctx.nc_c[comp][crow + cdy, ccol + cdx] = 15 - ac_lists[
                    comp
                ][blk].count(0)
    if not (cbp_chroma & 2):
        for comp in range(2):
            ctx.nc_c[comp][crow : crow + 2, ccol : ccol + 2] = 0

    a_l = ctx._blk_avail(ctx.nc_c[0], crow, ccol - 1, mb_idx, 2)
    a_t = ctx._blk_avail(ctx.nc_c[0], crow - 1, ccol, mb_idx, 2)
    for comp, plane in ((0, ctx.u), (1, ctx.v)):
        if chroma_mode == 0:
            predc = _pred_chroma_dc(plane, cy0, cx0, a_l, a_t)
        elif chroma_mode == 3:
            predc = _pred_block16(plane, cy0, cx0, 3, a_l, a_t, 8)
        else:  # 1 = horizontal, 2 = vertical (chroma mode order)
            predc = _pred_block16(
                plane, cy0, cx0, 1 if chroma_mode == 1 else 0,
                a_l, a_t, 8,
            )
        cmat = np.array(
            [[dc_lists[comp][0], dc_lists[comp][1]],
             [dc_lists[comp][2], dc_lists[comp][3]]],
            np.int64,
        )
        dcc = _scale_chroma_dc(_hadamard2x2(cmat), qpc)
        for blk in range(4):
            cdy, cdx = divmod(blk, 2)
            ac = ac_lists[comp][blk]
            d = (
                _dequant4x4(ac, qpc, True)
                if ac is not None
                else [[0, 0, 0, 0] for _ in range(4)]
            )
            d[0][0] = int(dcc[cdy, cdx])
            res = _itransform4x4(d)
            py, px = cy0 + cdy * 4, cx0 + cdx * 4
            plane[py : py + 4, px : px + 4] = _clip_u8(
                predc[cdy * 4 : cdy * 4 + 4, cdx * 4 : cdx * 4 + 4] + res
            )


# ---------------------------------------------------------------------------
# Inter prediction (r12: P slices) — spec §8.4.  Quarter-sample luma
# motion compensation with the 6-tap (1,-5,20,20,-5,1) half-pel filter
# and quarter averaging (§8.4.2.2.1), eighth-sample bilinear chroma
# (§8.4.2.2.2), the median motion-vector predictor with the 16x8/8x16
# directional special cases (§8.4.1.3), and the P_Skip motion rule
# (§8.4.1.1).  Boundary-clamped sample fetch implements unrestricted
# motion vectors over picture edges.  Both the decoder and the fixture
# encoder call these SAME helpers, so they cannot drift apart.
# ---------------------------------------------------------------------------


def _interp_luma(plane, y0, x0, bh, bw, mvy, mvx):
    """(bh, bw) luma prediction block at full-pel base (y0, x0) with a
    quarter-pel motion vector (spec §8.4.2.2.1, Table 8-12)."""
    iy, ix = y0 + (mvy >> 2), x0 + (mvx >> 2)
    fy, fx = mvy & 3, mvx & 3
    hh, ww = plane.shape
    # r15: interior blocks (the overwhelming majority) slice the plane
    # directly instead of building clip/arange/ix_ gather indices —
    # identical samples, since clipping is a no-op in-bounds.
    if fx == 0 and fy == 0:
        if 0 <= iy <= hh - bh and 0 <= ix <= ww - bw:
            return plane[iy : iy + bh, ix : ix + bw].astype(np.uint8)
        rows = np.clip(np.arange(iy, iy + bh), 0, hh - 1)
        cols = np.clip(np.arange(ix, ix + bw), 0, ww - 1)
        return plane[np.ix_(rows, cols)].astype(np.uint8)
    if 2 <= iy <= hh - bh - 3 and 2 <= ix <= ww - bw - 3:
        wnd = plane[iy - 2 : iy + bh + 3, ix - 2 : ix + bw + 3].astype(
            np.int32
        )  # (bh+5, bw+5)
    else:
        rows = np.clip(np.arange(iy - 2, iy + bh + 3), 0, hh - 1)
        cols = np.clip(np.arange(ix - 2, ix + bw + 3), 0, ww - 1)
        wnd = plane[np.ix_(rows, cols)].astype(np.int32)  # (bh+5, bw+5)
    g = wnd[2 : 2 + bh, 2 : 2 + bw]
    # unrounded 6-tap intermediates: horizontal at every row,
    # vertical at every column (the j position filters these again)
    bfull = (
        wnd[:, 0:bw] - 5 * wnd[:, 1 : bw + 1] + 20 * wnd[:, 2 : bw + 2]
        + 20 * wnd[:, 3 : bw + 3] - 5 * wnd[:, 4 : bw + 4]
        + wnd[:, 5 : bw + 5]
    )  # (bh+5, bw)
    hfull = (
        wnd[0:bh] - 5 * wnd[1 : bh + 1] + 20 * wnd[2 : bh + 2]
        + 20 * wnd[3 : bh + 3] - 5 * wnd[4 : bh + 4] + wnd[5 : bh + 5]
    )  # (bh, bw+5)
    b = np.clip((bfull[2 : 2 + bh] + 16) >> 5, 0, 255)
    h = np.clip((hfull[:, 2 : 2 + bw] + 16) >> 5, 0, 255)
    if fy == 0:  # a, b, c
        out = b if fx == 2 else (
            (g + b + 1) >> 1 if fx == 1
            else (wnd[2 : 2 + bh, 3 : 3 + bw] + b + 1) >> 1
        )
    elif fx == 0:  # d, h, n
        out = h if fy == 2 else (
            (g + h + 1) >> 1 if fy == 1
            else (wnd[3 : 3 + bh, 2 : 2 + bw] + h + 1) >> 1
        )
    else:
        j1 = (
            bfull[0:bh] - 5 * bfull[1 : bh + 1] + 20 * bfull[2 : bh + 2]
            + 20 * bfull[3 : bh + 3] - 5 * bfull[4 : bh + 4]
            + bfull[5 : bh + 5]
        )
        j = np.clip((j1 + 512) >> 10, 0, 255)
        if fx == 2 and fy == 2:
            out = j
        else:
            m = np.clip((hfull[:, 3 : 3 + bw] + 16) >> 5, 0, 255)
            s = np.clip((bfull[3 : 3 + bh] + 16) >> 5, 0, 255)
            if fy == 1:
                out = (b + (h if fx == 1 else j if fx == 2 else m) + 1) >> 1
            elif fy == 2:  # i / k (fx 1 / 3)
                out = (j + (h if fx == 1 else m) + 1) >> 1
            else:  # fy == 3: p, q, r
                out = (s + (h if fx == 1 else j if fx == 2 else m) + 1) >> 1
    return out.astype(np.uint8)


def _interp_chroma(plane, y0, x0, bh, bw, mvy, mvx):
    """(bh, bw) chroma prediction block; the luma quarter-pel vector is
    an eighth-pel chroma vector at half resolution (spec §8.4.2.2.2)."""
    iy, ix = y0 + (mvy >> 3), x0 + (mvx >> 3)
    fy, fx = mvy & 7, mvx & 7
    hh, ww = plane.shape
    if 0 <= iy <= hh - bh - 1 and 0 <= ix <= ww - bw - 1:
        # interior fast path (see _interp_luma)
        wnd = plane[iy : iy + bh + 1, ix : ix + bw + 1].astype(np.int32)
    else:
        rows = np.clip(np.arange(iy, iy + bh + 1), 0, hh - 1)
        cols = np.clip(np.arange(ix, ix + bw + 1), 0, ww - 1)
        wnd = plane[np.ix_(rows, cols)].astype(np.int32)
    out = (
        (8 - fx) * (8 - fy) * wnd[:bh, :bw]
        + fx * (8 - fy) * wnd[:bh, 1 : bw + 1]
        + (8 - fx) * fy * wnd[1 : bh + 1, :bw]
        + fx * fy * wnd[1 : bh + 1, 1 : bw + 1]
        + 32
    ) >> 6
    return out.astype(np.uint8)


class _RefPic:
    """One decoded reference picture in the DPB: padded planes plus
    the metadata B slices need — PicOrderCnt (default list
    construction, temporal direct scaling, §8.2.4.2.3 / §8.4.1.2.3),
    a decode-order serial (picture IDENTITY for the deblock bS rule
    and the temporal-direct col→list0 remap) and the final per-4x4
    motion fields of BOTH lists (colocated data for direct modes)."""

    __slots__ = (
        "y", "u", "v", "poc", "serial", "frame_num",
        "ref0", "ref1", "mv0", "mv1", "refpic",
    )

    def __init__(self, ctx: _PicCtx, frame_num: int = 0):
        self.y, self.u, self.v = ctx.y, ctx.u, ctx.v
        self.poc = ctx.poc
        self.serial = ctx.serial
        self.frame_num = frame_num
        self.ref0, self.ref1 = ctx.ref, ctx.ref1
        self.mv0, self.mv1 = ctx.mv, ctx.mv1
        self.refpic = ctx.refpic

    def __getitem__(self, i: int):  # planes, tuple-compatible
        return (self.y, self.u, self.v)[i]


def _mv_nbr(ctx: _PicCtx, r: int, c: int, mb_idx: int, lx: int = 0):
    """Neighboring 4x4 block for MV prediction in list ``lx`` ->
    (addr_available, refIdx, mvx, mvy).  Intra neighbors — and, in B
    slices, inter neighbors that do not predict from list ``lx`` —
    are address-available but carry refIdx -1 / zero MV
    (spec §8.4.1.3.2)."""
    if r < 0 or c < 0 or r >= ctx.ref.shape[0] or c >= ctx.ref.shape[1]:
        return False, -1, 0, 0
    refs, mvs = (ctx.ref, ctx.mv) if lx == 0 else (ctx.ref1, ctx.mv1)
    rv = int(refs[r, c])
    # per-list "not yet decoded" marker: B macroblocks fill each
    # list's field in its own derivation pass, so a block whose
    # list-lx entry is still -2 has not reached this list's pass yet
    # and is unavailable as a neighbor (decode-order availability)
    if rv <= -2:
        return False, -1, 0, 0
    other_mb = (r // 4) * ctx.mb_w + (c // 4)
    if not ctx._same_slice(mb_idx, other_mb):
        return False, -1, 0, 0
    if rv < 0:  # intra-coded, or not predicted from this list
        return True, -1, 0, 0
    return True, rv, int(mvs[r, c, 0]), int(mvs[r, c, 1])


def _mvp(ctx: _PicCtx, mb_idx: int, r: int, c: int, w4: int, h4: int,
         special: str | None = None, cur_ref: int = 0, lx: int = 0):
    """Median motion-vector predictor for the partition whose top-left
    4x4 block is (r, c), spanning h4 x w4 blocks, predicting against
    reference index ``cur_ref`` of list ``lx`` (spec §8.4.1.3).
    ``special`` names the directional 16x8/8x16 cases: 'T16x8' /
    'B16x8' use B / A when that neighbor references the same picture;
    'L8x16' / 'R8x16' use A / C."""
    av_a, ref_a, ax, ay = _mv_nbr(ctx, r, c - 1, mb_idx, lx)
    av_b, ref_b, bx, by = _mv_nbr(ctx, r - 1, c, mb_idx, lx)
    av_c, ref_c, cx, cy = _mv_nbr(ctx, r - 1, c + w4, mb_idx, lx)
    if not av_c:  # C unavailable -> D (top-left), §8.4.1.3.2
        av_c, ref_c, cx, cy = _mv_nbr(ctx, r - 1, c - 1, mb_idx, lx)
    if special == "T16x8" and ref_b == cur_ref:
        return bx, by
    if special == "B16x8" and ref_a == cur_ref:
        return ax, ay
    if special == "L8x16" and ref_a == cur_ref:
        return ax, ay
    if special == "R8x16" and ref_c == cur_ref:
        return cx, cy
    if not av_b and not av_c and av_a:
        return ax, ay
    matches = [m for m in ((ref_a, ax, ay), (ref_b, bx, by),
                           (ref_c, cx, cy)) if m[0] == cur_ref]
    if len(matches) == 1:
        return matches[0][1], matches[0][2]
    xs, ys = (ax, bx, cx), (ay, by, cy)
    return (
        sum(xs) - min(xs) - max(xs),
        sum(ys) - min(ys) - max(ys),
    )


def _skip_mv(ctx: _PicCtx, mb_idx: int):
    """P_Skip motion vector (spec §8.4.1.1): zero when either MB
    neighbor is unavailable or is a zero-motion ref-0 block, else the
    16x16 median predictor."""
    my, mx = divmod(mb_idx, ctx.mb_w)
    r, c = my * 4, mx * 4
    av_a, ref_a, ax, ay = _mv_nbr(ctx, r, c - 1, mb_idx)
    av_b, ref_b, bx, by = _mv_nbr(ctx, r - 1, c, mb_idx)
    if not av_a or not av_b:
        return 0, 0
    if ref_a == 0 and ax == 0 and ay == 0:
        return 0, 0
    if ref_b == 0 and bx == 0 and by == 0:
        return 0, 0
    return _mvp(ctx, mb_idx, r, c, 4, 4)


# P macroblock partition geometry, mb_type -> [(r_off, c_off, h4, w4,
# special)] in 4x4-block units (spec table 7-13)
_P_PARTS = {
    0: [(0, 0, 4, 4, None)],
    1: [(0, 0, 2, 4, "T16x8"), (2, 0, 2, 4, "B16x8")],
    2: [(0, 0, 4, 2, "L8x16"), (0, 2, 4, 2, "R8x16")],
}
# sub_mb_type for P_8x8 -> [(r_off, c_off, h4, w4)] within the 8x8
_P_SUB_PARTS = {
    0: [(0, 0, 2, 2)],
    1: [(0, 0, 1, 2), (1, 0, 1, 2)],
    2: [(0, 0, 2, 1), (0, 1, 2, 1)],
    3: [(0, 0, 1, 1), (0, 1, 1, 1), (1, 0, 1, 1), (1, 1, 1, 1)],
}


def _mc_partition(ctx: _PicCtx, refp, mb_idx: int, r_off: int,
                  c_off: int, h4: int, w4: int, mvx: int,
                  mvy: int, ref_idx: int = 0) -> None:
    """Motion-compensate one partition (from ``refp`` = the planes of
    reference ``ref_idx``) into the picture planes and record its MV
    field."""
    my, mx = divmod(mb_idx, ctx.mb_w)
    r, c = my * 4 + r_off, mx * 4 + c_off
    ctx.mv[r : r + h4, c : c + w4, 0] = mvx
    ctx.mv[r : r + h4, c : c + w4, 1] = mvy
    ctx.ref[r : r + h4, c : c + w4] = ref_idx
    ctx.refpic[r : r + h4, c : c + w4, 0] = refp.serial
    py, px = r * 4, c * 4
    yb = _interp_luma(refp[0], py, px, h4 * 4, w4 * 4, mvy, mvx)
    if ctx.wp_mode == 1:  # explicit P weighting (§8.4.2.3.3)
        wl = ctx.wp_l0[ref_idx]
        yb = _wp_single(yb, wl[0], wl[1], ctx.wp_logwd[0])
    ctx.y[py : py + h4 * 4, px : px + w4 * 4] = yb
    if ctx.u is not None:
        cy, cx = py // 2, px // 2
        ub = _interp_chroma(refp[1], cy, cx, h4 * 2, w4 * 2, mvy, mvx)
        vb = _interp_chroma(refp[2], cy, cx, h4 * 2, w4 * 2, mvy, mvx)
        if ctx.wp_mode == 1:
            cwd = ctx.wp_logwd[1]
            ub = _wp_single(ub, wl[2], wl[3], cwd)
            vb = _wp_single(vb, wl[4], wl[5], cwd)
        ctx.u[cy : cy + h4 * 2, cx : cx + w4 * 2] = ub
        ctx.v[cy : cy + h4 * 2, cx : cx + w4 * 2] = vb


def _read_te(r: _BitReader, max_val: int) -> int:
    """te(v) truncated Exp-Golomb (spec §9.1.1): a single flipped bit
    when the range is [0, 1], plain ue(v) otherwise."""
    if max_val == 1:
        return 1 - r.read(1)
    return r.ue()


def _decode_pskip(ctx: _PicCtx, mb_idx: int, refp) -> None:
    """P_Skip: motion-compensated copy from reference 0, zero residual
    (spec §8.4.1.1); 4:2:0 only (callers guard monochrome)."""
    mvx, mvy = _skip_mv(ctx, mb_idx)
    _mc_partition(ctx, refp, mb_idx, 0, 0, 4, 4, mvx, mvy)
    my, mx = divmod(mb_idx, ctx.mb_w)
    br, bc = my * 4, mx * 4
    ctx.nc_y[br : br + 4, bc : bc + 4] = 0
    ctx.nc_c[0][my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 0
    ctx.nc_c[1][my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 0
    ctx.mode4[br : br + 4, bc : bc + 4] = 2


def _decode_inter_mb(r: _BitReader, ctx: _PicCtx, pps: _PPS,
                     mb_idx: int, mb_type: int, dpb,
                     num_ref: int, es=None) -> None:
    """One P macroblock: P_L0_16x16 / 16x8 / 8x16 / P_8x8(ref0)
    — parse ref_idx (te(v), when num_ref > 1) and MVDs, derive MVs
    (ref-aware median predictor), motion-compensate from the chosen
    DPB picture, then the inter residual (CBP inter mapping).
    ``es`` = the CABAC entropy source (r14); None = CAVLC reads from
    ``r``.  The syntax element ORDER is entropy-agnostic."""
    if ctx.u is None:
        raise UnsupportedMediaError(
            "h264: entropy-coded 4:0:0 macroblocks need the optional "
            "codec library (av) — monochrome decodes I_PCM only"
        )
    my, mx = divmod(mb_idx, ctx.mb_w)
    br, bc = my * 4, mx * 4
    crow, ccol = my * 2, mx * 2

    def read_ref(rb, cb, h4, w4) -> int:
        if es is not None:
            return es.ref(0, num_ref, rb, cb, h4, w4, mb_idx)
        if num_ref <= 1:
            return 0
        ri = _read_te(r, num_ref - 1)
        if ri >= num_ref:
            raise UnsupportedMediaError("h264: ref_idx out of range")
        return ri

    def read_mvd(rb, cb, h4, w4):
        if es is not None:
            return es.mvd(0, rb, cb, h4, w4, mb_idx)
        return (r.se(), r.se())  # x then y (§7.4.5.1)

    if mb_type in (0, 1, 2):
        parts = _P_PARTS[mb_type]
        refs = [
            read_ref(br + ro, bc + co, h4, w4)
            for ro, co, h4, w4, _sp in parts
        ]  # all ref_idx first (§7.3.5.1)
        mvds = [
            read_mvd(br + ro, bc + co, h4, w4)
            for ro, co, h4, w4, _sp in parts
        ]
        for (r_off, c_off, h4, w4, special), ri, (dx, dy) in zip(
            parts, refs, mvds
        ):
            px_, py_ = _mvp(
                ctx, mb_idx, br + r_off, bc + c_off, w4, h4, special,
                cur_ref=ri,
            )
            _mc_partition(
                ctx, dpb[ri], mb_idx, r_off, c_off, h4, w4,
                px_ + dx, py_ + dy, ref_idx=ri,
            )
    else:  # 3 / 4: P_8x8 / P_8x8ref0
        if es is not None:
            subs = [es.sub_p() for _ in range(4)]
        else:
            subs = [r.ue() for _ in range(4)]
            if any(s > 3 for s in subs):
                raise UnsupportedMediaError("h264: invalid sub_mb_type")
        # syntax order (§7.3.5.2): all sub_mb_types, then one ref_idx
        # per 8x8 (absent for P_8x8ref0), then the mvds
        if mb_type == 3:
            refs8 = [
                read_ref(br + 2 * (i8 // 2), bc + 2 * (i8 % 2), 2, 2)
                for i8 in range(4)
            ]
        else:
            refs8 = [0, 0, 0, 0]
        for i8 in range(4):
            base_r, base_c = 2 * (i8 // 2), 2 * (i8 % 2)
            ri = refs8[i8]
            for r_off, c_off, h4, w4 in _P_SUB_PARTS[subs[i8]]:
                dx, dy = read_mvd(
                    br + base_r + r_off, bc + base_c + c_off, h4, w4
                )
                px_, py_ = _mvp(
                    ctx, mb_idx, br + base_r + r_off,
                    bc + base_c + c_off, w4, h4, cur_ref=ri,
                )
                _mc_partition(
                    ctx, dpb[ri], mb_idx, base_r + r_off,
                    base_c + c_off, h4, w4, px_ + dx, py_ + dy,
                    ref_idx=ri,
                )

    if es is not None:
        es.residual(ctx, pps, mb_idx)
    else:
        _inter_residual(r, ctx, pps, mb_idx)


def _inter_residual(r: _BitReader, ctx: _PicCtx, pps: _PPS,
                    mb_idx: int) -> None:
    """Inter-MB residual, shared by P and B macroblocks (spec
    §7.3.5.3 with the Table 9-4 inter CBP mapping; luma has no
    DC/AC split outside I_16x16)."""
    my, mx = divmod(mb_idx, ctx.mb_w)
    br, bc = my * 4, mx * 4
    crow, ccol = my * 2, mx * 2
    cbp_code = r.ue()
    if cbp_code >= 48:
        raise UnsupportedMediaError("h264: invalid coded_block_pattern")
    cbp = _CBP_INTER[cbp_code]
    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
    if cbp:
        ctx.qp = (ctx.qp + r.se() + 52) % 52
    qpc = _chroma_qp(ctx.qp, pps.chroma_qp_index_offset)
    for blk in range(16):
        dy, dx = _BLK4_ORDER[blk]
        rb, cb_ = br + dy, bc + dx
        py, px = rb * 4, cb_ * 4
        if cbp_luma & (1 << (blk // 4)):
            nc = ctx.luma_nc(rb, cb_, mb_idx)
            coeffs = _decode_residual(r, nc, 16)
            ctx.nc_y[rb, cb_] = 16 - coeffs.count(0)
            res = _itransform4x4(_dequant4x4(coeffs, ctx.qp, False))
            pred = ctx.y[py : py + 4, px : px + 4].astype(np.int64)
            ctx.y[py : py + 4, px : px + 4] = _clip_u8(pred + res)
        else:
            ctx.nc_y[rb, cb_] = 0
    dc_lists = [[0] * 4, [0] * 4]
    if cbp_chroma:
        for comp in range(2):
            dc_lists[comp] = _decode_residual(r, -1, 4)
    ac_lists = [[None] * 4, [None] * 4]
    if cbp_chroma & 2:
        for comp in range(2):
            for blk in range(4):
                cdy, cdx = divmod(blk, 2)
                nc = ctx.chroma_nc(comp, crow + cdy, ccol + cdx, mb_idx)
                ac_lists[comp][blk] = _decode_residual(r, nc, 15)
                ctx.nc_c[comp][crow + cdy, ccol + cdx] = 15 - ac_lists[
                    comp
                ][blk].count(0)
    else:
        for comp in range(2):
            ctx.nc_c[comp][crow : crow + 2, ccol : ccol + 2] = 0
    if cbp_chroma:
        cy0, cx0 = my * 8, mx * 8
        for comp, plane in ((0, ctx.u), (1, ctx.v)):
            cmat = np.array(
                [[dc_lists[comp][0], dc_lists[comp][1]],
                 [dc_lists[comp][2], dc_lists[comp][3]]],
                np.int64,
            )
            dcc = _scale_chroma_dc(_hadamard2x2(cmat), qpc)
            for blk in range(4):
                cdy, cdx = divmod(blk, 2)
                ac = ac_lists[comp][blk]
                d = (
                    _dequant4x4(ac, qpc, True)
                    if ac is not None
                    else [[0, 0, 0, 0] for _ in range(4)]
                )
                d[0][0] = int(dcc[cdy, cdx])
                res = _itransform4x4(d)
                py, px = cy0 + cdy * 4, cx0 + cdx * 4
                pred = plane[py : py + 4, px : px + 4].astype(np.int64)
                plane[py : py + 4, px : px + 4] = _clip_u8(pred + res)
    ctx.mode4[br : br + 4, bc : bc + 4] = 2


# ---------------------------------------------------------------------------
# B slices (r12, second ratchet) — spec §7.3.5 / §8.4.1.2 / §8.4.2.3.
# Everything below reuses the P-slice machinery (median MV predictor,
# quarter-pel interpolation, the shared inter residual) and adds the
# two-list layer: Table 7-14/7-18 partition geometry, te(v) ref_idx
# per list, default bi-prediction (the +1 rounded average of the two
# MC blocks — weighted_bipred_idc != 0 stays seam-gated), and BOTH
# direct modes: spatial (§8.4.1.2.2, MB-level MinPositive reference
# selection + per-block colZeroFlag against RefPicList1[0]) and
# temporal (§8.4.1.2.3, POC-distance scaling of the colocated MV with
# the col→list0 identity remap).  direct_8x8_inference_flag picks the
# corner-sampled 8x8 granularity.  Default reference lists follow
# §8.2.4.2.3 (L0 past-desc + future-asc, L1 mirrored, the first-two
# swap when the lists coincide); POC itself is derived per §8.2.1
# (types 0 and 2; type 1 B streams are seam-gated).
# ---------------------------------------------------------------------------

# Table 7-14: B mb_type 1..21 -> (partition geometry, per-partition
# prediction mask: 1 = L0, 2 = L1, 3 = BI).  0 is B_Direct_16x16,
# 22 is B_8x8, 23+ is intra-in-B.
_B_GEOM16 = [(0, 0, 4, 4, None)]
_B_MBTYPES = {
    1: (_B_GEOM16, (1,)), 2: (_B_GEOM16, (2,)), 3: (_B_GEOM16, (3,)),
    4: (_P_PARTS[1], (1, 1)), 5: (_P_PARTS[2], (1, 1)),
    6: (_P_PARTS[1], (2, 2)), 7: (_P_PARTS[2], (2, 2)),
    8: (_P_PARTS[1], (1, 2)), 9: (_P_PARTS[2], (1, 2)),
    10: (_P_PARTS[1], (2, 1)), 11: (_P_PARTS[2], (2, 1)),
    12: (_P_PARTS[1], (1, 3)), 13: (_P_PARTS[2], (1, 3)),
    14: (_P_PARTS[1], (2, 3)), 15: (_P_PARTS[2], (2, 3)),
    16: (_P_PARTS[1], (3, 1)), 17: (_P_PARTS[2], (3, 1)),
    18: (_P_PARTS[1], (3, 2)), 19: (_P_PARTS[2], (3, 2)),
    20: (_P_PARTS[1], (3, 3)), 21: (_P_PARTS[2], (3, 3)),
}
# Table 7-18: B sub_mb_type 1..12 -> (sub-partition geometry within
# the 8x8, prediction mask); 0 is B_Direct_8x8.
_B_SUBTYPES = {
    1: (_P_SUB_PARTS[0], 1), 2: (_P_SUB_PARTS[0], 2),
    3: (_P_SUB_PARTS[0], 3),
    4: (_P_SUB_PARTS[1], 1), 5: (_P_SUB_PARTS[2], 1),
    6: (_P_SUB_PARTS[1], 2), 7: (_P_SUB_PARTS[2], 2),
    8: (_P_SUB_PARTS[1], 3), 9: (_P_SUB_PARTS[2], 3),
    10: (_P_SUB_PARTS[3], 1), 11: (_P_SUB_PARTS[3], 2),
    12: (_P_SUB_PARTS[3], 3),
}


def _min_positive(a: int, b: int) -> int:
    """MinPositive (spec eq. 8-186): min when both non-negative,
    else whichever is larger (i.e. the non-negative one, or -1)."""
    if a >= 0 and b >= 0:
        return min(a, b)
    return max(a, b)


def _div_trunc(a: int, b: int) -> int:
    """Integer division truncating toward zero (the spec's '/')."""
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


def _clip3(lo: int, hi: int, x: int) -> int:
    return lo if x < lo else (hi if x > hi else x)


def _b_default_lists(dpb: list, cur_poc: int):
    """Default B reference lists (spec §8.2.4.2.3, short-term frames):
    L0 = POC-below-current descending then POC-above ascending; L1
    mirrored; when the two lists would be identical and hold more
    than one entry, L1's first two entries are swapped."""
    past = sorted(
        (p for p in dpb if p.poc <= cur_poc), key=lambda p: -p.poc
    )
    fut = sorted(
        (p for p in dpb if p.poc > cur_poc), key=lambda p: p.poc
    )
    l0 = past + fut
    l1 = fut + past
    if len(l1) > 1 and l0 == l1:
        l1 = [l1[1], l1[0]] + l1[2:]
    return l0, l1


def _col_block(col: _RefPic, r: int, c: int):
    """Colocated 4x4 of RefPicList1[0] -> (mvCol, refIdxCol, referenced
    picture serial), preferring the colocated block's list-0 data;
    intra colocated blocks return refIdxCol -1 (spec §8.4.1.2.2)."""
    if int(col.ref0[r, c]) >= 0:
        return (
            (int(col.mv0[r, c, 0]), int(col.mv0[r, c, 1])),
            int(col.ref0[r, c]),
            int(col.refpic[r, c, 0]),
        )
    if int(col.ref1[r, c]) >= 0:
        return (
            (int(col.mv1[r, c, 0]), int(col.mv1[r, c, 1])),
            int(col.ref1[r, c]),
            int(col.refpic[r, c, 1]),
        )
    return (0, 0), -1, -1


# direct-prediction block grid per 8x8 quadrant: with
# direct_8x8_inference_flag the quadrant is one 8x8 block sampling
# the colocated MB's OUTER CORNER 4x4; without it, four 4x4 blocks
# sampling their own colocated positions.
_DIRECT_CORNER = {0: (0, 0), 1: (0, 3), 2: (3, 0), 3: (3, 3)}


def _direct_grid(inference: bool, quads):
    out = []
    for i8 in quads:
        qr, qc = 2 * (i8 // 2), 2 * (i8 % 2)
        if inference:
            cr, cc = _DIRECT_CORNER[i8]
            out.append((qr, qc, 2, 2, cr, cc))
        else:
            for dr in range(2):
                for dc in range(2):
                    out.append(
                        (qr + dr, qc + dc, 1, 1, qr + dr, qc + dc)
                    )
    return out


def _derive_direct(ctx: _PicCtx, mb_idx: int, l0, l1, spatial: bool,
                   inference: bool, quads=(0, 1, 2, 3)):
    """Direct motion for the given 8x8 quadrants of a B macroblock ->
    [(r_off, c_off, h4, w4, ref0, mv0, ref1, mv1)] with refX = -1
    when list X is unused.  Reads only MB-external neighbor state and
    the colocated picture, so B_Direct_8x8 quadrants may be derived
    before the macroblock's explicit partitions are filled in."""
    my, mx = divmod(mb_idx, ctx.mb_w)
    br, bc = my * 4, mx * 4
    col = l1[0]
    out = []
    if spatial:  # §8.4.1.2.2
        refs = []
        for lxx in (0, 1):
            a = _mv_nbr(ctx, br, bc - 1, mb_idx, lxx)[1]
            b = _mv_nbr(ctx, br - 1, bc, mb_idx, lxx)[1]
            c_nbr = _mv_nbr(ctx, br - 1, bc + 4, mb_idx, lxx)
            if not c_nbr[0]:
                c_nbr = _mv_nbr(ctx, br - 1, bc - 1, mb_idx, lxx)
            refs.append(_min_positive(_min_positive(a, b), c_nbr[1]))
        ref0, ref1 = refs
        zero_all = ref0 < 0 and ref1 < 0  # directZeroPredictionFlag
        if zero_all:
            ref0 = ref1 = 0
        mvp0 = (
            _mvp(ctx, mb_idx, br, bc, 4, 4, None, ref0, 0)
            if ref0 >= 0 else (0, 0)
        )
        mvp1 = (
            _mvp(ctx, mb_idx, br, bc, 4, 4, None, ref1, 1)
            if ref1 >= 0 else (0, 0)
        )
        for ro, co, h4, w4, cr, cc in _direct_grid(inference, quads):
            mvcol, col_ri, _ = _col_block(col, br + cr, bc + cc)
            colzero = (
                col_ri == 0
                and abs(mvcol[0]) <= 1
                and abs(mvcol[1]) <= 1
            )
            mv0 = (
                (0, 0)
                if zero_all or (ref0 == 0 and colzero)
                else mvp0
            )
            mv1 = (
                (0, 0)
                if zero_all or (ref1 == 0 and colzero)
                else mvp1
            )
            out.append((ro, co, h4, w4, ref0, mv0, ref1, mv1))
        return out
    # temporal (§8.4.1.2.3): scale the colocated MV by POC distances
    serial_to_l0 = {}
    for i, p in enumerate(l0):
        serial_to_l0.setdefault(p.serial, i)
    for ro, co, h4, w4, cr, cc in _direct_grid(inference, quads):
        mvcol, col_ri, col_serial = _col_block(col, br + cr, bc + cc)
        if col_ri < 0:  # colocated intra: refIdxL0 = 0, mvCol = 0
            ref0, mvcol = 0, (0, 0)
        else:
            ref0 = serial_to_l0.get(col_serial)
            if ref0 is None:
                raise UnsupportedMediaError(
                    "h264: temporal-direct colocated reference is not "
                    "in the current list 0"
                )
        pic0 = l0[ref0]
        td = _clip3(-128, 127, col.poc - pic0.poc)
        if td == 0:  # long-term refs are seam-gated, so td==0 only
            mv0, mv1 = mvcol, (0, 0)
        else:
            tb = _clip3(-128, 127, ctx.poc - pic0.poc)
            tx = _div_trunc(16384 + abs(_div_trunc(td, 2)), td)
            dsf = _clip3(-1024, 1023, (tb * tx + 32) >> 6)
            mv0 = (
                (dsf * mvcol[0] + 128) >> 8,
                (dsf * mvcol[1] + 128) >> 8,
            )
            mv1 = (mv0[0] - mvcol[0], mv0[1] - mvcol[1])
        out.append((ro, co, h4, w4, ref0, mv0, 0, mv1))
    return out


def _b_store_fields(ctx: _PicCtx, mb_idx: int, ro, co, h4, w4,
                    lx: int, ref: int, mv, lst) -> None:
    """Record one partition's list-``lx`` motion field (ref -1 =
    decoded but not predicted from this list)."""
    my, mx = divmod(mb_idx, ctx.mb_w)
    r, c = my * 4 + ro, mx * 4 + co
    refs, mvs = (ctx.ref, ctx.mv) if lx == 0 else (ctx.ref1, ctx.mv1)
    refs[r : r + h4, c : c + w4] = ref if ref >= 0 else -1
    mvs[r : r + h4, c : c + w4, 0] = mv[0] if ref >= 0 else 0
    mvs[r : r + h4, c : c + w4, 1] = mv[1] if ref >= 0 else 0
    ctx.refpic[r : r + h4, c : c + w4, lx] = (
        lst[ref].serial if ref >= 0 else -1
    )


def _wp_single(arr: np.ndarray, w: int, o: int, logwd: int) -> np.ndarray:
    """Explicit single-list weighted sample prediction (§8.4.2.3.3
    eq. 8-269/270): Clip1(((x·w + 2^(logWD−1)) >> logWD) + o), the
    no-rounding form when logWD = 0.  ``>>`` on negative int32 is the
    arithmetic (floor) shift the spec specifies."""
    x = arr.astype(np.int32)
    if logwd >= 1:
        v = ((x * w + (1 << (logwd - 1))) >> logwd) + o
    else:
        v = x * w + o
    return np.clip(v, 0, 255).astype(np.uint8)


def _wp_bi(a0, a1, w0: int, w1: int, o0: int, o1: int,
           logwd: int) -> np.ndarray:
    """Weighted bi-prediction (§8.4.2.3.3 eq. 8-271):
    Clip1(((x0·w0 + x1·w1 + 2^logWD) >> (logWD+1)) + ((o0+o1+1)>>1))."""
    v = (
        (a0.astype(np.int64) * w0 + a1.astype(np.int64) * w1
         + (1 << logwd)) >> (logwd + 1)
    ) + ((o0 + o1 + 1) >> 1)
    return np.clip(v, 0, 255).astype(np.uint8)


def _implicit_weights(poc_cur: int, poc0: int, poc1: int) -> tuple:
    """Implicit bi-prediction weights (§8.4.2.3.1): POC-distance
    scaling with the same tx/DistScaleFactor arithmetic as temporal
    direct; default (32, 32) when the references coincide or the
    scaled weight leaves [-64, 128].  (Long-term references cannot
    occur here — adaptive marking is seam-gated.)"""
    td = _clip3(-128, 127, poc1 - poc0)
    if td == 0:
        return 32, 32
    tb = _clip3(-128, 127, poc_cur - poc0)
    tx = _div_trunc(16384 + abs(_div_trunc(td, 2)), td)
    dsf = _clip3(-1024, 1023, (tb * tx + 32) >> 6)
    w1 = dsf >> 2
    if not -64 <= w1 <= 128:
        return 32, 32
    return 64 - w1, w1


def _pred_block(refp: _RefPic, py, px, h, w, mv):
    """Single-list interpolated prediction (luma + both chroma)."""
    y = _interp_luma(refp.y, py, px, h, w, mv[1], mv[0])
    u = _interp_chroma(
        refp.u, py // 2, px // 2, h // 2, w // 2, mv[1], mv[0]
    )
    v = _interp_chroma(
        refp.v, py // 2, px // 2, h // 2, w // 2, mv[1], mv[0]
    )
    return y, u, v


def _b_pred_part(ctx, l0, l1, py, px, h, w, ref0, mv0, ref1, mv1):
    """(Y, U, V) prediction for one B partition at picture offset
    (py, px): single-list MC, or bi prediction on the per-list
    interpolated samples — the default average (predL0+predL1+1)>>1
    (§8.4.2.3.2), explicit weights (ctx.wp_mode 1), or POC-implicit
    weights (ctx.wp_mode 2; single-list stays default in implicit
    mode, §8.4.2.3.1)."""
    lwd, cwd = ctx.wp_logwd
    if ref0 >= 0 and ref1 >= 0:
        y0b, u0b, v0b = _pred_block(l0[ref0], py, px, h, w, mv0)
        y1b, u1b, v1b = _pred_block(l1[ref1], py, px, h, w, mv1)
        if ctx.wp_mode == 1:
            w0 = ctx.wp_l0[ref0]
            w1 = ctx.wp_l1[ref1]
            return (
                _wp_bi(y0b, y1b, w0[0], w1[0], w0[1], w1[1], lwd),
                _wp_bi(u0b, u1b, w0[2], w1[2], w0[3], w1[3], cwd),
                _wp_bi(v0b, v1b, w0[4], w1[4], w0[5], w1[5], cwd),
            )
        if ctx.wp_mode == 2:
            iw0, iw1 = _implicit_weights(
                ctx.poc, l0[ref0].poc, l1[ref1].poc
            )
            return (
                _wp_bi(y0b, y1b, iw0, iw1, 0, 0, 5),
                _wp_bi(u0b, u1b, iw0, iw1, 0, 0, 5),
                _wp_bi(v0b, v1b, iw0, iw1, 0, 0, 5),
            )
        return (
            ((y0b.astype(np.int32) + y1b + 1) >> 1).astype(np.uint8),
            ((u0b.astype(np.int32) + u1b + 1) >> 1).astype(np.uint8),
            ((v0b.astype(np.int32) + v1b + 1) >> 1).astype(np.uint8),
        )
    if ref0 >= 0:
        yb, ub, vb = _pred_block(l0[ref0], py, px, h, w, mv0)
        wl = ctx.wp_l0[ref0] if ctx.wp_mode == 1 else None
    else:
        yb, ub, vb = _pred_block(l1[ref1], py, px, h, w, mv1)
        wl = ctx.wp_l1[ref1] if ctx.wp_mode == 1 else None
    if wl is not None:
        return (
            _wp_single(yb, wl[0], wl[1], lwd),
            _wp_single(ub, wl[2], wl[3], cwd),
            _wp_single(vb, wl[4], wl[5], cwd),
        )
    return yb, ub, vb


def _mc_part_b(ctx: _PicCtx, l0, l1, mb_idx: int, ro, co, h4, w4,
               ref0: int, mv0, ref1: int, mv1) -> None:
    """Motion-compensate one B partition into the picture planes,
    storing both lists' motion fields."""
    _b_store_fields(ctx, mb_idx, ro, co, h4, w4, 0, ref0, mv0, l0)
    _b_store_fields(ctx, mb_idx, ro, co, h4, w4, 1, ref1, mv1, l1)
    my, mx = divmod(mb_idx, ctx.mb_w)
    py, px = (my * 4 + ro) * 4, (mx * 4 + co) * 4
    h, w = h4 * 4, w4 * 4
    yb, ub, vb = _b_pred_part(
        ctx, l0, l1, py, px, h, w, ref0, mv0, ref1, mv1
    )
    ctx.y[py : py + h, px : px + w] = yb
    cy, cx = py // 2, px // 2
    ctx.u[cy : cy + h // 2, cx : cx + w // 2] = ub
    ctx.v[cy : cy + h // 2, cx : cx + w // 2] = vb


def _decode_bskip(ctx: _PicCtx, mb_idx: int, l0, l1, spatial: bool,
                  inference: bool) -> None:
    """B_Skip: direct prediction, zero residual (spec §7.3.4)."""
    for e in _derive_direct(ctx, mb_idx, l0, l1, spatial, inference):
        _mc_part_b(ctx, l0, l1, mb_idx, *e)
    my, mx = divmod(mb_idx, ctx.mb_w)
    br, bc = my * 4, mx * 4
    ctx.nc_y[br : br + 4, bc : bc + 4] = 0
    ctx.nc_c[0][my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 0
    ctx.nc_c[1][my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 0
    ctx.mode4[br : br + 4, bc : bc + 4] = 2


def _decode_b_mb(r: _BitReader, ctx: _PicCtx, pps: _PPS, mb_idx: int,
                 mb_type: int, l0, l1, spatial: bool,
                 inference: bool, es=None) -> None:
    """One B macroblock, mb_type 0..22 (Table 7-14): parse
    ref_idx per list (te(v)), all list-0 MVDs then all list-1 MVDs
    (§7.3.5.1/.2), derive each list's median predictor in partition
    order, motion-compensate (bi partitions average), then the shared
    inter residual.  ``es`` = the CABAC entropy source (r14); None =
    CAVLC reads from ``r``."""
    if ctx.u is None:
        raise UnsupportedMediaError(
            "h264: entropy-coded 4:0:0 macroblocks need the optional "
            "codec library (av) — monochrome decodes I_PCM only"
        )
    my, mx = divmod(mb_idx, ctx.mb_w)
    br, bc = my * 4, mx * 4
    n0, n1 = len(l0), len(l1)

    def read_ref(n: int, lx: int, rb: int, cb: int,
                 h4: int, w4: int) -> int:
        if es is not None:
            return es.ref(lx, n, rb, cb, h4, w4, mb_idx)
        ri = _read_te(r, n - 1) if n > 1 else 0
        if ri >= n:
            raise UnsupportedMediaError("h264: ref_idx out of range")
        return ri

    def read_mvd(lx: int, rb: int, cb: int, h4: int, w4: int):
        if es is not None:
            return es.mvd(lx, rb, cb, h4, w4, mb_idx)
        return (r.se(), r.se())

    if mb_type == 0:  # B_Direct_16x16
        for e in _derive_direct(ctx, mb_idx, l0, l1, spatial,
                                inference):
            _mc_part_b(ctx, l0, l1, mb_idx, *e)
    elif mb_type <= 21:
        geom, masks = _B_MBTYPES[mb_type]
        refs = ({}, {})
        for lx, n in ((0, n0), (1, n1)):
            for p, m in enumerate(masks):
                if m & (1 << lx):
                    ro, co, h4, w4, _sp = geom[p]
                    refs[lx][p] = read_ref(
                        n, lx, br + ro, bc + co, h4, w4
                    )
        mvds = ({}, {})
        for lx in (0, 1):
            for p, m in enumerate(masks):
                if m & (1 << lx):
                    ro, co, h4, w4, _sp = geom[p]
                    mvds[lx][p] = read_mvd(
                        lx, br + ro, bc + co, h4, w4
                    )
        derived = ({}, {})
        for lx, lst in ((0, l0), (1, l1)):
            for p, ((ro, co, h4, w4, special), m) in enumerate(
                zip(geom, masks)
            ):
                if m & (1 << lx):
                    ri = refs[lx][p]
                    mpx, mpy = _mvp(
                        ctx, mb_idx, br + ro, bc + co, w4, h4,
                        special, ri, lx,
                    )
                    dx, dy = mvds[lx][p]
                    mv = (mpx + dx, mpy + dy)
                    derived[lx][p] = (ri, mv)
                    _b_store_fields(
                        ctx, mb_idx, ro, co, h4, w4, lx, ri, mv, lst
                    )
                else:
                    _b_store_fields(
                        ctx, mb_idx, ro, co, h4, w4, lx, -1, (0, 0),
                        lst,
                    )
        for p, (ro, co, h4, w4, _sp) in enumerate(geom):
            r0, m0 = derived[0].get(p, (-1, (0, 0)))
            r1, m1 = derived[1].get(p, (-1, (0, 0)))
            _mc_part_b(ctx, l0, l1, mb_idx, ro, co, h4, w4,
                       r0, m0, r1, m1)
    else:  # 22: B_8x8
        if es is not None:
            subs = [es.sub_b() for _ in range(4)]
        else:
            subs = [r.ue() for _ in range(4)]
        if any(s > 12 for s in subs):
            raise UnsupportedMediaError("h264: invalid B sub_mb_type")
        direct_quads = [i8 for i8 in range(4) if subs[i8] == 0]
        direct_entries = (
            _derive_direct(ctx, mb_idx, l0, l1, spatial, inference,
                           quads=direct_quads)
            if direct_quads else []
        )
        refs8 = ({}, {})
        for lx, n in ((0, n0), (1, n1)):
            for i8 in range(4):
                if subs[i8] and _B_SUBTYPES[subs[i8]][1] & (1 << lx):
                    refs8[lx][i8] = read_ref(
                        n, lx, br + 2 * (i8 // 2), bc + 2 * (i8 % 2),
                        2, 2,
                    )
        mvds = ({}, {})
        for lx in (0, 1):
            for i8 in range(4):
                if subs[i8]:
                    parts, m = _B_SUBTYPES[subs[i8]]
                    if m & (1 << lx):
                        base_r = 2 * (i8 // 2)
                        base_c = 2 * (i8 % 2)
                        for s_i, (ro, co, h4, w4) in enumerate(parts):
                            mvds[lx][i8, s_i] = read_mvd(
                                lx, br + base_r + ro,
                                bc + base_c + co, h4, w4,
                            )
        derived = ({}, {})
        d_by_quad = {}
        for e in direct_entries:
            d_by_quad.setdefault(
                (e[0] // 2) * 2 + (e[1] // 2), []
            ).append(e)
        for lx, lst in ((0, l0), (1, l1)):
            for i8 in range(4):
                base_r, base_c = 2 * (i8 // 2), 2 * (i8 % 2)
                if subs[i8] == 0:
                    for ro, co, h4, w4, d0, dm0, d1, dm1 in (
                        d_by_quad[i8]
                    ):
                        ref, mv = (d0, dm0) if lx == 0 else (d1, dm1)
                        _b_store_fields(
                            ctx, mb_idx, ro, co, h4, w4, lx, ref,
                            mv, lst,
                        )
                    continue
                parts, m = _B_SUBTYPES[subs[i8]]
                for s_i, (ro, co, h4, w4) in enumerate(parts):
                    rr, cc = base_r + ro, base_c + co
                    if m & (1 << lx):
                        ri = refs8[lx][i8]
                        mpx, mpy = _mvp(
                            ctx, mb_idx, br + rr, bc + cc, w4, h4,
                            None, ri, lx,
                        )
                        dx, dy = mvds[lx][i8, s_i]
                        mv = (mpx + dx, mpy + dy)
                        derived[lx][i8, s_i] = (ri, mv)
                        _b_store_fields(
                            ctx, mb_idx, rr, cc, h4, w4, lx, ri, mv,
                            lst,
                        )
                    else:
                        _b_store_fields(
                            ctx, mb_idx, rr, cc, h4, w4, lx, -1,
                            (0, 0), lst,
                        )
        for e in direct_entries:
            _mc_part_b(ctx, l0, l1, mb_idx, *e)
        for i8 in range(4):
            if subs[i8] == 0:
                continue
            base_r, base_c = 2 * (i8 // 2), 2 * (i8 % 2)
            parts, _m = _B_SUBTYPES[subs[i8]]
            for s_i, (ro, co, h4, w4) in enumerate(parts):
                r0, m0 = derived[0].get((i8, s_i), (-1, (0, 0)))
                r1, m1 = derived[1].get((i8, s_i), (-1, (0, 0)))
                _mc_part_b(
                    ctx, l0, l1, mb_idx, base_r + ro, base_c + co,
                    h4, w4, r0, m0, r1, m1,
                )
    if es is not None:
        es.residual(ctx, pps, mb_idx)
    else:
        _inter_residual(r, ctx, pps, mb_idx)


# ---------------------------------------------------------------------------
# In-loop deblocking filter (r12) — spec §8.7.  Until now any stream
# that did not explicitly disable the filter was rejected (a
# filter-less decode of a filtered stream is quietly wrong); this
# section implements it: per-MB boundary-strength derivation
# (§8.7.2.1), the α/β edge-activity thresholds and tc0 clipping table
# (§8.7.2.2, Tables 8-16/8-17, transcribed from the public spec with
# monotonicity anchors pinned in tests), the normal (bS<4) and strong
# (bS=4) luma filters and the chroma filters (§8.7.2.3/.4), applied
# macroblock-by-macroblock in raster order, vertical edges then
# horizontal, AFTER the picture is fully reconstructed (intra
# prediction correctly reads unfiltered neighbors).  The filtered
# picture is both the output and the inter reference, matching §8.4.
# disable_deblocking_filter_idc 0/1/2 and the slice-level alpha/beta
# offsets are honored; I_PCM macroblocks filter with QPY = 0.
# ---------------------------------------------------------------------------

# Table 8-16: alpha and beta as a function of indexA / indexB
_DB_ALPHA = np.array(
    [0] * 16
    + [4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
       32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144,
       162, 182, 203, 226, 255, 255],
    np.int32,
)
_DB_BETA = np.array(
    [0] * 16
    + [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
       9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15,
       16, 16, 17, 17, 18, 18],
    np.int32,
)
# Table 8-17: tc0 as a function of indexA and bS (columns bS 1, 2, 3)
_DB_TC0 = np.array(
    [[0, 0, 0]] * 17
    + [
        [0, 0, 1], [0, 0, 1], [0, 0, 1], [0, 0, 1],
        [0, 1, 1], [0, 1, 1], [1, 1, 1], [1, 1, 1],
        [1, 1, 1], [1, 1, 1], [1, 1, 2], [1, 1, 2],
        [1, 1, 2], [1, 1, 2], [1, 2, 3], [1, 2, 3],
        [2, 2, 3], [2, 2, 4], [2, 3, 4], [2, 3, 4],
        [3, 3, 5], [3, 4, 6], [3, 4, 6], [4, 5, 7],
        [4, 5, 8], [5, 6, 9], [6, 7, 10], [6, 8, 11],
        [7, 9, 13], [8, 10, 14], [9, 12, 16], [10, 13, 18],
        [11, 15, 20], [13, 17, 23], [14, 19, 25],
    ],
    np.int32,
)


def _block_preds(ctx: _PicCtx, r, c):
    """[(ref picture serial, (mvx, mvy))] for each list the inter
    block at (r, c) predicts from (deblock bS inputs, §8.7.2.1)."""
    preds = []
    for refs, mvs, li in (
        (ctx.ref, ctx.mv, 0), (ctx.ref1, ctx.mv1, 1)
    ):
        if int(refs[r, c]) >= 0:
            preds.append(
                (
                    int(ctx.refpic[r, c, li]),
                    (int(mvs[r, c, 0]), int(mvs[r, c, 1])),
                )
            )
    return preds


def _mv_far(a, b) -> bool:
    return abs(a[0] - b[0]) >= 4 or abs(a[1] - b[1]) >= 4


def _edge_bs(ctx: _PicCtx, rp, cp, rq, cq, mb_edge: bool) -> int:
    """Boundary strength between luma 4x4 blocks p=(rp,cp), q=(rq,cq)
    (spec §8.7.2.1, frame coding).  Reference pictures are compared
    by IDENTITY (decode-order serial) regardless of which list or
    index reaches them, per the spec note under §8.7.2.1."""
    intra_p = ctx.ref[rp, cp] == -1 and ctx.ref1[rp, cp] < 0
    intra_q = ctx.ref[rq, cq] == -1 and ctx.ref1[rq, cq] < 0
    if intra_p or intra_q:
        return 4 if mb_edge else 3
    if ctx.nc_y[rp, cp] > 0 or ctx.nc_y[rq, cq] > 0:
        return 2
    p_preds = _block_preds(ctx, rp, cp)
    q_preds = _block_preds(ctx, rq, cq)
    if len(p_preds) != len(q_preds):  # different number of MVs
        return 1
    if sorted(p[0] for p in p_preds) != sorted(q[0] for q in q_preds):
        return 1  # different reference pictures
    if len(p_preds) == 1:
        return 1 if _mv_far(p_preds[0][1], q_preds[0][1]) else 0
    (pa_pic, pa), (pb_pic, pb) = p_preds
    (qa_pic, qa), (qb_pic, qb) = q_preds
    if pa_pic != pb_pic:
        # two distinct pictures: pair MVs by picture
        if qa_pic != pa_pic:
            qa, qb = qb, qa
        return 1 if (_mv_far(pa, qa) or _mv_far(pb, qb)) else 0
    # both predictions from the SAME picture: bS 0 if EITHER pairing
    # keeps every component difference < 4 (spec §8.7.2.1 last clause)
    straight = not (_mv_far(pa, qa) or _mv_far(pb, qb))
    crossed = not (_mv_far(pa, qb) or _mv_far(pb, qa))
    return 0 if (straight or crossed) else 1


def _filter_edge_luma(p, q, bs, ia, ib):
    """Filter one luma edge: p/q are (4, N) sample stacks ordered
    p0..p3 / q0..q3 away from the edge; bs is the per-sample boundary
    strength; ia/ib the per-sample indexA/indexB.  Returns the new
    (p0, p1, p2, q0, q1, q2) int32 rows (spec §8.7.2.3/.4)."""
    p0, p1, p2, p3 = (p[i].astype(np.int32) for i in range(4))
    q0, q1, q2, q3 = (q[i].astype(np.int32) for i in range(4))
    alpha = _DB_ALPHA[ia]
    beta = _DB_BETA[ib]
    filt = (
        (bs > 0)
        & (np.abs(p0 - q0) < alpha)
        & (np.abs(p1 - p0) < beta)
        & (np.abs(q1 - q0) < beta)
    )
    ap = np.abs(p2 - p0) < beta
    aq = np.abs(q2 - q0) < beta
    # normal filter (bS < 4)
    tc0 = _DB_TC0[ia, np.clip(bs, 1, 3) - 1]
    tc = tc0 + ap.astype(np.int32) + aq.astype(np.int32)
    delta = np.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
    n_p0 = np.clip(p0 + delta, 0, 255)
    n_q0 = np.clip(q0 - delta, 0, 255)
    n_p1 = p1 + np.clip(
        (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1, -tc0, tc0
    )
    n_q1 = q1 + np.clip(
        (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1, -tc0, tc0
    )
    n_p1 = np.where(ap, n_p1, p1)
    n_q1 = np.where(aq, n_q1, q1)
    # strong filter (bS == 4)
    small = np.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp = ap & small
    sq = aq & small
    s_p0 = np.where(
        sp,
        (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
        (2 * p1 + p0 + q1 + 2) >> 2,
    )
    s_p1 = np.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    s_p2 = np.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    s_q0 = np.where(
        sq,
        (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
        (2 * q1 + q0 + p1 + 2) >> 2,
    )
    s_q1 = np.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    s_q2 = np.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
    strong = bs == 4
    out_p0 = np.where(filt, np.where(strong, s_p0, n_p0), p0)
    out_p1 = np.where(filt, np.where(strong, s_p1, n_p1), p1)
    out_p2 = np.where(filt, np.where(strong, s_p2, p2), p2)
    out_q0 = np.where(filt, np.where(strong, s_q0, n_q0), q0)
    out_q1 = np.where(filt, np.where(strong, s_q1, n_q1), q1)
    out_q2 = np.where(filt, np.where(strong, s_q2, q2), q2)
    return out_p0, out_p1, out_p2, out_q0, out_q1, out_q2


def _filter_edge_chroma(p, q, bs, ia, ib):
    """Filter one chroma edge: p/q are (2, N) stacks p0..p1 / q0..q1;
    only p0/q0 are modified (spec §8.7.2.3/.4, chroma)."""
    p0, p1 = (p[i].astype(np.int32) for i in range(2))
    q0, q1 = (q[i].astype(np.int32) for i in range(2))
    alpha = _DB_ALPHA[ia]
    beta = _DB_BETA[ib]
    filt = (
        (bs > 0)
        & (np.abs(p0 - q0) < alpha)
        & (np.abs(p1 - p0) < beta)
        & (np.abs(q1 - q0) < beta)
    )
    tc = _DB_TC0[ia, np.clip(bs, 1, 3) - 1] + 1
    delta = np.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
    n_p0 = np.clip(p0 + delta, 0, 255)
    n_q0 = np.clip(q0 - delta, 0, 255)
    s_p0 = (2 * p1 + p0 + q1 + 2) >> 2
    s_q0 = (2 * q1 + q0 + p1 + 2) >> 2
    strong = bs == 4
    out_p0 = np.where(filt, np.where(strong, s_p0, n_p0), p0)
    out_q0 = np.where(filt, np.where(strong, s_q0, n_q0), q0)
    return out_p0, out_q0


def _deblock_picture(ctx: _PicCtx, chroma_qp_offset: int) -> None:
    """Apply §8.7 in place to the picture planes, macroblock by
    macroblock in raster order (vertical edges left→right, then
    horizontal top→bottom), honoring each MB's slice filter params."""
    if ctx.has_8x8 and not np.all(ctx.db_idc == 1):
        # 8x8-transform MBs change the §8.7 edge set (no interior 4x4
        # edges inside an 8x8 block) — honest seam rather than a
        # silently wrong filter; streams encoded with
        # disable_deblocking_filter_idc = 1 decode fully
        raise UnsupportedMediaError(
            "h264: deblocking with 8x8-transform macroblocks needs "
            "the optional codec library (av)"
        )
    if np.all(ctx.db_idc == 1):
        return
    n_mbs = ctx.mb_w * ctx.mb_h
    for mb in range(n_mbs):
        idc = int(ctx.db_idc[mb])
        if idc == 1:
            continue
        my, mx = divmod(mb, ctx.mb_w)
        br, bc = my * 4, mx * 4
        aoff, boff = int(ctx.db_aoff[mb]), int(ctx.db_boff[mb])
        qp_q = int(ctx.mb_qp[mb])

        def edge_params(nb_mb):
            """(bs_fn qp pair, skip) for an edge against MB nb_mb."""
            if nb_mb == mb:
                return qp_q, False
            if idc == 2 and ctx.mb_slice[nb_mb] != ctx.mb_slice[mb]:
                return 0, True
            return int(ctx.mb_qp[nb_mb]), False

        for vert in (True, False):
            for e in range(4):
                if e == 0:
                    if (mx if vert else my) == 0:
                        continue
                    nb_mb = mb - 1 if vert else mb - ctx.mb_w
                    qp_p, skip = edge_params(nb_mb)
                    if skip:
                        continue
                    mb_edge = True
                else:
                    qp_p, mb_edge = qp_q, False
                # luma edge at 4x4-block column/row offset e
                bs = np.empty(16, np.int32)
                for g in range(4):
                    if vert:
                        rp, cp = br + g, bc + e - 1
                        rq, cq = br + g, bc + e
                    else:
                        rp, cp = br + e - 1, bc + g
                        rq, cq = br + e, bc + g
                    bs[g * 4 : g * 4 + 4] = _edge_bs(
                        ctx, rp, cp, rq, cq, mb_edge
                    )
                if not bs.any():
                    continue
                qpav = (qp_p + qp_q + 1) >> 1
                ia = np.full(16, min(51, max(0, qpav + aoff)), np.int32)
                ib = np.full(16, min(51, max(0, qpav + boff)), np.int32)
                y0, x0 = my * 16, mx * 16
                if vert:
                    x = x0 + e * 4
                    rows = slice(y0, y0 + 16)
                    pstk = np.stack(
                        [ctx.y[rows, x - 1 - k] for k in range(4)]
                    )
                    qstk = np.stack(
                        [ctx.y[rows, x + k] for k in range(4)]
                    )
                else:
                    yy = y0 + e * 4
                    cols = slice(x0, x0 + 16)
                    pstk = np.stack(
                        [ctx.y[yy - 1 - k, cols] for k in range(4)]
                    )
                    qstk = np.stack(
                        [ctx.y[yy + k, cols] for k in range(4)]
                    )
                op0, op1, op2, oq0, oq1, oq2 = _filter_edge_luma(
                    pstk, qstk, bs, ia, ib
                )
                if vert:
                    ctx.y[rows, x - 1] = op0
                    ctx.y[rows, x - 2] = op1
                    ctx.y[rows, x - 3] = op2
                    ctx.y[rows, x] = oq0
                    ctx.y[rows, x + 1] = oq1
                    ctx.y[rows, x + 2] = oq2
                else:
                    ctx.y[yy - 1, cols] = op0
                    ctx.y[yy - 2, cols] = op1
                    ctx.y[yy - 3, cols] = op2
                    ctx.y[yy, cols] = oq0
                    ctx.y[yy + 1, cols] = oq1
                    ctx.y[yy + 2, cols] = oq2
                # chroma edge rides the even luma edges (4:2:0)
                if ctx.u is None or e % 2:
                    continue
                qpc_p = _chroma_qp(qp_p, chroma_qp_offset)
                qpc_q = _chroma_qp(qp_q, chroma_qp_offset)
                qpcav = (qpc_p + qpc_q + 1) >> 1
                cia = np.full(8, min(51, max(0, qpcav + aoff)), np.int32)
                cib = np.full(8, min(51, max(0, qpcav + boff)), np.int32)
                cbs = bs[::2]  # chroma sample c maps to luma 2c
                cy0, cx0 = my * 8, mx * 8
                for plane in (ctx.u, ctx.v):
                    if vert:
                        cx = cx0 + e * 2
                        crows = slice(cy0, cy0 + 8)
                        cp_ = np.stack(
                            [plane[crows, cx - 1 - k] for k in range(2)]
                        )
                        cq_ = np.stack(
                            [plane[crows, cx + k] for k in range(2)]
                        )
                        np0, nq0 = _filter_edge_chroma(
                            cp_, cq_, cbs, cia, cib
                        )
                        plane[crows, cx - 1] = np0
                        plane[crows, cx] = nq0
                    else:
                        cyy = cy0 + e * 2
                        ccols = slice(cx0, cx0 + 8)
                        cp_ = np.stack(
                            [plane[cyy - 1 - k, ccols] for k in range(2)]
                        )
                        cq_ = np.stack(
                            [plane[cyy + k, ccols] for k in range(2)]
                        )
                        np0, nq0 = _filter_edge_chroma(
                            cp_, cq_, cbs, cia, cib
                        )
                        plane[cyy - 1, ccols] = np0
                        plane[cyy, ccols] = nq0


def decode_h264(payload: bytes):
    """Annex-B H.264 → (width, height, [(Y, U, V)]) for the implemented
    subset — I_PCM (CAVLC and CABAC), CAVLC intra, CABAC intra,
    P-slice inter, deblocked, B-slice bi-predicted, CABAC P/B
    (r14), and weighted-prediction streams
    CAVLC intra-8x8 (r14 continuation, derived dequant — module
    docstring), and raises UnsupportedMediaError naming
    the optional extra past the seam (ref-list modification/MMCO,
    fields, CABAC 8x8, deblocked 8x8 pictures, POC type 1 B
    streams).  Frames are returned in
    DISPLAY order (POC-sorted within each IDR GOP) — the plugin
    contract shared with a PyAV replacement."""
    sps: _SPS | None = None
    pps: _PPS | None = None
    frames: list[tuple] = []
    cur: _PicCtx | None = None  # the picture being assembled
    n_mbs = 0
    slice_serial = 0
    dpb: list[_RefPic] = []  # short-term refs, most recent first (§8.2.4)
    cur_ref_idc = 0
    cur_cqo = 0  # chroma_qp_index_offset of the picture's PPS
    cur_fn = 0  # frame_num of the picture being assembled
    pic_serial = 0  # decode-order picture identity
    # POC derivation state (§8.2.1): type 0 tracks the last REFERENCE
    # picture's msb/lsb; type 2 tracks the previous picture's
    # frame_num and FrameNumOffset
    poc_msb = poc_lsb_prev = 0
    prev_fn = prev_fn_off = 0
    # output-order state: frames sort by (GOP, PicOrderCnt) at return —
    # DISPLAY order, the same contract as the PyAV upgrade path behind
    # the decode_h264_video plugin seam (ADVICE r12: decode-order output
    # diverged from a plugin replacement on any B stream).  POC is only
    # comparable within one IDR period, so each IDR bumps the GOP key;
    # poc_type 1 streams (no B slices here) carry poc 0 and the stable
    # sort keeps their decode order, which for P/I-only IS display order.
    gop_seq = 0
    cur_gop = 0

    def flush():
        nonlocal cur
        if cur is not None:
            if cur.filled != n_mbs:
                raise UnsupportedMediaError(
                    "h264: picture ended with missing macroblocks"
                )
            if len(frames) >= MAX_FRAMES:
                raise UnsupportedMediaError("h264: frame-count guard")
            # §8.7: filter after full reconstruction; the filtered
            # picture is both the output and the inter reference
            _deblock_picture(cur, cur_cqo)
            frames.append((cur_gop, cur.poc, cur.y, cur.u, cur.v))
            if cur_ref_idc:  # sliding-window marking (§8.2.5.3)
                dpb.insert(0, _RefPic(cur, frame_num=cur_fn))
                del dpb[max(1, sps.max_num_ref_frames):]
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
            st = slice_type % 5
            if st not in (0, 1, 2):  # 0/5=P, 1/6=B, 2/7=I (table 7-6)
                raise UnsupportedMediaError(
                    "h264: SP/SI slices need the optional codec "
                    "library (av)"
                )
            is_p = st == 0
            is_b = st == 1
            if (is_p or is_b) and nal_type == 5:
                raise UnsupportedMediaError(
                    "h264: IDR pictures cannot contain P/B slices"
                )
            r.ue()  # pic_parameter_set_id
            fn = r.read(sps.log2_max_frame_num)  # frame_num
            if nal_type == 5:
                r.ue()  # idr_pic_id
            poc_lsb = 0
            if sps.poc_type == 0:
                poc_lsb = r.read(sps.log2_max_poc_lsb)
                if pps.bottom_field_poc_present:
                    r.se()
            elif sps.poc_type == 1 and not sps.delta_pic_order_always_zero:
                r.se()
                if pps.bottom_field_poc_present:
                    r.se()
            if is_b:
                if sps.poc_type == 1:
                    raise UnsupportedMediaError(
                        "h264: B slices with pic_order_cnt_type 1 "
                        "need the optional codec library (av)"
                    )
                spatial_direct = bool(r.read(1))
            num_ref = 1
            num_ref1 = 1
            if is_p or is_b:
                num_ref = pps.num_ref_l0_default
                num_ref1 = pps.num_ref_l1_default
                if r.read(1):  # num_ref_idx_active_override_flag
                    num_ref = r.ue() + 1
                    if is_b:
                        num_ref1 = r.ue() + 1
                if num_ref > 16 or num_ref1 > 16:
                    raise UnsupportedMediaError(
                        "h264: num_ref_idx_lX_active out of range"
                    )
                if r.read(1):  # ref_pic_list_modification_flag_l0
                    raise UnsupportedMediaError(
                        "h264: reference-list modification needs the "
                        "optional codec library (av)"
                    )
                if is_b and r.read(1):  # ..._flag_l1
                    raise UnsupportedMediaError(
                        "h264: reference-list modification needs the "
                        "optional codec library (av)"
                    )
            # pred_weight_table (§7.3.3.2): explicit weights for P
            # slices under weighted_pred_flag and for B slices under
            # weighted_bipred_idc == 1; idc == 2 is implicit (no table)
            wp_mode = 0
            wp_l0 = wp_l1 = None
            wp_logwd = (0, 0)
            if (is_p and pps.weighted_pred) or (
                is_b and pps.weighted_bipred_idc == 1
            ):
                wp_mode = 1
                luma_wd = r.ue()
                chroma_wd = r.ue() if not sps.monochrome else 0
                if luma_wd > 7 or chroma_wd > 7:
                    raise UnsupportedMediaError(
                        "h264: log2_weight_denom out of range"
                    )
                wp_logwd = (luma_wd, chroma_wd)

                def read_wp_list(n: int) -> list:
                    lst = []
                    for _i in range(n):
                        wy, oy = 1 << luma_wd, 0
                        wcb, ocb = 1 << chroma_wd, 0
                        wcr, ocr = 1 << chroma_wd, 0
                        if r.read(1):  # luma_weight_lX_flag
                            wy, oy = r.se(), r.se()
                        if not sps.monochrome and r.read(1):
                            wcb, ocb = r.se(), r.se()
                            wcr, ocr = r.se(), r.se()
                        # spec §7.4.3.2 bounds weights AND offsets to
                        # [-128, 127] (ADVICE r13: offsets previously
                        # clipped silently in _wp_single/_wp_bi)
                        for v in (wy, wcb, wcr, oy, ocb, ocr):
                            if not -128 <= v <= 127:
                                raise UnsupportedMediaError(
                                    "h264: weight/offset out of range"
                                )
                        lst.append((wy, oy, wcb, ocb, wcr, ocr))
                    return lst

                wp_l0 = read_wp_list(num_ref)
                if is_b:
                    wp_l1 = read_wp_list(num_ref1)
            elif is_b and pps.weighted_bipred_idc == 2:
                wp_mode = 2
            if nal_type == 5:
                r.read(2)  # no_output_of_prior_pics + long_term_reference
            elif (hdr >> 5) & 0x3:  # nal_ref_idc > 0
                if r.read(1):  # adaptive_ref_pic_marking_mode_flag
                    raise UnsupportedMediaError(
                        "h264: adaptive ref-pic marking needs the "
                        "optional codec library (av)"
                    )
            slice_qp_delta = r.se()
            db_idc, db_aoff, db_boff = 0, 0, 0
            if pps.deblocking_control_present:
                db_idc = r.ue()  # disable_deblocking_filter_idc
                if db_idc > 2:
                    raise UnsupportedMediaError(
                        "h264: invalid disable_deblocking_filter_idc"
                    )
                if db_idc != 1:
                    db_aoff = r.se() * 2  # slice_alpha_c0_offset_div2
                    db_boff = r.se() * 2  # slice_beta_offset_div2
            if first_mb == 0:
                flush()
                if nal_type == 5:  # IDR: all refs marked unused (§8.2.5.1)
                    dpb.clear()
                    poc_msb = poc_lsb_prev = 0
                    prev_fn = prev_fn_off = 0
                    gop_seq += 1
                cur_gop = gop_seq
                cur = _PicCtx(sps)
                cur_ref_idc = (hdr >> 5) & 0x3
                cur_cqo = pps.chroma_qp_index_offset
                cur_fn = fn
                pic_serial += 1
                cur.serial = pic_serial
                # PicOrderCnt (§8.2.1.1 / §8.2.1.3)
                if sps.poc_type == 0:
                    max_lsb = 1 << sps.log2_max_poc_lsb
                    if (
                        poc_lsb < poc_lsb_prev
                        and poc_lsb_prev - poc_lsb >= max_lsb // 2
                    ):
                        msb = poc_msb + max_lsb
                    elif (
                        poc_lsb > poc_lsb_prev
                        and poc_lsb - poc_lsb_prev > max_lsb // 2
                    ):
                        msb = poc_msb - max_lsb
                    else:
                        msb = poc_msb
                    cur.poc = msb + poc_lsb
                    if cur_ref_idc:  # prev state follows ref pics only
                        poc_msb, poc_lsb_prev = msb, poc_lsb
                elif sps.poc_type == 2:
                    max_fn = 1 << sps.log2_max_frame_num
                    fn_off = (
                        0 if nal_type == 5
                        else prev_fn_off + (max_fn if prev_fn > fn else 0)
                    )
                    cur.poc = 2 * (fn_off + fn) - (
                        0 if cur_ref_idc else 1
                    )
                    prev_fn, prev_fn_off = fn, fn_off
                else:  # type 1: B slices are rejected above; P/I
                    cur.poc = 0  # decode without output reordering
            if cur is None or first_mb != cur.filled:
                raise UnsupportedMediaError(
                    "h264: slices out of macroblock order"
                )
            if is_p and num_ref > len(dpb):
                raise UnsupportedMediaError(
                    "h264: P slice with no decoded reference picture"
                    if not dpb
                    else "h264: fewer decoded reference pictures than "
                         "num_ref_idx_l0_active"
                )
            bl0 = bl1 = None
            if is_b:
                if cur.u is None:
                    raise UnsupportedMediaError(
                        "h264: entropy-coded 4:0:0 macroblocks need "
                        "the optional codec library (av) — monochrome "
                        "decodes I_PCM only"
                    )
                if not dpb:
                    raise UnsupportedMediaError(
                        "h264: B slice with no decoded reference picture"
                    )
                if num_ref > len(dpb) or num_ref1 > len(dpb):
                    raise UnsupportedMediaError(
                        "h264: fewer decoded reference pictures than "
                        "num_ref_idx_lX_active"
                    )
                l0_full, l1_full = _b_default_lists(dpb, cur.poc)
                bl0, bl1 = l0_full[:num_ref], l1_full[:num_ref1]
            slice_serial += 1
            cur.qp = pps.pic_init_qp + slice_qp_delta
            if not 0 <= cur.qp <= 51:
                raise UnsupportedMediaError("h264: slice QP out of range")
            # per-slice weighted-prediction state (§8.4.2.3)
            cur.wp_mode = wp_mode
            cur.wp_l0 = wp_l0
            cur.wp_l1 = wp_l1
            cur.wp_logwd = wp_logwd
            if pps.cabac:
                _decode_cabac_slice_data(
                    r, cur, pps, first_mb, n_mbs, slice_serial,
                    (db_idc, db_aoff, db_boff),
                    slice_kind="B" if is_b else ("P" if is_p else "I"),
                    dpb=dpb, num_ref=num_ref, bl0=bl0, bl1=bl1,
                    spatial=spatial_direct if is_b else False,
                    inference=sps.direct_8x8,
                )
                continue  # next NAL
            mb = first_mb
            # more_rbsp_data (spec §7.2): data remains strictly before
            # the final 1 bit (the rbsp_stop_one_bit) — this is what
            # ends a slice that covers only part of the picture.
            stop = _rbsp_stop_bit(r.data)
            while r.pos < stop:
                if is_p or is_b:
                    run = r.ue()  # mb_skip_run (spec §7.3.4)
                    if mb + run > n_mbs:
                        raise UnsupportedMediaError(
                            "h264: mb_skip_run past the picture end"
                        )
                    if run and cur.u is None:
                        raise UnsupportedMediaError(
                            "h264: entropy-coded 4:0:0 macroblocks need "
                            "the optional codec library (av) — "
                            "monochrome decodes I_PCM only"
                        )
                    for _ in range(run):
                        cur.mb_slice[mb] = slice_serial
                        if is_b:
                            _decode_bskip(
                                cur, mb, bl0, bl1, spatial_direct,
                                sps.direct_8x8,
                            )
                        else:
                            _decode_pskip(cur, mb, dpb[0])
                        cur.mb_qp[mb] = cur.qp
                        cur.db_idc[mb] = db_idc
                        cur.db_aoff[mb] = db_aoff
                        cur.db_boff[mb] = db_boff
                        mb += 1
                    cur.filled = mb
                    if r.pos >= stop:
                        break
                if mb >= n_mbs:
                    raise UnsupportedMediaError(
                        "h264: more macroblocks than the picture holds"
                    )
                cur.mb_slice[mb] = slice_serial
                cur.db_idc[mb] = db_idc
                cur.db_aoff[mb] = db_aoff
                cur.db_boff[mb] = db_boff
                my, mx = divmod(mb, sps.mb_width)
                mb_type = r.ue()
                if is_p:
                    if mb_type <= 4:  # P_L0_16x16/16x8/8x16/P_8x8(ref0)
                        _decode_inter_mb(
                            r, cur, pps, mb, mb_type, dpb, num_ref
                        )
                        cur.mb_qp[mb] = cur.qp
                        mb += 1
                        cur.filled = mb
                        continue
                    mb_type -= 5  # intra-in-P (spec table 7-13)
                elif is_b:
                    if mb_type <= 22:  # Table 7-14 inter B types
                        _decode_b_mb(
                            r, cur, pps, mb, mb_type, bl0, bl1,
                            spatial_direct, sps.direct_8x8,
                        )
                        cur.mb_qp[mb] = cur.qp
                        mb += 1
                        cur.filled = mb
                        continue
                    mb_type -= 23  # intra-in-B (spec table 7-14)
                if mb_type > _IPCM_MB_TYPE:
                    raise UnsupportedMediaError(
                        "h264: invalid macroblock type"
                    )
                if mb_type == _IPCM_MB_TYPE:
                    r.align()  # pcm_alignment_zero_bit
                    luma = np.frombuffer(r.bytes_at(256), np.uint8)
                    cur.y[my * 16 : my * 16 + 16,
                          mx * 16 : mx * 16 + 16] = luma.reshape(16, 16)
                    if cur.u is not None:  # 4:2:0; 4:0:0 has no chroma
                        cb = np.frombuffer(r.bytes_at(64), np.uint8)
                        cr = np.frombuffer(r.bytes_at(64), np.uint8)
                        cur.u[my * 8 : my * 8 + 8,
                              mx * 8 : mx * 8 + 8] = cb.reshape(8, 8)
                        cur.v[my * 8 : my * 8 + 8,
                              mx * 8 : mx * 8 + 8] = cr.reshape(8, 8)
                        cur.nc_c[0][my * 2 : my * 2 + 2,
                                    mx * 2 : mx * 2 + 2] = 16
                        cur.nc_c[1][my * 2 : my * 2 + 2,
                                    mx * 2 : mx * 2 + 2] = 16
                    # I_PCM: nN = 16 for nC, DC for mode prediction
                    cur.nc_y[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = 16
                    cur.mode4[my * 4 : my * 4 + 4,
                              mx * 4 : mx * 4 + 4] = 2
                    cur.ref[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = -1
                    cur.ref1[my * 4 : my * 4 + 4,
                             mx * 4 : mx * 4 + 4] = -1
                    cur.mb_qp[mb] = 0  # QPY of I_PCM is 0 (§7.4.5)
                else:
                    _decode_intra_mb(r, cur, pps, mb, mb_type)
                    cur.mb_qp[mb] = cur.qp
                mb += 1
                cur.filled = mb
        # SEI (6), AUD (9), filler (12), end-of-seq/stream, unknown:
        # skipped — none carry sample data.
    flush()
    if sps is None or not frames:
        raise UnsupportedMediaError("h264: no decodable pictures")
    w = sps.mb_width * 16 - sps.crop_left - sps.crop_right
    h = sps.mb_height * 16 - sps.crop_top - sps.crop_bottom
    if w <= 0 or h <= 0:
        raise UnsupportedMediaError("h264: cropping removes every sample")
    # display order: (GOP, POC), stable — see the gop_seq note above
    frames.sort(key=lambda f: (f[0], f[1]))
    out = []
    for _gop, _poc, y_pl, u_pl, v_pl in frames:
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


# Historical name (the function long outgrew its I_PCM-only first
# round): kept as an alias so the plugin registry and external callers
# that bound the old name keep working (VERDICT r13 hygiene item).
decode_h264_ipcm = decode_h264


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


# ---------------------------------------------------------------------------
# CAVLC intra encoder (r11) — fixtures + the driver row's round-trip
# oracle.  Real forward transform + quantisation (reference MF matrix),
# real CAVLC serialization through the same tables the decoder reads,
# and a reconstruction loop that CALLS the decoder's dequant/IDCT
# helpers — so by construction decode(encode(x)) equals the encoder's
# own reconstruction bit-for-bit, which is what the tests and the
# h264_cavlc_decode_stats oracle pin.
# ---------------------------------------------------------------------------


def _ftransform4x4(x: np.ndarray) -> np.ndarray:
    """Forward core transform (spec §8.5 inverse's exact adjoint).
    Plain-int butterflies for the same reason as _itransform4x4; fully
    unrolled (r15) like it."""
    r0, r1, r2, r3 = np.asarray(x).tolist()
    a0, a1, a2, a3 = r0
    b0, b1, b2, b3 = r1
    c0, c1, c2, c3 = r2
    d0, d1, d2, d3 = r3
    e0, e1, e2, e3 = a0 + a3, a1 + a2, a1 - a2, a0 - a3
    a0, a1, a2, a3 = e0 + e1, (e3 << 1) + e2, e0 - e1, e3 - (e2 << 1)
    e0, e1, e2, e3 = b0 + b3, b1 + b2, b1 - b2, b0 - b3
    b0, b1, b2, b3 = e0 + e1, (e3 << 1) + e2, e0 - e1, e3 - (e2 << 1)
    e0, e1, e2, e3 = c0 + c3, c1 + c2, c1 - c2, c0 - c3
    c0, c1, c2, c3 = e0 + e1, (e3 << 1) + e2, e0 - e1, e3 - (e2 << 1)
    e0, e1, e2, e3 = d0 + d3, d1 + d2, d1 - d2, d0 - d3
    d0, d1, d2, d3 = e0 + e1, (e3 << 1) + e2, e0 - e1, e3 - (e2 << 1)
    out = [[0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]]
    o0, o1, o2, o3 = out
    e0, e1, e2, e3 = a0 + d0, b0 + c0, b0 - c0, a0 - d0
    o0[0] = e0 + e1
    o1[0] = (e3 << 1) + e2
    o2[0] = e0 - e1
    o3[0] = e3 - (e2 << 1)
    e0, e1, e2, e3 = a1 + d1, b1 + c1, b1 - c1, a1 - d1
    o0[1] = e0 + e1
    o1[1] = (e3 << 1) + e2
    o2[1] = e0 - e1
    o3[1] = e3 - (e2 << 1)
    e0, e1, e2, e3 = a2 + d2, b2 + c2, b2 - c2, a2 - d2
    o0[2] = e0 + e1
    o1[2] = (e3 << 1) + e2
    o2[2] = e0 - e1
    o3[2] = e3 - (e2 << 1)
    e0, e1, e2, e3 = a3 + d3, b3 + c3, b3 - c3, a3 - d3
    o0[3] = e0 + e1
    o1[3] = (e3 << 1) + e2
    o2[3] = e0 - e1
    o3[3] = e3 - (e2 << 1)
    return out


def _quant_coeff(c: int, qp: int, pos: int, dc: bool = False) -> int:
    mf = _QUANT_MF[qp % 6][pos]
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3  # intra rounding
    if dc:
        lvl = (abs(c) * mf + 2 * f) >> (qbits + 1)
    else:
        lvl = (abs(c) * mf + f) >> qbits
    return -lvl if c < 0 else lvl


def _quant_block(w4: np.ndarray, qp: int, skip_dc: bool) -> list[int]:
    """Forward-transformed 4x4 -> scan-order quantized levels.
    Inlines :func:`_quant_coeff` (non-DC form) over a one-shot tolist()
    — the per-coefficient call + ndarray scalar reads were ~13% of the
    encode profile (r15 kernel pass); arithmetic unchanged."""
    rows = w4.tolist() if isinstance(w4, np.ndarray) else w4
    mf3 = _QUANT_MF[qp % 6]
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3  # intra rounding
    first = 1 if skip_dc else 0
    out = []
    for s in range(first, 16):
        i, j, pc = _ZZ_POSCLS[s]
        c = rows[i][j]
        if c < 0:
            out.append(-(((-c) * mf3[pc] + f) >> qbits))
        else:
            out.append((c * mf3[pc] + f) >> qbits)
    return out


def encode_h264_cavlc(frames, width: int, height: int, qp: int = 28) -> bytes:
    """Annex-B entropy-coded intra encoder (4:2:0): a deterministic mix
    of I_NxN (all nine 4x4 prediction modes, availability-gated),
    I_16x16 (V/H/DC/Plane) and the occasional I_PCM macroblock, one I
    slice per IDR picture.  Returns the bitstream; the lossy
    reconstruction the decoder must reproduce exactly is available via
    :func:`encode_h264_cavlc_recon`."""
    stream, _ = encode_h264_cavlc_recon(frames, width, height, qp)
    return stream


def encode_h264_cavlc_recon(
    frames, width: int, height: int, qp: int = 28,
    t8_every: int = 0,
):
    """-> (annexb_bytes, [(Y, U, V) reconstructed planes, cropped]).
    ``t8_every`` = N codes every Nth I_NxN-eligible macroblock with
    the 8x8 transform (High-profile SPS/PPS emitted; deblocking stays
    disabled in this encoder, so the 8x8 deblock seam never trips)."""
    if width % 2 or height % 2:
        raise UnsupportedMediaError("h264 encoder: dimensions must be even")
    if not 8 <= qp <= 44:
        # stays far inside the 12-bit level-escape range at either end
        raise UnsupportedMediaError("h264 encoder: qp out of supported range")
    mb_w = -(-width // 16)
    mb_h = -(-height // 16)
    crop_right = mb_w * 16 - width
    crop_bottom = mb_h * 16 - height

    w = _BitWriter()
    w.write(100 if t8_every else 66, 8)  # profile: high iff 8x8 MBs
    w.write(0xC0 if not t8_every else 0x00, 8)
    w.write(30, 8)  # level_idc
    w.ue(0)  # seq_parameter_set_id
    if t8_every:
        w.ue(1)  # chroma_format_idc 4:2:0
        w.ue(0)  # bit_depth_luma_minus8
        w.ue(0)  # bit_depth_chroma_minus8
        w.write(0, 1)  # qpprime_y_zero_transform_bypass_flag
        w.write(0, 1)  # seq_scaling_matrix_present_flag
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type
    w.ue(0)  # max_num_ref_frames
    w.write(0, 1)
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.write(1, 1)  # frame_mbs_only_flag
    w.write(1, 1)  # direct_8x8_inference_flag
    if crop_right or crop_bottom:
        w.write(1, 1)
        w.ue(0)
        w.ue(crop_right // 2)
        w.ue(0)
        w.ue(crop_bottom // 2)
    else:
        w.write(0, 1)
    w.write(0, 1)  # vui_parameters_present_flag
    w.trailing_bits()
    out = bytearray(_nal(3, 7, w.getvalue()))

    w = _BitWriter()
    w.ue(0)
    w.ue(0)
    w.write(0, 1)  # CAVLC
    w.write(0, 1)
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.write(0, 1)
    w.write(0, 2)
    w.se(qp - 26)  # pic_init_qp_minus26 — slice_qp_delta is then 0
    w.se(0)
    w.se(0)  # chroma_qp_index_offset = 0
    w.write(1, 1)  # deblocking_filter_control_present_flag
    w.write(0, 1)
    w.write(0, 1)
    if t8_every:
        w.write(1, 1)  # transform_8x8_mode_flag
        w.write(0, 1)  # pic_scaling_matrix_present_flag
        w.se(0)  # second_chroma_qp_index_offset
    w.trailing_bits()
    out += _nal(3, 8, w.getvalue())

    sps = _SPS()
    sps.mb_width, sps.mb_height = mb_w, mb_h
    sps.monochrome = False
    qpc = _chroma_qp(qp, 0)
    recons = []
    n_mbs = mb_w * mb_h
    for f_idx, (y, u, v) in enumerate(frames):
        y_pad = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
        y_pad[:height, :width] = np.asarray(y, np.uint8)
        u_pad = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
        v_pad = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
        u_pad[: height // 2, : width // 2] = np.asarray(u, np.uint8)
        v_pad[: height // 2, : width // 2] = np.asarray(v, np.uint8)

        ctx = _PicCtx(sps)
        ctx.mb_slice[:] = 1  # one slice per picture
        ctx.qp = qp
        w = _BitWriter()
        w.ue(0)  # first_mb_in_slice
        w.ue(7)  # slice_type: I
        w.ue(0)  # pic_parameter_set_id
        w.write(0, 4)  # frame_num
        w.ue(f_idx % 16)  # idr_pic_id
        w.write(0, 2)
        w.se(0)  # slice_qp_delta
        w.ue(1)  # disable_deblocking_filter_idc
        for mb in range(n_mbs):
            _encode_one_mb(
                w, ctx, mb, f_idx, qp, qpc, y_pad, u_pad, v_pad,
                t8=bool(t8_every) and (mb + f_idx) % t8_every == 0,
                t8_mode=bool(t8_every),
            )
        w.trailing_bits()
        out += _nal(3, 5, w.getvalue())
        recons.append(
            (
                ctx.y[:height, :width].copy(),
                ctx.u[: height // 2, : width // 2].copy(),
                ctx.v[: height // 2, : width // 2].copy(),
            )
        )
    return bytes(out), recons


def _encode_one_mb(w, ctx, mb, f_idx, qp, qpc, y_pad, u_pad, v_pad,
                   mb_type_offset=0, t8=False, t8_mode=False):
    """One intra macroblock; ``mb_type_offset`` = 5 when emitting into
    a P slice (spec table 7-13 intra-in-P numbering)."""
    my, mx = divmod(mb, ctx.mb_w)
    br, bc = my * 4, mx * 4
    crow, ccol = my * 2, mx * 2
    y0, x0 = my * 16, mx * 16
    cy0, cx0 = my * 8, mx * 8
    ctx.ref[br : br + 4, bc : bc + 4] = -1
    ctx.ref1[br : br + 4, bc : bc + 4] = -1
    kind = (mb * 5 + f_idx) % 7  # deterministic MB-type mix

    ctx.mb_qp[mb] = qp
    if kind == 6:  # occasional I_PCM (exercises the nN=16 nC neighbors)
        ctx.mb_qp[mb] = 0  # QPY of I_PCM is 0 (§7.4.5)
        w.ue(_IPCM_MB_TYPE + mb_type_offset)
        w.align_zero()
        w.write_bytes(y_pad[y0 : y0 + 16, x0 : x0 + 16].tobytes())
        w.write_bytes(u_pad[cy0 : cy0 + 8, cx0 : cx0 + 8].tobytes())
        w.write_bytes(v_pad[cy0 : cy0 + 8, cx0 : cx0 + 8].tobytes())
        ctx.y[y0 : y0 + 16, x0 : x0 + 16] = y_pad[y0 : y0 + 16, x0 : x0 + 16]
        ctx.u[cy0 : cy0 + 8, cx0 : cx0 + 8] = u_pad[cy0 : cy0 + 8, cx0 : cx0 + 8]
        ctx.v[cy0 : cy0 + 8, cx0 : cx0 + 8] = v_pad[cy0 : cy0 + 8, cx0 : cx0 + 8]
        ctx.nc_y[br : br + 4, bc : bc + 4] = 16
        ctx.nc_c[0][crow : crow + 2, ccol : ccol + 2] = 16
        ctx.nc_c[1][crow : crow + 2, ccol : ccol + 2] = 16
        ctx.mode4[br : br + 4, bc : bc + 4] = 2
        return

    a_l_mb = ctx._blk_avail(ctx.nc_y, br, bc - 1, mb, 4)
    a_t_mb = ctx._blk_avail(ctx.nc_y, br - 1, bc, mb, 4)

    # ---- chroma decisions first (cbp needs them for I_NxN's me(v))
    ca_l = ctx._blk_avail(ctx.nc_c[0], crow, ccol - 1, mb, 2)
    ca_t = ctx._blk_avail(ctx.nc_c[0], crow - 1, ccol, mb, 2)
    cmodes = [0] + ([1] if ca_l else []) + ([2] if ca_t else []) + (
        [3] if ca_l and ca_t else []
    )
    chroma_mode = cmodes[(mb * 3 + f_idx) % len(cmodes)]
    cpreds, cdcq, cacq = [], [], []
    any_cdc = any_cac = False
    for plane_src, plane_rec in ((u_pad, ctx.u), (v_pad, ctx.v)):
        if chroma_mode == 0:
            predc = _pred_chroma_dc(plane_rec, cy0, cx0, ca_l, ca_t)
        elif chroma_mode == 3:
            predc = _pred_block16(plane_rec, cy0, cx0, 3, ca_l, ca_t, 8)
        else:
            predc = _pred_block16(
                plane_rec, cy0, cx0, 1 if chroma_mode == 1 else 0,
                ca_l, ca_t, 8,
            )
        resid = (
            plane_src[cy0 : cy0 + 8, cx0 : cx0 + 8].astype(np.int64) - predc
        )
        wmats = []
        dcs = np.zeros((2, 2), np.int64)
        for blk in range(4):
            cdy, cdx = divmod(blk, 2)
            w4 = _ftransform4x4(
                resid[cdy * 4 : cdy * 4 + 4, cdx * 4 : cdx * 4 + 4]
            )
            dcs[cdy, cdx] = w4[0][0]
            wmats.append(w4)
        hdc = _hadamard2x2(dcs)
        dq = [
            _quant_coeff(int(hdc[i, j]), qpc, 0, dc=True)
            for i, j in ((0, 0), (0, 1), (1, 0), (1, 1))
        ]
        aq = [_quant_block(w4, qpc, skip_dc=True) for w4 in wmats]
        any_cdc |= any(c != 0 for c in dq)
        any_cac |= any(c != 0 for blkq in aq for c in blkq)
        cpreds.append(predc)
        cdcq.append(dq)
        cacq.append(aq)
    cbp_chroma = 2 if any_cac else (1 if any_cdc else 0)

    i16 = kind >= 4 and not t8
    if t8 and kind != 6:
        # ---- I_NxN with the 8x8 transform: per-8x8 mode choice +
        # derived forward transform/quant + recon via the decoder's
        # exact inverse helpers
        ctx.has_8x8 = True
        modes8, qlists, sub_tcs = [], [], []
        cbp_luma = 0
        for blk8 in range(4):
            q8r, q8c = (blk8 // 2) * 2, (blk8 % 2) * 2
            rb, cb_ = br + q8r, bc + q8c
            a_l = ctx._blk_avail(ctx.nc_y, rb, cb_ - 1, mb, 4)
            a_t = ctx._blk_avail(ctx.nc_y, rb - 1, cb_, mb, 4)
            a_tl = ctx._blk_avail(ctx.nc_y, rb - 1, cb_ - 1, mb, 4)
            a_tr = ctx._blk_avail(ctx.nc_y, rb - 1, cb_ + 2, mb, 4)
            cands = [2]
            if a_t:
                cands += [0, 3, 7]
            if a_l:
                cands += [1, 8]
            if a_l and a_t and a_tl:
                cands += [4, 5, 6]
            mode = cands[(mb * 7 + blk8 * 5 + f_idx) % len(cands)]
            modes8.append(mode)
            ctx.mode4[rb : rb + 2, cb_ : cb_ + 2] = mode
            py, px = rb * 4, cb_ * 4
            pred = _pred8x8(ctx.y, py, px, mode, a_l, a_t, a_tl, a_tr)
            resid = (
                y_pad[py : py + 8, px : px + 8].astype(np.int64) - pred
            )
            coeffs64 = _quant8x8(_ftransform8x8(resid), qp)
            if any(c != 0 for c in coeffs64):
                cbp_luma |= 1 << blk8
                res = _itransform8x8(_dequant8x8(coeffs64, qp))
            else:
                res = 0
            ctx.y[py : py + 8, px : px + 8] = _clip_u8(pred + res)
            ctx.nc_y[rb : rb + 2, cb_ : cb_ + 2] = 0  # marks decoded
            qlists.append(coeffs64)
        cbp = cbp_luma | (cbp_chroma << 4)
        w.ue(mb_type_offset)  # mb_type I_NxN
        w.write(1, 1)  # transform_size_8x8_flag
        for blk8 in range(4):
            q8r, q8c = (blk8 // 2) * 2, (blk8 % 2) * 2
            pred_mode = ctx.pred_mode4(br + q8r, bc + q8c, mb)
            mode = modes8[blk8]
            if mode == pred_mode:
                w.write(1, 1)
            else:
                w.write(0, 1)
                w.write(mode if mode < pred_mode else mode - 1, 3)
        w.ue(chroma_mode)
        w.ue(_CBP_INTRA_INV[cbp])
        if cbp:
            w.se(0)  # mb_qp_delta
        for blk8 in range(4):
            if cbp_luma & (1 << blk8):
                coeffs64 = qlists[blk8]
                for part in range(4):
                    dy, dx = _BLK4_ORDER[blk8 * 4 + part]
                    rb, cb_ = br + dy, bc + dx
                    sub = [coeffs64[4 * i + part] for i in range(16)]
                    nc = ctx.luma_nc(rb, cb_, mb)
                    tc = _encode_residual(w, nc, sub)
                    ctx.nc_y[rb, cb_] = tc
            else:
                for part in range(4):
                    dy, dx = _BLK4_ORDER[blk8 * 4 + part]
                    ctx.nc_y[br + dy, bc + dx] = 0
        _emit_intra_chroma(
            w, ctx, mb, cbp_chroma, cdcq, cacq, cpreds, qpc,
            crow, ccol, cy0, cx0,
        )
        return
    if not i16:
        # ---- I_NxN: per-block mode choice + transform/quant + recon
        modes, lcoeffs = [], []
        for blk in range(16):
            dy, dx = _BLK4_ORDER[blk]
            rb, cb_ = br + dy, bc + dx
            a_l = ctx._blk_avail(ctx.nc_y, rb, cb_ - 1, mb, 4)
            a_t = ctx._blk_avail(ctx.nc_y, rb - 1, cb_, mb, 4)
            a_tl = ctx._blk_avail(ctx.nc_y, rb - 1, cb_ - 1, mb, 4)
            a_tr = ctx._blk_avail(ctx.nc_y, rb - 1, cb_ + 1, mb, 4)
            cands = [2]
            if a_t:
                cands += [0, 3, 7]
            if a_l:
                cands += [1, 8]
            if a_l and a_t and a_tl:
                cands += [4, 5, 6]
            mode = cands[(mb * 7 + blk * 3 + f_idx) % len(cands)]
            ctx.mode4[rb, cb_] = mode
            py, px = rb * 4, cb_ * 4
            pred = _pred4x4(ctx.y, py, px, mode, a_l, a_t, a_tl, a_tr)
            resid = (
                y_pad[py : py + 4, px : px + 4].astype(np.int64) - pred
            )
            coeffs = _quant_block(_ftransform4x4(resid), qp, skip_dc=False)
            res = _itransform4x4(_dequant4x4(coeffs, qp, False))
            ctx.y[py : py + 4, px : px + 4] = _clip_u8(pred + res)
            ctx.nc_y[rb, cb_] = 0  # provisional: marks decoded
            modes.append(mode)
            lcoeffs.append(coeffs)
        cbp_luma = 0
        for q in range(4):
            if any(
                c != 0 for blk in range(q * 4, q * 4 + 4)
                for c in lcoeffs[blk]
            ):
                cbp_luma |= 1 << q
        # (a quadrant bit is unset iff EVERY block in it quantized to
        # all-zero, so the per-block recon above already matches the
        # decoder's zero-residual path for uncoded quadrants)
        cbp = cbp_luma | (cbp_chroma << 4)
        # ---- emit
        w.ue(mb_type_offset)  # mb_type I_NxN
        if t8_mode:
            w.write(0, 1)  # transform_size_8x8_flag: 4x4
        for blk in range(16):
            dy, dx = _BLK4_ORDER[blk]
            rb, cb_ = br + dy, bc + dx
            pred_mode = ctx.pred_mode4(rb, cb_, mb)
            mode = modes[blk]
            if mode == pred_mode:
                w.write(1, 1)
            else:
                w.write(0, 1)
                w.write(mode if mode < pred_mode else mode - 1, 3)
        w.ue(chroma_mode)
        w.ue(_CBP_INTRA_INV[cbp])
        if cbp:
            w.se(0)  # mb_qp_delta
        for blk in range(16):
            dy, dx = _BLK4_ORDER[blk]
            rb, cb_ = br + dy, bc + dx
            if cbp_luma & (1 << (blk // 4)):
                nc = ctx.luma_nc(rb, cb_, mb)
                tc = _encode_residual(w, nc, lcoeffs[blk])
                ctx.nc_y[rb, cb_] = tc
            else:
                ctx.nc_y[rb, cb_] = 0
    else:
        # ---- I_16x16
        cands = [2]
        if a_t_mb:
            cands.append(0)
        if a_l_mb:
            cands.append(1)
        if a_l_mb and a_t_mb:
            cands.append(3)
        pred16_mode = cands[(mb + f_idx) % len(cands)]
        pred16 = _pred_block16(ctx.y, y0, x0, pred16_mode, a_l_mb, a_t_mb, 16)
        resid = y_pad[y0 : y0 + 16, x0 : x0 + 16].astype(np.int64) - pred16
        wmats, dcs = [], np.zeros((4, 4), np.int64)
        for blk in range(16):
            dy, dx = _BLK4_ORDER[blk]
            w4 = _ftransform4x4(
                resid[dy * 4 : dy * 4 + 4, dx * 4 : dx * 4 + 4]
            )
            dcs[dy, dx] = w4[0][0]
            wmats.append(w4)
        hdc = _hadamard4x4(dcs)
        dcq = [
            _quant_coeff(int(hdc[i, j]), qp, 0, dc=True) for i, j in _ZIGZAG
        ]
        acq = [_quant_block(w4, qp, skip_dc=True) for w4 in wmats]
        cbp_luma = 15 if any(c != 0 for blkq in acq for c in blkq) else 0
        mb_type = (
            1 + pred16_mode + 4 * cbp_chroma + (12 if cbp_luma else 0)
        )
        # recon exactly as the decoder will
        dmat = np.zeros((4, 4), np.int64)
        for s, c in enumerate(dcq):
            i, j = _ZIGZAG[s]
            dmat[i, j] = c
        dc = _scale_luma_dc(_hadamard4x4(dmat), qp)
        for blk in range(16):
            dy, dx = _BLK4_ORDER[blk]
            rb, cb_ = br + dy, bc + dx
            d = (
                _dequant4x4(acq[blk], qp, True)
                if cbp_luma
                else [[0, 0, 0, 0] for _ in range(4)]
            )
            d[0][0] = int(dc[dy, dx])
            res = _itransform4x4(d)
            py, px = rb * 4, cb_ * 4
            ctx.y[py : py + 4, px : px + 4] = _clip_u8(
                pred16[dy * 4 : dy * 4 + 4, dx * 4 : dx * 4 + 4] + res
            )
            ctx.nc_y[rb, cb_] = 0  # provisional
        # ---- emit
        w.ue(mb_type + mb_type_offset)
        w.ue(chroma_mode)
        w.se(0)  # mb_qp_delta (always present for I_16x16)
        tc_dc = _encode_residual(w, ctx.luma_nc(br, bc, mb), dcq)
        del tc_dc  # DC level block does not enter nC bookkeeping
        for blk in range(16):
            dy, dx = _BLK4_ORDER[blk]
            rb, cb_ = br + dy, bc + dx
            if cbp_luma:
                nc = ctx.luma_nc(rb, cb_, mb)
                ctx.nc_y[rb, cb_] = _encode_residual(w, nc, acq[blk])
            else:
                ctx.nc_y[rb, cb_] = 0
        ctx.mode4[br : br + 4, bc : bc + 4] = 2

    _emit_intra_chroma(
        w, ctx, mb, cbp_chroma, cdcq, cacq, cpreds, qpc,
        crow, ccol, cy0, cx0,
    )


def _emit_intra_chroma(w, ctx, mb, cbp_chroma, cdcq, cacq, cpreds,
                       qpc, crow, ccol, cy0, cx0):
    """Chroma emit + recon shared by every intra encoder flavor."""
    if cbp_chroma:
        for comp in range(2):
            _encode_residual(w, -1, cdcq[comp])
    for comp, plane in ((0, ctx.u), (1, ctx.v)):
        for blk in range(4):
            cdy, cdx = divmod(blk, 2)
            rr, cc = crow + cdy, ccol + cdx
            if cbp_chroma == 2:
                nc = ctx.chroma_nc(comp, rr, cc, mb)
                ctx.nc_c[comp][rr, cc] = _encode_residual(
                    w, nc, cacq[comp][blk]
                )
            else:
                ctx.nc_c[comp][rr, cc] = 0
            d = (
                _dequant4x4(cacq[comp][blk], qpc, True)
                if cbp_chroma == 2
                else [[0, 0, 0, 0] for _ in range(4)]
            )
            if cbp_chroma:
                cmat = np.array(
                    [[cdcq[comp][0], cdcq[comp][1]],
                     [cdcq[comp][2], cdcq[comp][3]]],
                    np.int64,
                )
                dcc = _scale_chroma_dc(_hadamard2x2(cmat), qpc)
                d[0][0] = int(dcc[cdy, cdx])
            res = _itransform4x4(d)
            py, px = cy0 + cdy * 4, cx0 + cdx * 4
            plane[py : py + 4, px : px + 4] = _clip_u8(
                cpreds[comp][cdy * 4 : cdy * 4 + 4, cdx * 4 : cdx * 4 + 4]
                + res
            )


# ---------------------------------------------------------------------------
# Inter (P slice) encoder (r12) — fixtures + the driver row's
# round-trip oracle.  Every prediction comes from the DECODER's own
# interpolation and MV-predictor helpers and every reconstruction from
# its dequant/IDCT helpers, so decode(encode(x)) equals the encoder's
# reconstruction bit-for-bit by construction; the tests pin exactly
# that, plus quantisation-bounded recon error and full quarter-pel
# fractional-position coverage.
# ---------------------------------------------------------------------------


def _enc_mv(mb: int, f_idx: int, p: int) -> tuple[int, int]:
    """Deterministic quarter-pel test vector for partition p — the
    moduli are coprime to 4 so all 16 (fx, fy) fractions occur."""
    mvx = ((mb * 5 + f_idx * 7 + p * 3) % 25) - 12
    mvy = ((mb * 7 + f_idx * 11 + p * 5) % 21) - 10
    return mvx, mvy


def _mc_pred_mb(ctx, dpb, mb, parts):
    """Motion-compensate the whole MB into fresh pred planes, filling
    ctx.mv / ctx.ref per partition in decode order; parts entries are
    (r_off, c_off, h4, w4, special, mvx, mvy, ref_idx) and each
    partition reads its own DPB picture."""
    my, mx = divmod(mb, ctx.mb_w)
    pred_y = np.empty((16, 16), np.uint8)
    pred_u = np.empty((8, 8), np.uint8)
    pred_v = np.empty((8, 8), np.uint8)
    for r_off, c_off, h4, w4, _special, mvx, mvy, ri in parts:
        refp = dpb[ri]
        r, c = my * 4 + r_off, mx * 4 + c_off
        ctx.mv[r : r + h4, c : c + w4, 0] = mvx
        ctx.mv[r : r + h4, c : c + w4, 1] = mvy
        ctx.ref[r : r + h4, c : c + w4] = ri
        ctx.refpic[r : r + h4, c : c + w4, 0] = refp.serial
        py, px = r * 4, c * 4
        ly, lx = r_off * 4, c_off * 4
        yb = _interp_luma(refp[0], py, px, h4 * 4, w4 * 4, mvy, mvx)
        cy, cx = py // 2, px // 2
        ub = _interp_chroma(refp[1], cy, cx, h4 * 2, w4 * 2, mvy, mvx)
        vb = _interp_chroma(refp[2], cy, cx, h4 * 2, w4 * 2, mvy, mvx)
        if ctx.wp_mode == 1:  # encoder-recon twin of _mc_partition
            wl = ctx.wp_l0[ri]
            lwd, cwd = ctx.wp_logwd
            yb = _wp_single(yb, wl[0], wl[1], lwd)
            ub = _wp_single(ub, wl[2], wl[3], cwd)
            vb = _wp_single(vb, wl[4], wl[5], cwd)
        pred_y[ly : ly + h4 * 4, lx : lx + w4 * 4] = yb
        pred_u[ly // 2 : ly // 2 + h4 * 2,
               lx // 2 : lx // 2 + w4 * 2] = ub
        pred_v[ly // 2 : ly // 2 + h4 * 2,
               lx // 2 : lx // 2 + w4 * 2] = vb
    return pred_y, pred_u, pred_v


def _quant_inter_mb(ctx, mb, qp, qpc, pred_y, pred_u, pred_v,
                    y_pad, u_pad, v_pad):
    """Transform + quantise the inter residual -> (cbp, luma levels,
    chroma DC levels, chroma AC levels)."""
    my, mx = divmod(mb, ctx.mb_w)
    y0, x0 = my * 16, mx * 16
    cy0, cx0 = my * 8, mx * 8
    resid_y = (
        y_pad[y0 : y0 + 16, x0 : x0 + 16].astype(np.int64) - pred_y
    )
    lcoeffs = []
    for blk in range(16):
        dy, dx = _BLK4_ORDER[blk]
        w4m = _ftransform4x4(
            resid_y[dy * 4 : dy * 4 + 4, dx * 4 : dx * 4 + 4]
        )
        lcoeffs.append(_quant_block(w4m, qp, skip_dc=False))
    cbp_luma = 0
    for q in range(4):
        if any(c != 0 for blk in range(q * 4, q * 4 + 4)
               for c in lcoeffs[blk]):
            cbp_luma |= 1 << q
    cdcq, cacq = [], []
    any_cdc = any_cac = False
    for src, pred in ((u_pad, pred_u), (v_pad, pred_v)):
        resid = (
            src[cy0 : cy0 + 8, cx0 : cx0 + 8].astype(np.int64) - pred
        )
        wmats, dcs = [], np.zeros((2, 2), np.int64)
        for blk in range(4):
            cdy, cdx = divmod(blk, 2)
            w4m = _ftransform4x4(
                resid[cdy * 4 : cdy * 4 + 4, cdx * 4 : cdx * 4 + 4]
            )
            dcs[cdy, cdx] = w4m[0][0]
            wmats.append(w4m)
        hdc = _hadamard2x2(dcs)
        dq = [
            _quant_coeff(int(hdc[i, j]), qpc, 0, dc=True)
            for i, j in ((0, 0), (0, 1), (1, 0), (1, 1))
        ]
        aq = [_quant_block(w4m, qpc, skip_dc=True) for w4m in wmats]
        any_cdc |= any(c != 0 for c in dq)
        any_cac |= any(c != 0 for blkq in aq for c in blkq)
        cdcq.append(dq)
        cacq.append(aq)
    cbp_chroma = 2 if any_cac else (1 if any_cdc else 0)
    return cbp_luma | (cbp_chroma << 4), lcoeffs, cdcq, cacq


def _recon_inter_mb(ctx, mb, qp, qpc, cbp, lcoeffs, cdcq, cacq,
                    pred_y, pred_u, pred_v):
    """Reconstruct exactly as the decoder will (its dequant/IDCT)."""
    my, mx = divmod(mb, ctx.mb_w)
    br, bc = my * 4, mx * 4
    crow, ccol = my * 2, mx * 2
    y0, x0 = my * 16, mx * 16
    cy0, cx0 = my * 8, mx * 8
    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
    for blk in range(16):
        dy, dx = _BLK4_ORDER[blk]
        pred = pred_y[dy * 4 : dy * 4 + 4, dx * 4 : dx * 4 + 4]
        if cbp_luma & (1 << (blk // 4)):
            res = _itransform4x4(_dequant4x4(lcoeffs[blk], qp, False))
            out = _clip_u8(pred.astype(np.int64) + res)
        else:
            out = pred
        ctx.y[y0 + dy * 4 : y0 + dy * 4 + 4,
              x0 + dx * 4 : x0 + dx * 4 + 4] = out
    for comp, (plane, predc) in enumerate(
        ((ctx.u, pred_u), (ctx.v, pred_v))
    ):
        if cbp_chroma:
            cmat = np.array(
                [[cdcq[comp][0], cdcq[comp][1]],
                 [cdcq[comp][2], cdcq[comp][3]]],
                np.int64,
            )
            dcc = _scale_chroma_dc(_hadamard2x2(cmat), qpc)
        for blk in range(4):
            cdy, cdx = divmod(blk, 2)
            pred = predc[cdy * 4 : cdy * 4 + 4, cdx * 4 : cdx * 4 + 4]
            if cbp_chroma:
                d = (
                    _dequant4x4(cacq[comp][blk], qpc, True)
                    if cbp_chroma == 2
                    else [[0, 0, 0, 0] for _ in range(4)]
                )
                d[0][0] = int(dcc[cdy, cdx])
                res = _itransform4x4(d)
                out = _clip_u8(pred.astype(np.int64) + res)
            else:
                out = pred
            plane[cy0 + cdy * 4 : cy0 + cdy * 4 + 4,
                  cx0 + cdx * 4 : cx0 + cdx * 4 + 4] = out
    ctx.mode4[br : br + 4, bc : bc + 4] = 2
    if not (cbp_chroma & 2):
        for comp in range(2):
            ctx.nc_c[comp][crow : crow + 2, ccol : ccol + 2] = 0
    if not (cbp & 15):
        ctx.nc_y[br : br + 4, bc : bc + 4] = 0


def _emit_inter_residual(w, ctx, mb, qp_unused, cbp, lcoeffs, cdcq,
                         cacq):
    """CAVLC-emit the inter residual with nC bookkeeping."""
    my, mx = divmod(mb, ctx.mb_w)
    br, bc = my * 4, mx * 4
    crow, ccol = my * 2, mx * 2
    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
    w.ue(_CBP_INTER_INV[cbp])
    if cbp:
        w.se(0)  # mb_qp_delta
    for blk in range(16):
        dy, dx = _BLK4_ORDER[blk]
        rb, cb_ = br + dy, bc + dx
        if cbp_luma & (1 << (blk // 4)):
            nc = ctx.luma_nc(rb, cb_, mb)
            ctx.nc_y[rb, cb_] = _encode_residual(w, nc, lcoeffs[blk])
        else:
            ctx.nc_y[rb, cb_] = 0
    if cbp_chroma:
        for comp in range(2):
            _encode_residual(w, -1, cdcq[comp])
    if cbp_chroma & 2:
        for comp in range(2):
            for blk in range(4):
                cdy, cdx = divmod(blk, 2)
                rr, cc = crow + cdy, ccol + cdx
                nc = ctx.chroma_nc(comp, rr, cc, mb)
                ctx.nc_c[comp][rr, cc] = _encode_residual(
                    w, nc, cacq[comp][blk]
                )


def encode_h264_inter_recon(frames, width: int, height: int,
                            qp: int = 28, deblock: bool = False,
                            num_refs: int = 1):
    """Annex-B encoder with REAL inter coding: frame 0 is an IDR intra
    picture (the r11 CAVLC mix), every later frame a P picture over a
    deterministic macroblock mix — P_Skip where the quantised residual
    vanishes, P_L0_16x16 / 16x8 / 8x16 / P_8x8 (all four sub-types)
    with quarter-pel test vectors covering all 16 fractional
    positions, and intra-in-P macroblocks.  With ``deblock`` the
    slices enable the in-loop filter (idc 0, zero offsets) and the
    reconstruction loop applies the decoder's own ``_deblock_picture``
    after each picture, so P frames reference FILTERED pictures
    exactly as §8.4 requires.  -> (annexb_bytes, [(Y, U, V)
    reconstructed planes, cropped], stats dict with MB-kind counts and
    the set of luma fractions used).  With ``num_refs`` > 1 the DPB
    holds that many sliding-window references and P slices override
    num_ref_idx_l0_active, choosing a deterministic per-partition
    ref_idx (te(v)-coded) once enough references exist — the multi-ref
    prediction/deblock/MV-predictor paths all exercise for real."""
    if width % 2 or height % 2:
        raise UnsupportedMediaError("h264 encoder: dimensions must be even")
    if not 8 <= qp <= 44:
        raise UnsupportedMediaError("h264 encoder: qp out of supported range")
    mb_w = -(-width // 16)
    mb_h = -(-height // 16)
    crop_right = mb_w * 16 - width
    crop_bottom = mb_h * 16 - height

    w = _BitWriter()
    w.write(66, 8)  # profile_idc: baseline
    w.write(0xC0, 8)
    w.write(30, 8)
    w.ue(0)  # seq_parameter_set_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type
    w.ue(max(1, num_refs))  # max_num_ref_frames (sliding window)
    w.write(0, 1)
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.write(1, 1)  # frame_mbs_only_flag
    w.write(1, 1)
    if crop_right or crop_bottom:
        w.write(1, 1)
        w.ue(0)
        w.ue(crop_right // 2)
        w.ue(0)
        w.ue(crop_bottom // 2)
    else:
        w.write(0, 1)
    w.write(0, 1)
    w.trailing_bits()
    out = bytearray(_nal(3, 7, w.getvalue()))

    w = _BitWriter()
    w.ue(0)
    w.ue(0)
    w.write(0, 1)  # CAVLC
    w.write(0, 1)
    w.ue(0)
    w.ue(0)  # num_ref_idx_l0_default_active_minus1 = 0
    w.ue(0)
    w.write(0, 1)
    w.write(0, 2)
    w.se(qp - 26)
    w.se(0)
    w.se(0)  # chroma_qp_index_offset = 0
    w.write(1, 1)  # deblocking_filter_control_present_flag
    w.write(0, 1)
    w.write(0, 1)
    w.trailing_bits()
    out += _nal(3, 8, w.getvalue())

    sps = _SPS()
    sps.mb_width, sps.mb_height = mb_w, mb_h
    sps.monochrome = False
    qpc = _chroma_qp(qp, 0)
    n_mbs = mb_w * mb_h
    recons = []
    stats = {
        "P_Skip": 0, "P_16x16": 0, "P_16x8": 0, "P_8x16": 0,
        "P_8x8": 0, "intra_in_p": 0, "multiref": 0, "fracs": set(),
    }
    dpb: list[_RefPic] = []  # padded recon pictures, most recent first
    for f_idx, (y, u, v) in enumerate(frames):
        y_pad = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
        y_pad[:height, :width] = np.asarray(y, np.uint8)
        u_pad = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
        v_pad = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
        u_pad[: height // 2, : width // 2] = np.asarray(u, np.uint8)
        v_pad[: height // 2, : width // 2] = np.asarray(v, np.uint8)

        ctx = _PicCtx(sps)
        ctx.mb_slice[:] = 1
        ctx.qp = qp
        ctx.serial = f_idx + 1  # decode-order identity for refpic
        ctx.poc = 2 * f_idx
        w = _BitWriter()
        w.ue(0)  # first_mb_in_slice
        if f_idx == 0:
            w.ue(7)  # slice_type: I
            w.ue(0)  # pic_parameter_set_id
            w.write(0, 4)  # frame_num
            w.ue(0)  # idr_pic_id
            w.write(0, 2)
            w.se(0)  # slice_qp_delta
            if deblock:
                w.ue(0)  # disable_deblocking_filter_idc: ON
                w.se(0)  # slice_alpha_c0_offset_div2
                w.se(0)  # slice_beta_offset_div2
            else:
                w.ue(1)  # disable_deblocking_filter_idc
            for mb in range(n_mbs):
                _encode_one_mb(
                    w, ctx, mb, f_idx, qp, qpc, y_pad, u_pad, v_pad
                )
            w.trailing_bits()
            out += _nal(3, 5, w.getvalue())
        else:
            w.ue(5)  # slice_type: P (all slices in picture)
            w.ue(0)  # pic_parameter_set_id
            w.write(f_idx % 16, 4)  # frame_num
            active = min(num_refs, len(dpb))
            if active > 1:
                w.write(1, 1)  # num_ref_idx_active_override_flag
                w.ue(active - 1)
            else:
                w.write(0, 1)
            w.write(0, 1)  # ref_pic_list_modification_flag_l0
            w.write(0, 1)  # adaptive_ref_pic_marking_mode_flag
            w.se(0)  # slice_qp_delta
            if deblock:
                w.ue(0)  # disable_deblocking_filter_idc: ON
                w.se(0)  # slice_alpha_c0_offset_div2
                w.se(0)  # slice_beta_offset_div2
            else:
                w.ue(1)  # disable_deblocking_filter_idc
            pending = 0
            for mb in range(n_mbs):
                my, mx = divmod(mb, mb_w)
                br, bc = my * 4, mx * 4
                ctx.mb_qp[mb] = qp  # _encode_one_mb overrides I_PCM
                kind = (mb * 5 + f_idx * 3) % 8
                if kind == 7:  # intra-in-P
                    w.ue(pending)
                    pending = 0
                    _encode_one_mb(
                        w, ctx, mb, f_idx, qp, qpc, y_pad, u_pad,
                        v_pad, mb_type_offset=5,
                    )
                    stats["intra_in_p"] += 1
                    continue
                if kind == 0:
                    # skip attempt: the skip MV, residual must vanish
                    skx, sky = _skip_mv(ctx, mb)
                    parts = [(0, 0, 4, 4, None, skx, sky, 0)]
                    preds = _mc_pred_mb(ctx, dpb, mb, parts)
                    cbp, lq, cdq, caq = _quant_inter_mb(
                        ctx, mb, qp, qpc, *preds, y_pad, u_pad, v_pad
                    )
                    if cbp == 0:
                        pending += 1
                        stats["P_Skip"] += 1
                        _recon_inter_mb(
                            ctx, mb, qp, qpc, 0, lq, cdq, caq, *preds
                        )
                        continue
                    # fall through: emit as P_L0_16x16 with that MV
                    w.ue(pending)
                    pending = 0
                    w.ue(0)  # mb_type P_L0_16x16
                    if active > 1:  # ref_idx 0, te(v)-coded
                        if active == 2:
                            w.write(1, 1)
                        else:
                            w.ue(0)
                    mpx, mpy = _mvp(ctx, mb, br, bc, 4, 4)
                    w.se(skx - mpx)
                    w.se(sky - mpy)
                    stats["P_16x16"] += 1
                    stats["fracs"].add((skx & 3, sky & 3))
                    _emit_inter_residual(
                        w, ctx, mb, qp, cbp, lq, cdq, caq
                    )
                    _recon_inter_mb(
                        ctx, mb, qp, qpc, cbp, lq, cdq, caq, *preds
                    )
                    continue
                w.ue(pending)
                pending = 0
                if kind in (1, 2, 3):  # P_L0_16x16
                    mvx, mvy = _enc_mv(mb, f_idx, 0)
                    geom = [(0, 0, 4, 4, None)]
                    mvs = [(mvx, mvy)]
                    mb_type = 0
                    stats["P_16x16"] += 1
                elif kind == 4:  # P_L0_L0_16x8
                    geom = _P_PARTS[1]
                    mvs = [_enc_mv(mb, f_idx, p) for p in range(2)]
                    mb_type = 1
                    stats["P_16x8"] += 1
                elif kind == 5:  # P_L0_L0_8x16
                    geom = _P_PARTS[2]
                    mvs = [_enc_mv(mb, f_idx, p) for p in range(2)]
                    mb_type = 2
                    stats["P_8x16"] += 1
                else:  # kind == 6: P_8x8
                    subs = [(mb + i8 + f_idx) % 4 for i8 in range(4)]
                    geom = []
                    for i8 in range(4):
                        base_r, base_c = 2 * (i8 // 2), 2 * (i8 % 2)
                        for r_off, c_off, h4, w4 in _P_SUB_PARTS[subs[i8]]:
                            geom.append(
                                (base_r + r_off, base_c + c_off,
                                 h4, w4, None)
                            )
                    mvs = [_enc_mv(mb, f_idx, p) for p in range(len(geom))]
                    mb_type = 3
                    stats["P_8x8"] += 1
                # deterministic per-partition (or per-8x8) ref choice
                if mb_type == 3:
                    refs8 = [
                        (mb * 3 + f_idx + i8) % active for i8 in range(4)
                    ]
                    # sub-partition p of 8x8 i8 inherits refs8[i8]
                    prefs, gi = [], 0
                    for i8 in range(4):
                        n_sub = len(_P_SUB_PARTS[subs[i8]])
                        prefs += [refs8[i8]] * n_sub
                        gi += n_sub
                else:
                    prefs = [
                        (mb * 3 + f_idx + p * 5) % active
                        for p in range(len(geom))
                    ]
                w.ue(mb_type)
                if mb_type == 3:
                    for s in subs:
                        w.ue(s)
                    if active > 1:
                        for ri in refs8:
                            if active == 2:
                                w.write(1 - ri, 1)  # te(v), range [0,1]
                            else:
                                w.ue(ri)
                elif active > 1:
                    for ri in prefs:
                        if active == 2:
                            w.write(1 - ri, 1)
                        else:
                            w.ue(ri)
                # MV derivation + mvd emission in partition decode
                # order (predictors see earlier partitions' MVs)
                parts = []
                for (r_off, c_off, h4, w4, special), (mvx, mvy), ri in zip(
                    geom, mvs, prefs
                ):
                    mpx, mpy = _mvp(
                        ctx, mb, br + r_off, bc + c_off, w4, h4, special,
                        cur_ref=ri,
                    )
                    w.se(mvx - mpx)
                    w.se(mvy - mpy)
                    stats["fracs"].add((mvx & 3, mvy & 3))
                    if ri:
                        stats["multiref"] += 1
                    r, c = br + r_off, bc + c_off
                    ctx.mv[r : r + h4, c : c + w4, 0] = mvx
                    ctx.mv[r : r + h4, c : c + w4, 1] = mvy
                    ctx.ref[r : r + h4, c : c + w4] = ri
                    parts.append(
                        (r_off, c_off, h4, w4, special, mvx, mvy, ri)
                    )
                preds = _mc_pred_mb(ctx, dpb, mb, parts)
                cbp, lq, cdq, caq = _quant_inter_mb(
                    ctx, mb, qp, qpc, *preds, y_pad, u_pad, v_pad
                )
                _emit_inter_residual(w, ctx, mb, qp, cbp, lq, cdq, caq)
                _recon_inter_mb(
                    ctx, mb, qp, qpc, cbp, lq, cdq, caq, *preds
                )
            if pending:
                w.ue(pending)
            w.trailing_bits()
            out += _nal(2, 1, w.getvalue())
        if deblock:
            ctx.db_idc[:] = 0
            _deblock_picture(ctx, 0)  # chroma_qp_index_offset is 0
        if f_idx == 0:
            dpb.clear()  # IDR: all refs marked unused (§8.2.5.1)
        dpb.insert(0, _RefPic(ctx))
        del dpb[max(1, num_refs):]
        recons.append(
            (
                ctx.y[:height, :width].copy(),
                ctx.u[: height // 2, : width // 2].copy(),
                ctx.v[: height // 2, : width // 2].copy(),
            )
        )
    return bytes(out), recons, stats


def _write_te(w: _BitWriter, val: int, max_val: int) -> None:
    """te(v) (spec §9.1.1): nothing when the range is [0, 0], one
    flipped bit for [0, 1], plain ue(v) otherwise — the exact mirror
    of the decoder's ref_idx read (absent when one ref is active)."""
    if max_val <= 0:
        return
    if max_val == 1:
        w.write(1 - val, 1)
    else:
        w.ue(val)


def _b_pred_mb(ctx, l0, l1, mb, entries):
    """Prediction planes for a whole B macroblock from derived
    partition entries (r_off, c_off, h4, w4, ref0, mv0, ref1, mv1)."""
    my, mx = divmod(mb, ctx.mb_w)
    pred_y = np.empty((16, 16), np.uint8)
    pred_u = np.empty((8, 8), np.uint8)
    pred_v = np.empty((8, 8), np.uint8)
    for ro, co, h4, w4, r0, m0, r1, m1 in entries:
        py, px = (my * 4 + ro) * 4, (mx * 4 + co) * 4
        h, w = h4 * 4, w4 * 4
        yb, ub, vb = _b_pred_part(
            ctx, l0, l1, py, px, h, w, r0, m0, r1, m1
        )
        ly, lc = ro * 4, co * 4
        pred_y[ly : ly + h, lc : lc + w] = yb
        pred_u[ly // 2 : ly // 2 + h // 2,
               lc // 2 : lc // 2 + w // 2] = ub
        pred_v[ly // 2 : ly // 2 + h // 2,
               lc // 2 : lc // 2 + w // 2] = vb
    return pred_y, pred_u, pred_v


def _b_gop(nf: int):
    """Coded-order GOP plan [(display_idx, 'I'|'P'|'B')]: IDR, then
    P/B pairs (the B between its past and future reference); a
    trailing odd frame becomes a past-only B (which exercises the
    §8.2.4.2.3 first-two-entries L1 swap)."""
    coded = [(0, "I")]
    d = 1
    while d < nf:
        if d + 1 < nf:
            coded.append((d + 1, "P"))
            coded.append((d, "B"))
            d += 2
        else:
            coded.append((d, "B"))
            d += 1
    return coded


# explicit B kinds used by the encoder mix: kind -> Table 7-14 mb_type
_B_KIND_TYPES = {2: 1, 3: 2, 4: 3, 5: 8, 6: 11, 7: 16, 8: 15, 9: 20}


def _enc_wp_list(n: int, lwd: int, cwd: int, lx: int) -> list:
    """Deterministic explicit weights for the fixture encoder: per
    ref index, luma/chroma weights around the identity (1 << denom)
    with small distinct offsets, different per list so a list mix-up
    cannot round-trip."""
    out = []
    for i in range(n):
        wy = (1 << lwd) + 7 - 3 * i + 2 * lx
        oy = 2 - i - lx
        wcb = (1 << cwd) - 2 + i + lx
        ocb = -1 + i
        wcr = (1 << cwd) + 3 - i - 2 * lx
        ocr = 1 + lx
        out.append((wy, oy, wcb, ocb, wcr, ocr))
    return out


def _write_wp_table(w: _BitWriter, lwd: int, cwd: int,
                    lists: list) -> None:
    """pred_weight_table (§7.3.3.2) for the fixture encoders; every
    entry written explicitly (both flags set)."""
    w.ue(lwd)
    w.ue(cwd)
    for lst in lists:
        for (wy, oy, wcb, ocb, wcr, ocr) in lst:
            w.write(1, 1)
            w.se(wy)
            w.se(oy)
            w.write(1, 1)
            w.se(wcb)
            w.se(ocb)
            w.se(wcr)
            w.se(ocr)


def encode_h264_bipred_recon(frames, width: int, height: int,
                             qp: int = 28, deblock: bool = False,
                             spatial_direct: bool = True,
                             inference: bool = True,
                             zero_motion: bool = False,
                             slices_per_pic: int = 1,
                             weighted: str | None = None):
    """Annex-B encoder with REAL B-slice coding on top of the r12
    inter layer: coded order I0, P2, B1, P4, B3, … (display-order
    frames in, decode-order reconstruction out — B pictures are
    non-reference, POC type 0 carries the display order).  Every B
    macroblock kind is exercised deterministically: B_Skip and
    B_Direct_16x16 (spatial or temporal per ``spatial_direct``),
    L0/L1/Bi 16x16, mixed-list 16x8/8x16 pairs, B_8x8 with all 13
    sub-types (including B_Direct_8x8), and intra-in-B.  ``inference``
    sets direct_8x8_inference_flag.  -> (annexb_bytes, [(Y, U, V)]
    reconstructions in DISPLAY order — matching the decoder's
    POC-sorted output, stats).  The reconstruction loop
    calls the decoder's own derivation/MC/dequant helpers, so a
    conforming decode must be bit-exact.  ``zero_motion`` emulates a
    real encoder's motion search on static content (all explicit MVs
    zero), which lets residuals vanish and P_Skip/B_Skip runs form.
    In temporal-direct mode, macroblocks whose colocated reference
    cannot be mapped into the current list 0 (possible on trailing
    past-only B pictures after the sliding window evicted it) fall
    back to explicit bi-prediction, as a conforming encoder must.
    ``slices_per_pic`` splits every picture into that many contiguous
    same-type slices: cross-slice neighbors become UNAVAILABLE for
    intra prediction, nC derivation, MV prediction and direct-mode
    reference selection (§6.4.11), skip runs flush at slice ends, and
    the in-loop filter still crosses slice boundaries (idc 0)."""
    if width % 2 or height % 2:
        raise UnsupportedMediaError("h264 encoder: dimensions must be even")
    if not 8 <= qp <= 44:
        raise UnsupportedMediaError("h264 encoder: qp out of supported range")
    if len(frames) * 2 >= 256:
        raise UnsupportedMediaError("h264 encoder: GOP exceeds POC lsb")
    mb_w = -(-width // 16)
    mb_h = -(-height // 16)
    crop_right = mb_w * 16 - width
    crop_bottom = mb_h * 16 - height

    w = _BitWriter()
    w.write(66, 8)  # profile_idc: baseline
    w.write(0xC0, 8)
    w.write(30, 8)
    w.ue(0)  # seq_parameter_set_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(0)  # pic_order_cnt_type 0
    w.ue(4)  # log2_max_pic_order_cnt_lsb_minus4 -> 8 bits
    w.ue(2)  # max_num_ref_frames (sliding window of 2)
    w.write(0, 1)
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.write(1, 1)  # frame_mbs_only_flag
    w.write(1 if inference else 0, 1)  # direct_8x8_inference_flag
    if crop_right or crop_bottom:
        w.write(1, 1)
        w.ue(0)
        w.ue(crop_right // 2)
        w.ue(0)
        w.ue(crop_bottom // 2)
    else:
        w.write(0, 1)
    w.write(0, 1)
    w.trailing_bits()
    out = bytearray(_nal(3, 7, w.getvalue()))

    w = _BitWriter()
    w.ue(0)
    w.ue(0)
    w.write(0, 1)  # CAVLC
    w.write(0, 1)
    w.ue(0)
    w.ue(0)  # num_ref_idx_l0_default_active_minus1 = 0
    w.ue(0)  # num_ref_idx_l1_default_active_minus1 = 0
    # r13 weighted prediction: explicit -> weighted P (flag) AND
    # explicit B (idc 1); implicit -> idc 2 (POC weights, no table)
    w.write(1 if weighted == "explicit" else 0, 1)  # weighted_pred_flag
    w.write({None: 0, "explicit": 1, "implicit": 2}[weighted], 2)
    w.se(qp - 26)
    w.se(0)
    w.se(0)  # chroma_qp_index_offset = 0
    w.write(1, 1)  # deblocking_filter_control_present_flag
    w.write(0, 1)
    w.write(0, 1)
    w.trailing_bits()
    out += _nal(3, 8, w.getvalue())

    sps = _SPS()
    sps.mb_width, sps.mb_height = mb_w, mb_h
    sps.monochrome = False
    qpc = _chroma_qp(qp, 0)
    n_mbs = mb_w * mb_h
    recons = []
    stats = {
        "B_Skip": 0, "B_Direct": 0, "B_16x16": 0, "B_16x8": 0,
        "B_8x16": 0, "B_8x8": 0, "intra_in_b": 0, "bi_parts": 0,
        "direct_sub": 0, "sub_kinds": set(), "l1_swapped": 0,
        "order": [],
    }
    dpb: list[_RefPic] = []
    n_refs_seen = 0
    for coded_idx, (disp, kind) in enumerate(_b_gop(len(frames))):
        y, u, v = frames[disp]
        y_pad = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
        y_pad[:height, :width] = np.asarray(y, np.uint8)
        u_pad = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
        v_pad = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
        u_pad[: height // 2, : width // 2] = np.asarray(u, np.uint8)
        v_pad[: height // 2, : width // 2] = np.asarray(v, np.uint8)

        ctx = _PicCtx(sps)
        ctx.qp = qp
        ctx.serial = coded_idx + 1
        ctx.poc = 2 * disp
        if weighted == "explicit" and kind in ("P", "B"):
            ctx.wp_mode = 1
            ctx.wp_logwd = (5, 4)
            ctx.wp_l0 = _enc_wp_list(2, 5, 4, 0)
            ctx.wp_l1 = _enc_wp_list(2, 5, 4, 1)
        elif weighted == "implicit" and kind == "B":
            ctx.wp_mode = 2
        fn = n_refs_seen % 16
        is_ref = kind in ("I", "P")
        stats["order"].append((disp, kind))
        if kind == "B":
            l0_full, l1_full = _b_default_lists(dpb, ctx.poc)
            if (
                len(l1_full) > 1
                and l1_full[0].serial != l0_full[0].serial
                and l1_full[0].poc < ctx.poc
            ):
                stats["l1_swapped"] += 1
            a0 = min(2, len(l0_full))
            a1 = min(2, len(l1_full))
            l0e, l1e = l0_full[:a0], l1_full[:a1]
        n_slices = max(1, min(slices_per_pic, n_mbs))
        bounds = [
            (n_mbs * s // n_slices, n_mbs * (s + 1) // n_slices)
            for s in range(n_slices)
        ]
        for si, (mb_lo, mb_hi) in enumerate(bounds):
            w = _BitWriter()
            w.ue(mb_lo)  # first_mb_in_slice
            if kind == "I":
                w.ue(7)  # slice_type: I (all slices)
                w.ue(0)  # pic_parameter_set_id
                w.write(fn, 4)  # frame_num
                w.ue(0)  # idr_pic_id
                w.write(ctx.poc & 0xFF, 8)  # pic_order_cnt_lsb
                w.write(0, 2)  # no_output_of_prior / long_term
            elif kind == "P":
                w.ue(5)  # slice_type: P
                w.ue(0)
                w.write(fn, 4)
                w.write(ctx.poc & 0xFF, 8)
                w.write(0, 1)  # num_ref_idx_active_override_flag
                w.write(0, 1)  # ref_pic_list_modification_flag_l0
                if weighted == "explicit":
                    _write_wp_table(w, 5, 4, [_enc_wp_list(1, 5, 4, 0)])
                w.write(0, 1)  # adaptive_ref_pic_marking_mode_flag
            else:
                w.ue(6)  # slice_type: B
                w.ue(0)
                w.write(fn, 4)
                w.write(ctx.poc & 0xFF, 8)
                w.write(1 if spatial_direct else 0, 1)
                if (a0, a1) != (1, 1):
                    w.write(1, 1)  # num_ref_idx_active_override_flag
                    w.ue(a0 - 1)
                    w.ue(a1 - 1)
                else:
                    w.write(0, 1)
                w.write(0, 1)  # ref_pic_list_modification_flag_l0
                w.write(0, 1)  # ref_pic_list_modification_flag_l1
                if weighted == "explicit":
                    _write_wp_table(
                        w, 5, 4,
                        [_enc_wp_list(a0, 5, 4, 0),
                         _enc_wp_list(a1, 5, 4, 1)],
                    )
                # nal_ref_idc 0: no dec_ref_pic_marking
            w.se(0)  # slice_qp_delta
            if deblock:
                w.ue(0)
                w.se(0)
                w.se(0)
            else:
                w.ue(1)
            if kind == "I":
                for mb in range(mb_lo, mb_hi):
                    ctx.mb_slice[mb] = si + 1
                    _encode_one_mb(
                        w, ctx, mb, coded_idx, qp, qpc, y_pad, u_pad,
                        v_pad,
                    )
                w.trailing_bits()
                out += _nal(3, 5, w.getvalue())
            elif kind == "P":
                pending = 0
                for mb in range(mb_lo, mb_hi):
                    ctx.mb_slice[mb] = si + 1
                    my, mx = divmod(mb, mb_w)
                    br, bc = my * 4, mx * 4
                    ctx.mb_qp[mb] = qp
                    if (mb + coded_idx) % 5 == 4:  # intra-in-P sprinkle
                        w.ue(pending)
                        pending = 0
                        _encode_one_mb(
                            w, ctx, mb, coded_idx, qp, qpc, y_pad,
                            u_pad, v_pad, mb_type_offset=5,
                        )
                        continue
                    if (mb + coded_idx) % 3 == 0:
                        # skip attempt (static content -> P_Skip,
                        # leaving zero-motion colocated blocks for the
                        # B colZeroFlag)
                        mvx, mvy = _skip_mv(ctx, mb)
                    elif zero_motion:
                        mvx, mvy = 0, 0
                    else:
                        mvx, mvy = _enc_mv(mb, coded_idx, 0)
                    parts = [(0, 0, 4, 4, None, mvx, mvy, 0)]
                    preds = _mc_pred_mb(ctx, dpb, mb, parts)
                    cbp, lq, cdq, caq = _quant_inter_mb(
                        ctx, mb, qp, qpc, *preds, y_pad, u_pad, v_pad
                    )
                    if (mb + coded_idx) % 3 == 0 and cbp == 0:
                        pending += 1
                        _recon_inter_mb(
                            ctx, mb, qp, qpc, 0, lq, cdq, caq, *preds
                        )
                        continue
                    w.ue(pending)
                    pending = 0
                    w.ue(0)  # P_L0_16x16
                    mpx, mpy = _mvp(ctx, mb, br, bc, 4, 4)
                    w.se(mvx - mpx)
                    w.se(mvy - mpy)
                    _emit_inter_residual(
                        w, ctx, mb, qp, cbp, lq, cdq, caq
                    )
                    _recon_inter_mb(
                        ctx, mb, qp, qpc, cbp, lq, cdq, caq, *preds
                    )
                if pending:
                    w.ue(pending)
                w.trailing_bits()
                out += _nal(2, 1, w.getvalue())
            else:  # B picture
                pending = _encode_b_frame(
                    w, ctx, mb_w, mb_lo, mb_hi, si + 1, coded_idx,
                    qp, qpc, y_pad, u_pad, v_pad, l0e, l1e, a0, a1,
                    spatial_direct, inference, stats, zero_motion,
                )
                if pending:
                    w.ue(pending)
                w.trailing_bits()
                out += _nal(0, 1, w.getvalue())
        if deblock:
            ctx.db_idc[:] = 0
            _deblock_picture(ctx, 0)
        if kind == "I":
            dpb.clear()
        if is_ref:
            dpb.insert(0, _RefPic(ctx, frame_num=fn))
            del dpb[2:]
            n_refs_seen += 1
        recons.append(
            (
                disp,
                ctx.y[:height, :width].copy(),
                ctx.u[: height // 2, : width // 2].copy(),
                ctx.v[: height // 2, : width // 2].copy(),
            )
        )
    # DISPLAY order (sort by display index) — the decoder sorts its
    # output by POC, so zip(recons, decode(...)) aligns frame-for-frame
    recons.sort(key=lambda t: t[0])
    return bytes(out), [t[1:] for t in recons], stats


def _encode_b_frame(w, ctx, mb_w, mb_lo, mb_hi, slice_id, f_idx, qp,
                    qpc, y_pad, u_pad, v_pad, l0e, l1e, a0, a1,
                    spatial, inference, stats,
                    zero_motion=False) -> int:
    """Emit the macroblocks [mb_lo, mb_hi) of one B slice; returns the
    pending mb_skip_run the caller must flush."""

    def enc_mv(mb, f_idx, p):
        return (0, 0) if zero_motion else _enc_mv(mb, f_idx, p)

    pending = 0
    for mb in range(mb_lo, mb_hi):
        ctx.mb_slice[mb] = slice_id
        my, mx = divmod(mb, mb_w)
        br, bc = my * 4, mx * 4
        ctx.mb_qp[mb] = qp
        kind = (mb * 7 + f_idx * 5) % 12
        if kind == 11:  # intra-in-B
            w.ue(pending)
            pending = 0
            _encode_one_mb(
                w, ctx, mb, f_idx, qp, qpc, y_pad, u_pad, v_pad,
                mb_type_offset=23,
            )
            stats["intra_in_b"] += 1
            continue
        if kind in (0, 1):  # B_Skip attempt / B_Direct_16x16
            try:
                entries = _derive_direct(
                    ctx, mb, l0e, l1e, spatial, inference
                )
            except UnsupportedMediaError:
                # temporal map unavailable -> explicit bi fallback
                kind = 4
        if kind in (0, 1):
            for ro, co, h4, w4, r0, m0, r1, m1 in entries:
                _b_store_fields(ctx, mb, ro, co, h4, w4, 0, r0, m0, l0e)
                _b_store_fields(ctx, mb, ro, co, h4, w4, 1, r1, m1, l1e)
            preds = _b_pred_mb(ctx, l0e, l1e, mb, entries)
            cbp, lq, cdq, caq = _quant_inter_mb(
                ctx, mb, qp, qpc, *preds, y_pad, u_pad, v_pad
            )
            if kind == 0 and cbp == 0:
                pending += 1
                stats["B_Skip"] += 1
                _recon_inter_mb(ctx, mb, qp, qpc, 0, lq, cdq, caq,
                                *preds)
                continue
            w.ue(pending)
            pending = 0
            w.ue(0)  # B_Direct_16x16
            stats["B_Direct"] += 1
            _emit_inter_residual(w, ctx, mb, qp, cbp, lq, cdq, caq)
            _recon_inter_mb(ctx, mb, qp, qpc, cbp, lq, cdq, caq,
                            *preds)
            continue
        w.ue(pending)
        pending = 0
        if kind == 10:  # B_8x8
            subs = [(mb + 3 * i8 + f_idx) % 13 for i8 in range(4)]
            stats["B_8x8"] += 1
            stats["sub_kinds"].update(subs)
            direct_quads = [i8 for i8 in range(4) if subs[i8] == 0]
            direct_entries = []
            if direct_quads:
                try:
                    direct_entries = _derive_direct(
                        ctx, mb, l0e, l1e, spatial, inference,
                        quads=direct_quads,
                    )
                    stats["direct_sub"] += len(direct_quads)
                except UnsupportedMediaError:
                    # temporal map unavailable -> B_Bi_8x8 fallback
                    subs = [3 if s == 0 else s for s in subs]
                    direct_quads = []
            refs8 = ({}, {})
            mvs8 = ({}, {})
            for lx, active in ((0, a0), (1, a1)):
                for i8 in range(4):
                    if subs[i8] and _B_SUBTYPES[subs[i8]][1] & (1 << lx):
                        refs8[lx][i8] = (mb + i8 + lx) % active
            d_by_quad = {}
            for e in direct_entries:
                d_by_quad.setdefault(
                    (e[0] // 2) * 2 + (e[1] // 2), []
                ).append(e)
            derived = ({}, {})
            for lx, lst in ((0, l0e), (1, l1e)):
                for i8 in range(4):
                    base_r, base_c = 2 * (i8 // 2), 2 * (i8 % 2)
                    if subs[i8] == 0:
                        for ro, co, h4, w4, d0, dm0, d1, dm1 in (
                            d_by_quad[i8]
                        ):
                            ref, mv = (
                                (d0, dm0) if lx == 0 else (d1, dm1)
                            )
                            _b_store_fields(
                                ctx, mb, ro, co, h4, w4, lx, ref,
                                mv, lst,
                            )
                        continue
                    parts, m = _B_SUBTYPES[subs[i8]]
                    for s_i, (ro, co, h4, w4) in enumerate(parts):
                        rr, cc = base_r + ro, base_c + co
                        if m & (1 << lx):
                            ri = refs8[lx][i8]
                            mv = enc_mv(
                                mb, f_idx, i8 * 4 + s_i + 8 * lx + 1
                            )
                            mpx, mpy = _mvp(
                                ctx, mb, br + rr, bc + cc, w4, h4,
                                None, ri, lx,
                            )
                            mvs8[lx][i8, s_i] = (
                                mv[0] - mpx, mv[1] - mpy
                            )
                            derived[lx][i8, s_i] = (ri, mv)
                            _b_store_fields(
                                ctx, mb, rr, cc, h4, w4, lx, ri,
                                mv, lst,
                            )
                        else:
                            _b_store_fields(
                                ctx, mb, rr, cc, h4, w4, lx, -1,
                                (0, 0), lst,
                            )
            # syntax: mb_type, sub types, refs l0, refs l1, mvds l0/l1
            w.ue(22)
            for s in subs:
                w.ue(s)
            for lx, active in ((0, a0), (1, a1)):
                for i8 in range(4):
                    if i8 in refs8[lx]:
                        _write_te(w, refs8[lx][i8], active - 1)
            for lx in (0, 1):
                for i8 in range(4):
                    if subs[i8]:
                        parts, m = _B_SUBTYPES[subs[i8]]
                        if m & (1 << lx):
                            for s_i in range(len(parts)):
                                dx, dy = mvs8[lx][i8, s_i]
                                w.se(dx)
                                w.se(dy)
            entries = list(direct_entries)
            for i8 in range(4):
                if subs[i8] == 0:
                    continue
                base_r, base_c = 2 * (i8 // 2), 2 * (i8 % 2)
                parts, _m = _B_SUBTYPES[subs[i8]]
                for s_i, (ro, co, h4, w4) in enumerate(parts):
                    r0, m0 = derived[0].get((i8, s_i), (-1, (0, 0)))
                    r1, m1 = derived[1].get((i8, s_i), (-1, (0, 0)))
                    if r0 >= 0 and r1 >= 0:
                        stats["bi_parts"] += 1
                    entries.append(
                        (base_r + ro, base_c + co, h4, w4,
                         r0, m0, r1, m1)
                    )
        else:  # explicit 16x16 / 16x8 / 8x16
            if kind in (2, 3, 4):
                stats["B_16x16"] += 1
            mb_type = _B_KIND_TYPES[kind]
            geom, masks = _B_MBTYPES[mb_type]
            if geom is _P_PARTS[1]:
                stats["B_16x8"] += 1
            elif geom is _P_PARTS[2]:
                stats["B_8x16"] += 1
            refs = ({}, {})
            derived = ({}, {})
            mvds = ({}, {})
            for lx, (lst, active) in ((0, (l0e, a0)), (1, (l1e, a1))):
                for p, ((ro, co, h4, w4, special), m) in enumerate(
                    zip(geom, masks)
                ):
                    if m & (1 << lx):
                        ri = (mb + p + lx) % active
                        mv = enc_mv(mb, f_idx, p + 8 * lx + 1)
                        mpx, mpy = _mvp(
                            ctx, mb, br + ro, bc + co, w4, h4,
                            special, ri, lx,
                        )
                        refs[lx][p] = ri
                        mvds[lx][p] = (mv[0] - mpx, mv[1] - mpy)
                        derived[lx][p] = (ri, mv)
                        _b_store_fields(
                            ctx, mb, ro, co, h4, w4, lx, ri, mv, lst
                        )
                    else:
                        _b_store_fields(
                            ctx, mb, ro, co, h4, w4, lx, -1, (0, 0),
                            lst,
                        )
            w.ue(mb_type)
            for lx, active in ((0, a0), (1, a1)):
                for p in sorted(refs[lx]):
                    _write_te(w, refs[lx][p], active - 1)
            for lx in (0, 1):
                for p in sorted(mvds[lx]):
                    dx, dy = mvds[lx][p]
                    w.se(dx)
                    w.se(dy)
            entries = []
            for p, (ro, co, h4, w4, _sp) in enumerate(geom):
                r0, m0 = derived[0].get(p, (-1, (0, 0)))
                r1, m1 = derived[1].get(p, (-1, (0, 0)))
                if r0 >= 0 and r1 >= 0:
                    stats["bi_parts"] += 1
                entries.append((ro, co, h4, w4, r0, m0, r1, m1))
        preds = _b_pred_mb(ctx, l0e, l1e, mb, entries)
        cbp, lq, cdq, caq = _quant_inter_mb(
            ctx, mb, qp, qpc, *preds, y_pad, u_pad, v_pad
        )
        _emit_inter_residual(w, ctx, mb, qp, cbp, lq, cdq, caq)
        _recon_inter_mb(ctx, mb, qp, qpc, cbp, lq, cdq, caq, *preds)
    return pending


# ---------------------------------------------------------------------------
# CABAC entropy layer (r13, spec §9.3) — I slices.
#
# What is EXACT here: the arithmetic decoding/encoding engine structure
# (9-bit codIRange/codIOffset, DecodeDecision/Bypass/Terminate with the
# spec's renormalization, the encoder's PutBit/outstanding-bits carry
# resolution and EncodeFlush), the binarizations (Table 9-36 I mb_type
# tree, TU/FL/U, the UEG0 level suffix), the residual syntax
# (coded_block_flag → significance map → reverse-order levels, §7.3.5.3.3),
# and the context-selection structure (neighbor-based ctxIdxInc for
# mb_type/CBP/chroma mode/QP delta, block-category context sets with
# positional significance contexts and the numEq1/numGt1 level-context
# ladder, §9.3.3.1).
#
# DOCUMENTED DEVIATIONS (the MP3 synthesis-window honesty pattern):
# the 64x4 rangeTabLPS and transIdxLPS state machine are DERIVED from
# the published closed forms behind the spec tables (Marpe, Schwarz &
# Wiegand, IEEE TCSVT 2003: p_sigma = 0.5*alpha^sigma with
# alpha = (0.01875/0.5)^(1/63), LPS subdivision by quantized-range
# midpoints, LPS transition round(log(alpha*p + (1-alpha))/log(alpha)))
# — NOT the normative rounded Tables 9-44/9-45 — and every context
# initializes to the equiprobable state (sigma 0, valMPS 0) instead of
# the spec's ~1600 published (m, n) init constants (Tables 9-12..9-33),
# which are not reproducible here.  Encoder and decoder share both, so
# round trips are BIT-EXACT and the streams are structurally real
# CABAC; bitstreams from third-party encoders would desync at the first
# differing probability state, so they remain effectively behind the
# optional-extra seam (a desynced decode trips the syntax validators —
# out-of-range binarizations, mb overrun, terminate mismatch — and
# raises the one exception type).  The tables live in module constants
# (`_CABAC_LPS`, `_CABAC_TRANS_LPS`) that a conformance-minded
# deployment can swap for the normative values without touching the
# engine.  transIdxLPS spot-checks against the published table where
# recall is certain: sigma 1 -> 0, sigma 2 -> 1, sigma 62 -> 38 — the
# derivation reproduces all three (pinned in tests/test_h264_cabac.py).
#
# Scope (r14): I, P and B slices.  I slices: I_NxN + I_16x16 + I_PCM
# (the EncodeFlush + byte-aligned raw samples + mid-slice engine
# re-initialisation path, §9.3.1.2), full residual path.  P/B slices:
# mb_skip_flag, the Table 9-34 P and B mb_type / sub_mb_type
# binarizations (including the intra-in-P/B fixed-context suffix),
# U-binarized ref_idx with neighbor conditioning, UEG3 mvd with the
# per-component |mvd|-sum contexts, the inter CBP/residual path with
# the spec's inter cbf asymmetry — all over the SHARED motion
# machinery (MC, direct modes, weighted prediction, DPB) of the CAVLC
# layers, so the entropy layer is the only new surface.
# ---------------------------------------------------------------------------

import math as _math

_CABAC_ALPHA = (0.01875 / 0.5) ** (1.0 / 63.0)


def _build_cabac_tables():
    lps = np.empty((63, 4), np.int32)
    trans = np.empty(63, np.int32)
    la = _math.log(_CABAC_ALPHA)
    for s in range(63):
        p = 0.5 * _CABAC_ALPHA ** s
        for rho in range(4):
            lps[s, rho] = min(240, max(2, round((64 * rho + 288) * p)))
        p_new = min(0.5, _CABAC_ALPHA * p + (1.0 - _CABAC_ALPHA))
        trans[s] = min(62, max(0, round(_math.log(p_new / 0.5) / la)))
    return lps, trans


_CABAC_LPS, _CABAC_TRANS_LPS = _build_cabac_tables()
# plain-python mirrors for the engines' inner loop: indexing an ndarray
# with python ints costs ~1 µs/scalar in the hottest function of the
# whole codec family (profiled: the two decision() bodies were ~35 % of
# a CABAC GOP encode+decode); tuple indexing is ~20 ns.  The numpy
# tables stay the public/test surface.
_CABAC_LPS_PY = tuple(tuple(int(x) for x in row) for row in _CABAC_LPS)
_CABAC_TRANS_LPS_PY = tuple(int(x) for x in _CABAC_TRANS_LPS)

# context allocation (structure-exact, our numbering)
_CC_MBTYPE = 0    # 3: bin0, ctxIdxInc 0..2 by neighbor mb kinds
_CC_I16_CBPL = 3  # 1: I_16x16 suffix cbp-luma bin
_CC_I16_CBPC = 4  # 2: suffix chroma bins
_CC_I16_MODE = 6  # 2: suffix pred-mode FL bins
_CC_PREV4 = 8     # 1: prev_intra4x4_pred_mode_flag
_CC_REM4 = 9      # 1: rem_intra4x4_pred_mode (3 FL bins)
_CC_CPM = 10      # 4: chroma mode bin0 inc 0..2, bins 1-2 at +3
_CC_QPD = 14      # 4: qp-delta bin0 inc 0..1, bin1 at +2, bins 2+ at +3
_CC_CBP_L = 18    # 4: CBP luma bins, inc 0..3
_CC_CBP_C = 26    # 8: CBP chroma bin0 inc 0..3, bin1 inc 4..7
_CC_CBF = 34      # 5 cats x 4 (inc 0..3)
_CC_SIG = 54      # 5 cats x 15 positions
_CC_LAST = 129    # 5 cats x 15
_CC_LVL = 204     # 5 cats x 10 (bin0 inc 0..4, bins1+ inc 5..9)
# ---- r14: P/B slice contexts (structure-exact, our numbering) ----
_CC_SKIP_P = 254  # 3: mb_skip_flag (P), inc = notSkippedA + notSkippedB
_CC_SKIP_B = 257  # 3: mb_skip_flag (B)
_CC_PMBT = 260    # 4: P mb_type prefix (bin0; bin1; bin2 after 0/1)
_CC_PSUB = 264    # 3: P sub_mb_type bins
_CC_BMBT = 267    # 6: B mb_type (bin0 inc 0..2; +3 bin1; +4; +5 rest)
_CC_BSUB = 273    # 4: B sub_mb_type bins (bin0..2 + shared tail)
_CC_IMBT_P = 277  # 6: intra mb_type suffix in P (bin0, cbpl, cbpc x2,
_CC_IMBT_B = 283  # 6:   mode x2); same layout for B
_CC_REF = 289     # 6: ref_idx (bin0 inc 0..3; bin1; bins2+)
_CC_MVDX = 295    # 7: mvd x (bin0 inc 0..2; bins 1..3; bins4+)
_CC_MVDY = 302    # 7: mvd y
_N_CABAC_CTX = 309

# residual block categories
_CAT_L16DC, _CAT_L16AC, _CAT_L4, _CAT_CDC, _CAT_CAC = range(5)


def _cabac_init_ctxs() -> np.ndarray:
    """(N, 2) int32: [pStateIdx, valMPS] — equiprobable init (see the
    section comment: the normative per-slice-QP init constants are the
    documented deviation)."""
    return np.zeros((_N_CABAC_CTX, 2), np.int32)


class _CabacDec:
    """§9.3.3.2 arithmetic decoding engine over a _BitReader.  Reads
    past the RBSP end return zero bits (the arithmetic decoder's
    lookahead may legitimately extend into the trailing alignment;
    conventional zero padding, bounded so malformed streams still
    raise)."""

    __slots__ = (
        "r", "range", "offset", "_s", "_m", "_over", "_nbits", "_data"
    )

    def __init__(self, r: _BitReader, ctx: np.ndarray):
        self.r = r
        # internal python-list context state (see _CABAC_LPS_PY note);
        # the (N, 2) ndarray stays the constructor contract.  ``ctx`` is
        # SNAPSHOT-ONLY: adapted state lives in _s/_m and is never
        # written back to the array — a future cross-slice carry-over
        # must read it via ctx_snapshot(), not through the shared array.
        self._s = [int(x) for x in ctx[:, 0]]
        self._m = [int(x) for x in ctx[:, 1]]
        self._data = r.data
        self._nbits = len(r.data) * 8
        self._over = 0
        self.range = 510
        self.offset = 0
        for _ in range(9):
            self.offset = (self.offset << 1) | self._bit()

    def ctx_snapshot(self) -> np.ndarray:
        """Materialize the ADAPTED context state back into an (N, 2)
        ndarray — the observable twin of the snapshot-only constructor
        arg (for cross-slice carry-over or state inspection)."""
        return np.column_stack(
            (np.asarray(self._s, np.int64), np.asarray(self._m, np.int64))
        )

    def _bit(self) -> int:
        # inlined 1-bit fast path of _BitReader.read (this is called
        # once per renorm bit — ~15k times per small GOP)
        p = self.r.pos
        if p < self._nbits:
            self.r.pos = p + 1
            return (self._data[p >> 3] >> (7 - (p & 7))) & 1
        self._over += 1
        if self._over > 64:
            raise UnsupportedMediaError("h264: CABAC bitstream overrun")
        return 0

    def _renorm(self) -> None:
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._bit()

    def decision(self, idx: int) -> int:
        s = self._s[idx]
        mps = self._m[idx]
        rlps = _CABAC_LPS_PY[s][(self.range >> 6) & 3]
        self.range -= rlps
        if self.offset >= self.range:
            bit = 1 - mps
            self.offset -= self.range
            self.range = rlps
            if s == 0:
                self._m[idx] = bit
            self._s[idx] = _CABAC_TRANS_LPS_PY[s]
        else:
            bit = mps
            if s < 62:
                self._s[idx] = s + 1
        if self.range < 256:
            self._renorm()
        return bit

    def bypass(self) -> int:
        self.offset = (self.offset << 1) | self._bit()
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def terminate(self) -> int:
        self.range -= 2
        if self.offset >= self.range:
            return 1
        self._renorm()
        return 0

    def reinit(self) -> None:
        """§9.3.1.2 re-initialisation after I_PCM samples: fresh
        codIRange/codIOffset from the (byte-aligned) reader, contexts
        RETAINED.  In this engine the reader position after
        terminate() == 1 equals the encoder's emitted-bit count
        exactly (property-pinned in tests), so alignment is plain
        byte alignment on the reader."""
        self.range = 510
        self.offset = 0
        for _ in range(9):
            self.offset = (self.offset << 1) | self._bit()


class _CabacEnc:
    """§9.3.4 arithmetic encoding engine; bits collect in ``bits``."""

    __slots__ = ("low", "range", "bits", "n_out", "first", "_s", "_m")

    def __init__(self, ctx: np.ndarray):
        self.low = 0
        self.range = 510
        self.bits: list[int] = []
        self.n_out = 0
        self.first = True
        # same python-list context state as _CabacDec; ``ctx`` is
        # snapshot-only here too (see _CabacDec.__init__)
        self._s = [int(x) for x in ctx[:, 0]]
        self._m = [int(x) for x in ctx[:, 1]]

    def ctx_snapshot(self) -> np.ndarray:
        """Materialize the ADAPTED context state back into an (N, 2)
        ndarray — the observable twin of the snapshot-only constructor
        arg (for cross-slice carry-over or state inspection)."""
        return np.column_stack(
            (np.asarray(self._s, np.int64), np.asarray(self._m, np.int64))
        )

    def _put(self, b: int) -> None:
        if self.first:
            self.first = False
        else:
            self.bits.append(b)
        if self.n_out:
            self.bits.extend([1 - b] * self.n_out)
            self.n_out = 0

    def _renorm(self) -> None:
        while self.range < 256:
            if self.low >= 512:
                self._put(1)
                self.low -= 512
            elif self.low < 256:
                self._put(0)
            else:
                self.n_out += 1
                self.low -= 256
            self.low <<= 1
            self.range <<= 1

    def decision(self, idx: int, b: int) -> None:
        s = self._s[idx]
        mps = self._m[idx]
        rlps = _CABAC_LPS_PY[s][(self.range >> 6) & 3]
        self.range -= rlps
        if b != mps:
            self.low += self.range
            self.range = rlps
            if s == 0:
                self._m[idx] = 1 - mps
            self._s[idx] = _CABAC_TRANS_LPS_PY[s]
        else:
            if s < 62:
                self._s[idx] = s + 1
        if self.range < 256:
            self._renorm()

    def bypass(self, b: int) -> None:
        self.low <<= 1
        if b:
            self.low += self.range
        if self.low >= 1024:
            self._put(1)
            self.low -= 1024
        elif self.low < 512:
            self._put(0)
        else:
            self.n_out += 1
            self.low -= 512

    def terminate(self, b: int) -> None:
        self.range -= 2
        if b:
            self.low += self.range
            self.range = 2
            self._renorm()
            self._put((self.low >> 9) & 1)
            # WriteBits(((low >> 7) & 3) | 1, 2): the rbsp stop bit
            # rides inside the flush
            self.bits.append((self.low >> 8) & 1)
            self.bits.append(1)
        else:
            self._renorm()

    def put_pcm(self, data: bytes) -> None:
        """pcm_alignment_zero_bit(s) + raw sample bytes, straight into
        the bit list (the CABAC data starts byte-aligned in the NAL,
        so list-length alignment IS byte alignment)."""
        while len(self.bits) % 8:
            self.bits.append(0)
        for byte in data:
            for i in range(7, -1, -1):
                self.bits.append((byte >> i) & 1)

    def reinit(self) -> None:
        """§9.3.4.1 re-initialisation after I_PCM samples (contexts
        retained, firstBitFlag reset)."""
        self.low = 0
        self.range = 510
        self.n_out = 0
        self.first = True


# ---- neighbor-derived context increments ---------------------------------


def _mb_nbrs(ctx: _PicCtx, mb: int):
    """(left, top) MB addresses, -1 when outside / different slice."""
    my, mx = divmod(mb, ctx.mb_w)
    left = mb - 1 if mx > 0 else -1
    top = mb - ctx.mb_w
    if left >= 0 and not ctx._same_slice(mb, left):
        left = -1
    if top >= 0 and not ctx._same_slice(mb, top):
        top = -1
    return left, top


def _cbf_ctx(ctx: _PicCtx, cat: int, mb: int, rb: int, cb_: int,
             comp: int, intra: bool = True) -> int:
    """coded_block_flag ctxIdxInc = condA + 2*condB (§9.3.3.1.1.9);
    unavailable neighbors read 1 when the CURRENT macroblock is intra
    and 0 when it is inter (the spec's asymmetry, r14)."""
    un = 1 if intra else 0

    def blk_cbf(arr, r_, c_, sz) -> int:
        if not ctx._blk_avail(arr, r_, c_, mb, sz):
            return un
        return 1 if arr[r_, c_] > 0 else 0

    if cat in (_CAT_L16AC, _CAT_L4):
        a = blk_cbf(ctx.nc_y, rb, cb_ - 1, 4)
        b = blk_cbf(ctx.nc_y, rb - 1, cb_, 4)
    elif cat == _CAT_CAC:
        a = blk_cbf(ctx.nc_c[comp], rb, cb_ - 1, 2)
        b = blk_cbf(ctx.nc_c[comp], rb - 1, cb_, 2)
    else:  # DC categories: whole-MB neighbors
        slot = 0 if cat == _CAT_L16DC else 1 + comp
        left, top = _mb_nbrs(ctx, mb)

        def mb_cbf(n: int) -> int:
            if n < 0 or ctx.mb_kind[n] < 0:
                return un  # unavailable: 1 intra-current, 0 inter
            v = ctx.cbf_dc[n, slot]
            return int(v) if v >= 0 else 0

        a, b = mb_cbf(left), mb_cbf(top)
    return a + 2 * b


def _decode_res_cabac(cd: _CabacDec, ctx: _PicCtx, cat: int, mb: int,
                      rb: int, cb_: int, comp: int, n: int,
                      intra: bool = True) -> list:
    """residual_block_cabac (§7.3.5.3.3) -> zigzag coefficient list of
    length ``n`` (same shape _decode_residual returns for CAVLC)."""
    coeffs = [0] * n
    cbf = cd.decision(
        _CC_CBF + cat * 4 + _cbf_ctx(ctx, cat, mb, rb, cb_, comp, intra)
    )
    if not cbf:
        return coeffs
    sig = []
    i = 0
    while i < n - 1:
        if cd.decision(_CC_SIG + cat * 15 + min(i, 14)):
            sig.append(i)
            if cd.decision(_CC_LAST + cat * 15 + min(i, 14)):
                break
        i += 1
    else:
        sig.append(n - 1)
    num_eq1 = num_gt1 = 0
    for pos in reversed(sig):
        inc0 = 0 if num_gt1 else min(4, 1 + num_eq1)
        if cd.decision(_CC_LVL + cat * 10 + inc0):
            inc = 5 + min(4, num_gt1)
            prefix = 1
            while prefix < 14 and cd.decision(_CC_LVL + cat * 10 + inc):
                prefix += 1
            level = 1 + prefix
            if prefix == 14:  # UEG0 bypass suffix: 15 + EG0(value)
                v = 0
                k = 0
                while cd.bypass():
                    v += 1 << k
                    k += 1
                    if k > 20:
                        raise UnsupportedMediaError(
                            "h264: CABAC level suffix overrun"
                        )
                for i in range(k - 1, -1, -1):
                    v += cd.bypass() << i
                level = 15 + v
            num_gt1 += 1
        else:
            level = 1
            num_eq1 += 1
        if cd.bypass():
            level = -level
        coeffs[pos] = level
    return coeffs


def _cbp_luma_ctx(ctx: _PicCtx, mb: int, b: int, bits_so_far: int) -> int:
    """CBP luma bin ctxIdxInc (§9.3.3.1.1.4): condN = 0 when the
    neighbor 8x8 quadrant's cbp bit is 1 or unavailable-with-bit-set
    semantics — bit set (or neighbor missing) -> 0, else 1."""
    left_mb, top_mb = _mb_nbrs(ctx, mb)

    def quad_bit(n_mb_: int, q: int) -> int:
        if n_mb_ < 0 or ctx.mb_kind[n_mb_] < 0:
            return 1  # unavailable reads as coded (condTerm 0)
        if ctx.mb_kind[n_mb_] == 2:  # I_PCM: all coefficients present
            return 1
        return (int(ctx.mb_cbp[n_mb_]) >> q) & 1

    if b & 1:  # left neighbor quadrant is in this MB
        a_bit = (bits_so_far >> (b - 1)) & 1
    else:
        a_bit = quad_bit(left_mb, b + 1)
    if b & 2:  # top neighbor quadrant is in this MB
        b_bit = (bits_so_far >> (b - 2)) & 1
    else:
        b_bit = quad_bit(top_mb, b + 2)
    return (0 if a_bit else 1) + 2 * (0 if b_bit else 1)


def _cbp_chroma_ctx(ctx: _PicCtx, mb: int, bin_idx: int) -> int:
    left_mb, top_mb = _mb_nbrs(ctx, mb)

    def cc(n_mb_: int) -> int:
        if n_mb_ < 0 or ctx.mb_kind[n_mb_] < 0:
            return 0
        if ctx.mb_kind[n_mb_] == 2:
            return 2
        return int(ctx.mb_cbp[n_mb_]) >> 4

    a, b = cc(left_mb), cc(top_mb)
    if bin_idx == 0:
        return (1 if a else 0) + 2 * (1 if b else 0)
    return 4 + (1 if a == 2 else 0) + 2 * (1 if b == 2 else 0)


def _mbtype_ctx(ctx: _PicCtx, mb: int) -> int:
    left_mb, top_mb = _mb_nbrs(ctx, mb)

    def cond(n: int) -> int:
        return 1 if (n >= 0 and ctx.mb_kind[n] > 0) else 0

    return cond(left_mb) + cond(top_mb)


def _cpm_ctx(ctx: _PicCtx, mb: int) -> int:
    left_mb, top_mb = _mb_nbrs(ctx, mb)

    def cond(n: int) -> int:
        return 1 if (n >= 0 and ctx.mb_kind[n] >= 0
                     and ctx.mb_cpm[n] != 0) else 0

    return cond(left_mb) + cond(top_mb)


def _dec_qp_delta(cd: _CabacDec, prev_nonzero: bool) -> int:
    """mb_qp_delta: unary binarization of the se(v)-style mapping,
    ctxIdxInc 0/1 for bin 0 (previous MB's delta nonzero), 2 for
    bin 1, 3 for bins 2+ (§9.3.3.1.1.5)."""
    if not cd.decision(_CC_QPD + (1 if prev_nonzero else 0)):
        return 0
    k = 1
    if cd.decision(_CC_QPD + 2):
        k = 2
        while cd.decision(_CC_QPD + 3):
            k += 1
            if k > 52:
                raise UnsupportedMediaError("h264: mb_qp_delta overrun")
    # inverse of the se(v) mapping: odd k -> positive
    return (k + 1) // 2 if k & 1 else -(k // 2)


def _enc_qp_delta(ce: _CabacEnc, delta: int, prev_nonzero: bool) -> None:
    k = 2 * delta - 1 if delta > 0 else -2 * delta
    ce.decision(_CC_QPD + (1 if prev_nonzero else 0), 1 if k else 0)
    if not k:
        return
    ce.decision(_CC_QPD + 2, 1 if k >= 2 else 0)
    for _ in range(k - 2):
        ce.decision(_CC_QPD + 3, 1)
    if k >= 2:
        ce.decision(_CC_QPD + 3, 0)


# ---------------------------------------------------------------------------
# CABAC P/B slices (r14): inter syntax binarizations + context
# increments over the r13 engine.  The motion machinery (MC, direct,
# WP, DPB) is shared with the CAVLC path; only the entropy layer is
# new.  Same derived-init honesty pattern as the I-slice section.
# ---------------------------------------------------------------------------


def _ensure_cabac_inter_state(ctx: _PicCtx) -> None:
    """Per-picture conditioning state for the inter syntax elements:
    |mvd| and ref_idx per 4x4 PER LIST as decoded (skip/direct/intra
    partitions stay at the 0 / -1 defaults, which the spec's condTerm
    rules read as 'no contribution'); per-MB skip and direct flags."""
    if hasattr(ctx, "camvd"):
        return
    h4, w4 = ctx.ref.shape
    ctx.camvd = np.zeros((2, h4, w4, 2), np.int32)
    ctx.cref = np.full((2, h4, w4), -1, np.int32)
    n_mb = ctx.mb_kind.shape[0]
    ctx.cskip = np.zeros(n_mb, np.uint8)
    ctx.cdirect = np.zeros(n_mb, np.uint8)


def _skip_flag_ctx(ctx: _PicCtx, mb: int) -> int:
    """mb_skip_flag ctxIdxInc: one per available NOT-skipped
    neighbor (§9.3.3.1.1.1)."""
    left, top = _mb_nbrs(ctx, mb)

    def cond(n: int) -> int:
        return 1 if (n >= 0 and not ctx.cskip[n]) else 0

    return cond(left) + cond(top)


def _bmbt_ctx(ctx: _PicCtx, mb: int) -> int:
    """B mb_type bin0 ctxIdxInc: one per available neighbor that is
    neither B_Skip nor B_Direct_16x16 (§9.3.3.1.1.3)."""
    left, top = _mb_nbrs(ctx, mb)

    def cond(n: int) -> int:
        return 1 if (
            n >= 0 and not ctx.cskip[n] and not ctx.cdirect[n]
        ) else 0

    return cond(left) + cond(top)


def _ref_idx_ctx(ctx: _PicCtx, lx: int, rb: int, cb: int, mb: int) -> int:
    """ref_idx bin0 ctxIdxInc = condA + 2*condB, condTerm = 1 only for
    an available neighbor 4x4 explicitly coded with ref_idx > 0 in the
    same list (§9.3.3.1.1.6; skip/direct/intra read 0)."""

    def cond(r_, c_):
        if not ctx._blk_avail(ctx.nc_y, r_, c_, mb, 4):
            return 0
        return 1 if ctx.cref[lx, r_, c_] > 0 else 0

    return cond(rb, cb - 1) + 2 * cond(rb - 1, cb)


def _mvd_comp_ctx(ctx: _PicCtx, lx: int, comp: int, rb: int, cb: int,
                  mb: int) -> int:
    """mvd bin0 ctxIdxInc from the neighbor |mvd| sum for the same
    component and list: < 3 -> 0, 3..32 -> 1, > 32 -> 2
    (§9.3.3.1.1.7)."""
    s = 0
    for r_, c_ in ((rb, cb - 1), (rb - 1, cb)):
        if ctx._blk_avail(ctx.nc_y, r_, c_, mb, 4):
            s += int(ctx.camvd[lx, r_, c_, comp])
    return 0 if s < 3 else (1 if s <= 32 else 2)


class _CabacInterES:
    """Entropy source for the shared inter macroblock parse: CABAC
    reads for ref_idx / mvd / sub_mb_type / residual, storing the
    conditioning state at read time (decode order, as the spec's
    neighbor derivations require).  The CAVLC path passes es=None and
    keeps its ue/se/te reads."""

    def __init__(self, cd: _CabacDec, ctx: _PicCtx):
        self.cd = cd
        self.ctx = ctx
        self.prev_qpd = False
        _ensure_cabac_inter_state(ctx)

    def ref(self, lx, n, rb, cb, h4, w4, mb) -> int:
        cd, ctx = self.cd, self.ctx
        ri = 0
        if n > 1:
            if cd.decision(_CC_REF + _ref_idx_ctx(ctx, lx, rb, cb, mb)):
                ri = 1
                while cd.decision(_CC_REF + (4 if ri == 1 else 5)):
                    ri += 1
                    if ri >= n:
                        raise UnsupportedMediaError(
                            "h264: ref_idx out of range"
                        )
        ctx.cref[lx, rb : rb + h4, cb : cb + w4] = ri
        return ri

    def _mvd_comp(self, lx, comp, rb, cb, mb) -> int:
        cd = self.cd
        base = _CC_MVDX if comp == 0 else _CC_MVDY
        if not cd.decision(
            base + _mvd_comp_ctx(self.ctx, lx, comp, rb, cb, mb)
        ):
            return 0
        v = 1
        while v < 9:
            if not cd.decision(base + 3 + min(v - 1, 3)):
                break
            v += 1
        if v == 9:  # UEG3 bypass suffix
            k = 3
            while cd.bypass():
                v += 1 << k
                k += 1
                if k > 24:
                    raise UnsupportedMediaError(
                        "h264: CABAC mvd suffix overrun"
                    )
            while k:
                k -= 1
                v += cd.bypass() << k
        return -v if cd.bypass() else v

    def mvd(self, lx, rb, cb, h4, w4, mb):
        ctx = self.ctx
        dx = self._mvd_comp(lx, 0, rb, cb, mb)
        ctx.camvd[lx, rb : rb + h4, cb : cb + w4, 0] = abs(dx)
        dy = self._mvd_comp(lx, 1, rb, cb, mb)
        ctx.camvd[lx, rb : rb + h4, cb : cb + w4, 1] = abs(dy)
        return dx, dy

    def sub_p(self) -> int:
        cd = self.cd
        if cd.decision(_CC_PSUB):
            return 0
        if not cd.decision(_CC_PSUB + 1):
            return 1
        return 2 if cd.decision(_CC_PSUB + 2) else 3

    def sub_b(self) -> int:
        cd = self.cd
        if not cd.decision(_CC_BSUB):
            return 0
        if not cd.decision(_CC_BSUB + 1):
            return 1 + cd.decision(_CC_BSUB + 3)
        t = 3
        if cd.decision(_CC_BSUB + 2):
            if cd.decision(_CC_BSUB + 3):
                return 11 + cd.decision(_CC_BSUB + 3)
            t += 4
        t += 2 * cd.decision(_CC_BSUB + 3)
        t += cd.decision(_CC_BSUB + 3)
        return t

    def residual(self, ctx, pps, mb) -> None:
        self.prev_qpd = _inter_residual_cabac(
            self.cd, ctx, pps, mb, self.prev_qpd
        )


def _inter_residual_cabac(cd: _CabacDec, ctx: _PicCtx, pps: _PPS,
                          mb_idx: int, prev_qpd: bool) -> bool:
    """CABAC twin of :func:`_inter_residual`: CBP bins, mb_qp_delta,
    residual blocks (inter context asymmetry), reconstruction onto the
    MC prediction already in the picture planes.  Returns whether
    mb_qp_delta was nonzero."""
    my, mx = divmod(mb_idx, ctx.mb_w)
    br, bc = my * 4, mx * 4
    crow, ccol = my * 2, mx * 2
    cy0, cx0 = my * 8, mx * 8
    cbp_luma = 0
    for b in range(4):
        if cd.decision(
            _CC_CBP_L + _cbp_luma_ctx(ctx, mb_idx, b, cbp_luma)
        ):
            cbp_luma |= 1 << b
    cbp_chroma = 0
    if cd.decision(_CC_CBP_C + _cbp_chroma_ctx(ctx, mb_idx, 0)):
        cbp_chroma = (
            2 if cd.decision(_CC_CBP_C + _cbp_chroma_ctx(ctx, mb_idx, 1))
            else 1
        )
    qpd_nonzero = False
    if cbp_luma or cbp_chroma:
        delta = _dec_qp_delta(cd, prev_qpd)
        qpd_nonzero = delta != 0
        ctx.qp = (ctx.qp + delta + 52) % 52
    qpc = _chroma_qp(ctx.qp, pps.chroma_qp_index_offset)
    for blk in range(16):
        dy, dx = _BLK4_ORDER[blk]
        rb, cb_ = br + dy, bc + dx
        py, px = rb * 4, cb_ * 4
        if cbp_luma & (1 << (blk // 4)):
            coeffs = _decode_res_cabac(
                cd, ctx, _CAT_L4, mb_idx, rb, cb_, 0, 16, intra=False
            )
            ctx.nc_y[rb, cb_] = 16 - coeffs.count(0)
            res = _itransform4x4(_dequant4x4(coeffs, ctx.qp, False))
            pred = ctx.y[py : py + 4, px : px + 4].astype(np.int64)
            ctx.y[py : py + 4, px : px + 4] = _clip_u8(pred + res)
        else:
            ctx.nc_y[rb, cb_] = 0
    dc_lists = [[0] * 4, [0] * 4]
    if cbp_chroma:
        for comp in range(2):
            dc_lists[comp] = _decode_res_cabac(
                cd, ctx, _CAT_CDC, mb_idx, crow, ccol, comp, 4,
                intra=False,
            )
            ctx.cbf_dc[mb_idx, 1 + comp] = (
                1 if any(dc_lists[comp]) else 0
            )
    else:
        ctx.cbf_dc[mb_idx, 1] = ctx.cbf_dc[mb_idx, 2] = 0
    ac_lists = [[None] * 4, [None] * 4]
    if cbp_chroma & 2:
        for comp in range(2):
            for blk in range(4):
                cdy, cdx = divmod(blk, 2)
                ac = _decode_res_cabac(
                    cd, ctx, _CAT_CAC, mb_idx,
                    crow + cdy, ccol + cdx, comp, 15, intra=False,
                )
                ac_lists[comp][blk] = ac
                ctx.nc_c[comp][crow + cdy, ccol + cdx] = (
                    15 - ac.count(0)
                )
    else:
        for comp in range(2):
            ctx.nc_c[comp][crow : crow + 2, ccol : ccol + 2] = 0
    if cbp_chroma:
        for comp, plane in ((0, ctx.u), (1, ctx.v)):
            cmat = np.array(
                [[dc_lists[comp][0], dc_lists[comp][1]],
                 [dc_lists[comp][2], dc_lists[comp][3]]],
                np.int64,
            )
            dcc = _scale_chroma_dc(_hadamard2x2(cmat), qpc)
            for blk in range(4):
                cdy, cdx = divmod(blk, 2)
                ac = ac_lists[comp][blk]
                d = (
                    _dequant4x4(ac, qpc, True)
                    if ac is not None
                    else [[0, 0, 0, 0] for _ in range(4)]
                )
                d[0][0] = int(dcc[cdy, cdx])
                res = _itransform4x4(d)
                py, px = cy0 + cdy * 4, cx0 + cdx * 4
                pred = plane[py : py + 4, px : px + 4].astype(np.int64)
                plane[py : py + 4, px : px + 4] = _clip_u8(pred + res)
    ctx.mode4[br : br + 4, bc : bc + 4] = 2
    ctx.mb_cbp[mb_idx] = cbp_luma | (cbp_chroma << 4)
    ctx.cbf_dc[mb_idx, 0] = -1
    return qpd_nonzero


class _CabacInterWriter:
    """Encoder twin of :class:`_CabacInterES`: identical context
    trajectory by construction (same conditioning reads, same storage
    order)."""

    def __init__(self, ce: _CabacEnc, ctx: _PicCtx):
        self.ce = ce
        self.ctx = ctx
        self.prev_qpd = False
        _ensure_cabac_inter_state(ctx)

    def ref(self, lx, n, ri, rb, cb, h4, w4, mb) -> None:
        ce, ctx = self.ce, self.ctx
        if n > 1:
            for b in range(ri):
                ce.decision(
                    _CC_REF + (
                        _ref_idx_ctx(ctx, lx, rb, cb, mb) if b == 0
                        else (4 if b == 1 else 5)
                    ),
                    1,
                )
            ce.decision(
                _CC_REF + (
                    _ref_idx_ctx(ctx, lx, rb, cb, mb) if ri == 0
                    else (4 if ri == 1 else 5)
                ),
                0,
            )
        ctx.cref[lx, rb : rb + h4, cb : cb + w4] = ri

    def _mvd_comp(self, lx, comp, d, rb, cb, mb) -> None:
        ce = self.ce
        base = _CC_MVDX if comp == 0 else _CC_MVDY
        v = abs(d)
        inc0 = _mvd_comp_ctx(self.ctx, lx, comp, rb, cb, mb)
        for b in range(min(v, 9)):
            ce.decision(base + (inc0 if b == 0 else 3 + min(b - 1, 3)), 1)
        if v < 9:
            ce.decision(base + (inc0 if v == 0 else 3 + min(v - 1, 3)), 0)
        else:  # UEG3 bypass suffix
            u = v - 9
            k = 3
            while u >= (1 << k):
                ce.bypass(1)
                u -= 1 << k
                k += 1
            ce.bypass(0)
            for i in range(k - 1, -1, -1):
                ce.bypass((u >> i) & 1)
        if v:
            ce.bypass(1 if d < 0 else 0)

    def mvd(self, lx, dx, dy, rb, cb, h4, w4, mb) -> None:
        ctx = self.ctx
        self._mvd_comp(lx, 0, dx, rb, cb, mb)
        ctx.camvd[lx, rb : rb + h4, cb : cb + w4, 0] = abs(dx)
        self._mvd_comp(lx, 1, dy, rb, cb, mb)
        ctx.camvd[lx, rb : rb + h4, cb : cb + w4, 1] = abs(dy)

    def sub_p(self, s: int) -> None:
        ce = self.ce
        if s == 0:
            ce.decision(_CC_PSUB, 1)
            return
        ce.decision(_CC_PSUB, 0)
        if s == 1:
            ce.decision(_CC_PSUB + 1, 0)
            return
        ce.decision(_CC_PSUB + 1, 1)
        ce.decision(_CC_PSUB + 2, 1 if s == 2 else 0)

    def sub_b(self, s: int) -> None:
        ce = self.ce
        if s == 0:
            ce.decision(_CC_BSUB, 0)
            return
        ce.decision(_CC_BSUB, 1)
        if s in (1, 2):
            ce.decision(_CC_BSUB + 1, 0)
            ce.decision(_CC_BSUB + 3, s - 1)
            return
        ce.decision(_CC_BSUB + 1, 1)
        if s in (11, 12):
            ce.decision(_CC_BSUB + 2, 1)
            ce.decision(_CC_BSUB + 3, 1)
            ce.decision(_CC_BSUB + 3, s - 11)
            return
        if s >= 7:
            ce.decision(_CC_BSUB + 2, 1)
            ce.decision(_CC_BSUB + 3, 0)
            rem = s - 7
        else:
            ce.decision(_CC_BSUB + 2, 0)
            rem = s - 3
        ce.decision(_CC_BSUB + 3, (rem >> 1) & 1)
        ce.decision(_CC_BSUB + 3, rem & 1)

    def p_mbtype(self, t: int) -> None:
        ce = self.ce
        ce.decision(_CC_PMBT, 0)
        if t in (0, 3):
            ce.decision(_CC_PMBT + 1, 0)
            ce.decision(_CC_PMBT + 2, 1 if t == 3 else 0)
        else:
            ce.decision(_CC_PMBT + 1, 1)
            ce.decision(_CC_PMBT + 3, 1 if t == 1 else 0)

    def b_mbtype(self, mb: int, t: int) -> None:
        ce, ctx = self.ce, self.ctx
        if t == 0:
            ce.decision(_CC_BMBT + _bmbt_ctx(ctx, mb), 0)
            return
        ce.decision(_CC_BMBT + _bmbt_ctx(ctx, mb), 1)
        if t in (1, 2):
            ce.decision(_CC_BMBT + 3, 0)
            ce.decision(_CC_BMBT + 5, t - 1)
            return
        ce.decision(_CC_BMBT + 3, 1)
        if 3 <= t <= 10:
            bits, extra = t - 3, None
        elif t == 11:
            bits, extra = 14, None
        elif t == 22:
            bits, extra = 15, None
        else:  # 12..21 -> 5-bit code (t + 4)
            code = t + 4
            bits, extra = code >> 1, code & 1
        ce.decision(_CC_BMBT + 4, (bits >> 3) & 1)
        ce.decision(_CC_BMBT + 5, (bits >> 2) & 1)
        ce.decision(_CC_BMBT + 5, (bits >> 1) & 1)
        ce.decision(_CC_BMBT + 5, bits & 1)
        if extra is not None:
            ce.decision(_CC_BMBT + 5, extra)

    def residual(self, ctx, mb, cbp, lcoeffs, cdcq, cacq) -> None:
        self.prev_qpd = _enc_inter_residual_cabac(
            self.ce, ctx, mb, cbp, lcoeffs, cdcq, cacq, self.prev_qpd
        )


def _enc_inter_residual_cabac(ce: _CabacEnc, ctx: _PicCtx, mb: int,
                              cbp: int, lcoeffs, cdcq, cacq,
                              prev_qpd: bool) -> bool:
    """CABAC-emit the inter residual with the decoder's exact context
    trajectory and nC/cbf bookkeeping (qp delta always 0 — the fixture
    encoders keep one QP)."""
    my, mx = divmod(mb, ctx.mb_w)
    br, bc = my * 4, mx * 4
    crow, ccol = my * 2, mx * 2
    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
    bits = 0
    for b in range(4):
        v = (cbp_luma >> b) & 1
        ce.decision(_CC_CBP_L + _cbp_luma_ctx(ctx, mb, b, bits), v)
        bits |= v << b
    ce.decision(
        _CC_CBP_C + _cbp_chroma_ctx(ctx, mb, 0),
        1 if cbp_chroma else 0,
    )
    if cbp_chroma:
        ce.decision(
            _CC_CBP_C + _cbp_chroma_ctx(ctx, mb, 1),
            1 if cbp_chroma == 2 else 0,
        )
    qpd = False
    if cbp:
        _enc_qp_delta(ce, 0, prev_qpd)
    for blk in range(16):
        dy, dx = _BLK4_ORDER[blk]
        rb, cb_ = br + dy, bc + dx
        if cbp_luma & (1 << (blk // 4)):
            _enc_res_cabac(
                ce, ctx, _CAT_L4, mb, rb, cb_, 0, lcoeffs[blk],
                intra=False,
            )
            ctx.nc_y[rb, cb_] = 16 - list(lcoeffs[blk]).count(0)
        else:
            ctx.nc_y[rb, cb_] = 0
    if cbp_chroma:
        for comp in range(2):
            _enc_res_cabac(
                ce, ctx, _CAT_CDC, mb, crow, ccol, comp,
                list(cdcq[comp]), intra=False,
            )
            ctx.cbf_dc[mb, 1 + comp] = (
                1 if any(cdcq[comp]) else 0
            )
    else:
        ctx.cbf_dc[mb, 1] = ctx.cbf_dc[mb, 2] = 0
    if cbp_chroma & 2:
        for comp in range(2):
            for blk in range(4):
                cdy, cdx = divmod(blk, 2)
                _enc_res_cabac(
                    ce, ctx, _CAT_CAC, mb, crow + cdy, ccol + cdx,
                    comp, list(cacq[comp][blk]), intra=False,
                )
                ctx.nc_c[comp][crow + cdy, ccol + cdx] = (
                    15 - list(cacq[comp][blk]).count(0)
                )
    else:
        for comp in range(2):
            ctx.nc_c[comp][crow : crow + 2, ccol : ccol + 2] = 0
    ctx.mode4[br : br + 4, bc : bc + 4] = 2
    ctx.mb_cbp[mb] = cbp_luma | (cbp_chroma << 4)
    ctx.cbf_dc[mb, 0] = -1
    return qpd


def _decode_intra_mb_cabac(cd: _CabacDec, ctx: _PicCtx, pps: _PPS,
                           mb_idx: int, prev_qpd_nonzero: bool,
                           mbt_base: int | None = None) -> bool:
    """One CABAC intra macroblock: parse via the arithmetic engine,
    reconstruct via the SAME prediction/dequant/IDCT helpers as the
    CAVLC path.  ``mbt_base`` None = I-slice mb_type (bin0
    neighbor-conditioned on the shared _CC_MBTYPE block); else the
    intra SUFFIX inside a P/B macroblock (fixed per-bin contexts at
    the given base, no neighbor conditioning — r14).  Returns whether
    mb_qp_delta was nonzero."""
    if ctx.u is None:
        raise UnsupportedMediaError(
            "h264: entropy-coded 4:0:0 macroblocks need the optional "
            "codec library (av) — monochrome decodes I_PCM only"
        )
    my, mx = divmod(mb_idx, ctx.mb_w)
    br, bc = my * 4, mx * 4
    crow, ccol = my * 2, mx * 2
    y0, x0 = my * 16, mx * 16
    cy0, cx0 = my * 8, mx * 8
    ctx.ref[br : br + 4, bc : bc + 4] = -1
    ctx.ref1[br : br + 4, bc : bc + 4] = -1
    qpd_nonzero = False

    # ---- mb_type (Table 9-36 I tree / the P-B intra suffix)
    if mbt_base is None:
        bin0 = cd.decision(_CC_MBTYPE + _mbtype_ctx(ctx, mb_idx))
        c_cbpl, c_cbpc, c_mode = _CC_I16_CBPL, _CC_I16_CBPC, _CC_I16_MODE
    else:
        bin0 = cd.decision(mbt_base)
        c_cbpl, c_cbpc, c_mode = mbt_base + 1, mbt_base + 2, mbt_base + 4
    if not bin0:
        i16 = False
        ctx.mb_kind[mb_idx] = 0
    else:
        if cd.terminate():
            # I_PCM (r14): byte-align the reader (this engine's
            # post-terminate position equals the emitted-bit count,
            # property-pinned), read the raw samples, re-init the
            # engine with contexts retained (§9.3.1.2)
            r = cd.r
            while r.pos & 7:
                if r.read(1):
                    raise UnsupportedMediaError(
                        "h264: pcm_alignment_zero_bit is one"
                    )
            luma = np.frombuffer(r.bytes_at(256), np.uint8)
            ctx.y[y0 : y0 + 16, x0 : x0 + 16] = luma.reshape(16, 16)
            cb = np.frombuffer(r.bytes_at(64), np.uint8)
            cr = np.frombuffer(r.bytes_at(64), np.uint8)
            ctx.u[cy0 : cy0 + 8, cx0 : cx0 + 8] = cb.reshape(8, 8)
            ctx.v[cy0 : cy0 + 8, cx0 : cx0 + 8] = cr.reshape(8, 8)
            ctx.nc_y[br : br + 4, bc : bc + 4] = 16
            ctx.nc_c[0][crow : crow + 2, ccol : ccol + 2] = 16
            ctx.nc_c[1][crow : crow + 2, ccol : ccol + 2] = 16
            ctx.mode4[br : br + 4, bc : bc + 4] = 2
            ctx.mb_kind[mb_idx] = 2
            ctx.cbf_dc[mb_idx] = 1  # I_PCM cbf reads 1 (§9.3.3.1.1.9)
            ctx.mb_qp[mb_idx] = 0  # QPY of I_PCM is 0 (§7.4.5)
            cd.reinit()
            return False  # mb_qp_delta treated as 0
        i16 = True
        ctx.mb_kind[mb_idx] = 1
        cbp_luma = 15 if cd.decision(c_cbpl) else 0
        if not cd.decision(c_cbpc):
            cbp_chroma = 0
        else:
            cbp_chroma = 2 if cd.decision(c_cbpc + 1) else 1
        pred16_mode = (cd.decision(c_mode) << 1) | cd.decision(
            c_mode + 1
        )

    if not i16:
        if pps.transform_8x8:
            raise UnsupportedMediaError(
                "h264: 8x8 transform needs the optional codec library (av)"
            )
        for blk in range(16):
            dy, dx = _BLK4_ORDER[blk]
            pred = ctx.pred_mode4(br + dy, bc + dx, mb_idx)
            if cd.decision(_CC_PREV4):
                mode = pred
            else:
                rem = (
                    (cd.decision(_CC_REM4))
                    | (cd.decision(_CC_REM4) << 1)
                    | (cd.decision(_CC_REM4) << 2)
                )
                mode = rem if rem < pred else rem + 1
            ctx.mode4[br + dy, bc + dx] = mode

    # ---- intra_chroma_pred_mode (TU cMax 3)
    chroma_mode = 0
    if cd.decision(_CC_CPM + _cpm_ctx(ctx, mb_idx)):
        chroma_mode = 1
        if cd.decision(_CC_CPM + 3):
            chroma_mode = 2
            if cd.decision(_CC_CPM + 3):
                chroma_mode = 3
    ctx.mb_cpm[mb_idx] = chroma_mode

    # ---- CBP (I_NxN) / qp delta
    if not i16:
        cbp_luma = 0
        for b in range(4):
            if cd.decision(
                _CC_CBP_L + _cbp_luma_ctx(ctx, mb_idx, b, cbp_luma)
            ):
                cbp_luma |= 1 << b
        cbp_chroma = 0
        if cd.decision(_CC_CBP_C + _cbp_chroma_ctx(ctx, mb_idx, 0)):
            cbp_chroma = (
                2 if cd.decision(_CC_CBP_C + _cbp_chroma_ctx(ctx, mb_idx, 1))
                else 1
            )
        if cbp_luma or cbp_chroma:
            delta = _dec_qp_delta(cd, prev_qpd_nonzero)
            qpd_nonzero = delta != 0
            ctx.qp = (ctx.qp + delta + 52) % 52
    else:
        delta = _dec_qp_delta(cd, prev_qpd_nonzero)
        qpd_nonzero = delta != 0
        ctx.qp = (ctx.qp + delta + 52) % 52
    ctx.mb_cbp[mb_idx] = cbp_luma | (cbp_chroma << 4)
    qpc = _chroma_qp(ctx.qp, pps.chroma_qp_index_offset)

    # ---- luma residual + reconstruction
    if i16:
        a_l = ctx._blk_avail(ctx.nc_y, br, bc - 1, mb_idx, 4)
        a_t = ctx._blk_avail(ctx.nc_y, br - 1, bc, mb_idx, 4)
        pred16 = _pred_block16(ctx.y, y0, x0, pred16_mode, a_l, a_t, 16)
        dc_coeffs = _decode_res_cabac(
            cd, ctx, _CAT_L16DC, mb_idx, br, bc, 0, 16
        )
        ctx.cbf_dc[mb_idx, 0] = 1 if any(dc_coeffs) else 0
        dmat = np.zeros((4, 4), np.int64)
        for s, c in enumerate(dc_coeffs):
            i, j = _ZIGZAG[s]
            dmat[i, j] = c
        dc = _scale_luma_dc(_hadamard4x4(dmat), ctx.qp)
        for blk in range(16):
            dy, dx = _BLK4_ORDER[blk]
            rb, cb_ = br + dy, bc + dx
            if cbp_luma:
                ac = _decode_res_cabac(
                    cd, ctx, _CAT_L16AC, mb_idx, rb, cb_, 0, 15
                )
                tc = 15 - ac.count(0)
                d = _dequant4x4(ac, ctx.qp, True)
            else:
                tc, d = 0, [[0, 0, 0, 0] for _ in range(4)]
            d[0][0] = int(dc[dy, dx])
            res = _itransform4x4(d)
            py, px = rb * 4, cb_ * 4
            ctx.y[py : py + 4, px : px + 4] = _clip_u8(
                pred16[dy * 4 : dy * 4 + 4, dx * 4 : dx * 4 + 4] + res
            )
            ctx.nc_y[rb, cb_] = tc
        ctx.mode4[br : br + 4, bc : bc + 4] = 2
    else:
        ctx.cbf_dc[mb_idx, 0] = -1
        for blk in range(16):
            dy, dx = _BLK4_ORDER[blk]
            rb, cb_ = br + dy, bc + dx
            if cbp_luma & (1 << (blk // 4)):
                coeffs = _decode_res_cabac(
                    cd, ctx, _CAT_L4, mb_idx, rb, cb_, 0, 16
                )
                tc = 16 - coeffs.count(0)
                res = _itransform4x4(_dequant4x4(coeffs, ctx.qp, False))
            else:
                tc, res = 0, 0
            py, px = rb * 4, cb_ * 4
            pred_px = _pred4x4(
                ctx.y, py, px, int(ctx.mode4[rb, cb_]),
                ctx._blk_avail(ctx.nc_y, rb, cb_ - 1, mb_idx, 4),
                ctx._blk_avail(ctx.nc_y, rb - 1, cb_, mb_idx, 4),
                ctx._blk_avail(ctx.nc_y, rb - 1, cb_ - 1, mb_idx, 4),
                ctx._blk_avail(ctx.nc_y, rb - 1, cb_ + 1, mb_idx, 4),
            )
            ctx.y[py : py + 4, px : px + 4] = _clip_u8(pred_px + res)
            ctx.nc_y[rb, cb_] = tc

    # ---- chroma residual + reconstruction (shared shape)
    dc_lists = [[0] * 4, [0] * 4]
    if cbp_chroma:
        for comp in range(2):
            dc_lists[comp] = _decode_res_cabac(
                cd, ctx, _CAT_CDC, mb_idx, crow, ccol, comp, 4
            )
            ctx.cbf_dc[mb_idx, 1 + comp] = (
                1 if any(dc_lists[comp]) else 0
            )
    else:
        ctx.cbf_dc[mb_idx, 1] = ctx.cbf_dc[mb_idx, 2] = 0
    ac_lists = [[None] * 4, [None] * 4]
    if cbp_chroma & 2:
        for comp in range(2):
            for blk in range(4):
                cdy, cdx = divmod(blk, 2)
                ac = _decode_res_cabac(
                    cd, ctx, _CAT_CAC, mb_idx,
                    crow + cdy, ccol + cdx, comp, 15,
                )
                ac_lists[comp][blk] = ac
                ctx.nc_c[comp][crow + cdy, ccol + cdx] = 15 - ac.count(0)
    if not (cbp_chroma & 2):
        for comp in range(2):
            ctx.nc_c[comp][crow : crow + 2, ccol : ccol + 2] = 0

    a_l = ctx._blk_avail(ctx.nc_c[0], crow, ccol - 1, mb_idx, 2)
    a_t = ctx._blk_avail(ctx.nc_c[0], crow - 1, ccol, mb_idx, 2)
    for comp, plane in ((0, ctx.u), (1, ctx.v)):
        if chroma_mode == 0:
            predc = _pred_chroma_dc(plane, cy0, cx0, a_l, a_t)
        elif chroma_mode == 3:
            predc = _pred_block16(plane, cy0, cx0, 3, a_l, a_t, 8)
        else:
            predc = _pred_block16(
                plane, cy0, cx0, 1 if chroma_mode == 1 else 0,
                a_l, a_t, 8,
            )
        cmat = np.array(
            [[dc_lists[comp][0], dc_lists[comp][1]],
             [dc_lists[comp][2], dc_lists[comp][3]]],
            np.int64,
        )
        dcc = _scale_chroma_dc(_hadamard2x2(cmat), qpc)
        for blk in range(4):
            cdy, cdx = divmod(blk, 2)
            ac = ac_lists[comp][blk]
            d = (
                _dequant4x4(ac, qpc, True)
                if ac is not None
                else [[0, 0, 0, 0] for _ in range(4)]
            )
            d[0][0] = int(dcc[cdy, cdx])
            res = _itransform4x4(d)
            py, px = cy0 + cdy * 4, cx0 + cdx * 4
            plane[py : py + 4, px : px + 4] = _clip_u8(
                predc[cdy * 4 : cdy * 4 + 4, cdx * 4 : cdx * 4 + 4] + res
            )
    return qpd_nonzero


def _decode_cabac_slice_data(r: _BitReader, ctx: _PicCtx, pps: _PPS,
                             first_mb: int, n_mbs: int,
                             slice_serial: int, db,
                             slice_kind: str = "I", dpb=None,
                             num_ref: int = 0, bl0=None, bl1=None,
                             spatial: bool = False,
                             inference: bool = False) -> int:
    """CABAC slice_data (§7.3.4 with entropy_coding_mode_flag): align,
    init the engine, decode MBs until end_of_slice_flag.  I slices
    (r13) and P/B slices (r14: mb_skip_flag, the Table 9-34 P/B
    mb_type and sub_mb_type binarizations, ref_idx/mvd contexts, the
    shared motion machinery).  Returns the next undecoded MB index."""
    db_idc, db_aoff, db_boff = db
    # cabac_alignment_one_bit(s): all 1 up to the byte boundary
    while r.pos & 7:
        if not r.read(1):
            raise UnsupportedMediaError(
                "h264: cabac_alignment_one_bit is zero"
            )
    cd = _CabacDec(r, _cabac_init_ctxs())
    es = _CabacInterES(cd, ctx) if slice_kind != "I" else None
    mb = first_mb
    prev_qpd = False
    while True:
        if mb >= n_mbs:
            raise UnsupportedMediaError(
                "h264: more macroblocks than the picture holds"
            )
        ctx.mb_slice[mb] = slice_serial
        ctx.db_idc[mb] = db_idc
        ctx.db_aoff[mb] = db_aoff
        ctx.db_boff[mb] = db_boff
        if slice_kind == "I":
            prev_qpd = _decode_intra_mb_cabac(cd, ctx, pps, mb, prev_qpd)
        elif slice_kind == "P":
            if cd.decision(_CC_SKIP_P + _skip_flag_ctx(ctx, mb)):
                ctx.cskip[mb] = 1
                _decode_pskip(ctx, mb, dpb[0])
                ctx.mb_kind[mb] = 3
                prev_qpd = False
            elif not cd.decision(_CC_PMBT):
                # P mb_type prefix: '00x' -> 16x16 / P_8x8, '01x' ->
                # 16x8 / 8x16 (Table 9-34 via the prefix tree)
                if not cd.decision(_CC_PMBT + 1):
                    t = 3 if cd.decision(_CC_PMBT + 2) else 0
                else:
                    t = 1 if cd.decision(_CC_PMBT + 3) else 2
                es.prev_qpd = prev_qpd
                _decode_inter_mb(
                    r, ctx, pps, mb, t, dpb, num_ref, es=es
                )
                ctx.mb_kind[mb] = 3
                prev_qpd = es.prev_qpd
            else:  # intra-in-P suffix (fixed contexts)
                prev_qpd = _decode_intra_mb_cabac(
                    cd, ctx, pps, mb, prev_qpd, mbt_base=_CC_IMBT_P
                )
        else:  # B
            if cd.decision(_CC_SKIP_B + _skip_flag_ctx(ctx, mb)):
                ctx.cskip[mb] = 1
                _decode_bskip(ctx, mb, bl0, bl1, spatial, inference)
                ctx.mb_kind[mb] = 3
                prev_qpd = False
            else:
                t = None
                if not cd.decision(_CC_BMBT + _bmbt_ctx(ctx, mb)):
                    t = 0  # B_Direct_16x16
                    ctx.cdirect[mb] = 1
                elif not cd.decision(_CC_BMBT + 3):
                    t = 1 + cd.decision(_CC_BMBT + 5)
                else:
                    bits = cd.decision(_CC_BMBT + 4) << 3
                    bits |= cd.decision(_CC_BMBT + 5) << 2
                    bits |= cd.decision(_CC_BMBT + 5) << 1
                    bits |= cd.decision(_CC_BMBT + 5)
                    if bits < 8:
                        t = bits + 3
                    elif bits == 13:
                        t = None  # intra-in-B suffix below
                    elif bits == 14:
                        t = 11
                    elif bits == 15:
                        t = 22
                    else:
                        t = ((bits << 1) | cd.decision(_CC_BMBT + 5)) - 4
                if t is None:
                    prev_qpd = _decode_intra_mb_cabac(
                        cd, ctx, pps, mb, prev_qpd, mbt_base=_CC_IMBT_B
                    )
                else:
                    es.prev_qpd = prev_qpd
                    _decode_b_mb(
                        r, ctx, pps, mb, t, bl0, bl1, spatial,
                        inference, es=es,
                    )
                    ctx.mb_kind[mb] = 3
                    prev_qpd = es.prev_qpd
        if ctx.mb_kind[mb] != 2:  # I_PCM pinned its QPY of 0
            ctx.mb_qp[mb] = ctx.qp
        mb += 1
        ctx.filled = mb
        if cd.terminate():  # end_of_slice_flag
            return mb


def _enc_res_cabac(ce: _CabacEnc, ctx: _PicCtx, cat: int, mb: int,
                   rb: int, cb_: int, comp: int, coeffs: list,
                   intra: bool = True) -> None:
    """Encoder twin of :func:`_decode_res_cabac` — identical context
    trajectory by construction (same neighbor-state reads, same order)."""
    n = len(coeffs)
    cbf = 1 if any(coeffs) else 0
    ce.decision(
        _CC_CBF + cat * 4 + _cbf_ctx(ctx, cat, mb, rb, cb_, comp, intra),
        cbf,
    )
    if not cbf:
        return
    last_pos = max(i for i, c in enumerate(coeffs) if c)
    for i in range(n - 1):
        sig = 1 if coeffs[i] else 0
        ce.decision(_CC_SIG + cat * 15 + min(i, 14), sig)
        if sig:
            is_last = 1 if i == last_pos else 0
            ce.decision(_CC_LAST + cat * 15 + min(i, 14), is_last)
            if is_last:
                break
    num_eq1 = num_gt1 = 0
    for pos in range(last_pos, -1, -1):
        c = coeffs[pos]
        if not c:
            continue
        mag = abs(c)
        inc0 = 0 if num_gt1 else min(4, 1 + num_eq1)
        if mag == 1:
            ce.decision(_CC_LVL + cat * 10 + inc0, 0)
            num_eq1 += 1
        else:
            ce.decision(_CC_LVL + cat * 10 + inc0, 1)
            inc = 5 + min(4, num_gt1)
            # TU cMax 14 over absLevelMinus1: bin0 above counts as the
            # first 1; 13 more 1s saturate the prefix (no terminator)
            prefix = min(mag - 1, 14)
            for _ in range(prefix - 1):
                ce.decision(_CC_LVL + cat * 10 + inc, 1)
            if prefix < 14:
                ce.decision(_CC_LVL + cat * 10 + inc, 0)
            else:
                v = mag - 15  # UEG0 suffix
                k = 0
                while v >= (1 << k):
                    v -= 1 << k
                    ce.bypass(1)
                    k += 1
                ce.bypass(0)
                for i in range(k - 1, -1, -1):
                    ce.bypass((v >> i) & 1)
            num_gt1 += 1
        ce.bypass(1 if c < 0 else 0)


def _encode_one_mb_cabac(ce: _CabacEnc, ctx: _PicCtx, mb: int,
                         f_idx: int, qp: int, qpc: int,
                         y_pad, u_pad, v_pad,
                         prev_qpd_nonzero: bool,
                         mbt_base: int | None = None) -> bool:
    """One CABAC intra macroblock: the SAME deterministic decision mix
    and reconstruction as :func:`_encode_one_mb` (I_PCM replaced by
    I_16x16 — I_PCM-inside-CABAC is seam-gated), emitted through the
    arithmetic engine.  ``mbt_base`` mirrors the decoder: None = the
    I-slice mb_type contexts, else the fixed-context intra suffix
    inside a P/B macroblock (r14).  Returns whether mb_qp_delta was
    nonzero."""
    my, mx = divmod(mb, ctx.mb_w)
    br, bc = my * 4, mx * 4
    crow, ccol = my * 2, mx * 2
    y0, x0 = my * 16, mx * 16
    cy0, cx0 = my * 8, mx * 8
    ctx.ref[br : br + 4, bc : bc + 4] = -1
    ctx.ref1[br : br + 4, bc : bc + 4] = -1
    ctx.mb_qp[mb] = qp
    kind = (mb * 5 + f_idx) % 7
    if kind == 6:  # I_PCM (r14: EncodeFlush + raw bytes + reinit)
        if mbt_base is None:
            ce.decision(_CC_MBTYPE + _mbtype_ctx(ctx, mb), 1)
        else:
            ce.decision(mbt_base, 1)
        ce.terminate(1)
        luma = y_pad[y0 : y0 + 16, x0 : x0 + 16]
        cb = u_pad[cy0 : cy0 + 8, cx0 : cx0 + 8]
        cr = v_pad[cy0 : cy0 + 8, cx0 : cx0 + 8]
        ce.put_pcm(
            luma.tobytes() + cb.tobytes() + cr.tobytes()
        )
        ce.reinit()
        ctx.y[y0 : y0 + 16, x0 : x0 + 16] = luma
        ctx.u[cy0 : cy0 + 8, cx0 : cx0 + 8] = cb
        ctx.v[cy0 : cy0 + 8, cx0 : cx0 + 8] = cr
        ctx.nc_y[br : br + 4, bc : bc + 4] = 16
        ctx.nc_c[0][crow : crow + 2, ccol : ccol + 2] = 16
        ctx.nc_c[1][crow : crow + 2, ccol : ccol + 2] = 16
        ctx.mode4[br : br + 4, bc : bc + 4] = 2
        ctx.mb_kind[mb] = 2
        ctx.cbf_dc[mb] = 1
        ctx.mb_qp[mb] = 0
        return False  # mb_qp_delta treated as 0

    a_l_mb = ctx._blk_avail(ctx.nc_y, br, bc - 1, mb, 4)
    a_t_mb = ctx._blk_avail(ctx.nc_y, br - 1, bc, mb, 4)

    # ---- chroma decisions (identical mix to the CAVLC encoder)
    ca_l = ctx._blk_avail(ctx.nc_c[0], crow, ccol - 1, mb, 2)
    ca_t = ctx._blk_avail(ctx.nc_c[0], crow - 1, ccol, mb, 2)
    cmodes = [0] + ([1] if ca_l else []) + ([2] if ca_t else []) + (
        [3] if ca_l and ca_t else []
    )
    chroma_mode = cmodes[(mb * 3 + f_idx) % len(cmodes)]
    cpreds, cdcq, cacq = [], [], []
    any_cdc = any_cac = False
    for plane_src, plane_rec in ((u_pad, ctx.u), (v_pad, ctx.v)):
        if chroma_mode == 0:
            predc = _pred_chroma_dc(plane_rec, cy0, cx0, ca_l, ca_t)
        elif chroma_mode == 3:
            predc = _pred_block16(plane_rec, cy0, cx0, 3, ca_l, ca_t, 8)
        else:
            predc = _pred_block16(
                plane_rec, cy0, cx0, 1 if chroma_mode == 1 else 0,
                ca_l, ca_t, 8,
            )
        resid = (
            plane_src[cy0 : cy0 + 8, cx0 : cx0 + 8].astype(np.int64) - predc
        )
        wmats = []
        dcs = np.zeros((2, 2), np.int64)
        for blk in range(4):
            cdy, cdx = divmod(blk, 2)
            w4 = _ftransform4x4(
                resid[cdy * 4 : cdy * 4 + 4, cdx * 4 : cdx * 4 + 4]
            )
            dcs[cdy, cdx] = w4[0][0]
            wmats.append(w4)
        hdc = _hadamard2x2(dcs)
        dq = [
            _quant_coeff(int(hdc[i, j]), qpc, 0, dc=True)
            for i, j in ((0, 0), (0, 1), (1, 0), (1, 1))
        ]
        aq = [_quant_block(w4, qpc, skip_dc=True) for w4 in wmats]
        any_cdc |= any(c != 0 for c in dq)
        any_cac |= any(c != 0 for blkq in aq for c in blkq)
        cpreds.append(predc)
        cdcq.append(dq)
        cacq.append(aq)
    cbp_chroma = 2 if any_cac else (1 if any_cdc else 0)

    i16 = kind >= 4
    modes, lcoeffs = [], []
    if not i16:
        for blk in range(16):
            dy, dx = _BLK4_ORDER[blk]
            rb, cb_ = br + dy, bc + dx
            a_l = ctx._blk_avail(ctx.nc_y, rb, cb_ - 1, mb, 4)
            a_t = ctx._blk_avail(ctx.nc_y, rb - 1, cb_, mb, 4)
            a_tl = ctx._blk_avail(ctx.nc_y, rb - 1, cb_ - 1, mb, 4)
            a_tr = ctx._blk_avail(ctx.nc_y, rb - 1, cb_ + 1, mb, 4)
            cands = [2]
            if a_t:
                cands += [0, 3, 7]
            if a_l:
                cands += [1, 8]
            if a_l and a_t and a_tl:
                cands += [4, 5, 6]
            mode = cands[(mb * 7 + blk * 3 + f_idx) % len(cands)]
            ctx.mode4[rb, cb_] = mode
            py, px = rb * 4, cb_ * 4
            pred = _pred4x4(ctx.y, py, px, mode, a_l, a_t, a_tl, a_tr)
            resid = (
                y_pad[py : py + 4, px : px + 4].astype(np.int64) - pred
            )
            coeffs = _quant_block(_ftransform4x4(resid), qp, skip_dc=False)
            res = _itransform4x4(_dequant4x4(coeffs, qp, False))
            ctx.y[py : py + 4, px : px + 4] = _clip_u8(pred + res)
            ctx.nc_y[rb, cb_] = 0  # provisional: marks decoded
            modes.append(mode)
            lcoeffs.append(coeffs)
        cbp_luma = 0
        for q in range(4):
            if any(
                c != 0 for blk in range(q * 4, q * 4 + 4)
                for c in lcoeffs[blk]
            ):
                cbp_luma |= 1 << q
        dcq = None
        acq = None
        pred16_mode = 0
    else:
        cands = [2]
        if a_t_mb:
            cands.append(0)
        if a_l_mb:
            cands.append(1)
        if a_l_mb and a_t_mb:
            cands.append(3)
        pred16_mode = cands[(mb + f_idx) % len(cands)]
        pred16 = _pred_block16(ctx.y, y0, x0, pred16_mode, a_l_mb, a_t_mb, 16)
        resid = y_pad[y0 : y0 + 16, x0 : x0 + 16].astype(np.int64) - pred16
        wmats, dcs = [], np.zeros((4, 4), np.int64)
        for blk in range(16):
            dy, dx = _BLK4_ORDER[blk]
            w4 = _ftransform4x4(
                resid[dy * 4 : dy * 4 + 4, dx * 4 : dx * 4 + 4]
            )
            dcs[dy, dx] = w4[0][0]
            wmats.append(w4)
        hdc = _hadamard4x4(dcs)
        dcq = [
            _quant_coeff(int(hdc[i, j]), qp, 0, dc=True) for i, j in _ZIGZAG
        ]
        acq = [_quant_block(w4, qp, skip_dc=True) for w4 in wmats]
        cbp_luma = 15 if any(c != 0 for blkq in acq for c in blkq) else 0
        dmat = np.zeros((4, 4), np.int64)
        for s, c in enumerate(dcq):
            i, j = _ZIGZAG[s]
            dmat[i, j] = c
        dc = _scale_luma_dc(_hadamard4x4(dmat), qp)
        for blk in range(16):
            dy, dx = _BLK4_ORDER[blk]
            rb, cb_ = br + dy, bc + dx
            d = (
                _dequant4x4(acq[blk], qp, True)
                if cbp_luma
                else [[0, 0, 0, 0] for _ in range(4)]
            )
            d[0][0] = int(dc[dy, dx])
            res = _itransform4x4(d)
            py, px = rb * 4, cb_ * 4
            ctx.y[py : py + 4, px : px + 4] = _clip_u8(
                pred16[dy * 4 : dy * 4 + 4, dx * 4 : dx * 4 + 4] + res
            )
            ctx.nc_y[rb, cb_] = 0  # provisional
        # non-I_NxN intra counts as DC for neighbor mode prediction
        ctx.mode4[br : br + 4, bc : bc + 4] = 2

    # ---- chroma recon (identical to the CAVLC encoder)
    for comp, plane in ((0, ctx.u), (1, ctx.v)):
        cmat = np.array(
            [[cdcq[comp][0], cdcq[comp][1]],
             [cdcq[comp][2], cdcq[comp][3]]],
            np.int64,
        )
        dcc = _scale_chroma_dc(_hadamard2x2(cmat), qpc)
        for blk in range(4):
            cdy, cdx = divmod(blk, 2)
            d = (
                _dequant4x4(cacq[comp][blk], qpc, True)
                if cbp_chroma & 2
                else [[0, 0, 0, 0] for _ in range(4)]
            )
            d[0][0] = int(dcc[cdy, cdx])
            res = _itransform4x4(d)
            py, px = cy0 + cdy * 4, cx0 + cdx * 4
            plane[py : py + 4, px : px + 4] = _clip_u8(
                cpreds[comp][cdy * 4 : cdy * 4 + 4,
                             cdx * 4 : cdx * 4 + 4] + res
            )

    # ---- CABAC emission (bitstream order == the decoder's reads)
    if mbt_base is None:
        ce.decision(_CC_MBTYPE + _mbtype_ctx(ctx, mb), 1 if i16 else 0)
        c_cbpl, c_cbpc, c_mode = _CC_I16_CBPL, _CC_I16_CBPC, _CC_I16_MODE
    else:
        ce.decision(mbt_base, 1 if i16 else 0)
        c_cbpl, c_cbpc, c_mode = mbt_base + 1, mbt_base + 2, mbt_base + 4
    ctx.mb_kind[mb] = 1 if i16 else 0
    if i16:
        ce.terminate(0)  # not I_PCM
        ce.decision(c_cbpl, 1 if cbp_luma else 0)
        ce.decision(c_cbpc, 1 if cbp_chroma else 0)
        if cbp_chroma:
            ce.decision(c_cbpc + 1, 1 if cbp_chroma == 2 else 0)
        ce.decision(c_mode, (pred16_mode >> 1) & 1)
        ce.decision(c_mode + 1, pred16_mode & 1)
    else:
        for blk in range(16):
            dy, dx = _BLK4_ORDER[blk]
            rb, cb_ = br + dy, bc + dx
            pred_mode = ctx.pred_mode4(rb, cb_, mb)
            mode = modes[blk]
            if mode == pred_mode:
                ce.decision(_CC_PREV4, 1)
            else:
                ce.decision(_CC_PREV4, 0)
                rem = mode if mode < pred_mode else mode - 1
                ce.decision(_CC_REM4, rem & 1)
                ce.decision(_CC_REM4, (rem >> 1) & 1)
                ce.decision(_CC_REM4, (rem >> 2) & 1)
    # chroma pred mode (TU cMax 3)
    ce.decision(_CC_CPM + _cpm_ctx(ctx, mb), 1 if chroma_mode else 0)
    if chroma_mode:
        ce.decision(_CC_CPM + 3, 1 if chroma_mode >= 2 else 0)
        if chroma_mode >= 2:
            ce.decision(_CC_CPM + 3, 1 if chroma_mode == 3 else 0)
    ctx.mb_cpm[mb] = chroma_mode
    if not i16:
        bits = 0
        for b in range(4):
            bit = (cbp_luma >> b) & 1
            ce.decision(_CC_CBP_L + _cbp_luma_ctx(ctx, mb, b, bits), bit)
            bits |= bit << b
        ce.decision(
            _CC_CBP_C + _cbp_chroma_ctx(ctx, mb, 0),
            1 if cbp_chroma else 0,
        )
        if cbp_chroma:
            ce.decision(
                _CC_CBP_C + _cbp_chroma_ctx(ctx, mb, 1),
                1 if cbp_chroma == 2 else 0,
            )
    ctx.mb_cbp[mb] = cbp_luma | (cbp_chroma << 4)
    qpd_nonzero = False
    if i16 or cbp_luma or cbp_chroma:
        _enc_qp_delta(ce, 0, prev_qpd_nonzero)

    # ---- residuals (same category/order as the decoder)
    if i16:
        _enc_res_cabac(ce, ctx, _CAT_L16DC, mb, br, bc, 0, dcq)
        ctx.cbf_dc[mb, 0] = 1 if any(dcq) else 0
        for blk in range(16):
            dy, dx = _BLK4_ORDER[blk]
            rb, cb_ = br + dy, bc + dx
            if cbp_luma:
                _enc_res_cabac(ce, ctx, _CAT_L16AC, mb, rb, cb_, 0,
                               acq[blk])
                ctx.nc_y[rb, cb_] = 15 - acq[blk].count(0)
            else:
                ctx.nc_y[rb, cb_] = 0
    else:
        ctx.cbf_dc[mb, 0] = -1
        for blk in range(16):
            dy, dx = _BLK4_ORDER[blk]
            rb, cb_ = br + dy, bc + dx
            if cbp_luma & (1 << (blk // 4)):
                _enc_res_cabac(ce, ctx, _CAT_L4, mb, rb, cb_, 0,
                               lcoeffs[blk])
                ctx.nc_y[rb, cb_] = 16 - lcoeffs[blk].count(0)
            else:
                ctx.nc_y[rb, cb_] = 0
    if cbp_chroma:
        for comp in range(2):
            _enc_res_cabac(ce, ctx, _CAT_CDC, mb, crow, ccol, comp,
                           cdcq[comp])
            ctx.cbf_dc[mb, 1 + comp] = 1 if any(cdcq[comp]) else 0
    else:
        ctx.cbf_dc[mb, 1] = ctx.cbf_dc[mb, 2] = 0
    if cbp_chroma & 2:
        for comp in range(2):
            for blk in range(4):
                cdy, cdx = divmod(blk, 2)
                _enc_res_cabac(
                    ce, ctx, _CAT_CAC, mb, crow + cdy, ccol + cdx,
                    comp, cacq[comp][blk],
                )
                ctx.nc_c[comp][crow + cdy, ccol + cdx] = 15 - cacq[
                    comp
                ][blk].count(0)
    else:
        for comp in range(2):
            ctx.nc_c[comp][crow : crow + 2, ccol : ccol + 2] = 0
    return qpd_nonzero


def encode_h264_cabac_recon(frames, width: int, height: int,
                            qp: int = 28):
    """CABAC twin of :func:`encode_h264_cavlc_recon`: IDR I pictures
    (I_NxN + I_16x16 mix), entropy_coding_mode_flag = 1, one slice per
    picture.  -> (annexb_bytes, [(Y, U, V) recon planes, cropped]).
    The reconstruction loop shares the decoder's dequant/IDCT/predict
    helpers, so a conforming decode must be bit-exact."""
    if width % 2 or height % 2:
        raise UnsupportedMediaError("h264 encoder: dimensions must be even")
    if not 8 <= qp <= 44:
        raise UnsupportedMediaError("h264 encoder: qp out of supported range")
    mb_w = -(-width // 16)
    mb_h = -(-height // 16)
    crop_right = mb_w * 16 - width
    crop_bottom = mb_h * 16 - height

    w = _BitWriter()
    w.write(66, 8)
    w.write(0xC0, 8)
    w.write(30, 8)
    w.ue(0)
    w.ue(0)
    w.ue(2)  # pic_order_cnt_type 2
    w.ue(0)
    w.write(0, 1)
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.write(1, 1)
    w.write(1, 1)
    if crop_right or crop_bottom:
        w.write(1, 1)
        w.ue(0)
        w.ue(crop_right // 2)
        w.ue(0)
        w.ue(crop_bottom // 2)
    else:
        w.write(0, 1)
    w.write(0, 1)
    w.trailing_bits()
    out = bytearray(_nal(3, 7, w.getvalue()))

    w = _BitWriter()
    w.ue(0)
    w.ue(0)
    w.write(1, 1)  # entropy_coding_mode_flag: CABAC
    w.write(0, 1)
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.write(0, 1)
    w.write(0, 2)
    w.se(qp - 26)
    w.se(0)
    w.se(0)
    w.write(1, 1)
    w.write(0, 1)
    w.write(0, 1)
    w.trailing_bits()
    out += _nal(3, 8, w.getvalue())

    sps = _SPS()
    sps.mb_width, sps.mb_height = mb_w, mb_h
    sps.monochrome = False
    qpc = _chroma_qp(qp, 0)
    recons = []
    n_mbs = mb_w * mb_h
    for f_idx, (y, u, v) in enumerate(frames):
        y_pad = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
        y_pad[:height, :width] = np.asarray(y, np.uint8)
        u_pad = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
        v_pad = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
        u_pad[: height // 2, : width // 2] = np.asarray(u, np.uint8)
        v_pad[: height // 2, : width // 2] = np.asarray(v, np.uint8)

        ctx = _PicCtx(sps)
        ctx.mb_slice[:] = 1
        ctx.qp = qp
        w = _BitWriter()
        w.ue(0)  # first_mb_in_slice
        w.ue(7)  # slice_type: I
        w.ue(0)
        w.write(0, 4)  # frame_num
        w.ue(f_idx % 16)  # idr_pic_id
        w.write(0, 2)
        w.se(0)  # slice_qp_delta
        w.ue(1)  # disable_deblocking_filter_idc
        # cabac_alignment_one_bit(s)
        while w.nacc:
            w.write(1, 1)
        ce = _CabacEnc(_cabac_init_ctxs())
        prev_qpd = False
        for mb in range(n_mbs):
            prev_qpd = _encode_one_mb_cabac(
                ce, ctx, mb, f_idx, qp, qpc, y_pad, u_pad, v_pad,
                prev_qpd,
            )
            ce.terminate(1 if mb == n_mbs - 1 else 0)  # end_of_slice
        for b in ce.bits:
            w.write(b, 1)
        w.align_zero()  # rbsp stop bit rides in the CABAC flush
        out += _nal(3, 5, w.getvalue())
        recons.append(
            (
                ctx.y[:height, :width].copy(),
                ctx.u[: height // 2, : width // 2].copy(),
                ctx.v[: height // 2, : width // 2].copy(),
            )
        )
    return bytes(out), recons


def encode_h264_cabac_pb_recon(frames, width: int, height: int,
                               qp: int = 28,
                               spatial_direct: bool = True,
                               inference: bool = True):
    """CABAC twin of the inter/bipred fixture encoders (r14): coded
    order I0, P2, B1, … (``_b_gop``), entropy_coding_mode_flag = 1.
    P macroblock mix: mb_skip_flag, P_L0_16x16 / 16x8 / 8x16 / P_8x8
    (all four sub-types), multi-ref ref_idx bins, intra-in-P.  B mix:
    B_Skip, B_Direct_16x16, the Table 7-14 explicit kinds (L0/L1/Bi
    16x16 and mixed-list 16x8/8x16), B_8x8 with the full sub-type
    wheel (including B_Direct_8x8), intra-in-B.  -> (annexb_bytes,
    [(Y, U, V)] reconstructions in DISPLAY order, stats).  The
    reconstruction loop calls the decoder's own derivation/MC/dequant
    helpers and the encoder shares every context derivation with the
    decoder, so a conforming decode must be bit-exact."""
    if width % 2 or height % 2:
        raise UnsupportedMediaError("h264 encoder: dimensions must be even")
    if not 8 <= qp <= 44:
        raise UnsupportedMediaError("h264 encoder: qp out of supported range")
    if len(frames) * 2 >= 256:
        raise UnsupportedMediaError("h264 encoder: GOP exceeds POC lsb")
    mb_w = -(-width // 16)
    mb_h = -(-height // 16)
    crop_right = mb_w * 16 - width
    crop_bottom = mb_h * 16 - height

    w = _BitWriter()
    w.write(66, 8)
    w.write(0xC0, 8)
    w.write(30, 8)
    w.ue(0)
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(0)  # pic_order_cnt_type 0
    w.ue(4)  # log2_max_pic_order_cnt_lsb_minus4 -> 8 bits
    w.ue(2)  # max_num_ref_frames (sliding window of 2)
    w.write(0, 1)
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.write(1, 1)
    w.write(1 if inference else 0, 1)
    if crop_right or crop_bottom:
        w.write(1, 1)
        w.ue(0)
        w.ue(crop_right // 2)
        w.ue(0)
        w.ue(crop_bottom // 2)
    else:
        w.write(0, 1)
    w.write(0, 1)
    w.trailing_bits()
    out = bytearray(_nal(3, 7, w.getvalue()))

    w = _BitWriter()
    w.ue(0)
    w.ue(0)
    w.write(1, 1)  # entropy_coding_mode_flag: CABAC
    w.write(0, 1)
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.write(0, 1)
    w.write(0, 2)
    w.se(qp - 26)
    w.se(0)
    w.se(0)
    w.write(1, 1)  # deblocking_filter_control_present_flag
    w.write(0, 1)
    w.write(0, 1)
    w.trailing_bits()
    out += _nal(3, 8, w.getvalue())

    sps = _SPS()
    sps.mb_width, sps.mb_height = mb_w, mb_h
    sps.monochrome = False
    qpc = _chroma_qp(qp, 0)
    n_mbs = mb_w * mb_h
    recons = []
    stats = {
        "P_Skip": 0, "P_16x16": 0, "P_16x8": 0, "P_8x16": 0,
        "P_8x8": 0, "intra_in_p": 0, "multiref": 0,
        "B_Skip": 0, "B_Direct": 0, "B_16x16": 0, "B_16x8": 0,
        "B_8x16": 0, "B_8x8": 0, "intra_in_b": 0, "bi_parts": 0,
        "direct_sub": 0, "sub_kinds": set(), "order": [],
    }
    dpb: list[_RefPic] = []
    n_refs_seen = 0
    for coded_idx, (disp, kind) in enumerate(_b_gop(len(frames))):
        y, u, v = frames[disp]
        y_pad = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
        y_pad[:height, :width] = np.asarray(y, np.uint8)
        u_pad = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
        v_pad = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
        u_pad[: height // 2, : width // 2] = np.asarray(u, np.uint8)
        v_pad[: height // 2, : width // 2] = np.asarray(v, np.uint8)

        ctx = _PicCtx(sps)
        ctx.mb_slice[:] = 1
        ctx.qp = qp
        ctx.serial = coded_idx + 1
        ctx.poc = 2 * disp
        fn = n_refs_seen % 16
        is_ref = kind in ("I", "P")
        stats["order"].append((disp, kind))
        active = a0 = a1 = 1
        if kind == "P":
            active = min(2, len(dpb))
        elif kind == "B":
            l0_full, l1_full = _b_default_lists(dpb, ctx.poc)
            a0 = min(2, len(l0_full))
            a1 = min(2, len(l1_full))
            l0e, l1e = l0_full[:a0], l1_full[:a1]
        w = _BitWriter()
        w.ue(0)  # first_mb_in_slice
        if kind == "I":
            w.ue(7)
            w.ue(0)
            w.write(fn, 4)
            w.ue(0)  # idr_pic_id
            w.write(ctx.poc & 0xFF, 8)
            w.write(0, 2)
        elif kind == "P":
            w.ue(5)
            w.ue(0)
            w.write(fn, 4)
            w.write(ctx.poc & 0xFF, 8)
            if active > 1:
                w.write(1, 1)  # num_ref_idx_active_override_flag
                w.ue(active - 1)
            else:
                w.write(0, 1)
            w.write(0, 1)  # ref_pic_list_modification_flag_l0
            w.write(0, 1)  # adaptive_ref_pic_marking_mode_flag
        else:
            w.ue(6)
            w.ue(0)
            w.write(fn, 4)
            w.write(ctx.poc & 0xFF, 8)
            w.write(1 if spatial_direct else 0, 1)
            if (a0, a1) != (1, 1):
                w.write(1, 1)
                w.ue(a0 - 1)
                w.ue(a1 - 1)
            else:
                w.write(0, 1)
            w.write(0, 1)
            w.write(0, 1)
        w.se(0)  # slice_qp_delta
        w.ue(1)  # disable_deblocking_filter_idc
        while w.nacc:  # cabac_alignment_one_bit(s)
            w.write(1, 1)
        ce = _CabacEnc(_cabac_init_ctxs())
        wri = _CabacInterWriter(ce, ctx)
        for mb in range(n_mbs):
            my, mx = divmod(mb, mb_w)
            br, bc = my * 4, mx * 4
            ctx.mb_qp[mb] = qp
            if kind == "I":
                wri.prev_qpd = _encode_one_mb_cabac(
                    ce, ctx, mb, coded_idx, qp, qpc, y_pad, u_pad,
                    v_pad, wri.prev_qpd,
                )
            elif kind == "P":
                _enc_cabac_p_mb(
                    ce, wri, ctx, mb, coded_idx, qp, qpc,
                    y_pad, u_pad, v_pad, dpb, active, stats,
                )
            else:
                _enc_cabac_b_mb(
                    ce, wri, ctx, mb, coded_idx, qp, qpc,
                    y_pad, u_pad, v_pad, l0e, l1e, a0, a1,
                    spatial_direct, inference, stats,
                )
            ce.terminate(1 if mb == n_mbs - 1 else 0)
        for b in ce.bits:
            w.write(b, 1)
        w.align_zero()
        out += _nal(
            3 if kind == "I" else (2 if kind == "P" else 0),
            5 if kind == "I" else 1,
            w.getvalue(),
        )
        if kind == "I":
            dpb.clear()
        if is_ref:
            dpb.insert(0, _RefPic(ctx, frame_num=fn))
            del dpb[2:]
            n_refs_seen += 1
        recons.append(
            (
                disp,
                ctx.y[:height, :width].copy(),
                ctx.u[: height // 2, : width // 2].copy(),
                ctx.v[: height // 2, : width // 2].copy(),
            )
        )
    recons.sort(key=lambda t: t[0])
    return bytes(out), [t[1:] for t in recons], stats


def _enc_cabac_p_mb(ce, wri, ctx, mb, f_idx, qp, qpc,
                    y_pad, u_pad, v_pad, dpb, active, stats) -> None:
    """One CABAC P macroblock (same deterministic mix as
    encode_h264_inter_recon's P loop, per-MB skip flags instead of
    runs)."""
    my, mx = divmod(mb, ctx.mb_w)
    br, bc = my * 4, mx * 4
    kind = (mb * 5 + f_idx * 3) % 8
    if kind == 7:  # intra-in-P
        ce.decision(_CC_SKIP_P + _skip_flag_ctx(ctx, mb), 0)
        ce.decision(_CC_PMBT, 1)  # intra suffix
        wri.prev_qpd = _encode_one_mb_cabac(
            ce, ctx, mb, f_idx, qp, qpc, y_pad, u_pad, v_pad,
            wri.prev_qpd, mbt_base=_CC_IMBT_P,
        )
        stats["intra_in_p"] += 1
        return
    if kind == 0:  # skip attempt
        skx, sky = _skip_mv(ctx, mb)
        parts = [(0, 0, 4, 4, None, skx, sky, 0)]
        preds = _mc_pred_mb(ctx, dpb, mb, parts)
        cbp, lq, cdq, caq = _quant_inter_mb(
            ctx, mb, qp, qpc, *preds, y_pad, u_pad, v_pad
        )
        if cbp == 0:
            ce.decision(_CC_SKIP_P + _skip_flag_ctx(ctx, mb), 1)
            ctx.cskip[mb] = 1
            ctx.mb_kind[mb] = 3
            wri.prev_qpd = False
            stats["P_Skip"] += 1
            _recon_inter_mb(ctx, mb, qp, qpc, 0, lq, cdq, caq, *preds)
            return
        ce.decision(_CC_SKIP_P + _skip_flag_ctx(ctx, mb), 0)
        wri.p_mbtype(0)
        wri.ref(0, active, 0, br, bc, 4, 4, mb)
        mpx, mpy = _mvp(ctx, mb, br, bc, 4, 4, cur_ref=0)
        wri.mvd(0, skx - mpx, sky - mpy, br, bc, 4, 4, mb)
        ctx.mv[br : br + 4, bc : bc + 4, 0] = skx
        ctx.mv[br : br + 4, bc : bc + 4, 1] = sky
        ctx.ref[br : br + 4, bc : bc + 4] = 0
        ctx.mb_kind[mb] = 3
        stats["P_16x16"] += 1
        wri.residual(ctx, mb, cbp, lq, cdq, caq)
        _recon_inter_mb(ctx, mb, qp, qpc, cbp, lq, cdq, caq, *preds)
        return
    ce.decision(_CC_SKIP_P + _skip_flag_ctx(ctx, mb), 0)
    if kind in (1, 2, 3):
        geom = [(0, 0, 4, 4, None)]
        mvs = [_enc_mv(mb, f_idx, 0)]
        mb_type = 0
        stats["P_16x16"] += 1
    elif kind == 4:
        geom = _P_PARTS[1]
        mvs = [_enc_mv(mb, f_idx, p) for p in range(2)]
        mb_type = 1
        stats["P_16x8"] += 1
    elif kind == 5:
        geom = _P_PARTS[2]
        mvs = [_enc_mv(mb, f_idx, p) for p in range(2)]
        mb_type = 2
        stats["P_8x16"] += 1
    else:  # P_8x8
        subs = [(mb + i8 + f_idx) % 4 for i8 in range(4)]
        geom = []
        for i8 in range(4):
            base_r, base_c = 2 * (i8 // 2), 2 * (i8 % 2)
            for r_off, c_off, h4, w4 in _P_SUB_PARTS[subs[i8]]:
                geom.append(
                    (base_r + r_off, base_c + c_off, h4, w4, None)
                )
        mvs = [_enc_mv(mb, f_idx, p) for p in range(len(geom))]
        mb_type = 3
        stats["P_8x8"] += 1
    if mb_type == 3:
        refs8 = [(mb * 3 + f_idx + i8) % active for i8 in range(4)]
        prefs = []
        for i8 in range(4):
            prefs += [refs8[i8]] * len(_P_SUB_PARTS[subs[i8]])
    else:
        prefs = [
            (mb * 3 + f_idx + p * 5) % active for p in range(len(geom))
        ]
    wri.p_mbtype(mb_type)
    if mb_type == 3:
        for s in subs:
            wri.sub_p(s)
        for i8 in range(4):
            wri.ref(
                0, active, refs8[i8],
                br + 2 * (i8 // 2), bc + 2 * (i8 % 2), 2, 2, mb,
            )
    else:
        for (ro, co, h4, w4, _sp), ri in zip(geom, prefs):
            wri.ref(0, active, ri, br + ro, bc + co, h4, w4, mb)
    parts = []
    for (r_off, c_off, h4, w4, special), (mvx, mvy), ri in zip(
        geom, mvs, prefs
    ):
        mpx, mpy = _mvp(
            ctx, mb, br + r_off, bc + c_off, w4, h4, special,
            cur_ref=ri,
        )
        wri.mvd(
            0, mvx - mpx, mvy - mpy,
            br + r_off, bc + c_off, h4, w4, mb,
        )
        if ri:
            stats["multiref"] += 1
        r, c = br + r_off, bc + c_off
        ctx.mv[r : r + h4, c : c + w4, 0] = mvx
        ctx.mv[r : r + h4, c : c + w4, 1] = mvy
        ctx.ref[r : r + h4, c : c + w4] = ri
        parts.append((r_off, c_off, h4, w4, special, mvx, mvy, ri))
    ctx.mb_kind[mb] = 3
    preds = _mc_pred_mb(ctx, dpb, mb, parts)
    cbp, lq, cdq, caq = _quant_inter_mb(
        ctx, mb, qp, qpc, *preds, y_pad, u_pad, v_pad
    )
    wri.residual(ctx, mb, cbp, lq, cdq, caq)
    _recon_inter_mb(ctx, mb, qp, qpc, cbp, lq, cdq, caq, *preds)


def _enc_cabac_b_mb(ce, wri, ctx, mb, f_idx, qp, qpc,
                    y_pad, u_pad, v_pad, l0e, l1e, a0, a1,
                    spatial, inference, stats) -> None:
    """One CABAC B macroblock (the _encode_b_frame kind wheel, per-MB
    skip flags instead of runs)."""
    my, mx = divmod(mb, ctx.mb_w)
    br, bc = my * 4, mx * 4
    kind = (mb * 7 + f_idx * 5) % 12
    if kind == 11:  # intra-in-B
        ce.decision(_CC_SKIP_B + _skip_flag_ctx(ctx, mb), 0)
        ce.decision(_CC_BMBT + _bmbt_ctx(ctx, mb), 1)
        ce.decision(_CC_BMBT + 3, 1)
        ce.decision(_CC_BMBT + 4, 1)  # bits = 13 (1101): intra suffix
        ce.decision(_CC_BMBT + 5, 1)
        ce.decision(_CC_BMBT + 5, 0)
        ce.decision(_CC_BMBT + 5, 1)
        wri.prev_qpd = _encode_one_mb_cabac(
            ce, ctx, mb, f_idx, qp, qpc, y_pad, u_pad, v_pad,
            wri.prev_qpd, mbt_base=_CC_IMBT_B,
        )
        stats["intra_in_b"] += 1
        return
    if kind in (0, 1):  # B_Skip attempt / B_Direct_16x16
        try:
            entries = _derive_direct(ctx, mb, l0e, l1e, spatial,
                                     inference)
        except UnsupportedMediaError:
            kind = 4  # temporal map unavailable -> explicit bi
    if kind in (0, 1):
        for ro, co, h4, w4, r0, m0, r1, m1 in entries:
            _b_store_fields(ctx, mb, ro, co, h4, w4, 0, r0, m0, l0e)
            _b_store_fields(ctx, mb, ro, co, h4, w4, 1, r1, m1, l1e)
        preds = _b_pred_mb(ctx, l0e, l1e, mb, entries)
        cbp, lq, cdq, caq = _quant_inter_mb(
            ctx, mb, qp, qpc, *preds, y_pad, u_pad, v_pad
        )
        if kind == 0 and cbp == 0:
            ce.decision(_CC_SKIP_B + _skip_flag_ctx(ctx, mb), 1)
            ctx.cskip[mb] = 1
            ctx.mb_kind[mb] = 3
            wri.prev_qpd = False
            stats["B_Skip"] += 1
            _recon_inter_mb(ctx, mb, qp, qpc, 0, lq, cdq, caq, *preds)
            return
        ce.decision(_CC_SKIP_B + _skip_flag_ctx(ctx, mb), 0)
        wri.b_mbtype(mb, 0)
        ctx.cdirect[mb] = 1
        ctx.mb_kind[mb] = 3
        stats["B_Direct"] += 1
        wri.residual(ctx, mb, cbp, lq, cdq, caq)
        _recon_inter_mb(ctx, mb, qp, qpc, cbp, lq, cdq, caq, *preds)
        return
    ce.decision(_CC_SKIP_B + _skip_flag_ctx(ctx, mb), 0)
    if kind == 10:  # B_8x8
        subs = [(mb + 3 * i8 + f_idx) % 13 for i8 in range(4)]
        stats["B_8x8"] += 1
        stats["sub_kinds"].update(subs)
        direct_quads = [i8 for i8 in range(4) if subs[i8] == 0]
        direct_entries = []
        if direct_quads:
            try:
                direct_entries = _derive_direct(
                    ctx, mb, l0e, l1e, spatial, inference,
                    quads=direct_quads,
                )
                stats["direct_sub"] += len(direct_quads)
            except UnsupportedMediaError:
                subs = [3 if s == 0 else s for s in subs]
                direct_quads = []
        refs8 = ({}, {})
        mvs8 = ({}, {})
        for lx, act in ((0, a0), (1, a1)):
            for i8 in range(4):
                if subs[i8] and _B_SUBTYPES[subs[i8]][1] & (1 << lx):
                    refs8[lx][i8] = (mb + i8 + lx) % act
        d_by_quad = {}
        for e in direct_entries:
            d_by_quad.setdefault(
                (e[0] // 2) * 2 + (e[1] // 2), []
            ).append(e)
        derived = ({}, {})
        for lx, lst in ((0, l0e), (1, l1e)):
            for i8 in range(4):
                base_r, base_c = 2 * (i8 // 2), 2 * (i8 % 2)
                if subs[i8] == 0:
                    for ro, co, h4, w4, d0, dm0, d1, dm1 in (
                        d_by_quad[i8]
                    ):
                        ref, mv = (d0, dm0) if lx == 0 else (d1, dm1)
                        _b_store_fields(
                            ctx, mb, ro, co, h4, w4, lx, ref, mv, lst
                        )
                    continue
                parts, m = _B_SUBTYPES[subs[i8]]
                for s_i, (ro, co, h4, w4) in enumerate(parts):
                    rr, cc = base_r + ro, base_c + co
                    if m & (1 << lx):
                        ri = refs8[lx][i8]
                        mv = _enc_mv(mb, f_idx, i8 * 4 + s_i + 8 * lx + 1)
                        mpx, mpy = _mvp(
                            ctx, mb, br + rr, bc + cc, w4, h4,
                            None, ri, lx,
                        )
                        mvs8[lx][i8, s_i] = (mv[0] - mpx, mv[1] - mpy)
                        derived[lx][i8, s_i] = (ri, mv)
                        _b_store_fields(
                            ctx, mb, rr, cc, h4, w4, lx, ri, mv, lst
                        )
                    else:
                        _b_store_fields(
                            ctx, mb, rr, cc, h4, w4, lx, -1, (0, 0),
                            lst,
                        )
        wri.b_mbtype(mb, 22)
        for s in subs:
            wri.sub_b(s)
        for lx, act in ((0, a0), (1, a1)):
            for i8 in range(4):
                if i8 in refs8[lx]:
                    wri.ref(
                        lx, act, refs8[lx][i8],
                        br + 2 * (i8 // 2), bc + 2 * (i8 % 2), 2, 2,
                        mb,
                    )
        for lx in (0, 1):
            for i8 in range(4):
                if subs[i8]:
                    parts, m = _B_SUBTYPES[subs[i8]]
                    if m & (1 << lx):
                        base_r = 2 * (i8 // 2)
                        base_c = 2 * (i8 % 2)
                        for s_i, (ro, co, h4, w4) in enumerate(parts):
                            dx, dy = mvs8[lx][i8, s_i]
                            wri.mvd(
                                lx, dx, dy, br + base_r + ro,
                                bc + base_c + co, h4, w4, mb,
                            )
        entries = list(direct_entries)
        for i8 in range(4):
            if subs[i8] == 0:
                continue
            base_r, base_c = 2 * (i8 // 2), 2 * (i8 % 2)
            parts, _m = _B_SUBTYPES[subs[i8]]
            for s_i, (ro, co, h4, w4) in enumerate(parts):
                r0, m0 = derived[0].get((i8, s_i), (-1, (0, 0)))
                r1, m1 = derived[1].get((i8, s_i), (-1, (0, 0)))
                if r0 >= 0 and r1 >= 0:
                    stats["bi_parts"] += 1
                entries.append(
                    (base_r + ro, base_c + co, h4, w4, r0, m0, r1, m1)
                )
    else:  # explicit 16x16 / 16x8 / 8x16
        if kind in (2, 3, 4):
            stats["B_16x16"] += 1
        mb_type = _B_KIND_TYPES[kind]
        geom, masks = _B_MBTYPES[mb_type]
        if geom is _P_PARTS[1]:
            stats["B_16x8"] += 1
        elif geom is _P_PARTS[2]:
            stats["B_8x16"] += 1
        refs = ({}, {})
        derived = ({}, {})
        mvds = ({}, {})
        for lx, (lst, act) in ((0, (l0e, a0)), (1, (l1e, a1))):
            for p, ((ro, co, h4, w4, special), m) in enumerate(
                zip(geom, masks)
            ):
                if m & (1 << lx):
                    ri = (mb + p + lx) % act
                    mv = _enc_mv(mb, f_idx, p + 8 * lx + 1)
                    mpx, mpy = _mvp(
                        ctx, mb, br + ro, bc + co, w4, h4,
                        special, ri, lx,
                    )
                    refs[lx][p] = ri
                    mvds[lx][p] = (mv[0] - mpx, mv[1] - mpy)
                    derived[lx][p] = (ri, mv)
                    _b_store_fields(
                        ctx, mb, ro, co, h4, w4, lx, ri, mv, lst
                    )
                else:
                    _b_store_fields(
                        ctx, mb, ro, co, h4, w4, lx, -1, (0, 0), lst
                    )
        wri.b_mbtype(mb, mb_type)
        for lx, act in ((0, a0), (1, a1)):
            for p in sorted(refs[lx]):
                ro, co, h4, w4, _sp = geom[p]
                wri.ref(lx, act, refs[lx][p], br + ro, bc + co,
                        h4, w4, mb)
        for lx in (0, 1):
            for p in sorted(mvds[lx]):
                ro, co, h4, w4, _sp = geom[p]
                dx, dy = mvds[lx][p]
                wri.mvd(lx, dx, dy, br + ro, bc + co, h4, w4, mb)
        entries = []
        for p, (ro, co, h4, w4, _sp) in enumerate(geom):
            r0, m0 = derived[0].get(p, (-1, (0, 0)))
            r1, m1 = derived[1].get(p, (-1, (0, 0)))
            if r0 >= 0 and r1 >= 0:
                stats["bi_parts"] += 1
            entries.append((ro, co, h4, w4, r0, m0, r1, m1))
    ctx.mb_kind[mb] = 3
    preds = _b_pred_mb(ctx, l0e, l1e, mb, entries)
    cbp, lq, cdq, caq = _quant_inter_mb(
        ctx, mb, qp, qpc, *preds, y_pad, u_pad, v_pad
    )
    wri.residual(ctx, mb, cbp, lq, cdq, caq)
    _recon_inter_mb(ctx, mb, qp, qpc, cbp, lq, cdq, caq, *preds)
