"""Pure-python VP8 (lossy WebP) keyframe intra decoder + fixture encoder.

Lossy VP8 is the dominant WebP flavor in real crawls; until r13 every
``VP8 `` chunk routed to the optional Pillow extra.  This module
decodes the KEYFRAME INTRA subset for real, in the same pure-numpy
discipline as operators/jpeg.py and operators/h264.py.

Spec-exactness, stated precisely (RFC 6386):

- **Exact**: the boolean arithmetic coder (§7 — 8-bit probabilities,
  split = 1 + ((range-1)·p >> 8), byte-fed renormalization; the
  encoder accumulates the low bound in an arbitrary-precision integer
  so carries resolve arithmetically); the frame layout (uncompressed
  tag + 0x9D012A start code + 14-bit dims, the first-partition
  header field order through the coefficient-probability update
  flags and mb_no_coeff_skip, the separate token partition); the
  residual block order (Y2 WHT block when the macroblock codes a
  whole-MB luma mode, then 16 Y blocks starting at coefficient 1,
  then 4+4 chroma); the token CONTEXTS (coefficient-band layout,
  left+above nonzero context, zigzag order); the token tree shape
  with category extra bits and bypass signs; the inverse transforms
  (§14.3 4x4 DCT with the 20091/35468 multiplier form, §14.2 WHT,
  both second-pass roundings) — pinned against hand-computed
  vectors; the whole-MB prediction modes DC/V/H/TM with VP8's fixed
  127/129 edge conventions; the dequant plane multipliers
  (y2dc = 2·dc, y2ac = 155/100·ac floor 8, uvdc capped at 132).
- **Derived (the documented-deviation pattern of operators/mp3.py /
  the h264 CABAC section)**: the default coefficient probabilities,
  the coefficient-update probabilities, the keyframe mode
  probabilities, and the dc/ac quantizer lookup tables are published
  RFC constants too large to transcribe verbatim; this module uses
  DERIVED tables (closed-form geometric quantizer ramps with the
  published endpoints; flat mode/update probabilities) shared by the
  fixture encoder and the decoder, so round trips are BIT-EXACT and
  streams are structurally real VP8 — bitstreams from third-party
  encoders would desync in the bool decoder and trip the structural
  validators rather than decode.  The tables are swappable module
  constants.
- **Out of scope** (UnsupportedMediaError naming the optional extra):
  B_PRED macroblocks (the 10 4x4 submodes), interframes, segmentation
  maps, loop-filter deltas and the loop filter itself (the fixture
  encoder writes filter_level 0 — legal and exact), multiple token
  partitions, and the quantizer delta fields (encoder emits none).

Same safety contracts as the sibling codecs: one exception type,
pixel-inflation guard, malformed input never escapes as a raw
IndexError (fuzz-pinned in tests/test_vp8.py).
"""

from __future__ import annotations

import math

import numpy as np

from processor_edf_spark.operators.media_codecs import UnsupportedMediaError

MAX_PIXELS = 1 << 26

# ---------------------------------------------------------------------------
# derived probability / quantizer tables (module docstring: published
# RFC 6386 constants too large to transcribe; closed forms with the
# published endpoints, shared by encoder and decoder)
# ---------------------------------------------------------------------------

#: flat default coefficient probabilities: every tree node equiprobable
_COEF_PROB = 128
#: flat coefficient-update probabilities (the flags the keyframe header
#: reads 4*8*3*11 of; our encoder never updates, so these only set the
#: per-flag coding cost)
_UPDATE_PROB = 247
#: keyframe mode probabilities, flat
_KF_YMODE_PROBS = (128, 128, 128)   # tree: B_PRED | (DC | V) (H | TM)
_KF_UVMODE_PROBS = (128, 128, 128)  # tree: DC | V | (H | TM)

# quantizer ramps: geometric from the published endpoints
# (dc: 4..157, ac: 4..284 over qindex 0..127)


def _qramp(lo: int, hi: int) -> np.ndarray:
    i = np.arange(128)
    return np.clip(
        np.rint(lo * np.exp(i * (math.log(hi / lo) / 127.0))), lo, hi
    ).astype(np.int32)


_DC_Q = _qramp(4, 157)
_AC_Q = _qramp(4, 284)

# zigzag scan (RFC 6386 §13.5) and the coefficient-band layout (§13.3)
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

# token categories: (base value, extra-bit probabilities) — the
# category extra-bit probabilities ARE transcribed (small, certain)
_CAT_PROBS = (
    (5, (159,)),
    (7, (165, 145)),
    (11, (173, 148, 140)),
    (19, (176, 155, 140, 135)),
    (35, (180, 157, 141, 134, 130)),
    (67, (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129)),
)


class _BoolDec:
    """RFC 6386 §7.3 boolean decoder; zero-pads past the partition end
    (bounded) so truncated input raises instead of wrapping."""

    __slots__ = ("data", "pos", "range", "value", "bits", "_over")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.range = 255
        self.value = int.from_bytes(data[:2].ljust(2, b"\0"), "big")
        self.bits = 0
        self._over = 2 - min(2, len(data))

    def _fill(self) -> int:
        if self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            return b
        self._over += 1
        if self._over > 32:
            raise UnsupportedMediaError("vp8: bool decoder overrun")
        return 0

    def read(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            bit = 1
            self.range -= split
            self.value -= big
        else:
            bit = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bits += 1
            if self.bits == 8:
                self.bits = 0
                self.value |= self._fill()
        return bit

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read(128)
        return v

    def signed(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.read(128) else v


class _BoolEnc:
    """RFC 6386 §7.2 boolean encoder.  The low bound accumulates in an
    arbitrary-precision integer (carries resolve arithmetically — no
    explicit carry walk), holding the invariant low + range <=
    2^(nbits+8); :meth:`finish` emits exactly the low bound's bits, a
    stream provably inside the final interval.  Fixture-scale by
    design (big-int shifts are quadratic in output size; the encoder
    exists to make conformant test/driver streams, like the sibling
    codec fixture encoders)."""

    __slots__ = ("range", "low", "nbits")

    def __init__(self):
        self.range = 255
        self.low = 0
        self.nbits = 0

    def write(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            self.low <<= 1
            self.nbits += 1

    def literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.write((v >> i) & 1, 128)

    def signed(self, v: int, n: int) -> None:
        self.literal(abs(v), n)
        self.write(1 if v < 0 else 0, 128)

    def finish(self) -> bytes:
        total = self.nbits + 8  # the 8-bit active window
        pad = (-total) % 8
        return (self.low << pad).to_bytes((total + pad) // 8, "big")


# ---------------------------------------------------------------------------
# transforms (§14, exact)
# ---------------------------------------------------------------------------


def _idct4x4(block: np.ndarray) -> np.ndarray:
    """§14.3 inverse DCT, integer-exact (20091/35468 multiplier form)."""
    ip = block.astype(np.int64)
    tmp = np.empty((4, 4), np.int64)
    for c in range(4):
        a1 = ip[0, c] + ip[2, c]
        b1 = ip[0, c] - ip[2, c]
        t1 = (ip[1, c] * 35468) >> 16
        t2 = ip[3, c] + ((ip[3, c] * 20091) >> 16)
        c1 = t1 - t2
        t1 = ip[1, c] + ((ip[1, c] * 20091) >> 16)
        t2 = (ip[3, c] * 35468) >> 16
        d1 = t1 + t2
        tmp[0, c] = a1 + d1
        tmp[3, c] = a1 - d1
        tmp[1, c] = b1 + c1
        tmp[2, c] = b1 - c1
    out = np.empty((4, 4), np.int64)
    for r in range(4):
        a1 = tmp[r, 0] + tmp[r, 2]
        b1 = tmp[r, 0] - tmp[r, 2]
        t1 = (tmp[r, 1] * 35468) >> 16
        t2 = tmp[r, 3] + ((tmp[r, 3] * 20091) >> 16)
        c1 = t1 - t2
        t1 = tmp[r, 1] + ((tmp[r, 1] * 20091) >> 16)
        t2 = (tmp[r, 3] * 35468) >> 16
        d1 = t1 + t2
        out[r, 0] = (a1 + d1 + 4) >> 3
        out[r, 3] = (a1 - d1 + 4) >> 3
        out[r, 1] = (b1 + c1 + 4) >> 3
        out[r, 2] = (b1 - c1 + 4) >> 3
    return out


def _iwht4x4(block: np.ndarray) -> np.ndarray:
    """§14.2 inverse Walsh-Hadamard (the Y2 DC block)."""
    ip = block.astype(np.int64)
    tmp = np.empty((4, 4), np.int64)
    for c in range(4):
        a1 = ip[0, c] + ip[3, c]
        b1 = ip[1, c] + ip[2, c]
        c1 = ip[1, c] - ip[2, c]
        d1 = ip[0, c] - ip[3, c]
        tmp[0, c] = a1 + b1
        tmp[1, c] = c1 + d1
        tmp[2, c] = a1 - b1
        tmp[3, c] = d1 - c1
    out = np.empty((4, 4), np.int64)
    for r in range(4):
        a1 = tmp[r, 0] + tmp[r, 3]
        b1 = tmp[r, 1] + tmp[r, 2]
        c1 = tmp[r, 1] - tmp[r, 2]
        d1 = tmp[r, 0] - tmp[r, 3]
        out[r, 0] = (a1 + b1 + 3) >> 3
        out[r, 1] = (c1 + d1 + 3) >> 3
        out[r, 2] = (a1 - b1 + 3) >> 3
        out[r, 3] = (d1 - c1 + 3) >> 3
    return out


# float forward transforms for the FIXTURE encoder: any self-consistent
# forward works (the decoder only runs the exact inverses above; the
# recon loop dequantizes + inverse-transforms exactly like the decoder)
_IDCT_MAT = None


def _fdct4x4(res: np.ndarray) -> np.ndarray:
    """Least-squares forward: chosen so _idct4x4(quantize^-1(...)) is a
    faithful lossy round trip; computed by inverting the exact inverse
    transform's linear map once."""
    global _IDCT_MAT
    if _IDCT_MAT is None:
        basis = np.zeros((16, 16))
        for k in range(16):
            e = np.zeros((4, 4), np.int64)
            e[k // 4, k % 4] = 4096
            basis[:, k] = _idct4x4(e).reshape(-1) / 4096.0
        _IDCT_MAT = np.linalg.inv(basis)
    return (_IDCT_MAT @ res.reshape(-1).astype(np.float64)).reshape(4, 4)


_IWHT_MAT = None


def _fwht4x4(res: np.ndarray) -> np.ndarray:
    global _IWHT_MAT
    if _IWHT_MAT is None:
        basis = np.zeros((16, 16))
        for k in range(16):
            e = np.zeros((4, 4), np.int64)
            e[k // 4, k % 4] = 4096
            basis[:, k] = _iwht4x4(e).reshape(-1) / 4096.0
        _IWHT_MAT = np.linalg.inv(basis)
    return (_IWHT_MAT @ res.reshape(-1).astype(np.float64)).reshape(4, 4)


# ---------------------------------------------------------------------------
# dequant (§9.6 plane multipliers, exact; ramps derived)
# ---------------------------------------------------------------------------


def _quantizers(qi: int) -> dict:
    qi = max(0, min(127, qi))
    y1dc = int(_DC_Q[qi])
    y1ac = int(_AC_Q[qi])
    y2dc = y1dc * 2
    y2ac = max(8, (y1ac * 155) // 100)
    uvdc = min(132, y1dc)
    uvac = y1ac
    return {
        "y1": (y1dc, y1ac),
        "y2": (y2dc, y2ac),
        "uv": (uvdc, uvac),
    }


# ---------------------------------------------------------------------------
# token coding (§13) — tree shape exact, probabilities derived-flat
# ---------------------------------------------------------------------------


def _read_coeffs(bd: _BoolDec, first: int, ctx: int) -> tuple:
    """One 4x4 block's tokens -> (coeffs int64[16] in raster order,
    has_nonzero).  ``ctx`` is the left+above nonzero context for the
    first token; subsequent contexts follow §13.4 (0 after a zero,
    1 after a one, 2 after larger)."""
    coeffs = np.zeros(16, np.int64)
    i = first
    prev_eob_check = True
    nonzero = False
    while i < 16:
        p = _COEF_PROB
        if prev_eob_check:
            if not bd.read(p):  # EOB
                break
        prev_eob_check = True
        # token tree: 0 | (1 | (2/3/4 | categories))
        if not bd.read(p):  # ZERO
            i += 1
            ctx = 0
            prev_eob_check = False  # after a zero, EOB cannot follow
            continue
        if not bd.read(p):
            val = 1
        else:
            if not bd.read(p):
                # 2, 3 or 4
                if not bd.read(p):
                    val = 2
                else:
                    val = 3 if not bd.read(p) else 4
            else:
                # categories
                if not bd.read(p):
                    cat = 0 if not bd.read(p) else 1
                else:
                    if not bd.read(p):
                        cat = 2 if not bd.read(p) else 3
                    else:
                        cat = 4 if not bd.read(p) else 5
                base, probs = _CAT_PROBS[cat]
                extra = 0
                for pp in probs:
                    extra = (extra << 1) | bd.read(pp)
                val = base + extra
        if bd.read(128):  # sign
            val = -val
        coeffs[_ZIGZAG[i]] = val
        nonzero = True
        ctx = 2 if abs(val) > 1 else 1
        i += 1
    return coeffs, nonzero


def _write_coeffs(be: _BoolEnc, first: int, coeffs: np.ndarray) -> bool:
    """Encoder twin of :func:`_read_coeffs`."""
    zz = [int(coeffs[_ZIGZAG[i]]) for i in range(16)]
    last = -1
    for i in range(first, 16):
        if zz[i]:
            last = i
    p = _COEF_PROB
    i = first
    prev_eob_check = True
    while i < 16:
        if prev_eob_check:
            if last < i:
                be.write(0, p)  # EOB
                return last >= first
            be.write(1, p)
        prev_eob_check = True
        v = zz[i]
        a = abs(v)
        if a == 0:
            be.write(0, p)
            i += 1
            prev_eob_check = False
            continue
        be.write(1, p)
        if a == 1:
            be.write(0, p)
        else:
            be.write(1, p)
            if a <= 4:
                be.write(0, p)
                if a == 2:
                    be.write(0, p)
                else:
                    be.write(1, p)
                    be.write(0 if a == 3 else 1, p)
            else:
                be.write(1, p)
                for cat, (base, probs) in enumerate(_CAT_PROBS):
                    top = base + (1 << len(probs)) - 1
                    if a <= top:
                        break
                else:
                    raise UnsupportedMediaError(
                        "vp8 encoder: coefficient exceeds category 6"
                    )
                # category selection tree
                if cat <= 1:
                    be.write(0, p)
                    be.write(cat, p)
                elif cat <= 3:
                    be.write(1, p)
                    be.write(0, p)
                    be.write(cat - 2, p)
                else:
                    be.write(1, p)
                    be.write(1, p)
                    be.write(cat - 4, p)
                extra = a - base
                for j in range(len(probs) - 1, -1, -1):
                    be.write((extra >> j) & 1, probs[len(probs) - 1 - j])
        be.write(1 if v < 0 else 0, 128)
        i += 1
    return last >= first


# ---------------------------------------------------------------------------
# prediction (§12.2, whole-MB modes with VP8's 127/129 edge rules)
# ---------------------------------------------------------------------------

_DC, _V, _H, _TM = 0, 1, 2, 3


def _predict(plane: np.ndarray, y0: int, x0: int, size: int,
             mode: int) -> np.ndarray:
    have_above = y0 > 0
    have_left = x0 > 0
    above = (
        plane[y0 - 1, x0 : x0 + size].astype(np.int64)
        if have_above
        else np.full(size, 127, np.int64)
    )
    left = (
        plane[y0 : y0 + size, x0 - 1].astype(np.int64)
        if have_left
        else np.full(size, 129, np.int64)
    )
    if have_above and have_left:
        tl = int(plane[y0 - 1, x0 - 1])
    elif have_above:
        tl = 127
    else:
        tl = 129
    if mode == _DC:
        if have_above and have_left:
            dc = int(above.sum() + left.sum() + size) >> int(
                math.log2(size) + 1
            )
        elif have_above:
            dc = int(above.sum() + size // 2) >> int(math.log2(size))
        elif have_left:
            dc = int(left.sum() + size // 2) >> int(math.log2(size))
        else:
            dc = 128
        return np.full((size, size), dc, np.int64)
    if mode == _V:
        return np.tile(above, (size, 1))
    if mode == _H:
        return np.tile(left[:, None], (1, size))
    # TM
    return np.clip(left[:, None] + above[None, :] - tl, 0, 255)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_vp8_planes(payload: bytes):
    """VP8 keyframe bytes -> (width, height, Y, U, V) uncropped uint8
    planes — the exactness surface the recon compares and the driver
    row use; :func:`decode_vp8_keyframe` wraps it with crop + RGB."""
    if len(payload) < 10:
        raise UnsupportedMediaError("vp8: truncated frame header")
    tag = int.from_bytes(payload[:3], "little")
    if tag & 1:
        raise UnsupportedMediaError(
            "vp8: interframes need the optional codec library (PIL)"
        )
    first_part_size = tag >> 5
    if payload[3:6] != b"\x9d\x01\x2a":
        raise UnsupportedMediaError("vp8: bad keyframe start code")
    w_code = int.from_bytes(payload[6:8], "little")
    h_code = int.from_bytes(payload[8:10], "little")
    width, height = w_code & 0x3FFF, h_code & 0x3FFF
    if width < 1 or height < 1 or width * height > MAX_PIXELS:
        raise UnsupportedMediaError("vp8: bad dimensions")
    if 10 + first_part_size > len(payload):
        raise UnsupportedMediaError("vp8: first partition truncated")
    mb_w, mb_h = -(-width // 16), -(-height // 16)

    hd = _BoolDec(payload[10 : 10 + first_part_size])
    if hd.literal(1):
        raise UnsupportedMediaError("vp8: reserved color space")
    hd.literal(1)  # clamping_type (both values decode identically here)
    if hd.read(128):
        raise UnsupportedMediaError(
            "vp8: segmentation needs the optional codec library (PIL)"
        )
    hd.literal(1)  # filter_type
    filter_level = hd.literal(6)
    hd.literal(3)  # sharpness
    if filter_level != 0:
        raise UnsupportedMediaError(
            "vp8: in-loop filtered frames need the optional codec "
            "library (PIL)"
        )
    if hd.read(128):  # loop_filter_adj_enable
        raise UnsupportedMediaError("vp8: loop-filter deltas unsupported")
    if hd.literal(2) != 0:
        raise UnsupportedMediaError(
            "vp8: multiple token partitions unsupported"
        )
    qi = hd.literal(7)
    for _ in range(5):  # y1dc/y2dc/y2ac/uvdc/uvac deltas
        if hd.read(128):
            raise UnsupportedMediaError("vp8: quantizer deltas unsupported")
    hd.read(128)  # refresh_entropy_probs (keyframe: no-op here)
    # coefficient probability update flags (4*8*3*11)
    for _ in range(4 * 8 * 3 * 11):
        if hd.read(_UPDATE_PROB):
            raise UnsupportedMediaError(
                "vp8: coefficient probability updates unsupported"
            )
    if not hd.read(128):  # mb_no_coeff_skip
        raise UnsupportedMediaError("vp8: mb_no_coeff_skip=0 unsupported")
    prob_skip = hd.literal(8)

    # per-MB modes (still in the first partition)
    ymodes = np.empty((mb_h, mb_w), np.int8)
    uvmodes = np.empty((mb_h, mb_w), np.int8)
    skips = np.zeros((mb_h, mb_w), np.int8)
    for my in range(mb_h):
        for mx in range(mb_w):
            skips[my, mx] = hd.read(prob_skip)
            # kf ymode tree: B_PRED | ((DC|V) | (H|TM))
            if not hd.read(_KF_YMODE_PROBS[0]):
                raise UnsupportedMediaError(
                    "vp8: B_PRED macroblocks need the optional codec "
                    "library (PIL)"
                )
            if not hd.read(_KF_YMODE_PROBS[1]):
                ymodes[my, mx] = _DC if not hd.read(128) else _V
            else:
                ymodes[my, mx] = _H if not hd.read(128) else _TM
            # uv tree: DC | (V | (H|TM))
            if not hd.read(_KF_UVMODE_PROBS[0]):
                uvmodes[my, mx] = _DC
            elif not hd.read(_KF_UVMODE_PROBS[1]):
                uvmodes[my, mx] = _V
            else:
                uvmodes[my, mx] = _H if not hd.read(_KF_UVMODE_PROBS[2]) else _TM

    # first partition must end near its declared size: a desynced bool
    # decoder (e.g. a third-party stream read with this module's
    # derived probabilities) that happens to parse all mode fields
    # without tripping a syntax gate would leave a large unread tail —
    # fail structurally instead of returning garbage (ADVICE r13)
    if len(hd.data) - hd.pos > 8:
        raise UnsupportedMediaError(
            "vp8: first partition not consumed (probable desync)"
        )

    td = _BoolDec(payload[10 + first_part_size :])
    q = _quantizers(qi)
    Y = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
    U = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    V = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    # nonzero context per 4x4 column/row, per plane (y2, y, u, v)
    nz_left = {
        "y2": np.zeros(mb_h, np.int8),
        "y": np.zeros(mb_h * 4, np.int8),
        "u": np.zeros(mb_h * 2, np.int8),
        "v": np.zeros(mb_h * 2, np.int8),
    }
    nz_above = {
        "y2": np.zeros(mb_w, np.int8),
        "y": np.zeros(mb_w * 4, np.int8),
        "u": np.zeros(mb_w * 2, np.int8),
        "v": np.zeros(mb_w * 2, np.int8),
    }

    def block_coeffs(plane_key, first, row, col, dq):
        ctx = int(nz_left[plane_key][row]) + int(nz_above[plane_key][col])
        coeffs, nz = _read_coeffs(td, first, ctx)
        nz_left[plane_key][row] = 1 if nz else 0
        nz_above[plane_key][col] = 1 if nz else 0
        dqm = np.full(16, dq[1], np.int64)
        dqm[0] = dq[0]
        return (coeffs * dqm).reshape(4, 4)

    for my in range(mb_h):
        for mx in range(mb_w):
            ym = int(ymodes[my, mx])
            uvm = int(uvmodes[my, mx])
            y0, x0 = my * 16, mx * 16
            cy0, cx0 = my * 8, mx * 8
            predY = _predict(Y, y0, x0, 16, ym)
            predU = _predict(U, cy0, cx0, 8, uvm)
            predV = _predict(V, cy0, cx0, 8, uvm)
            if skips[my, mx]:
                # skipped MB: prediction only, contexts zeroed
                nz_left["y2"][my] = 0
                nz_above["y2"][mx] = 0
                nz_left["y"][my * 4 : my * 4 + 4] = 0
                nz_above["y"][mx * 4 : mx * 4 + 4] = 0
                for k in ("u", "v"):
                    nz_left[k][my * 2 : my * 2 + 2] = 0
                    nz_above[k][mx * 2 : mx * 2 + 2] = 0
                Y[y0 : y0 + 16, x0 : x0 + 16] = np.clip(predY, 0, 255)
                U[cy0 : cy0 + 8, cx0 : cx0 + 8] = np.clip(predU, 0, 255)
                V[cy0 : cy0 + 8, cx0 : cx0 + 8] = np.clip(predV, 0, 255)
                continue
            # Y2 (always present for whole-MB luma modes)
            dq2 = block_coeffs("y2", 0, my, mx, q["y2"])
            dc16 = _iwht4x4(dq2)
            resY = np.zeros((16, 16), np.int64)
            for blk in range(16):
                by, bx = blk // 4, blk % 4
                d = block_coeffs(
                    "y", 1, my * 4 + by, mx * 4 + bx, q["y1"]
                )
                d[0, 0] = dc16[by, bx]
                resY[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = _idct4x4(d)
            for comp, plane, pred, base_r, base_c in (
                ("u", U, predU, my * 2, mx * 2),
                ("v", V, predV, my * 2, mx * 2),
            ):
                resC = np.zeros((8, 8), np.int64)
                for blk in range(4):
                    by, bx = blk // 2, blk % 2
                    d = block_coeffs(
                        comp, 0, base_r + by, base_c + bx, q["uv"]
                    )
                    resC[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = (
                        _idct4x4(d)
                    )
                tgt = np.clip(pred + resC, 0, 255).astype(np.uint8)
                if comp == "u":
                    U[cy0 : cy0 + 8, cx0 : cx0 + 8] = tgt
                else:
                    V[cy0 : cy0 + 8, cx0 : cx0 + 8] = tgt
            Y[y0 : y0 + 16, x0 : x0 + 16] = np.clip(
                predY + resY, 0, 255
            ).astype(np.uint8)

    # token partition consumed within a small slack — the complement of
    # the _fill overrun guard: a desync that UNDER-consumes (flat-prob
    # garbage decode completing all macroblocks early) is rejected here
    # rather than returned as a successful decode (ADVICE r13)
    if len(td.data) - td.pos > 8:
        raise UnsupportedMediaError(
            "vp8: token partition not consumed (probable desync)"
        )

    return width, height, Y, U, V


def decode_vp8_keyframe(payload: bytes) -> tuple[int, int, np.ndarray]:
    """VP8 keyframe bytes -> (width, height, uint8 RGB image).
    YUV420 -> RGB with the BT.601 full-swing conversion shared with
    the JPEG path."""
    width, height, Y, U, V = decode_vp8_planes(payload)

    y = Y[:height, :width].astype(np.float64)
    ch, cw = -(-height // 2), -(-width // 2)
    u = np.repeat(np.repeat(U[:ch, :cw], 2, 0), 2, 1)[
        :height, :width
    ].astype(np.float64)
    v = np.repeat(np.repeat(V[:ch, :cw], 2, 0), 2, 1)[
        :height, :width
    ].astype(np.float64)
    r = y + 1.402 * (v - 128.0)
    g = y - 0.344136 * (u - 128.0) - 0.714136 * (v - 128.0)
    b = y + 1.772 * (u - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return width, height, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------


def _quant(x: float, q: int) -> int:
    v = int(x / q)  # truncate toward zero, the dequant = v*q inverse
    if abs(v) > 2114:  # category-6 ceiling (67 + 2^11 - 1)
        raise UnsupportedMediaError("vp8 encoder: coefficient overflow")
    return v


def encode_vp8_keyframe(y, u, v, qi: int = 40):
    """(Y, U, V) uint8 planes (YUV420; chroma = ceil-half dims) -> a
    REAL VP8 keyframe (module docstring subset) plus the encoder's own
    reconstruction planes.  The recon loop runs the decoder's exact
    dequant/inverse-transform/prediction path, so a conforming decode
    must be bit-exact.  -> (frame_bytes, (reconY, reconU, reconV))."""
    y = np.asarray(y, np.uint8)
    u = np.asarray(u, np.uint8)
    v = np.asarray(v, np.uint8)
    height, width = y.shape
    mb_w, mb_h = -(-width // 16), -(-height // 16)
    if width < 1 or height < 1 or width >= (1 << 14) or height >= (1 << 14):
        raise UnsupportedMediaError("vp8 encoder: bad dimensions")
    y_pad = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
    y_pad[:height, :width] = y
    u_pad = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    v_pad = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    ch, cw = u.shape
    u_pad[:ch, :cw] = u
    v_pad[:ch, :cw] = v

    q = _quantizers(qi)
    Y = np.zeros_like(y_pad)
    U = np.zeros_like(u_pad)
    V = np.zeros_like(v_pad)

    per_mb = []  # (skip, ymode, uvmode, y2q, yq[16], uq[4], vq[4])
    for my in range(mb_h):
        for mx in range(mb_w):
            y0, x0 = my * 16, mx * 16
            cy0, cx0 = my * 8, mx * 8
            ymode = (my + mx) % 4
            uvmode = (my * 3 + mx) % 4
            predY = _predict(Y, y0, x0, 16, ymode)
            predU = _predict(U, cy0, cx0, 8, uvmode)
            predV = _predict(V, cy0, cx0, 8, uvmode)

            resY = y_pad[y0 : y0 + 16, x0 : x0 + 16].astype(np.int64) - predY
            dcs = np.zeros((4, 4), np.float64)
            yq = []
            for blk in range(16):
                by, bx = blk // 4, blk % 4
                f = _fdct4x4(resY[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4])
                dcs[by, bx] = f[0, 0]
                cq = np.zeros(16, np.int64)
                flat = f.reshape(-1)
                for i in range(1, 16):
                    cq[i] = _quant(flat[i], q["y1"][1])
                yq.append(cq)
            f2 = _fwht4x4(dcs)
            y2q = np.zeros(16, np.int64)
            fl2 = f2.reshape(-1)
            y2q[0] = _quant(fl2[0], q["y2"][0])
            for i in range(1, 16):
                y2q[i] = _quant(fl2[i], q["y2"][1])

            uq, vq = [], []
            for comp, plane_src, pred in (
                (0, u_pad, predU), (1, v_pad, predV)
            ):
                resC = (
                    plane_src[cy0 : cy0 + 8, cx0 : cx0 + 8].astype(np.int64)
                    - pred
                )
                for blk in range(4):
                    by, bx = blk // 2, blk % 2
                    f = _fdct4x4(
                        resC[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4]
                    )
                    cq = np.zeros(16, np.int64)
                    flat = f.reshape(-1)
                    cq[0] = _quant(flat[0], q["uv"][0])
                    for i in range(1, 16):
                        cq[i] = _quant(flat[i], q["uv"][1])
                    (uq if comp == 0 else vq).append(cq)

            skip = (
                not y2q.any()
                and not any(c[1:].any() for c in yq)
                and not any(c.any() for c in uq + vq)
            )

            # ---- recon exactly as the decoder will
            if skip:
                Y[y0 : y0 + 16, x0 : x0 + 16] = np.clip(predY, 0, 255)
                U[cy0 : cy0 + 8, cx0 : cx0 + 8] = np.clip(predU, 0, 255)
                V[cy0 : cy0 + 8, cx0 : cx0 + 8] = np.clip(predV, 0, 255)
            else:
                dq2 = y2q.copy()
                dq2[0] *= q["y2"][0]
                dq2[1:] *= q["y2"][1]
                dc16 = _iwht4x4(dq2.reshape(4, 4))
                rY = np.zeros((16, 16), np.int64)
                for blk in range(16):
                    by, bx = blk // 4, blk % 4
                    d = yq[blk].copy()
                    d[1:] *= q["y1"][1]
                    d = d.reshape(4, 4)
                    d[0, 0] = dc16[by, bx]
                    rY[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = (
                        _idct4x4(d)
                    )
                Y[y0 : y0 + 16, x0 : x0 + 16] = np.clip(
                    predY + rY, 0, 255
                ).astype(np.uint8)
                for comp, plane, pred, qlist in (
                    (0, U, predU, uq), (1, V, predV, vq)
                ):
                    rC = np.zeros((8, 8), np.int64)
                    for blk in range(4):
                        by, bx = blk // 2, blk % 2
                        d = qlist[blk].copy()
                        d[0] *= q["uv"][0]
                        d[1:] *= q["uv"][1]
                        rC[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = (
                            _idct4x4(d.reshape(4, 4))
                        )
                    tgt = np.clip(pred + rC, 0, 255).astype(np.uint8)
                    if comp == 0:
                        U[cy0 : cy0 + 8, cx0 : cx0 + 8] = tgt
                    else:
                        V[cy0 : cy0 + 8, cx0 : cx0 + 8] = tgt
            per_mb.append((skip, ymode, uvmode, y2q, yq, uq, vq))

    # ---- first partition: header + modes
    prob_skip = 200
    he = _BoolEnc()
    he.literal(0, 1)  # color_space
    he.literal(0, 1)  # clamping_type
    he.write(0, 128)  # segmentation_enabled
    he.literal(0, 1)  # filter_type
    he.literal(0, 6)  # loop_filter_level 0 (no in-loop filter)
    he.literal(0, 3)  # sharpness
    he.write(0, 128)  # loop_filter_adj_enable
    he.literal(0, 2)  # log2 token partitions = 0
    he.literal(qi, 7)  # y_ac_qi
    for _ in range(5):
        he.write(0, 128)  # no quantizer deltas
    he.write(1, 128)  # refresh_entropy_probs
    for _ in range(4 * 8 * 3 * 11):
        he.write(0, _UPDATE_PROB)  # no coefficient prob updates
    he.write(1, 128)  # mb_no_coeff_skip
    he.literal(prob_skip, 8)
    for skip, ymode, uvmode, *_rest in per_mb:
        he.write(1 if skip else 0, prob_skip)
        he.write(1, _KF_YMODE_PROBS[0])  # not B_PRED
        if ymode in (_DC, _V):
            he.write(0, _KF_YMODE_PROBS[1])
            he.write(0 if ymode == _DC else 1, 128)
        else:
            he.write(1, _KF_YMODE_PROBS[1])
            he.write(0 if ymode == _H else 1, 128)
        if uvmode == _DC:
            he.write(0, _KF_UVMODE_PROBS[0])
        else:
            he.write(1, _KF_UVMODE_PROBS[0])
            if uvmode == _V:
                he.write(0, _KF_UVMODE_PROBS[1])
            else:
                he.write(1, _KF_UVMODE_PROBS[1])
                he.write(0 if uvmode == _H else 1, _KF_UVMODE_PROBS[2])
    part1 = he.finish()

    # ---- token partition
    te = _BoolEnc()
    for skip, _ym, _uvm, y2q, yq, uq, vq in per_mb:
        if skip:
            continue
        _write_coeffs(te, 0, y2q)
        for cq in yq:
            _write_coeffs(te, 1, cq)
        for cq in uq + vq:
            _write_coeffs(te, 0, cq)
    part2 = te.finish()

    tag = (0) | (0 << 1) | (1 << 4) | (len(part1) << 5)
    header = (
        tag.to_bytes(3, "little")
        + b"\x9d\x01\x2a"
        + int(width).to_bytes(2, "little")
        + int(height).to_bytes(2, "little")
    )
    frame = header + part1 + part2
    return frame, (Y, U, V)


def encode_webp_lossy(y, u, v, qi: int = 40) -> bytes:
    """Wrap an encoded keyframe in the RIFF WebP container ('VP8 '
    chunk) — the fixture side of the lossy-WebP decode route."""
    frame, _ = encode_vp8_keyframe(y, u, v, qi=qi)
    chunk = b"VP8 " + len(frame).to_bytes(4, "little") + frame
    if len(frame) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body
