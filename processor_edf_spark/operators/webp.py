"""Pure-python WebP lossless (VP8L) decoder + fixture encoder.

WebP is the third big web-image format next to JPEG/PNG; a real crawl
corpus carries it everywhere.  The LOSSLESS profile (VP8L chunk) is a
fully self-contained spec — RFC 9649 §3 (the "WebP Lossless Bitstream
Specification") — decodable with nothing but bit reading, canonical
prefix codes and integer pixel transforms, so it gets the same
pure-python treatment as the LZW TIFF plugin: decodes for REAL in every
environment, no optional wheel.  The LOSSY profile (``VP8 `` chunk)
decodes for real too since r13 — the keyframe path in
operators/vp8.py (boolean arithmetic coder, whole-MB AND B_PRED
per-4x4 prediction, Y2 WHT + DCT residual tokens, the full §15
normal/simple in-loop deblocking filter since r14; derived-table
deviations documented there), routed via :func:`decode_webp_lossy`;
its honest residue (interframes, segmentation, multiple token
partitions, third-party probability tables) still raises through
``media_codecs.decode_webp``'s optional-extra contract.

Decoder coverage (everything the lossless spec allows):

- RIFF container: bare ``VP8L`` files and extended ``VP8X`` layouts
  (the VP8L chunk is located by chunk walk, not offset math).
- All four transforms — predictor (14 modes, linear-array top-right
  addressing), color transform (signed fixed-point deltas),
  subtract-green, color indexing incl. sub-byte pixel bundling.
- Meta prefix groups, color cache (hash 0x1e35a7bd), LZ77 backward
  references with the 120-entry plane-code distance mapping, and both
  simple and normal (code-length-coded) prefix codes with the
  ``max_symbol`` early-stop.

The encoder writes the minimal honest subset the fixtures need —
literal-only pixels under flat 8-bit prefix codes, optional
subtract-green, always-opaque alpha as a zero-bit simple code — enough
to round-trip arbitrary RGB arrays bit-exactly.  Feature paths the
encoder does not emit (LZ77, cache, predictor, palette) are pinned by
hand-assembled bitstreams in tests/test_webp.py, built with the same
BitWriter against pixel values computed from the spec's formulas.

Same contracts as the sibling codecs (jpeg.py / png.py / gif.py /
tiff.py): one exception type (UnsupportedMediaError), MAX_PIXELS
inflation guard, malformed input never escapes as a raw IndexError.
"""

from __future__ import annotations

import struct

import numpy as np

from processor_edf_spark.operators.jpeg import MAX_PIXELS
from processor_edf_spark.operators.media_codecs import UnsupportedMediaError

# code-length-code symbol transmission order (RFC 9649 §3.7.2.2)
CODE_LENGTH_CODE_ORDER = (
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
)

#: number of length codes appended to the green/literal alphabet
NUM_LENGTH_CODES = 24
#: distance alphabet size
NUM_DISTANCE_CODES = 40


def _plane_code_table() -> list[tuple[int, int]]:
    """The 120 plane-code (dx, dy) neighbor offsets (RFC 9649 §3.6.2.3,
    the distance-mapping table): the 120 closest pixels above/left of
    the current one — candidates (dx in [-8, 8], dy in [0, 8], strictly
    earlier in raster order) ranked by Euclidean distance², then by
    |dx| with the positive-dx twin first.  That ranking reproduces the
    spec's literal table exactly (its first rows: (0,1), (1,0), (1,1),
    (-1,1), (0,2), (2,0), (1,2), (-1,2), (2,1), (-2,1), ...) and the
    120-entry cutoff lands precisely at distance² < 80."""
    cands = []
    for dy in range(0, 9):
        for dx in range(-8, 9):
            if dy == 0 and dx <= 0:
                continue
            if dy > 0 or dx > 0:
                d2 = dx * dx + dy * dy
                if d2 < 80:
                    cands.append((d2, abs(dx), 0 if dx >= 0 else 1, dx, dy))
    cands.sort()
    table = [(dx, dy) for _, _, _, dx, dy in cands]
    if len(table) != 120:  # structural invariant, not data-dependent
        raise AssertionError(f"plane-code table size {len(table)}")
    return table


PLANE_CODES = _plane_code_table()


class BitReader:
    """LSB-first bit reader over bytes (VP8L bit order)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise UnsupportedMediaError("VP8L: bitstream truncated")
        v = 0
        p = self.pos
        for i in range(n):
            byte = self.data[(p + i) >> 3]
            v |= ((byte >> ((p + i) & 7)) & 1) << i
        self.pos = end
        return v

    def read_bit(self) -> int:
        p = self.pos
        if p >= len(self.data) * 8:
            raise UnsupportedMediaError("VP8L: bitstream truncated")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1


class BitWriter:
    """LSB-first bit writer (the encoder/test-stream twin)."""

    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Write a canonical prefix code MSB-first (codes are read bit
        by bit from the most significant end, Deflate-style)."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


class PrefixCode:
    """Canonical prefix code decoder: maps (length, code) -> symbol via
    incremental MSB-first bit walk.  Canonical assignment is the
    Deflate rule — shorter codes first, ties by symbol order."""

    __slots__ = ("table", "max_len", "single", "_codes")

    def __init__(self, lengths: list[int]):
        self.single: int | None = None
        used = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise UnsupportedMediaError("VP8L: empty prefix code")
        if len(used) == 1:
            # single-symbol code: zero bits per read
            self.single = used[0][0]
            self.table = {}
            self.max_len = 0
            self._codes = {self.single: (0, 0)}
            return
        # canonical codes; also verify completeness (Kraft == 1)
        kraft = sum(1 / (1 << ln) for _, ln in used)
        if abs(kraft - 1.0) > 1e-9:
            raise UnsupportedMediaError(
                f"VP8L: prefix code over/under-subscribed (kraft={kraft})"
            )
        self.max_len = max(ln for _, ln in used)
        bl_count = [0] * (self.max_len + 1)
        for _, ln in used:
            bl_count[ln] += 1
        next_code = [0] * (self.max_len + 2)
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        self.table: dict[tuple[int, int], int] = {}
        codes: dict[int, tuple[int, int]] = {}
        for s, ln in used:
            self.table[(ln, next_code[ln])] = s
            codes[s] = (next_code[ln], ln)
            next_code[ln] += 1
        self._codes = codes

    @property
    def codes(self) -> dict[int, tuple[int, int]]:
        """symbol -> (code, length); used by hand-built test streams."""
        return self._codes

    def read(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read_bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise UnsupportedMediaError("VP8L: invalid prefix code bits")


def canonical_lengths_to_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Public helper for encoder/tests: symbol -> (code, length)."""
    pc = PrefixCode(lengths)
    if pc.single is not None:
        return {pc.single: (0, 0)}
    return pc.codes


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_prefix_code(br: BitReader, alphabet_size: int) -> PrefixCode:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():
            sym0 = br.read(8)
        else:
            sym0 = br.read_bit()
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym0 >= alphabet_size or sym1 >= alphabet_size:
                raise UnsupportedMediaError("VP8L: simple code symbol range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            if sym0 >= alphabet_size:
                raise UnsupportedMediaError("VP8L: simple code symbol range")
            lengths[sym0] = 1
        return PrefixCode(lengths)
    num_code_lengths = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_code_lengths):
        clc_lengths[CODE_LENGTH_CODE_ORDER[i]] = br.read(3)
    clc = PrefixCode(clc_lengths)
    if br.read_bit():
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_code_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = clc.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len != 0:
                prev_code_len = code_len
        elif code_len == 16:
            repeat = 3 + br.read(2)
            for _ in range(repeat):
                if symbol >= alphabet_size:
                    raise UnsupportedMediaError("VP8L: length repeat overflow")
                lengths[symbol] = prev_code_len
                symbol += 1
        elif code_len == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
        if symbol > alphabet_size:
            raise UnsupportedMediaError("VP8L: length repeat overflow")
    return PrefixCode(lengths)


def _prefix_value(br: BitReader, code: int) -> int:
    """Length/distance prefix decoding (RFC 9649 §3.6.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _cache_key(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


class _Group:
    __slots__ = ("green", "red", "blue", "alpha", "dist")

    def __init__(self, br: BitReader, cache_size: int):
        self.green = _read_prefix_code(
            br, 256 + NUM_LENGTH_CODES + cache_size
        )
        self.red = _read_prefix_code(br, 256)
        self.blue = _read_prefix_code(br, 256)
        self.alpha = _read_prefix_code(br, 256)
        self.dist = _read_prefix_code(br, NUM_DISTANCE_CODES)


def _decode_entropy_image(br: BitReader, w: int, h: int) -> np.ndarray:
    """A sub-image (entropy/predictor/color-transform/palette): no
    transforms, no meta groups, but its own optional color cache."""
    return _decode_pixels(br, w, h, meta=None, meta_bits=0)


def _decode_pixels(br, w, h, meta, meta_bits) -> np.ndarray:
    """Shared spatial decoding loop -> (h, w) uint32 ARGB array."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise UnsupportedMediaError(f"VP8L: cache_bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0
    n_groups = 1
    if meta is not None:
        n_groups = int(meta.max()) + 1
    groups = [_Group(br, cache_size) for _ in range(n_groups)]
    cache = [0] * cache_size
    n = w * h
    px = np.zeros(n, dtype=np.uint32)
    pos = 0
    while pos < n:
        if meta is None:
            g = groups[0]
        else:
            x, y = pos % w, pos // w
            g = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        s = g.green.read(br)
        if s < 256:
            red = g.red.read(br)
            blue = g.blue.read(br)
            alpha = g.alpha.read(br)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            px[pos] = argb
            if cache_size:
                cache[_cache_key(argb, cache_bits)] = argb
            pos += 1
        elif s < 256 + NUM_LENGTH_CODES:
            length = _prefix_value(br, s - 256)
            dist_code = _prefix_value(br, g.dist.read(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = PLANE_CODES[dist_code - 1]
                dist = max(dy * w + dx, 1)
            if dist > pos or pos + length > n:
                raise UnsupportedMediaError("VP8L: LZ77 reference range")
            for _ in range(length):
                argb = int(px[pos - dist])
                px[pos] = argb
                if cache_size:
                    cache[_cache_key(argb, cache_bits)] = argb
                pos += 1
        else:
            idx = s - 256 - NUM_LENGTH_CODES
            if idx >= cache_size:
                raise UnsupportedMediaError("VP8L: cache index range")
            px[pos] = cache[idx]
            pos += 1
    return px.reshape(h, w)


def _subblocks(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    a = img >> 24
    r = (img >> 16) & 0xFF
    g = (img >> 8) & 0xFF
    b = img & 0xFF
    r = (r + g) & 0xFF
    b = (b + g) & 0xFF
    return (a << 24) | (r << 16) | (g << 8) | b


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed-int8 product >> 5 (RFC 9649 §3.5.2)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(
    img: np.ndarray, cti: np.ndarray, bits: int
) -> np.ndarray:
    h, w = img.shape
    out = img.copy()
    for y in range(h):
        for x in range(w):
            t = int(cti[y >> bits, x >> bits])
            g2r = t & 0xFF  # blue channel of the transform pixel
            g2b = (t >> 8) & 0xFF  # green channel
            r2b = (t >> 16) & 0xFF  # red channel
            p = int(out[y, x])
            a = p >> 24
            r = (p >> 16) & 0xFF
            g = (p >> 8) & 0xFF
            b = p & 0xFF
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            out[y, x] = (a << 24) | (r << 16) | (g << 8) | b
    return out


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) // 2) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) // 2) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) // 2) << 8)
        | ((((a & 0xFF) + (b & 0xFF)) // 2))
    )


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(l: int, t: int, tl: int) -> int:  # noqa: E741
    p_alpha = (l >> 24) + (t >> 24) - (tl >> 24)
    p_red = ((l >> 16) & 0xFF) + ((t >> 16) & 0xFF) - ((tl >> 16) & 0xFF)
    p_green = ((l >> 8) & 0xFF) + ((t >> 8) & 0xFF) - ((tl >> 8) & 0xFF)
    p_blue = (l & 0xFF) + (t & 0xFF) - (tl & 0xFF)
    pl = (
        abs(p_alpha - (l >> 24))
        + abs(p_red - ((l >> 16) & 0xFF))
        + abs(p_green - ((l >> 8) & 0xFF))
        + abs(p_blue - (l & 0xFF))
    )
    pt = (
        abs(p_alpha - (t >> 24))
        + abs(p_red - ((t >> 16) & 0xFF))
        + abs(p_green - ((t >> 8) & 0xFF))
        + abs(p_blue - (t & 0xFF))
    )
    return l if pl <= pt else t


def _cas_full(l: int, t: int, tl: int) -> int:  # noqa: E741
    out = 0
    for sh in (24, 16, 8, 0):
        c = _clamp(((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF))
        out |= c << sh
    return out


def _cas_half(avg: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (avg >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        c = _clamp(a + (a - b) // 2)
        out |= c << sh
    return out


def _inv_predictor(img: np.ndarray, pti: np.ndarray, bits: int) -> np.ndarray:
    h, w = img.shape
    px = img.reshape(-1).astype(np.int64).tolist()
    for i in range(h * w):
        x, y = i % w, i // w
        if x == 0 and y == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = px[i - 1]  # left
        elif x == 0:
            pred = px[i - w]  # top
        else:
            mode = (int(pti[y >> bits, x >> bits]) >> 8) & 0xFF
            l = px[i - 1]  # noqa: E741
            t = px[i - w]
            # linear-array addressing: for the last column, top-right
            # wraps to the current row's first pixel (spec behavior)
            tr = px[i - w + 1]
            tl = px[i - w - 1]
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = l
            elif mode == 2:
                pred = t
            elif mode == 3:
                pred = tr
            elif mode == 4:
                pred = tl
            elif mode == 5:
                pred = _avg2(_avg2(l, tr), t)
            elif mode == 6:
                pred = _avg2(l, tl)
            elif mode == 7:
                pred = _avg2(l, t)
            elif mode == 8:
                pred = _avg2(tl, t)
            elif mode == 9:
                pred = _avg2(t, tr)
            elif mode == 10:
                pred = _avg2(_avg2(l, tl), _avg2(t, tr))
            elif mode == 11:
                pred = _select(l, t, tl)
            elif mode == 12:
                pred = _cas_full(l, t, tl)
            elif mode == 13:
                pred = _cas_half(_avg2(l, t), tl)
            else:
                raise UnsupportedMediaError(f"VP8L: predictor mode {mode}")
        p = px[i]
        px[i] = (
            ((((p >> 24) + (pred >> 24)) & 0xFF) << 24)
            | (((((p >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16)
            | (((((p >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8)
            | (((p & 0xFF) + (pred & 0xFF)) & 0xFF)
        )
    return np.array(px, dtype=np.uint32).reshape(h, w)


def _inv_color_indexing(
    img: np.ndarray, palette: np.ndarray, width_bits: int, full_w: int
) -> np.ndarray:
    h = img.shape[0]
    n_colors = palette.shape[0]
    if width_bits == 0:
        idx = (img >> 8) & 0xFF
        safe = np.where(idx < n_colors, idx, 0)
        out = palette[safe]
        if (idx >= n_colors).any():
            raise UnsupportedMediaError("VP8L: palette index range")
        return out
    xsub = 1 << width_bits
    bits_pp = 8 >> width_bits
    mask = (1 << bits_pp) - 1
    out = np.zeros((h, full_w), dtype=np.uint32)
    for y in range(h):
        for x in range(full_w):
            packed = int(img[y, x >> width_bits] >> 8) & 0xFF
            idx = (packed >> ((x % xsub) * bits_pp)) & mask
            if idx >= n_colors:
                raise UnsupportedMediaError("VP8L: palette index range")
            out[y, x] = palette[idx]
    return out


def decode_vp8l(data: bytes) -> np.ndarray:
    """VP8L chunk payload -> HxWx3 uint8 RGB (alpha dropped, as the
    sibling decoders do)."""
    br = BitReader(data)
    if br.read(8) != 0x2F:
        raise UnsupportedMediaError("VP8L: bad signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read_bit()  # alpha hint
    if br.read(3) != 0:
        raise UnsupportedMediaError("VP8L: unknown version")
    if w * h > MAX_PIXELS:
        raise UnsupportedMediaError(f"VP8L: {w}x{h} exceeds MAX_PIXELS")

    cur_w = w
    transforms = []  # (type, payload) in read order
    seen = set()
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen:
            raise UnsupportedMediaError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype == 2:  # subtract green
            transforms.append((2, None))
        elif ttype in (0, 1):  # predictor / color transform
            bits = br.read(3) + 2
            sub = _decode_entropy_image(
                br, _subblocks(cur_w, bits), _subblocks(h, bits)
            )
            transforms.append((ttype, (bits, sub)))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal_img = _decode_entropy_image(br, n_colors, 1)
            # palette entries are delta-coded per channel
            pal = pal_img.reshape(-1).astype(np.uint32)
            acc = 0
            out = np.zeros(n_colors, dtype=np.uint32)
            for i in range(n_colors):
                # component-wise modular cumulative sum
                p = int(pal[i])
                a = ((acc >> 24) + (p >> 24)) & 0xFF
                r = (((acc >> 16) & 0xFF) + ((p >> 16) & 0xFF)) & 0xFF
                g = (((acc >> 8) & 0xFF) + ((p >> 8) & 0xFF)) & 0xFF
                b = ((acc & 0xFF) + (p & 0xFF)) & 0xFF
                acc = (a << 24) | (r << 16) | (g << 8) | b
                out[i] = acc
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append((3, (width_bits, out, cur_w)))
            cur_w = _subblocks(cur_w, width_bits)

    meta = None
    meta_bits = 0
    if br.read_bit():  # meta prefix codes
        meta_bits = br.read(3) + 2
        ent = _decode_entropy_image(
            br, _subblocks(cur_w, meta_bits), _subblocks(h, meta_bits)
        )
        meta = ((ent >> 8) & 0xFFFF).astype(np.int64)
    img = _decode_pixels(br, cur_w, h, meta, meta_bits)

    for ttype, payload in reversed(transforms):
        if ttype == 3:
            width_bits, pal, full_w = payload
            img = _inv_color_indexing(img, pal, width_bits, full_w)
        elif ttype == 2:
            img = _inv_subtract_green(img)
        elif ttype == 1:
            bits, sub = payload
            img = _inv_color_transform(img, sub, bits)
        else:
            bits, sub = payload
            img = _inv_predictor(img, sub, bits)

    rgb = np.zeros((h, w, 3), dtype=np.uint8)
    rgb[..., 0] = (img >> 16) & 0xFF
    rgb[..., 1] = (img >> 8) & 0xFF
    rgb[..., 2] = img & 0xFF
    return rgb


def _riff_chunks(payload: bytes):
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise UnsupportedMediaError("not a RIFF/WEBP container")
    off = 12
    while off + 8 <= len(payload):
        tag = payload[off : off + 4]
        (size,) = struct.unpack("<I", payload[off + 4 : off + 8])
        body = payload[off + 8 : off + 8 + size]
        if len(body) < size:
            raise UnsupportedMediaError("WebP: chunk truncated")
        yield tag, body
        off += 8 + size + (size & 1)  # chunks are 2-byte aligned


def decode_webp_lossless(payload: bytes) -> np.ndarray:
    """RIFF/WEBP payload -> HxWx3 uint8 RGB via the pure-python VP8L
    path.  Lossy ``VP8 `` payloads raise the one-exception contract
    naming the optional codec extra that covers them."""
    vp8l = None
    saw_lossy = False
    for tag, body in _riff_chunks(payload):
        if tag == b"VP8L":
            vp8l = body
            break
        if tag == b"VP8 ":
            saw_lossy = True
    if vp8l is None:
        if saw_lossy:
            raise UnsupportedMediaError(
                "WebP lossy (VP8) needs an optional codec extra (Pillow); "
                "the pure-python path covers VP8L lossless only"
            )
        raise UnsupportedMediaError("WebP: no VP8L chunk")
    try:
        return decode_vp8l(vp8l)
    except UnsupportedMediaError:
        raise
    except (struct.error, ValueError, IndexError, KeyError) as e:
        raise UnsupportedMediaError(f"malformed VP8L: {e}") from e


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------


def _write_flat_literal_code(bw: BitWriter, alphabet_size: int) -> None:
    """Write a normal (non-simple) prefix code whose 256 literal symbols
    all have length 8 (the flat code: symbol == its 8-bit canonical
    code), with any trailing alphabet symbols at length 0.

    Code-length code: symbols {0, 8} both length 1 — a complete 1-bit
    tree (0 -> 'skip', 8 -> 'length 8'), written as 13 3-bit entries in
    CODE_LENGTH_CODE_ORDER (indices through symbol 8)."""
    bw.write(0, 1)  # not simple
    bw.write(13 - 4, 4)  # num_code_lengths = 13
    for i in range(13):
        sym = CODE_LENGTH_CODE_ORDER[i]
        bw.write(1 if sym in (0, 8) else 0, 3)
    bw.write(0, 1)  # no max_symbol
    # canonical over {0: len1, 8: len1}: symbol 0 -> code 0, 8 -> code 1
    for _ in range(256):
        bw.write_code(1, 1)  # 'length 8'
    for _ in range(alphabet_size - 256):
        bw.write_code(0, 1)  # 'length 0'


def write_prefix_code(bw: BitWriter, lengths: list[int]) -> None:
    """Write an arbitrary code-length assignment through the normal
    (code-length-coded) path, entry by entry (no 16/17/18 run-length
    shortcuts).  The code-length code itself is built as a flat k-bit
    tree over the distinct length values used (padded to a power of two
    with unused code-length symbols so the tree is complete).  Used by
    the fixture encoder and the hand-assembled spec-path test streams."""
    needed = sorted(set(lengths))
    if len(needed) == 1:
        # one distinct value: a single-symbol (zero-bit) code-length code
        clc_lengths = [0] * 19
        clc_lengths[needed[0]] = 1
        chosen = set(needed)
    else:
        k = max(1, (len(needed) - 1).bit_length())
        pad = (1 << k) - len(needed)
        spares = [s for s in range(16) if s not in needed][:pad]
        chosen = set(needed) | set(spares)
        clc_lengths = [0] * 19
        for s in chosen:
            clc_lengths[s] = k
    num_code_lengths = max(
        4, 1 + max(CODE_LENGTH_CODE_ORDER.index(s) for s in chosen)
    )
    bw.write(0, 1)  # not simple
    bw.write(num_code_lengths - 4, 4)
    for i in range(num_code_lengths):
        bw.write(clc_lengths[CODE_LENGTH_CODE_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol
    clc_codes = canonical_lengths_to_codes(clc_lengths)
    for ln in lengths:
        code, n = clc_codes[ln]
        bw.write_code(code, n)


def emit_prefix_value(bw: BitWriter, codes, value: int) -> None:
    """Emit a length/distance ``value`` as (prefix symbol via ``codes``,
    extra bits) — the encoder inverse of :func:`_prefix_value`."""
    for code in range(NUM_DISTANCE_CODES):
        if code < 4:
            lo = hi = code + 1
            extra = 0
        else:
            extra = (code - 2) >> 1
            offset = (2 + (code & 1)) << extra
            lo, hi = offset + 1, offset + (1 << extra)
        if lo <= value <= hi:
            c, n = codes[code]
            bw.write_code(c, n)
            if extra:
                bw.write(value - lo, extra)
            return
    raise ValueError(f"prefix value {value} out of range")


def _write_single_symbol_code(bw: BitWriter, symbol: int) -> None:
    """Simple prefix code with one symbol — zero bits per read."""
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # num_symbols = 1
    if symbol < 2:
        bw.write(0, 1)  # 1-bit first symbol
        bw.write(symbol, 1)
    else:
        bw.write(1, 1)  # 8-bit first symbol
        bw.write(symbol, 8)


def encode_vp8l(img: np.ndarray, subtract_green: bool = False) -> bytes:
    """HxWx3 uint8 RGB -> VP8L chunk payload: literal-only pixels under
    flat 8-bit green/red/blue codes, zero-bit opaque alpha, optional
    subtract-green transform.  ~3 bytes/pixel — a fixture encoder, not
    a compressor."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected HxWx3 uint8")
    h, w = img.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("VP8L dims out of range")
    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    r = img[..., 0].astype(np.int16)
    g = img[..., 1].astype(np.int16)
    b = img[..., 2].astype(np.int16)
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # transform: subtract green
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    bw.write(0, 1)  # end of transforms
    bw.write(0, 1)  # no meta prefix codes
    bw.write(0, 1)  # no color cache
    _write_flat_literal_code(bw, 256 + NUM_LENGTH_CODES)  # green
    _write_flat_literal_code(bw, 256)  # red
    _write_flat_literal_code(bw, 256)  # blue
    _write_single_symbol_code(bw, 255)  # alpha: always opaque
    _write_single_symbol_code(bw, 0)  # distance: never read
    for y in range(h):
        for x in range(w):
            bw.write_code(int(g[y, x]), 8)
            bw.write_code(int(r[y, x]), 8)
            bw.write_code(int(b[y, x]), 8)
    return bw.tobytes()


def encode_webp_lossless(
    img: np.ndarray, subtract_green: bool = False
) -> bytes:
    """HxWx3 uint8 RGB -> complete RIFF/WEBP file (VP8L chunk)."""
    chunk = encode_vp8l(img, subtract_green=subtract_green)
    body = b"VP8L" + struct.pack("<I", len(chunk)) + chunk
    if len(chunk) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def decode_webp_lossy(payload: bytes) -> np.ndarray:
    """RIFF/WEBP payload -> HxWx3 uint8 RGB via the pure-python VP8
    keyframe path (operators/vp8.py — whole-MB + B_PRED prediction
    and the §15 in-loop filter since r14, with the documented
    derived-table deviations)."""
    frame = None
    for tag, body in _riff_chunks(payload):
        if tag == b"VP8 ":
            frame = body
            break
    if frame is None:
        raise UnsupportedMediaError("WebP: no VP8 chunk")
    from processor_edf_spark.operators.vp8 import decode_vp8_keyframe

    try:
        _w, _h, rgb = decode_vp8_keyframe(frame)
    except UnsupportedMediaError:
        raise
    except (struct.error, ValueError, IndexError, KeyError) as e:
        raise UnsupportedMediaError(f"malformed VP8: {e}") from e
    return rgb


# ---------------------------------------------------------------------------
# animated WebP (VP8X + ANIM/ANMF, r14 continuation)
# ---------------------------------------------------------------------------


def _u24(b: bytes, off: int) -> int:
    return b[off] | (b[off + 1] << 8) | (b[off + 2] << 16)


def decode_webp_anim(payload: bytes):
    """Animated WebP -> (canvas_w, canvas_h, loop_count, frames) with
    frames = [(x, y, duration_ms, dispose, rgb)], rgb per frame via
    the real VP8L / VP8 decoders.  Composition semantics note: the
    pure-python decoders carry no alpha plane, so frame blending is a
    rectangle overwrite (identical to spec blending at alpha = 255);
    the dispose-to-background flag is honored by
    :func:`compose_webp_anim`."""
    chunks = list(_riff_chunks(payload))
    vp8x = next((b for t, b in chunks if t == b"VP8X"), None)
    if vp8x is None or len(vp8x) < 10 or not (vp8x[0] & 0x02):
        raise UnsupportedMediaError(
            "WebP: not an animated (VP8X/ANIM) file"
        )
    cw = _u24(vp8x, 4) + 1
    ch = _u24(vp8x, 7) + 1
    if cw * ch > MAX_PIXELS:
        raise UnsupportedMediaError("WebP: canvas exceeds MAX_PIXELS")
    anim = next((b for t, b in chunks if t == b"ANIM"), None)
    if anim is None or len(anim) < 6:
        raise UnsupportedMediaError("WebP: VP8X animation without ANIM")
    background = (anim[2], anim[1], anim[0])  # BGRA -> RGB
    loop = anim[4] | (anim[5] << 8)
    frames = []
    for tag, body in chunks:
        if tag != b"ANMF":
            continue
        if len(body) < 16:
            raise UnsupportedMediaError("WebP: ANMF header truncated")
        fx = _u24(body, 0) * 2
        fy = _u24(body, 3) * 2
        fw = _u24(body, 6) + 1
        fh = _u24(body, 9) + 1
        duration = _u24(body, 12)
        flags = body[15]
        dispose = bool(flags & 0x01)
        if fx + fw > cw or fy + fh > ch:
            raise UnsupportedMediaError(
                "WebP: ANMF frame rectangle outside the canvas"
            )
        sub = body[16:]
        rgb = None
        off = 0
        while off + 8 <= len(sub):
            stag = sub[off : off + 4]
            (ssize,) = struct.unpack("<I", sub[off + 4 : off + 8])
            sbody = sub[off + 8 : off + 8 + ssize]
            if len(sbody) < ssize:
                raise UnsupportedMediaError("WebP: ANMF subchunk truncated")
            if stag == b"VP8L":
                rgb = decode_vp8l(sbody)
                break
            if stag == b"VP8 ":
                from processor_edf_spark.operators.vp8 import (
                    decode_vp8_keyframe,
                )

                _w, _h, rgb = decode_vp8_keyframe(sbody)
                break
            off += 8 + ssize + (ssize & 1)  # skip ALPH etc.
        if rgb is None:
            raise UnsupportedMediaError("WebP: ANMF without image data")
        if rgb.shape[0] != fh or rgb.shape[1] != fw:
            raise UnsupportedMediaError(
                "WebP: ANMF dimensions disagree with the frame payload"
            )
        frames.append((fx, fy, duration, dispose, rgb))
    if not frames:
        raise UnsupportedMediaError("WebP: animation without frames")
    return cw, ch, loop, background, frames


def compose_webp_anim(payload: bytes):
    """Animated WebP -> (loop_count, [composed HxWx3 canvases]) — the
    spec's canvas state machine: start from the background color,
    overwrite each frame rectangle, dispose-to-background after a
    frame that asks for it."""
    cw, ch, loop, background, frames = decode_webp_anim(payload)
    canvas = np.empty((ch, cw, 3), np.uint8)
    canvas[:] = np.array(background, np.uint8)
    out = []
    for fx, fy, _dur, dispose, rgb in frames:
        canvas[fy : fy + rgb.shape[0], fx : fx + rgb.shape[1]] = rgb
        out.append(canvas.copy())
        if dispose:
            canvas[fy : fy + rgb.shape[0], fx : fx + rgb.shape[1]] = (
                np.array(background, np.uint8)
            )
    return loop, out


def encode_webp_anim(
    frames, canvas_w: int, canvas_h: int,
    background=(255, 255, 255), loop: int = 0,
) -> bytes:
    """Fixture animated-WebP writer: ``frames`` =
    [(x, y, duration_ms, dispose, rgb)] with even offsets, each frame
    a lossless VP8L chunk (bit-exact round trips by construction).
    -> complete RIFF/WEBP file (VP8X + ANIM + ANMF...)."""
    body = bytearray()
    flags = 0x02  # animation
    vp8x = bytes([flags, 0, 0, 0]) + (
        (canvas_w - 1).to_bytes(3, "little")
        + (canvas_h - 1).to_bytes(3, "little")
    )
    body += b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    anim = bytes(
        [background[2], background[1], background[0], 255]
    ) + loop.to_bytes(2, "little")
    body += b"ANIM" + struct.pack("<I", len(anim)) + anim
    for fx, fy, duration, dispose, rgb in frames:
        if fx % 2 or fy % 2:
            raise UnsupportedMediaError(
                "WebP anim: frame offsets must be even"
            )
        h, w = rgb.shape[:2]
        if fx + w > canvas_w or fy + h > canvas_h:
            raise UnsupportedMediaError(
                "WebP anim: frame outside the canvas"
            )
        chunk = encode_vp8l(np.asarray(rgb, np.uint8))
        sub = b"VP8L" + struct.pack("<I", len(chunk)) + chunk
        if len(chunk) & 1:
            sub += b"\x00"
        anmf = (
            (fx // 2).to_bytes(3, "little")
            + (fy // 2).to_bytes(3, "little")
            + (w - 1).to_bytes(3, "little")
            + (h - 1).to_bytes(3, "little")
            + int(duration).to_bytes(3, "little")
            + bytes([0x01 if dispose else 0x00])
            + sub
        )
        body += b"ANMF" + struct.pack("<I", len(anmf)) + anmf
        if len(anmf) & 1:
            body += b"\x00"
    return (
        b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + bytes(body)
    )
