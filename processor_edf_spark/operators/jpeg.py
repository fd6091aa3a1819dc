"""Pure-numpy baseline JPEG codec — the one compressed format a real
multimodal corpus is mostly made of (VERDICT r4 "What's missing" #2).

Decoder: sequential baseline DCT (SOF0), 8-bit, grayscale or YCbCr with
any h/v subsampling (4:4:4, 4:2:0, 4:2:2 …), restart intervals (DRI),
standard or custom quant/huffman tables.  Progressive (SOF2),
arithmetic coding, and 12-bit precision raise ``UnsupportedMediaError``
— the callers' stub fallback owns those, same contract as every other
codec in operators/media_codecs.py.

Implementation notes (all from the public ITU T.81 spec):
- entropy decode is the inherently-sequential part: a Python bit reader
  over the byte-stuffed scan, canonical Huffman via a (length, code)
  dict — per-row cost, Arrow-batched by the multimodal mapInPandas
  callers like every other per-row decode;
- dequantize + IDCT + upsample + color convert are vectorized numpy
  over ALL blocks at once (einsum with the precomputed 8x8 DCT basis,
  np.repeat for chroma upsampling) — no per-pixel Python;
- the encoder exists for tests/fixtures (the container ships no codec
  libraries to make golden JPEGs with): baseline 4:4:4, Annex K
  standard tables.  Encoder and decoder share only the spec constants,
  so the round-trip golden test crosses two independent
  implementations of DCT/Huffman/zigzag.
"""

from __future__ import annotations

import struct

import numpy as np

from processor_edf_spark.operators.media_codecs import UnsupportedMediaError

# ITU T.81 Figure A.6 zigzag order
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1 quantization tables (quality 50 reference)
STD_LUMA_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
STD_CHROMA_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 typical Huffman tables: (BITS counts per code length 1..16, VALUES)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_basis() -> np.ndarray:
    """8x8 type-II DCT basis T with T[u, x] = c(u)/2 · cos((2x+1)uπ/16);
    forward: T @ B @ T.T, inverse: T.T @ C @ T."""
    T = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            T[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    return T


_T = _dct_basis()

#: Decode-side sanity bound (shared with operators/png.py): 64 MP covers
#: any plausible corpus image; beyond it a lying header is the likely
#: cause, and refusing protects the executor from attacker-sized
#: allocations in the per-row decode path.
MAX_PIXELS = 1 << 26


def _build_decode_table(bits: list[int], values: list[int]) -> dict:
    """Canonical Huffman: (code_length, code) → symbol."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over the entropy-coded scan with 0xFF00 byte
    unstuffing.  A bare marker mid-scan surfaces as exhaustion (the
    restart handling realigns around RSTn markers explicitly)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartHit()
            else:
                raise UnsupportedMediaError("marker inside entropy scan")
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def read_bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.buf >> self.nbits) & ((1 << n) - 1)
        self.buf &= (1 << self.nbits) - 1
        return v

    def decode(self, table: dict) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.read_bits(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise UnsupportedMediaError("invalid Huffman code in scan")

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.read_bits(s)
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    def restart_align(self) -> None:
        """Consume a RSTn marker between restart intervals."""
        self.buf = 0
        self.nbits = 0
        if (
            self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise UnsupportedMediaError("expected restart marker")


class _RestartHit(Exception):
    """Internal: bit reader ran into a RSTn marker (only legal exactly at
    a restart boundary, where restart_align consumes it)."""


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → HxWx3 uint8 RGB (grayscale replicated to 3
    channels, matching decode_image's contract).  Raises
    UnsupportedMediaError for progressive/arithmetic/12-bit streams and
    malformed payloads."""
    try:
        return _decode_jpeg(payload)
    except UnsupportedMediaError:
        raise
    except (struct.error, ValueError, IndexError, KeyError, _RestartHit) as e:
        raise UnsupportedMediaError(f"malformed JPEG: {e}") from e


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise UnsupportedMediaError("not a JPEG payload (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (height, width, components)
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise UnsupportedMediaError("marker desync in header stream")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before any scan
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise UnsupportedMediaError("16-bit quant table")
                qt[tq] = np.frombuffer(
                    body[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int32)
                p += 65
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                values = list(body[p + 17 : p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(
                    bits, values
                )
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = body[0]
            if precision != 8:
                raise UnsupportedMediaError(f"{precision}-bit JPEG")
            height, width = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            if height < 1 or width < 1 or ncomp not in (1, 3):
                raise UnsupportedMediaError("unsupported SOF0 layout")
            if height * width > MAX_PIXELS:
                # a lying SOF dimension would otherwise allocate the
                # full coefficient store BEFORE any entropy data is
                # validated — multi-GB from a few flipped header bits
                raise UnsupportedMediaError(
                    f"image {width}x{height} exceeds the {MAX_PIXELS}-pixel "
                    "decode bound"
                )
            frame = (height, width, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedMediaError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy scan follows
            if frame is None:
                raise UnsupportedMediaError("SOS before SOF0")
            ns = body[0]
            scan_map = {}
            for i in range(ns):
                cs, tables = body[1 + 2 * i], body[2 + 2 * i]
                scan_map[cs] = (tables >> 4, tables & 0x0F)
            planes = _decode_scan(
                payload,
                pos + 2 + seglen,
                frame,
                scan_map,
                qt,
                huff_dc,
                huff_ac,
                restart_interval,
            )
            return _to_rgb(planes, frame)
        pos += 2 + seglen
    raise UnsupportedMediaError("no SOS scan found")


def _decode_scan(payload, scan_start, frame, scan_map, qt, huff_dc, huff_ac, restart_interval):
    height, width, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    # per-component coefficient store: (blocks_y, blocks_x, 64)
    store = []
    for c in comps:
        by, bx = mcus_y * c["v"], mcus_x * c["h"]
        store.append(np.zeros((by, bx, 64), dtype=np.int32))

    reader = _BitReader(payload, scan_start)
    pred = [0] * len(comps)
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            reader.restart_align()
            pred = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, c in enumerate(comps):
            dc_t, ac_t = scan_map[c["id"]]
            dct, act = huff_dc[dc_t], huff_ac[ac_t]
            for v in range(c["v"]):
                for h in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int32)
                    s = reader.decode(dct)
                    pred[ci] += reader.receive_extend(s)
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode(act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise UnsupportedMediaError("AC run past block end")
                        zz[k] = reader.receive_extend(s)
                        k += 1
                    store[ci][my * c["v"] + v, mx * c["h"] + h] = zz

    # vectorized: dequantize → un-zigzag → IDCT over every block at once
    planes = []
    for ci, c in enumerate(comps):
        by, bx, _ = store[ci].shape
        coeff = store[ci].reshape(-1, 64).astype(np.float64) * qt[c["tq"]][None, :]
        blocks = np.zeros((coeff.shape[0], 64))
        blocks[:, ZIGZAG] = coeff
        blocks = blocks.reshape(-1, 8, 8)
        spatial = np.einsum("xu,nuv,vy->nxy", _T.T, blocks, _T) + 128.0
        plane = (
            spatial.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # upsample subsampled chroma to full grid, crop to image size
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(hmax // c["h"], axis=1)
        planes.append(plane[:height, :width])
    return planes


def _to_rgb(planes, frame) -> np.ndarray:
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Minimal baseline encoder (tests + fixtures): 4:4:4, Annex K tables
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.buf = (self.buf << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.buf &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad per spec

    def marker(self, m: int) -> None:
        """Emit a bare marker into the entropy stream (markers are never
        byte-stuffed): pad to a byte boundary first."""
        self.pad_to_byte()
        self.out += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.out)


def _build_encode_table(bits: list[int], values: list[int]) -> dict:
    """symbol → (code, length), canonical assignment (encoder mirror of
    _build_decode_table)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """(category s, s-bit representation) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, v if v >= 0 else v + (1 << s) - 1


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of the Annex K tables (public
    formula: scale = 5000/q below 50, 200-2q above)."""
    q = min(max(quality, 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = (base * scale + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def _encode_block(writer, block, qt, dc_tab, ac_tab, pred_dc):
    """Forward DCT + quantize + entropy-encode one 8x8 block; returns
    the new DC predictor."""
    coeff = _T @ (block - 128.0) @ _T.T
    qz = np.round(coeff / qt.reshape(8, 8)).astype(np.int32)
    zz = qz.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred_dc
    s, rep = _magnitude(diff)
    code, length = dc_tab[s]
    writer.write(code, length)
    if s:
        writer.write(rep, s)
    run = 0
    last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
    for k in range(1, 64):
        if k > last_nz:
            code, length = ac_tab[0x00]  # EOB
            writer.write(code, length)
            break
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s, rep = _magnitude(v)
        code, length = ac_tab[(run << 4) | s]
        writer.write(code, length)
        writer.write(rep, s)
        run = 0
    return int(zz[0])


def encode_jpeg_baseline(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode HxW (grayscale) or HxWx3 uint8 RGB as baseline JPEG with
    standard Annex K tables.  ``subsampling``: "444" (one block per
    component per MCU) or "420" (2x2 luma blocks + box-averaged chroma —
    the layout real-world JPEGs overwhelmingly use).
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    every N MCUs with DC predictors reset — the layout camera firmware
    commonly writes, and the fixture that exercises the decoder's
    restart realignment."""
    arr = np.asarray(img, dtype=np.float64)
    gray = arr.ndim == 2
    if gray:
        h, w = arr.shape
        planes = [arr]
        comp_hv = [(1, 1)]
    else:
        h, w, _ = arr.shape
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "444":
            planes = [y, cb, cr]
            comp_hv = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            # pad to even dims, then 2x2 box-average the chroma planes
            ye = np.pad(y, ((0, h & 1), (0, w & 1)), mode="edge")
            cbe = np.pad(cb, ((0, h & 1), (0, w & 1)), mode="edge")
            cre = np.pad(cr, ((0, h & 1), (0, w & 1)), mode="edge")
            he, we = ye.shape
            cb_d = cbe.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr_d = cre.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            planes = [y, cb_d, cr_d]
            comp_hv = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")

    qts = [_scale_qt(STD_LUMA_QT, quality), _scale_qt(STD_CHROMA_QT, quality)]
    dc_tabs = [_build_encode_table(*STD_DC_LUMA), _build_encode_table(*STD_DC_CHROMA)]
    ac_tabs = [_build_encode_table(*STD_AC_LUMA), _build_encode_table(*STD_AC_CHROMA)]
    comp_tq = [0] + [1] * (len(planes) - 1)

    hmax = max(ch for ch, _ in comp_hv)
    vmax = max(cv for _, cv in comp_hv)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # edge-pad each plane to its own full-MCU grid
    padded = []
    for plane, (ch, cv) in zip(planes, comp_hv):
        ph, pw = mcus_y * cv * 8, mcus_x * ch * 8
        p = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        padded.append(p)

    writer = _BitWriter()
    pred = [0] * len(planes)
    m = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and m and m % restart_interval == 0:
                writer.marker(0xD0 + ((m // restart_interval - 1) & 7))
                pred = [0] * len(planes)
            m += 1
            for ci, (p, (ch, cv), tq) in enumerate(
                zip(padded, comp_hv, comp_tq)
            ):
                for v in range(cv):
                    for hh in range(ch):
                        by, bx = my * cv + v, mx * ch + hh
                        block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                        pred[ci] = _encode_block(
                            writer, block, qts[tq], dc_tabs[tq], ac_tabs[tq], pred[ci]
                        )

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    n_qt = 1 if gray else 2
    for tq in range(n_qt):
        out += seg(0xDB, bytes([tq]) + bytes(qts[tq].tolist()))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(planes)])
    for ci, ((ch, cv), tq) in enumerate(zip(comp_hv, comp_tq)):
        sof += bytes([ci + 1, (ch << 4) | cv, tq])
    out += seg(0xC0, sof)
    huff_specs = [(0, 0, STD_DC_LUMA), (1, 0, STD_AC_LUMA)]
    if not gray:
        huff_specs += [(0, 1, STD_DC_CHROMA), (1, 1, STD_AC_CHROMA)]
    for tc, th, (bits, values) in huff_specs:
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(values))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for ci, tq in enumerate(comp_tq):
        sos += bytes([ci + 1, (tq << 4) | tq])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.flush()
    out += b"\xff\xd9"
    return out
