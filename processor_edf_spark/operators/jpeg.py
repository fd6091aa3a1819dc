"""Pure-numpy JPEG codec — the one compressed format a real multimodal
corpus is mostly made of (VERDICT r4 "What's missing" #2).

Decoder: sequential baseline DCT (SOF0) AND progressive (SOF2) — the
full T.81 progressive feature set: spectral selection, successive
approximation for DC and AC, EOB-run codes, the G.1.2.3 AC refinement
algorithm, multi-scan table redefinition — 8-bit, grayscale or YCbCr
with any h/v subsampling (4:4:4, 4:2:0, 4:2:2 …), restart intervals
(DRI), standard or custom quant/huffman tables.  Arithmetic coding,
hierarchical, and 12-bit precision raise ``UnsupportedMediaError`` —
the callers' stub fallback owns those, same contract as every other
codec in operators/media_codecs.py.

Implementation notes (all from the public ITU T.81 spec):
- entropy decode is the inherently-sequential part: a Python bit reader
  over the byte-stuffed scan, canonical Huffman via a (length, code)
  dict — per-row cost, Arrow-batched by the multimodal mapInPandas
  callers like every other per-row decode;
- dequantize + IDCT + upsample + color convert are vectorized numpy
  over ALL blocks at once (einsum with the precomputed 8x8 DCT basis,
  np.repeat for chroma upsampling) — no per-pixel Python;
- the encoders exist for tests/fixtures (the container ships no codec
  libraries to make golden JPEGs with): baseline with the Annex K
  standard tables, progressive with the classic DC-first / AC-band /
  refinement scan script.  Both encoders share ONE quantization
  (``_quantized_zigzag``), so a progressive stream must decode
  PIXEL-IDENTICALLY to the baseline stream of the same image — the
  equality test that pins every progressive decode path; the decoder's
  Huffman/IDCT remain independent implementations of the spec.
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
    except (
        struct.error,
        ValueError,
        IndexError,
        KeyError,
        OverflowError,
        _RestartHit,
    ) as e:
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            precision = body[0]
            if precision != 8:
                raise UnsupportedMediaError(f"{precision}-bit JPEG")
            height, width = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                ch, cv = hv >> 4, hv & 0x0F
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise UnsupportedMediaError(
                        f"SOF sampling factors {ch}x{cv} out of range"
                    )
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            if height < 1 or width < 1 or ncomp not in (1, 3):
                raise UnsupportedMediaError("unsupported SOF layout")
            if height * width > MAX_PIXELS:
                # a lying SOF dimension would otherwise allocate the
                # full coefficient store BEFORE any entropy data is
                # validated — multi-GB from a few flipped header bits
                raise UnsupportedMediaError(
                    f"image {width}x{height} exceeds the {MAX_PIXELS}-pixel "
                    "decode bound"
                )
            frame = (height, width, comps)
            if progressive:
                return _decode_progressive(
                    payload, pos + 2 + seglen, frame, qt, huff_dc, huff_ac
                )
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedMediaError(
                f"unsupported JPEG coding (SOF marker 0x{marker:02X})"
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
                    if s > 15:
                        # a corrupt table can decode any symbol byte; a
                        # 255-bit receive would overflow the store
                        raise UnsupportedMediaError(f"DC size {s} out of range")
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

    return _reconstruct(store, frame, qt)


def _reconstruct(store, frame, qt):
    """Vectorized shared back half: dequantize → un-zigzag → IDCT over
    every block at once, then upsample and crop — identical for
    baseline and progressive once the coefficient stores are full."""
    height, width, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
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


# ---------------------------------------------------------------------------
# Progressive (SOF2): multiple scans refine one coefficient store
# ---------------------------------------------------------------------------


def _skip_to_marker(payload: bytes, pos: int) -> int:
    """Advance past entropy-coded bytes to the next true marker (FF
    followed by neither 00 stuffing nor an RSTn)."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] == 0xFF and payload[pos + 1] != 0x00:
            if 0xD0 <= payload[pos + 1] <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    raise UnsupportedMediaError("entropy scan runs off the end of the payload")


def _decode_progressive(payload, pos, frame, qt, huff_dc, huff_ac):
    """Scan loop for SOF2: each SOS refines the per-component zigzag
    coefficient stores (spectral selection picks the band, successive
    approximation picks the bit plane); EOI triggers the shared
    reconstruction."""
    height, width, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    store = []
    for c in comps:
        store.append(np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32))
        # non-interleaved scans walk the component's OWN block grid:
        # ceil(ceil(width·h/hmax) / 8), NOT the MCU-padded grid
        comp_w = -(-(width * c["h"]) // hmax)
        comp_h = -(-(height * c["v"]) // vmax)
        c["bx_ni"] = -(-comp_w // 8)
        c["by_ni"] = -(-comp_h // 8)
    restart_interval = 0
    pred_dc = [0] * len(comps)

    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise UnsupportedMediaError("marker desync between scans")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI — reconstruct
            return _to_rgb(_reconstruct(store, frame, qt), frame)
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xC4:
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
        elif marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise UnsupportedMediaError("16-bit quant table")
                qt[tq] = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8).astype(
                    np.int32
                )
                p += 65
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tables = body[1 + 2 * i], body[2 + 2 * i]
                ci = next(
                    (j for j, c in enumerate(comps) if c["id"] == cs), None
                )
                if ci is None:
                    raise UnsupportedMediaError("scan references unknown component")
                scan_comps.append((ci, tables >> 4, tables & 0x0F))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            scan_pos = pos + 2 + seglen
            if ss == 0:  # DC scan
                if se != 0:
                    raise UnsupportedMediaError("DC scan with Se != 0")
                end = _progressive_dc_scan(
                    payload, scan_pos, store, comps, scan_comps, huff_dc,
                    ah, al, mcus_x, mcus_y, restart_interval, pred_dc,
                )
            else:  # AC scan: exactly one component per spec
                if ns != 1 or ss > se or se > 63:
                    raise UnsupportedMediaError("malformed AC scan header")
                ci, _, ac_t = scan_comps[0]
                end = _progressive_ac_scan(
                    payload, scan_pos, store[ci], comps[ci], huff_ac[ac_t],
                    ss, se, ah, al, restart_interval,
                )
            pos = _skip_to_marker(payload, end)
            continue
        pos += 2 + seglen
    raise UnsupportedMediaError("progressive stream ends without EOI")


def _progressive_dc_scan(
    payload, scan_pos, store, comps, scan_comps, huff_dc, ah, al,
    mcus_x, mcus_y, restart_interval, pred_dc,
):
    """DC first pass (diff-coded, shifted left by Al) or refinement
    (one bit per block).  Interleaved over the scan's components when
    ns > 1, else the single component's own block grid."""
    reader = _BitReader(payload, scan_pos)
    for ci, _, _ in scan_comps:
        pred_dc[ci] = 0
    if len(scan_comps) > 1:
        units = mcus_x * mcus_y

        def blocks_of(m):
            my, mx = divmod(m, mcus_x)
            for ci, dc_t, _ in scan_comps:
                c = comps[ci]
                for v in range(c["v"]):
                    for h in range(c["h"]):
                        yield ci, dc_t, my * c["v"] + v, mx * c["h"] + h
    else:
        ci0, dc_t0, _ = scan_comps[0]
        c0 = comps[ci0]
        units = c0["bx_ni"] * c0["by_ni"]

        def blocks_of(m):
            yield ci0, dc_t0, m // c0["bx_ni"], m % c0["bx_ni"]

    for m in range(units):
        if restart_interval and m and m % restart_interval == 0:
            reader.restart_align()
            for ci, _, _ in scan_comps:
                pred_dc[ci] = 0
        for ci, dc_t, by, bx in blocks_of(m):
            if ah == 0:
                s = reader.decode(huff_dc[dc_t])
                if s > 15:
                    raise UnsupportedMediaError(f"DC size {s} out of range")
                pred_dc[ci] += reader.receive_extend(s)
                store[ci][by, bx, 0] = pred_dc[ci] << al
            else:  # refinement: one correction bit
                if reader.read_bits(1):
                    store[ci][by, bx, 0] |= 1 << al
    return reader.pos


def _progressive_ac_scan(
    payload, scan_pos, store_c, comp, act, ss, se, ah, al, restart_interval
):
    """AC band scan over one component's own block grid: first pass
    (Ah=0) with EOB-run codes, or the T.81 G.1.2.3 refinement pass
    (correction bits on already-significant coefficients)."""
    reader = _BitReader(payload, scan_pos)
    bx_ni, by_ni = comp["bx_ni"], comp["by_ni"]
    eobrun = 0
    for m in range(bx_ni * by_ni):
        if restart_interval and m and m % restart_interval == 0:
            reader.restart_align()
            eobrun = 0
        zz = store_c[m // bx_ni, m % bx_ni]
        if ah == 0:
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = reader.decode(act)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r < 15:  # EOBn: run of (1<<r)+bits blocks
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise UnsupportedMediaError("AC run past band end")
                zz[k] = reader.receive_extend(s) << al
                k += 1
        else:
            eobrun = _refine_ac_block(reader, zz, act, ss, se, al, eobrun)
    return reader.pos


def _refine_ac_block(reader, zz, act, ss, se, al, eobrun):
    """One block of the AC successive-approximation refinement pass
    (T.81 G.1.2.3): newly-significant coefficients arrive as ±1<<Al;
    every already-significant coefficient crossed on the way reads one
    correction bit."""
    p1, m1 = 1 << al, -1 << al

    def correct(k):
        if reader.read_bits(1) and (zz[k] & p1) == 0:
            zz[k] += p1 if zz[k] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode(act)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun = (1 << r)
                    if r:
                        eobrun += reader.read_bits(r)
                    break  # rest of the block handled by the EOB branch
                # r == 15: skip 16 zero-history positions
            else:
                if s != 1:
                    raise UnsupportedMediaError("refinement magnitude != 1")
                newval = p1 if reader.read_bits(1) else m1
            while k <= se:
                if zz[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if k > se:
                break
            if newval:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


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


def _encode_block(writer, zz, dc_tab, ac_tab, pred_dc):
    """Entropy-encode one quantized zigzag block (precomputed by
    ``_quantized_zigzag`` so the baseline and progressive encoders share
    one quantization arithmetic — bit-identical coefficients); returns
    the new DC predictor."""
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
    padded, comp_hv, comp_tq, qts, h, w, mcus_x, mcus_y, gray = (
        _component_planes(img, quality, subsampling)
    )
    zz = _quantized_zigzag(padded, comp_tq, qts)
    dc_tabs = [_build_encode_table(*STD_DC_LUMA), _build_encode_table(*STD_DC_CHROMA)]
    ac_tabs = [_build_encode_table(*STD_AC_LUMA), _build_encode_table(*STD_AC_CHROMA)]

    writer = _BitWriter()
    pred = [0] * len(zz)
    m = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and m and m % restart_interval == 0:
                writer.marker(0xD0 + ((m // restart_interval - 1) & 7))
                pred = [0] * len(zz)
            m += 1
            for ci, ((ch, cv), tq) in enumerate(zip(comp_hv, comp_tq)):
                for v in range(cv):
                    for hh in range(ch):
                        pred[ci] = _encode_block(
                            writer,
                            zz[ci][my * cv + v, mx * ch + hh],
                            dc_tabs[tq],
                            ac_tabs[tq],
                            pred[ci],
                        )

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    n_qt = 1 if gray else 2
    for tq in range(n_qt):
        # DQT stores Qk in ZIGZAG order (T.81 B.2.4.1); the quantize
        # step above indexes naturally, so reorder at emission
        out += seg(0xDB, bytes([tq]) + bytes(qts[tq][ZIGZAG].tolist()))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(zz)])
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
    sos = bytes([len(zz)])
    for ci, tq in enumerate(comp_tq):
        sos += bytes([ci + 1, (tq << 4) | tq])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.flush()
    out += b"\xff\xd9"
    return out


# ---------------------------------------------------------------------------
# Progressive encoder (fixtures): spectral selection + successive
# approximation, so the progressive decoder's every path round-trips
# against an independent implementation
# ---------------------------------------------------------------------------


def _component_planes(img, quality, subsampling):
    """Shared plane prep (color convert, subsample, pad) → (padded
    planes, comp_hv, comp_tq, qts, h, w, mcus_x, mcus_y, gray)."""
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
    comp_tq = [0] + [1] * (len(planes) - 1)
    hmax = max(ch for ch, _ in comp_hv)
    vmax = max(cv for _, cv in comp_hv)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for plane, (ch, cv) in zip(planes, comp_hv):
        ph, pw = mcus_y * cv * 8, mcus_x * ch * 8
        padded.append(
            np.pad(
                plane,
                ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                mode="edge",
            )
        )
    return padded, comp_hv, comp_tq, qts, h, w, mcus_x, mcus_y, gray


def _quantized_zigzag(padded, comp_tq, qts):
    """Vectorized forward DCT + quantize per component → list of
    (blocks_y, blocks_x, 64) int32 arrays in zigzag order."""
    out = []
    for p, tq in zip(padded, comp_tq):
        H, W = p.shape
        by, bx = H // 8, W // 8
        blocks = (
            p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
            - 128.0
        )
        coeff = np.einsum("ux,nxy,vy->nuv", _T, blocks, _T)
        qz = np.round(coeff.reshape(-1, 64) / qts[tq].astype(np.float64)[None, :])
        out.append(qz.astype(np.int32)[:, ZIGZAG].reshape(by, bx, 64))
    return out


_PROG_AC_BITS = [0] * 16
_PROG_AC_BITS[8] = 192  # every code 9 bits long
_PROG_AC_VALUES = [(r << 4) | s for r in range(16) for s in range(12)]


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shift (truncation toward zero),
    per T.81 G.1.2.1 — NOT an arithmetic shift for negatives."""
    return -((-v) >> al) if v < 0 else v >> al


class _EobRun:
    """EOB-run accumulator shared by the AC first and refinement scan
    emitters; refinement also buffers the correction bits that flush
    with the run."""

    def __init__(self, writer, ac_tab):
        self.writer = writer
        self.ac_tab = ac_tab
        self.run = 0
        self.bits: list[int] = []

    def flush(self):
        while self.run:
            n = min(self.run, 32767)
            r = n.bit_length() - 1
            code, length = self.ac_tab[r << 4]
            self.writer.write(code, length)
            if r:
                self.writer.write(n - (1 << r), r)
            self.run -= n
            for b in self.bits:
                self.writer.write(b, 1)
            self.bits = []
        if self.bits:  # correction bits with no pending EOB (flush tail)
            for b in self.bits:
                self.writer.write(b, 1)
            self.bits = []


def _emit_refine_block(writer, ac, vals, eob):
    """One block of the AC refinement scan, mirroring the decoder's
    crossing semantics POSITION-EXACTLY: each emitted code's correction
    bits are exactly those of the already-significant coefficients the
    decoder crosses while consuming that code — a ZRL covers bits only
    up to its 16th zero-history position, not every bit buffered so far
    (the subtlety that makes naive buffering desync)."""
    newly = [i for i, v in enumerate(vals) if abs(v) == 1]
    k = 0
    for ni in newly:
        eob.flush()  # any pending run must close before this block's codes
        zero_pos = [i for i in range(k, ni) if vals[i] == 0]
        r = len(zero_pos)
        while r > 15:
            boundary = zero_pos[15]  # the 16th zero: consumed by the ZRL
            code, length = ac[0xF0]
            writer.write(code, length)
            for i in range(k, boundary):
                if abs(vals[i]) > 1:
                    writer.write(abs(vals[i]) & 1, 1)
            k = boundary + 1
            zero_pos = zero_pos[16:]
            r -= 16
        code, length = ac[(r << 4) | 1]
        writer.write(code, length)
        writer.write(1 if vals[ni] > 0 else 0, 1)
        for i in range(k, ni):
            if abs(vals[i]) > 1:
                writer.write(abs(vals[i]) & 1, 1)
        k = ni + 1
    if k < len(vals) or not newly:
        # trailing positions (or a block with no new coefficients) join
        # the EOB run; their correction bits flush with it
        eob.run += 1
        eob.bits.extend(
            abs(vals[i]) & 1 for i in range(k, len(vals)) if abs(vals[i]) > 1
        )


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Encode as progressive JPEG (SOF2) with the classic scan script:
    DC first pass at Al=1 (interleaved), AC bands 1-5 and 6-63 per
    component at Al=1 (spectral selection + successive approximation,
    EOB-run coded), then the AC refinement passes at Ah=1→Al=0 and the
    DC refinement — every progressive decode path in one stream."""
    padded, comp_hv, comp_tq, qts, h, w, mcus_x, mcus_y, gray = (
        _component_planes(img, quality, subsampling)
    )
    zz = _quantized_zigzag(padded, comp_tq, qts)
    dc_tabs = [_build_encode_table(*STD_DC_LUMA), _build_encode_table(*STD_DC_CHROMA)]
    # The baseline Annex K AC tables have no EOBn (n>0) symbols —
    # progressive streams normally carry their own tables.  A flat
    # all-9-bit canonical table over every (run, size≤11) symbol is
    # spec-legal (192·2⁷ < 2¹⁶, all-ones code unused) and trivially
    # correct for a fixture encoder.
    prog_ac = _build_encode_table(_PROG_AC_BITS, _PROG_AC_VALUES)
    ac_tabs = [prog_ac, prog_ac]
    ncomp = len(zz)
    # non-interleaved (AC / single-component) grids per component
    hmax = max(ch for ch, _ in comp_hv)
    vmax = max(cv for _, cv in comp_hv)
    ni_grid = []
    for ch, cv in comp_hv:
        comp_w = -(-(w * ch) // hmax)
        comp_h = -(-(h * cv) // vmax)
        ni_grid.append((-(-comp_w // 8), -(-comp_h // 8)))

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos_header(comp_ids, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for ci in comp_ids:
            tq = comp_tq[ci]
            body += bytes([ci + 1, (tq << 4) | tq])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    out = bytearray(b"\xff\xd8")
    for tq in range(1 if gray else 2):
        out += seg(0xDB, bytes([tq]) + bytes(qts[tq][ZIGZAG].tolist()))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci, ((ch, cv), tq) in enumerate(zip(comp_hv, comp_tq)):
        sof += bytes([ci + 1, (ch << 4) | cv, tq])
    out += seg(0xC2, sof)
    huff_specs = [(0, 0, STD_DC_LUMA), (1, 0, (_PROG_AC_BITS, _PROG_AC_VALUES))]
    if not gray:
        huff_specs += [
            (0, 1, STD_DC_CHROMA),
            (1, 1, (_PROG_AC_BITS, _PROG_AC_VALUES)),
        ]
    for tc, th, (bits, values) in huff_specs:
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(values))

    # --- scan 1: DC first pass, interleaved, Al=1
    out += sos_header(list(range(ncomp)), 0, 0, 0, 1)
    writer = _BitWriter()
    pred = [0] * ncomp
    for m in range(mcus_x * mcus_y):
        my, mx = divmod(m, mcus_x)
        for ci, (ch, cv) in enumerate(comp_hv):
            tq = comp_tq[ci]
            for v in range(cv):
                for hh in range(ch):
                    dc = int(zz[ci][my * cv + v, mx * ch + hh, 0]) >> 1
                    s, rep = _magnitude(dc - pred[ci])
                    pred[ci] = dc
                    code, length = dc_tabs[tq][s]
                    writer.write(code, length)
                    if s:
                        writer.write(rep, s)
    out += writer.flush()

    # --- AC first passes: bands (1,5) and (6,63) per component, Al=1
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(ncomp):
            out += sos_header([ci], ss, se, 0, 1)
            writer = _BitWriter()
            ac = ac_tabs[comp_tq[ci]]
            eob = _EobRun(writer, ac)
            bx_ni, by_ni = ni_grid[ci]
            for m in range(bx_ni * by_ni):
                block = zz[ci][m // bx_ni, m % bx_ni]
                vals = [_pt_ac(int(block[k]), 1) for k in range(ss, se + 1)]
                nz = [i for i, t in enumerate(vals) if t]
                if not nz:
                    eob.run += 1
                    continue
                eob.flush()
                r = 0
                for i in range(nz[-1] + 1):
                    t = vals[i]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15:
                        code, length = ac[0xF0]
                        writer.write(code, length)
                        r -= 16
                    s, rep = _magnitude(t)
                    code, length = ac[(r << 4) | s]
                    writer.write(code, length)
                    writer.write(rep, s)
                    r = 0
                if nz[-1] < se - ss:
                    eob.run += 1
            eob.flush()
            out += writer.flush()

    # --- AC refinement passes: Ah=1 → Al=0
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(ncomp):
            out += sos_header([ci], ss, se, 1, 0)
            writer = _BitWriter()
            ac = ac_tabs[comp_tq[ci]]
            eob = _EobRun(writer, ac)
            bx_ni, by_ni = ni_grid[ci]
            for m in range(bx_ni * by_ni):
                block = zz[ci][m // bx_ni, m % bx_ni]
                vals = [int(block[k]) for k in range(ss, se + 1)]
                _emit_refine_block(writer, ac, vals, eob)
            eob.flush()
            out += writer.flush()

    # --- final scan: DC refinement, Ah=1 → Al=0 (interleaved)
    out += sos_header(list(range(ncomp)), 0, 0, 1, 0)
    writer = _BitWriter()
    for m in range(mcus_x * mcus_y):
        my, mx = divmod(m, mcus_x)
        for ci, (ch, cv) in enumerate(comp_hv):
            for v in range(cv):
                for hh in range(ch):
                    writer.write(int(zz[ci][my * cv + v, mx * ch + hh, 0]) & 1, 1)
    out += writer.flush()

    out += b"\xff\xd9"
    return bytes(out)
