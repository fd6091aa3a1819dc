"""Pure-python FLAC decoder + fixture encoder.

FLAC is the dominant lossless audio format in real crawl/training
corpora (next to WAV, which ``media_codecs.decode_wav_pcm`` already
covers).  Unlike AAC — and unlike the residue of MP3 that stays behind
the optional-extras seam (operators/mp3.py r12 decodes MPEG-1 Layer III
for real; see its docstring for the honest-seam boundary) — FLAC is
fully algorithmic: bit reading, Rice
codes, integer predictors, CRCs.  That makes it the audio twin of the
LZW-TIFF and VP8L plugins: it decodes for REAL in every environment,
no optional wheel.  (Generalizes the decode-everything posture of the
reference's sample reader, /root/reference/processor/edf_processor/
edf.py:56-76, to the multimodal corpus the way the image codecs do.)

Decoder coverage (everything a spec-compliant stream may use at
≤32-bit depth):

- ``fLaC`` stream marker + metadata-block walk (STREAMINFO parsed;
  padding/application/seektable/comment blocks skipped by length).
- Frame headers: both blocking strategies, all blocksize codes
  (192/576·2^n/256·2^n and 8/16-bit end-of-header forms), all
  sample-rate codes incl. the end-of-header kHz/Hz/daHz forms,
  UTF-8-coded frame/sample numbers, CRC-8 verified.
- Subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized coefficients, signed shift, exact integer reconstruction),
  wasted-bits-per-sample unary prefix on every type.
- Residuals: 4-bit (method 0) and 5-bit (method 1) Rice parameters,
  partition orders 0-15, escape partitions (raw n-bit residuals,
  including n = 0).
- Stereo decorrelation: independent, left/side, right/side, mid/side
  (side channel carries the spec's +1 bit depth).
- Frame CRC-16 verified; STREAMINFO MD5 of the decoded PCM verified
  when present (non-zero) — the decoder proves byte-exactness of its
  own output on every conforming stream that carries the signature.

The encoder writes the honest subset the fixtures need — fixed
blocksize, 16-bit depth, CONSTANT/VERBATIM/FIXED-order/LPC subframes
with single- or multi-partition Rice residuals (escape fallback),
independent or mid/side stereo, optional wasted-bits packing — and
stamps real CRC-8/CRC-16/MD5, so every decoder path above is
exercised by round-trip property tests rather than hand-trusted.

Same contracts as the sibling codecs (jpeg.py / png.py / webp.py):
one exception type (UnsupportedMediaError), a total-sample inflation
guard, malformed input never escapes as a raw IndexError/OverflowError.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from processor_edf_spark.operators.media_codecs import UnsupportedMediaError

#: inflation guard — same spirit as jpeg.MAX_PIXELS: a 4-byte header
#: field must not make us allocate unbounded sample memory.
MAX_TOTAL_SAMPLES = 1 << 26

_FIXED_COEFFS = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}

# frame-header code tables (RFC 9639 §9.1)
_BLOCKSIZE_CODES = {
    0x1: 192, 0x2: 576, 0x3: 1152, 0x4: 2304, 0x5: 4608,
    0x8: 256, 0x9: 512, 0xA: 1024, 0xB: 2048, 0xC: 4096,
    0xD: 8192, 0xE: 16384, 0xF: 32768,
}
_SAMPLE_RATE_CODES = {
    0x1: 88200, 0x2: 176400, 0x3: 192000, 0x4: 8000, 0x5: 16000,
    0x6: 22050, 0x7: 24000, 0x8: 32000, 0x9: 44100, 0xA: 48000,
    0xB: 96000,
}
_SAMPLE_SIZE_CODES = {0x1: 8, 0x2: 12, 0x4: 16, 0x5: 20, 0x6: 24, 0x7: 32}


def _crc_table(poly: int, width: int) -> list[int]:
    mask, top = (1 << width) - 1, 1 << (width - 1)
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[(crc >> 8) ^ b]
    return crc


class MSBBitReader:
    """MSB-first bit reader (FLAC bit order), byte-position aware so
    frame CRCs can be taken over the exact encoded spans."""

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise UnsupportedMediaError("flac: bitstream truncated")
        v = 0
        p = self.pos
        data = self.data
        # consume the unaligned head bit by bit, then whole bytes
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

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >> (n - 1) else v

    def read_unary(self) -> int:
        """Count 0 bits until the terminating 1 (Rice quotient)."""
        data, nbits = self.data, len(self.data) * 8
        p = self.pos
        q = 0
        while True:
            if p >= nbits:
                raise UnsupportedMediaError("flac: bitstream truncated")
            if (data[p >> 3] >> (7 - (p & 7))) & 1:
                self.pos = p + 1
                return q
            p += 1
            q += 1

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    @property
    def byte_pos(self) -> int:
        return self.pos >> 3


class MSBBitWriter:
    """MSB-first bit writer — the encoder/test-stream twin."""

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

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def getvalue(self) -> bytes:
        if self.nacc:
            raise AssertionError("unaligned flac writer")
        return bytes(self.buf)


def _read_utf8_coded(r: MSBBitReader, max_bytes: int) -> int:
    """FLAC's UTF-8-style frame/sample number (RFC 9639 §9.1.5) —
    UTF-8's byte scheme extended to 36-bit values, no surrogate or
    overlong rules."""
    first = r.read(8)
    if first < 0x80:
        return first
    n = 0
    while (first << n) & 0x80:
        n += 1
    if n < 2 or n > max_bytes:
        raise UnsupportedMediaError("flac: invalid coded number")
    v = first & (0x7F >> n)
    for _ in range(n - 1):
        cont = r.read(8)
        if cont & 0xC0 != 0x80:
            raise UnsupportedMediaError("flac: invalid coded number")
        v = (v << 6) | (cont & 0x3F)
    return v


def _write_utf8_coded(w: MSBBitWriter, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    payload = []
    while True:
        payload.append(v & 0x3F)
        v >>= 6
        n = len(payload) + 1
        if v < (1 << (7 - n)) and n <= 7:
            break
    n = len(payload) + 1
    w.write((0xFF00 >> n) & 0xFF | v, 8)
    for p in reversed(payload):
        w.write(0x80 | p, 8)


def _decode_residual(r: MSBBitReader, blocksize: int, order: int) -> list[int]:
    """Rice-coded residual section (RFC 9639 §9.2.7): 2-bit method,
    4-bit partition order, per-partition 4/5-bit parameter with the
    all-ones escape to raw n-bit residuals."""
    method = r.read(2)
    if method > 1:
        raise UnsupportedMediaError(f"flac: reserved residual method {method}")
    pbits, escape = (4, 0xF) if method == 0 else (5, 0x1F)
    porder = r.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise UnsupportedMediaError("flac: partition order does not divide blocksize")
    part = blocksize >> porder
    out: list[int] = []
    for p in range(nparts):
        count = part - order if p == 0 else part
        if count < 0:
            raise UnsupportedMediaError("flac: predictor order exceeds partition")
        param = r.read(pbits)
        if param == escape:
            nbits = r.read(5)
            if nbits:
                out.extend(r.read_signed(nbits) for _ in range(count))
            else:
                out.extend([0] * count)
        else:
            for _ in range(count):
                q = r.read_unary()
                v = (q << param) | r.read(param)
                out.append((v >> 1) ^ -(v & 1))
    return out


def _decode_subframe(r: MSBBitReader, blocksize: int, bps: int) -> list[int]:
    """One subframe (RFC 9639 §9.2): header (pad bit, 6-bit type,
    wasted-bits unary), then CONSTANT/VERBATIM/FIXED/LPC payload;
    exact integer reconstruction, wasted bits restored by shift."""
    if r.read(1):
        raise UnsupportedMediaError("flac: subframe pad bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise UnsupportedMediaError("flac: wasted bits exceed sample size")
    if ftype == 0:
        samples = [r.read_signed(eff)] * blocksize
    elif ftype == 1:
        samples = [r.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:
        order = ftype - 8
        if order > blocksize:
            raise UnsupportedMediaError("flac: fixed order exceeds blocksize")
        samples = [r.read_signed(eff) for _ in range(order)]
        res = _decode_residual(r, blocksize, order)
        coefs = _FIXED_COEFFS[order]
        for i, e in enumerate(res, start=order):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * samples[i - 1 - j]
            samples.append(e + pred)
    elif ftype >= 32:
        order = (ftype & 31) + 1
        if order > blocksize:
            raise UnsupportedMediaError("flac: lpc order exceeds blocksize")
        samples = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4)
        if prec == 0xF:
            raise UnsupportedMediaError("flac: invalid lpc precision")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise UnsupportedMediaError("flac: negative lpc shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _decode_residual(r, blocksize, order)
        for i, e in enumerate(res, start=order):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * samples[i - 1 - j]
            samples.append(e + (acc >> shift))
    else:
        raise UnsupportedMediaError(f"flac: reserved subframe type {ftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a FLAC stream → (sample_rate, n_channels, float64 samples
    in [-1, 1], shape (n_frames, n_channels)) — the decode_wav_pcm
    contract, so ``decode_audio`` callers can't tell the container
    apart downstream.  Verifies per-frame CRC-8/CRC-16 and, when the
    STREAMINFO carries one, the stream MD5 of the reconstructed PCM."""
    if len(payload) < 8 or payload[:4] != b"fLaC":
        raise UnsupportedMediaError("flac: not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise UnsupportedMediaError("flac: metadata truncated")
        head = payload[pos]
        (length,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + length]
        if len(body) < length:
            raise UnsupportedMediaError("flac: metadata block truncated")
        if head & 0x7F == 0:
            if length != 34:
                raise UnsupportedMediaError("flac: bad STREAMINFO length")
            r = MSBBitReader(body)
            r.read(80)  # min/max blocksize (16+16), min/max framesize (24+24)
            rate = r.read(20)
            n_channels = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            md5 = body[18:34]
            info = (rate, n_channels, bps, total, md5)
        pos += 4 + length
        if head & 0x80:
            break
    if info is None:
        raise UnsupportedMediaError("flac: missing STREAMINFO")
    rate, n_channels, bps, total, md5 = info
    if rate < 1 or total > MAX_TOTAL_SAMPLES:
        raise UnsupportedMediaError(
            f"flac: unsupported layout ({rate}Hz, {total} samples)"
        )
    blocks: list[np.ndarray] = []
    decoded = 0
    while pos < len(payload):
        r = MSBBitReader(payload, pos * 8)
        if r.read(14) != 0x3FFE:
            raise UnsupportedMediaError("flac: lost frame sync")
        if r.read(1):
            raise UnsupportedMediaError("flac: reserved frame bit set")
        variable = r.read(1)
        bs_code = r.read(4)
        sr_code = r.read(4)
        chan_code = r.read(4)
        size_code = r.read(3)
        if r.read(1):
            raise UnsupportedMediaError("flac: reserved frame bit set")
        _read_utf8_coded(r, 7 if variable else 6)
        if bs_code == 0:
            raise UnsupportedMediaError("flac: reserved blocksize code")
        elif bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 0:
            frame_rate = rate
        elif sr_code == 0xC:
            frame_rate = r.read(8) * 1000
        elif sr_code == 0xD:
            frame_rate = r.read(16)
        elif sr_code == 0xE:
            frame_rate = r.read(16) * 10
        elif sr_code == 0xF:
            raise UnsupportedMediaError("flac: invalid sample-rate code")
        else:
            frame_rate = _SAMPLE_RATE_CODES[sr_code]
        if frame_rate != rate:
            raise UnsupportedMediaError("flac: frame/STREAMINFO rate mismatch")
        if size_code == 0:
            frame_bps = bps
        elif size_code in _SAMPLE_SIZE_CODES:
            frame_bps = _SAMPLE_SIZE_CODES[size_code]
        else:
            raise UnsupportedMediaError("flac: reserved sample-size code")
        if frame_bps != bps:
            raise UnsupportedMediaError("flac: frame/STREAMINFO depth mismatch")
        header_end = r.byte_pos
        if crc8(payload[pos:header_end]) != r.read(8):
            raise UnsupportedMediaError("flac: frame header crc mismatch")
        if chan_code < 8:
            frame_channels = chan_code + 1
            if frame_channels != n_channels:
                raise UnsupportedMediaError("flac: channel count mismatch")
            chans = [
                _decode_subframe(r, blocksize, bps) for _ in range(frame_channels)
            ]
        elif chan_code <= 10:
            if n_channels != 2:
                raise UnsupportedMediaError("flac: stereo frame in non-stereo stream")
            # the side channel carries one extra bit (§9.2)
            if chan_code == 8:  # left/side
                left = _decode_subframe(r, blocksize, bps)
                side = _decode_subframe(r, blocksize, bps + 1)
                chans = [left, [l - s for l, s in zip(left, side)]]
            elif chan_code == 9:  # right/side
                side = _decode_subframe(r, blocksize, bps + 1)
                right = _decode_subframe(r, blocksize, bps)
                chans = [[rr + s for rr, s in zip(right, side)], right]
            else:  # mid/side
                mid = _decode_subframe(r, blocksize, bps)
                side = _decode_subframe(r, blocksize, bps + 1)
                left, right = [], []
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                chans = [left, right]
        else:
            raise UnsupportedMediaError("flac: reserved channel assignment")
        r.align()
        frame_end = r.byte_pos
        if crc16(payload[pos:frame_end]) != r.read(16):
            raise UnsupportedMediaError("flac: frame crc mismatch")
        pos = r.byte_pos
        decoded += blocksize
        if decoded > MAX_TOTAL_SAMPLES:
            raise UnsupportedMediaError("flac: stream exceeds sample guard")
        blocks.append(np.array(chans, dtype=np.int64).T)
    samples = (
        np.concatenate(blocks, axis=0)
        if blocks
        else np.zeros((0, n_channels), dtype=np.int64)
    )
    if total and len(samples) < total:
        raise UnsupportedMediaError("flac: stream shorter than STREAMINFO total")
    if total:
        samples = samples[:total]
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if len(samples) and (samples.min() < lo or samples.max() > hi):
        raise UnsupportedMediaError("flac: decoded sample out of range")
    if md5 != b"\x00" * 16:
        width = (bps + 7) // 8
        raw = _pcm_bytes(samples, width)
        if hashlib.md5(raw).digest() != md5:
            raise UnsupportedMediaError("flac: stream md5 mismatch")
    return rate, n_channels, samples.astype(np.float64) / float(1 << (bps - 1))


def _pcm_bytes(samples: np.ndarray, width: int) -> bytes:
    """Channel-interleaved little-endian two's-complement PCM — the
    byte stream the STREAMINFO MD5 signs (§8.2)."""
    flat = samples.astype(np.int64).reshape(-1)
    mask = (1 << (8 * width)) - 1
    u = (flat & mask).astype(np.uint64)
    out = np.zeros((len(flat), width), dtype=np.uint8)
    for b in range(width):
        out[:, b] = (u >> np.uint64(8 * b)).astype(np.uint8)
    return out.tobytes()


# ---------------------------------------------------------------- encoder


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def _best_rice_param(residuals: list[int], maxparam: int) -> int:
    """Smallest-cost Rice parameter by exact bit count.

    Vectorized: the cost scan was maxparam full python passes over the
    residuals (the encoder's hottest loop, profiled on the audio-dedup
    row).  Same arithmetic — Σ(z>>p) + n·(1+p) over the zigzagged
    values, ascending p, strict < keeps the first minimum — so the
    chosen parameter (and therefore the bitstream) is unchanged.
    Residuals here are < 2^22 (escape partitions handle the rest), far
    inside int64."""
    if not residuals:
        return 0
    v = np.asarray(residuals, dtype=np.int64)
    z = np.where(v >= 0, v << 1, -(v << 1) - 1)
    n = len(z)
    best, best_cost = 0, None
    for param in range(maxparam):
        cost = int((z >> param).sum()) + n * (1 + param)
        if best_cost is None or cost < best_cost:
            best, best_cost = param, cost
    return best


def _write_residual(
    w: MSBBitWriter, residuals: list[int], order: int, partition_order: int
) -> None:
    """Method-0 Rice residual section mirroring the decoder's partition
    rule: blocksize/2^po samples per partition, the first one short by
    the predictor order; oversized residuals fall to escape partitions."""
    nparts = 1 << partition_order
    blocksize = len(residuals) + order
    if blocksize % nparts or (blocksize >> partition_order) < order:
        raise AssertionError("flac encoder: bad partition order")
    w.write(0, 2)  # method 0: 4-bit params
    w.write(partition_order, 4)
    k = blocksize >> partition_order
    parts = [residuals[: k - order]]
    for p in range(1, nparts):
        parts.append(residuals[k - order + (p - 1) * k :][:k])
    for part in parts:
        maxabs = max((abs(v) for v in part), default=0)
        if maxabs >= 1 << 22:  # escape: raw two's-complement residuals
            nbits = max(v.bit_length() for v in part) + 1
            if nbits > 31:  # the 5-bit raw-width field caps at 31
                raise ValueError(
                    "flac encoder: residual too wide for an escape "
                    "partition — encode this block verbatim"
                )
            w.write(0xF, 4)
            w.write(nbits, 5)
            for v in part:
                w.write(v, nbits)
            continue
        param = _best_rice_param(part, 15) if part else 0
        w.write(param, 4)
        for v in part:
            z = _zigzag(v)
            w.write_unary(z >> param)
            w.write(z, param)


def _fit_porder(blocksize: int, order: int, wanted: int) -> int:
    """Largest partition order ≤ wanted that divides the blocksize and
    leaves the first partition non-negative (decoder's two rules)."""
    po = wanted
    while po and (blocksize % (1 << po) or (blocksize >> po) < order):
        po -= 1
    return po


def _encode_subframe(
    w: MSBBitWriter,
    chan: list[int],
    bps: int,
    mode: str,
    partition_order: int,
    lpc_coefs: tuple[int, ...],
    lpc_shift: int,
    use_wasted: bool,
) -> None:
    wasted = 0
    if use_wasted and any(chan):
        wasted = min((v & -v).bit_length() - 1 for v in chan if v)
        wasted = min(wasted, bps - 1)
    if wasted:
        chan = [v >> wasted for v in chan]
    eff = bps - wasted

    def header(ftype: int) -> None:
        w.write(0, 1)
        w.write(ftype, 6)
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    if mode == "auto" and len(set(chan)) == 1:
        mode = "constant"
    if mode == "constant":
        if len(set(chan)) != 1:
            raise AssertionError("flac encoder: constant on varying block")
        header(0)
        w.write(chan[0], eff)
        return
    if mode == "verbatim":
        header(1)
        for v in chan:
            w.write(v, eff)
        return
    if mode == "lpc":
        order = len(lpc_coefs)
        if len(chan) <= order:
            mode = "verbatim"
            header(1)
            for v in chan:
                w.write(v, eff)
            return
        header(32 + order - 1)
        for v in chan[:order]:
            w.write(v, eff)
        prec = max(c.bit_length() + 1 for c in lpc_coefs)
        w.write(prec - 1, 4)
        w.write(lpc_shift, 5)
        for c in lpc_coefs:
            w.write(c, prec)
        res = []
        for i in range(order, len(chan)):
            acc = sum(c * chan[i - 1 - j] for j, c in enumerate(lpc_coefs))
            res.append(chan[i] - (acc >> lpc_shift))
        _write_residual(w, res, order, _fit_porder(len(chan), order, partition_order))
        return
    # fixed order n ("auto" lands here with order 2)
    order = int(mode[5:]) if mode.startswith("fixed") else 2
    if len(chan) <= order:
        order = 0
    header(8 + order)
    for v in chan[:order]:
        w.write(v, eff)
    coefs = _FIXED_COEFFS[order]
    res = []
    for i in range(order, len(chan)):
        pred = sum(c * chan[i - 1 - j] for j, c in enumerate(coefs))
        res.append(chan[i] - pred)
    _write_residual(w, res, order, _fit_porder(len(chan), order, partition_order))


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    *,
    bps: int = 16,
    blocksize: int = 4096,
    subframe: str = "auto",
    stereo: str = "independent",
    partition_order: int = 0,
    lpc_coefs: tuple[int, ...] = (2, -1),
    lpc_shift: int = 0,
    use_wasted: bool = False,
) -> bytes:
    """Fixture FLAC writer: integer samples (n,) or (n, ch) →
    spec-conformant stream with real CRC-8/CRC-16 and the STREAMINFO
    MD5, fixed blocksize, explicit 16-bit blocksize headers.  ``stereo``
    selects independent/left_side/right_side/mid_side decorrelation
    (2-channel input only); ``subframe`` one of auto/constant/verbatim/
    fixed0..fixed4/lpc.  Lossless by construction — decode_flac
    round-trips bit-exactly, which is what the property tests pin."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, n_channels = arr.shape
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if n and (arr.min() < lo or arr.max() > hi):
        raise ValueError(f"samples exceed {bps}-bit range")
    if stereo != "independent" and n_channels != 2:
        raise ValueError("stereo decorrelation needs 2 channels")
    out = bytearray(b"fLaC")
    info = MSBBitWriter()
    info.write(min(blocksize, n) or blocksize, 16)
    info.write(blocksize, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(n_channels - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    body = info.getvalue() + hashlib.md5(_pcm_bytes(arr, (bps + 7) // 8)).digest()
    out.append(0x80)  # last metadata block, type 0 = STREAMINFO
    out += len(body).to_bytes(3, "big")
    out += body
    chan_code = {
        "independent": n_channels - 1,
        "left_side": 8,
        "right_side": 9,
        "mid_side": 10,
    }[stereo]
    for frame_idx, start in enumerate(range(0, n, blocksize)):
        block = arr[start : start + blocksize]
        bs = len(block)
        w = MSBBitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed-blocksize strategy
        w.write(7, 4)  # 16-bit blocksize follows the header
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(chan_code, 4)
        w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        w.write(0, 1)
        _write_utf8_coded(w, frame_idx)
        w.write(bs - 1, 16)
        header = w.getvalue()
        w.write(crc8(header), 8)
        if stereo == "independent":
            subchans = [(list(block[:, c]), bps) for c in range(n_channels)]
        else:
            left = [int(v) for v in block[:, 0]]
            right = [int(v) for v in block[:, 1]]
            side = [l - r for l, r in zip(left, right)]
            if stereo == "left_side":
                subchans = [(left, bps), (side, bps + 1)]
            elif stereo == "right_side":
                subchans = [(side, bps + 1), (right, bps)]
            else:
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                subchans = [(mid, bps), (side, bps + 1)]
        for chan, chan_bps in subchans:
            _encode_subframe(
                w,
                [int(v) for v in chan],
                chan_bps,
                subframe,
                partition_order,
                lpc_coefs,
                lpc_shift,
                use_wasted,
            )
        w.align()
        frame = w.getvalue()
        out += frame
        out += struct.pack(">H", crc16(frame))
    return bytes(out)
