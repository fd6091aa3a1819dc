"""Pure-stdlib+numpy PNG codec — with baseline JPEG (operators/jpeg.py)
this covers the two formats a real image corpus is overwhelmingly made
of, leaving only video/audio compressed codecs stubbed.

PNG's compression is zlib-deflate, which IS in the Python stdlib — so
unlike JPEG there is nothing to approximate: this is a complete,
lossless decode for 8-bit images of every color type
(gray, RGB, palette, gray+alpha, RGBA) plus 1/2/4-bit palette and
grayscale, in both scanline orders — sequential and Adam7 interlaced
(seven filtered sub-images, spec §8.2, empty passes skipped).  16-bit
channels decode to their high byte (the spec's sample-depth scaling
for an 8-bit consumer — the one deliberately lossy path, inherent to
the uint8 RGB decode contract).

Decode shape: chunk walk → one ``zlib.decompress`` → scanline
unfiltering → palette/alpha normalization to HxWx3 RGB.  Unfiltering is
the only sequential part (each row's reconstruction feeds the next);
rows are processed with whole-row numpy ops — Sub is a per-lane
cumulative sum, Up is one vector add, Average/Paeth walk pixels within
the row (spec-accurate, fixture-scale cost; per-row decode at corpus
scale is Arrow-batched by the multimodal callers like every codec
here).

The fixture encoder writes every filter type (cycling 0-4 per row) so
the decoder's five unfilter paths are all exercised by the round-trip
test — and PNG being lossless, that test pins EXACT byte equality, not
a tolerance.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from processor_edf_spark.operators.media_codecs import UnsupportedMediaError

PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: Adam7 pass geometry (spec §8.2): (x_start, y_start, x_step, y_step).
#: Interlaced IDAT is seven consecutive sub-images in this order; a
#: pass whose grid is empty for the image size contributes NO bytes.
ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _unfilter(raw, height, stride, bpp):
    """Reverse per-scanline filtering: raw is (height, stride+1) uint8
    (filter byte + packed data per row) → (height, stride) uint8."""
    filters = raw[:, 0]
    data = raw[:, 1:].astype(np.int32)  # headroom for the additions
    recon = np.zeros((height, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        f = filters[y]
        row = data[y]
        if f == 0:  # None
            out = row.copy()
        elif f == 1:  # Sub: per-lane cumulative sum mod 256
            out = row.copy()
            for lane in range(bpp):
                out[lane::bpp] = np.cumsum(out[lane::bpp]) & 0xFF
        elif f == 2:  # Up
            out = (row + prev) & 0xFF
        elif f == 3:  # Average — sequential in x (left term)
            out = row.copy()
            for x in range(stride):
                left = out[x - bpp] if x >= bpp else 0
                out[x] = (out[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth — sequential in x
            out = row.copy()
            for x in range(stride):
                a = out[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                out[x] = (out[x] + pred) & 0xFF
        else:
            raise UnsupportedMediaError(f"filter type {f}")
        recon[y] = out
        prev = out
    return recon.astype(np.uint8)


def _samples(pixels, height, width, depth, ch):
    """Packed unfiltered scanlines → (height, width, n) uint8 samples;
    for sub-byte depths n is 1 and the values are RAW indices/levels
    (palette lookup / gray scaling happens after pass assembly); 16-bit
    samples reduce to their high byte (the spec's sample-depth scaling
    for an 8-bit consumer, and what image libraries do)."""
    if depth < 8:
        unpacked = np.unpackbits(pixels, axis=1)
        parts = unpacked[:, : width * depth].reshape(height, width, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
        idx = (parts * weights).sum(axis=2).astype(np.uint8)
        return idx[:, :, None]
    if depth == 16:  # big-endian sample pairs → high byte
        return pixels[:, : width * ch * 2].reshape(height, width, ch, 2)[
            :, :, :, 0
        ]
    return pixels[:, : width * ch].reshape(height, width, ch)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → HxWx3 uint8 RGB (gray replicated, palette resolved, alpha
    dropped), sequential or Adam7 interlaced, 16-bit reduced to the
    high byte.  Raises UnsupportedMediaError for malformed payloads."""
    try:
        return _decode_png(payload)
    except UnsupportedMediaError:
        raise
    except (struct.error, ValueError, IndexError, KeyError, zlib.error) as e:
        raise UnsupportedMediaError(f"malformed PNG: {e}") from e


# channels per color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _decode_png(payload: bytes) -> np.ndarray:
    if payload[:8] != PNG_SIG:
        raise UnsupportedMediaError("not a PNG payload")
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):
            raise UnsupportedMediaError(
                f"chunk {ctype!r} declares {length} bytes past end of payload"
            )
        body = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            if length % 3:
                raise UnsupportedMediaError("PLTE size not a multiple of 3")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc (crc not verified)
    if ihdr is None or not idat:
        raise UnsupportedMediaError("missing IHDR/IDAT")
    width, height, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise UnsupportedMediaError("nonstandard compression/filter method")
    if interlace not in (0, 1):
        raise UnsupportedMediaError(f"interlace method {interlace}")
    if color not in _CHANNELS:
        raise UnsupportedMediaError(f"color type {color}")
    if depth == 16 and color == 3:
        raise UnsupportedMediaError("16-bit palette indices are not a PNG")
    if depth not in (1, 2, 4, 8, 16) or (depth < 8 and color not in (0, 3)):
        raise UnsupportedMediaError(f"bit depth {depth} for color type {color}")
    if width < 1 or height < 1:
        raise UnsupportedMediaError(f"degenerate dimensions ({width}x{height})")
    from processor_edf_spark.operators.jpeg import MAX_PIXELS

    if width * height > MAX_PIXELS:
        # lying IHDR dims would otherwise drive the inflate target and
        # the recon allocation to attacker-chosen sizes
        raise UnsupportedMediaError(
            f"image {width}x{height} exceeds the {MAX_PIXELS}-pixel decode bound"
        )

    ch = _CHANNELS[color]
    bits_pp = depth * ch
    bpp = max(bits_pp // 8, 1)  # filter delta distance, per spec
    if interlace == 0:
        spans = [(0, 0, 1, 1, width, height)]
    else:  # Adam7: seven sub-images, empty passes contribute no bytes
        spans = []
        for x0, y0, xs, ys in ADAM7:
            pw = max(0, -(-(width - x0) // xs))
            ph = max(0, -(-(height - y0) // ys))
            if pw and ph:
                spans.append((x0, y0, xs, ys, pw, ph))
    strides = [-(-pw * bits_pp // 8) for *_, pw, _ph in spans]
    need = sum((st + 1) * ph for st, (*_, ph) in zip(strides, spans))
    # bounded inflate: we use exactly `need` bytes, so never materialize
    # more — a deflate bomb in IDAT stops at the cap instead of OOMing
    # the executor
    raw = zlib.decompressobj().decompress(bytes(idat), need)
    if len(raw) < need:
        raise UnsupportedMediaError("IDAT inflates short of one scanline per row")
    n_samples = 1 if depth < 8 else ch
    grid = np.zeros((height, width, n_samples), dtype=np.uint8)
    off = 0
    for (x0, y0, xs, ys, pw, ph), st in zip(spans, strides):
        block = np.frombuffer(
            raw, dtype=np.uint8, count=(st + 1) * ph, offset=off
        ).reshape(ph, st + 1)
        off += (st + 1) * ph
        pixels = _unfilter(block, ph, st, bpp)
        grid[y0::ys, x0::xs] = _samples(pixels, ph, pw, depth, ch)

    if depth < 8:  # sub-byte samples (gray levels or palette indices)
        idx = grid[:, :, 0]
        if color == 0:  # scale gray to full range (spec sample scaling)
            scale = 255 // ((1 << depth) - 1)
            g = (idx * scale).astype(np.uint8)
            return np.repeat(g[:, :, None], 3, axis=2)
        plane = idx
    else:
        plane = grid

    if color == 3:  # palette lookup
        if palette is None:
            raise UnsupportedMediaError("palette image without PLTE")
        idx = plane if plane.ndim == 2 else plane[:, :, 0]
        if int(idx.max()) >= len(palette):
            raise UnsupportedMediaError("palette index out of range")
        return palette[idx]
    if color == 0:
        return np.repeat(plane[:, :, :1], 3, axis=2)
    if color == 2:
        return plane.copy()
    if color == 4:  # gray + alpha → drop alpha
        return np.repeat(plane[:, :, :1], 3, axis=2)
    return plane[:, :, :3].copy()  # RGBA → drop alpha


def encode_png(
    img: np.ndarray, color: int | None = None, level: int = 6,
    interlace: bool = False,
) -> bytes:
    """Encode HxW (gray) or HxWx3 (RGB) or HxWx4 (RGBA) uint8 as an
    8-bit PNG.  Rows cycle through filter types 0-4 so a decode
    round-trip exercises every unfilter path.  With ``interlace`` the
    image is written Adam7 (seven filtered sub-images, spec §8.2 —
    filtering restarts per pass).  Fixture-grade writer (tests +
    golden files), spec-conformant output."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if color is None:
        color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if interlace:
        lines = bytearray()
        for x0, y0, xs, ys in ADAM7:
            sub = arr[y0::ys, x0::xs]
            if sub.shape[0] and sub.shape[1]:
                lines += _filter_scanlines(
                    sub.reshape(sub.shape[0], sub.shape[1] * ch)
                    .astype(np.int32),
                    ch,
                )
    else:
        lines = _filter_scanlines(
            arr.reshape(h, w * ch).astype(np.int32), ch
        )

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, 8, color, 0, 0, 1 if interlace else 0
    )
    idat = zlib.compress(bytes(lines), level)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _filter_scanlines(flat: np.ndarray, ch: int) -> bytearray:
    """Filter one (sub-)image's scanlines, cycling types 0-4 per row;
    ``flat`` is (h, w*ch) int32.  Filtering state starts fresh per
    call — exactly the spec's per-pass reset for Adam7."""
    bpp = ch
    lines = bytearray()
    prev = np.zeros(flat.shape[1], dtype=np.int32)
    for y in range(flat.shape[0]):
        row = flat[y]
        f = y % 5
        if f == 0:
            out = row
        elif f == 1:
            left = np.zeros_like(row)
            left[bpp:] = row[:-bpp]
            out = (row - left) & 0xFF
        elif f == 2:
            out = (row - prev) & 0xFF
        elif f == 3:
            left = np.zeros_like(row)
            left[bpp:] = row[:-bpp]
            out = (row - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth predictor (vectorizable at encode: no recon feedback)
            a = np.zeros_like(row)
            a[bpp:] = row[:-bpp]
            b = prev
            c = np.zeros_like(row)
            c[bpp:] = prev[:-bpp]
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
            )
            out = (row - pred) & 0xFF
        lines.append(f)
        lines += out.astype(np.uint8).tobytes()
        prev = row
    return lines
