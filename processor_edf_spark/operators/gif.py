"""Pure-Python GIF codec (LZW) — the third real image format after
baseline JPEG (operators/jpeg.py) and PNG (operators/png.py), plus the
animated-GIF frame demux that mirrors the AVI story in
operators/media_codecs.py: a training corpus's "videos" are very often
animated GIFs, and frame sampling needs real decode.

GIF's compression is variable-width LZW (9→12-bit codes, clear/EOI),
patent-expired and ~60 lines of Python — so like PNG this is a complete
decode, not an approximation: 87a/89a, global and local color tables,
interlaced images (4-pass row reorder), transparency, and the disposal
methods that matter for frame compositing (1 draw-over, 2
restore-to-background; 3 restore-previous is rare and raises).  The
fixture encoder LZW-compresses a palette image, so the round-trip test
pins exact equality for ≤256-color content.

Decode cost is the per-symbol LZW loop — per-row Python like the JPEG
Huffman pass, Arrow-batched by the multimodal callers; the compositing
and palette steps are vectorized numpy.  The same MAX_PIXELS decode
bound as JPEG/PNG guards against lying headers.
"""

from __future__ import annotations

import struct

import numpy as np

from processor_edf_spark.operators.jpeg import MAX_PIXELS
from processor_edf_spark.operators.media_codecs import UnsupportedMediaError


def decode_gif(payload: bytes) -> np.ndarray:
    """First composited frame → HxWx3 uint8 RGB."""
    _, frames = demux_gif_frames(payload, max_frames=1)
    return frames[0]


def demux_gif_frames(
    payload: bytes, max_frames: int | None = None
) -> tuple[list[int], list[np.ndarray]]:
    """Animated GIF → (per-frame delays in centiseconds, composited
    HxWx3 RGB frames).  Compositing honors transparency and disposal
    methods 0/1 (draw over) and 2 (restore to background);
    restore-to-previous (3) raises.  ``max_frames`` stops early (frame
    sampling never needs the whole animation decoded)."""
    try:
        return _demux(payload, max_frames)
    except UnsupportedMediaError:
        raise
    except (struct.error, ValueError, IndexError, KeyError) as e:
        raise UnsupportedMediaError(f"malformed GIF: {e}") from e


def _read_color_table(payload: bytes, pos: int, flags: int) -> tuple[np.ndarray | None, int]:
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        table = np.frombuffer(payload, dtype=np.uint8, count=n * 3, offset=pos)
        return table.reshape(n, 3).copy(), pos + n * 3
    return None, pos


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        size = payload[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        out += payload[pos : pos + size]
        if len(payload) < pos + size:
            raise UnsupportedMediaError("truncated data sub-block")
        pos += size


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """Variable-width LZW per the GIF spec; returns exactly ``expected``
    indices (extra codes beyond the pixel count are ignored, shortage
    raises)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # dictionary as a list of bytes entries
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < expected:
        while nbits < code_size:
            if pos >= n:
                raise UnsupportedMediaError("LZW stream ends before raster")
            acc |= data[pos] << nbits  # GIF packs codes LSB-first
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise UnsupportedMediaError("LZW code before any literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise UnsupportedMediaError("LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    if len(out) < expected:
        raise UnsupportedMediaError("LZW raster short of the declared size")
    return np.frombuffer(bytes(out[:expected]), dtype=np.uint8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def _demux(payload: bytes, max_frames: int | None):
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise UnsupportedMediaError("not a GIF payload")
    width, height = struct.unpack_from("<HH", payload, 6)
    if width < 1 or height < 1:
        raise UnsupportedMediaError(f"degenerate dimensions ({width}x{height})")
    if width * height > MAX_PIXELS:
        raise UnsupportedMediaError(
            f"image {width}x{height} exceeds the {MAX_PIXELS}-pixel decode bound"
        )
    flags, bg_index = payload[10], payload[11]
    gct, pos = _read_color_table(payload, 13, flags)

    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:] = gct[bg_index]
    bg_fill = canvas[0, 0].copy()

    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay_cs = 0
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                size = payload[pos]
                gflags = payload[pos + 1]
                (delay_cs,) = struct.unpack_from("<H", payload, pos + 2)
                tindex = payload[pos + 4]
                disposal = (gflags >> 2) & 0x07
                transparent = tindex if gflags & 0x01 else None
                pos += 1 + size
                if payload[pos] != 0:
                    raise UnsupportedMediaError("unterminated graphic control")
                pos += 1
            else:  # comment/app/plain-text: skip sub-blocks
                _, pos = _read_subblocks(payload, pos)
        elif block == 0x2C:  # image descriptor
            left, top, w, h = struct.unpack_from("<HHHH", payload, pos + 1)
            iflags = payload[pos + 9]
            pos += 10
            lct, pos = _read_color_table(payload, pos, iflags)
            palette = lct if lct is not None else gct
            if palette is None:
                raise UnsupportedMediaError("image without any color table")
            if left + w > width or top + h > height or w < 1 or h < 1:
                raise UnsupportedMediaError("frame rectangle outside canvas")
            if disposal == 3:
                raise UnsupportedMediaError("restore-to-previous disposal")
            min_code = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            idx = _lzw_decode(data, min_code, w * h).reshape(h, w)
            if iflags & 0x40:
                idx = _deinterlace(idx)
            if int(idx.max()) >= len(palette):
                raise UnsupportedMediaError("palette index out of range")
            rgb = palette[idx]
            region = canvas[top : top + h, left : left + w]
            if transparent is not None:
                mask = (idx != transparent)[:, :, None]
                region[:] = np.where(mask, rgb, region)
            else:
                region[:] = rgb
            frames.append(canvas.copy())
            delays.append(delay_cs)
            if max_frames is not None and len(frames) >= max_frames:
                return delays, frames
            if disposal == 2:  # restore region to background
                canvas[top : top + h, left : left + w] = bg_fill
        else:
            raise UnsupportedMediaError(f"unknown block 0x{block:02X}")
    if not frames:
        raise UnsupportedMediaError("GIF contains no image data")
    return delays, frames


# ---------------------------------------------------------------------------
# Fixture encoder: palette image → single- or multi-frame GIF89a
# ---------------------------------------------------------------------------


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    run = b""
    for i in indices.tolist():
        nxt = run + bytes([i])
        if nxt in table:
            run = nxt
            continue
        emit(table[run])
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        elif next_code > (1 << 12):
            emit(clear)
            table = {bytes([j]): j for j in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        run = bytes([i])
    if run:
        emit(table[run])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray] | np.ndarray, delays_cs: list[int] | None = None
) -> bytes:
    """Encode one HxWx3 image or a list of same-size frames (≤256
    distinct colors across ALL frames) as GIF89a with one global color
    table.  Fixture-grade: no transparency, draw-over disposal."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    stack = np.stack([np.asarray(f, dtype=np.uint8) for f in frames])
    n, h, w, _ = stack.shape
    flat = stack.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} distinct colors exceed a GIF palette")
    depth = max(int(np.ceil(np.log2(max(len(palette), 2)))), 1)
    table_size = 1 << depth
    pal_bytes = np.zeros((table_size, 3), dtype=np.uint8)
    pal_bytes[: len(palette)] = palette
    indices = inverse.astype(np.uint8).reshape(n, h * w)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), 0, 0])  # GCT flag+size, bg, aspect
    out += pal_bytes.tobytes()
    min_code = max(depth, 2)
    delays = delays_cs or [0] * n
    for fi in range(n):
        out += bytes([0x21, 0xF9, 4, 0])  # graphic control, no transparency
        out += struct.pack("<H", delays[fi]) + bytes([0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
        out += bytes([min_code])
        data = _lzw_encode(indices[fi], min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)
