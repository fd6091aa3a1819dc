"""Pure-numpy TIFF decoder (uncompressed + Deflate strips) — the
scanned-document format a document-heavy corpus carries alongside
JPEG/PNG/GIF.

Scope is the baseline-TIFF profile that covers real files: both byte
orders (II/MM), 8-bit grayscale and RGB(A), strip layout (any
RowsPerStrip) AND tiled layout (TIFF 6.0 §15 — row-major padded tile
grid, clipped on paste, predictor undone per tile, every compression
scheme below per tile), PlanarConfiguration chunky, first IFD only
(multi-page TIFFs decode their first page — the frame-demux story
belongs to GIF/AVI).  Compression: uncompressed inline; Deflate/AdobeDeflate
(schemes 8/32946) through the ``compressed_tiff_deflate`` codec plugin
(stdlib zlib, registered by default, strip inflate bounded) with the
horizontal-differencing predictor (tag 317) undone by a modular
cumsum; LZW (scheme 5) through the pure-python
``compressed_tiff_lzw`` plugin; new-style JPEG-in-TIFF (scheme 7,
incl. shared JPEGTables abbreviated strips) through the
``compressed_tiff_jpeg`` plugin backed by the pure-python JPEG
decoder; anything else routes whole-payload through the optional
Pillow extra (``decode_tiff_via_optional``).  Palette TIFFs resolve
through ColorMap (tag 320, 16-bit entries reduced to their high
byte); 16-bit samples decode to their high byte after the predictor
(the uint8 RGB contract's one inherent precision loss, like PNG's).
Anything else raises ``UnsupportedMediaError`` into the callers'
documented stub fallback; same one-exception contract and MAX_PIXELS
bound as the other codecs.

The fixture encoders write the matching minimal profiles, so the
round-trip tests pin exact equality (both paths are lossless).
"""

from __future__ import annotations

import struct

import numpy as np

from processor_edf_spark.operators.jpeg import MAX_PIXELS
from processor_edf_spark.operators.media_codecs import UnsupportedMediaError

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1}  # 7 = UNDEFINED (bytes)


def decode_tiff(payload: bytes) -> np.ndarray:
    """First IFD → HxWx3 uint8 RGB (gray replicated, alpha dropped)."""
    try:
        return _decode_tiff(payload)
    except UnsupportedMediaError:
        raise
    except (struct.error, ValueError, IndexError, KeyError) as e:
        raise UnsupportedMediaError(f"malformed TIFF: {e}") from e


def _read_tag_values(payload, endian, vtype, count, value_field):
    size = _TYPE_SIZE.get(vtype)
    if size is None:
        raise UnsupportedMediaError(f"TIFF value type {vtype}")
    total = size * count
    if total <= 4:
        raw = value_field[:total]
    else:
        (off,) = struct.unpack(endian + "I", value_field)
        if off + total > len(payload):
            raise UnsupportedMediaError("TIFF tag data past end of payload")
        raw = payload[off : off + total]
    if vtype in (1, 2, 7):
        return list(raw)
    fmt = {3: "H", 4: "I", 5: "Q"}[vtype]
    if vtype == 5:  # RATIONAL: return numerators only (unused here)
        return [
            struct.unpack_from(endian + "II", raw, i * 8)[0]
            for i in range(count)
        ]
    return list(struct.unpack(endian + fmt * count, raw))


def _decode_tiff(payload: bytes) -> np.ndarray:
    if payload[:2] == b"II":
        endian = "<"
    elif payload[:2] == b"MM":
        endian = ">"
    else:
        raise UnsupportedMediaError("not a TIFF payload")
    (magic,) = struct.unpack_from(endian + "H", payload, 2)
    if magic != 42:
        raise UnsupportedMediaError("bad TIFF magic")
    (ifd_off,) = struct.unpack_from(endian + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise UnsupportedMediaError("IFD offset past end of payload")
    (n_tags,) = struct.unpack_from(endian + "H", payload, ifd_off)
    tags = {}
    for i in range(n_tags):
        base = ifd_off + 2 + 12 * i
        tag, vtype, count = struct.unpack_from(endian + "HHI", payload, base)
        tags[tag] = (vtype, count, payload[base + 8 : base + 12])

    def tag_vals(tag, default=None):
        if tag not in tags:
            if default is not None:
                return default
            raise UnsupportedMediaError(f"missing required TIFF tag {tag}")
        vtype, count, vf = tags[tag]
        return _read_tag_values(payload, endian, vtype, count, vf)

    width = tag_vals(256)[0]
    height = tag_vals(257)[0]
    if width < 1 or height < 1:
        raise UnsupportedMediaError(f"degenerate dimensions ({width}x{height})")
    if width * height > MAX_PIXELS:
        raise UnsupportedMediaError(
            f"image {width}x{height} exceeds the {MAX_PIXELS}-pixel decode bound"
        )
    compression = tag_vals(259, [1])[0]
    predictor = tag_vals(317, [1])[0]
    # strip-path plugin per compression scheme; anything else — and any
    # predictor the strip path cannot undo (e.g. floating-point 3) on a
    # compressed scheme the optional route might handle whole-payload —
    # goes to decode_tiff_via_optional.  The predictor gate therefore
    # applies ONLY to payloads this decoder decodes itself: it must not
    # reject a file the optional Pillow/plugin route could read.
    _STRIP_PLUGIN = {
        8: "compressed_tiff_deflate",        # Deflate
        32946: "compressed_tiff_deflate",    # AdobeDeflate
        5: "compressed_tiff_lzw",            # LZW (TIFF 6.0 §13)
        32773: "compressed_tiff_packbits",   # PackBits RLE (TIFF 6.0 §9)
    }
    decompress = None
    if compression == 7:
        # New-style JPEG-in-TIFF (TIFF-EP / TechNote 2): each strip is
        # a JPEG datastream, optionally abbreviated against a shared
        # JPEGTables (tag 347) tables-only stream.  Strips route
        # through the compressed_tiff_jpeg plugin — the pure-python
        # baseline+progressive decoder in operators/jpeg.py is
        # registered by default, so this path is REAL everywhere.
        return _decode_jpeg_strips(payload, tags, tag_vals, width, height)
    if compression in _STRIP_PLUGIN and predictor in (1, 2):
        from processor_edf_spark.operators.media_codecs import (
            get_codec_plugin,
        )

        name = _STRIP_PLUGIN[compression]
        decompress = get_codec_plugin(name)
        if decompress is None:
            raise UnsupportedMediaError(
                f"compressed TIFF needs the {name} plugin "
                "(registered by default; a deployment removed it)"
            )
    elif compression != 1:
        # JPEG-in-TIFF and friends, or a strip scheme with a predictor
        # the strip path can't undo: whole-payload route through the
        # optional Pillow extra (one-exception contract when absent).
        # Runs AFTER the dimension checks above, so the MAX_PIXELS
        # bound gates the optional path too.
        from processor_edf_spark.operators.media_codecs import (
            decode_tiff_via_optional,
        )

        return decode_tiff_via_optional(payload)
    elif predictor not in (1, 2):
        raise UnsupportedMediaError(f"TIFF predictor {predictor}")
    photometric = tag_vals(262)[0]
    if photometric not in (0, 1, 2, 3):
        raise UnsupportedMediaError(f"TIFF photometric {photometric}")
    spp = tag_vals(277, [1])[0]
    bits = tag_vals(258, [8] * spp)
    if all(b == 8 for b in bits):
        bps = 1
    elif all(b == 16 for b in bits) and photometric != 3:
        # 16-bit samples reduce to their high byte (the uint8 RGB
        # decode contract's one inherent precision loss, like PNG's) —
        # AFTER the predictor, which differences 16-bit values
        bps = 2
    else:
        raise UnsupportedMediaError(f"unsupported TIFF sample bits {bits}")
    if tag_vals(284, [1])[0] != 1:
        raise UnsupportedMediaError("planar TIFF layout")
    if photometric == 2 and spp < 3:
        raise UnsupportedMediaError("RGB TIFF with fewer than 3 samples")
    if photometric == 3 and spp != 1:
        raise UnsupportedMediaError("palette TIFF with multiple samples")

    def finish(plane16):
        """(h, w, spp) array at sample width → HxWx3 uint8 RGB."""
        if bps == 2:
            img8 = (plane16 >> 8).astype(np.uint8)
        else:
            img8 = plane16.astype(np.uint8)
        if photometric == 3:  # palette: ColorMap is 3 x 2^bits 16-bit
            cmap_vals = tag_vals(320)
            if len(cmap_vals) != 3 * 256:
                raise UnsupportedMediaError(
                    f"ColorMap size {len(cmap_vals)} for 8-bit indices"
                )
            cmap = (
                np.asarray(cmap_vals, dtype=np.uint16)
                .reshape(3, 256)
                .T
                >> 8
            ).astype(np.uint8)
            return cmap[img8[:, :, 0]]
        if photometric == 2:
            return np.ascontiguousarray(img8[:, :, :3])  # drop alpha/extras
        gray = img8[:, :, 0]
        if photometric == 0:  # WhiteIsZero: invert
            gray = 255 - gray
        return np.repeat(gray[:, :, None], 3, axis=2)

    sample_mod = 65536 if bps == 2 else 256

    def as_samples(buf, rows, cols):
        """raw bytes → (rows, cols, spp) array at the sample width,
        honouring the file byte order for 16-bit samples."""
        if bps == 1:
            return np.frombuffer(
                buf, dtype=np.uint8, count=rows * cols * spp
            ).reshape(rows, cols, spp)
        return np.frombuffer(
            buf, dtype=endian + "u2", count=rows * cols * spp
        ).reshape(rows, cols, spp)

    if 322 in tags or 323 in tags:
        # tiled layout (TIFF 6.0 §15): row-major grid of TileWidth x
        # TileLength tiles, EVERY tile full-size (edge tiles padded —
        # the padding is decoded and clipped).  The predictor restarts
        # per tile row within a tile, so it's undone per tile.
        tw = tag_vals(322)[0]
        tl = tag_vals(323)[0]
        if tw < 1 or tl < 1 or tw % 16 or tl % 16:  # spec: multiples of 16
            raise UnsupportedMediaError(f"bad TIFF tile geometry {tw}x{tl}")
        offsets = tag_vals(324)
        counts = tag_vals(325)
        if len(offsets) != len(counts):
            raise UnsupportedMediaError("tile offset/count mismatch")
        across = -(-width // tw)
        down = -(-height // tl)
        if len(offsets) < across * down:
            raise UnsupportedMediaError("fewer tiles than the grid needs")
        tile_bytes = tw * tl * spp * bps
        img = np.zeros(
            (height, width, spp), dtype=np.uint16 if bps == 2 else np.uint8
        )
        for i in range(across * down):
            ty, tx = divmod(i, across)
            off, cnt = offsets[i], counts[i]
            if off + cnt > len(payload):
                raise UnsupportedMediaError("tile past end of payload")
            if decompress is not None:
                data = decompress(payload[off : off + cnt], tile_bytes)
                if len(data) < tile_bytes:
                    raise UnsupportedMediaError(
                        "tile inflates short of its raster"
                    )
            else:
                if cnt < tile_bytes:
                    raise UnsupportedMediaError("tile shorter than its raster")
                data = payload[off : off + tile_bytes]
            tile = as_samples(bytes(data), tl, tw)
            if predictor == 2:
                tile = (
                    np.cumsum(tile, axis=1, dtype=np.uint64) % sample_mod
                ).astype(img.dtype)
            y0, x0 = ty * tl, tx * tw
            img[y0 : y0 + min(tl, height - y0),
                x0 : x0 + min(tw, width - x0)] = (
                tile[: height - y0, : width - x0]
            )
    else:
        offsets = tag_vals(273)
        counts = tag_vals(279)
        rows_per_strip = tag_vals(278, [height])[0]
        if len(offsets) != len(counts):
            raise UnsupportedMediaError("strip offset/count mismatch")
        row_bytes = width * spp * bps
        raster = bytearray()
        rows_done = 0
        for off, cnt in zip(offsets, counts):
            if off + cnt > len(payload):
                raise UnsupportedMediaError("strip past end of payload")
            rows_here = min(rows_per_strip, height - rows_done)
            need = rows_here * row_bytes
            if decompress is not None:
                data = decompress(payload[off : off + cnt], need)
                if len(data) < need:
                    raise UnsupportedMediaError(
                        "strip inflates short of its rows"
                    )
            else:
                if cnt < need:
                    raise UnsupportedMediaError("strip shorter than its rows")
                data = payload[off : off + need]
            raster += data[:need]
            rows_done += rows_here
        if rows_done < height:
            raise UnsupportedMediaError(
                "strips cover fewer rows than ImageLength"
            )
        img = as_samples(bytes(raster), height, width)
        if predictor == 2:
            # horizontal differencing: undo with a per-sample modular cumsum
            img = (
                np.cumsum(img, axis=1, dtype=np.uint64) % sample_mod
            ).astype(np.uint16 if bps == 2 else np.uint8)
    return finish(img)


def _decode_jpeg_strips(payload, tags, tag_vals, width, height):
    """Compression-7 path: decode each JPEG strip (or tile) to pixels
    and assemble.  Unlike the byte-stream strip plugins (Deflate/LZW),
    the JPEG plugin returns decoded HxWx3 pixels — photometric
    conversion (YCbCr, grayscale) lives inside the JPEG stream itself,
    so the TIFF-level photometric/bits/predictor tags are not
    consulted."""
    from processor_edf_spark.operators.media_codecs import get_codec_plugin

    decode_one = get_codec_plugin("compressed_tiff_jpeg")
    if decode_one is None:
        raise UnsupportedMediaError(
            "JPEG-in-TIFF needs the compressed_tiff_jpeg plugin "
            "(registered by default; a deployment removed it)"
        )
    tables_body = b""
    if 347 in tags:
        tables = bytes(tag_vals(347))
        if (
            len(tables) < 4
            or tables[:2] != b"\xff\xd8"
            or tables[-2:] != b"\xff\xd9"
        ):
            raise UnsupportedMediaError(
                "JPEGTables is not an abbreviated JPEG stream"
            )
        tables_body = tables[2:-2]

    def decode(chunk):
        if tables_body:
            if chunk[:2] != b"\xff\xd8":
                raise UnsupportedMediaError("JPEG strip missing SOI")
            # abbreviated stream: splice the shared tables right after
            # the SOI (TIFF-EP's defined merge)
            chunk = chunk[:2] + tables_body + chunk[2:]
        return decode_one(chunk)

    if 322 in tags or 323 in tags:  # tiled: every tile a full JPEG
        tw = tag_vals(322)[0]
        tl = tag_vals(323)[0]
        if tw < 1 or tl < 1 or tw % 16 or tl % 16:
            raise UnsupportedMediaError(f"bad TIFF tile geometry {tw}x{tl}")
        offsets = tag_vals(324)
        counts = tag_vals(325)
        if len(offsets) != len(counts):
            raise UnsupportedMediaError("tile offset/count mismatch")
        across = -(-width // tw)
        down = -(-height // tl)
        if len(offsets) < across * down:
            raise UnsupportedMediaError("fewer tiles than the grid needs")
        img = np.zeros((height, width, 3), dtype=np.uint8)
        for i in range(across * down):
            ty, tx = divmod(i, across)
            off, cnt = offsets[i], counts[i]
            if off + cnt > len(payload):
                raise UnsupportedMediaError("tile past end of payload")
            arr = decode(payload[off : off + cnt])
            if arr.shape[0] < tl or arr.shape[1] < tw:
                raise UnsupportedMediaError(
                    f"JPEG tile geometry {arr.shape[1]}x{arr.shape[0]} "
                    f"smaller than the {tw}x{tl} tile"
                )
            y0, x0 = ty * tl, tx * tw
            img[y0 : y0 + min(tl, height - y0),
                x0 : x0 + min(tw, width - x0)] = (
                arr[: height - y0, : width - x0]
            )
        return img
    offsets = tag_vals(273)
    counts = tag_vals(279)
    if len(offsets) != len(counts):
        raise UnsupportedMediaError("strip offset/count mismatch")
    rows_per_strip = tag_vals(278, [height])[0]
    if rows_per_strip < 1:
        raise UnsupportedMediaError("degenerate RowsPerStrip")
    parts = []
    rows_done = 0
    for off, cnt in zip(offsets, counts):
        if rows_done >= height:
            break
        if off + cnt > len(payload):
            raise UnsupportedMediaError("strip past end of payload")
        arr = decode(payload[off : off + cnt])
        rows_here = min(rows_per_strip, height - rows_done)
        if arr.shape[1] != width or arr.shape[0] < rows_here:
            raise UnsupportedMediaError(
                f"JPEG strip geometry {arr.shape[1]}x{arr.shape[0]} "
                f"mismatches ImageWidth {width} / its {rows_here} rows"
            )
        parts.append(arr[:rows_here])
        rows_done += rows_here
    if rows_done < height:
        raise UnsupportedMediaError("strips cover fewer rows than ImageLength")
    return np.ascontiguousarray(np.vstack(parts))


def encode_tiff(img: np.ndarray, rows_per_strip: int = 8) -> bytes:
    """Minimal little-endian uncompressed TIFF writer (fixtures): 8-bit
    gray (HxW) or RGB (HxWx3), strip layout."""
    arr = np.asarray(img, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    spp = 1 if gray else arr.shape[2]
    data = arr.tobytes()
    row_bytes = w * spp
    strips = [
        data[r0 * row_bytes : min(r0 + rows_per_strip, h) * row_bytes]
        for r0 in range(0, h, rows_per_strip)
    ]
    return _assemble_tiff(w, h, spp, gray, strips, rows_per_strip)


def encode_tiff_deflate(
    img: np.ndarray, rows_per_strip: int = 8, predictor: int = 2
) -> bytes:
    """Deflate-compressed (scheme 8) TIFF writer with optional
    horizontal-differencing predictor — the fixture encoder for the
    compressed_tiff_deflate plugin's round-trip tests."""
    import zlib

    arr = np.asarray(img, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    spp = 1 if gray else arr.shape[2]
    a3 = arr.reshape(h, w, spp)
    if predictor == 2:
        d = a3.astype(np.int16)
        d[:, 1:, :] -= a3[:, :-1, :].astype(np.int16)
        a3 = (d % 256).astype(np.uint8)
    elif predictor != 1:
        raise ValueError(f"predictor {predictor}")
    data = np.ascontiguousarray(a3).tobytes()
    row_bytes = w * spp
    strips = [
        zlib.compress(
            data[r0 * row_bytes : min(r0 + rows_per_strip, h) * row_bytes]
        )
        for r0 in range(0, h, rows_per_strip)
    ]
    return _assemble_tiff(
        w, h, spp, gray, strips, rows_per_strip,
        compression=8, predictor=predictor,
    )


def _lzw_compress(data: bytes) -> bytes:
    """TIFF 6.0 §13 LZW compressor (fixture side of the
    compressed_tiff_lzw plugin's round-trip tests): MSB-first code
    packing, 9→12-bit codes with early change (width bumps when the
    next code to be assigned is 2^w−1), table reset via ClearCode
    before the 12-bit table fills."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    acc_bits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, acc_bits
        acc = (acc << width) | code
        acc_bits += width
        while acc_bits >= 8:
            acc_bits -= 8
            out.append((acc >> acc_bits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    prefix = b""
    for b in data:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix])
        table[cand] = next_code
        next_code += 1
        # the encoder runs one table entry AHEAD of the decoder, so its
        # early-change bump fires at 2^w where the decoder's fires at
        # 2^w−1 — the libtiff pairing (maxcode vs maxcode−1)
        if width < 12:
            if next_code == (1 << width):
                width += 1
        elif next_code == (1 << 12) - 1:
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prefix = bytes([b])
    if prefix:
        emit(table[prefix])
    # width fixup for EOI: the decoder adds a table entry for the final
    # data code (the encoder does not), so when that entry lands the
    # table exactly on the early-change boundary (next_code == 2^w−1)
    # the decoder reads the NEXT code one bit wider — emit EOI at that
    # width or a boundary-length stream misreads its own terminator
    # (the classic libtiff LZWPostEncode off-by-one)
    if next_code == (1 << width) - 1 and width < 12:
        width += 1
    emit(EOI)
    if acc_bits:
        out.append((acc << (8 - acc_bits)) & 0xFF)
    return bytes(out)


def encode_tiff_lzw(
    img: np.ndarray, rows_per_strip: int = 8, predictor: int = 2
) -> bytes:
    """LZW-compressed (scheme 5) TIFF writer with optional
    horizontal-differencing predictor — the fixture encoder for the
    compressed_tiff_lzw plugin's round-trip tests."""
    arr = np.asarray(img, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    spp = 1 if gray else arr.shape[2]
    a3 = arr.reshape(h, w, spp)
    if predictor == 2:
        d = a3.astype(np.int16)
        d[:, 1:, :] -= a3[:, :-1, :].astype(np.int16)
        a3 = (d % 256).astype(np.uint8)
    elif predictor != 1:
        raise ValueError(f"predictor {predictor}")
    data = np.ascontiguousarray(a3).tobytes()
    row_bytes = w * spp
    strips = [
        _lzw_compress(
            data[r0 * row_bytes : min(r0 + rows_per_strip, h) * row_bytes]
        )
        for r0 in range(0, h, rows_per_strip)
    ]
    return _assemble_tiff(
        w, h, spp, gray, strips, rows_per_strip,
        compression=5, predictor=predictor,
    )


def _packbits_compress(row: bytes) -> bytes:
    """TIFF 6.0 §9 PackBits packer for ONE row (the spec packs each
    row separately; the strip is the concatenation).  Greedy
    literal/replicate split per the spec's recommendation: runs of ≥2
    become replicate codes, everything else accumulates into ≤128-byte
    literal groups — the fixture side of the
    compressed_tiff_packbits plugin's round-trip tests."""
    out = bytearray()
    i = 0
    n = len(row)
    lit_start = None

    def flush_literal(end: int) -> None:
        nonlocal lit_start
        j = lit_start
        while j < end:
            k = min(end, j + 128)
            out.append(k - j - 1)
            out.extend(row[j:k])
            j = k
        lit_start = None

    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            if lit_start is not None:
                flush_literal(i)
            out.append(257 - run)  # 1-run as signed byte
            out.append(row[i])
            i += run
        else:
            if lit_start is None:
                lit_start = i
            i += 1
    if lit_start is not None:
        flush_literal(n)
    return bytes(out)


def encode_tiff_packbits(
    img: np.ndarray, rows_per_strip: int = 8, predictor: int = 1
) -> bytes:
    """PackBits-compressed (scheme 32773) TIFF writer — the fixture
    encoder for the compressed_tiff_packbits plugin's round-trip
    tests.  Rows pack separately per TIFF 6.0 §9; a strip is its rows'
    packed bytes concatenated."""
    arr = np.asarray(img, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    spp = 1 if gray else arr.shape[2]
    a3 = arr.reshape(h, w, spp)
    if predictor == 2:
        d = a3.astype(np.int16)
        d[:, 1:, :] -= a3[:, :-1, :].astype(np.int16)
        a3 = (d % 256).astype(np.uint8)
    elif predictor != 1:
        raise ValueError(f"predictor {predictor}")
    data = np.ascontiguousarray(a3).tobytes()
    row_bytes = w * spp
    strips = [
        b"".join(
            _packbits_compress(data[r * row_bytes : (r + 1) * row_bytes])
            for r in range(r0, min(r0 + rows_per_strip, h))
        )
        for r0 in range(0, h, rows_per_strip)
    ]
    return _assemble_tiff(
        w, h, spp, gray, strips, rows_per_strip,
        compression=32773, predictor=predictor,
    )


def _assemble_tiff(
    w, h, spp, gray, strips, rows_per_strip, compression=1, predictor=1,
    jpeg_tables=None,
) -> bytes:
    """Two-pass assembly: size the IFD + external arrays, then emit."""
    n_strips = len(strips)
    counts = [len(s) for s in strips]
    tags = [256, 257, 258, 259, 262, 273, 277, 278, 279]
    if predictor != 1:
        tags.append(317)
    if jpeg_tables is not None:
        tags.append(347)
    n_tags = len(tags)
    ifd_off = 8
    ext_off = ifd_off + 2 + 12 * n_tags + 4
    ext_len = 0
    bps_off = off_arr = cnt_arr = tbl_off = None
    if spp != 1:
        bps_off = ext_off + ext_len
        ext_len += 2 * spp
    if n_strips > 1:
        off_arr = ext_off + ext_len
        ext_len += 4 * n_strips
        cnt_arr = ext_off + ext_len
        ext_len += 4 * n_strips
    if jpeg_tables is not None:
        tbl_off = ext_off + ext_len
        ext_len += len(jpeg_tables)
    data_start = ext_off + ext_len
    offs = []
    pos = data_start
    for s in strips:
        offs.append(pos)
        pos += len(s)

    def entry(tag, vtype, count, value):
        return struct.pack("<HHI", tag, vtype, count) + value

    def short_val(v):
        return struct.pack("<HH", v, 0)

    def long_val(v):
        return struct.pack("<I", v)

    ifd = struct.pack("<H", n_tags)
    ifd += entry(256, 4, 1, long_val(w))
    ifd += entry(257, 4, 1, long_val(h))
    if spp == 1:
        ifd += entry(258, 3, 1, short_val(8))
    else:
        ifd += entry(258, 3, spp, long_val(bps_off))
    ifd += entry(259, 3, 1, short_val(compression))
    ifd += entry(262, 3, 1, short_val(1 if gray else 2))
    if n_strips == 1:
        ifd += entry(273, 4, 1, long_val(offs[0]))
    else:
        ifd += entry(273, 4, n_strips, long_val(off_arr))
    ifd += entry(277, 3, 1, short_val(spp))
    ifd += entry(278, 4, 1, long_val(rows_per_strip))
    if n_strips == 1:
        ifd += entry(279, 4, 1, long_val(counts[0]))
    else:
        ifd += entry(279, 4, n_strips, long_val(cnt_arr))
    if predictor != 1:
        ifd += entry(317, 3, 1, short_val(predictor))
    if jpeg_tables is not None:
        ifd += entry(347, 7, len(jpeg_tables), long_val(tbl_off))
    ifd += struct.pack("<I", 0)  # no next IFD

    ext = bytearray()
    if spp != 1:
        ext += struct.pack("<" + "H" * spp, *([8] * spp))
    if n_strips > 1:
        ext += struct.pack("<" + "I" * n_strips, *offs)
        ext += struct.pack("<" + "I" * n_strips, *counts)
    if jpeg_tables is not None:
        ext += jpeg_tables

    out = b"II" + struct.pack("<HI", 42, ifd_off) + ifd + bytes(ext)
    for s in strips:
        out += s
    return out


def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a standalone baseline JPEG into (table segments, the
    abbreviated remainder): DQT/DHT move to the shared JPEGTables
    stream, everything else (SOF, SOS + entropy data through EOI)
    stays per-strip — the TIFF-EP abbreviated-datastream layout the
    fixture encoder emits with ``use_jpeg_tables``."""
    if stream[:2] != b"\xff\xd8":
        raise UnsupportedMediaError("not a JPEG stream")
    tables = bytearray()
    rest = bytearray()
    i = 2
    while i + 4 <= len(stream):
        if stream[i] != 0xFF:
            raise UnsupportedMediaError("bad JPEG segment marker")
        marker = stream[i + 1]
        if marker == 0xDA:  # SOS: entropy-coded through EOI, verbatim
            rest += stream[i:]
            return bytes(tables), bytes(rest)
        (ln,) = struct.unpack(">H", stream[i + 2 : i + 4])
        seg = stream[i : i + 2 + ln]
        if marker in (0xDB, 0xC4):  # DQT / DHT
            tables += seg
        else:
            rest += seg
        i += 2 + ln
    raise UnsupportedMediaError("JPEG stream has no SOS")


def encode_tiff_jpeg(
    img: np.ndarray,
    quality: int = 90,
    rows_per_strip: int = 16,
    use_jpeg_tables: bool = False,
    subsampling: str = "444",
) -> bytes:
    """New-style JPEG-in-TIFF (compression 7) writer — the fixture
    encoder for the compressed_tiff_jpeg plugin's parity tests: each
    strip of ``img`` encoded as a baseline JPEG (operators/jpeg.py);
    with ``use_jpeg_tables`` the shared DQT/DHT segments move to a
    JPEGTables (tag 347) abbreviated tables-only stream and every
    strip becomes an abbreviated datastream (the TIFF-EP layout real
    writers emit).  Strip heights should be multiples of the JPEG MCU
    (8 for 444, 16 for 420) so strip stacking is exact vs decoding
    each strip standalone."""
    from processor_edf_spark.operators.jpeg import encode_jpeg_baseline

    arr = np.asarray(img, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    strips = [
        encode_jpeg_baseline(
            arr[r0 : min(r0 + rows_per_strip, h)], quality, subsampling
        )
        for r0 in range(0, h, rows_per_strip)
    ]
    jpeg_tables = None
    if use_jpeg_tables:
        seg0, _ = _split_jpeg_tables(strips[0])
        jpeg_tables = b"\xff\xd8" + seg0 + b"\xff\xd9"
        strips = [
            b"\xff\xd8" + _split_jpeg_tables(s)[1] for s in strips
        ]
    return _assemble_tiff(
        w,
        h,
        1 if gray else 3,
        gray,
        strips,
        rows_per_strip,
        compression=7,
        jpeg_tables=jpeg_tables,
    )


def encode_tiff_tiled(
    img: np.ndarray,
    tile_w: int = 16,
    tile_h: int = 16,
    compression: int = 1,
    predictor: int = 1,
    quality: int = 90,
) -> bytes:
    """Tiled-layout TIFF writer (TIFF 6.0 §15; fixtures): gray (HxW) or
    RGB (HxWx3), row-major tile grid, edge tiles zero-padded to the
    full tile size as the spec requires.  Compression per tile: 1
    (none), 8 (Deflate), 5 (LZW) — with the optional horizontal
    predictor undone per tile on decode — or 7 (each tile a standalone
    baseline JPEG at ``quality``)."""
    if tile_w % 16 or tile_h % 16:
        raise UnsupportedMediaError("TIFF tiles must be multiples of 16")
    arr = np.asarray(img, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    spp = 1 if gray else arr.shape[2]
    a3 = arr.reshape(h, w, spp)
    across = -(-w // tile_w)
    down = -(-h // tile_h)
    tiles = []
    for ty in range(down):
        for tx in range(across):
            t = np.zeros((tile_h, tile_w, spp), np.uint8)
            sub = a3[
                ty * tile_h : (ty + 1) * tile_h,
                tx * tile_w : (tx + 1) * tile_w,
            ]
            t[: sub.shape[0], : sub.shape[1]] = sub
            if compression == 7:
                from processor_edf_spark.operators.jpeg import (
                    encode_jpeg_baseline,
                )

                tiles.append(
                    encode_jpeg_baseline(
                        t[:, :, 0] if gray else t, quality
                    )
                )
                continue
            if predictor == 2:
                d = t.astype(np.int16)
                d[:, 1:, :] -= t[:, :-1, :].astype(np.int16)
                t = (d % 256).astype(np.uint8)
            raw = np.ascontiguousarray(t).tobytes()
            if compression == 8:
                import zlib

                tiles.append(zlib.compress(raw))
            elif compression == 5:
                tiles.append(_lzw_compress(raw))
            elif compression == 1:
                tiles.append(raw)
            else:
                raise UnsupportedMediaError(
                    f"unsupported fixture compression {compression}"
                )

    use_predictor = predictor == 2 and compression in (5, 8)
    n_tiles = len(tiles)
    tags = [256, 257, 258, 259, 262, 277]
    if use_predictor:
        tags.append(317)
    tags += [322, 323, 324, 325]
    n_tags = len(tags)
    ifd_off = 8
    ext_off = ifd_off + 2 + 12 * n_tags + 4
    ext = bytearray()
    bps_off = None
    if spp != 1:
        bps_off = ext_off + len(ext)
        ext += struct.pack("<" + "H" * spp, *([8] * spp))
    off_arr = cnt_arr = None
    if n_tiles > 1:
        off_arr = ext_off + len(ext)
        ext += bytes(4 * n_tiles)  # patched below
        cnt_arr = ext_off + len(ext)
        ext += bytes(4 * n_tiles)
    data_start = ext_off + len(ext)
    offs, pos = [], data_start
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    counts = [len(t) for t in tiles]
    if n_tiles > 1:
        ext[off_arr - ext_off : off_arr - ext_off + 4 * n_tiles] = (
            struct.pack("<" + "I" * n_tiles, *offs)
        )
        ext[cnt_arr - ext_off : cnt_arr - ext_off + 4 * n_tiles] = (
            struct.pack("<" + "I" * n_tiles, *counts)
        )

    def entry(tag, vtype, count, value):
        return struct.pack("<HHI", tag, vtype, count) + value

    def short_val(v):
        return struct.pack("<HH", v, 0)

    def long_val(v):
        return struct.pack("<I", v)

    ifd = struct.pack("<H", n_tags)
    ifd += entry(256, 4, 1, long_val(w))
    ifd += entry(257, 4, 1, long_val(h))
    if spp == 1:
        ifd += entry(258, 3, 1, short_val(8))
    else:
        ifd += entry(258, 3, spp, long_val(bps_off))
    ifd += entry(259, 3, 1, short_val(compression))
    ifd += entry(262, 3, 1, short_val(1 if gray else 2))
    ifd += entry(277, 3, 1, short_val(spp))
    if use_predictor:
        ifd += entry(317, 3, 1, short_val(2))
    ifd += entry(322, 4, 1, long_val(tile_w))
    ifd += entry(323, 4, 1, long_val(tile_h))
    if n_tiles == 1:
        ifd += entry(324, 4, 1, long_val(offs[0]))
        ifd += entry(325, 4, 1, long_val(counts[0]))
    else:
        ifd += entry(324, 4, n_tiles, long_val(off_arr))
        ifd += entry(325, 4, n_tiles, long_val(cnt_arr))
    ifd += struct.pack("<I", 0)  # no next IFD

    out = b"II" + struct.pack("<HI", 42, ifd_off) + ifd + bytes(ext)
    for t in tiles:
        out += t
    return out
