"""VP8L (WebP lossless) codec tests.

Round-trips pin the encoder↔decoder pair on arbitrary RGB; the
hand-assembled bitstreams pin the DECODER against the spec's feature
paths the fixture encoder deliberately never emits — LZ77 backward
references (raw and plane-coded distances), the color cache, the
predictor and color-indexing transforms, meta prefix groups, and simple
prefix codes — with expected pixels computed independently from the
RFC 9649 formulas.  Malformed-input fuzz keeps the one-exception
contract.
"""

from __future__ import annotations

import numpy as np
import pytest

from processor_edf_spark.operators.media_codecs import (
    UnsupportedMediaError,
    decode_image,
)
from processor_edf_spark.operators.webp import (
    NUM_LENGTH_CODES,
    PLANE_CODES,
    BitWriter,
    canonical_lengths_to_codes,
    decode_vp8l,
    decode_webp_lossless,
    emit_prefix_value,
    encode_webp_lossless,
    write_prefix_code,
    _cache_key,
)


# ---------------------------------------------------------------------------
# round-trips (encoder paths)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(1, 1), (5, 7), (16, 16), (3, 31), (40, 2)])
@pytest.mark.parametrize("subtract_green", [False, True])
def test_roundtrip_random(shape, subtract_green):
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    img = rng.integers(0, 256, (*shape, 3), np.uint8)
    payload = encode_webp_lossless(img, subtract_green=subtract_green)
    assert (decode_webp_lossless(payload) == img).all()
    assert (decode_image(payload) == img).all()  # magic-byte router


def test_vp8x_extended_container_walk():
    """The VP8L chunk is found by chunk walk even behind a VP8X header."""
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    plain = encode_webp_lossless(img)
    vp8l_chunk = plain[12:]  # "VP8L" + size + data (+pad)
    vp8x = b"VP8X" + (10).to_bytes(4, "little") + bytes(10)
    body = vp8x + vp8l_chunk
    payload = b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WEBP" + body
    assert (decode_webp_lossless(payload) == img).all()


def test_lossy_vp8_names_optional_codec():
    payload = b"RIFF" + (20).to_bytes(4, "little") + b"WEBPVP8 " + bytes(12)
    with pytest.raises(UnsupportedMediaError, match="optional codec"):
        decode_webp_lossless(payload)


def test_plane_code_table_matches_spec_head():
    """First 24 entries of the distance-mapping table, straight from
    the spec's literal listing (RFC 9649 §3.6.2.3)."""
    assert PLANE_CODES[:24] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    ]
    assert len(PLANE_CODES) == 120


# ---------------------------------------------------------------------------
# hand-assembled decoder feature streams
# ---------------------------------------------------------------------------


def _header(bw: BitWriter, w: int, h: int) -> None:
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _group_codes(
    bw: BitWriter,
    green_lengths: list[int],
    dist_lengths: list[int] | None = None,
):
    """Write one 5-code group: the given green code, flat red/blue via
    write_prefix_code, single-symbol alpha(255), and the given (or
    trivial) distance code.  Returns the symbol->code maps."""
    write_prefix_code(bw, green_lengths)
    rb = [8] * 256
    write_prefix_code(bw, rb)
    write_prefix_code(bw, rb)
    # alpha: simple single-symbol 255
    bw.write(1, 1)
    bw.write(0, 1)
    bw.write(1, 1)
    bw.write(255, 8)
    if dist_lengths is None:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        bw.write(0, 1)  # 1-bit
        bw.write(0, 1)  # symbol 0
        dist_codes = {0: (0, 0)}
    else:
        write_prefix_code(bw, dist_lengths)
        dist_codes = canonical_lengths_to_codes(dist_lengths)
    return (
        canonical_lengths_to_codes(green_lengths),
        canonical_lengths_to_codes(rb),
        dist_codes,
    )


def _emit_literal(bw, green_codes, rb_codes, r, g, b):
    c, n = green_codes[g]
    bw.write_code(c, n)
    c, n = rb_codes[r]
    bw.write_code(c, n)
    c, n = rb_codes[b]
    bw.write_code(c, n)
    # alpha: zero bits


def _balanced_green_lengths(alphabet: int, extras: list[int]) -> list[int]:
    """Literals at length 9 plus the given extra symbols sharing the
    remaining kraft mass: 256·2⁻⁹ = 1/2, so k extras at length
    ceil(log2(k)) + 1 complete the tree when k is a power of two."""
    k = len(extras)
    assert k & (k - 1) == 0, "extras must be a power of two"
    ln = k.bit_length()  # k = 2^(ln-1) -> length ln completes 1/2
    lengths = [0] * alphabet
    for s in range(256):
        lengths[s] = 9
    for s in extras:
        lengths[s] = ln
    return lengths


def test_lz77_raw_distance():
    """Literal A, literal B, then a length-6 copy at raw distance 2
    (dist_code 122) -> ABABABAB over a 2x4 image."""
    w, h = 4, 2
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no meta
    bw.write(0, 1)  # no cache
    # green: literals + length code 3 (copy length 4? no: value 6 ->
    # code 4 with 1 extra bit) — include length codes 256..259
    green_lengths = _balanced_green_lengths(
        256 + NUM_LENGTH_CODES, [256 + c for c in range(8)]
    )
    dist_lengths = [0] * 40
    # raw distance 2 -> mapped code 122 -> dist prefix code 13 (values
    # 97..128); give codes 10..13 length 2 (a complete 4-leaf tree)
    for sym in (10, 11, 12, 13):
        dist_lengths[sym] = 2
    green_codes, rb_codes, dist_codes = _group_codes(
        bw, green_lengths, dist_lengths
    )
    _emit_literal(bw, green_codes, rb_codes, 10, 20, 30)  # A
    _emit_literal(bw, green_codes, rb_codes, 40, 50, 60)  # B
    # length 6: prefix value 6 = code 4 + 1 extra bit (offset 4, v=lo+1)
    length_codes = {c: green_codes[256 + c] for c in range(8)}
    emit_prefix_value(bw, length_codes, 6)
    emit_prefix_value(bw, dist_codes, 122)  # raw distance 2
    img = decode_vp8l(bw.tobytes())
    A, B = [10, 20, 30], [40, 50, 60]  # (r, g, b) channels
    expect = np.array([[A, B, A, B], [A, B, A, B]], np.uint8)
    assert (img == expect).all()


def test_lz77_plane_code_row_copy():
    """Plane code 1 is (dx=0, dy=1) -> distance w: copying with it
    replicates the row above."""
    w, h = 3, 3
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    green_lengths = _balanced_green_lengths(
        256 + NUM_LENGTH_CODES, [256 + c for c in range(8)]
    )
    dist_lengths = [0] * 40
    dist_lengths[0] = 1  # prefix value 1 -> mapped code 1 -> (0, 1)
    dist_lengths[1] = 1
    green_codes, rb_codes, dist_codes = _group_codes(
        bw, green_lengths, dist_lengths
    )
    row = [(5, 15, 25), (35, 45, 55), (65, 75, 85)]
    for r, g, b in row:
        _emit_literal(bw, green_codes, rb_codes, r, g, b)
    length_codes = {c: green_codes[256 + c] for c in range(8)}
    emit_prefix_value(bw, length_codes, 6)  # two more rows
    emit_prefix_value(bw, dist_codes, 1)  # plane code 1
    img = decode_vp8l(bw.tobytes())
    exp_row = np.array([[5, 15, 25], [35, 45, 55], [65, 75, 85]], np.uint8)
    assert (img == np.stack([exp_row] * 3)).all()


def test_color_cache_hit():
    """Literal P, literal Q, then a cache reference resolving back to P."""
    w, h = 3, 1
    cache_bits = 4
    P = (0xFF << 24) | (20 << 16) | (10 << 8) | 30
    Q = (0xFF << 24) | (50 << 16) | (40 << 8) | 60
    kP, kQ = _cache_key(P, cache_bits), _cache_key(Q, cache_bits)
    assert kP != kQ  # chosen not to collide
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no meta
    bw.write(1, 1)  # color cache
    bw.write(cache_bits, 4)
    cache_size = 1 << cache_bits
    alphabet = 256 + NUM_LENGTH_CODES + cache_size
    cache_sym = 256 + NUM_LENGTH_CODES + kP
    green_lengths = _balanced_green_lengths(alphabet, [cache_sym, 257])
    green_codes, rb_codes, _ = _group_codes(bw, green_lengths)
    _emit_literal(bw, green_codes, rb_codes, 20, 10, 30)  # P
    _emit_literal(bw, green_codes, rb_codes, 50, 40, 60)  # Q
    c, n = green_codes[cache_sym]
    bw.write_code(c, n)
    img = decode_vp8l(bw.tobytes())
    expect = np.array([[[20, 10, 30], [50, 40, 60], [20, 10, 30]]], np.uint8)
    assert (img == expect).all()


def _predictor_stream(w, h, mode, residuals):
    """Build a stream with a single predictor block of the given mode
    over literal residuals (a, r, g, b) = (0, dr, dg, db)."""
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # predictor transform
    bw.write(7 - 2, 3)  # size_bits 7: one 128-px block covers the image
    # sub-image 1x1: literal pixel with green = mode
    bw.write(0, 1)  # no cache (sub-image)
    sub_green = _balanced_green_lengths(256 + NUM_LENGTH_CODES, [256, 257])
    sg_codes, srb_codes, _ = _group_codes(bw, sub_green)
    _emit_literal(bw, sg_codes, srb_codes, 0, mode, 0)
    bw.write(0, 1)  # end of transforms
    bw.write(0, 1)  # no meta
    bw.write(0, 1)  # no cache
    green_lengths = _balanced_green_lengths(256 + NUM_LENGTH_CODES, [256, 257])
    g_codes, rb_codes, _ = _group_codes(bw, green_lengths)
    for dr, dg, db in residuals:
        _emit_literal(bw, g_codes, rb_codes, dr, dg, db)
    return bw.tobytes()


def test_predictor_left_mode():
    """Mode 1 (left): row pixels accumulate residuals; first pixel of
    the image adds to the 0xff000000 black seed."""
    w, h = 3, 1
    residuals = [(10, 20, 30), (1, 2, 3), (5, 5, 5)]
    img = decode_vp8l(_predictor_stream(w, h, 1, residuals))
    expect = np.array(
        [[[10, 20, 30], [11, 22, 33], [16, 27, 38]]], np.uint8
    )
    assert (img == expect).all()


def test_predictor_top_mode():
    w, h = 2, 2
    residuals = [(9, 8, 7), (1, 1, 1), (100, 100, 100), (2, 2, 2)]
    img = decode_vp8l(_predictor_stream(w, h, 2, residuals))
    # row 0: (0,0) black seed + res; (0,1) left + res (first-row rule)
    # row 1: top + res
    expect = np.array(
        [
            [[9, 8, 7], [10, 9, 8]],
            [[109, 108, 107], [12, 11, 10]],
        ],
        np.uint8,
    )
    assert (img == expect).all()


def test_predictor_top_right_wraps_linearly():
    """Mode 3 (top-right): for the last column the linear-array
    addressing reaches the CURRENT row's first pixel (spec rule)."""
    w, h = 3, 2
    residuals = [
        (10, 10, 10), (20, 20, 20), (30, 30, 30),
        (1, 1, 1),    (2, 2, 2),    (3, 3, 3),
    ]
    img = decode_vp8l(_predictor_stream(w, h, 3, residuals))
    # row 1: (0,1) first-col rule -> top; (1,1) TR=(2,0); (2,1) TR wraps
    # to linear index i-w+1 = pixel (0,1) of the CURRENT row
    expect = np.array(
        [
            [[10, 10, 10], [30, 30, 30], [60, 60, 60]],
            [[11, 11, 11], [62, 62, 62], [14, 14, 14]],
        ],
        np.uint8,
    )
    assert (img == expect).all()


def test_predictor_clamp_add_subtract_full():
    """Mode 12: clamp(L + T - TL) per channel, saturating at 0/255."""
    w, h = 2, 2
    residuals = [(200, 0, 0), (250, 0, 0), (10, 0, 0), (0, 3, 0)]
    img = decode_vp8l(_predictor_stream(w, h, 12, residuals))
    # (0,0)=200; (1,0)=200+250=450 -> 194 (mod 256 add, no clamp on
    # residual add); (0,1)=210; (1,1): pred r = clamp(210+194-200)=204
    # -> 204 + 0 = 204; green pred clamp(0+0-0)=0 -> 3
    r00, r10 = 200, (200 + 250) & 0xFF
    r01 = (r00 + 10) & 0xFF
    pred_r = max(0, min(255, r01 + r10 - r00))
    assert img[1, 1, 0] == (pred_r + 0) & 0xFF
    assert img[1, 1, 1] == 3


def test_color_indexing_bundled():
    """4-color palette -> width_bits 2 (four 2-bit indices per packed
    green byte); palette entries are delta-coded."""
    w, h = 7, 2  # packed width ceil(7/4) = 2
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 7, 7)]
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(3, 2)  # color indexing
    bw.write(len(colors) - 1, 8)
    # palette image 4x1, delta-coded literals
    bw.write(0, 1)  # no cache
    pal_green = _balanced_green_lengths(256 + NUM_LENGTH_CODES, [256, 257])
    pg_codes, prb_codes, _ = _group_codes(bw, pal_green)
    prev = (0, 0, 0)
    for c in colors:
        dr = (c[0] - prev[0]) & 0xFF
        dg = (c[1] - prev[1]) & 0xFF
        db = (c[2] - prev[2]) & 0xFF
        _emit_literal(bw, pg_codes, prb_codes, dr, dg, db)
        prev = c
    bw.write(0, 1)  # end of transforms
    bw.write(0, 1)  # no meta
    bw.write(0, 1)  # no cache
    main_green = _balanced_green_lengths(256 + NUM_LENGTH_CODES, [256, 257])
    mg_codes, mrb_codes, _ = _group_codes(bw, main_green)
    # indices row-major: row0 = 0,1,2,3,0,1,2 ; row1 = 3,2,1,0,3,2,1
    rows = [[0, 1, 2, 3, 0, 1, 2], [3, 2, 1, 0, 3, 2, 1]]
    for row in rows:
        packed = [0, 0]
        for x, idx in enumerate(row):
            packed[x >> 2] |= idx << ((x % 4) * 2)
        for p in packed:
            _emit_literal(bw, mg_codes, mrb_codes, 0, p, 0)
    img = decode_vp8l(bw.tobytes())
    expect = np.array(
        [[colors[i] for i in row] for row in rows], np.uint8
    )
    assert (img == expect).all()


def test_meta_prefix_groups():
    """Two meta groups: the left 2-px-wide block decodes through group
    0 (normal literals), the right through group 1 whose codes are all
    single-symbol -> constant color at zero bits per pixel."""
    w, h = 8, 1  # meta_bits 2 -> 4-px blocks -> entropy image 2x1
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)
    bw.write(1, 1)  # meta
    bw.write(0, 3)  # meta_bits = 2 -> 4-px blocks -> entropy image 2x1
    # entropy image pixels: (r<<8 | g) = group id -> (0,0,*), (0,1,*)
    bw.write(0, 1)  # no cache (entropy image)
    ent_green = _balanced_green_lengths(256 + NUM_LENGTH_CODES, [256, 257])
    eg_codes, erb_codes, _ = _group_codes(bw, ent_green)
    _emit_literal(bw, eg_codes, erb_codes, 0, 0, 0)  # group 0
    _emit_literal(bw, eg_codes, erb_codes, 0, 1, 0)  # group 1
    bw.write(0, 1)  # no cache (main image)
    # group 0: normal literal codes
    g0_green = _balanced_green_lengths(256 + NUM_LENGTH_CODES, [256, 257])
    g0_codes, g0_rb, _ = _group_codes(bw, g0_green)
    # group 1: all single-symbol codes -> constant (a=255, r=1, g=2, b=3)
    for sym in (2, 1, 3, 255):  # green, red, blue, alpha
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(sym, 8)
    bw.write(1, 1)  # distance: simple single symbol 0
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    for i in range(4):  # group-0 pixels (x < 4)
        _emit_literal(bw, g0_codes, g0_rb, 10 + i, 20 + i, 30 + i)
    # group-1 pixels cost zero bits each
    img = decode_vp8l(bw.tobytes())
    left = [[10 + i, 20 + i, 30 + i] for i in range(4)]
    right = [[1, 2, 3]] * 4
    assert (img == np.array([left + right], np.uint8)).all()


def test_simple_two_symbol_green_code():
    """A 2-symbol simple green code: 1 bit per pixel."""
    w, h = 4, 1
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # green: simple, two symbols (10, 200)
    bw.write(1, 1)  # simple
    bw.write(1, 1)  # two symbols
    bw.write(1, 1)  # 8-bit first
    bw.write(10, 8)
    bw.write(200, 8)
    rb = [8] * 256
    write_prefix_code(bw, rb)
    write_prefix_code(bw, rb)
    for sym in (255,):  # alpha single
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(sym, 8)
    bw.write(1, 1)  # distance single
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    rb_codes = canonical_lengths_to_codes(rb)
    # canonical over {10: len1, 200: len1}: 10 -> 0, 200 -> 1
    for bit, g in ((0, 10), (1, 200), (1, 200), (0, 10)):
        bw.write(bit, 1)
        c, n = rb_codes[77]
        bw.write_code(c, n)
        c, n = rb_codes[88]
        bw.write_code(c, n)
    img = decode_vp8l(bw.tobytes())
    assert (img[..., 1] == [10, 200, 200, 10]).all()
    assert (img[..., 0] == 77).all() and (img[..., 2] == 88).all()


# ---------------------------------------------------------------------------
# guards and malformed-input fuzz
# ---------------------------------------------------------------------------


def test_max_pixels_guard():
    bw = BitWriter()
    _header(bw, 1 << 14, 1 << 14)  # 256 MP
    with pytest.raises(UnsupportedMediaError, match="MAX_PIXELS"):
        decode_vp8l(bw.tobytes())


def test_truncation_raises_contract():
    img = np.arange(6 * 6 * 3, dtype=np.uint8).reshape(6, 6, 3)
    payload = encode_webp_lossless(img)
    for cut in (13, 20, 25, len(payload) // 2, len(payload) - 2):
        with pytest.raises(UnsupportedMediaError):
            decode_webp_lossless(payload[:cut])


def test_bitflip_fuzz_one_exception_contract():
    """Random single-byte corruptions either decode to SOME image or
    raise UnsupportedMediaError — never any other exception."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (8, 9, 3), np.uint8)
    payload = bytearray(encode_webp_lossless(img))
    for _ in range(200):
        i = int(rng.integers(12, len(payload)))
        old = payload[i]
        payload[i] = int(rng.integers(0, 256))
        try:
            out = decode_webp_lossless(bytes(payload))
            assert out.dtype == np.uint8 and out.ndim == 3
        except UnsupportedMediaError:
            pass
        payload[i] = old


# ---------------------------------------------------------------------------
# animated WebP (VP8X + ANIM/ANMF, r14 continuation)
# ---------------------------------------------------------------------------


def _rgb(h, w, seed):
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    return np.stack(
        [
            ((r * 3 + c * 5 + seed) % 251).astype(np.uint8),
            ((r * 7 + c * 2 + 2 * seed) % 241).astype(np.uint8),
            ((r + c * 11 + 3 * seed) % 239).astype(np.uint8),
        ],
        axis=2,
    )


def test_webp_anim_round_trip_and_composition():
    from processor_edf_spark.operators.webp import (
        compose_webp_anim,
        decode_webp_anim,
        encode_webp_anim,
    )

    f0 = _rgb(24, 32, 1)
    f1 = _rgb(10, 12, 2)
    f2 = _rgb(8, 8, 3)
    frames = [
        (0, 0, 100, False, f0),
        (4, 6, 50, True, f1),   # dispose-to-background after showing
        (20, 2, 75, False, f2),
    ]
    payload = encode_webp_anim(frames, 32, 24, background=(9, 8, 7),
                               loop=3)
    cw, ch, loop, bg, got = decode_webp_anim(payload)
    assert (cw, ch, loop, bg) == (32, 24, 3, (9, 8, 7))
    assert len(got) == 3
    for (fx, fy, dur, disp, rgb), (ex, ey, ed, edisp, erg) in zip(
        got, frames
    ):
        assert (fx, fy, dur, disp) == (ex, ey, ed, edisp)
        assert np.array_equal(rgb, erg)
    # composition state machine, recomputed independently
    loop2, canvases = compose_webp_anim(payload)
    assert loop2 == 3
    exp = np.empty((24, 32, 3), np.uint8)
    exp[:] = (9, 8, 7)
    exp[0:24, 0:32] = f0
    want0 = exp.copy()
    exp1 = exp.copy()
    exp1[6:16, 4:16] = f1
    want1 = exp1.copy()
    exp2 = exp.copy()  # frame 1 disposed back to background...
    exp2[6:16, 4:16] = (9, 8, 7)
    exp2[2:10, 20:28] = f2
    want2 = exp2.copy()
    assert np.array_equal(canvases[0], want0)
    assert np.array_equal(canvases[1], want1)
    assert np.array_equal(canvases[2], want2)


def test_webp_anim_lossy_frame_decodes():
    """A hand-built ANMF wrapping a real VP8 keyframe decodes through
    the animation path bit-exact vs the encoder reconstruction."""
    import struct as _struct

    from processor_edf_spark.operators.vp8 import (
        decode_vp8_keyframe,
        encode_vp8_keyframe,
    )
    from processor_edf_spark.operators.webp import decode_webp_anim

    W, H = 32, 16
    r = np.arange(H)[:, None]
    c = np.arange(W)[None, :]
    y = (((r * 3 + c * 5) % 160) + 40).astype(np.uint8)
    u = (((r[: H // 2] * 7 + c[:, : W // 2] * 11) % 100) + 78).astype(
        np.uint8
    )
    v = (((r[: H // 2] * 5 + c[:, : W // 2] * 3) % 120) + 60).astype(
        np.uint8
    )
    frame, (rY, rU, rV) = encode_vp8_keyframe(y, u, v, qi=30)
    sub = b"VP8 " + _struct.pack("<I", len(frame)) + frame
    if len(frame) & 1:
        sub += b"\x00"
    anmf = (
        (0).to_bytes(3, "little") * 2
        + (W - 1).to_bytes(3, "little")
        + (H - 1).to_bytes(3, "little")
        + (40).to_bytes(3, "little")
        + b"\x00"
        + sub
    )
    vp8x = bytes([0x02, 0, 0, 0]) + (
        (W - 1).to_bytes(3, "little") + (H - 1).to_bytes(3, "little")
    )
    anim = bytes([0, 0, 0, 255]) + (0).to_bytes(2, "little")
    body = b"VP8X" + _struct.pack("<I", len(vp8x)) + vp8x
    body += b"ANIM" + _struct.pack("<I", len(anim)) + anim
    body += b"ANMF" + _struct.pack("<I", len(anmf)) + anmf
    if len(anmf) & 1:
        body += b"\x00"
    payload = (
        b"RIFF" + _struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    )
    _cw, _ch, _loop, _bg, frames = decode_webp_anim(payload)
    rgb = frames[0][4]
    _w2, _h2, exp = decode_vp8_keyframe(frame)
    assert np.array_equal(rgb, exp)


def test_webp_anim_guards_and_first_frame_route():
    from processor_edf_spark.operators.media_codecs import decode_image
    from processor_edf_spark.operators.webp import (
        encode_webp_anim,
    )

    f0 = _rgb(8, 8, 5)
    with pytest.raises(UnsupportedMediaError, match="even"):
        encode_webp_anim([(1, 0, 10, False, f0)], 16, 16)
    with pytest.raises(UnsupportedMediaError, match="canvas"):
        encode_webp_anim([(12, 12, 10, False, f0)], 16, 16)
    payload = encode_webp_anim(
        [(0, 0, 10, False, f0), (2, 2, 10, False, _rgb(4, 4, 6))],
        8, 8, background=(1, 2, 3),
    )
    # decode_image on an animated file returns the FIRST composed frame
    img = decode_image(payload)
    assert img.shape == (8, 8, 3)
    assert np.array_equal(img, f0)


def test_webp_anim_corruption_fuzz_never_escapes():
    from processor_edf_spark.operators.webp import (
        compose_webp_anim,
        encode_webp_anim,
    )

    payload = encode_webp_anim(
        [(0, 0, 10, True, _rgb(16, 16, 7)), (4, 2, 10, False, _rgb(6, 8, 8))],
        16, 16,
    )
    data = bytearray(payload)
    rng = np.random.default_rng(23)
    for _ in range(200):
        i = int(rng.integers(12, len(data)))
        old = data[i]
        data[i] ^= 1 << int(rng.integers(0, 8))
        try:
            compose_webp_anim(bytes(data))
        except UnsupportedMediaError:
            pass
        data[i] = old
