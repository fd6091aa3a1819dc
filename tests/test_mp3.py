"""Pure-python MPEG-1 Layer III decoder (operators/mp3.py).

Strategy mirrors the sibling codecs (test_flac.py / test_h264_cavlc.py):
round-trip property tests through the fixture encoder (real conformant
frames over the transcribed Huffman subset), hand-built streams for the
paths the encoder doesn't emit (bit reservoir, scfsi sharing), Huffman
table structure property checks, and the one-exception fuzz contract.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from processor_edf_spark.operators.media_codecs import (
    UnsupportedMediaError,
    decode_audio,
)
from processor_edf_spark.operators.mp3 import (
    _BIG_TABLES,
    _Granule,
    _reorder_short,
    _SFB_LONG,
    _SFB_SHORT,
    _SLEN,
    decode_mp3_frames,
    decode_mp3_py,
    encode_mp3_frames,
)


def _gran(seed: int, n_lines: int = 40, **kw) -> dict:
    ix = np.zeros(576, dtype=np.int64)
    for k in range(n_lines):
        ix[k] = ((seed + 3 * k) % 3) - 1
    d = {"ix": ix, "big_values_lines": 32, "count1_quads": (n_lines - 32) // 4,
         "global_gain": 210}
    d.update(kw)
    return d


def _stream(frames, **kw) -> bytes:
    return encode_mp3_frames(frames, **kw)


# ---------------------------------------------------------------------------
# round trips: spectral lines recovered exactly
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("rate", [44100, 48000, 32000])
@pytest.mark.parametrize("bitrate", [96, 128, 192])
def test_mono_long_block_round_trip(rate, bitrate):
    frames = [[[_gran(f * 2 + g)] for g in range(2)] for f in range(3)]
    out = decode_mp3_frames(_stream(frames, rate=rate, n_channels=1,
                                    bitrate_kbps=bitrate))
    assert len(out) == 3
    for f, (hdr, spectra, pcm) in enumerate(out):
        assert hdr["rate"] == rate and hdr["n_channels"] == 1
        assert pcm.shape == (1152, 1) and np.isfinite(pcm).all()
        for g in range(2):
            assert np.array_equal(spectra[g, 0],
                                  frames[f][g][0]["ix"].astype(float))


def test_stereo_lr_round_trip():
    frames = [[[_gran(1 + g), _gran(5 + g)] for g in range(2)]]
    out = decode_mp3_frames(_stream(frames, rate=48000, n_channels=2,
                                    bitrate_kbps=160))
    (hdr, spectra, pcm) = out[0]
    assert pcm.shape == (1152, 2)
    for g in range(2):
        for c in range(2):
            assert np.array_equal(spectra[g, c],
                                  frames[0][g][c]["ix"].astype(float))


def test_ms_stereo_round_trip():
    m, s = _gran(3), _gran(6)
    frames = [[[m, s], [_gran(8), _gran(9)]]]
    out = decode_mp3_frames(_stream(frames, rate=44100, n_channels=2,
                                    bitrate_kbps=192, mode_ext=2))
    spectra = out[0][1]
    inv = 1.0 / np.sqrt(2.0)
    assert np.array_equal(spectra[0, 0], (m["ix"] + s["ix"]) * inv)
    assert np.array_equal(spectra[0, 1], (m["ix"] - s["ix"]) * inv)


def test_global_gain_is_exact_powers_of_two():
    # gain steps of 4 are exact factor-2 scalings of the +-1 lines
    frames = [[[_gran(5, global_gain=214)], [_gran(5, global_gain=206)]]]
    out = decode_mp3_frames(_stream(frames, rate=32000, n_channels=1,
                                    bitrate_kbps=96))
    assert np.array_equal(out[0][1][0, 0], frames[0][0][0]["ix"] * 2.0)
    assert np.array_equal(out[0][1][1, 0], frames[0][1][0]["ix"] * 0.5)


def test_short_blocks_round_trip_with_subblock_gain():
    frames = [[[_gran(4, block_type=2)],
               [_gran(7, block_type=2, subblock_gain=(0, 1, 2))]]]
    out = decode_mp3_frames(_stream(frames, rate=48000, n_channels=1,
                                    bitrate_kbps=160))
    g = _Granule()
    g.window_switching, g.block_type, g.mixed_block = 1, 2, 0
    exp0 = _reorder_short(frames[0][0][0]["ix"].astype(float), g, 48000)
    assert np.array_equal(out[0][1][0, 0], exp0)
    # subblock_gain scales window w by 2^(-2*sbg) BEFORE reorder
    bounds = _SFB_SHORT[48000]
    exp1 = frames[0][1][0]["ix"].astype(float)
    for b in range(13):
        width = bounds[b + 1] - bounds[b]
        base = 3 * bounds[b]
        for w, sbg in enumerate((0, 1, 2)):
            exp1[base + w * width: base + (w + 1) * width] *= 2.0 ** (-2 * sbg)
    assert np.array_equal(out[0][1][1, 0], _reorder_short(exp1, g, 48000))


def test_short_reorder_hand_case():
    """Pin the reorder convention on the first 48k band (width 4):
    bitstream [w0:a b c d | w1:e f g h | w2:i j k l] ->
    frequency-major interleave [a e i b f j c g k d h l]."""
    g = _Granule()
    g.window_switching, g.block_type, g.mixed_block = 1, 2, 0
    xr = np.zeros(576)
    xr[:12] = np.arange(1, 13)
    out = _reorder_short(xr, g, 48000)
    assert list(out[:12]) == [1, 5, 9, 2, 6, 10, 3, 7, 11, 4, 8, 12]


def test_scalefactors_and_preflag_round_trip():
    # scalefac_scale=1 -> multiplier 2^(-sf) exact powers of two
    sf = [0, 1, 2, 3, 0, 1, 2, 3, 0, 1, 2, 0, 1, 2, 3, 0, 1, 2, 3, 0, 1, 0]
    frames = [[[_gran(2, scalefac_compress=10, long_sf=sf,
                      scalefac_scale=1)],
               [_gran(3)]]]
    out = decode_mp3_frames(_stream(frames, rate=44100, n_channels=1,
                                    bitrate_kbps=128))
    bounds = _SFB_LONG[44100]
    exp = frames[0][0][0]["ix"].astype(float)
    for b in range(22):
        exp[bounds[b]: bounds[b + 1]] *= 2.0 ** (-sf[b])
    assert np.array_equal(out[0][1][0, 0], exp)


def test_scfsi_shares_granule0_scalefactors():
    """scfsi group flags: granule 1 omits those groups' bits and the
    decoder must reuse granule 0's values."""
    sf = [1, 2, 3, 1, 2, 3, 1, 2, 3, 1, 2, 1, 2, 3, 1, 2, 3, 1, 2, 3, 1, 0]
    scfsi = [[1, 0, 1, 0]]  # groups 0-5 and 11-15 shared
    g0 = _gran(2, scalefac_compress=10, long_sf=sf, scalefac_scale=1,
               scfsi=scfsi)
    # granule 1 transmits only groups 1 and 3; shared groups must DECODE
    # to granule 0's values even though g1's param list differs there
    sf1 = [9, 9, 9, 9, 9, 9, 2, 2, 2, 2, 2, 9, 9, 9, 9, 9, 1, 1, 1, 1, 1, 0]
    g1 = _gran(4, scalefac_compress=10, long_sf=sf1, scalefac_scale=1)
    out = decode_mp3_frames(_stream([[[g0], [g1]]], rate=44100,
                                    n_channels=1, bitrate_kbps=128))
    bounds = _SFB_LONG[44100]
    eff = [sf[b] if (b < 6 or 11 <= b < 16) else sf1[b] for b in range(21)]
    eff.append(0)
    exp = g1["ix"].astype(float)
    for b in range(22):
        exp[bounds[b]: bounds[b + 1]] *= 2.0 ** (-eff[b])
    assert np.array_equal(out[0][1][1, 0], exp)


# ---------------------------------------------------------------------------
# bit reservoir: hand-moved main data across frames
# ---------------------------------------------------------------------------


def test_bit_reservoir_back_reference():
    frames = [[[_gran(1)], [_gran(2)]], [[_gran(3)], [_gran(4)]]]
    base = bytearray(_stream(frames, rate=44100, n_channels=1,
                             bitrate_kbps=128))
    flen = 144 * 128000 // 44100
    assert len(base) == 2 * flen
    ref = decode_mp3_frames(bytes(base))
    # move the first N bytes of frame 2's main data into frame 1's
    # zero-padding tail and set frame 2's main_data_begin = N
    n = 23
    f2_main_start = flen + 4 + 17
    moved = bytes(base[f2_main_start: f2_main_start + n])
    assert base[flen - n:flen] == b"\x00" * n  # padding must be free
    base[flen - n:flen] = moved
    rest = bytes(base[f2_main_start + n: 2 * flen])
    base[f2_main_start: f2_main_start + len(rest)] = rest
    base[f2_main_start + len(rest): 2 * flen] = b"\x00" * n
    # main_data_begin is the first 9 bits after frame 2's header
    side0 = base[flen + 4]
    side1 = base[flen + 5]
    assert side0 == 0 and side1 & 0x80 == 0  # was zero
    base[flen + 4] = n >> 1
    base[flen + 5] = ((n & 1) << 7) | side1
    got = decode_mp3_frames(bytes(base))
    assert len(got) == 2
    for (h_a, s_a, p_a), (h_b, s_b, p_b) in zip(ref, got):
        assert np.array_equal(s_a, s_b)
        assert np.array_equal(p_a, p_b)


def test_reservoir_reference_before_stream_start_skips_frame():
    frames = [[[_gran(1)], [_gran(2)]]]
    base = bytearray(_stream(frames, rate=44100, n_channels=1,
                             bitrate_kbps=128))
    base[4] = 1  # main_data_begin = 2 on the FIRST frame: nothing behind
    with pytest.raises(UnsupportedMediaError):
        decode_mp3_frames(bytes(base))


# ---------------------------------------------------------------------------
# container framing
# ---------------------------------------------------------------------------


def test_id3v2_and_id3v1_wrappers_are_skipped():
    frames = [[[_gran(1)], [_gran(2)]]]
    core = _stream(frames, rate=44100, n_channels=1, bitrate_kbps=128)
    tag_body = b"\x00" * 70
    id3v2 = b"ID3\x04\x00\x00" + bytes(
        [(len(tag_body) >> 21) & 0x7F, (len(tag_body) >> 14) & 0x7F,
         (len(tag_body) >> 7) & 0x7F, len(tag_body) & 0x7F]
    ) + tag_body
    id3v1 = b"TAG" + b"\x00" * 125
    rate, nch, pcm = decode_mp3_py(id3v2 + core + id3v1)
    assert (rate, nch, pcm.shape) == (44100, 1, (1152, 1))


def test_truncated_final_frame_decodes_complete_frames_only():
    frames = [[[_gran(1)], [_gran(2)]], [[_gran(3)], [_gran(4)]]]
    payload = _stream(frames, rate=44100, n_channels=1, bitrate_kbps=128)
    out = decode_mp3_frames(payload[: len(payload) - 40])
    assert len(out) == 1


def test_trailing_garbage_after_frames_is_tolerated():
    frames = [[[_gran(1)], [_gran(2)]]]
    payload = _stream(frames, rate=44100, n_channels=1, bitrate_kbps=128)
    out = decode_mp3_frames(payload + b"not a frame header at all")
    assert len(out) == 1


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b[:1] + b"\x00" + b[2:], "sync"),          # kill sync
        (lambda b: b[:1] + bytes([(b[1] & ~0x18) | 0x08]) + b[2:],
         "reserved version"),
        (lambda b: b[:2] + bytes([b[2] & 0x0F]) + b[3:], "free-format"),
    ],
)
def test_unsupported_header_variants_raise(mutate, msg):
    payload = _stream([[[_gran(1)], [_gran(2)]]], rate=44100,
                      n_channels=1, bitrate_kbps=128)
    with pytest.raises(UnsupportedMediaError, match=msg):
        decode_mp3_frames(mutate(payload))


def test_untranscribed_huffman_table_names_the_seam():
    payload = bytearray(_stream([[[_gran(1)], [_gran(2)]]], rate=44100,
                                n_channels=1, bitrate_kbps=128))
    # side info granule 0: table_select starts after
    # 9+5+4 + 12+9+8+4+1 = 52 bits; set select 0 to table 16 (10000)
    bitpos = (4 + 0) * 8 + 52
    for i, bit in enumerate((1, 0, 0, 0, 0)):
        byte, off = divmod(bitpos + i, 8)
        if bit:
            payload[byte] |= 0x80 >> off
        else:
            payload[byte] &= ~(0x80 >> off)
    with pytest.raises(UnsupportedMediaError, match="not transcribed"):
        decode_mp3_frames(bytes(payload))


def test_decode_audio_routes_mp3_through_pure_path():
    payload = _stream([[[_gran(1)], [_gran(2)]]], rate=44100,
                      n_channels=1, bitrate_kbps=128)
    rate, nch, pcm = decode_audio(payload)
    assert (rate, nch) == (44100, 1)
    assert pcm.shape == (1152, 1)


# ---------------------------------------------------------------------------
# Huffman table structure properties
# ---------------------------------------------------------------------------


def test_big_tables_prefix_free_and_kraft_complete():
    for sel, table in _BIG_TABLES.items():
        codes = list(table.keys())
        # prefix-free: no code is a prefix of another
        for la, ca in codes:
            for lb, cb in codes:
                if (la, ca) != (lb, cb) and la <= lb:
                    assert (cb >> (lb - la)) != ca, (sel, ca, cb)
        # complete: Kraft sum exactly 1 (spec big-value tables are
        # complete prefix codes)
        assert sum(2 ** -l for l, _ in codes) == 1.0
        # every (x, y) pair within the table's value range exactly once
        assert sorted(table.values()) == sorted(
            (x, y) for x in range(2) for y in range(2)
        )


def test_count1_table_b_is_the_4bit_complement_code():
    from processor_edf_spark.operators.flac import MSBBitReader
    from processor_edf_spark.operators.mp3 import _read_count1_quad

    seen = set()
    for bits in range(16):
        r = MSBBitReader(bytes([bits << 4]))
        quad = _read_count1_quad(r, 1)
        i = 15 - bits
        assert quad == ((i >> 3) & 1, (i >> 2) & 1, (i >> 1) & 1, i & 1)
        seen.add(quad)
    assert len(seen) == 16


def test_slen_table_covers_all_compress_values():
    assert len(_SLEN) == 16
    assert _SLEN[0] == (0, 0) and _SLEN[15] == (4, 3)


def test_sfb_tables_are_monotone_and_bounded():
    for rate, bounds in _SFB_LONG.items():
        assert len(bounds) == 23 and bounds[0] == 0 and bounds[-1] == 576
        assert all(a < b for a, b in zip(bounds, bounds[1:]))
    for rate, bounds in _SFB_SHORT.items():
        assert len(bounds) == 14 and bounds[0] == 0 and bounds[-1] == 192
        assert all(a < b for a, b in zip(bounds, bounds[1:]))


# ---------------------------------------------------------------------------
# PCM sanity (the derived-prototype synthesis)
# ---------------------------------------------------------------------------


def test_pcm_is_deterministic_and_bounded():
    frames = [[[_gran(9)], [_gran(11)]]]
    payload = _stream(frames, rate=44100, n_channels=1, bitrate_kbps=128)
    _, _, a = decode_mp3_py(payload)
    _, _, b = decode_mp3_py(payload)
    assert np.array_equal(a, b)
    assert np.isfinite(a).all() and np.abs(a).max() < 100.0
    assert np.abs(a).max() > 0.0  # nonzero spectra produce nonzero audio


def test_silence_decodes_to_silence():
    z = {"ix": np.zeros(576, dtype=np.int64), "big_values_lines": 0,
         "count1_quads": 0, "global_gain": 210}
    payload = _stream([[[z], [z]]], rate=44100, n_channels=1,
                      bitrate_kbps=128)
    _, _, pcm = decode_mp3_py(payload)
    assert np.abs(pcm).max() == 0.0


# ---------------------------------------------------------------------------
# one-exception fuzz contract
# ---------------------------------------------------------------------------

_GOOD = encode_mp3_frames([[[_gran(1)], [_gran(2)]]], rate=44100,
                          n_channels=1, bitrate_kbps=128)


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=150, deadline=None)
def test_random_bytes_never_escape(data):
    for prefix in (b"", b"\xff\xfb", b"ID3"):
        try:
            decode_mp3_py(prefix + data)
        except UnsupportedMediaError:
            pass


@given(st.integers(min_value=0, max_value=10_000), st.integers(0, 7))
@settings(max_examples=200, deadline=None)
def test_bitflip_never_escapes(pos, bit):
    payload = bytearray(_GOOD)
    payload[pos % len(payload)] ^= 1 << bit
    try:
        decode_mp3_py(bytes(payload))
    except UnsupportedMediaError:
        pass


@given(st.integers(min_value=1, max_value=len(_GOOD)))
@settings(max_examples=100, deadline=None)
def test_truncation_never_escapes(cut):
    try:
        decode_mp3_py(_GOOD[:-cut])
    except UnsupportedMediaError:
        pass


# ---------------------------------------------------------------------------
# Layer I (r12)
# ---------------------------------------------------------------------------


def _l1_frame(seed: int, nch: int = 1):
    """Sparse random Layer I frame: ~40% of subbands allocated 1-5 bits
    -1 (a real encoder's adaptive shape — dense 14-bit allocation does
    not FIT a frame: 32 subbands x 12 x 15-bit samples is ~6x the
    448 kbps slot budget)."""
    import random as _random

    rng = _random.Random(seed)
    alloc = [[0] * 32 for _ in range(nch)]
    scf = [[0] * 32 for _ in range(nch)]
    codes = [[[0] * 32 for _ in range(nch)] for _ in range(12)]
    for sb in range(32):
        a = rng.randint(1, 5) if rng.random() < 0.4 else 0
        for ch in range(nch):
            alloc[ch][sb] = a
            if a:
                scf[ch][sb] = rng.randint(0, 62)
        if a:
            for s in range(12):
                for ch in range(nch):
                    codes[s][ch][sb] = rng.randrange(1 << (a + 1))
    return {"alloc": alloc, "scf_idx": scf, "codes": codes}


def _l1_expected_subbands(frame, nch, bound=32):
    from processor_edf_spark.operators.mp3 import _SF_TABLE_L1

    S = np.zeros((12, nch, 32))
    for s in range(12):
        for sb in range(32):
            for ch in range(nch):
                src_ch = ch if sb < bound else 0
                a = frame["alloc"][src_ch][sb]
                if not a:
                    continue
                nb = a + 1
                x = frame["codes"][s][src_ch][sb]
                frac = x / float(1 << (nb - 1)) - 1.0
                q = ((1 << nb) / ((1 << nb) - 1.0)) * (frac + 2.0 ** (1 - nb))
                S[s, ch, sb] = q * _SF_TABLE_L1[frame["scf_idx"][ch][sb]]
    return S


@pytest.mark.parametrize("nch", [1, 2])
def test_layer1_round_trip(nch):
    from processor_edf_spark.operators.mp3 import encode_mp3_layer1

    frames = [_l1_frame(7 + f, nch) for f in range(2)]
    payload = encode_mp3_layer1(
        frames, rate=44100, n_channels=nch, bitrate_kbps=448 if nch == 2 else 192
    )
    out = decode_mp3_frames(payload)
    assert len(out) == 2
    for f, (hdr, S, pcm) in enumerate(out):
        assert hdr["layer"] == 1 and hdr["rate"] == 44100
        assert pcm.shape == (384, nch) and np.isfinite(pcm).all()
        exp = _l1_expected_subbands(frames[f], nch)
        assert np.allclose(S, exp, rtol=0, atol=0)  # exact float ops


def test_layer1_joint_stereo_shares_samples_above_bound():
    from processor_edf_spark.operators.mp3 import encode_mp3_layer1

    frame = _l1_frame(3, nch=2)
    mode_ext = 1  # bound = 8
    payload = encode_mp3_layer1(
        [frame], rate=32000, n_channels=2, bitrate_kbps=448,
        mode_ext=mode_ext, joint=True,
    )
    (hdr, S, pcm) = decode_mp3_frames(payload)[0]
    assert hdr["mode"] == 1 and hdr["mode_ext"] == mode_ext
    exp = _l1_expected_subbands(frame, 2, bound=(mode_ext + 1) * 4)
    assert np.allclose(S, exp, rtol=0, atol=0)
    # above the bound both channels decode the channel-0 CODE but keep
    # their own scalefactors
    bound = (mode_ext + 1) * 4
    sb = next(
        s for s in range(bound, 32)
        if frame["alloc"][0][s]
        and frame["scf_idx"][0][s] != frame["scf_idx"][1][s]
    )
    from processor_edf_spark.operators.mp3 import _SF_TABLE_L1

    r = (
        S[0, 0, sb] / _SF_TABLE_L1[frame["scf_idx"][0][sb]],
        S[0, 1, sb] / _SF_TABLE_L1[frame["scf_idx"][1][sb]],
    )
    assert np.isclose(r[0], r[1])


def test_layer1_invalid_allocation_and_scalefactor_raise():
    from processor_edf_spark.operators.mp3 import encode_mp3_layer1

    frame = _l1_frame(5, nch=1)
    payload = bytearray(
        encode_mp3_layer1([frame], rate=44100, n_channels=1,
                          bitrate_kbps=192)
    )
    payload[4] = 0xFF  # first two 4-bit allocations -> 15 (forbidden)
    with pytest.raises(UnsupportedMediaError, match="allocation"):
        decode_mp3_frames(bytes(payload))


def test_layer2_zero_allocation_decodes_silence():
    """Layer II decodes for real (r13): an all-zero-allocation frame is
    valid silence, not a seam raise.  0xFFFD = MPEG-1 Layer II,
    160 kbps stereo at 44.1 kHz -> 522-byte frames."""
    hdr = bytes([0xFF, 0xFD, 0x90, 0x00])
    rate, nch, pcm = decode_mp3_py(hdr + b"\x00" * 518)
    assert (rate, nch) == (44100, 2)
    assert pcm.shape == (1152, 2)
    assert np.abs(pcm).max() == 0.0


def test_layer1_scalefactor_table_closed_form():
    from processor_edf_spark.operators.mp3 import _SF_TABLE_L1

    assert len(_SF_TABLE_L1) == 63
    assert _SF_TABLE_L1[0] == 2.0
    assert np.isclose(_SF_TABLE_L1[3], 1.0)  # 2 * 2^-1
    assert (np.diff(_SF_TABLE_L1) < 0).all()


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=100, deadline=None)
def test_layer1_random_bodies_never_escape(data):
    hdr = bytes([0xFF, 0xFF, 0x90, 0x00])  # Layer I header shape
    try:
        decode_mp3_py(hdr[:2] + bytes([0xF9, 0x00]) + data)
    except UnsupportedMediaError:
        pass


# ---------------------------------------------------------------------------
# property round trip: random spectral fixtures across the whole
# parameter surface must decode spectrally bit-exact
# ---------------------------------------------------------------------------


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    rate=st.sampled_from([44100, 48000, 32000]),
    nch=st.integers(min_value=1, max_value=2),
    gain_step=st.integers(min_value=-3, max_value=3),
    short=st.booleans(),
    n_lines=st.sampled_from([8, 32, 40, 72]),
)
@settings(max_examples=40, deadline=None)
def test_random_spectra_round_trip(seed, rate, nch, gain_step, short, n_lines):
    import random as _random

    rng = _random.Random(seed)
    frames = []
    for _f in range(rng.randint(1, 2)):
        grans = []
        for _g in range(2):
            chans = []
            for _c in range(nch):
                ix = np.zeros(576, dtype=np.int64)
                for k in range(n_lines):
                    ix[k] = rng.randint(-1, 1)
                big = min(n_lines, 32)
                big += big % 2
                quads = max(0, (n_lines - big) // 4)
                d = {
                    "ix": ix,
                    "big_values_lines": big,
                    "count1_quads": quads,
                    "global_gain": 210 + 4 * gain_step,
                }
                if short:
                    d["block_type"] = 2
                    d["subblock_gain"] = (
                        rng.randint(0, 2), rng.randint(0, 2), rng.randint(0, 2)
                    )
                chans.append(d)
            grans.append(chans)
        frames.append(grans)
    payload = encode_mp3_frames(
        frames, rate=rate, n_channels=nch, bitrate_kbps=160
    )
    out = decode_mp3_frames(payload)
    assert len(out) == len(frames)
    scale = 2.0 ** gain_step
    for f, (hdr, spectra, pcm) in enumerate(out):
        assert pcm.shape == (1152, nch) and np.isfinite(pcm).all()
        for g in range(2):
            for c in range(nch):
                src = frames[f][g][c]
                exp = src["ix"].astype(float) * scale
                if short:
                    gg = _Granule()
                    gg.window_switching, gg.block_type, gg.mixed_block = 1, 2, 0
                    sb = src["subblock_gain"]
                    bounds = _SFB_SHORT[rate]
                    for b in range(13):
                        width = bounds[b + 1] - bounds[b]
                        base = 3 * bounds[b]
                        for w in range(3):
                            exp[base + w * width: base + (w + 1) * width] *= (
                                2.0 ** (-2 * sb[w])
                            )
                    exp = _reorder_short(exp, gg, rate)
                assert np.array_equal(spectra[g, c], exp)


# ---------------------------------------------------------------------------
# vectorized synthesis parity + Xing skip (r12)
# ---------------------------------------------------------------------------


@given(st.integers(min_value=0, max_value=5000), st.sampled_from([12, 18, 36]))
@settings(max_examples=25, deadline=None)
def test_synth_block_matches_per_step_reference(seed, T):
    from processor_edf_spark.operators.mp3 import (
        _synth_32,
        _synth_block,
        _SynthState,
    )

    rng = np.random.default_rng(seed)
    S = rng.standard_normal((T, 32))
    st_a, st_b = _SynthState(), _SynthState()
    # warm both FIFOs with identical history
    warm = rng.standard_normal((16, 32))
    for row in warm:
        _synth_32(row, st_a)
    _synth_block(warm, st_b)
    assert np.allclose(st_a.v, st_b.v, rtol=0, atol=1e-12)
    ref = np.concatenate([_synth_32(S[t], st_a) for t in range(T)])
    got = _synth_block(S, st_b)
    # same math, different summation tree: round-off-level agreement
    assert np.allclose(got, ref, rtol=1e-12, atol=1e-12)
    assert np.allclose(st_a.v, st_b.v, rtol=0, atol=1e-12)


def test_xing_info_metadata_frame_is_skipped():
    frames = [[[_gran(1)], [_gran(2)]], [[_gran(3)], [_gran(4)]]]
    base = bytearray(_stream(frames, rate=44100, n_channels=1,
                             bitrate_kbps=128))
    flen = 144 * 128000 // 44100
    # turn frame 1 into a LAME-style Info frame: zero side info, the
    # magic directly after it
    base[4 : 4 + 17] = b"\x00" * 17
    base[4 + 17 : 4 + 21] = b"Info"
    out = decode_mp3_frames(bytes(base))
    assert len(out) == 1  # only the real audio frame decodes
    assert np.array_equal(out[0][1][0, 0],
                          frames[1][0][0]["ix"].astype(float))
    # and a normal first frame is NOT skipped (magic absent)
    assert len(decode_mp3_frames(_stream(frames, rate=44100, n_channels=1,
                                         bitrate_kbps=128))) == 2


def test_mixed_block_round_trip():
    """Mixed blocks (block_type 2 + mixed flag): the first two subbands
    stay LONG (no reorder below line 36, long-window IMDCT) while the
    rest are short — decoded spectra must equal reorder-from-band-3 of
    the coded lines."""
    frames = [[[_gran(5, n_lines=72, big_values_lines=72, count1_quads=0,
                      block_type=2, mixed_block=1)],
               [_gran(6)]]]
    out = decode_mp3_frames(_stream(frames, rate=44100, n_channels=1,
                                    bitrate_kbps=160))
    g = _Granule()
    g.window_switching, g.block_type, g.mixed_block = 1, 2, 1
    exp = _reorder_short(frames[0][0][0]["ix"].astype(float), g, 44100)
    assert np.array_equal(out[0][1][0, 0], exp)
    # the long region (lines < 36) must be byte-identical to the input
    assert np.array_equal(
        out[0][1][0, 0][:36], frames[0][0][0]["ix"][:36].astype(float)
    )
    # and the short region above IS reordered (differs from raw order
    # whenever the coded lines vary within a band)
    assert not np.array_equal(
        out[0][1][0, 0][36:72], frames[0][0][0]["ix"][36:72].astype(float)
    )


# ---------------------------------------------------------------------------
# long-block intensity stereo (r12 third session: bound + MS interaction)
# ---------------------------------------------------------------------------


def _intensity_fixture():
    """Left coded through line 110; right coded through 74 with CODED
    ZEROS in its last band [62, 74) — the strict spec bound (end of
    the transmitted region) starts intensity at 74, while a
    last-nonzero-sample bound would wrongly start it at 62."""
    bounds = _SFB_LONG[44100]
    assert (bounds[11], bounds[12], bounds[14]) == (62, 74, 110)
    right_ix = np.zeros(576, dtype=np.int64)
    for k in range(62):
        right_ix[k] = ((5 + 3 * k) % 3) - 1
    left_ix = np.zeros(576, dtype=np.int64)
    for k in range(110):
        left_ix[k] = ((1 + 3 * k) % 3) - 1
    sf_r = [0] * 22
    sf_r[12] = 2  # legal intensity position (ratio tan(2π/12))
    sf_r[13] = 7  # ILLEGAL position
    left = {"ix": left_ix, "big_values_lines": 110, "count1_quads": 0,
            "global_gain": 210}
    right = {"ix": right_ix, "big_values_lines": 74, "count1_quads": 0,
             "global_gain": 210, "long_sf": sf_r,
             "scalefac_compress": 15}
    return left, right


@pytest.mark.parametrize("mode_ext", [1, 3])
def test_intensity_stereo_bound_and_ms_interaction(mode_ext):
    left, right = _intensity_fixture()
    frames = [[[left, right], [left, right]]]
    out = decode_mp3_frames(_stream(frames, rate=44100, n_channels=2,
                                    bitrate_kbps=192,
                                    mode_ext=mode_ext))
    spectra = out[0][1]
    l_in = left["ix"].astype(float)
    r_in = right["ix"].astype(float)
    exp_l, exp_r = l_in.copy(), r_in.copy()
    inv = 1.0 / np.sqrt(2.0)
    if mode_ext == 3:  # MS strictly below the intensity region [0, 74)
        exp_l[:74] = (l_in[:74] + r_in[:74]) * inv
        exp_r[:74] = (l_in[:74] - r_in[:74]) * inv
    # band 12 [74, 90): legal position 2 -> ratio tan(2*pi/12)
    ratio = np.tan(2 * np.pi / 12.0)
    exp_l[74:90] = l_in[74:90] * (ratio / (1.0 + ratio))
    exp_r[74:90] = l_in[74:90] * (1.0 / (1.0 + ratio))
    # band 13 [90, 110): ILLEGAL position: MS when on, else keep L/R
    if mode_ext == 3:
        exp_l[90:110] = (l_in[90:110] + 0.0) * inv
        exp_r[90:110] = (l_in[90:110] - 0.0) * inv
    for g in range(2):
        assert np.allclose(spectra[g, 0], exp_l, atol=1e-12)
        assert np.allclose(spectra[g, 1], exp_r, atol=1e-12)
        # the coded-zero band [62, 74) inside the right channel's
        # transmitted region is NOT intensity-processed: with
        # intensity-only mode the channels keep their samples
        if mode_ext == 1:
            assert np.array_equal(spectra[g, 0][62:74], l_in[62:74])
            assert np.array_equal(spectra[g, 1][62:74], np.zeros(12))


def test_mid_stream_format_change_vs_junk_tail():
    """A PLAUSIBLE format change mid-stream (a full decodable run of a
    different format whose next offset syncs too) raises; a
    sync-looking junk tail — truncated, or with garbage at its implied
    next offset — ends iteration cleanly (ADVICE r12 plausibility
    check)."""
    from processor_edf_spark.operators.mp3 import encode_mp3_frames

    frames = [[[_gran(1)] for _g in range(2)]]
    good = _stream(frames, rate=44100, n_channels=1, bitrate_kbps=128)
    ix = np.zeros(576, dtype=np.int64)
    ix[:4] = (1, -1, 1, 0)
    lsf = encode_mp3_frames(
        [[[{"ix": ix, "count1_quads": 0, "global_gain": 210}]],
         [[{"ix": ix, "count1_quads": 0, "global_gain": 210}]]],
        rate=22050, bitrate_kbps=64, version=2,
    )
    with pytest.raises(UnsupportedMediaError, match="format change"):
        decode_mp3_frames(good + lsf)
    # sync-looking but TRUNCATED MPEG-2 header at the tail: junk
    out = decode_mp3_frames(good + b"\xff\xf3\x90\x00" + b"\x00" * 40)
    assert len(out) == 1
    # sync-looking header whose implied next offset is garbage: junk
    fb = 72 * 64000 // 22050  # the implied LSF frame length
    tail = b"\xff\xf3\x90\x00" + b"\x12" * (fb - 4) + b"nosync.."
    out = decode_mp3_frames(good + tail)
    assert len(out) == 1
    # plain junk after valid frames still decodes leniently
    out = decode_mp3_frames(good + b"\x12junkjunk\x00\x00")
    assert len(out) == 1


# ---------------------------------------------------------------------------
# r13: MPEG-2/2.5 (LSF) Layer III, Layer II, LSF Layer I
# ---------------------------------------------------------------------------


def _lsf_requant_expected(ix, global_gain=210, long_sf=None,
                          sf_scale=0, preflag=0, rate=22050):
    """Closed-form requantization oracle for long-block LSF granules
    (identical math to the MPEG-1 one — only band edges differ)."""
    from processor_edf_spark.operators.mp3 import _PRETAB, _SFB_LONG

    long_sf = long_sf or [0] * 22
    xr = np.sign(ix) * np.abs(ix).astype(np.float64) ** (4.0 / 3.0)
    bounds = _SFB_LONG[rate]
    mult = 1.0 if sf_scale else 0.5
    for b in range(22):
        gain = (global_gain - 210) / 4.0 - mult * (
            long_sf[b] + preflag * _PRETAB[b]
        )
        xr[bounds[b] : bounds[b + 1]] *= 2.0 ** gain
    return xr


@pytest.mark.parametrize("rate,version", [
    (22050, 2), (24000, 2), (16000, 2), (12000, 25), (8000, 25),
])
def test_lsf_layer3_round_trip_rates(rate, version):
    """One-granule LSF frames decode with spectra EXACT against the
    closed-form requantization across every LSF sampling rate."""
    ix = np.zeros(576, dtype=np.int64)
    ix[:36] = [((7 + 3 * k) % 3) - 1 for k in range(36)]
    fr = [[{"ix": ix, "big_values_lines": 24, "count1_quads": 3,
            "global_gain": 214}]]
    stream = encode_mp3_frames([fr, fr], rate=rate, bitrate_kbps=64,
                               version=version)
    out = decode_mp3_frames(stream)
    assert len(out) == 2
    for hdr, spectra, pcm in out:
        assert hdr["version"] == version and hdr["rate"] == rate
        assert hdr["lsf"] is True
        assert pcm.shape == (576, 1)  # ONE granule per LSF frame
        exp = _lsf_requant_expected(ix, global_gain=214, rate=rate)
        assert np.allclose(spectra[0, 0], exp, rtol=1e-12)
        assert np.array_equal(spectra[1, 0], np.zeros(576))


def test_lsf_slen_partition_derivation_pins():
    """Hand-computed §2.4.3.2 slen/nsfb/preflag vectors."""
    from processor_edf_spark.operators.mp3 import _Granule, _lsf_sf_layout

    def layout(sfc, block_type=0, mixed=0):
        g = _Granule()
        g.scalefac_compress = sfc
        g.window_switching = 1 if block_type else 0
        g.block_type = block_type
        g.mixed_block = mixed
        return _lsf_sf_layout(g)

    assert layout(0) == ((0, 0, 0, 0), (6, 5, 5, 5), 0)
    # 270: (270>>4)=16 -> (3, 1); (270&15)>>2 = 3; 270&3 = 2
    assert layout(270) == ((3, 1, 3, 2), (6, 5, 5, 5), 0)
    # 497: -400 = 97: (97>>2)=24 -> (4, 4); 97&3 = 1
    assert layout(497) == ((4, 4, 1, 0), (6, 5, 7, 3), 0)
    # 500: row 2, preflag DERIVED
    assert layout(500) == ((0, 0, 0, 0), (11, 10, 0, 0), 1)
    assert layout(506) == ((2, 0, 0, 0), (11, 10, 0, 0), 1)
    # short and mixed forms pick their nsfb rows
    assert layout(0, block_type=2)[1] == (9, 9, 9, 9)
    assert layout(0, block_type=2, mixed=1)[1] == (6, 9, 9, 9)
    assert layout(450, block_type=2)[1] == (9, 9, 12, 6)
    assert layout(510, block_type=2, mixed=1)[1] == (15, 18, 0, 0)


def test_lsf_layer3_scalefactors_and_derived_preflag():
    """LSF scalefactors scale their bands exactly; scalefac_compress
    >= 500 must apply the DERIVED preflag (no preflag bit exists in
    the LSF side info)."""
    ix = np.zeros(576, dtype=np.int64)
    ix[:116] = 1  # through band 11 at 22050 (edges 96..116)
    sf = [0] * 22
    sf[0], sf[2], sf[11] = 1, 2, 1
    fr = [[{"ix": ix, "big_values_lines": 116, "count1_quads": 0,
            "global_gain": 210, "scalefac_compress": 270,
            "long_sf": sf}]]
    hdr, spectra, _ = decode_mp3_frames(
        encode_mp3_frames([fr], rate=22050, bitrate_kbps=64, version=2)
    )[0]
    exp = _lsf_requant_expected(ix, long_sf=sf)
    assert np.allclose(spectra[0, 0], exp, rtol=1e-12)

    # preflag row: bands 11+ get PRETAB even with all-zero sf bits
    fr2 = [[{"ix": ix, "big_values_lines": 116, "count1_quads": 0,
             "global_gain": 210, "scalefac_compress": 500}]]
    hdr2, spectra2, _ = decode_mp3_frames(
        encode_mp3_frames([fr2], rate=22050, bitrate_kbps=64, version=2)
    )[0]
    exp2 = _lsf_requant_expected(ix, preflag=1)
    assert np.allclose(spectra2[0, 0], exp2, rtol=1e-12)
    # band 11 (lines 96..116, PRETAB=1) scales by 2^-0.5 under preflag
    assert np.allclose(exp2[96:116],
                       _lsf_requant_expected(ix)[96:116] * 2 ** -0.5)


def test_lsf_layer3_ms_stereo_and_sample_count():
    """LSF MS stereo (mode_ext 2) decodes; intensity (mode_ext 1/3) is
    seam-gated with the one exception type."""
    ix_m = np.zeros(576, dtype=np.int64)
    ix_s = np.zeros(576, dtype=np.int64)
    ix_m[:8] = 1
    ix_s[:8] = (1, -1, 1, -1, 0, 0, 1, -1)
    fr = [[{"ix": ix_m, "big_values_lines": 8, "count1_quads": 0,
            "global_gain": 210},
           {"ix": ix_s, "big_values_lines": 8, "count1_quads": 0,
            "global_gain": 210}]]
    stream = encode_mp3_frames([fr], rate=16000, bitrate_kbps=64,
                               n_channels=2, mode_ext=2, version=2)
    hdr, spectra, pcm = decode_mp3_frames(stream)[0]
    assert pcm.shape == (576, 2)
    m = _lsf_requant_expected(ix_m, rate=16000)
    s = _lsf_requant_expected(ix_s, rate=16000)
    inv = 1.0 / np.sqrt(2.0)
    assert np.allclose(spectra[0, 0], (m + s) * inv, rtol=1e-12)
    assert np.allclose(spectra[0, 1], (m - s) * inv, rtol=1e-12)

    bad = encode_mp3_frames([fr], rate=16000, bitrate_kbps=64,
                            n_channels=2, mode_ext=1, version=2)
    with pytest.raises(UnsupportedMediaError, match="intensity"):
        decode_mp3_frames(bad)


def test_layer2_requant_closed_forms_match_published_table():
    """The closed forms reproduce ISO 11172-3 Table B.4's (C, D) pairs
    and give symmetric level grids."""
    from processor_edf_spark.operators.mp3 import _l2_requant

    # 3 levels: -2/3, 0, 2/3
    assert np.allclose([_l2_requant(c, 3) for c in range(3)],
                       [-2 / 3, 0.0, 2 / 3])
    # 5 levels: +-0.8 step 0.4
    assert np.allclose([_l2_requant(c, 5) for c in range(5)],
                       [-0.8, -0.4, 0.0, 0.4, 0.8])
    # 7 levels: +-6/7 step 2/7
    assert np.allclose([_l2_requant(c, 7) for c in range(7)],
                       (2 * np.arange(7) - 6) / 7.0)
    # 9 levels: +-8/9 step 2/9
    assert np.allclose([_l2_requant(c, 9) for c in range(9)],
                       (2 * np.arange(9) - 8) / 9.0)
    # every class: symmetric, max < 1, zero at the midpoint
    for n in (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047,
              4095, 8191, 16383, 32767, 65535):
        grid = np.array([_l2_requant(c, n) for c in range(n)])
        assert abs(grid[n // 2]) < 1e-12
        assert np.allclose(grid, -grid[::-1])
        assert grid.max() < 1.0


def test_layer2_table_selection_rule():
    from processor_edf_spark.operators.mp3 import _l2_table_key

    def key(kbps, rate, nch, lsf=False):
        return _l2_table_key({"lsf": lsf, "bitrate": kbps * 1000,
                              "rate": rate, "n_channels": nch})

    assert key(48, 44100, 1) == "c"
    assert key(48, 32000, 1) == "d"
    assert key(96, 44100, 2) == "c"    # 48/ch
    assert key(112, 44100, 2) == "a"   # 56/ch
    assert key(64, 44100, 1) == "a"
    assert key(160, 48000, 2) == "a"
    assert key(96, 44100, 1) == "b"
    assert key(224, 44100, 2) == "b"   # 112/ch
    assert key(320, 48000, 2) == "a"   # 48 kHz never uses b
    assert key(64, 16000, 1, lsf=True) == "lsf"


def test_layer2_round_trip_all_tables_exact():
    """Subband samples decode EXACTLY to scf * requant(code) on every
    allocation table, covering grouped (3/5/9) and ungrouped classes
    and all four scfsi sharing patterns."""
    from processor_edf_spark.operators.mp3 import (
        _L2_TABLES,
        _SF_TABLE_L1,
        _l2_requant,
        _l2_table_key,
        encode_mp3_layer2,
    )

    cases = [
        (44100, 128, 2, 1, None),   # a, stereo
        (44100, 96, 1, 1, None),    # b, mono
        (44100, 48, 1, 1, None),    # c, mono
        (32000, 48, 1, 1, None),    # d, mono
        (16000, 64, 1, 2, None),    # lsf
        (11025, 32, 1, 25, None),   # lsf @ 2.5 rate
        (44100, 160, 2, 1, 1),      # a, JOINT (bound 8): shared codes
        (24000, 96, 2, 2, 2),       # lsf, JOINT (bound 12)
    ]
    rng = np.random.default_rng(5)
    for rate, kbps, nch, version, mext in cases:
        joint = mext is not None
        hdr_probe = {"lsf": version != 1, "bitrate": kbps * 1000,
                     "rate": rate, "n_channels": nch}
        rows = _L2_TABLES[_l2_table_key(hdr_probe)]
        sbl = len(rows)
        bound = sbl if not joint else min((mext + 1) * 4, sbl)
        alloc = [[0] * sbl for _ in range(nch)]
        scfsi = [[int(rng.integers(0, 4)) for _ in range(sbl)]
                 for _ in range(nch)]
        scf_idx = [[[int(rng.integers(0, 63)) for _ in range(3)]
                    for _ in range(sbl)] for _ in range(nch)]
        for ch in range(nch):
            for sb in range(sbl):
                # sparse, small-class allocation so the frame fits the
                # bitrate budget (a real encoder allocates within it)
                if rng.random() < 0.15:
                    alloc[ch][sb] = int(
                        rng.integers(1, min(len(rows[sb][1]), 3) + 1)
                    )
        for sb in range(bound, sbl):  # shared allocation above the bound
            for ch in range(1, nch):
                alloc[ch][sb] = alloc[0][sb]
        codes = [[[[0, 0, 0] for _ in range(sbl)] for _ in range(nch)]
                 for _ in range(12)]
        for gr in range(12):
            for ch in range(nch):
                for sb in range(sbl):
                    a = alloc[ch][sb]
                    if a:
                        n = rows[sb][1][a - 1]
                        codes[gr][ch][sb] = [
                            int(rng.integers(0, n)) for _ in range(3)
                        ]
        frames = [{"alloc": alloc, "scfsi": scfsi, "scf_idx": scf_idx,
                   "codes": codes}]
        stream = encode_mp3_layer2(
            frames, rate=rate, bitrate_kbps=kbps, n_channels=nch,
            version=version, joint=joint, mode_ext=mext or 0,
        )
        hdr, S, pcm = decode_mp3_frames(stream)[0]
        assert pcm.shape == (1152, nch)
        for gr in range(12):
            part = gr >> 2
            for ch in range(nch):
                for sb in range(sbl):
                    a = alloc[ch][sb]
                    if not a:
                        assert (S[3 * gr : 3 * gr + 3, ch, sb] == 0).all()
                        continue
                    n = rows[sb][1][a - 1]
                    si = scfsi[ch][sb]
                    pidx = {0: (0, 1, 2), 1: (0, 0, 2),
                            2: (0, 0, 0), 3: (0, 1, 1)}[si][part]
                    sf = float(_SF_TABLE_L1[scf_idx[ch][sb][pidx]])
                    # above the joint bound the CODES are channel 0's
                    # (shared), the scalefactor stays per-channel
                    src_ch = ch if sb < bound else 0
                    for s in range(3):
                        exp = _l2_requant(codes[gr][src_ch][sb][s], n) * sf
                        assert abs(S[3 * gr + s, ch, sb] - exp) < 1e-12, (
                            rate, kbps, ch, sb, gr, s)


def test_layer2_joint_stereo_shared_codes_own_scalefactors():
    """Above the joint-stereo bound the sample CODES are shared but
    each channel applies its OWN scalefactor."""
    from processor_edf_spark.operators.mp3 import (
        _SF_TABLE_L1,
        _l2_requant,
        encode_mp3_layer2,
    )

    sbl = 27  # 128 kbps joint at 44100 -> table a (64/ch)
    alloc = [[0] * sbl, [0] * sbl]
    alloc[0][10] = alloc[1][10] = 1  # above bound 8 (mode_ext 1): shared
    scf_idx = [[[2, 2, 2]] * sbl, [[5, 5, 5]] * sbl]
    codes = [[[[1, 2, 0]] * sbl] * 2 for _ in range(12)]
    frames = [{"alloc": alloc, "scfsi": [[2] * sbl, [2] * sbl],
               "scf_idx": scf_idx, "codes": codes}]
    stream = encode_mp3_layer2(frames, rate=44100, bitrate_kbps=128,
                               n_channels=2, joint=True, mode_ext=1)
    hdr, S, _ = decode_mp3_frames(stream)[0]
    assert hdr["mode"] == 1
    for s, c in enumerate((1, 2, 0)):
        q = _l2_requant(c, 3)
        assert abs(S[s, 0, 10] - q * float(_SF_TABLE_L1[2])) < 1e-12
        assert abs(S[s, 1, 10] - q * float(_SF_TABLE_L1[5])) < 1e-12


def test_lsf_layer1_round_trip():
    """Layer I at LSF rates: same frame layout, LSF header tables."""
    from processor_edf_spark.operators.mp3 import (
        _SF_TABLE_L1,
        _l1_requant,
        encode_mp3_layer1,
    )

    alloc = [[0] * 32]
    alloc[0][0], alloc[0][3] = 2, 5
    scf_idx = [[4] * 32]
    codes = [[[s % 7] + [0, 0, int(3 + (s % 9))] + [0] * 28]
             for s in range(12)]
    stream = encode_mp3_layer1(
        [{"alloc": alloc, "scf_idx": scf_idx, "codes": codes}],
        rate=8000, bitrate_kbps=64, version=25,
    )
    hdr, S, pcm = decode_mp3_frames(stream)[0]
    assert hdr["version"] == 25 and hdr["rate"] == 8000
    assert pcm.shape == (384, 1)
    sf = float(_SF_TABLE_L1[4])
    for s in range(12):
        assert abs(S[s, 0, 0] - _l1_requant(s % 7, 3) * sf) < 1e-12
        assert abs(S[s, 0, 3] - _l1_requant(3 + (s % 9), 6) * sf) < 1e-12


def test_lsf_and_layer2_through_decode_audio():
    """The decode_wav contract end-to-end for the new variants."""
    from processor_edf_spark.operators.media_codecs import decode_audio
    from processor_edf_spark.operators.mp3 import encode_mp3_layer2

    ix = np.zeros(576, dtype=np.int64)
    ix[:12] = 1
    fr = [[{"ix": ix, "big_values_lines": 12, "count1_quads": 0,
            "global_gain": 210}]]
    rate, nch, pcm = decode_audio(
        encode_mp3_frames([fr] * 3, rate=24000, bitrate_kbps=48,
                          version=2)
    )
    assert (rate, nch, pcm.shape) == (24000, 1, (3 * 576, 1))

    sbl = 8
    alloc = [[1] + [0] * (sbl - 1)]
    frames = [{"alloc": alloc, "scfsi": [[2] * sbl],
               "scf_idx": [[[0, 0, 0]] * sbl],
               "codes": [[[[2, 0, 1]] * sbl]] * 12}]
    rate, nch, pcm = decode_audio(
        encode_mp3_layer2(frames, rate=44100, bitrate_kbps=48,
                          n_channels=1)
    )
    assert (rate, nch, pcm.shape) == (44100, 1, (1152, 1))


# ---------------------------------------------------------------------------
# short-block intensity stereo (r14: per-window regions, §2.4.3.4.9.3)
# ---------------------------------------------------------------------------


def _short_intensity_fixture():
    """Pure short blocks, joint stereo: the right channel's windows end
    at DIFFERENT bands (w0 through band 5, w1 through band 3, w2 all
    zero), so intensity must start per window (bands 6+/4+/0+).  The
    right channel carries the positions in its SHORT scalefactors
    (compress 13 -> slen (3, 3)); (8, w0) is an ILLEGAL position 7."""
    from processor_edf_spark.operators.mp3 import _SFB_SHORT

    sb = _SFB_SHORT[44100]
    left_ix = np.zeros(576, dtype=np.int64)
    right_ix = np.zeros(576, dtype=np.int64)
    # bitstream (window-major) order: band b occupies
    # [3*sb[b], 3*sb[b+1]) as w0-chunk, w1-chunk, w2-chunk
    for b in range(11):
        width = sb[b + 1] - sb[b]
        base = 3 * sb[b]
        for w in range(3):
            for i in range(width):
                k = base + w * width + i
                left_ix[k] = ((1 + k) % 3) - 1
                if (w == 0 and b <= 5) or (w == 1 and b <= 3):
                    right_ix[k] = ((5 + k) % 3) - 1
    sf_r = [[0, 0, 0] for _ in range(13)]
    for b in range(13):
        for w in range(3):
            in_region = (
                (w == 0 and b >= 6) or (w == 1 and b >= 4) or w == 2
            )
            if in_region and b < 12:
                sf_r[b][w] = (b + w) % 7
    sf_r[8][0] = 7  # illegal position
    # left codes its full nonzero extent (through line 317, padded to
    # 318); right codes through band 5's w0 chunk with coded zeros
    left = {"ix": left_ix, "big_values_lines": 3 * sb[11],
            "count1_quads": 0, "global_gain": 210, "block_type": 2}
    right = {"ix": right_ix, "big_values_lines": 3 * sb[6],
             "count1_quads": 0, "global_gain": 210, "block_type": 2,
             "short_sf": sf_r, "scalefac_compress": 13}
    return left, right, sf_r


@pytest.mark.parametrize("mode_ext", [1, 3])
def test_short_block_intensity_per_window(mode_ext):
    from processor_edf_spark.operators.mp3 import _SFB_SHORT, _Granule

    left, right, sf_r = _short_intensity_fixture()
    frames = [[[left, right], [left, right]]]
    out = decode_mp3_frames(_stream(frames, rate=44100, n_channels=2,
                                    bitrate_kbps=256,
                                    mode_ext=mode_ext))
    spectra = out[0][1]
    g = _Granule()
    g.window_switching, g.block_type, g.mixed_block = 1, 2, 0
    l_in = _reorder_short(left["ix"].astype(float), g, 44100)
    r_in = _reorder_short(right["ix"].astype(float), g, 44100)
    exp_l, exp_r = l_in.copy(), r_in.copy()
    inv = 1.0 / np.sqrt(2.0)
    sb = _SFB_SHORT[44100]
    handled = np.zeros(576, bool)
    firsts = []
    for w in range(3):
        fb = 0
        for b in range(12, -1, -1):
            width = sb[b + 1] - sb[b]
            idx = np.arange(3 * sb[b] + w, 3 * sb[b] + 3 * width + w,
                            3)[:width]
            if np.any(r_in[idx] != 0):
                fb = b + 1
                break
        firsts.append(fb)
    assert firsts == [6, 4, 0]  # the construction's intended regions
    for w, first_band in enumerate(firsts):
        for b in range(first_band, 13):
            width = sb[b + 1] - sb[b]
            idx = np.arange(3 * sb[b] + w, 3 * sb[b] + 3 * width + w,
                            3)[:width]
            handled[idx] = True
            pos = sf_r[b][w] if b < 12 else 0
            if pos >= 7:
                if mode_ext == 3:
                    exp_l[idx] = (l_in[idx] + r_in[idx]) * inv
                    exp_r[idx] = (l_in[idx] - r_in[idx]) * inv
                continue
            ratio = np.tan(pos * np.pi / 12.0)
            exp_l[idx] = l_in[idx] * (ratio / (1.0 + ratio))
            exp_r[idx] = l_in[idx] * (1.0 / (1.0 + ratio))
    if mode_ext == 3:
        rest = ~handled
        m, s = exp_l[rest].copy(), exp_r[rest].copy()
        exp_l[rest] = (m + s) * inv
        exp_r[rest] = (m - s) * inv
    for gr in range(2):
        assert np.allclose(spectra[gr, 0], exp_l, atol=1e-12)
        assert np.allclose(spectra[gr, 1], exp_r, atol=1e-12)


def test_mixed_block_intensity_stays_seam_gated():
    left, right, _sf = _short_intensity_fixture()
    left = dict(left, mixed_block=0)
    # force the right granule to claim mixed: the fixture encoder
    # cannot emit mixed sf, so build the stream with a long-sf right
    # and flip the decode path via a mixed-block right granule instead
    right_mixed = {"ix": right["ix"], "big_values_lines":
                   right["big_values_lines"], "count1_quads": 0,
                   "global_gain": 210, "block_type": 2,
                   "mixed_block": 1}
    frames = [[[left, right_mixed], [left, right_mixed]]]
    with pytest.raises(UnsupportedMediaError, match="mixed-block"):
        decode_mp3_frames(_stream(frames, rate=44100, n_channels=2,
                                  bitrate_kbps=256, mode_ext=1))


# ---------------------------------------------------------------------------
# mixed blocks (long low subbands + short bands 3..12, r14)
# ---------------------------------------------------------------------------


def _mixed_expected(ix, rate, long_sf, short_sf, sbg=(0, 0, 0),
                    sf_scale=0, preflag=0, n_long_bands=8):
    """Spec §2.4.3.4.7.1 mixed requantization + reorder, recomputed
    independently: long bands below line 36, short bands 3..12 with
    subblock gains, reorder from band 3."""
    from processor_edf_spark.operators.mp3 import (
        _PRETAB,
        _SFB_LONG,
        _SFB_SHORT,
        _Granule,
        _reorder_short,
    )

    exp = ix.astype(float)
    mult = 1.0 if sf_scale else 0.5
    lb = _SFB_LONG[rate]
    for b in range(n_long_bands):
        lo, hi = lb[b], min(lb[b + 1], 36)
        exp[lo:hi] *= 2.0 ** (-mult * (long_sf[b] + preflag * _PRETAB[b]))
    sb = _SFB_SHORT[rate]
    for b in range(3, 13):
        width = sb[b + 1] - sb[b]
        base = 3 * sb[b]
        for w in range(3):
            exp[base + w * width : base + (w + 1) * width] *= 2.0 ** (
                -2 * sbg[w] - mult * short_sf[b][w]
            )
    g = _Granule()
    g.window_switching, g.block_type, g.mixed_block = 1, 2, 1
    return _reorder_short(exp, g, rate)


@pytest.mark.parametrize("rate", [44100, 48000, 32000])
def test_mixed_block_round_trip_mpeg1(rate):
    """MPEG-1 mixed blocks: 8 long scalefactors + short bands 3..11,
    subblock gains, exact spectral recovery."""
    long_sf = [1, 2, 3, 1, 2, 3, 1, 2] + [0] * 14
    short_sf = [[0, 0, 0]] * 3 + [
        [(b + w) % 4 for w in range(3)] for b in range(3, 12)
    ] + [[0, 0, 0]]
    g = _gran(5, n_lines=48, block_type=2, mixed_block=1,
              scalefac_compress=10, long_sf=long_sf, short_sf=short_sf,
              subblock_gain=(0, 1, 2), scalefac_scale=1)
    out = decode_mp3_frames(_stream([[[g], [_gran(3)]]], rate=rate,
                                    n_channels=1, bitrate_kbps=128))
    exp = _mixed_expected(g["ix"], rate, long_sf, short_sf,
                          sbg=(0, 1, 2), sf_scale=1)
    assert np.array_equal(out[0][1][0, 0], exp)


def test_mixed_block_preflag_applies_to_long_bands():
    long_sf = [0, 1, 0, 1, 0, 1, 0, 1] + [0] * 14
    g = _gran(2, n_lines=36, block_type=2, mixed_block=1,
              scalefac_compress=10, long_sf=long_sf, preflag=1,
              scalefac_scale=1)
    out = decode_mp3_frames(_stream([[[g], [_gran(3)]]], rate=44100,
                                    n_channels=1, bitrate_kbps=128))
    exp = _mixed_expected(g["ix"], 44100, long_sf,
                          [[0, 0, 0]] * 13, sf_scale=1, preflag=1)
    assert np.array_equal(out[0][1][0, 0], exp)


@pytest.mark.parametrize("version,rate", [(2, 22050), (2, 24000),
                                          (2, 16000), (25, 12000)])
def test_lsf_short_blocks_round_trip(version, rate):
    """LSF short blocks: form-1 slen/partition layout (9,9,9,9 /
    9,9,12,6 / 18,18), window-inner emission, exact recovery."""
    short_sf = [[(b + w) % 3 for w in range(3)] for b in range(12)]
    short_sf.append([0, 0, 0])
    from processor_edf_spark.operators.mp3 import (
        _SFB_SHORT,
        _Granule,
        _reorder_short,
    )

    g = _gran(7, n_lines=36, block_type=2, mixed_block=0,
              scalefac_compress=202,  # slens (2,2,2,2)
              short_sf=short_sf, subblock_gain=(1, 0, 2),
              scalefac_scale=1)
    out = decode_mp3_frames(_stream([[[g]]], rate=rate, n_channels=1,
                                    bitrate_kbps=64, version=version))
    sb = _SFB_SHORT[rate]
    exp = g["ix"].astype(float)
    for b in range(13):
        width = sb[b + 1] - sb[b]
        base = 3 * sb[b]
        for w, sbg in enumerate((1, 0, 2)):
            exp[base + w * width : base + (w + 1) * width] *= 2.0 ** (
                -2 * sbg - 1.0 * short_sf[b][w]
            )
    gg = _Granule()
    gg.window_switching, gg.block_type, gg.mixed_block = 1, 2, 0
    assert np.array_equal(out[0][1][0, 0], _reorder_short(exp, gg, rate))


@pytest.mark.parametrize("version,rate", [(2, 22050), (25, 11025)])
def test_lsf_mixed_blocks_round_trip(version, rate):
    """LSF mixed blocks: form-2 layout (6 long + short from band 3),
    exact recovery — 6 long bands end at line 36 for every LSF rate
    but 8000."""
    long_sf = [1, 2, 3, 1, 2, 3] + [0] * 16
    short_sf = [[0, 0, 0]] * 3 + [
        [(b * w) % 4 for w in range(3)] for b in range(3, 12)
    ] + [[0, 0, 0]]
    g = _gran(9, n_lines=48, block_type=2, mixed_block=1,
              scalefac_compress=202,
              long_sf=long_sf, short_sf=short_sf,
              subblock_gain=(0, 2, 1), scalefac_scale=1)
    out = decode_mp3_frames(_stream([[[g]]], rate=rate, n_channels=1,
                                    bitrate_kbps=64, version=version))
    exp = _mixed_expected(g["ix"], rate, long_sf, short_sf,
                          sbg=(0, 2, 1), sf_scale=1, n_long_bands=6)
    assert np.array_equal(out[0][1][0, 0], exp)


def test_mixed_blocks_8000hz_seam():
    """At 8000 Hz the band tables do not meet at line 36: the fixture
    encoder refuses, and a hand-built stream hits the decoder seam."""
    g = _gran(1, n_lines=36, block_type=2, mixed_block=1)
    with pytest.raises(ValueError, match="8000"):
        _stream([[[g]]], rate=8000, n_channels=1, bitrate_kbps=64,
                version=25)
