"""Vorbis I decode (operators/vorbis.py).

Validation model (the codec-family discipline): the LSb-first bit
layer and Ogg framing are property-pinned with round trips; Huffman
codeword assignment is pinned against the spec's worked example
(§3.2.1 lengths {2,4,4,4,4,2,3,3}); whole streams are checked exactly
against the fixture encoder's shared-synthesis reconstruction; seams
and malformed input raise the one exception type.  The single derived
table (floor1_inverse_dB_table interior) is documented in the module
docstring."""

import numpy as np
import pytest

from processor_edf_spark.operators.media_codecs import (
    UnsupportedMediaError,
)
from processor_edf_spark.operators.vorbis import (
    LSBitReader,
    LSBitWriter,
    assign_codewords,
    float32_pack,
    float32_unpack,
    ogg_crc,
    ogg_packets,
    ogg_wrap,
)


# ---------------------------------------------------------------------------
# bit layer
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [1, 7])
def test_bit_round_trip(seed):
    rng = np.random.default_rng(seed)
    w = LSBitWriter()
    seq = []
    for _ in range(4000):
        bits = int(rng.integers(1, 25))
        v = int(rng.integers(0, 1 << bits))
        w.write(v, bits)
        seq.append((v, bits))
    r = LSBitReader(w.finish())
    assert all(r.read(b) == v for v, b in seq)


def test_lsb_first_convention():
    """Vorbis §2 example: writing 0b0101 (4 bits) then 0b11 (2 bits)
    yields byte 0b00110101."""
    w = LSBitWriter()
    w.write(0b0101, 4)
    w.write(0b11, 2)
    assert w.finish() == bytes([0b00110101])
    r = LSBitReader(bytes([0b00110101]))
    assert r.read(4) == 0b0101
    assert r.read(2) == 0b11


def test_read_past_end_raises():
    r = LSBitReader(b"\xff")
    r.read(8)
    with pytest.raises(UnsupportedMediaError):
        r.read(1)


# ---------------------------------------------------------------------------
# Ogg framing
# ---------------------------------------------------------------------------


def test_ogg_round_trip_small_packets():
    pkts = [b"alpha", b"", b"beta" * 10, bytes(255)]
    assert ogg_packets(ogg_wrap(pkts)) == pkts


def test_ogg_round_trip_spanning_packet():
    # longer than 255 lacing values of 255 -> spans pages with the
    # continuation flag
    big = bytes(np.arange(70000, dtype=np.uint8) % 251)
    pkts = [b"head", big, b"tail"]
    assert ogg_packets(ogg_wrap(pkts)) == pkts


def test_ogg_crc_rejects_corruption():
    blob = bytearray(ogg_wrap([b"payload bytes here"]))
    blob[-3] ^= 0x40
    with pytest.raises(UnsupportedMediaError, match="CRC"):
        ogg_packets(bytes(blob))


def test_ogg_crc_known_zero_property():
    # non-reflected CRC with zero init: CRC of all-zero data is 0
    assert ogg_crc(bytes(16)) == 0
    assert ogg_crc(b"") == 0


# ---------------------------------------------------------------------------
# codebooks
# ---------------------------------------------------------------------------


def test_codeword_assignment_spec_worked_example():
    """Vorbis I §3.2.1: lengths {2,4,4,4,4,2,3,3} assign codewords
    00, 0100, 0101, 0110, 0111, 10, 110, 111."""
    codes = assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    expect = {
        0: (0b00, 2), 1: (0b0100, 4), 2: (0b0101, 4), 3: (0b0110, 4),
        4: (0b0111, 4), 5: (0b10, 2), 6: (0b110, 3), 7: (0b111, 3),
    }
    assert codes == expect


def test_codeword_assignment_rejects_bad_trees():
    with pytest.raises(UnsupportedMediaError, match="overspecified"):
        assign_codewords([1, 1, 1])
    with pytest.raises(UnsupportedMediaError, match="underspecified"):
        assign_codewords([2, 2, 2])
    # single-used-entry book is legal, keeps declared length
    assert assign_codewords([0, 3, 0]) == {1: (0, 3)}


def test_float32_pack_unpack_round_trip():
    for v in (0.0, 1.0, -1.0, 0.5, -6.25, 1024.0, 3.0 / 64):
        assert float32_unpack(float32_pack(v)) == v


# ---------------------------------------------------------------------------
# window property + full-stream round trips
# ---------------------------------------------------------------------------


def test_window_tdac_power_complement():
    """The Vorbis window satisfies the Princen-Bradley condition
    s[k]^2 + s[n-1-k]^2 = 1 on each slope — the property that makes
    lapped IMDCT reconstruction exact."""
    from processor_edf_spark.operators.vorbis import _slope

    for n in (32, 128):
        s = _slope(n)
        assert np.allclose(s**2 + s[::-1] ** 2, 1.0, atol=1e-12)


def _round_trip(payload, expected):
    from processor_edf_spark.operators.vorbis import decode_vorbis

    rate, ch, pcm = decode_vorbis(payload)
    exp_rate, exp_ch, exp = expected
    assert (rate, ch) == (exp_rate, exp_ch)
    assert pcm.shape == exp.shape
    assert np.array_equal(pcm, exp)


@pytest.mark.parametrize("rtype", [0, 1, 2])
def test_mono_round_trip_residue_types(rtype):
    from processor_edf_spark.operators.vorbis import (
        encode_vorbis_fixture,
    )

    payload, expected = encode_vorbis_fixture(
        [0, 0, 0, 0], entry_seed=rtype, channels=1,
        residue_type=rtype, blocksizes=(64, 256),
    )
    _round_trip(payload, expected)


def test_mono_long_short_window_splicing():
    """Mixed block sizes exercise the hybrid windows and the
    unequal-size overlap-add geometry."""
    from processor_edf_spark.operators.vorbis import (
        encode_vorbis_fixture,
    )

    payload, expected = encode_vorbis_fixture(
        [0, 1, 1, 0, 1, 0, 0, 1], entry_seed=7, channels=1,
        residue_type=1, blocksizes=(64, 256),
    )
    _round_trip(payload, expected)


@pytest.mark.parametrize("coupling", [False, True])
def test_stereo_round_trip(coupling):
    from processor_edf_spark.operators.vorbis import (
        encode_vorbis_fixture,
    )

    payload, expected = encode_vorbis_fixture(
        [0, 1, 0, 1], entry_seed=3, channels=2, residue_type=2,
        coupling=coupling, blocksizes=(64, 256),
    )
    _round_trip(payload, expected)


def test_sample_counts_match_granule_rule():
    """Frame k returns (n_{k-1} + n_k) / 4 samples; the first frame
    returns none."""
    from processor_edf_spark.operators.vorbis import (
        decode_vorbis,
        encode_vorbis_fixture,
    )

    modes = [0, 1, 1, 0]
    payload, _ = encode_vorbis_fixture(
        modes, channels=1, residue_type=1, blocksizes=(64, 256)
    )
    _, _, pcm = decode_vorbis(payload)
    sizes = [64, 256, 256, 64]
    expect = sum(
        (sizes[i - 1] + sizes[i]) // 4 for i in range(1, len(sizes))
    )
    assert pcm.shape[0] == expect


def test_floor0_seam():
    """A setup declaring floor type 0 routes to the honest named
    seam (and the fixture's own setup packet parses clean)."""
    from processor_edf_spark.operators.vorbis import (
        LSBitWriter,
        _FixtureConfig,
        _parse_ident,
        _parse_setup,
        _setup_codebook_bits,
        encode_vorbis_fixture,
        ogg_packets,
    )

    payload, _ = encode_vorbis_fixture([0, 0], channels=1,
                                       residue_type=1)
    pkts = ogg_packets(payload)
    st = _parse_ident(pkts[0])
    _parse_setup(pkts[2], st)  # the fixture setup parses clean

    w = LSBitWriter()
    w.write(0, 8)  # 1 codebook
    _setup_codebook_bits(w, [1], None)
    w.write(0, 6)
    w.write(0, 16)  # time transform
    w.write(0, 6)  # 1 floor
    w.write(0, 16)  # floor type 0
    with pytest.raises(UnsupportedMediaError, match="floor type 0"):
        _parse_setup(b"\x05vorbis" + w.finish(), st)


def test_corruption_fuzz_never_escapes():
    from processor_edf_spark.operators.vorbis import (
        decode_vorbis,
        encode_vorbis_fixture,
    )

    payload, _ = encode_vorbis_fixture(
        [0, 1, 0], entry_seed=1, channels=1, residue_type=1
    )
    data = bytearray(payload)
    rng = np.random.default_rng(5)
    for _ in range(250):
        i = int(rng.integers(0, len(data)))
        old = data[i]
        data[i] ^= 1 << int(rng.integers(0, 8))
        try:
            decode_vorbis(bytes(data))
        except UnsupportedMediaError:
            pass
        data[i] = old


def test_decode_audio_registry_route():
    """media_codecs.decode_audio routes OggS payloads to the Vorbis
    decoder."""
    from processor_edf_spark.operators.media_codecs import decode_audio
    from processor_edf_spark.operators.vorbis import (
        encode_vorbis_fixture,
    )

    payload, (rate, ch, exp) = encode_vorbis_fixture(
        [0, 1, 0], entry_seed=2, channels=2, residue_type=2,
        coupling=True,
    )
    got_rate, got_ch, pcm = decode_audio(payload)
    assert (got_rate, got_ch) == (rate, ch)
    assert np.array_equal(pcm, exp)


def test_ordered_and_sparse_codebook_parse():
    """The ordered and sparse length-list layouts parse to the same
    codebook as the unordered dense layout."""
    from processor_edf_spark.operators.vorbis import (
        _ilog,
        read_codebook,
    )

    lengths = [2, 2, 3, 4, 4, 3, 3]  # complete Kraft sum = 1

    def build(ordered, sparse_drop=None):
        w = LSBitWriter()
        w.write(0x564342, 24)
        w.write(1, 16)  # dims
        n = len(lengths) if sparse_drop is None else len(lengths) + 1
        w.write(n, 24)
        if ordered:
            # ordered layout requires ascending lengths
            asc = sorted(lengths)
            w.write(1, 1)
            w.write(asc[0] - 1, 5)
            total = 0
            cur = asc[0]
            while total < len(asc):
                num = sum(1 for l in asc if l == cur)
                w.write(num, _ilog(len(asc) - total))
                total += num
                cur += 1
            w2 = w
        else:
            w.write(0, 1)
            if sparse_drop is None:
                w.write(0, 1)
                for l in lengths:
                    w.write(l - 1, 5)
            else:
                w.write(1, 1)
                for i in range(n):
                    if i == sparse_drop:
                        w.write(0, 1)  # unused entry
                    else:
                        li = i if i < sparse_drop else i - 1
                        w.write(1, 1)
                        w.write(lengths[li] - 1, 5)
            w2 = w
        w2.write(0, 4)  # lookup type 0
        return w2.finish()

    dense = read_codebook(LSBitReader(build(False)))
    assert dense.lengths == lengths
    ordered = read_codebook(LSBitReader(build(True)))
    assert ordered.lengths == sorted(lengths)
    sparse = read_codebook(LSBitReader(build(False, sparse_drop=3)))
    assert sparse.lengths[3] == 0
    assert [l for i, l in enumerate(sparse.lengths) if i != 3] == lengths


def test_codebook_huffman_round_trip_random_books():
    """Random complete prefix codes round trip through the writer /
    tree-walk reader."""
    from processor_edf_spark.operators.vorbis import (
        _build_tree,
        read_huffman,
        write_huffman,
    )

    rng = np.random.default_rng(3)

    class _CB:
        pass

    for _ in range(20):
        # random complete tree: start from [1,1], repeatedly split a
        # random leaf into two one-longer leaves
        lens = [1, 1]
        for _ in range(int(rng.integers(0, 12))):
            i = int(rng.integers(0, len(lens)))
            lens[i : i + 1] = [lens[i] + 1, lens[i] + 1]
        arr = np.array(lens)
        rng.shuffle(arr)
        lens = [int(x) for x in arr]
        codes = assign_codewords(lens)
        cb = _CB()
        cb.tree = _build_tree(codes)
        w = LSBitWriter()
        seq = [int(rng.integers(0, len(lens))) for _ in range(200)]
        for e in seq:
            write_huffman(w, codes, e)
        r = LSBitReader(w.finish())
        assert [read_huffman(r, cb) for _ in seq] == seq
