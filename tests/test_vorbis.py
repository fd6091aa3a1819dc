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
