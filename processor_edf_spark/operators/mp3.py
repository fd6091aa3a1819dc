"""Pure-python MPEG-1 Audio Layer III (MP3) decoder + fixture encoder.

MP3 is the dominant LOSSY audio format in real crawl corpora; until r12
it sat entirely behind the optional-extras seam (soundfile), so in a
no-extras container every real MP3 routed to ``decoded=false``.  This
module decodes the Layer III bitstream for REAL — framing, side info,
the bit reservoir, scalefactors, Huffman-coded spectra, requantization,
stereo modes, alias reduction, IMDCT, and the polyphase synthesis
filterbank — in the same pure-numpy discipline as operators/jpeg.py and
operators/flac.py.  (Generalizes the decode-everything posture of the
reference's sample reader, /root/reference/processor/edf_processor/
edf.py:56-76, to the multimodal corpus like the sibling codecs.)

Spec-exactness, stated precisely (ISO/IEC 11172-3):

- **Exact**: frame sync/header fields and the MPEG-1 bitrate/rate
  tables; mono/stereo side info layout (17/32 bytes) with every field;
  the bit reservoir (``main_data_begin`` back-references across frame
  payloads); scalefactor coding (slen pairs, scfsi granule sharing,
  long/short/mixed band layouts); Huffman region structure
  (region0/region1 boundaries, the window-switching 36/576 implicit
  split, count1 quadruples, rzero); requantization (the |ix|^(4/3)
  power law, global_gain, scalefac_scale, preflag/pretab,
  subblock_gain); MS stereo and long-block intensity stereo; SHORT-
  block intensity stereo (r14, §2.4.3.4.9.3 — per-window zero-part
  detection on the reordered right spectrum, per-window positions
  from the right channel's short scalefactors, the same tan ratio
  law, illegal positions falling back to MS per line); alias
  reduction (the 8 cs/ca butterflies per subband boundary); IMDCT with
  all four block-type windows and 18-sample overlap-add; frequency
  inversion.
- **Transcribed subset**: the spec's Huffman code tables are FIXED
  published constants (Table B.7 — unlike JPEG, whose tables travel in
  the payload).  The tables transcribed here with full confidence are
  select 1 (the 2x2 table) plus the two count1 quadruple tables' B
  form (4-bit complement codes) and the all-zero select 0; linbits
  widths for selects 16-31 are carried so region parsing stays exact.
  A stream selecting an untranscribed table raises
  ``UnsupportedMediaError`` naming the optional codec library — the
  same honest-seam contract as CABAC in operators/h264.py.  The
  fixture encoder emits only the transcribed subset, so every decoder
  stage above runs end-to-end on real conformant frames.
- **Derived prototype**: the synthesis filterbank follows the spec's
  STRUCTURE exactly (V FIFO, the 64x32 cosine matrix
  ``N[i][k] = cos((16+i)(2k+1)pi/64)``, U/W vector assembly, 16-block
  windowed sum) but the 512-tap window is a documented near-PR
  pseudo-QMF prototype built from closed forms (windowed sinc), NOT
  the spec's Table B.3 (512 published constants, not reproducible
  here).  Spectral-domain decode is therefore conformant; PCM from
  third-party streams is audio-grade but not bit-conformant — the
  ``mp3`` plugin/soundfile seam in media_codecs.py remains the
  bit-conformance path.  Round trips are bit-exact regardless: the
  fixture encoder's reconstruction shares this synthesis.
- **Layer I** (r12) decodes for real too — fixed 4-bit allocations,
  6-bit scalefactors (the 2·2^(-i/3) table), the offset-binary
  requantization formula, joint-stereo bound sharing — through the same
  polyphase synthesis; no spec tables beyond the closed-form
  scalefactors, so the only deviation is the shared derived prototype.
- **MPEG-2/2.5 (LSF)** (r13) decodes for real: the low-sample-rate
  bitrate/rate tables, one-granule frames (72·bitrate/rate), the
  8-bit main_data_begin / 9-byte-mono side layout, the 9-bit
  scalefac_compress slen/partition derivation with its derived
  preflag (the §2.4.3.2 non-intensity branch, transcribed as
  published), and the LSF scalefactor-band edge tables.  Edge-table
  confidence: 22050/24000/16000/8000 are the published ISO 13818-3
  tables; the 2.5 rates 11025/12000 share the 22050/24000 layouts
  (the universal convention for the unofficial 2.5 extension).
- **Layer II** (r13) decodes for real: the ISO 11172-3 Table B.2a-d
  quantization-class allocations and the single LSF table (row
  structure and class lists transcribed as published), the per-chkbps
  Table B.1 selection rule, 2-bit scfsi with all four sharing
  patterns, grouped 3/5/9-level codes, and Table B.4 requantization
  reproduced EXACTLY by its closed forms (C = 2^k/n, D = 2^(1-k),
  grouped D = 1/2) — through the shared polyphase synthesis.
- **Mixed blocks** (r14) decode for real in both MPEG-1 (8 long
  scalefactors + short bands 3..11) and LSF (form-2 partition rows:
  6 long + short from band 3) layouts: long requantization below
  line 36 with preflag/pretab, short bands with subblock gains above,
  reorder from band 3, long-window IMDCT on the first two subbands,
  alias reduction across their boundary — round trips pinned per
  rate.  The one carve-out: at 8000 Hz the long table's 36-line point
  (3 bands) and the short table's band 3 (line 72) do not meet, so
  the spec's mixed layout is self-inconsistent there; both the
  decoder and the fixture encoder treat mixed@8000 as an honest seam
  rather than guessing a bridge.
- **Out of scope** (UnsupportedMediaError, seam-gated): free-format
  bitrate, MIXED-block intensity stereo (the long/short interplay of
  §2.4.3.4.9.3's mixed case), and LSF intensity stereo (its sqrt-2
  ratio law is closed-form but the intensity scalefactor layout rows
  are untranscribed — recall confidence is not total, so the seam
  stays per the derived-tables honesty pattern).
  Trailing bytes that happen to match a sync pattern mid-stream are
  junk-checked (a format-changing header counts as a real frame only
  if the implied next offset also syncs), so sync-looking tails end
  iteration cleanly instead of aborting the decode.

Same safety contracts as the sibling codecs: one exception type,
bounded allocation (MAX_TOTAL_SAMPLES), malformed input never escapes
as a raw IndexError/OverflowError (fuzz-pinned in
tests/test_media_fuzz.py).
"""

from __future__ import annotations

import numpy as np

from processor_edf_spark.operators.flac import MSBBitReader, MSBBitWriter
from processor_edf_spark.operators.media_codecs import UnsupportedMediaError

#: inflation guard — a frame walk must not allocate unbounded PCM.
MAX_TOTAL_SAMPLES = 1 << 26

# MPEG-1 bitrate tables (kbps; index 0 = free format, 15 = bad)
_BITRATES = (
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_BITRATES_L1 = (
    0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448,
)
_BITRATES_L2 = (
    0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384,
)
# MPEG-2/2.5 (LSF) bitrate tables (ISO 13818-3 / the 2.5 convention)
_BITRATES_LSF_L1 = (
    0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256,
)
_BITRATES_LSF_L23 = (
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
)
_RATES = (44100, 48000, 32000)  # sampling_frequency 0/1/2; 3 = reserved
_RATES_V2 = (22050, 24000, 16000)
_RATES_V25 = (11025, 12000, 8000)

# scalefac_compress -> (slen1, slen2)  (spec table B.6 layout)
_SLEN = (
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
)

# preflag table (long scalefactor bands 0..21)
_PRETAB = (0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)

# scalefactor band boundaries (line indices), long (23 entries = 22
# bands) and short (14 entries = 13 bands), per sampling rate
_SFB_LONG = {
    44100: (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
            134, 162, 196, 238, 288, 342, 418, 576),
    48000: (0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
            128, 156, 190, 230, 276, 330, 384, 576),
    32000: (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
            156, 194, 240, 296, 364, 448, 550, 576),
}
_SFB_SHORT = {
    44100: (0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192),
    48000: (0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192),
    32000: (0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192),
}

# LSF (MPEG-2 §Table B.2 / the 2.5 convention) scalefactor band edges.
# Transcription confidence per the module docstring: the 22050/24000/
# 16000/8000 rows are the published spec tables; 11025 and 12000 share
# the 22050/24000 layouts (the arrangement every open decoder uses for
# the 2.5 extension, which predates no published table of its own).
_SFB_LONG.update({
    22050: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
            168, 200, 238, 284, 336, 396, 464, 522, 576),
    24000: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136,
            162, 194, 232, 278, 332, 394, 464, 540, 576),
    16000: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
            168, 200, 238, 284, 336, 396, 464, 522, 576),
    8000: (0, 12, 24, 36, 48, 60, 72, 88, 108, 132, 160, 192, 232,
           280, 336, 400, 476, 566, 568, 570, 572, 574, 576),
})
_SFB_LONG[11025] = _SFB_LONG[22050]
_SFB_LONG[12000] = _SFB_LONG[24000]
_SFB_SHORT.update({
    22050: (0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192),
    24000: (0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 136, 180, 192),
    16000: (0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192),
    8000: (0, 8, 16, 24, 36, 52, 72, 96, 124, 160, 162, 164, 166, 192),
})
_SFB_SHORT[11025] = _SFB_SHORT[22050]
_SFB_SHORT[12000] = _SFB_SHORT[24000]

# linbits per Huffman select (0 where the table has no ESC pair);
# selects 4 and 14 do not exist in the spec.
_LINBITS = {
    16: 1, 17: 2, 18: 3, 19: 4, 20: 6, 21: 8, 22: 10, 23: 13,
    24: 4, 25: 5, 26: 6, 27: 7, 28: 8, 29: 9, 30: 11, 31: 13,
}

# ---------------------------------------------------------------------------
# Huffman tables — the transcribed-with-confidence subset (module
# docstring).  Each big-values table maps (bit-length, code) -> (x, y).
# ---------------------------------------------------------------------------

# select 1: 2x2, max value 1 (spec table B.7 "table 1")
_TABLE_1 = {
    (1, 0b1): (0, 0),
    (3, 0b001): (0, 1),
    (2, 0b01): (1, 0),
    (3, 0b000): (1, 1),
}
_BIG_TABLES: dict[int, dict[tuple[int, int], tuple[int, int]]] = {1: _TABLE_1}
_BIG_MAXLEN = {1: 3}
# encoder twin: (x, y) -> (length, code)
_TABLE_1_ENC = {v: k for k, v in _TABLE_1.items()}


def _read_big_pair(r: MSBBitReader, select: int) -> tuple[int, int]:
    """One big-values (x, y) pair via the transcribed table subset."""
    if select == 0:
        return 0, 0  # select 0: no bits, all-zero region
    table = _BIG_TABLES.get(select)
    if table is None:
        extra = " (has linbits)" if select in _LINBITS else ""
        raise UnsupportedMediaError(
            f"mp3: Huffman table {select}{extra} not transcribed — "
            "install the optional codec library (soundfile) for "
            "third-party streams"
        )
    maxlen = _BIG_MAXLEN[select]
    code, length = 0, 0
    while length < maxlen:
        code = (code << 1) | r.read(1)
        length += 1
        hit = table.get((length, code))
        if hit is not None:
            return hit
    raise UnsupportedMediaError("mp3: invalid Huffman code")


def _read_count1_quad(r: MSBBitReader, select: int) -> tuple[int, ...]:
    """One count1 quadruple (v, w, x, y).  Table B (select 1) is the
    fixed-length 4-bit complement code; table A (select 0) is not
    transcribed (honest seam, module docstring)."""
    if select == 1:
        bits = r.read(4)
        i = 15 - bits
        return ((i >> 3) & 1, (i >> 2) & 1, (i >> 1) & 1, i & 1)
    raise UnsupportedMediaError(
        "mp3: count1 Huffman table A not transcribed — install the "
        "optional codec library (soundfile) for third-party streams"
    )


def _read_sign(r: MSBBitReader) -> int:
    return -1 if r.read(1) else 1


# ---------------------------------------------------------------------------
# header / side info
# ---------------------------------------------------------------------------


class _Granule:
    __slots__ = (
        "part2_3_length", "big_values", "global_gain", "scalefac_compress",
        "window_switching", "block_type", "mixed_block", "table_select",
        "subblock_gain", "region0_count", "region1_count", "preflag",
        "scalefac_scale", "count1table_select",
    )


def _skip_id3(payload: bytes) -> int:
    """Offset past a leading ID3v2 container (syncsafe size)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    size = (
        (payload[6] & 0x7F) << 21
        | (payload[7] & 0x7F) << 14
        | (payload[8] & 0x7F) << 7
        | (payload[9] & 0x7F)
    )
    return 10 + size


class _UnsupportedVariant(UnsupportedMediaError):
    """A VALID MPEG audio frame header for a variant this decoder does
    not implement (MPEG-2/2.5, Layer II, free format).  Distinct from
    garbage so a mid-stream variant change raises instead of being
    swallowed as trailing junk — silently truncating the stream would
    report a partial decode as a full one."""


def _parse_header(b4: bytes) -> dict:
    """4-byte frame header -> fields; MPEG-1, MPEG-2 (LSF) and
    MPEG-2.5, Layers I/II/III, at a fixed bitrate (free format stays
    the seam)."""
    h = int.from_bytes(b4, "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        raise UnsupportedMediaError("mp3: lost frame sync")
    version_code = (h >> 19) & 3
    layer = (h >> 17) & 3
    if version_code == 1:
        raise UnsupportedMediaError("mp3: reserved version code")
    if layer == 0:  # reserved
        raise UnsupportedMediaError("mp3: reserved layer code")
    version = {3: 1, 2: 2, 0: 25}[version_code]  # 25 = MPEG-2.5
    lsf = version != 1
    bitrate_idx = (h >> 12) & 0xF
    rate_idx = (h >> 10) & 3
    if bitrate_idx == 0:
        raise _UnsupportedVariant("mp3: free-format bitrate unsupported")
    if bitrate_idx == 15 or rate_idx == 3:
        raise UnsupportedMediaError("mp3: invalid header")
    mode = (h >> 6) & 3
    layer_n = {1: 3, 2: 2, 3: 1}[layer]  # header bits -> Layer number
    if lsf:
        brs = _BITRATES_LSF_L1 if layer_n == 1 else _BITRATES_LSF_L23
        rates = _RATES_V2 if version == 2 else _RATES_V25
    else:
        brs = {1: _BITRATES_L1, 2: _BITRATES_L2, 3: _BITRATES}[layer_n]
        rates = _RATES
    return {
        "crc": not ((h >> 16) & 1),
        "version": version,
        "lsf": lsf,
        "layer": layer_n,
        "bitrate": brs[bitrate_idx] * 1000,
        "rate": rates[rate_idx],
        "padding": (h >> 9) & 1,
        "mode": mode,  # 0 stereo, 1 joint, 2 dual, 3 mono
        "mode_ext": (h >> 4) & 3,
        "n_channels": 1 if mode == 3 else 2,
    }


def _frame_bytes(hdr: dict) -> int:
    if hdr["layer"] == 1:
        # Layer I slots are 4 bytes: (12·bitrate/rate + padding)·4
        return (12 * hdr["bitrate"] // hdr["rate"] + hdr["padding"]) * 4
    if hdr["layer"] == 3 and hdr["lsf"]:
        # LSF Layer III frames carry ONE granule (576 samples)
        return 72 * hdr["bitrate"] // hdr["rate"] + hdr["padding"]
    return 144 * hdr["bitrate"] // hdr["rate"] + hdr["padding"]


def _parse_side_info(data: bytes, nch: int):
    """Side info block -> (main_data_begin, scfsi, granules[2][nch])."""
    r = MSBBitReader(data)
    main_data_begin = r.read(9)
    r.read(5 if nch == 1 else 3)  # private_bits
    scfsi = [[r.read(1) for _ in range(4)] for _ in range(nch)]
    granules: list[list[_Granule]] = []
    for _gr in range(2):
        chs = []
        for _ch in range(nch):
            g = _Granule()
            g.part2_3_length = r.read(12)
            g.big_values = r.read(9)
            g.global_gain = r.read(8)
            g.scalefac_compress = r.read(4)
            g.window_switching = r.read(1)
            if g.window_switching:
                g.block_type = r.read(2)
                g.mixed_block = r.read(1)
                g.table_select = [r.read(5), r.read(5), 0]
                g.subblock_gain = [r.read(3) for _ in range(3)]
                if g.block_type == 0:
                    raise UnsupportedMediaError(
                        "mp3: window_switching with block_type 0"
                    )
                # regions are implicit for switched blocks (the 36/576
                # split in _read_spectrum); the counts are not coded
                g.region0_count = 0
                g.region1_count = 0
            else:
                g.block_type = 0
                g.mixed_block = 0
                g.table_select = [r.read(5), r.read(5), r.read(5)]
                g.subblock_gain = [0, 0, 0]
                g.region0_count = r.read(4)
                g.region1_count = r.read(3)
            g.preflag = r.read(1)
            g.scalefac_scale = r.read(1)
            g.count1table_select = r.read(1)
            if g.big_values > 288:
                raise UnsupportedMediaError("mp3: big_values > 288")
            chs.append(g)
        granules.append(chs)
    return main_data_begin, scfsi, granules


def _parse_side_info_lsf(data: bytes, nch: int):
    """LSF (MPEG-2/2.5) side info: ONE granule, 8-bit main_data_begin,
    no scfsi, 9-bit scalefac_compress, NO preflag bit (derived from
    scalefac_compress in :func:`_lsf_sf_layout`) — 9 bytes mono / 17
    stereo (ISO 13818-3 §2.4.1.7)."""
    r = MSBBitReader(data)
    main_data_begin = r.read(8)
    r.read(1 if nch == 1 else 2)  # private_bits
    chs = []
    for _ch in range(nch):
        g = _Granule()
        g.part2_3_length = r.read(12)
        g.big_values = r.read(9)
        g.global_gain = r.read(8)
        g.scalefac_compress = r.read(9)
        g.window_switching = r.read(1)
        if g.window_switching:
            g.block_type = r.read(2)
            g.mixed_block = r.read(1)
            g.table_select = [r.read(5), r.read(5), 0]
            g.subblock_gain = [r.read(3) for _ in range(3)]
            if g.block_type == 0:
                raise UnsupportedMediaError(
                    "mp3: window_switching with block_type 0"
                )
            g.region0_count = 0
            g.region1_count = 0
        else:
            g.block_type = 0
            g.mixed_block = 0
            g.table_select = [r.read(5), r.read(5), r.read(5)]
            g.subblock_gain = [0, 0, 0]
            g.region0_count = r.read(4)
            g.region1_count = r.read(3)
        g.preflag = 0  # derived later from scalefac_compress
        g.scalefac_scale = r.read(1)
        g.count1table_select = r.read(1)
        if g.big_values > 288:
            raise UnsupportedMediaError("mp3: big_values > 288")
        chs.append(g)
    return main_data_begin, [chs]  # one granule


# LSF scalefactor partition sizes (ISO 13818-3 §2.4.3.2): rows by the
# scalefac_compress range (0 = <400, 1 = 400-499, 2 = >=500), columns
# by block form (0 = long, 1 = short, 2 = mixed); each is the number
# of scalefactors in the four slen partitions.  (The intensity-channel
# rows are not carried: LSF intensity stereo is seam-gated below.)
_LSF_NSFB = (
    ((6, 5, 5, 5), (9, 9, 9, 9), (6, 9, 9, 9)),
    ((6, 5, 7, 3), (9, 9, 12, 6), (6, 9, 12, 6)),
    ((11, 10, 0, 0), (18, 18, 0, 0), (15, 18, 0, 0)),
)


def _lsf_sf_layout(g: _Granule) -> tuple:
    """LSF slen derivation: scalefac_compress -> (slen[4], nsfb[4],
    preflag).  The non-intensity branch of §2.4.3.2."""
    sfc = g.scalefac_compress
    preflag = 0
    if sfc < 400:
        slen = ((sfc >> 4) // 5, (sfc >> 4) % 5, (sfc & 15) >> 2, sfc & 3)
        row = 0
    elif sfc < 500:
        sfc -= 400
        slen = ((sfc >> 2) // 5, (sfc >> 2) % 5, sfc & 3, 0)
        row = 1
    else:
        sfc -= 500
        slen = (sfc // 3, sfc % 3, 0, 0)
        row = 2
        preflag = 1
    if g.window_switching and g.block_type == 2:
        form = 2 if g.mixed_block else 1
    else:
        form = 0
    return slen, _LSF_NSFB[row][form], preflag


def _read_scalefactors_lsf(r: MSBBitReader, g: _Granule):
    """LSF part2 -> (long[22], short[13][3]); sets g.preflag (derived,
    not transmitted).  Values fill the long / short(window-inner) /
    mixed layouts sequentially across the four partitions; the last
    band of each form is untransmitted and stays 0 (spec: sfb 21 long
    / sfb 12 short carry no scalefactor)."""
    slen, nsfb, preflag = _lsf_sf_layout(g)
    g.preflag = preflag
    vals = []
    for part in range(4):
        for _ in range(nsfb[part]):
            vals.append(r.read(slen[part]) if slen[part] else 0)
    long_sf = [0] * 22
    short_sf = [[0, 0, 0] for _ in range(13)]
    if g.window_switching and g.block_type == 2:
        if g.mixed_block:
            n_long = 6
            for b in range(n_long):
                long_sf[b] = vals[b]
            rest = vals[n_long:]
            first_short = 3
        else:
            rest = vals
            first_short = 0
        for i, v in enumerate(rest):
            b = first_short + i // 3
            if b < 13:
                short_sf[b][i % 3] = v
    else:
        for b, v in enumerate(vals):
            if b < 22:
                long_sf[b] = v
    return long_sf, short_sf


# ---------------------------------------------------------------------------
# scalefactors + Huffman spectra (the "part2" and "part3" of a granule)
# ---------------------------------------------------------------------------


def _read_scalefactors(
    r: MSBBitReader, g: _Granule, gr: int, ch_scfsi, prev
):
    """-> (long[22], short[13][3]); applies scfsi copying on granule 1."""
    slen1, slen2 = _SLEN[g.scalefac_compress]
    long_sf = [0] * 22
    short_sf = [[0, 0, 0] for _ in range(13)]
    if g.window_switching and g.block_type == 2:
        if g.mixed_block:
            for b in range(8):
                long_sf[b] = r.read(slen1)
            for b in range(3, 6):
                for w in range(3):
                    short_sf[b][w] = r.read(slen1)
        else:
            for b in range(6):
                for w in range(3):
                    short_sf[b][w] = r.read(slen1)
        for b in range(6, 12):
            for w in range(3):
                short_sf[b][w] = r.read(slen2)
        return long_sf, short_sf
    # long blocks: scfsi groups (0-5, 6-10, 11-15, 16-20)
    groups = ((0, 6, slen1), (6, 11, slen1), (11, 16, slen2), (16, 21, slen2))
    for gi, (lo, hi, sl) in enumerate(groups):
        if gr == 1 and ch_scfsi[gi]:
            prev_long = prev[0]
            for b in range(lo, hi):
                long_sf[b] = prev_long[b]
        else:
            for b in range(lo, hi):
                long_sf[b] = r.read(sl)
    return long_sf, short_sf


def _read_spectrum(r: MSBBitReader, g: _Granule, rate: int, part_end: int):
    """Huffman part3 -> (ix[576] ints, count1_end line index)."""
    ix = np.zeros(576, dtype=np.int64)
    if g.window_switching:
        r0_end, r1_end = 36, 576
    else:
        bounds = _SFB_LONG[rate]
        r0_end = bounds[min(g.region0_count + 1, 22)]
        r1_end = bounds[min(g.region0_count + 1 + g.region1_count + 1, 22)]
    pos = 0
    limit = 2 * g.big_values
    while pos < limit:
        if pos < r0_end:
            sel = g.table_select[0]
        elif pos < r1_end:
            sel = g.table_select[1]
        else:
            sel = g.table_select[2]
        x, y = _read_big_pair(r, sel)
        linbits = _LINBITS.get(sel, 0)
        for off, v in ((0, x), (1, y)):
            if v == 15 and linbits:
                v += r.read(linbits)
            if v:
                ix[pos + off] = v * _read_sign(r)
        pos += 2
    # count1 region: quadruples until the part boundary or line 576.
    # A final quadruple that straddles the boundary is DISCARDED (the
    # standard lenient handling: encoders may let the last quad spill
    # into padding; its lines are zero).
    while r.pos < part_end and pos <= 572:
        mark = r.pos
        quad = _read_count1_quad(r, g.count1table_select)
        vals = []
        for v in quad:
            vals.append(v * _read_sign(r) if v else 0)
        if r.pos > part_end:
            r.pos = mark
            break
        for off, v in enumerate(vals):
            if v:
                ix[pos + off] = v
        pos += 4
    return ix, pos


def _requantize(
    ix: np.ndarray, g: _Granule, rate: int, long_sf, short_sf
) -> np.ndarray:
    """ix -> xr (float64 spectral lines), spec §2.4.3.4.7.1."""
    xr = np.sign(ix) * np.abs(ix).astype(np.float64) ** (4.0 / 3.0)
    sf_mult = 1.0 if g.scalefac_scale else 0.5
    if g.window_switching and g.block_type == 2 and not g.mixed_block:
        bounds = _SFB_SHORT[rate]
        for b in range(13):
            w_band = bounds[b + 1] - bounds[b]
            base = 3 * bounds[b]
            for w in range(3):
                gain = (
                    (g.global_gain - 210 - 8 * g.subblock_gain[w]) / 4.0
                    - sf_mult * short_sf[b][w]
                )
                lo = base + w * w_band
                xr[lo : lo + w_band] *= 2.0 ** gain
        return xr
    mixed = g.window_switching and g.block_type == 2 and g.mixed_block
    if mixed and 3 * _SFB_SHORT[rate][3] != 36:
        # at 8000 Hz the long table's 36-line point (3 bands) and the
        # short table's band 3 (line 72) do not meet — the spec's
        # mixed layout is self-inconsistent there and real encoders
        # never emit it; honest seam rather than a silently mis-bound
        # requantization
        raise UnsupportedMediaError(
            "mp3: mixed blocks unsupported at this sample rate (the "
            "long/short scalefactor-band tables do not meet at line 36)"
        )
    bounds = _SFB_LONG[rate]
    for b in range(22):
        lo, hi = bounds[b], bounds[b + 1]
        if mixed and lo >= 36:
            break  # lines >= 36 of a mixed block scale as SHORT below
        if mixed:
            hi = min(hi, 36)
        gain = (g.global_gain - 210) / 4.0 - sf_mult * (
            long_sf[b] + (g.preflag * _PRETAB[b])
        )
        xr[lo:hi] *= 2.0 ** gain
    if mixed:
        sbounds = _SFB_SHORT[rate]
        for b in range(3, 13):
            w_band = sbounds[b + 1] - sbounds[b]
            base = 3 * sbounds[b]
            for w in range(3):
                gain = (
                    (g.global_gain - 210 - 8 * g.subblock_gain[w]) / 4.0
                    - sf_mult * short_sf[b][w]
                )
                lo = base + w * w_band
                xr[lo : lo + w_band] *= 2.0 ** gain
    return xr


def _reorder_short(xr: np.ndarray, g: _Granule, rate: int) -> np.ndarray:
    """Short-block reorder: per scalefactor band, window-major bitstream
    order -> frequency-major interleave (dst[3i+w] = src[w*width+i]),
    so each 18-line subband carries its three windows interleaved."""
    if not (g.window_switching and g.block_type == 2):
        return xr
    out = xr.copy()
    bounds = _SFB_SHORT[rate]
    first_band = 3 if g.mixed_block else 0
    for b in range(first_band, 13):
        width = bounds[b + 1] - bounds[b]
        base = 3 * bounds[b]
        src = xr[base : base + 3 * width]
        for w in range(3):
            out[base + w : base + 3 * width + w : 3][: width] = src[
                w * width : (w + 1) * width
            ]
    return out


# ---------------------------------------------------------------------------
# stereo
# ---------------------------------------------------------------------------

_IS_RATIO = np.tan(np.arange(7) * np.pi / 12.0)


def _apply_stereo(xr, hdr, granules_sf, gr, rate):
    """MS and long-block intensity stereo in place (spec §2.4.3.4.9).

    The intensity region starts at the first scalefactor band lying
    entirely in the right channel's UNTRANSMITTED tail (the spec's
    "zero_part": everything past the big_values + count1 Huffman
    region) — NOT at the last nonzero sample, which would wrongly
    intensity-process coded zeros inside the transmitted region.
    With mode_ext = 3 (MS and intensity both on), MS applies only
    BELOW the intensity region, and intensity-region bands whose
    position is illegal (>= 7) fall back to MS; with MS off they keep
    their L/R samples (spec §2.4.3.4.9.3)."""
    if hdr["mode"] != 1:  # joint stereo only
        return xr
    ms = hdr["mode_ext"] & 2
    intensity = hdr["mode_ext"] & 1
    left, right = xr
    inv_sqrt2 = 1.0 / np.sqrt(2.0)

    def ms_region(lo, hi):
        m = left[lo:hi].copy()
        s = right[lo:hi].copy()
        left[lo:hi] = (m + s) * inv_sqrt2
        right[lo:hi] = (m - s) * inv_sqrt2

    if not intensity:
        if ms:
            ms_region(0, 576)
        return xr
    if hdr["lsf"]:
        # LSF intensity positions are coded in the right channel's
        # scalefactors with a DIFFERENT ratio law (powers of sqrt(2))
        # and their own sf layout rows — seam-gated like short-block
        # intensity below
        raise UnsupportedMediaError(
            "mp3: MPEG-2/2.5 intensity stereo unsupported — install "
            "the optional codec library (soundfile)"
        )
    g_r = granules_sf["granule"][1]
    long_sf_r = granules_sf["long_sf"][1]
    if g_r.window_switching and g_r.block_type == 2:
        if g_r.mixed_block:
            # the mixed long/short intensity interplay is the one
            # remaining MPEG-1 stereo corner (module docstring)
            raise UnsupportedMediaError(
                "mp3: mixed-block intensity stereo unsupported — "
                "install the optional codec library (soundfile)"
            )
        # pure short blocks (r14, §2.4.3.4.9.3): intensity is detected
        # and applied PER WINDOW — for each of the three windows the
        # region starts at the band above the right channel's last
        # nonzero band in that window (scanned on the reordered
        # spectrum; the transmitted-region boundary is not
        # window-aligned, so the long path's count1 shortcut does not
        # apply here).  Positions come from the right channel's SHORT
        # scalefactors; band 12 carries no scalefactor and uses
        # position 0, mirroring the long path's band-21 convention.
        sbounds = _SFB_SHORT[rate]
        short_sf_r = granules_sf["short_sf"][1]
        handled = np.zeros(576, bool)
        for w in range(3):
            sfbcnt = -1
            for b in range(12, -1, -1):
                width = sbounds[b + 1] - sbounds[b]
                idx = np.arange(
                    3 * sbounds[b] + w,
                    3 * sbounds[b] + 3 * width + w,
                    3,
                )[:width]
                if np.any(right[idx] != 0):
                    sfbcnt = b
                    break
            for b in range(sfbcnt + 1, 13):
                width = sbounds[b + 1] - sbounds[b]
                idx = np.arange(
                    3 * sbounds[b] + w,
                    3 * sbounds[b] + 3 * width + w,
                    3,
                )[:width]
                handled[idx] = True
                pos = short_sf_r[b][w] if b < 12 else 0
                if pos >= 7:  # illegal: MS when on, else keep L/R
                    if ms:
                        m = left[idx].copy()
                        s = right[idx].copy()
                        left[idx] = (m + s) * inv_sqrt2
                        right[idx] = (m - s) * inv_sqrt2
                    continue
                ratio = _IS_RATIO[pos]
                l_ = left[idx].copy()
                left[idx] = l_ * (ratio / (1.0 + ratio))
                right[idx] = l_ * (1.0 / (1.0 + ratio))
        if ms:  # MS covers every line outside the intensity regions
            rest = ~handled
            m = left[rest].copy()
            s = right[rest].copy()
            left[rest] = (m + s) * inv_sqrt2
            right[rest] = (m - s) * inv_sqrt2
        return xr
    bounds = _SFB_LONG[rate]
    zero_start = int(granules_sf["count1_end"][1])
    intensity_from = next(
        (bounds[b] for b in range(22) if bounds[b] >= zero_start), 576
    )
    for b in range(22):
        lo, hi = bounds[b], bounds[b + 1]
        if lo < intensity_from:
            continue
        is_pos = long_sf_r[b]
        if is_pos >= 7:  # illegal position: MS when on, else keep L/R
            if ms:
                ms_region(lo, hi)
            continue
        ratio = _IS_RATIO[is_pos]
        l_ = left[lo:hi].copy()
        left[lo:hi] = l_ * (ratio / (1.0 + ratio))
        right[lo:hi] = l_ * (1.0 / (1.0 + ratio))
    if ms:  # MS covers only the spectrum below the intensity region
        ms_region(0, intensity_from)
    return xr


# ---------------------------------------------------------------------------
# alias reduction, IMDCT, frequency inversion
# ---------------------------------------------------------------------------

_C_ALIAS = np.array(
    [-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037]
)
_CS = 1.0 / np.sqrt(1.0 + _C_ALIAS * _C_ALIAS)
_CA = _C_ALIAS / np.sqrt(1.0 + _C_ALIAS * _C_ALIAS)


#: gather-index matrices for the vectorized alias reduction, per
#: boundary count: rows = boundaries, cols = the 8 butterfly lanes
_ALIAS_IX: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _alias_reduce(xr: np.ndarray, n_long_sb: int) -> None:
    """8 butterflies across each long-block subband boundary.

    Vectorized over all boundaries at once (r15): butterfly index sets
    are disjoint across boundaries (each touches ±8 lines around a
    multiple of 18), so one fancy-indexed gather/scatter computes the
    exact same per-element expressions the scalar loop did — this was
    the top hotspot of the whole Layer III decode profile."""
    if n_long_sb <= 1:
        return
    ix = _ALIAS_IX.get(n_long_sb)
    if ix is None:
        sb = 18 * np.arange(1, n_long_sb)[:, None]
        lane = np.arange(8)[None, :]
        ix = (sb - 1 - lane, sb + lane)
        _ALIAS_IX[n_long_sb] = ix
    ai, bi = ix
    a = xr[ai]
    b = xr[bi]
    xr[ai] = a * _CS - b * _CA
    xr[bi] = b * _CS + a * _CA


def _imdct_matrix(n: int) -> np.ndarray:
    i = np.arange(n)[:, None]
    k = np.arange(n // 2)[None, :]
    return np.cos(np.pi / (2 * n) * (2 * i + 1 + n / 2) * (2 * k + 1))


_IMDCT36 = _imdct_matrix(36)
_IMDCT12 = _imdct_matrix(12)


def _block_windows() -> dict[int, np.ndarray]:
    n = np.arange(36)
    w0 = np.sin(np.pi / 36 * (n + 0.5))
    w1 = w0.copy()
    w1[18:24] = 1.0
    w1[24:30] = np.sin(np.pi / 12 * (n[24:30] - 18 + 0.5))
    w1[30:] = 0.0
    w3 = w0.copy()
    w3[:6] = 0.0
    w3[6:12] = np.sin(np.pi / 12 * (n[6:12] - 6 + 0.5))
    w3[12:18] = 1.0
    w2 = np.sin(np.pi / 12 * (np.arange(12) + 0.5))
    return {0: w0, 1: w1, 2: w2, 3: w3}


_WIN = _block_windows()


def _imdct_subband(lines18: np.ndarray, block_type: int) -> np.ndarray:
    """18 spectral lines -> 36 windowed time samples (pre overlap)."""
    if block_type == 2:
        z = np.zeros(36)
        for w in range(3):
            y = (_IMDCT12 @ lines18[w::3]) * _WIN[2]
            z[6 * (w + 1) : 6 * (w + 1) + 12] += y
        return z
    return (_IMDCT36 @ lines18) * _WIN[block_type]


def _hybrid_synthesis(xr: np.ndarray, g: _Granule, overlap: np.ndarray):
    """576 lines -> (18, 32) subband samples via IMDCT + overlap-add;
    ``overlap`` is the per-channel (32, 18) carry state (mutated).

    r15: granules with ONE block type across all 32 subbands (every
    granule except mixed-block short ones) batch the 32 IMDCTs into a
    single GEMM — same transform, same windows; per-value agreement
    with the per-subband path is to BLAS float round-off, which only
    reaches the synthesized PCM (the spectral domain, where the codec
    rows demand bit-exactness, is upstream of this function)."""
    mixed = (
        g.window_switching and g.block_type == 2 and g.mixed_block
    )
    if not mixed:
        X = xr[: 32 * 18].reshape(32, 18)
        if g.block_type == 2:
            Z = np.zeros((32, 36))
            for w in range(3):
                Z[:, 6 * (w + 1) : 6 * (w + 1) + 12] += (
                    X[:, w::3] @ _IMDCT12.T
                ) * _WIN[2]
        else:
            Z = (X @ _IMDCT36.T) * _WIN[g.block_type]
        ss = np.ascontiguousarray((Z[:, :18] + overlap).T)
        overlap[:] = Z[:, 18:]
        ss[1::2, 1::2] *= -1.0
        return ss
    ss = np.empty((18, 32))
    for sb in range(32):
        bt = g.block_type
        if sb < 2:
            bt = 0
        z = _imdct_subband(xr[18 * sb : 18 * (sb + 1)], bt)
        ss[:, sb] = z[:18] + overlap[sb]
        overlap[sb] = z[18:]
    # frequency inversion: odd subbands negate odd time samples
    ss[1::2, 1::2] *= -1.0
    return ss


# ---------------------------------------------------------------------------
# polyphase synthesis filterbank
# ---------------------------------------------------------------------------


def _synth_prototype() -> np.ndarray:
    """512-tap near-PR pseudo-QMF prototype from closed forms: a
    windowed sinc at the 32-band cutoff (pi/64), Kaiser beta=9, peak-
    normalized to the spec window's documented peak so output levels
    land in the familiar range.  DOCUMENTED DEVIATION: this is not the
    spec's Table B.3 (see module docstring) — structure and indexing
    below ARE the spec's."""
    n = np.arange(512)
    x = (n - 255.5) / 64.0
    h = np.sinc(x / 2.0) * np.kaiser(512, 9.0)
    return h / h.max() * 1.144989013671875  # spec window peak (75038/65536)


_D_WINDOW = _synth_prototype()
_N_MATRIX = np.cos(
    np.pi / 64.0 * (16 + np.arange(64))[:, None] * (2 * np.arange(32) + 1)[None, :]
)


class _SynthState:
    __slots__ = ("v",)

    def __init__(self):
        self.v = np.zeros(1024)


def _synth_32(s32: np.ndarray, st: _SynthState) -> np.ndarray:
    """One filterbank step: 32 subband samples -> 32 PCM samples (the
    per-step REFERENCE implementation; decode uses the vectorized
    :func:`_synth_block`, parity-pinned against this in
    tests/test_mp3.py)."""
    st.v = np.roll(st.v, 64)
    st.v[:64] = _N_MATRIX @ s32
    v = st.v
    u = np.empty(512)
    for b in range(8):
        u[64 * b : 64 * b + 32] = v[128 * b : 128 * b + 32]
        u[64 * b + 32 : 64 * b + 64] = v[128 * b + 96 : 128 * b + 128]
    w = u * _D_WINDOW
    return w.reshape(16, 32).sum(axis=0)


# the window split the vectorized path consumes: D1[b] windows the
# even (V[128b..128b+31]) half-block, D2[b] the odd (V[128b+96..]) one
_D1 = np.stack([_D_WINDOW[64 * b : 64 * b + 32] for b in range(8)])
_D2 = np.stack([_D_WINDOW[64 * b + 32 : 64 * b + 64] for b in range(8)])


def _synth_block(S: np.ndarray, st: _SynthState) -> np.ndarray:
    """Vectorized synthesis for T consecutive steps: (T, 32) subband
    samples -> (T·32,) PCM.  Identical math to T calls of
    :func:`_synth_32` — the V FIFO is just a sliding window over the
    per-step matrixing outputs, so the whole block computes as ONE
    (T,32)x(32,64) GEMM plus 16 strided windowed accumulations instead
    of T python steps (the final 16-term sum accumulates sequentially
    where the reference sums pairwise, so agreement is to float
    round-off ~1e-15, parity-pinned)."""
    T = S.shape[0]
    B = S @ _N_MATRIX.T  # (T, 64): block t is the step-t matrixing
    # A[k] = block at step t = k - 16; rows 0..15 are the FIFO history
    # (v[64m:64m+64] is the block from m steps ago -> row 15 - m)
    hist = st.v.reshape(16, 64)[::-1]
    A = np.vstack([hist, B])  # (16 + T, 64)
    out = np.zeros((T, 32))
    for b in range(8):
        out += A[16 - 2 * b : 16 - 2 * b + T, :32] * _D1[b]
        out += A[15 - 2 * b : 15 - 2 * b + T, 32:] * _D2[b]
    # new FIFO: the last 16 blocks, newest first
    st.v = A[T : T + 16][::-1].reshape(-1).copy()
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# Layer I (r12): fixed 4-bit allocation, 6-bit scalefactors, 12 samples
# per subband per frame — no Huffman, no reservoir, no IMDCT; shares the
# polyphase synthesis with Layer III
# ---------------------------------------------------------------------------

# scalefactor table (§2.4.3.2): sf[i] = 2 · 2^(-i/3), index 63 invalid
_SF_TABLE_L1 = 2.0 * 2.0 ** (-np.arange(63) / 3.0)


def _l1_requant(x: int, nb: int) -> float:
    """§2.4.3.2 requantization: the coded word is the offset-binary
    fraction s''' = x/2^(nb-1) - 1 (algebraically identical to the
    spec's invert-MSB-then-two's-complement reading), then
    s'' = (2^nb/(2^nb - 1)) · (s''' + 2^(1-nb))."""
    frac = x / float(1 << (nb - 1)) - 1.0
    return ((1 << nb) / ((1 << nb) - 1.0)) * (frac + 2.0 ** (1 - nb))


def _decode_frame_l1(hdr: dict, data: bytes, synth: list) -> tuple:
    """One Layer I frame body -> (subbands (12, nch, 32), pcm (384, nch))."""
    r = MSBBitReader(data)
    nch = hdr["n_channels"]
    bound = 32 if hdr["mode"] != 1 else (hdr["mode_ext"] + 1) * 4
    alloc = [[0] * 32 for _ in range(nch)]
    for sb in range(bound):
        for ch in range(nch):
            a = r.read(4)
            if a == 15:
                raise UnsupportedMediaError("mp3: invalid Layer I allocation")
            alloc[ch][sb] = a
    for sb in range(bound, 32):
        a = r.read(4)
        if a == 15:
            raise UnsupportedMediaError("mp3: invalid Layer I allocation")
        for ch in range(nch):
            alloc[ch][sb] = a
    scf = [[0.0] * 32 for _ in range(nch)]
    for sb in range(32):
        for ch in range(nch):
            if alloc[ch][sb]:
                idx = r.read(6)
                if idx >= 63:
                    raise UnsupportedMediaError(
                        "mp3: invalid Layer I scalefactor index"
                    )
                scf[ch][sb] = float(_SF_TABLE_L1[idx])
    S = np.zeros((12, nch, 32))
    for s in range(12):
        for sb in range(32):
            if sb < bound:
                for ch in range(nch):
                    a = alloc[ch][sb]
                    if a:
                        S[s, ch, sb] = (
                            _l1_requant(r.read(a + 1), a + 1) * scf[ch][sb]
                        )
            else:
                a = alloc[0][sb]
                if a:
                    q = _l1_requant(r.read(a + 1), a + 1)
                    for ch in range(nch):
                        S[s, ch, sb] = q * scf[ch][sb]  # intensity: shared
    pcm = np.empty((384, nch))
    for ch in range(nch):
        pcm[:, ch] = _synth_block(S[:, ch, :], synth[ch])
    return S, pcm


def encode_mp3_layer1(
    frames: list,
    rate: int = 44100,
    n_channels: int = 1,
    bitrate_kbps: int = 192,
    mode_ext: int = 0,
    joint: bool = False,
    version: int = 1,
) -> bytes:
    """Layer I fixture encoder (MPEG-1 and, with ``version`` 2/25,
    LSF — the Layer I frame layout is version-independent; only the
    header tables change).  ``frames``: per frame a dict
    ``{"alloc": (nch, 32) ints 0-14, "scf_idx": (nch, 32) ints 0-62,
    "codes": (12, nch, 32) ints < 2^(alloc+1)}``.  With ``joint`` the
    header carries mode=1/mode_ext and subbands >= bound share one
    allocation and one sample code per group (channel scalefactors stay
    separate), exactly the layout the decoder reads."""
    if version == 1:
        rate_idx = _RATES.index(rate)
        bitrate_idx = _BITRATES_L1.index(bitrate_kbps)
        ver_code = 3
    else:
        rates = _RATES_V2 if version == 2 else _RATES_V25
        rate_idx = rates.index(rate)
        bitrate_idx = _BITRATES_LSF_L1.index(bitrate_kbps)
        ver_code = 2 if version == 2 else 0
    mode = 3 if n_channels == 1 else (1 if joint else 0)
    bound = 32 if mode != 1 else (mode_ext + 1) * 4
    out = bytearray()
    for frame in frames:
        alloc, scf_idx, codes = frame["alloc"], frame["scf_idx"], frame["codes"]
        w = MSBBitWriter()
        for sb in range(bound):
            for ch in range(n_channels):
                w.write(alloc[ch][sb], 4)
        for sb in range(bound, 32):
            w.write(alloc[0][sb], 4)
        for sb in range(32):
            for ch in range(n_channels):
                if alloc[ch][sb]:
                    w.write(scf_idx[ch][sb], 6)
        for s in range(12):
            for sb in range(32):
                if sb < bound:
                    for ch in range(n_channels):
                        a = alloc[ch][sb]
                        if a:
                            w.write(codes[s][ch][sb], a + 1)
                else:
                    a = alloc[0][sb]
                    if a:
                        w.write(codes[s][0][sb], a + 1)
        w.align()
        body = bytes(w.buf)
        hdr_word = (
            (0x7FF << 21)
            | (ver_code << 19)
            | (3 << 17)       # Layer I
            | (1 << 16)       # no CRC
            | (bitrate_idx << 12)
            | (rate_idx << 10)
            | (0 << 9)
            | (mode << 6)
            | (mode_ext << 4)
            | 0
        )
        frame_len = (12 * bitrate_kbps * 1000 // rate) * 4
        budget = frame_len - 4
        if len(body) > budget:
            raise ValueError("layer1 fixture: body exceeds frame size")
        out += hdr_word.to_bytes(4, "big") + body + b"\x00" * (budget - len(body))
    return bytes(out)


# ---------------------------------------------------------------------------
# Layer II (r13): per-subband quantization-class allocation (ISO
# 11172-3 Tables B.2a-d; ISO 13818-3's single LSF table), 2-bit scfsi,
# grouped 3/5/9-level codes, 12 granules x 3 samples — shares the
# polyphase synthesis with Layers I/III.  Requantization uses the
# closed forms behind Table B.4: for n = 2^k - 1 levels the code is an
# offset-binary fraction with C = 2^k/n, D = 2^(1-k); the grouped
# classes (3/5/9 levels, k = 2/3/4 bits) use D = 1/2.  Every (C, D)
# pair in the published table is reproduced exactly by these forms.
# ---------------------------------------------------------------------------

# allowed quantization levels per subband row (Tables B.2a-d rows);
# transcription confidence per the module docstring
_L2_A_LOW = (3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
             16383, 32767, 65535)                      # B.2a/b sb 0-2
_L2_A_MID = (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
             8191, 65535)                              # B.2a/b sb 3-10
_L2_A_HI = (3, 5, 7, 9, 15, 31, 65535)                 # B.2a/b nbal-3 rows
_L2_A_TOP = (3, 5, 65535)                              # B.2a/b nbal-2 rows
_L2_CD_LO = (3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
             8191, 16383, 32767)                       # B.2c/d sb 0-1
_L2_CD_HI = (3, 5, 9, 15, 31, 63, 127)                 # B.2c/d sb 2+
_L2_LSF4 = (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
            8191, 16383)                               # LSF sb 0-3
_L2_LSF3 = (3, 5, 7, 9, 15, 31, 63)                    # LSF sb 4-10
_L2_LSF2 = (3, 5, 7)                                   # LSF sb 11-29

_L2_TABLES = {
    "a": [(4, _L2_A_LOW)] * 3 + [(4, _L2_A_MID)] * 8
         + [(3, _L2_A_HI)] * 12 + [(2, _L2_A_TOP)] * 4,       # 27 sb
    "b": [(4, _L2_A_LOW)] * 3 + [(4, _L2_A_MID)] * 8
         + [(3, _L2_A_HI)] * 12 + [(2, _L2_A_TOP)] * 7,       # 30 sb
    "c": [(4, _L2_CD_LO)] * 2 + [(3, _L2_CD_HI)] * 6,         # 8 sb
    "d": [(4, _L2_CD_LO)] * 2 + [(3, _L2_CD_HI)] * 10,        # 12 sb
    "lsf": [(4, _L2_LSF4)] * 4 + [(3, _L2_LSF3)] * 7
           + [(2, _L2_LSF2)] * 19,                            # 30 sb
}

_L2_GROUPED_BITS = {3: 5, 5: 7, 9: 10}  # one code per 3-sample granule


def _l2_table_key(hdr: dict) -> str:
    """Allocation-table selection (ISO 11172-3 Table B.1 for MPEG-1;
    the single LSF table for MPEG-2/2.5).  In per-channel kbps terms
    the published combination table reduces to: <=48 -> c (d at
    32 kHz), 56-80 -> a, >=96 -> b (a at 48 kHz, which never uses b)."""
    if hdr["lsf"]:
        return "lsf"
    per_ch = hdr["bitrate"] // 1000 // hdr["n_channels"]
    if per_ch <= 48:
        return "d" if hdr["rate"] == 32000 else "c"
    if per_ch <= 80:
        return "a"
    return "a" if hdr["rate"] == 48000 else "b"


def _l2_requant(code: int, n: int) -> float:
    """Closed-form Table B.4 requantization for an n-level class."""
    nb = n.bit_length()
    frac = code / float(1 << (nb - 1)) - 1.0
    d = 0.5 if n in (3, 5, 9) else 2.0 ** (1 - nb)
    return ((1 << nb) / float(n)) * (frac + d)


def _decode_frame_l2(hdr: dict, data: bytes, synth: list) -> tuple:
    """One Layer II frame body -> (subbands (36, nch, 32),
    pcm (1152, nch))."""
    r = MSBBitReader(data)
    nch = hdr["n_channels"]
    rows = _L2_TABLES[_l2_table_key(hdr)]
    sblimit = len(rows)
    bound = sblimit
    if hdr["mode"] == 1:  # joint stereo: shared codes above the bound
        bound = min((hdr["mode_ext"] + 1) * 4, sblimit)
    alloc = [[0] * sblimit for _ in range(nch)]
    for sb in range(bound):
        for ch in range(nch):
            alloc[ch][sb] = r.read(rows[sb][0])
    for sb in range(bound, sblimit):
        a = r.read(rows[sb][0])
        for ch in range(nch):
            alloc[ch][sb] = a
    scfsi = [[0] * sblimit for _ in range(nch)]
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[ch][sb]:
                scfsi[ch][sb] = r.read(2)
    # three scalefactors per subband (one per 4-granule part), shared
    # per the scfsi pattern (spec §2.4.2.7: 0 -> three, 1 -> first two
    # equal, 2 -> all equal, 3 -> last two equal)
    scf = np.zeros((nch, sblimit, 3))
    for sb in range(sblimit):
        for ch in range(nch):
            if not alloc[ch][sb]:
                continue
            si = scfsi[ch][sb]
            n_read = {0: 3, 1: 2, 2: 1, 3: 2}[si]
            idx = []
            for _ in range(n_read):
                v = r.read(6)
                if v >= 63:
                    raise UnsupportedMediaError(
                        "mp3: invalid Layer II scalefactor index"
                    )
                idx.append(float(_SF_TABLE_L1[v]))
            if si == 0:
                parts = idx
            elif si == 1:
                parts = [idx[0], idx[0], idx[1]]
            elif si == 2:
                parts = [idx[0], idx[0], idx[0]]
            else:
                parts = [idx[0], idx[1], idx[1]]
            scf[ch, sb] = parts
    S = np.zeros((36, nch, 32))
    for gr in range(12):
        part = gr >> 2
        for sb in range(sblimit):
            chans = range(nch) if sb < bound else (0,)
            for ch in chans:
                a = alloc[ch][sb]
                if not a:
                    continue
                n = rows[sb][1][a - 1]
                if n in _L2_GROUPED_BITS:
                    c = r.read(_L2_GROUPED_BITS[n])
                    samples = (c % n, (c // n) % n, (c // (n * n)) % n)
                else:
                    w = n.bit_length()
                    samples = (r.read(w), r.read(w), r.read(w))
                vals = [_l2_requant(c, n) for c in samples]
                targets = (ch,) if sb < bound else range(nch)
                for tch in targets:
                    for s in range(3):
                        S[3 * gr + s, tch, sb] = (
                            vals[s] * scf[tch, sb, part]
                        )
    pcm = np.empty((1152, nch))
    for ch in range(nch):
        pcm[:, ch] = _synth_block(S[:, ch, :], synth[ch])
    return S, pcm


def encode_mp3_layer2(
    frames: list,
    rate: int = 44100,
    bitrate_kbps: int = 192,
    n_channels: int = 1,
    mode_ext: int = 0,
    joint: bool = False,
    version: int = 1,
) -> bytes:
    """Layer II fixture encoder (MPEG-1 and, with ``version`` 2/25,
    LSF).  ``frames``: per frame a dict ``{"alloc": (nch, sblimit)
    ints, "scfsi": (nch, sblimit) ints 0-3, "scf_idx": (nch, sblimit,
    3) ints 0-62, "codes": (12, nch, sblimit, 3) ints}`` — grouped
    classes consume codes[...,0..2] as the three ungrouped sample
    values and pack them into one base-n code, exactly the layout the
    decoder reads."""
    if version == 1:
        rate_idx = _RATES.index(rate)
        bitrate_idx = _BITRATES_L2.index(bitrate_kbps)
        ver_code = 3
    else:
        rates = _RATES_V2 if version == 2 else _RATES_V25
        rate_idx = rates.index(rate)
        bitrate_idx = _BITRATES_LSF_L23.index(bitrate_kbps)
        ver_code = 2 if version == 2 else 0
    mode = 3 if n_channels == 1 else (1 if joint else 0)
    hdr_probe = {
        "lsf": version != 1,
        "bitrate": bitrate_kbps * 1000,
        "rate": rate,
        "n_channels": n_channels,
        "mode": mode,
        "mode_ext": mode_ext,
    }
    rows = _L2_TABLES[_l2_table_key(hdr_probe)]
    sblimit = len(rows)
    bound = sblimit if mode != 1 else min((mode_ext + 1) * 4, sblimit)
    out = bytearray()
    for frame in frames:
        alloc, scfsi = frame["alloc"], frame["scfsi"]
        scf_idx, codes = frame["scf_idx"], frame["codes"]
        w = MSBBitWriter()
        for sb in range(bound):
            for ch in range(n_channels):
                w.write(alloc[ch][sb], rows[sb][0])
        for sb in range(bound, sblimit):
            w.write(alloc[0][sb], rows[sb][0])
        for sb in range(sblimit):
            for ch in range(n_channels):
                if alloc[ch][sb]:
                    w.write(scfsi[ch][sb], 2)
        for sb in range(sblimit):
            for ch in range(n_channels):
                if not alloc[ch][sb]:
                    continue
                si = scfsi[ch][sb]
                emit = {0: (0, 1, 2), 1: (0, 2), 2: (0,), 3: (0, 1)}[si]
                for p in emit:
                    w.write(scf_idx[ch][sb][p], 6)
        for gr in range(12):
            for sb in range(sblimit):
                chans = range(n_channels) if sb < bound else (0,)
                for ch in chans:
                    a = alloc[ch][sb]
                    if not a:
                        continue
                    n = rows[sb][1][a - 1]
                    c3 = [int(codes[gr][ch][sb][s]) for s in range(3)]
                    # valid codes are 0..n-1 (the all-ones ungrouped
                    # pattern maps outside [-1, 1] and is forbidden)
                    if any(c >= n for c in c3):
                        raise ValueError("layer2 fixture: code out of range")
                    if n in _L2_GROUPED_BITS:
                        c = c3[0] + n * c3[1] + n * n * c3[2]
                        w.write(c, _L2_GROUPED_BITS[n])
                    else:
                        for c in c3:
                            w.write(c, n.bit_length())
        w.align()
        body = bytes(w.buf)
        hdr_word = (
            (0x7FF << 21)
            | (ver_code << 19)
            | (2 << 17)       # Layer II
            | (1 << 16)       # no CRC
            | (bitrate_idx << 12)
            | (rate_idx << 10)
            | (0 << 9)
            | (mode << 6)
            | (mode_ext << 4)
            | 0
        )
        frame_len = 144 * bitrate_kbps * 1000 // rate
        budget = frame_len - 4
        if len(body) > budget:
            raise ValueError("layer2 fixture: body exceeds frame size")
        out += hdr_word.to_bytes(4, "big") + body + b"\x00" * (budget - len(body))
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _format_key(hdr: dict) -> tuple:
    return (hdr["version"], hdr["layer"], hdr["rate"], hdr["n_channels"])


def _iter_frames(payload: bytes):
    """Yield (hdr, side_bytes, main_bytes) per frame; validates sizes.

    Trailing-junk discipline (ADVICE r12): a syncword-matching byte
    pattern at the exact next-frame offset whose format DIFFERS from
    the established stream (version/layer/rate/channels) is only
    treated as a real frame if it passes a plausibility check — the
    implied next offset holds another valid sync (or ends the stream
    exactly).  Otherwise it is trailing junk and iteration stops
    cleanly, instead of aborting the whole decode on files with
    sync-looking tail bytes.  A free-format header (the one remaining
    unimplemented variant) raises on the FIRST frame — a stream
    property — and is junk-checked the same way mid-stream."""
    pos = _skip_id3(payload)
    end = len(payload)
    if end >= 128 and payload[-128:-125] == b"TAG":
        end -= 128  # ID3v1 tail
    first = True
    prev_key = None

    def plausible(fb: int) -> bool:
        nxt = pos + fb
        if nxt == end:
            return True
        if nxt + 4 > end:
            return False
        try:
            _parse_header(payload[nxt : nxt + 4])
        except _UnsupportedVariant:
            return True  # a consistent variant run, not random junk
        except UnsupportedMediaError:
            return False
        return True

    while pos + 4 <= end:
        try:
            hdr = _parse_header(payload[pos : pos + 4])
        except _UnsupportedVariant:
            if first:
                raise  # free format from frame one: a stream property
            break  # mid-stream: frame length unknowable — junk tail
        except UnsupportedMediaError:
            if first:
                raise
            break  # trailing garbage after valid frames: stop cleanly
        fb = _frame_bytes(hdr)
        if prev_key is not None and _format_key(hdr) != prev_key:
            # mid-stream format change: real only if the next offset
            # also syncs; otherwise it was junk that happened to sync
            if not plausible(fb):
                break
        first = False
        prev_key = _format_key(hdr)
        if pos + fb > end:
            break  # trailing truncated frame: decode what is complete
        off = pos + 4 + (2 if hdr["crc"] else 0)
        if hdr["layer"] in (1, 2):
            # Layers I/II have no side info / reservoir: body = frame
            yield hdr, b"", payload[off : pos + fb]
            pos += fb
            continue
        if hdr["lsf"]:
            side_len = 9 if hdr["n_channels"] == 1 else 17
        else:
            side_len = 17 if hdr["n_channels"] == 1 else 32
        if off + side_len > pos + fb:
            raise UnsupportedMediaError("mp3: frame too small for side info")
        yield hdr, payload[off : off + side_len], payload[off + side_len : pos + fb]
        pos += fb
    if first:
        raise UnsupportedMediaError("mp3: no complete frame")


def decode_mp3_frames(payload: bytes):
    """Full decode, yielding per frame:
    ``(hdr, spectra, pcm)`` — for Layer III spectra is (2, nch, 576)
    float64 requantized-and-stereo-processed lines and pcm is
    (1152, nch); for Layer I spectra is the (12, nch, 32) subband
    matrix and pcm is (384, nch).  The granular form the tests and the
    driver row consume; :func:`decode_mp3_py` flattens it to the
    decode_wav contract."""
    reservoir = b""
    out = []
    rate = None
    nch = None
    layer = None
    overlap = None
    synth = None
    total = 0
    first_frame = True
    for hdr, side, main in _iter_frames(payload):
        if first_frame:
            first_frame = False
            # real encoders prepend a Xing/Info metadata frame — a
            # structurally valid Layer III frame whose main data is a
            # seek table, not audio (LAME writes one on every encode).
            # It sits directly after the side info, i.e. at main[:4].
            # Decoders skip it.
            if hdr["layer"] == 3 and main[:4] in (b"Xing", b"Info"):
                continue
        if rate is None:
            rate, nch, layer = hdr["rate"], hdr["n_channels"], hdr["layer"]
            overlap = [np.zeros((32, 18)) for _ in range(nch)]
            synth = [_SynthState() for _ in range(nch)]
        elif (
            hdr["rate"] != rate
            or hdr["n_channels"] != nch
            or hdr["layer"] != layer
        ):
            raise UnsupportedMediaError("mp3: mid-stream format change")
        if layer == 1:
            total += 384 * nch
            if total > MAX_TOTAL_SAMPLES:
                raise UnsupportedMediaError("mp3: stream exceeds sample budget")
            subbands, pcm = _decode_frame_l1(hdr, main, synth)
            out.append((hdr, subbands, pcm))
            continue
        if layer == 2:
            total += 1152 * nch
            if total > MAX_TOTAL_SAMPLES:
                raise UnsupportedMediaError("mp3: stream exceeds sample budget")
            subbands, pcm = _decode_frame_l2(hdr, main, synth)
            out.append((hdr, subbands, pcm))
            continue
        if hdr["lsf"]:
            main_data_begin, granules = _parse_side_info_lsf(side, nch)
            scfsi = [[0] * 4 for _ in range(nch)]  # no scfsi in LSF
        else:
            main_data_begin, scfsi, granules = _parse_side_info(side, nch)
        if main_data_begin > len(reservoir):
            # spec-legal at stream start / after a cut: skip this frame
            reservoir = (reservoir + main)[-511:]
            continue
        data = (reservoir[len(reservoir) - main_data_begin :] if main_data_begin else b"") + main
        reservoir = (reservoir + main)[-511:]
        r = MSBBitReader(data)
        ngr = len(granules)  # 2 for MPEG-1, 1 for LSF
        total += 576 * ngr * nch
        if total > MAX_TOTAL_SAMPLES:
            raise UnsupportedMediaError("mp3: stream exceeds sample budget")
        frame_spectra = np.zeros((2, nch, 576))
        pcm = np.empty((576 * ngr, nch))
        prev_sf = [None] * nch
        for gr in range(ngr):
            xr_ch = []
            sf_ch = []
            ssf_ch = []
            g_ch = []
            c1_ch = []
            for ch in range(nch):
                g = granules[gr][ch]
                part_start = r.pos
                part_end = part_start + g.part2_3_length
                if hdr["lsf"]:
                    long_sf, short_sf = _read_scalefactors_lsf(r, g)
                else:
                    long_sf, short_sf = _read_scalefactors(
                        r, g, gr, scfsi[ch], prev_sf[ch]
                    )
                prev_sf[ch] = (long_sf, short_sf)
                ix, count1_end = _read_spectrum(r, g, rate, part_end)
                if r.pos > part_end:
                    raise UnsupportedMediaError("mp3: part2_3 overrun")
                r.pos = part_end  # skip padding inside the part
                xr = _requantize(ix, g, rate, long_sf, short_sf)
                xr = _reorder_short(xr, g, rate)
                xr_ch.append(xr)
                sf_ch.append(long_sf)
                ssf_ch.append(short_sf)
                g_ch.append(g)
                c1_ch.append(count1_end)
            if nch == 2:
                _apply_stereo(
                    xr_ch,
                    hdr,
                    {
                        "granule": granules[gr],
                        "long_sf": sf_ch,
                        "short_sf": ssf_ch,
                        "count1_end": c1_ch,
                    },
                    gr,
                    rate,
                )
            for ch in range(nch):
                g = g_ch[ch]
                xr = xr_ch[ch]
                frame_spectra[gr, ch] = xr
                if not (g.window_switching and g.block_type == 2 and not g.mixed_block):
                    n_long = 2 if (g.window_switching and g.block_type == 2) else 32
                    _alias_reduce(xr, n_long)
                ss = _hybrid_synthesis(xr, g, overlap[ch])
                pcm[576 * gr : 576 * (gr + 1), ch] = _synth_block(
                    ss, synth[ch]
                )
        out.append((hdr, frame_spectra, pcm))
    if not out:
        raise UnsupportedMediaError("mp3: no decodable frame")
    return out


def decode_mp3_py(payload: bytes) -> tuple[int, int, np.ndarray]:
    """MP3 -> (rate, n_channels, float64 samples (n, nch)) — the
    decode_wav_pcm contract; the pure-python ``mp3`` path."""
    frames = decode_mp3_frames(payload)
    rate = frames[0][0]["rate"]
    nch = frames[0][0]["n_channels"]
    pcm = np.concatenate([f[2] for f in frames], axis=0)
    return rate, nch, pcm


# ---------------------------------------------------------------------------
# fixture encoder (spectral-domain): real conformant Layer III frames
# over the transcribed Huffman subset
# ---------------------------------------------------------------------------


def _encode_granule_bits(ix: np.ndarray, g_params: dict) -> tuple[bytes, _Granule]:
    """Spectral lines (|ix| <= 1, bitstream order) -> (part2_3 payload
    bits, side fields).  Optional ``g_params``: ``block_type`` (2 =
    short, windowed side-info layout), ``subblock_gain`` (3 ints),
    ``count1_quads``, ``big_values_lines``, ``global_gain``."""
    w = MSBBitWriter()
    nz = np.nonzero(ix)[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    big_limit = g_params.get("big_values_lines")
    if big_limit is None:
        big_limit = min((last + 1) // 2 * 2, 576)
    n_quads = g_params.get("count1_quads", 0)
    if np.abs(ix).max(initial=0) > 1:
        raise ValueError("fixture encoder: |ix| must be <= 1 (table 1 subset)")
    # part2: long-block scalefactors (bands 0..20 over the slen pair);
    # groups named in ``skip_groups`` are scfsi-shared from granule 0
    # and write no bits.  Only long-block sf emission is supported.
    compress = g_params.get("scalefac_compress", 0)
    long_sf = g_params.get("long_sf", [0] * 22)
    skip_groups = g_params.get("skip_groups", ())
    lsf = g_params.get("lsf", False)
    if lsf:
        bt = g_params.get("block_type", 0)
        mixed = g_params.get("mixed_block", 0)
        probe = _Granule()
        probe.scalefac_compress = compress
        probe.window_switching = 1 if bt else 0
        probe.block_type = bt
        probe.mixed_block = mixed
        slen, nsfb, _pre = _lsf_sf_layout(probe)
        # sequential values exactly as _read_scalefactors_lsf consumes
        # them: long bands first (6 for mixed, the long form otherwise),
        # then short bands band-major window-inner from first_short
        if bt == 2:
            short_sf = g_params.get(
                "short_sf", [[0, 0, 0] for _ in range(13)]
            )
            first_short = 3 if mixed else 0
            vals = list(long_sf[:6]) if mixed else []
            n_short = (sum(nsfb) - len(vals)) // 3
            for sb in range(first_short, first_short + n_short):
                vals.extend(short_sf[sb])
        else:
            vals = list(long_sf)
        b = 0
        for part in range(4):
            for _ in range(nsfb[part]):
                if slen[part] and (vals[b] >> slen[part]):
                    raise ValueError(
                        "fixture encoder: scalefactor exceeds slen"
                    )
                if slen[part]:
                    w.write(vals[b], slen[part])
                elif vals[b]:
                    raise ValueError(
                        "fixture encoder: nonzero sf in zero-width part"
                    )
                b += 1
    else:
        slen1, slen2 = _SLEN[compress]
        if g_params.get("block_type", 0) == 0:
            groups = ((0, 6, slen1), (6, 11, slen1), (11, 16, slen2), (16, 21, slen2))
            for gi, (lo, hi, sl) in enumerate(groups):
                if gi in skip_groups:
                    continue
                for b in range(lo, hi):
                    if long_sf[b] >> sl:
                        raise ValueError("fixture encoder: scalefactor exceeds slen")
                    w.write(long_sf[b], sl)
        elif "short_sf" in g_params or g_params.get("mixed_block", 0):
            # short/mixed scalefactor emission mirroring
            # _read_scalefactors exactly: mixed writes long bands 0..7
            # at slen1 then short bands 3..5 at slen1; pure short
            # writes bands 0..5 at slen1; both then 6..11 at slen2,
            # window inner
            short_sf = g_params.get(
                "short_sf", [[0, 0, 0] for _ in range(13)]
            )

            def _put(v, sl):
                if v >> sl:
                    raise ValueError(
                        "fixture encoder: scalefactor exceeds slen"
                    )
                w.write(v, sl)

            if g_params.get("mixed_block", 0):
                for b in range(8):
                    _put(long_sf[b], slen1)
                first_short = 3
            else:
                first_short = 0
            for b in range(first_short, 12):
                sl = slen1 if b < 6 else slen2
                for wi in range(3):
                    _put(short_sf[b][wi], sl)
    for pos in range(0, big_limit, 2):
        x, y = int(abs(ix[pos])), int(abs(ix[pos + 1]))
        length, code = _TABLE_1_ENC[(x, y)]
        w.write(code, length)
        if x:
            w.write(1 if ix[pos] < 0 else 0, 1)
        if y:
            w.write(1 if ix[pos + 1] < 0 else 0, 1)
    for q in range(n_quads):
        base = big_limit + 4 * q
        quad = [int(abs(ix[base + j])) for j in range(4)]
        i = quad[0] * 8 + quad[1] * 4 + quad[2] * 2 + quad[3]
        w.write(15 - i, 4)
        for j in range(4):
            if quad[j]:
                w.write(1 if ix[base + j] < 0 else 0, 1)
    nbits = len(w.buf) * 8 + w.nacc
    g = _Granule()
    g.part2_3_length = nbits
    g.big_values = big_limit // 2
    g.global_gain = g_params.get("global_gain", 210)
    g.scalefac_compress = compress
    g.block_type = g_params.get("block_type", 0)
    g.window_switching = 1 if g.block_type else 0
    g.mixed_block = g_params.get("mixed_block", 0)
    g.table_select = [1, 1, 1]  # table 1 in all three regions
    g.subblock_gain = list(g_params.get("subblock_gain", (0, 0, 0)))
    # region0 ends at sfb[region0_count+1]: pick the spec-common (7, 3)
    g.region0_count = 7
    g.region1_count = 3
    g.preflag = g_params.get("preflag", 0)
    g.scalefac_scale = g_params.get("scalefac_scale", 0)
    g.count1table_select = 1
    w.align()
    return bytes(w.buf), g


def encode_mp3_frames(
    frames_ix: list,
    rate: int = 44100,
    n_channels: int = 1,
    bitrate_kbps: int = 128,
    mode_ext: int = 0,
    version: int = 1,
) -> bytes:
    """Spectral fixture -> a real MPEG Layer III stream.

    ``frames_ix``: per frame, per granule (2 for MPEG-1; 1 for LSF),
    per channel: a dict ``{"ix": int array (576, |values| <= 1),
    "count1_quads": int, "global_gain": int}``.  Emits header + side
    info + main data with ``main_data_begin = 0`` (no reservoir use;
    the decoder's reservoir path is exercised by a hand-built stream
    in tests), padding to the exact spec frame size with zero
    ancillary bits.  ``version`` 2/25 emits the LSF layout: one
    granule, 8-bit main_data_begin, no scfsi, 9-bit
    scalefac_compress, no preflag bit (long blocks only)."""
    lsf = version != 1
    if version == 1:
        rate_idx = _RATES.index(rate)
        bitrate_idx = _BITRATES.index(bitrate_kbps)
        ver_code = 3
    else:
        rates = _RATES_V2 if version == 2 else _RATES_V25
        rate_idx = rates.index(rate)
        bitrate_idx = _BITRATES_LSF_L23.index(bitrate_kbps)
        ver_code = 2 if version == 2 else 0
    n_gr = 1 if lsf else 2
    if rate == 8000 and any(
        g.get("mixed_block", 0) for f in frames_ix for gr in f for g in gr
    ):
        raise ValueError(
            "fixture encoder: mixed blocks unsupported at 8000 Hz "
            "(band tables do not meet at line 36 — decoder seam)"
        )
    mode = 3 if n_channels == 1 else (1 if mode_ext else 0)
    out = bytearray()
    for frame in frames_ix:
        # frame-level scfsi (per channel, 4 group flags): granule 1
        # skips the flagged groups' scalefactor bits (MPEG-1 only)
        scfsi = frame[0][0].get("scfsi", [[0] * 4 for _ in range(n_channels)])
        payloads = []
        sides = []
        for gr in range(n_gr):
            for ch in range(n_channels):
                params = dict(frame[gr][ch])
                params["lsf"] = lsf
                if gr == 1:
                    params["skip_groups"] = tuple(
                        gi for gi in range(4) if scfsi[ch][gi]
                    )
                bits, g = _encode_granule_bits(
                    np.asarray(frame[gr][ch]["ix"]), params
                )
                payloads.append((bits, g.part2_3_length))
                sides.append(g)
        w = MSBBitWriter()
        w.write(0, 8 if lsf else 9)  # main_data_begin
        if lsf:
            w.write(0, 1 if n_channels == 1 else 2)
        else:
            w.write(0, 5 if n_channels == 1 else 3)
            for ch in range(n_channels):
                for gi in range(4):
                    w.write(scfsi[ch][gi], 1)
        for g in sides:
            w.write(g.part2_3_length, 12)
            w.write(g.big_values, 9)
            w.write(g.global_gain, 8)
            w.write(g.scalefac_compress, 9 if lsf else 4)
            w.write(g.window_switching, 1)
            if g.window_switching:
                w.write(g.block_type, 2)
                w.write(g.mixed_block, 1)
                for t in g.table_select[:2]:
                    w.write(t, 5)
                for sbg in g.subblock_gain:
                    w.write(sbg, 3)
            else:
                for t in g.table_select:
                    w.write(t, 5)
                w.write(g.region0_count, 4)
                w.write(g.region1_count, 3)
            if not lsf:
                w.write(g.preflag, 1)
            w.write(g.scalefac_scale, 1)
            w.write(g.count1table_select, 1)
        w.align()
        side_bytes = bytes(w.buf)
        if lsf:
            assert len(side_bytes) == (9 if n_channels == 1 else 17)
        else:
            assert len(side_bytes) == (17 if n_channels == 1 else 32)
        # main data: concatenated part2_3 payloads, bit-packed
        mw = MSBBitWriter()
        for bits, nbits in payloads:
            r = MSBBitReader(bits)
            for _ in range(nbits):
                mw.write(r.read(1), 1)
        mw.align()
        main = bytes(mw.buf)
        hdr_word = (
            (0x7FF << 21)
            | (ver_code << 19)
            | (1 << 17)       # Layer III
            | (1 << 16)       # no CRC
            | (bitrate_idx << 12)
            | (rate_idx << 10)
            | (0 << 9)        # padding
            | (mode << 6)
            | (mode_ext << 4)
            | 0
        )
        frame_len = (72 if lsf else 144) * bitrate_kbps * 1000 // rate
        body = main
        budget = frame_len - 4 - len(side_bytes)
        if len(body) > budget:
            raise ValueError("fixture encoder: main data exceeds frame size")
        body = body + b"\x00" * (budget - len(body))
        out += hdr_word.to_bytes(4, "big") + side_bytes + body
    return bytes(out)
