"""Perceptual audio near-duplicate fingerprints and the Spark dedup
paths over them — the audio sibling of the image dHash/pHash family
(operators/image_dedup.py) and of the text dedup family.

A training-data pipeline dedups audio too: re-encoded (WAV vs FLAC)
and gain-adjusted copies of one recording should collapse to one
survivor.  Byte-level hashing cannot see that; the spectral-difference
fingerprint here is invariant to those transforms by construction:

- **afp64** (audio fingerprint): mono-mix -> 9 equal frames -> per
  frame the energies of DFT bins 1..9 (explicit cos/sin matrices, no
  FFT library variance) -> 64 chromaprint-style double-difference
  bits: bit(t, b) = (E[t,b] - E[t,b+1]) > (E[t-1,b] - E[t-1,b+1])
  over the 8 frame transitions x 8 band pairs, msb-first.

Exactness of the invariances (stated because the driver row's oracle
relies on them):

- **Gain by a power of two is EXACTLY neutral.**  Scaling every float
  sample by 2^k only shifts exponents, and float64 addition and
  multiplication commute with power-of-two scaling bit-exactly, so
  every band energy scales by exactly 4^k and every comparison —
  including ties — is unchanged.  (Arbitrary gains are neutral only
  up to rounding, the usual perceptual-hash caveat.)
- **Lossless codec identity.**  WAV PCM16 and FLAC decode to the same
  float64 convention (int sample / 32768), so a PCM16<->FLAC
  re-encode of identical samples fingerprints identically.

Scale (the 100 TB shapes): fingerprinting is per-doc linear under the
decoder registry; grouping reuses the image family's machinery
unchanged — ``perceptual_dedup_components`` (bucket-star edges +
pointer jumping, the measured linear path) and
``perceptual_near_dup_pairs`` (banded audit path) are generic over
the hash column and accept these fingerprints as-is.

No reference parity: Pennsieve/processor-EDF has no audio surface
(builder's-brief multimodal axis; SURVEY.md §2 extension table).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

#: frames per fingerprint (-> AFP_FRAMES - 1 transitions)
AFP_FRAMES = 9
#: DFT bins per frame, bins 1..AFP_BANDS (-> AFP_BANDS - 1 band pairs)
AFP_BANDS = 9

_DFT_CACHE: dict = {}


def _dft_rows(frame_len: int):
    """cos/sin rows for bins 1..AFP_BANDS over a frame of
    ``frame_len`` samples (cached per length)."""
    got = _DFT_CACHE.get(frame_len)
    if got is None:
        k = np.arange(1, AFP_BANDS + 1)[:, None]
        n = np.arange(frame_len)[None, :]
        ang = 2.0 * np.pi * k * n / frame_len
        got = (np.cos(ang), np.sin(ang))
        _DFT_CACHE[frame_len] = got
    return got


def audio_fingerprint64(samples: np.ndarray) -> int:
    """Mono or (n, ch) samples (any real dtype) -> 64-bit
    spectral-difference fingerprint (module docstring).  Inputs
    shorter than 9 frames of 2·AFP_BANDS samples are zero-padded so
    tiny clips still fingerprint deterministically."""
    x = np.asarray(samples, np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    min_len = AFP_FRAMES * 2 * AFP_BANDS
    if x.size < min_len:
        x = np.concatenate([x, np.zeros(min_len - x.size)])
    frame_len = x.size // AFP_FRAMES
    cos_m, sin_m = _dft_rows(frame_len)
    frames = x[: AFP_FRAMES * frame_len].reshape(AFP_FRAMES, frame_len)
    re = frames @ cos_m.T
    im = frames @ sin_m.T
    energy = re * re + im * im  # (AFP_FRAMES, AFP_BANDS)
    d = energy[:, :-1] - energy[:, 1:]  # band-pair differences
    bits = d[1:] > d[:-1]  # frame transitions, (8, 8)
    h = 0
    for b in bits.reshape(-1):
        h = (h << 1) | (1 if b else 0)
    return h


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def audio_perceptual_fingerprints(
    media: DataFrame, id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, afp, n_samples, sample_rate, decoded): the 64-bit
    fingerprint per audio payload via the REAL decoder registry
    (media_codecs.decode_audio: WAV PCM/G.711/ADPCM, FLAC, MP3);
    undecodable payloads (honest seams, malformed bytes) get
    decoded = false and NULL fingerprints — they survive dedup as
    singletons downstream, same contract as the image family."""
    import pandas as pd

    out_schema = (
        f"{id_col} long, afp long, n_samples long, "
        "sample_rate long, decoded boolean"
    )

    def gen(batches):
        from processor_edf_spark.operators.media_codecs import (
            UnsupportedMediaError,
            decode_audio,
        )

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rate, _ch, samples = decode_audio(bytes(payload))
                    rows.append((
                        int(rid),
                        _to_signed(audio_fingerprint64(samples)),
                        int(samples.shape[0]),
                        int(rate),
                        True,
                    ))
                except UnsupportedMediaError:
                    rows.append((int(rid), None, None, None, False))
            # nullable Int64 columns: a None row must NOT coerce the
            # hash column to float64 — float64 silently rounds the low
            # bits of 64-bit fingerprints, and the rounding differs by
            # which rows share a batch (the streaming differential
            # contract caught exactly this)
            yield pd.DataFrame(
                {
                    id_col: pd.array(
                        [r[0] for r in rows], dtype="int64"
                    ),
                    "afp": pd.array(
                        [r[1] for r in rows], dtype="Int64"
                    ),
                    "n_samples": pd.array(
                        [r[2] for r in rows], dtype="Int64"
                    ),
                    "sample_rate": pd.array(
                        [r[3] for r in rows], dtype="Int64"
                    ),
                    "decoded": [r[4] for r in rows],
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        gen, schema=out_schema
    )
