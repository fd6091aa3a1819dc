"""Perceptual audio near-dup dedup (operators/audio_dedup.py, r14).

Validation: EXACT power-of-two gain invariance (the design property
the driver row's oracle rests on), WAV-PCM16 <-> FLAC codec identity
through the real decoder registry, fingerprint sensitivity to signal
changes, short-clip padding determinism, and undecodable-payload
singleton survival through the shared components path.  Reference
scope: Pennsieve/processor-EDF has no audio surface (builder's-brief
multimodal axis)."""

import numpy as np
import pytest

from processor_edf_spark.operators.audio_dedup import (
    AFP_BANDS,
    AFP_FRAMES,
    audio_fingerprint64,
)
from processor_edf_spark.operators.flac import encode_flac
from processor_edf_spark.operators.media_codecs import (
    decode_audio,
    encode_wav_pcm16,
)


def _noise_int(n, seed, amp=1024):
    rng = np.random.default_rng(seed)
    return rng.integers(-amp, amp, size=n, dtype=np.int64)


@pytest.mark.parametrize("k", [1, 2, 3])
def test_gain_power_of_two_invariance_exact(k):
    """Scaling the float samples by 2^k leaves the fingerprint
    bit-identical — exponent-only scaling commutes with every float64
    op in the energy pipeline."""
    x = _noise_int(2304, seed=5).astype(np.float64) / 32768.0
    assert audio_fingerprint64(x) == audio_fingerprint64(x * (2.0**k))


def test_wav_flac_codec_identity():
    """The same integer samples through the WAV PCM16 writer and the
    FLAC writer decode to the same float convention and fingerprint
    identically — including under an exact integer gain."""
    x = _noise_int(2304, seed=11)
    for gain in (1, 4):
        xi = x * gain
        wav = encode_wav_pcm16(xi / 32767.0, 8000)
        flac = encode_flac(xi, 8000)
        _, _, sw = decode_audio(wav)
        _, _, sf = decode_audio(flac)
        assert np.array_equal(sw[:, 0], sf[:, 0])
        assert audio_fingerprint64(sw) == audio_fingerprint64(sf)
    # and the two gains fingerprint identically to each other
    w1 = encode_wav_pcm16(x / 32767.0, 8000)
    w4 = encode_wav_pcm16((x * 4) / 32767.0, 8000)
    assert audio_fingerprint64(decode_audio(w1)[2]) == (
        audio_fingerprint64(decode_audio(w4)[2])
    )


def test_fingerprint_sensitivity():
    a = audio_fingerprint64(_noise_int(2304, seed=1).astype(np.float64))
    b = audio_fingerprint64(_noise_int(2304, seed=2).astype(np.float64))
    assert a != b
    # a localized content change flips at least one bit
    x = _noise_int(2304, seed=3).astype(np.float64)
    y = x.copy()
    y[300:560] = -y[300:560]
    assert audio_fingerprint64(x) != audio_fingerprint64(y)


def test_short_clip_padding_deterministic():
    x = _noise_int(50, seed=9).astype(np.float64)
    h1 = audio_fingerprint64(x)
    h2 = audio_fingerprint64(x.copy())
    assert h1 == h2
    padded = np.concatenate(
        [x, np.zeros(AFP_FRAMES * 2 * AFP_BANDS - x.size)]
    )
    assert audio_fingerprint64(padded) == h1


def test_stereo_mono_mix():
    x = _noise_int(2304, seed=21).astype(np.float64)
    stereo = np.stack([x, x], axis=1)
    assert audio_fingerprint64(stereo) == audio_fingerprint64(x)


def test_spark_fingerprints_and_components(spark):
    """End-to-end on Spark: WAV/FLAC members of each base group land
    in one component; an undecodable payload survives as a singleton."""
    from pyspark.sql import functions as F

    from processor_edf_spark.operators.audio_dedup import (
        audio_perceptual_fingerprints,
    )
    from processor_edf_spark.operators.image_dedup import (
        perceptual_dedup_components,
    )

    rows = []
    for base in range(3):
        x = _noise_int(2304, seed=100 + base)
        rows.append((base * 10 + 0, encode_wav_pcm16(x / 32767.0, 8000)))
        rows.append((base * 10 + 1, encode_flac(x, 8000)))
        rows.append((base * 10 + 2, encode_flac(x * 2, 8000)))
    rows.append((999, b"not audio at all"))
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    fps = audio_perceptual_fingerprints(media)
    comps = perceptual_dedup_components(fps, "afp", max_hamming=0)
    got = {
        r["doc_id"]: r["component"] for r in comps.collect()
    }
    for base in range(3):
        assert got[base * 10] == got[base * 10 + 1] == got[base * 10 + 2]
    assert got[999] == 999
    comp_ids = {got[b * 10] for b in range(3)}
    assert len(comp_ids) == 3
    undec = fps.filter(~F.col("decoded")).collect()
    assert [r["doc_id"] for r in undec] == [999]
    assert undec[0]["afp"] is None
