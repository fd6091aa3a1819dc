"""Perceptual image near-duplicate fingerprints (dHash / pHash) and
the Spark dedup paths over them — the multimodal sibling of the text
dedup family (minhash/simhash/LSH, operators/lsh_dedup.py).

A training-data pipeline dedups images too: re-encoded, re-scaled and
brightness-shifted copies of one crawl image should collapse to one
survivor.  Byte-level hashing cannot see that; perceptual hashes are
invariant to those transforms by construction:

- **dHash** (difference hash): integer luma -> 8x9 box-mean downsample
  -> 64 adjacent-pixel comparisons.  Exactly invariant to constant
  brightness shifts (comparisons are unchanged) and to any transform
  that preserves the downsampled gradient signs.
- **pHash** (DCT hash): 32x32 box-mean luma -> 2D DCT-II -> the 8x8
  low-frequency block, DC EXCLUDED -> median threshold over the 63 AC
  terms.  Constant shifts move only the DC coefficient, so the hash is
  exactly invariant to them.

Both are pure integer/deterministic-float numpy (no image libs); the
decode step is the REAL pure-python decoder registry
(media_codecs.decode_image: PNG/JPEG/GIF/TIFF/WebP/VP8/...).

Scale (the 100 TB shapes):

- ``perceptual_dedup_components(..., max_hamming=0)`` — the linear
  path: identical hashes bucket by the full 64-bit value and feed the
  bucket-star + pointer-jumping closure of operators/lsh_dedup.py
  (g-1 edges per group of g, no pair enumeration).
- ``perceptual_near_dup_pairs(..., max_hamming=k)`` — the audit path:
  4 x 16-bit band buckets (a hash pair within hamming 3 shares at
  least one band by pigeonhole), candidate pairs verified JVM-side
  with ``bit_count(a XOR b)``.  Pair output is quadratic in true dup
  pairs by semantics, same caveat as simhash_near_pairs; band-key
  entropy is 2^16 per band, so corpora approaching that scale need
  wider bands (the lsh_dedup.py module docstring's entropy note).

No reference parity: Pennsieve/processor-EDF has no image surface
(builder's-brief multimodal axis; SURVEY.md §2 extension table).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from processor_edf_spark.operators.components import connected_components
from processor_edf_spark.operators.lsh_dedup import lsh_components

#: number of 16-bit bands over the 64-bit hash — pigeonhole guarantees
#: a shared band for any pair within hamming distance 3
N_BANDS = 4


def rgb_to_gray(rgb: np.ndarray) -> np.ndarray:
    """HxWx3 uint8 -> HxW int64 integer luma ((299R+587G+114B)//1000
    — the BT.601 weights in exact integer form, so a constant shift of
    all three channels shifts the luma by exactly that constant)."""
    a = np.asarray(rgb, np.int64)
    if a.ndim == 2:
        return a
    return (299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000


def box_resize(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Integer box-mean downsample: output cell (i, j) is the floor
    mean of the input box [i*H//out_h, (i+1)*H//out_h) x [...].  A
    constant input shift propagates to an exact constant output shift
    ((sum + k*n)//n == sum//n + k)."""
    g = np.asarray(gray, np.int64)
    h, w = g.shape
    if h < out_h or w < out_w:  # upscale by nearest (tiny inputs)
        ri = (np.arange(out_h) * h) // out_h
        ci = (np.arange(out_w) * w) // out_w
        return g[np.ix_(ri, ci)]
    # vectorized box sums via the 2D prefix-sum (one pass regardless
    # of output geometry), floor-divided by the per-box cell count
    ps = np.zeros((h + 1, w + 1), np.int64)
    ps[1:, 1:] = g.cumsum(0).cumsum(1)
    rb = (np.arange(out_h + 1) * h) // out_h
    cb = (np.arange(out_w + 1) * w) // out_w
    sums = (
        ps[np.ix_(rb[1:], cb[1:])]
        - ps[np.ix_(rb[:-1], cb[1:])]
        - ps[np.ix_(rb[1:], cb[:-1])]
        + ps[np.ix_(rb[:-1], cb[:-1])]
    )
    counts = (rb[1:] - rb[:-1])[:, None] * (cb[1:] - cb[:-1])[None, :]
    return sums // counts


def dhash64(rgb: np.ndarray) -> int:
    """64-bit difference hash: 8x9 box-mean luma, bit (r*8 + c) set
    when cell (r, c) > cell (r, c+1), bit 0 = (0, 0) comparison at the
    most significant end (msb-first packing)."""
    g = box_resize(rgb_to_gray(rgb), 8, 9)
    h = 0
    for r in range(8):
        for c in range(8):
            h = (h << 1) | (1 if g[r, c] > g[r, c + 1] else 0)
    return h


_DCT32 = None


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos((2 * i + 1) * k * np.pi / (2 * n))
    m[0] *= 1.0 / np.sqrt(2.0)
    return m * np.sqrt(2.0 / n)


def phash64(rgb: np.ndarray) -> int:
    """64-bit DCT hash: 32x32 box-mean luma -> orthonormal 2D DCT-II
    -> 8x8 low block, DC excluded -> median threshold over the 63 AC
    terms (bit 63, the DC slot, is always 0).  Exactly invariant to
    constant brightness shifts (only DC moves)."""
    global _DCT32
    if _DCT32 is None:
        _DCT32 = _dct_matrix(32)
    g = box_resize(rgb_to_gray(rgb), 32, 32).astype(np.float64)
    # exact mean-centering BEFORE the transform: the mean of 1024
    # integer cells is a dyadic rational (power-of-two divisor), so
    # g - mean is bit-exact — a constant brightness shift then yields
    # the IDENTICAL centered signal, making the AC comparisons
    # bit-stable (computing the DCT on the shifted signal instead
    # would perturb the AC terms by float non-distributivity and flip
    # median-tie bits)
    g -= g.sum() / g.size
    d = _DCT32 @ g @ _DCT32.T
    low = d[:8, :8].reshape(-1)[1:]  # DC excluded
    med = float(np.median(low))
    h = 0
    for v in low:
        h = (h << 1) | (1 if v > med else 0)
    return h


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def image_perceptual_hashes(
    media: DataFrame, id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, dhash, phash, decoded): both 64-bit hashes per image via
    the REAL decoder registry; undecodable payloads (honest
    UnsupportedMediaError seams, malformed bytes) get decoded = false
    and NULL hashes — they survive dedup as singletons downstream."""
    import pandas as pd

    out_schema = f"{id_col} long, dhash long, phash long, decoded boolean"

    def gen(batches):
        from processor_edf_spark.operators.media_codecs import (
            UnsupportedMediaError,
            decode_image,
        )

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    img = decode_image(bytes(payload))
                    rows.append((
                        int(rid),
                        _to_signed(dhash64(img)),
                        _to_signed(phash64(img)),
                        True,
                    ))
                except UnsupportedMediaError:
                    rows.append((int(rid), None, None, False))
            # nullable Int64 columns: a None row must NOT coerce the
            # hash columns to float64 — float64 silently rounds the
            # low bits of 64-bit hashes, and the rounding differs by
            # which rows share a batch (the r14 streaming fingerprint
            # contract caught this in the audio sibling; same latent
            # bug here — XOR/hamming over rounded hashes is wrong)
            yield pd.DataFrame(
                {
                    id_col: pd.array(
                        [r[0] for r in rows], dtype="int64"
                    ),
                    "dhash": pd.array(
                        [r[1] for r in rows], dtype="Int64"
                    ),
                    "phash": pd.array(
                        [r[2] for r in rows], dtype="Int64"
                    ),
                    "decoded": [r[3] for r in rows],
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        gen, schema=out_schema
    )


def hash_band_buckets(
    hashes: DataFrame, hash_col: str = "dhash",
    id_col: str = "doc_id", bands: int = N_BANDS,
) -> DataFrame:
    """(id, band_key): one row per 16-bit band of the hash; NULL hash
    (undecoded) -> NULL band key (lsh_components keeps those ids as
    singletons).  JVM-side bit arithmetic only."""
    width = 64 // bands
    mask = (1 << width) - 1
    parts = [
        hashes.select(
            F.col(id_col),
            F.when(
                F.col(hash_col).isNotNull(),
                F.concat(
                    F.lit(f"{b}:"),
                    F.shiftrightunsigned(F.col(hash_col), b * width)
                    .bitwiseAND(F.lit(mask)),
                ),
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def perceptual_near_dup_pairs(
    hashes: DataFrame, hash_col: str = "dhash",
    id_col: str = "doc_id", max_hamming: int = 3,
) -> DataFrame:
    """Verified near-dup pairs (id_a < id_b, hamming): band-bucket
    candidates, exact hamming via JVM bit_count on XOR.  Pigeonhole:
    complete for max_hamming <= N_BANDS - 1."""
    buckets = hash_band_buckets(hashes, hash_col, id_col)
    a = buckets.alias("a")
    b = buckets.alias("b")
    cands = (
        a.join(b, F.col("a.band_key") == F.col("b.band_key"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    ha = hashes.select(
        F.col(id_col).alias("id_a"), F.col(hash_col).alias("_ha")
    )
    hb = hashes.select(
        F.col(id_col).alias("id_b"), F.col(hash_col).alias("_hb")
    )
    return (
        cands.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("_ha").bitwiseXOR(F.col("_hb"))
            ).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def perceptual_dedup_components(
    hashes: DataFrame, hash_col: str = "dhash",
    id_col: str = "doc_id", max_hamming: int = 0,
) -> DataFrame:
    """(id, component): perceptual duplicate groups, component = the
    minimum member id.  max_hamming 0 is the LINEAR scale path (full
    hash as the bucket key); k > 0 verifies banded candidates by
    hamming first (audit path)."""
    if max_hamming == 0:
        # Exactly ONE bucket row per id (the full 64-bit hash), so the
        # buckets are DISJOINT and the transitive closure is the bucket
        # partition itself: component = min(id) within each hash value.
        # The general lsh_components/pointer-jumping path (needed when
        # ids carry multiple band keys) costs 4+ jobs of checkpoints
        # and convergence counts here for a closure that is a single
        # groupBy — one aggregation + one equi-join (AQE skew-splittable,
        # unlike a window over the hash, when one dup group is huge).
        # NULL hash (undecoded) matches no root and coalesces to self —
        # the same singleton discipline as lsh_components.
        roots = (
            hashes.filter(F.col(hash_col).isNotNull())
            .groupBy(hash_col)
            .agg(F.min(id_col).alias("_root"))
        )
        return hashes.join(roots, [hash_col], "left").select(
            F.col(id_col),
            F.coalesce(F.col("_root"), F.col(id_col)).alias("component"),
        )
    pairs = perceptual_near_dup_pairs(
        hashes, hash_col, id_col, max_hamming
    )
    comp = connected_components(pairs, src="id_a", dst="id_b")
    ids = hashes.select(id_col).distinct()
    return ids.join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    ).select(
        id_col,
        F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
    )
