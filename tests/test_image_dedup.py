"""Perceptual image near-dup dedup (operators/image_dedup.py, r14).

Validation: hand-computed dHash bit-order vector, exact box-resize
means, EXACT brightness-shift invariance for both hashes (the design
property the driver row's oracle rests on), the pigeonhole band
completeness for hamming <= 3 on Spark, the linear components path,
and undecodable-payload singleton survival.  Reference scope:
Pennsieve/processor-EDF has no image surface (builder's-brief
multimodal axis)."""

import numpy as np
import pytest

from processor_edf_spark.operators.image_dedup import (
    box_resize,
    dhash64,
    hamming64,
    phash64,
    rgb_to_gray,
)


def _rand_rgb(h, w, seed, lo=30, hi=200):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, size=(h, w, 3), dtype=np.int64).astype(
        np.uint8
    )


def test_gray_and_box_resize_hand_values():
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[0, 0] = (100, 50, 200)  # (29900+29350+22800)//1000 = 82
    assert rgb_to_gray(rgb)[0, 0] == 82
    g = np.arange(16).reshape(4, 4)
    out = box_resize(g, 2, 2)
    # 2x2 boxes: mean of {0,1,4,5} = 2, {2,3,6,7} = 4 (floor of 4.5),
    # {8,9,12,13} = 10, {10,11,14,15} = 12
    assert out.tolist() == [[2, 4], [10, 12]]


def test_dhash_msb_order_hand_vector():
    # 8x9 exact size (no resize): alternating 1,0 rows -> every row's
    # comparisons are 10101010 -> 0xAA per row, msb-first
    row = np.array([1, 0] * 4 + [1], np.uint8)
    g = np.tile(row, (8, 1))
    rgb = np.stack([g, g, g], axis=2)  # gray == value exactly
    assert dhash64(rgb) == 0xAAAAAAAAAAAAAAAA


@pytest.mark.parametrize("shift", [1, 2, 5, 17])
def test_brightness_shift_invariance_exact(shift):
    """The driver-row design property: constant shifts (no clipping)
    leave BOTH hashes bit-identical."""
    rgb = _rand_rgb(24, 24, seed=3)
    shifted = (rgb.astype(np.int64) + shift).astype(np.uint8)
    assert dhash64(rgb) == dhash64(shifted)
    assert phash64(rgb) == phash64(shifted)


def test_phash_median_split_and_sensitivity():
    rgb = _rand_rgb(32, 32, seed=9)
    h = phash64(rgb)
    # 63 AC terms, distinct in practice -> exactly 31 above the median
    assert bin(h).count("1") == 31
    assert h < (1 << 63)  # the DC slot bit is always 0
    other = _rand_rgb(32, 32, seed=10)
    assert hamming64(phash64(rgb), phash64(other)) > 10


def test_hamming64():
    assert hamming64(0, 0) == 0
    assert hamming64(0b1011, 0b0001) == 2
    assert hamming64((1 << 64) - 1, 0) == 64


def test_small_perturbation_small_hamming():
    """A localized pixel-region change flips few dHash bits (the
    near-dup regime the banded path targets)."""
    rgb = _rand_rgb(48, 48, seed=5).astype(np.int64)
    pert = rgb.copy()
    pert[0:6, 0:6] += 40  # one downsample cell's neighborhood
    d = hamming64(dhash64(rgb), dhash64(pert.astype(np.uint8)))
    assert 0 < d <= 6


def test_spark_near_dup_pairs_and_components(spark):
    """End to end on Spark: exact copies group via the linear path;
    hamming <= 3 variants are found via the 4x16-bit band pigeonhole;
    an undecodable payload survives as a decoded=false singleton."""
    from processor_edf_spark.operators.image_dedup import (
        image_perceptual_hashes,
        perceptual_dedup_components,
        perceptual_near_dup_pairs,
    )
    from processor_edf_spark.operators.png import encode_png

    base = _rand_rgb(24, 24, seed=7)
    bright = (base.astype(np.int64) + 3).astype(np.uint8)
    pert = base.astype(np.int64).copy()
    pert[0:6, 0:6] += 40  # near-dup: small hamming, not identical
    other = _rand_rgb(24, 24, seed=8)
    rows = [
        (1, encode_png(base)),
        (2, encode_png(bright)),     # exact-hash duplicate of 1
        (3, encode_png(pert.astype(np.uint8))),  # near-dup of 1
        (4, encode_png(other)),      # unrelated
        (5, b"not an image"),        # undecodable
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = image_perceptual_hashes(media)
    hp = {r["doc_id"]: r for r in hashes.collect()}
    assert hp[1]["decoded"] and not hp[5]["decoded"]
    assert hp[1]["dhash"] == hp[2]["dhash"]
    assert hp[1]["phash"] == hp[2]["phash"]

    # linear path: only the exact-hash pair groups
    comps = {
        r["doc_id"]: r["component"]
        for r in perceptual_dedup_components(hashes).collect()
    }
    assert comps[1] == comps[2] == 1
    assert comps[3] == 3 and comps[4] == 4 and comps[5] == 5

    # banded near-dup path: (1,3) and (2,3) join the exact pair
    ham = hamming64(
        hp[1]["dhash"] & ((1 << 64) - 1), hp[3]["dhash"] & ((1 << 64) - 1)
    )
    assert 0 < ham <= 3
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in perceptual_near_dup_pairs(
            hashes, max_hamming=3
        ).collect()
    }
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 3)] == ham
    comps3 = {
        r["doc_id"]: r["component"]
        for r in perceptual_dedup_components(
            hashes, max_hamming=3
        ).collect()
    }
    assert comps3[1] == comps3[2] == comps3[3] == 1
    assert comps3[4] == 4 and comps3[5] == 5
