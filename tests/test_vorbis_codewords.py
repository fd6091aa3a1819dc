"""Differential pin for the r15 incremental Vorbis codeword assignment
against the recursive prefix-trie reference it replaced: identical code
maps on every decodable length multiset, identical over/underspecified
rejections."""

from __future__ import annotations

import random

import pytest

from processor_edf_spark.operators.vorbis import (
    UnsupportedMediaError,
    _PrefixNode,
    _prefix_alloc,
    _prefix_complete,
    assign_codewords,
)


def _reference_assign(lengths):
    """The pre-r15 trie implementation, verbatim."""
    used = [e for e, l in enumerate(lengths) if l > 0]
    if not used:
        raise UnsupportedMediaError("vorbis: codebook with no codewords")
    if len(used) == 1:
        return {used[0]: (0, lengths[used[0]])}
    root = _PrefixNode()
    codes = {}
    for entry, length in enumerate(lengths):
        if length == 0:
            continue
        if length > 32:
            raise UnsupportedMediaError("vorbis: codeword too long")
        word = _prefix_alloc(root, length)
        if word is None:
            raise UnsupportedMediaError("vorbis: overspecified codebook")
        codes[entry] = (word, length)
    if not _prefix_complete(root):
        raise UnsupportedMediaError("vorbis: underspecified codebook")
    return codes


def _random_complete_lengths(rng, n_min=2, n_max=48):
    """Kraft-complete random length multiset via random tree splitting."""
    leaves = [0]  # root-as-leaf; the first split always fires (n_min>=2)
    while len(leaves) < rng.randint(n_min, n_max):
        i = rng.randrange(len(leaves))
        d = leaves.pop(i)
        if d >= 20:
            leaves.append(d)
            break
        leaves.extend([d + 1, d + 1])
    rng.shuffle(leaves)
    # sprinkle unused entries (length 0)
    out = []
    for v in leaves:
        if rng.random() < 0.2:
            out.append(0)
        out.append(v)
    return out


@pytest.mark.parametrize("seed", range(40))
def test_matches_trie_reference_on_complete_books(seed):
    rng = random.Random(seed)
    lengths = _random_complete_lengths(rng)
    assert assign_codewords(lengths) == _reference_assign(lengths)


@pytest.mark.parametrize("seed", range(40))
def test_matches_trie_reference_on_random_books(seed):
    """Arbitrary (often invalid) length multisets: both implementations
    must agree on accept/reject AND on the code map when accepting."""
    rng = random.Random(1000 + seed)
    lengths = [rng.randint(0, 8) for _ in range(rng.randint(2, 24))]
    try:
        ref = _reference_assign(lengths)
        ref_err = None
    except UnsupportedMediaError as e:
        ref, ref_err = None, str(e)
    try:
        new = assign_codewords(lengths)
        new_err = None
    except UnsupportedMediaError as e:
        new, new_err = None, str(e)
    assert (ref is None) == (new is None)
    if ref is not None:
        assert ref == new
    else:
        assert ref_err == new_err
