"""Distributed BPE vs a pure-python Sennrich reference: identical merge
lists on the same corpus (deterministic tie-breaks), encode/train
consistency, and the reconstruction invariant."""

from __future__ import annotations

import collections

import pytest

pytestmark = pytest.mark.slow

from processor_edf_spark.operators.bpe import EOW, bpe_encode, bpe_train

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "new new newer newer lowest",
]


def _reference_bpe(texts: list[str], n_merges: int, min_count: int = 2):
    """Sennrich 2016 reference: word-frequency dict, argmax pair with
    (count desc, lexicographic) tie-break — the exact contract the
    distributed trainer pins."""
    vocab = collections.Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(list(w) + [EOW])] += 1
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for word, n in vocab.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b), _ = best
        merges.append((a, b))
        new_vocab = collections.Counter()
        for word, n in vocab.items():
            out, i = [], 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] += n
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_bpe_train_matches_reference(corpus_df):
    got = bpe_train(corpus_df, n_merges=12)
    want = _reference_bpe(CORPUS, n_merges=12)
    assert got == want
    # the famous toy-corpus property: frequent subwords emerge
    joined = {a + b for a, b in got}
    assert any(s.startswith("new") for s in joined), got
    assert any(s.startswith("lo") for s in joined), got


def test_bpe_encode_reconstructs_and_compresses(corpus_df):
    merges = bpe_train(corpus_df, n_merges=12)
    out = bpe_encode(corpus_df, merges).collect()
    for r in out:
        toks = list(r["bpe_tokens"])
        # reconstruction: stripping EOW and joining yields the original
        rebuilt = "".join(toks).replace(EOW, " ").strip()
        assert rebuilt == " ".join(r["text"].split())
        # compression: fewer tokens than characters
        assert len(toks) < len(r["text"].replace(" ", "")) + r["text"].count(" ") + 1


def test_bpe_encode_consistent_with_training_segmentation(corpus_df):
    """Rank-priority inference must reproduce the training segmentation:
    a word fully merged during training encodes to ONE token."""
    merges = bpe_train(corpus_df, n_merges=30)
    out = {r["text"]: list(r["bpe_tokens"]) for r in bpe_encode(corpus_df, merges).collect()}
    # 'low' appears 5 times — with 30 merges it becomes a single token
    assert out["low low low low low"] == ["low" + EOW] * 5


def test_bpe_local_and_distributed_paths_identical(corpus_df):
    """The driver-local merge loop (default) and the distributed
    per-round loop must learn the SAME merge list — same counts, same
    (count desc, lexicographic) tie-break, same overlap handling."""
    local = bpe_train(corpus_df, n_merges=15)
    dist = bpe_train(corpus_df, n_merges=15, force_distributed=True)
    assert local == dist
    # threshold guard: an impossible cap forces the distributed path,
    # which still matches
    capped = bpe_train(corpus_df, n_merges=15, max_local_words=1)
    assert capped == local


def test_bpe_train_documents_table_parity_to_exhaustion(spark):
    """The real documents table trains to vocabulary exhaustion (~106
    merges on the synthetic corpus) identically to the reference."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).select("text")
    texts = [r["text"] for r in docs.collect()]
    got = bpe_train(docs, n_merges=500, min_pair_count=1)
    assert got == _reference_bpe(texts, n_merges=500, min_count=1)
    assert len(got) > 100


def test_bpe_train_200_merges_vocab_scale(spark):
    """The vocab-scale pin: 200+ merges in seconds on a 3000-word
    Zipf-weighted corpus (driver-local loop — zero per-merge Spark
    jobs), byte-identical to the pure-python reference."""
    import random
    import time

    rng = random.Random(42)
    vocab = [
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                for _ in range(rng.randint(4, 12)))
        for _ in range(3000)
    ]
    texts = [
        " ".join(vocab[min(int(rng.paretovariate(1.1)), len(vocab) - 1)]
                 for _ in range(40))
        for _ in range(400)
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    t0 = time.perf_counter()
    got = bpe_train(docs, n_merges=200, min_pair_count=1)
    elapsed = time.perf_counter() - t0
    assert len(got) == 200
    assert got == _reference_bpe(texts, n_merges=200, min_count=1)
    assert elapsed < 60, f"200-merge training took {elapsed:.1f}s"


def test_bpe_train_min_count_stops(corpus_df):
    # absurd floor → no merges at all
    assert bpe_train(corpus_df, n_merges=10, min_pair_count=10_000) == []


def test_bpe_merges_roundtrip(spark, tmp_path, corpus_df):
    from processor_edf_spark.operators.bpe import load_merges, save_merges

    merges = bpe_train(corpus_df, n_merges=8)
    path = str(tmp_path / "merges")
    save_merges(spark, merges, path)
    assert load_merges(spark, path) == merges
    # encoding with the reloaded merges is identical
    a = {r["doc_id"]: list(r["bpe_tokens"])
         for r in bpe_encode(corpus_df, merges).collect()}
    b = {r["doc_id"]: list(r["bpe_tokens"])
         for r in bpe_encode(corpus_df, load_merges(spark, path)).collect()}
    assert a == b
