"""Feature-hashing embeddings and the text → embedding → ANN composition:
determinism, unit norm, identical-text identity, and the full
hash_embed → kmeans → IVF+PQ pipeline retrieving a planted near-copy."""

from __future__ import annotations

import numpy as np

from processor_edf_spark.operators.embed import hash_embed
from tests.conftest import SF_SMALL
import pytest

pytestmark = pytest.mark.slow


def test_hash_embed_deterministic_unit_norm(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(50)
    a = {r["vec_id"]: np.array(r["embedding"]) for r in hash_embed(docs).collect()}
    b = {r["vec_id"]: np.array(r["embedding"]) for r in hash_embed(docs).collect()}
    assert set(a) == set(b) and len(a) == 50
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
        assert abs(np.linalg.norm(a[k]) - 1.0) < 1e-12
        assert a[k].shape == (64,)


def test_hash_embed_identity_and_similarity_ordering(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup
        (3, "the quick brown fox jumped over the lazy dogs"), # near dup
        (4, "completely unrelated text about spark catalyst plans"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    v = {r["vec_id"]: np.array(r["embedding"]) for r in hash_embed(df).collect()}
    assert np.array_equal(v[1], v[2])  # identical text → identical vector
    cos_near = float(v[1] @ v[3])
    cos_far = float(v[1] @ v[4])
    assert cos_near > 0.8 > cos_far, (cos_near, cos_far)


def test_text_to_ann_end_to_end(spark):
    """The no-neural-model pipeline: hash_embed the corpus + one planted
    near-copy, learn IVF cells, PQ-encode, and the planted copy must be
    its original's top-1 neighbor through ivf_pq_search."""
    from pyspark.sql import functions as F

    from processor_edf_spark.operators.kmeans import kmeans_fit
    from processor_edf_spark.operators.pq import ivf_pq_search, pq_train

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(200)
    # plant a DISTINCTIVE pair (the corpus itself is template-heavy, so a
    # light mutation of a corpus doc is farther than its template kin)
    unique = (
        "zanzibar quokka helicopters rehearse quadratic marmalade sonnets "
        "beneath ultraviolet observatories while juggling porcelain axioms"
    )
    planted = spark.createDataFrame(
        [(9_999_998, unique), (9_999_999, unique + " coda")],
        "doc_id long, text string",
    )
    emb = hash_embed(
        docs.select("doc_id", "text").unionByName(planted)
    ).localCheckpoint(eager=True)

    C = kmeans_fit(emb, k=4, n_iter=4)
    books = pq_train(emb, m=16, k=16, n_iter=3)
    q = emb.filter(F.col("vec_id") == 9_999_998).first()
    out = ivf_pq_search(
        emb,
        C,
        books,
        np.array([list(q["embedding"])]),
        np.array([9_999_998]),
        k=3,
        nprobe=2,
        shortlist=20,
    ).collect()
    top1 = next(r for r in out if r["rank"] == 1)
    assert top1["neighbor_id"] == 9_999_999, out
