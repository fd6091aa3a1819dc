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


# ---------------------------------------------------------------------------
# r14: fastText-style quality-classifier inference
# ---------------------------------------------------------------------------


def test_quality_classifier_scores_match_numpy(spark):
    """The Spark fold over the literal weight array reproduces the
    numpy dot product of the same embedding; sigmoid is monotone in
    the logit; keep is the logit-threshold gate."""
    import numpy as np

    from processor_edf_spark.operators.embed import (
        _embed_one,
        default_quality_weights,
        quality_classifier_scores,
    )

    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "zzzz qqqq xxxx"),
        (3, ""),
        (4, "a reasonable paragraph of ordinary english text."),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in quality_classifier_scores(df, threshold=0.1).collect()
    }
    w = np.array(default_quality_weights(64))
    for did, text in texts:
        exp = float(_embed_one(text, 64, 3) @ w)
        got = out[did]
        assert abs(got["logit"] - exp) < 1e-9
        assert abs(got["score"] - 1.0 / (1.0 + np.exp(-exp))) < 1e-9
        assert got["keep"] == (got["logit"] >= 0.1)
    # empty text: zero vector -> logit exactly 0
    assert out[3]["logit"] == 0.0


def test_quality_classifier_custom_weights_and_validation(spark):
    import pytest as _pytest

    from processor_edf_spark.operators.embed import (
        quality_classifier_scores,
    )

    df = spark.createDataFrame(
        [(1, "hello world")], "doc_id long, text string"
    )
    with _pytest.raises(ValueError, match="weights length"):
        quality_classifier_scores(df, weights=[1.0, 2.0])
    row = quality_classifier_scores(
        df, dim=4, ngram=2, weights=[0.0, 0.0, 0.0, 0.0], bias=2.5
    ).collect()[0]
    assert row["logit"] == 2.5 and row["keep"]


def test_corpus_job_optional_classifier_stage(spark):
    """classifier=None keeps the r12 report exactly; enabling it adds
    the classifier_gate row, re-bases exact_dedup's rows_in, and the
    survivor set is a subset of the rule-gated docs."""
    from processor_edf_spark.corpus_pipeline import run_corpus_job

    rows = [
        (i, "the quick brown fox jumps over the lazy dog number %d ok"
            % i)
        for i in range(40)
    ] + [(100 + i, "zz qq xx yy ww vv uu tt ss rr aa bb cc dd ee ff")
         for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    _clean0, report0 = run_corpus_job(spark, docs)
    stages0 = [r["stage"] for r in report0.collect()]
    assert "classifier_gate" not in stages0

    clean, report = run_corpus_job(
        spark, docs, classifier={"threshold": -0.2}
    )
    rep = {r["stage"]: r for r in report.collect()}
    assert "classifier_gate" in rep
    cg = rep["classifier_gate"]
    assert cg["rows_in"] == rep["rule_gate"]["rows_out"]
    assert cg["rows_out"] == rep["exact_dedup"]["rows_in"]
    assert cg["rows_out"] + cg["dropped"] == cg["rows_in"]
    assert clean.count() == rep["scrub_and_split"]["rows_out"]
