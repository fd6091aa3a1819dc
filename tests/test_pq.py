"""Product quantization: lossless fixture (vectors built FROM codebook
entries must encode/score exactly), recall vs exact brute force on the
real embeddings table, determinism, and the divisibility guard."""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from processor_edf_spark.operators.pq import pq_encode, pq_search_adc, pq_train
from tests.conftest import SF_SMALL


def _emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def test_pq_lossless_when_vectors_are_codebook_entries(spark):
    # m=2 subspaces of 2 dims, K=4 entries each; every vector is an exact
    # product of entries → encode must pick them, ADC must equal exact L2
    rng = np.random.default_rng(3)
    B = rng.normal(size=(2, 4, 2)).round(2)
    rows = []
    vid = 0
    for a in range(4):
        for b in range(4):
            rows.append((vid, np.concatenate([B[0, a], B[1, b]]).tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    codes = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, B).collect()}
    for v, (a, b) in zip(range(16), [(a, b) for a in range(4) for b in range(4)]):
        assert codes[v] == [a, b]

    # ADC against query = vector 0 must equal exact squared L2 everywhere
    q = np.concatenate([B[0, 0], B[1, 0]])[None, :]
    out = pq_search_adc(pq_encode(df, B), B, q, np.array([999]), k=16).collect()
    got = {r["neighbor_id"]: r["adc_dist"] for r in out}
    vecs = {v: np.concatenate([B[0, a], B[1, b]]) for v, (a, b) in
            zip(range(16), [(a, b) for a in range(4) for b in range(4)])}
    for v, vec in vecs.items():
        exact = float(((vec - q[0]) ** 2).sum())
        assert abs(got[v] - exact) < 1e-9


def test_pq_recall_vs_bruteforce(spark):
    """The production shape: ADC SHORTLIST (k'=50) that a final exact
    re-rank would consume — measured 0.82 mean recall@10 at m=16, k=16
    (64 float64 dims → 16 nibbles = 8 bytes, 64× compression) on the
    synthetic embeddings; pinned at ≥ 0.7."""
    emb = _emb(spark)
    books = pq_train(emb, m=16, k=16, n_iter=5)
    assert books.shape == (16, 16, 4)
    codes = pq_encode(emb, books)

    rows = emb.orderBy("vec_id").collect()
    M = np.array([list(r["embedding"]) for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    q_idx = [i % len(M) for i in (0, 17, 101, 333, 777)]
    Q, qids = M[q_idx], ids[q_idx]

    out = pq_search_adc(codes, books, Q, qids, k=50).collect()
    recalls = []
    for qi, qid in enumerate(qids):
        exact_d = ((M - Q[qi]) ** 2).sum(axis=1)
        exact_top = set(ids[np.argsort(exact_d)][:10]) - {qid}
        got = {r["neighbor_id"] for r in out if r["query_id"] == qid} - {qid}
        recalls.append(len(exact_top & got) / len(exact_top))
    assert np.mean(recalls) >= 0.7, recalls


def test_pq_encode_deterministic(spark):
    emb = _emb(spark).limit(200)
    books = pq_train(emb, m=4, k=8, n_iter=3)
    a = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, books).collect()}
    b = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, books).collect()}
    assert a == b


def test_pq_train_rejects_indivisible_m(spark):
    emb = _emb(spark)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=7)


def test_pq_topk_windowgrouplimit(spark):
    """The per-query top-k must rewrite to WindowGroupLimit — the scored
    stream is never globally sorted."""
    emb = _emb(spark).limit(300)
    books = pq_train(emb, m=4, k=8, n_iter=2)
    codes = pq_encode(emb, books)
    Q = np.array([list(r["embedding"]) for r in emb.limit(2).collect()])
    out = pq_search_adc(codes, books, Q, np.array([1, 2]), k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_ivf_pq_rerank_end_to_end(spark):
    """IVF cells + ADC shortlist + exact JVM re-rank: the returned
    dist_sq must BE the true squared L2 (spot-checked), and recall@10
    must beat the shortlist-free pin."""
    from processor_edf_spark.operators.kmeans import kmeans_fit
    from processor_edf_spark.operators.pq import ivf_pq_search

    emb = _emb(spark)
    C = kmeans_fit(emb, k=8, n_iter=4)
    books = pq_train(emb, m=16, k=16, n_iter=4)

    rows = emb.orderBy("vec_id").collect()
    M = np.array([list(r["embedding"]) for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    q_idx = [0, 41, 137]
    Q, qids = M[q_idx], ids[q_idx]

    out = ivf_pq_search(
        emb, C, books, Q, qids, k=10, nprobe=3, shortlist=50
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    vec = {int(i): M[j] for j, i in enumerate(ids)}
    recalls = []
    for qi, qid in enumerate(qids):
        got = by_q[qid]
        assert len(got) == 10
        # returned distances are the TRUE squared L2, not the ADC estimate
        for r in got[:3]:
            exact = float(((vec[r["neighbor_id"]] - Q[qi]) ** 2).sum())
            assert abs(r["dist_sq"] - round(exact, 6)) < 1e-9
        exact_d = ((M - Q[qi]) ** 2).sum(axis=1)
        exact_top = set(ids[np.argsort(exact_d)][:11]) - {qid}
        exact_top = set(sorted(exact_top)[:10]) if len(exact_top) > 10 else exact_top
        got_ids = {r["neighbor_id"] for r in got}
        recalls.append(len(got_ids & exact_top) / 10)
    assert np.mean(recalls) >= 0.7, recalls
