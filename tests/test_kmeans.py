"""Distributed Lloyd's k-means vs a pure-numpy reference with identical
deterministic policies (lowest-id seeding, first-min argmin, empty
clusters keep their centroid) — the distributed update must be
bit-compatible in structure and numerically equal within float-sum
reassociation tolerance, and inertia must be monotone non-increasing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow

from processor_edf_spark.operators.kmeans import (
    assign_clusters,
    kmeans_fit,
    kmeans_inertia,
)


def _numpy_kmeans(X: np.ndarray, k: int, n_iter: int) -> np.ndarray:
    C = X[:k].copy()
    for _ in range(n_iter):
        D = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(D, axis=1)
        newC = C.copy()
        for c in range(k):
            m = a == c
            if m.any():
                newC[c] = X[m].mean(axis=0)
        if np.allclose(newC, C, rtol=0, atol=0):
            break
        C = newC
    return C


def _blobs(n=120, d=8, k=3, spread=0.05):
    rng = np.random.RandomState(7)
    centers = rng.randn(k, d) * 3
    X = np.vstack(
        [centers[i % k] + spread * rng.randn(d) for i in range(n)]
    )
    return X


def _df(spark, X):
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(X), dtype=np.int64), "embedding": [r.tolist() for r in X]}
    )
    return spark.createDataFrame(pdf)


def test_kmeans_matches_numpy_reference(spark):
    X = _blobs()
    df = _df(spark, X)
    C_spark = kmeans_fit(df, k=3, n_iter=5)
    C_np = _numpy_kmeans(X, k=3, n_iter=5)
    np.testing.assert_allclose(C_spark, C_np, rtol=1e-9, atol=1e-12)


def test_kmeans_separates_blobs_and_inertia_monotone(spark):
    X = _blobs()
    df = _df(spark, X)
    inertias = [
        kmeans_inertia(df, kmeans_fit(df, k=3, n_iter=it)) for it in (1, 3, 6)
    ]
    assert inertias[0] >= inertias[1] >= inertias[2]
    # converged assignment groups the construction's i%3 pattern
    C = kmeans_fit(df, k=3, n_iter=6)
    a = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(df, C).collect()
    }
    for i in range(len(X)):
        assert a[i] == a[i % 3]  # same blob -> same cluster


def test_assign_tie_breaks_to_lowest_centroid(spark):
    df = _df(spark, np.array([[0.0, 0.0]]))
    C = np.array([[1.0, 0.0], [-1.0, 0.0]])  # equidistant
    got = assign_clusters(df, C).collect()[0]
    assert got["cluster"] == 0


def test_ivf_search_recall_vs_bruteforce(spark):
    """kmeans_fit -> ivf_search end-to-end on the sf0.01 embeddings:
    probe-3 over 10 learned cells must recover most of the brute-force
    top-5 for the 10 query vectors (measured 0.9; pinned conservatively)."""
    from processor_edf_spark.operators.kmeans import ivf_search
    from processor_edf_spark.plans.registry import load

    (emb,) = load(spark, "/root/testdata/sf0.01", "embeddings")
    pdf = emb.toPandas()
    X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    C = kmeans_fit(emb, k=10, n_iter=6)

    norms = np.linalg.norm(X, axis=1)
    cos = (X @ X.T) / np.outer(norms, norms)
    np.fill_diagonal(cos, -2)
    q_idx = np.arange(10)
    got = ivf_search(emb, C, X[q_idx], ids[q_idx], k=5, nprobe=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = []
    for qi in q_idx:
        true5 = set(ids[np.argsort(-cos[qi])[:5]])
        recalls.append(len(true5 & by_q.get(ids[qi], set())) / 5)
    assert np.mean(recalls) >= 0.7


def test_kmeans_fit_k_exceeds_rows_raises(spark):
    import pytest

    df = _df(spark, np.array([[0.0, 1.0], [1.0, 0.0]]))
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_fit(df, k=5, n_iter=1)


def test_ivf_search_scores_only_probed_cells(spark):
    """The IVF contract: rows outside the probed cells are never scored.
    Three well-separated blobs, nprobe=1, k = corpus size — if the scan
    were unpruned, far-blob members would appear in the result (k is big
    enough to admit every scored candidate); with pruning, the neighbor
    set is exactly the probed cell minus the query itself."""
    from processor_edf_spark.operators.kmeans import ivf_search

    rng = np.random.RandomState(7)
    centers = np.array([[40.0, 0.0], [0.0, 40.0], [-40.0, -40.0]])
    X = np.vstack([centers[i % 3] + 0.1 * rng.randn(2) for i in range(30)])
    df = _df(spark, X)
    C = kmeans_fit(df, k=3, n_iter=5)

    q_idx = [0]  # blob 0 member
    got = ivf_search(df, C, X[q_idx], np.array(q_idx), k=len(X), nprobe=1)
    neighbors = {r["neighbor_id"] for r in got.collect()}
    blob0 = {i for i in range(30) if i % 3 == 0}
    assert neighbors == blob0 - {0}
