"""Distributed PageRank vs numpy power iteration, and rank-canonical
dedup survivor selection."""

from __future__ import annotations

import numpy as np
import pytest

from processor_edf_spark.operators.pagerank import canonical_by_rank, pagerank

pytestmark = pytest.mark.slow

DAMP = 0.85


def _numpy_pagerank(edges, n_iter=20):
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    # undirected: both directions
    adj = [[] for _ in range(n)]
    for a, b in edges:
        adj[idx[a]].append(idx[b])
        adj[idx[b]].append(idx[a])
    adj = [sorted(set(a)) for a in adj]
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.full(n, (1.0 - DAMP) / n)
        dangling = sum(r[i] for i in range(n) if not adj[i])
        nxt += DAMP * dangling / n
        for i in range(n):
            if adj[i]:
                share = r[i] / len(adj[i])
                for j in adj[i]:
                    nxt[j] += DAMP * share
        r = nxt
    return {v: r[idx[v]] for v in nodes}


EDGES = [(1, 2), (2, 3), (3, 1), (3, 4), (10, 11)]


def test_pagerank_matches_numpy_power_iteration(spark):
    pairs = spark.createDataFrame(EDGES, ["vec_a", "vec_b"])
    got = {r["node"]: r["rank"] for r in pagerank(pairs, n_iter=15).collect()}
    ref = _numpy_pagerank(EDGES, n_iter=15)
    assert set(got) == set(ref)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for v in ref:
        assert abs(got[v] - ref[v]) < 1e-9, (v, got[v], ref[v])
    # 3 has the most connections in the triangle+tail -> highest rank
    assert max(got, key=got.get) == 3


def test_canonical_by_rank_picks_central_doc(spark):
    entities = spark.createDataFrame(
        [(i, f"doc{i}") for i in (1, 2, 3, 4, 10, 11, 99)],
        ["vec_id", "payload"],
    )
    pairs = spark.createDataFrame(EDGES, ["vec_a", "vec_b"])
    surv = sorted(
        r["vec_id"]
        for r in canonical_by_rank(entities, pairs, "vec_id").collect()
    )
    # component {1,2,3,4} -> 3 (highest centrality, beats lowest-id 1);
    # component {10,11} -> 10 (tie on symmetric pair, lowest id);
    # singleton 99 survives
    assert surv == [3, 10, 99]


def test_pagerank_empty_pairs_yields_all_singletons(spark):
    """No duplicates found (empty pair frame) is a realistic production
    input: pagerank returns an empty rank frame instead of dividing by
    n=0, and canonical_by_rank keeps every entity as a singleton."""
    entities = spark.createDataFrame(
        [(i, f"doc{i}") for i in (1, 2, 3)], ["vec_id", "payload"]
    )
    pairs = spark.createDataFrame([], "vec_a long, vec_b long")
    assert pagerank(pairs).count() == 0
    surv = sorted(
        r["vec_id"]
        for r in canonical_by_rank(entities, pairs, "vec_id").collect()
    )
    assert surv == [1, 2, 3]


def test_pagerank_tol_converges_early_and_matches_fixed_run(spark):
    """With tol set, the loop exits on the L1 delta and the result
    matches a long fixed-iteration run to the tolerance."""
    pairs = spark.createDataFrame(EDGES, ["vec_a", "vec_b"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank(pairs, n_iter=200, tol=1e-12).collect()
    }
    ref = _numpy_pagerank(EDGES, n_iter=100)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for v in ref:
        assert abs(got[v] - ref[v]) < 1e-9


def test_pagerank_tol_exhaustion_raises(spark):
    """A chain graph mixes slowly: one round cannot reach a 1e-12 L1
    delta, so exhausting n_iter with tol set must raise (the
    connected_components discipline) instead of returning an
    unconverged ranking."""
    import pytest

    chain = [(i, i + 1) for i in range(30)]
    pairs = spark.createDataFrame(chain, ["vec_a", "vec_b"])
    with pytest.raises(RuntimeError, match="exhausted"):
        pagerank(pairs, n_iter=2, tol=1e-12)
