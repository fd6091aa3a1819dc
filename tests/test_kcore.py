"""k-core peeling vs a pure-python reference peeler, on crafted graphs
and on the real minhash near-dup pair output."""

from __future__ import annotations

import pytest

from processor_edf_spark.operators.kcore import kcore_vertices

SCHEMA = "vec_a long, vec_b long"


def _ref_kcore(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in [v for v, ns in adj.items() if len(ns) < k]:
            for n in adj[v]:
                adj[n].discard(v)
            del adj[v]
            changed = True
    return {v: len(ns) for v, ns in adj.items()}


def _spark_kcore(spark, edges, k):
    df = kcore_vertices(spark.createDataFrame(edges, SCHEMA), k)
    return {r["a"]: r["degree"] for r in df.collect()}


def test_clique_plus_tail(spark):
    """A 4-clique with a pendant chain: the 3-core is exactly the
    clique; the chain peels away layer by layer."""
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tail = [(4, 5), (5, 6), (6, 7)]
    edges = clique + tail
    assert _spark_kcore(spark, edges, 3) == _ref_kcore(edges, 3) == {
        1: 3, 2: 3, 3: 3, 4: 3
    }
    # the 1-core of this connected graph is everything
    assert _spark_kcore(spark, edges, 1) == _ref_kcore(edges, 1)


def test_cascade_peeling(spark):
    """Removing one vertex drops its neighbor below k in a later round —
    the iterative cascade a single-pass degree filter gets wrong."""
    # path 1-2-3-4-5: 2-core is empty, but every inner vertex has deg 2
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    assert _ref_kcore(edges, 2) == {}
    assert _spark_kcore(spark, edges, 2) == {}
    # cycle 1-2-3-4-5-1: the 2-core is the whole cycle
    cyc = edges + [(5, 1)]
    assert _spark_kcore(spark, cyc, 2) == _ref_kcore(cyc, 2)


def test_real_near_dup_graph(spark):
    from processor_edf_spark.plans import QUERIES

    pairs = QUERIES["minhash_lsh_pairs"](spark, "/root/testdata/sf0.001")
    edges = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    for k in (1, 2, 3):
        got = {
            r["a"]: r["degree"]
            for r in kcore_vertices(
                pairs.selectExpr("doc_a AS vec_a", "doc_b AS vec_b"), k
            ).collect()
        }
        assert got == _ref_kcore(edges, k), k


def test_self_loops_do_not_inflate_degree(spark):
    """A (v, v) pair is filtered up front: on the path 1-2-3 the 2-core
    is empty, and self-loops at the endpoints must not fake the missing
    degree (unfiltered they'd make every vertex look degree-2 and the
    peeler would wrongly return the whole path as a 2-core)."""
    path = [(1, 2), (2, 3)]
    loops = [(1, 1), (3, 3)]
    assert _ref_kcore(path, 2) == {}
    assert _spark_kcore(spark, path + loops, 2) == {}
    # and with loops removed the loop-free answer is unchanged
    assert _spark_kcore(spark, path + loops, 1) == _ref_kcore(path, 1)


def test_invalid_k_raises(spark):
    with pytest.raises(ValueError):
        kcore_vertices(spark.createDataFrame([(1, 2)], SCHEMA), 0)
