"""Connected components / transitive dedup — verified against a pure
Python union-find on the same edges, including the A~B, B~C chain case
where pairwise anti-join over-deletes."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from processor_edf_spark.operators.components import (
    connected_components,
    dedup_survivors,
)


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id representative per component
    return {n: find(n) for n in nodes}


CASES = {
    "chain": [(1, 2), (2, 3), (3, 4)],  # path: one component, min=1
    "two_triangles": [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)],
    "star": [(5, 6), (5, 7), (5, 8), (5, 9)],
    "bridge": [(1, 2), (3, 4), (2, 3), (20, 21)],
    "long_path": [(i, i + 1) for i in range(30)],  # stresses O(log n) rounds
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_components_match_union_find(spark, name):
    edges = CASES[name]
    nodes = sorted({n for e in edges for n in e})
    expected = _union_find(edges, nodes)

    pairs = spark.createDataFrame(edges, "vec_a long, vec_b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == expected


def test_dedup_survivors_transitive_vs_pairwise(spark):
    """A~B, B~C, A!~C: pairwise anti-join on vec_b drops both B and C;
    transitive dedup keeps exactly one survivor (A) per group — plus all
    singletons untouched."""
    entities = spark.createDataFrame(
        [(i, f"d{i}") for i in (1, 2, 3, 50)], "vec_id long, payload string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "vec_a long, vec_b long")
    out = sorted(
        r["vec_id"] for r in dedup_survivors(entities, pairs, "vec_id").collect()
    )
    assert out == [1, 50]


def test_components_on_lsh_pairs(spark, sf_dir):
    """End-to-end on real LSH output: every component representative must
    be the min id of its group and every edge must stay intra-component."""
    from processor_edf_spark.plans.similarity import _lsh_pair_frame

    pairs = _lsh_pair_frame(spark, sf_dir).select("vec_a", "vec_b")
    comp = connected_components(pairs)
    joined = (
        pairs.join(comp.withColumnRenamed("node", "vec_a"), "vec_a")
        .withColumnRenamed("component", "ca")
        .join(comp.withColumnRenamed("node", "vec_b"), "vec_b")
        .withColumnRenamed("component", "cb")
    )
    assert joined.filter(F.col("ca") != F.col("cb")).count() == 0
    # representative is a member and the minimum of its component
    mins = comp.groupBy("component").agg(F.min("node").alias("mn")).collect()
    assert all(r["component"] == r["mn"] for r in mins)


def test_unconverged_raises_instead_of_silent_mislabel(spark):
    """Exhausting max_rounds with labels still changing must raise, not
    return wrong components that dedup_survivors would act on blindly."""
    edges = [(i, i + 1) for i in range(40)]  # diameter 40 >> 2^1 rounds
    pairs = spark.createDataFrame(edges, ["vec_a", "vec_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_rounds=1).collect()
