"""k-core decomposition over an edge list — dense-cluster extraction.

Completes the graph module (components → groups, pagerank → centrality,
triangles → local density): the k-CORE is the maximal subgraph in which
every vertex keeps degree ≥ k after everyone below the bar is removed —
the standard dense-region extractor.  On a near-dup graph the k-core
separates genuinely dense template/mirror families from the loose
periphery that pairwise thresholds let through; the triangle counts say
which vertices sit in cliques, the core says which survive mutual
support once weak members are peeled.

Algorithm: iterative peeling as aggregation — each round computes
degrees (one groupBy over the live edges), drops vertices below k, and
filters the edge list to survivors (two semi-joins); repeat until the
vertex count stops changing.  Round count is bounded by the peeling
depth (the degeneracy ordering's layer count), in practice tens of
rounds for heavy-tailed graphs; each round is linear in live edges with
hash-partitioned joins only — no per-vertex driver state.  Results are
``localCheckpoint()``ed per round (the components-loop lineage
discipline) and the loop RAISES on round exhaustion rather than
returning a half-peeled graph.

No oracle query: the peeling fixpoint is not monotone, so it has no
natural recursive-CTE form (the components closure does) —
``tests/test_kcore.py`` pins it against a pure-python reference peeler
instead, the components/pagerank precedent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from processor_edf_spark.materialize import materialize


def kcore_vertices(
    pairs: DataFrame,
    k: int,
    src: str = "vec_a",
    dst: str = "vec_b",
    max_rounds: int = 100,
) -> DataFrame:
    """(vertex, degree) for every vertex of the k-core — the degree is
    within the core subgraph (≥ k by definition).  Empty result when no
    k-core exists.  Raises ``RuntimeError`` on round exhaustion."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # Self-loops are dropped up front: the near-dup pair producers emit
    # a<b so never generate them, but this is public API — a (v,v) pair
    # would survive symmetrize+distinct as a single edge and inflate v's
    # degree by 1, admitting vertices the k-core definition excludes.
    no_loops = pairs.filter(F.col(src) != F.col(dst))
    edges = materialize(
        no_loops.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(no_loops.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    n_prev = -1
    for _ in range(max_rounds):
        deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("degree"))
        live = materialize(deg.filter(F.col("degree") >= k))
        n = live.count()
        if n == 0:
            return live
        if n == n_prev:
            return live
        n_prev = n
        keep = live.select("a")
        edges = materialize(
            edges.join(keep, "a", "left_semi")
            .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
        )
    raise RuntimeError(
        f"k-core peeling did not converge in {max_rounds} rounds"
    )
