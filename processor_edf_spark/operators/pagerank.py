"""Distributed PageRank over an edge list — graph centrality for the
near-dup graphs the LSH operators emit (minhash_lsh_pairs /
cosine_lsh_pairs / knn_graph_*): inside a duplicate cluster, the
highest-centrality document is the natural canonical survivor (a
quality-aware upgrade of connected_components' keep-lowest-id policy),
and on the kNN graph centrality ranks "hub" documents for curation.

Same iterative discipline as operators/kmeans.py and components.py:
- per round, ONE join (ranks ⋈ edges on src) + ONE groupBy(dst) sum —
  both hash-partitioned on the key, the classic scalable PageRank;
- dangling mass (nodes with no out-edges) is collected as a single
  scalar per round (O(1) driver data) and redistributed uniformly, so
  ranks sum to 1 every round;
- lineage truncated per round with localCheckpoint, driver holds loop
  control only.

Float determinism: the per-dst sum is a float aggregation whose
reduction order Spark chooses, so ranks are reproducible only to float
tolerance — centrality is a RANKING signal, not an oracle quantity; the
test pins it against numpy power iteration at 1e-9 relative tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from processor_edf_spark.materialize import materialize


def pagerank(
    pairs: DataFrame,
    src: str = "vec_a",
    dst: str = "vec_b",
    damping: float = 0.85,
    n_iter: int = 20,
    undirected: bool = True,
    tol: float | None = None,
) -> DataFrame:
    """(node, rank) with Σrank = 1.  ``undirected=True`` (the near-dup
    default) inserts both directions of every pair first.

    Convergence contract (mirrors ``connected_components``): with
    ``tol`` set, each round also collects the O(1) L1 rank delta and the
    loop exits early once delta < tol; if ``n_iter`` rounds exhaust
    without converging, raises ``RuntimeError`` instead of silently
    returning an unconverged ranking.  With ``tol=None`` (default) the
    loop runs exactly ``n_iter`` rounds — the fixed-power-iteration
    semantics the numpy-parity test pins."""
    edges = pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if undirected:
        edges = edges.union(pairs.select(F.col(dst).alias("s"), F.col(src).alias("d")))
    edges = materialize(edges.distinct())

    nodes = materialize(
        edges.select(F.col("s").alias("node"))
        .union(edges.select(F.col("d").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        # no-duplicates-found input: empty (node, rank) frame, so
        # canonical_by_rank's coalesce path keeps every entity a
        # singleton survivor instead of crashing on 1/n.
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = materialize(
        edges.groupBy("s")
        .agg(F.count(F.lit(1)).alias("deg"))
        # read twice per round (dangling mass + inflow shares): one
        # upfront materialization instead of 2·n_iter re-aggregations
    )

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    converged = tol is None
    for _ in range(n_iter):
        contribs = (
            ranks.join(out_deg, ranks["node"] == out_deg["s"], "left")
            .select(
                "node",
                "rank",
                "deg",
                (F.col("rank") / F.col("deg")).alias("share"),
            )
        )
        # dangling nodes (no out-edges) leak their whole rank: a
        # one-row aggregate redistributed uniformly.  It rides the
        # round's ONE job as a broadcast cross-join instead of a
        # per-round driver collect (which serialized a second full job
        # every iteration); the column arithmetic nests exactly like
        # the old python-side base = (1-d)/n + (d·dangling)/n, so ranks
        # stay bit-identical (pinned vs numpy power iteration).
        dang_df = (
            contribs.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang"))
        )
        inbound = (
            contribs.join(edges, contribs["node"] == edges["s"])
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum("share").alias("inflow"))
        )
        base = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping) * F.col("dang") / F.lit(float(n))
        )
        new_ranks = materialize(
            nodes.join(inbound, "node", "left")
            .crossJoin(F.broadcast(dang_df))
            .select(
                "node",
                (
                    base
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if tol is not None:
            # O(1) driver scalar per round, same discipline as the
            # dangling-mass collect above
            delta = (
                new_ranks.alias("a")
                .join(ranks.alias("b"), "node")
                .agg(F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))))
                .collect()[0][0]
            )
            ranks = new_ranks
            if delta < tol:
                converged = True
                break
        else:
            ranks = new_ranks
    if not converged:
        raise RuntimeError(
            f"pagerank: {n_iter} rounds exhausted with L1 delta >= {tol} — "
            "raise n_iter or loosen tol (slow-mixing graph)"
        )
    return ranks


def canonical_by_rank(
    entities: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "vec_a",
    dst: str = "vec_b",
) -> DataFrame:
    """Pick each duplicate component's canonical row by PageRank
    (highest centrality wins; rank ties break to the lowest id) — the
    quality-aware alternative to dedup_survivors' keep-lowest-id.
    Singletons (no edges) always survive."""
    from pyspark.sql import Window

    from processor_edf_spark.operators.components import connected_components

    comp = connected_components(pairs, src=src, dst=dst)
    pr = pagerank(pairs, src=src, dst=dst)
    labeled = (
        entities.join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .join(pr.withColumnRenamed("node", id_col), id_col, "left")
        .withColumn("component", F.coalesce(F.col("component"), F.col(id_col)))
        .withColumn("rank", F.coalesce(F.col("rank"), F.lit(0.0)))
    )
    w = Window.partitionBy("component").orderBy(
        F.col("rank").desc(), F.col(id_col).asc()
    )
    return (
        labeled.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "component", "rank")
    )
