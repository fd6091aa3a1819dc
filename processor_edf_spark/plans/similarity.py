"""Similarity search over the `embeddings` table (array<float>, 64-dim).

- cosine_pairs: brute-force near-dup pairs above a cosine threshold.
- ann_topk_bruteforce: exact top-k neighbors — the correctness baseline.
- ann_ivf_label: IVF-style two-stage search — probe the nearest coarse
  centroid, then search only that cluster.  The scale path: at N vectors
  and C clusters, work drops from O(N) to O(N/C) per query (plus C
  centroid probes); clusters here are the `label` partitions (stand-in
  for k-means cells, which would be trained the same way: elementwise
  avg per cluster).

Float discipline for the DuckDB oracle: embeddings cast to double on both
sides, cosines rounded to 4 decimals BEFORE ordering/thresholding, ties
broken by vec_id — deterministic across engines (sum-order differences are
~1e-13, far below the rounding grain).
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from processor_edf_spark.plans.registry import load, register

COSINE_PAIR_THRESHOLD = 0.45
TOPK = 5
IVF_TOPK = 3
N_QUERIES = 10  # vec_id < 10 are the query vectors


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate — JVM-side, no UDF."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


_COS_SQL = (
    "list_inner_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
    "(sqrt(list_inner_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
    "sqrt(list_inner_product({b}::DOUBLE[], {b}::DOUBLE[])))"
)


@register(
    "cosine_pairs",
    f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({_COS_SQL.format(a='a.embedding', b='b.embedding')}, 4) AS cos_sim
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND({_COS_SQL.format(a='a.embedding', b='b.embedding')}, 4)
          >= {COSINE_PAIR_THRESHOLD}
    """,
)
def cosine_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs, brute force.  The quadratic
    baseline — at corpus scale, LSH-bucket first (random hyperplanes →
    band join, same shape as minhash_lsh_pairs) and verify survivors with
    this exact cosine."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), _as_double("embedding").alias("ea")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), _as_double("embedding").alias("eb")
    )
    cos = F.round(cosine(F.col("ea"), F.col("eb")), 4)
    return (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= COSINE_PAIR_THRESHOLD)
    )


@register(
    "ann_topk_bruteforce",
    f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND({_COS_SQL.format(a='q.embedding', b='c.embedding')}, 4) AS cos_sim
        FROM embeddings q
        JOIN embeddings c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim,
           rnk AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
        FROM scored
    )
    WHERE rnk <= {TOPK}
    """,
)
def ann_topk_bruteforce(spark, sf_dir):
    """Exact top-k cosine neighbors for the query vectors — broadcast the
    query side (tiny), scan candidates once, per-query top-k via window.
    At scale: queries broadcast to every executor; candidate scan is
    embarrassingly parallel; only k rows per query shuffle for the final
    window."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    q = embeddings.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), _as_double("embedding").alias("eq")
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), _as_double("embedding").alias("ec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("eq"), F.col("ec")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


_CENTROID_SQL = """
    centroids AS (
        SELECT label, list(v ORDER BY i) AS centroid
        FROM (
            SELECT label, i, ROUND(AVG(embedding[i]::DOUBLE), 6) AS v
            FROM embeddings
            CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) dims
            GROUP BY label, i
        )
        GROUP BY label
    )
"""


@register(
    "ann_ivf_label",
    f"""
    WITH {_CENTROID_SQL},
    assign AS (
        SELECT query_id, label FROM (
            SELECT q.vec_id AS query_id, c.label,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND({_COS_SQL.format(a='q.embedding', b='c.centroid')}, 4) DESC,
                                c.label ASC) AS rnk
            FROM embeddings q CROSS JOIN centroids c
            WHERE q.vec_id < {N_QUERIES}
        ) WHERE rnk = 1
    )
    SELECT query_id, label, neighbor_id, rnk AS rank FROM (
        SELECT a.query_id, a.label, e.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY a.query_id
                   ORDER BY ROUND({_COS_SQL.format(a='q.embedding', b='e.embedding')}, 4) DESC,
                            e.vec_id ASC) AS rnk
        FROM assign a
        JOIN embeddings e ON e.label = a.label
        JOIN embeddings q ON q.vec_id = a.query_id
        WHERE e.vec_id <> a.query_id
    ) WHERE rnk <= {IVF_TOPK}
    """,
)
def ann_ivf_label(spark, sf_dir):
    """IVF-style ANN: (1) coarse centroids = elementwise mean per cluster,
    (2) assign each query to its nearest centroid, (3) exact search within
    that one cluster.  Probing 1 of C clusters cuts the candidate scan by
    C× — the standard scale path when brute force stops fitting."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    emb = embeddings.select("vec_id", "label", _as_double("embedding").alias("e"))

    # (1) centroids: posexplode → avg per (label, dim) → re-assemble ordered
    dims = emb.select("label", F.posexplode("e").alias("i", "x"))
    centroid = (
        dims.groupBy("label", "i")
        .agg(F.round(F.avg("x"), 6).alias("v"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "v"))), lambda s: s["v"]
            ).alias("centroid")
        )
    )

    # (2) nearest centroid per query (C is tiny → broadcast, no shuffle)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("eq")
    )
    w_assign = Window.partitionBy("query_id").orderBy(
        F.col("c_sim").desc(), F.col("label").asc()
    )
    assign = (
        q.crossJoin(F.broadcast(centroid))
        .select(
            "query_id",
            "label",
            "eq",
            F.round(cosine(F.col("eq"), F.col("centroid")), 4).alias("c_sim"),
        )
        .withColumn("rnk", F.row_number().over(w_assign))
        .filter(F.col("rnk") == 1)
        .select("query_id", "label", "eq")
    )

    # (3) exact top-k inside the probed cluster only
    cand = emb.select(F.col("vec_id").alias("neighbor_id"), "label", F.col("e").alias("ec"))
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.join(F.broadcast(assign), "label")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "label",
            "neighbor_id",
            F.round(cosine(F.col("eq"), F.col("ec")), 4).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= IVF_TOPK)
        .select("query_id", "label", "neighbor_id", "rank")
    )
