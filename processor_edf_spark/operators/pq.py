"""Product quantization (PQ) for embedding compression + ADC search —
the memory half of the 100 TB ANN story (Jégou et al. 2011, "Product
Quantization for Nearest Neighbor Search").

IVF (operators/kmeans.py) prunes WHICH vectors a query scans; PQ shrinks
WHAT each scanned vector costs: a d-dim float64 vector (512 bytes at
d=64) becomes m uint8 codes (8 bytes at m=8) — 64× smaller, so the
candidate set of an ANN probe fits executor memory at corpus sizes where
raw vectors never could.  Search uses asymmetric distance computation
(ADC): the QUERY stays exact, each subspace's distance to all 2^bits
codebook entries is a tiny per-query lookup table computed on the
driver, and scoring a candidate is m table lookups + adds — no float
vector math per candidate at all.

Distributed shape (same discipline as kmeans.py):
- training collects ONE bounded deterministic sample (hash-ordered
  top-n, ``max(10_000, 256·k)`` vectors by default — n·d floats, a few
  MB) and trains all m subspace codebooks driver-local in numpy.  PQ
  codebooks only ever need a bounded sample (Jégou et al. train on
  ~100k vectors regardless of corpus size), so this is the scale-safe
  shape: one Spark job total instead of m·n_iter sequential jobs, and
  the cost is independent of corpus size.  ``kmeans_fit`` stays the
  distributed full-data path for callers that need it;
- encoding is one Arrow pass with the codebooks broadcast;
- ADC search broadcasts the per-query LUTs (q·m·k floats) and scores
  codes batch-vectorized (numpy fancy-indexing over the code matrix);
  per-query top-k via the same window the IVF search uses.

Determinism: kmeans_fit is deterministic (lowest-id seeding), argmin
ties break to the lowest code index, so encode(train(df)) is
bit-reproducible — pinned by tests/test_pq.py, including a lossless
fixture where vectors ARE codebook entries and ADC must equal exact L2.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from processor_edf_spark.operators.kmeans import _distances


def _kmeans_np(X: np.ndarray, k: int, n_iter: int) -> np.ndarray:
    """Driver-local Lloyd's with the exact determinism contract of
    kmeans_fit: seed = first k rows (caller supplies id-sorted data),
    argmin first-min tie-break, empty clusters keep their previous
    centroid, early stop on fixpoint."""
    C = X[:k].copy()
    for _ in range(n_iter):
        D = _distances(X, C)
        a = np.argmin(D, axis=1)  # first min → lowest centroid id
        newC = C.copy()
        for c in range(k):
            mask = a == c
            if mask.any():
                newC[c] = X[mask].mean(axis=0)
        if np.array_equal(newC, C):
            break
        C = newC
    return C


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int | None = None,
    sample_matrix: np.ndarray | None = None,
) -> np.ndarray:
    """Train m per-subspace codebooks of k centroids each; returns a
    (m, k, d/m) array.  d must divide evenly by m (raise otherwise —
    silent padding would corrupt every downstream distance).

    Scale shape: ONE bounded deterministic sample is collected —
    ``sample_size`` defaults to ``max(10_000, 256·k)`` vectors, chosen
    by xxhash64(id) order (TakeOrdered: per-partition top-n then a
    driver merge, no full sort, no dependence on corpus size) — and all
    m codebooks train driver-local in numpy over slices of that one
    (n, d) matrix.  Driver memory is n·d float64 (≈5 MB at n=10k,
    d=64); the previous shape (m sequential distributed kmeans runs =
    m·n_iter back-to-back Spark jobs) paid ~160 job overheads to scan
    data PQ training never needed.  Determinism: the hash order is
    content-stable, the sample is re-sorted by id before seeding, and
    _kmeans_np mirrors kmeans_fit's tie-break/empty-cluster contract."""
    if sample_matrix is not None:
        # caller already holds the id-sorted bounded sample (e.g.
        # ann_index_build shares ONE sample between both trainings)
        X = np.asarray(sample_matrix, dtype=np.float64)
        if not len(X):
            raise ValueError("pq_train: empty input")
    else:
        n = sample_size if sample_size is not None else max(10_000, 256 * k)
        rows = (
            df.select(id_col, vec_col)
            .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
            .limit(n)
            .collect()
        )
        if not rows:
            raise ValueError("pq_train: empty input")
        rows.sort(key=lambda r: r[id_col])  # id-order seeding, as kmeans_fit
        X = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    if len(X) < k:
        raise ValueError(f"pq_train: k={k} exceeds the {len(X)} sampled rows")
    sub = d // m
    books = [
        _kmeans_np(np.ascontiguousarray(X[:, j * sub : (j + 1) * sub]), k, n_iter)
        for j in range(m)
    ]
    return np.stack(books)  # (m, k, sub)


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int> of length m): nearest codebook entry per
    subspace.  One Arrow pass, codebooks broadcast, no shuffle."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(codebooks, dtype=np.float64))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        B = bc.value
        m, _, sub = B.shape
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(M), m), dtype=np.int64)
            for j in range(m):
                D = _distances(M[:, j * sub : (j + 1) * sub], B[j])
                codes[:, j] = np.argmin(D, axis=1)  # first min → lowest code
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        gen, f"{id_col} long, codes array<long>"
    )


def pq_search_adc(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over PQ codes: (query_id, neighbor_id, adc_dist, rank),
    adc_dist = the PQ approximation of squared L2 distance.

    Per query the (m, K) lookup table of subspace distances is computed
    driver-side (q·m·K floats, tiny) and broadcast; each Arrow batch
    scores ALL its codes for ALL queries with one fancy-indexing gather
    per subspace — the per-candidate cost is m adds, no vector math.
    Top-k is a per-query window over the scored stream (WindowGroupLimit
    caps the sort; compose with an IVF cell filter upstream to prune the
    scan itself — this operator scores whatever candidate frame it is
    given)."""
    from pyspark.sql import Window

    spark = codes_df.sparkSession
    B = np.asarray(codebooks, dtype=np.float64)
    Q = np.asarray(queries, dtype=np.float64)
    qid = np.asarray(query_ids)
    m, K, sub = B.shape
    # per-query LUT: dim-by-dim accumulation (the _distances discipline)
    luts = np.empty((len(Q), m, K), dtype=np.float64)
    for j in range(m):
        luts[:, j, :] = _distances(Q[:, j * sub : (j + 1) * sub], B[j])
    bc = spark.sparkContext.broadcast((luts, qid))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        L, qids = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.vstack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, m)
            ids = pdf[id_col].to_numpy()
            out = []
            for q in range(len(qids)):
                # gather L[q, j, C[:, j]] for each subspace, sum — m adds/row
                dist = np.zeros(len(C), dtype=np.float64)
                for j in range(m):
                    dist += L[q, j, C[:, j]]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[q],
                            "neighbor_id": ids,
                            "adc_raw": dist,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    scored = codes_df.select(id_col, "codes").mapInPandas(
        gen, "query_id long, neighbor_id long, adc_raw double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select(
            "query_id", "neighbor_id", F.round("adc_raw", 6).alias("adc_dist")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def probe_cells(queries: np.ndarray, centroids: np.ndarray, nprobe: int):
    """Per-query probe sets and their union.  Stable argsort:
    equidistant centroids probe in lowest-id order — the same
    tie-break as cell assignment (argmin first-min), keeping probe
    sets deterministic and oracle-reproducible under ties.  Shared by
    ``ivf_pq_search`` and the persisted-index search
    (operators/ann_index.py) so the two paths cannot drift."""
    C = np.asarray(centroids, dtype=np.float64)
    Q = np.asarray(queries, dtype=np.float64)
    probe_sets = np.argsort(_distances(Q, C), axis=1, kind="stable")[
        :, :nprobe
    ]
    return probe_sets, sorted({int(c) for row in probe_sets for c in row})


@pandas_udf(DoubleType())
def _l2_pd(a: pd.Series, b: pd.Series) -> pd.Series:
    """Pairwise squared L2 over Arrow batches — the r15 replacement for
    the per-row zip_with+aggregate fold (interpreted per element,
    outside codegen).  Accumulation is an explicit left-to-right
    dimension loop of the identical per-element ops ((aᵢ-bᵢ)·(aᵢ-bᵢ),
    then ((0+p₀)+p₁)+…), so the double is bit-identical to the old fold
    and the ROUND(…, 6) boundary cannot move (the similarity module's
    ``dot_pd`` discipline)."""
    A = np.vstack(a.to_numpy())
    B = np.vstack(b.to_numpy())
    acc = np.zeros(len(A), dtype=np.float64)
    for i in range(A.shape[1]):
        d = A[:, i] - B[:, i]
        acc = acc + d * d
    return pd.Series(acc)


def exact_rerank(
    short: DataFrame,
    vectors: DataFrame,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """ADC shortlist → exact top-k: join the (query_id, neighbor_id)
    shortlist back to the raw vectors, compute TRUE squared L2
    JVM-side (zip_with + aggregate, rounded to 6 like the oracle
    closed forms), and take the per-query top-k with the neighbor-id
    tie-break.  Shared by ``ivf_pq_search`` and
    ``ann_index_search`` — one definition of the re-rank semantics."""
    from pyspark.sql import Window

    spark = vectors.sparkSession
    Q = np.asarray(queries, dtype=np.float64)
    qid = np.asarray(query_ids)
    qdf = spark.createDataFrame(
        [(int(i), [float(x) for x in q]) for i, q in zip(qid, Q)],
        "query_id long, qvec array<double>",
    )
    rerank = (
        short.select("query_id", "neighbor_id")
        .join(
            vectors.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("nvec"),
            ),
            "neighbor_id",
        )
        .join(F.broadcast(qdf), "query_id")
        .filter(
            (F.col("neighbor_id") != F.col("query_id"))
            if exclude_self
            else F.lit(True)
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(_l2_pd("nvec", "qvec"), 6).alias("dist_sq"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_sq").asc(), F.col("neighbor_id").asc()
    )
    return rerank.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_pq_search(
    df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    nprobe: int = 3,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """The full production ANN pipeline: IVF cell pruning → PQ ADC
    shortlist → EXACT re-rank, returning (query_id, neighbor_id,
    dist_sq, rank) with true squared-L2 distances.

    1. IVF: assign rows to the broadcast centroids, keep only cells some
       query probes — the scan prunes to ~nprobe/C of the corpus
       (operators/kmeans.ivf_search's pruning step, reused).
    2. PQ ADC: score the surviving candidates from their 8-byte codes
       against per-query lookup tables — the only pass that touches
       every candidate, at m adds per row.
    3. Re-rank: join the ADC shortlist (q·shortlist rows — tiny) back to
       the RAW vectors and compute exact distances JVM-side
       (zip_with + aggregate, no Python), final top-k window.

    A deployment would persist (cell, codes) next to the corpus once and
    skip steps' assignment/encoding per query batch; this function
    recomputes them so it is self-contained over a raw vector frame.

    ``exclude_self`` (default True) drops neighbors whose id equals the
    query id — correct when query ids ARE corpus doc ids (the self-match
    is trivially distance 0).  Pass False when query ids live in a
    separate id space: a legitimate corpus neighbor that merely shares a
    numeric id with a query must not be silently excluded."""
    from processor_edf_spark.operators.kmeans import assign_clusters

    C = np.asarray(centroids, dtype=np.float64)
    Q = np.asarray(queries, dtype=np.float64)
    qid = np.asarray(query_ids)
    _probe_sets, probed_union = probe_cells(Q, C, nprobe)

    assigned = assign_clusters(df, C, id_col=id_col, vec_col=vec_col).select(
        id_col, "cluster"
    )
    cand = (
        df.select(id_col, vec_col)
        .join(assigned, id_col)
        .filter(F.col("cluster").isin(probed_union))
    )
    codes = pq_encode(cand, codebooks, id_col=id_col, vec_col=vec_col)
    short = pq_search_adc(
        codes, codebooks, Q, qid, k=shortlist, id_col=id_col
    ).select("query_id", "neighbor_id")
    return exact_rerank(
        short, df, Q, qid, k, id_col=id_col, vec_col=vec_col,
        exclude_self=exclude_self,
    )
