"""Persisted, incrementally-maintained ANN index (IVF + PQ codes) over
the transaction-log store — the production half of the 100 TB ANN story.

``ivf_pq_search`` (operators/pq.py) re-derives cell assignments and PQ
codes from raw vectors on every call, which is correct but wrong-shaped
for a daily-drop corpus: at 100 TB you train ONCE, persist the model
and the 8-byte-per-vector codes, and per drop you only encode the new
vectors with the FROZEN codebooks — exactly how FAISS/SCaNN deployments
and the Jégou et al. 2011 design run in production.  This module wires
that lifecycle through ``operators/txstore.py``'s optimistic-concurrency
log, so index maintenance inherits the store's guarantees: atomic
one-winner commits, snapshot-isolated readers, idempotent re-drops,
crash-before-commit invisibility, and compaction as just another commit.

Layout (one txstore; every data file shares one schema)::

    index_dir/
      _txlog/00000000.json      base entry: model row + initial codes
      _txlog/00000001.json      append drop: new codes only
      data-<uuid>.parquet       rows (rec_type, vec_id, cell, codes, qe,
                                      meta_json)

- ``rec_type='model'`` rows (exactly one in any snapshot) carry the
  frozen centroids + codebooks + train-time quantization-error bound as
  JSON in ``meta_json``.
- ``rec_type='code'`` rows carry one vector each: its IVF cell, its m
  PQ codes, and ``qe`` — the TRUE squared L2 between the raw vector and
  its PQ reconstruction, computed during the encode pass.  Persisting
  qe per row is what makes the staleness audit a pure SQL scan later:
  no raw vectors are ever re-read to decide when to refit.

Lifecycle:

- :func:`ann_index_build` — train on a bounded deterministic sample
  (``pq_train`` discipline: cost independent of corpus size), encode
  the full frame in one Arrow pass, publish as the ``base`` version.
- :func:`ann_index_append` — encode a drop with the FROZEN model (one
  Arrow pass, no training), anti-join vec_ids already admitted
  (idempotent re-drops), commit as the next version; a lost commit race
  re-checks against exactly the entries that won and retries
  (``dedup_incremental_tx``'s loop, keyed on vec_id).
- :func:`ann_index_search` — snapshot the codes, prune to the probed
  cells, ADC-score against broadcast per-query LUTs, optional exact
  re-rank against a caller-supplied raw-vector frame.
- :func:`ann_index_staleness` — the refit audit: mean/max qe per
  version vs the train-time bound (drift ratio).  New data that the
  frozen codebooks quantize much worse than the training distribution
  shows up as qe drift; the audit says WHEN to refit without scanning
  any raw vectors.
- :func:`ann_index_compact` — rewrite the snapshot (model + all codes)
  as one dense ``base`` entry.

Scale shape: training is corpus-size independent; append cost is one
Arrow encode pass over the DROP (not the corpus) + one tiny commit;
every entry's files are HIVE-PARTITIONED BY CELL, so a search's
probed-cell filter prunes whole files at planning time (the model row
lands in the null partition) — a query touches ~nprobe/C of the stored
bytes, not the snapshot.  The only driver state is the model
(C·d + m·K·d/m floats).  Honest scale note: the append path's
idempotence anti-join shuffles the snapshot's (vec_id) column per drop
— flat at sweep scale (BASELINE.md r12); at tens of billions of
vectors a deployment co-buckets the store by id hash so that join
co-partitions, the same refinement the dedup store documents.  No EDF analog: the
reference has no ANN surface; this extends the builder's-brief
similarity axis (sibling: operators/pq.py, operators/kmeans.py).
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from processor_edf_spark.operators.kmeans import _distances
from processor_edf_spark.operators.pq import _kmeans_np
from processor_edf_spark.operators.txstore import (
    MAX_COMMIT_RETRIES,
    CommitConflictError,
    TxStoreRetriesExhausted,
    _write_data_file,
    commit_version,
    list_versions,
    read_store,
)

_SCHEMA = (
    "rec_type string, vec_id long, cell int, codes array<long>, "
    "qe double, meta_json string"
)


# ---------------------------------------------------------------------------
# model (de)serialization
# ---------------------------------------------------------------------------


def _model_json(centroids: np.ndarray, codebooks: np.ndarray,
                train_qe: float) -> str:
    return json.dumps(
        {
            "centroids": centroids.tolist(),
            "codebooks": codebooks.tolist(),
            "train_qe": train_qe,
        }
    )


#: model memo — the frozen (centroids, codebooks, train_qe) per store.
#: The model row is written exactly once at build and only ever COPIED
#: by compaction (frozen-codebook contract), so within a session it can
#: be reloaded without a snapshot scan + collect per lifecycle stage
#: (append/search/staleness each paid one).  The key carries the
#: base-most entry's UUID data-file name: a rebuild into the same path
#: (tests rmtree + rebuild) or a compaction commits a DIFFERENT uuid,
#: so a stale hit is impossible; a compaction re-reads once and
#: re-memoizes the identical model.  This is session metadata like
#: Spark's file-listing cache — never a query result.
_MODEL_MEMO: dict[tuple[str, str], tuple] = {}


def load_model(spark: SparkSession, index_dir: str):
    """(centroids, codebooks, train_qe) from the current snapshot."""
    from processor_edf_spark.operators.txstore import snapshot_files

    versions = list_versions(spark, index_dir)
    files = snapshot_files(spark, index_dir, versions)
    if not files:
        raise ValueError(f"ann_index: no committed version in {index_dir}")
    key = (index_dir, files[0])
    hit = _MODEL_MEMO.get(key)
    if hit is not None:
        return hit
    snap = read_store(spark, index_dir, versions)
    rows = snap.filter(F.col("rec_type") == "model").select("meta_json").collect()
    if len(rows) != 1:
        raise ValueError(
            f"ann_index: expected exactly one model row, found {len(rows)}"
        )
    meta = json.loads(rows[0][0])
    out = (
        np.asarray(meta["centroids"], dtype=np.float64),
        np.asarray(meta["codebooks"], dtype=np.float64),
        float(meta["train_qe"]),
    )
    if len(_MODEL_MEMO) > 64:  # bound session growth; stores are few
        _MODEL_MEMO.clear()
    _MODEL_MEMO[key] = out
    return out


# ---------------------------------------------------------------------------
# encode pass: assign + code + quantization error, one Arrow pass
# ---------------------------------------------------------------------------


def _encode_with_model(
    df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(vec_id, cell, codes, qe) — cell assignment, PQ codes, and the
    true per-vector quantization error in ONE Arrow pass with both
    models broadcast (pq_encode + assign_clusters fused, plus the qe
    column the staleness audit needs)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        (
            np.asarray(centroids, dtype=np.float64),
            np.asarray(codebooks, dtype=np.float64),
        )
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C, B = bc.value
        m, _, sub = B.shape
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            cells = np.argmin(_distances(M, C), axis=1)  # first min
            codes = np.empty((len(M), m), dtype=np.int64)
            recon = np.empty_like(M)
            for j in range(m):
                seg = M[:, j * sub : (j + 1) * sub]
                codes[:, j] = np.argmin(_distances(seg, B[j]), axis=1)
                recon[:, j * sub : (j + 1) * sub] = B[j][codes[:, j]]
            qe = ((M - recon) ** 2).sum(axis=1)
            yield pd.DataFrame(
                {
                    "rec_type": "code",
                    "vec_id": pdf[id_col].to_numpy(),
                    "cell": cells.astype(np.int32),
                    "codes": list(codes),
                    "qe": qe,
                    "meta_json": None,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(gen, _SCHEMA)


# ---------------------------------------------------------------------------
# lifecycle
# ---------------------------------------------------------------------------


def ann_index_build(
    spark: SparkSession,
    df: DataFrame,
    index_dir: str,
    n_cells: int = 16,
    m: int = 8,
    k: int = 16,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int | None = None,
) -> dict:
    """Train (bounded sample) + encode (full frame) + publish version 0.

    Returns {"version": 0, "n_vectors": n, "train_qe": mean qe of the
    TRAINING SAMPLE under the trained model} — train_qe is the
    staleness baseline every future drop is audited against."""
    from processor_edf_spark.operators.pq import pq_train

    # one bounded deterministic sample serves both trainings
    n = sample_size if sample_size is not None else max(10_000, 256 * k)
    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(n)
        .collect()
    )
    if len(rows) < max(n_cells, k):
        raise ValueError("ann_index_build: not enough rows to train")
    rows.sort(key=lambda r: r[id_col])
    X = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    centroids = _kmeans_np(X, n_cells, n_iter)
    # the ONE collected sample really does serve both trainings: the
    # PQ codebooks train on the same id-sorted matrix, no second
    # TakeOrdered sampling job over the corpus
    codebooks = pq_train(
        df, m=m, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col,
        sample_size=sample_size, sample_matrix=X,
    )
    # train-time quantization-error baseline over the training sample
    mm, _, sub = codebooks.shape
    recon = np.empty_like(X)
    for j in range(mm):
        seg = X[:, j * sub : (j + 1) * sub]
        recon[:, j * sub : (j + 1) * sub] = codebooks[j][
            np.argmin(_distances(seg, codebooks[j]), axis=1)
        ]
    train_qe = float(((X - recon) ** 2).sum(axis=1).mean())

    codes = _encode_with_model(df, centroids, codebooks, id_col, vec_col)
    model_row = spark.createDataFrame(
        [("model", None, None, None, None,
          _model_json(centroids, codebooks, train_qe))],
        _SCHEMA,
    )
    payload = model_row.unionByName(codes).localCheckpoint(eager=True)
    n_vectors = payload.count() - 1
    name = _write_data_file(spark, index_dir, payload, partition_by=["cell"])
    try:
        commit_version(spark, index_dir, 0, [name], base=True)
        # seed the model memo — the builder already holds the frozen
        # model, so the first append/search need not re-collect it
        _MODEL_MEMO[(index_dir, f"{index_dir.rstrip('/')}/{name}")] = (
            np.asarray(centroids, dtype=np.float64),
            np.asarray(codebooks, dtype=np.float64),
            train_qe,
        )
    except CommitConflictError as e:
        # a build must NEVER retry like an append would: the loser
        # trained a DIFFERENT model, and interleaving two models'
        # codes corrupts every downstream distance.  Fail loudly; the
        # caller appends to the winner's index or builds elsewhere.
        raise ValueError(
            f"ann_index_build: {index_dir} already has a committed "
            "version (lost the build race) — append to it or build "
            "into a fresh directory"
        ) from e
    return {"version": 0, "n_vectors": int(n_vectors), "train_qe": train_qe}


def ann_index_append(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    _pre_commit_hook=None,
) -> dict:
    """Encode a drop with the FROZEN model and commit it as the next
    version.  Idempotent (vec_ids already admitted are skipped) and
    safe under concurrent writers (the txstore loser-retry loop:
    re-check against exactly the entries that won, then retry).

    ``_pre_commit_hook`` is the test seam for injecting a racing commit
    (same contract as ``dedup_incremental_tx``)."""
    centroids, codebooks, _ = load_model(spark, index_dir)
    encoded = _encode_with_model(batch, centroids, codebooks, id_col, vec_col)

    versions = list_versions(spark, index_dir)
    seen = read_store(spark, index_dir, versions)
    if seen is not None:
        encoded = encoded.join(
            seen.filter(F.col("rec_type") == "code").select("vec_id"),
            "vec_id",
            "left_anti",
        )
    encoded = encoded.localCheckpoint(eager=True)

    for _ in range(MAX_COMMIT_RETRIES):
        n = encoded.count()
        if n == 0:
            return {"version": versions[-1], "n_appended": 0}
        name = _write_data_file(spark, index_dir, encoded,
                                partition_by=["cell"])
        if _pre_commit_hook is not None:
            hook, _pre_commit_hook = _pre_commit_hook, None
            hook()
        next_version = versions[-1] + 1
        try:
            commit_version(spark, index_dir, next_version, [name])
            return {"version": next_version, "n_appended": int(n)}
        except CommitConflictError:
            new_versions = list_versions(spark, index_dir)
            delta = [v for v in new_versions if v not in versions]
            winner = read_store(spark, index_dir, delta)
            if winner is not None:
                encoded = encoded.join(
                    winner.filter(F.col("rec_type") == "code").select("vec_id"),
                    "vec_id",
                    "left_anti",
                ).localCheckpoint(eager=True)
            versions = new_versions
    raise TxStoreRetriesExhausted(
        f"lost {MAX_COMMIT_RETRIES} commit races on {index_dir}"
    )


def ann_index_codes(spark: SparkSession, index_dir: str) -> DataFrame:
    """The snapshot's code rows (vec_id, cell, codes, qe)."""
    snap = read_store(spark, index_dir)
    if snap is None:
        raise ValueError(f"ann_index: no committed version in {index_dir}")
    return snap.filter(F.col("rec_type") == "code").select(
        "vec_id", "cell", "codes", "qe"
    )


def ann_index_search(
    spark: SparkSession,
    index_dir: str,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    nprobe: int = 3,
    shortlist: int = 50,
    rerank_df: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query the PERSISTED index: cell-pruned ADC top-k from the stored
    codes (no raw-vector scan, no re-encoding).  With ``rerank_df`` (a
    raw (id, vector) frame) the ADC shortlist is exact-re-ranked
    JVM-side and the result carries true ``dist_sq``; without it the
    result carries ``adc_dist`` straight from the codes."""
    from processor_edf_spark.operators.pq import (
        exact_rerank,
        pq_search_adc,
        probe_cells,
    )

    centroids, codebooks, _ = load_model(spark, index_dir)
    Q = np.asarray(queries, dtype=np.float64)
    qid = np.asarray(query_ids)
    # probe derivation and re-rank are the SHARED pq.py helpers — this
    # path and ivf_pq_search cannot drift apart (tie-breaks, rounding)
    _probe_sets, probed_union = probe_cells(Q, centroids, nprobe)
    cand = ann_index_codes(spark, index_dir).filter(
        F.col("cell").isin(probed_union)
    )
    depth = shortlist if rerank_df is not None else k
    short = pq_search_adc(cand, codebooks, Q, qid, k=depth, id_col="vec_id")
    if rerank_df is None:
        return short
    return exact_rerank(
        short, rerank_df, Q, qid, k, id_col=id_col, vec_col=vec_col,
        exclude_self=False,
    )


def ann_index_staleness(spark: SparkSession, index_dir: str) -> dict:
    """The refit audit, pure SQL over the persisted qe column: mean and
    max quantization error of the CURRENT snapshot vs the train-time
    baseline.  ``drift_ratio`` = snapshot mean qe / train qe; a ratio
    well above 1 means the frozen codebooks no longer fit the data
    distribution and the index should be rebuilt (refit), exactly the
    signal a 100 TB deployment needs BEFORE recall silently decays.
    ``needs_refit`` applies the conventional 2x threshold."""
    _, _, train_qe = load_model(spark, index_dir)
    row = (
        ann_index_codes(spark, index_dir)
        .agg(
            F.mean("qe").alias("mean_qe"),
            F.max("qe").alias("max_qe"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    mean_qe = float(row["mean_qe"]) if row["n"] else 0.0
    drift = (mean_qe / train_qe) if train_qe > 0 else float("inf") if mean_qe else 1.0
    return {
        "n_vectors": int(row["n"]),
        "train_qe": train_qe,
        "mean_qe": mean_qe,
        "max_qe": float(row["max_qe"]) if row["n"] else 0.0,
        "drift_ratio": drift,
        "needs_refit": bool(drift > 2.0),
    }


def ann_index_compact(spark: SparkSession, index_dir: str) -> int:
    """Rewrite the snapshot (model row + all codes) as one dense
    ``base`` entry; returns the code-row count.  Loses cleanly to
    racing appends (retries on top of them)."""
    for _ in range(MAX_COMMIT_RETRIES):
        versions = list_versions(spark, index_dir)
        snap = read_store(spark, index_dir, versions)
        if snap is None:
            return 0
        dense = snap.localCheckpoint(eager=True)
        n = dense.filter(F.col("rec_type") == "code").count()
        name = _write_data_file(spark, index_dir, dense,
                                partition_by=["cell"])
        try:
            commit_version(
                spark, index_dir, versions[-1] + 1, [name], base=True
            )
            return int(n)
        except CommitConflictError:
            continue
    raise TxStoreRetriesExhausted(
        f"lost {MAX_COMMIT_RETRIES} compaction races on {index_dir}"
    )
