"""Persisted incremental ANN index (operators/ann_index.py): build /
append / search / staleness / compaction through the txstore protocol —
crash-restart and two-writer semantics mirror test_txstore.py, search
parity mirrors the exactness regime of tests/test_pq.py (codebook-built
vectors make ADC exact, so the persisted-index search must equal the
self-contained ``ivf_pq_search`` and the brute-force truth)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from processor_edf_spark.operators.ann_index import (
    ann_index_append,
    ann_index_build,
    ann_index_codes,
    ann_index_compact,
    ann_index_search,
    ann_index_staleness,
    load_model,
)
from processor_edf_spark.operators.txstore import (
    list_versions,
    snapshot_files,
)

SCHEMA = "vec_id long, embedding array<double>"


def _cluster_vec(i: int, d: int = 8) -> list[float]:
    """Vectors in 4 well-separated clusters (center 100*g) with a small
    deterministic within-cluster offset — separable for IVF, and the
    offsets give PQ a non-trivial but stable codebook."""
    g = i % 4
    return [100.0 * g + ((i // 4 + t) % 3) for t in range(d)]


def _vecs(spark, ids):
    return spark.createDataFrame(
        [(int(i), _cluster_vec(int(i))) for i in ids], SCHEMA
    )


def _build(spark, tmp_path, ids, **kw):
    index_dir = str(tmp_path / "annidx")
    params = dict(n_cells=4, m=4, k=8, sample_size=64)
    params.update(kw)
    info = ann_index_build(spark, _vecs(spark, ids), index_dir, **params)
    return index_dir, info


def test_build_publishes_base_version_with_model(spark, tmp_path):
    index_dir, info = _build(spark, tmp_path, range(48))
    assert info["version"] == 0 and info["n_vectors"] == 48
    assert list_versions(spark, index_dir) == [0]
    C, B, train_qe = load_model(spark, index_dir)
    assert C.shape == (4, 8) and B.shape == (4, 8, 2)
    assert train_qe >= 0.0
    codes = ann_index_codes(spark, index_dir)
    assert codes.count() == 48
    # the 4 separated clusters must land in 4 distinct cells
    assert codes.select("cell").distinct().count() == 4


def test_append_encodes_with_frozen_model_and_is_idempotent(spark, tmp_path):
    index_dir, _ = _build(spark, tmp_path, range(48))
    C0, B0, _ = load_model(spark, index_dir)
    out = ann_index_append(spark, _vecs(spark, range(48, 60)), index_dir)
    assert out == {"version": 1, "n_appended": 12}
    C1, B1, _ = load_model(spark, index_dir)
    assert np.array_equal(C0, C1) and np.array_equal(B0, B1)  # frozen
    # re-dropping the same batch admits nothing (idempotent re-drops)
    again = ann_index_append(spark, _vecs(spark, range(48, 60)), index_dir)
    assert again["n_appended"] == 0
    assert ann_index_codes(spark, index_dir).count() == 60
    assert list_versions(spark, index_dir) == [0, 1]


def test_append_commit_race_admits_exactly_once(spark, tmp_path):
    """Two writers race overlapping drops: the loser re-checks against
    the winner's entry and admits only its non-overlapping vec_ids."""
    index_dir, _ = _build(spark, tmp_path, range(48))

    def racing_commit():
        ann_index_append(spark, _vecs(spark, [100, 101]), index_dir)

    out = ann_index_append(
        spark,
        _vecs(spark, [100, 102]),
        index_dir,
        _pre_commit_hook=racing_commit,
    )
    assert out["n_appended"] == 1  # 100 won by the racer, only 102 here
    ids = [r["vec_id"] for r in ann_index_codes(spark, index_dir).collect()]
    assert len(ids) == len(set(ids)) == 51
    assert list_versions(spark, index_dir) == [0, 1, 2]


def test_crash_before_commit_leaves_snapshot_unchanged(spark, tmp_path):
    index_dir, _ = _build(spark, tmp_path, range(48))

    class Boom(RuntimeError):
        pass

    def crash():
        raise Boom()

    with pytest.raises(Boom):
        ann_index_append(
            spark, _vecs(spark, [200]), index_dir, _pre_commit_hook=crash
        )
    assert list_versions(spark, index_dir) == [0]
    assert ann_index_codes(spark, index_dir).count() == 48
    # and the batch re-runs cleanly after the crash (restart semantics)
    out = ann_index_append(spark, _vecs(spark, [200]), index_dir)
    assert out["n_appended"] == 1


def test_search_matches_selfcontained_pipeline_and_truth(spark, tmp_path):
    """On codebook-built-style separable vectors the persisted-index
    search with exact re-rank must equal (a) operators/pq.ivf_pq_search
    re-derived from raw vectors and (b) brute-force true top-k within
    the probed cells."""
    from processor_edf_spark.operators.pq import ivf_pq_search

    ids = range(64)
    index_dir, _ = _build(spark, tmp_path, ids)
    C, B, _ = load_model(spark, index_dir)
    Q = np.array([_cluster_vec(5), _cluster_vec(10)], dtype=np.float64)
    qids = np.array([900, 901])
    raw = _vecs(spark, ids)

    got = ann_index_search(
        spark, index_dir, Q, qids, k=5, nprobe=2, shortlist=50,
        rerank_df=raw,
    ).collect()
    ref = ivf_pq_search(
        raw, C, B, Q, qids, k=5, nprobe=2, shortlist=50,
        exclude_self=False,
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    got_t = [(r["query_id"], r["rank"], r["neighbor_id"], r["dist_sq"])
             for r in sorted(got, key=key)]
    ref_t = [(r["query_id"], r["rank"], r["neighbor_id"], r["dist_sq"])
             for r in sorted(ref, key=key)]
    assert got_t == ref_t
    # rank-1 neighbors are the exact query vectors present in the corpus
    top = {r["query_id"]: r for r in got if r["rank"] == 1}
    assert top[900]["neighbor_id"] == 5 and top[900]["dist_sq"] == 0.0
    assert top[901]["neighbor_id"] == 10 and top[901]["dist_sq"] == 0.0


def test_search_without_rerank_returns_adc_distances(spark, tmp_path):
    index_dir, _ = _build(spark, tmp_path, range(48))
    Q = np.array([_cluster_vec(3)], dtype=np.float64)
    out = ann_index_search(spark, index_dir, Q, np.array([7]), k=3, nprobe=1)
    rows = out.collect()
    assert len(rows) == 3
    assert rows[0].__fields__ == ["query_id", "neighbor_id", "adc_dist", "rank"] or set(
        out.columns
    ) == {"query_id", "neighbor_id", "adc_dist", "rank"}


def test_staleness_flat_for_indistribution_drops(spark, tmp_path):
    index_dir, info = _build(spark, tmp_path, range(48))
    ann_index_append(spark, _vecs(spark, range(48, 64)), index_dir)
    audit = ann_index_staleness(spark, index_dir)
    assert audit["n_vectors"] == 64
    # in-distribution appends: mean qe stays at the train-time level
    assert audit["mean_qe"] <= max(2.0 * audit["train_qe"], 1e-9) + 1e-9
    assert audit["needs_refit"] is False


def test_staleness_flags_distribution_shift(spark, tmp_path):
    index_dir, _ = _build(spark, tmp_path, range(48))
    # out-of-distribution drop: a 5th cluster far from every centroid
    shifted = spark.createDataFrame(
        [(int(i), [1000.0 + (i % 7) * 3.0 + t for t in range(8)])
         for i in range(300, 316)],
        SCHEMA,
    )
    ann_index_append(spark, shifted, index_dir)
    audit = ann_index_staleness(spark, index_dir)
    assert audit["drift_ratio"] > 2.0
    assert audit["needs_refit"] is True


def test_compaction_preserves_model_codes_and_search(spark, tmp_path):
    index_dir, _ = _build(spark, tmp_path, range(48))
    ann_index_append(spark, _vecs(spark, range(48, 60)), index_dir)
    before_model = load_model(spark, index_dir)
    before = sorted(
        (r["vec_id"], r["cell"], tuple(r["codes"]))
        for r in ann_index_codes(spark, index_dir).collect()
    )
    n = ann_index_compact(spark, index_dir)
    assert n == 60
    assert len(snapshot_files(spark, index_dir)) == 1
    after_model = load_model(spark, index_dir)
    assert np.array_equal(before_model[0], after_model[0])
    assert np.array_equal(before_model[1], after_model[1])
    after = sorted(
        (r["vec_id"], r["cell"], tuple(r["codes"]))
        for r in ann_index_codes(spark, index_dir).collect()
    )
    assert before == after
    # appends continue on top of the compacted base
    out = ann_index_append(spark, _vecs(spark, [400]), index_dir)
    assert out["n_appended"] == 1


def test_build_is_deterministic(spark, tmp_path):
    d1, i1 = _build(spark, tmp_path / "a", range(48))
    d2, i2 = _build(spark, tmp_path / "b", range(48))
    m1, m2 = load_model(spark, d1), load_model(spark, d2)
    assert np.array_equal(m1[0], m2[0]) and np.array_equal(m1[1], m2[1])
    c1 = sorted((r["vec_id"], tuple(r["codes"]))
                for r in ann_index_codes(spark, d1).collect())
    c2 = sorted((r["vec_id"], tuple(r["codes"]))
                for r in ann_index_codes(spark, d2).collect())
    assert c1 == c2
    assert i1["train_qe"] == i2["train_qe"]


def test_second_build_into_same_dir_fails_cleanly(spark, tmp_path):
    """A lost BUILD race must not retry (two different models must
    never interleave): the loser gets a clear error and the winner's
    index is untouched."""
    index_dir, _ = _build(spark, tmp_path, range(48))
    before = load_model(spark, index_dir)
    with pytest.raises(ValueError, match="already has a committed"):
        ann_index_build(
            spark, _vecs(spark, range(64)), index_dir,
            n_cells=4, m=4, k=8, sample_size=64,
        )
    after = load_model(spark, index_dir)
    assert np.array_equal(before[0], after[0])
    assert ann_index_codes(spark, index_dir).count() == 48


def test_append_loses_to_compaction_race(spark, tmp_path):
    """A compaction that wins the version slot mid-append: the append
    re-checks against the compacted base and lands on top of it."""
    index_dir, _ = _build(spark, tmp_path, range(48))
    ann_index_append(spark, _vecs(spark, range(48, 56)), index_dir)

    def racing_compaction():
        ann_index_compact(spark, index_dir)

    out = ann_index_append(
        spark,
        _vecs(spark, range(56, 60)),
        index_dir,
        _pre_commit_hook=racing_compaction,
    )
    assert out["n_appended"] == 4
    codes = ann_index_codes(spark, index_dir)
    ids = [r["vec_id"] for r in codes.collect()]
    assert len(ids) == len(set(ids)) == 60
    # the model row survived the compaction and the retried append
    load_model(spark, index_dir)


def test_cell_filter_prunes_partitioned_files(spark, tmp_path):
    """Index entries are hive-partitioned by cell, so the probed-cell
    filter must reach the scan as a PARTITION filter (whole-file
    pruning at planning time) — the 100 TB search-cost story."""
    index_dir, _ = _build(spark, tmp_path, range(64))
    filtered = ann_index_codes(spark, index_dir).filter(
        F.col("cell").isin([0, 1])
    )
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:200], plan[:2000]
    # and the pruned scan still returns exactly the probed cells
    cells = {r["cell"] for r in filtered.select("cell").distinct().collect()}
    assert cells <= {0, 1}
