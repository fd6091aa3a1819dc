"""Sequence packing + incremental dedup (operators/packing.py)."""

from __future__ import annotations

from collections import defaultdict

import pytest

from processor_edf_spark.operators.packing import (
    dedup_incremental,
    pack_sequences,
)

pytestmark = pytest.mark.slow

BUDGET = 100


def test_pack_sequences_respects_budget_and_covers_all(spark):
    lens = [60, 50, 40, 30, 30, 20, 10, 10, 150]  # 150 is oversize
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(lens)], "doc_id long, n_tokens long"
    ).coalesce(1)
    out = pack_sequences(df, BUDGET).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(len(lens)))
    by_seq = defaultdict(list)
    for r in out:
        by_seq[r["seq_id"]].append(r)
    for seq, rows in by_seq.items():
        total = sum(r["doc_len"] for r in rows)
        if any(r["oversize"] for r in rows):
            assert len(rows) == 1  # oversize docs get their own bin
        else:
            assert total <= BUDGET
            # offsets are a proper prefix layout within the bin
            offs = sorted((r["seq_offset"], r["doc_len"]) for r in rows)
            pos = 0
            for off, ln in offs:
                assert off == pos
                pos += ln
    # FFD on this distribution: 60+40, 50+30+20, 30+10+10 -> 3 bins + 1 oversize
    assert len(by_seq) == 4


def test_pack_sequences_partition_parallel_unique_ids(spark):
    df = spark.createDataFrame(
        [(i, 60) for i in range(40)], "doc_id long, n_tokens long"
    ).repartition(4)
    out = pack_sequences(df, BUDGET).collect()
    assert len(out) == 40
    assert len({r["seq_id"] for r in out}) == 40  # 60 > 100/2: one per bin
    assert sorted(r["doc_id"] for r in out) == list(range(40))


def test_dedup_incremental_across_batches(spark, tmp_path):
    store = str(tmp_path / "sha_store")
    b1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "doc_id long, text string"
    )
    got1 = sorted(r["doc_id"] for r in dedup_incremental(spark, b1, store).collect())
    assert got1 == [1, 2]  # in-batch dup of 'alpha' keeps lowest id

    b2 = spark.createDataFrame(
        [(4, "beta"), (5, "gamma"), (6, "gamma")], "doc_id long, text string"
    )
    got2 = sorted(r["doc_id"] for r in dedup_incremental(spark, b2, store).collect())
    assert got2 == [5]  # 'beta' seen in batch 1; gamma keeps 5

    b3 = spark.createDataFrame(
        [(7, "alpha"), (8, "gamma")], "doc_id long, text string"
    )
    assert dedup_incremental(spark, b3, store).count() == 0


def test_pack_sequences_invariants_random_lengths(spark):
    """Property: for arbitrary length distributions, every doc is
    assigned exactly once, non-oversize bins respect the budget, and
    in-bin offsets tile the bin without overlap."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(st.integers(min_value=1, max_value=180), min_size=1, max_size=60)
    )
    def check(lens):
        df = spark.createDataFrame(
            [(i, n) for i, n in enumerate(lens)], "doc_id long, n_tokens long"
        ).coalesce(1)
        out = pack_sequences(df, BUDGET).collect()
        assert sorted(r["doc_id"] for r in out) == list(range(len(lens)))
        by_seq = defaultdict(list)
        for r in out:
            by_seq[r["seq_id"]].append(r)
        for rows in by_seq.values():
            if any(r["oversize"] for r in rows):
                assert len(rows) == 1
                continue
            assert sum(r["doc_len"] for r in rows) <= BUDGET
            pos = 0
            for off, ln in sorted((r["seq_offset"], r["doc_len"]) for r in rows):
                assert off == pos
                pos += ln

    check()


def test_dedup_incremental_corrupt_store_propagates(spark, tmp_path):
    """A corrupt (non-parquet) store must raise, not read as 'first
    batch' — silently re-admitting seen documents would break the
    exactly-once dedup contract."""
    import pytest

    store = tmp_path / "sha_store"
    store.mkdir()
    (store / "part-00000.parquet").write_bytes(b"this is not parquet")
    b = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    with pytest.raises(Exception):
        dedup_incremental(spark, b, str(store)).collect()


def test_dedup_incremental_restart_semantics(spark, tmp_path):
    """The store append is the commit point: a crash between the
    admitted-set checkpoint and the append (simulated by rolling the
    store back to its pre-batch file set) re-admits the batch on rerun
    (no loss); after a successful append, a rerun admits nothing (no
    duplication)."""
    import os

    store = tmp_path / "sha_store"
    b1 = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    assert dedup_incremental(spark, b1, str(store)).count() == 1

    before = set(os.listdir(store))
    b2 = spark.createDataFrame([(2, "beta")], "doc_id long, text string")
    assert dedup_incremental(spark, b2, str(store)).count() == 1
    # crash before append: roll the store back to the pre-batch files
    for name in set(os.listdir(store)) - before:
        (store / name).unlink()
    assert (
        dedup_incremental(spark, b2, str(store)).count() == 1
    )  # re-admitted, not lost
    # the append now committed: rerun is a no-op
    assert dedup_incremental(spark, b2, str(store)).count() == 0


def test_compact_dedup_store(spark, tmp_path):
    """Compaction collapses the one-file-set-per-batch accretion into a
    few dense files without changing dedup behavior; compact_every
    triggers it from inside dedup_incremental."""
    from processor_edf_spark.operators.packing import compact_dedup_store

    store = tmp_path / "sha_store"
    for i in range(5):
        b = spark.createDataFrame(
            [(i, f"doc-{i}")], "doc_id long, text string"
        )
        assert dedup_incremental(spark, b, str(store)).count() == 1
    assert len(spark.read.parquet(str(store)).inputFiles()) >= 5

    assert compact_dedup_store(spark, str(store), target_files=1) == 5
    assert len(spark.read.parquet(str(store)).inputFiles()) == 1
    # behavior unchanged: all five seen, a sixth admits
    seen = spark.createDataFrame(
        [(10, "doc-0"), (11, "doc-4"), (12, "doc-new")],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"]
        for r in dedup_incremental(
            spark, seen, str(store), compact_every=3
        ).collect()
    )
    assert got == [12]
    # compact_every=3 fired after the append (store had >=3 files)
    assert len(spark.read.parquet(str(store)).inputFiles()) <= 4


def test_dedup_incremental_second_writer_fails_loudly(spark, tmp_path):
    """Writer exclusion: while one writer holds the store lock, a second
    writer raises DedupStoreLockError BEFORE mutating anything; after
    release, writes proceed.  A crashed writer's stale lock also reads
    as held (fail-loud beats silent corruption)."""
    import pytest

    from processor_edf_spark.operators.packing import (
        DedupStoreLockError,
        _store_lock,
        compact_dedup_store,
    )

    store = str(tmp_path / "sha_store")
    b1 = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    assert dedup_incremental(spark, b1, store).count() == 1

    b2 = spark.createDataFrame([(2, "beta")], "doc_id long, text string")
    with _store_lock(spark, store):  # writer A holds the lease
        with pytest.raises(DedupStoreLockError, match="locked by another"):
            dedup_incremental(spark, b2, store).collect()
        with pytest.raises(DedupStoreLockError):
            compact_dedup_store(spark, store)
        # the blocked writer mutated nothing
        assert spark.read.parquet(store).count() == 1
    # lease released: the same batch now commits exactly once
    assert dedup_incremental(spark, b2, store).count() == 1
    assert dedup_incremental(spark, b2, store).count() == 0
