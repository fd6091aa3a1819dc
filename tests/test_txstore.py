"""Transaction-log dedup store: cross-batch dedup, loser-retry under an
injected commit race (no double admission), snapshot isolation,
compaction equivalence, crash-before-commit invisibility, vacuum."""

from __future__ import annotations

import pytest

from processor_edf_spark.operators.txstore import (
    CommitConflictError,
    ConditionalPutPublisher,
    commit_version,
    compact_store_tx,
    dedup_incremental_tx,
    list_versions,
    read_store,
    set_commit_publisher,
    snapshot_files,
    vacuum_store,
    _write_data_file,
)

SCHEMA = "doc_id long, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _admitted_ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_cross_batch_dedup(spark, tmp_path):
    store = str(tmp_path / "store")
    b1 = _docs(spark, [(1, "alpha"), (2, "beta"), (3, "alpha")])
    out1 = dedup_incremental_tx(spark, b1, store)
    assert _admitted_ids(out1) == [1, 2]  # in-batch dup dropped

    b2 = _docs(spark, [(4, "beta"), (5, "gamma")])
    out2 = dedup_incremental_tx(spark, b2, store)
    assert _admitted_ids(out2) == [5]  # beta already committed
    assert list_versions(spark, store) == [0, 1]


def test_lost_commit_race_readmits_nothing(spark, tmp_path):
    """Writer A snapshots, then writer B commits an overlapping batch
    BEFORE A's commit attempt (injected via the test seam).  A must
    lose version 1, re-check against B's entry, and admit only the
    non-overlapping rows at version 2."""
    store = str(tmp_path / "store")
    dedup_incremental_tx(spark, _docs(spark, [(1, "seed")]), store)

    def racing_commit():
        dedup_incremental_tx(
            spark, _docs(spark, [(10, "x"), (11, "y")]), store
        )

    out = dedup_incremental_tx(
        spark,
        _docs(spark, [(20, "x"), (21, "z")]),
        store,
        _pre_commit_hook=racing_commit,
    )
    # "x" was won by the racing writer; only "z" admitted here
    assert _admitted_ids(out) == [21]
    assert list_versions(spark, store) == [0, 1, 2]
    final = read_store(spark, store)
    shas = [r["content_sha"] for r in final.collect()]
    assert len(shas) == len(set(shas)) == 4  # seed, x, y, z — no dups


def test_snapshot_isolation_across_concurrent_commit(spark, tmp_path):
    store = str(tmp_path / "store")
    dedup_incremental_tx(spark, _docs(spark, [(1, "a"), (2, "b")]), store)
    versions = list_versions(spark, store)
    snap = read_store(spark, store, versions)
    before = snap.count()
    dedup_incremental_tx(spark, _docs(spark, [(3, "c")]), store)
    # the pinned-version snapshot still reads the old file set
    assert read_store(spark, store, versions).count() == before == 2
    assert read_store(spark, store).count() == 3


def test_compaction_preserves_visible_set(spark, tmp_path):
    store = str(tmp_path / "store")
    for i, t in enumerate(("a", "b", "c", "d")):
        dedup_incremental_tx(spark, _docs(spark, [(i, t)]), store)
    n = compact_store_tx(spark, store)
    assert n == 4
    assert read_store(spark, store).count() == 4
    # post-compaction snapshot is the single base entry's file set
    assert len(snapshot_files(spark, store)) == 1
    # dedup still works on top of the base entry
    out = dedup_incremental_tx(
        spark, _docs(spark, [(9, "c"), (10, "e")]), store
    )
    assert _admitted_ids(out) == [10]


def test_uncommitted_data_files_are_invisible_and_vacuumable(
    spark, tmp_path
):
    store = str(tmp_path / "store")
    dedup_incremental_tx(spark, _docs(spark, [(1, "a")]), store)
    # simulate a crash: data file written, commit never happened
    _write_data_file(
        spark, store, _docs(spark, [(2, "ghost")]).selectExpr(
            "sha2(text, 256) AS content_sha"
        )
    )
    assert read_store(spark, store).count() == 1  # invisible
    out = dedup_incremental_tx(spark, _docs(spark, [(3, "ghost")]), store)
    assert _admitted_ids(out) == [3]  # crashed batch re-admits
    assert vacuum_store(spark, store) == 1  # the orphan is removed
    assert read_store(spark, store).count() == 2


def test_vacuum_keeps_pinned_snapshots_readable(spark, tmp_path):
    """Default vacuum deletes only files referenced by NO log entry:
    after compaction, a reader pinned at a pre-compaction version must
    still resolve its files; ``expire_history=True`` is the explicit
    opt-in that reclaims them (and is documented to break pins)."""
    store = str(tmp_path / "store")
    dedup_incremental_tx(spark, _docs(spark, [(1, "a")]), store)
    dedup_incremental_tx(spark, _docs(spark, [(2, "b")]), store)
    compact_store_tx(spark, store)  # base entry at version 2

    assert vacuum_store(spark, store) == 0  # all files entry-referenced
    # pinned pre-compaction snapshot still reads after default vacuum
    assert read_store(spark, store, versions=[0]).count() == 1
    assert read_store(spark, store, versions=[0, 1]).count() == 2

    deleted = vacuum_store(spark, store, expire_history=True)
    assert deleted == 2  # the two pre-compaction data files
    assert list_versions(spark, store) == [2]  # log truncated to base
    assert read_store(spark, store).count() == 2  # latest intact


def test_direct_commit_conflict_raises(spark, tmp_path):
    store = str(tmp_path / "store")
    dedup_incremental_tx(spark, _docs(spark, [(1, "a")]), store)
    (name,) = [p.rsplit("/", 1)[-1] for p in snapshot_files(spark, store)]
    with pytest.raises(CommitConflictError):
        commit_version(spark, store, 0, [name])


def _s3_style_put_if_absent(payload: bytes, path: str) -> bool:
    """Emulate an object store's conditional PUT (If-None-Match: *):
    create-if-absent with O_EXCL, returning False on 412-equivalent."""
    import os

    local = path.removeprefix("file:")
    try:
        fd = os.open(local, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
    except FileExistsError:
        return False
    with os.fdopen(fd, "wb") as f:
        f.write(payload)
    return True


def test_conditional_put_publisher_detects_race(spark, tmp_path):
    """The object-store seam: with commits published through a
    conditional PUT, a writer that loses the version slot to a racing
    commit sees the conflict (the 412 path), re-checks against the
    winner's entries, and admits each hash exactly once — the full
    retry protocol running on the S3-style primitive instead of
    link/rename."""
    store = str(tmp_path / "store")
    set_commit_publisher(ConditionalPutPublisher(_s3_style_put_if_absent))
    try:
        out1 = dedup_incremental_tx(spark, _docs(spark, [(1, "a")]), store)
        assert _admitted_ids(out1) == [1]

        # inject a racing writer that wins version 1 mid-commit
        def race():
            dedup_incremental_tx(
                spark, _docs(spark, [(7, "b"), (8, "c")]), store
            )

        out2 = dedup_incremental_tx(
            spark,
            _docs(spark, [(2, "b"), (3, "d")]),
            store,
            _pre_commit_hook=race,
        )
        # "b" was admitted by the racing winner; only "d" may land here
        assert _admitted_ids(out2) == [3]
        assert read_store(spark, store).count() == 4  # a, b, c, d
        # a direct conflicting publish raises through the same seam
        (name,) = [
            p.rsplit("/", 1)[-1] for p in snapshot_files(spark, store)[:1]
        ]
        with pytest.raises(CommitConflictError):
            commit_version(spark, store, 0, [name])
    finally:
        set_commit_publisher(None)


@pytest.mark.parametrize(
    "scheme",
    ["s3a", "s3", "gs", "abfss", "wasb", "wasbs", "oss", "cosn", "swift"],
)
def test_object_store_scheme_refused_without_publisher(
    spark, tmp_path, scheme
):
    """Any scheme off the rename-contract allowlist without an installed
    ConditionalPutPublisher must be refused loudly — the scheme default
    cannot guarantee one commit winner on an object store.  The check is
    an allowlist, so TLS variants (wasbs) and stores we never enumerated
    (oss, cosn, swift) fail safe too."""
    with pytest.raises(RuntimeError, match="ConditionalPutPublisher"):
        commit_version(
            spark, f"{scheme}://bucket/store", 0, ["data-x.parquet"]
        )


@pytest.mark.slow
@pytest.mark.parametrize("seed", [3, 31])
def test_randomized_interleavings_admit_exactly_once(spark, tmp_path, seed):
    """Property: across ANY sequence of writer batches with overlapping
    content — each optionally racing another writer between snapshot
    and commit — every distinct text is admitted by EXACTLY ONE
    writer call, and the final store holds exactly the distinct set."""
    import random

    rng = random.Random(seed)
    store = str(tmp_path / "store")
    texts = [f"text-{i}" for i in range(30)]
    admitted_by: dict[str, int] = {}
    call_no = 0

    def sha_of(t):
        import hashlib

        return hashlib.sha256(t.encode()).hexdigest()

    def run_batch(rows, hook=None):
        nonlocal call_no
        call_no += 1
        me = call_no
        out = dedup_incremental_tx(
            spark,
            _docs(spark, rows),
            store,
            _pre_commit_hook=hook,
        )
        for r in out.collect():
            sha = sha_of(r["text"])
            assert sha not in admitted_by, (
                f"{r['text']} admitted by call {admitted_by[sha]} AND {me}"
            )
            admitted_by[sha] = me

    next_id = 0
    for _ in range(6):
        batch = [
            (  # overlapping random slices of the text pool
                (next_id := next_id + 1),
                rng.choice(texts),
            )
            for _ in range(rng.randint(2, 8))
        ]
        if rng.random() < 0.5:
            racer = [
                ((next_id := next_id + 1), rng.choice(texts))
                for _ in range(rng.randint(1, 4))
            ]
            run_batch(batch, hook=lambda r=racer: run_batch(r))
        else:
            run_batch(batch)

    rows = [r["content_sha"] for r in read_store(spark, store).collect()]
    assert len(rows) == len(set(rows))  # no duplicate store rows
    assert set(rows) == set(admitted_by)  # store == the admitted set


@pytest.mark.slow
def test_incremental_daily_drops_compaction_keeps_snapshot_flat(
    spark, tmp_path
):
    """The small-file accretion story the tx store's compaction exists
    for, pinned structurally (timings live in the --incremental sweep,
    BASELINE.md): across N simulated daily drops — each replaying
    yesterday's slice, so ~half of every batch is store-rejected — the
    append-only snapshot grows one data file per day while the
    compacted store's snapshot collapses to base+recent and stays
    bounded; admit semantics are IDENTICAL on both stores throughout."""
    from processor_edf_spark.operators.txstore import snapshot_files as sf

    n_days, compact_every = 12, 4
    stores = {
        "plain": str(tmp_path / "plain"),
        "compacted": str(tmp_path / "compacted"),
    }
    days = [
        [(d * 100 + i, f"doc-{d}-{i}") for i in range(5)]
        for d in range(n_days)
    ]
    plain_files, compacted_files = [], []
    for d in range(n_days):
        rows = days[d] + (days[d - 1] if d > 0 else [])
        got = {}
        for tag, store in stores.items():
            got[tag] = _admitted_ids(
                dedup_incremental_tx(spark, _docs(spark, rows), store)
            )
            if tag == "compacted" and (d + 1) % compact_every == 0:
                compact_store_tx(spark, store)
        # identical admit decision on both layouts, only new docs enter
        assert got["plain"] == got["compacted"] == sorted(
            i for i, _ in days[d]
        )
        plain_files.append(len(sf(spark, stores["plain"])))
        compacted_files.append(len(sf(spark, stores["compacted"])))
    # append-only: one data file per day, forever
    assert plain_files == list(range(1, n_days + 1))
    # compacted: never more than base + compact_every-1 days of tail
    assert max(compacted_files) <= compact_every + 1
    assert compacted_files[-1] <= compact_every
    # the full ever-seen set survives compaction
    assert read_store(spark, stores["compacted"]).count() == n_days * 5


def test_append_loses_to_compaction_race(spark, tmp_path):
    """A daily-drop append and a compaction land on the same version
    slot; compaction wins.  The loser's re-check runs against the
    base=true entry (which IS the full visible snapshot), so its
    genuinely-new rows stay admitted and commit at the next slot —
    nothing lost, nothing double-admitted."""
    store = str(tmp_path / "store")
    dedup_incremental_tx(
        spark, _docs(spark, [(1, "alpha"), (2, "beta")]), store
    )  # v0

    out = dedup_incremental_tx(
        spark,
        _docs(spark, [(3, "gamma"), (4, "alpha")]),
        store,
        _pre_commit_hook=lambda: compact_store_tx(spark, store),
    )
    # compaction stole v1 (base=true); the append re-checked against it
    # and committed at v2
    assert _admitted_ids(out) == [3]
    versions = list_versions(spark, store)
    assert versions == [0, 1, 2]
    import json as _json

    entry1 = _json.loads(
        open(f"{store}/_txlog/00000001.json").read()
    )
    assert entry1["base"] is True
    snap = read_store(spark, store, versions)
    assert snap.count() == 3  # alpha, beta, gamma — exactly once each

    # the visible set admits correctly afterwards
    out3 = dedup_incremental_tx(
        spark, _docs(spark, [(5, "gamma"), (6, "delta")]), store
    )
    assert _admitted_ids(out3) == [6]


def test_compaction_loses_to_append_race(spark, tmp_path, monkeypatch):
    """The mirror race: an append steals the slot the compaction was
    about to commit its base entry into.  Compaction retries on top of
    the winner, so the final base snapshot CONTAINS the raced-in
    hashes and later drops are deduped against them."""
    import hashlib

    import processor_edf_spark.operators.txstore as tx

    store = str(tmp_path / "store")
    dedup_incremental_tx(
        spark, _docs(spark, [(1, "alpha"), (2, "beta")]), store
    )  # v0

    real_commit = tx.commit_version
    delta_sha = hashlib.sha256(b"delta").hexdigest()
    fired = {"done": False}

    def racing(spark_, store_dir, version, files, base=False):
        if base and not fired["done"]:
            fired["done"] = True
            # the racing daily drop wins the contested slot first
            name = tx._write_data_file(
                spark_,
                store_dir,
                spark_.createDataFrame(
                    [(delta_sha,)], "content_sha string"
                ),
            )
            real_commit(spark_, store_dir, version, [name])
        return real_commit(spark_, store_dir, version, files, base)

    monkeypatch.setattr(tx, "commit_version", racing)
    n = compact_store_tx(spark, store)
    # compaction lost v1 to the append, retried, committed base at v2
    # ON TOP of the raced-in hash
    assert n == 3
    versions = list_versions(spark, store)
    assert versions == [0, 1, 2]
    import json as _json

    assert _json.loads(open(f"{store}/_txlog/00000002.json").read())[
        "base"
    ] is True
    snap = read_store(spark, store, versions)
    assert snap.count() == 3
    assert {r["content_sha"] for r in snap.collect()} >= {delta_sha}

    # the raced-in hash dedupes later drops like any committed hash
    out = dedup_incremental_tx(
        spark, _docs(spark, [(7, "delta"), (8, "epsilon")]), store
    )
    assert _admitted_ids(out) == [8]
