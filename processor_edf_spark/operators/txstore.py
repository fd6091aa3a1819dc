"""Transaction-log hash store — the multi-writer upgrade of the
advisory-lock ``dedup_incremental`` (operators/packing.py), closing the
"table-format upgrade named but not wired" gap: the same optimistic-
concurrency commit protocol Delta/Iceberg use, reduced to exactly what
an append-mostly hash store needs, with no library dependency.

Layout::

    store_dir/
      _txlog/00000000.json   {"add": ["<uuid>.parquet", ...], "base": bool}
      _txlog/00000001.json   ...
      <uuid>.parquet         data files (invisible until a log entry
                             references them)

Protocol:

- **Writers never mutate** — data files are written under fresh UUID
  names, then made visible by committing log entry N+1.  The commit is
  an ATOMIC create-if-absent of ``_txlog/{N+1:08d}.json``: exactly one
  of any set of racing writers wins the version; losers see the
  conflict, re-read the entries they lost to, re-apply their check
  against ONLY the newly committed data, and retry at the next version.
  (Atomic create-if-absent holds on local FS — hard link — and on
  HDFS-contract filesystems — rename.  S3-style object stores have
  NEITHER: there the deployment must install a
  :class:`ConditionalPutPublisher` via :func:`set_commit_publisher`,
  wiring the store's conditional PUT (``If-None-Match: *``) as the
  one-winner primitive — the same substrate decision Delta documents.
  ``commit_version`` refuses object-store schemes without an explicit
  publisher rather than silently losing exactly-once.)
- **Readers take a snapshot**: list the log once, read the union of
  files from the base-most entry forward.  A concurrent commit never
  changes what an in-progress reader sees.
- **Compaction is just a commit** with ``base=true``: one entry whose
  files replace everything earlier.  Readers scanning backward stop at
  a base entry, so compaction races cleanly with both readers and
  writers (a writer that loses to a compaction re-checks against the
  compacted snapshot like any other conflict).
- **Crash before commit** leaves only unreferenced data files — the
  store's visible state is unchanged, and re-running the batch
  re-admits the same rows.  ``vacuum_store`` deletes unreferenced
  files; run it only with no writers in flight (documented).

``tests/test_txstore.py`` pins: cross-batch dedup, loser-retry
correctness under an injected race (no double-admission), snapshot
isolation across a concurrent commit, compaction equivalence, and
crash-before-commit invisibility.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TXLOG_SUBDIR = "_txlog"
MAX_COMMIT_RETRIES = 20


class CommitConflictError(RuntimeError):
    """Another writer committed this version first."""


class TxStoreRetriesExhausted(RuntimeError):
    """Gave up after MAX_COMMIT_RETRIES losing commit races."""


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    ), jpath, jvm


def _log_dir(store_dir: str) -> str:
    return f"{store_dir.rstrip('/')}/{TXLOG_SUBDIR}"


def _entry_path(store_dir: str, version: int) -> str:
    return f"{_log_dir(store_dir)}/{version:08d}.json"


def list_versions(spark: SparkSession, store_dir: str) -> list[int]:
    """Committed versions, ascending (empty list: store not created)."""
    fs, jpath, jvm = _fs(spark, _log_dir(store_dir))
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.endswith(".json"):
            try:
                out.append(int(name[:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_entry(spark: SparkSession, store_dir: str, version: int) -> dict:
    fs, jpath, jvm = _fs(spark, _entry_path(store_dir, version))
    stream = fs.open(jpath)
    try:
        data = bytes(
            spark.sparkContext._jvm.org.apache.commons.io.IOUtils.toByteArray(
                stream
            )
        )
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


def snapshot_files(
    spark: SparkSession, store_dir: str, versions: list[int] | None = None
) -> list[str]:
    """Data files visible at the given (default: latest) snapshot:
    scan entries backward, stop after a ``base`` entry."""
    if versions is None:
        versions = list_versions(spark, store_dir)
    picked: list[str] = []
    for v in reversed(versions):
        entry = _read_entry(spark, store_dir, v)
        picked = entry["add"] + picked
        if entry.get("base"):
            break
    return [f"{store_dir.rstrip('/')}/{name}" for name in picked]


def read_store(
    spark: SparkSession, store_dir: str, versions: list[int] | None = None
) -> DataFrame | None:
    """Snapshot read: None when the store has no committed version.

    Each entry directory is read as its OWN relation and the snapshot
    is their unionByName: entries may be hive-partitioned
    (``_write_data_file(partition_by=…)``), and Spark refuses one
    multi-root read over partitioned directories
    (CONFLICTING_DIRECTORY_STRUCTURES) — per-root reads also keep each
    entry's partition pruning intact.  Plan size grows with the entry
    count; compaction collapses it back to one relation."""
    files = snapshot_files(spark, store_dir, versions)
    if not files:
        return None
    out = spark.read.parquet(files[0])
    for f in files[1:]:
        out = out.unionByName(spark.read.parquet(f))
    return out


def _publish_local_link(spark, tmp_name: str, final_path: str) -> None:
    """Local-FS publish: POSIX rename(2) silently OVERWRITES an existing
    destination, so the one-winner primitive is hard-LINK creation —
    link() fails atomically when the destination exists."""
    jvm = spark.sparkContext._jvm
    nio = jvm.java.nio.file
    # java.io.File(...).toPath() — Paths.get is varargs, which py4j
    # can't call with a single string
    src = jvm.java.io.File(tmp_name.removeprefix("file:")).toPath()
    dst = jvm.java.io.File(final_path.removeprefix("file:")).toPath()
    try:
        nio.Files.createLink(dst, src)
    except Exception as exc:  # noqa: BLE001 — py4j wraps the Java type
        blob = f"{type(exc).__name__} {exc}".lower()
        if "alreadyexists" in blob or "file exists" in blob:
            raise CommitConflictError(
                f"{final_path} already committed"
            ) from exc
        raise


def _publish_fs_rename(spark, tmp_name: str, final_path: str) -> None:
    """HDFS-contract publish: rename fails when the destination exists
    (the FileSystem guarantee Delta relies on).  NOT valid on S3-style
    object stores, whose "rename" is copy+delete with no exclusivity."""
    fs, jpath, jvm = _fs(spark, final_path)
    tmp = jvm.org.apache.hadoop.fs.Path(tmp_name)
    if fs.exists(jpath) or not fs.rename(tmp, jpath):
        raise CommitConflictError(f"{final_path} already committed")


class ConditionalPutPublisher:
    """Object-store publish seam: plain S3 has neither atomic rename
    nor create-if-absent via the Hadoop FileSystem API, so the
    one-winner step must be a CONDITIONAL PUT (S3 ``If-None-Match: *``,
    GCS ``x-goods-if-generation-match: 0``, ABFS ``If-None-Match: *``)
    or an external coordination service — the same substrate decision
    Delta documents for S3 multi-writer.

    Wire it with the deployment's object-store client::

        def put_if_absent(payload: bytes, path: str) -> bool:
            # return True when this call created the object, False when
            # the key already existed (the conditional PUT failed with
            # 412); raise on any other error
            ...
        set_commit_publisher(ConditionalPutPublisher(put_if_absent))

    The publisher reads the already-written temp entry through the
    Hadoop FS (so the payload bytes are exactly what a winning local
    commit would publish) and hands them to the conditional put."""

    def __init__(self, put_if_absent):
        self._put_if_absent = put_if_absent

    def __call__(self, spark, tmp_name: str, final_path: str) -> None:
        fs, jpath, jvm = _fs(spark, tmp_name)
        stream = fs.open(jpath)
        try:
            payload = bytes(
                jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()
        if not self._put_if_absent(payload, final_path):
            raise CommitConflictError(f"{final_path} already committed")


# Module-level publisher override (None → pick by URI scheme: local FS
# hard-link, otherwise HDFS-contract rename).  Deployments on object
# stores MUST install a ConditionalPutPublisher — the scheme default
# would silently lose the one-winner guarantee there, so commit_version
# refuses any scheme NOT on the rename-contract allowlist without an
# explicit publisher.  Allowlist (not a denylist): enumerating object
# stores is a losing game (s3 vs s3a vs wasb vs wasbs vs oss vs cosn
# ...), and a scheme we have never heard of is exactly the case that
# must fail safe.  The listed schemes implement Hadoop's atomic
# single-file rename contract.
_PUBLISHER = None
_RENAME_CONTRACT_SCHEMES = (None, "file", "hdfs", "viewfs", "webhdfs")


def set_commit_publisher(publisher) -> None:
    """Install a commit publisher: a callable
    ``(spark, tmp_path, final_path) -> None`` that atomically makes the
    temp entry visible at ``final_path`` and raises
    :class:`CommitConflictError` when the destination already exists.
    Pass ``None`` to restore the scheme-based default."""
    global _PUBLISHER
    _PUBLISHER = publisher


def commit_version(
    spark: SparkSession,
    store_dir: str,
    version: int,
    files: list[str],
    base: bool = False,
) -> None:
    """Atomically publish ``files`` as log entry ``version`` — raises
    :class:`CommitConflictError` when a racing writer won the slot.

    The payload is fully written to a hidden temp name first, then made
    visible by the configured publisher's one-winner primitive (see
    :func:`set_commit_publisher`): no reader can ever observe a
    truncated entry and exactly one racing writer wins.  Substrates:
    local FS → hard-link creation; HDFS-contract filesystems → rename;
    S3-style object stores → a :class:`ConditionalPutPublisher` the
    deployment must install (refused otherwise, because blind
    copy-rename on an object store would silently drop the exactly-once
    admission guarantee)."""
    def _refuse(scheme: str) -> None:
        raise RuntimeError(
            f"commit_version on {scheme}:// needs an explicit "
            "ConditionalPutPublisher (set_commit_publisher): object "
            "stores have no atomic rename/create-if-absent, so the "
            "scheme default cannot guarantee one commit winner"
        )

    url_scheme = store_dir.split("://", 1)[0] if "://" in store_dir else None
    if _PUBLISHER is None and url_scheme not in _RENAME_CONTRACT_SCHEMES:
        # refuse BEFORE touching the filesystem: the check must hold
        # even where the object-store connector jar isn't on the
        # classpath, and a failed publish should leave nothing behind
        _refuse(url_scheme)
    fs, jpath, jvm = _fs(spark, _entry_path(store_dir, version))
    # a scheme-LESS path resolves against fs.defaultFS — ask the
    # RESOLVED filesystem what it is, so '/warehouse/store' on an
    # s3a-defaultFS cluster is refused too (and an hdfs-defaultFS
    # cluster routes to the rename publisher, never the local link)
    fs_scheme = fs.getUri().getScheme()
    if _PUBLISHER is None and fs_scheme not in _RENAME_CONTRACT_SCHEMES:
        _refuse(fs_scheme)
    hpath = jvm.org.apache.hadoop.fs.Path
    fs.mkdirs(hpath(_log_dir(store_dir)))
    payload = json.dumps({"add": files, "base": base}).encode("utf-8")
    tmp_name = f"{_log_dir(store_dir)}/.tmp-{uuid.uuid4().hex}"
    tmp = hpath(tmp_name)
    out = fs.create(tmp, False)
    try:
        out.write(bytearray(payload))
    finally:
        out.close()

    if _PUBLISHER is not None:
        publish = _PUBLISHER
    elif fs_scheme in (None, "file"):
        publish = _publish_local_link
    else:
        publish = _publish_fs_rename
    try:
        publish(spark, tmp_name, _entry_path(store_dir, version))
    finally:
        # the local-link and conditional-put paths leave the temp file
        # behind on both success and conflict; rename consumes it on
        # success only — delete is a no-op then
        fs.delete(tmp, False)


def _write_data_file(
    spark: SparkSession, store_dir: str, df: DataFrame,
    partition_by: list[str] | None = None,
) -> str:
    """Write ``df`` under a fresh UUID directory name (parquet dir) —
    invisible until committed.  ``partition_by`` hive-partitions the
    entry's files by the named columns (one file per value), so
    snapshot readers that filter on them prune whole files — the store
    contract is unchanged (an entry is still one committed directory)."""
    name = f"data-{uuid.uuid4().hex}.parquet"
    w = df.coalesce(1).write
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(f"{store_dir.rstrip('/')}/{name}")
    return name


def dedup_incremental_tx(
    spark: SparkSession,
    batch: DataFrame,
    store_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    _pre_commit_hook=None,
) -> DataFrame:
    """Multi-writer incremental dedup: admit rows whose content sha-256
    no committed snapshot has seen, publish the admitted hashes as the
    next log version.  Safe under CONCURRENT writers: a lost commit race
    re-checks the admitted set against exactly the entries that beat it
    and retries — a hash admitted by the winner is not admitted again.

    ``_pre_commit_hook`` is a test seam (called between data-file write
    and commit attempt) used to inject a racing commit deterministically;
    production callers leave it None."""
    from pyspark.sql import Window

    keyed = batch.withColumn("content_sha", F.sha2(F.col(text_col), 256))
    w = Window.partitionBy("content_sha").orderBy(id_col)
    admitted = (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    versions = list_versions(spark, store_dir)
    seen = read_store(spark, store_dir, versions)
    if seen is not None:
        admitted = admitted.join(
            seen.select("content_sha"), "content_sha", "left_anti"
        )
    admitted = admitted.localCheckpoint(eager=True)

    for _ in range(MAX_COMMIT_RETRIES):
        if admitted.isEmpty():
            return admitted.drop("content_sha")
        name = _write_data_file(
            spark, store_dir, admitted.select("content_sha")
        )
        if _pre_commit_hook is not None:
            hook, _pre_commit_hook = _pre_commit_hook, None
            hook()
        next_version = (versions[-1] + 1) if versions else 0
        try:
            commit_version(spark, store_dir, next_version, [name])
            return admitted.drop("content_sha")
        except CommitConflictError:
            # re-check against ONLY the entries that beat us, retry
            new_versions = list_versions(spark, store_dir)
            delta = [v for v in new_versions if v not in versions]
            winner = read_store(spark, store_dir, delta)
            if winner is not None:
                admitted = admitted.join(
                    winner.select("content_sha"), "content_sha", "left_anti"
                ).localCheckpoint(eager=True)
            versions = new_versions
    raise TxStoreRetriesExhausted(
        f"lost {MAX_COMMIT_RETRIES} commit races on {store_dir}"
    )


def compact_store_tx(spark: SparkSession, store_dir: str) -> int:
    """Rewrite the visible snapshot as one dense ``base=true`` entry;
    returns the distinct-hash count.  Loses cleanly to racing appends
    (retries on top of them)."""
    for _ in range(MAX_COMMIT_RETRIES):
        versions = list_versions(spark, store_dir)
        snap = read_store(spark, store_dir, versions)
        if snap is None:
            return 0
        dense = snap.select("content_sha").distinct().localCheckpoint(
            eager=True
        )
        n = dense.count()
        name = _write_data_file(spark, store_dir, dense)
        try:
            commit_version(
                spark, store_dir, versions[-1] + 1, [name], base=True
            )
            return n
        except CommitConflictError:
            continue
    raise TxStoreRetriesExhausted(
        f"lost {MAX_COMMIT_RETRIES} compaction races on {store_dir}"
    )


def vacuum_store(
    spark: SparkSession, store_dir: str, expire_history: bool = False
) -> int:
    """Delete data files referenced by NO log entry (crashed writers).

    Default mode is snapshot-safe: a file referenced by ANY committed
    entry is kept, so readers holding a pinned-version snapshot (the
    ``read_store(versions=...)`` API) keep working and old log entries
    never dangle — only true orphans from crashed writers go.

    ``expire_history=True`` additionally truncates the log to the
    latest ``base`` entry and forward (deleting earlier entries and the
    files only they referenced) — the Delta-VACUUM-style mode that
    reclaims pre-compaction storage at the documented cost of
    INVALIDATING pinned snapshots older than that base entry.

    Either mode: run only with no writers in flight — a writer between
    data-file write and commit would lose its file (the same quiesce
    requirement as Delta's VACUUM retention window).  Returns the
    number of deleted data files."""
    fs, jpath, jvm = _fs(spark, store_dir)
    if not fs.exists(jpath):
        return 0
    hpath = jvm.org.apache.hadoop.fs.Path
    versions = list_versions(spark, store_dir)
    if expire_history and versions:
        # log entries strictly before the newest base entry are
        # unreachable from the latest snapshot; truncate them
        keep_from = 0
        for v in reversed(versions):
            if _read_entry(spark, store_dir, v).get("base"):
                keep_from = v
                break
        for v in versions:
            if v < keep_from:
                fs.delete(hpath(_entry_path(store_dir, v)), False)
        versions = [v for v in versions if v >= keep_from]
    referenced = {
        name
        for v in versions
        for name in _read_entry(spark, store_dir, v)["add"]
    }
    deleted = 0
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name == TXLOG_SUBDIR or name in referenced:
            continue
        if name.startswith("data-"):
            fs.delete(st.getPath(), True)
            deleted += 1
    return deleted
