"""Registry for driver-contract queries and their DuckDB oracles."""

from __future__ import annotations

from collections.abc import Callable
from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession

#: spread()'s partition-count probe memo — see the function body.
_SPREAD_MEMO: WeakKeyDictionary = WeakKeyDictionary()

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame plan builder and
    optionally its DuckDB oracle SQL (omitted → driver does rows-only check).
    """

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# Canonical epoch-µs derivation for the testdata's timestamp columns.
# The parquet carries naive (no-timezone) TIMESTAMP(MICROS) columns, which
# Spark reads as TIMESTAMP_NTZ.  With the session timezone pinned to UTC
# (load() below), ``cast(ntz AS timestamp)`` maps the wall-clock reading
# onto the identical UTC instant, so ``unix_micros`` yields exactly what
# DuckDB's ``epoch_us(ts)`` yields on the same naive value — the driver's
# cross-engine hash compares epoch-µs BIGINTs, so this identity is the
# whole correctness contract for time columns.  Filters that should reach
# the parquet scan must compare the RAW column (Catalyst folds a
# TIMESTAMP literal to NTZ and pushes the predicate); derive epoch-µs
# only in post-filter projections.
TS_US = "unix_micros(cast(ts as timestamp))"


def ts_usec(col: str = "ts"):
    """Column form of :data:`TS_US` for an arbitrary column name."""
    from pyspark.sql import functions as F

    return F.unix_micros(F.col(col).cast("timestamp"))


def load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Read input tables, robust to *any* caller-built SparkSession.

    Two runtime-settable session confs are pinned here rather than trusted
    from whoever built the session (the driver's harness uses a plain
    ``SparkSession.builder``):

    - ``spark.sql.session.timeZone=UTC`` — the testdata's timestamp
      columns are naive TIMESTAMP(MICROS) (TIMESTAMP_NTZ in Spark); every
      plan derives epoch-µs via :data:`TS_US`, which is only equal to
      DuckDB's ``epoch_us`` when the NTZ→instant cast happens in UTC.
    - ``spark.sql.legacy.parquet.nanosAsLong=true`` — some upstream
      writers emit INT64 TIMESTAMP(NANOS) (pandas ``datetime64[ns]``),
      which Spark otherwise refuses; with the conf the column arrives as
      long ns for explicit conversion.  (The current testdata is µs, so
      this is dormant compatibility, not the main path.)

    DELIBERATE SESSION-WIDE SIDE EFFECT: both confs persist on the session
    after the first load(); a caller needing different semantics for its
    own reads must reset them or use a separate session.  Guarded so they
    are applied once, not re-set per call.
    """
    if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return [spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names]


def spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Widen scan parallelism for CPU-heavy per-row kernels (md5 per
    shingle/token, edit-distance DP): a small single-file scan reads as
    ONE partition (file < maxPartitionBytes), which serializes the kernel
    into one task regardless of cluster width.

    Conditional on purpose: the repartition (a full shuffle of the input)
    is inserted only when the scan yields fewer partitions than the
    session's shuffle width.  At real scale the file splitter already
    produces >= that many partitions and this is a no-op — an
    unconditional repartition would shuffle the whole corpus for nothing.
    """
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # The RDD probe is deliberate (r11 adjudication of the "avoid the
    # RDD API" review note): it returns the scan's ACTUAL partition
    # count after the file splitter's packing/splitting.  The proposed
    # ``len(df.inputFiles())`` proxy is wrong in both directions — many
    # tiny files pack into ONE partition (the exact hazard spread()
    # exists for: file count >= n would skip a needed repartition), and
    # one large splittable file yields MANY partitions (file count 1
    # would inject a pointless full shuffle).
    #
    # r14: the probe is MEMOIZED per (session, analyzed-plan
    # semanticHash).  The probe forces full physical planning + RDD
    # translation (~70-200 ms per fresh DataFrame), which 58 call sites
    # paid on every invocation; the partition count is a pure function
    # of the analyzed plan and the session's splitter confs, so
    # identical plans (every bench warm-up/timed pair, every re-run of
    # a registered query in one session) hit the memo at the cost of
    # plan analysis only (~15 ms).  Same session-lifetime assumption as
    # Spark's own file-listing cache: splitter confs don't move
    # mid-session.
    # r15 (ADVICE): the 32-bit semanticHash alone can collide, so the
    # memo stores the CANONICALIZED plan string alongside the count and
    # confirms it on every hit (Spark's own cache-lookup discipline) —
    # a collision degrades to a re-probe, never a wrong count.
    # Remaining assumption (documented, shared with Spark's file-listing
    # cache): files at a probed path do not change mid-session; a test
    # that overwrites a path it already probed must call
    # spread_invalidate(spark) first.
    memo = _SPREAD_MEMO.setdefault(spark, {})
    analyzed = df._jdf.queryExecution().analyzed()
    key = analyzed.semanticHash()
    hit = memo.get(key)
    canon = None
    if hit is not None:
        canon = analyzed.canonicalized().toString()
        if hit[0] == canon:
            cur = hit[1]
        else:
            hit = None
    if hit is None:
        cur = df.rdd.getNumPartitions()
        if canon is None:
            canon = analyzed.canonicalized().toString()
        memo[key] = (canon, cur)
    if cur < n:
        return df.repartition(n)
    return df


def spread_invalidate(spark: SparkSession) -> None:
    """Drop spread()'s partition-count memo for this session — call
    after overwriting files at a path a query in this session already
    probed (in-session rewrite paths, tests)."""
    _SPREAD_MEMO.pop(spark, None)
