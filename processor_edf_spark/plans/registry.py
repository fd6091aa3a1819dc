"""Registry for driver-contract queries and their DuckDB oracles."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

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


def load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Read input tables, robust to *any* caller-built SparkSession.

    The testdata parquet carries INT64 TIMESTAMP(NANOS) columns (pandas
    datetime64[ns]); Spark has no nanosecond timestamp type and refuses the
    file unless ``spark.sql.legacy.parquet.nanosAsLong`` is set, in which
    case the column arrives as long (ns since epoch) — exactly what every
    plan here expects (``ts div 1000`` ≡ µs truncation).  The conf is
    runtime-settable, so set it here rather than trusting whoever built the
    session (the driver's harness uses a plain ``SparkSession.builder``).

    DELIBERATE SESSION-WIDE SIDE EFFECT: after the first load() on a
    session, any nanos-typed parquet column that session reads arrives as
    long, not TIMESTAMP.  That is the contract every plan in this package
    is written against (all testdata timestamp columns are nanos), and the
    driver harness depends on it; a caller needing TIMESTAMP semantics for
    its own reads must unset the conf or use a separate session.  Guarded
    so it is applied once per session, not re-set on every call.
    """
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
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
