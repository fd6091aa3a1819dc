"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() on DuckDB against the same parquet, compare
row count, column names, and order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from processor_edf_spark.schemas import TESTDATA_TABLES

QUERIES = entry_mod.queries()
ORACLE = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(rows, columns):
    out = []
    for row in rows:
        vals = []
        for c in columns:
            v = row[c]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            elif isinstance(v, bool):
                v = bool(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_rows = [r.asDict() for r in sdf.collect()]
    spark_cols = sorted(sdf.columns)

    if name not in ORACLE:
        assert len(spark_rows) >= 0  # rows-only check (non-SQL-expressible)
        return

    odf = duck.execute(ORACLE[name]).fetchdf()
    oracle_cols = sorted(c.lower() for c in odf.columns)
    assert spark_cols == oracle_cols, f"schema mismatch: {spark_cols} vs {oracle_cols}"
    assert len(spark_rows) == len(odf), (
        f"row count mismatch: spark={len(spark_rows)} oracle={len(odf)}"
    )

    oracle_rows = odf.rename(columns={c: c.lower() for c in odf.columns}).to_dict(
        "records"
    )
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(
        [{k: _coerce(v) for k, v in r.items()} for r in oracle_rows], spark_cols
    )
    mismatches = [(x, y) for x, y in zip(a, b) if not _tuple_eq(x, y)]
    assert not mismatches, f"{len(mismatches)} value mismatches, first: {mismatches[0]}"


def _coerce(v):
    import numpy as np
    import pandas as pd

    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (np.bool_,)):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def _tuple_eq(a, b):
    """Driver-exact compare: the driver hashes raw values after a
    column-name sort, so a DuckDB HUGEINT that pandas materializes as
    float64 ``3.0`` must NOT equal Spark's int ``3`` here — type-laxness
    in this mirror is exactly how the r2 sessionize hash mismatch escaped
    to the driver.  Floats compare with tolerance only when BOTH sides
    are floats; any int/float (or other cross-type) pairing fails."""
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, bool) != isinstance(y, bool):
            return False
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                return False
        elif type(x) is not type(y):
            return False
        elif x != y:
            return False
    return True


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize(
    "name",
    [
        # float-bearing plans where a reduction-order dependence would
        # be invisible to the single-config oracle mirror
        "interp_linear_hourly",
        "event_cooccurrence_lift",
        "user_value_correlation",
        "time_weighted_avg_daily",
        "events_job_report",
        "anomaly_robust_z",
        "bigram_lm_surprisal",
        "dsir_importance",
        "ewma_user_values",
        "bm25_top_docs",
    ],
)
def test_result_invariant_under_shuffle_width(spark, name):
    """The driver runs one Spark config; the determinism the oracle
    hash relies on must hold under ANY partitioning.  Re-running with a
    prime shuffle width must reproduce the 32-partition result
    EXACTLY — a plan whose floats depend on reduction order fails here
    before it flakes in a future driver environment."""
    from processor_edf_spark.plans import QUERIES

    fn = QUERIES[name]
    sf = "/root/testdata/sf0.001"

    def run():
        rows = fn(spark, sf).collect()
        cols = sorted(rows[0].asDict()) if rows else []
        return sorted(tuple(r[c] for c in cols) for r in rows)

    base = run()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        assert run() == base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert len(base) > 0
