#!/usr/bin/env python
"""Local replica of the driver's correctness gate over ALL registered
queries (the driver checks only the first 50): runs every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compares row count,
column names, and an order-insensitive value hash with the driver's
column-sort-then-hash discipline, and writes CORRECTNESS_LOCAL.json.

The point (per round-2 advice): queries rotated past the driver's 50-slot
window still get a committed, driver-equivalent correctness record every
round, so window rotation is demonstrably coverage-neutral.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from processor_edf_spark.schemas import TESTDATA_TABLES  # noqa: E402
from processor_edf_spark.session import get_spark  # noqa: E402


def _canon(v):
    """Canonical string form for hashing — type-sensitive (int 3 != float
    3.0) and RAW for floats (repr, no rounding): every plan in this repo
    already rounds its float outputs identically on both engines, so a
    divergence at any decimal is a real parity bug this gate must catch,
    exactly as the driver's raw-value hash would."""
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if v == 0.0:  # collapse -0.0 / 0.0
            v = 0.0
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    return f"s:{v}"


def value_hash(rows: list[dict], cols: list[str]) -> str:
    lines = sorted(
        "\x1f".join(_canon(r[c]) for c in cols) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_path = os.environ.get("CORRECTNESS_OUT", "CORRECTNESS_LOCAL.json")

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    spark = get_spark("correctness_local", cpus=8)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results: dict[str, dict] = {}
    for name, fn in queries.items():
        rec: dict = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = fn(spark, sf_dir)
            cols = sorted(sdf.columns)
            srows = [r.asDict() for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
            odf = con.execute(oracles[name]).fetchdf()
            odf.columns = [c.lower() for c in odf.columns]
            orows = []
            for r in odf.to_dict("records"):
                orows.append({k: (v.item() if hasattr(v, "item") else v) for k, v in r.items()})
            rec["oracle_rows"] = len(orows)
            rec["rows_match"] = len(srows) == len(orows)
            rec["schema_match"] = cols == sorted(odf.columns)
            if rec["rows_match"] and rec["schema_match"]:
                rec["hash_match"] = value_hash(srows, cols) == value_hash(orows, cols)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = rec
        tag = "OK " if rec["hash_match"] else "RED"
        print(f"{tag} {name}: rows={rec['spark_rows']}/{rec['oracle_rows']} err={rec['err']}")

    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "n_queries": len(results), "results": results}, f, indent=1)
    red = [n for n, r in results.items() if not r["hash_match"]]
    print(f"\n{len(results) - len(red)}/{len(results)} green; red: {red}")
    spark.stop()
    if red:
        sys.exit(1)


if __name__ == "__main__":
    main()
