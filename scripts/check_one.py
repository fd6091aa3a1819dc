#!/usr/bin/env python
"""Ad-hoc single-query parity check (dev tool): run named queries from the
registry (plus any module given via --mod) against their DuckDB oracles at
a given sf dir, using the exact driver hash discipline from
correctness_local.py.  Usage:
    python scripts/check_one.py [--sf DIR] [--mod plans.module] name [name...]
"""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from processor_edf_spark.schemas import TESTDATA_TABLES  # noqa: E402
from processor_edf_spark.session import get_spark  # noqa: E402
from scripts.correctness_local import value_hash  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    names = []
    while args:
        a = args.pop(0)
        if a == "--sf":
            sf_dir = args.pop(0)
        elif a == "--mod":
            importlib.import_module(args.pop(0))
        else:
            names.append(a)
    from processor_edf_spark.plans.registry import ORACLE, QUERIES

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    spark = get_spark("check_one", cpus=8)
    ok = True
    for name in names:
        sdf = QUERIES[name](spark, sf_dir)
        cols = sorted(sdf.columns)
        srows = [r.asDict() for r in sdf.collect()]
        odf = con.execute(ORACLE[name]).fetchdf()
        odf.columns = [c.lower() for c in odf.columns]
        orows = [
            {k: (v.item() if hasattr(v, "item") else v) for k, v in r.items()}
            for r in odf.to_dict("records")
        ]
        rows = len(srows) == len(orows)
        schema = cols == sorted(odf.columns)
        hmatch = rows and schema and value_hash(srows, cols) == value_hash(orows, cols)
        print(f"{'OK ' if hmatch else 'RED'} {name}: rows={len(srows)}/{len(orows)} "
              f"schema={schema} cols={cols if not schema else ''}")
        if not hmatch:
            ok = False
            if rows and schema:
                ss = sorted("\x1f".join(str(r[c]) for c in cols) for r in srows)
                oo = sorted("\x1f".join(str(r[c]) for c in cols) for r in orows)
                diffs = [(a, b) for a, b in zip(ss, oo) if a != b][:5]
                for a, b in diffs:
                    print(f"  spark : {a!r}\n  oracle: {b!r}")
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
