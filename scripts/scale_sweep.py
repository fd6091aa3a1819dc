#!/usr/bin/env python
"""Replica scale sweep (the BASELINE.md "would the plan survive a
scale-up" probe, now committed as a reusable script): replicate the big
tables ×K with shifted ids and light mutation into /tmp dirs, then
re-time selected queries (warm second runs).

The replica corpus is deliberately DUPLICATION-HEAVY — every original
document gains K-1 near-copies (one extra distinct token each), so
dedup/pair queries are stressed at their worst case while scan/agg
queries see plain K× volume.

Usage:
    python scripts/scale_sweep.py [xK ...] [--q name1,name2,...]
Defaults: x1 x4 x8 over the r5 batch-2 queries.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from processor_edf_spark.schemas import TESTDATA_TABLES  # noqa: E402
from processor_edf_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
DEFAULT_QUERIES = [
    "gopher_quality_flags",
    "weighted_sample_aes",
    "zorder_layout",
    "bigram_lm_surprisal",
    "dsir_importance",
    "jaccard_prefix_pairs",
]


def build_replica(spark, k: int) -> str:
    """Build (or reuse) the ×k replica dir.  Writes land in a temp dir
    renamed into place on success, so a crash mid-build can never leave
    a half-written replica that a later sweep silently benchmarks; an
    existing dir is additionally validated for the expected tables."""
    out = f"/tmp/scale_x{k}"
    expected = {"documents", "events", *TESTDATA_TABLES}
    if os.path.isdir(out):
        have = {
            t for t in expected if os.path.exists(f"{out}/{t}.parquet")
        }
        ok = have == expected and all(
            os.path.exists(f"{out}/{t}.parquet/_SUCCESS")
            for t in ("documents", "events")
        )
        if ok:
            return out
        shutil.rmtree(out)  # stale/partial cache — rebuild
    tmp = f"{out}.building"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    events = spark.read.parquet(f"{BASE}/events.parquet")
    parts_d, parts_e = [], []
    for i in range(k):
        parts_d.append(
            docs.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                # copy i>0 gains one distinct trailing token — a NEAR copy
                (
                    F.col("text")
                    if i == 0
                    else F.concat(F.col("text"), F.lit(f" copytag{i}"))
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        parts_e.append(
            events.select(
                (F.col("event_id") + i * 100_000_000).alias("event_id"),
                "ts",
                (F.col("user_id") + i * 1_000_000).alias("user_id"),
                "event_type",
                (F.col("value") + i * 0.001).alias("value"),
                "props",
            )
        )
    d = parts_d[0]
    for p in parts_d[1:]:
        d = d.unionByName(p)
    e = parts_e[0]
    for p in parts_e[1:]:
        e = e.unionByName(p)
    d.write.parquet(f"{tmp}/documents.parquet")
    e.write.parquet(f"{tmp}/events.parquet")
    for t in TESTDATA_TABLES:
        dst = f"{tmp}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    os.rename(tmp, out)  # atomic publish — cache is all-or-nothing
    return out


def main() -> None:
    scales, names = [], list(DEFAULT_QUERIES)
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--q":
            names = args.pop(0).split(",")
        elif a.startswith("x"):
            scales.append(int(a[1:]))
    scales = scales or [1, 4, 8]

    spark = get_spark("scale_sweep", cpus=32)
    from processor_edf_spark.plans import QUERIES

    dirs = {k: build_replica(spark, k) for k in scales}
    rows = {n: {} for n in names}
    for k in scales:
        for n in names:
            fn = QUERIES[n]
            try:
                fn(spark, dirs[k]).write.format("noop").mode("overwrite").save()
                t0 = time.perf_counter()
                fn(spark, dirs[k]).write.format("noop").mode("overwrite").save()
                rows[n][k] = round(time.perf_counter() - t0, 2)
            except Exception as e:  # noqa: BLE001
                rows[n][k] = f"FAIL:{type(e).__name__}"
            print(f"x{k} {n}: {rows[n][k]}", flush=True)
    print("\n| query | " + " | ".join(f"×{k}" for k in scales) + " |")
    print("|---|" + "---|" * len(scales))
    for n in names:
        print(f"| {n} | " + " | ".join(str(rows[n][k]) for k in scales) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
