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
    existing dir is additionally validated for the expected tables
    (including that embeddings is a REAL ×k replica, not the symlink
    pre-r6 caches carried — those are rebuilt)."""
    out = f"/tmp/scale_x{k}"
    expected = {"documents", "events", "embeddings", *TESTDATA_TABLES}
    if os.path.isdir(out):
        have = {
            t for t in expected if os.path.exists(f"{out}/{t}.parquet")
        }
        ok = have == expected and all(
            os.path.exists(f"{out}/{t}.parquet/_SUCCESS")
            and not os.path.islink(f"{out}/{t}.parquet")
            for t in ("documents", "events", "embeddings")
        )
        if ok:
            return out
        shutil.rmtree(out)  # stale/partial cache — rebuild
    tmp = f"{out}.building"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    events = spark.read.parquet(f"{BASE}/events.parquet")
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    parts_d, parts_e, parts_v = [], [], []
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
        # copy i>0 is a NEAR-duplicate vector (one small uniform bias):
        # dedup-by-cosine stays stressed, while the id space shifts
        parts_v.append(
            emb.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                F.transform(
                    F.col("embedding"), lambda x: x + F.lit(i * 1e-3)
                )
                .cast("array<float>")
                .alias("embedding"),
                "label",
            )
        )
    d = parts_d[0]
    for p in parts_d[1:]:
        d = d.unionByName(p)
    e = parts_e[0]
    for p in parts_e[1:]:
        e = e.unionByName(p)
    v = parts_v[0]
    for p in parts_v[1:]:
        v = v.unionByName(p)
    d.write.parquet(f"{tmp}/documents.parquet")
    e.write.parquet(f"{tmp}/events.parquet")
    v.write.parquet(f"{tmp}/embeddings.parquet")
    for t in TESTDATA_TABLES:
        dst = f"{tmp}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    os.rename(tmp, out)  # atomic publish — cache is all-or-nothing
    return out


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def ann_rows(spark, sf_dir: str) -> dict[str, float]:
    """Time the ANN path at one replica scale — the 100 TB evidence rows
    for BASELINE.md: codebook/centroid training is bounded-sample (flat
    across scales by design), encode+search scans the full corpus (the
    line that must stay LINEAR), and the hash_embed→IVF+PQ chain is the
    text-corpus-to-retrieval composition end-to-end.  Warm second runs,
    matching the query sweep's discipline."""
    import numpy as np

    from processor_edf_spark.operators.embed import hash_embed
    from processor_edf_spark.operators.kmeans import kmeans_fit
    from processor_edf_spark.operators.pq import ivf_pq_search, pq_train
    from processor_edf_spark.plans.registry import load

    out: dict[str, float] = {}
    (emb,) = load(spark, sf_dir, "embeddings")
    emb = emb.localCheckpoint(eager=True)

    t0 = time.perf_counter()
    C = kmeans_fit(emb, k=16, n_iter=5)
    books = pq_train(emb, m=16, k=16, n_iter=3)
    out["ann_train"] = round(time.perf_counter() - t0, 2)

    qpdf = emb.limit(32).toPandas()
    Q = np.vstack(qpdf["embedding"].to_numpy())
    qids = qpdf["vec_id"].to_numpy()
    _noop(ivf_pq_search(emb, C, books, Q, qids, k=10, nprobe=3))
    t0 = time.perf_counter()
    _noop(ivf_pq_search(emb, C, books, Q, qids, k=10, nprobe=3))
    out["ivf_pq_search"] = round(time.perf_counter() - t0, 2)

    (docs,) = load(spark, sf_dir, "documents")

    def chain():
        vecs = hash_embed(docs, dim=64).localCheckpoint(eager=True)
        C2 = kmeans_fit(vecs, k=16, n_iter=5)
        books2 = pq_train(vecs, m=16, k=16, n_iter=3)
        qp = vecs.limit(32).toPandas()
        Q2 = np.vstack(qp["embedding"].to_numpy())
        _noop(
            ivf_pq_search(
                vecs, C2, books2, Q2, qp["vec_id"].to_numpy(), k=10, nprobe=3
            )
        )

    chain()
    t0 = time.perf_counter()
    chain()
    out["hash_embed_ivf_pq_e2e"] = round(time.perf_counter() - t0, 2)
    return out


def main() -> None:
    scales, names, ann = [], list(DEFAULT_QUERIES), False
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--q":
            names = args.pop(0).split(",")
        elif a == "--ann":
            ann = True
        elif a.startswith("x"):
            scales.append(int(a[1:]))
    scales = scales or [1, 4, 8]

    spark = get_spark("scale_sweep", cpus=32)
    from processor_edf_spark.plans import QUERIES

    dirs = {k: build_replica(spark, k) for k in scales}
    if ann:
        rows = {}
        for k in scales:
            for n, sec in ann_rows(spark, dirs[k]).items():
                rows.setdefault(n, {})[k] = sec
                print(f"x{k} {n}: {sec}", flush=True)
        names = list(rows)
    else:
        rows = {n: {} for n in names}
        for k in scales:
            for n in names:
                fn = QUERIES[n]
                try:
                    _noop(fn(spark, dirs[k]))
                    t0 = time.perf_counter()
                    _noop(fn(spark, dirs[k]))
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
