"""SemDeDup cluster-size cap: clusters above SEMDEDUP_MAX_CLUSTER are
hash-sub-split so no task scores more than cap² pairs (VERDICT r3 "what's
wrong #3").  Pins both halves of the contract:

- under the cap the split is the identity — capped and uncapped paths
  return identical survivors;
- over the cap the semantics are exactly "dominated within (label,
  sub-bucket)" where sub = pmod(hash(vec_id), ceil(|c|/cap)) — verified
  against a pure-Python simulation using Spark's own hash assignment, so
  the recall trade is precisely the documented one (cross-sub-bucket
  pairs uncompared), never a silent wrong answer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from processor_edf_spark.plans.similarity import _semdedup_survivors

N_GROUPS = 10
GROUP_SZ = 4  # 40 vectors, one cluster (label 0)
DIM = 64


def _one_hot_cluster(spark):
    """40 vectors in one label: 10 groups of 4 scaled copies of distinct
    basis vectors — within-group cosine 1.0 (dominated), across-group 0.0
    (kept).  Group of vec_id v is v % N_GROUPS, so expected survivor sets
    are computable in pure Python."""
    rows = []
    for v in range(N_GROUPS * GROUP_SZ):
        e = np.zeros(DIM)
        e[v % N_GROUPS] = 1.0 + 0.5 * (v // N_GROUPS)  # scale ≠ 1: cosine only
        rows.append((v, e.tolist(), 0))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    return spark.createDataFrame(pdf)


def test_under_cap_split_is_identity(spark):
    emb = _one_hot_cluster(spark)
    exact = {r["vec_id"] for r in _semdedup_survivors(emb, 10**9).collect()}
    capped = {
        r["vec_id"]
        for r in _semdedup_survivors(emb, N_GROUPS * GROUP_SZ).collect()
    }
    # exact semantics: lowest id per duplicate group survives
    assert exact == set(range(N_GROUPS))
    assert capped == exact


def test_oversized_cluster_splits_to_documented_semantics(spark):
    emb = _one_hot_cluster(spark)
    cap = 16  # 40 rows → ceil(40/16) = 3 sub-buckets
    n_sub = -(-N_GROUPS * GROUP_SZ // cap)
    sub_of = {
        r["vec_id"]: r["sub"]
        for r in emb.select(
            "vec_id", F.pmod(F.hash("vec_id"), F.lit(n_sub)).alias("sub")
        ).collect()
    }
    # simulate: survivor = min vec_id per (sub-bucket, duplicate group)
    expected = set()
    for v in sub_of:
        expected.add(
            min(
                u
                for u in sub_of
                if u % N_GROUPS == v % N_GROUPS and sub_of[u] == sub_of[v]
            )
        )
    got = {r["vec_id"] for r in _semdedup_survivors(emb, cap).collect()}
    assert got == expected
    # the trade is recall-only: splitting never drops extra vectors
    exact = {r["vec_id"] for r in _semdedup_survivors(emb, 10**9).collect()}
    assert exact <= got
