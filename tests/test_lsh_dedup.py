"""Linear LSH dedup: bucket-star components vs a brute-force union-find
reference, and the scale contract vs the pair queries."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.slow

from processor_edf_spark.operators.lsh_dedup import (
    lsh_components,
    lsh_dedup_survivors,
)


def _reference_components(pairs_of_id_key):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    by_key = {}
    for i, k in pairs_of_id_key:
        by_key.setdefault(k, []).append(i)
    for members in by_key.values():
        for m in members[1:]:
            ra, rb = find(members[0]), find(m)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    ids = {i for i, _ in pairs_of_id_key}
    # canonical label = min member of each set
    groups = {}
    for i in ids:
        groups.setdefault(find(i), set()).add(i)
    return {i: min(g) for g in groups.values() for i in g}


def test_lsh_components_match_union_find_reference(spark):
    rng = np.random.default_rng(13)
    rows = []
    # 40 ids, 15 bucket keys, random membership incl. chains that merge
    for i in range(40):
        for k in rng.choice(15, size=rng.integers(1, 4), replace=False):
            rows.append((int(i), f"k{int(k)}"))
    df = spark.createDataFrame(rows, "doc_id long, band_key string")
    got = {
        r["doc_id"]: r["component"]
        for r in lsh_components(df).collect()
    }
    ref = _reference_components(rows)
    assert got == ref
    surv = sorted(r["doc_id"] for r in lsh_dedup_survivors(df).collect())
    assert surv == sorted(set(ref.values()))


def test_lsh_components_edge_count_is_linear(spark):
    """The whole point: a duplicate group of size g contributes g-1
    star edges, never g^2/2 pairs."""
    g = 64
    df = spark.createDataFrame(
        [(i, "hot") for i in range(g)] + [(100 + i, f"s{i}") for i in range(5)],
        "doc_id long, band_key string",
    )
    roots = df.groupBy("band_key").agg(F.min("doc_id").alias("_root"))
    edges = (
        df.join(roots, "band_key")
        .filter(F.col("doc_id") != F.col("_root"))
    )
    assert edges.count() == g - 1  # not g*(g-1)/2
    comp = lsh_components(df)
    assert comp.filter(F.col("component") == 0).count() == g
    assert lsh_dedup_survivors(df).count() == 6  # 1 hot group + 5 singletons


def test_null_bucket_key_rows_stay_singletons(spark):
    """A caller marking unbucketable docs with a NULL band_key must not
    lose them: they take no edges (NULL joins nothing) but stay in the
    id universe as self-labeled singletons, so the survivor keep-list
    still contains them."""
    from processor_edf_spark.operators.lsh_dedup import (
        lsh_components,
        lsh_dedup_survivors,
    )

    rows = [
        (1, "b1"),
        (2, "b1"),   # dup group {1, 2}
        (3, None),   # unbucketable — must survive as a singleton
        (4, "b2"),   # singleton bucket
    ]
    bucketed = spark.createDataFrame(
        rows, "doc_id long, band_key string"
    )
    comp = {
        r["doc_id"]: r["component"]
        for r in lsh_components(bucketed).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 3, 4: 4}
    keep = sorted(
        r["doc_id"] for r in lsh_dedup_survivors(bucketed).collect()
    )
    assert keep == [1, 3, 4]
