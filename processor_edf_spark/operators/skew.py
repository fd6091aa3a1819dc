"""Skew-aware shuffling: two-phase salted groupBy and salted equi-join.

AQE's skew-join splitting handles the post-shuffle partition-size case,
but a groupBy whose key distribution is pathological (one channel
holding half of 100 TB) still funnels one key's partial states to one
reducer, and AQE cannot split a skewed SIDE when the join strategy or
partition layout pins it.  For ALGEBRAIC aggregates (sum/count/min/max —
anything with a merge function) the fix is salting: aggregate on
(key, salt) first so the hot key fans out over ``n_salts`` reducers,
then merge the per-salt states.  For joins, the same trick: salt the
skewed fact side, replicate the dimension side once per salt, join on
(key, salt) — the hot key's rows land on ``n_salts`` reducers instead
of one.

Two shuffles instead of one for the agg, both tiny: the first moves
map-side partial states (already combined per partition), the second
moves ``n_salts`` rows per key.  Use when a key can exceed one
executor's share; plain groupBy/join is otherwise cheaper.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (partial_agg, merge_agg) pairs per supported algebraic aggregate.
_MERGES = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column | str]],
    n_salts: int = 32,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output column → (kind, col)
    with kind ∈ {sum, count, min, max}.

    ``salt_on`` picks the salt deterministically from row content
    (default: spark_partition_id — zero compute, already uniform because
    upstream partitioning is content-agnostic).
    """
    salt = (salt_on if salt_on is not None else F.spark_partition_id()) % n_salts
    partial_exprs = []
    merge_exprs = []
    for out, (kind, col) in aggs.items():
        if kind not in _MERGES:
            raise ValueError(f"non-algebraic aggregate {kind!r} cannot be salted")
        partial, merge = _MERGES[kind]
        partial_exprs.append(partial(col).alias(f"_p_{out}"))
        merge_exprs.append(merge(f"_p_{out}").alias(out))
    return (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*merge_exprs)
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    n_salts: int = 32,
    salt_on: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-spreading equi-join: the fact side gets a salt in
    [0, n_salts), the dimension side is replicated once per salt value
    (``explode(sequence(...))`` — no driver loop, no broadcast), and the
    join runs on (keys…, salt), so a hot key's fact rows shuffle to
    ``n_salts`` reducers instead of one.

    Sizing contract: the dimension side is replicated ``n_salts``× —
    use this when dim is too big to broadcast but small enough to
    replicate (the classic mid-size dimension with a hot fact key);
    when dim broadcasts, a plain broadcast join already has no skew
    problem, and when BOTH sides are huge and skewed, range-partition
    or pre-bucket instead.

    ``how`` supports inner/left (fact-preserving shapes); the salt
    column never escapes.  Result equals ``facts.join(dim, keys, how)``
    row-for-row — pinned by tests/test_skew_streaming_registry.py.

    Boundary vs AQE: for a plain shuffle (sort-merge) join, AQE's
    skew-join splitting already divides an oversized post-shuffle
    partition among tasks — prefer it; salting there buys nothing but a
    replicated dim.  Salt when AQE CANNOT act: the skewed key feeds an
    AGGREGATION (AQE only splits join partitions — a skewed groupBy
    still funnels one key to one reducer, use salted_agg), the join is
    bucketed/pre-partitioned so there is no exchange for AQE to re-plan,
    or it is a stream-stream join (no runtime re-plan).  The
    hot-key-spread behavior test in test_skew_streaming_registry.py pins
    the mechanism: unsalted, a hot key's rows land on ONE reducer;
    salted, on ~n_salts reducers, so the max single-reducer load drops
    by ~n_salts×.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = (salt_on if salt_on is not None else F.spark_partition_id()) % n_salts
    f = facts.withColumn("_salt", salt.cast("int"))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(d, [*keys, "_salt"], how).drop("_salt")
