"""Skew-aware aggregation: two-phase salted groupBy.

AQE's skew-join splitting handles joins, but a groupBy whose key
distribution is pathological (one channel holding half of 100 TB) still
funnels one key's partial states to one reducer.  For ALGEBRAIC
aggregates (sum/count/min/max — anything with a merge function) the fix
is salting: aggregate on (key, salt) first so the hot key fans out over
``n_salts`` reducers, then merge the per-salt states.

Two shuffles instead of one, both tiny: the first moves map-side partial
states (already combined per partition), the second moves ``n_salts``
rows per key.  Use when a key can exceed one executor's share; plain
groupBy is otherwise cheaper.
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
