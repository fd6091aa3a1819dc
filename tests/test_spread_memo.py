"""spread() partition-probe memo: canonical-plan confirmation and the
explicit invalidation hook (r15, ADVICE follow-up)."""

from __future__ import annotations

import os
import tempfile

from processor_edf_spark.plans.registry import spread, spread_invalidate


def test_spread_memo_invalidation_after_rewrite(spark):
    d = tempfile.mkdtemp(prefix="spread_probe_")
    path = os.path.join(d, "t.parquet")
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(path)
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))

    df1 = spark.read.parquet(path)
    out1 = spread(spark, df1)
    # single small file -> probe sees < n partitions -> repartition(n)
    assert out1.rdd.getNumPartitions() == n

    # memo hit on an identical plan must agree (canonical confirmation)
    out2 = spread(spark, spark.read.parquet(path))
    assert out2.rdd.getNumPartitions() == n

    # in-session rewrite: caller must invalidate before re-probing
    from processor_edf_spark.plans.registry import _SPREAD_MEMO

    assert _SPREAD_MEMO.get(spark), "probe memo should be populated"
    spark.range(200).repartition(2 * n).write.mode("overwrite").parquet(path)
    spread_invalidate(spark)
    assert not _SPREAD_MEMO.get(spark), "invalidation must drop the memo"
    df3 = spark.read.parquet(path)
    out3 = spread(spark, df3)
    # fresh probe: the widened scan's own width is respected (>= its
    # packed split count; never shrunk below the session width)
    assert out3.rdd.getNumPartitions() >= min(
        n, df3.rdd.getNumPartitions()
    )
