"""materialize(): the shared guarded materialization helper (r15).

Pins the three policies: default eager localCheckpoint (bit-identical
to the pre-r15 inline call sites), the size guard on known-estimate
frames, and the reliable-checkpoint switch via session conf.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from processor_edf_spark.materialize import (
    CHECKPOINT_DIR_CONF,
    MAX_LOCAL_BYTES_CONF,
    STRICT_CONF,
    materialize,
)


@pytest.fixture()
def _clean_conf(spark):
    yield
    spark.conf.unset(CHECKPOINT_DIR_CONF)
    spark.conf.unset(MAX_LOCAL_BYTES_CONF)
    spark.conf.unset(STRICT_CONF)


def test_default_is_local_checkpoint(spark):
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    out = materialize(df)
    # lineage truncated: the physical plan reads the checkpointed RDD
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
    assert sorted(r.v for r in out.collect()) == [2 * i for i in range(100)]


def test_size_guard_warns_on_known_estimate(spark, _clean_conf):
    spark.conf.set(MAX_LOCAL_BYTES_CONF, "1")
    df = spark.range(1000).selectExpr("id", "id * 2 AS v")
    with pytest.warns(UserWarning, match="local-checkpoint guard"):
        out = materialize(df)
    assert out.count() == 1000  # default: warn and proceed


def test_size_guard_raises_in_strict_mode(spark, _clean_conf):
    spark.conf.set(MAX_LOCAL_BYTES_CONF, "1")
    spark.conf.set(STRICT_CONF, "true")
    df = spark.range(1000).selectExpr("id", "id * 2 AS v")
    with pytest.raises(RuntimeError, match="local-checkpoint guard"):
        materialize(df)


def test_small_known_estimate_passes_quietly(spark, _clean_conf):
    spark.conf.set(MAX_LOCAL_BYTES_CONF, str(64 * 1024**3))
    spark.conf.set(STRICT_CONF, "true")
    df = spark.range(10).selectExpr("id")
    out = materialize(df)  # must not raise under the default-size guard
    assert out.count() == 10


def test_reliable_checkpoint_conf(spark, _clean_conf):
    d = tempfile.mkdtemp(prefix="mat_ckpt_")
    try:
        spark.conf.set(CHECKPOINT_DIR_CONF, d)
        spark.conf.set(MAX_LOCAL_BYTES_CONF, "1")  # must not trip: reliable
        df = spark.range(50).selectExpr("id", "id + 1 AS v")
        out = materialize(df)
        assert out.count() == 50
        # blocks landed under the configured fault-tolerant directory
        assert any(os.scandir(d)), "reliable checkpoint wrote nothing"
    finally:
        shutil.rmtree(d, ignore_errors=True)
