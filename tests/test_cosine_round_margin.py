"""Rounding-window regression for the numpy scoring kernels: both engines
apply the threshold to ROUND(cos, 4), so a raw cosine of 0.44996 IS a
match (rounds to 0.4500 ≥ 0.45) — the kernels' pre-filter margin must
keep it.  A 1e-9 margin (the original bug) drops exactly this window
[0.44995, 0.45) on the Spark side only, diverging from the oracle; sf0.01
testdata happens to contain no pair in the window, so only a constructed
fixture exercises it.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

import duckdb
import numpy as np
import pandas as pd

from processor_edf_spark.plans import ORACLE, QUERIES

TARGET_COS = 0.44996  # inside [0.44995, 0.45): rounds up to the threshold


def _embeddings_with_boundary_pair(path: str) -> None:
    dim = 64
    e1 = np.zeros(dim)
    e1[0] = 1.0
    e2 = np.zeros(dim)
    e2[1] = 1.0
    c = TARGET_COS
    v0 = 3.0 * e1
    v1 = 2.0 * (c * e1 + np.sqrt(1.0 - c * c) * e2)
    v2 = -5.0 * e1  # cosine -1 with v0: clearly below threshold
    pd.DataFrame(
        {
            "vec_id": np.array([0, 1, 2], dtype=np.int64),
            "embedding": [v0.tolist(), v1.tolist(), v2.tolist()],
            "label": np.array([0, 0, 0], dtype=np.int64),
        }
    ).to_parquet(path)


def test_boundary_cosine_survives_prefilter(spark, tmp_path):
    _embeddings_with_boundary_pair(str(tmp_path / "embeddings.parquet"))

    sdf = QUERIES["cosine_pairs"](spark, str(tmp_path))
    spark_rows = sorted(tuple(r) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    oracle_rows = sorted(tuple(r) for r in con.execute(ORACLE["cosine_pairs"]).fetchall())

    assert oracle_rows == [(0, 1, 0.45)]  # the boundary pair, kept by ROUND
    assert spark_rows == oracle_rows, (
        "pre-filter margin dropped a pair the oracle keeps"
    )
