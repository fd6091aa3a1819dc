"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (gap sessionization — the reference's
  analytical core, SURVEY.md §2.5 W1) on /root/testdata/sf0.001.
- ``queries()``: one entry per implemented operator from SURVEY.md §2 plus
  the training-data extensions (dedup / similarity / text analysis),
  registered in processor_edf_spark.plans.*.
- ``oracle_sql()``: DuckDB-equivalent SQL per query, column names and float
  rounding matched exactly.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from processor_edf_spark.plans import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["sessionize_events"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
