"""State-store observability: read a streaming checkpoint's state as a
DataFrame (Spark's ``statestore`` data source), flattened to one row
per key with the operator's state fields as plain columns.

This is the audit surface for the TTL story: a deployment can point
``read_state`` at a running query's checkpoint and SEE the active key
set — verify eviction is keeping state bounded, find the keys holding
state, join state against reference data — without touching the query.
Reads are snapshot-consistent against a committed batch and never
block the writer (the state files are immutable per batch version).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_state(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int = 0,
    batch_id: int | None = None,
) -> DataFrame:
    """One row per state-store key at the latest (or given) committed
    batch: the grouping key columns, then the operator's state schema
    fields (e.g. ``last_t`` for stream_gaps, the (t, event_id, value)
    triple for stream_current_state), plus ``partition_id``."""
    reader = spark.read.format("statestore").option(
        "operatorId", operator_id
    )
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    raw = reader.load(checkpoint)
    key_fields = [
        F.col(f"key.{f.name}").alias(f.name)
        for f in raw.schema["key"].dataType.fields
    ]
    state_type = raw.schema["value"].dataType
    value_fields = []
    for f in state_type.fields:
        if f.name == "groupState":
            # applyInPandasWithState nests the user schema one level
            # down; with a timeout configured a sibling
            # timeoutTimestamp column (epoch ms) rides beside it
            value_fields += [
                F.col(f"value.groupState.{g.name}").alias(g.name)
                for g in f.dataType.fields
            ]
        else:
            value_fields.append(F.col(f"value.{f.name}").alias(f.name))
    return raw.select(*key_fields, *value_fields, "partition_id")


def state_key_count(
    spark: SparkSession, checkpoint: str, operator_id: int = 0
) -> int:
    """Total keys held in the store at the latest committed batch —
    the number the TTL discipline keeps proportional to the ACTIVE
    key set instead of every key ever seen."""
    return read_state(spark, checkpoint, operator_id).count()
