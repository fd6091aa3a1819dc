from processor_edf_spark.functions.epoch import (
    edf_datetime,
    infer_epoch_usecs,
    msecs_since_epoch,
    secs_since_epoch,
    secs_to_usecs,
    usecs_since_epoch,
    usecs_to_timestamp,
)

__all__ = [
    "secs_since_epoch",
    "msecs_since_epoch",
    "usecs_since_epoch",
    "usecs_to_timestamp",
    "secs_to_usecs",
    "infer_epoch_usecs",
    "edf_datetime",
]
