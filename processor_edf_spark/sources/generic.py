"""Schema-enforced, corrupt-tolerant text ingestion (CSV / NDJSON) —
the generic front door for corpus drops that do not arrive as parquet.

Mirrors the EDF source's quarantine discipline (sources/edf.py
file_status → pipeline quarantine): malformed rows are never silently
dropped and never kill the job, and the quarantine keeps the raw line
for re-processing.

Design: the file is scanned as TEXT and parsed with the ``from_csv`` /
``from_json`` expressions rather than the csv/json DataSource readers —
same JVM parser underneath, but corruptness becomes an ordinary struct
field, which sidesteps the reader-level
QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction (any downstream projection
pruning of a DataSource ``_corrupt_record`` plan can re-trigger it, e.g.
a bare ``quarantine.count()``).  Everything stays a splittable text scan
+ whole-stage-codegen expressions; no Python, no cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: StructType) -> StructType:
    if any(f.name == CORRUPT_COL for f in schema.fields):
        return schema
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


def _parsed_frame(
    spark: SparkSession, path: str, parser
) -> DataFrame:
    """(input_file, value, rec) with ``rec.{CORRUPT_COL}`` carrying the
    raw line for any row the parser flagged malformed (PERMISSIVE
    semantics: a type-cast failure nulls the field AND records the raw
    line; a fully unparseable line nulls the whole struct)."""
    raw = spark.read.text(path).select(
        F.input_file_name().alias("input_file"), F.col("value")
    )
    parsed = raw.select(
        "input_file", "value", parser(F.col("value")).alias("rec")
    )
    return parsed.withColumn(
        "_corrupt",
        F.col("rec").isNull() | F.col(f"rec.{CORRUPT_COL}").isNotNull(),
    )


def read_csv_tolerant(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan with an explicit schema (never inferSchema — a second
    full pass at 100 TB, and drift-prone).  ``header=True`` drops lines
    equal to the schema's canonical header (fields in schema order) —
    the contract for library-written CSVs; pass header=False and
    pre-strip otherwise.  Returns (input_file, value, rec, _corrupt);
    most callers go straight to :func:`split_quarantine`."""
    full = _with_corrupt_field(schema)
    opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        **options,
    }
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in full.fields
    )
    df = _parsed_frame(
        spark, path, lambda c: F.from_csv(c, F.lit(ddl), opts)
    )
    if header:
        header_line = ",".join(f.name for f in schema.fields)
        df = df.filter(F.col("value") != header_line)
    return df


def read_ndjson_tolerant(
    spark: SparkSession, path: str, schema: StructType, **options: str
) -> DataFrame:
    """Newline-delimited JSON scan, same contract as the CSV reader."""
    full = _with_corrupt_field(schema)
    opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        **options,
    }
    return _parsed_frame(
        spark, path, lambda c: F.from_json(c, full, opts)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows surface the typed fields only;
    quarantine rows keep the input file and the raw line so the bad
    bytes can be re-parsed after a fix.  Each side is a filter over the
    shared parse — no re-scan, no cache."""
    clean = (
        df.filter(~F.col("_corrupt")).select("rec.*").drop(CORRUPT_COL)
    )
    quarantine = df.filter(F.col("_corrupt")).select(
        "input_file", F.col("value").alias("raw_record")
    )
    return clean, quarantine
