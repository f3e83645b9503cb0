"""Generic file-format sources beyond parquet: CSV, ORC, JSON-lines.

The reference ingests parquet + JSON (SURVEY §2.1); a complete engine's
users also land CSV/ORC drops. All three readers return the same
schema-explicit contract as sources/tables.py: schemas are always passed
explicitly (inference costs a full extra scan at 100 TB and can drift
between drops), timestamps are parsed with an explicit format, and
malformed rows route to a quarantine column instead of killing the job
(PERMISSIVE + columnNameOfCorruptRecord — same resilience posture as the
CDC envelope parser).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
    timestamp_format: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """Schema-explicit CSV reader with quarantine routing."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("timestampFormat", timestamp_format)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar like parquet: predicate pushdown and column
    pruning reach the reader the same way (asserted in tests)."""
    return spark.read.orc(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """JSON-lines with explicit schema + quarantine routing (the batch twin
    of the streaming envelope source)."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
