"""JSON ingestion — reference operator S2.

The reference loads weather/zones JSON via Python json.load →
createDataFrame with INFERRED schema (weather_to_iceberg.py:81-85,
location_to_iceberg.py:71-75). Spark-first that is simply spark.read.json —
distributed, schema-inferring, and pushdown-capable — with an optional
explicit StructType for production (inference costs an extra pass and can
drift between files; at 100 TB always pass the schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    multiline: bool = False,
) -> DataFrame:
    """spark.read.json with the engine defaults.

    schema=None → Spark infers (the reference's json.load behavior, S2);
    explicit schema skips the inference pass and pins types. multiline=True
    reads whole-file JSON documents (the reference's weather payloads) rather
    than JSONL.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if multiline:
        reader = reader.option("multiLine", "true")
    return reader.json(path)


def ingest_json_dimension(
    spark: SparkSession,
    path: str,
    rename: dict[str, str] | None = None,
    schema: T.StructType | None = None,
) -> DataFrame:
    """The zones-dimension ingest shape (location_to_iceberg.py:65-95):
    JSON → rename chain → ready for truncate-reload into the lake."""
    df = read_json(spark, path, schema=schema)
    for old, new in (rename or {}).items():
        df = df.withColumnRenamed(old, new)
    return df
