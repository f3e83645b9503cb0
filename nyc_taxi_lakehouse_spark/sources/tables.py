"""Batch sources: the driver-provided parquet star schema.

Maps reference operator S1 (parquet batch scan, nyc_taxi_to_iceberg.py:84) and
S3 (catalog scan — here temp views registered over parquet). At cluster scale
these would be catalog tables (Delta/Iceberg); locally we read the parquet
directly so Catalyst's DataSource v2 pushdown (PushedFilters / ReadSchema)
applies to every downstream query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import configure_runtime

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Read the requested tables and register them as temp views.

    Registering views lets every query be expressed as Spark SQL (the
    reference's dominant style — spark.sql over catalog tables,
    comprehensive_analytics.py:204) while staying fully Catalyst-optimizable.
    """
    configure_runtime(spark)
    out: dict[str, DataFrame] = {}
    for name in tables or TABLES:
        df = spark.read.parquet(table_path(sf_dir, name))
        if name == "events":
            from pyspark.sql import functions as F
            from pyspark.sql.types import LongType

            ts_type = df.schema["ts"].dataType
            if isinstance(ts_type, LongType):
                # Nanosecond-precision parquet read as raw longs (see
                # session.configure_runtime nanosAsLong); truncate to
                # microseconds. Microsecond-precision generations arrive as
                # TIMESTAMP_NTZ already and need no conversion.
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
