"""Driver contract for the spark-graft builder (PySpark target).

Exposes the engine's query registry (nyc_taxi_lakehouse_spark.registry):
- entry(spark): flagship pricing rollup on sf0.001 (smoke check)
- queries(): every implemented operator from SURVEY.md §2 + LLM-pipeline ops
- oracle_sql(): DuckDB-equivalent SQL per query (omitted → rows-only check)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nyc_taxi_lakehouse_spark.registry import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = all_queries()["q_pricing_rollup"]
    return q.fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted keys → rows-only check."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
