"""Driver contract for the spark-graft builder (PySpark target).

Exposes the engine's query registry (nyc_taxi_lakehouse_spark.registry):
- entry(spark): flagship pricing rollup on sf0.001 (smoke check)
- queries(): every implemented operator from SURVEY.md §2 + LLM-pipeline ops
- oracle_sql(): DuckDB-equivalent SQL per query (omitted → rows-only check)
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nyc_taxi_lakehouse_spark.registry import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = all_queries()["q_pricing_rollup"]
    return q.fn(spark, SMOKE_SF_DIR)


def _release_then_run(fn):
    """Release the PREVIOUS query's materialize-once checkpoints before
    constructing the next one (VERDICT r10 #4): several queries checkpoint
    a table once per invocation and the returned plan still references it,
    so the query itself can never evict — the repo's own harnesses call
    plans.ckpt.release_run_checkpoints() after consuming each result, but
    an external driver iterating queries() never does, pinning up to one
    RDD per window row for the session's lifetime. By the time the driver
    invokes query N+1 it has fully consumed query N's result (collect /
    toPandas), so N's registered checkpoints are provably dead; releasing
    them here keeps the fail-loud model (a caller that re-collects an old
    frame after release crashes on truncated lineage, never reads stale
    data)."""
    from nyc_taxi_lakehouse_spark.plans.ckpt import release_run_checkpoints

    @functools.wraps(fn)
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        release_run_checkpoints()
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _release_then_run(spec.fn) for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted keys → rows-only check."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
