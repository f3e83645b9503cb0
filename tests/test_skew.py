"""Planted-skew invariance (VERDICT r8 #1): promote the toy AQE skew-split
demo (tests/test_scale.py::test_aqe_skew_join_split_fires) to the real
planted-skew dataset and the heavy-query families.

The dataset is the --skew decade derived from sf0.01 (so the volume is
sf0.1-equivalent and the suite stays fast): one lang block holds 50% of
documents, one supplier holds ~30% of line rows. Gate-bearing queries must
produce IDENTICAL results with AQE skew-join split forced to fire vs
disabled — the split is a physical rescue, never a semantic change.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from nyc_taxi_lakehouse_spark.registry import all_queries

_SKEW_DIR = "/tmp/skew_sf01_test"

_SPLIT_CONF = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
    # Split even when it costs an extra shuffle (e.g. an aggregate reuses
    # the join partitioning — OptimizeSkewedJoin otherwise declines, and
    # the invariance test would silently test nothing).
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}


@pytest.fixture(scope="module")
def skew_dir():
    if not os.path.exists(f"{_SKEW_DIR}/lineitem.parquet"):
        subprocess.run(
            [
                sys.executable,
                os.path.join(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools",
                    "make_scale_decade.py",
                ),
                "--skew",
                "--src",
                "/root/testdata/sf0.01",
                "--out",
                _SKEW_DIR,
            ],
            check=True,
            capture_output=True,
        )
    return _SKEW_DIR


def _with_conf(spark, conf):
    saved = {k: spark.conf.get(k) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    return saved


def _content_hash(df):
    """Order-independent executor-side content hash + row count."""
    cols = sorted(df.columns)
    row = (
        df.select(
            F.xxhash64(*[F.col(c).cast("string") for c in cols]).alias("h")
        )
        .agg(
            F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    return row["s"], row["n"]


def test_planted_masses(spark, skew_dir):
    """The skew generator actually plants the documented Zipf masses."""
    docs = spark.read.parquet(f"{skew_dir}/documents.parquet")
    total = docs.count()
    hot = docs.groupBy("lang").count().orderBy(F.desc("count")).first()
    assert hot["count"] / total == pytest.approx(0.5, abs=0.02)
    line = spark.read.parquet(f"{skew_dir}/lineitem.parquet")
    hot_supp = line.groupBy("l_suppkey").count().orderBy(F.desc("count")).first()
    assert hot_supp["count"] / line.count() == pytest.approx(0.30, abs=0.03)


def test_skew_split_fires_on_planted_data(spark, skew_dir):
    """The toy demo, promoted: a suppkey-keyed SMJ over the PLANTED hot
    supplier must carry skew=true under lowered thresholds, and its result
    must equal the non-split join exactly."""
    line = spark.read.parquet(f"{skew_dir}/lineitem.parquet").select(
        "l_suppkey", "l_orderkey", "l_quantity"
    )
    supp = spark.read.parquet(f"{skew_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    def run():
        return line.join(supp, "l_suppkey").groupBy("l_suppkey", "s_name").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(20,2)")).alias("q"),
        )

    conf = dict(_SPLIT_CONF)
    conf["spark.sql.autoBroadcastJoinThreshold"] = "-1"  # force SMJ
    saved = _with_conf(spark, conf)
    try:
        j = run()
        rows_on = sorted(map(tuple, j.collect()))  # finalize THIS plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        # The aggregate reuses the join partitioning, so the split only
        # happens because forceOptimizeSkewedJoin accepts the extra
        # shuffle — without it OptimizeSkewedJoin declines and the hot
        # supplier partition runs monolithic (verified red during
        # development).
        assert "skew=true" in plan, plan[:2000]
    finally:
        _with_conf(spark, saved)
    saved = _with_conf(
        spark,
        {
            "spark.sql.adaptive.skewJoin.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    try:
        rows_off = sorted(map(tuple, run().collect()))
    finally:
        _with_conf(spark, saved)
    assert rows_on == rows_off


# Gate-bearing representatives of the heavy families: relational join/agg,
# graph iteration, LSH/banding dedup, blocking-keyed chargram dedup, LPA.
_INVARIANT_QUERIES = [
    "q_zone_performance",
    "q_ingest_clean",
    "q_pagerank",
    "q_label_propagation",
    "q_dedup_minhash",
    "q_dedup_chargram",
]


@pytest.mark.parametrize("qname", _INVARIANT_QUERIES)
def test_heavy_queries_invariant_under_skew_split(spark, skew_dir, qname):
    fn = all_queries()[qname].fn
    saved = _with_conf(spark, _SPLIT_CONF)
    try:
        h_on = _content_hash(fn(spark, skew_dir))
    finally:
        _with_conf(spark, saved)
    saved = _with_conf(
        spark, {"spark.sql.adaptive.skewJoin.enabled": "false"}
    )
    try:
        h_off = _content_hash(fn(spark, skew_dir))
    finally:
        _with_conf(spark, saved)
    assert h_on == h_off
