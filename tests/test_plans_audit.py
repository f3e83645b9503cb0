"""The plans.audit toolkit: measured metrics, shuffle attribution, flags."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_lakehouse_spark.plans import (
    audit,
    executed_metrics,
    plan_flags,
    shuffle_bytes_written,
)

SF = "/root/testdata/sf0.001"


def test_metrics_measure_actual_rows(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("cnt"))
    )
    rows = df.collect()
    nodes = executed_metrics(df)
    aggs = [n for n in nodes if n["node"] == "HashAggregate"]
    assert aggs, [n["node"] for n in nodes]
    # The final aggregate's measured output equals the result cardinality.
    assert any(n["metrics"].get("numOutputRows") == len(rows) for n in aggs)


def test_shuffle_attribution(spark):
    line = spark.read.parquet(f"{SF}/lineitem.parquet")
    grouped = line.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    grouped.collect()
    assert shuffle_bytes_written(grouped) > 0

    mapped = line.select((F.col("l_quantity") * 2).alias("q2"))
    mapped.collect()
    assert shuffle_bytes_written(mapped) == 0


def test_flags_detect_scale_killers(spark):
    ok = spark.read.parquet(f"{SF}/lineitem.parquet").groupBy("l_returnflag").count()
    assert plan_flags(ok) == set()
    bad = spark.range(3).crossJoin(spark.range(3))
    assert plan_flags(bad) & {"bnlj", "cartesian"}


def test_audit_report_shape(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet").groupBy("o_orderstatus").count()
    df.collect()
    rep = audit(df)
    assert set(rep) == {"flags", "shuffle_bytes_written", "nodes"}
    assert rep["shuffle_bytes_written"] > 0
    assert any(n["node"] == "Exchange" for n in rep["nodes"])


def test_broadcast_hint_risks_detects_and_barriers(spark):
    """The hint-risk walker (VERDICT r06 #3) must flag a broadcast hint
    over a localCheckpoint or a raw table scan, stay quiet below a
    structural boundedness barrier (LIMIT / ungrouped aggregate), and stay
    quiet when gated_broadcast declines the hint."""
    from nyc_taxi_lakehouse_spark.plans.audit import (
        broadcast_hint_risks,
        gated_broadcast,
    )

    probe = spark.read.parquet(f"{SF}/nation.parquet").select(
        F.col("n_nationkey").alias("k")
    )

    # 1. Ungated hint over a checkpointed frame → flagged (LogicalRDD).
    ck = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .select(F.col("c_custkey").alias("k"))
        .localCheckpoint(eager=True)
    )
    assert broadcast_hint_risks(probe.join(F.broadcast(ck), "k"))

    # 2. Ungated hint straight over a table scan → flagged (Relation).
    scan = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("k")
    )
    assert broadcast_hint_risks(probe.join(F.broadcast(scan), "k"))

    # 3. LIMIT barrier: a hint over a row-capped subtree is bounded.
    assert not broadcast_hint_risks(
        probe.join(F.broadcast(scan.limit(5)), "k")
    )

    # 4. Ungrouped-aggregate barrier: a 1-row scalar is bounded.
    one_row = scan.agg(F.count("*").alias("n"))
    assert not broadcast_hint_risks(probe.crossJoin(F.broadcast(one_row)))

    # 5. A grouped aggregate is NOT a barrier (group count can be
    # corpus-scaled).
    grouped = scan.groupBy("k").agg(F.count("*").alias("n")).select("k")
    assert broadcast_hint_risks(probe.join(F.broadcast(grouped), "k"))

    # 6. gated_broadcast above the threshold declines the hint → no risk.
    assert not broadcast_hint_risks(
        probe.join(gated_broadcast(ck, n_rows=10**9), "k")
    )
