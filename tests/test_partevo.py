"""Partition-spec evolution: metadata-only spec change, per-era pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_lakehouse_spark.partevo import PartitionEvolvingTable

SF = "/root/testdata/sf0.001"


def _line(spark):
    return (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            "l_orderkey",
            "l_quantity",
            F.year("l_shipdate").alias("ship_year"),
            F.month("l_shipdate").alias("ship_month"),
        )
    )


def test_spec_evolution_round_trip(spark, tmp_path):
    t = PartitionEvolvingTable(spark, str(tmp_path / "t"))
    line = _line(spark)
    half_a = line.filter("l_orderkey % 2 = 0")
    half_b = line.filter("l_orderkey % 2 = 1")

    t.set_spec(["ship_year"])
    t.append(half_a)
    # Evolve: finer partitioning for new data; history untouched.
    t.set_spec(["ship_year", "ship_month"])
    t.append(half_b)

    assert t.specs() == [["ship_year"], ["ship_year", "ship_month"]]
    assert t.read().count() == line.count()
    # Era files were NOT rewritten by the spec change (metadata-only).
    assert t.era_read(0).count() == half_a.count()
    assert t.era_read(1).count() == half_b.count()
    # Values identical to the source, partition cols restored as data cols.
    got = sorted(map(tuple, t.read().select("l_orderkey", "l_quantity", "ship_year", "ship_month").collect()))
    want = sorted(map(tuple, line.collect()))
    assert got == want


def test_per_era_partition_pruning(spark, tmp_path):
    t = PartitionEvolvingTable(spark, str(tmp_path / "t"))
    line = _line(spark)
    t.set_spec(["ship_year"])
    t.append(line.filter("l_orderkey % 2 = 0"))
    t.set_spec(["ship_year", "ship_month"])
    t.append(line.filter("l_orderkey % 2 = 1"))

    # ship_year is a partition column in BOTH eras → both scans prune.
    q = t.read().filter("ship_year = 1995")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert plan.count("PartitionFilters: [") == 2
    year_pruned = [
        seg.split("]")[0] for seg in plan.split("PartitionFilters: [")[1:]
    ]
    assert all("ship_year" in s for s in year_pruned), year_pruned

    # ship_month is a partition column ONLY in era 1: its scan prunes
    # directories, era 0's scan falls back to a pushed data filter.
    q2 = t.read().filter("ship_month = 3")
    plan2 = q2._jdf.queryExecution().executedPlan().toString()
    segs = [seg.split("]")[0] for seg in plan2.split("PartitionFilters: [")[1:]]
    assert any("ship_month" in s for s in segs), segs  # era 1 prunes
    assert any("ship_month" not in s for s in segs), segs  # era 0 does not
    assert "PushedFilters" in plan2
    # and the result is still exact
    assert q2.count() == _line(spark).filter("ship_month = 3").count()


def test_same_spec_is_idempotent(spark, tmp_path):
    t = PartitionEvolvingTable(spark, str(tmp_path / "t"))
    assert t.set_spec(["ship_year"]) == 0
    assert t.set_spec(["ship_year"]) == 0  # no new era
    assert t.set_spec(["ship_year", "ship_month"]) == 1
    assert t.specs() == [["ship_year"], ["ship_year", "ship_month"]]
