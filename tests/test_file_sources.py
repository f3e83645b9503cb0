"""CSV / ORC / JSONL sources: roundtrip equality vs the parquet tables,
quarantine routing, and ORC pushdown."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_lakehouse_spark.sources.files import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    read_orc,
)

SF = "/root/testdata/sf0.001"


def test_csv_roundtrip_and_quarantine(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    csv_dir = str(tmp_path / "orders_csv")
    orders.coalesce(1).write.option("header", "true").option(
        "timestampFormat", "yyyy-MM-dd HH:mm:ss"
    ).csv(csv_dir)
    # Spark requires the parsed DF to be cached before a query that touches
    # ONLY the corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    back = read_csv(spark, csv_dir, orders.schema).cache()
    assert back.filter(F.col(CORRUPT_COL).isNotNull()).count() == 0
    got = sorted(map(tuple, back.drop(CORRUPT_COL).collect()))
    back.unpersist()
    want = sorted(map(tuple, orders.collect()))
    assert got == want
    # Malformed line routes to quarantine, not a crash. A NEW file, not an
    # in-place append: appending would break Hadoop's .crc sidecar checksum
    # and the FileStatusCache's recorded length (in-place mutation is the
    # same hazard lake.py's staging discipline exists for).
    import os
    with open(os.path.join(csv_dir, "extra.csv"), "w") as f:
        f.write(",".join(orders.schema.fieldNames()) + "\n")
        f.write("not,a,valid,row,with,too,many,columns,entirely\n")
    spark.catalog.refreshByPath(csv_dir)
    polluted = read_csv(spark, csv_dir, orders.schema).cache()
    assert polluted.filter(F.col(CORRUPT_COL).isNotNull()).count() == 1
    assert polluted.filter(F.col(CORRUPT_COL).isNull()).count() == orders.count()
    polluted.unpersist()


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    line = spark.read.parquet(f"{SF}/lineitem.parquet")
    orc_dir = str(tmp_path / "lineitem_orc")
    line.write.orc(orc_dir)
    back = read_orc(spark, orc_dir)
    assert back.count() == line.count()
    assert back.schema == line.schema
    plan = (
        back.filter("l_quantity > 10").select("l_orderkey")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("PushedFilters:")[1].split("]")[0]


def test_jsonl_roundtrip(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    json_dir = str(tmp_path / "docs_json")
    docs.coalesce(1).write.json(json_dir)
    back = read_jsonl(spark, json_dir, docs.schema).drop(CORRUPT_COL)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))


def test_load_tables_memo_invalidates_on_rewrite(spark, tmp_path):
    """The per-session table memo (optimization r11) must key on the
    source's on-disk fingerprint: a dataset regenerated IN PLACE at the
    same path — the fixture rmtree-and-rebuild pattern — must be re-read,
    never served from the memoized frame (the ADVICE-r10 staleness class)."""
    import shutil
    import time as _time

    from nyc_taxi_lakehouse_spark.sources.tables import load_tables

    sf_dir = str(tmp_path / "sfx")
    p = f"{sf_dir}/orders.parquet"
    spark.range(0, 100).selectExpr("id AS o_orderkey").write.parquet(p)
    first = load_tables(spark, sf_dir, ["orders"])["orders"]
    assert first.count() == 100
    # Memo hit: same fingerprint returns the same plan object.
    again = load_tables(spark, sf_dir, ["orders"])["orders"]
    assert again is first
    # Regenerate in place (rmtree + rebuild, different row count).
    shutil.rmtree(p)
    _time.sleep(0.01)  # ensure a distinct directory mtime_ns
    spark.range(0, 37).selectExpr("id AS o_orderkey").write.parquet(p)
    spark.catalog.refreshByPath(p)
    rebuilt = load_tables(spark, sf_dir, ["orders"])["orders"]
    assert rebuilt is not first
    assert rebuilt.count() == 37
    # The temp view follows the fresh read too.
    assert spark.sql("SELECT COUNT(*) c FROM orders").first()["c"] == 37
