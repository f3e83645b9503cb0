"""Z-order clustering: Morton-code correctness (SQL + Column paths agree
with a serial reference), and VersionedLakeTable.cluster's OPTIMIZE-ZORDER
commit (data-identical, non-destructive, measurably better min/max
skipping than the incoming single-column layout)."""

from __future__ import annotations

import os

import duckdb
from pyspark.sql import functions as F

from nyc_taxi_lakehouse_spark.functions.detsql import DUCK
from nyc_taxi_lakehouse_spark.operators.zorder import (
    minmax_scale,
    morton_sql,
    zorder_column,
)
from nyc_taxi_lakehouse_spark.versioned import VersionedLakeTable


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_sql_matches_reference():
    con = duckdb.connect()
    expr = morton_sql(DUCK, "x", "y", 6)
    rows = con.execute(
        f"SELECT x, y, {expr} AS z FROM "
        "(SELECT a % 64 AS x, (a * 7) % 64 AS y FROM range(200) t(a))"
    ).fetchall()
    assert rows
    for x, y, z in rows:
        assert z == _morton_ref(x, y, 6), (x, y)


def test_zorder_column_matches_sql(spark):
    df = spark.range(200).select(
        (F.col("id") % 64).alias("x"), ((F.col("id") * 7) % 64).alias("y")
    )
    got = df.select(
        "x", "y", zorder_column([F.col("x"), F.col("y")], bits=6).alias("z")
    ).collect()
    for r in got:
        assert r.z == _morton_ref(r.x, r.y, 6), (r.x, r.y)


def _file_minmax(spark, root, rel_files, cols):
    """Per-live-file min/max stats — what a manifest/footer would hold."""
    out = []
    for f in rel_files:
        df = spark.read.parquet(os.path.join(root, f))
        r = df.agg(
            *[F.min(c).alias(f"mn_{c}") for c in cols],
            *[F.max(c).alias(f"mx_{c}") for c in cols],
        ).collect()[0]
        out.append((f, r))
    return out


def _files_scanned(stats, col, lo, hi):
    return sum(1 for _, r in stats if r[f"mn_{col}"] <= hi and r[f"mx_{col}"] >= lo)


def test_cluster_commit_preserves_data_and_improves_skipping(spark, tmp_path):
    # 4096 rows over a 64x64 (a, b) grid, written sorted by `a` in 16
    # files: perfect a-skipping, zero b-skipping.
    # a perfect 64x64 grid: a and b are independent coordinates, so an
    # a-sorted layout genuinely has zero file-level b-locality.
    base = spark.range(4096).select(
        F.col("id").alias("rid"),
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
    )
    t = VersionedLakeTable(spark, str(tmp_path / "zt"))
    t.append(base.repartitionByRange(16, "a").sortWithinPartitions("a"))
    before = sorted(t._manifest(t.latest_version())["files"])
    stats_before = _file_minmax(spark, t.path, before, ["a", "b"])
    assert _files_scanned(stats_before, "b", 8, 15) == len(before)  # no pruning

    v = t.cluster(zorder_by=["a", "b"], bits=6, min_files=16)
    assert v == 2
    assert [h["op"] for h in t.history()] == ["append", "zorder"]

    # Data identical, history intact (old snapshot still serves).
    assert sorted(r.rid for r in t.read().collect()) == list(range(4096))
    assert sorted(r.rid for r in t.read(1).collect()) == list(range(4096))

    after = sorted(t._manifest(v)["files"])
    stats_after = _file_minmax(spark, t.path, after, ["a", "b"])
    b_after = _files_scanned(stats_after, "b", 8, 15)
    a_after = _files_scanned(stats_after, "a", 8, 15)
    # The z-layout prunes on BOTH dimensions: strictly better than
    # scanning everything on b, and still pruning most files on a.
    assert b_after < len(after)
    assert b_after <= len(after) // 2
    assert a_after <= len(after) // 2


def test_cluster_within_hive_partitions(spark, tmp_path):
    df = spark.range(1024).select(
        F.col("id").alias("rid"),
        (F.col("id") % 2 == 0).cast("string").alias("side"),
        (F.col("id") % 32).alias("a"),
        ((F.col("id") * 13 + 5) % 32).alias("b"),
    )
    t = VersionedLakeTable(spark, str(tmp_path / "zp"), ["side"])
    t.append(df)
    v = t.cluster(zorder_by=["a", "b"], bits=5)
    assert v == 2
    got = t.read()
    assert got.count() == 1024
    # Partition column survives the rewrite and still filters correctly.
    assert got.filter("side = 'true'").count() == 512
    assert sorted(r.rid for r in got.collect()) == list(range(1024))


def test_minmax_scale_bounds(spark):
    df = spark.createDataFrame([(5,), (10,), (25,)], "v bigint")
    got = df.select(
        minmax_scale(F.col("v"), F.lit(5), F.lit(25), bits=4).alias("s")
    ).collect()
    vals = sorted(r.s for r in got)
    assert vals[0] == 0 and vals[-1] == 15  # full [0, 2^bits) span
    assert all(0 <= v <= 15 for v in vals)


def test_manifest_stats_prune_and_filtered_read(spark, tmp_path):
    base = spark.range(4096).select(
        F.col("id").alias("rid"),
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
    )
    t = VersionedLakeTable(
        spark, str(tmp_path / "zs"), stats_cols=["a", "b"]
    )
    t.append(base.repartitionByRange(16, "a").sortWithinPartitions("a"))

    # a-sorted layout: manifest stats prune on a, not on b.
    kept_a, total = t.prune_files([("a", 8, 15)])
    kept_b, _ = t.prune_files([("b", 8, 15)])
    assert total == 16 and len(kept_a) <= 4 and len(kept_b) == total

    t.cluster(zorder_by=["a", "b"], bits=6, min_files=16)
    kept_a2, total2 = t.prune_files([("a", 8, 15)])
    kept_b2, _ = t.prune_files([("b", 8, 15)])
    kept_box, _ = t.prune_files([("a", 8, 15), ("b", 8, 15)])
    assert total2 == 16
    # z-layout prunes BOTH dimensions, and the box prunes hardest.
    assert len(kept_a2) <= total2 // 2 and len(kept_b2) <= total2 // 2
    assert len(kept_box) <= min(len(kept_a2), len(kept_b2))

    # Filtered read == full-scan filter, on both layouts/versions.
    want = sorted(
        r.rid
        for r in t.read().filter("a BETWEEN 8 AND 15 AND b BETWEEN 8 AND 15").collect()
    )
    got = sorted(
        r.rid for r in t.read(filters=[("a", 8, 15), ("b", 8, 15)]).collect()
    )
    got_v1 = sorted(
        r.rid
        for r in t.read(version=1, filters=[("a", 8, 15), ("b", 8, 15)]).collect()
    )
    assert got == want and got_v1 == want and len(want) == 64


def test_filters_without_stats_are_safe(spark, tmp_path):
    df = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k bigint, v bigint")
    t = VersionedLakeTable(spark, str(tmp_path / "ns"))  # no stats_cols
    t.append(df)
    kept, total = t.prune_files([("v", 0, 15)])
    assert len(kept) == total  # nothing prunable, nothing dropped
    assert [r.k for r in t.read(filters=[("v", 0, 15)]).collect()] == [1]
