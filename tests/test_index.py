"""Per-file bloom index: no false negatives, real pruning, incremental add."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_lakehouse_spark.index import BloomFileIndex

from .conftest import SF_SMOKE

N_FILES = 8


@pytest.fixture(scope="module")
def indexed_table(spark, tmp_path_factory):
    """lineitem sf0.001 range-clustered into 8 files by l_orderkey (the
    layout a sorted/Z-ordered write produces) + its bloom sidecar."""
    base = tmp_path_factory.mktemp("bloomidx")
    table = str(base / "lineitem")
    sidecar = str(base / "lineitem_bloom_l_orderkey")
    df = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    df.repartitionByRange(N_FILES, "l_orderkey").write.mode("overwrite").parquet(table)
    bloom = BloomFileIndex()
    bloom.write(bloom.build(spark, table, "l_orderkey"), sidecar)
    return table, sidecar, bloom


def _sample_keys(spark, table, n):
    return [
        r.l_orderkey
        for r in spark.read.parquet(table)
        .select("l_orderkey")
        .distinct()
        .orderBy(F.xxhash64("l_orderkey"))
        .limit(n)
        .collect()
    ]


def test_index_shape(spark, indexed_table):
    table, sidecar, bloom = indexed_table
    idx = spark.read.parquet(sidecar)
    assert idx.count() == N_FILES
    row = idx.first()
    assert row.n_rows > 0 and len(row.words) > 0


def test_no_false_negatives_and_exact_results(spark, indexed_table):
    table, sidecar, bloom = indexed_table
    for key in _sample_keys(spark, table, 10):
        got = sorted(
            bloom.point_lookup(spark, sidecar, "l_orderkey", key)
            .select("l_orderkey", "l_linenumber")
            .collect()
        )
        want = sorted(
            spark.read.parquet(table)
            .where(F.col("l_orderkey") == key)
            .select("l_orderkey", "l_linenumber")
            .collect()
        )
        assert got == want and len(want) > 0


def test_pruning_is_real(spark, indexed_table):
    """Clustered layout ⇒ each key lives in 1 file; bloom candidates must
    average well under the full manifest (false positives only)."""
    table, sidecar, bloom = indexed_table
    keys = _sample_keys(spark, table, 20)
    fracs = [
        len(bloom.candidate_files(spark, sidecar, k)) / N_FILES for k in keys
    ]
    assert sum(fracs) / len(fracs) <= 0.5, fracs


def test_absent_key_prunes_and_returns_empty(spark, indexed_table):
    table, sidecar, bloom = indexed_table
    # keys far outside the l_orderkey domain
    for key in (10**12 + 7, 10**12 + 8, 10**12 + 9):
        files = bloom.candidate_files(spark, sidecar, key)
        assert len(files) <= N_FILES // 2
        assert bloom.point_lookup(spark, sidecar, "l_orderkey", key).count() == 0


def test_incremental_append_indexes_only_new_files(spark, indexed_table, tmp_path):
    """Appending = index the delta files and union the sidecar — existing
    rows byte-identical (per-file independence)."""
    table, sidecar, bloom = indexed_table
    old = {r.file: r.words for r in spark.read.parquet(sidecar).collect()}

    delta = str(tmp_path / "delta")
    newrows = spark.read.parquet(table).limit(50).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.lit(10**9)
    )
    newrows.coalesce(1).write.mode("overwrite").parquet(delta)
    delta_idx = bloom.build(spark, delta, "l_orderkey")
    merged = spark.read.parquet(sidecar).unionByName(delta_idx)

    assert merged.count() == N_FILES + 1
    after = {r.file: r.words for r in merged.collect() if r.file in old}
    assert after == old
    probe = newrows.select("l_orderkey").first().l_orderkey
    tmp_sidecar = str(tmp_path / "merged_idx")
    bloom.write(merged, tmp_sidecar)
    assert bloom.point_lookup(spark, tmp_sidecar, "l_orderkey", probe).count() > 0
