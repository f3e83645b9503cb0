"""Round-8 regression pins: the scale-decade-driven fixes and their review
findings stay fixed."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_lakehouse_spark.functions.detsql import SPARK
from nyc_taxi_lakehouse_spark.registry import all_queries

SPECS = all_queries()
SF = "/root/testdata/sf0.001"


def test_chargram_small_lang_recall(spark):
    """The per-lang stop-shingle cap must NOT disable near-dup detection
    for small langs: with a bare 10%-of-lang cap, a 5-doc lang drops every
    shared gram (df >= 2 > 0.5) and an exact duplicate goes undetected —
    the _STOP_SHINGLE_MIN_DF floor keeps recall (r8 review finding)."""
    from nyc_taxi_lakehouse_spark.llm.dedup import (
        _chargram_keep_sql,
        _chargram_pairs_sql,
    )

    rows = [
        (i, f"some longer filler text about tables and rows unique{i}", "en")
        for i in range(500)
    ] + [
        (9001, "the quick brown fox jumps over the lazy dog", "xx"),
        (9002, "the quick brown fox jumps over the lazy dog", "xx"),
        (9003, "completely different content here entirely", "xx"),
        (9004, "another unrelated document body text", "xx"),
        (9005, "fifth document of the tiny language", "xx"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    d.createOrReplaceTempView("documents")
    d.createOrReplaceTempView("documents_sharded")
    keep = spark.sql(_chargram_keep_sql(SPARK, table="documents_sharded"))
    keep.createOrReplaceTempView("r8_keep")
    pairs = {
        (r.doc_a, r.doc_b)
        for r in spark.sql(_chargram_pairs_sql(SPARK, "r8_keep")).collect()
    }
    assert (9001, 9002) in pairs
    spark.catalog.dropTempView("documents")
    spark.catalog.dropTempView("documents_sharded")


def test_simhash_pairs_computes_fingerprints_once(spark):
    """The chunk UNION references the fingerprint table 4x per self-join
    side; without the localCheckpoint Catalyst inlines the CTE and runs
    the token explode + md5 + 60-aggregate pass 8x (r8 review finding —
    measured 8 'Generate explode' operators). The checkpointed plan has
    ZERO explodes downstream."""
    df = SPECS["q_dedup_simhash_pairs"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") == 0


def test_simhash_is_60_bit_and_chance_collision_free(spark):
    """Fingerprints use the full 60-bit space (values exceed the old
    16-bit range) and exact-dup docs still collide to Hamming 0."""
    sim = SPECS["q_dedup_simhash"].fn(spark, SF).limit(200).collect()
    assert any(r.simhash >= (1 << 16) for r in sim)
    assert all(0 <= r.simhash < (1 << 60) for r in sim)


def test_scale_decade_generator_caps_replicas():
    import os
    import subprocess
    import sys

    # -O strips `assert` statements: the cap must be a real raise, so the
    # subprocess runs optimized to prove it survives.
    r = subprocess.run(
        [sys.executable, "-O", "tools/make_scale_decade.py", "--replicas",
         "27", "--out", "/tmp/r8_should_not_exist"],
        capture_output=True, text=True,
    )
    assert r.returncode != 0 and "Caesar" in (r.stderr + r.stdout)
    assert not os.path.exists("/tmp/r8_should_not_exist")
