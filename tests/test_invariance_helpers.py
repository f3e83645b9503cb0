"""Unit pins for plans/invariance.py — the shared observable behind the
skew/partition invariance gates (r9 review findings made behavioral)."""

from __future__ import annotations

from nyc_taxi_lakehouse_spark.plans.invariance import content_hash, with_conf


def test_content_hash_distinguishes_null_column_swap(spark):
    """Spark's hash functions SKIP null inputs, so without the sentinel
    (NULL,'x') and ('x',NULL) hashed identically — a column-swap
    nondeterminism would have passed the invariance gates."""
    a = spark.createDataFrame([(None, "x")], "a string, b string")
    b = spark.createDataFrame([("x", None)], "a string, b string")
    ha, na = content_hash(a)
    hb, nb = content_hash(b)
    assert na == nb == 1
    assert ha != hb


def test_content_hash_is_order_independent(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string")
    b = spark.createDataFrame([(2, "y"), (1, "x")], "a int, b string")
    assert content_hash(a) == content_hash(b)


def test_with_conf_handles_unregistered_keys(spark):
    """A key with no registered default must save as None and restore by
    UNSETTING — spark.conf.get(k) raised before anything was set,
    bypassing the caller's try/finally restore."""
    key = "spark.test.invariance.custom"
    saved = with_conf(spark, {key: "v1"})
    try:
        assert spark.conf.get(key) == "v1"
    finally:
        with_conf(spark, saved)
    assert spark.conf.get(key, None) is None
