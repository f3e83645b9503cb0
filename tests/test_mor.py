"""Merge-on-read deletion vectors (mor.py): data-file immutability, read
subtraction, tombstone composition, and purge equivalence."""

from __future__ import annotations

import glob
import hashlib
import os

from nyc_taxi_lakehouse_spark.mor import MergeOnReadTable

from .conftest import SF_SMOKE


def _data_file_hashes(path: str) -> dict[str, str]:
    out = {}
    for f in glob.glob(os.path.join(path, "*.parquet")):
        with open(f, "rb") as fh:
            out[os.path.basename(f)] = hashlib.sha256(fh.read()).hexdigest()
    return out


def _table(spark, tmp_path):
    orders = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .repartition(4)
    )
    t = MergeOnReadTable(spark, str(tmp_path / "mor"))
    t.write_base(orders)
    return t


def test_delete_leaves_data_files_byte_identical(spark, tmp_path):
    t = _table(spark, tmp_path)
    before = _data_file_hashes(t.path)
    n = t.delete_where("o_orderkey % 5 = 0")
    assert n > 0
    after = _data_file_hashes(t.path)
    # The defining property of merge-on-read: DELETE writes only the
    # sidecar; every data file is byte-for-byte untouched.
    assert before == after and len(before) > 0


def test_read_subtracts_and_composes(spark, tmp_path):
    t = _table(spark, tmp_path)
    total = t.read().count()
    t.delete_where("o_orderkey % 5 = 0")
    keys = {r[0] for r in t.read().select("o_orderkey").collect()}
    assert all(k % 5 != 0 for k in keys)
    # Second delete composes with the first; overlapping tombstones
    # (keys divisible by both) must not double-subtract.
    t.delete_where("o_orderkey % 3 = 0")
    keys2 = {r[0] for r in t.read().select("o_orderkey").collect()}
    assert all(k % 5 != 0 and k % 3 != 0 for k in keys2)
    expect = {
        r[0]
        for r in spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderkey")
        .collect()
        if r[0] % 5 != 0 and r[0] % 3 != 0
    }
    assert keys2 == expect
    assert total > len(keys) > len(keys2)


def test_purge_equivalence(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_where("o_custkey % 2 = 0")
    before = {tuple(r) for r in t.read().collect()}
    t.purge()
    # After purge: same logical table, no tombstones, and a plain reader
    # (no MoR logic) sees the same rows — the sidecar debt is repaid.
    assert t._tombstones() is None
    after = {tuple(r) for r in t.read().collect()}
    plain = {tuple(r) for r in spark.read.parquet(t.path).collect()}
    assert before == after == plain


def test_read_without_tombstones_is_plain_scan(spark, tmp_path):
    t = _table(spark, tmp_path)
    assert t.read().count() == spark.read.parquet(
        f"{SF_SMOKE}/orders.parquet"
    ).count()


def test_read_gate_both_sides(spark, tmp_path, monkeypatch):
    """VERDICT r06 #5: the tombstone anti-join's broadcast gate must yield
    identical rows on BOTH branches — hinted below the threshold, adaptive
    (shuffled anti-join) above it, as when a 100 TB table has absorbed more
    deletes than fit a broadcast."""
    # plans/__init__ re-exports audit() the FUNCTION under the same name,
    # shadowing the submodule as a package attribute — fetch the real
    # module from sys.modules to patch the gate.
    from importlib import import_module

    audit = import_module("nyc_taxi_lakehouse_spark.plans.audit")

    t = _table(spark, tmp_path)
    t.delete_where("o_orderkey % 5 = 0")

    hinted = t.read()
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
    expect = {r[0] for r in hinted.select("o_orderkey").collect()}
    assert expect and all(k % 5 != 0 for k in expect)

    # Force the adaptive branch: a gate of 0 makes every tombstone set
    # "too large to broadcast".
    monkeypatch.setattr(audit, "GATED_BROADCAST_MAX_ROWS", 0)
    adaptive = t.read()
    assert (
        "ResolvedHint"
        not in adaptive._jdf.queryExecution().analyzed().toString()
    )
    got = {r[0] for r in adaptive.select("o_orderkey").collect()}
    assert got == expect
