#!/usr/bin/env python
"""Planted-skew decade report (VERDICT r8 #1).

Measures the heavy-16 on the UNIFORM decade (/tmp/sf1_decade) vs the
PLANTED-SKEW decade (/tmp/sf1_skew — same row counts, Zipfian key mass:
one lang block holding 50% of documents, one supplier holding ~30% of
line rows; built by `make_scale_decade.py --skew`), then proves result
invariance of each query under AQE skew-join split ON (thresholds lowered
so the split actually fires at test scale) vs OFF on the skew dataset.

Output: a markdown table for PLANS.md —
  query | t_uniform | t_skew | skew_ratio | rows_u | rows_s | split_invariant

skew_ratio > ~2x is the flag line: the cause must be named in PLANS.md
(hot-key shuffle partition, hub-vertex wedge blowup, df-cap dilution, ...).

Invariance hash: order-independent SUM of xxhash64 over all columns cast
to string, computed executor-side (no driver collect of result sets). The
registry's deterministic-output discipline (exact ints/decimals/strings)
makes this stable across plan shapes; a mismatch is either a real
nondeterminism bug or a float seam — both findings.
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_lakehouse_spark.plans.ckpt import release_run_checkpoints
from nyc_taxi_lakehouse_spark.registry import all_queries
from nyc_taxi_lakehouse_spark.session import get_spark
from scaling_report import HEAVY  # the same heavy-16 list, single source

# Overridable so the same report machinery measures OTHER planted-
# hazard datasets against the uniform decade (r10: --hotgraph).
UNIFORM = os.environ.get("SKEW_BASE", "/tmp/sf1_decade")
SKEW = os.environ.get("SKEW_DATASET", "/tmp/sf1_skew")
TIMEOUT_S = int(os.environ.get("SKEW_TIMEOUT_S", "600"))

_SPLIT_CONF = {
    # Lowered so the skew split actually FIRES at decade scale (defaults
    # target 256 MB partitions; the hot suppkey partition here is ~tens of
    # MB). Factor 2 + small advisory mirrors tests/test_scale.py's demo.
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512KB",
    # Split even when downstream operators reuse the join partitioning
    # (OptimizeSkewedJoin otherwise declines, and most registered queries
    # aggregate right after their joins).
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}
_NOSPLIT_CONF = {
    "spark.sql.adaptive.skewJoin.enabled": "false",
    # Same advisory so coalescing differences don't confound the A/B.
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512KB",
}


def _with_conf(spark, conf):
    from nyc_taxi_lakehouse_spark.plans.invariance import with_conf

    return with_conf(spark, conf)


def _hash_and_count(spark, df, tag):
    """(order-independent content hash, row count) with a cancel timer —
    a runaway query records as TIMEOUT instead of wedging the report.
    Only a cancel-induced failure maps to (None, None); a genuine query
    error (analysis failure, operator bug the skew corpus exposed) must
    surface, not masquerade as 'slow' in the committed record."""
    from nyc_taxi_lakehouse_spark.plans.invariance import content_hash_frame

    hashed = content_hash_frame(df)
    sc = spark.sparkContext
    sc.setJobGroup(tag, tag, interruptOnCancel=True)
    fired = threading.Event()

    def _cancel():
        fired.set()
        sc.cancelJobGroup(tag)

    timer = threading.Timer(TIMEOUT_S, _cancel)
    timer.start()
    try:
        row = hashed.collect()[0]
        return row["s"], row["n"]
    except Exception:
        if fired.is_set():
            return None, None
        raise
    finally:
        timer.cancel()
        sc.setJobGroup("", "")


def _timed(spark, fn, sf_dir, tag, runs=2):
    best, n = None, None
    for _ in range(runs):
        t0 = time.time()
        h, cnt = _hash_and_count(spark, fn(spark, sf_dir), tag)
        dt = time.time() - t0
        release_run_checkpoints()  # per-consume, ADVICE r9
        if cnt is None:
            return None, None, None
        if best is None or dt < best:
            best = dt
        n = cnt
        hh = h
    return best, n, hh


def main() -> None:
    only = os.environ.get("SKEW_QUERIES", "")
    names = [n for n in only.split(",") if n] or HEAVY
    spark = get_spark(app_name="skew_report")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    spark.read.parquet(f"{UNIFORM}/lineitem.parquet").count()
    spark.read.parquet(f"{SKEW}/lineitem.parquet").count()

    print(
        "| query | t_uniform | t_skew | skew_ratio | rows_u | rows_s |"
        " split_invariant |"
    )
    print("|---|---|---|---|---|---|---|")
    for name in names:
        fn = specs[name].fn
        tu, nu, _hu = _timed(spark, fn, UNIFORM, f"{name}-uniform")
        ts, ns, _hs = _timed(spark, fn, SKEW, f"{name}-skew")
        # Invariance: split ON (forced to fire) vs OFF, same dataset.
        saved = _with_conf(spark, _SPLIT_CONF)
        try:
            _, _, h_on = _timed(spark, fn, SKEW, f"{name}-split", runs=1)
        finally:
            _with_conf(spark, saved)
        saved = _with_conf(spark, _NOSPLIT_CONF)
        try:
            _, _, h_off = _timed(spark, fn, SKEW, f"{name}-nosplit", runs=1)
        finally:
            _with_conf(spark, saved)
        inv = (
            "TIMEOUT"
            if h_on is None or h_off is None
            else ("yes" if h_on == h_off else "NO")
        )
        fmt = lambda v: "TIMEOUT" if v is None else f"{v:.2f}"
        ratio = (
            "—" if not tu or ts is None else f"{ts / tu:.1f}x"
        )
        print(
            f"| {name} | {fmt(tu)} | {fmt(ts)} | {ratio} |"
            f" {nu} | {ns} | {inv} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
