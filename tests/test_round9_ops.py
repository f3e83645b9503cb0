"""Round-9 operator pins: the chargram candidate/score split.

The r9 planted-skew decade showed that SCORING similarity on the capped
gram set couples the estimate to the pruning knob (output inflated ~49x on
a hot heterogeneous block). These tests pin the factored semantics:
candidates only from anchor (df-capped) shingles; |∩|/|∪| always over the
full modhash sample.
"""

from __future__ import annotations

from nyc_taxi_lakehouse_spark.functions.detsql import SPARK
from nyc_taxi_lakehouse_spark.llm.dedup import (
    _STOP_SHINGLE_ABS_MAX,
    _chargram_keep_sql,
    _chargram_pairs_sql,
)


def _run_pairs(spark, rows):
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    d.createOrReplaceTempView("documents")
    d.createOrReplaceTempView("documents_sharded")
    keep = spark.sql(_chargram_keep_sql(SPARK, table="documents_sharded"))
    keep.createOrReplaceTempView("r9_keep")
    out = spark.sql(_chargram_pairs_sql(SPARK, "r9_keep")).collect()
    spark.catalog.dropTempView("documents")
    spark.catalog.dropTempView("documents_sharded")
    return out


def test_boilerplate_only_overlap_generates_no_candidates(spark):
    """Docs sharing ONLY a block-boilerplate sentence (df above the cap)
    must never pair up: their common grams are not anchors, and scoring
    never runs without a candidate."""
    boiler = "subscribe to our newsletter for updates and offers"
    # Tails are pairwise 5-gram-disjoint (one distinct letter each), so the
    # ONLY shared grams between any two docs are the boilerplate's —
    # df = 26 > max(10%*26, 5), hence non-anchor.
    rows = [
        (i, f"{boiler} {chr(ord('a') + i) * 13}", "yy") for i in range(26)
    ]
    pairs = _run_pairs(spark, rows)
    assert pairs == []


def test_score_includes_non_anchor_grams(spark):
    """A true near-dup pair sharing boilerplate AND rare grams must be
    scored over the FULL sample: the boilerplate grams count toward the
    intersection, so the reported jaccard is the honest sampled estimate
    (~1.0 for near-identical docs), not the capped-set estimate."""
    boiler = "subscribe to our newsletter for updates and offers"
    rows = [
        (i, f"{boiler} unique tail number {i} with extra words {i * 7}", "yy")
        for i in range(80)
    ] + [
        (9001, f"{boiler} zanzibar quixotic vermilion jackdaw", "yy"),
        (9002, f"{boiler} zanzibar quixotic vermilion jackdaw!", "yy"),
    ]
    pairs = {(r.doc_a, r.doc_b): r for r in _run_pairs(spark, rows)}
    assert (9001, 9002) in pairs
    r = pairs[(9001, 9002)]
    # Full-sample scoring: sizes reflect ALL sampled grams (boilerplate
    # included), and the pair's jaccard is near 1 — under capped-set
    # scoring the shared boilerplate would be invisible.
    assert r.jaccard > 0.8
    assert r.size_a >= r.inter and r.inter > 0


def test_abs_ceiling_constant_sane():
    """The absolute df ceiling must stay above every committed-SF kept df
    (max observed 199 at sf0.1) so r1-r8 anchor sets are unchanged, and
    low enough that a single gram bucket stays joinable (C(cap,2) pairs)."""
    assert 200 <= _STOP_SHINGLE_ABS_MAX <= 2048
