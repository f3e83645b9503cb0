"""Plan-fingerprint regression gate (VERDICT r8 #4): the committed
tools/plan_fingerprints.json pins the load-bearing physical-plan
properties of the heavy-16 at sf0.01 (join strategies, exchange counts,
scan pruning + pushdown). A refactor or config change that silently
degrades a plan — broadcast decaying to SMJ, lost pushdown, lost column
pruning, lost exchange reuse — fails HERE, at the moment of the change,
instead of rounds later in the bench noise.

Intentional plan changes: rerun tools/gen_fingerprints.py, commit the
diff, and say why in the commit message.
"""

from __future__ import annotations

import json
import os

import pytest

from nyc_taxi_lakehouse_spark.plans.ckpt import release_run_checkpoints
from nyc_taxi_lakehouse_spark.plans.fingerprint import (
    mask_volatile,
    plan_fingerprint,
)
from nyc_taxi_lakehouse_spark.registry import all_queries

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PINNED = os.path.join(_HERE, "tools", "plan_fingerprints.json")
SF_DIR = "/root/testdata/sf0.01"

with open(_PINNED) as f:
    PINNED = json.load(f)

# Fields that are legitimately adaptive at sf0.01, excluded per query WITH
# the reason — a hand-curated UNION on top of the generator-measured
# "volatile" list each pin carries (gen_fingerprints runs every query 3x
# and records fields that differed; this table covers volatility that only
# manifests across sessions). Everything else must match exactly.
_VOLATILE: dict[str, set] = {
    # The final LPA round joins the checkpointed edge set against the
    # label aggregate, whose measured shuffle size sits within a few
    # percent of the 10 MB adaptive broadcast threshold at sf0.01 —
    # compressed size varies with intra-partition row order, so AQE picks
    # BroadcastHashJoin or SortMergeJoin run-to-run (observed both while
    # pinning). Exchange counts are identical under both choices and stay
    # pinned, so a real shape regression is still caught.
    # Fine-grained since r10: only the two strategies that flip are
    # excluded, so any OTHER join appearing in the LPA plan still fails
    # the gate.
    "q_label_propagation": {
        "joins.BroadcastHashJoin",
        "joins.SortMergeJoin",
    },
    # q_pagerank's broadcast_exchanges volatility (6/7 alternation at an
    # AQE reuse/threshold boundary) moved to the generator-recorded
    # volatile list in tools/plan_fingerprints.json (r11) — that file is
    # the single source of truth for it now; a second copy here would
    # silently mask drift if the JSON entry were ever dropped (ADVICE
    # r11).
}


@pytest.mark.parametrize("qname", sorted(PINNED))
def test_plan_fingerprint_unchanged(spark, qname):
    got = plan_fingerprint(all_queries()[qname].fn(spark, SF_DIR))
    release_run_checkpoints()
    pin = dict(PINNED[qname])
    # Volatile paths are fine-grained (joins.<Strategy>,
    # scans[<table>].<sub>) — mask_volatile blanks ONLY those sub-entries
    # on both sides, so the rest of the field stays pinned; legacy
    # whole-field names from the hand-curated table still work.
    skip = set(pin.pop("volatile", [])) | _VOLATILE.get(qname, set())
    got = mask_volatile(got, skip)
    pin = mask_volatile(pin, skip)
    assert got == pin, (
        f"{qname}: executed-plan fingerprint drifted from the committed "
        "pin. If the change is intentional, rerun "
        "tools/gen_fingerprints.py and commit the diff with the reason.\n"
        f"pinned: {json.dumps(PINNED[qname], sort_keys=True)}\n"
        f"got:    {json.dumps(got, sort_keys=True)}"
    )


def test_split_top_handles_nested_types_and_compound_filters():
    from nyc_taxi_lakehouse_spark.plans.fingerprint import _split_top

    assert _split_top("a:decimal(12,2),b:struct<x:int,y:int>,c:string") == [
        "a:decimal(12,2)",
        "b:struct<x:int,y:int>",
        "c:string",
    ]
    assert len(
        _split_top("IsNotNull(a), Or(GreaterThan(a,1),LessThan(b,2))")
    ) == 2
    assert _split_top("") == []


def test_pin_covers_heavy_and_core13():
    import sys

    sys.path.insert(0, _HERE)
    sys.path.insert(0, os.path.join(_HERE, "tools"))
    from bench import CORE13
    from gen_fingerprints import SCALE_DESIGNED
    from scaling_report import HEAVY

    assert set(PINNED) == set(HEAVY) | set(CORE13) | set(SCALE_DESIGNED)


def _fp(joins=None, scans=None, **over):
    base = {
        "joins": joins or {},
        "shuffle_exchanges": 0,
        "broadcast_exchanges": 0,
        "reused_exchanges": 0,
        "cartesian_products": 0,
        "scans": scans or [],
    }
    base.update(over)
    return base


def _scan(table, columns, pushed):
    return {"table": table, "columns": columns, "pushed_filters": pushed}


class TestVolatilePaths:
    """ADVICE r9: volatility must be recorded per sub-entry, not per
    top-level field — a flickering pushed_filters on ONE scan must not
    un-pin the pushdown of every other scan in the query."""

    def test_stable_runs_yield_no_paths(self):
        from nyc_taxi_lakehouse_spark.plans.fingerprint import volatile_paths

        fp = _fp(joins={"BroadcastHashJoin": 2},
                 scans=[_scan("orders.parquet", ["o_orderkey"], 1)])
        assert volatile_paths([fp, fp, fp]) == []

    def test_join_strategy_flip_marks_both_strategies_only(self):
        from nyc_taxi_lakehouse_spark.plans.fingerprint import volatile_paths

        a = _fp(joins={"BroadcastHashJoin": 3, "SortMergeJoin": 1})
        b = _fp(joins={"BroadcastHashJoin": 2, "SortMergeJoin": 2})
        assert volatile_paths([a, b, a]) == [
            "joins.BroadcastHashJoin",
            "joins.SortMergeJoin",
        ]

    def test_one_scan_field_flicker_does_not_unpin_other_tables(self):
        from nyc_taxi_lakehouse_spark.plans.fingerprint import volatile_paths

        a = _fp(scans=[_scan("orders.parquet", ["o_orderkey"], 1),
                       _scan("lineitem.parquet", ["l_orderkey"], 3)])
        b = _fp(scans=[_scan("orders.parquet", ["o_orderkey"], 2),
                       _scan("lineitem.parquet", ["l_orderkey"], 3)])
        assert volatile_paths([a, b, a]) == [
            "scans[orders.parquet].pushed_filters"
        ]

    def test_permuted_pairing_across_same_table_scans_is_volatile(self):
        """ADVICE r10: per-sub-field multiset comparison loses the
        (columns, pushed_filters) PAIRING — runs where the sub-field
        values permute across two scans of the same table measured as
        stable, yet the gate's exact sorted-scan comparison flaked on
        them. Whole-scan-tuple detection must flag them, and masking the
        attributed path(s) must make the gate comparison stable."""
        from nyc_taxi_lakehouse_spark.plans.fingerprint import (
            mask_volatile,
            volatile_paths,
        )

        a = _fp(scans=[_scan("t.parquet", ["a"], 1),
                       _scan("t.parquet", ["b"], 2)])
        b = _fp(scans=[_scan("t.parquet", ["a"], 2),
                       _scan("t.parquet", ["b"], 1)])
        got = volatile_paths([a, b, a])
        assert got, "permuted pairing must be detected as volatile"
        assert mask_volatile(a, got) == mask_volatile(b, got)

    def test_pairing_attribution_stays_minimal(self):
        """When one sub-field alone explains the difference, only that
        sub-field is attributed (the old per-sub-field behavior, kept)."""
        from nyc_taxi_lakehouse_spark.plans.fingerprint import volatile_paths

        a = _fp(scans=[_scan("t.parquet", ["a"], 1),
                       _scan("t.parquet", ["b"], 2)])
        b = _fp(scans=[_scan("t.parquet", ["a"], 1),
                       _scan("t.parquet", ["b"], 3)])
        assert volatile_paths([a, b, a]) == ["scans[t.parquet].pushed_filters"]

    def test_pairing_attribution_widens_to_both_when_needed(self):
        from nyc_taxi_lakehouse_spark.plans.fingerprint import volatile_paths

        a = _fp(scans=[_scan("t.parquet", ["a"], 1),
                       _scan("t.parquet", ["b"], 2)])
        b = _fp(scans=[_scan("t.parquet", ["c"], 3),
                       _scan("t.parquet", ["b"], 2)])
        assert volatile_paths([a, b, a]) == [
            "scans[t.parquet].columns",
            "scans[t.parquet].pushed_filters",
        ]

    def test_scan_count_instability_falls_back_to_whole_field(self):
        from nyc_taxi_lakehouse_spark.plans.fingerprint import volatile_paths

        a = _fp(scans=[_scan("orders.parquet", ["o_orderkey"], 1)])
        b = _fp(scans=[_scan("orders.parquet", ["o_orderkey"], 1)] * 2)
        assert volatile_paths([a, b, a]) == ["scans"]

    def test_scalar_field(self):
        from nyc_taxi_lakehouse_spark.plans.fingerprint import volatile_paths

        a = _fp(broadcast_exchanges=6)
        b = _fp(broadcast_exchanges=7)
        assert volatile_paths([a, b, a]) == ["broadcast_exchanges"]


class TestMaskVolatile:
    def test_mask_is_noncommunicating_deep_copy(self):
        from nyc_taxi_lakehouse_spark.plans.fingerprint import mask_volatile

        fp = _fp(scans=[_scan("orders.parquet", ["o_orderkey"], 1)])
        out = mask_volatile(fp, ["scans[orders.parquet].pushed_filters"])
        assert fp["scans"][0]["pushed_filters"] == 1
        assert out["scans"][0]["pushed_filters"] is None

    def test_masked_comparison_still_catches_other_scan_regression(self):
        from nyc_taxi_lakehouse_spark.plans.fingerprint import mask_volatile

        paths = ["scans[orders.parquet].pushed_filters"]
        pin = _fp(scans=[_scan("orders.parquet", ["o_orderkey"], 1),
                         _scan("lineitem.parquet", ["l_orderkey"], 3)])
        ok = _fp(scans=[_scan("orders.parquet", ["o_orderkey"], 2),
                        _scan("lineitem.parquet", ["l_orderkey"], 3)])
        # lost pushdown on the OTHER (lineitem) scan must still fail
        bad = _fp(scans=[_scan("orders.parquet", ["o_orderkey"], 2),
                         _scan("lineitem.parquet", ["l_orderkey"], 0)])
        assert mask_volatile(ok, paths) == mask_volatile(pin, paths)
        assert mask_volatile(bad, paths) != mask_volatile(pin, paths)

    def test_join_path_and_legacy_whole_field(self):
        from nyc_taxi_lakehouse_spark.plans.fingerprint import mask_volatile

        fp = _fp(joins={"BroadcastHashJoin": 3, "ShuffledHashJoin": 1},
                 broadcast_exchanges=7)
        out = mask_volatile(
            fp, ["joins.BroadcastHashJoin", "broadcast_exchanges"]
        )
        assert out["joins"] == {"ShuffledHashJoin": 1}
        assert "broadcast_exchanges" not in out

    def test_masking_resorts_scans(self):
        from nyc_taxi_lakehouse_spark.plans.fingerprint import mask_volatile

        paths = ["scans[t.parquet].columns"]
        # same multiset of scans, different pre-mask order keys
        a = _fp(scans=[_scan("t.parquet", ["a"], 1),
                       _scan("t.parquet", ["b"], 0)])
        b = _fp(scans=[_scan("t.parquet", ["z"], 0),
                       _scan("t.parquet", ["q"], 1)])
        assert mask_volatile(a, paths) == mask_volatile(b, paths)
