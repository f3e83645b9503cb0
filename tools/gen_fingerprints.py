#!/usr/bin/env python
"""Regenerate the committed heavy-16 plan fingerprints (VERDICT r8 #4).

Writes tools/plan_fingerprints.json: per heavy query, the canonical
executed-plan fingerprint at sf0.01 under the session's default conf.
tests/test_plan_fingerprints.py regenerates and diffs in CI — run this
tool (and commit the diff) when a plan change is INTENTIONAL, with the
reason in the commit message.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CORE13
from nyc_taxi_lakehouse_spark.plans.ckpt import release_run_checkpoints
from nyc_taxi_lakehouse_spark.plans.fingerprint import (
    plan_fingerprint,
    volatile_paths,
)
from nyc_taxi_lakehouse_spark.registry import all_queries
from nyc_taxi_lakehouse_spark.session import get_spark
from scaling_report import HEAVY

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "plan_fingerprints.json")

# Queries whose DOCUMENTED scale posture depends on a specific plan
# shape (not wall-clock-heavy, so HEAVY misses them): the salted
# two-phase aggregations/windows, where a silent decay — broadcast
# lost, salt window collapsing to one exchange, pruning lost — would
# invalidate the PLANS.md skew claims without moving sf0.01 timing.
SCALE_DESIGNED = ["q_salted_rollup", "q_source_quota"]

# The pinned set: the scale-heavy queries plus the frozen cross-round
# bench core plus the plan-shape-load-bearing set — a plan regression
# in any of these is the one that matters.
PINNED = sorted(set(HEAVY) | set(CORE13) | set(SCALE_DESIGNED))


def main() -> None:
    spark = get_spark(app_name="gen_fingerprints")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    out = {}
    for name in PINNED:
        # Three fresh plans per query: AQE decisions at a size-threshold
        # boundary legitimately flip run-to-run (compressed shuffle bytes
        # vary with intra-partition row order), so any SUB-ENTRY that
        # differs across the runs is recorded as a volatile path and
        # excluded from the gate's comparison instead of flaking it —
        # per join strategy / per scan-table sub-field, NOT whole fields
        # (ADVICE r9: whole-field exclusion would let a later regression
        # in an unrelated scan of the same query pass silently).
        # Cross-session-only volatility is still possible — the test
        # keeps a hand-curated exclusion table (with reasons) as a union
        # on top of this.
        runs = []
        for _ in range(3):
            runs.append(plan_fingerprint(specs[name].fn(spark, SF_DIR)))
            release_run_checkpoints()
        volatile = volatile_paths(runs)
        out[name] = runs[0]
        if volatile:
            out[name]["volatile"] = volatile
        print(
            f"{name}: volatile={volatile} "
            f"{json.dumps(runs[0])[:100]}...",
            file=sys.stderr,
        )
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
