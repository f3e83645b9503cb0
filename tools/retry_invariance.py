#!/usr/bin/env python
"""Task-retry invariance harness (VERDICT r9 #2 — the never-measured
failure dimension).

On a real cluster, individual TASKS fail and re-execute routinely
(executor churn, preemption, speculative execution). A query whose
result depends on attempt-local state — unseeded per-task sampling,
attempt-dependent row order feeding collect_list/first, non-idempotent
accumulator side effects — passes every single-attempt test and then
silently corrupts results at scale. No oracle run can see it, because
the oracle path never retries.

This harness runs each selected query TWICE in a retry-capable session
(master local[N,F] with F>=2 task failures allowed — the default
local[*] kills the job on the first failure, which is why this runs in
its own process, not the shared test session):

1. clean — the normal query path (the oracle-verified plan);
2. injected — every source table wrapped in a schema-preserving
   mapInArrow pass-through that raises iff
   (TaskContext.partitionId() == 0 and attemptNumber() == 0), so the
   first attempt of the first partition of EVERY stage that executes a
   scan fails once and Spark re-attempts it.

PASS = the order-independent content hash (plans.invariance.content_hash)
matches between the two runs. The injection wrapper itself is a row-wise
identity, so ANY mismatch is attempt-dependent nondeterminism in the
query — a real scale bug.

Scope note: the probe exercises re-execution of scan-bearing stages
(including under AQE re-planning and inside the iterative loops' per-
round jobs). Reduce-side-only task retry is not separately injectable
without plan surgery; shuffle-fetch retry paths are exercised indirectly
when a failed map task's outputs are regenerated.

Usage:
  python tools/retry_invariance.py [--sf=sf0.01] [--queries=a,b,c]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_lakehouse_spark.plans.ckpt import release_run_checkpoints
from nyc_taxi_lakehouse_spark.plans.invariance import content_hash
from nyc_taxi_lakehouse_spark.registry import all_queries
from nyc_taxi_lakehouse_spark.session import get_spark
from nyc_taxi_lakehouse_spark.sources import tables as tables_mod

# Heavy, gate-bearing defaults: iterative loops (CC star, pagerank, BFS),
# the big pair-join dedups, the production chain, and the join-dense
# analytics core — the plans where a retry seam would matter most.
DEFAULT_QUERIES = [
    "q_dedup_minhash",
    "q_dedup_chargram",
    "q_dedup_clusters_star",
    "q_dedup_prod_pipeline",
    "q_pagerank",
    "q_bfs_hops",
    "q_zone_performance",
    "q_ingest_clean",
]

INJECT = {"on": False}


def _fail_first_attempt(batches):
    from pyspark import TaskContext

    tc = TaskContext.get()
    if tc is not None and tc.partitionId() == 0 and tc.attemptNumber() == 0:
        raise RuntimeError(
            "retry_invariance: injected task fault (partition 0, attempt 0)"
        )
    yield from batches


def _install_injection(spark):
    """Wrap load_tables so every source frame (and its temp view) goes
    through the fail-once probe when INJECT['on'] is set. Rebinds the
    symbol in every already-imported operator module — they from-import
    load_tables by name, so patching only the source module would miss
    them."""
    orig = tables_mod.load_tables

    def wrapped(spark, sf_dir, tables=None):
        out = orig(spark, sf_dir, tables)
        if not INJECT["on"]:
            return out
        for name, df in out.items():
            faulty = df.mapInArrow(_fail_first_attempt, df.schema)
            faulty.createOrReplaceTempView(name)
            out[name] = faulty
        return out

    for mod_name, mod in list(sys.modules.items()):
        if not mod_name.startswith("nyc_taxi_lakehouse_spark"):
            continue
        if getattr(mod, "load_tables", None) is orig:
            mod.load_tables = wrapped
    tables_mod.load_tables = wrapped


def main() -> int:
    sf = "sf0.01"
    names = list(DEFAULT_QUERIES)
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
        elif a.startswith("--queries="):
            names = a.split("=", 1)[1].split(",")
    sf_dir = f"/root/testdata/{sf}"

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    # THE load-bearing conf: allow task re-attempts. Default local[*]
    # aborts the job on the first task failure, so nothing would retry.
    spark = get_spark(
        app_name="retry_invariance", master=f"local[{cpus},3]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    _install_injection(spark)

    failures = 0
    for name in names:
        spec = specs[name]
        INJECT["on"] = False
        t0 = time.time()
        clean = content_hash(spec.fn(spark, sf_dir))
        release_run_checkpoints()
        t_clean = time.time() - t0
        INJECT["on"] = True
        try:
            t0 = time.time()
            injected = content_hash(spec.fn(spark, sf_dir))
            t_inj = time.time() - t0
            release_run_checkpoints()
        finally:
            INJECT["on"] = False
        ok = clean == injected
        failures += 0 if ok else 1
        print(
            f"{name}: {'PASS' if ok else 'FAIL'} "
            f"clean={clean} injected={injected} "
            f"({t_clean:.1f}s vs {t_inj:.1f}s under retry)",
            flush=True,
        )
    print(f"== retry invariance: {len(names) - failures}/{len(names)} PASS ==")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
