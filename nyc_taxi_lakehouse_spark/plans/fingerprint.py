"""Canonical physical-plan fingerprints (VERDICT r8 #4).

A refactor or a Spark-config change can silently degrade a plan — a
broadcast join decaying to sort-merge, a lost parquet filter pushdown, a
projection that stops pruning columns — without failing any correctness
gate; only the bench would eventually notice, rounds later and noisily.
The fingerprint pins the load-bearing plan properties per query so CI
fails red at the moment of the regression:

- join strategy counts (BroadcastHashJoin / SortMergeJoin / ...)
- shuffle + broadcast exchange counts (ReusedExchange counted apart:
  losing reuse doubles shuffle volume at any scale)
- per-scan: table, the exact read-schema column list (column pruning),
  and the pushed-filter count (predicate pushdown)

Deliberately NOT fingerprinted: AQE partition counts (host/advisory-size
dependent), pushed-filter literal values (data-relative predicates bake in
computed bounds), codegen stage ids, and SQL metric values — those vary
without the plan being worse.

Fingerprints are data-dependent through AQE's measured-size decisions, so
they are pinned at a fixed SF (sf0.01) under the session's default conf —
the same determinism contract the oracle hash gate already relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_JOIN_SUFFIX = "Join"


def _scala_map(jmap) -> dict:
    entries = jmap.toList()
    return {
        entries.apply(i)._1(): entries.apply(i)._2()
        for i in range(entries.size())
    }


def _scan_info(node) -> dict:
    md = _scala_map(node.metadata())
    loc = md.get("Location", "")
    table = loc.rsplit("/", 1)[-1].rstrip("]") if "/" in loc else loc
    schema = md.get("ReadSchema", "")
    cols = sorted(
        part.split(":", 1)[0]
        for part in schema[len("struct<"):].rstrip(">").split(",")
        if part
    )
    pushed = md.get("PushedFilters", "[]").strip("[]")
    n_pushed = len([p for p in pushed.split("),") if p.strip()]) if pushed else 0
    return {"table": table, "columns": cols, "pushed_filters": n_pushed}


def plan_fingerprint(df: DataFrame) -> dict:
    """Materialize df's OWN query execution JVM-side (no driver transfer)
    so AQE finalizes, then walk the executed plan into a canonical dict."""
    jqe = df._jdf.queryExecution()
    jqe.toRdd().count()
    joins: dict[str, int] = {}
    counts = {"shuffle_exchanges": 0, "broadcast_exchanges": 0,
              "reused_exchanges": 0, "cartesian_products": 0}
    scans: list[dict] = []
    stack = [jqe.executedPlan()]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            stack.append(node.executedPlan())
            continue
        if "QueryStage" in name:
            stack.append(node.plan())
            continue
        cls = node.getClass().getSimpleName()
        if name.endswith(_JOIN_SUFFIX):
            joins[name] = joins.get(name, 0) + 1
        elif name == "CartesianProduct":
            counts["cartesian_products"] += 1
        elif cls == "ShuffleExchangeExec":
            counts["shuffle_exchanges"] += 1
        elif cls == "BroadcastExchangeExec":
            counts["broadcast_exchanges"] += 1
        elif cls == "ReusedExchangeExec":
            counts["reused_exchanges"] += 1
            # Reused subtrees are shared with the original exchange —
            # descending would double-count its joins/scans.
            continue
        elif cls == "FileSourceScanExec":
            scans.append(_scan_info(node))
            continue
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    scans.sort(key=lambda s: (s["table"], s["columns"], s["pushed_filters"]))
    return {
        "joins": dict(sorted(joins.items())),
        **counts,
        "scans": scans,
    }
