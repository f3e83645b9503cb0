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

import json

from pyspark.sql import DataFrame

_JOIN_SUFFIX = "Join"


def _scala_map(jmap) -> dict:
    entries = jmap.toList()
    return {
        entries.apply(i)._1(): entries.apply(i)._2()
        for i in range(entries.size())
    }


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on sep at bracket depth 0 only — ReadSchema entries contain
    parameterized/nested types (decimal(12,2), struct<...>) and pushed
    filters can be compound (Or(GreaterThan(a,1),LessThan(b,2))); a naive
    split would mint phantom entries for both (r9 review finding)."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "<([":
            depth += 1
        elif ch in ">)]":
            depth -= 1
        elif ch == sep and depth == 0:
            out.append(s[start:i])
            start = i + 1
    tail = s[start:]
    if tail.strip():
        out.append(tail)
    return [p.strip() for p in out if p.strip()]


def _scan_info(node) -> dict:
    md = _scala_map(node.metadata())
    loc = md.get("Location", "")
    table = loc.rsplit("/", 1)[-1].rstrip("]") if "/" in loc else loc
    schema = md.get("ReadSchema", "")
    body = schema[len("struct<"):-1] if schema.startswith("struct<") else schema
    cols = sorted(part.split(":", 1)[0] for part in _split_top(body))
    pushed = md.get("PushedFilters", "[]").strip()
    body = pushed[1:-1] if pushed.startswith("[") else pushed
    n_pushed = len(_split_top(body))
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
        # Spark's ShuffledJoin trait appends "(skew=true)" to nodeName when
        # AQE split a skewed partition — strip the annotation so the join
        # still counts under its strategy (r9 review: endswith("Join")
        # silently dropped skew-handled joins from the gate).
        base = name.split("(", 1)[0].strip()
        if base.endswith(_JOIN_SUFFIX):
            joins[base] = joins.get(base, 0) + 1
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
        # Subquery plans (scalar subqueries, DPP) live in EXPRESSIONS, not
        # children — without this descent their joins/scans/pushdowns are
        # invisible to the gate (r9 review finding). QueryPlan.subqueries
        # returns the embedded plans directly.
        subs = node.subqueries()
        for i in range(subs.size()):
            stack.append(subs.apply(i))
    scans.sort(key=lambda s: (s["table"], s["columns"], s["pushed_filters"]))
    return {
        "joins": dict(sorted(joins.items())),
        **counts,
        "scans": scans,
    }


_SCALAR_FIELDS = (
    "shuffle_exchanges",
    "broadcast_exchanges",
    "reused_exchanges",
    "cartesian_products",
)


def volatile_paths(runs: list) -> list:
    """Fine-grained volatility between repeated fingerprints of one query.

    Returns dotted paths instead of top-level field names, so the CI gate
    excludes ONLY the sub-entry that measured volatile (ADVICE r9:
    dropping the whole `scans` list because one scan's one field flickers
    would let a later lost-pushdown regression in a DIFFERENT scan of the
    same query pass silently).

    Path forms:
      - ``<scalar_field>``            (e.g. ``broadcast_exchanges``)
      - ``joins.<Strategy>``          (that strategy's count only — an AQE
        BHJ<->SMJ flip marks both strategies, other joins stay pinned)
      - ``scans[<table>].columns`` / ``scans[<table>].pushed_filters``
        (that table's scans only)
      - ``scans`` as a coarse fallback when the per-table scan COUNT is
        itself unstable (alignment impossible).
    """
    base = runs[0]
    paths = set()
    for field in _SCALAR_FIELDS:
        if any(r[field] != base[field] for r in runs[1:]):
            paths.add(field)
    join_keys = set()
    for r in runs:
        join_keys.update(r["joins"])
    for k in join_keys:
        if len({r["joins"].get(k, 0) for r in runs}) > 1:
            paths.add(f"joins.{k}")

    def by_table(r):
        groups = {}
        for s in r["scans"]:
            groups.setdefault(s["table"], []).append(s)
        return groups

    grouped = [by_table(r) for r in runs]
    tables = set()
    for g in grouped:
        tables.update(g)
    def canon(scans_t, masked=()):
        return sorted(
            json.dumps(
                {k: (None if k in masked else v) for k, v in s.items()},
                sort_keys=True,
            )
            for s in scans_t
        )

    for t in tables:
        per_run = [g.get(t, []) for g in grouped]
        if len({len(scans_t) for scans_t in per_run}) > 1:
            paths.add("scans")
            continue
        # Detect volatility on WHOLE-scan tuples first, then attribute it
        # to the smallest sub-field mask that restores equality (ADVICE
        # r10): comparing each sub-field as an independent multiset loses
        # the (columns, pushed_filters) PAIRING, so runs where the values
        # permute across same-table scans — run1 [(colsA,pf1),(colsB,pf2)]
        # vs run2 [(colsA,pf2),(colsB,pf1)] — measured as stable while the
        # gate's exact sorted-scan comparison later flaked on them. The
        # both-fields mask always succeeds when the scan counts match
        # (only the table name remains), so attribution terminates.
        base_t = canon(per_run[0])
        if all(canon(scans_t) == base_t for scans_t in per_run[1:]):
            continue
        for masked in (("columns",), ("pushed_filters",),
                       ("columns", "pushed_filters")):
            ref = canon(per_run[0], masked)
            if all(canon(scans_t, masked) == ref for scans_t in per_run[1:]):
                for sub in masked:
                    paths.add(f"scans[{t}].{sub}")
                break
    return sorted(paths)


def mask_volatile(fp: dict, paths) -> dict:
    """Deep-copy ``fp`` with every volatile path blanked, for comparison.

    Accepts both the fine-grained paths of :func:`volatile_paths` and the
    legacy whole-field names still used by hand-curated exclusion tables.
    Masked scan sub-fields are set to ``None`` (not popped) so the scan's
    OTHER sub-fields stay comparable; scans re-sort afterwards because
    masking can change the list's sort key.
    """
    fp = json.loads(json.dumps(fp))
    for p in paths:
        if p in fp:
            fp.pop(p)
        elif p.startswith("joins."):
            fp.get("joins", {}).pop(p[len("joins."):], None)
        elif p.startswith("scans[") and "]." in p:
            table, sub = p[len("scans["):].split("].", 1)
            for s in fp.get("scans", []):
                if s.get("table") == table:
                    s[sub] = None
    if "scans" in fp:
        fp["scans"].sort(key=lambda s: json.dumps(s, sort_keys=True))
    return fp
