"""Independent (non-SQL-shape-sharing) property checks for the sweep-line,
CEP, and containment operators — a pure-Python reimplementation or a planted
construction, so a bug shared by the Spark SQL and its DuckDB oracle (same
algebra both sides) cannot hide."""

from __future__ import annotations

import re

import pytest

from nyc_taxi_lakehouse_spark.registry import all_queries

SPECS = all_queries()
SF = "/root/testdata/sf0.001"


def test_max_concurrency_matches_bruteforce(spark):
    """Sweep-line max == brute-force 'count open intervals at each start
    point' (the O(N²) definition, computed in plain Python)."""
    import duckdb

    iv = duckdb.sql(
        f"""SELECT event_type, epoch_ns(ts) // 1000 AS t0,
                   epoch_ns(ts) // 1000 + CAST(round(value * 1000000) AS BIGINT) AS t1
            FROM '{SF}/events.parquet'
            WHERE ts IS NOT NULL AND value > 0"""
    ).fetchall()
    brute: dict[str, int] = {}
    by_type: dict[str, list] = {}
    for et, t0, t1 in iv:
        by_type.setdefault(et, []).append((t0, t1))
    for et, ivs in by_type.items():
        best = 0
        for t0, _ in ivs:
            best = max(best, sum(1 for a, b in ivs if a <= t0 < b))
        brute[et] = best

    got = {
        r.event_type: r.max_concurrent
        for r in SPECS["q_max_concurrency"].fn(spark, SF).collect()
    }
    assert got == brute


def test_event_pattern_matches_re_module(spark):
    """n_patterns per user == Python re.findall over an independently built
    journey string."""
    import duckdb

    rows = duckdb.sql(
        f"""SELECT user_id, ts, event_id, event_type
            FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id"""
    ).fetchall()
    sym = {"view": "v", "click": "c", "purchase": "p", "signup": "s", "error": "e"}
    seqs: dict[int, str] = {}
    for uid, _, _, et in rows:
        seqs[uid] = seqs.get(uid, "") + sym[et]
    want = {u: len(re.findall("vc*p", s)) for u, s in seqs.items()}

    got = {
        r.user_id: r.n_patterns
        for r in SPECS["q_event_pattern"].fn(spark, SF).collect()
    }
    assert got == want
    assert sum(want.values()) > 0  # non-degenerate corpus


def test_containment_detects_planted_superset(spark):
    """A planted doc whose tokens are a strict subset of a larger doc must
    surface as a 'subsumed' pair with containment exactly 1.0 — the case
    symmetric Jaccard (at 0.8) would miss entirely."""
    from nyc_taxi_lakehouse_spark.llm.dedup import _containment_sql
    from nyc_taxi_lakehouse_spark.functions.detsql import SPARK

    small = "alpha beta gamma delta"
    big = small + " " + " ".join(f"filler{i}" for i in range(40))
    df = spark.createDataFrame(
        [
            (1, small, "en", "srcX", len(small)),
            (2, big, "en", "srcX", len(big)),
            (3, "unrelated words entirely different", "en", "srcX", 35),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.createOrReplaceTempView("documents")
    try:
        out = {
            (r.doc_contained, r.doc_container): r
            for r in spark.sql(_containment_sql(SPARK)).collect()
        }
    finally:
        spark.catalog.dropTempView("documents")
    assert (1, 2) in out
    r = out[(1, 2)]
    assert r.containment == 1.0
    assert r.relation == "subsumed"
    assert r.jaccard < 0.8  # Jaccard-threshold dedup would have missed it
    assert (1, 3) not in out and (3, 1) not in out


def test_bootstrap_ci_brackets_estimate_and_shrinks(spark):
    """Poisson-bootstrap sanity: the interval brackets the point estimate,
    and 10x data gives a strictly narrower interval (the 1/sqrt(n) law)."""
    r1 = SPECS["q_bootstrap_ci"].fn(spark, SF).collect()[0]
    r10 = SPECS["q_bootstrap_ci"].fn(spark, "/root/testdata/sf0.01").collect()[0]
    for r in (r1, r10):
        assert r.ci_lo <= r.estimate <= r.ci_hi
        assert r.n_replicates == 32
    assert (r10.ci_hi - r10.ci_lo) < (r1.ci_hi - r1.ci_lo)


def test_capped_runsum_matches_direct_simulation(spark):
    """The Lindley-identity windows must equal the literal clamp recursion
    W_k = max(0, W_{k-1} + x_k) simulated in plain Python — validating the
    reflection identity itself, which cross-engine agreement (same algebra
    both sides) cannot."""
    import duckdb

    rows = duckdb.sql(
        f"""SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id,
              CASE WHEN event_type = 'purchase'
                   THEN CAST(round(value * 100) AS BIGINT)
                   ELSE -CAST(round(value * 100) AS BIGINT) END AS d
            FROM '{SF}/events.parquet'
            WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
              AND event_type IN ('purchase', 'error')
            ORDER BY user_id, ts_us, event_id"""
    ).fetchall()
    sim: dict[int, list[int]] = {}
    for uid, _, _, delta in rows:
        bal, clamps, n = sim.get(uid, (0, 0, 0)) if uid in sim else (0, 0, 0)
        nb = bal + delta
        if nb < 0:
            clamps += 1
        sim[uid] = (max(nb, 0), clamps, n + 1)

    got = {
        r.user_id: (r.final_balance_cents, r.n_clamps, r.n_moves)
        for r in SPECS["q_capped_runsum"].fn(spark, SF).collect()
    }
    assert got == sim
    assert sum(c for _, c, _ in sim.values()) > 0  # clamps actually fire


def test_attribution_conserves_revenue(spark):
    """Every attribution model allocates EXACTLY the total purchase cents —
    the integer remainder handling cannot leak or mint a cent."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    sf = "/root/testdata/sf0.01"
    pdf = all_queries()["q_attribution"].fn(spark, sf).toPandas()
    total = (
        spark.read.parquet(f"{sf}/events.parquet")
        .where("event_type = 'purchase'")
        .selectExpr("CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) t")
        .collect()[0].t
    )
    assert int(pdf.first_touch_cents.sum()) == total
    assert int(pdf.last_touch_cents.sum()) == total
    assert int(pdf.linear_cents.sum()) == total
    # and the models genuinely differ per channel (first != last somewhere)
    assert (pdf.first_touch_cents != pdf.last_touch_cents).any()


def test_bfs_loop_equals_recursive_cte(spark):
    """The hand-rolled frontier loop (q_bfs_hops) and Spark 4's declarative
    WITH RECURSIVE produce identical hop distances on the same graph —
    pinning the iterate+checkpoint pattern against the engine's own
    fixpoint execution."""
    from nyc_taxi_lakehouse_spark.registry import all_queries
    from nyc_taxi_lakehouse_spark.sources.tables import load_tables

    sf = "/root/testdata/sf0.001"
    loop = {
        (r.node, r.hop)
        for r in all_queries()["q_bfs_hops"].fn(spark, sf).collect()
    }
    load_tables(spark, sf, ["orders", "lineitem", "customer"])
    rec = spark.sql("""
WITH RECURSIVE walk(node, hop) AS (
  SELECT g.src AS node, 0 AS hop
  FROM (SELECT DISTINCT src FROM (
          SELECT o_custkey * 2 AS src FROM orders o
          JOIN lineitem l ON o.o_orderkey = l.l_orderkey) p) g
  JOIN customer c ON g.src = c.c_custkey * 2
  WHERE c.c_nationkey = 0
  UNION ALL
  SELECT DISTINCT e.dst, w.hop + 1
  FROM walk w
  JOIN (
    SELECT a AS src, b AS dst FROM (
      SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey) p
    UNION ALL
    SELECT b AS src, a AS dst FROM (
      SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey) p
  ) e ON e.src = w.node
  WHERE w.hop < 4
)
SELECT node, MIN(hop) AS hop FROM walk GROUP BY node
""")
    got = {(r.node, r.hop) for r in rec.collect()}
    assert got == loop


def test_fifo_interval_identity_matches_sequential_simulation(spark):
    """The cumulative-interval overlap (q_fifo_match's algebra) equals a
    literal sequential FIFO simulation on randomized per-key lot streams."""
    import random

    rnd = random.Random(7)
    rows = []
    for key in range(20):
        for i in range(rnd.randint(1, 8)):
            rows.append((key, "S", i, rnd.randint(1, 9)))
        for i in range(rnd.randint(0, 6)):
            rows.append((key, "R", i, rnd.randint(1, 9)))

    # sequential reference: consume oldest lots first
    expect = {}
    for key in range(20):
        ships = [q for k, t, _i, q in rows if k == key and t == "S"]
        rets = sum(q for k, t, _i, q in rows if k == key and t == "R")
        remaining, matched = rets, 0
        for q in ships:
            take = min(q, remaining)
            matched += take
            remaining -= take
        if rets:
            expect[key] = (matched, rets - matched)

    df = spark.createDataFrame(rows, "key int, typ string, seq int, q long")
    df.createOrReplaceTempView("lots")
    got = {
        r.key: (r.m, r.u)
        for r in spark.sql("""
WITH ships AS (
  SELECT key, q, SUM(q) OVER (PARTITION BY key ORDER BY seq
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM lots WHERE typ = 'S'
),
rets AS (
  SELECT key, q, SUM(q) OVER (PARTITION BY key ORDER BY seq
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM lots WHERE typ = 'R'
),
m AS (
  SELECT s.key, SUM(LEAST(s.cum, r.cum) - GREATEST(s.cum - s.q, r.cum - r.q)) AS mq
  FROM ships s JOIN rets r ON s.key = r.key
   AND s.cum - s.q < r.cum AND r.cum - r.q < s.cum
  GROUP BY s.key
),
t AS (SELECT key, SUM(CASE WHEN typ = 'R' THEN q ELSE 0 END) AS rq
      FROM lots GROUP BY key)
SELECT t.key, COALESCE(m.mq, 0) AS m, t.rq - COALESCE(m.mq, 0) AS u
FROM t LEFT JOIN m ON t.key = m.key WHERE t.rq > 0
""").collect()
    }
    assert got == expect
