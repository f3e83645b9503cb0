"""Behavioral / product-analytics operators — funnel, cohort retention,
Markov transition matrix.

The three canonical event-sequence analyses every analytics engine serving
product teams must answer, expressed over the events table. All three are
integer-count algebra plus single IEEE divisions — hash-exact cross-engine
with no decimal snapping needed.
"""

from __future__ import annotations

from ..functions.detsql import DUCK, SPARK, Dialect
from ..registry import sql_query

_FUNNEL_STEPS = ["signup", "view", "click", "purchase"]


def _funnel_sql(d: Dialect) -> str:
    """Ordered-funnel conversion: a user reaches step k when their FIRST
    step-k event happens strictly after their first step-(k-1) event — the
    strict-sequence semantics (a purchase before any click does not count).
    NULL comparisons make missing steps fall out of the CASE naturally."""
    firsts = ",\n         ".join(
        f"MIN(CASE WHEN event_type = '{s}' THEN ts_us END) AS t{i + 1}"
        for i, s in enumerate(_FUNNEL_STEPS)
    )
    conds = []
    acc = "t1 IS NOT NULL"
    conds.append(acc)
    for i in range(2, len(_FUNNEL_STEPS) + 1):
        acc = f"{acc} AND t{i} > t{i - 1}"
        conds.append(acc)
    flags = ",\n    ".join(
        f"CAST(SUM(CASE WHEN {c} THEN 1 ELSE 0 END) AS BIGINT) AS n{i + 1}"
        for i, c in enumerate(conds)
    )
    steps_union = "\nUNION ALL\n".join(
        f"""SELECT {i + 1} AS step, '{s}' AS step_name, n{i + 1} AS n_users,
       CAST(n{i + 1} AS DOUBLE) / n1 AS conv_from_first,
       CAST(n{i + 1} AS DOUBLE) / {f"n{i}" if i else "n1"} AS conv_from_prev
FROM agg"""
        for i, s in enumerate(_FUNNEL_STEPS)
    )
    return f"""
WITH ev AS (
  SELECT user_id, event_type, {d.epoch_us('ts')} AS ts_us
  FROM events
  WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
),
firsts AS (
  SELECT user_id,
         {firsts}
  FROM ev GROUP BY user_id
),
agg AS (
  SELECT
    {flags}
  FROM firsts
)
{steps_union}
"""


sql_query(
    "q_funnel",
    spark_sql=_funnel_sql(SPARK),
    duck_sql=_funnel_sql(DUCK),
    tables=["events"],
    doc="Ordered funnel (signup → view → click → purchase): per user, the "
    "first-occurrence timestamp of each step via one conditional-MIN "
    "aggregation — a single pass over the fact, no self-joins, no "
    "per-step subqueries (the naive N-way-join funnel shape costs N scans "
    "and N shuffles; this costs one of each). Strict sequencing (each "
    "step's first event after the previous step's) via chained NULL-safe "
    "comparisons on the one 150-row-per-user profile. Conversion rates "
    "are single IEEE divisions of exact counts. The 4-row output unions "
    "off a scalar aggregate — bounded by construction.",
)


def _retention_sql(d: Dialect) -> str:
    """Weekly cohort retention triangle."""
    day = d.idiv(d.epoch('ts'), '86400')
    return f"""
WITH ev AS (
  SELECT user_id, {day} AS day_n
  FROM events
  WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
),
firsts AS (
  SELECT user_id, MIN(day_n) AS first_day FROM ev GROUP BY user_id
),
cohorts AS (
  SELECT user_id, {d.idiv('first_day', '7')} AS cohort_week FROM firsts
),
sizes AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM cohorts GROUP BY cohort_week
),
active AS (
  SELECT DISTINCT c.cohort_week,
         {d.idiv('e.day_n', '7')} - c.cohort_week AS week_offset,
         e.user_id
  FROM ev e JOIN cohorts c ON e.user_id = c.user_id
)
SELECT
  a.cohort_week,
  CAST(a.week_offset AS INT) AS week_offset,
  CAST(COUNT(*) AS BIGINT) AS n_active,
  s.cohort_size,
  CAST(COUNT(*) AS DOUBLE) / s.cohort_size AS retention
FROM active a JOIN sizes s ON a.cohort_week = s.cohort_week
GROUP BY a.cohort_week, a.week_offset, s.cohort_size
"""


sql_query(
    "q_retention",
    spark_sql=_retention_sql(SPARK),
    duck_sql=_retention_sql(DUCK),
    tables=["events"],
    doc="Weekly cohort retention triangle: users grouped by first-seen "
    "week, counted distinct per (cohort, week-offset) cell, divided by "
    "cohort size — the classic growth-accounting matrix. Plan: one scan, "
    "a per-user first-seen aggregate (shuffle on user_id), a hash join "
    "back (reusing the same user_id partitioning — Catalyst elides the "
    "second exchange), distinct + count on the tiny (cohort, offset, "
    "user) set, and a broadcast of the per-cohort sizes. At 100 TB the "
    "per-user profile is the only large intermediate and it partitions "
    "cleanly on user_id.",
)


def _markov_sql(d: Dialect) -> str:
    """Per-user event-type transition matrix with MLE probabilities."""
    return f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, {d.epoch_us('ts')} AS ts_us
  FROM events
  WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
),
seq AS (
  SELECT user_id, event_type AS to_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
         ) AS from_type
  FROM ev
),
trans AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
),
outdeg AS (
  SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_out FROM trans GROUP BY from_type
)
SELECT
  t.from_type,
  t.to_type,
  t.n,
  o.n_out,
  CAST(t.n AS DOUBLE) / o.n_out AS p
FROM trans t JOIN outdeg o ON t.from_type = o.from_type
"""


sql_query(
    "q_markov_transitions",
    spark_sql=_markov_sql(SPARK),
    duck_sql=_markov_sql(DUCK),
    tables=["events"],
    doc="First-order Markov transition matrix over per-user event "
    "sequences: LAG pairs consecutive events (ordered by timestamp with "
    "event_id tiebreak — a total order, so the pairing is deterministic), "
    "then transition counts and MLE row-normalized probabilities. The "
    "behavioral fingerprint behind next-action prediction and anomalous-"
    "session detection. Plan: one window over the user_id exchange, one "
    "count agg on the ≤|types|² transition table, one broadcast join for "
    "the normalizer. The |types|²-bounded output makes every downstream "
    "op trivially cheap at any corpus size.",
)
