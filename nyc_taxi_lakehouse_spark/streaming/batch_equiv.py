"""Batch-semantics equivalents of the streaming queries.

The streaming pipeline (streaming/cdc.py) can't be oracle-checked directly —
DuckDB has no incremental execution — so each streaming computation gets a
batch twin over the same `events` table that pins the arithmetic to the
DuckDB gate. The streaming form differs only in source/trigger/watermark;
window arithmetic, aggregates, and the score ladder are shared semantics.

- q_tumbling_window_5m (operators/windows.py) twins the ST2 windowed agg
- q_activity_score (here) twins the ST7 chained activity-score stream
  (reference realtime_cdc_processor.py:206-227: weighted score :213-216
  feeding a high/medium/low CASE ladder)
"""

from __future__ import annotations

from ..functions.detsql import DUCK, SPARK, Dialect, dsum
from ..registry import sql_query


def _activity_score_sql(d: Dialect) -> str:
    return f"""
WITH win AS (
  SELECT
    {d.epoch_bucket('ts', 300)} AS window_start,
    {d.epoch_bucket('ts', 300)} + 300 AS window_end,
    event_type,
    COUNT(*) AS event_count,
    {dsum('value')} AS total_value,
    COUNT(DISTINCT user_id) AS unique_users
  FROM events
  GROUP BY {d.epoch_bucket('ts', 300)}, event_type
)
SELECT
  window_start, window_end, event_type,
  event_count, total_value, unique_users,
  event_count * CAST(0.5 AS DOUBLE)
    + total_value * CAST(0.3 AS DOUBLE)
    + unique_users * CAST(0.2 AS DOUBLE) AS activity_score,
  CASE
    WHEN event_count * CAST(0.5 AS DOUBLE)
         + total_value * CAST(0.3 AS DOUBLE)
         + unique_users * CAST(0.2 AS DOUBLE) > 100 THEN 'high'
    WHEN event_count * CAST(0.5 AS DOUBLE)
         + total_value * CAST(0.3 AS DOUBLE)
         + unique_users * CAST(0.2 AS DOUBLE) > 30 THEN 'medium'
    ELSE 'low'
  END AS activity_level
FROM win
"""


sql_query(
    "q_activity_score",
    spark_sql=_activity_score_sql(SPARK),
    duck_sql=_activity_score_sql(DUCK),
    tables=["events"],
    doc="ST7 batch twin: weighted activity score over 5-min windows with "
    "high/medium/low ladder (realtime_cdc_processor.py:206-227). The "
    "streaming form is activity_score_stream() in streaming/cdc.py; this "
    "query pins its arithmetic (exact decimal total_value, left-assoc "
    "double fma chain) to the oracle. One shuffle on (window, type); "
    "COUNT(DISTINCT) is exact here, approx_count_distinct in the stream.",
)


def _unique_users_approx_sql() -> str:
    """Spark-only: HLL++ approx distinct per type+hour — the documented
    100 TB substitution for the exact two-shuffle COUNT(DISTINCT) (the
    streaming pipeline already uses it; SURVEY §7.3 posture)."""
    return """
SELECT
  event_type,
  CAST(hour(ts) AS INT) AS hour_of_day,
  COUNT(*) AS event_count,
  approx_count_distinct(user_id, 0.02) AS approx_users
FROM events
GROUP BY event_type, CAST(hour(ts) AS INT)
"""


sql_query(
    "q_unique_users_approx",
    spark_sql=_unique_users_approx_sql(),
    duck_sql=None,
    tables=["events"],
    doc="A2 scale option: approx_count_distinct (HLL++) per (type, hour) — "
    "single shuffle, no distinct-expand, mergeable partials; rows-only "
    "(HLL estimates have no cross-engine equivalent). Accuracy vs the "
    "exact count is asserted in tests/test_llm_ops.py (within 5%).",
)
