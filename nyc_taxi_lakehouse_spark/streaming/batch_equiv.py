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
from ..registry import df_query, sql_query


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


# ---------------------------------------------------------------------------
# Dynamic-gap sessionization: per-event gap expression (purchases hold the
# session open longer), native session_window(ts, <CASE expr>).
# ---------------------------------------------------------------------------

_GAP_PURCHASE_S = 1800
_GAP_OTHER_S = 600


@df_query(
    "q_session_dynamic",
    duck_sql=f"""
WITH ev AS (
  SELECT user_id, event_id,
         (epoch_ns(ts) // 1000) AS ts_us,
         CASE WHEN event_type = 'purchase'
              THEN {_GAP_PURCHASE_S}000000 ELSE {_GAP_OTHER_S}000000
         END AS gap_us
  FROM events
  WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
),
o AS (
  SELECT *,
         MAX(ts_us + gap_us) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
  FROM ev
),
flagged AS (
  SELECT *,
         CASE WHEN prev_max_end IS NULL OR ts_us >= prev_max_end
              THEN 1 ELSE 0 END AS is_new
  FROM o
),
sessions AS (
  SELECT *,
         SUM(is_new) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM flagged
)
SELECT user_id,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us + gap_us) AS session_end_us,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_no
""",
    tables=["events"],
    doc="Dynamic-gap sessionization — session_window(ts, CASE ...): each "
    "event extends its session by a PER-EVENT gap (purchases "
    f"{_GAP_PURCHASE_S}s, everything else {_GAP_OTHER_S}s — the 'big "
    "actions keep carts alive' semantics static gaps cannot express). "
    "Oracle = interval-union merge: running MAX(ts+gap) per user, a new "
    "session exactly when an event starts at/after every prior event's "
    "reach. A green row pins Spark's dynamic-gap window-merging algebra "
    "against first-principles interval arithmetic. Same single user_id "
    "exchange as static sessionization; streaming-capable unchanged.",
)
def q_session_dynamic(spark, sf_dir):
    from pyspark.sql import functions as F

    from ..sources.tables import load_tables

    t = load_tables(spark, sf_dir, ["events"])
    ev = t["events"].filter(
        "event_id IS NOT NULL AND ts IS NOT NULL AND value > 0"
    )
    gap = F.when(
        F.col("event_type") == "purchase", F.lit(f"{_GAP_PURCHASE_S} seconds")
    ).otherwise(F.lit(f"{_GAP_OTHER_S} seconds"))
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Out-of-orderness audit — the watermark-sizing readout.
# ---------------------------------------------------------------------------


def _ooo_sql(d) -> str:
    """Event-time lateness distribution: within each ingest partition
    (user_id % 8 — the per-source-partition ordering guarantee a Kafka
    topic gives), lateness = running-max(event time) - event time over
    arrival order (event_id), bucketed on a fixed seconds ladder. The
    cumulative shares answer the question every watermark setting
    encodes: 'what fraction of events arrive within X of the stream
    head' — the flag marks the smallest bucket covering >= 99%, i.e.
    the data-driven withWatermark() recommendation."""
    us = d.epoch_us("ts")
    # The synthetic events arrive fully in-order (event_id follows ts), so
    # arrival is modeled as event time + a deterministic md5 jitter < 8 h
    # (sized above the sparse smoke-SF inter-event gap so inversions
    # actually occur). md5_int32 is uniform over [0, 2^32), so the hash is
    # SCALED into the 8 h range — jitter = hash * (28.8e9 / 2^32) µs,
    # computed exactly as hash * 7031250 // 2^20 (28.8e9 = 7031250 * 2^12;
    # max product 4294967295 * 7031250 ≈ 3.0e16 stays inside BIGINT). A
    # plain `% 28.8e9` would be a no-op (hash < 2^32 µs ≈ 71.6 min) and
    # the planted 8 h regime would never exist. The audit must RECOVER the
    # planted bound: the serial test asserts lateness actually reaches the
    # multi-hour bands and nothing lands past 8 h.
    jitter = d.idiv(
        f"({d.md5_int32(d.to_str('event_id'))} * 7031250)", "1048576"
    )
    lateness = (
        "CAST(MAX(ts_us) OVER (PARTITION BY part ORDER BY arrival_us,"
        " event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " - ts_us AS BIGINT)"
    )
    ladder = (
        "CASE WHEN late_us = 0 THEN 0"
        " WHEN late_us <= 60000000 THEN 1"
        " WHEN late_us <= 600000000 THEN 2"
        " WHEN late_us <= 3600000000 THEN 3"
        " WHEN late_us <= 14400000000 THEN 4"
        " WHEN late_us <= 43200000000 THEN 5"
        " ELSE 6 END"
    )
    return f"""
WITH arrivals AS (
  SELECT CAST(user_id % 8 AS BIGINT) AS part,
         event_id,
         {us} AS ts_us,
         {us} + {jitter} AS arrival_us
  FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL
),
late AS (
  SELECT part, {lateness} AS late_us FROM arrivals
),
bucketed AS (
  SELECT {ladder} AS bucket, late_us FROM late
),
hist AS (
  SELECT bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MAX(late_us) AS BIGINT) AS max_late_us
  FROM bucketed GROUP BY bucket
),
cum AS (
  SELECT bucket, n, max_late_us,
         CAST(SUM(n) OVER (ORDER BY bucket) AS BIGINT) AS cum,
         CAST(SUM(n) OVER () AS BIGINT) AS total
  FROM hist
)
SELECT bucket,
       CASE bucket WHEN 0 THEN 'in-order' WHEN 1 THEN '<=1m'
            WHEN 2 THEN '<=10m' WHEN 3 THEN '<=1h' WHEN 4 THEN '<=4h'
            WHEN 5 THEN '<=12h' ELSE '>12h' END AS band,
       n, max_late_us, cum, total,
       CAST({d.idiv('(n * 1000000)', 'total')} AS BIGINT) AS share_ppm,
       CASE WHEN cum * 100 >= total * 99
             AND (cum - n) * 100 < total * 99 THEN 1 ELSE 0 END
         AS is_p99_watermark
FROM cum
ORDER BY bucket
"""


def _register_ooo():
    from ..functions.detsql import DUCK, SPARK
    from ..registry import sql_query

    sql_query(
        "q_out_of_orderness",
        spark_sql=_ooo_sql(SPARK),
        duck_sql=_ooo_sql(DUCK),
        tables=["events"],
        doc="Out-of-orderness audit: per ingest partition (user_id % 8 — "
        "the per-partition ordering a Kafka topic guarantees), lateness "
        "of each event against the partition's running event-time head, "
        "bucketed on a fixed seconds ladder with exact cumulative shares "
        "and a flag on the smallest band covering >= 99% — the "
        "data-driven withWatermark() recommendation that sizes state "
        "retention for every streaming query in the repo (q_cdc_windowed, "
        "q_stream_dedup, q_session_stream). Partition-keyed running-max "
        "windows (scale with partitions, never global), one bounded-key "
        "histogram aggregate; all integer microseconds.",
    )


_register_ooo()
