"""Window functions — lag features, rolling frames, NTILE, window-over-agg.

Reference coverage (SURVEY §2.5):
- W1 LAG(demand, k) k∈{1,2,3,24,168} PARTITION BY zone ORDER BY hour
  (ml_feature_engineering.py:247-265)
- W2/W3 rolling means ROWS BETWEEN 168/720 PRECEDING AND 1 PRECEDING
  (comprehensive_analytics.py:388-398)
- W4 rolling STDDEV, same frame (ml_feature_engineering.py:280-284)
- W5 NTILE(10) ordered by an aggregate (ml_feature_engineering.py:207)
- W6 AVG(COUNT(*)) OVER (PARTITION BY zone) surge factor (:418-422)
- W7 tumbling window() — batch form here; streaming form in streaming/

Determinism notes: rolling mean/stddev are computed from window SUM/COUNT of
integer counts (exact in both engines) followed by an explicitly-written
double formula, instead of the engines' built-in AVG/STDDEV window aggregates
whose accumulation order/algorithm differs. ORDER BY keys always include a
unique tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.detsql import DUCK, SPARK, Dialect, davg, dsum
from ..registry import df_query, sql_query
from ..sources.tables import load_tables


def _lag_features_sql(d: Dialect) -> str:
    return f"""
WITH hourly AS (
  SELECT event_type,
         {d.epoch_hour('ts')} AS hour_ts,
         COUNT(*) AS demand
  FROM events
  GROUP BY event_type, {d.epoch_hour('ts')}
)
SELECT
  event_type,
  hour_ts,
  demand,
  LAG(demand, 1)   OVER w AS demand_lag_1h,
  LAG(demand, 2)   OVER w AS demand_lag_2h,
  LAG(demand, 3)   OVER w AS demand_lag_3h,
  LAG(demand, 24)  OVER w AS demand_lag_24h,
  LAG(demand, 168) OVER w AS demand_lag_168h,
  CAST(SUM(demand) OVER w7 AS DOUBLE) / NULLIF(COUNT(demand) OVER w7, 0)
    AS demand_avg_7d,
  CAST(SUM(demand) OVER w30 AS DOUBLE) / NULLIF(COUNT(demand) OVER w30, 0)
    AS demand_avg_30d,
  CASE WHEN COUNT(demand) OVER w7 > 1 THEN
    SQRT(
      (CAST(SUM(demand * demand) OVER w7 AS DOUBLE)
       - CAST(SUM(demand) OVER w7 AS DOUBLE) * CAST(SUM(demand) OVER w7 AS DOUBLE)
         / COUNT(demand) OVER w7)
      / (COUNT(demand) OVER w7 - 1))
  END AS demand_stddev_7d
FROM hourly
WINDOW
  w   AS (PARTITION BY event_type ORDER BY hour_ts),
  w7  AS (PARTITION BY event_type ORDER BY hour_ts
          ROWS BETWEEN 168 PRECEDING AND 1 PRECEDING),
  w30 AS (PARTITION BY event_type ORDER BY hour_ts
          ROWS BETWEEN 720 PRECEDING AND 1 PRECEDING)
"""


sql_query(
    "q_demand_lag_features",
    spark_sql=_lag_features_sql(SPARK),
    duck_sql=_lag_features_sql(DUCK),
    tables=["events"],
    doc="W1-W4: LAG ladder (1/2/3/24/168) + rolling 7d/30d mean + rolling "
    "7d stddev over hourly demand per type (ml_feature_engineering.py:247-284)."
    " Single shuffle on the partition key; frames evaluated in one window "
    "exec pass. Rolling stats from exact integer window sums (see module doc).",
)


def _ntile_sql(d: Dialect) -> str:
    """W5: NTILE(10) ordered by an aggregate computed in the same query —
    the 'decile by average demand' idiom. user_id tiebreaker keeps the
    global ordering total, so tile assignment is deterministic."""
    return f"""
WITH user_stats AS (
  SELECT user_id,
         COUNT(*) AS event_count,
         {davg('value')} AS avg_value,
         {dsum('value')} AS total_value
  FROM events
  GROUP BY user_id
)
SELECT
  user_id,
  event_count,
  avg_value,
  total_value,
  NTILE(10) OVER (ORDER BY avg_value, user_id) AS value_decile,
  NTILE(4)  OVER (ORDER BY event_count, user_id) AS activity_quartile
FROM user_stats
"""


sql_query(
    "q_user_deciles",
    spark_sql=_ntile_sql(SPARK),
    duck_sql=_ntile_sql(DUCK),
    tables=["events"],
    doc="W5: NTILE(10) ordered by an aggregate (ml_feature_engineering.py:207)."
    " Global NTILE needs a single-partition sort — acceptable because it runs "
    "over the already-aggregated (small) per-user table, not the fact table.",
)


def _surge_sql(d: Dialect) -> str:
    return f"""
WITH hourly_counts AS (
  SELECT event_type,
         CAST(hour(ts) AS INT) AS hour_of_day,
         COUNT(*) AS cnt
  FROM events
  GROUP BY event_type, CAST(hour(ts) AS INT)
)
SELECT
  event_type,
  hour_of_day,
  cnt,
  CAST(SUM(cnt) OVER (PARTITION BY event_type) AS DOUBLE)
    / COUNT(cnt) OVER (PARTITION BY event_type) AS avg_hourly_cnt,
  CASE
    WHEN cnt > 1.2 * (CAST(SUM(cnt) OVER (PARTITION BY event_type) AS DOUBLE)
                      / COUNT(cnt) OVER (PARTITION BY event_type)) THEN CAST(1.2 AS DOUBLE)
    WHEN cnt < 0.8 * (CAST(SUM(cnt) OVER (PARTITION BY event_type) AS DOUBLE)
                      / COUNT(cnt) OVER (PARTITION BY event_type)) THEN CAST(0.8 AS DOUBLE)
    ELSE CAST(1.0 AS DOUBLE)
  END AS surge_factor
FROM hourly_counts
"""


sql_query(
    "q_surge_factor",
    spark_sql=_surge_sql(SPARK),
    duck_sql=_surge_sql(DUCK),
    tables=["events"],
    doc="W6: window-over-aggregate surge factor — AVG(COUNT(*)) OVER "
    "(PARTITION BY zone) with 1.2/0.8 thresholds "
    "(ml_feature_engineering.py:418-422).",
)


def _tumbling_sql(d: Dialect) -> str:
    return f"""
SELECT
  {d.epoch_bucket('ts', 300)} AS window_start,
  {d.epoch_bucket('ts', 300)} + 300 AS window_end,
  event_type,
  COUNT(*) AS event_count,
  {dsum('value')} AS total_value,
  COUNT(DISTINCT user_id) AS unique_users
FROM events
GROUP BY {d.epoch_bucket('ts', 300)}, event_type
"""


sql_query(
    "q_tumbling_window_5m",
    spark_sql=_tumbling_sql(SPARK),
    duck_sql=_tumbling_sql(DUCK),
    tables=["events"],
    doc="W7/ST2 batch form: 5-minute tumbling windows keyed with type "
    "(realtime_cdc_processor.py:161-171). The streaming form (watermark + "
    "window() + append mode) lives in streaming/cdc.py; this batch query "
    "pins the same window arithmetic to an oracle.",
)


# ---------------------------------------------------------------------------
# Sessionization — gap-based session windows (beyond-reference event op).
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 30 * 60 * 1000000  # 30-minute inactivity gap

_SESSION_ORACLE = f"""
WITH ev AS (
  SELECT user_id, (epoch_ns(ts) // 1000) AS ts_us, value
  FROM events
  WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
),
marked AS (
  SELECT user_id, ts_us, value,
    CASE WHEN LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
           OR ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
              >= {_SESSION_GAP_US}
         THEN 1 ELSE 0 END AS new_session
  FROM ev
),
sessions AS (
  SELECT user_id, ts_us, value,
    SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts_us
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_id
  FROM marked
)
SELECT user_id,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
FROM sessions
GROUP BY user_id, session_id
"""


@df_query(
    "q_sessionization",
    duck_sql=_SESSION_ORACLE,
    tables=["events"],
    doc="Gap-based sessionization (30-min inactivity): Spark side uses "
    "the NATIVE session_window aggregate — merged while consecutive "
    "events are < gap apart, exactly the gaps-and-islands LAG/cumsum "
    "fixpoint the DuckDB oracle computes. Emits observed session bounds "
    "(min/max event time, not the gap-padded window end, which is "
    "engine-specific), event count, and the exact-decimal value sum. "
    "One shuffle on user_id; the identical expression runs under "
    "Structured Streaming with a watermark (session_window is "
    "streaming-capable) — the batch form here pins the algebra.",
)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    ev = t["events"].filter("event_id IS NOT NULL AND ts IS NOT NULL AND value > 0")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .drop("session_window")
    )


def _rank_report_sql(d: Dialect) -> str:
    """Full ranking-function family over per-customer spend. All four
    functions are exact-rank arithmetic (percent_rank = (rank-1)/(n-1),
    cume_dist = peers≤/n) — identical doubles in both engines; the unique
    c_custkey tiebreaker makes every rank deterministic."""
    return f"""
WITH spend AS (
  SELECT o_custkey, {dsum('o_totalprice')} AS total_spend,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT
  o_custkey,
  total_spend,
  n_orders,
  RANK() OVER w AS spend_rank,
  DENSE_RANK() OVER (ORDER BY n_orders DESC) AS order_count_dense_rank,
  PERCENT_RANK() OVER w AS spend_percentile,
  CUME_DIST() OVER w AS spend_cume_dist
FROM spend
WINDOW w AS (ORDER BY total_spend DESC, o_custkey)
"""


sql_query(
    "q_rank_report",
    spark_sql=_rank_report_sql(SPARK),
    duck_sql=_rank_report_sql(DUCK),
    tables=["orders"],
    doc="Ranking-function family (RANK / DENSE_RANK / PERCENT_RANK / "
    "CUME_DIST) over per-customer spend. Global ranking is inherently an "
    "Exchange SinglePartition — but its input is the already-aggregated "
    "per-customer table (bounded by customer cardinality, not order rows), "
    "the same accepted cost as q_user_deciles' NTILE.",
)


def _rolling_time_range_sql(d: Dialect) -> str:
    """Time-based RANGE frame (vs the ROWS frames of W2/W3): the trailing
    1-hour window is defined by actual event time, so sparse and dense
    periods get the same temporal horizon. RANGE peers (equal timestamps)
    aggregate identically in both engines — deterministic without a
    tiebreaker."""
    hour_us = 3600 * 1000000
    return f"""
WITH ev AS (
  SELECT user_id, {d.epoch_us('ts')} AS ts_us, value
  FROM events
  WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
)
SELECT
  user_id,
  ts_us,
  CAST(COUNT(*) OVER w AS BIGINT) AS n_events_1h,
  CAST(SUM(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE) AS value_1h
FROM ev
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts_us
  RANGE BETWEEN {hour_us - 1} PRECEDING AND CURRENT ROW
)
"""


sql_query(
    "q_rolling_time_range",
    spark_sql=_rolling_time_range_sql(SPARK),
    duck_sql=_rolling_time_range_sql(DUCK),
    tables=["events"],
    doc="Trailing 1-hour per-user activity via a time-based RANGE window "
    "frame (the ROWS frames elsewhere count rows; this one bounds by "
    "actual elapsed time — the correct form for rate limiting / velocity "
    "features on irregular event streams). One shuffle on user_id, "
    "exact-decimal sums; RANGE-peer semantics verified identical across "
    "engines.",
)


def _window_navigation_sql(d: Dialect) -> str:
    """Frame-navigation family (FIRST_VALUE / LAST_VALUE / NTH_VALUE + LEAD
    with default): the session-bookend features (entry event, latest event,
    second touch) a per-user feature store derives. Ordering is made total
    with the event_id tiebreak so every engine picks identical rows;
    LAST_VALUE uses the full-partition frame (the default frame stops at
    CURRENT ROW, a classic silent-wrong-answer trap — pinned here)."""
    return f"""
WITH ev AS (
  SELECT user_id, event_id, {d.epoch_us('ts')} AS ts_us, event_type, value
  FROM events
  WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
)
SELECT
  user_id,
  event_id,
  ts_us,
  FIRST_VALUE(event_type) OVER w AS first_type,
  LAST_VALUE(event_type) OVER w AS last_type,
  NTH_VALUE(event_type, 2) OVER w AS second_type,
  LEAD(ts_us, 1, 0) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
    AS next_ts_us
FROM ev
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts_us, event_id
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
"""


sql_query(
    "q_window_navigation",
    spark_sql=_window_navigation_sql(SPARK),
    duck_sql=_window_navigation_sql(DUCK),
    tables=["events"],
    doc="Window frame-navigation family: FIRST_VALUE / LAST_VALUE / "
    "NTH_VALUE over the explicit full-partition frame (the default frame "
    "ends at CURRENT ROW — LAST_VALUE under it degenerates to the current "
    "row, the classic trap) plus LEAD with a default. Total ordering via "
    "the event_id tiebreak makes every navigated row identical across "
    "engines. One shuffle on user_id; all four functions evaluate in a "
    "single Window exec pass.",
)


# ---------------------------------------------------------------------------
# Time-series gap filling + linear interpolation.
# ---------------------------------------------------------------------------


def _gap_fill_sql(d: Dialect) -> str:
    """Densify each event type's 5-min value series and linearly interpolate
    missing buckets between the surrounding observations.

    Interval-oriented plan: LEAD over the SMALL observation table pairs each
    observation with its successor, then only the GAP ranges explode
    (sequence/range between the interval endpoints) — the dense grid itself
    is never materialized, left-joined, or window-scanned. Gap rows where
    next_b > prev_b + 1 guarantee a strictly positive divisor; every float
    op is a single IEEE operation on exact-decimal-summed inputs →
    bit-identical cross-engine."""
    if d.name == "spark":
        gaps = "explode(sequence(b0 + 1, b1 - 1)) AS bucket"
    else:
        gaps = "unnest(range(b0 + 1, b1)) AS bucket"
    return f"""
WITH obs AS (
  SELECT event_type,
         {d.idiv(d.epoch('ts'), '300')} AS bucket,
         CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS v
  FROM events
  WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
  GROUP BY event_type, {d.idiv(d.epoch('ts'), '300')}
),
iv AS (
  SELECT event_type, bucket AS b0, v AS v0,
         LEAD(bucket) OVER (PARTITION BY event_type ORDER BY bucket) AS b1,
         LEAD(v) OVER (PARTITION BY event_type ORDER BY bucket) AS v1
  FROM obs
),
gaps AS (
  SELECT event_type, b0, b1, v0, v1, {gaps}
  FROM iv
  WHERE b1 IS NOT NULL AND b1 > b0 + 1
)
SELECT event_type,
       CAST(bucket * 300 AS BIGINT) AS bucket_ts,
       CAST(0 AS INT) AS interpolated,
       CAST(v AS DOUBLE) AS value_filled
FROM obs
UNION ALL
SELECT event_type,
       CAST(bucket * 300 AS BIGINT) AS bucket_ts,
       CAST(1 AS INT) AS interpolated,
       CAST(v0 + (v1 - v0) * (CAST(bucket - b0 AS DOUBLE) / (b1 - b0))
            AS DOUBLE) AS value_filled
FROM gaps
"""


sql_query(
    "q_gap_fill",
    spark_sql=_gap_fill_sql(SPARK),
    duck_sql=_gap_fill_sql(DUCK),
    tables=["events"],
    doc="Time-series densify + linear interpolation: each event type's 5-min "
    "value series gains its missing buckets, filled with the linear "
    "interpolation between the surrounding observations — the standard "
    "regularization step in front of lag-feature and forecasting pipelines "
    "(q_demand_lag_features consumes exactly this shape). Interval-oriented "
    "plan: LEAD pairs each observation with its successor on the SMALL "
    "aggregated table, and only the gap ranges explode — the dense grid is "
    "never materialized, joined, or window-scanned (a first grid-left-join-"
    "running-window draft cost 6.7 s at sf0.1 in 6 type-partitions; this "
    "shape runs ~20x faster and parallelizes across intervals, not types). "
    "At 100 TB: one grouped agg + one tiny window + gap explode, all "
    "embarrassingly parallel after the (type, bucket) shuffle.",
)


# ---------------------------------------------------------------------------
# Per-group top-N (the deduplicating rank-filter staple) and hopping
# (sliding) event-time windows.
# ---------------------------------------------------------------------------

_TOPN_SQL = """
WITH part_rev AS (
  SELECT
    n.n_name AS nation,
    l.l_partkey,
    CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue,
    COUNT(*) AS n_lines
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name, l.l_partkey
),
ranked AS (
  SELECT nation, l_partkey, revenue, n_lines,
         ROW_NUMBER() OVER (PARTITION BY nation
                            ORDER BY revenue DESC, l_partkey) AS rnk
  FROM part_rev
)
SELECT nation, CAST(rnk AS INT) AS rnk, l_partkey, revenue, n_lines
FROM ranked WHERE rnk <= 3
"""

sql_query(
    "q_top_parts_per_nation",
    spark_sql=_TOPN_SQL,
    duck_sql=_TOPN_SQL,
    tables=["lineitem", "supplier", "nation"],
    doc="Per-group top-N: top-3 parts by exact-decimal revenue within each "
    "supplier nation — ROW_NUMBER over the (nation, part) aggregate with "
    "a unique part-key tiebreaker, filtered to rank <= 3. The window "
    "partitions by nation (parallel across groups, no global sort), and "
    "Spark pushes the rank<=3 filter into the sort as a per-partition "
    "top-k (WindowGroupLimit) — the shape that holds at any group count.",
)


_HOP_WIDTH_S = 600
_HOP_S = 300


@df_query(
    "q_hopping_window",
    duck_sql=f"""
WITH ev AS (
  SELECT (epoch_ns(ts) // 1000000000) AS ts_s, value, event_id FROM events
  WHERE ts IS NOT NULL
),
hopped AS (
  SELECT
    (ts_s - (ts_s % {_HOP_S})) - i * {_HOP_S} AS window_start_s,
    value
  FROM ev, unnest([0, 1]) AS t(i)
)
SELECT
  CAST(window_start_s AS BIGINT) AS window_start_s,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM hopped
GROUP BY window_start_s
""",
    tables=["events"],
    doc=f"Hopping (sliding) event-time windows: {_HOP_WIDTH_S}-second "
    f"windows advancing every {_HOP_S} seconds, so each event lands in "
    "exactly width/hop = 2 overlapping windows — Spark's native "
    "window(ts, '10 minutes', '5 minutes'), the same operator the "
    "streaming form uses (ST-family completion next to the tumbling "
    "q_tumbling_window_5m). Oracle reproduces the window assignment "
    "arithmetic: starts = hop-bucket(ts) - i*hop for i in 0..1. Window "
    "starts emitted as epoch seconds (ns-parquet timestamp discipline).",
)
def q_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    ev = t["events"].filter("ts IS NOT NULL")
    return (
        ev.groupBy(
            F.window("ts", f"{_HOP_WIDTH_S} seconds", f"{_HOP_S} seconds").alias("w")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "n_events",
            "total_value",
        )
    )


def _seasonal_anomaly_sql(d: Dialect) -> str:
    """Per-(dow, hour) seasonal baseline from exact decimal moments; events
    whose value sits more than 3 sample-stddevs from their slot's mean are
    flagged. The baseline join is an aggregate-to-fact equi-join on the
    slot key (broadcastable: <= 168 slots)."""
    dow = d.dow('ts')
    epoch_ts = d.epoch("ts")
    hour = f"CAST({d.idiv(f'({epoch_ts} % 86400)', '3600')} AS INT)"
    return f"""
WITH ev AS (
  SELECT event_id, user_id, value,
         {dow} AS dow, {hour} AS hod
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
baseline AS (
  SELECT dow, hod, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sx,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(28,6))
                        * CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE) AS sxx
  FROM ev GROUP BY dow, hod
  HAVING COUNT(*) >= 3
)
SELECT e.event_id, e.user_id, e.value,
       e.dow, e.hod,
       b.sx / CAST(b.n AS DOUBLE) AS slot_mean,
       SQRT((CAST(b.n AS DOUBLE) * b.sxx - b.sx * b.sx)
            / (CAST(b.n AS DOUBLE) * (CAST(b.n AS DOUBLE) - 1)))
         AS slot_stddev,
       (e.value - b.sx / CAST(b.n AS DOUBLE))
         / SQRT((CAST(b.n AS DOUBLE) * b.sxx - b.sx * b.sx)
                / (CAST(b.n AS DOUBLE) * (CAST(b.n AS DOUBLE) - 1)))
         AS z_score
FROM ev e JOIN baseline b ON e.dow = b.dow AND e.hod = b.hod
WHERE ABS((e.value - b.sx / CAST(b.n AS DOUBLE))
      / SQRT((CAST(b.n AS DOUBLE) * b.sxx - b.sx * b.sx)
             / (CAST(b.n AS DOUBLE) * (CAST(b.n AS DOUBLE) - 1)))) > 3
"""


sql_query(
    "q_seasonal_anomaly",
    spark_sql=_seasonal_anomaly_sql(SPARK),
    duck_sql=_seasonal_anomaly_sql(DUCK),
    tables=["events"],
    doc="Seasonality-aware anomaly detection: per-(day-of-week, hour) "
    "baseline mean/stddev from ONE decimal moment-sum pass (<=168 slots, "
    "broadcast back onto the fact), events beyond 3 sample-sigmas of "
    "their slot flagged with their z-score. Identical IEEE z expression "
    "in both engines; complements q_anomaly_mad (global robust outliers) "
    "and q_drift_chisq (distributional drift) with the seasonal-residual "
    "family.",
)


def _cusum_sql(d: Dialect) -> str:
    """CUSUM changepoint scan over the daily totals: S_k = Σ_{i<=k}(x_i - μ),
    the maximum |S_k| marks the most likely level-shift location. All
    inputs are exact decimal day totals; μ enters each term once, so the
    running sum is the identical IEEE tree under the ordered window."""
    day = d.idiv(d.epoch('ts'), '86400')
    return f"""
WITH daily AS (
  SELECT {day} AS day_n,
         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY {day}
),
mu AS (
  SELECT CAST(SUM(CAST(total AS DECIMAL(28,6))) AS DOUBLE)
         / COUNT(*) AS mean_total
  FROM daily
),
cusum AS (
  SELECT d.day_n, d.total,
         SUM(d.total - m.mean_total) OVER (
           ORDER BY d.day_n
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_k
  FROM daily d CROSS JOIN mu m
)
SELECT CAST(day_n AS BIGINT) AS day_n, total, s_k,
       ABS(s_k) AS abs_s_k
FROM cusum
ORDER BY abs_s_k DESC, day_n
LIMIT 5
"""


sql_query(
    "q_cusum_changepoint",
    spark_sql=_cusum_sql(SPARK),
    duck_sql=_cusum_sql(DUCK),
    tables=["events"],
    doc="CUSUM changepoint scan: cumulative deviation of exact-decimal "
    "daily totals from the overall mean; the top-|S_k| days (unique "
    "day tiebreaker) locate the most likely level shift. The window "
    "runs over the DAILY aggregate (cardinality = #days — bounded), "
    "and the mean is a 1-row broadcast. The monitoring companion to "
    "q_drift_chisq: drift says the halves differ, CUSUM says WHERE the "
    "shift happened.",
)


# --- Sweep-line interval concurrency -------------------------------------


def _concurrency_sql(d: Dialect) -> str:
    """Maximum concurrent open intervals per event type — the sweep-line
    answer to "how many sessions/calls/jobs were in flight at peak".

    Each event opens an interval [ts, ts + value seconds). The classic
    O(N·log N) sweep replaces the quadratic overlap self-join: every
    interval becomes a +1 point at open and a −1 at close, a running sum
    ordered by time IS the live concurrency, and its max is the peak.
    Half-open semantics via the tiebreak (t, delta, event_id): a close
    sorts before an open at the same instant. All integer arithmetic on
    epoch-microseconds.

    Scale shape: the running sum partitions by event_type — each type's
    sweep is an ordered scan of its own points, never a pair join. For a
    single giant type, the standard two-pass split applies (per-range
    partial sums + broadcast prefix offsets — the q_seq_packing
    discipline); the algebra here is unchanged.
    """
    t0 = d.epoch_us("ts")
    dur = "CAST(round(value * 1000000) AS BIGINT)"
    return f"""
WITH iv AS (
  SELECT event_type, event_id, {t0} AS t0, {t0} + {dur} AS t1
  FROM events
  WHERE ts IS NOT NULL AND value > 0
),
pts AS (
  SELECT event_type, t0 AS t, 1 AS delta, event_id FROM iv
  UNION ALL
  SELECT event_type, t1 AS t, -1 AS delta, event_id FROM iv
),
run AS (
  SELECT event_type, t,
    SUM(delta) OVER (
      PARTITION BY event_type ORDER BY t, delta, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS conc
  FROM pts
),
peak AS (
  SELECT event_type, CAST(MAX(conc) AS INT) AS max_concurrent FROM run
  GROUP BY event_type
),
sizes AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_intervals,
         CAST(SUM(t1 - t0) AS BIGINT) AS total_busy_us
  FROM iv GROUP BY event_type
)
SELECT
  p.event_type,
  s.n_intervals,
  s.total_busy_us,
  p.max_concurrent,
  MIN(r.t) AS peak_start_us
FROM peak p
JOIN run r ON r.event_type = p.event_type AND r.conc = p.max_concurrent
JOIN sizes s ON s.event_type = p.event_type
GROUP BY p.event_type, s.n_intervals, s.total_busy_us, p.max_concurrent
"""


sql_query(
    "q_max_concurrency",
    spark_sql=_concurrency_sql(SPARK),
    duck_sql=_concurrency_sql(DUCK),
    tables=["events"],
    doc=_concurrency_sql.__doc__,
)


# --- Seasonal-trend decomposition (STL-lite) ------------------------------


def _stl_sql(d: Dialect) -> str:
    """Classical seasonal-trend decomposition of the daily series (the
    moving-average STL ancestor): trend = 7-day centered moving average,
    seasonal_j = mean detrended value of weekday j, remainder = y − trend −
    seasonal. The monitoring triptych completes: q_drift_chisq says the
    distribution moved, q_cusum_changepoint says when the level shifted,
    THIS separates how much of a day's value is trend vs weekday pattern
    vs genuinely unexplained.

    Determinism: daily totals are exact decimal sums; the trend is one IEEE
    division of a decimal window-sum; detrended values snap to
    DECIMAL(28,6) before the per-weekday mean (order-independent; the 1e-6
    grid is ~1e8 ulps coarse at these magnitudes, so both engines land on
    the same decimal — a 1e-12 grid is only ~100 ulps coarse and DID
    diverge at cast-rounding boundaries, caught by the oracle gate), and the
    remainder is a two-op IEEE chain — identical in both engines. Trend is
    NULL at the 3-day edges (incomplete window), seasonal/remainder NULL
    with it — pinned, not imputed.

    Scale shape: one day-grain aggregation (map-side partials over the
    fact), a 7-row window and a ≤7-row seasonal broadcast over the
    day-cardinality series — everything after the first aggregate is
    bounded by |days|, not |rows|.
    """
    epoch_ts = d.epoch("ts")
    day = f"CAST({d.idiv(epoch_ts, '86400')} AS BIGINT)"
    dow = d.dow("ts")
    return f"""
WITH daily AS (
  SELECT {day} AS day, MIN({dow}) AS dow,
         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS y,
         SUM(CAST(value AS DECIMAL(28,6))) AS y_dec
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY {day}
),
trended AS (
  SELECT day, dow, y,
         CASE WHEN COUNT(*) OVER w = 7
              THEN CAST(SUM(y_dec) OVER w AS DOUBLE) / 7.0 END AS trend
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
  SELECT day, dow, y, trend,
         CAST(y - trend AS DECIMAL(28,6)) AS det_dec
  FROM trended
),
seasonal AS (
  SELECT dow,
         CAST(SUM(det_dec) AS DOUBLE) / COUNT(det_dec) AS s
  FROM det WHERE det_dec IS NOT NULL GROUP BY dow
)
SELECT
  t.day,
  t.dow,
  t.y,
  t.trend,
  CASE WHEN t.trend IS NOT NULL THEN s.s END AS seasonal,
  CASE WHEN t.trend IS NOT NULL THEN t.y - t.trend - s.s END AS remainder
FROM det t JOIN seasonal s ON t.dow = s.dow
"""


sql_query(
    "q_stl_decompose",
    spark_sql=_stl_sql(SPARK),
    duck_sql=_stl_sql(DUCK),
    tables=["events"],
    doc=_stl_sql.__doc__,
)


# --- Clamped running balance (Lindley recursion, closed form) -------------


def _capped_runsum_sql(d: Dialect) -> str:
    """Inventory/ledger semantics: per user, purchases add value and errors
    deduct it, but the balance never goes below zero — the CLAMPED running
    sum W_k = max(0, W_{k-1} + x_k). The recursion looks window-
    inexpressible (each step depends on the clamped previous step), and
    the tempting per-key fold (collect_list + aggregate lambda) carries a
    whole key's history as task state. The scale answer is the LINDLEY
    REFLECTION IDENTITY from queueing theory:

        W_k = S_k − min(0, min_{j≤k} S_j)      (S = plain prefix sum)

    and a clamp fires exactly when S_k drops below the previous running
    minimum (a strict new minimum under 0). Both sides become ordinary
    prefix-sum/running-min windows — O(1) state per row, exact integer
    cents, identical in both engines. (A fold formulation was tried first:
    DuckDB 1.0's list_reduce mis-evaluates struct accumulators on longer
    lists — the oracle gate caught it; the closed form sidesteps the bug
    AND removes the per-key list state.)

    Scale shape: one shuffle on user_id, two stacked window passes on the
    same (user_id → ts) sort, one final per-user aggregate.
    """
    ts = d.epoch_us("ts")
    cents = "CAST(round(value * 100) AS BIGINT)"
    return f"""
WITH mv AS (
  SELECT user_id, {ts} AS ts_us, event_id,
         CASE WHEN event_type = 'purchase' THEN {cents} ELSE -{cents} END AS d
  FROM events
  WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
    AND event_type IN ('purchase', 'error')
),
prefix AS (
  SELECT user_id, ts_us, event_id, d,
         SUM(d) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM mv
),
flagged AS (
  SELECT user_id, d, s,
         CASE WHEN s < LEAST(0, COALESCE(MIN(s) OVER (
                PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
              THEN 1 ELSE 0 END AS clamp
  FROM prefix
)
SELECT
  user_id,
  CAST(COUNT(*) AS BIGINT) AS n_moves,
  CAST(SUM(d) - LEAST(0, MIN(s)) AS BIGINT) AS final_balance_cents,
  CAST(SUM(clamp) AS INT) AS n_clamps,
  CAST(SUM(d) - LEAST(0, MIN(s)) AS DOUBLE) / 100.0 AS final_balance
FROM flagged
GROUP BY user_id
"""


sql_query(
    "q_capped_runsum",
    spark_sql=_capped_runsum_sql(SPARK),
    duck_sql=_capped_runsum_sql(DUCK),
    tables=["events"],
    doc=_capped_runsum_sql.__doc__,
)


# ---------------------------------------------------------------------------
# SAX symbolic motif mining over the hourly series.
# ---------------------------------------------------------------------------

_SAX_W = 24  # window length (hours)
_SAX_SEG = 4  # hours per PAA segment -> 6 symbols per word
_SAX_BP = ("-0.6745", "0", "0.6745")  # N(0,1) quartile breakpoints -> a..d


def _sax_sql(d: Dialect) -> str:
    """SAX (Lin et al. 2003): slide a 24h window over the hourly totals,
    z-normalize within the window, average 4h segments (PAA), discretize
    against the N(0,1) quartile breakpoints, and count the resulting
    6-symbol words — recurring words are motifs, rare words discords.

    Determinism: hourly totals and every frame sum (Σv, Σv², per-segment
    Σv) are EXACT decimal window sums over one ROWS-frame sort; mean/std/
    PAA are then single shared IEEE expressions, so symbol boundaries
    resolve identically in both engines. Windows with zero variance emit
    the all-'b' word by convention. Frames are ROWS-based over observed
    hours (documented: a truly empty hour — absent in this data — would
    compact the sequence, identically in both engines)."""
    v = "CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DECIMAL(28,2))"
    seg_sums = ", ".join(
        f"""CAST(SUM(v) OVER (ORDER BY h
      ROWS BETWEEN {j * _SAX_SEG} FOLLOWING AND {(j + 1) * _SAX_SEG - 1} FOLLOWING)
      AS DECIMAL(38,2)) AS s{j}"""
        for j in range(_SAX_W // _SAX_SEG)
    )
    sym = []
    for j in range(_SAX_W // _SAX_SEG):
        paa = f"((CAST(s{j} AS DOUBLE) / {_SAX_SEG}) - mean) / std"
        sym.append(
            f"""CASE WHEN std = 0 THEN 'b'
           WHEN {paa} < {_SAX_BP[0]} THEN 'a'
           WHEN {paa} < {_SAX_BP[1]} THEN 'b'
           WHEN {paa} < {_SAX_BP[2]} THEN 'c'
           ELSE 'd' END"""
        )
    word = " || ".join(sym)
    return f"""
WITH hourly AS (
  SELECT {d.epoch_hour('ts')} AS h, {v} AS v
  FROM events GROUP BY {d.epoch_hour('ts')}
),
framed AS (
  SELECT h,
    CAST(COUNT(*) OVER (ORDER BY h
      ROWS BETWEEN CURRENT ROW AND {_SAX_W - 1} FOLLOWING) AS INT) AS nf,
    CAST(SUM(v) OVER (ORDER BY h
      ROWS BETWEEN CURRENT ROW AND {_SAX_W - 1} FOLLOWING) AS DECIMAL(38,2)) AS sv,
    CAST(SUM(CAST(v * v AS DECIMAL(38,4))) OVER (ORDER BY h
      ROWS BETWEEN CURRENT ROW AND {_SAX_W - 1} FOLLOWING) AS DECIMAL(38,4)) AS svv,
    {seg_sums}
  FROM hourly
),
stats AS (
  SELECT h, s0, s1, s2, s3, s4, s5,
         CAST(sv AS DOUBLE) / {_SAX_W} AS mean,
         SQRT((CAST({_SAX_W} AS DOUBLE) * CAST(svv AS DOUBLE)
               - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
              / ({_SAX_W}.0 * {_SAX_W - 1}.0)) AS std
  FROM framed WHERE nf = {_SAX_W}
),
words AS (SELECT h, {word} AS sax_word FROM stats)
SELECT sax_word,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(MIN(h) AS BIGINT) AS first_start_epoch
FROM words GROUP BY sax_word
"""


sql_query(
    "q_sax_motifs",
    spark_sql=_sax_sql(SPARK),
    duck_sql=_sax_sql(DUCK),
    tables=["events"],
    doc="SAX symbolic time-series motif mining (Lin et al. 2003) over the "
    "hourly totals: 24h sliding windows → per-window z-normalization → "
    "4h PAA segments → N(0,1)-quartile alphabet → 6-symbol words, "
    "grouped with counts (recurring words = motifs, singletons = "
    "discords). Every frame statistic is an exact decimal ROWS-window "
    "sum sharing ONE hour-ordered sort; normalization/discretization "
    "are shared IEEE trees, so the symbolic words match across engines "
    "bit-for-bit. The series windows run on the hour-grain AGGREGATE "
    "(≤ |hours| rows — whitelisted like q_stl_decompose); at 100 TB the "
    "hourly rollup is the only full-data pass, map-side combined.",
)


# ---------------------------------------------------------------------------
# EWMA control chart — integer recursion via recursive CTE in BOTH engines.
# ---------------------------------------------------------------------------


def _ewma_sql(d: Dialect) -> str:
    """EWMA (alpha = 1/8) over the daily totals as an exact INTEGER
    recursion: e_t = e_{t-1} + floor((x_t − e_{t-1}) / 8), run as the same
    WITH RECURSIVE in both engines (Spark 4 UnionLoop / DuckDB native) —
    the genuinely stateful linear recursion that ROWS-frame windows cannot
    express (geometric weights) and that q_capped_runsum's closed form
    does not cover. floor division is spelled engine-agnostically
    (CASE on sign): BOTH engines' integer division truncates toward
    zero on negatives (measured: DuckDB -9//4 = -2, not -3), so a bare
    DIV-vs-// would agree with each other but not with the intended
    floor semantics.
    Out-of-control flag: 5·|x − ewma| > ewma (a ±20% band)."""
    cents = "CAST(SUM(CAST(value AS DECIMAL(28,2))) * 100 AS BIGINT)"

    def fdiv8(a: str) -> str:
        return (
            f"CASE WHEN ({a}) >= 0 THEN {d.idiv(f'({a})', '8')}"
            f" ELSE -({d.idiv(f'(-({a}) + 7)', '8')}) END"
        )

    day = d.epoch("date_trunc('day', ts)")
    return f"""
WITH RECURSIVE daily AS (
  SELECT {day} AS day, {cents} AS x FROM events GROUP BY {day}
),
idx AS (
  SELECT day, x,
         CAST({d.idiv('(day - (SELECT MIN(day) FROM daily))', '86400')} AS BIGINT) AS i
  FROM daily
),
rec(i, day, x, e) AS (
  SELECT i, day, x, x AS e FROM idx WHERE i = 0
  UNION ALL
  SELECT n.i, n.day, n.x,
         r.e + {fdiv8('n.x - r.e')}
  FROM rec r JOIN idx n ON n.i = r.i + 1
)
SELECT day, x AS total_cents, e AS ewma_cents,
       CAST(CASE WHEN 5 * ABS(x - e) > e THEN 1 ELSE 0 END AS INT)
         AS out_of_control
FROM rec
"""


@df_query(
    "q_ewma_control",
    duck_sql=_ewma_sql(DUCK),
    tables=["events"],
    doc="EWMA control chart over daily revenue, as an exact integer "
    "recursion (alpha=1/8; engine-agnostic floor division) — the "
    "stateful geometric-weight recursion no window frame expresses, "
    "complementing q_capped_runsum's closed-form clamp and "
    "q_cusum_changepoint's resettable sum. Spark folds the recursion "
    "with a higher-order aggregate() over the sorted day array — the "
    "series is day-grain (≤|days| structs in one row, the "
    "q_stl_decompose boundedness class), so the fold is one task and "
    "the only full-data work is the map-side-combined day rollup. "
    "(A WITH RECURSIVE form runs too — see q_recursive_cte — but "
    "UnionLoop pays per-iteration scheduling: 30 day-steps cost ~10 s "
    "vs ~0.3 s for the fold; measured, hence this shape.) The oracle "
    "IS the recursive-CTE form in DuckDB, pinning the fold exactly. "
    "Out-of-control days flag a ±20% band — all integer, bit-identical.",
)
def q_ewma_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_tables

    load_tables(spark, sf_dir, ["events"])
    fdiv8 = (
        "CASE WHEN ({a}) >= 0 THEN ({a}) DIV 8"
        " ELSE -((-({a}) + 7) DIV 8) END"
    )
    step = fdiv8.format(a="s.x - acc.e")
    daily = spark.sql(
        "SELECT unix_timestamp(date_trunc('day', ts)) AS day,"
        " CAST(SUM(CAST(value AS DECIMAL(28,2))) * 100 AS BIGINT) AS x"
        " FROM events GROUP BY unix_timestamp(date_trunc('day', ts))"
    )
    folded = daily.groupBy().agg(
        F.expr(
            f"""
aggregate(
  sort_array(collect_list(struct(day, x))),
  struct(
    CAST(array() AS ARRAY<STRUCT<day: BIGINT, x: BIGINT, e: BIGINT>>) AS out,
    CAST(NULL AS BIGINT) AS e
  ),
  (acc, s) -> struct(
    concat(acc.out, array(struct(
      s.day AS day, s.x AS x,
      CASE WHEN acc.e IS NULL THEN s.x ELSE acc.e + {step} END AS e))) AS out,
    CASE WHEN acc.e IS NULL THEN s.x ELSE acc.e + {step} END AS e
  ),
  acc -> acc.out
)"""
        ).alias("series")
    )
    return folded.selectExpr("explode(series) AS s").selectExpr(
        "s.day AS day",
        "s.x AS total_cents",
        "s.e AS ewma_cents",
        "CAST(CASE WHEN 5 * ABS(s.x - s.e) > s.e THEN 1 ELSE 0 END AS INT)"
        " AS out_of_control",
    )


# ---------------------------------------------------------------------------
# FIFO lot matching — cumulative-interval overlap (set-based inventory
# accounting).
# ---------------------------------------------------------------------------


def _fifo_sql(d: Dialect) -> str:
    """Match each (supplier, part)'s returned quantities against its shipped
    lots FIRST-IN-FIRST-OUT — the inventory-accounting process that looks
    inherently sequential but has a closed set-based form: give ships and
    returns each a cumulative-quantity interval [cum−q, cum) in arrival
    order; FIFO matching is EXACTLY the pairwise overlap of those
    intervals (matched qty = min(ends) − max(starts) where positive). One
    window per side + one bounded per-key range join — no per-key loops,
    no state."""
    return f"""
WITH lines AS (
  SELECT l_suppkey, l_partkey, l_returnflag,
         CAST(l_quantity AS BIGINT) AS q,
         {d.epoch('l_shipdate')} AS sd, l_orderkey, l_linenumber
  FROM lineitem
),
ships AS (
  SELECT l_suppkey, l_partkey, q,
         CAST(SUM(q) OVER (
           PARTITION BY l_suppkey, l_partkey
           ORDER BY sd, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum
  FROM lines WHERE l_returnflag <> 'R'
),
rets AS (
  SELECT l_suppkey, l_partkey, q,
         CAST(SUM(q) OVER (
           PARTITION BY l_suppkey, l_partkey
           ORDER BY sd, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum
  FROM lines WHERE l_returnflag = 'R'
),
matched AS (
  SELECT s.l_suppkey, s.l_partkey,
         CAST(SUM(
           LEAST(s.cum, r.cum) - GREATEST(s.cum - s.q, r.cum - r.q)
         ) AS BIGINT) AS matched_qty
  FROM ships s JOIN rets r
    ON s.l_suppkey = r.l_suppkey AND s.l_partkey = r.l_partkey
   AND s.cum - s.q < r.cum AND r.cum - r.q < s.cum
  GROUP BY s.l_suppkey, s.l_partkey
),
totals AS (
  SELECT l_suppkey, l_partkey,
         CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN q ELSE 0 END) AS BIGINT)
           AS shipped_qty,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN q ELSE 0 END) AS BIGINT)
           AS returned_qty
  FROM lines GROUP BY l_suppkey, l_partkey
)
SELECT t.l_suppkey, t.l_partkey, t.shipped_qty, t.returned_qty,
       COALESCE(m.matched_qty, 0) AS fifo_matched_qty,
       t.returned_qty - COALESCE(m.matched_qty, 0) AS unmatched_returns
FROM totals t LEFT JOIN matched m
  ON t.l_suppkey = m.l_suppkey AND t.l_partkey = m.l_partkey
WHERE t.returned_qty > 0
"""


sql_query(
    "q_fifo_match",
    spark_sql=_fifo_sql(SPARK),
    duck_sql=_fifo_sql(DUCK),
    tables=["lineitem"],
    doc="FIFO inventory matching WITHOUT sequential state: returns consume "
    "the oldest shipped lots first, computed as the overlap of cumulative-"
    "quantity intervals — ship lot [cum−q, cum) × return lot [cum−q, cum) "
    "overlap IS the FIFO allocation (the same reflection that turns "
    "running clamps into q_capped_runsum's closed form). Plan: two "
    "(supplier, part)-partitioned cumulative windows sharing the sort, "
    "one per-key band join whose fanout is bounded by lots-per-key, one "
    "rollup; all integer quantities. Unmatched returns (returns exceeding "
    "shipments) are reported — the reconciliation signal inventory audits "
    "need.",
)


# ---------------------------------------------------------------------------
# Forecast backtest — seasonal-naive baseline scored with WAPE/bias.
# ---------------------------------------------------------------------------


def _backtest_sql(d: Dialect) -> str:
    """Hold out the final 7 days; forecast each as the MEAN of the same
    weekday's totals over the training window (the seasonal-naive baseline
    every real forecaster must beat). All integer cents: the per-dow mean
    is one floor DIV, errors are exact, and WAPE/bias are single exact
    DIVs over the 7-row holdout — so the scorecard is bit-identical across
    engines (no MAPE: division by a per-day actual would blow up on quiet
    days; WAPE's Σ|err|/Σactual is the scale-stable form)."""
    day = d.epoch("date_trunc('day', ts)")
    cents = "CAST(SUM(CAST(value AS DECIMAL(28,2))) * 100 AS BIGINT)"
    return f"""
WITH daily AS (
  SELECT {day} AS day, {cents} AS x FROM events GROUP BY {day}
),
bounds AS (SELECT MAX(day) - 6 * 86400 AS test_start FROM daily),
train AS (
  SELECT {d.idiv('(day', '86400)')} % 7 AS dow,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(COUNT(*) AS BIGINT) AS n
  FROM daily CROSS JOIN bounds WHERE day < test_start
  GROUP BY {d.idiv('(day', '86400)')} % 7
),
test AS (
  SELECT day, x, {d.idiv('(day', '86400)')} % 7 AS dow
  FROM daily CROSS JOIN bounds WHERE day >= test_start
),
scored AS (
  SELECT t.day, t.x AS actual_cents,
         {d.idiv('tr.sx', 'tr.n')} AS forecast_cents
  FROM test t JOIN train tr ON t.dow = tr.dow
)
SELECT day, actual_cents, forecast_cents,
       ABS(actual_cents - forecast_cents) AS abs_err_cents,
       CAST({d.idiv('SUM(ABS(actual_cents - forecast_cents)) OVER () * 1000000',
                    'SUM(actual_cents) OVER ()')} AS BIGINT) AS wape_ppm,
       CAST({d.idiv('SUM(forecast_cents - actual_cents) OVER () * 1000000',
                    'SUM(actual_cents) OVER ()')} AS BIGINT) AS bias_ppm
FROM scored
"""


sql_query(
    "q_forecast_backtest",
    spark_sql=_backtest_sql(SPARK),
    duck_sql=_backtest_sql(DUCK),
    tables=["events"],
    doc="Forecast backtesting: the final week held out and predicted by "
    "the per-weekday training mean (seasonal-naive — the baseline any "
    "production forecaster must beat), scored with WAPE and signed bias "
    "in exact integer cents (WAPE over MAPE deliberately: Σ|err|/Σactual "
    "never divides by a quiet day). Plan: one map-side-combined day "
    "rollup is the only full-data pass; the 7-row dow profile broadcasts "
    "onto the 7-row holdout; scorecard windows run over 7 rows "
    "(whitelisted). The profile generalizes to the per-(zone, dow, hour) "
    "grain of q_demand_prediction unchanged.",
)


# ---------------------------------------------------------------------------
# Rolling OLS — 28-day local trend of daily demand (W-family extension).
# ---------------------------------------------------------------------------


def _rolling_regression_sql(d: Dialect) -> str:
    """28-day rolling OLS slope/intercept of daily order count against the
    day index. The frame sums n, Σx, Σy, Σxy, Σx² are window aggregates
    over EXACT integers (x = day offset, y = count), so every window's
    moment vector is exact; slope and level are the shared dregr IEEE
    trees evaluated per row. Emitted monthly (1st-of-month rows) to keep
    the report compact; the window itself is day-grain."""
    day = f"CAST({d.idiv(d.epoch('o_orderdate'), '86400')} AS BIGINT)"
    w = "ROWS BETWEEN 27 PRECEDING AND CURRENT ROW"
    return f"""
WITH daily AS (
  SELECT {day} AS t, CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY {day}
),
framed AS (
  SELECT t, y,
         CAST(COUNT(*)   OVER (ORDER BY t {w}) AS BIGINT) AS n,
         CAST(SUM(t)     OVER (ORDER BY t {w}) AS BIGINT) AS sx,
         CAST(SUM(y)     OVER (ORDER BY t {w}) AS BIGINT) AS sy,
         CAST(SUM(t * y) OVER (ORDER BY t {w}) AS BIGINT) AS sxy,
         CAST(SUM(t * t) OVER (ORDER BY t {w}) AS BIGINT) AS sxx
  FROM daily
)
SELECT
  t AS day_no,
  y AS day_count,
  n AS window_days,
  (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS slope_28d,
  (CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * sx) / n
    AS intercept_28d
FROM framed
WHERE n >= 28 AND t % 28 = 0
ORDER BY day_no
"""


sql_query(
    "q_rolling_regression",
    spark_sql=_rolling_regression_sql(SPARK),
    duck_sql=_rolling_regression_sql(DUCK),
    tables=["orders"],
    doc="28-day rolling OLS trend of daily order demand (slope + level "
    "every 28th day): the local-trend detector that catches drifts "
    "q_acf's global statistics average away and q_cusum_changepoint's "
    "mean-shift model misses (a slow ramp has no changepoint). Window "
    "moment sums n/Σx/Σy/Σxy/Σx² over exact integers (day index × "
    "count) — every frame's moment vector is exact BIGINT, slope is "
    "one shared IEEE tree per row. Day-grain window over the "
    "calendar-bounded daily aggregate (q_cusum class; ≤2405 rows).",
)


# ---------------------------------------------------------------------------
# Holt double exponential smoothing — coupled level+trend recursion.
# ---------------------------------------------------------------------------


def _holt_oracle() -> str:
    """DuckDB oracle: the identical integer recursion as a recursive CTE
    (// floors natively, matching the Spark fold's CASE-floor)."""
    return """
WITH RECURSIVE daily AS (
  SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day,
         CAST(SUM(CAST(value AS DECIMAL(28,2))) * 100 AS BIGINT) AS x
  FROM events GROUP BY 1
),
idx AS (
  SELECT day, x,
         CAST((day - (SELECT MIN(day) FROM daily)) // 86400 AS BIGINT) AS i
  FROM daily
),
rec(i, day, x, l, b) AS (
  SELECT i, day, x, x AS l, CAST(0 AS BIGINT) AS b FROM idx WHERE i = 0
  UNION ALL
  SELECT n.i, n.day, n.x,
         r.l + r.b
           + CASE WHEN n.x - r.l - r.b >= 0 THEN (n.x - r.l - r.b) // 4
                  ELSE -((-(n.x - r.l - r.b) + 3) // 4) END,
         r.b
           + CASE WHEN (CASE WHEN n.x - r.l - r.b >= 0
                             THEN (n.x - r.l - r.b) // 4
                             ELSE -((-(n.x - r.l - r.b) + 3) // 4) END) >= 0
                  THEN (CASE WHEN n.x - r.l - r.b >= 0
                             THEN (n.x - r.l - r.b) // 4
                             ELSE -((-(n.x - r.l - r.b) + 3) // 4) END) // 8
                  ELSE -((-(CASE WHEN n.x - r.l - r.b >= 0
                                 THEN (n.x - r.l - r.b) // 4
                                 ELSE -((-(n.x - r.l - r.b) + 3) // 4) END) + 7) // 8)
             END
  FROM rec r JOIN idx n ON n.i = r.i + 1
)
SELECT day, x AS total_cents, l AS level_cents, b AS trend_cents,
       l + b AS forecast_next_cents,
       x - l AS residual_cents
FROM rec
ORDER BY day
"""


@df_query(
    "q_holt",
    duck_sql=_holt_oracle(),
    tables=["events"],
    doc="Holt double exponential smoothing over daily revenue — the "
    "COUPLED level+trend recursion (error-correction form, α=1/4, "
    "β=1/8) that extends q_ewma_control's single-state EWMA to "
    "trending series; emits per-day level, trend, one-step forecast "
    "and residual, all exact BIGINT cents (dyadic smoothing constants "
    "→ floor divisions; BOTH engines' integer division truncates "
    "toward zero on negatives, so both sides spell floor-division "
    "with the same sign CASE — identical arithmetic, hash-exact). Spark runs the recursion as "
    "ONE higher-order aggregate() fold over the sorted day array "
    "(calendar-bounded, the q_stl_decompose class — the only "
    "full-data work is the map-side-combined day rollup); the oracle "
    "is the same recursion as a DuckDB recursive CTE.",
)
def q_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    daily = (
        t["events"]
        .groupBy(F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day"))
        .agg(
            (F.sum(F.col("value").cast("decimal(28,2)")) * 100)
            .cast("bigint")
            .alias("x")
        )
    )
    packed = daily.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("s")
    )
    # floor division for possibly-negative errors (Spark DIV truncates)
    def fdiv(a: str, k: int) -> str:
        return (
            f"CASE WHEN ({a}) >= 0 THEN ({a}) DIV {k}"
            f" ELSE -(((-({a})) + {k - 1}) DIV {k}) END"
        )

    err = "(x.x - acc.l - acc.b)"
    step_l = f"acc.l + acc.b + ({fdiv(err, 4)})"
    step_b = f"acc.b + ({fdiv(fdiv(err, 4), 8)})"
    folded = packed.select(
        F.expr(
            f"""
            aggregate(
              slice(s, 2, size(s) - 1),
              struct(
                CAST(s[0].x AS BIGINT) AS l,
                CAST(0 AS BIGINT) AS b,
                array(struct(s[0].day AS day, s[0].x AS x,
                             CAST(s[0].x AS BIGINT) AS l,
                             CAST(0 AS BIGINT) AS b)) AS hist
              ),
              (acc, x) -> struct(
                CAST({step_l} AS BIGINT) AS l,
                CAST({step_b} AS BIGINT) AS b,
                concat(acc.hist,
                       array(struct(x.day AS day, x.x AS x,
                                    CAST({step_l} AS BIGINT) AS l,
                                    CAST({step_b} AS BIGINT) AS b))) AS hist
              ),
              acc -> acc.hist
            ) AS hist
            """
        ).alias("hist")
    )
    return (
        folded.select(F.explode("hist").alias("r"))
        .select(
            F.col("r.day").alias("day"),
            F.col("r.x").alias("total_cents"),
            F.col("r.l").alias("level_cents"),
            F.col("r.b").alias("trend_cents"),
            (F.col("r.l") + F.col("r.b")).alias("forecast_next_cents"),
            (F.col("r.x") - F.col("r.l")).alias("residual_cents"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Croston's method — intermittent-demand forecasting per part.
# ---------------------------------------------------------------------------

# Exact-rational EWMA weights for alpha = 1/4 over the last 8 demand
# occurrences: w_j = 3^j * 4^(7-j) (unnormalized, common denominator 4^8);
# most recent occurrence first. All integers, so the weighted sums are
# exact BIGINT and both engines agree bit-for-bit.
_CROSTON_W = [16384, 12288, 9216, 6912, 5184, 3888, 2916, 2187]
_CROSTON_WSUM = sum(_CROSTON_W)  # 58975


def _croston_sql(d) -> str:
    """Croston's intermittent-demand forecast per part: the classic
    decomposition into demand SIZE (EWMA over nonzero-demand days) and
    inter-demand INTERVAL (EWMA over the gaps between those days), with
    forecast rate = size / interval. The two EWMAs use exact-rational
    truncated weights (alpha=1/4, last 8 occurrences, w_j = 3^j*4^(7-j)
    over the common denominator 4^8) so every smoothed value is an exact
    integer ratio — emitted in ppm via staged idiv — and the one double
    (the rate) is a single IEEE division of two exact BIGINTs. Parts
    need >= 9 demand days so all 8 recent occurrences carry a defined
    gap (the truncation boundary, documented)."""
    if d.name == "spark":
        daynum = "CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)"
    else:
        daynum = (
            "CAST(date_diff('day', DATE '1992-01-01',"
            " CAST(o_orderdate AS DATE)) AS BIGINT)"
        )
    w = "CASE rn " + " ".join(
        f"WHEN {j + 1} THEN {wj}" for j, wj in enumerate(_CROSTON_W)
    ) + " END"
    return f"""
WITH demand AS (
  SELECT l_partkey AS pk, {daynum} AS day,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_partkey, {daynum}
),
seq AS (
  SELECT pk, day, qty,
         day - LAG(day) OVER (PARTITION BY pk ORDER BY day) AS gap,
         ROW_NUMBER() OVER (PARTITION BY pk ORDER BY day DESC) AS rn,
         COUNT(*) OVER (PARTITION BY pk) AS n_days
  FROM demand
),
recent AS (
  SELECT pk, qty, gap, rn, n_days FROM seq WHERE rn <= 8 AND n_days >= 9
),
agg AS (
  SELECT pk,
         CAST(MAX(n_days) AS BIGINT) AS n_demand_days,
         CAST(SUM(({w}) * qty) AS BIGINT) AS z_num,
         CAST(SUM(({w}) * gap) AS BIGINT) AS p_num
  FROM recent GROUP BY pk
)
SELECT pk AS partkey,
       n_demand_days,
       CAST({d.idiv('(z_num * 1000000)', str(_CROSTON_WSUM))} AS BIGINT)
         AS size_ewma_ppm,
       CAST({d.idiv('(p_num * 1000000)', str(_CROSTON_WSUM))} AS BIGINT)
         AS interval_ewma_ppm,
       CAST(z_num AS DOUBLE) / CAST(p_num AS DOUBLE) AS croston_rate
FROM agg
ORDER BY pk
"""


def _register_croston():
    from ..functions.detsql import DUCK, SPARK
    from ..registry import sql_query

    sql_query(
        "q_croston",
        spark_sql=_croston_sql(SPARK),
        duck_sql=_croston_sql(DUCK),
        tables=["lineitem", "orders"],
        doc="Croston's intermittent-demand forecast per part (size EWMA / "
        "interval EWMA over the nonzero-demand days) — the demand-planning "
        "answer for sparse series where q_holt's level+trend smoothing is "
        "wrong (zeros are structure, not signal). Both EWMAs use exact-"
        "rational truncated weights (alpha=1/4, last 8 occurrences, "
        "3^j*4^(7-j)/4^8), so smoothed values are exact integer ratios in "
        "ppm and only the final rate is one IEEE division. Corpus-scale "
        "plan: the orderkey-partitioned lineitem-orders join, one "
        "(part, day) aggregate, per-part windows (PARTITIONED — no global "
        "sort), and a per-part 8-row weighted sum. Scales with parts, not "
        "days.",
    )


_register_croston()


# ---------------------------------------------------------------------------
# Classical seasonal indices — the multiplicative dow/hour profile.
# ---------------------------------------------------------------------------


def _seasonal_index_sql(d) -> str:
    """Classical multiplicative seasonal indices for the event stream on
    two grains: day-of-week and hour-of-day. Index = grain mean rate /
    overall mean rate, computed as exact count ratios cleared of their
    denominators — index_ppm = (n_g * n_slots * 1e6) idiv (n_total *
    slots_g) where slots_g counts how many calendar slots of that grain
    exist in the observation window (so a month that contains five
    Mondays doesn't inflate Monday). The deseasonalization lookup
    q_seasonal_anomaly consumes implicitly, emitted as the explicit
    profile table. BOTH grains are calendar-slot-corrected: dow
    denominators count whole calendar days of that weekday in [d0, d1],
    and hour-of-day denominators count whole clock hours of that
    hour-of-day in [h0, h1] (the window's hour-index bounds) — so a
    window that is not a whole number of days doesn't bias the hours it
    covers an extra time."""
    us = d.epoch_us("ts")
    day = d.idiv(f"({us})", "86400000000")
    dow = f"(({day}) % 7)"
    hidx = d.idiv(f"({us})", "3600000000")
    return f"""
WITH ev AS (
  SELECT CAST({dow} AS BIGINT) AS dow,
         CAST({hidx} AS BIGINT) AS hidx,
         CAST({day} AS BIGINT) AS day
  FROM events
),
bounds AS (
  SELECT CAST(MIN(day) AS BIGINT) AS d0, CAST(MAX(day) AS BIGINT) AS d1,
         CAST(MIN(hidx) AS BIGINT) AS h0, CAST(MAX(hidx) AS BIGINT) AS h1,
         CAST(COUNT(*) AS BIGINT) AS n_total
  FROM ev
),
dow_counts AS (
  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY dow
),
dow_slots AS (
  -- number of calendar days of each dow inside [d0, d1]
  SELECT dow, n,
         CAST({d.idiv('(b.d1 - b.d0 + 7 - ((dow - b.d0 % 7 + 7) % 7))', '7')}
              AS BIGINT) AS slots,
         b.n_total, b.d1 - b.d0 + 1 AS n_days
  FROM dow_counts CROSS JOIN bounds b
),
hod_counts AS (
  SELECT CAST(hidx % 24 AS BIGINT) AS hod,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ev GROUP BY hidx % 24
),
hod_slots AS (
  -- number of whole clock hours of each hour-of-day inside [h0, h1]
  -- (same counting identity as dow_slots with period 24 over hour
  -- indices — correct even when the window is not a whole number of
  -- days)
  SELECT hod, n,
         CAST({d.idiv('(b.h1 - b.h0 + 24 - ((hod - b.h0 % 24 + 24) % 24))',
                      '24')} AS BIGINT) AS slots,
         b.n_total, b.h1 - b.h0 + 1 AS n_hours
  FROM hod_counts CROSS JOIN bounds b
)
SELECT 'dow' AS grain, dow AS slot, n,
       CAST({d.idiv('(n * n_days * 1000000)', '(n_total * slots)')} AS BIGINT)
         AS index_ppm
FROM dow_slots
UNION ALL
SELECT 'hour' AS grain, hod AS slot, n,
       CAST({d.idiv('(n * n_hours * 1000000)', '(n_total * slots)')} AS BIGINT)
         AS index_ppm
FROM hod_slots
ORDER BY grain, slot
"""


def _register_seasonal_index():
    from ..functions.detsql import DUCK, SPARK
    from ..registry import sql_query

    sql_query(
        "q_seasonal_index",
        spark_sql=_seasonal_index_sql(SPARK),
        duck_sql=_seasonal_index_sql(DUCK),
        tables=["events"],
        doc="Classical multiplicative seasonal indices (dow + hour-of-day "
        "profile of event rates): index = grain rate / overall rate as "
        "exact cleared count ratios in ppm, with BOTH grains' "
        "denominators counting actual calendar slots in the window "
        "(five-Monday months don't inflate Monday; a window that isn't "
        "a whole number of days doesn't inflate the hours it covers an "
        "extra time) — the explicit profile table "
        "behind q_seasonal_anomaly's implicit baseline and the seasonal "
        "half of classical decomposition (q_stl_decompose's moving-"
        "average form being the other). Two bounded-key aggregates and "
        "a 1-row bounds broadcast.",
    )


_register_seasonal_index()
