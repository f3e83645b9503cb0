"""Serving queries — the reference's FastAPI DatabaseService re-pointed at
the lake (SURVEY §2.1 S6, §3.3 honorable-4th entry point, serving/database.py).

Postgres-isms translated per SURVEY §2.8: EXTRACT(dow) → dayofweek (offset
handled in the dialect layer), generate_series → sequence/explode,
NOW() → max-data-timestamp (reference queries are wall-clock-relative, which
is non-reproducible; the engine pins 'now' to the data's max timestamp so
results are deterministic), RANDOM() → a deterministic integer-arithmetic
pseudo-random (seeded rand() still differs across engines).
"""

from __future__ import annotations

from ..functions.detsql import dround, DUCK, SPARK, Dialect, davg, dsum
from ..registry import sql_query


def _recent_orders_sql(d: Dialect) -> str:
    """serving/database.py:28-48 get_recent_trips: window filter + join dim
    with COALESCE fallback + ORDER BY ... LIMIT (O5/O6, J11)."""
    return f"""
SELECT
  o.o_orderkey AS order_id,
  CAST(CAST(o.o_orderdate AS DATE) AS STRING) AS order_date,
  o.o_totalprice AS total_amount,
  o.o_orderstatus AS status,
  o.o_orderpriority AS priority,
  COALESCE(n.n_name, 'Unknown') AS nation_name
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= (SELECT MAX(o_orderdate) FROM orders) - INTERVAL 7 DAY
ORDER BY o.o_orderdate DESC, o.o_orderkey
LIMIT 1000
"""


sql_query(
    "q_recent_orders",
    spark_sql=_recent_orders_sql(SPARK),
    duck_sql=_recent_orders_sql(DUCK),
    tables=["orders", "customer", "nation"],
    doc="get_recent_trips analog (serving/database.py:28-48): data-relative "
    "recency filter (scalar subquery replaces wall-clock NOW()), broadcast "
    "dim joins with COALESCE fallback names (J11), ORDER BY DESC LIMIT 1000 "
    "(O5) → Spark TakeOrderedAndProject, no global sort materialized.",
)


def _zone_metrics_sql(d: Dialect) -> str:
    """serving/database.py:51-76 get_zone_metrics: per-zone aggregates with
    conditional peak-hour count (A10) and NULLIF div-by-zero guard."""
    return f"""
SELECT
  n.n_nationkey AS nation_key,
  COALESCE(n.n_name, 'Unknown') AS nation_name,
  COUNT(*) AS order_count,
  {dsum('o.o_totalprice')} AS total_revenue,
  {davg('o.o_totalprice')} AS avg_order_value,
  COUNT(CASE WHEN CAST(month(o.o_orderdate) AS INT) BETWEEN 6 AND 8 THEN 1 END)
    AS summer_orders,
  CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
    AS finished_orders,
  {dround("CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE) * 100 / NULLIF(COUNT(*), 0)")} AS finished_pct
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_nationkey, COALESCE(n.n_name, 'Unknown')
"""


sql_query(
    "q_zone_metrics",
    spark_sql=_zone_metrics_sql(SPARK),
    duck_sql=_zone_metrics_sql(DUCK),
    tables=["orders", "customer", "nation"],
    doc="get_zone_metrics analog (serving/database.py:51-76): conditional "
    "COUNT(CASE ...) peak-period counting (A10), SUM(CASE...) flag counting "
    "(A11), NULLIF div-by-zero guard + ROUND (§2.8).",
)


def _hourly_timeseries_sql(d: Dialect) -> str:
    """serving/database.py:79-97 hourly time series over computed hour/dow."""
    return f"""
SELECT
  CAST(hour(ts) AS INT) AS hour_of_day,
  {d.dow('ts')} AS day_of_week,
  CASE WHEN {d.dow('ts')} IN (1, 7) THEN true ELSE false END AS is_weekend,
  COUNT(*) AS event_count,
  {davg('value')} AS avg_value,
  {dround(davg('value'))} AS avg_value_rounded
FROM events
GROUP BY CAST(hour(ts) AS INT), {d.dow('ts')}
"""


sql_query(
    "q_hourly_timeseries",
    spark_sql=_hourly_timeseries_sql(SPARK),
    duck_sql=_hourly_timeseries_sql(DUCK),
    tables=["events"],
    doc="get_hourly_stats analog (serving/database.py:79-97): GROUP BY on "
    "EXTRACT(hour/dow) expressions (A12) with the PG-dow→Spark-dayofweek "
    "offset handled in the dialect layer (SURVEY §2.8 trap), weekend flag "
    "IN (1,7) per comprehensive_analytics.py:366.",
)


def _weather_impact_sql(d: Dialect) -> str:
    """serving/database.py:100-147 weather impact: CASE-ladder encode +
    conditional aggregates + LEAST clamp."""
    return f"""
SELECT
  event_type,
  CASE event_type
    WHEN 'click' THEN 1 WHEN 'view' THEN 2 WHEN 'purchase' THEN 3
    WHEN 'signup' THEN 4 ELSE 5
  END AS type_code,
  COUNT(*) AS event_count,
  {davg('value')} AS avg_value,
  {davg('CASE WHEN value > 0 THEN value ELSE 0 END')} AS avg_nonneg_value,
  LEAST({dround(davg('value'), 1)}, 100.0) AS capped_avg,
  CASE
    WHEN {davg('value')} > 100 THEN CAST(1.2 AS DOUBLE)
    WHEN {davg('value')} > 30 THEN CAST(1.1 AS DOUBLE)
    ELSE CAST(1.0 AS DOUBLE)
  END AS impact_score
FROM events
GROUP BY event_type
"""


sql_query(
    "q_type_impact",
    spark_sql=_weather_impact_sql(SPARK),
    duck_sql=_weather_impact_sql(DUCK),
    tables=["events"],
    doc="get_weather_impact analog (serving/database.py:100-147): categorical "
    "CASE-ladder encoding (ml_feature_engineering.py:179-186), conditional "
    "AVG (A3), LEAST clamping (serving/database.py:143-147).",
)


def _demand_prediction_sql(d: Dialect) -> str:
    """serving/database.py:150-200 predict_demand: generate_series of future
    hours × a deterministic pseudo-random heuristic. RANDOM() replaced with
    integer-arithmetic hash so both engines agree (SURVEY §7.3)."""
    series = (
        "SELECT explode(sequence(1, 24)) AS h"
        if d.name == "spark"
        else "SELECT CAST(unnest(generate_series(1, 24)) AS INT) AS h"
    )
    return f"""
WITH future_hours AS ({series}),
base AS (
  SELECT event_type, COUNT(*) AS hist_count
  FROM events
  GROUP BY event_type
)
SELECT
  b.event_type,
  f.h AS hours_ahead,
  CAST((b.hist_count % 97) * 31 + f.h * 17 AS BIGINT) % 100 AS noise,
  LEAST(
    {dround("CAST(b.hist_count AS DOUBLE) / 720 * (1.0 + (CAST((b.hist_count % 97) * 31 + f.h * 17 AS BIGINT) % 100 - 50) / 200.0)")},
    10000.0) AS predicted_demand,
  CASE WHEN f.h BETWEEN 17 AND 19 THEN true ELSE false END AS is_peak
FROM base b
CROSS JOIN future_hours f
"""


sql_query(
    "q_demand_prediction",
    spark_sql=_demand_prediction_sql(SPARK),
    duck_sql=_demand_prediction_sql(DUCK),
    tables=["events"],
    doc="predict_demand analog (serving/database.py:150-200): "
    "generate_series(1,{hours}) → sequence()+explode in Spark (SURVEY §2.8), "
    "deterministic integer-hash noise replacing RANDOM(), LEAST clamp, "
    "rush-hour CASE (A10 shape).",
)


def _activity_sql(d: Dialect) -> str:
    """realtime_cdc_processor.py:206-227 weighted zone-activity score,
    batch form over the trailing hour of data."""
    return f"""
SELECT
  user_id,
  COUNT(*) AS event_count,
  {dsum('value')} AS total_value,
  COUNT(DISTINCT event_type) AS distinct_types,
  CAST(COUNT(*) AS DOUBLE) * 0.5
    + {dsum('value')} * 0.3
    + CAST(COUNT(DISTINCT event_type) AS DOUBLE) * 0.2 AS activity_score
FROM events
WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 1 HOUR
GROUP BY user_id
"""


sql_query(
    "q_realtime_activity",
    spark_sql=_activity_sql(SPARK),
    duck_sql=_activity_sql(DUCK),
    tables=["events"],
    doc="Weighted activity score (realtime_cdc_processor.py:213-216) over the "
    "trailing hour (data-relative). The streaming form is the stateless "
    "map-only chain in streaming/; this is the serving-side batch twin.",
)


def _dashboard_sql(d: Dialect) -> str:
    """serving/database.py:203-266 dashboard stats: scalar global aggregate."""
    return f"""
SELECT
  COUNT(*) AS total_orders,
  COUNT(DISTINCT o_custkey) AS unique_customers,
  {dsum('o_totalprice')} AS total_revenue,
  {davg('o_totalprice')} AS avg_order_value,
  MIN(CAST(CAST(o_orderdate AS DATE) AS STRING)) AS first_order_date,
  MAX(CAST(CAST(o_orderdate AS DATE) AS STRING)) AS last_order_date,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS BIGINT) AS urgent_orders
FROM orders
"""


sql_query(
    "q_dashboard_stats",
    spark_sql=_dashboard_sql(SPARK),
    duck_sql=_dashboard_sql(DUCK),
    tables=["orders"],
    doc="get_dashboard_stats analog (serving/database.py:203-266): scalar "
    "global aggregate, no GROUP BY (A13), MIN/MAX freshness (A9), flag "
    "counting (A11).",
)


def _peak_hour_sql(d: Dialect) -> str:
    return f"""
SELECT
  CAST(hour(ts) AS INT) AS hour_of_day,
  COUNT(*) AS event_count
FROM events
GROUP BY CAST(hour(ts) AS INT)
ORDER BY event_count DESC, hour_of_day
LIMIT 1
"""


sql_query(
    "q_peak_hour",
    spark_sql=_peak_hour_sql(SPARK),
    duck_sql=_peak_hour_sql(DUCK),
    tables=["events"],
    doc="Peak-hour top-1 (serving/database.py:257-266, O3): ORDER BY count "
    "DESC LIMIT 1 with hour tiebreaker so the answer is unique.",
)


def _top_zones_sql(d: Dialect) -> str:
    return f"""
SELECT
  n.n_name AS nation_name,
  COUNT(*) AS order_count,
  {dsum('o.o_totalprice')} AS total_revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY total_revenue DESC, n.n_name
LIMIT 5
"""


sql_query(
    "q_top_zones",
    spark_sql=_top_zones_sql(SPARK),
    duck_sql=_top_zones_sql(DUCK),
    tables=["orders", "customer", "nation"],
    doc="Top-5 zones by revenue (serving/database.py:272-284, O4): "
    "TakeOrderedAndProject over the aggregate — the LIMIT is pushed into the "
    "shuffle reader, no global sort of all groups.",
)
