"""ML feature engineering — the fare/demand feature-table shapes
(reference ml_feature_engineering.py, SURVEY §7.1.5).

Covers the reference's hardest join topology: dimension self-join ×2 (J7 —
taxi_zones aliased as pickup_zone/dropoff_zone, ml_feature_engineering.py:
475-476), route-history aggregate join on the OD pair (J8, :478-479),
2-key join to hourly/daily stats (J9, :480-481), synthetic string key
(:348), flat-earth distance (:440-441), categorical CASE encodings
(:375-397), and recency predicates (P8).
"""

from __future__ import annotations

from ..functions.detsql import DUCK, SPARK, Dialect, davg, disc_price, dsum, dsum_dec
from ..registry import sql_query


def _route_features_sql(d: Dialect) -> str:
    return f"""
WITH routes AS (
  SELECT
    l.l_orderkey,
    l.l_linenumber,
    CAST(CAST(o.o_orderdate AS DATE) AS STRING) AS order_date,
    {d.dow('o.o_orderdate')} AS order_dow,
    c.c_nationkey AS pickup_nation,
    s.s_nationkey AS dropoff_nation,
    l.l_extendedprice,
    l.l_discount,
    c.c_acctbal,
    s.s_acctbal
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE l.l_shipdate >= (SELECT MAX(l_shipdate) FROM lineitem) - INTERVAL 30 DAY
),
route_history AS (
  SELECT pickup_nation, dropoff_nation,
         COUNT(*) AS route_trips,
         {davg('l_extendedprice')} AS avg_route_price
  FROM routes
  GROUP BY pickup_nation, dropoff_nation
),
daily_pickup AS (
  SELECT pickup_nation, order_date, COUNT(*) AS daily_pickups
  FROM routes
  GROUP BY pickup_nation, order_date
)
SELECT
  CAST(r.l_orderkey AS STRING) || '_' || CAST(r.l_linenumber AS STRING) AS trip_key,
  r.order_date,
  pz.n_name AS pickup_zone,
  dz.n_name AS dropoff_zone,
  CASE pz.n_regionkey
    WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 3 WHEN 3 THEN 4 ELSE 5
  END AS pickup_region_code,
  r.l_extendedprice AS price,
  CAST({disc_price('r.l_extendedprice', 'r.l_discount')} AS DOUBLE)
    AS discounted_price,
  SQRT((r.c_acctbal - r.s_acctbal) * (r.c_acctbal - r.s_acctbal)
       + (r.c_acctbal * 0.5 - r.s_acctbal * 0.5)
         * (r.c_acctbal * 0.5 - r.s_acctbal * 0.5)) * 111.0 AS pseudo_distance_km,
  CASE WHEN r.order_dow IN (1, 7) THEN true ELSE false END AS is_weekend,
  CASE WHEN r.pickup_nation != r.dropoff_nation THEN true ELSE false END
    AS is_cross_zone,
  rh.route_trips,
  rh.avg_route_price,
  COALESCE(dp.daily_pickups, 0) AS daily_pickups
FROM routes r
JOIN nation pz ON r.pickup_nation = pz.n_nationkey
JOIN nation dz ON r.dropoff_nation = dz.n_nationkey
LEFT JOIN route_history rh
  ON r.pickup_nation = rh.pickup_nation AND r.dropoff_nation = rh.dropoff_nation
LEFT JOIN daily_pickup dp
  ON r.pickup_nation = dp.pickup_nation AND r.order_date = dp.order_date
"""


sql_query(
    "q_route_features",
    spark_sql=_route_features_sql(SPARK),
    duck_sql=_route_features_sql(DUCK),
    tables=["lineitem", "orders", "customer", "supplier", "nation"],
    doc="fare_prediction_features analog (ml_feature_engineering.py:345-496): "
    "dimension self-join ×2 (J7: nation aliased pickup/dropoff — both "
    "broadcast), route-history aggregate join on the OD pair (J8), 2-key "
    "daily-stats join (J9), synthetic `||` string key (:348), flat-earth "
    "SQRT distance written as x*x (POW is not cross-libm-deterministic), "
    "weekend/cross-zone flags, 30-day recency predicate (P8) that Catalyst "
    "pushes into every branch of the 4-way join.",
)
