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

from ..functions.detsql import (
    DUCK,
    SPARK,
    Dialect,
    davg,
    dcorr,
    disc_price,
    dregr_intercept,
    dregr_slope,
    dstddev,
    dsum,
    dsum_dec,
    dxsum,
    dxsum2,
)
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


# ---------------------------------------------------------------------------
# Feature statistics + correlation reports (reference
# ml_feature_engineering.py:499-538 generate_feature_statistics). Both are
# scalar aggregates over the recent-window slice; STDDEV (A5) and CORR (A6)
# are computed from exact decimal moment sums so the doubles hash-match the
# oracle under any shuffle order (see functions/detsql.py dstddev/dcorr).
# One aggregation pass each: at 100 TB this is a map-side partial agg + a
# single-row reduce — no shuffle of the fact table.
# ---------------------------------------------------------------------------

_FEATURE_STATS_SQL = f"""
WITH recent AS (
  SELECT l_quantity, l_extendedprice, l_orderkey, l_shipdate
  FROM lineitem
  WHERE l_shipdate >= (SELECT MAX(l_shipdate) FROM lineitem) - INTERVAL 90 DAY
),
sums AS (
  SELECT
    COUNT(*) AS n,
    COUNT(DISTINCT l_orderkey) AS unique_orders,
    {dsum('l_extendedprice')} AS sx,
    {dxsum('l_extendedprice', 'l_extendedprice')} AS sxx,
    {dsum('l_quantity')} AS sy,
    {dxsum('l_quantity', 'l_quantity')} AS syy,
    CAST(MIN(CAST(l_shipdate AS DATE)) AS STRING) AS earliest_ship,
    CAST(MAX(CAST(l_shipdate AS DATE)) AS STRING) AS latest_ship
  FROM recent
)
SELECT
  n AS total_trips,
  unique_orders,
  sx / CAST(n AS DOUBLE) AS avg_price,
  {dstddev('n', 'sx', 'sxx')} AS stddev_price,
  sy / CAST(n AS DOUBLE) AS avg_quantity,
  {dstddev('n', 'sy', 'syy')} AS stddev_quantity,
  earliest_ship,
  latest_ship
FROM sums
"""

sql_query(
    "q_feature_stats",
    spark_sql=_FEATURE_STATS_SQL,
    duck_sql=_FEATURE_STATS_SQL,
    tables=["lineitem"],
    doc="Feature-statistics report (A5 plain STDDEV + A13 scalar agg; "
    "reference ml_feature_engineering.py:503-527): COUNT, COUNT DISTINCT, "
    "AVG, STDDEV, MIN/MAX over the 90-day recent slice (P8). STDDEV_SAMP "
    "from exact decimal moment sums — sqrt((nΣx²−(Σx)²)/(n(n−1))) evaluated "
    "as an identical IEEE expression in both engines.",
)


_FEATURE_CORR_SQL = f"""
WITH recent AS (
  SELECT l_quantity, l_extendedprice, l_discount
  FROM lineitem
  WHERE l_shipdate >= (SELECT MAX(l_shipdate) FROM lineitem) - INTERVAL 90 DAY
    AND l_discount IS NOT NULL
),
sums AS (
  SELECT
    COUNT(*) AS n,
    {dsum('l_extendedprice')} AS sp,
    {dxsum('l_extendedprice', 'l_extendedprice')} AS spp,
    {dsum('l_quantity')} AS sq,
    {dxsum('l_quantity', 'l_quantity')} AS sqq,
    {dsum('l_discount')} AS sd,
    {dxsum('l_discount', 'l_discount', p2=4)} AS sdd,
    {dxsum('l_extendedprice', 'l_quantity')} AS spq,
    {dxsum('l_extendedprice', 'l_discount', p2=4)} AS spd,
    {dxsum('l_quantity', 'l_discount', p2=4)} AS sqd
  FROM recent
)
SELECT
  n AS total_rows,
  {dcorr('n', 'sp', 'sq', 'spq', 'spp', 'sqq')} AS price_quantity_corr,
  {dcorr('n', 'sp', 'sd', 'spd', 'spp', 'sdd')} AS price_discount_corr,
  {dcorr('n', 'sq', 'sd', 'sqd', 'sqq', 'sdd')} AS quantity_discount_corr
FROM sums
"""

sql_query(
    "q_feature_correlation",
    spark_sql=_FEATURE_CORR_SQL,
    duck_sql=_FEATURE_CORR_SQL,
    tables=["lineitem"],
    doc="Feature-correlation analysis (A6 CORR ×3; reference "
    "ml_feature_engineering.py:529-538): three Pearson correlations in one "
    "scalar aggregate over the recent NOT-NULL slice. Each CORR is "
    "(nΣxy−ΣxΣy)/(√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²)) over exact decimal moment "
    "sums — matches CORR()/corr() semantics (sample) while staying "
    "deterministic under shuffle; all ten moments come from ONE partial-agg "
    "pass over the fact table (no per-CORR scans).",
)


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


_REGRESSION_SQL = f"""
WITH sums AS (
  SELECT
    l_returnflag,
    l_linestatus,
    CAST(month(l_shipdate) AS INT) AS ship_month,
    COUNT(*) AS n,
    {dsum('l_quantity')} AS sx,
    {dsum('l_extendedprice')} AS sy,
    {dxsum2('l_quantity', 'l_extendedprice')} AS sxy,
    {dxsum2('l_quantity', 'l_quantity')} AS sxx,
    {dxsum2('l_extendedprice', 'l_extendedprice')} AS syy
  FROM lineitem
  GROUP BY l_returnflag, l_linestatus, CAST(month(l_shipdate) AS INT)
)
SELECT
  l_returnflag,
  l_linestatus,
  ship_month,
  n AS n_rows,
  {dregr_slope('n', 'sx', 'sy', 'sxy', 'sxx')} AS price_per_unit_slope,
  {dregr_intercept('n', 'sx', 'sy', 'sxy', 'sxx')} AS price_intercept,
  {dcorr('n', 'sx', 'sy', 'sxy', 'sxx', 'syy')} AS price_quantity_corr
FROM sums
WHERE n >= 2
"""

sql_query(
    "q_regression",
    spark_sql=_REGRESSION_SQL,
    duck_sql=_REGRESSION_SQL,
    tables=["lineitem"],
    doc="Per-group OLS regression (REGR_SLOPE/REGR_INTERCEPT/CORR "
    "semantics; extends the reference's correlation analysis, "
    "ml_feature_engineering.py:529-538, to the fitted model): price-vs-"
    "quantity slope, intercept and r per (returnflag, linestatus, "
    "ship-month) group. All five moment sums come from ONE partial-agg "
    "pass (map-side combine, one shuffle on the group key); slope/"
    "intercept/corr are identical IEEE expression trees over exact "
    "decimal sums, so the result is deterministic under any shuffle "
    "order — native REGR_* aggregates on raw doubles would flake the "
    "cross-engine hash gate.",
)


# ---------------------------------------------------------------------------
# ALS half-step — closed-form rank-2 user-factor solve (matrix factorization).
# ---------------------------------------------------------------------------


def _als_sql(d) -> str:
    """One alternating-least-squares HALF-STEP at rank 2: item factors are
    a fixed deterministic embedding v(part) = (1, part%7 − 3); each user's
    factor solves the 2×2 ridge normal equation (A + λI)u = b EXACTLY by
    the adjugate formula — A's entries and b are integer sums (ratings =
    integral l_quantity, item components are small ints), det is an
    integer, and each factor is ONE exact int/int double division. The
    per-user solve is embarrassingly parallel: this is why ALS scales
    where gradient methods need synchronized state."""
    lam = 1
    return f"""
WITH r AS (
  SELECT o.o_custkey AS u, l.l_partkey AS i,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS rating
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_custkey, l.l_partkey
),
v AS (
  SELECT u, rating,
         CAST(1 AS BIGINT) AS v1,
         CAST((i % 7) - 3 AS BIGINT) AS v2
  FROM r
),
norm AS (
  SELECT u,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(v1 * v1) + {lam} AS BIGINT) AS a11,
         CAST(SUM(v1 * v2) AS BIGINT) AS a12,
         CAST(SUM(v2 * v2) + {lam} AS BIGINT) AS a22,
         CAST(SUM(rating * v1) AS BIGINT) AS b1,
         CAST(SUM(rating * v2) AS BIGINT) AS b2
  FROM v GROUP BY u
)
SELECT u AS custkey, n_items,
       CAST(CAST(a22 * b1 - a12 * b2 AS DOUBLE)
            / (a11 * a22 - a12 * a12) AS DOUBLE) AS u1,
       CAST(CAST(a11 * b2 - a12 * b1 AS DOUBLE)
            / (a11 * a22 - a12 * a12) AS DOUBLE) AS u2
FROM norm
"""


def _register_als():
    from ..functions.detsql import DUCK, SPARK
    from ..registry import sql_query

    sql_query(
        "q_als_user_step",
        spark_sql=_als_sql(SPARK),
        duck_sql=_als_sql(DUCK),
        tables=["orders", "lineitem"],
        doc="Matrix-factorization training at scale: one ALS half-step "
        "solving every user's rank-2 ridge normal equation in closed "
        "form (adjugate over an integer 2×2 — det and all moments are "
        "exact integer sums, each factor one exact int/int division; "
        "λ=1 guarantees positive-definiteness so det > 0 always). Item "
        "factors are a fixed deterministic embedding, making the step "
        "oracle-checkable; the real loop alternates sides with the same "
        "per-key algebra. Plan: one fact join + two keyed aggregations, "
        "all map-side combinable — per-user solves are embarrassingly "
        "parallel, the property that makes ALS the distributed MF "
        "algorithm of choice.",
    )


_register_als()


# ---------------------------------------------------------------------------
# Out-of-fold target encoding — leakage-safe categorical encoding.
# ---------------------------------------------------------------------------


def _target_enc_sql(d) -> str:
    """Target-encode customer nation by mean order value WITHOUT leakage:
    each row's encoding is computed from the OTHER folds only (out-of-fold
    mean = (nation_total − fold_total) / (nation_n − fold_n)) with the
    fold assignment a stable multiplicative hash of the customer key.
    Totals are exact decimal cents, the OOF mean one exact int/int double
    division, and the smoothing fallback (folds that exhaust a nation's
    rows) is the global mean — all algebra shuffle-order-independent."""
    fold = "CAST((o_custkey * 2654435761 + 104729) % 5 AS INT)"
    return f"""
WITH fact AS (
  SELECT c.c_nationkey AS nat, {fold} AS fold,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
per_fold AS (
  SELECT nat, fold,
         CAST(COUNT(*) AS BIGINT) AS n_f,
         CAST(SUM(cents) AS BIGINT) AS s_f
  FROM fact GROUP BY nat, fold
),
per_nat AS (
  SELECT nat, CAST(SUM(n_f) AS BIGINT) AS n_t, CAST(SUM(s_f) AS BIGINT) AS s_t
  FROM per_fold GROUP BY nat
),
gstats AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n_g, CAST(SUM(s_t) AS BIGINT) AS s_g FROM per_nat)
SELECT f.nat AS nationkey, f.fold, f.n_f AS fold_rows,
       CAST(n.n_t - f.n_f AS BIGINT) AS oof_rows,
       CAST(CASE WHEN n.n_t - f.n_f > 0
            THEN CAST(n.s_t - f.s_f AS DOUBLE) / (n.n_t - f.n_f)
            ELSE CAST(g.s_g AS DOUBLE) / g.n_g END AS DOUBLE) AS oof_mean_cents
FROM per_fold f
JOIN per_nat n ON f.nat = n.nat
CROSS JOIN gstats g
"""


def _register_target_enc():
    from ..functions.detsql import DUCK, SPARK
    from ..registry import sql_query

    sql_query(
        "q_target_encoding",
        spark_sql=_target_enc_sql(SPARK),
        duck_sql=_target_enc_sql(DUCK),
        tables=["orders", "customer"],
        doc="Leakage-safe target encoding: per (nation, fold), the mean "
        "order value computed from the OTHER four folds only — "
        "OOF mean = (Σnation − Σfold)/(n − n_fold), so a model trained on "
        "fold k never sees its own rows' targets in the feature (the "
        "encoding-leakage failure mode this construction exists to "
        "prevent; global-mean fallback for exhausted cells). ONE pass "
        "builds per-(nation, fold) partials; nation totals and the "
        "global scalar derive from them — no second scan, all exact "
        "integer cents until one final double division. At 100 TB the "
        "encoding table stays |categories|×|folds| rows — broadcast "
        "material for the training join.",
    )


_register_target_enc()
