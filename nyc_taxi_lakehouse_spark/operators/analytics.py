"""Analytics marts — the operator-dense core (SURVEY §2.3–2.4, §3.2).

Re-expresses the reference's three mart builders (comprehensive_analytics.py)
on the testdata star schema: multi-CTE pipelines with left joins on composite
keys, conditional aggregates, COALESCE defaulting, CASE-ladder scoring,
multi-level re-aggregation, and null-rejecting WHERE after LEFT JOIN
(Catalyst's outer→inner conversion).

Mapping (FIXTURES.md §7): `nation` = taxi_zones dim, `orders`/`lineitem` =
trips fact, hourly aggregates of `events` = hourly_weather.

Every query is a dialect template rendered for both Spark SQL and DuckDB so
the oracle stays textually in lockstep with the implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.detsql import DUCK, SPARK, Dialect, davg, dec2, disc_price, dsum, dsum_dec
from ..registry import df_query, sql_query
from ..sources.tables import load_tables


def _hourly_events_sql(d: Dialect) -> str:
    """A1/A2/A8-batch/A12: hash aggregation keyed on a computed hour column."""
    return f"""
SELECT
  {d.epoch_hour('ts')} AS hour_ts,
  event_type,
  COUNT(*) AS event_count,
  COUNT(DISTINCT user_id) AS unique_users,
  {dsum('value')} AS total_value,
  {davg('value')} AS avg_value,
  MAX(value) AS max_value,
  MIN(value) AS min_value
FROM events
GROUP BY {d.epoch_hour('ts')}, event_type
"""


sql_query(
    "q_hourly_events",
    spark_sql=_hourly_events_sql(SPARK),
    duck_sql=_hourly_events_sql(DUCK),
    tables=["events"],
    doc="Hourly event aggregation — reference A1/A12 (groupBy on computed "
    "date_trunc column, comprehensive_analytics.py:182-200) with exact "
    "COUNT DISTINCT (A2) and MIN/MAX freshness stats (A9). Shuffles once "
    "on (hour, type); partials combined map-side.",
)


def _correlation_sql(d: Dialect) -> str:
    """J1 + A3 + COALESCE + CASE ladder: the trip_weather_correlation shape
    (comprehensive_analytics.py:141-213). 'Demand' = click/view traffic per
    hour; 'weather' = hourly value profile of purchase events; LEFT JOIN on
    the composite (hour) key with COALESCE('unknown') for missing hours."""
    return f"""
WITH demand AS (
  SELECT {d.epoch_hour('ts')} AS hour_ts,
         COUNT(*) AS demand_count,
         COUNT(DISTINCT user_id) AS unique_users,
         {dsum('value')} AS demand_value
  FROM events
  WHERE event_type IN ('click', 'view')
  GROUP BY {d.epoch_hour('ts')}
),
conditions AS (
  SELECT {d.epoch_hour('ts')} AS hour_ts,
         {davg('value')} AS avg_purchase_value,
         COUNT(*) AS purchase_count,
         {d.sorted_set_csv('event_type')} AS observed_types
  FROM events
  WHERE event_type IN ('purchase', 'signup')
  GROUP BY {d.epoch_hour('ts')}
)
SELECT
  dm.hour_ts,
  dm.demand_count,
  dm.unique_users,
  dm.demand_value,
  COALESCE(cn.purchase_count, 0) AS purchase_count,
  COALESCE(cn.avg_purchase_value, 0.0) AS avg_purchase_value,
  COALESCE(cn.observed_types, 'unknown') AS observed_types,
  CASE
    WHEN COALESCE(cn.avg_purchase_value, 0.0) > 150 THEN CAST(1.2 AS DOUBLE)
    WHEN COALESCE(cn.avg_purchase_value, 0.0) > 50 THEN CAST(1.1 AS DOUBLE)
    ELSE CAST(1.0 AS DOUBLE)
  END AS demand_impact_score
FROM demand dm
LEFT JOIN conditions cn ON dm.hour_ts = cn.hour_ts
"""


sql_query(
    "q_event_correlation",
    spark_sql=_correlation_sql(SPARK),
    duck_sql=_correlation_sql(DUCK),
    tables=["events"],
    doc="trip_weather_correlation analog (comprehensive_analytics.py:141-213):"
    " two hourly aggregates LEFT-joined on the hour key (J1), COALESCE "
    "defaulting, CASE-ladder impact score, collect_set (A7) as sorted CSV. "
    "At scale both sides shuffle on the same hour key → co-partitioned join.",
)


def _zone_performance_sql(d: Dialect) -> str:
    """J2/J3/J4/J5 + A4: zone_performance_metrics shape
    (comprehensive_analytics.py:219-329). customer-side daily order metrics
    joined to supplier-side daily shipment metrics on (nation, date), joined
    to the nation dim (broadcast), joined back to a coarser re-aggregation,
    LEFT JOIN made INNER by a null-rejecting WHERE."""
    return f"""
WITH cust_daily AS (
  SELECT c.c_nationkey AS nation_key,
         CAST(CAST(o.o_orderdate AS DATE) AS STRING) AS metric_date,
         COUNT(*) AS order_count,
         {dsum('o.o_totalprice')} AS order_revenue,
         {davg('o.o_totalprice')} AS avg_order_value
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey, CAST(CAST(o.o_orderdate AS DATE) AS STRING)
),
supp_daily AS (
  SELECT s.s_nationkey AS nation_key,
         CAST(CAST(l.l_shipdate AS DATE) AS STRING) AS metric_date,
         COUNT(*) AS ship_count,
         {dsum_dec(disc_price('l.l_extendedprice', 'l.l_discount'))} AS ship_revenue
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, CAST(CAST(l.l_shipdate AS DATE) AS STRING)
),
nation_stats AS (
  SELECT nation_key,
         ({dsum('order_count', scale=0)} / COUNT(*)) AS avg_daily_orders,
         MAX(order_count) AS max_daily_orders
  FROM cust_daily
  GROUP BY nation_key
)
SELECT
  cd.nation_key,
  cd.metric_date,
  n.n_name AS nation_name,
  r.r_name AS region_name,
  cd.order_count,
  cd.order_revenue,
  cd.avg_order_value,
  COALESCE(sd.ship_count, 0) AS ship_count,
  COALESCE(sd.ship_revenue, 0.0) AS ship_revenue,
  ns.avg_daily_orders,
  ns.max_daily_orders,
  CASE
    WHEN cd.order_count > ns.avg_daily_orders * 1.2 THEN 'high'
    WHEN cd.order_count < ns.avg_daily_orders * 0.8 THEN 'low'
    ELSE 'normal'
  END AS demand_level
FROM cust_daily cd
LEFT JOIN supp_daily sd
  ON cd.nation_key = sd.nation_key AND cd.metric_date = sd.metric_date
LEFT JOIN nation n ON cd.nation_key = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
LEFT JOIN nation_stats ns ON cd.nation_key = ns.nation_key
WHERE n.n_name IS NOT NULL
"""


def _zone_performance_spark_sql(d: Dialect) -> str:
    """Spark-first form of the same query: the reference's nation_stats
    re-aggregation + join-back (J4) is re-expressed as window functions over
    cust_daily — identical results, but orders⨝customer is scanned ONCE
    (Spark inlines CTEs, so the join-back form computes cust_daily twice)
    and the join-back shuffle disappears. The DuckDB oracle keeps the
    reference's join shape, pinning result equivalence of the rewrite.
    Window arithmetic matches the oracle's: exact integer SUM/COUNT then one
    double division."""
    return f"""
WITH cust_daily AS (
  SELECT c.c_nationkey AS nation_key,
         CAST(CAST(o.o_orderdate AS DATE) AS STRING) AS metric_date,
         COUNT(*) AS order_count,
         {dsum('o.o_totalprice')} AS order_revenue,
         {davg('o.o_totalprice')} AS avg_order_value
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey, CAST(CAST(o.o_orderdate AS DATE) AS STRING)
),
supp_daily AS (
  SELECT s.s_nationkey AS nation_key,
         CAST(CAST(l.l_shipdate AS DATE) AS STRING) AS metric_date,
         COUNT(*) AS ship_count,
         {dsum_dec(disc_price('l.l_extendedprice', 'l.l_discount'))} AS ship_revenue
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, CAST(CAST(l.l_shipdate AS DATE) AS STRING)
),
cust_windowed AS (
  SELECT *,
         CAST(SUM(CAST(order_count AS DECIMAL(28,0))) OVER wn AS DOUBLE)
           / COUNT(*) OVER wn AS avg_daily_orders,
         MAX(order_count) OVER wn AS max_daily_orders
  FROM cust_daily
  WINDOW wn AS (PARTITION BY nation_key)
)
SELECT
  cd.nation_key,
  cd.metric_date,
  n.n_name AS nation_name,
  r.r_name AS region_name,
  cd.order_count,
  cd.order_revenue,
  cd.avg_order_value,
  COALESCE(sd.ship_count, 0) AS ship_count,
  COALESCE(sd.ship_revenue, 0.0) AS ship_revenue,
  cd.avg_daily_orders,
  cd.max_daily_orders,
  CASE
    WHEN cd.order_count > cd.avg_daily_orders * 1.2 THEN 'high'
    WHEN cd.order_count < cd.avg_daily_orders * 0.8 THEN 'low'
    ELSE 'normal'
  END AS demand_level
FROM cust_windowed cd
LEFT JOIN supp_daily sd
  ON cd.nation_key = sd.nation_key AND cd.metric_date = sd.metric_date
LEFT JOIN nation n ON cd.nation_key = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE n.n_name IS NOT NULL
"""


sql_query(
    "q_zone_performance",
    spark_sql=_zone_performance_spark_sql(SPARK),
    duck_sql=_zone_performance_sql(DUCK),
    tables=["orders", "customer", "lineitem", "supplier", "nation", "region"],
    doc="zone_performance_metrics analog (comprehensive_analytics.py:219-329):"
    " two-sided daily metrics joined on composite (nation, date) key (J2), "
    "broadcast dim joins (J3: nation/region are tiny → Catalyst broadcasts), "
    "join back to coarser re-aggregation (J4/A4), null-rejecting WHERE after "
    "LEFT JOIN → Catalyst outer-to-inner conversion (J5).",
)


# ---------------------------------------------------------------------------
# Percentile report — A-family extension (distribution monitoring).
# ---------------------------------------------------------------------------


def _percentiles_sql(d: Dialect) -> str:
    if d.name == "spark":
        def disc(p: str) -> str:
            return f"percentile_disc({p}) WITHIN GROUP (ORDER BY value)"

        def cont(p: str) -> str:
            return f"percentile_cont({p}) WITHIN GROUP (ORDER BY value)"
    else:
        def disc(p: str) -> str:
            return f"quantile_disc(value, {p})"

        def cont(p: str) -> str:
            return f"quantile_cont(value, {p})"

    return f"""
SELECT
  event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  {disc('0.50')} AS p50_disc,
  {disc('0.90')} AS p90_disc,
  {disc('0.99')} AS p99_disc,
  {cont('0.50')} AS p50_cont,
  {cont('0.95')} AS p95_cont,
  MAX(value) AS max_value
FROM events
WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
GROUP BY event_type
"""


sql_query(
    "q_value_percentiles",
    spark_sql=_percentiles_sql(SPARK),
    duck_sql=_percentiles_sql(DUCK),
    tables=["events"],
    doc="Exact percentile report per event type: percentile_disc (an actual "
    "data value — no interpolation arithmetic) and percentile_cont (linear "
    "interpolation — verified bit-identical across engines on this data). "
    "Exact percentiles need a per-group sort; the documented 100 TB "
    "substitution is approx_percentile (t-digest/GK sketch, single pass, "
    "mergeable partials) exactly as COUNT DISTINCT degrades to HLL in "
    "q_unique_users_approx.",
)


sql_query(
    "q_value_percentiles_approx",
    spark_sql="""
WITH sketch AS (
  SELECT
    event_type,
    CAST(COUNT(*) AS BIGINT) AS n,
    approx_percentile(value, array(0.5, 0.9, 0.99), 10000) AS p_approx
  FROM events
  WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
  GROUP BY event_type
)
SELECT
  event_type,
  n,
  p_approx[0] AS p50_approx,
  p_approx[1] AS p90_approx,
  p_approx[2] AS p99_approx
FROM sketch
""",
    duck_sql=None,
    tables=["events"],
    doc="Scale variant of q_value_percentiles: approx_percentile (GK "
    "sketch, accuracy 1/10000) — single pass, mergeable partials, no "
    "per-group sort. The array sketch is projected into three scalar "
    "doubles so downstream consumers (and the driver's rows-only "
    "canonicalizer) see flat columns. Rows-only (sketch estimates have "
    "no cross-engine equivalent); accuracy vs the exact percentiles is "
    "asserted in tests/test_llm_ops.py.",
)


# ---------------------------------------------------------------------------
# OLAP shapes: hierarchical ROLLUP and pivot (wide) aggregation.
# ---------------------------------------------------------------------------


def _rollup_sql(d: Dialect) -> str:
    return f"""
SELECT
  o_orderstatus,
  o_orderpriority,
  CAST(grouping(o_orderstatus) AS INT) AS g_status,
  CAST(grouping(o_orderpriority) AS INT) AS g_priority,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  {dsum('o_totalprice')} AS total_price
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


sql_query(
    "q_rollup_report",
    spark_sql=_rollup_sql(SPARK),
    duck_sql=_rollup_sql(DUCK),
    tables=["orders"],
    doc="Hierarchical rollup (status → priority → grand total) in ONE pass: "
    "GROUP BY ROLLUP with grouping() flags disambiguating subtotal rows "
    "from genuine NULL keys. Spark plans this as a single Expand + "
    "hash-agg — one shuffle for all three aggregation levels, the "
    "hypertable-rollup shape (vs three separate GROUP BYs = three scans). "
    "Exact-decimal money sums per the determinism conventions.",
)


def _cube_sql(d: Dialect) -> str:
    return f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(grouping(l_returnflag) AS INT) AS g_flag,
  CAST(grouping(l_linestatus) AS INT) AS g_status,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  {dsum('l_quantity')} AS sum_qty,
  {dsum('l_extendedprice')} AS sum_price
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


sql_query(
    "q_cube_metrics",
    spark_sql=_cube_sql(SPARK),
    duck_sql=_cube_sql(DUCK),
    tables=["lineitem"],
    doc="Full-lattice CUBE aggregation (every subset of {returnflag, "
    "linestatus} including the grand total) in ONE pass — the complement "
    "of q_rollup_report's hierarchical ROLLUP. Spark plans the cube as a "
    "single Expand (4 grouping sets) + hash-agg: one scan and one shuffle "
    "for all four aggregation levels; grouping() flags disambiguate "
    "subtotal rows from genuine NULL keys. Exact-decimal money sums per "
    "the determinism conventions.",
)


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _pivot_oracle_sql() -> str:
    cases = ",\n  ".join(
        f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in _PIVOT_TYPES
    )
    return f"""
SELECT CAST(hour(ts) AS INT) AS hour_of_day,
  {cases}
FROM events
WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
GROUP BY CAST(hour(ts) AS INT)
"""


@df_query(
    "q_event_pivot",
    duck_sql=_pivot_oracle_sql(),
    tables=["events"],
    doc="Pivot (long→wide): per-hour event counts spread into one "
    "column per type via Spark's native groupBy().pivot() with an "
    "EXPLICIT value list — the two-pass value-discovery scan is "
    "skipped and the output schema is deterministic (pivot without "
    "values would scan once just to learn the columns). Two-phase plan: "
    "the first shuffle groups (hour, type); the second spreads columns "
    "over only those grouped partials (~|hours|x|types| rows — "
    "negligible at any scale). Oracle is the equivalent conditional "
    "aggregation.",
)
def q_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    ev = t["events"].filter("event_id IS NOT NULL AND ts IS NOT NULL AND value > 0")
    wide = (
        ev.withColumn("hour_of_day", F.hour("ts").cast("int"))
        .groupBy("hour_of_day")
        .pivot("event_type", _PIVOT_TYPES)
        .count()
    )
    return wide.select(
        "hour_of_day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _PIVOT_TYPES],
    )


def _json_props_sql(d: Dialect) -> str:
    """§2.8 JSON function family exercised on the events.props payload
    column: typed extraction + null-safe bucketing + aggregation."""
    k = d.json_int("props", "k")
    return f"""
SELECT
  event_type,
  CAST(FLOOR(({k}) / 10.0) AS INT) AS k_decile,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(MIN({k}) AS BIGINT) AS k_min,
  CAST(MAX({k}) AS BIGINT) AS k_max,
  CAST(SUM({k}) AS BIGINT) AS k_sum
FROM events
WHERE event_id IS NOT NULL AND props IS NOT NULL
GROUP BY event_type, CAST(FLOOR(({k}) / 10.0) AS INT)
"""


sql_query(
    "q_json_props",
    spark_sql=_json_props_sql(SPARK),
    duck_sql=_json_props_sql(DUCK),
    tables=["events"],
    doc="JSON payload-column extraction (§2.8 family, exercised on real "
    "data rather than literals): get_json_object / json_extract_string "
    "typed to BIGINT, bucketed, aggregated exactly. The JSON path "
    "evaluation stays in codegen; at scale the one shuffle carries the "
    "tiny (type, decile) grouped partials.",
)


def _argmax_sql(d: Dialect) -> str:
    """Arg-extrema aggregates: the 'which key achieved the max' idiom
    without a join-back or window. Spark: max_by/min_by; DuckDB:
    arg_max/arg_min — same semantics. Neither engine orders by composite
    structs portably, so the ordering key is an exact composite BIGINT:
    round(value*100) (values are 2-decimal) scaled by 1e10, tiebroken by
    user_id (minus → max picks the SMALLEST user, plus → min does too).
    Valid while value < 9.2e6 and user_id < 1e10 — both asserted by the
    testdata domain; at wider domains the key widens to DECIMAL(38,0)."""
    mx = "max_by" if d.name == "spark" else "arg_max"
    mn = "min_by" if d.name == "spark" else "arg_min"
    vkey = "CAST(round(value * 100) AS BIGINT) * 10000000000"
    return f"""
SELECT
  event_type,
  CAST({mx}(user_id, {vkey} - user_id) AS BIGINT) AS top_value_user,
  CAST({mn}(user_id, {vkey} + user_id) AS BIGINT) AS low_value_user,
  MAX(value) AS max_value,
  MIN(value) AS min_value
FROM events
WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
GROUP BY event_type
"""


sql_query(
    "q_argmax_report",
    spark_sql=_argmax_sql(SPARK),
    duck_sql=_argmax_sql(DUCK),
    tables=["events"],
    doc="Arg-extrema aggregates (max_by / arg_max): per type, WHICH user "
    "produced the extreme value — one hash-agg pass instead of the "
    "window-rank or join-back alternatives (a 2-3x plan saving on the "
    "common leaderboard shape). Ordering key is the (value, user_id) "
    "struct so equal values break ties identically in both engines.",
)


_UNPIVOT_ORACLE = f"""
WITH ev AS (
  SELECT CAST(hour(ts) AS INT) AS hour_of_day, event_type
  FROM events
  WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
),
hours AS (SELECT DISTINCT hour_of_day FROM ev),
types AS (
  SELECT unnest([{', '.join(repr(t) for t in _PIVOT_TYPES)}]) AS event_type
),
counts AS (
  SELECT hour_of_day, event_type, COUNT(*) AS n FROM ev GROUP BY 1, 2
)
SELECT h.hour_of_day,
       t.event_type,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM hours h
CROSS JOIN types t
LEFT JOIN counts c
  ON c.hour_of_day = h.hour_of_day AND c.event_type = t.event_type
"""


@df_query(
    "q_event_unpivot",
    duck_sql=_UNPIVOT_ORACLE,
    tables=["events"],
    doc="Unpivot (wide→long, the inverse of q_event_pivot): the per-hour "
    "per-type count matrix melted back to (hour, type, n) rows via Spark's "
    "native DataFrame.unpivot — planned as a single Expand (each input row "
    "fans to |types| rows), no join and no extra shuffle beyond the "
    "pivot's own aggregation. Zero-filled combinations survive the round "
    "trip, so the oracle is the hour×type grid left-joined to the counts. "
    "The wide→long melt is the standard normalization step in front of "
    "long-format feature stores and plotting pipelines.",
)
def q_event_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    ev = t["events"].filter("event_id IS NOT NULL AND ts IS NOT NULL AND value > 0")
    wide = (
        ev.withColumn("hour_of_day", F.hour("ts").cast("int"))
        .groupBy("hour_of_day")
        .pivot("event_type", _PIVOT_TYPES)
        .count()
    )
    wide = wide.select(
        "hour_of_day",
        *[F.coalesce(F.col(c), F.lit(0)).alias(f"n_{c}") for c in _PIVOT_TYPES],
    )
    long = wide.unpivot(
        ids=["hour_of_day"],
        values=[f"n_{c}" for c in _PIVOT_TYPES],
        variableColumnName="event_type",
        valueColumnName="n",
    )
    # Variable column carries the source column names (n_click, ...) —
    # strip the prefix back to the original type labels.
    return long.select(
        "hour_of_day",
        F.expr("substring(event_type, 3)").alias("event_type"),
        F.col("n").cast("bigint").alias("n"),
    )


# ---------------------------------------------------------------------------
# GROUPING SETS — the general multi-grain lattice (ROLLUP and CUBE are the
# special cases q_rollup_report / q_cube_metrics already pin).
# ---------------------------------------------------------------------------


_GROUPING_SETS_SQL = f"""
SELECT
  o_orderstatus,
  o_orderpriority,
  CAST(grouping(o_orderstatus) AS INT) AS g_status,
  CAST(grouping(o_orderpriority) AS INT) AS g_priority,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
  {dsum('o_totalprice')} AS total_price
FROM orders
GROUP BY GROUPING SETS (
  (o_orderstatus, o_orderpriority),
  (o_orderstatus),
  (o_orderpriority),
  ()
)
"""


sql_query(
    "q_grouping_sets",
    spark_sql=_GROUPING_SETS_SQL,
    duck_sql=_GROUPING_SETS_SQL,
    tables=["orders"],
    doc="Explicit GROUPING SETS lattice — the hand-picked-grain superset of "
    "ROLLUP/CUBE (§2.4 A12 family): detail, two one-dimensional marginals, "
    "and the grand total in ONE pass. Spark plans this as a single Expand "
    "(each row fans out to the 4 grouping sets, tagged with spark_grouping_id)"
    " feeding one hash aggregate — one scan + one shuffle instead of the "
    "4-scan UNION ALL a naive mart builder would write. grouping() flags "
    "disambiguate real NULL keys from subtotal rows, exactly as in the "
    "ROLLUP/CUBE twins. At 100 TB the Expand multiplies shuffle volume by "
    "|sets|, so grains are hand-picked here rather than CUBE's full 2^n.",
)


# ---------------------------------------------------------------------------
# Equi-width histogram — distribution profiling without a per-group sort.
# ---------------------------------------------------------------------------

_HIST_WIDTH = 25.0
_HIST_NBUCKETS = 24  # covers [0, 600); overflow clamps into the last bucket


_HISTOGRAM_SQL = f"""
SELECT
  event_type,
  LEAST(CAST(FLOOR(value / {_HIST_WIDTH}) AS INT), {_HIST_NBUCKETS - 1}) AS bucket,
  CAST(LEAST(CAST(FLOOR(value / {_HIST_WIDTH}) AS INT), {_HIST_NBUCKETS - 1})
       * {_HIST_WIDTH} AS DOUBLE) AS bucket_lo,
  CAST((LEAST(CAST(FLOOR(value / {_HIST_WIDTH}) AS INT), {_HIST_NBUCKETS - 1}) + 1)
       * {_HIST_WIDTH} AS DOUBLE) AS bucket_hi,
  CAST(COUNT(*) AS BIGINT) AS n,
  {dsum('value')} AS bucket_value_sum
FROM events
WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
GROUP BY event_type, LEAST(CAST(FLOOR(value / {_HIST_WIDTH}) AS INT), {_HIST_NBUCKETS - 1})
"""


sql_query(
    "q_histogram",
    spark_sql=_HISTOGRAM_SQL,
    duck_sql=_HISTOGRAM_SQL,
    tables=["events"],
    doc="Equi-width histogram per event type (distribution profiling, the "
    "fixed-grid sibling of q_value_percentiles): bucket = clamped "
    "floor(value/width), counted in ONE hash aggregate — no per-group sort, "
    "no sketch, mergeable partials, so it scales exactly like any other "
    "grouped count at 100 TB. The bucket arithmetic (one IEEE division + "
    "floor) is bit-deterministic cross-engine, unlike width_bucket which "
    "DuckDB lacks. Non-empty buckets only; consumers left-join a grid if "
    "they need zero-filled bars (same pattern as q_event_unpivot's oracle).",
)


# ---------------------------------------------------------------------------
# Robust outlier detection — median / MAD (the monitoring-grade anomaly
# screen; z-scores on heavy-tailed telemetry flag everything).
# ---------------------------------------------------------------------------


def _anomaly_mad_sql(d: Dialect) -> str:
    if d.name == "spark":
        def cont(col: str) -> str:
            return f"percentile_cont(0.5) WITHIN GROUP (ORDER BY {col})"
    else:
        def cont(col: str) -> str:
            return f"quantile_cont({col}, 0.5)"

    return f"""
WITH base AS (
  SELECT event_type, value
  FROM events
  WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
),
med AS (
  SELECT event_type, {cont('value')} AS med
  FROM base GROUP BY event_type
),
dev AS (
  SELECT b.event_type, b.value, m.med, abs(b.value - m.med) AS adev
  FROM base b JOIN med m ON b.event_type = m.event_type
),
mad AS (
  SELECT event_type, {cont('adev')} AS mad
  FROM dev GROUP BY event_type
)
SELECT
  d.event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  MAX(d.med) AS median_value,
  MAX(x.mad) AS mad_value,
  CAST(SUM(CASE WHEN d.adev > 3.0 * 1.4826 * x.mad THEN 1 ELSE 0 END) AS BIGINT)
    AS n_outliers,
  MAX(CASE WHEN d.adev > 3.0 * 1.4826 * x.mad THEN d.value END) AS worst_value
FROM dev d
JOIN mad x ON d.event_type = x.event_type
GROUP BY d.event_type
"""


sql_query(
    "q_anomaly_mad",
    spark_sql=_anomaly_mad_sql(SPARK),
    duck_sql=_anomaly_mad_sql(DUCK),
    tables=["events"],
    doc="Robust outlier screen per event type: median + MAD (median absolute "
    "deviation), flagging values beyond the 3-sigma-equivalent band "
    "3*1.4826*MAD — the estimator of choice for heavy-tailed telemetry where "
    "mean/stddev z-scores are dragged by the outliers they should flag. Two "
    "exact-median passes (grouped sort each) + broadcast joins of the tiny "
    "per-type stats back to the fact; every float op past the sort is a "
    "single IEEE operation, so results hash-match DuckDB exactly. The "
    "documented 100 TB substitution is approx_percentile for both medians "
    "(mergeable sketches, no sort), same degradation path as "
    "q_value_percentiles → q_value_percentiles_approx.",
)


# ---------------------------------------------------------------------------
# Distribution drift between time windows — the data-quality monitor.
# ---------------------------------------------------------------------------


def _drift_sql(d: Dialect) -> str:
    """Per-type value-distribution drift between the first and second half
    of the time range, over the same fixed bucket grid as q_histogram.
    Divergence = Σ_b (pA_b − pB_b)² / (pA_b + pB_b) — the χ²-style symmetric
    statistic, chosen over PSI/KL because it needs no ln() (cross-libm
    unstable). Each bucket's term is one chain of IEEE ops snapped to
    DECIMAL(28,12) before the order-independent sum."""
    bucket = f"LEAST(CAST(FLOOR(value / {_HIST_WIDTH}) AS INT), {_HIST_NBUCKETS - 1})"
    term = (
        "CAST((pa - pb) * (pa - pb) / (pa + pb) AS DECIMAL(28,12))"
    )
    return f"""
WITH base AS (
  SELECT event_type, value, {d.epoch('ts')} AS ts_s
  FROM events
  WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
),
bounds AS (
  SELECT MIN(ts_s) AS lo, MAX(ts_s) AS hi FROM base
),
tagged AS (
  SELECT event_type, {bucket} AS bucket,
         CASE WHEN ts_s * 2 < lo + hi THEN 0 ELSE 1 END AS half
  FROM base CROSS JOIN bounds
),
counts AS (
  SELECT event_type, bucket,
         SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n_b
  FROM tagged GROUP BY event_type, bucket
),
totals AS (
  SELECT event_type,
         CAST(SUM(n_a) AS BIGINT) AS tot_a,
         CAST(SUM(n_b) AS BIGINT) AS tot_b
  FROM counts GROUP BY event_type
),
shares AS (
  SELECT c.event_type,
         CAST(c.n_a AS DOUBLE) / t.tot_a AS pa,
         CAST(c.n_b AS DOUBLE) / t.tot_b AS pb
  FROM counts c JOIN totals t ON c.event_type = t.event_type
)
SELECT
  s.event_type,
  t.tot_a AS n_first_half,
  t.tot_b AS n_second_half,
  CAST(COUNT(*) AS INT) AS n_buckets,
  CAST(SUM({term}) AS DOUBLE) AS drift_chisq
FROM shares s JOIN totals t ON s.event_type = t.event_type
GROUP BY s.event_type, t.tot_a, t.tot_b
"""


sql_query(
    "q_drift_chisq",
    spark_sql=_drift_sql(SPARK),
    duck_sql=_drift_sql(DUCK),
    tables=["events"],
    doc="Distribution-drift monitor: per event type, the χ²-style symmetric "
    "divergence between the value distribution of the first and second half "
    "of the observed time range, over q_histogram's fixed bucket grid — the "
    "continuous-monitoring gate that catches upstream schema/behavior "
    "changes before they poison training data (the PSI report of feature "
    "stores, minus PSI's ln() which is not bit-stable cross-libm). Plan: "
    "one scan, a 1-row bounds broadcast, one (type, bucket) count agg "
    "carrying both halves as conditional sums (no second scan), then "
    "arithmetic on the tiny bucket table. Mergeable counts make this "
    "incremental at 100 TB: yesterday's bucket counts are reusable partials.",
)


# ---------------------------------------------------------------------------
# Winsorized / trimmed robust statistics — the q_anomaly_mad companion.
# ---------------------------------------------------------------------------


def _trimmed_sql(d: Dialect) -> str:
    """Per-type mean/total recomputed after clamping values into the exact
    [p05, p95] band (winsorizing) and after dropping the tails entirely
    (trimming). Band edges are percentile_disc — ACTUAL data values, no
    interpolation — so membership tests are exact double comparisons and
    the aggregates run through the standard decimal-exact path."""
    if d.name == "spark":
        def disc(p: str, col: str = "value") -> str:
            return f"percentile_disc({p}) WITHIN GROUP (ORDER BY {col})"
    else:
        def disc(p: str, col: str = "value") -> str:
            return f"quantile_disc({col}, {p})"

    wins = "CASE WHEN value < p05 THEN p05 WHEN value > p95 THEN p95 ELSE value END"
    return f"""
WITH base AS (
  SELECT event_type, value
  FROM events
  WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
),
bands AS (
  SELECT event_type, {disc('0.05')} AS p05, {disc('0.95')} AS p95
  FROM base GROUP BY event_type
)
SELECT
  b.event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  MAX(d.p05) AS p05,
  MAX(d.p95) AS p95,
  {davg('value')} AS raw_mean,
  CAST(SUM(CAST(({wins}) AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS winsorized_mean,
  CAST(SUM(CASE WHEN value >= p05 AND value <= p95
                THEN CAST(value AS DECIMAL(28,2)) END) AS DOUBLE)
    / SUM(CASE WHEN value >= p05 AND value <= p95 THEN 1 ELSE 0 END)
    AS trimmed_mean,
  CAST(SUM(CASE WHEN value < p05 OR value > p95 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_clamped
FROM base b JOIN bands d ON b.event_type = d.event_type
GROUP BY b.event_type
"""


sql_query(
    "q_trimmed_stats",
    spark_sql=_trimmed_sql(SPARK),
    duck_sql=_trimmed_sql(DUCK),
    tables=["events"],
    doc="Winsorized + trimmed means per event type (robust-stats family, "
    "completing q_anomaly_mad): the 5%/95% percentile_disc band edges — "
    "actual data values, no interpolation — broadcast back onto the fact, "
    "values clamped (winsorize) or excluded (trim), then the standard "
    "exact-decimal aggregate. The pre-model feature-normalization step "
    "that stops a fat-finger 1e9 fare from dragging a fleet-wide mean. "
    "One grouped percentile pass + one broadcast join + one agg; the "
    "100 TB substitution for the exact band is approx_percentile, same "
    "path as every percentile query here.",
)


# ---------------------------------------------------------------------------
# Benford first-digit forensics + equi-depth histogram.
# ---------------------------------------------------------------------------

# log10(1 + 1/d) to 5 places — public constants, identical literals in both
# engines so the divergence arithmetic starts from the same doubles.
_BENFORD = {
    1: 0.30103, 2: 0.17609, 3: 0.12494, 4: 0.09691, 5: 0.07918,
    6: 0.06695, 7: 0.05799, 8: 0.05115, 9: 0.04576,
}


def _benford_sql(d: Dialect) -> str:
    digit = "CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS INT)"
    expected = "CASE first_digit " + " ".join(
        f"WHEN {k} THEN {v}" for k, v in _BENFORD.items()
    ) + " END"
    return f"""
WITH digits AS (
  SELECT {digit} AS first_digit
  FROM orders
  WHERE o_totalprice >= 1
),
counts AS (
  SELECT first_digit, CAST(COUNT(*) AS BIGINT) AS n
  FROM digits GROUP BY first_digit
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
SELECT
  c.first_digit,
  c.n,
  CAST(c.n AS DOUBLE) / t.total AS observed_share,
  CAST({expected} AS DOUBLE) AS benford_share,
  CAST(CAST((CAST(c.n AS DOUBLE) / t.total - {expected})
            * (CAST(c.n AS DOUBLE) / t.total - {expected})
            / {expected} AS DECIMAL(28,12)) AS DOUBLE) AS chisq_term
FROM counts c CROSS JOIN tot t
"""


sql_query(
    "q_benford",
    spark_sql=_benford_sql(SPARK),
    duck_sql=_benford_sql(DUCK),
    tables=["orders"],
    doc="Benford first-digit audit over order totals: observed leading-"
    "digit shares vs the log10(1+1/d) law with per-digit χ² terms — the "
    "classic fabricated-data / upstream-bug forensic (a synthetic or "
    "truncated feed shows up as a flat digit histogram long before any "
    "schema check fires). One scan + a 9-row count table + a 1-row total "
    "broadcast; the FLOOR-before-cast keeps the digit extraction "
    "identical cross-engine (DuckDB CAST rounds, Spark truncates). "
    "Trivially incremental at 100 TB: digit counts are mergeable "
    "partials.",
)


def _equidepth_sql(d: Dialect) -> str:
    return """
WITH ranked AS (
  SELECT event_type, value,
         NTILE(10) OVER (
           PARTITION BY event_type ORDER BY value, event_id
         ) AS decile
  FROM events
  WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
)
SELECT event_type,
       CAST(decile AS INT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(value) AS lo,
       MAX(value) AS hi
FROM ranked
GROUP BY event_type, decile
"""


sql_query(
    "q_equidepth_histogram",
    spark_sql=_equidepth_sql(SPARK),
    duck_sql=_equidepth_sql(DUCK),
    tables=["events"],
    doc="Equi-depth (quantile-bucket) histogram: NTILE(10) per event type "
    "with an event_id tiebreak (a total order, so bucket membership is "
    "deterministic cross-engine), reduced to per-decile count + value "
    "bounds — the boundary table feeding range-partitioners, optimizer "
    "statistics, and monotone feature binning, complementing "
    "q_histogram's fixed grid (equi-width tells you WHERE mass sits; "
    "equi-depth guarantees balanced buckets regardless of skew). One "
    "sort per type partition; the 100 TB substitution is "
    "approx_percentile boundaries, same degradation path as every "
    "percentile query here.",
)


# ---------------------------------------------------------------------------
# Pareto frontier (skyline): customers not dominated on (spend, order count).
# The oracle keeps the textbook quadratic NOT-EXISTS dominance test; the
# Spark implementation is the O(n log n) sweep — group to distinct x, take
# the per-x maximum y, prefix-max over x descending, then a point survives
# iff it attains its x's max y and beats every higher-x max. Ties on both
# axes survive on both sides (neither point strictly dominates).
# ---------------------------------------------------------------------------

_PARETO_SPARK_SQL = f"""
WITH s AS (
  SELECT o_custkey, {dsum('o_totalprice')} AS spend, COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
),
x AS (SELECT spend, MAX(n_orders) AS ymax FROM s GROUP BY spend),
x2 AS (
  SELECT spend, ymax,
         MAX(ymax) OVER (ORDER BY spend DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM x
)
SELECT s.o_custkey, s.spend, s.n_orders
FROM s JOIN x2 ON s.spend = x2.spend
WHERE s.n_orders = x2.ymax
  AND (x2.prev_max IS NULL OR x2.prev_max < s.n_orders)
"""

_PARETO_DUCK_SQL = f"""
WITH s AS (
  SELECT o_custkey, {dsum('o_totalprice')} AS spend, COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT p.o_custkey, p.spend, p.n_orders
FROM s p
WHERE NOT EXISTS (
  SELECT 1 FROM s q
  WHERE q.spend >= p.spend AND q.n_orders >= p.n_orders
    AND (q.spend > p.spend OR q.n_orders > p.n_orders)
)
"""

sql_query(
    "q_pareto_frontier",
    spark_sql=_PARETO_SPARK_SQL,
    duck_sql=_PARETO_DUCK_SQL,
    tables=["orders"],
    doc="Skyline / Pareto-maxima query: customers where no other customer "
    "has both >= total spend and >= order count (with one strict). The "
    "oracle runs the O(n^2) NOT-EXISTS dominance scan; the Spark plan is "
    "the O(n log n) prefix-max sweep over the per-spend aggregate — the "
    "100 TB shape, since the quadratic form is a full self-join on "
    "inequalities. The sweep's window runs over DISTINCT spend values of "
    "an already per-customer-aggregated table (cardinality = #customers, "
    "not #orders); for billions of entities the same sweep range-"
    "partitions by x with a two-pass boundary prefix-max.",
)


sql_query(
    "q_hll_rollup",
    spark_sql="""
WITH daily AS (
  SELECT
    CAST(CAST(ts AS DATE) AS STRING) AS day,
    hll_sketch_agg(user_id, 12) AS sk,
    COUNT(DISTINCT user_id) AS exact_users
  FROM events
  GROUP BY CAST(CAST(ts AS DATE) AS STRING)
)
SELECT
  day,
  exact_users,
  CAST(hll_sketch_estimate(sk) AS BIGINT) AS approx_users,
  CAST(abs(hll_sketch_estimate(sk) - exact_users) AS BIGINT) AS abs_err
FROM daily
""",
    duck_sql=None,  # DataSketches HLL binary sketches have no DuckDB-
    # reproducible estimate; rows-only here, semantics pinned by
    # tests/test_sketch_cdf.py (mergeability + error bound vs exact).
    tables=["events"],
    doc="Mergeable-sketch pre-aggregation (the lakehouse cube pattern for "
    "COUNT DISTINCT): per-day DataSketches HLL sketches of user_id "
    "(lgK=12) materialized next to the exact count. The point of sketches "
    "over approx_count_distinct is REUSE: hll_union_agg collapses daily "
    "sketches to any coarser grain without rescanning the fact table — "
    "at 100 TB the daily sketch table is KB-sized and answers "
    "month/quarter/arbitrary-range distinct-count questions in "
    "milliseconds. Mergeability (union-of-daily == direct-over-period, "
    "exactly, and both within the published HLL error of exact) is pinned "
    "in tests/test_sketch_cdf.py.",
)


_BASKET_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM op),
item AS (SELECT l_partkey, COUNT(*) AS cnt FROM op GROUP BY l_partkey),
pair AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS cnt
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= 2
)
SELECT
  p.part_a,
  p.part_b,
  p.cnt AS pair_orders,
  ia.cnt AS orders_a,
  ib.cnt AS orders_b,
  CAST(p.cnt AS DOUBLE) / t.n AS support,
  CAST(p.cnt AS DOUBLE) / ia.cnt AS confidence_a_to_b,
  CAST(p.cnt AS DOUBLE) / ib.cnt AS confidence_b_to_a,
  CAST(p.cnt * t.n AS DOUBLE) / (ia.cnt * ib.cnt) AS lift
FROM pair p
JOIN item ia ON p.part_a = ia.l_partkey
JOIN item ib ON p.part_b = ib.l_partkey
CROSS JOIN tot t
"""

sql_query(
    "q_market_basket",
    spark_sql=_BASKET_SQL,
    duck_sql=_BASKET_SQL,
    tables=["lineitem"],
    doc="Market-basket association rules over co-purchased parts: "
    "support / confidence (both directions) / lift for every part pair "
    "appearing together in >= 2 orders. All counts exact integers; each "
    "metric is ONE int/int IEEE division (lift's numerator and "
    "denominator multiplied in exact int64 first), so the result hash-"
    "matches without decimal machinery. The pair join is the same "
    "per-order self-join shape as q_triangle_count's edge builder — "
    "bounded by Σ basket_size² per order, never by catalog size.",
)


_WEIGHTED_MEDIAN_SQL = """
WITH w AS (
  SELECT
    l_returnflag,
    l_extendedprice,
    SUM(CAST(l_quantity AS BIGINT))
      OVER (PARTITION BY l_returnflag
            ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS cum_wt,
    SUM(CAST(l_quantity AS BIGINT))
      OVER (PARTITION BY l_returnflag) AS total_wt
  FROM lineitem
)
SELECT
  l_returnflag,
  MIN(l_extendedprice) AS weighted_median_price,
  CAST(MAX(total_wt) AS BIGINT) AS total_weight
FROM w
WHERE 2 * cum_wt >= total_wt
GROUP BY l_returnflag
"""

sql_query(
    "q_weighted_median",
    spark_sql=_WEIGHTED_MEDIAN_SQL,
    duck_sql=_WEIGHTED_MEDIAN_SQL,
    tables=["lineitem"],
    doc="Quantity-weighted median price per return flag (the inventory-"
    "weighted center the plain median misses): integer cumulative-weight "
    "window with a unique (price, orderkey, linenumber) tiebreaker, "
    "median = MIN price where 2*cum >= total — all-integer comparisons, "
    "no interpolation, deterministic under any tie order. One window "
    "pass per group partition; complements q_value_percentiles (exact "
    "unweighted) and the equi-depth histogram.",
)


# --- Poisson-bootstrap confidence interval --------------------------------

_BOOT_B = 32
# Cumulative Poisson(1) inverse-CDF thresholds (constants, 12 decimals —
# identical literals in both engines; the uniform is an exact rational).
_POIS_CUM = [
    ("0.367879441171", 0), ("0.735758882343", 1), ("0.919698602929", 2),
    ("0.981011843124", 3), ("0.996340153173", 4), ("0.999405815182", 5),
]


def _bootstrap_sql(d) -> str:
    """Distributed confidence interval for the mean order value via the
    POISSON BOOTSTRAP (Chamandy et al., Google 2012) — the resampling
    scheme that works when n is too large to index: instead of drawing n
    rows with replacement, each row enters replicate b with weight ~
    Poisson(1), independent per (row, replicate) — a pure map over the
    data, no global sample state.

    Made fully deterministic (and therefore oracle-checkable) by deriving
    the Poisson weight from an inverse-CDF lookup on a hash-uniform
    u(row, b) = md5(key:b) mod 10^6 / 10^6 — exact rational vs constant
    decimal thresholds; no RNG state anywhere. Replicate means are exact
    decimal sums with one IEEE division; the 93.75% percentile interval is
    an exact order statistic (2nd / 31st of B=32 replicate means).

    Scale shape: one B-way fanout (map), one (replicate)-keyed aggregation
    of 32 groups — map-side partials reduce it to 32·partitions rows — and
    a 32-row sort. The fanout is compute, not shuffle: the exchange
    carries 32 rows per partition.
    """
    s = "STRING" if d.name == "spark" else "VARCHAR"
    if d.name == "spark":
        reps = f"SELECT explode(sequence(0, {_BOOT_B - 1})) AS b"
    else:
        reps = f"SELECT unnest(range({_BOOT_B})) AS b"
    u = (
        f"CAST(({d.md5_int32(f'concat(CAST(o_orderkey AS {s}), chr(58), CAST(r.b AS {s}))')}"
        f" % 1000000) AS DOUBLE) / 1000000.0"
    )
    cascade = "CASE " + " ".join(
        f"WHEN u < {t} THEN {k}" for t, k in _POIS_CUM
    ) + " ELSE 6 END"
    return f"""
WITH reps AS ({reps}),
weighted AS (
  SELECT b, {cascade} AS w, price
  FROM (SELECT r.b AS b, {u} AS u,
               CAST(o_totalprice AS DECIMAL(28,2)) AS price
        FROM orders CROSS JOIN reps r) t
),
rep_means AS (
  SELECT b,
         CAST(SUM(w * price) AS DOUBLE) / SUM(w) AS m
  FROM weighted WHERE w > 0 GROUP BY b
),
ranked AS (
  SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS rk FROM rep_means
),
point AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*)
           AS estimate,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders
)
SELECT
  p.estimate,
  p.n,
  {_BOOT_B} AS n_replicates,
  (SELECT m FROM ranked WHERE rk = 2) AS ci_lo,
  (SELECT m FROM ranked WHERE rk = {_BOOT_B - 1}) AS ci_hi
FROM point p
"""


def _register_bootstrap():
    from ..functions.detsql import DUCK, SPARK
    from ..registry import sql_query

    sql_query(
        "q_bootstrap_ci",
        spark_sql=_bootstrap_sql(SPARK),
        duck_sql=_bootstrap_sql(DUCK),
        tables=["orders"],
        doc=_bootstrap_sql.__doc__,
    )


_register_bootstrap()


# ---------------------------------------------------------------------------
# Revenue concentration — Gini coefficient + Lorenz top-shares.
# ---------------------------------------------------------------------------


def _gini_sql(d) -> str:
    """Gini over per-customer revenue via the sorted-rank identity
    G = (2·Σ i·x_i) / (n·Σx) − (n+1)/n  (x ascending, i = 1..n), plus
    top-1% / top-10% revenue shares. Revenue is an exact DECIMAL sum;
    i·x_i products stay decimal (rank is an exact integer), so both Σ
    terms are order-independent and the final expression is one shared
    IEEE tree. The rank window is global but runs over the per-customer
    AGGREGATE (bounded: one row per customer with orders)."""
    return f"""
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DECIMAL(28,2)) AS r
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT r,
         CAST(ROW_NUMBER() OVER (ORDER BY r, o_custkey) AS BIGINT) AS i,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM rev
),
tot AS (
  SELECT n,
         CAST(SUM(r) AS DECIMAL(38,2)) AS sx,
         CAST(SUM(r * i) AS DECIMAL(38,2)) AS sxi,
         CAST(SUM(CASE WHEN i > n - {d.idiv('n', '100')} THEN r ELSE 0 END)
              AS DECIMAL(38,2)) AS top1,
         CAST(SUM(CASE WHEN i > n - {d.idiv('n', '10')} THEN r ELSE 0 END)
              AS DECIMAL(38,2)) AS top10
  FROM ranked GROUP BY n
)
SELECT
  n AS n_customers,
  CAST(sx AS DOUBLE) AS total_revenue,
  CAST(2 * CAST(sxi AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
       - (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE) AS DOUBLE) AS gini,
  CAST(CAST(top1 AS DOUBLE) / CAST(sx AS DOUBLE) AS DOUBLE) AS top1pct_share,
  CAST(CAST(top10 AS DOUBLE) / CAST(sx AS DOUBLE) AS DOUBLE) AS top10pct_share
FROM tot
"""


def _register_gini():
    from ..functions.detsql import DUCK, SPARK
    from ..registry import sql_query

    sql_query(
        "q_gini_concentration",
        spark_sql=_gini_sql(SPARK),
        duck_sql=_gini_sql(DUCK),
        tables=["orders"],
        doc="Revenue-concentration report: Gini coefficient via the exact "
        "sorted-rank identity plus top-1%/top-10% Lorenz shares over "
        "per-customer revenue. All Σ terms are exact decimal sums (rank "
        "is an integer, so Σ i·x_i stays decimal — order-independent "
        "under any shuffle), with one shared IEEE expression tree at the "
        "end. The global rank window runs over the per-customer "
        "AGGREGATE, not raw orders (the q_rank_report whitelist "
        "pattern); at true scale the rank would come from q_dense_ids' "
        "two-pass offsets with identical output.",
    )


_register_gini()


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov drift test — the continuous-distribution
# companion to q_drift_chisq's categorical chi-square.
# ---------------------------------------------------------------------------


def _ks_drift_sql(d: Dialect) -> str:
    """Exact two-sample KS statistic between the early and late halves of
    the event stream (split at the midpoint of the observed time range —
    the data-relative convention of q_recent_orders).

    D = sup_x |F1(x) − F2(x)| is computed entirely in INTEGERS:
    per distinct value, per-group counts; running totals C1, C2 over the
    value order; D_num = max |n2·C1 − n1·C2| with D = D_num/(n1·n2) as
    the only float op (one IEEE division — bit-stable cross-engine). The
    95% rejection bound uses c(α)=1.358 and a single sqrt (correctly
    rounded per IEEE-754, identical in JVM and libm).

    Scale shape: the supremum scan runs over the DISTINCT-value table
    (orders of magnitude smaller than the stream); its global ordered
    prefix sum is the standard two-pass (per-partition subtotal
    broadcast) at 100 TB, and everything before it is one hash
    aggregate keyed on value.
    """
    return f"""
WITH bounds AS (
  SELECT CAST(MIN({d.epoch('ts')}) AS BIGINT) AS t0,
         CAST(MAX({d.epoch('ts')}) AS BIGINT) AS t1
  FROM events
),
tagged AS (
  SELECT e.value,
         CASE WHEN 2 * {d.epoch('e.ts')} <= b.t0 + b.t1 THEN 0 ELSE 1 END
           AS grp
  FROM events e CROSS JOIN bounds b
  WHERE e.value IS NOT NULL
),
per_value AS (
  SELECT value,
         CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM tagged GROUP BY value
),
walked AS (
  SELECT
    SUM(c1) OVER (ORDER BY value
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
    SUM(c2) OVER (ORDER BY value
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
    SUM(c1) OVER () AS n1,
    SUM(c2) OVER () AS n2
  FROM per_value
)
SELECT
  CAST(MAX(n1) AS BIGINT) AS n1,
  CAST(MAX(n2) AS BIGINT) AS n2,
  CAST(MAX(ABS(n2 * cum1 - n1 * cum2)) AS BIGINT) AS d_num,
  CAST(MAX(ABS(n2 * cum1 - n1 * cum2)) AS DOUBLE)
    / NULLIF(CAST(MAX(n1) AS DOUBLE) * CAST(MAX(n2) AS DOUBLE), 0.0)
    AS d_stat,
  CAST(CASE WHEN MAX(n1) = 0 OR MAX(n2) = 0 THEN NULL
       WHEN
         CAST(MAX(ABS(n2 * cum1 - n1 * cum2)) AS DOUBLE)
           / (CAST(MAX(n1) AS DOUBLE) * CAST(MAX(n2) AS DOUBLE))
         > 1.358 * SQRT((CAST(MAX(n1) AS DOUBLE) + CAST(MAX(n2) AS DOUBLE))
                        / (CAST(MAX(n1) AS DOUBLE) * CAST(MAX(n2) AS DOUBLE)))
       THEN 1 ELSE 0 END AS INT) AS drift_at_95
FROM walked
"""


sql_query(
    "q_ks_drift",
    spark_sql=_ks_drift_sql(SPARK),
    duck_sql=_ks_drift_sql(DUCK),
    tables=["events"],
    doc="Two-sample Kolmogorov–Smirnov drift test on event values, early "
    "half vs late half of the stream — the continuous-distribution drift "
    "monitor beside q_drift_chisq's categorical one (a feature-store "
    "health check before a training run). The supremum of |F1−F2| is "
    "exact: integer cross-multiplied CDF gap max |n2·C1 − n1·C2| with a "
    "single final division, plus the 1.358·sqrt((n1+n2)/(n1·n2)) 95% "
    "bound (sqrt is IEEE-exact). One value-keyed aggregate, then a "
    "prefix walk over the distinct-value table only; no raw-stream "
    "global sort.",
)


def _wasserstein_sql(d: Dialect) -> str:
    """Exact 1-Wasserstein (earth-mover) distance between the early and
    late halves of the event-value stream — the MAGNITUDE-sensitive
    companion to q_ks_drift's supremum: KS answers 'did the distribution
    move anywhere', W1 answers 'how much probability mass moved how far'
    (W1 = integral of |F1 - F2| dx for 1-D distributions), the drift
    metric that actually orders retraining urgency.

    All-integer: values snapped to cents (the house DECIMAL convention),
    per-value group counts, and the integral is the exact sum over
    distinct-value gaps of |n2*C1 - n1*C2| * (v_next - v); the only
    float op is the final /(n1*n2) normalization. BIGINT-safe while
    n1*n2*(range cents) < 2^63 (~sf1 here); beyond that the documented
    swap is DECIMAL(38,0) for the gap terms."""
    cents = "CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT)"
    return f"""
WITH bounds AS (
  SELECT CAST(MIN({d.epoch('ts')}) AS BIGINT) AS t0,
         CAST(MAX({d.epoch('ts')}) AS BIGINT) AS t1
  FROM events
),
tagged AS (
  SELECT {cents} AS v,
         CASE WHEN 2 * {d.epoch('e.ts')} <= b.t0 + b.t1 THEN 0 ELSE 1 END
           AS grp
  FROM events e CROSS JOIN bounds b
  WHERE e.value IS NOT NULL
),
per_value AS (
  SELECT v,
         CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM tagged GROUP BY v
),
walked AS (
  SELECT
    LEAD(v) OVER (ORDER BY v) - v AS gap,
    SUM(c1) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
    SUM(c2) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
    SUM(c1) OVER () AS n1,
    SUM(c2) OVER () AS n2
  FROM per_value
)
SELECT
  CAST(MAX(n1) AS BIGINT) AS n1,
  CAST(MAX(n2) AS BIGINT) AS n2,
  CAST(SUM(CASE WHEN gap IS NULL THEN 0
            ELSE ABS(n2 * cum1 - n1 * cum2) * gap END) AS BIGINT)
    AS w1_num_cents,
  CAST(SUM(CASE WHEN gap IS NULL THEN 0
            ELSE ABS(n2 * cum1 - n1 * cum2) * gap END) AS DOUBLE)
    / NULLIF(CAST(MAX(n1) AS DOUBLE) * CAST(MAX(n2) AS DOUBLE), 0.0)
    AS w1_cents
FROM walked
"""


sql_query(
    "q_wasserstein",
    spark_sql=_wasserstein_sql(SPARK),
    duck_sql=_wasserstein_sql(DUCK),
    tables=["events"],
    doc="Exact 1-Wasserstein (earth-mover) drift between the early and "
    "late halves of the event-value stream — the magnitude-sensitive "
    "companion to q_ks_drift's supremum statistic (W1 = integral of "
    "|F1 - F2| over values; it ranks drifts KS ties and ignores "
    "immaterial wiggles KS flags). Integer-exact: cent-snapped values, "
    "cross-multiplied CDF gaps |n2*C1 - n1*C2| weighted by the exact "
    "distinct-value gaps, one final IEEE division. Same scale shape as "
    "q_ks_drift: one value-keyed aggregate, then the prefix walk runs "
    "over the distinct-value table only (two-pass subtotal-broadcast "
    "prefix sum at 100 TB), never the raw stream.",
)


# ---------------------------------------------------------------------------
# Quantile normalization across groups — batch-effect correction for scores
# coming from heterogeneous sources.
# ---------------------------------------------------------------------------


def _quantile_norm_sql(d: Dialect) -> str:
    """Map each event_type's value distribution onto the POOLED value
    distribution by rank: a value at (doubled) midrank m2 within its type
    (m2 = 2·cum − c + 1 over the type's n_g rows) normalizes to the pooled
    order statistic at index i = ceil(m2·N / (2·n_g)) — the rank-based
    batch-effect correction (microarray quantile normalization) that makes
    per-source quality scores comparable before a global threshold.

    Everything is value-DOMAIN grain: per-(type, value) and per-value
    aggregates with cumulative windows; the index→order-statistic lookup
    is the union-and-backfill trick (pooled rows sit at pos = their
    cumulative count; each query row at pos = i takes the FIRST pooled
    value at pos ≥ i via one descending last-ignore-nulls window) — no
    range join, no row-grain global sort. Ties share a midrank so the map
    is deterministic with no arbitrary within-tie ordering; the only
    per-row ops are integer arithmetic and order-statistic lookups of
    stored doubles — hash-exact."""
    last_pooled = (
        "last(pv, true)" if d.name == "spark" else "last_value(pv IGNORE NULLS)"
    )
    return f"""
WITH pooled AS (
  SELECT value AS v, CAST(COUNT(*) AS BIGINT) AS pc
  FROM events WHERE value IS NOT NULL GROUP BY value
),
pooled_cum AS (
  SELECT v, pc,
         CAST(SUM(pc) OVER (
           ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS pcum,
         CAST(SUM(pc) OVER () AS BIGINT) AS n_total
  FROM pooled
),
typed AS (
  SELECT event_type, value AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL GROUP BY event_type, value
),
typed_cum AS (
  SELECT event_type, v, c,
         CAST(SUM(c) OVER (
           PARTITION BY event_type
           ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum,
         CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n_g
  FROM typed
),
queries AS (
  SELECT event_type, v, c,
         {d.idiv('((2 * cum - c + 1) * n_total + 2 * n_g - 1)', '(2 * n_g)')}
           AS pos
  FROM typed_cum CROSS JOIN (SELECT DISTINCT n_total FROM pooled_cum) nt
),
lane AS (
  SELECT pcum AS pos, v AS pv,
         CAST(NULL AS STRING) AS event_type,
         CAST(NULL AS DOUBLE) AS v, CAST(NULL AS BIGINT) AS c, 0 AS tag
  FROM pooled_cum
  UNION ALL
  SELECT pos, CAST(NULL AS DOUBLE) AS pv, event_type, v, c, 1 AS tag
  FROM queries
),
filled AS (
  SELECT event_type, v, c, tag,
         {last_pooled} OVER (
           ORDER BY pos DESC, tag ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS v_norm
  FROM lane
)
SELECT event_type, v AS value, c AS n_rows, v_norm
FROM filled WHERE tag = 1
"""


def _register_quantile_norm():
    from ..registry import sql_query

    qn = _quantile_norm_sql
    sql_query(
        "q_quantile_norm",
        spark_sql=qn(SPARK).replace("CAST(NULL AS STRING)", "CAST(NULL AS STRING)"),
        duck_sql=qn(DUCK).replace("CAST(NULL AS STRING)", "CAST(NULL AS VARCHAR)"),
        tables=["events"],
        doc="Quantile normalization of per-type score distributions onto "
        "the pooled distribution (rank-based batch-effect correction): a "
        "value at doubled midrank m2 within its event_type maps to the "
        "pooled order statistic at ceil(m2·N/(2·n_g)). All work is at "
        "value-DOMAIN grain (per-value aggregates + cumulative windows, "
        "q_auc's boundedness class), and the index lookup is a "
        "union-and-backfill window instead of a range join. Ties share a "
        "midrank (deterministic, no within-tie order), arithmetic is "
        "integer, normalized values are order statistics of stored "
        "doubles — hash-exact.",
    )


_register_quantile_norm()


# ---------------------------------------------------------------------------
# Boxplot table — exact per-group five-number summaries with Tukey fences.
# ---------------------------------------------------------------------------


def _boxplot_sql(d) -> str:
    """Per-nation boxplot of customer account balances (cents): exact
    rank-based order statistics (q1/median/q3 at ceil(q*n) — the
    discrete lower-quantile convention, no interpolation so every value
    is a real data point and integer-exact), Tukey 1.5*IQR fences, and
    outlier counts — the distribution summary a BI layer draws, with
    fence comparisons done in exact integers (4*value vs 4*fence
    clears the /4 from 1.5*IQR = 6*IQR/4)."""
    return f"""
WITH vals AS (
  SELECT c_nationkey AS nation,
         CAST(round(c_acctbal * 100) AS BIGINT) AS v
  FROM customer
),
ranked AS (
  SELECT nation, v,
         ROW_NUMBER() OVER (PARTITION BY nation ORDER BY v) AS rk,
         COUNT(*) OVER (PARTITION BY nation) AS n
  FROM vals
),
qs AS (
  SELECT nation,
         CAST(MAX(n) AS BIGINT) AS n,
         CAST(MIN(v) AS BIGINT) AS lo,
         CAST(MAX(v) AS BIGINT) AS hi,
         CAST(MAX(CASE WHEN rk = {d.idiv('(n + 3)', '4')} THEN v END)
              AS BIGINT) AS q1,
         CAST(MAX(CASE WHEN rk = {d.idiv('(n + 1)', '2')} THEN v END)
              AS BIGINT) AS median,
         CAST(MAX(CASE WHEN rk = {d.idiv('(3 * n + 3)', '4')} THEN v END)
              AS BIGINT) AS q3
  FROM ranked GROUP BY nation
),
fenced AS (
  SELECT q.*,
         -- 4*fence keeps 1.5*IQR integral: lo_fence4 = 4*q1 - 6*(q3-q1)
         4 * q.q1 - 6 * (q.q3 - q.q1) AS lo_fence4,
         4 * q.q3 + 6 * (q.q3 - q.q1) AS hi_fence4
  FROM qs q
)
SELECT f.nation, f.n, f.lo, f.q1, f.median, f.q3, f.hi,
       CAST(f.q3 - f.q1 AS BIGINT) AS iqr,
       CAST(SUM(CASE WHEN 4 * v.v < f.lo_fence4
                       OR 4 * v.v > f.hi_fence4
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM fenced f JOIN vals v ON v.nation = f.nation
GROUP BY f.nation, f.n, f.lo, f.q1, f.median, f.q3, f.hi,
         f.lo_fence4, f.hi_fence4
ORDER BY f.nation
"""


def _register_boxplot():
    from ..functions.detsql import DUCK, SPARK
    from ..registry import sql_query

    sql_query(
        "q_boxplot_table",
        spark_sql=_boxplot_sql(SPARK),
        duck_sql=_boxplot_sql(DUCK),
        tables=["customer"],
        doc="Per-nation boxplot table over account balances: exact "
        "rank-based five-number summary (discrete lower-quantile "
        "convention — every statistic is a real data value, integer-"
        "exact), IQR, Tukey 1.5*IQR fences with comparisons cleared to "
        "integers (4v vs 4q1-6*IQR), and outlier counts — the BI "
        "distribution summary, exact where approx_percentile is not. "
        "Per-nation rank windows are GROUP-partitioned (scale with the "
        "largest group, never global); one re-join for the fence count.",
    )


_register_boxplot()


# ---------------------------------------------------------------------------
# Exact per-group mode — the missing classic aggregate, tie rule explicit.
# ---------------------------------------------------------------------------


def _mode_sql(d) -> str:
    """Per-nation modal order priority of customers' orders: exact counts,
    mode = max count with the LEXICALLY SMALLEST value on ties (the
    deterministic tie rule engines disagree on — DuckDB's mode() picks
    arbitrarily, Spark 4's mode() takes any; spelling the rank out makes
    both agree), plus the mode's share in ppm and the runner-up."""
    return f"""
WITH counts AS (
  SELECT c.c_nationkey AS nation, o.o_orderpriority AS prio,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey, o.o_orderpriority
),
ranked AS (
  SELECT nation, prio, n,
         ROW_NUMBER() OVER (PARTITION BY nation
                            ORDER BY n DESC, prio) AS rk,
         CAST(SUM(n) OVER (PARTITION BY nation) AS BIGINT) AS total
  FROM counts
)
SELECT a.nation,
       a.prio AS mode_priority,
       a.n AS mode_n,
       a.total,
       CAST({d.idiv('(a.n * 1000000)', 'a.total')} AS BIGINT)
         AS mode_share_ppm,
       b.prio AS runner_up,
       b.n AS runner_up_n
FROM ranked a LEFT JOIN ranked b ON b.nation = a.nation AND b.rk = 2
WHERE a.rk = 1
ORDER BY a.nation
"""


def _register_mode():
    from ..functions.detsql import DUCK, SPARK
    from ..registry import sql_query

    sql_query(
        "q_mode_stats",
        spark_sql=_mode_sql(SPARK),
        duck_sql=_mode_sql(DUCK),
        tables=["orders", "customer"],
        doc="Exact per-nation modal order priority with an EXPLICIT tie "
        "rule (max count, lexically smallest value — built-in mode() is "
        "tie-arbitrary in both engines, so the rank is spelled out), the "
        "mode's ppm share, and the runner-up — the categorical summary "
        "statistic missing from the classic aggregate family. One keyed "
        "count + nation-partitioned rank windows (bounded by |nations| x "
        "|priorities|).",
    )


_register_mode()
