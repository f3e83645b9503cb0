"""Commerce / market-structure analytics — concentration and price-index
operators over the order book.

Extends the reference's revenue analytics (comprehensive_analytics.py's
zone revenue rollups) with the two questions a marketplace team asks next:
how concentrated is supply (HHI), and how are prices moving once mix
shifts are held fixed (unit-value index). House arithmetic discipline:
exact integers / snapped decimals until one final division per statistic.
"""

from __future__ import annotations

from ..functions.detsql import DUCK, SPARK, Dialect
from ..registry import sql_query


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman concentration of supplier revenue, by month.
# ---------------------------------------------------------------------------


def _hhi_sql(d: Dialect) -> str:
    """Monthly supplier-revenue HHI = Σ_i (r_i/R)² = Σr_i²/R². Revenues
    are rounded to EXACT integer dollars first (DECIMAL cents → round 0),
    so Σr_i² and R² are exact (Σr_i² ≤ ~8×10¹³ at sf0.1 — inside the
    2^53 cast-safe window; coarsen to k$ beyond sf1). One final division
    per month; the equivalent-competitor count 1/HHI comes from the same
    tree. Interpretation thresholds (DOJ: 0.15/0.25) emitted as a flag."""
    month = f"CAST({d.idiv(d.epoch('l_shipdate'), '2592000')} AS BIGINT)"
    return f"""
WITH rev AS (
  SELECT {month} AS month_no,
         l_suppkey,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 0) AS BIGINT)
           AS r_dollars
  FROM lineitem
  GROUP BY {month}, l_suppkey
),
agg AS (
  SELECT month_no,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         CAST(SUM(r_dollars) AS BIGINT) AS total_r,
         CAST(SUM(r_dollars * r_dollars) AS BIGINT) AS sum_r2
  FROM rev
  GROUP BY month_no
)
SELECT
  month_no,
  n_suppliers,
  total_r AS total_revenue_dollars,
  CAST(sum_r2 AS DOUBLE) / (CAST(total_r AS DOUBLE) * CAST(total_r AS DOUBLE))
    AS hhi,
  (CAST(total_r AS DOUBLE) * CAST(total_r AS DOUBLE)) / CAST(sum_r2 AS DOUBLE)
    AS equivalent_competitors,
  CASE
    WHEN CAST(sum_r2 AS DOUBLE)
         / (CAST(total_r AS DOUBLE) * CAST(total_r AS DOUBLE)) >= 0.25
      THEN 'high'
    WHEN CAST(sum_r2 AS DOUBLE)
         / (CAST(total_r AS DOUBLE) * CAST(total_r AS DOUBLE)) >= 0.15
      THEN 'moderate'
    ELSE 'unconcentrated'
  END AS concentration_band
FROM agg
ORDER BY month_no
"""


sql_query(
    "q_hhi",
    spark_sql=_hhi_sql(SPARK),
    duck_sql=_hhi_sql(DUCK),
    tables=["lineitem"],
    doc="Monthly Herfindahl-Hirschman concentration of supplier revenue "
    "(HHI, equivalent-competitor count 1/HHI, DOJ band) — the market-"
    "structure monitor next to q_gini_concentration (customer side) and "
    "q_skew_report (data side): the same Σshare² that predicts both "
    "pricing power and partition skew. Exact integer-dollar revenues "
    "(DECIMAL-cents rounding, cast-safe to sf1), two keyed aggregates, "
    "one final division per month.",
)


# ---------------------------------------------------------------------------
# Unit-value price index — Laspeyres with base-month quantity basket.
# ---------------------------------------------------------------------------


def _uvi_sql(d: Dialect) -> str:
    """Fixed-basket unit-value index per month: part p's monthly unit
    value u_tp = revenue/quantity (the trade-statistics 'unit value' —
    mix WITHIN a part still moves it, which is why the basket is held
    fixed ACROSS parts). Index_t = Σ_p q0_p·u_tp / Σ_p q0_p·u_0p over
    parts present in BOTH months. Per-part terms are EXACT BIGINT
    milli-cents via floor integer division (q0·rev_cents·1000 DIV qty —
    deterministic in both engines, unlike a double→DECIMAL snap whose
    half-cent ties round differently in Spark vs DuckDB); products stay
    ≤ ~5×10¹⁴ at sf0.1 (< 2^63), the cross-part sums are exact BIGINTs,
    and the only IEEE ops are the two final dollar casts + one index
    division."""
    month = f"CAST({d.idiv(d.epoch('l_shipdate'), '2592000')} AS BIGINT)"
    cur_mc = d.idiv("b.qty0 * p.rev_cents * 1000", "p.qty")
    base_mc = d.idiv("b.qty0 * b.rev0 * 1000", "b.qty0")
    return f"""
WITH pm AS (
  SELECT {month} AS month_no,
         l_partkey,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS rev_cents,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem
  GROUP BY {month}, l_partkey
),
base AS (
  SELECT l_partkey, rev_cents AS rev0, qty AS qty0
  FROM pm WHERE month_no = (SELECT MIN(month_no) FROM pm)
),
terms AS (
  SELECT p.month_no,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(CAST({cur_mc} AS BIGINT)) AS BIGINT) AS cur_mc,
         CAST(SUM(CAST({base_mc} AS BIGINT)) AS BIGINT) AS base_mc
  FROM pm p JOIN base b ON p.l_partkey = b.l_partkey
  GROUP BY p.month_no
)
SELECT
  month_no,
  n_parts,
  CAST(cur_mc AS DOUBLE) / 100000.0 AS basket_cost_dollars,
  CAST(base_mc AS DOUBLE) / 100000.0 AS base_cost_dollars,
  100.0 * CAST(cur_mc AS DOUBLE) / CAST(base_mc AS DOUBLE) AS unit_value_index
FROM terms
ORDER BY month_no
"""


sql_query(
    "q_unit_value_index",
    spark_sql=_uvi_sql(SPARK),
    duck_sql=_uvi_sql(DUCK),
    tables=["lineitem"],
    doc="Fixed-basket (Laspeyres-form) unit-value price index by month: "
    "reprice the base month's per-part quantity basket at each month's "
    "unit values, over parts present in both — the mix-adjusted price "
    "trend a naive revenue/quantity ratio confounds (Simpson's paradox "
    "in time: q_simpson_check's sibling). Per-part terms DECIMAL-"
    "snapped before the cross-part sum (order-independent), unit "
    "values are single IEEE divisions of exact integer cents/quantity. "
    "Two keyed aggregates + a broadcast base-month join.",
)


# ---------------------------------------------------------------------------
# Order-to-ship lead time — fulfillment SLA percentiles by month.
# ---------------------------------------------------------------------------


def _lead_time_sql(d: Dialect) -> str:
    """Integer day gap order→ship per lineitem, exact discrete percentiles
    per order month. Gaps are exact BIGINTs (epoch floor-div 86400 twice,
    then subtraction), so percentile_disc picks actual data values — no
    interpolation arithmetic, nothing for IEEE to disagree on. SLA breach
    share (>30d) is an exact conditional count ratio."""
    o_day = f"CAST({d.idiv(d.epoch('o.o_orderdate'), '86400')} AS BIGINT)"
    s_day = f"CAST({d.idiv(d.epoch('l.l_shipdate'), '86400')} AS BIGINT)"
    month = f"CAST({d.idiv(d.epoch('o.o_orderdate'), '2592000')} AS BIGINT)"
    if d.name == "spark":
        def disc(p: str) -> str:
            return f"percentile_disc({p}) WITHIN GROUP (ORDER BY gap_days)"
    else:
        def disc(p: str) -> str:
            return f"quantile_disc(gap_days, {p})"
    return f"""
WITH gaps AS (
  SELECT {month} AS month_no,
         {s_day} - {o_day} AS gap_days
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
)
SELECT
  month_no,
  CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST({disc('0.50')} AS BIGINT) AS p50_days,
  CAST({disc('0.90')} AS BIGINT) AS p90_days,
  CAST({disc('0.99')} AS BIGINT) AS p99_days,
  CAST(MAX(gap_days) AS BIGINT) AS max_days,
  CAST(SUM(CASE WHEN gap_days > 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_over_30d,
  CAST(SUM(CASE WHEN gap_days > 30 THEN 1 ELSE 0 END) AS DOUBLE)
    / COUNT(*) AS share_over_30d
FROM gaps
GROUP BY month_no
ORDER BY month_no
"""


sql_query(
    "q_lead_time",
    spark_sql=_lead_time_sql(SPARK),
    duck_sql=_lead_time_sql(DUCK),
    tables=["orders", "lineitem"],
    doc="Fulfillment lead-time SLA monitor: exact p50/p90/p99/max of the "
    "order→ship day gap per order month, plus the >30-day breach share — "
    "the supply-chain twin of q_value_percentiles. Gaps are exact BIGINT "
    "day counts (floor-div epochs), percentile_disc picks real data "
    "values, breach share is an exact count ratio: nothing "
    "interpolation-dependent crosses the hash gate. Same 100 TB "
    "degradation path as q_value_percentiles: approx_percentile sketches "
    "replace the grouped sort.",
)


# ---------------------------------------------------------------------------
# ABC inventory classification — cumulative-revenue Pareto classes.
# ---------------------------------------------------------------------------


def _abc_sql(d: Dialect) -> str:
    """Classic ABC: parts ranked by exact integer-cent revenue, class A =
    parts covering the first 80% of cumulative revenue, B to 95%, C the
    tail. The cumulative walk runs over the PER-PART AGGREGATE (bounded
    by |part|, q_gini_concentration's whitelisted class — the corpus
    never sorts globally); the (revenue DESC, partkey) order makes the
    prefix deterministic under ties. Output: 3 class rows with part
    counts, revenue, share — plus each class's rank boundary."""
    return """
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem GROUP BY l_partkey
),
walked AS (
  SELECT l_partkey, cents,
         SUM(cents) OVER (ORDER BY cents DESC, l_partkey) AS cum_cents,
         SUM(cents) OVER () AS tot_cents,
         ROW_NUMBER() OVER (ORDER BY cents DESC, l_partkey) AS rk
  FROM rev
),
classed AS (
  SELECT rk, cents,
         CASE WHEN cum_cents * 100 <= tot_cents * 80 THEN 'A'
              WHEN cum_cents * 100 <= tot_cents * 95 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM walked
)
SELECT
  abc_class,
  CAST(COUNT(*) AS BIGINT) AS n_parts,
  CAST(SUM(cents) AS BIGINT) AS revenue_cents,
  CAST(SUM(cents) AS DOUBLE) / CAST(MAX(x.tot) AS DOUBLE) AS revenue_share,
  CAST(MIN(rk) AS BIGINT) AS first_rank,
  CAST(MAX(rk) AS BIGINT) AS last_rank
FROM classed CROSS JOIN (SELECT CAST(SUM(cents) AS BIGINT) AS tot FROM rev) x
GROUP BY abc_class
ORDER BY abc_class
"""


sql_query(
    "q_abc_analysis",
    spark_sql=_abc_sql(SPARK),
    duck_sql=_abc_sql(DUCK),
    tables=["lineitem"],
    doc="ABC inventory classification: parts ranked by exact integer-cent "
    "revenue, class boundaries at 80%/95% cumulative share (integer "
    "cross-multiplication — no float thresholds), per-class part counts, "
    "revenue, share, and rank boundaries — the Pareto working-capital "
    "split next to q_gini_concentration (inequality index) and "
    "q_pareto_frontier (dominance). The cumulative walk runs over the "
    "per-part aggregate, bounded by |part| not |lineitem| (whitelisted "
    "q_gini class); ties broken by partkey for a deterministic prefix.",
)


# ---------------------------------------------------------------------------
# Arc price elasticity — demand response between two pricing periods.
# ---------------------------------------------------------------------------


def _elasticity_sql(d) -> str:
    """Arc (midpoint) price elasticity of demand per part between the
    first and second halves of the order calendar: with per-period
    quantity q and revenue r (exact cents), the midpoint formula
    ((q_b-q_a)/(q_b+q_a)) / ((p_b-p_a)/(p_b+p_a)) with p = r/q clears
    its inner denominators exactly — elasticity = [(q_b-q_a)*(r_b*q_a +
    r_a*q_b)] / [(q_b+q_a)*(r_b*q_a - r_a*q_b)] — so numerator and
    denominator are exact BIGINTs (safe to ~1e14 cent*qty products,
    ~sf1; DECIMAL(38,0) beyond) and the ratio is ONE double division.
    The elastic/inelastic class is decided by |num| vs |den| in exact
    integers — no float ever classifies."""
    return f"""
WITH lines AS (
  SELECT l_partkey AS pk,
         CASE WHEN o_orderdate < DATE '1996-01-01' THEN 'a' ELSE 'b' END
           AS period,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
per AS (
  SELECT pk, period,
         CAST(SUM(qty) AS BIGINT) AS q,
         CAST(SUM(cents) AS BIGINT) AS r
  FROM lines GROUP BY pk, period
),
both_p AS (
  SELECT a.pk,
         a.q AS q_a, a.r AS r_a, b.q AS q_b, b.r AS r_b,
         (b.q - a.q) * (b.r * a.q + a.r * b.q) AS num,
         (b.q + a.q) * (b.r * a.q - a.r * b.q) AS den
  FROM per a JOIN per b
    ON a.pk = b.pk AND a.period = 'a' AND b.period = 'b'
)
SELECT pk AS partkey, q_a, q_b, r_a, r_b,
       CAST(num AS BIGINT) AS num,
       CAST(den AS BIGINT) AS den,
       CAST(num AS DOUBLE) / CAST(NULLIF(den, 0) AS DOUBLE) AS elasticity,
       CASE WHEN den = 0 THEN 'undefined'
            WHEN ABS(num) > ABS(den) THEN 'elastic'
            WHEN ABS(num) = ABS(den) THEN 'unit'
            ELSE 'inelastic' END AS demand_class
FROM both_p
ORDER BY pk
"""


def _register_elasticity():
    from ..functions.detsql import DUCK, SPARK
    from ..registry import sql_query

    sql_query(
        "q_price_elasticity",
        spark_sql=_elasticity_sql(SPARK),
        duck_sql=_elasticity_sql(DUCK),
        tables=["lineitem", "orders"],
        doc="Arc price elasticity of demand per part between the two "
        "halves of the order calendar (midpoint formula on exact integer "
        "quantity and revenue-cent sums — clearing the p = r/q inner "
        "denominators keeps numerator and denominator exact BIGINT, the "
        "ratio is one double division, and the elastic/unit/inelastic "
        "class is decided by |num| vs |den| in exact integers). The "
        "demand-response companion to q_unit_value_index (price level) "
        "and q_hhi (market structure). Corpus-scale work: the orderkey-"
        "partitioned join + one (part, period) aggregate; the period "
        "pivot is a part-keyed self-join of the aggregate.",
    )


_register_elasticity()


# ---------------------------------------------------------------------------
# Price / volume / mix bridge — period-over-period revenue decomposition.
# ---------------------------------------------------------------------------


def _pvm_sql(d) -> str:
    """Revenue-change bridge per brand between the two calendar halves:
    delta R decomposed into PRICE (q_b * (p_b - p_a)), PURE VOLUME
    (r_a * (Q_b - Q_a)/Q_a, the brand's base revenue scaled by total-
    market growth) and MIX (the residual volume effect from share
    shift), with p = r/q unit values. Every effect is formed as an
    exact-integer numerator over an exact denominator (clearing the
    p = r/q and Q_b/Q_a fractions), so the three effects sum to the
    exact delta — the identity the serial test asserts. The FP&A bridge
    behind 'how much of the revenue move was pricing vs demand vs
    portfolio shift', completing q_unit_value_index (price level) and
    q_price_elasticity (demand response)."""
    return f"""
WITH lines AS (
  SELECT p.p_brand AS brand,
         CASE WHEN o.o_orderdate < DATE '1996-01-01' THEN 'a' ELSE 'b' END
           AS period,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
),
per AS (
  SELECT brand, period,
         CAST(SUM(qty) AS BIGINT) AS q,
         CAST(SUM(cents) AS BIGINT) AS r
  FROM lines GROUP BY brand, period
),
tot AS (
  SELECT CAST(SUM(CASE WHEN period = 'a' THEN q ELSE 0 END) AS BIGINT) AS tq_a,
         CAST(SUM(CASE WHEN period = 'b' THEN q ELSE 0 END) AS BIGINT) AS tq_b
  FROM per
),
wide AS (
  SELECT a.brand,
         a.q AS q_a, a.r AS r_a, b.q AS q_b, b.r AS r_b,
         t.tq_a, t.tq_b
  FROM per a
  JOIN per b ON a.brand = b.brand AND a.period = 'a' AND b.period = 'b'
  CROSS JOIN tot t
)
SELECT brand, q_a, q_b, r_a, r_b, tq_a, tq_b,
       CAST(r_b - r_a AS BIGINT) AS delta_cents,
       -- price effect: q_b*(p_b - p_a) = (r_b*q_a - r_a*q_b)/q_a
       CAST(r_b * q_a - r_a * q_b AS BIGINT) AS price_num,
       CAST((CAST(r_b * q_a - r_a * q_b AS DOUBLE))
         / CAST(q_a AS DOUBLE) AS DOUBLE) AS price_eff_cents,
       -- pure volume: r_a*(tq_b - tq_a)/tq_a
       CAST(r_a * (tq_b - tq_a) AS BIGINT) AS volume_num,
       CAST(CAST(r_a * (tq_b - tq_a) AS DOUBLE)
         / CAST(tq_a AS DOUBLE) AS DOUBLE) AS volume_eff_cents,
       -- mix: p_a*(q_b - q_a*tq_b/tq_a) = r_a*(q_b*tq_a - q_a*tq_b)/(q_a*tq_a)
       CAST(r_a * (q_b * tq_a - q_a * tq_b) AS BIGINT) AS mix_num,
       CAST(CAST(r_a AS DOUBLE) * CAST(q_b * tq_a - q_a * tq_b AS DOUBLE)
         / (CAST(q_a AS DOUBLE) * CAST(tq_a AS DOUBLE)) AS DOUBLE)
         AS mix_eff_cents
FROM wide
ORDER BY brand
"""


def _register_pvm():
    from ..functions.detsql import DUCK, SPARK
    from ..registry import sql_query

    sql_query(
        "q_price_volume_mix",
        spark_sql=_pvm_sql(SPARK),
        duck_sql=_pvm_sql(DUCK),
        tables=["lineitem", "orders", "part"],
        doc="Price/volume/mix revenue bridge per brand between calendar "
        "halves: delta revenue decomposed into price (q_b*(p_b-p_a)), "
        "pure volume (base revenue x total-market growth), and mix "
        "(share-shift residual), each formed as an exact integer "
        "numerator over an exact denominator so the three effects sum "
        "EXACTLY to the delta (identity asserted in the serial test). "
        "The FP&A waterfall behind pricing-vs-demand attribution, "
        "completing q_unit_value_index and q_price_elasticity. Plan: "
        "the orderkey join + a broadcast part-dimension join, one "
        "(brand, period) aggregate; the 25-brand bridge algebra is "
        "corpus-size-independent.",
    )


_register_pvm()
