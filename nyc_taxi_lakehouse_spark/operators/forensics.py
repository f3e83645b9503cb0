"""Forensic audits — the estimators and anomaly screens an audit team
runs when the row-level validation gates pass but the numbers still look
wrong.

Extends the reference's validation gates (data_quality_checks.py's
null/range assertions) and the existing distribution audits (q_benford
digit law, q_anomaly_mad robust outliers) with two more: robust
trimmed/winsorized means (the outlier-immune KPI the raw AVG
misreports) and duplicate-payment detection (the classic
accounts-payable double-bill screen). House discipline: exact integer
counts/cents, per-row DECIMAL(28,12) snaps before order-independent
sums, deterministic tie-breaks, no ln().
"""

from __future__ import annotations

from ..functions.detsql import DUCK, SPARK, Dialect
from ..registry import sql_query


# ---------------------------------------------------------------------------
# Trimmed and winsorized means — outlier-immune KPIs.
# ---------------------------------------------------------------------------


def _trimmed_sql(d: Dialect) -> str:
    """10% two-sided trim per event type: k = n DIV 10 rows dropped from
    each tail of the (value, event_id)-ordered sequence; the winsorized
    variant clamps the tails to the surviving boundary order statistics
    v_(k+1) and v_(n−k) instead of dropping them. Values are raw doubles,
    so every per-row contribution is snapped to DECIMAL(28,12) before the
    exact group sum (shuffle-order-independent); each mean is one final
    IEEE division. Tie-break by event_id makes ranks deterministic; ties
    share a value, so WHICH duplicate is trimmed never changes the sum."""
    return f"""
WITH base AS (
  SELECT event_type, value, event_id
  FROM events
  WHERE value IS NOT NULL AND event_id IS NOT NULL
),
ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM base
),
lims AS (
  SELECT event_type, n, {d.idiv('n', '10')} AS k FROM ranked
  GROUP BY event_type, n
),
bounds AS (
  SELECT r.event_type,
         MAX(CASE WHEN r.rn = l.k + 1 THEN r.value END) AS lo_clamp,
         MAX(CASE WHEN r.rn = l.n - l.k THEN r.value END) AS hi_clamp
  FROM ranked r JOIN lims l ON r.event_type = l.event_type
  GROUP BY r.event_type
),
agg AS (
  SELECT r.event_type, l.n, l.k,
         SUM(CAST(r.value AS DECIMAL(28,12))) AS sum_all,
         SUM(CASE WHEN r.rn > l.k AND r.rn <= l.n - l.k
                  THEN CAST(r.value AS DECIMAL(28,12)) END) AS sum_trim,
         SUM(CAST(
               CASE WHEN r.rn <= l.k THEN b.lo_clamp
                    WHEN r.rn > l.n - l.k THEN b.hi_clamp
                    ELSE r.value END
               AS DECIMAL(28,12))) AS sum_wins
  FROM ranked r
  JOIN lims l ON r.event_type = l.event_type
  JOIN bounds b ON r.event_type = b.event_type
  GROUP BY r.event_type, l.n, l.k
)
SELECT
  a.event_type,
  a.n,
  a.k AS trimmed_each_side,
  CAST(a.sum_all AS DOUBLE) / a.n AS mean_raw,
  CAST(a.sum_trim AS DOUBLE) / (a.n - 2 * a.k) AS mean_trimmed,
  CAST(a.sum_wins AS DOUBLE) / a.n AS mean_winsorized,
  b.lo_clamp AS winsor_lo,
  b.hi_clamp AS winsor_hi
FROM agg a JOIN bounds b ON a.event_type = b.event_type
ORDER BY a.event_type
"""


sql_query(
    "q_trimmed_mean",
    spark_sql=_trimmed_sql(SPARK),
    duck_sql=_trimmed_sql(DUCK),
    tables=["events"],
    doc="COUNT-based trimmed/winsorized means per event type: exactly "
    "k = n DIV 10 rows dropped (or clamped to the boundary order "
    "statistics) per tail on the (value, event_id) rank order — "
    "scipy.stats.trim_mean semantics, deterministic under ties. The "
    "estimator differs from q_trimmed_stats (which clips at the "
    "5%/95% percentile-VALUE band: its tail mass varies with ties and "
    "distribution shape; this one's is exactly k rows) — together they "
    "are the two standard robust-mean conventions. One grouped rank "
    "sort (5 types), DECIMAL-snapped exact sums. At 100 TB the grouped "
    "sort swaps for approx_percentile clamp bounds (q_anomaly_mad's "
    "degradation path).",
)


# ---------------------------------------------------------------------------
# Duplicate-payment screen — same payer, same amount, close in time.
# ---------------------------------------------------------------------------


def _double_pay_sql(d: Dialect) -> str:
    """Double-charge candidate screen: order pairs from the SAME customer
    within 7 days, emitting the exact cent delta and an exact-duplicate
    flag — the accounts-payable reviewer triages by delta (0 = classic
    double bill; small = re-bill with fee drift). The join is
    payer-bucketed AND time-bounded, so the pair space is Σ_c (orders in
    any 8-day window)², not |orders|² — the temporal analogue of
    llm/dedup.py's hash blocking. Pairs are (day, orderkey)-oriented so
    each incident appears once; all arithmetic is integer cents/days."""
    cents = "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
    day = f"CAST({d.idiv(d.epoch('o_orderdate'), '86400')} AS BIGINT)"
    return f"""
WITH pay AS (
  SELECT o_orderkey AS okey, o_custkey AS ckey,
         {cents} AS cents, {day} AS day_no
  FROM orders
  WHERE o_totalprice IS NOT NULL
),
hits AS (
  SELECT a.ckey,
         a.okey AS okey_first, b.okey AS okey_second,
         a.day_no AS day_first, b.day_no AS day_second,
         b.day_no - a.day_no AS gap_days,
         a.cents AS cents_first, b.cents AS cents_second,
         ABS(b.cents - a.cents) AS cents_delta,
         CASE WHEN a.cents = b.cents THEN 1 ELSE 0 END AS exact_dup
  FROM pay a
  JOIN pay b
    ON a.ckey = b.ckey
   AND (a.day_no < b.day_no OR (a.day_no = b.day_no AND a.okey < b.okey))
   AND b.day_no - a.day_no <= 7
)
SELECT ckey AS custkey,
       okey_first, okey_second, day_first, day_second, gap_days,
       cents_first, cents_second, cents_delta, exact_dup
FROM hits
ORDER BY custkey, okey_first, okey_second
"""


sql_query(
    "q_double_pay",
    spark_sql=_double_pay_sql(SPARK),
    duck_sql=_double_pay_sql(DUCK),
    tables=["orders"],
    doc="Double-charge candidate screen: same-customer order pairs ≤7 "
    "days apart with the exact cent delta and an exact-duplicate flag — "
    "the accounts-payable triage list (delta 0 = classic double bill). "
    "Payer-bucketed AND time-bounded pair generation (Σ per-payer "
    "window² pairs, the temporal analogue of llm/dedup.py's hash "
    "blocking), (day, orderkey)-oriented so each incident appears once, "
    "integer cents/days throughout — nothing floating crosses the gate.",
)


# ---------------------------------------------------------------------------
# XmR individuals control chart — Shewhart process monitoring.
# ---------------------------------------------------------------------------


def _xmr_sql(d: Dialect) -> str:
    """Individuals + moving-range (XmR) chart over the DAILY order-count
    series: center line = mean of x, limits = x̄ ± 2.66·mR̄ (the Shewhart
    individuals constant d2=1.128 folded into 3/1.128 = 2.6595…, rounded
    to the standard 2.66 used on every production chart). Counts are
    exact integers; x̄ and mR̄ are single divisions of exact sums; each
    limit and violation flag is the same IEEE tree in both engines.
    LAG runs over the day-grain series (bounded by the calendar)."""
    day = f"CAST({d.idiv(d.epoch('o_orderdate'), '86400')} AS BIGINT)"
    return f"""
WITH daily AS (
  SELECT {day} AS day_no, CAST(COUNT(*) AS BIGINT) AS x
  FROM orders GROUP BY {day}
),
mr AS (
  SELECT day_no, x,
         ABS(x - LAG(x) OVER (ORDER BY day_no)) AS mrange
  FROM daily
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(x) AS BIGINT) AS sum_x,
         CAST(SUM(mrange) AS BIGINT) AS sum_mr,
         CAST(COUNT(mrange) AS BIGINT) AS n_mr
  FROM mr
)
SELECT
  m.day_no,
  m.x,
  m.mrange,
  CAST(s.sum_x AS DOUBLE) / s.n_days AS center,
  CAST(s.sum_x AS DOUBLE) / s.n_days
    + 2.66 * (CAST(s.sum_mr AS DOUBLE) / s.n_mr) AS ucl,
  CAST(s.sum_x AS DOUBLE) / s.n_days
    - 2.66 * (CAST(s.sum_mr AS DOUBLE) / s.n_mr) AS lcl,
  CASE WHEN m.x > CAST(s.sum_x AS DOUBLE) / s.n_days
              + 2.66 * (CAST(s.sum_mr AS DOUBLE) / s.n_mr)
         OR m.x < CAST(s.sum_x AS DOUBLE) / s.n_days
              - 2.66 * (CAST(s.sum_mr AS DOUBLE) / s.n_mr)
       THEN 1 ELSE 0 END AS out_of_control
FROM mr m CROSS JOIN stats s
ORDER BY m.day_no
"""


sql_query(
    "q_control_chart",
    spark_sql=_xmr_sql(SPARK),
    duck_sql=_xmr_sql(DUCK),
    tables=["orders"],
    doc="Shewhart XmR individuals control chart over the daily order "
    "count: moving ranges via LAG, center line and ±2.66·mR̄ natural "
    "process limits, per-day out-of-control flags — the SPC monitor "
    "that separates common-cause noise from special-cause shifts "
    "(q_cusum_changepoint detects sustained drift; XmR flags "
    "point excursions). Day-grain series windows (calendar-bounded), "
    "exact integer counts, one 1-row stats broadcast.",
)
