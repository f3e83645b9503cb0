"""Statistical-inference operators, part 2 — nonparametric association and
distribution-shift tests built on exact integer/rational algebra.

Extends the reference's correlation analysis (ml_feature_engineering.py:
529-538) and the repo's existing inference family (q_cramers_v,
q_mann_kendall, q_ks_drift, q_ab_welch, q_spearman) with the classic
rank/contingency tests an analytics engine serving experimentation and
data-quality teams must answer. House discipline throughout: every
statistic is integer or rational until one final shared IEEE tree
(sqrt / divide are exact-rounded, so the hash gate holds cross-engine);
no ln() anywhere (not bit-stable across libm builds — the same reason
q_collocations ships ratio-PMI and q_drift_chisq ships χ² over PSI).
"""

from __future__ import annotations

from ..functions.detsql import DUCK, SPARK, Dialect
from ..registry import sql_query


# ---------------------------------------------------------------------------
# Kendall's tau-b — tie-corrected rank concordance from the contingency.
# ---------------------------------------------------------------------------


def _kendall_sql() -> str:
    """Tau-b between quantity and discount at the lineitem grain. Both
    variables are small-cardinality (≤50 × ≤11 distinct), so concordant /
    discordant pair counts come from the CELL table, not the row table:
    C = Σ_a c_a · Σ_{b.x<a.x, b.y<a.y} c_b (each discordant/concordant
    pair counted once via the strict x order), and the tie terms for the
    tau-b denominator are marginal Σ t(t−1). Everything is exact BIGINT;
    the two n0−n1 / n0−n2 factors are cast to DOUBLE before the product
    (their product can exceed 2^63) and meet in one sqrt."""
    return """
WITH pairs AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y
  FROM lineitem
),
cells AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM pairs GROUP BY x, y),
conc AS (
  SELECT CAST(COALESCE(SUM(a.c * b.c), 0) AS BIGINT) AS n_c
  FROM cells a JOIN cells b ON b.x < a.x AND b.y < a.y
),
disc AS (
  SELECT CAST(COALESCE(SUM(a.c * b.c), 0) AS BIGINT) AS n_d
  FROM cells a JOIN cells b ON b.x < a.x AND b.y > a.y
),
tx AS (
  SELECT CAST(SUM(t * (t - 1)) AS BIGINT) AS t2x
  FROM (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cells GROUP BY x) g
),
ty AS (
  SELECT CAST(SUM(t * (t - 1)) AS BIGINT) AS t2y
  FROM (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cells GROUP BY y) g
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells)
SELECT
  tot.n AS n_rows,
  conc.n_c AS concordant,
  disc.n_d AS discordant,
  2.0 * CAST(conc.n_c - disc.n_d AS DOUBLE)
    / SQRT(CAST(tot.n * (tot.n - 1) - tx.t2x AS DOUBLE)
           * CAST(tot.n * (tot.n - 1) - ty.t2y AS DOUBLE)) AS tau_b
FROM tot CROSS JOIN conc CROSS JOIN disc CROSS JOIN tx CROSS JOIN ty
"""


sql_query(
    "q_kendall_tau",
    spark_sql=_kendall_sql(),
    duck_sql=_kendall_sql(),
    tables=["lineitem"],
    doc="Kendall's tau-b (quantity vs discount), tie-corrected, computed "
    "on the ≤50×11 CELL table instead of the row table — concordant/"
    "discordant sums are a bounded cell self-join (≤561² comparisons "
    "regardless of corpus size), marginal tie terms Σt(t−1) exact "
    "BIGINT, one final sqrt over DOUBLE-cast factors (their product "
    "overflows int64 by design). The O(n²) pair scan never exists at "
    "any scale: the cell contraction IS the scale plan. Completes the "
    "rank-correlation family next to q_spearman (midranks) and "
    "q_mann_kendall (time-ordered S).",
)


# ---------------------------------------------------------------------------
# Mann-Whitney U — two-sample rank-sum test with tie-corrected variance.
# ---------------------------------------------------------------------------


def _mwu_sql() -> str:
    """U statistic for extendedprice between returnflag R and A. Midranks
    via the q_spearman doubling trick (rank2 = 2·avg_rank is always an
    integer) over the per-VALUE aggregate: rank2 = 2·(#smaller) + (#equal)
    + 1, a prefix walk over distinct price cents, never a row sort. The
    doubled rank-sum 2R_R stays BIGINT (≤ n(2n+1)); U and the tie-
    corrected normal z are one final IEEE tree: z = (2R_R − n_r(n_r+1)
    − n_r·n_a) / (2σ), σ² = n_r·n_a/12 · (n+1 − Σ(t³−t)/(n(n−1)))."""
    return """
WITH obs AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS grp
  FROM lineitem WHERE l_returnflag IN ('R', 'A')
),
vals AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS c, CAST(SUM(grp) AS BIGINT) AS c_r
  FROM obs GROUP BY v
),
ranked AS (
  SELECT c, c_r,
         CAST(2 * (SUM(c) OVER (ORDER BY v) - c) + c + 1 AS BIGINT) AS rank2
  FROM vals
),
agg AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c_r) AS BIGINT) AS n_r,
         CAST(SUM(c_r * rank2) AS BIGINT) AS r2_r,
         CAST(SUM(c * c * c - c) AS BIGINT) AS tie3
  FROM ranked
)
SELECT
  n AS n_rows,
  n_r,
  n - n_r AS n_a,
  CAST(r2_r - n_r * (n_r + 1) AS DOUBLE) / 2.0 AS u_r,
  CAST(r2_r - n_r * (n_r + 1) - n_r * (n - n_r) AS DOUBLE)
    / (2.0 * SQRT(CAST(n_r AS DOUBLE) * CAST(n - n_r AS DOUBLE) / 12.0
                  * (CAST(n + 1 AS DOUBLE)
                     - CAST(tie3 AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))))
    AS z_stat
FROM agg
"""


sql_query(
    "q_mannwhitney_u",
    spark_sql=_mwu_sql(),
    duck_sql=_mwu_sql(),
    tables=["lineitem"],
    doc="Mann-Whitney U rank-sum test (price, returned R vs accepted A): "
    "the nonparametric sibling of q_ab_welch — no normality assumption, "
    "robust to the heavy price tail. Midranks kept exact via the "
    "doubled-rank trick over the per-value aggregate (prefix walk, no "
    "row sort; at cluster scale the walk range-partitions into a two-"
    "pass offset sweep), tie-corrected σ from exact Σ(t³−t), one final "
    "IEEE tree for U and z.",
)


# ---------------------------------------------------------------------------
# Goodman-Kruskal lambda — PRE association, zero transcendental functions.
# ---------------------------------------------------------------------------


def _gk_lambda_sql(d: Dialect) -> str:
    """λ(Y|X): proportional reduction in prediction error of Y from
    knowing X, using modal prediction — (Σ_x max_y c_xy − max_y c_·y) /
    (n − max_y c_·y). Pure integer contingency algebra (the log-free
    complement to entropy-based MI, per the house no-ln rule); both
    directions plus the symmetric average emitted."""
    ep = d.epoch("ts")
    hour = f"CAST({d.idiv(f'({ep} % 86400)', '3600')} AS BIGINT)"
    return f"""
WITH obs AS (
  SELECT event_type AS x, {hour} AS y, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, {hour}
),
rowmax AS (SELECT CAST(SUM(m) AS BIGINT) AS sum_rowmax
           FROM (SELECT MAX(c) AS m FROM obs GROUP BY x) g),
colmax AS (SELECT CAST(SUM(m) AS BIGINT) AS sum_colmax
           FROM (SELECT MAX(c) AS m FROM obs GROUP BY y) g),
margy AS (SELECT CAST(MAX(t) AS BIGINT) AS max_coltot
          FROM (SELECT SUM(c) AS t FROM obs GROUP BY y) g),
margx AS (SELECT CAST(MAX(t) AS BIGINT) AS max_rowtot
          FROM (SELECT SUM(c) AS t FROM obs GROUP BY x) g),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM obs)
SELECT
  tot.n AS n_rows,
  rowmax.sum_rowmax,
  colmax.sum_colmax,
  margy.max_coltot,
  margx.max_rowtot,
  CAST(rowmax.sum_rowmax - margy.max_coltot AS DOUBLE)
    / CAST(tot.n - margy.max_coltot AS DOUBLE) AS lambda_y_given_x,
  CAST(colmax.sum_colmax - margx.max_rowtot AS DOUBLE)
    / CAST(tot.n - margx.max_rowtot AS DOUBLE) AS lambda_x_given_y,
  CAST(rowmax.sum_rowmax - margy.max_coltot
       + colmax.sum_colmax - margx.max_rowtot AS DOUBLE)
    / CAST(2 * tot.n - margy.max_coltot - margx.max_rowtot AS DOUBLE)
    AS lambda_symmetric
FROM tot CROSS JOIN rowmax CROSS JOIN colmax CROSS JOIN margy CROSS JOIN margx
"""


sql_query(
    "q_gk_lambda",
    spark_sql=_gk_lambda_sql(SPARK),
    duck_sql=_gk_lambda_sql(DUCK),
    tables=["events"],
    doc="Goodman-Kruskal lambda (event_type ↔ hour-of-day): proportional-"
    "reduction-in-error association via modal prediction — the log-free "
    "alternative to mutual information (ln() is banned from the hash "
    "gate), directional both ways plus symmetric. Pure BIGINT "
    "contingency algebra on the k₁×k₂ cell table (one keyed aggregate, "
    "four 1-row broadcasts), two final IEEE divisions. Reads next to "
    "q_cramers_v: V measures departure-from-independence, λ measures "
    "predictive usefulness — a flat-margin table can have V>0, λ=0.",
)


# ---------------------------------------------------------------------------
# Total-variation drift — distribution shift with exact integer numerators.
# ---------------------------------------------------------------------------


def _tv_drift_sql(d: Dialect) -> str:
    """TV distance between the token distributions of the corpus's first
    and second doc_id halves: TV = ½ Σ_t |p_t − q_t|. The trick that
    keeps it exact: |c1·n2 − c2·n1| is an exact BIGINT numerator over the
    common denominator n1·n2, so the sum happens in integer space and
    ONE final division produces the statistic — no per-term doubles, no
    accumulation-order dependence, no DECIMAL snapping needed. Per-token
    absolute gaps are emitted for the top offenders alongside."""
    tok = d.all_token_rows("documents")
    return f"""
WITH toks AS ({tok}),
split_docs AS (
  SELECT CAST(MAX(doc_id) AS BIGINT) AS max_id FROM documents
),
counts AS (
  SELECT token,
         CAST(SUM(CASE WHEN doc_id * 2 <= s.max_id THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN doc_id * 2 > s.max_id THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM toks CROSS JOIN split_docs s
  GROUP BY token
),
tot AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
  FROM counts
),
gaps AS (
  SELECT c.token, c.c1, c.c2, t.n1, t.n2,
         ABS(c.c1 * t.n2 - c.c2 * t.n1) AS num
  FROM counts c CROSS JOIN tot t
)
SELECT
  MAX(n1) AS n_tokens_first,
  MAX(n2) AS n_tokens_second,
  CAST(COUNT(*) AS BIGINT) AS vocab,
  CAST(SUM(num) AS DOUBLE) / (2.0 * CAST(MAX(n1) AS DOUBLE) * CAST(MAX(n2) AS DOUBLE))
    AS tv_distance,
  MAX(CAST(num AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
    AS max_token_gap
FROM gaps
"""


sql_query(
    "q_tv_drift",
    spark_sql=_tv_drift_sql(SPARK),
    duck_sql=_tv_drift_sql(DUCK),
    tables=["documents"],
    doc="Total-variation distance between first-half and second-half "
    "token distributions — the corpus-drift gate a training-data "
    "pipeline runs between crawl snapshots (TV bounds every downstream "
    "classifier's accuracy shift). The |c1·n2 − c2·n1| integer-numerator "
    "form keeps the whole sum in BIGINT over a common denominator: "
    "exact, shuffle-order-independent, one final division — where KL/"
    "PSI would need banned ln() and JSD would need per-term doubles. "
    "One token explode + one keyed agg + two 1-row broadcasts.",
)
