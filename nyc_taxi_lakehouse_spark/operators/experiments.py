"""Experimentation-platform operators, part 2 — randomization inference and
experiment sizing.

Completes the experimentation suite (q_ab_welch fixed-horizon test, q_ab_srm
validity gate, q_sprt sequential monitor, q_cuped variance reduction,
q_permutation_test adds the assumption-free significance readout, q_power_mde
the before-you-launch sizing readout). House discipline: exact integer /
decimal moments until one final shared IEEE tree; no erf/ln anywhere; the
Monte-Carlo randomization is hash-derived (md5 per (user, replicate)) so the
whole distribution is deterministic and oracle-checkable.
"""

from __future__ import annotations

from ..functions.detsql import DUCK, SPARK, Dialect, dsum, dxsum2
from ..registry import sql_query

_R = 128  # randomization replicates


def _perm_sql(d: Dialect) -> str:
    """Hash-randomized approximate permutation test for the error-first
    cohort effect on per-user purchase counts (the q_cmh exposure/outcome
    pair, tested without any distributional assumption). Replicate b
    relabels each user by u = md5(user:b) mod 1e6 < p1_ppm — iid
    relabeling at the OBSERVED treated fraction (the unconditional
    randomization-test variant: group sizes vary binomially around n1,
    documented; degenerate all-one-arm replicates count as extreme —
    conservative). The |T_r| >= |T_obs| comparison is EXACT integer
    cross-multiplication — |s1r*n0r - s0r*n1r|*(n1*n0) vs
    |s1*n0 - s0*n1|*(n1r*n0r) — so the p-value involves no floats at
    all. BIGINT bound: s*n*(n*n) — safe to ~30k users at ~10 purchases
    each; DECIMAL(38,0) is the documented swap beyond."""
    us = d.epoch_us("ts")
    s = "STRING" if d.name == "spark" else "VARCHAR"
    if d.name == "spark":
        reps = f"SELECT explode(sequence(0, {_R - 1})) AS b"
    else:
        reps = f"SELECT unnest(generate_series(0, {_R - 1})) AS b"
    u = d.md5_int32(
        f"concat(CAST(p.user_id AS {s}), chr(58), CAST(r.b AS {s}))"
    )
    return f"""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN MIN(CASE WHEN event_type = 'error' THEN {us} END)
                   = MIN({us}) THEN 1 ELSE 0 END AS g,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY user_id
),
obs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(g) AS BIGINT) AS n1,
         CAST(COUNT(*) - SUM(g) AS BIGINT) AS n0,
         CAST(SUM(g * y) AS BIGINT) AS s1,
         CAST(SUM((1 - g) * y) AS BIGINT) AS s0
  FROM per_user
),
reps AS ({reps}),
relabeled AS (
  SELECT r.b,
         CASE WHEN ({u} % 1000000)
                   < {d.idiv("(o.n1 * 1000000)", "o.n")}
              THEN 1 ELSE 0 END AS gr,
         p.y
  FROM per_user p CROSS JOIN reps r CROSS JOIN obs o
),
rep_stats AS (
  SELECT b,
         CAST(SUM(gr) AS BIGINT) AS n1r,
         CAST(COUNT(*) - SUM(gr) AS BIGINT) AS n0r,
         CAST(SUM(gr * y) AS BIGINT) AS s1r,
         CAST(SUM((1 - gr) * y) AS BIGINT) AS s0r
  FROM relabeled GROUP BY b
),
flags AS (
  SELECT CASE
           WHEN r.n1r = 0 OR r.n0r = 0 THEN 1
           WHEN ABS(r.s1r * r.n0r - r.s0r * r.n1r) * (o.n1 * o.n0)
                >= ABS(o.s1 * o.n0 - o.s0 * o.n1) * (r.n1r * r.n0r)
           THEN 1 ELSE 0 END AS extreme
  FROM rep_stats r CROSS JOIN obs o
)
SELECT o.n AS n_users, o.n1, o.n0, o.s1, o.s0,
       CAST(o.s1 AS DOUBLE) / CAST(NULLIF(o.n1, 0) AS DOUBLE)
         - CAST(o.s0 AS DOUBLE) / CAST(NULLIF(o.n0, 0) AS DOUBLE) AS t_obs,
       CAST({_R} AS BIGINT) AS n_replicates,
       CAST(SUM(f.extreme) AS BIGINT) AS n_extreme,
       CAST({d.idiv(f"((1 + SUM(f.extreme)) * 1000000)", str(_R + 1))}
            AS BIGINT) AS p_ppm
FROM flags f CROSS JOIN obs o
GROUP BY o.n, o.n1, o.n0, o.s1, o.s0
"""


sql_query(
    "q_permutation_test",
    spark_sql=_perm_sql(SPARK),
    duck_sql=_perm_sql(DUCK),
    tables=["events"],
    doc="Hash-randomized permutation test (128 deterministic replicates) "
    "for the error-first cohort's effect on per-user purchase counts — "
    "the assumption-free significance companion to q_ab_welch (normal "
    "theory) and q_mannwhitney_u (rank). Relabeling is md5-derived per "
    "(user, replicate) at the observed treated fraction, so the whole "
    "Monte-Carlo distribution is reproducible and oracle-checkable; the "
    "|T_r| >= |T_obs| comparison is exact integer cross-multiplication — "
    "the p-value never touches a float. Corpus-scale work: one user-keyed "
    "aggregate, then a 128x map-only fanout of the USER GRAIN (not the "
    "event grain) with map-side partial aggregation down to 128 rows. "
    "BIGINT-safe to ~3e4 users; DECIMAL(38,0) swap documented.",
)


# Two-sided alpha=0.05, power=0.80 normal quantiles; their sum and its
# square are precomputed in Python so both engines see identical literals
# (POWER() is not guaranteed identically rounded; x*x with a literal is).
_ZA = 1.959963984540054
_ZB = 0.8416212335729143
_ZS = repr(_ZA + _ZB)
_ZS2 = repr((_ZA + _ZB) * (_ZA + _ZB))


def _power_sql() -> str:
    """Experiment sizing readout per event_type on the q_ab_welch
    assignment: per-arm n / mean / unbiased variance from exact decimal
    moment sums, the minimum detectable effect at the CURRENT sample
    size (alpha=.05 two-sided, power=.80), the relative MDE vs the
    control mean, and the required per-arm n to detect a 1% relative
    lift. All normal quantiles are compile-time literals; every ratio
    is one shared IEEE tree over exact moments."""
    var = (
        "((CAST({n} AS DOUBLE) * {sxx} - {sx} * {sx})"
        " / (CAST({n} AS DOUBLE) * (CAST({n} AS DOUBLE) - 1)))"
    )
    va = var.format(n="n_a", sx="sx_a", sxx="sxx_a")
    vb = var.format(n="n_b", sx="sx_b", sxx="sxx_b")
    mean_a = "(sx_a / CAST(n_a AS DOUBLE))"
    mde = f"({_ZS} * SQRT({va} / CAST(n_a AS DOUBLE) + {vb} / CAST(n_b AS DOUBLE)))"
    return f"""
WITH sums AS (
  SELECT
    event_type,
    CAST(user_id % 2 AS INT) AS variant,
    COUNT(*) AS n,
    {dsum('value', scale=6)} AS sx,
    {dxsum2('value', 'value', s1=6, s2=6)} AS sxx
  FROM events
  GROUP BY event_type, CAST(user_id % 2 AS INT)
),
ab AS (
  SELECT a.event_type,
         a.n AS n_a, a.sx AS sx_a, a.sxx AS sxx_a,
         b.n AS n_b, b.sx AS sx_b, b.sxx AS sxx_b
  FROM sums a JOIN sums b
    ON a.event_type = b.event_type AND a.variant = 0 AND b.variant = 1
  WHERE a.n >= 2 AND b.n >= 2
)
SELECT
  event_type,
  CAST(n_a AS BIGINT) AS n_a,
  CAST(n_b AS BIGINT) AS n_b,
  {mean_a} AS mean_a,
  sx_b / CAST(n_b AS DOUBLE) AS mean_b,
  {va} AS var_a,
  {vb} AS var_b,
  {mde} AS mde_abs,
  {mde} / NULLIF({mean_a}, 0.0) AS mde_rel,
  CAST(CEIL({_ZS2} * ({va} + {vb})
            / NULLIF(0.0001 * {mean_a} * {mean_a}, 0.0)) AS BIGINT)
    AS n_per_arm_for_1pct
FROM ab
"""


sql_query(
    "q_power_mde",
    spark_sql=_power_sql(),
    duck_sql=_power_sql(),
    tables=["events"],
    doc="Experiment power / sizing readout per event_type on the "
    "q_ab_welch user-parity assignment: minimum detectable effect at the "
    "current n (alpha=.05 two-sided, power=.80), relative MDE vs the "
    "control mean, and the required per-arm n for a 1% relative lift. "
    "Normal quantiles and their squared sum are compile-time literals "
    "(POWER() rounding is not engine-pinned; a literal is); variances "
    "come from the dsum/dxsum2 exact decimal moment discipline, so the "
    "final columns are single shared IEEE trees. ONE event-type-keyed "
    "aggregate at corpus scale; the arm join runs on the 10-row "
    "(type, variant) grain.",
)


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR over the per-outcome randomization p-values.
# ---------------------------------------------------------------------------

_BH_ALPHA_PPM = 50000  # alpha = 0.05


def _fdr_sql(d: Dialect) -> str:
    """One randomization (the q_permutation_test relabeling, md5 per
    (user, replicate)) tested against FIVE outcomes — the per-user count
    of each event_type — then Benjamini-Hochberg step-up at alpha=.05
    over the m=5 exact ppm p-values (the shared relabeling makes the
    p-values positively dependent, where BH remains valid — PRDS).
    Every p-value and the step-up comparison p_(k) <= k*alpha/m are
    exact integer arithmetic: p_ppm * m <= k * alpha_ppm."""
    us = d.epoch_us("ts")
    s = "STRING" if d.name == "spark" else "VARCHAR"
    if d.name == "spark":
        reps = f"SELECT explode(sequence(0, {_R - 1})) AS b"
    else:
        reps = f"SELECT unnest(generate_series(0, {_R - 1})) AS b"
    u = d.md5_int32(f"concat(CAST(pu.user_id AS {s}), chr(58), CAST(r.b AS {s}))")
    return f"""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN MIN(CASE WHEN event_type = 'error' THEN {us} END)
                   = MIN({us}) THEN 1 ELSE 0 END AS g
  FROM events GROUP BY user_id
),
counts AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY user_id, event_type
),
types AS (SELECT DISTINCT event_type FROM events),
outcome AS (
  SELECT pu.user_id, pu.g, ty.event_type, COALESCE(c.y, 0) AS y
  FROM per_user pu CROSS JOIN types ty
  LEFT JOIN counts c
    ON c.user_id = pu.user_id AND c.event_type = ty.event_type
),
obs AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(g) AS BIGINT) AS n1,
         CAST(COUNT(*) - SUM(g) AS BIGINT) AS n0,
         CAST(SUM(g * y) AS BIGINT) AS s1,
         CAST(SUM((1 - g) * y) AS BIGINT) AS s0
  FROM outcome GROUP BY event_type
),
reps AS ({reps}),
relabel AS (
  SELECT pu.user_id, r.b,
         CASE WHEN ({u} % 1000000)
                   < (SELECT {d.idiv('(MIN(n1) * 1000000)', 'MIN(n)')} FROM obs)
              THEN 1 ELSE 0 END AS gr
  FROM per_user pu CROSS JOIN reps r
),
rep_stats AS (
  SELECT o.event_type, rl.b,
         CAST(SUM(rl.gr) AS BIGINT) AS n1r,
         CAST(COUNT(*) - SUM(rl.gr) AS BIGINT) AS n0r,
         CAST(SUM(rl.gr * o.y) AS BIGINT) AS s1r,
         CAST(SUM((1 - rl.gr) * o.y) AS BIGINT) AS s0r
  FROM outcome o JOIN relabel rl ON rl.user_id = o.user_id
  GROUP BY o.event_type, rl.b
),
pvals AS (
  SELECT o.event_type,
         CAST(SUM(CASE
           WHEN r.n1r = 0 OR r.n0r = 0 THEN 1
           WHEN ABS(r.s1r * r.n0r - r.s0r * r.n1r) * (o.n1 * o.n0)
                >= ABS(o.s1 * o.n0 - o.s0 * o.n1) * (r.n1r * r.n0r)
           THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
  FROM rep_stats r JOIN obs o ON o.event_type = r.event_type
  GROUP BY o.event_type
),
ranked AS (
  SELECT event_type, n_extreme,
         CAST({d.idiv(f"((1 + n_extreme) * 1000000)", str(_R + 1))}
              AS BIGINT) AS p_ppm,
         CAST(ROW_NUMBER() OVER (
           ORDER BY {d.idiv(f"((1 + n_extreme) * 1000000)", str(_R + 1))},
                    event_type) AS BIGINT) AS k,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM pvals
)
SELECT event_type, n_extreme, p_ppm, k,
       CAST({d.idiv(f'(k * {_BH_ALPHA_PPM})', 'm')} AS BIGINT)
         AS bh_threshold_ppm,
       CASE WHEN k <= MAX(CASE WHEN p_ppm * m <= k * {_BH_ALPHA_PPM}
                               THEN k ELSE 0 END) OVER ()
            THEN 1 ELSE 0 END AS rejected
FROM ranked
ORDER BY k
"""


sql_query(
    "q_fdr_bh",
    spark_sql=_fdr_sql(SPARK),
    duck_sql=_fdr_sql(DUCK),
    tables=["events"],
    doc="Benjamini-Hochberg FDR step-up (alpha=.05) over the five "
    "per-event-type randomization p-values from ONE shared q_permutation_"
    "test relabeling (PRDS dependence, where BH is valid) — the "
    "multiple-testing guardrail an experimentation platform applies "
    "before reading a metric dashboard. p-values and the step-up "
    "comparisons are exact integer arithmetic end to end (p_ppm*m <= "
    "k*alpha_ppm); no float ever decides a rejection. Corpus-scale work: "
    "two user-keyed aggregates and one 128x user-grain fanout joined to "
    "the 5-outcome grid, map-side-combined to 640 replicate rows; the "
    "BH walk runs on 5 rows.",
)


# ---------------------------------------------------------------------------
# Qini uplift curve — incremental-impact evaluation of a targeting score.
# ---------------------------------------------------------------------------


def _qini_sql(d: Dialect) -> str:
    """Qini curve over activity-ranked user deciles: treatment = the
    q_ab_welch parity assignment, outcome = converted (any purchase),
    targeting score = event count. Decile k's Qini value is the
    incremental conversions had the control arm been treated at the
    treated rate: g(k) = Yt(k) - Yc(k)*Nt(k)/Nc(k) — held as the exact
    integer Yt*Nc - Yc*Nt over the common denominator Nc, with the
    random-targeting diagonal line_k = g(10)*cum_n/n on the same
    denominator algebra. The Qini coefficient (sum of per-decile curve
    minus diagonal) is one IEEE tree over exact integers."""
    us = d.epoch_us("ts")
    return f"""
WITH per_user AS (
  SELECT user_id,
         CAST(user_id % 2 AS INT) AS g,
         CAST(COUNT(*) AS BIGINT) AS s,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   > 0 THEN 1 ELSE 0 END AS y
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT g, y,
         CAST(NTILE(10) OVER (ORDER BY s DESC, user_id) AS BIGINT) AS decile
  FROM per_user
),
per_decile AS (
  SELECT decile,
         CAST(SUM(g) AS BIGINT) AS nt,
         CAST(COUNT(*) - SUM(g) AS BIGINT) AS nc,
         CAST(SUM(g * y) AS BIGINT) AS yt,
         CAST(SUM((1 - g) * y) AS BIGINT) AS yc
  FROM ranked GROUP BY decile
),
cum AS (
  SELECT decile, nt, nc, yt, yc,
         CAST(SUM(nt) OVER (ORDER BY decile) AS BIGINT) AS cnt_t,
         CAST(SUM(nc) OVER (ORDER BY decile) AS BIGINT) AS cnt_c,
         CAST(SUM(yt) OVER (ORDER BY decile) AS BIGINT) AS cy_t,
         CAST(SUM(yc) OVER (ORDER BY decile) AS BIGINT) AS cy_c,
         CAST(SUM(nt + nc) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
         CAST(SUM(nt + nc) OVER () AS BIGINT) AS n,
         CAST(SUM(yt) OVER () AS BIGINT) AS ty_t,
         CAST(SUM(yc) OVER () AS BIGINT) AS ty_c,
         CAST(SUM(nt) OVER () AS BIGINT) AS tn_t,
         CAST(SUM(nc) OVER () AS BIGINT) AS tn_c
  FROM per_decile
),
curve AS (
  SELECT decile, nt, nc, yt, yc,
         CAST(cy_t * cnt_c - cy_c * cnt_t AS BIGINT) AS qini_num,
         cnt_c AS qini_den,
         CAST(cy_t * cnt_c - cy_c * cnt_t AS DOUBLE)
           / CAST(NULLIF(cnt_c, 0) AS DOUBLE) AS qini_k,
         CAST(ty_t * tn_c - ty_c * tn_t AS DOUBLE)
           / CAST(NULLIF(tn_c, 0) AS DOUBLE)
           * CAST(cum_n AS DOUBLE) / CAST(n AS DOUBLE) AS diagonal_k
  FROM cum
)
SELECT decile, nt, nc, yt, yc, qini_num, qini_den, qini_k, diagonal_k,
       -- Qini coefficient as a FIXED IEEE tree: the 10 per-decile terms
       -- (each a deterministic double from exact integers) are pivoted by
       -- decile and added left-to-right in decile order. A SUM() OVER ()
       -- of doubles would be shuffle-order-dependent (the q_ab_interaction
       -- cross-engine-mismatch precedent); this form is bit-stable.
       ({' + '.join(
           'COALESCE(MAX(CASE WHEN decile = %d THEN qini_k - diagonal_k '
           'END) OVER (), CAST(0 AS DOUBLE))' % k
           for k in range(1, 11)
       )}) AS qini_coefficient
FROM curve
ORDER BY decile
"""


sql_query(
    "q_qini_uplift",
    spark_sql=_qini_sql(SPARK),
    duck_sql=_qini_sql(DUCK),
    tables=["events"],
    doc="Qini uplift curve over activity-ranked user deciles (treatment = "
    "the q_ab_welch parity assignment, outcome = converted): per-decile "
    "incremental conversions g(k) = Yt - Yc*Nt/Nc held as exact integer "
    "numerator/denominator, the random-targeting diagonal, and the Qini "
    "coefficient — the uplift-model evaluation standard, completing the "
    "targeting-eval family next to q_gains_chart (response lift, not "
    "INCREMENTAL lift) and q_auc/q_average_precision (classification). "
    "Corpus-scale work is one user-keyed aggregate; the NTILE runs over "
    "the user-grain aggregate (q_user_deciles boundedness class) and "
    "every curve column lives on 10 decile rows.",
)


# ---------------------------------------------------------------------------
# 2x2 factorial interaction — does the treatment effect depend on cohort?
# ---------------------------------------------------------------------------


def _interaction_sql(d: Dialect) -> str:
    """2x2 factorial readout: factor A = the q_ab_welch parity assignment,
    factor B = the error-first cohort (q_cmh's exposure), outcome =
    per-user purchase count. Emits the four cell means and the
    interaction contrast (m11 - m10) - (m01 - m00) with its z statistic
    from the four cell variances — the 'does the experiment effect
    differ by cohort' question a segment-level dashboard answers with
    eyeballs and this answers with algebra. Cell moments are exact
    BIGINTs; means/variances/z are one shared IEEE tree (the q_ab_welch
    discipline); the 4-row cell table carries window-computed contrast
    columns."""
    us = d.epoch_us("ts")

    def mean(c: str) -> str:
        return f"(CAST(sy{c} AS DOUBLE) / n{c})"

    def var_over_n(c: str) -> str:
        return (
            f"((CAST(n{c} AS DOUBLE) * syy{c} - CAST(sy{c} AS DOUBLE) * sy{c})"
            f" / (CAST(n{c} AS DOUBLE) * (CAST(n{c} AS DOUBLE) - 1))"
            f" / CAST(n{c} AS DOUBLE))"
        )

    # The contrast is a FIXED IEEE tree over the pivoted 1-row cell stats —
    # an aggregated SUM over DOUBLE cell terms is shuffle/engine-order-
    # dependent (the first draft hash-mismatched on exactly that).
    inter = f"(({mean('11')} - {mean('10')}) - ({mean('01')} - {mean('00')}))"
    se = (
        f"SQRT((({var_over_n('11')} + {var_over_n('10')})"
        f" + {var_over_n('01')}) + {var_over_n('00')})"
    )
    cell = (
        "CAST(SUM(CASE WHEN a = {a} AND b = {b} THEN {x} ELSE 0 END)"
        " AS BIGINT) AS {x}{a}{b}"
    )
    pivots = ",\n         ".join(
        cell.format(a=a, b=b, x=x)
        for a in (0, 1)
        for b in (0, 1)
        for x in ("n", "sy", "syy")
    )
    return f"""
WITH per_user AS (
  SELECT user_id,
         CAST(user_id % 2 AS INT) AS a,
         CASE WHEN MIN(CASE WHEN event_type = 'error' THEN {us} END)
                   = MIN({us}) THEN 1 ELSE 0 END AS b,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY user_id
),
cells AS (
  SELECT a, b,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM per_user GROUP BY a, b
),
pivoted AS (
  SELECT {pivots}
  FROM cells
)
SELECT n00, n01, n10, n11, sy00, sy01, sy10, sy11,
       {mean('00')} AS mean00,
       {mean('01')} AS mean01,
       {mean('10')} AS mean10,
       {mean('11')} AS mean11,
       {inter} AS interaction,
       {inter} / {se} AS interaction_z
FROM pivoted
"""


sql_query(
    "q_ab_interaction",
    spark_sql=_interaction_sql(SPARK),
    duck_sql=_interaction_sql(DUCK),
    tables=["events"],
    doc="2x2 factorial interaction: parity assignment x error-first "
    "cohort on per-user purchase counts — the four cell means/variances "
    "from exact integer moments and the interaction contrast "
    "(m11-m10)-(m01-m00) with its z from the pooled cell variances, the "
    "'does the effect differ by segment' answer that upgrades eyeballing "
    "q_ab_welch by cohort. One user-keyed aggregate; all contrast "
    "algebra on the 4-row cell table.",
)
