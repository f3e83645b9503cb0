"""Document quality gating for training-data curation.

Composes the per-document heuristics the text layer computes individually
(token counts, stopword ratios — llm/text.py) into a single Gopher-style
rule cascade: every rule is a boolean column, `keep` is their conjunction,
and `drop_reason` names the FIRST failing rule (deterministic cascade order)
so corpus builders get an auditable drop ledger, not just a filtered table.

All rules are built-in string/array expressions (length / regexp_replace /
split / filter) — pure map over the documents table, whole-stage codegen,
no UDF, no shuffle. At 100 TB this scales with input splits and the rule
thresholds are broadcast literals.

Reference scope note: the reference has no text-quality layer (its
validation gates are row-count/null checks, nyc_taxi_iceberg_etl.py:177-189);
this is a beyond-reference LLM-pipeline operator mandated by the brief.
"""

from __future__ import annotations

from ..functions.detsql import DUCK, SPARK, Dialect
from ..registry import sql_query

# Rule thresholds (Gopher-rules-shaped, tuned to the synthetic corpus's
# 48-553-char word-salad documents so both keep and drop branches are
# exercised at every scale factor).
_MIN_TOKENS = 10
_MAX_TOKENS = 100_000
_MIN_MEAN_TOKEN_LEN = 2.0
_MAX_MEAN_TOKEN_LEN = 12.0
_MAX_FUNCTION_WORD_RATIO = 0.45
_MAX_DIGIT_CHAR_RATIO = 0.20
_MIN_ALPHA_CHAR_RATIO = 0.55

_FUNCTION_WORDS = "'the', 'a', 'value', 'data', 'table'"


def _quality_gate_sql(d: Dialect) -> str:
    n_tokens = d.token_count("text")
    fn_hits = d.token_filter_count("text", _FUNCTION_WORDS)
    # Character-class tallies: length(text) minus length(text with the class
    # removed). regex_strip removes ALL matches in both dialects.
    nonspace = f"length({d.regex_strip('text', ' ')})"
    digits = f"(length(text) - length({d.regex_strip('text', '[0-9]')}))"
    alphas = f"(length(text) - length({d.regex_strip('text', '[a-zA-Z]')}))"
    return f"""
WITH m AS (
  SELECT
    doc_id,
    lang,
    source,
    {n_tokens} AS n_tokens,
    CAST({nonspace} AS DOUBLE) / {n_tokens} AS mean_token_len,
    CAST({fn_hits} AS DOUBLE) / {n_tokens} AS function_word_ratio,
    CAST({digits} AS DOUBLE) / NULLIF(length(text), 0) AS digit_char_ratio,
    CAST({alphas} AS DOUBLE) / NULLIF(length(text), 0) AS alpha_char_ratio
  FROM documents
),
rules AS (
  SELECT *,
    (n_tokens >= {_MIN_TOKENS} AND n_tokens <= {_MAX_TOKENS}) AS r_token_count,
    (mean_token_len >= {_MIN_MEAN_TOKEN_LEN}
     AND mean_token_len <= {_MAX_MEAN_TOKEN_LEN}) AS r_mean_token_len,
    (function_word_ratio <= {_MAX_FUNCTION_WORD_RATIO}) AS r_function_words,
    (digit_char_ratio <= {_MAX_DIGIT_CHAR_RATIO}) AS r_digit_ratio,
    (alpha_char_ratio >= {_MIN_ALPHA_CHAR_RATIO}) AS r_alpha_ratio
  FROM m
)
SELECT
  doc_id,
  lang,
  source,
  n_tokens,
  mean_token_len,
  function_word_ratio,
  digit_char_ratio,
  alpha_char_ratio,
  r_token_count,
  r_mean_token_len,
  r_function_words,
  r_digit_ratio,
  r_alpha_ratio,
  (r_token_count AND r_mean_token_len AND r_function_words
   AND r_digit_ratio AND r_alpha_ratio) AS keep,
  CASE
    WHEN NOT r_token_count THEN 'token_count'
    WHEN NOT r_mean_token_len THEN 'mean_token_len'
    WHEN NOT r_function_words THEN 'function_words'
    WHEN NOT r_digit_ratio THEN 'digit_ratio'
    WHEN NOT r_alpha_ratio THEN 'alpha_ratio'
    ELSE 'kept'
  END AS drop_reason
FROM rules
"""


sql_query(
    "q_quality_gate",
    spark_sql=_quality_gate_sql(SPARK),
    duck_sql=_quality_gate_sql(DUCK),
    tables=["documents"],
    doc="Gopher-style document quality gate: five heuristic rules (token "
    "count bounds, mean token length, function-word ratio, digit-char "
    "ratio, alpha-char ratio) as boolean columns, keep = conjunction, "
    "drop_reason = first failing rule in a fixed cascade. Pure map — "
    "length/regexp_replace/split/filter all stay in whole-stage codegen; "
    "ratio divisions are double/int with identical IEEE evaluation in "
    "both engines.",
)


# ---------------------------------------------------------------------------
# k-anonymity audit — quasi-identifier group-size governance check.
# ---------------------------------------------------------------------------


def _kanon_sql(d) -> str:
    """Group the corpus by the quasi-identifier tuple (lang, source,
    length-bucket) and report the k-anonymity profile: how many equivalence
    classes and rows sit below k=5 — the re-identification risk surface a
    privacy review asks for before a corpus ships."""
    lb = d.idiv("n_chars", "200")
    return f"""
WITH classes AS (
  SELECT lang, source, CAST({lb} AS BIGINT) AS len_bucket,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM documents
  GROUP BY lang, source, {lb}
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_classes,
  CAST(SUM(k) AS BIGINT) AS n_rows,
  CAST(MIN(k) AS BIGINT) AS min_k,
  CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT) AS classes_below_5,
  CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS rows_below_5,
  CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS singletons
FROM classes
"""


def _register_kanon():
    from ..functions.detsql import DUCK, SPARK
    from ..registry import sql_query

    sql_query(
        "q_k_anonymity",
        spark_sql=_kanon_sql(SPARK),
        duck_sql=_kanon_sql(DUCK),
        tables=["documents"],
        doc="k-anonymity audit over the quasi-identifier tuple (lang, "
        "source, 200-char length bucket): equivalence-class profile with "
        "the below-k=5 class/row counts and singleton count — the "
        "governance gate run before releasing a corpus (generalize or "
        "suppress the flagged classes to raise k). One map-side-combined "
        "aggregation to class grain, then scalar profiling of the class "
        "table; integer-exact.",
    )


_register_kanon()


# ---------------------------------------------------------------------------
# l-diversity + t-closeness — the attribute-disclosure companions to
# q_k_anonymity's membership-disclosure audit.
# ---------------------------------------------------------------------------


def _ldiv_sql(d) -> str:
    """Per quasi-identifier class (lang, source): distinct-l diversity of
    the sensitive attribute (400-char length band) and t-closeness as the
    total-variation distance between the class's sensitive distribution
    and the corpus-wide one. Shares are ppm staged idiv (truncation,
    documented); the TV sum runs over the full (class x sensitive-value)
    grid so absent values contribute their global mass."""
    sv = d.idiv("n_chars", "400")
    p_c = d.idiv("(COALESCE(ce.c, 0) * 1000000)", "gr.n")
    p_g = d.idiv("(gr.gc * 1000000)", "t.gn")
    return f"""
WITH rows_s AS (
  SELECT lang, source, CAST({sv} AS BIGINT) AS sv FROM documents
),
cells AS (
  SELECT lang, source, sv, CAST(COUNT(*) AS BIGINT) AS c
  FROM rows_s GROUP BY lang, source, sv
),
class AS (
  SELECT lang, source,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS l_distinct
  FROM cells GROUP BY lang, source
),
gdist AS (SELECT sv, CAST(SUM(c) AS BIGINT) AS gc FROM cells GROUP BY sv),
gtot AS (SELECT CAST(SUM(gc) AS BIGINT) AS gn FROM gdist),
grid AS (
  SELECT cl.lang, cl.source, cl.n, cl.l_distinct, g.sv, g.gc
  FROM class cl CROSS JOIN gdist g
),
tv AS (
  SELECT gr.lang, gr.source, gr.n, gr.l_distinct,
         CAST(SUM(ABS({p_c} - {p_g})) AS BIGINT) AS sum_abs_ppm
  FROM grid gr
  LEFT JOIN cells ce
    ON ce.lang = gr.lang AND ce.source = gr.source AND ce.sv = gr.sv
  CROSS JOIN gtot t
  GROUP BY gr.lang, gr.source, gr.n, gr.l_distinct
)
SELECT lang, source, n, l_distinct,
       CAST({d.idiv('sum_abs_ppm', '2')} AS BIGINT) AS t_closeness_ppm,
       CAST(MIN(l_distinct) OVER () AS BIGINT) AS min_l
FROM tv
ORDER BY lang, source
"""


def _register_ldiv():
    from ..functions.detsql import DUCK, SPARK
    from ..registry import sql_query

    sql_query(
        "q_l_diversity",
        spark_sql=_ldiv_sql(SPARK),
        duck_sql=_ldiv_sql(DUCK),
        tables=["documents"],
        doc="l-diversity + t-closeness audit per quasi-identifier class "
        "(lang, source) with the 400-char length band as the sensitive "
        "attribute: distinct-l per class (attribute-disclosure risk — a "
        "k-anonymous class with one sensitive value still leaks) and "
        "t-closeness as the exact total-variation distance in ppm between "
        "class and corpus sensitive distributions, summed over the full "
        "value grid so absent values contribute their global mass. The "
        "attribute-disclosure companions to q_k_anonymity. One cell-keyed "
        "corpus aggregate; the class x value grid (bounded by "
        "|langs|x|sources|x|bands|) carries everything else.",
    )


_register_ldiv()
