"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference capability (BASELINE.json north star): language ID
(stopword-hit heuristic), quality scoring (length/stopword/punctuation
ratios), token counting (whitespace split), and document fingerprinting
(normalized md5). All expressed with built-in JVM-side functions — split /
filter higher-order lambdas / md5 — so the hot path never leaves whole-stage
codegen; no Python UDFs.

Scale posture: every query is a single narrow projection over the documents
table — no shuffle at all except the final (tiny) aggregate where noted. At
100 TB this is a pure map pipeline that scales with input splits.
"""

from __future__ import annotations

from ..functions.detsql import DUCK, SPARK, Dialect
from ..registry import sql_query

# Stopword lists per language for the heuristic language scorer. The corpus
# is synthetic word-salad, so the interesting part is the operator shape
# (vectorized token-set intersection counts), not linguistic accuracy.
_EN_STOPS = "'the', 'a', 'of', 'and', 'to'"
_FUNCTION_WORDS = "'the', 'a', 'value', 'data', 'table'"


def _text_stats_sql(d: Dialect) -> str:
    return f"""
SELECT
  doc_id,
  lang,
  source,
  CAST(length(text) AS INT) AS char_count,
  {d.token_count('text')} AS token_count,
  {d.token_filter_count('text', _FUNCTION_WORDS)} AS function_word_count,
  CAST(length(text) AS DOUBLE) / {d.token_count('text')} AS avg_token_span,
  CAST({d.token_filter_count('text', _FUNCTION_WORDS)} AS DOUBLE)
    / {d.token_count('text')} AS function_word_ratio,
  CASE
    WHEN {d.token_count('text')} < 20 THEN 'too_short'
    WHEN CAST({d.token_filter_count('text', _FUNCTION_WORDS)} AS DOUBLE)
         / {d.token_count('text')} > 0.5 THEN 'low_quality'
    ELSE 'ok'
  END AS quality_flag
FROM documents
"""


sql_query(
    "q_text_stats",
    spark_sql=_text_stats_sql(SPARK),
    duck_sql=_text_stats_sql(DUCK),
    tables=["documents"],
    doc="Token counting + quality scoring over documents: whitespace "
    "tokenization, higher-order filter() for vocabulary hits (stays in "
    "codegen — no UDF), ratio features, CASE quality gate. Pure map, "
    "no shuffle.",
)


def _langid_sql(d: Dialect) -> str:
    """Heuristic language ID: score = stopword hits per language list; pick
    argmax via a deterministic CASE cascade (ties broken by fixed order)."""
    en = d.token_filter_count("text", _EN_STOPS)
    es = d.token_filter_count("text", "'el', 'la', 'de', 'y', 'que'")
    de = d.token_filter_count("text", "'der', 'die', 'und', 'das', 'ist'")
    return f"""
SELECT
  doc_id,
  lang AS labeled_lang,
  {en} AS en_hits,
  {es} AS es_hits,
  {de} AS de_hits,
  CASE
    WHEN {en} >= {es} AND {en} >= {de} AND {en} > 0 THEN 'en'
    WHEN {es} >= {de} AND {es} > 0 THEN 'es'
    WHEN {de} > 0 THEN 'de'
    ELSE 'und'
  END AS predicted_lang,
  CASE
    WHEN (CASE
      WHEN {en} >= {es} AND {en} >= {de} AND {en} > 0 THEN 'en'
      WHEN {es} >= {de} AND {es} > 0 THEN 'es'
      WHEN {de} > 0 THEN 'de'
      ELSE 'und'
    END) = lang THEN true ELSE false
  END AS matches_label
FROM documents
"""


sql_query(
    "q_langid",
    spark_sql=_langid_sql(SPARK),
    duck_sql=_langid_sql(DUCK),
    tables=["documents"],
    doc="N-gram/stopword-heuristic language ID: per-language vocabulary hit "
    "counts + deterministic argmax cascade. Map-only; at scale the stopword "
    "lists would be broadcast literals exactly as here.",
)


def _fingerprint_sql(d: Dialect) -> str:
    strip_nonalnum = d.regex_strip("text", "[^a-z0-9 ]")
    strip_nonalpha = d.regex_strip("text", "[^a-z]")
    return f"""
SELECT
  doc_id,
  md5(lower({strip_nonalnum})) AS content_fingerprint,
  md5(concat_ws('|', lang, source)) AS bucket_fingerprint,
  CAST(length({strip_nonalpha}) AS INT) AS alpha_chars
FROM documents
"""


sql_query(
    "q_doc_fingerprint",
    spark_sql=_fingerprint_sql(SPARK),
    duck_sql=_fingerprint_sql(DUCK),
    tables=["documents"],
    doc="Document fingerprinting: md5 over a normalized text form (lowercase,"
    " alphanumerics) — the canonical-hash building block exact dedup keys "
    "on. regexp_replace + md5 agree across engines for this pattern class.",
)
