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
from ..registry import df_query, sql_query
from ..session import DEFAULT_SHUFFLE_PARTITIONS

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


# BPE-ish pre-tokenization pattern (the GPT-2 pre-tokenizer's core classes:
# letter runs, digit runs, punctuation runs — whitespace never inside a
# token). The synthetic corpus is ASCII + single spaces, so ASCII classes
# suffice; a production pattern adds \p{L}/\p{N} unicode classes.
_BPE_PAT = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+"


def _token_bpe_sql(d: Dialect) -> str:
    bpe = d.arr_len(d.regex_tokens("text", _BPE_PAT))
    alpha = d.arr_len(d.regex_tokens("text", "[a-zA-Z]+"))
    digit = d.arr_len(d.regex_tokens("text", "[0-9]+"))
    return f"""
SELECT
  doc_id,
  {d.token_count('text')} AS ws_tokens,
  {bpe} AS bpe_tokens,
  {alpha} AS alpha_runs,
  {digit} AS digit_runs,
  {bpe} - {alpha} - {digit} AS punct_runs,
  CAST({bpe} AS DOUBLE) / {d.token_count('text')} AS subword_ratio
FROM documents
"""


sql_query(
    "q_token_bpe",
    spark_sql=_token_bpe_sql(SPARK),
    duck_sql=_token_bpe_sql(DUCK),
    tables=["documents"],
    doc="BPE-ish regex token counting alongside the whitespace count: "
    "regexp_extract_all over the GPT-2-style run classes (letters / digits / "
    "punctuation), per-class run counts, and the subword-inflation ratio "
    "a token-budget planner uses to convert word counts to token counts. "
    "Map-only (regex stays in codegen); no shuffle at any scale.",
)


# Winnowing fingerprint parameters: 3-token shingles hashed with distinct
# multipliers mod a 31-bit prime (products stay < 2^63 exact), window w=4.
_WIN_P = 1000000007
_SHINGLE_K = 3
_WINNOW_W = 4


def _winnow_ctes(d: Dialect) -> str:
    """The shared winnowing CTE chain ending in fps(doc_id, fp) — the
    per-document fingerprint set. Used by q_winnow_fingerprint (per-doc
    summary) and q_dup_spans (corpus-level shared-span analysis)."""
    pos = d.positional_token_rows("documents")
    h = d.md5_int32("token")
    return f"""pos_tok AS ({pos}),
hashed AS (
  SELECT doc_id, i, {h} AS h FROM pos_tok
),
shingles AS (
  SELECT doc_id, i,
    (31 * h
     + 37 * LEAD(h, 1) OVER (PARTITION BY doc_id ORDER BY i)
     + 41 * LEAD(h, 2) OVER (PARTITION BY doc_id ORDER BY i)
    ) % {_WIN_P} AS s
  FROM hashed
),
winnowed AS (
  SELECT doc_id,
    MIN(s) OVER (
      PARTITION BY doc_id ORDER BY i
      ROWS BETWEEN {_WINNOW_W - 1} PRECEDING AND CURRENT ROW
    ) AS fp
  FROM shingles
  WHERE s IS NOT NULL
),
fps AS (SELECT DISTINCT doc_id, fp FROM winnowed)"""


def _winnow_sql(d: Dialect) -> str:
    return f"""
WITH {_winnow_ctes(d)}
SELECT doc_id,
  CAST(COUNT(*) AS INT) AS n_fingerprints,
  CAST(SUM(fp) AS BIGINT) AS fp_checksum,
  MIN(fp) AS min_fp,
  MAX(fp) AS max_fp
FROM fps
GROUP BY doc_id
"""


sql_query(
    "q_winnow_fingerprint",
    spark_sql=_winnow_sql(SPARK),
    duck_sql=_winnow_sql(DUCK),
    tables=["documents"],
    doc="Rolling-hash document fingerprinting by winnowing (the MOSS "
    "algorithm): 3-token shingle hashes (32-bit md5 prefix per token, "
    "distinct multipliers mod a 31-bit prime — exact BIGINT arithmetic), "
    "then the minimum over each sliding window of 4 shingles, deduplicated "
    "— the fingerprint set a near-dup index stores per document. All "
    "windows PARTITION BY doc_id, so fingerprinting distributes per-doc "
    "with no global sort; summarised here per doc (count / checksum / "
    "extrema) to keep the verified surface compact.",
)


def _dup_spans_sql(d: Dialect) -> str:
    """Cross-document duplicated-SPAN coverage from the shared winnowing
    fingerprints — span-level dedup signal WITHOUT any pairwise join.

    A fingerprint (winnowed 3-token rolling hash) names a local span of
    text; a fingerprint appearing in ≥2 documents marks a span duplicated
    across the corpus (boilerplate, quoted text, templated pages). Per doc:
    what fraction of its fingerprinted spans are corpus-duplicated, and how
    widely shared its worst span is. This is the signal used to strip
    boilerplate spans / rank docs for span-level dedup (the step after
    whole-doc dedup in a training-data pipeline).

    Scale shape: the fingerprint table shuffles ONCE on fp for the
    document-frequency aggregate, joins back on fp, then rolls up per doc —
    three keyed exchanges total, NO pair explosion (the whole point: at
    100 TB pairwise span comparison is impossible, fp-keyed aggregation is
    one shuffle of a table ~ the corpus token count / w).
    """
    return f"""
WITH {_winnow_ctes(d)},
fp_df AS (
  SELECT fp, COUNT(*) AS df FROM fps GROUP BY fp
)
SELECT
  f.doc_id,
  CAST(COUNT(*) AS INT) AS n_fps,
  CAST(SUM(CASE WHEN g.df >= 2 THEN 1 ELSE 0 END) AS INT) AS n_shared,
  CAST(SUM(CASE WHEN g.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
    AS dup_frac,
  CAST(MAX(g.df) AS INT) AS max_fp_df,
  CASE WHEN 2 * SUM(CASE WHEN g.df >= 2 THEN 1 ELSE 0 END) >= COUNT(*)
       THEN 'dup_heavy' ELSE 'clean' END AS span_class
FROM fps f
JOIN fp_df g ON f.fp = g.fp
GROUP BY f.doc_id
"""


sql_query(
    "q_dup_spans",
    spark_sql=_dup_spans_sql(SPARK),
    duck_sql=_dup_spans_sql(DUCK),
    tables=["documents"],
    doc=_dup_spans_sql.__doc__,
)


# PII patterns (training-data redaction): email, phone-ish digit runs, IPv4.
# Conservative ASCII patterns that parse identically under Java regex (Spark)
# and RE2 (DuckDB) — no lookaround, no backreferences (RE2 has neither), and
# NO backslashes: Spark SQL string literals process backslash escapes while
# DuckDB's do not, so a `\.` would silently become `.` on one side only.
# Literal dot/plus are spelled as character classes instead.
_PII_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
_PII_PHONE = "[+]?[0-9][0-9(). -]{7,}[0-9]"
_PII_IPV4 = "([0-9]{1,3}[.]){3}[0-9]{1,3}"


def _pii_scrub_sql(d: Dialect) -> str:
    def scrub(expr: str, pat: str, token: str) -> str:
        if d.name == "duckdb":
            return f"regexp_replace({expr}, '{pat}', '{token}', 'g')"
        return f"regexp_replace({expr}, '{pat}', '{token}')"

    scrubbed = scrub(
        scrub(scrub("text", _PII_EMAIL, "<EMAIL>"), _PII_IPV4, "<IP>"),
        _PII_PHONE,
        "<PHONE>",
    )
    n_email = d.arr_len(d.regex_tokens("text", _PII_EMAIL))
    n_ip = d.arr_len(d.regex_tokens("text", _PII_IPV4))
    return f"""
SELECT
  doc_id,
  {n_email} AS n_emails,
  {n_ip} AS n_ips,
  CAST(length(text) - length({scrubbed}) AS INT) AS chars_redacted_delta,
  md5({scrubbed}) AS scrubbed_hash,
  CASE WHEN {n_email} + {n_ip} > 0 THEN true ELSE false END AS has_pii
FROM documents
"""


sql_query(
    "q_pii_scrub",
    spark_sql=_pii_scrub_sql(SPARK),
    duck_sql=_pii_scrub_sql(DUCK),
    tables=["documents"],
    doc="PII redaction pass: email / IPv4 / phone patterns replaced with "
    "typed placeholder tokens (RE2-safe patterns — no lookaround — so Spark "
    "and DuckDB scrub identically), per-doc match counts, and the md5 of the "
    "scrubbed text as the verified artifact (the scrubbed corpus itself "
    "would be the sink column in production). Map-only, stays in codegen, "
    "no shuffle.",
)


def _repetition_sql(d: Dialect) -> str:
    """Gopher-style repetition gate: fraction of 2-gram occurrences taken by
    the single most frequent 2-gram."""
    pos = d.positional_token_rows("documents")
    return f"""
WITH pos_tok AS ({pos}),
bigrams AS (
  SELECT doc_id,
         token || ' ' || LEAD(token, 1) OVER (PARTITION BY doc_id ORDER BY i) AS g
  FROM pos_tok
),
counts AS (
  SELECT doc_id, g, COUNT(*) AS c
  FROM bigrams WHERE g IS NOT NULL
  GROUP BY doc_id, g
),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_bigrams,
         CAST(MAX(c) AS BIGINT) AS top_bigram_count
  FROM counts GROUP BY doc_id
)
SELECT doc_id, n_bigrams, top_bigram_count,
       CAST(top_bigram_count AS DOUBLE) / n_bigrams AS top_bigram_ratio,
       CASE WHEN CAST(top_bigram_count AS DOUBLE) / n_bigrams > 0.2
            THEN true ELSE false END AS repetition_flag
FROM per_doc
"""


sql_query(
    "q_repetition",
    spark_sql=_repetition_sql(SPARK),
    duck_sql=_repetition_sql(DUCK),
    tables=["documents"],
    doc="Repetition detection (the Gopher rules' repeated-n-gram family): "
    "per-doc share of 2-gram occurrences captured by the most frequent "
    "2-gram, flagged above 20%. Bigrams form with a LEAD window partitioned "
    "by doc_id; the count and the per-doc rollup share that partitioning, "
    "so the whole query is one doc_id exchange. Exact integer ratio "
    "numerators/denominators keep the oracle bit-exact.",
)


def _fingerprint_sql(d: Dialect) -> str:
    # lower() INSIDE the strips: stripping [^a-z...] before lowercasing
    # would DELETE uppercase letters (so 'Hello' fingerprints as 'ello'
    # and its uppercase letters vanish from alpha_chars). Latent on the
    # all-lowercase fixture, wrong on any mixed-case corpus.
    strip_nonalnum = d.regex_strip("lower(text)", "[^a-z0-9 ]")
    strip_nonalpha = d.regex_strip("lower(text)", "[^a-z]")
    return f"""
SELECT
  doc_id,
  md5({strip_nonalnum}) AS content_fingerprint,
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


_TFIDF_SCALE = 1_000_000  # fixed-point scale for the integer tf·idf score


def tfidf_top_terms(documents, top_k: int = 5):
    """TF-IDF per (doc, term) with smooth raw idf, top-k terms per doc.

    Scoring is the exact fixed-point form (the q_collocations lift
    precedent, VERDICT r07 #2): tfidf_ppm = (tf·(N+1)·1e6) DIV (df+1) —
    pure BIGINT arithmetic, identical in any engine, so the query carries
    a hash oracle instead of the former rows-only ln() variant (ln differs
    from DuckDB's libm by 1 ulp on ~1% of inputs — measured in r1). The
    raw idf (N+1)/(df+1) is the log-free member of the TF-IDF family:
    within a fixed tf it ranks identically to ln-idf (ln is monotone),
    and rare terms still dominate corpus-wide stopwords (pinned by
    tests/test_llm_ops.py::test_tfidf_surfaces_rare_terms). Overflow
    bound (ADVICE r8 correction): tf·(N+1)·1e6 < 2^63 ≈ 9.22·10^18 holds
    for N ≤ ~9·10^8 docs at tf ≤ 10^4 (or N ≤ 10^9 with tf ≤ 9·10^3) —
    NOT a full 10^9 at tf 10^4, which is ~1e19 and overflows; beyond
    that drop the 1e6 scale or score per-shard.

    One explode + two hash-aggs + an ADAPTIVE tf⨝df join: the df table is
    vocabulary-scaled (Heaps' law — unbounded in the corpus), so it is
    never hint-broadcast; it is an in-plan aggregate whose runtime size
    AQE measures, converting to a broadcast join exactly when it fits.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    toks = documents.select(
        "doc_id", F.explode(F.split("text", " +")).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = documents.count()
    scored = tf.join(df, "token").withColumn(
        "tfidf_ppm",
        F.expr(
            f"CAST((tf * ({n_docs} + 1) * {_TFIDF_SCALE}) DIV (df + 1) AS BIGINT)"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_ppm"), "token")
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= top_k)
        .select("doc_id", "token", "tf", "df", "tfidf_ppm", "term_rank")
    )


def _tfidf_oracle_sql(d: Dialect) -> str:
    """DuckDB twin of tfidf_top_terms — same tf/df counts, same fixed-point
    score, same (score DESC, token) tiebreak."""
    score = d.idiv(
        f"(t.tf * (n.n_docs + 1) * {_TFIDF_SCALE})", "(d2.df + 1)"
    )
    return f"""
WITH toks AS ({d.all_token_rows('documents')}),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, token
),
df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.token, t.tf, d2.df,
         CAST({score} AS BIGINT) AS tfidf_ppm
  FROM tf t JOIN df d2 ON t.token = d2.token CROSS JOIN n
)
SELECT doc_id, token, tf, df, tfidf_ppm, term_rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY tfidf_ppm DESC, token
  ) AS term_rank
  FROM scored
) r WHERE term_rank <= 5
"""


@df_query(
    "q_tfidf",
    duck_sql=_tfidf_oracle_sql(DUCK),
    tables=["documents"],
    doc="TF-IDF top-5 terms per document — exact fixed-point score "
    "tfidf_ppm = (tf·(N+1)·1e6) DIV (df+1) (smooth raw idf; the "
    "q_collocations lift precedent), pure BIGINT so the query is "
    "hash-oracled (converted from rows-only in r8 — the former ln() "
    "score diverged from DuckDB's libm by 1 ulp on ~1% of inputs). "
    "Rare-term ranking behavior additionally pinned by tests/"
    "test_llm_ops.py::test_tfidf_surfaces_rare_terms. Plan: one "
    "explode, two hash-aggs, AQE-adaptive tf⨝df join (the df table is "
    "vocabulary-scaled, never hint-broadcast), per-doc window — no "
    "global sort.",
)
def q_tfidf(spark, sf_dir):
    from ..sources.tables import load_tables

    t = load_tables(spark, sf_dir, ["documents"])
    return tfidf_top_terms(t["documents"])


def winnow_fingerprints(documents) -> "DataFrame":  # noqa: F821
    """(doc_id, fp) fingerprint-set rows — the indexable form of
    q_winnow_fingerprint (which summarises per doc). Same algebra: 3-token
    shingle hashes mod P, min over each 4-shingle window, deduped."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    toks = documents.select(
        "doc_id", F.posexplode(F.split("text", " +")).alias("i", "token")
    )
    h = F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("bigint")
    w_doc = Window.partitionBy("doc_id").orderBy("i")
    hashed = toks.select("doc_id", "i", h.alias("h"))
    s = (
        31 * F.col("h")
        + 37 * F.lead("h", 1).over(w_doc)
        + 41 * F.lead("h", 2).over(w_doc)
    ) % _WIN_P
    shingled = hashed.select("doc_id", "i", s.alias("s")).where(F.col("s").isNotNull())
    w_frame = w_doc.rowsBetween(-(_WINNOW_W - 1), 0)
    return (
        shingled.select("doc_id", F.min("s").over(w_frame).alias("fp"))
        .distinct()
    )


_COLLOC_MIN_SUPPORT = 5
_COLLOC_SCALE = 1_000_000  # fixed-point scale for the integer lift score


def _collocations_sql(d: Dialect) -> str:
    """Collocation mining: adjacent-bigram lift, the PMI workhorse behind
    tokenizer-merge candidates and phrase detection. PMI itself is
    ln(p_xy/(p_x·p_y)) — and ln() is not bit-stable across libm
    implementations (the q_tfidf lesson) — so the score is emitted as the
    exact fixed-point LIFT instead: (n_xy · N · 1e6) DIV (n_x · n_y),
    pure BIGINT arithmetic, identical in any engine, and rank-equivalent
    to PMI (ln is monotone). Products stay < 2^63 up to ~10^8 corpus
    tokens per shard; beyond that, compute lift per (lang) shard or drop
    the 1e6 scale.
    """
    pos = d.positional_token_rows("documents")
    return f"""
WITH pos AS ({pos}),
big AS (
  SELECT doc_id, i, token AS w1,
         LEAD(token) OVER (PARTITION BY doc_id ORDER BY i) AS w2
  FROM pos
),
bc AS (
  SELECT w1, w2, COUNT(*) AS n_xy
  FROM big WHERE w2 IS NOT NULL
  GROUP BY w1, w2
),
uc AS (SELECT token, COUNT(*) AS n FROM pos GROUP BY token),
tot AS (SELECT COUNT(*) AS n_tokens FROM pos)
SELECT
  bc.w1,
  bc.w2,
  bc.n_xy,
  a.n AS n_x,
  b.n AS n_y,
  {d.idiv(f'(bc.n_xy * t.n_tokens * {_COLLOC_SCALE})', '(a.n * b.n)')}
    AS lift_ppm
FROM bc
JOIN uc a ON bc.w1 = a.token
JOIN uc b ON bc.w2 = b.token
CROSS JOIN tot t
WHERE bc.n_xy >= {_COLLOC_MIN_SUPPORT}
"""


sql_query(
    "q_collocations",
    spark_sql=_collocations_sql(SPARK),
    duck_sql=_collocations_sql(DUCK),
    tables=["documents"],
    doc="Collocation mining (adjacent-bigram lift with min support 5): "
    "positional explode → LEAD bigrams → bigram/unigram count aggs → "
    "exact fixed-point lift (n_xy·N·1e6 DIV n_x·n_y) — rank-equivalent to "
    "PMI without ln()'s cross-libm instability. The bigram LEAD reuses "
    "the doc_id exchange; unigram side joins are hash joins on token; the "
    "corpus-total is a 1-row broadcast. Min-support prunes the long tail "
    "before the joins.",
)


# ---------------------------------------------------------------------------
# Bigram language-model scoring — perplexity-style predictability filter.
# ---------------------------------------------------------------------------


def _bigram_lm_sql(d: Dialect) -> str:
    """Score each document by the average MLE bigram probability of its own
    corpus: p(w2|w1) = c(w1,w2)/c(w1 ·). Scoring the training corpus itself
    means every bigram has support ≥ 1, so no smoothing term is needed and
    every probability is one exact IEEE division. Each probability is then
    snapped to DECIMAL(28,12) (grid far coarser than the double's ulp, so
    both engines land on the same decimal) and summed exactly — the
    cross-engine-deterministic stand-in for the ln-based log-likelihood,
    rank-equivalent for filtering."""
    return f"""
WITH toks AS ({d.positional_token_rows('documents')}),
big AS (
  SELECT doc_id, w1, w2 FROM (
    SELECT doc_id, token AS w1,
           LEAD(token) OVER (PARTITION BY doc_id ORDER BY i) AS w2
    FROM toks
  ) b WHERE w2 IS NOT NULL
),
bg AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM big GROUP BY w1, w2),
un AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM big GROUP BY w1),
scored AS (
  SELECT b.doc_id,
         CAST(CAST(g.c12 AS DOUBLE) / u.c1 AS DECIMAL(28,12)) AS p
  FROM big b
  JOIN bg g ON b.w1 = g.w1 AND b.w2 = g.w2
  JOIN un u ON b.w1 = u.w1
)
SELECT
  doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
  CAST(SUM(p) AS DOUBLE) / COUNT(*) AS avg_bigram_prob,
  CAST(MIN(p) AS DOUBLE) AS min_bigram_prob,
  CAST(SUM(CASE WHEN p >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_predictable
FROM scored
GROUP BY doc_id
"""


sql_query(
    "q_bigram_lm",
    spark_sql=_bigram_lm_sql(SPARK),
    duck_sql=_bigram_lm_sql(DUCK),
    tables=["documents"],
    doc="Bigram LM predictability scoring (the perplexity-filter shape used "
    "for pretraining-data quality, cf. CCNet/KenLM pipelines): train bigram "
    "MLE counts on the corpus, score each doc's mean p(w2|w1). Boilerplate "
    "and template text scores near 1 (every transition memorized), diverse "
    "prose scores low — threshold on avg_bigram_prob to drop machine-"
    "generated repetition. Plan: one positional explode, one LEAD window on "
    "the existing doc_id exchange, two count aggs, two hash joins back on "
    "token keys — the model IS the aggregate, no driver state. At 100 TB "
    "the bigram table is the big side; it hash-partitions on w1 and the "
    "min-support prune from q_collocations applies unchanged if the tail "
    "must shrink. Probabilities quantized to DECIMAL(28,12) before the sum "
    "for order-independent exactness (same convention as detsql.dsum).",
)


# ---------------------------------------------------------------------------
# Inverted-index build — the search/retrieval primitive.
# ---------------------------------------------------------------------------


def _inverted_index_sql(d: Dialect) -> str:
    """token → posting-list statistics. Postings themselves are capped to
    the 5 lowest doc_ids per token (deterministic, bounded output) and
    emitted as a CSV string; the full list at scale stays relational
    (token-partitioned), exactly how a distributed index shard is laid
    out. df/cf/span stats are exact integers."""
    if d.name == "spark":
        postings = (
            "concat_ws(',', slice(array_sort(collect_set(doc_id)), 1, 5))"
        )
    else:
        postings = (
            "array_to_string(list_sort(list_distinct(list(doc_id)))[1:5], ',')"
        )
    return f"""
WITH tok AS (
  SELECT doc_id, token
  FROM ({d.positional_token_rows('documents')}) t
  WHERE token <> ''
)
SELECT
  token,
  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
  CAST(COUNT(*) AS BIGINT) AS cf,
  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
  CAST(MAX(doc_id) AS BIGINT) AS last_doc,
  {postings} AS sample_postings
FROM tok
GROUP BY token
"""


sql_query(
    "q_inverted_index",
    spark_sql=_inverted_index_sql(SPARK),
    duck_sql=_inverted_index_sql(DUCK),
    tables=["documents"],
    doc="Inverted-index build (token → posting-list stats + capped sorted "
    "posting sample): document frequency, collection frequency, doc-id "
    "span, and the 5 lowest postings per token as a deterministic CSV — "
    "the retrieval primitive behind BM25 serving and the df-side of "
    "q_tfidf. One explode + one (token)-keyed aggregate; posting lists "
    "shard naturally by token hash at 100 TB (each shard is one group), "
    "with collect_set bounded here via the explicit cap — unbounded "
    "per-group collection is the one thing this repo's plan rules ban.",
)


def _oov_sql(d: Dialect) -> str:
    """Out-of-vocabulary rate per document against the corpus head
    vocabulary (tokens covering > 2% of the token stream — the same
    support threshold q_heavy_hitters recovers with Misra-Gries; here the
    plain aggregate serves as the vocab builder since the vocabulary is a
    reused artifact, not a one-shot stream answer)."""
    if d.name == "spark":
        tok_rows = "SELECT doc_id, explode(split(text, ' ')) AS token FROM documents"
    else:
        tok_rows = (
            "SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM documents"
        )
    return f"""
WITH tokens AS ({tok_rows}),
tot AS (SELECT COUNT(*) AS n FROM tokens),
vocab AS (
  SELECT token FROM tokens GROUP BY token
  HAVING COUNT(*) > (SELECT n FROM tot) * 0.02
)
SELECT
  t.doc_id,
  COUNT(*) AS n_tokens,
  CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS oov_tokens,
  CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
    / COUNT(*) AS oov_rate
FROM tokens t LEFT JOIN vocab v ON t.token = v.token
GROUP BY t.doc_id
"""


sql_query(
    "q_oov_rate",
    spark_sql=_oov_sql(SPARK),
    duck_sql=_oov_sql(DUCK),
    tables=["documents"],
    doc="Tokenizer-coverage audit: per-document out-of-vocabulary rate "
    "against the corpus head vocabulary (tokens above 2% stream share — "
    "the q_heavy_hitters support threshold). One token explode, one "
    "vocab aggregate, a broadcast-sized LEFT JOIN for membership, one "
    "exact int/int division per doc. The operational companion to "
    "heavy-hitter vocab discovery: docs with high OOV against the head "
    "vocabulary are exactly the ones a byte-fallback tokenizer will "
    "fragment.",
)


# --- BPE merge-step (tokenizer training kernel) ---------------------------

_BPE_TOP_PAIRS = 20


def _bpe_merge_sql(d: Dialect) -> str:
    """One BPE training iteration at corpus scale: the symbol-pair counting
    that picks the next merge (Sennrich et al., ACL 2016). Words are
    whitespace tokens aggregated WITH frequencies first (the classic BPE
    trick — pair counts then weight by word frequency, so the expensive
    character explode runs once per DISTINCT word, not once per token
    occurrence); symbols start as characters; every adjacent symbol pair's
    corpus count = Σ over distinct words of (occurrences-in-word × word
    frequency). Emits the top-20 merge candidates (count, pair) with full
    deterministic tiebreak — rank 1 IS the next merge rule.

    Scale shape: one token-count aggregation (map-side partials), one
    character posexplode over the DISTINCT-word table (vocabulary-sized,
    not corpus-sized), one pair aggregation. At 100 TB the vocabulary
    table is millions of rows where the corpus is trillions of tokens —
    this factorization is what makes distributed BPE training tractable;
    subsequent iterations re-segment the vocabulary table only.
    """
    tok = d.split_tokens("text")
    if d.name == "spark":
        word_rows = f"SELECT explode({tok}) AS word FROM documents"
        chars = (
            "SELECT word, freq, p.i, p.c FROM vocab "
            "LATERAL VIEW posexplode(split(word, '')) p AS i, c"
        )
    else:
        word_rows = f"SELECT unnest({tok}) AS word FROM documents"
        chars = (
            "SELECT word, freq, u.i, u.c FROM ("
            "SELECT word, freq, unnest(list_transform(split(word, ''),"
            " (x, i) -> {'c': x, 'i': i})) AS u FROM vocab) s"
        )
    return f"""
WITH words AS ({word_rows}),
vocab AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM words
  WHERE length(word) >= 2 GROUP BY word
),
chars AS ({chars}),
pairs AS (
  SELECT a.word, a.freq, a.c AS left_sym, b.c AS right_sym
  FROM chars a JOIN chars b
    ON a.word = b.word AND b.i = a.i + 1
)
SELECT
  left_sym,
  right_sym,
  CAST(SUM(freq) AS BIGINT) AS pair_count,
  CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words
FROM pairs
GROUP BY left_sym, right_sym
ORDER BY pair_count DESC, left_sym, right_sym
LIMIT {_BPE_TOP_PAIRS}
"""


sql_query(
    "q_bpe_merge_step",
    spark_sql=_bpe_merge_sql(SPARK),
    duck_sql=_bpe_merge_sql(DUCK),
    tables=["documents"],
    doc=_bpe_merge_sql.__doc__,
)


# --- Keyword search (serving-side retrieval over the inverted index) ------

_SEARCH_TERMS = ["data", "value", "table"]
_SEARCH_TOP = 20


def _keyword_search_sql(d: Dialect) -> str:
    """Multi-term keyword search with tf·(N/df) ranking — the serving-side
    retrieval query the inverted index (q_inverted_index) exists for. The
    linear-idf variant (N/df instead of log(N/df)) keeps every score a
    ratio of exact integers: per-term contributions snap to DECIMAL(28,6)
    and sum in decimal (order-independent), so the ranking is bit-stable
    cross-engine — the log form is rank-equivalent per term but not
    cross-libm exact (q_tfidf's lesson).

    Scale shape: term postings come from one token-keyed aggregation
    filtered to the query terms (at serving time: 3 index point-lookups);
    the doc-score aggregation touches only docs containing ≥1 term; top-20
    via TakeOrderedAndProject — no global sort.
    """
    tok = d.distinct_token_rows("documents")
    terms = ", ".join(f"'{t}'" for t in _SEARCH_TERMS)
    return f"""
WITH tok AS ({tok}),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
df AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df
  FROM tok WHERE token IN ({terms}) GROUP BY token
),
tf AS (
  SELECT t.doc_id, t.token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM ({d.all_token_rows('documents')}) t
  WHERE t.token IN ({terms})
  GROUP BY t.doc_id, t.token
),
contrib AS (
  SELECT tf.doc_id,
         CAST(tf.tf * (CAST(n.n_docs AS DOUBLE) / df.df) AS DECIMAL(28,6))
           AS c
  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
)
SELECT doc_id,
       CAST(COUNT(*) AS INT) AS n_terms_matched,
       CAST(SUM(c) AS DOUBLE) AS score
FROM contrib
GROUP BY doc_id
ORDER BY SUM(c) DESC, doc_id
LIMIT {_SEARCH_TOP}
"""


def _register_search():
    sql_query(
        "q_keyword_search",
        spark_sql=_keyword_search_sql(SPARK),
        duck_sql=_keyword_search_sql(DUCK),
        tables=["documents"],
        doc=_keyword_search_sql.__doc__,
    )


_register_search()


# ---------------------------------------------------------------------------
# Vocabulary growth (Heaps' law) — new vs cumulative types per corpus decile.
# ---------------------------------------------------------------------------


def _vocab_growth_sql(d: Dialect) -> str:
    """Scan the corpus in doc_id order, split into 10 deciles (bucket =
    doc_id·10 DIV N — doc_ids are dense, so no global row numbering), and
    chart vocabulary growth: a token TYPE is born in the decile of its
    MIN(doc_id). Sub-linear cumulative growth (Heaps' law) is the
    canonical dedup-health signal — a corpus whose vocabulary grows
    linearly is mostly unique noise, one that flattens too fast is
    heavily duplicated."""
    return f"""
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
toks AS ({d.all_token_rows('documents')}),
births AS (
  SELECT token, MIN(doc_id) AS first_doc, CAST(COUNT(*) AS BIGINT) AS occurrences
  FROM toks GROUP BY token
),
by_decile AS (
  SELECT {d.idiv('first_doc * 10', 'n_docs')} AS decile,
         CAST(COUNT(*) AS BIGINT) AS new_types
  FROM births CROSS JOIN n GROUP BY {d.idiv('first_doc * 10', 'n_docs')}
),
occ AS (
  SELECT {d.idiv('doc_id * 10', 'n_docs')} AS decile,
         CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM toks CROSS JOIN n GROUP BY {d.idiv('doc_id * 10', 'n_docs')}
)
SELECT o.decile,
       o.n_tokens,
       COALESCE(b.new_types, 0) AS new_types,
       CAST(SUM(COALESCE(b.new_types, 0)) OVER (
         ORDER BY o.decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_types
FROM occ o LEFT JOIN by_decile b ON o.decile = b.decile
"""


sql_query(
    "q_vocab_growth",
    spark_sql=_vocab_growth_sql(SPARK),
    duck_sql=_vocab_growth_sql(DUCK),
    tables=["documents"],
    doc="Heaps'-law vocabulary growth curve: token TYPES born per corpus "
    "decile (birth = decile of the type's MIN(doc_id)) against token "
    "occurrences, with the cumulative type count — the dedup-health "
    "diagnostic (flattening too fast ⇒ duplication; linear ⇒ noise). "
    "Deciles come straight from dense doc_ids (doc_id·10 DIV N with a "
    "1-row count broadcast — no global row numbering of the corpus); "
    "the one full-data pass is the token explode into a (token) "
    "min/count aggregate, map-side combined; the cumulative window runs "
    "over 10 rows.",
)


# ---------------------------------------------------------------------------
# Held-out LM evaluation — train the bigram model on the train split, score
# the val/test splits (the generalization measurement q_bigram_lm's
# train-on-self form cannot make).
# ---------------------------------------------------------------------------


def _lm_holdout_sql(d: Dialect) -> str:
    """Bigram counts from split='train' docs only (the q_train_split
    multiplicative hash reproduced inline), then add-one-smoothed scoring
    of the held-out docs: p(w2|w1) = (c12 + 1) / (c1 + V), V = train
    vocabulary size — smoothing is REQUIRED here because held-out bigrams
    can be unseen (train-on-self never needed it). Every probability is
    one exact int/int division snapped to DECIMAL(28,12) before the
    order-independent sum."""
    bucket = "((doc_id * 2654435761 + 104729) % 1000)"
    return f"""
WITH toks AS ({d.positional_token_rows('documents')}),
big AS (
  SELECT doc_id, w1, w2 FROM (
    SELECT doc_id, token AS w1,
           LEAD(token) OVER (PARTITION BY doc_id ORDER BY i) AS w2
    FROM toks
  ) b WHERE w2 IS NOT NULL
),
split AS (SELECT doc_id, {bucket} AS bkt FROM documents),
train_big AS (
  SELECT big.w1, big.w2 FROM big JOIN split ON big.doc_id = split.doc_id
  WHERE split.bkt < 960
),
bg AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM train_big GROUP BY w1, w2),
un AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM train_big GROUP BY w1),
v AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS vsize FROM (
    SELECT w1 FROM train_big UNION SELECT w2 FROM train_big
  ) w
),
held AS (
  SELECT big.doc_id,
         CASE WHEN split.bkt < 980 THEN 'val' ELSE 'test' END AS split,
         big.w1, big.w2
  FROM big JOIN split ON big.doc_id = split.doc_id
  WHERE split.bkt >= 960
),
scored AS (
  SELECT h.doc_id, h.split,
         CAST(CAST(COALESCE(g.c12, 0) + 1 AS DOUBLE)
              / (COALESCE(u.c1, 0) + v.vsize) AS DECIMAL(28,12)) AS p,
         CASE WHEN g.c12 IS NULL THEN 1 ELSE 0 END AS unseen
  FROM held h
  LEFT JOIN bg g ON h.w1 = g.w1 AND h.w2 = g.w2
  LEFT JOIN un u ON h.w1 = u.w1
  CROSS JOIN v
)
SELECT doc_id, split,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(p) AS DOUBLE) / COUNT(*) AS avg_smoothed_prob,
       CAST(SUM(unseen) AS BIGINT) AS n_unseen
FROM scored GROUP BY doc_id, split
"""


sql_query(
    "q_lm_holdout",
    spark_sql=_lm_holdout_sql(SPARK),
    duck_sql=_lm_holdout_sql(DUCK),
    tables=["documents"],
    doc="Held-out LM evaluation with proper train/score separation: "
    "bigram counts from the train split only (q_train_split's "
    "multiplicative hash inline), add-one-smoothed scoring of val/test "
    "docs — unseen-bigram handling that train-on-self (q_bigram_lm) "
    "never exercises. Per-doc mean smoothed probability + unseen count "
    "= the deterministic stand-in for held-out perplexity. Plan: one "
    "positional explode feeds both sides; train aggregates are "
    "(w1, w2)-keyed hash joins back onto the held stream; the 1-row "
    "vocab size broadcasts; decimal-snapped sums keep the gate exact.",
)


# ---------------------------------------------------------------------------
# BM25 ranking — the full Robertson/Spärck Jones scoring the tf·(N/df)
# search above approximates (term saturation + document-length norm).
# ---------------------------------------------------------------------------

_BM25_K1 = "1.2"
_BM25_B = "0.75"


def _bm25_sql(d: Dialect) -> str:
    """BM25 top-20 with the transcendental-free rational idf.

    score(D, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = max((N − df + 0.5) / (df + 0.5), 1e-6) — the raw Robertson
    odds ratio WITHOUT the log wrap, floored at a small positive value
    (the Lucene convention applied to the rational form: the raw ratio
    goes negative when df > N/2, which would let a majority-frequent
    term invert rankings). Per term the log is monotone, so per-term
    ranking is unchanged; cross-term sums make this a BM25-inspired
    rational variant rather than exact BM25 ordering — documented
    trade for bit-stable cross-engine scores: every operation is IEEE
    +,·,/,max on doubles (correctly rounded, identical in the JVM and
    libm) — no ln, whose last-ulp disagreement made q_tfidf rows-only.
    Contributions snap to DECIMAL(28,6) and sum in decimal
    (order-independent), q_keyword_search's convention.

    Scale shape: ONE corpus scan computes (dl, query-filtered token
    array) per doc — the filter runs on the array BEFORE any explode, so
    the generator emits only matching occurrences (~the posting lists,
    not the token stream); df falls out of tf (count of docs per term),
    dl rides through the explode as a grouping key (functionally
    dependent on doc_id — no join-back scan), the 1-row corpus stats
    broadcast, and top-20 goes through TakeOrderedAndProject. Two scans
    total (postings + corpus stats), no global sort.
    """
    terms = ", ".join(f"'{t}'" for t in _SEARCH_TERMS)
    k1, b = _BM25_K1, _BM25_B
    toks = d.split_tokens("text")
    if d.name == "spark":
        qtoks = f"filter({toks}, x -> x IN ({terms}))"
        gen = "explode(qtoks)"
    else:
        qtoks = f"list_filter({toks}, x -> x IN ({terms}))"
        gen = "unnest(qtoks)"
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST({d.arr_len(toks)} AS BIGINT) AS dl,
         {qtoks} AS qtoks
  FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS total_tokens
  FROM base
),
tf AS (
  SELECT doc_id, dl, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, dl, {gen} AS token FROM base) t
  GROUP BY doc_id, dl, token
),
df AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
),
contrib AS (
  SELECT tf.doc_id,
         CAST(
           GREATEST((CAST(s.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5),
                    0.000001)
           * ((CAST(tf.tf AS DOUBLE) * ({k1} + 1.0))
              / (CAST(tf.tf AS DOUBLE)
                 + {k1} * (1.0 - {b}
                           + {b} * (CAST(tf.dl AS DOUBLE)
                                    * CAST(s.n_docs AS DOUBLE)
                                    / CAST(s.total_tokens AS DOUBLE)))))
         AS DECIMAL(28,6)) AS c
  FROM tf
  JOIN df ON tf.token = df.token
  CROSS JOIN stats s
)
SELECT doc_id,
       CAST(COUNT(*) AS INT) AS n_terms_matched,
       CAST(SUM(c) AS DOUBLE) AS bm25
FROM contrib
GROUP BY doc_id
ORDER BY SUM(c) DESC, doc_id
LIMIT {_SEARCH_TOP}
"""


sql_query(
    "q_bm25",
    spark_sql=_bm25_sql(SPARK),
    duck_sql=_bm25_sql(DUCK),
    tables=["documents"],
    doc="BM25 retrieval (k1=1.2, b=0.75) over the document corpus — term "
    "saturation and document-length normalization on top of "
    "q_keyword_search's plain tf·idf, with the rational (log-free) "
    "Robertson idf so every score is exact IEEE rational arithmetic and "
    "the DuckDB oracle hash-matches bit-for-bit (dl/avgdl is computed as "
    "dl·N/total_tokens — two broadcast scalars, one division). Plan: df "
    "from a term-filtered token aggregate (3 point-lookups against "
    "q_inverted_index's layout at serving time), dl as a pure map, "
    "doc-keyed score aggregation over matching docs only, top-20 via "
    "TakeOrderedAndProject. At 100 TB the only corpus-wide pass is the "
    "dl/stats scan — exactly the statistics a real index build "
    "precomputes once.",
)


# ---------------------------------------------------------------------------
# ROUGE-2 over near-dup candidate pairs — the eval-metric primitive.
# ---------------------------------------------------------------------------


def _rouge_pairs_sql(d: Dialect) -> str:
    """ROUGE-2 (clipped bigram overlap) precision/recall/F1 for every
    Jaccard >= 0.8 near-dup candidate pair — the summarization-eval metric
    repurposed as a dedup audit: token-set Jaccard ignores order and
    multiplicity, ROUGE's clipped counts (Σ min(c_a, c_b)) see both, so a
    pair with high Jaccard but low ROUGE-2 is a bag-of-words false
    friend. Overlap, totals and the P/R/F1 ratios are exact integers and
    single IEEE divisions (F1 = 2·o/(ta+tb) — the harmonic identity with
    no intermediate P·R product) — hash-exact. Totals LEFT-join onto the
    pair set so a single-token doc (zero bigrams) keeps its audit row
    with totals 0 and NULL ratios instead of being silently dropped.

    Scale shape: bigram tables are (doc, gram)-keyed aggregates; each
    pair pulls ITS OWN two gram multisets through (pair, gram)-keyed
    equality joins (no corpus-wide gram fanout); the candidate set comes
    from the same blocked Jaccard join the dedup family shares (MinHash
    bands at 100 TB)."""
    tok = d.distinct_token_rows("documents", extra_cols="lang, source")
    pos = d.positional_token_rows("documents")
    return f"""
WITH tok AS ({tok}),
doc_size AS (
  SELECT doc_id, COUNT(*) AS n_tokens FROM tok GROUP BY doc_id
),
pair_inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM tok a
  JOIN tok b
    ON a.token = b.token AND a.lang = b.lang AND a.source = b.source
   AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT p.doc_a, p.doc_b
  FROM pair_inter p
  JOIN doc_size sa ON p.doc_a = sa.doc_id
  JOIN doc_size sb ON p.doc_b = sb.doc_id
  WHERE CAST(p.inter AS DOUBLE) / (sa.n_tokens + sb.n_tokens - p.inter) >= 0.8
),
positioned AS ({pos}),
bigrams AS (
  SELECT a.doc_id, a.token AS w1, b.token AS w2,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM positioned a
  JOIN positioned b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  GROUP BY a.doc_id, a.token, b.token
),
pair_overlap AS (
  SELECT p.doc_a, p.doc_b,
         CAST(SUM(LEAST(ga.c, gb.c)) AS BIGINT) AS o
  FROM pairs p
  JOIN bigrams ga ON ga.doc_id = p.doc_a
  JOIN bigrams gb ON gb.doc_id = p.doc_b
               AND gb.w1 = ga.w1 AND gb.w2 = ga.w2
  GROUP BY p.doc_a, p.doc_b
),
totals AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS t FROM bigrams GROUP BY doc_id
)
SELECT p.doc_a, p.doc_b,
       COALESCE(o.o, 0) AS overlap,
       COALESCE(ta.t, 0) AS bigrams_a, COALESCE(tb.t, 0) AS bigrams_b,
       CASE WHEN COALESCE(tb.t, 0) > 0
            THEN CAST(COALESCE(o.o, 0) AS DOUBLE) / tb.t END AS rouge2_p,
       CASE WHEN COALESCE(ta.t, 0) > 0
            THEN CAST(COALESCE(o.o, 0) AS DOUBLE) / ta.t END AS rouge2_r,
       CASE WHEN COALESCE(ta.t, 0) + COALESCE(tb.t, 0) > 0
            THEN 2.0 * COALESCE(o.o, 0)
                 / (CAST(COALESCE(ta.t, 0) AS DOUBLE) + COALESCE(tb.t, 0))
       END AS rouge2_f1
FROM pairs p
LEFT JOIN pair_overlap o ON p.doc_a = o.doc_a AND p.doc_b = o.doc_b
LEFT JOIN totals ta ON p.doc_a = ta.doc_id
LEFT JOIN totals tb ON p.doc_b = tb.doc_id
"""


sql_query(
    "q_rouge_pairs",
    spark_sql=_rouge_pairs_sql(SPARK),
    duck_sql=_rouge_pairs_sql(DUCK),
    tables=["documents"],
    doc="ROUGE-2 (clipped bigram overlap) precision/recall/F1 for every "
    "Jaccard>=0.8 near-dup candidate pair — the summarization-eval metric "
    "repurposed as a dedup audit: token-set Jaccard ignores order and "
    "multiplicity, ROUGE's clipped counts see both, so a high-Jaccard/"
    "low-ROUGE pair is a bag-of-words false friend. Totals LEFT-join "
    "onto the pair set (zero-bigram docs keep their row, NULL ratios). "
    "Plan: (doc,gram)-keyed bigram aggregates; each pair pulls its own "
    "two gram multisets through (pair,gram)-keyed equality joins; "
    "candidates come from the shared blocked Jaccard join (MinHash "
    "bands at 100 TB).",
)


# ---------------------------------------------------------------------------
# n-gram novelty curve — memorization / duplication saturation by corpus
# position.
# ---------------------------------------------------------------------------

_NOV_K = 8
_NOV_MULT = [31, 37, 41, 43, 47, 53, 59, 61]


def _ngram_novelty_sql(d: Dialect) -> str:
    """8-gram novelty by corpus decile: for each tenth of the corpus (in
    doc_id order — the ingestion-order proxy), what fraction of its 8-gram
    occurrences involve a gram never seen in an EARLIER decile? A healthy
    diverse corpus keeps the unseen fraction high in every decile; a
    template-heavy or over-crawled one saturates (later deciles mostly
    re-emit earlier grams) — the curve LLM curation teams watch for
    memorization risk alongside exact/near dedup. Rolling 8-gram hashes
    use the q_winnow_fingerprint arithmetic (32-bit md5 prefixes, distinct
    multipliers mod a 31-bit prime — exact BIGINT); deciles come from
    1-row doc_id bounds (broadcast)."""
    pos = d.positional_token_rows("documents")
    h = d.md5_int32("token")
    gram = " + ".join(
        f"{m} * LEAD(h, {j}) OVER (PARTITION BY doc_id ORDER BY i)"
        if j
        else f"{m} * h"
        for j, m in enumerate(_NOV_MULT)
    )
    dec = d.idiv("(doc_id - mm.mn) * 10", "(mm.mx - mm.mn + 1)")
    return f"""
WITH pos_tok AS ({pos}),
hashed AS (SELECT doc_id, i, {h} AS h FROM pos_tok),
grams AS (
  SELECT doc_id, ({gram}) % {1000000007} AS g
  FROM hashed
),
mm AS (
  SELECT CAST(MIN(doc_id) AS BIGINT) AS mn, CAST(MAX(doc_id) AS BIGINT) AS mx
  FROM documents
),
gd AS (
  SELECT CAST({dec} AS INT) AS dec, g
  FROM grams CROSS JOIN mm
  WHERE g IS NOT NULL
),
first_seen AS (
  SELECT g, MIN(dec) AS first_dec FROM gd GROUP BY g
)
SELECT gd.dec AS corpus_decile,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT gd.g) AS BIGINT) AS n_distinct_grams,
       CAST(SUM(CASE WHEN fs.first_dec = gd.dec THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unseen_occurrences,
       CAST({d.idiv(
           'SUM(CASE WHEN fs.first_dec = gd.dec THEN 1 ELSE 0 END) * 1000000',
           'COUNT(*)')} AS BIGINT) AS unseen_ppm
FROM gd JOIN first_seen fs ON gd.g = fs.g
GROUP BY gd.dec
"""


sql_query(
    "q_ngram_novelty",
    spark_sql=_ngram_novelty_sql(SPARK),
    duck_sql=_ngram_novelty_sql(DUCK),
    tables=["documents"],
    doc="8-gram novelty curve by corpus decile (ingestion-order proxy = "
    "doc_id): per tenth of the corpus, the count and ppm of 8-gram "
    "occurrences whose gram first appears in that decile — the "
    "memorization-saturation diagnostic curation teams read next to "
    "dedup rates (a template-heavy corpus's later deciles mostly re-emit "
    "earlier grams). Rolling 8-gram hashes via doc-partitioned LEAD "
    "windows over 32-bit md5 token prefixes with distinct multipliers "
    "mod a 31-bit prime (exact BIGINT both engines); decile bounds from "
    "a 1-row doc_id min/max broadcast (whitelisted). Plan: per-doc "
    "windows (no global sort), one gram-keyed first-seen aggregate, one "
    "gram-keyed join back — all hash-partitioned on the gram hash at "
    "100 TB.",
)


# ---------------------------------------------------------------------------
# Good-Turing / Chao1 unseen-vocabulary estimators — how much of the type
# space has the corpus NOT seen yet (the forward-looking companion to
# q_vocab_growth's backward-looking Heaps curve).
# ---------------------------------------------------------------------------


def _unseen_vocab_sql(d: Dialect) -> str:
    """Count-of-counts profile N_r (how many character-8-gram TYPES occur
    exactly r times — the shingle unit, because the synthetic word vocab
    is ~31 types with no rare tail, while the 8-gram space has ~10k types
    and ~2.4k hapax), capped at r <= 10 with an '11 = everything more
    frequent' tail bucket, plus the three classical estimators built
    from it: Good-Turing unseen probability mass P0 = N_1/N, Turing
    coverage C = 1 - N_1/N, and the bias-corrected Chao1 richness
    S_chao1 = S_obs + N_1*(N_1-1)/(2*(N_2+1)) (the +1 keeps it defined
    when doubletons are absent). Every estimator is a ppm staged idiv
    over exact nonnegative BIGINT counts — no transcendental anywhere,
    so the cross-engine gate stays bit-exact; consumers wanting the
    full Simple Good-Turing smooth fit the log-log regression on the
    (r, N_r) rows this query already emits."""
    if d.name == "spark":
        # The documents table is one parquet split at bench SF, and the
        # 8-gram explode + count partial-aggregates INSIDE the scan task —
        # the whole corpus-scale stage ran on ONE core (measured 2.7 s
        # single-task stage at sf0.1; optimization r11, guide §2.2). An
        # explicit-width round-robin repartition of just the text column
        # (cheap: one shuffle of the raw bytes) spreads the CPU-dense
        # explode across the configured parallelism; the count-of-counts
        # algebra is order-insensitive, so results are unchanged.
        toks = (
            "SELECT explode(transform(sequence(1, length(text) - 7),"
            " i -> substring(text, i, 8))) AS token"
            f" FROM (SELECT /*+ REPARTITION({DEFAULT_SHUFFLE_PARTITIONS}) */"
            " text FROM documents WHERE length(text) >= 8) docs"
        )
    else:
        toks = (
            "SELECT unnest(list_transform(range(1, length(text) - 6),"
            " i -> substr(text, CAST(i AS INT), 8))) AS token"
            " FROM documents WHERE length(text) >= 8"
        )
    # N must be the TRUE token total (n_tokens carries the uncapped
    # per-type counts) — `r * n_types` would undercount the r=11 tail.
    p0 = d.idiv("SUM(CASE WHEN r = 1 THEN n_types ELSE 0 END) OVER () * 1000000",
                "SUM(n_tokens) OVER ()")
    chao_add = d.idiv(
        "SUM(CASE WHEN r = 1 THEN n_types ELSE 0 END) OVER () "
        "* (SUM(CASE WHEN r = 1 THEN n_types ELSE 0 END) OVER () - 1)",
        "(2 * (SUM(CASE WHEN r = 2 THEN n_types ELSE 0 END) OVER () + 1))",
    )
    return f"""
WITH type_counts AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS c
  FROM ({toks}) t
  GROUP BY token
),
coc AS (
  SELECT CASE WHEN c <= 10 THEN c ELSE 11 END AS r,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(c) AS BIGINT) AS n_tokens
  FROM type_counts
  GROUP BY CASE WHEN c <= 10 THEN c ELSE 11 END
)
SELECT r, n_types, n_tokens,
       CAST(SUM(n_types) OVER () AS BIGINT) AS s_obs,
       CAST(SUM(n_tokens) OVER () AS BIGINT) AS n_total,
       CAST({p0} AS BIGINT) AS gt_unseen_ppm,
       CAST(1000000 - {p0} AS BIGINT) AS coverage_ppm,
       CAST(SUM(n_types) OVER () + {chao_add} AS BIGINT) AS chao1_types,
       CAST(SUM(CASE WHEN r = 1 THEN n_types ELSE 0 END) OVER () AS BIGINT)
         AS hapax_types,
       CAST(SUM(CASE WHEN r = 2 THEN n_types ELSE 0 END) OVER () AS BIGINT)
         AS dis_types
FROM coc
ORDER BY r
"""


sql_query(
    "q_unseen_vocab",
    spark_sql=_unseen_vocab_sql(SPARK),
    duck_sql=_unseen_vocab_sql(DUCK),
    tables=["documents"],
    doc="Unseen-vocabulary estimators from the char-8-gram count-of-counts "
    "profile: N_r rows (types occurring exactly r times, r<=10 plus a "
    "tail bucket) with Good-Turing unseen mass P0 = N_1/N, Turing "
    "coverage 1 - P0, and bias-corrected Chao1 richness S_obs + "
    "N_1(N_1-1)/(2(N_2+1)) — the 'how much type space is the corpus "
    "still missing' gate a tokenizer-training or corpus-acquisition "
    "run checks before declaring coverage, and the forward-looking "
    "companion to q_vocab_growth's Heaps curve (which uses word "
    "tokens; the 8-gram unit is chosen because the synthetic word "
    "vocab is ~31 types with no rare tail — see docstring). Everything "
    "is exact BIGINT counts + ppm staged idiv (nonnegative, "
    "truncation==floor); no logs — consumers wanting full Simple "
    "Good-Turing fit the log-log regression on the emitted (r, N_r) "
    "rows. Corpus-scale work: one shingle explode + one (gram) "
    "aggregate (map-side combined), then an <=11-row count-of-counts "
    "grain carries the windows.",
)


# ---------------------------------------------------------------------------
# RAKE keyphrase extraction — degree/frequency word scores over
# stopword-delimited candidate phrases.
# ---------------------------------------------------------------------------


def _rake_sql(d) -> str:
    """RAKE (Rose et al. 2010) at corpus scope: candidate phrases are the
    maximal stopword-free token runs (the _EN_STOPS list delimits),
    word score = degree/frequency where degree(w) = sum of phrase
    lengths over w's occurrences, phrase score = sum of its words'
    scores. Scores are exact rationals in ppm (degree*1e6 idiv freq,
    summed per phrase); identical phrase text gets identical score by
    construction, so the corpus-level top-20 is well-defined with the
    (score desc, phrase) total order."""
    toks = d.positional_token_rows("documents")
    if d.name == "spark":
        phrase = (
            "concat_ws(' ', transform(array_sort(collect_list("
            "struct(pw.i, pw.token))), x -> x.token))"
        )
    else:
        phrase = "string_agg(pw.token, ' ' ORDER BY pw.i)"
    stop = f"token IN ({_EN_STOPS})"
    return f"""
WITH toks AS ({toks}),
segged AS (
  SELECT doc_id, i, token,
         CAST(SUM(CASE WHEN {stop} THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY i) AS BIGINT) AS seg,
         CASE WHEN {stop} THEN 1 ELSE 0 END AS is_stop
  FROM toks
),
phrase_words AS (
  SELECT doc_id, seg, i, token,
         CAST(COUNT(*) OVER (PARTITION BY doc_id, seg) AS BIGINT) AS plen
  FROM segged WHERE is_stop = 0
),
word_stats AS (
  SELECT token,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(plen) AS BIGINT) AS degree
  FROM phrase_words GROUP BY token
),
phrases AS (
  SELECT pw.doc_id, pw.seg,
         {phrase} AS phrase,
         CAST(SUM({d.idiv('(ws.degree * 1000000)', 'ws.freq')}) AS BIGINT)
           AS score_ppm
  FROM phrase_words pw JOIN word_stats ws ON ws.token = pw.token
  GROUP BY pw.doc_id, pw.seg
)
SELECT phrase,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(MAX(score_ppm) AS BIGINT) AS score_ppm
FROM phrases
GROUP BY phrase
ORDER BY score_ppm DESC, phrase
LIMIT 20
"""


def _register_rake():
    from ..functions.detsql import DUCK, SPARK
    from ..registry import sql_query

    sql_query(
        "q_rake_keyphrases",
        spark_sql=_rake_sql(SPARK),
        duck_sql=_rake_sql(DUCK),
        tables=["documents"],
        doc="RAKE keyphrase extraction at corpus scope: stopword-delimited "
        "candidate phrases scored by the sum of their words' "
        "degree/frequency ratios — the classic unsupervised keyword "
        "extractor, the phrase-level companion to q_tfidf (single-token "
        "salience) and q_collocations (bigram association). Scores are "
        "exact ppm rationals (identical phrase text -> identical score, "
        "so the top-20 under (score desc, phrase) is total-ordered). "
        "Corpus-scale plan: doc-partitioned segment windows, one "
        "token-keyed stats aggregate joined back vocab-side, one "
        "phrase-keyed aggregate, TakeOrdered top-20 — no global sort, "
        "no vocabulary dictionary.",
    )


_register_rake()


# ---------------------------------------------------------------------------
# Tokenizer fertility — per-language token-budget economics.
# ---------------------------------------------------------------------------


def _fertility_sql(d) -> str:
    """Per-language tokenizer fertility: BPE-proxy tokens per word,
    characters per token, and each language's share of the corpus token
    budget vs its share of documents — the multilingual-curation readout
    that decides whether a language is being over-charged by the
    tokenizer (fertility >> 1 means its text costs more context window
    per word). All counts exact BIGINT; ratios ppm staged idiv."""
    bpe = d.arr_len(d.regex_tokens("text", _BPE_PAT))
    ws = d.token_count("text")
    return f"""
WITH per_doc AS (
  SELECT lang,
         CAST(length(text) AS BIGINT) AS chars,
         CAST({ws} AS BIGINT) AS words,
         CAST({bpe} AS BIGINT) AS toks
  FROM documents
),
per_lang AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(chars) AS BIGINT) AS chars,
         CAST(SUM(words) AS BIGINT) AS words,
         CAST(SUM(toks) AS BIGINT) AS toks
  FROM per_doc GROUP BY lang
),
tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS t_docs,
         CAST(SUM(toks) AS BIGINT) AS t_toks
  FROM per_lang
)
SELECT p.lang, p.n_docs, p.chars, p.words, p.toks,
       CAST({d.idiv('(p.toks * 1000000)', 'p.words')} AS BIGINT)
         AS fertility_ppm,
       CAST({d.idiv('(p.chars * 1000000)', 'p.toks')} AS BIGINT)
         AS chars_per_token_ppm,
       CAST({d.idiv('(p.toks * 1000000)', 't.t_toks')} AS BIGINT)
         AS token_share_ppm,
       CAST({d.idiv('(p.n_docs * 1000000)', 't.t_docs')} AS BIGINT)
         AS doc_share_ppm
FROM per_lang p CROSS JOIN tot t
ORDER BY p.lang
"""


def _register_fertility():
    from ..functions.detsql import DUCK, SPARK
    from ..registry import sql_query

    sql_query(
        "q_tokenizer_fertility",
        spark_sql=_fertility_sql(SPARK),
        duck_sql=_fertility_sql(DUCK),
        tables=["documents"],
        doc="Per-language tokenizer fertility audit: BPE-proxy tokens per "
        "word, chars per token, and token-budget share vs document share "
        "— the multilingual curation readout for whether a language is "
        "over-charged by the tokenizer (the q_token_bpe run classes "
        "aggregated to the language grain and priced against the corpus "
        "token budget). One map + one |langs|-group aggregate; all "
        "counts exact, ratios ppm staged idiv.",
    )


_register_fertility()


# ---------------------------------------------------------------------------
# Skip-gram training pairs with deterministic negative sampling.
# ---------------------------------------------------------------------------

_SG_TOP = 30


def _skipgram_sql(d) -> str:
    """Word2vec-style training-data generation: (center, context) pairs at
    offsets +-1/+-2 assembled relationally (LEAD/LAG over the doc-
    partitioned position window — the CollapseProject-safe form), pair
    counts over the corpus, and TWO deterministic hash negatives per
    surviving pair drawn from the frequency-ranked vocabulary (md5 of
    (center, context, k) mod |vocab| joined back to the rank table —
    reproducible negative sampling, no RNG state). Emits the top-30
    pairs by count: the artifact an embedding-training job consumes."""
    toks = d.positional_token_rows("documents")
    neg = "{h} % v.n_vocab"
    h1 = neg.format(
        h=d.md5_int32("concat(center, ':', context, ':1')")
    )
    h2 = neg.format(
        h=d.md5_int32("concat(center, ':', context, ':2')")
    )
    return f"""
WITH toks AS ({toks}),
ctx AS (
  SELECT doc_id, token AS center, i,
         LAG(token, 2) OVER (PARTITION BY doc_id ORDER BY i) AS cm2,
         LAG(token, 1) OVER (PARTITION BY doc_id ORDER BY i) AS cm1,
         LEAD(token, 1) OVER (PARTITION BY doc_id ORDER BY i) AS cp1,
         LEAD(token, 2) OVER (PARTITION BY doc_id ORDER BY i) AS cp2
  FROM toks
),
pairs AS (
  SELECT center, cm2 AS context FROM ctx WHERE cm2 IS NOT NULL
  UNION ALL SELECT center, cm1 FROM ctx WHERE cm1 IS NOT NULL
  UNION ALL SELECT center, cp1 FROM ctx WHERE cp1 IS NOT NULL
  UNION ALL SELECT center, cp2 FROM ctx WHERE cp2 IS NOT NULL
),
pair_counts AS (
  SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs GROUP BY center, context
),
vocab AS (
  SELECT token,
         CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) - 1
              AS BIGINT) AS vid
  FROM toks GROUP BY token
),
vsize AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab FROM vocab),
top_pairs AS (
  SELECT center, context, n
  FROM pair_counts
  ORDER BY n DESC, center, context
  LIMIT {_SG_TOP}
)
SELECT p.center, p.context, p.n,
       v1.token AS neg1,
       v2.token AS neg2
FROM top_pairs p
CROSS JOIN vsize v
JOIN vocab v1 ON v1.vid = {h1}
JOIN vocab v2 ON v2.vid = {h2}
ORDER BY p.n DESC, p.center, p.context
"""


def _register_skipgram():
    from ..functions.detsql import DUCK, SPARK
    from ..registry import sql_query

    sql_query(
        "q_skipgram_pairs",
        spark_sql=_skipgram_sql(SPARK),
        duck_sql=_skipgram_sql(DUCK),
        tables=["documents"],
        doc="Skip-gram training-pair generation (word2vec window +-2) with "
        "deterministic negative sampling: (center, context) pairs "
        "assembled with LEAD/LAG over doc-partitioned position windows "
        "(the CollapseProject-safe relational form), corpus pair counts, "
        "and two md5-derived negatives per top pair drawn from the "
        "frequency-ranked vocabulary — reproducible embedding-training "
        "data with no RNG state. One positional explode, one pair-keyed "
        "aggregate, a vocab-sized rank (oracle-anchor dictionary, same "
        "caveat as q_dedup_minhash), TakeOrdered top-30.",
    )


_register_skipgram()
