"""Training-data curation operators: deterministic splits and decontamination.

Two pipeline stages every large-scale training corpus needs, expressed so the
oracle gate can hash-check them:

- q_train_split: stable train/val/test assignment by multiplicative hashing
  of the document key. Map-only — no shuffle at any scale, and re-running on
  a grown corpus never reassigns an existing document (the property that
  makes incremental corpus builds reproducible).
- q_contamination: exact n-gram overlap between the training corpus and an
  evaluation set (the GPT-3-style 8-gram decontamination check; n is a knob, 4 here so the synthetic small-vocabulary corpus produces hits). N-grams are
  deduped per document BEFORE the join via array_distinct (no shuffle), the
  eval side is tiny and broadcast, so the only shuffle is the final
  per-(train_doc, eval_doc) count aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.detsql import DUCK, SPARK, Dialect
from ..plans.ckpt import register_run_checkpoint, round_checkpoint
from ..registry import df_query, sql_query
from ..sources.tables import load_tables

# Multiplicative-hash bucketing: Knuth's 2^32/phi multiplier. Buckets 0..999;
# doc_id * A stays < 2^63 for doc_id < 3.5e9; beyond that, hash a key column
# instead (xxhash64 path, rows-only). Shared by the split, sampling, and
# decontamination queries.
_SPLIT_A = 2654435761
_SPLIT_B = 104729


def _data_mixture_sql(d: Dialect) -> str:
    """Per-source token inventory + alpha-weighted sampling weights.

    alpha = 0.5 so the reweighting is SQRT — IEEE-exact in both engines
    (pow(x, 0.3) is NOT guaranteed identical across libm implementations).
    The sqrt weights are quantized to DECIMAL(28,6) before the global sum so
    the normalizer is an exact, order-independent decimal total.
    """
    sq = "CAST(SQRT(CAST(n_tokens AS DOUBLE)) AS DECIMAL(28,6))"
    return f"""
WITH per_source AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(tc) AS BIGINT) AS n_tokens
  FROM (SELECT source, {d.token_count('text')} AS tc FROM documents) t
  GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         CAST(SUM({sq}) AS DECIMAL(38,6)) AS z
  FROM per_source
)
SELECT
  source,
  n_docs,
  n_tokens,
  CAST(n_tokens AS DOUBLE) / total_tokens AS raw_share,
  CAST({sq} AS DOUBLE) / CAST(z AS DOUBLE) AS alpha_weight
FROM per_source, tot
"""


sql_query(
    "q_data_mixture",
    spark_sql=_data_mixture_sql(SPARK),
    duck_sql=_data_mixture_sql(DUCK),
    tables=["documents"],
    doc="Training-data mixture report: per-source doc/token inventory, raw "
    "corpus share, and the alpha=0.5 temperature-reweighted sampling weight "
    "(sqrt(tokens)/sum sqrt(tokens)) that upsamples small sources — the "
    "standard pretraining mixture knob. One shuffle (groupBy source) plus a "
    "broadcast scalar total; the per-source table is tiny at any corpus "
    "size.",
)


def _stratified_sample_sql(d: Dialect) -> str:
    """Equalized per-language subsample, all-integer decision rule."""
    bucket = f"((doc_id * {_SPLIT_A} + {_SPLIT_B}) % 1000)"
    return f"""
WITH strata AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang FROM documents GROUP BY lang
),
m AS (SELECT MIN(n_lang) AS min_lang FROM strata)
SELECT d.doc_id, d.lang, d.source, CAST({bucket} AS INT) AS strat_bucket
FROM documents d
JOIN strata s ON d.lang = s.lang
CROSS JOIN m
WHERE {bucket} * s.n_lang < 1000 * m.min_lang
"""


sql_query(
    "q_stratified_sample",
    spark_sql=_stratified_sample_sql(SPARK),
    duck_sql=_stratified_sample_sql(DUCK),
    tables=["documents"],
    doc="Deterministic stratified subsample that equalizes language strata: "
    "each doc's multiplicative-hash bucket is compared against the stratum's "
    "keep-rate min_stratum/n_stratum using EXACT integer cross-multiplication "
    "(bucket*n < 1000*min) — no RNG, no floats, stable under corpus growth. "
    "Plan: tiny strata aggregate broadcast back onto a map-side filter; the "
    "corpus itself never shuffles.",
)


def _split_sql(d: Dialect) -> str:
    """96% train / 2% val / 2% test by multiplicative-hash bucket."""
    bucket = f"((doc_id * {_SPLIT_A} + {_SPLIT_B}) % 1000)"
    return f"""
SELECT
  doc_id,
  lang,
  source,
  CAST({bucket} AS INT) AS bucket,
  CASE WHEN {bucket} < 960 THEN 'train'
       WHEN {bucket} < 980 THEN 'val'
       ELSE 'test' END AS split
FROM documents
"""


sql_query(
    "q_train_split",
    spark_sql=_split_sql(SPARK),
    duck_sql=_split_sql(DUCK),
    tables=["documents"],
    doc="Deterministic stratified-by-construction train/val/test split via "
    "multiplicative hashing (bucket = (id*A+B) mod 1000 -> 96/2/2). Pure "
    "map: no shuffle, no RNG state, stable under corpus growth — the same "
    "doc always lands in the same split on any cluster size.",
)


# Sequence packing: concat-and-chunk at fixed token capacity (the GPT-style
# pretraining packing scheme — documents concatenated in a deterministic
# order, the token stream chunked into fixed-length training sequences;
# documents may span a chunk boundary).
_PACK_CAP = 2048

# Two-pass prefix-sum chunk width (VERDICT r10 #3): a single window
# PARTITION BY source is the one inherently serial shape in the registry —
# a 52.5%-hot source (the --hotsource decade; at 100 TB, a C4-style corpus
# dominated by one domain) funnels most of the corpus through ONE window
# partition. doc_id DIV width is MONOTONE in doc_id, so chunk boundaries
# respect the packing order and the classic two-pass decomposition is
# exact: pass 1 prefix-sums WITHIN (source, chunk) — ≤width rows per
# partition no matter how hot the source — and pass 2 prefix-sums the
# per-chunk token totals at the CHUNK grain (corpus/width rows; recurse
# the same trick if that ever stops fitting), then a (source, chunk) join
# adds the chunk base back. Identical output by the prefix-sum identity
# SUM[<=doc] = SUM[chunks < chunk] + SUM[within chunk, <=doc].
_PACK_CHUNK_W = 1024


def _seq_packing_sql(d: Dialect) -> str:
    cap = _PACK_CAP
    first = f"CAST(FLOOR(CAST(tok_offset AS DOUBLE) / {cap}) AS BIGINT)"
    last = f"CAST(FLOOR(CAST(tok_offset + n_tokens - 1 AS DOUBLE) / {cap}) AS BIGINT)"
    chunk = d.idiv("doc_id", _PACK_CHUNK_W)
    return f"""
WITH toks AS (
  SELECT source, doc_id, CAST({d.token_count('text')} AS BIGINT) AS n_tokens,
         CAST({chunk} AS BIGINT) AS chunk
  FROM documents
),
local AS (
  SELECT source, doc_id, n_tokens, chunk,
    CAST(SUM(n_tokens) OVER (
      PARTITION BY source, chunk ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) - n_tokens AS BIGINT) AS local_offset
  FROM toks
),
chunk_bases AS (
  SELECT source, chunk,
    CAST(SUM(chunk_tokens) OVER (
      PARTITION BY source ORDER BY chunk
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) - chunk_tokens AS BIGINT) AS chunk_base
  FROM (
    SELECT source, chunk, CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens
    FROM toks GROUP BY source, chunk
  ) ct
),
pos AS (
  SELECT l.source, l.doc_id, l.n_tokens,
         b.chunk_base + l.local_offset AS tok_offset
  FROM local l
  JOIN chunk_bases b ON l.source = b.source AND l.chunk = b.chunk
)
SELECT
  source,
  doc_id,
  n_tokens,
  tok_offset,
  {first} AS seq_first,
  {last} AS seq_last,
  {last} - {first} + 1 AS seqs_spanned
FROM pos
"""


sql_query(
    "q_seq_packing",
    spark_sql=_seq_packing_sql(SPARK),
    duck_sql=_seq_packing_sql(DUCK),
    tables=["documents"],
    doc=f"Sequence packing manifest: documents concatenated per source shard "
    f"in doc_id order and chunked into {_PACK_CAP}-token training sequences "
    "(concat-and-chunk — every sequence except a shard's last is exactly "
    "full, so fill ratio is optimal by construction). Emits each document's "
    "token offset and the [seq_first, seq_last] range it lands in. The "
    f"prefix sum is the TWO-PASS chunked form (VERDICT r10 #3): pass 1 "
    f"sums within (source, doc_id DIV {_PACK_CHUNK_W}) — the window "
    "partition is bounded by the chunk width no matter how hot a source "
    "is — pass 2 sums per-chunk totals at the chunk grain, and a "
    "(source, chunk) join adds the bases back. doc_id DIV width is "
    "monotone in the packing order, so the decomposition is exact "
    "(identical output to the single-window form, hash-verified); the "
    "former PARTITION BY source window serialized 52.5% of the corpus "
    "through one task on the hot-source decade.",
)


_NGRAM = 4  # real corpora use 8-13; the ~40-word synthetic vocab needs 4 to exercise hits
_EVAL_MOD = 97  # doc_id % 97 == 0 -> evaluation set (~1% of corpus)


def _contamination_sql(d: Dialect) -> str:
    """DuckDB oracle: n-gram generation + overlap join in one query."""
    if d.name == "spark":
        gram_list = (
            f"array_distinct(transform(sequence(1, size(t) - {_NGRAM - 1}),"
            f" i -> array_join(slice(t, i, {_NGRAM}), ' ')))"
        )
        toks, size_fn, unnest = "split(text, ' +')", "size", "explode"
    else:
        gram_list = (
            f"list_distinct(list_transform(range(1, len(t) - {_NGRAM - 2}),"
            f" i -> array_to_string(t[i:i+{_NGRAM - 1}], ' ')))"
        )
        toks, size_fn, unnest = "string_split_regex(text, ' +')", "len", "unnest"
    return f"""
WITH toks AS (
  SELECT doc_id, doc_id % {_EVAL_MOD} = 0 AS is_eval, {toks} AS t
  FROM documents
),
grams AS (
  SELECT doc_id, is_eval, {unnest}({gram_list}) AS gram
  FROM toks WHERE {size_fn}(t) >= {_NGRAM}
)
SELECT
  tr.doc_id AS train_doc,
  ev.doc_id AS eval_doc,
  CAST(COUNT(*) AS BIGINT) AS shared_ngrams
FROM grams tr
JOIN grams ev ON tr.gram = ev.gram AND NOT tr.is_eval AND ev.is_eval
GROUP BY tr.doc_id, ev.doc_id
"""


# Above this many eval documents the deduped eval gram table stops being
# broadcast-sized (eval sets are typically a few thousand docs; 100k docs ×
# ~hundreds of grams ≈ multi-GB serialized — past any sane
# autoBroadcastJoinThreshold) and the join must shuffle on gram instead.
_BROADCAST_EVAL_MAX_DOCS = 100_000


def _shifted_zip_grams(n: int) -> str:
    """Map-side O(T) n-gram array: n SHIFTED SLICES of the tokenization
    combined with a zip_with tree. Each slice/split is a COLLECTION
    argument (evaluated once per row); only scalar lambdas run per
    element — this dodges Spark's CollapseProject inlining trap, where
    an index lambda over an aliased array re-tokenizes per element
    (O(T^2) per doc, measured 12x in BASELINE.md), WITHOUT trading it
    for a doc_id shuffle (the interim LEAD-window form broke
    q_contamination's pinned one-exchange plan)."""
    toks = "split(text, ' +')"
    shifts = [f"slice({toks}, {k + 1}, size({toks}) - {n - 1})" for k in range(n)]

    def tree(parts: list[str]) -> str:
        if len(parts) == 1:
            return parts[0]
        mid = len(parts) // 2
        left, right = tree(parts[:mid]), tree(parts[mid:])
        return f"zip_with({left}, {right}, (a, b) -> concat(a, ' ', b))"

    return f"array_distinct({tree(shifts)})"


def _grams_of(side: DataFrame, n: int = _NGRAM) -> DataFrame:
    """Per-document DISTINCT word n-grams — map-side shifted-slice
    zip_with assembly (array_distinct inside the row, no dedup shuffle,
    no per-element re-tokenization; see _shifted_zip_grams)."""
    return side.filter(
        F.size(F.split("text", " +")) >= n
    ).select("doc_id", F.explode(F.expr(_shifted_zip_grams(n))).alias("gram"))


def contamination_report(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = _NGRAM,
    max_broadcast_docs: int = _BROADCAST_EVAL_MAX_DOCS,
) -> DataFrame:
    """Per-(train_doc, eval_doc) shared-n-gram counts.

    Join strategy is size-thresholded: a normal eval set (small) broadcasts
    — scan → broadcast hash join → one count aggregation, no shuffle of the
    train grams. A large eval side (decontaminating against another corpus)
    would OOM the broadcast, so past the threshold both gram tables
    hash-partition on gram (shuffle_hash hint — gram keys are
    high-cardinality and near-uniform, so no skew pathology and no sort).
    The eval-side doc count is one cheap column-pruned count; at 100 TB the
    caller typically knows the size and can pass max_broadcast_docs=0 to
    force the shuffle path outright. tests/test_curation.py pins both plan
    shapes.
    """
    n_eval = eval_docs.count()
    train_grams = _grams_of(train_docs, n)
    ev_grams = _grams_of(eval_docs, n).withColumnRenamed("doc_id", "eval_doc")
    if n_eval <= max_broadcast_docs:
        joined = train_grams.join(F.broadcast(ev_grams), "gram")
    else:
        joined = train_grams.join(ev_grams.hint("shuffle_hash"), "gram")
    return joined.groupBy(F.col("doc_id").alias("train_doc"), "eval_doc").agg(
        F.count("*").alias("shared_ngrams")
    )


@df_query(
    "q_contamination",
    duck_sql=_contamination_sql(DUCK),
    tables=["documents"],
    doc="Eval-set decontamination: exact n-gram (n=4 on this corpus) overlap counts between every "
    "training document and the evaluation subset (doc_id % 97 == 0). "
    "Per-doc n-grams are deduped with array_distinct BEFORE exploding (no "
    "dedup shuffle); the eval side is ~1% of the corpus and explicitly "
    "broadcast, so the plan is scan -> broadcast hash join -> one "
    "count aggregation; contamination_report() switches to a gram-"
    "partitioned shuffle hash join past a broadcast-size threshold. A hit "
    "means the training doc shares >= 1 verbatim n-gram with an eval doc — "
    "the standard leakage report.",
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    docs = t["documents"]
    return contamination_report(
        docs.filter(F.col("doc_id") % _EVAL_MOD != 0),
        docs.filter(F.col("doc_id") % _EVAL_MOD == 0),
    )


def _augment_sql(d: Dialect) -> str:
    """Deterministic token-dropout augmentation: drop every token whose
    positional multiplicative hash lands in 1/10 of the space. No RNG —
    the same doc always yields the same augmentation (replayable corpus
    builds), and the oracle checks the reconstructed text via md5."""
    pos = d.positional_token_rows("documents")
    keep = f"(({_SPLIT_A} * i + {_SPLIT_B} * doc_id) % 10) != 0"
    if d.name == "spark":
        rebuild = (
            "concat_ws(' ', transform(array_sort(collect_list(named_struct("
            "'i', i, 'token', token))), x -> x.token))"
        )
    else:
        rebuild = "string_agg(token, ' ' ORDER BY i)"
    return f"""
WITH pos_tok AS ({pos}),
kept AS (
  SELECT doc_id, i, token FROM pos_tok WHERE {keep}
),
totals AS (
  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens FROM pos_tok GROUP BY doc_id
)
SELECT k.doc_id,
       t.n_tokens,
       CAST(COUNT(*) AS INT) AS kept_tokens,
       t.n_tokens - CAST(COUNT(*) AS INT) AS dropped_tokens,
       md5({rebuild}) AS augmented_md5
FROM kept k JOIN totals t ON k.doc_id = t.doc_id
GROUP BY k.doc_id, t.n_tokens
"""


sql_query(
    "q_augment_dropout",
    spark_sql=_augment_sql(SPARK),
    duck_sql=_augment_sql(DUCK),
    tables=["documents"],
    doc="Deterministic token-dropout augmentation (~10% of positions, "
    "positional multiplicative hash — no RNG, replayable): emits per-doc "
    "kept/dropped counts and the md5 of the reconstructed augmented text "
    "(order restored by position before hashing, so the oracle pins the "
    "exact output string, not just counts). One shuffle on doc_id.",
)


def _length_buckets_sql(d: Dialect) -> str:
    """Power-of-two context-length histogram (inference/packing batch
    planning). Integer CASE ladder — no log2 (not cross-engine
    bit-stable)."""
    n = d.token_count("text")
    bucket = f"""CASE
    WHEN {n} < 64 THEN '<64'
    WHEN {n} < 128 THEN '64-127'
    WHEN {n} < 256 THEN '128-255'
    WHEN {n} < 512 THEN '256-511'
    WHEN {n} < 1024 THEN '512-1023'
    ELSE '>=1024' END"""
    return f"""
SELECT {bucket} AS length_bucket,
       lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM({n}) AS BIGINT) AS total_tokens,
       MIN({n}) AS min_tokens,
       MAX({n}) AS max_tokens
FROM documents
GROUP BY {bucket}, lang
"""


sql_query(
    "q_length_buckets",
    spark_sql=_length_buckets_sql(SPARK),
    duck_sql=_length_buckets_sql(DUCK),
    tables=["documents"],
    doc="Context-length histogram by power-of-two bucket x language — the "
    "report batch schedulers and packing planners read. Integer CASE "
    "ladder instead of floor(log2(n)) (libm log is not bit-identical "
    "across engines); one shuffle carrying tiny grouped partials.",
)


# ---------------------------------------------------------------------------
# k-fold cross-validation assignment + per-fold balance audit.
# ---------------------------------------------------------------------------

_KFOLD_K = 5


def _kfold_sql(d: Dialect) -> str:
    """Fold = multiplicative-hash bucket mod k — the same no-RNG determinism
    contract as q_train_split, so fold membership is stable under corpus
    growth and cluster size. The query returns the per-(fold, lang) balance
    audit a training pipeline actually consumes (is any fold skewed?)."""
    bucket = f"((doc_id * {_SPLIT_A} + {_SPLIT_B}) % 1000)"
    return f"""
WITH assigned AS (
  SELECT doc_id, lang, CAST({bucket} % {_KFOLD_K} AS INT) AS fold,
         {d.token_count('text')} AS tc
  FROM documents
),
per_fold AS (
  SELECT fold, lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(tc) AS BIGINT) AS n_tokens
  FROM assigned GROUP BY fold, lang
),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs FROM per_fold)
SELECT
  p.fold,
  p.lang,
  p.n_docs,
  p.n_tokens,
  CAST(p.n_docs AS DOUBLE) / t.total_docs AS doc_share
FROM per_fold p CROSS JOIN tot t
"""


sql_query(
    "q_kfold_split",
    spark_sql=_kfold_sql(SPARK),
    duck_sql=_kfold_sql(DUCK),
    tables=["documents"],
    doc="k-fold cross-validation assignment (k=5) by multiplicative hashing "
    "— fold membership is a pure map over doc_id (no RNG, no shuffle), and "
    "the output is the per-(fold, lang) balance audit with each cell's doc "
    "share against the corpus total (1-row broadcast). Train/eval for fold "
    "i is then two partition-pruned filters (fold != i / fold = i) over the "
    "same scan — no data movement to materialize any fold.",
)


# ---------------------------------------------------------------------------
# Deterministic per-stratum reservoir sample — k exemplars per language.
# ---------------------------------------------------------------------------

_RESERVOIR_K = 5
_RESERVOIR_M = 1_000_003  # prime modulus: pseudo-uniform order, no ties by construction


def _reservoir_sql(d: Dialect) -> str:
    """Per-language k-sample: rank docs by a multiplicative hash over a prime
    modulus (collision-free total order for doc_id < M) and keep the first k
    — the distributed, deterministic equivalent of per-key reservoir
    sampling. Every executor computes the same order, so the sample is
    reproducible run-to-run and stable under repartitioning."""
    hkey = f"((doc_id * {_SPLIT_A} + {_SPLIT_B}) % {_RESERVOIR_M})"
    return f"""
WITH ranked AS (
  SELECT doc_id, lang, source, n_chars,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY {hkey}, doc_id
         ) AS INT) AS sample_rank
  FROM documents
)
SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars, sample_rank
FROM ranked
WHERE sample_rank <= {_RESERVOIR_K}
"""


sql_query(
    "q_reservoir_sample",
    spark_sql=_reservoir_sql(SPARK),
    duck_sql=_reservoir_sql(DUCK),
    tables=["documents"],
    doc="Deterministic per-stratum reservoir sample: k=5 exemplar docs per "
    "language, chosen by hash-rank over a prime modulus (uniform-ish, "
    "RNG-free, tie-free). One window sort per stratum; at 100 TB this is "
    "rank-k per key, which Spark executes as a partial top-k per partition "
    "(WindowGroupLimit pushes rank<=k below the shuffle since 3.5) — each "
    "executor forwards at most k rows per stratum, so the exchange carries "
    "k*|strata| rows, not the corpus. The standard 'pull eval exemplars / "
    "human-review samples per language' step in a curation pipeline.",
)


# --- Training-shard export (deterministic global shuffle → N shard files) --

_N_SHARDS = 16
_SHUF_A = 2654435761
_SHUF_B = 40503
_SHUF_M = 1_000_003


def _shard_manifest_sql(d: Dialect) -> str:
    """The last step of a curation pipeline: export the corpus as N shard
    files in a DETERMINISTIC pseudorandom order, plus the manifest a
    training job consumes (per-shard doc/token counts and an
    order-independent content checksum to verify delivery).

    Shuffle discipline (the "global shuffle" training wants, without an
    actual global sort): shard = multiplicative-hash(doc_id) mod N spreads
    documents pseudorandomly AND deterministically across shards; the
    within-shard read order is the hash order. No RNG state, stable across
    cluster sizes, and re-runs place every doc identically — the property
    that makes resumable/verifiable exports possible.

    Scale shape: manifest = ONE grouped aggregation (map-side partials over
    16 groups); the file write is repartition-by-shard + within-partition
    sort — one exchange carrying each row once. Token counts ride the
    whitespace tokenizer (q_token_bpe's convention).
    """
    h = f"((doc_id * {_SHUF_A} + {_SHUF_B}) % {_SHUF_M})"
    ntok = d.token_count("text")
    return f"""
WITH assigned AS (
  SELECT doc_id, {h} % {_N_SHARDS} AS shard, {h} AS sort_key, {ntok} AS n_tokens
  FROM documents
)
SELECT
  CAST(shard AS INT) AS shard,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
  CAST(SUM(doc_id) AS BIGINT) AS doc_id_checksum,
  CAST(MIN(sort_key) AS BIGINT) AS min_sort_key,
  CAST(MAX(sort_key) AS BIGINT) AS max_sort_key
FROM assigned
GROUP BY shard
"""


sql_query(
    "q_shard_manifest",
    spark_sql=_shard_manifest_sql(SPARK),
    duck_sql=_shard_manifest_sql(DUCK),
    tables=["documents"],
    doc=_shard_manifest_sql.__doc__,
)


def write_shards(documents: DataFrame, out_dir: str, n_shards: int = _N_SHARDS):
    """Materialize the shard export: one directory per shard, rows in
    deterministic hash order. Returns the manifest DataFrame (same algebra
    as q_shard_manifest). Byte-level determinism is pinned in
    tests/test_curation.py: two exports of the same corpus produce
    identical per-shard row sequences."""
    h = (F.col("doc_id") * _SHUF_A + _SHUF_B) % _SHUF_M
    assigned = documents.withColumn("shard", (h % n_shards).cast("int")).withColumn(
        "sort_key", h
    )
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "sort_key", "doc_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    spark = documents.sparkSession
    return (
        spark.read.parquet(out_dir)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
            F.sum("doc_id").cast("bigint").alias("doc_id_checksum"),
            F.min("sort_key").cast("bigint").alias("min_sort_key"),
            F.max("sort_key").cast("bigint").alias("max_sort_key"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR-style importance resampling — select raw docs that look like a target
# domain, via hashed n-gram importance weights (Xie et al., NeurIPS 2023:
# "Data Selection for Language Models via Importance Resampling").
# ---------------------------------------------------------------------------

_DSIR_K = 256  # hashed feature buckets
_DSIR_SCALE = 10_000  # fixed-point grid for the per-bucket importance ratio


def _dsir_sql(d: Dialect) -> str:
    """Hashed-unigram importance weights: target = the English slice of the
    corpus (stand-in for a curated in-domain set), raw = everything.

    Per bucket b: w(b) = p_target(b) / p_raw(b) with add-one smoothing,
    as an exact fixed-point integer ((tc+1)·(TR+K)·SCALE) DIV ((rc+1)·(TT+K))
    — the likelihood ratio itself, no ln(): cross-libm-unstable transforms
    never enter the gate. A document's score is the MEAN bucket ratio over
    its token occurrences (integer DIV) — rank-equivalent to DSIR's
    mean-log-ratio for selection purposes and bit-stable across engines.
    SCALE=1e4 keeps (tc+1)·(TR+K)·SCALE < 2^63 up to ~3e7 corpus tokens;
    beyond that the bucket counts become DECIMAL probabilities first.

    Selection keeps the top quarter PER SOURCE (row_number over the
    source-partitioned window) — source-stratified selection preserves
    provenance diversity AND keeps the ranking window hash-partitioned
    (no global single-partition sort at any scale).
    """
    return f"""
WITH tok AS (
  SELECT doc_id, lang, source,
         {d.md5_int32('token')} % {_DSIR_K} AS b
  FROM ({d.all_token_rows_src('documents')}) t
),
cnt AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS rc,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tc
  FROM tok GROUP BY b
),
tot AS (SELECT CAST(SUM(rc) AS BIGINT) AS tr, CAST(SUM(tc) AS BIGINT) AS tt FROM cnt),
w AS (
  SELECT b,
         {d.idiv(f'((tc + 1) * (tr + {_DSIR_K}) * {_DSIR_SCALE})',
                 f'((rc + 1) * (tt + {_DSIR_K}))')} AS w_q4
  FROM cnt CROSS JOIN tot
),
scored AS (
  SELECT tok.doc_id, tok.lang, tok.source,
         CAST(COUNT(*) AS BIGINT) AS n_toks,
         CAST(SUM(w.w_q4) AS BIGINT) AS sw
  FROM tok JOIN w ON tok.b = w.b
  GROUP BY tok.doc_id, tok.lang, tok.source
),
ranked AS (
  SELECT doc_id, lang, source, n_toks,
         CAST({d.idiv('sw', 'n_toks')} AS BIGINT) AS dsir_q4,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {d.idiv('sw', 'n_toks')} DESC, doc_id
         ) AS src_rank,
         COUNT(*) OVER (PARTITION BY source) AS src_docs
  FROM scored
)
SELECT doc_id, lang, source, n_toks, dsir_q4,
       CAST(src_rank AS BIGINT) AS src_rank,
       CAST(CASE WHEN src_rank * 4 <= src_docs THEN 1 ELSE 0 END AS INT) AS selected
FROM ranked
"""


@df_query(
    "q_dsir_weights",
    duck_sql=_dsir_sql(DUCK),
    tables=["documents"],
    doc="DSIR importance resampling (hashed-unigram likelihood ratios, "
    "Xie et al. 2023): weight every raw document by how target-like its "
    "token distribution is, then keep the top quarter per source. All "
    "integer fixed-point — the add-one-smoothed bucket ratio is one exact "
    "DIV, the doc score a mean of bucket ratios. The Spark side explodes "
    "tokens ONCE into a checkpointed per-(doc, bucket) count table (≤256 "
    "rows per doc regardless of doc length — the corpus compresses before "
    "any reuse, dodging the CTE-inlining double-explode the oracle SQL "
    "would cost Spark); the 256-row bucket histogram, 1-row totals and "
    "weight table all derive from it, and the weight join back is an "
    "explicit broadcast. Ranking windows are hash-partitioned by source "
    "(no global sort at any scale). The oracle recomputes the same "
    "integer algebra from raw SQL in DuckDB.",
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    return dsir_weights(t["documents"])


def dsir_weights(documents: DataFrame) -> DataFrame:
    """The q_dsir_weights algebra over any documents frame (reused by the
    v2 corpus pipeline): hashed-unigram importance scores + per-source
    top-quarter selection. See the registered query's doc for the plan."""
    tok = documents.select(
        "doc_id",
        "lang",
        "source",
        F.explode(F.split("text", " +")).alias("token"),
    )
    tokb = (
        tok.withColumn(
            "b",
            F.expr(
                f"CAST(conv(substring(md5(token), 1, 8), 16, 10) AS BIGINT)"
                f" % {_DSIR_K}"
            ),
        )
        .groupBy("doc_id", "lang", "source", "b")
        .agg(F.count("*").alias("c"))
    )
    tokb = register_run_checkpoint(round_checkpoint(tokb))
    cnt = tokb.groupBy("b").agg(
        F.sum("c").alias("rc"),
        F.sum(F.when(F.col("lang") == "en", F.col("c")).otherwise(0)).alias("tc"),
    )
    tot = cnt.agg(F.sum("rc").alias("tr"), F.sum("tc").alias("tt"))
    w = cnt.crossJoin(F.broadcast(tot)).selectExpr(
        "b",
        f"((tc + 1) * (tr + {_DSIR_K}) * {_DSIR_SCALE})"
        f" DIV ((rc + 1) * (tt + {_DSIR_K})) AS w_q4",
    )
    scored = (
        tokb.join(F.broadcast(w), "b")
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.sum("c").alias("n_toks"),
            F.sum(F.col("c") * F.col("w_q4")).alias("sw"),
        )
    )
    from pyspark.sql import Window

    src_w = Window.partitionBy("source")
    ranked = scored.select(
        "doc_id",
        "lang",
        "source",
        F.col("n_toks").cast("bigint").alias("n_toks"),
        F.expr("sw DIV n_toks").cast("bigint").alias("dsir_q4"),
        F.row_number()
        .over(src_w.orderBy(F.expr("sw DIV n_toks").desc(), "doc_id"))
        .cast("bigint")
        .alias("src_rank"),
        F.count("*").over(src_w).alias("src_docs"),
    )
    return ranked.select(
        "doc_id",
        "lang",
        "source",
        "n_toks",
        "dsir_q4",
        "src_rank",
        F.when(F.col("src_rank") * 4 <= F.col("src_docs"), 1)
        .otherwise(0)
        .cast("int")
        .alias("selected"),
    )


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle + shard assignment — the data-loading order.
# ---------------------------------------------------------------------------

_SHUF_EPOCHS = 2
_SHUF_SHARDS = 8


def _epoch_shuffle_sql(d: Dialect) -> str:
    """Per (epoch, doc): shuffle key = md5(doc_id ':' epoch) — a fresh
    pseudorandom permutation every epoch, reproducible from nothing but the
    epoch number. Shard = key % shards; position = rank within shard by
    (key, doc_id). Windows are (epoch, shard)-partitioned — the global
    permutation is realized as independent per-shard sorted runs, exactly
    how a distributed data loader consumes it (each worker streams its own
    shard in key order), so no global sort exists at any scale."""
    key = d.md5_int32(
        f"concat({d.to_str('doc_id')}, ':', {d.to_str('e.epoch')})"
    )
    epochs = ", ".join(f"({i})" for i in range(_SHUF_EPOCHS))
    return f"""
WITH assigned AS (
  SELECT doc_id, e.epoch, {key} AS skey
  FROM documents CROSS JOIN (VALUES {epochs}) AS e(epoch)
)
SELECT doc_id, CAST(epoch AS INT) AS epoch,
       CAST(skey % {_SHUF_SHARDS} AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY epoch, skey % {_SHUF_SHARDS}
         ORDER BY skey, doc_id
       ) AS BIGINT) AS pos
FROM assigned
"""


sql_query(
    "q_epoch_shuffle",
    spark_sql=_epoch_shuffle_sql(SPARK),
    duck_sql=_epoch_shuffle_sql(DUCK),
    tables=["documents"],
    doc="Deterministic training-epoch shuffle: every epoch gets a fresh, "
    "reproducible global permutation of the corpus (md5 of doc_id:epoch), "
    "materialized as shard assignment + position-within-shard. The "
    "permutation is never globally sorted — ROW_NUMBER windows are "
    "(epoch, shard)-partitioned, so at 100 TB the work is `shards` "
    "independent sorted runs (each worker range-reads its shard in key "
    "order), and re-running any epoch reproduces the identical order "
    "bit-for-bit (seeded-hash reproducibility, the q_train_split "
    "property extended to load order). The 2-row epoch grid cross join "
    "is constant-size (whitelisted).",
)


# ---------------------------------------------------------------------------
# Weighted systematic sampling — weight-proportional source selection with
# integer-exact determinism (the transcendental-free alternative to
# Gumbel/A-ExpJ weighted reservoirs, whose -ln(u)/w keys are not
# cross-libm bit-stable).
# ---------------------------------------------------------------------------

_WSAMPLE_N = 100


def _weighted_sample_sql(d: Dialect) -> str:
    """Systematic (stride) sampling of {n} docs proportional to n_chars.

    Classic systematic PPS: lay every document's integer weight end to
    end on a [0, W) line (order = (source, doc_id)); the i-th pick is the
    doc covering target t_i = ((2i+1)·W) DIV (2n) — midpoints of n equal
    strides, so inclusion probability is proportional to weight, zero
    RNG, zero floats. Rather than range-joining targets to intervals,
    each doc computes which targets land inside [prev, cum) in CLOSED
    FORM: i_lo = ceil(2n·prev/W) DIV 2, i_hi = ceil(2n·cum/W) DIV 2, and
    explodes sequence(i_lo, i_hi−1) — a pure map, no join against the
    target grid at all.

    Scale shape: the prefix sum is two-level — a per-source cumulative
    window (shards scan in parallel) plus source offsets from a window
    over the per-source AGGREGATE (cardinality = #sources) — the
    standard distributed prefix-sum; the 1-row W scalar broadcasts.
    Nothing touches a corpus-wide single-partition exchange.
    """
    n = _WSAMPLE_N
    two_n = 2 * n
    cum = (
        "(o.off + SUM(w.wt) OVER (PARTITION BY w.source ORDER BY w.doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"
    )
    gen = (
        "explode(sequence(i_lo, i_hi - 1))"
        if d.name == "spark"
        else "unnest(generate_series(i_lo, i_hi - 1))"
    )
    return f"""
WITH w AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS wt FROM documents
),
src AS (
  SELECT source, CAST(SUM(wt) AS BIGINT) AS src_total FROM w GROUP BY source
),
src_off AS (
  SELECT source,
         CAST(COALESCE(SUM(src_total) OVER (
           ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS off
  FROM src
),
tot AS (SELECT CAST(SUM(wt) AS BIGINT) AS total_w FROM w),
cums AS (
  SELECT w.doc_id, w.source, w.wt, t.total_w,
         CAST({cum} AS BIGINT) AS cum
  FROM w JOIN src_off o ON w.source = o.source CROSS JOIN tot t
),
marked AS (
  SELECT doc_id, source, wt, total_w, cum, cum - wt AS prev,
         {d.idiv(d.idiv(f'({two_n} * (cum - wt) + total_w - 1)', 'total_w'), '2')}
           AS i_lo,
         {d.idiv(d.idiv(f'({two_n} * cum + total_w - 1)', 'total_w'), '2')}
           AS i_hi
  FROM cums
)
SELECT
  CAST(sample_i AS BIGINT) AS sample_i,
  CAST({d.idiv(f'((2 * sample_i + 1) * total_w)', f'{two_n}')} AS BIGINT)
    AS target,
  doc_id, source, wt, CAST(prev AS BIGINT) AS span_start,
  cum AS span_end
FROM (
  SELECT doc_id, source, wt, total_w, prev, cum,
         {gen} AS sample_i
  FROM marked WHERE i_hi > i_lo
) s
ORDER BY sample_i
"""


sql_query(
    "q_weighted_sample",
    spark_sql=_weighted_sample_sql(SPARK),
    duck_sql=_weighted_sample_sql(DUCK),
    tables=["documents"],
    doc="Weight-proportional systematic sampling (n=100, weight=n_chars): "
    "each pick is the document whose weight interval covers the stride "
    "midpoint t_i=((2i+1)·W) DIV 2n — PPS sampling with zero RNG and "
    "zero float ops, so the oracle hash-matches in pure integers (the "
    "Gumbel-key weighted reservoir is the float-unstable alternative). "
    "Target membership is computed per doc in closed form and exploded "
    "— no join against the target grid. The corpus prefix sum is the "
    "scalable two-level form: per-source cumulative windows in parallel "
    "+ offsets from a window over the per-source aggregate; the 1-row W "
    "scalar broadcasts. Exactly n output rows at any corpus size.",
)


# ---------------------------------------------------------------------------
# IPF raking — reweight the corpus so the (lang x source) mixture matches
# target marginals (the deterministic closed-loop upgrade of
# q_data_mixture's one-shot temperature weights).
# ---------------------------------------------------------------------------

_IPF_ROUNDS = 6


def _ipf_raking_sql(d: Dialect) -> str:
    """Iterative proportional fitting (Deming-Stephan raking) of the
    (lang, source) cell shares toward uniform lang AND uniform source
    marginals, unrolled as 2x{rounds} chained window half-steps so the
    recursion needs no recursive CTE and the SAME text runs in both
    engines. The state is the cell SHARE in ppb (sums to ~1e9 regardless
    of corpus size — every intermediate product is bounded by ~2e14, so
    the BIGINT path is corpus-size-INDEPENDENT; the only size limit is
    that a cell under 1/1e9 of the corpus quantizes to zero, documented).
    Scaling factors are ppm staged idiv over nonnegative integers; the
    emitted raking weight is the final/initial share ratio. Cells are
    the only corpus-scale aggregate; the 12 half-step windows run on the
    ~|langs|x|sources| grid."""
    steps = []
    prev = "cells"
    for k in range(2 * _IPF_ROUNDS):
        axis = "lang" if k % 2 == 0 else "source"
        n_axis = "n_langs" if k % 2 == 0 else "n_sources"
        fac = d.idiv(
            f"{d.idiv('1000000000', n_axis)} * 1000000",
            f"SUM(p) OVER (PARTITION BY {axis})",
        )
        steps.append(
            f"it{k + 1} AS (\n"
            f"  SELECT lang, source, n, p0, n_langs, n_sources,\n"
            f"         CAST({d.idiv(f'p * ({fac})', '1000000')} AS BIGINT) AS p\n"
            f"  FROM it{k}" .replace("it0", prev) + "\n)"
        )
    chain = ",\n".join(steps)
    last = f"it{2 * _IPF_ROUNDS}"
    lang_share = d.idiv("SUM(p) OVER (PARTITION BY lang)", "1000")
    src_share = d.idiv("SUM(p) OVER (PARTITION BY source)", "1000")
    return f"""
WITH counts AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY lang, source
),
flagged AS (
  -- COUNT(DISTINCT x) OVER () is unsupported in Spark windows; count
  -- each axis's first-of-group cells instead (deterministic row_number)
  SELECT lang, source, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY source) AS rl,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY lang) AS rs
  FROM counts
),
cells AS (
  SELECT lang, source, n,
         CAST({d.idiv("n * 1000000000", "SUM(n) OVER ()")} AS BIGINT) AS p,
         CAST({d.idiv("n * 1000000000", "SUM(n) OVER ()")} AS BIGINT) AS p0,
         CAST(SUM(CASE WHEN rl = 1 THEN 1 ELSE 0 END) OVER () AS BIGINT)
           AS n_langs,
         CAST(SUM(CASE WHEN rs = 1 THEN 1 ELSE 0 END) OVER () AS BIGINT)
           AS n_sources
  FROM flagged
),
{chain}
SELECT lang, source, n, p0 AS share0_ppb, p AS share_ppb,
       CAST({d.idiv("p * 1000000", "NULLIF(p0, 0)")} AS BIGINT) AS rake_w_ppm,
       CAST({lang_share} - {d.idiv("1000000", "n_langs")} AS BIGINT)
         AS lang_gap_ppm,
       CAST({src_share} - {d.idiv("1000000", "n_sources")} AS BIGINT)
         AS source_gap_ppm
FROM {last}
ORDER BY lang, source
"""


sql_query(
    "q_ipf_raking",
    spark_sql=_ipf_raking_sql(SPARK),
    duck_sql=_ipf_raking_sql(DUCK),
    tables=["documents"],
    doc="Iterative proportional fitting (Deming-Stephan raking) of the "
    "(lang, source) mixture toward uniform lang AND uniform source "
    "marginals simultaneously — the standard survey/panel reweighting "
    "applied to training-data curation: per-cell raking weights that a "
    "sampler multiplies into selection probabilities, plus the residual "
    "marginal gaps (nonzero where empty cells make exact raking "
    "infeasible — the diagnostic IPF practitioners check). 6 rounds "
    "unrolled as 12 chained window half-steps over the cell-share state "
    "in ppb, which sums to ~1e9 regardless of corpus size — every "
    "intermediate is bounded ~2e14, so the integer path is corpus-size-"
    "independent (a cell under 1/1e9 of the corpus quantizes to zero, "
    "documented). Same SQL text in both engines, no recursive CTE, no "
    "transcendentals. Corpus-scale work: ONE (lang, source) count "
    "aggregate; all half-steps run on the ~100-row grid (whitelisted "
    "bounded single-part).",
)


# --- Compaction / OPTIMIZE planner (size-sorted sequential bin packing) ----


def _compaction_sql(d: Dialect) -> str:
    """OPTIMIZE-style compaction plan over the file manifest: treat each
    (lang, source) partition's byte volume as one input file, sort by
    size descending, and assign output bins by cumulative-quota fill
    (bin = running-total-before DIV target) — the SQL-native greedy
    packer (next-fit-decreasing: a bin may overshoot target by at most
    one file's tail, never undershoot below target while files remain).
    The target is data-relative (ceil(total/5)) so the plan is
    scale-free. Emits per-file bin assignments with fill diagnostics
    plus the ideal lower bound ceil(total/target)."""
    return f"""
WITH files AS (
  SELECT lang, source, CAST(SUM(n_chars) AS BIGINT) AS bytes
  FROM documents GROUP BY lang, source
),
tot AS (
  SELECT CAST(SUM(bytes) AS BIGINT) AS total,
         CAST({d.idiv('(SUM(bytes) + 4)', '5')} AS BIGINT) AS target
  FROM files
),
ordered AS (
  SELECT f.lang, f.source, f.bytes, t.target, t.total,
         CAST(COALESCE(SUM(f.bytes) OVER (
           ORDER BY f.bytes DESC, f.lang, f.source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS fill_before
  FROM files f CROSS JOIN tot t
)
SELECT lang, source, bytes,
       CAST({d.idiv('fill_before', 'target')} AS BIGINT) AS bin,
       fill_before,
       target,
       CAST({d.idiv('(total + target - 1)', 'target')} AS BIGINT)
         AS ideal_bins
FROM ordered
ORDER BY bin, bytes DESC, lang, source
"""


sql_query(
    "q_compaction_plan",
    spark_sql=_compaction_sql(SPARK),
    duck_sql=_compaction_sql(DUCK),
    tables=["documents"],
    doc="Small-file compaction (OPTIMIZE) planner: size-desc sequential "
    "bin packing of the per-(lang, source) manifest into data-relative "
    "target-size output bins via one cumulative window — per-file bin "
    "assignment, fill-before diagnostics, and the ideal bin lower bound. "
    "The write-side companion to q_shard_manifest (which plans READ "
    "shards): run after incremental appends fragment a partition. All "
    "integer; the packing walk is a window over the FILE MANIFEST grain "
    "(bounded: files per table partition, not corpus rows) — in "
    "production the window is additionally PARTITION BY table-partition, "
    "making the plan embarrassingly parallel.",
)


# --- Fuzzy decontamination (near-duplicate train->eval leakage) ------------


def _decontam_fuzzy_sql(d: Dialect) -> str:
    """Near-duplicate decontamination across the q_train_split boundary:
    for every VAL/TEST document, the best-matching TRAIN document by
    word-4-gram Jaccard (distinct md5-hashed shingles, bipartite join on
    shingle identity — the eval side is 4% of the corpus and broadcasts)
    and a contaminated flag at J >= 0.5. The FUZZY companion to
    q_contamination's exact-overlap gate: paraphrased or lightly-edited
    eval leakage that exact n-gram matching misses. Jaccard is exact
    ppm (shared / (na + nb - shared) idiv)."""
    bucket = f"((doc_id * {_SPLIT_A} + {_SPLIT_B}) % 1000)"
    # Gram assembly is the map-side shifted-slice zip_with tree on the
    # Spark side (_shifted_zip_grams — collection args evaluate once per
    # row, dodging the CollapseProject O(T^2) inlining trap WITHOUT a
    # token-row shuffle; two earlier drafts measured 8-20 s at sf0.1).
    # DuckDB materializes per-row values, so its index lambda is already
    # O(T); the two dialects use different FORMS of the same gram set and
    # the hash gate proves them equal.
    if d.name == "spark":
        gen = f"explode({_shifted_zip_grams(4)})"
    else:
        toks = d.split_tokens("text")
        gen = (
            f"unnest(list_distinct(list_transform("
            f"generate_series(1, len({toks}) - 3),"
            f" i -> array_to_string({toks}[i:i+3], ' '))))"
        )
    gram = d.md5_int32("gram")
    return f"""
WITH gram_rows AS (
  SELECT doc_id, {gen} AS gram
  FROM documents WHERE {d.arr_len(d.split_tokens('text'))} >= 4
),
shingle AS (
  SELECT doc_id,
         CASE WHEN {bucket} < 960 THEN 'train' ELSE 'eval' END AS split,
         {gram} AS g
  FROM gram_rows
),
sizes AS (
  SELECT doc_id, split, CAST(COUNT(*) AS BIGINT) AS n_g
  FROM shingle GROUP BY doc_id, split
),
shared AS (
  SELECT e.doc_id AS eval_doc, t.doc_id AS train_doc,
         CAST(COUNT(*) AS BIGINT) AS shared
  FROM shingle e JOIN shingle t
    ON e.g = t.g AND e.split = 'eval' AND t.split = 'train'
  GROUP BY e.doc_id, t.doc_id
),
scored AS (
  SELECT s.eval_doc, s.train_doc, s.shared,
         se.n_g AS eval_grams, st.n_g AS train_grams,
         CAST({d.idiv('(s.shared * 1000000)',
                      '(se.n_g + st.n_g - s.shared)')} AS BIGINT)
           AS jaccard_ppm
  FROM shared s
  JOIN sizes se ON se.doc_id = s.eval_doc
  JOIN sizes st ON st.doc_id = s.train_doc
),
best AS (
  SELECT eval_doc, train_doc, shared, eval_grams, train_grams, jaccard_ppm,
         ROW_NUMBER() OVER (PARTITION BY eval_doc
                            ORDER BY jaccard_ppm DESC, train_doc) AS rk
  FROM scored
)
SELECT eval_doc, train_doc AS best_train_doc, shared, eval_grams,
       train_grams, jaccard_ppm,
       CASE WHEN jaccard_ppm >= 500000 THEN 1 ELSE 0 END AS contaminated
FROM best WHERE rk = 1
ORDER BY eval_doc
"""


sql_query(
    "q_decontam_fuzzy",
    spark_sql=_decontam_fuzzy_sql(SPARK),
    duck_sql=_decontam_fuzzy_sql(DUCK),
    tables=["documents"],
    doc="Fuzzy (near-duplicate) decontamination across the q_train_split "
    "boundary: per VAL/TEST document the best-matching TRAIN document by "
    "distinct word-4-gram Jaccard (exact ppm) with a contaminated flag "
    "at J >= 0.5 — catches the paraphrased/edited eval leakage "
    "q_contamination's exact-overlap gate misses (the GPT-3 13-gram "
    "lesson applied fuzzily). Bipartite shingle join: the eval side is "
    "4% of the corpus and broadcasts; at 100 TB add the stop-shingle df "
    "cap exactly as q_dedup_chargram documents. One explode + one "
    "(eval, train)-keyed count + an eval-partitioned top-1 window.",
)


_QUOTA_N = 8  # per-source document cap (the bite point: every testdata source holds >8 docs)
_QUOTA_SALT = 16  # phase-1 salt buckets: the real per-source window sees <= N*SALT rows


def _source_quota_sql(d: Dialect) -> str:
    """Per-source document quota — the RefinedWeb/C4-style "domain cap"
    curation op: keep at most _QUOTA_N documents per source, chosen by a
    deterministic md5 priority (a stable uniform sample of the domain),
    and report per-source accounting plus kept-set checksums.

    Scale shape: the naive ROW_NUMBER() OVER (PARTITION BY source ORDER
    BY pri) sends EVERY document of a hot domain to one reducer — at
    100 TB a single domain can be >10% of the crawl, so that window IS
    the job. The salted two-phase prune bounds it: phase 1 ranks inside
    (source, doc_id % _QUOTA_SALT) — buckets uniform by construction
    regardless of domain skew — and keeps each bucket's top-N, so the
    phase-2 per-source window sees at most N*SALT survivors per source
    (the global top-N is contained in the union of per-bucket top-Ns;
    correctness is set containment, not an approximation). Both phases
    are plain windows, so Catalyst keeps the whole pipeline JVM-side;
    the md5 priority makes the kept set reproducible and — because a
    document's priority never changes — stable under corpus growth:
    re-running after an ingest only ever evicts the highest-priority
    incumbents, never reshuffles the sample arbitrarily.

    Output: one row per source with total/kept/dropped counts and the
    kept set pinned by SUM(doc_id) + SUM(n_chars) checksums (verifies
    the exact selection without emitting the kept corpus).
    """
    pri = d.md5_int32(f"{d.to_str('doc_id')} || ':quota'")
    return f"""
WITH pri AS (
  SELECT doc_id, source, n_chars, {pri} AS pri FROM documents
),
p1 AS (
  SELECT doc_id, source, n_chars, pri,
         ROW_NUMBER() OVER (
           PARTITION BY source, doc_id % {_QUOTA_SALT}
           ORDER BY pri, doc_id
         ) AS rn1
  FROM pri
),
ranked AS (
  SELECT doc_id, source, n_chars, pri,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY pri, doc_id) AS rn
  FROM p1 WHERE rn1 <= {_QUOTA_N}
),
kept AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS kept_docs,
         CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum,
         CAST(SUM(n_chars) AS BIGINT) AS kept_chars
  FROM ranked WHERE rn <= {_QUOTA_N} GROUP BY source
),
tot AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS total_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM pri GROUP BY source
)
SELECT t.source, t.total_docs, k.kept_docs,
       t.total_docs - k.kept_docs AS dropped_docs,
       k.kept_id_sum, k.kept_chars,
       CAST(k.kept_chars AS DOUBLE) / t.total_chars AS char_keep_ratio
FROM tot t JOIN kept k ON t.source = k.source
ORDER BY t.source
"""


sql_query(
    "q_source_quota",
    spark_sql=_source_quota_sql(SPARK),
    duck_sql=_source_quota_sql(DUCK),
    tables=["documents"],
    doc="Per-source document quota (RefinedWeb/C4 domain cap): keep at "
    "most 8 docs per source by deterministic md5 priority; per-source "
    "total/kept/dropped accounting with kept-set id/char checksums. "
    "Skew-safe salted two-phase top-N: phase 1 ranks inside (source, "
    "doc_id % 16) uniform buckets, so the real per-source window sees "
    "<= 128 survivors per source no matter how hot the domain — exact "
    "by set containment, and the priority hash keeps the sample stable "
    "under corpus growth.",
)
