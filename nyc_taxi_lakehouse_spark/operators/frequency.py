"""Frequency sketches: Misra-Gries heavy hitters with exact recovery.

Completes the sketch family (HLL distinct in analytics.py's
q_unique_users_approx, approx_percentile in q_value_percentiles_approx) with
the third classic: frequent items. The production protocol is the standard
two-pass distributed Misra-Gries:

  pass 1 — per-partition MG summaries of size k (mapInPandas, O(k) memory
           per task regardless of key cardinality), union of summary keys =
           candidate set. Guarantee: any key with global frequency > n/k
           exceeds n_p/k in at least one partition (Σ n_p/k = n/k), so it
           survives that partition's summary — the candidate set is a
           SUPERSET of every (n/k)-heavy key, with no false negatives.
  pass 2 — exact recount of candidates only (broadcast semi-join + one
           grouped count), filter by the support threshold.

At 100 TB with a billion distinct keys, pass 1 shuffles at most
k × num_partitions candidate rows instead of a billion-group aggregate;
pass 2 groups only the tiny candidate subset. Choosing k ≥ 1/s for support
threshold s makes the final answer EXACT — which is why the query below can
be oracle-checked against a plain GROUP BY in DuckDB.

tests/test_llm_ops.py exercises the superset guarantee directly on
adversarial Zipf-skewed data via hypothesis.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import df_query
from ..sources.tables import load_tables

_MG_K = 64
_SUPPORT = 0.02  # 1/_MG_K = 0.015625 <= 0.02, so recovery is exact


def mg_fold(counters: pd.Series, counts: pd.Series, k: int) -> pd.Series:
    """Fold one batch's exact value_counts into a Misra-Gries summary of at
    most k counters (mergeable-summaries formulation: sum, subtract the
    (k+1)-th largest, keep positive). Pure function so the guarantee is
    hypothesis-testable without a Spark job (tests/test_sketch_cdf.py)."""
    merged = counters.add(counts, fill_value=0).astype("int64")
    if len(merged) > k:
        thresh = merged.nlargest(k + 1).iloc[-1]
        merged = merged - thresh
        merged = merged[merged > 0]
    return merged


def misra_gries_candidates(df: DataFrame, key_col: str, k: int = _MG_K) -> DataFrame:
    """Per-partition Misra-Gries summaries; returns the distinct candidate
    keys (every key whose global frequency exceeds n/k is guaranteed
    present). O(k) task memory; output ≤ k rows per partition."""

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField("lower_bound", T.LongType()),
        ]
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Vectorized MG via the mergeable-summaries formulation (Agarwal et
        # al., "Mergeable Summaries"): fold each Arrow batch's exact
        # value_counts into the summary, then if more than k counters
        # remain, subtract the (k+1)-th largest value from all and keep the
        # positive ones. Every subtraction step removes weight from >= k+1
        # keys at once, so total undercount <= W_p/(k+1) — the same
        # no-false-negative bound as row-at-a-time MG, without a per-row
        # Python loop.
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            counters = mg_fold(counters, pdf[key_col].value_counts(), k)
        yield pd.DataFrame(
            {
                key_col: counters.index.astype(str),
                "lower_bound": counters.to_numpy(dtype="int64"),
            }
        )

    summaries = df.select(key_col).mapInPandas(summarize, schema=out_schema)
    return summaries.select(key_col).distinct()


def heavy_hitters_exact(
    df: DataFrame, key_col: str, support: float = _SUPPORT, k: int = _MG_K
) -> DataFrame:
    """Exact heavy hitters (frequency > support × n) via MG candidates +
    recount. Requires k ≥ 1/support for the no-false-negative guarantee."""
    if k < 1.0 / support:
        raise ValueError(f"k={k} too small for support={support}; need k >= 1/support")
    total = df.count()  # bounded driver scalar (one count-only scan, no key shuffle)
    cands = misra_gries_candidates(df, key_col, k)
    return (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > F.lit(total) * F.lit(support))
        .select(
            key_col,
            F.col("cnt").cast("bigint").alias("cnt"),
            (F.col("cnt") / F.lit(float(total))).alias("share"),
        )
    )


@df_query(
    "q_heavy_hitters",
    duck_sql=f"""
WITH tok AS (
  SELECT unnest(str_split(text, ' ')) AS token FROM documents
), tot AS (SELECT COUNT(*) AS n FROM tok)
SELECT token,
       COUNT(*) AS cnt,
       CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot) AS share
FROM tok
GROUP BY token
HAVING COUNT(*) > (SELECT n FROM tot) * {_SUPPORT}
""",
    tables=["documents"],
    doc="Vocabulary-head heavy hitters: tokens covering > 2% of the corpus "
    "token stream (stopword discovery / head-of-Zipf analysis for "
    "tokenizer training). Two-pass distributed Misra-Gries (k=64): O(k)-"
    "memory partition summaries -> candidate superset -> exact broadcast-"
    "semi-join recount. Exact because k >= 1/support, hence oracle-"
    "checkable against a plain GROUP BY ... HAVING in DuckDB.",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    tokens = t["documents"].select(
        F.explode(F.split("text", " ")).alias("token")
    )
    return heavy_hitters_exact(tokens, "token")
