"""Distributed BPE tokenizer training — the iterative loop over the
oracle-checked single step (llm/text.py q_bpe_merge_step).

Algorithm (Sennrich et al., ACL 2016), distributed the classic way: the
corpus compresses to a frequency-weighted DISTINCT-word vocabulary once;
every iteration counts adjacent symbol pairs over that vocabulary (weighted
by word frequency), picks the most frequent pair (deterministic tiebreak:
count desc, then pair lexicographic), and re-segments the vocabulary by
merging that pair left-to-right greedily. The corpus is never touched again
after the vocabulary build — at 100 TB that is the difference between
trillions of token occurrences and millions of vocabulary rows per round.

Everything stays JVM-side: pair extraction is a higher-order transform over
the symbol arrays, the left-to-right merge is an aggregate() fold with a
(out, skip) struct accumulator — no Python in the loop body. Per round: one
vocabulary-sized pair aggregation + a 1-row collect (the chosen merge) +
localCheckpoint to keep lineage O(1) (the q_dedup_clusters discipline).

Pinned in tests/test_llm_ops.py against a pure-Python reference BPE trainer:
identical merge tables for 8 rounds on the real corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _merge_pair_expr(left: str, right: str) -> str:
    """SQL expression rewriting `syms` with every adjacent (left, right)
    merged into one symbol, left-to-right greedy (after a merge the right
    symbol cannot start another merge — the `skip` flag)."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "\\'") + "'"

    merged = q(left + right)
    return f"""
aggregate(
  sequence(0, size(syms) - 1),
  struct(CAST(array() AS ARRAY<STRING>) AS out, false AS skip),
  (acc, i) -> CASE
    WHEN acc.skip THEN struct(acc.out AS out, false AS skip)
    WHEN i < size(syms) - 1 AND syms[i] = {q(left)} AND syms[i + 1] = {q(right)}
      THEN struct(concat(acc.out, array({merged})) AS out, true AS skip)
    ELSE struct(concat(acc.out, array(syms[i])) AS out, false AS skip)
  END,
  acc -> acc.out
)"""


def bpe_train(documents: DataFrame, n_merges: int = 8) -> list[tuple[str, str, int]]:
    """Learn the first n_merges BPE merge rules from the corpus. Returns
    [(left_symbol, right_symbol, weighted_pair_count), ...] in merge order."""
    vocab = (
        documents.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .withColumn("syms", F.expr("split(word, '')"))
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = vocab.select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(syms) - 2),"
                    " i -> struct(syms[i] AS l, syms[i + 1] AS r))"
                )
            ).alias("p"),
        ).where(F.expr("size(syms) >= 2"))
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, cnt = top[0].l, top[0].r, int(top[0].cnt)
        merges.append((l, r, cnt))
        vocab = vocab.withColumn("syms", F.expr(_merge_pair_expr(l, r))).localCheckpoint()
    return merges
