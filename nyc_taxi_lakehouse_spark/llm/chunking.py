"""Sliding-window document chunking (RAG / context-window prep).

Complements curation.py's q_seq_packing (concat-and-chunk at fixed capacity,
no overlap, documents may span boundaries): retrieval pipelines instead chunk
each document INDEPENDENTLY into fixed-size token windows with overlap, so
every passage appears with enough left context to embed well. Window = 40
tokens, stride = 30 (10-token overlap): chunk i covers tokens
[i*stride, i*stride + window).

Scale shape: pure per-row map — split once, generate the stride grid with
``sequence``, ``posexplode`` it, and ``slice`` the shared token array per
chunk. No shuffle, no UDF, stays in whole-stage codegen; output size is
input_tokens / stride rows regardless of document skew (a 1 GB document
becomes ~n/stride rows, not one giant row). At 100 TB this scales with input
splits exactly like the text.py map family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import df_query
from ..sources.tables import load_tables

_WINDOW = 40
_STRIDE = 30


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    window: int = _WINDOW,
    stride: int = _STRIDE,
) -> DataFrame:
    """Explode each document into overlapping token chunks.

    The final chunk of a document may be shorter than ``window`` (it clamps
    at the document end); a document shorter than ``stride`` yields exactly
    one chunk. Tokenization is whitespace splitting, matching the engine's
    token-count convention (functions/detsql.py).
    """
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
    )
    exploded = docs.select(
        "doc_id", toks.alias("__toks"), F.posexplode(starts).alias("chunk_idx", "start")
    )
    chunk = F.slice(F.col("__toks"), F.col("start") + 1, F.lit(window))
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("start").cast("bigint").alias("start_token"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


@df_query(
    "q_chunk_overlap",
    duck_sql=f"""
WITH t AS (
  SELECT doc_id, str_split(text, ' ') AS toks FROM documents
), s AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, greatest(len(toks) - 1, 0), {_STRIDE})) AS start
  FROM t
)
SELECT doc_id,
       CAST(start // {_STRIDE} AS INT) AS chunk_idx,
       CAST(start AS BIGINT) AS start_token,
       CAST(len(list_slice(toks, start + 1, start + {_WINDOW})) AS INT)
         AS n_chunk_tokens,
       array_to_string(list_slice(toks, start + 1, start + {_WINDOW}), ' ')
         AS chunk_text
FROM s
""",
    tables=["documents"],
    doc=f"RAG-style sliding-window chunking: each document split into "
    f"{_WINDOW}-token chunks at stride {_STRIDE} ({_WINDOW - _STRIDE}-token "
    "overlap), final chunk clamped at the document end. "
    "sequence+posexplode+slice — pure map, no shuffle, no UDF. Oracle = "
    "generate_series + list_slice in DuckDB.",
)
def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    return chunk_documents(t["documents"])
