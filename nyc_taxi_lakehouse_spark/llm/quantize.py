"""Embedding quantization for ANN-at-scale pipelines.

Symmetric per-vector int8 quantization — the standard storage/shuffle
compression step in front of large-scale similarity search (4× smaller
vectors than float32 ⇒ 4× less shuffle IO for the LSH/IVF candidate joins
in llm/similarity.py, with ~0.4% max per-component error).

Everything is SQL higher-order functions over the array column — transform /
aggregate folds, no explode, no shuffle, no UDF: a pure map over the
embeddings table that scales with input splits.

Cross-engine determinism: code q(x) = floor(x·127/max_abs + 0.5) uses only
exact float→double widening, IEEE multiply/divide (identical in both
engines), and floor — no double→decimal snapping, no order-dependent float
sums. The emitted checksums (Σq, Σq², saturation count) are exact BIGINT
folds, associative in any order.
"""

from __future__ import annotations

from ..functions.detsql import DUCK, SPARK, Dialect
from ..registry import sql_query


def _quantize_sql(d: Dialect) -> str:
    if d.name == "spark":
        max_abs = "CAST(array_max(transform(embedding, x -> abs(x))) AS DOUBLE)"
        codes = (
            "transform(embedding, x -> CAST(floor("
            "CAST(x AS DOUBLE) * 127.0 / max_abs + 0.5) AS BIGINT))"
        )
        code_sum = "aggregate(codes, CAST(0 AS BIGINT), (acc, q) -> acc + q)"
        code_sq = "aggregate(codes, CAST(0 AS BIGINT), (acc, q) -> acc + q * q)"
        n_sat = "CAST(size(filter(codes, q -> abs(q) = 127)) AS INT)"
    else:
        max_abs = "CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)"
        codes = (
            "list_transform(embedding, x -> CAST(floor("
            "CAST(x AS DOUBLE) * 127.0 / max_abs + 0.5) AS BIGINT))"
        )
        code_sum = "CAST(list_sum(codes) AS BIGINT)"
        code_sq = "CAST(list_sum(list_transform(codes, q -> q * q)) AS BIGINT)"
        n_sat = "CAST(len(list_filter(codes, q -> abs(q) = 127)) AS INT)"
    return f"""
WITH base AS (
  SELECT vec_id,
         embedding,
         {d.arr_len('embedding')} AS n_dims,
         {max_abs} AS max_abs
  FROM embeddings
),
coded AS (
  SELECT vec_id, n_dims, max_abs, {codes} AS codes
  FROM base
  WHERE max_abs > 0
)
SELECT
  vec_id,
  n_dims,
  CAST(max_abs / 127.0 AS DOUBLE) AS scale,
  {code_sum} AS code_sum,
  {code_sq} AS code_sq_sum,
  {n_sat} AS n_saturated
FROM coded
"""


sql_query(
    "q_embedding_quantize",
    spark_sql=_quantize_sql(SPARK),
    duck_sql=_quantize_sql(DUCK),
    tables=["embeddings"],
    doc="Symmetric per-vector int8 quantization of the embedding column: "
    "scale = max|x|/127, code = floor(x/scale + 0.5) via transform(), "
    "emitted as per-vector exact-integer checksums (Σq, Σq², saturation "
    "count) plus the reconstruction scale. Map-only higher-order-function "
    "pipeline — no explode, no shuffle; |q| ≤ 127 by construction and "
    "reconstruction error ≤ scale/2 per component (pinned in pytest). "
    "Zero vectors are excluded (scale undefined).",
)
