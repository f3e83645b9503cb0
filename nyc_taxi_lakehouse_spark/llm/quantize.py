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


# ---------------------------------------------------------------------------
# Product quantization (PQ) — subspace codebook assignment.
# ---------------------------------------------------------------------------

_PQ_SUBSPACES = 8       # 64-dim vectors → 8 subvectors of 8 dims
_PQ_SUBDIM = 8
_PQ_K = 16              # centroids per subspace codebook
_PQ_SCALE = 1048576.0   # 2^20 integer grid — exact, associative arithmetic
_PQ_A = 2654435761      # Knuth multiplicative hash (same constants as curation)
_PQ_B = 104729
_PQ_M = 1_000_003


def _pq_sql(d: Dialect) -> str:
    """PQ codebook assignment with a deterministic seeded codebook.

    Codebooks are seeded from K hash-ranked corpus vectors (k-means++-style
    init without RNG — llm/similarity.py's k-means loop is the refinement
    path; assignment algebra is identical either way). Components are
    snapped to a 2^20 integer grid first, so every distance is an EXACT
    BIGINT — order-independent sums, no float comparison hazards, and the
    argmin (ORDER BY dist, cid) is totally ordered cross-engine."""
    if d.name == "spark":
        ivec = (
            "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)"
            f" * {_PQ_SCALE}) AS BIGINT))"
        )
        sub_dist = (
            f"aggregate(transform(sequence(1, {_PQ_SUBDIM}), i -> "
            f"(element_at(v.ivec, t.s * {_PQ_SUBDIM} + i)"
            f" - element_at(c.ivec, t.s * {_PQ_SUBDIM} + i))"
            f" * (element_at(v.ivec, t.s * {_PQ_SUBDIM} + i)"
            f" - element_at(c.ivec, t.s * {_PQ_SUBDIM} + i))), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
        explode_s = f"(SELECT explode(sequence(0, {_PQ_SUBSPACES - 1})) AS s)"
    else:
        ivec = (
            "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)"
            f" * {_PQ_SCALE}) AS BIGINT))"
        )
        sub_dist = (
            f"CAST(list_sum(list_transform(range(1, {_PQ_SUBDIM + 1}), i -> "
            f"(v.ivec[t.s * {_PQ_SUBDIM} + i] - c.ivec[t.s * {_PQ_SUBDIM} + i])"
            f" * (v.ivec[t.s * {_PQ_SUBDIM} + i] - c.ivec[t.s * {_PQ_SUBDIM} + i])"
            ")) AS BIGINT)"
        )
        explode_s = f"(SELECT unnest(range(0, {_PQ_SUBSPACES})) AS s)"
    return f"""
WITH iv AS (
  SELECT vec_id, {ivec} AS ivec
  FROM embeddings
  WHERE {d.arr_len('embedding')} = {_PQ_SUBSPACES * _PQ_SUBDIM}
),
seeds AS (
  SELECT CAST(rn - 1 AS INT) AS cid, ivec FROM (
    SELECT ivec, ROW_NUMBER() OVER (
      ORDER BY ((vec_id * {_PQ_A} + {_PQ_B}) % {_PQ_M}), vec_id
    ) AS rn
    FROM iv
  ) r WHERE rn <= {_PQ_K}
),
pairs AS (
  SELECT v.vec_id, t.s, c.cid, {sub_dist} AS dist
  FROM iv v
  CROSS JOIN {explode_s} t
  CROSS JOIN seeds c
),
best AS (
  SELECT vec_id, s, cid, dist,
         ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, cid) AS rn
  FROM pairs
)
SELECT vec_id,
       CAST(s AS INT) AS sub_id,
       CAST(cid AS INT) AS code,
       CAST(dist AS BIGINT) AS sq_dist
FROM best WHERE rn = 1
"""


sql_query(
    "q_pq_assign",
    spark_sql=_pq_sql(SPARK),
    duck_sql=_pq_sql(DUCK),
    tables=["embeddings"],
    doc="Product quantization: each 64-dim embedding splits into 8 "
    "subvectors, each assigned to the nearest of 16 codebook centroids — "
    "the vector compresses to 8 nibble codes (64 bytes → 4), the memory "
    "layout behind IVF-PQ indexes (Jégou et al., TPAMI 2011). Codebook = "
    "hash-ranked corpus seeds (deterministic k-means init; the Lloyd "
    "refinement loop is q_kmeans_step's algebra per subspace). Components "
    "snap to a 2^20 integer grid so distances are exact BIGINTs. Plan: the "
    "16-row codebook broadcasts; the corpus fans out |subspaces|×K "
    "candidate rows, reduced by a per-(vec,sub) top-1 window — "
    "WindowGroupLimit keeps only rank-1 rows pre-shuffle, so the exchange "
    "carries one row per (vec, sub) at any scale. The assignment is "
    "embarrassingly parallel over vectors — no cross-vector state at all.",
)
