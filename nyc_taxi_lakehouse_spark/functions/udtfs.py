"""Python UDTF surface (Spark 3.5+/4 user-defined table functions).

The reference exposes no UDTF (SURVEY §2.10 — its engine predates them);
this module pins the escape hatch anyway: a lateral table function that
fans each input row into multiple output rows with per-row Python logic.
Policy unchanged from the rest of the repo — UDTFs are NOT used on hot
paths (built-in explode/sequence expressions cover those, cf. q_gap_fill);
this exists to prove the API surface with the same oracle rigor as
everything else.

The example is character 5-gram shingling (the unit q_dedup_chargram uses
JVM-side): deterministic string arithmetic, so the whole UDTF path —
registration, lateral join, per-row generator, result marshalling — is
hash-checkable against a DuckDB range+substr oracle.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

_K = 5  # shingle width


@udtf(returnType=f"pos INT, shingle STRING")
class CharShingles:
    """LATERAL char_shingles(text): one row per character 5-gram."""

    def eval(self, text: str):  # noqa: A002
        if text is None:
            return
        for i in range(0, max(0, len(text) - _K + 1)):
            yield i, text[i : i + _K]


def register(spark) -> None:
    spark.udtf.register("char_shingles", CharShingles)


def _register_query() -> None:
    from pyspark.sql import DataFrame, SparkSession

    from ..registry import df_query
    from ..sources.tables import load_tables

    oracle = f"""
WITH shingled AS (
  SELECT d.doc_id,
         unnest(range(0, greatest(0, length(d.text) - {_K} + 1))) AS pos
  FROM documents d
  WHERE d.doc_id IS NOT NULL AND d.text IS NOT NULL
),
grams AS (
  SELECT s.doc_id, s.pos,
         substr(d.text, CAST(s.pos + 1 AS INT), {_K}) AS shingle
  FROM shingled s JOIN documents d ON s.doc_id = d.doc_id
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_distinct,
       MIN(shingle) AS first_alpha,
       MAX(shingle) AS last_alpha
FROM grams
GROUP BY doc_id
"""

    @df_query(
        "q_udtf_shingles",
        duck_sql=oracle,
        tables=["documents"],
        doc="Python UDTF end-to-end (§2.10): char_shingles registered as a "
        "lateral table function and applied per document, then aggregated "
        "(count / distinct / lexicographic extremes per doc). The oracle "
        "rebuilds the same shingles with range+substr in DuckDB, so UDTF "
        "registration, the LATERAL join, the per-row Python generator and "
        "result marshalling are all hash-verified. Deliberately NOT a hot "
        "path: the JVM-side substring explode (q_dedup_chargram) is the "
        "production shingler; the UDTF exists as the per-row-logic escape "
        "hatch with the same correctness gate as every built-in operator.",
    )
    def q_udtf_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
        register(spark)
        load_tables(spark, sf_dir, ["documents"])
        return spark.sql(
            f"""
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(DISTINCT s.shingle) AS BIGINT) AS n_distinct,
       MIN(s.shingle) AS first_alpha,
       MAX(s.shingle) AS last_alpha
FROM documents d, LATERAL char_shingles(d.text) s
WHERE d.doc_id IS NOT NULL AND d.text IS NOT NULL
GROUP BY d.doc_id
"""
        )


_register_query()
