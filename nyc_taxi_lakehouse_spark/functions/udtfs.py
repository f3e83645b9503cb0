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


# ---------------------------------------------------------------------------
# Polymorphic UDTF — output schema computed by analyze() from a literal
# argument (the Spark 4 advanced form; the static-returnType form above).
# ---------------------------------------------------------------------------


def make_split_fields():
    """CSV splitter whose OUTPUT SCHEMA is decided at plan time by the
    n_cols literal: split_fields(csv, 3) produces (c0, c1, c2). This is
    the polymorphic-UDTF contract — analyze() receives the arguments
    (with literal values when constant-foldable) and returns the schema,
    so one function serves any width with full Catalyst column pruning
    downstream."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class SplitFields:
        @staticmethod
        def analyze(text: AnalyzeArgument, n_cols: AnalyzeArgument) -> AnalyzeResult:
            if n_cols.value is None:
                raise ValueError("split_fields: n_cols must be a literal")
            n = int(n_cols.value)
            schema = StructType()
            for i in range(n):
                schema = schema.add(f"c{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n_cols: int):
            parts = (text or "").split(",")
            n = int(n_cols)
            yield tuple((parts[i] if i < len(parts) else None) for i in range(n))

    return udtf(SplitFields)


def _register_poly_query() -> None:
    from pyspark.sql import DataFrame, SparkSession

    from ..registry import df_query
    from ..sources.tables import load_tables

    @df_query(
        "q_udtf_polymorphic",
        duck_sql="""
SELECT event_id,
       split_part(csv, ',', 1) AS c0,
       split_part(csv, ',', 2) AS c1,
       split_part(csv, ',', 3) AS c2
FROM (
  SELECT event_id,
         event_type || ',' || CAST(user_id AS VARCHAR) || ','
           || CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) AS csv
  FROM events
) s
""",
        tables=["events"],
        doc="POLYMORPHIC Python UDTF (Spark 4 analyze()): split_fields(csv, "
        "3) computes its (c0, c1, c2) output schema at PLAN time from the "
        "width literal — one function, any arity, full downstream column "
        "pruning (the static-returnType form is q_udtf_shingles). Policy "
        "unchanged: UDTFs prove the API surface, never the hot path; the "
        "round-trip (concat to CSV in JVM, split in Python) is hash-"
        "checked against DuckDB split_part, pinning registration, "
        "analyze-time schema, lateral marshalling and NULL padding.",
    )
    def q_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_tables(spark, sf_dir, ["events"])
        spark.udtf.register("split_fields", make_split_fields())
        return spark.sql("""
SELECT e.event_id, s.c0, s.c1, s.c2
FROM (
  SELECT event_id,
         concat(event_type, ',', CAST(user_id AS STRING), ',',
                CAST(CAST(round(value * 100) AS BIGINT) AS STRING)) AS csv
  FROM events
) e, LATERAL split_fields(e.csv, 3) s
""")


_register_poly_query()
