"""Spark 4 SQL-surface features: VARIANT semi-structured type, SQL UDFs.

The reference parses JSON payloads with get_json_object-style extraction
(covered by q_json_props). Spark 4 adds two first-class surfaces a user
migrating to this engine would reach for, both exercised here end-to-end
through the oracle gate:

- VARIANT (`parse_json` → `variant_get`): an open-schema binary-encoded
  semi-structured column. Unlike string JSON, the parsed form is stored
  once and every extraction is a typed O(1) path lookup instead of a
  re-parse — the right shape for 100 TB event payloads read by many
  queries. `variant_get` with an explicit type yields NULL (not an error)
  on path/type misses, which the query pins alongside `is_variant_null`.

- SQL UDFs (`CREATE FUNCTION ... RETURNS ... RETURN expr`): named scalar
  abstractions that Catalyst INLINES into the plan — zero serialization
  boundary, full predicate pushdown/codegen through the call, unlike
  Python UDFs. The query proves inlining semantics by matching a DuckDB
  oracle that writes the expression out longhand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import df_query
from ..sources.tables import load_tables

_VARIANT_SPARK_SQL = """
WITH v AS (
  SELECT event_type, parse_json(props) AS pv, value FROM events
)
SELECT
  event_type,
  variant_get(pv, '$.k', 'bigint') AS k,
  COUNT(*) AS n,
  CAST(SUM(CASE WHEN variant_get(pv, '$.missing', 'bigint') IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS miss_nulls
FROM v
WHERE variant_get(pv, '$.k', 'bigint') IS NOT NULL
GROUP BY event_type, variant_get(pv, '$.k', 'bigint')
"""

_VARIANT_DUCK_SQL = """
SELECT
  event_type,
  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
  COUNT(*) AS n,
  CAST(SUM(CASE WHEN json_extract(props, '$.missing') IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS miss_nulls
FROM events
WHERE CAST(json_extract(props, '$.k') AS BIGINT) IS NOT NULL
GROUP BY event_type, CAST(json_extract(props, '$.k') AS BIGINT)
"""


@df_query(
    "q_variant_extract",
    duck_sql=_VARIANT_DUCK_SQL,
    tables=["events"],
    doc="Spark 4 VARIANT type: props parsed once with parse_json, typed "
    "path extraction via variant_get (NULL, not error, on a missing "
    "path — pinned by the miss_nulls column), grouped rollup on the "
    "extracted value. Oracle = DuckDB json_extract over the same "
    "payloads. At scale VARIANT beats string-JSON because the binary "
    "encoding is parsed once and shredded columnar, not re-parsed per "
    "extraction.",
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["events"])
    return spark.sql(_VARIANT_SPARK_SQL)


_SQL_UDF_DDL = [
    """
CREATE OR REPLACE TEMPORARY FUNCTION value_class(v DOUBLE)
RETURNS STRING
RETURN CASE WHEN v > 100 THEN 'high' WHEN v > 10 THEN 'mid' ELSE 'low' END
""",
    # Composition: a SQL UDF calling another SQL UDF still inlines fully.
    """
CREATE OR REPLACE TEMPORARY FUNCTION value_priority(v DOUBLE, t STRING)
RETURNS STRING
RETURN CASE WHEN value_class(v) = 'high' AND t = 'purchase'
            THEN 'vip' ELSE value_class(v) END
""",
]

_SQL_UDF_SPARK_SQL = """
SELECT
  value_priority(value, event_type) AS priority,
  event_type,
  COUNT(*) AS n
FROM events
GROUP BY value_priority(value, event_type), event_type
"""

_SQL_UDF_DUCK_SQL = """
WITH classed AS (
  SELECT event_type,
         CASE WHEN value > 100 THEN 'high'
              WHEN value > 10 THEN 'mid' ELSE 'low' END AS vc
  FROM events
)
SELECT
  CASE WHEN vc = 'high' AND event_type = 'purchase' THEN 'vip' ELSE vc END
    AS priority,
  event_type,
  COUNT(*) AS n
FROM classed
GROUP BY 1, 2
"""


@df_query(
    "q_sql_udf",
    duck_sql=_SQL_UDF_DUCK_SQL,
    tables=["events"],
    doc="Spark 4 SQL UDFs (CREATE FUNCTION ... RETURN expr): a scalar "
    "classifier plus a second UDF composing it, used in both the "
    "projection and the GROUP BY. Catalyst inlines the calls — no "
    "serialization boundary, codegen intact (unlike Python UDFs). "
    "Oracle writes the same logic longhand, so hash equality proves "
    "the inlined semantics.",
)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["events"])
    for ddl in _SQL_UDF_DDL:
        spark.sql(ddl)
    return spark.sql(_SQL_UDF_SPARK_SQL)


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE) — hierarchy traversal.
# ---------------------------------------------------------------------------


def _recursive_chain_sql(idiv: str, strtype: str) -> str:
    """Ancestor-chain walk over the implicit digit tree (parent = key DIV
    10): per customer, depth to the single-digit root plus the full
    materialized path. Linear recursion — each row spawns exactly one
    successor until its root — so total work is Σ depth(node) rows."""
    return f"""
WITH RECURSIVE chain AS (
  SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth,
         CAST(c_custkey AS {strtype}) AS path
  FROM customer
  UNION ALL
  SELECT node, cur {idiv} 10, depth + 1,
         path || '>' || CAST(cur {idiv} 10 AS {strtype})
  FROM chain WHERE cur >= 10
)
SELECT node, CAST(depth AS INT) AS depth, CAST(cur AS BIGINT) AS root, path
FROM chain WHERE cur < 10
"""


@df_query(
    "q_recursive_cte",
    duck_sql=_recursive_chain_sql("//", "VARCHAR"),
    tables=["customer"],
    doc="WITH RECURSIVE hierarchy traversal (Spark 4's recursive CTE "
    "surface — SPARK-24497): every customer's ancestor chain through the "
    "implicit digit tree parent = key DIV 10, emitting depth, root, and "
    "the materialized path string. The recursion is row-linear (one "
    "successor per row until the root, ≤5 levels for 5-digit keys), so "
    "Spark executes it as a bounded loop of UnionLoop iterations — each "
    "iteration a map over the previous frontier, no joins, no shuffle — "
    "and the engine-level termination check replaces the hand-rolled "
    "iterate+localCheckpoint pattern the pre-4.x operators (CC, BFS, "
    "PageRank) needed. DuckDB runs the identical recursion natively; "
    "hash equality pins both engines' fixpoint semantics.",
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["customer"])
    return spark.sql(_recursive_chain_sql("DIV", "STRING"))


# ---------------------------------------------------------------------------
# LATERAL correlated subquery join — per-group top-k in ANSI form.
# ---------------------------------------------------------------------------


_LATERAL_TOPK_SQL = """
WITH spend AS (
  SELECT c.c_nationkey AS nk, c.c_custkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
           AS spend_cents
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey, c.c_custkey
)
SELECT n.n_name, l.c_custkey, l.spend_cents
FROM nation n,
LATERAL (
  SELECT s.c_custkey, s.spend_cents
  FROM spend s
  WHERE s.nk = n.n_nationkey
  ORDER BY s.spend_cents DESC, s.c_custkey
  LIMIT 3
) l
"""


@df_query(
    "q_lateral_topk",
    duck_sql=_LATERAL_TOPK_SQL,
    tables=["customer", "orders", "nation"],
    doc="ANSI LATERAL correlated subquery join (Spark 4 lateral subquery "
    "support): per-nation top-3 customers by lifetime spend, written as "
    "the 'for each outer row, run this ordered+limited subquery' form "
    "SQL users reach for before learning window tricks. Catalyst "
    "DECORRELATES it — the per-nation sort+limit compiles to a "
    "rank-window over the spend aggregate joined back to nation, the "
    "same physical shape as q_top_parts_per_nation's explicit "
    "ROW_NUMBER (WindowGroupLimit pushes the k-limit into each "
    "partition), so the convenient syntax costs nothing at scale. "
    "Integer-cent spend + (spend DESC, custkey) tiebreak keep the top-3 "
    "selection hash-exact; DuckDB runs the identical SQL natively.",
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["customer", "orders", "nation"])
    return spark.sql(_LATERAL_TOPK_SQL)


# ---------------------------------------------------------------------------
# SQL scripting (Spark 4, SQL:2016 PSM): BEGIN…END with variables + IF.
# ---------------------------------------------------------------------------

_SQL_SCRIPT = """
BEGIN
  DECLARE thr DOUBLE;
  DECLARE tail_mode STRING;
  SET thr = (SELECT percentile_disc(0.9) WITHIN GROUP (ORDER BY value)
             FROM events WHERE value IS NOT NULL);
  IF (SELECT COUNT(*) FROM events WHERE value > thr) * 100 >=
     (SELECT COUNT(*) FROM events WHERE value IS NOT NULL) * 5
  THEN SET tail_mode = 'heavy_tail';
  ELSE SET tail_mode = 'thin_tail';
  END IF;
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_above,
         thr AS threshold,
         tail_mode
  FROM events
  WHERE value > thr
  GROUP BY event_type, thr, tail_mode
  ORDER BY event_type;
END
"""

_SQL_SCRIPT_ORACLE = """
WITH thr AS (
  SELECT quantile_disc(value, 0.9) AS t FROM events WHERE value IS NOT NULL
),
mode AS (
  SELECT CASE WHEN (SELECT COUNT(*) FROM events, thr WHERE value > t) * 100 >=
                   (SELECT COUNT(*) FROM events WHERE value IS NOT NULL) * 5
              THEN 'heavy_tail' ELSE 'thin_tail' END AS m
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_above,
       t.t AS threshold,
       mo.m AS tail_mode
FROM events e CROSS JOIN thr t CROSS JOIN mode mo
WHERE e.value > t.t
GROUP BY e.event_type, t.t, mo.m
ORDER BY e.event_type
"""


@df_query(
    "q_sql_script",
    duck_sql=_SQL_SCRIPT_ORACLE,
    tables=["events"],
    doc="Spark 4 SQL scripting (SQL/PSM, SPARK-48338): a BEGIN…END block "
    "with DECLAREd session variables filled from scalar subqueries and "
    "an IF/ELSE branch — the parameterized-pipeline pattern (compute a "
    "data-driven threshold once, reuse it across statements) that "
    "previously needed driver-side Python glue. The script's SELECT "
    "result hash-matches a declarative CTE oracle in DuckDB, proving "
    "the imperative surface changes nothing about the answer. Each "
    "statement is still a full Catalyst plan — scripting composes "
    "plans, it does not bypass the optimizer.",
)
def q_sql_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["events"])
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(_SQL_SCRIPT)


# ---------------------------------------------------------------------------
# Modern aggregate surfaces: GROUP BY ALL + named WINDOW + FILTER clause.
# ---------------------------------------------------------------------------


def _modern_agg_sql() -> str:
    """Three modern-SQL aggregate surfaces in one real report, same text
    in both engines: GROUP BY ALL (keys inferred from the projection),
    the standard FILTER (WHERE ...) aggregate clause, and a named WINDOW
    definition shared by two window functions. The report itself is the
    order-status yearly mart: revenue, open-order share, and
    year-over-year rank movement per status."""
    return """
WITH yearly AS (
  SELECT
    CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
    o_orderstatus AS status,
    CAST(COUNT(*) AS BIGINT) AS n_orders,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue,
    CAST(COUNT(*) FILTER (WHERE o_orderpriority LIKE '1-%') AS BIGINT)
      AS n_urgent,
    CAST(COUNT(*) FILTER (WHERE o_orderpriority LIKE '5-%') AS BIGINT)
      AS n_low
  FROM orders
  GROUP BY ALL
)
SELECT order_year, status, n_orders, revenue, n_urgent, n_low,
       CAST(RANK() OVER w AS BIGINT) AS revenue_rank_in_year,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS revenue_pos_in_year
FROM yearly
WINDOW w AS (PARTITION BY order_year ORDER BY revenue DESC, status)
ORDER BY order_year, revenue_rank_in_year, status
"""


@df_query(
    "q_modern_agg",
    duck_sql=_modern_agg_sql(),
    tables=["orders"],
    doc="Modern aggregate surfaces exercised as one real report (same SQL "
    "text both engines): GROUP BY ALL (projection-inferred keys), the "
    "SQL-standard FILTER (WHERE ...) aggregate clause, and a named "
    "WINDOW definition shared by two ranking functions — the yearly "
    "order-status mart with urgent/low-priority splits and in-year "
    "revenue ranks. One grouped aggregate; the rank windows run on the "
    "|years| x |statuses| grain.",
)
def q_modern_agg(spark, sf_dir):
    from ..sources.tables import load_tables

    load_tables(spark, sf_dir, ["orders"])
    return spark.sql(_modern_agg_sql())


# ---------------------------------------------------------------------------
# Spark 4 SQL pipe syntax — the composable |> query form.
# ---------------------------------------------------------------------------

_PIPE_SQL = """
FROM lineitem
|> WHERE l_shipdate <= DATE '1998-09-02'
|> EXTEND CAST(l_extendedprice AS DECIMAL(28,2)) AS price_d,
          CAST(l_quantity AS BIGINT) AS qty
|> AGGREGATE
     CAST(COUNT(*) AS BIGINT) AS count_order,
     CAST(SUM(qty) AS BIGINT) AS sum_qty,
     CAST(SUM(price_d) AS DOUBLE) AS sum_base_price,
     CAST(SUM(price_d * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE)
       AS sum_disc_price
   GROUP BY l_returnflag, l_linestatus
|> ORDER BY l_returnflag, l_linestatus
"""

_PIPE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS count_order,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)
         AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))
                * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE)
         AS sum_disc_price
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@df_query(
    "q_sql_pipe",
    duck_sql=_PIPE_ORACLE,
    tables=["lineitem"],
    doc="Spark 4 SQL pipe syntax (|>): the flagship pricing rollup "
    "written as a FROM ... |> WHERE |> EXTEND |> AGGREGATE ... GROUP BY "
    "|> ORDER BY pipeline — the composable query form Spark 4 adds — "
    "hash-checked against the equivalent ANSI form in DuckDB (which has "
    "no pipe syntax; the oracle IS the desugaring). Note pipe AGGREGATE "
    "emits GROUP BY keys after the aggregates — column order differs "
    "from the ANSI form but the driver compares by sorted column name. "
    "Same exact-decimal aggregate discipline as q_pricing_rollup.",
)
def q_sql_pipe(spark, sf_dir):
    from ..sources.tables import load_tables

    load_tables(spark, sf_dir, ["lineitem"])
    return spark.sql(_PIPE_SQL)


# ---------------------------------------------------------------------------
# Arrow-optimized Python UDF — the modern scalar-UDF escape hatch.
# ---------------------------------------------------------------------------


def _digit_root_py(x):
    # digital root via the exact casting-out-nines identity
    x = int(x)
    return 0 if x == 0 else 1 + (x - 1) % 9


@df_query(
    "q_arrow_udf",
    duck_sql="""
SELECT CAST(CASE WHEN o_orderkey = 0 THEN 0
            ELSE 1 + (o_orderkey - 1) % 9 END AS BIGINT) AS digit_root,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY 1
ORDER BY 1
""",
    tables=["orders"],
    doc="Arrow-optimized Python scalar UDF (Spark 4 useArrow=True — "
    "vectorized Arrow transfer instead of pickled rows): the digital "
    "root of the order key, grouped and counted, oracle-checked against "
    "the closed-form casting-out-nines identity in pure SQL. An API-"
    "surface proof like q_udtf_shingles/q_synth_source — documented "
    "never-hot-path (every production operator in this repo stays "
    "JVM-side; this pins that WHEN a Python scalar UDF is unavoidable, "
    "the Arrow form is the sanctioned one and its results are exactly "
    "reproducible).",
)
def q_arrow_udf(spark, sf_dir):
    from pyspark.sql.functions import udf

    from ..sources.tables import load_tables

    t = load_tables(spark, sf_dir, ["orders"])
    droot = udf(_digit_root_py, "bigint", useArrow=True)
    return (
        t["orders"]
        .select(droot("o_orderkey").alias("digit_root"))
        .groupBy("digit_root")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("digit_root")
    )
