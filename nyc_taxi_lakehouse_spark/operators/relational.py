"""Core batch ETL + summary queries.

Re-expresses the reference's batch ingest spine (scan → multi-predicate clean
→ rename → derive partition columns → project → aggregate) on the testdata
star schema:

- cleaning filter chain: reference nyc_taxi_to_iceberg.py:91-96 (P1)
- column renames: nyc_taxi_to_iceberg.py:100-105 (P2)
- derived year/month/day partition columns: nyc_taxi_to_iceberg.py:106-109 (P3)
- explicit projection: nyc_taxi_to_iceberg.py:112-136 (P4), casts (P5)
- CTAS daily summary aggregate: nyc_taxi_to_iceberg.py:165-184 (S8, A1, A2)

`lineitem` stands in for the trips fact table (FIXTURES.md §7 mapping).
All continuous aggregates use exact decimal sums (see functions/detsql.py)
so results hash-match the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.detsql import DUCK, SPARK, Dialect, charge, davg, disc_price, dsum, dsum_dec
from ..registry import df_query, sql_query
from ..sources.tables import load_tables

# ---------------------------------------------------------------------------
# q_ingest_clean — the ingest cleaning chain, DataFrame-API style (the one
# pipeline the reference writes with the DataFrame API rather than SQL).
# ---------------------------------------------------------------------------

_INGEST_ORACLE = """
SELECT
  l_orderkey   AS order_id,
  l_partkey    AS part_id,
  l_suppkey    AS supplier_id,
  l_linenumber AS line_number,
  l_quantity   AS quantity,
  l_extendedprice AS price,
  l_discount   AS discount,
  l_returnflag AS return_flag,
  l_linestatus AS line_status,
  CAST(CAST(l_shipdate AS DATE) AS STRING) AS ship_date,
  CAST(year(l_shipdate) AS INT)  AS year,
  CAST(month(l_shipdate) AS INT) AS month,
  CAST(day(l_shipdate) AS INT)   AS day
FROM lineitem
WHERE l_shipdate IS NOT NULL
  AND l_quantity > 0
  AND l_extendedprice > 0
  AND l_linenumber BETWEEN 1 AND 7
"""


@df_query(
    "q_ingest_clean",
    duck_sql=_INGEST_ORACLE,
    tables=["lineitem"],
    doc="Ingest cleaning chain (filters P1, renames P2, derived partition "
    "cols P3, projection P4, cast P5 — nyc_taxi_to_iceberg.py:91-136).",
)
def q_ingest_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem"])
    df = t["lineitem"]
    # Multi-predicate cleaning filter (P1). Expressed as Column algebra so
    # Catalyst pushes every conjunct into the parquet scan (PushedFilters).
    cleaned = df.filter(
        F.col("l_shipdate").isNotNull()
        & (F.col("l_quantity") > 0)
        & (F.col("l_extendedprice") > 0)
        & F.col("l_linenumber").between(1, 7)
    )
    renamed = (
        cleaned.withColumnRenamed("l_orderkey", "order_id")
        .withColumnRenamed("l_partkey", "part_id")
        .withColumnRenamed("l_suppkey", "supplier_id")
        .withColumnRenamed("l_linenumber", "line_number")
        .withColumnRenamed("l_quantity", "quantity")
        .withColumnRenamed("l_extendedprice", "price")
        .withColumnRenamed("l_discount", "discount")
        .withColumnRenamed("l_returnflag", "return_flag")
        .withColumnRenamed("l_linestatus", "line_status")
    )
    derived = (
        # Dates travel as ISO strings: pandas/Arrow represent Spark DATE and
        # DuckDB DATE differently, which breaks the oracle value-hash.
        renamed.withColumn("ship_date", F.col("l_shipdate").cast("date").cast("string"))
        .withColumn("year", F.year("l_shipdate"))
        .withColumn("month", F.month("l_shipdate"))
        .withColumn("day", F.dayofmonth("l_shipdate"))
    )
    return derived.select(
        "order_id",
        "part_id",
        "supplier_id",
        "line_number",
        "quantity",
        "price",
        "discount",
        "return_flag",
        "line_status",
        "ship_date",
        "year",
        "month",
        "day",
    )


# ---------------------------------------------------------------------------
# q_daily_summary — the CTAS daily-summary aggregate (S8).
# ---------------------------------------------------------------------------

_DAILY_SUMMARY = f"""
SELECT
  CAST(CAST(l_shipdate AS DATE) AS STRING) AS ship_date,
  COUNT(*)                 AS total_items,
  COUNT(DISTINCT l_orderkey) AS unique_orders,
  {dsum('l_quantity')}     AS total_qty,
  {davg('l_extendedprice')} AS avg_price,
  {dsum_dec(disc_price('l_extendedprice', 'l_discount'))} AS total_revenue,
  MAX(l_extendedprice)     AS max_price,
  MIN(l_extendedprice)     AS min_price
FROM lineitem
WHERE l_shipdate IS NOT NULL AND l_quantity > 0 AND l_extendedprice > 0
GROUP BY CAST(l_shipdate AS DATE)
"""

sql_query(
    "q_daily_summary",
    spark_sql=_DAILY_SUMMARY,
    duck_sql=_DAILY_SUMMARY,
    tables=["lineitem"],
    doc="Daily summary CTAS aggregate (nyc_taxi_to_iceberg.py:165-184): "
    "groupBy date → count / countDistinct / sum / avg / max / min (A1, A2, A9).",
)

# ---------------------------------------------------------------------------
# q_pricing_rollup — flagship: grouped rollup with conditional aggregates.
# ---------------------------------------------------------------------------

_PRICING_ROLLUP = f"""
SELECT
  l_returnflag AS return_flag,
  l_linestatus AS line_status,
  COUNT(*) AS count_order,
  COUNT(DISTINCT l_orderkey) AS unique_orders,
  {dsum('l_quantity')} AS sum_qty,
  {dsum('l_extendedprice')} AS sum_base_price,
  {dsum_dec(disc_price('l_extendedprice', 'l_discount'))} AS sum_disc_price,
  {dsum_dec(charge('l_extendedprice', 'l_discount', 'l_tax'))} AS sum_charge,
  {davg('l_quantity')} AS avg_qty,
  {davg('l_extendedprice')} AS avg_price,
  {davg('l_discount')} AS avg_disc,
  ({dsum_dec("CASE WHEN l_extendedprice > 0 THEN " + disc_price('l_extendedprice', 'l_discount') + " ELSE CAST(0 AS DECIMAL(18,4)) END")} / 100 / COUNT(*)) AS avg_disc_amt
FROM lineitem
WHERE l_shipdate IS NOT NULL
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

sql_query(
    "q_pricing_rollup",
    spark_sql=_PRICING_ROLLUP,
    duck_sql=_PRICING_ROLLUP,
    tables=["lineitem"],
    doc="Flagship grouped rollup: hash aggregation with exact COUNT DISTINCT "
    "(A2) and conditional aggregate (A3 — comprehensive_analytics.py:258 "
    "tip-percentage idiom). Map-side partial aggregation + single shuffle "
    "on the 2-column group key; scales linearly with input splits.",
)


# ---------------------------------------------------------------------------
# Data profiling — per-column observability report (SURVEY §2.11 family).
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def _profile_oracle_sql() -> str:
    """DuckDB: one wide aggregate CTE, unpivoted by UNION ALL branches (the
    CTE is one row; DuckDB evaluates it once)."""
    aggs = ", ".join(
        f"COUNT(*) - COUNT({c}) AS {c}__nulls, COUNT(DISTINCT {c}) AS {c}__distinct"
        for c in _PROFILE_COLS
    )
    branches = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col_name, n_rows, "
        f"CAST({c}__nulls AS BIGINT) AS n_nulls, "
        f"CAST({c}__distinct AS BIGINT) AS n_distinct FROM wide"
        for c in _PROFILE_COLS
    )
    return f"""
WITH wide AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, {aggs} FROM orders
)
{branches}
"""


@df_query(
    "q_data_profile",
    duck_sql=_profile_oracle_sql(),
    tables=["orders"],
    doc="Per-column data-profiling report (null + exact distinct counts) in "
    "ONE aggregation pass: all 2N+1 aggregates computed together, then the "
    "single wide row unpivoted with stack() — a Project over one row, so "
    "the table is scanned exactly once (a UNION-ALL-per-column form would "
    "re-aggregate per column under Catalyst's CTE inlining). Exact "
    "COUNT(DISTINCT) is the oracle anchor; at 100 TB each becomes "
    "approx_count_distinct — same single-pass shape, mergeable sketches.",
)
def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    orders = t["orders"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct" for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS (col_name, n_nulls, n_distinct)",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct")


def _set_ops_sql(d: Dialect) -> str:
    """Set-operator family over yearly customer cohorts: INTERSECT (retained),
    EXCEPT (churned), UNION (either) — all dedup by definition, labeled and
    recombined so one result pins all three."""
    y95 = "SELECT o_custkey FROM orders WHERE CAST(year(o_orderdate) AS INT) = 1995"
    y96 = "SELECT o_custkey FROM orders WHERE CAST(year(o_orderdate) AS INT) = 1996"
    return f"""
SELECT 'retained' AS cohort, o_custkey FROM ({y95} INTERSECT {y96}) a
UNION ALL
SELECT 'churned' AS cohort, o_custkey FROM ({y95} EXCEPT {y96}) b
UNION ALL
SELECT 'new' AS cohort, o_custkey FROM ({y96} EXCEPT {y95}) c
"""


sql_query(
    "q_set_ops",
    spark_sql=_set_ops_sql(SPARK),
    duck_sql=_set_ops_sql(DUCK),
    tables=["orders"],
    doc="Set-operator family (§2.7): 1995 vs 1996 customer cohorts via "
    "INTERSECT / EXCEPT ×2, recombined with UNION ALL into one labeled "
    "result. Spark plans each set op as a hash aggregate + join on the "
    "full row — the year predicates push to the parquet scan, and AQE "
    "dedups the two shared subquery scans where possible.",
)


def _fuzzy_entity_sql(d: Dialect) -> str:
    """Entity-resolution candidate pairs over the nation dim: levenshtein
    (exact integer edit distance — identical across engines) under a
    threshold, normalized by the longer name."""
    return """
SELECT a.n_name AS name_a,
       b.n_name AS name_b,
       CAST(levenshtein(a.n_name, b.n_name) AS INT) AS edit_distance,
       CAST(1.0 - CAST(levenshtein(a.n_name, b.n_name) AS DOUBLE)
              / GREATEST(length(a.n_name), length(b.n_name)) AS DOUBLE)
         AS name_similarity
FROM nation a
JOIN nation b ON a.n_nationkey < b.n_nationkey
WHERE levenshtein(a.n_name, b.n_name) <= 5
"""


sql_query(
    "q_fuzzy_entity",
    spark_sql=_fuzzy_entity_sql(SPARK),
    duck_sql=_fuzzy_entity_sql(DUCK),
    tables=["nation"],
    doc="Fuzzy entity matching (data-cleaning family): candidate name pairs "
    "from the nation dim under levenshtein <= 5, with a length-normalized "
    "similarity score. Edit distance is exact integer arithmetic — "
    "bit-identical across engines. The dim self-join is broadcast (25 "
    "rows); at scale fuzzy entity resolution blocks on a cheap key "
    "(prefix/soundex/LSH band) before paying the quadratic distance, the "
    "same blocking pattern as llm/dedup.py.",
)


# ---------------------------------------------------------------------------
# Join-family completion: semi/anti (EXISTS), full-outer reconciliation,
# correlated scalar subquery (Catalyst decorrelation).
# ---------------------------------------------------------------------------

_HIGH_VALUE = 200_000  # o_totalprice threshold making the subset selective


_SEMI_ANTI_SQL = f"""
SELECT
  n.n_name AS nation,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(SUM(CASE WHEN EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > {_HIGH_VALUE}
  ) THEN 1 ELSE 0 END) AS BIGINT) AS n_with_high_value,
  CAST(SUM(CASE WHEN NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > {_HIGH_VALUE}
  ) THEN 1 ELSE 0 END) AS BIGINT) AS n_without_high_value
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


sql_query(
    "q_semi_anti",
    spark_sql=_SEMI_ANTI_SQL,
    duck_sql=_SEMI_ANTI_SQL,
    tables=["customer", "orders", "nation"],
    doc="Semi/anti join pair via EXISTS / NOT EXISTS: per nation, customers "
    "WITH and WITHOUT a high-value order. Catalyst compiles both "
    "predicates to ExistenceJoin — the semi-join variant that emits a "
    "boolean flag instead of filtering, so BOTH membership tests ride one "
    "BroadcastHashJoin pass each with no row multiplication (audited: one "
    "exchange total; a plain join+distinct would shuffle every matching "
    "order). Filter-position EXISTS compiles to LeftSemi/LeftAnti, the "
    "same family. Allowlist filtering and tombstone exclusion all compile "
    "to exactly these operators at 100 TB.",
)


_FULL_OUTER_SQL = f"""
WITH buyers AS (
  SELECT DISTINCT o_custkey AS key FROM orders WHERE o_totalprice > {_HIGH_VALUE}
),
actives AS (
  SELECT DISTINCT user_id AS key FROM events
  WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
)
SELECT
  CASE WHEN b.key IS NULL THEN 'events_only'
       WHEN a.key IS NULL THEN 'orders_only'
       ELSE 'both' END AS status,
  CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(MIN(COALESCE(b.key, a.key)) AS BIGINT) AS min_key,
  CAST(MAX(COALESCE(b.key, a.key)) AS BIGINT) AS max_key
FROM buyers b
FULL OUTER JOIN actives a ON b.key = a.key
GROUP BY CASE WHEN b.key IS NULL THEN 'events_only'
              WHEN a.key IS NULL THEN 'orders_only'
              ELSE 'both' END
"""


sql_query(
    "q_full_outer_audit",
    spark_sql=_FULL_OUTER_SQL,
    duck_sql=_FULL_OUTER_SQL,
    tables=["orders", "events"],
    doc="Full-outer reconciliation audit: the key sets of two independent "
    "systems (high-value buyers vs active event users) bucketed into "
    "both / left-only / right-only with COALESCE'd key bounds — the "
    "cross-system consistency check every migration and CDC validation "
    "runs. FULL OUTER is the one join type no rewrite avoids; it shuffles "
    "both deduplicated key sets once and streams the merge. Distinct-"
    "before-join keeps the shuffle minimal (keys, not rows) — at 100 TB "
    "the pre-aggregation is the difference between shuffling 1e12 rows "
    "and 1e8 keys.",
)


_CORRELATED_SQL = """
SELECT
  o.o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_above_avg,
  CAST(MIN(o.o_orderkey) AS BIGINT) AS min_orderkey
FROM orders o
WHERE o.o_totalprice > (
  SELECT 1.5 * AVG(o2.o_totalprice)
  FROM orders o2
  WHERE o2.o_custkey = o.o_custkey
)
GROUP BY o.o_orderpriority
"""


sql_query(
    "q_correlated_subquery",
    spark_sql=_CORRELATED_SQL,
    duck_sql=_CORRELATED_SQL,
    tables=["orders"],
    doc="Correlated scalar subquery: orders whose total exceeds 1.5x their "
    "OWN customer's average — the per-entity-baseline filter users write "
    "naturally and engines must decorrelate. Catalyst rewrites the "
    "correlated aggregate into a grouped subplan joined back on o_custkey "
    "(one scan + one agg + one join instead of a per-row subquery "
    "execution — the O(n^2)-to-O(n) rewrite). AVG of doubles is safe here "
    "because both engines decorrelate to the same per-customer "
    "aggregation: each group's mean is computed over the same small "
    "ordered-by-nothing set; the comparison 1.5*avg is one IEEE multiply. "
    "Counts are integers, so the output is hash-exact.",
)


# ---------------------------------------------------------------------------
# Declarative data-quality expectations audit.
# ---------------------------------------------------------------------------


_EXPECTATIONS_SQL = """
WITH checks AS (
  SELECT
    CAST(COUNT(*) AS BIGINT) AS n_rows,
    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS v_key_null,
    CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS v_price_range,
    CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END)
      AS BIGINT) AS v_status_domain,
    CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS v_date_null
  FROM orders
),
dup AS (
  SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS v_key_dup
  FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY o_orderkey) g
  WHERE n > 1
),
orphans AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v_fk_orphan
  FROM orders o
  WHERE NOT EXISTS (
    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
  )
)
SELECT rule, n_violations, n_rows,
       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INT) AS passed
FROM (
  SELECT 'orderkey_not_null' AS rule, v_key_null AS n_violations, n_rows FROM checks
  UNION ALL
  SELECT 'totalprice_positive', v_price_range, n_rows FROM checks
  UNION ALL
  SELECT 'status_in_domain', v_status_domain, n_rows FROM checks
  UNION ALL
  SELECT 'orderdate_not_null', v_date_null, n_rows FROM checks
  UNION ALL
  SELECT 'orderkey_unique', d.v_key_dup, c.n_rows FROM dup d CROSS JOIN checks c
  UNION ALL
  SELECT 'custkey_references_customer', o.v_fk_orphan, c.n_rows
  FROM orphans o CROSS JOIN checks c
) r
"""


sql_query(
    "q_expectations",
    spark_sql=_EXPECTATIONS_SQL,
    duck_sql=_EXPECTATIONS_SQL,
    tables=["orders", "customer"],
    doc="Declarative expectations audit (the Great-Expectations/dbt-test "
    "shape, complementing lake.py's ingest gates): six rules — not-null "
    "×2, range, categorical domain, key uniqueness, referential "
    "integrity — evaluated as ONE conditional-sum scan plus a grouped "
    "duplicate count and an anti-join orphan count (NOT EXISTS → "
    "LeftAnti/ExistenceJoin with the customer keys broadcast). Emits the "
    "per-rule violation ledger a data contract gates on. At 100 TB the "
    "row checks stay one pass; uniqueness and FK checks shuffle keys "
    "only — and the FK side is the broadcast dim, so the fact never "
    "moves.",
)


# ---------------------------------------------------------------------------
# Table-diff checksum — replica / migration reconciliation.
# ---------------------------------------------------------------------------


def _table_checksum_sql(d: Dialect) -> str:
    """Per-group row counts + order-independent content digests for a table
    and a (simulated lossy) replica. Digest = SUM of per-row md5-derived
    32-bit integers — associative, so any partitioning/order yields the
    same BIGINT (n·2^32 < 2^63 up to ~2e9 rows per group; widen to
    DECIMAL(38,0) beyond). The replica drops every 97th order, modeling a
    partial copy; the digest catches CONTENT drift that row counts alone
    miss (an update-in-place leaves counts equal)."""
    rowhash = d.md5_int32(
        "CAST(o_orderkey AS STRING) || ':' || "
        "CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING)"
    )
    return f"""
WITH a AS (
  SELECT o_orderstatus AS grp,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM({rowhash}) AS BIGINT) AS digest
  FROM orders GROUP BY o_orderstatus
),
b AS (
  SELECT o_orderstatus AS grp,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM({rowhash}) AS BIGINT) AS digest
  FROM orders WHERE o_orderkey % 97 <> 0 GROUP BY o_orderstatus
)
SELECT
  a.grp,
  a.n AS n_source,
  b.n AS n_replica,
  a.digest AS digest_source,
  b.digest AS digest_replica,
  CAST(CASE WHEN a.n = b.n THEN 1 ELSE 0 END AS INT) AS counts_match,
  CAST(CASE WHEN a.digest = b.digest THEN 1 ELSE 0 END AS INT) AS digests_match
FROM a JOIN b ON a.grp = b.grp
"""


sql_query(
    "q_table_checksum",
    spark_sql=_table_checksum_sql(SPARK),
    duck_sql=_table_checksum_sql(DUCK),
    tables=["orders"],
    doc="Table-diff reconciliation: per-group row counts AND order-"
    "independent content digests (sum of per-row md5-int32s) for a source "
    "table vs a lossy replica — the checksum handshake run after every "
    "migration, backfill, or CDC cutover. Counts catch missing rows; "
    "digests catch silent content drift at equal counts. The digest "
    "aggregates map-side (associative integer sum), so comparing two "
    "100 TB tables costs two scans + two tiny group aggregates and "
    "exchanges only |groups| rows — no row-level join anywhere. Groups "
    "localize a mismatch to a partition for surgical re-sync (the same "
    "reasoning as lake.py's partition-bounded merge).",
)
