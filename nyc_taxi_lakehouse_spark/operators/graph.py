"""Iterative graph analytics — PageRank over the trade graph.

Completes the iterative-algorithm family (connected components in
llm/dedup.py, Lloyd k-means in llm/similarity.py) with the third canonical
shape: damped random-walk fixpoint iteration. The graph is the bipartite
customer↔supplier trade graph induced by orders×lineitem (who traded with
whom), made symmetric so no node dangles.

Determinism contract: ranks are EXACT fixed-point BIGINTs (1e12 grid).
Every step is integer arithmetic — contribution = pr DIV deg, damping =
(85·Σ) DIV 100 — associative, order-independent, bit-identical in DuckDB.
No floats anywhere, so the oracle (the same recurrence unrolled as chained
CTEs) hash-matches exactly at any iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import df_query
from ..sources.tables import load_tables

_PR_SCALE = 1_000_000_000_000  # 1e12 fixed-point grid per unit of rank mass
_PR_BASE = (15 * _PR_SCALE) // 100  # (1-d) teleport share, d = 0.85
_PR_ITERS = 5


def _pagerank_oracle(iters: int = _PR_ITERS) -> str:
    """The identical integer recurrence, unrolled as chained CTEs."""
    ctes = [
        """pairs AS (
  SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
e AS (SELECT edges.src, edges.dst, deg.deg FROM edges JOIN deg ON edges.src = deg.src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
it0 AS (SELECT node, CAST(%d AS BIGINT) AS pr FROM nodes)"""
        % _PR_SCALE
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""it{i} AS (
  SELECT n.node,
         CAST({_PR_BASE} + (85 * COALESCE(s.inflow, 0)) // 100 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(p.pr // e.deg) AS inflow
    FROM e JOIN it{i - 1} p ON e.src = p.node
    GROUP BY e.dst
  ) s ON n.node = s.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT
  node,
  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
  CAST(node // 2 AS BIGINT) AS entity_key,
  pr
FROM it{iters}
"""
    )


@df_query(
    "q_pagerank",
    duck_sql=_pagerank_oracle(),
    tables=["orders", "lineitem"],
    doc="PageRank (d=0.85, 5 synchronous iterations) over the symmetric "
    "customer↔supplier trade graph — the damped-walk centrality that ranks "
    "entities by recursive importance, not raw degree. Exact fixed-point "
    "BIGINT arithmetic end to end (1e12 grid; contribution = pr DIV deg, "
    "damping = 85·Σ DIV 100), so the DuckDB oracle — the same recurrence "
    "unrolled into chained CTEs — hash-matches bit-for-bit. Plan per "
    "round: one hash join of ranks onto the checkpointed edge list (keyed "
    "by src), one sum-aggregate keyed by dst — the classic Pregel "
    "message-pass expressed as join+agg. The edge list (with out-degrees) "
    "is localCheckpointed ONCE and reused every round; at 100 TB it would "
    "be bucketed by src so each iteration's join is exchange-free on the "
    "edge side, and iterations stay at O(diameter-free) fixed count — "
    "bounded, unlike the CC fixpoint. Ranks stay lazy across the 5 rounds "
    "(fixed shallow lineage — no checkpoint churn needed).",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    pairs = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # Materialize the (src, dst, deg) edge relation once — every iteration
    # re-reads it, so recomputing the orders×lineitem join per round would
    # multiply the dominant cost by the iteration count.
    e = edges.join(deg, "src").localCheckpoint()
    nodes = e.select(F.col("src").alias("node")).distinct()
    ranks = nodes.withColumn("pr", F.lit(_PR_SCALE).cast("bigint"))
    for _ in range(_PR_ITERS):
        inflow = (
            e.join(ranks, e.src == ranks.node)
            .select("dst", F.expr("pr DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = nodes.join(inflow, nodes.node == inflow.dst, "left").select(
            "node",
            (
                F.lit(_PR_BASE).cast("bigint")
                + F.expr("(85 * coalesce(inflow, CAST(0 AS BIGINT))) DIV 100")
            ).alias("pr"),
        )
    return ranks.select(
        "node",
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("kind"),
        F.expr("node DIV 2").alias("entity_key"),
        F.col("pr").cast("bigint").alias("pr"),
    )
