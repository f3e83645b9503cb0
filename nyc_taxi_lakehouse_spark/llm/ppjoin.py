"""Exact set-similarity join via prefix filtering (AllPairs / PPJoin family).

Completes the dedup spectrum: q_dedup_jaccard is exact-within-blocking-buckets
(misses cross-bucket pairs by design), MinHash/SimHash are probabilistic. This
operator is EXACT AND COMPLETE — every pair with shingle-Jaccard ≥ t, no
blocking heuristic — yet never materializes the all-pairs space. The standard
prefix-filter argument (Chaudhuri/Ganti/Kaushik SSJoin; Bayardo AllPairs):

  order each doc's shingles by a global rarity order (document frequency,
  then shingle). If J(x,y) ≥ t then |x∩y| ≥ ⌈t·max(|x|,|y|)⌉ =: α, and two
  sets with overlap ≥ α MUST intersect within their (size − α + 1)-prefixes
  under any shared total order. So joining only the short rare-shingle
  prefixes yields a candidate superset; an exact intersection then verifies
  each candidate.

t = 9/10 here (near-duplicate detection): the prefix is the rarest ~10% + 1
shingles of each doc, which prunes 98.7% of the 12.5M sharing-any-shingle
pairs on the sf0.1 corpus (168k candidates). Threshold choice is a real
knob: a low t (0.5) makes prefixes half the set and the filter stops paying
— measured on this corpus it left 6M candidates, slower than useful. Prefix
filtering is the EXACT join for high thresholds; lower-threshold regimes
belong to MinHash banding (q_dedup_minhash_prod).

Scale shape: the prefix join shuffles only rare shingles (rare keys = no
skew by construction); verification joins the candidate pairs back to the
per-doc shingle arrays (dim-sized; AQE broadcasts locally, shuffles on
doc_id at cluster scale) and intersects vectorized JVM-side
(array_intersect) — no UDF, no driver state. Threshold comparisons use
exact integer cross-multiplication (10·|∩| ≥ 9·|∪|), so the result set is
bit-deterministic and the final Jaccard double is one int/int division.

The DuckDB oracle runs the O(n²)-pairs brute-force join with NO prefix
logic — hash equality IS the completeness check on real data.
tests/test_sketch_cdf.py additionally pins the prefix lemma on adversarial
random sets in pure Python.
"""

from __future__ import annotations

from ..functions.detsql import DUCK, SPARK, Dialect
from ..registry import df_query

_SHINGLE_N = 8  # char-shingle width: wide enough that the 40-word synthetic
# vocabulary doesn't collapse shingle sets (word-level tokens make every doc
# pair ~0.6-similar on this corpus; 8-grams separate true near-dups cleanly)

# t = _T_NUM/_T_DEN; all threshold math is exact integer cross-multiplication.
_T_NUM, _T_DEN = 9, 10


def _gram_rows(d: Dialect) -> str:
    if d.name == "spark":
        return (
            f"SELECT doc_id, explode(array_distinct(transform("
            f"sequence(1, length(text) - {_SHINGLE_N - 1}),"
            f" i -> substring(text, i, {_SHINGLE_N})))) AS gram"
            f" FROM documents WHERE length(text) >= {_SHINGLE_N}"
        )
    return (
        f"SELECT doc_id, unnest(list_distinct(list_transform("
        f"range(1, length(text) - {_SHINGLE_N - 2}),"
        f" i -> substr(text, i, {_SHINGLE_N})))) AS gram"
        f" FROM documents WHERE length(text) >= {_SHINGLE_N}"
    )


def _docsets_spark_sql(table: str = "documents") -> str:
    return f"""
SELECT doc_id, array_distinct(transform(
  sequence(1, length(text) - {_SHINGLE_N - 1}),
  i -> substring(text, i, {_SHINGLE_N}))) AS grams
FROM {table} WHERE length(text) >= {_SHINGLE_N}
"""


def _ppjoin_spark_sql(
    docsets_view: str,
    shuffle_aliases: frozenset = frozenset(),
    gf_view: str | None = None,
) -> str:
    d = SPARK
    tn, td = _T_NUM, _T_DEN

    # Corpus-scaled relations whose MEASURED size exceeds the broadcast
    # budget get a SHUFFLE_MERGE hint (r11, found by the sf10 composed
    # decade): the docset/gram-frequency tables sit behind a
    # localCheckpoint, and Spark 4 propagates the ORIGIN's estimated
    # stats through the LogicalRDD (SPARK-39834) — array columns are
    # badly underestimated, so Catalyst broadcast the ~1.1 GB sf10
    # docset table on a <10 MB estimate and aborted on
    # spark.driver.maxResultSize. Estimates lie; the gate is measured.
    def hint(*aliases: str) -> str:
        names = [a for a in aliases if a in shuffle_aliases]
        return f"/*+ SHUFFLE_MERGE({', '.join(names)}) */ " if names else ""

    # prefix length = n - ceil(t*n) + 1; ceil(tn*n/td) = (tn*n + td - 1) DIV td
    ceil_tn = d.idiv(f"({tn} * n + {td - 1})", str(td))
    # The gram-frequency relation is identical to the one the injectivity
    # gate materializes (optimization r11): reference that checkpoint
    # instead of re-running the explode + corpus-wide aggregate here.
    gf_cte = (
        f"gf AS (SELECT * FROM {gf_view})"
        if gf_view
        else "gf AS (SELECT gram, COUNT(*) AS dfreq FROM grams GROUP BY gram)"
    )
    return f"""
WITH docsets AS (SELECT * FROM {docsets_view}),
grams AS (SELECT doc_id, explode(grams) AS gram FROM docsets),
ds AS (SELECT doc_id, size(grams) AS n FROM docsets),
{gf_cte},
ranked AS (
  SELECT {hint("f", "s")}g.doc_id, g.gram, s.n,
         ROW_NUMBER() OVER (PARTITION BY g.doc_id
                            ORDER BY f.dfreq, g.gram) AS rn
  FROM grams g
  JOIN gf f ON g.gram = f.gram
  JOIN ds s ON g.doc_id = s.doc_id
),
prefix AS (
  SELECT doc_id, gram, n, rn FROM ranked
  WHERE rn <= n - {ceil_tn} + 1
),
cand AS (
  -- Positional filter (the PP of PPJoin, Xiao et al.): per candidate
  -- pair, m = #common prefix grams and (pa, pb) = positions of the LAST
  -- common prefix gram. Every common gram globally ordered before that
  -- gram is itself a prefix-prefix match (if it sat in x's prefix at a
  -- smaller rank, its y-rank is smaller than pb <= y's prefix length, so
  -- it is in y's prefix too), hence overlap <= m + min(n_a - pa, n_b - pb)
  -- EXACTLY — pairs whose bound cannot reach the required overlap
  -- ceil(t/(1+t)*(n_a+n_b)) are pruned before the array_intersect verify,
  -- which is the dominant cost at high t. Same shuffle as the DISTINCT it
  -- replaces (one pair-keyed aggregate), integer cross-multiplied.
  SELECT doc_a, doc_b
  FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(*) AS m,
           MAX(a.rn) AS pa, MAX(b.rn) AS pb,
           MAX(a.n) AS n_a, MAX(b.n) AS n_b
    FROM prefix a
    JOIN prefix b ON a.gram = b.gram AND a.doc_id < b.doc_id
    WHERE {td} * b.n >= {tn} * a.n AND {td} * a.n >= {tn} * b.n
    GROUP BY a.doc_id, b.doc_id
  ) p
  WHERE ({tn} + {td}) * (m + LEAST(n_a - pa, n_b - pb)) >= {tn} * (n_a + n_b)
),
verified AS (
  SELECT {hint("da", "db")}c.doc_a, c.doc_b,
         size(array_intersect(da.grams, db.grams)) AS inter,
         size(da.grams) AS size_a,
         size(db.grams) AS size_b
  FROM cand c
  JOIN docsets da ON c.doc_a = da.doc_id
  JOIN docsets db ON c.doc_b = db.doc_id
)
SELECT doc_a, doc_b,
       CAST(inter AS BIGINT) AS inter_shingles,
       CAST(size_a AS BIGINT) AS size_a,
       CAST(size_b AS BIGINT) AS size_b,
       CAST(inter AS DOUBLE) / (size_a + size_b - inter) AS jaccard
FROM verified
WHERE {td} * inter >= {tn} * (size_a + size_b - inter)
"""


def _ppjoin_duck_sql() -> str:
    tn, td = _T_NUM, _T_DEN
    return f"""
WITH grams AS ({_gram_rows(DUCK)}),
ds AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
pair_inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM grams a
  JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.doc_a, p.doc_b,
       p.inter AS inter_shingles,
       sa.n AS size_a,
       sb.n AS size_b,
       CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) AS jaccard
FROM pair_inter p
JOIN ds sa ON p.doc_a = sa.doc_id
JOIN ds sb ON p.doc_b = sb.doc_id
WHERE {td} * p.inter >= {tn} * (sa.n + sb.n - p.inter)
"""


@df_query(
    "q_dedup_ppjoin",
    duck_sql=_ppjoin_duck_sql(),
    tables=["documents"],
    doc="Exact, complete set-similarity self-join at 8-char-shingle Jaccard "
    ">= 9/10 via prefix filtering (AllPairs/PPJoin): global rarity order -> "
    "rarest-(~n/10+1) prefixes -> prefix-equality candidate join with the "
    "10|y|>=9|x| size filter AND the positional filter (overlap <= "
    "m + min(n_a-pa, n_b-pb) from the last common prefix gram — prunes "
    "90.4% of the 168k prefix candidates at sf0.1, 17.2 s -> 7.1 s "
    "same-host; the bound's exactness is hypothesis-tested in "
    "tests/test_sketch_cdf.py) -> vectorized array_intersect verify with "
    "integer cross-multiplied threshold (98.7% of sharing-any-shingle "
    "pairs pruned before that). The per-doc shingle-array table materializes "
    "ONCE (round_checkpoint + temp view, run-registry lifecycle — its four "
    "plan references would otherwise each re-run the shingle explode under "
    "Catalyst CTE inlining, the q_dedup_minhash lesson). The corpus-scaled "
    "relations (docset arrays, gram frequencies, sizes) join under "
    "MEASURED broadcast gates (r11: Spark 4 propagates the origin's "
    "array-size UNDERestimates through the checkpoint's LogicalRDD — "
    "SPARK-39834 — and Catalyst broadcast the GB-scale sf10 docset table "
    "on a <10 MB estimate, aborting on maxResultSize; within the measured "
    "budget the pinned broadcast shape is kept, beyond it SHUFFLE_MERGE "
    "hints force the scale-safe shuffle). Oracle = the brute-force "
    "all-pairs join with no prefix logic; hash equality IS the "
    "completeness check.",
)
def q_dedup_ppjoin(spark, sf_dir):
    from pyspark.sql import functions as F

    from ..plans.ckpt import (
        evict_round_checkpoint,
        register_run_checkpoint,
        round_checkpoint,
        round_checkpoint_probe,
    )
    from ..session import DEFAULT_SHUFFLE_PARTITIONS
    from ..sources.tables import load_tables

    t = load_tables(spark, sf_dir, ["documents"])
    docs = t["documents"]
    # One parquet row-group locally — fan the shingle explode out (same
    # discipline as q_dedup_chargram); on a cluster input splits do this.
    if docs.rdd.getNumPartitions() < DEFAULT_SHUFFLE_PARTITIONS:
        docs = docs.repartition(DEFAULT_SHUFFLE_PARTITIONS)
    docs.createOrReplaceTempView("pp_documents_sharded")
    docsets = spark.sql(_docsets_spark_sql("pp_documents_sharded"))
    # Materialize-once checkpoint lifecycle (r11 — this site predates the
    # r10 registry convention and had been pinning one RDD per
    # invocation): the string docsets either back the returned plan (the
    # string fallback → run registry) or die the moment the hashed twin
    # materializes (→ eager evict below).
    docsets = round_checkpoint(docsets)
    docsets.createOrReplaceTempView("pp_docsets_str")
    # Fast path: run the ENTIRE pipeline on xxhash64 shingle identities —
    # string array_intersect measured 2.4x slower than int64 (UTF8String
    # hashing per element), and every downstream join/window gets cheaper
    # keys. Exactness is preserved by construction, not by luck: a single
    # bounded-scalar check proves the hash is injective ON THIS CORPUS
    # (|distinct shingles| == |distinct hashes|), in which case every
    # intersection/size under the hash equals its string counterpart
    # exactly. On the astronomically-unlikely collision (or if a 100 TB
    # corpus makes the exact global-distinct check itself too expensive to
    # run), the same SQL runs over the string arrays — correct, slower.
    #
    # r11 pass structure: the injectivity check used to run two corpus-
    # wide COUNT(DISTINCT ...) aggregates over the exploded instance rows
    # (an Expand-multiplied shuffle of every gram instance) while the main
    # query ran the SAME explode + aggregate again to build its gram-
    # frequency CTE. Now the gram-frequency table materializes ONCE
    # (round checkpoint) with the injectivity scalars riding its
    # materializing scan (distinct grams = |gf| rows, so the distinct
    # check shrinks from instance-cardinality to distinct-gram
    # cardinality), and the instance/doc budget scalars come from the
    # already-materialized docset arrays with no explode at all.
    # COALESCE: SUM over an empty docsets table (no doc long enough to
    # shingle) is NULL, and the broadcast-budget arithmetic below would
    # TypeError on it — the pre-r11 COUNT(*)-over-instances form returned
    # 0 and proceeded (ADVICE r11).
    basic = spark.sql(
        "SELECT COALESCE(SUM(size(grams)), 0) AS total, COUNT(*) AS docs "
        "FROM pp_docsets_str"
    ).collect()[0]  # bounded 1-row driver scalar off the checkpoint
    gf_str = spark.sql(
        "SELECT gram, COUNT(*) AS dfreq "
        "FROM (SELECT explode(grams) AS gram FROM pp_docsets_str) "
        "GROUP BY gram"
    )
    gf_str, grow = round_checkpoint_probe(
        gf_str,
        lambda d: d.agg(
            F.count("*").alias("a"),
            F.count_distinct(F.expr("xxhash64(gram)")).alias("b"),
        ).collect()[0],
    )
    register_run_checkpoint(gf_str)
    gf_str.createOrReplaceTempView("pp_gf_str")
    counts = {"a": grow["a"], "total": basic["total"], "docs": basic["docs"]}
    hashed_path = grow["a"] == grow["b"]
    # Measured broadcast gates (r11; see _ppjoin_spark_sql): the sf10
    # composed decade showed Catalyst broadcasting the GB-scale docset
    # array table off SPARK-39834-propagated origin ESTIMATES (array
    # columns underestimated ~100x), aborting on maxResultSize — and the
    # sf1 decade had silently been broadcasting ~108 MB on the same
    # estimates, 10x over the 10 MB threshold contract. Gate each
    # corpus-scaled relation on its measured payload (same scalars as the
    # injectivity check): docsets carry one element per gram INSTANCE,
    # gf one row per distinct gram, ds one row per doc. Within budget the
    # plan keeps its (pinned, bench-measured) broadcast shape; beyond it
    # the joins are forced to shuffle — the posture a 100 TB corpus needs
    # on every one of these relations.
    budget = 16 << 20
    elem = 8 if hashed_path else 3 * _SHINGLE_N  # int64 vs UTF8 string gram
    shuffle = set()
    if counts["total"] * elem > budget:
        shuffle |= {"da", "db"}
    if counts["a"] * (elem + 8) > budget:
        shuffle.add("f")
    if counts["docs"] * 16 > budget:
        shuffle.add("s")
    sql = lambda view, gf: _ppjoin_spark_sql(  # noqa: E731
        view, frozenset(shuffle), gf_view=gf
    )
    if hashed_path:
        hashed = register_run_checkpoint(round_checkpoint(spark.sql(
            "SELECT doc_id, transform(grams, g -> xxhash64(g)) AS grams "
            "FROM pp_docsets_str"
        )))
        # The hashed twin is materialized; the string docsets have no
        # remaining reader and would otherwise stay pinned until the
        # harness release. (The gf checkpoint stays: its hashed view below
        # is a projection over the SAME materialized rows — injectivity
        # makes the per-hash frequencies equal the per-gram ones.)
        evict_round_checkpoint(docsets)
        hashed.createOrReplaceTempView("pp_docsets")
        spark.sql(
            "SELECT xxhash64(gram) AS gram, dfreq FROM pp_gf_str"
        ).createOrReplaceTempView("pp_gf")
        return spark.sql(sql("pp_docsets", "pp_gf"))
    return spark.sql(sql("pp_docsets_str", "pp_gf_str"))
