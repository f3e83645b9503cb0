"""Tests for the Misra-Gries heavy-hitter sketch, sliding-window chunking,
and the versioned-table change data feed (operators/frequency.py,
llm/chunking.py, operators/cdf.py). The oracle-parity suite covers the
registered queries; these pin the operator guarantees directly."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nyc_taxi_lakehouse_spark.llm.chunking import _STRIDE, _WINDOW, chunk_documents
from nyc_taxi_lakehouse_spark.operators.cdf import snapshot_diff
from nyc_taxi_lakehouse_spark.operators.frequency import (
    heavy_hitters_exact,
    mg_fold,
    misra_gries_candidates,
)

from .conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# Misra-Gries: the no-false-negative guarantee, adversarially.
# ---------------------------------------------------------------------------

# Streams drawn from a small alphabet with wildly uneven run lengths — the
# regime where naive top-k-per-batch (which MG is NOT) silently drops keys
# that are heavy overall but never heavy within one batch.
_stream = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30), st.integers(1, 50)),
    min_size=1,
    max_size=60,
)


@given(stream=_stream, k=st.integers(2, 12), nbatches=st.integers(1, 5))
@settings(max_examples=200, deadline=None)
def test_mg_fold_superset_guarantee(stream, k, nbatches):
    """Any key with total frequency > n/k must survive the folded summary,
    regardless of how the stream is split into batches."""
    keys = [f"k{key}" for key, run in stream for _ in range(run)]
    n = len(keys)
    # Split into contiguous batches (mapInPandas sees Arrow-sized slices).
    size = max(1, n // nbatches)
    counters = pd.Series(dtype="int64")
    for i in range(0, n, size):
        batch = pd.Series(keys[i : i + size], dtype=object)
        counters = mg_fold(counters, batch.value_counts(), k)
    assert len(counters) <= k
    exact = pd.Series(keys, dtype=object).value_counts()
    heavy = set(exact[exact > n / k].index)
    assert heavy <= set(counters.index), (
        f"lost heavy keys {heavy - set(counters.index)} (n={n}, k={k})"
    )
    # Counters are lower bounds on true frequency.
    for key, lb in counters.items():
        assert lb <= exact[key]


def test_heavy_hitters_exact_matches_groupby(spark):
    """End-to-end on a skewed Spark frame: the sketch-accelerated exact
    protocol must equal a plain groupBy-count-filter."""
    rows = (
        [("hot1",)] * 400
        + [("hot2",)] * 250
        + [(f"cold{i}",) for i in range(300)]
        + [("warm",)] * 60
    )
    df = spark.createDataFrame(rows, ["key"]).repartition(7)
    got = {
        (r["key"], r["cnt"])
        for r in heavy_hitters_exact(df, "key", support=0.05, k=32).collect()
    }
    n = len(rows)
    exact = {
        (r["key"], r["cnt"])
        for r in df.groupBy("key")
        .count()
        .withColumnRenamed("count", "cnt")
        .filter(f"cnt > {n} * 0.05")
        .collect()
    }
    assert got == exact and {k for k, _ in got} == {"hot1", "hot2", "warm"}


def test_mg_candidate_count_bounded(spark):
    """Candidate set stays O(k × partitions) even with many distinct keys."""
    df = spark.range(0, 20000).selectExpr("CAST(id % 5000 AS STRING) AS key")
    df = df.repartition(4)
    cands = misra_gries_candidates(df, "key", k=16)
    assert cands.count() <= 16 * 4


def test_heavy_hitters_rejects_bad_k(spark):
    df = spark.range(1).selectExpr("CAST(id AS STRING) AS key")
    with pytest.raises(ValueError):
        heavy_hitters_exact(df, "key", support=0.01, k=50)


# ---------------------------------------------------------------------------
# Chunking: coverage / overlap / reconstruction invariants.
# ---------------------------------------------------------------------------


def test_chunk_overlap_invariants(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    chunks = chunk_documents(docs).toPandas()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, g in chunks.groupby("doc_id"):
        g = g.sort_values("chunk_idx").reset_index(drop=True)
        toks = texts[doc_id].split(" ")
        n = len(toks)
        # Chunk starts form the stride grid and cover every token.
        assert list(g["start_token"]) == list(range(0, max(n - 1, 0) + 1, _STRIDE))
        covered = set()
        for _, row in g.iterrows():
            s = int(row["start_token"])
            expect = toks[s : s + _WINDOW]
            assert row["chunk_text"] == " ".join(expect)
            assert int(row["n_chunk_tokens"]) == len(expect)
            covered.update(range(s, min(s + _WINDOW, n)))
        assert covered == set(range(n))
        # Consecutive chunks overlap by window - stride tokens (except a
        # clamped final chunk, which may be shorter).
        for i in range(len(g) - 1):
            a_end = int(g.loc[i, "start_token"]) + int(g.loc[i, "n_chunk_tokens"])
            assert a_end - int(g.loc[i + 1, "start_token"]) >= 0


# ---------------------------------------------------------------------------
# Change data feed: applying the diff to the old snapshot yields the new one.
# ---------------------------------------------------------------------------


def test_snapshot_diff_round_trip(spark, tmp_path):
    from pyspark.sql import functions as F

    from nyc_taxi_lakehouse_spark.versioned import VersionedLakeTable

    orders = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(500)
        .cache()
    )
    table = VersionedLakeTable(spark, str(tmp_path / "t"))
    table.append(orders.filter("o_orderkey % 2 = 0"))
    batch = (
        orders.filter("o_orderkey % 2 = 1")
        .withColumn("__del", F.lit(False))
        .unionByName(
            orders.filter("o_orderkey % 10 = 0").withColumn("__del", F.lit(True))
        )
    )
    table.merge_upsert(batch, keys=["o_orderkey"], delete_col="__del")

    feed = snapshot_diff(table, ["o_orderkey"], 1, 2).cache()
    kinds = {r["change_type"] for r in feed.select("change_type").distinct().collect()}
    assert kinds == {"insert", "delete"}

    # Replay: (old minus deleted/updated keys) union post-images == new.
    old = table.read(1)
    new = table.read(2)
    touched = feed.select("o_orderkey")
    replayed = old.join(touched, "o_orderkey", "left_anti").unionByName(
        feed.filter("change_type <> 'delete'").drop("change_type")
    )
    assert replayed.exceptAll(new).count() == 0
    assert new.exceptAll(replayed).count() == 0


def test_snapshot_diff_update_post_image(spark, tmp_path):
    from pyspark.sql import functions as F

    from nyc_taxi_lakehouse_spark.versioned import VersionedLakeTable

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], ["k", "v"]
    )
    table = VersionedLakeTable(spark, str(tmp_path / "t"))
    table.append(df)
    table.merge_upsert(
        df.filter("k = 2").withColumn("v", F.lit(99.0)), keys=["k"]
    )
    rows = snapshot_diff(table, ["k"], 1, 2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["k"], r["change_type"], r["v"]) == (2, "update", 99.0)
    # Identical re-merge of an unchanged row must NOT appear as a change.
    table.merge_upsert(df.filter("k = 1"), keys=["k"])
    assert snapshot_diff(table, ["k"], 2, 3).count() == 0


# ---------------------------------------------------------------------------
# Pareto frontier: the O(n log n) sweep must equal the quadratic dominance
# scan on adversarial point sets (ties on x, ties on y, duplicate points).
# ---------------------------------------------------------------------------


def test_pareto_sweep_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    pts = [(i, float(rng.randrange(0, 12)), rng.randrange(0, 12)) for i in range(120)]
    # Exact duplicate pair at an undominated location: both must survive
    # (neither strictly dominates the other).
    pts += [(200, 100.0, 12), (201, 100.0, 12)]
    df = spark.createDataFrame(pts, ["pid", "x", "y"])
    df.createOrReplaceTempView("pts")
    sweep = spark.sql("""
        WITH x AS (SELECT x AS xv, MAX(y) AS ymax FROM pts GROUP BY x),
        x2 AS (
          SELECT xv, ymax,
                 MAX(ymax) OVER (ORDER BY xv DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_max
          FROM x
        )
        SELECT p.pid FROM pts p JOIN x2 ON p.x = x2.xv
        WHERE p.y = x2.ymax AND (x2.prev_max IS NULL OR x2.prev_max < p.y)
    """)
    got = {r["pid"] for r in sweep.collect()}
    brute = {
        pid
        for pid, x, y in pts
        if not any(
            (qx >= x and qy >= y and (qx > x or qy > y)) for _, qx, qy in pts
        )
    }
    assert got == brute
    assert {200, 201} <= got


# ---------------------------------------------------------------------------
# Prefix-filter lemma (llm/ppjoin.py): candidates from rarity-ordered
# (s - ceil(t*s) + 1)-prefixes are a SUPERSET of all pairs with Jaccard >= t.
# Pure-Python mirror of the SQL's formula on adversarial random sets.
# ---------------------------------------------------------------------------

_sets = st.lists(
    st.sets(st.integers(0, 25), min_size=1, max_size=14), min_size=2, max_size=12
)


@given(sets=_sets)
@settings(max_examples=300, deadline=None)
def test_ppjoin_prefix_filter_complete(sets):
    from nyc_taxi_lakehouse_spark.llm.ppjoin import _T_DEN, _T_NUM

    t_num, t_den = _T_NUM, _T_DEN  # matching q_dedup_ppjoin
    # Global rarity order: (document frequency, token) — same as the SQL.
    dfreq = {}
    for s in sets:
        for tok in s:
            dfreq[tok] = dfreq.get(tok, 0) + 1
    order = lambda tok: (dfreq[tok], tok)
    prefixes = []
    for s in sets:
        n = len(s)
        plen = n - ((t_num * n + t_den - 1) // t_den) + 1  # n - ceil(t*n) + 1
        prefixes.append(set(sorted(s, key=order)[:plen]))
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            inter = len(a & b)
            union = len(a | b)
            if t_den * inter >= t_num * union:  # J >= t, exact arithmetic
                assert prefixes[i] & prefixes[j], (
                    f"prefix filter missed pair with J={inter}/{union}: {a} {b}"
                )


@given(sets=_sets)
@settings(max_examples=300, deadline=None)
def test_ppjoin_positional_filter_complete(sets):
    """The r6 positional filter (cand CTE): with m = #common prefix tokens
    and (pa, pb) = 1-based ranks of the LAST common prefix token,
    overlap <= m + min(n_a - pa, n_b - pb) EXACTLY, so pruning pairs whose
    bound cannot reach ceil(t/(1+t)*(n_a+n_b)) never drops a J >= t pair.
    Pure-Python mirror of the SQL on adversarial random sets."""
    from nyc_taxi_lakehouse_spark.llm.ppjoin import _T_DEN, _T_NUM

    t_num, t_den = _T_NUM, _T_DEN
    dfreq = {}
    for s in sets:
        for tok in s:
            dfreq[tok] = dfreq.get(tok, 0) + 1
    order = lambda tok: (dfreq[tok], tok)
    ranked, prefixes = [], []
    for s in sets:
        n = len(s)
        plen = n - ((t_num * n + t_den - 1) // t_den) + 1
        srt = sorted(s, key=order)
        ranked.append({tok: k + 1 for k, tok in enumerate(srt)})
        prefixes.append(set(srt[:plen]))
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            common_prefix = prefixes[i] & prefixes[j]
            if not common_prefix:
                continue  # prefix lemma test covers this side
            na, nb = len(a), len(b)
            m = len(common_prefix)
            pa = max(ranked[i][tok] for tok in common_prefix)
            pb = max(ranked[j][tok] for tok in common_prefix)
            ubound = m + min(na - pa, nb - pb)
            inter = len(a & b)
            # the bound is a true overlap upper bound...
            assert inter <= ubound, (sorted(a), sorted(b))
            # ...so the pruning predicate keeps every J >= t pair
            if t_den * inter >= t_num * (na + nb - inter):
                assert (t_num + t_den) * ubound >= t_num * (na + nb)


# ---------------------------------------------------------------------------
# HLL sketch rollup (q_hll_rollup): mergeability + error bound.
# ---------------------------------------------------------------------------


def test_hll_rollup_merge_and_error(spark):
    spark.read.parquet(f"{SF_SMOKE}/events.parquet").createOrReplaceTempView(
        "events"
    )
    row = spark.sql("""
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS day,
                 hll_sketch_agg(user_id, 12) AS sk
          FROM events GROUP BY CAST(ts AS DATE)
        )
        SELECT
          (SELECT hll_sketch_estimate(hll_union_agg(sk)) FROM daily) AS merged,
          (SELECT hll_sketch_estimate(hll_sketch_agg(user_id, 12))
             FROM events) AS direct,
          (SELECT COUNT(DISTINCT user_id) FROM events) AS exact
    """).collect()[0]
    # Mergeability: union of daily sketches must equal the sketch built in
    # one pass over the same rows — same DataSketches state, exactly.
    assert row["merged"] == row["direct"]
    # lgK=12 HLL relative standard error ~1.04/sqrt(2^12) = 1.6%; allow 5%.
    assert abs(row["merged"] - row["exact"]) <= max(0.05 * row["exact"], 2)


def test_hll_rollup_rows(spark, sf_dir):
    from nyc_taxi_lakehouse_spark.registry import all_queries

    df = all_queries()["q_hll_rollup"].fn(spark, sf_dir)
    pdf = df.toPandas()
    assert len(pdf) >= 1
    # Per-day estimates stay within 5% of the exact per-day distincts.
    assert (pdf["abs_err"] <= (pdf["exact_users"] * 0.05).clip(lower=2)).all()


def test_snapshot_diff_across_schema_evolution(spark, tmp_path):
    """A column added between the two snapshots must neither crash the diff
    (old side lacks the column) nor produce spurious updates for untouched
    rows (old rows align to NULL on both sides)."""
    from pyspark.sql import functions as F

    from nyc_taxi_lakehouse_spark.operators.cdf import snapshot_diff
    from nyc_taxi_lakehouse_spark.versioned import VersionedLakeTable

    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "v"])
    table = VersionedLakeTable(spark, str(tmp_path / "t"))
    table.append(base)
    evolved = spark.createDataFrame([(3, 30.0, "a")], ["k", "v", "tag"])
    table.append(evolved, merge_schema=True)

    feed = snapshot_diff(table, ["k"], 1, 2).collect()
    assert {(r["k"], r["change_type"], r["tag"]) for r in feed} == {
        (3, "insert", "a")
    }


def test_snapshot_changes_images(spark, tmp_path):
    """table_changes format: updates emit pre+post images, deletes carry
    their pre-image; applying signed deltas reproduces the new aggregate."""
    from pyspark.sql import functions as F

    from nyc_taxi_lakehouse_spark.operators.cdf import snapshot_changes
    from nyc_taxi_lakehouse_spark.versioned import VersionedLakeTable

    df = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], ["k", "v"])
    table = VersionedLakeTable(spark, str(tmp_path / "t"))
    table.append(df)
    batch = (
        spark.createDataFrame([(2, 99.0, False), (3, 0.0, True), (4, 5.0, False)],
                              ["k", "v", "__del"])
    )
    table.merge_upsert(batch, keys=["k"], delete_col="__del")
    feed = snapshot_changes(table, ["k"], 1, 2)
    rows = {(r["k"], r["change_type"], r["v"]) for r in feed.collect()}
    assert rows == {
        (2, "update_preimage", 20.0),
        (2, "update_postimage", 99.0),
        (3, "delete", 30.0),
        (4, "insert", 5.0),
    }
    # Signed-delta replay: sum(v1) + post - pre == sum(v2).
    sign = F.when(
        F.col("change_type").isin("insert", "update_postimage"), F.lit(1.0)
    ).otherwise(F.lit(-1.0))
    delta = feed.select((F.col("v") * sign).alias("d")).agg(F.sum("d")).collect()[0][0]
    s1 = table.read(1).agg(F.sum("v")).collect()[0][0]
    s2 = table.read(2).agg(F.sum("v")).collect()[0][0]
    assert s1 + delta == s2


def test_cms_merge_and_never_undercounts(spark, sf_dir):
    """Count-Min invariants: (1) sketches over disjoint halves merge by
    cell-wise addition into EXACTLY the global sketch; (2) estimates never
    undercount any key; (3) overshoot respects the 2N/w bound for most keys."""
    from nyc_taxi_lakehouse_spark.operators.frequency import (
        _CMS_W,
        cms_grid_sql,
        cms_seeds_sql,
    )
    from nyc_taxi_lakehouse_spark.functions.detsql import SPARK
    from nyc_taxi_lakehouse_spark.sources.tables import load_tables

    load_tables(spark, sf_dir, ["lineitem"])
    spark.sql("SELECT * FROM lineitem WHERE l_orderkey % 2 = 0").createOrReplaceTempView("li_even")
    spark.sql("SELECT * FROM lineitem WHERE l_orderkey % 2 = 1").createOrReplaceTempView("li_odd")

    def grid(src):
        q = f"WITH seeds AS ({cms_seeds_sql(SPARK)}), g AS ({cms_grid_sql(SPARK, src, 'l_partkey')}) SELECT * FROM g"
        return {(r.seed, r.cell): r.cnt for r in spark.sql(q).collect()}

    full, even, odd = grid("lineitem"), grid("li_even"), grid("li_odd")
    merged = {}
    for g in (even, odd):
        for k, v in g.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == full

    # Never-undercount + error bound over ALL keys (not just the top-10).
    exact = {
        r.key: r.cnt
        for r in spark.sql(
            "SELECT l_partkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY 1"
        ).collect()
    }
    n_total = sum(exact.values())
    bound = 2 * n_total / _CMS_W
    import hashlib

    def est(key):
        vals = []
        for seed in range(4):
            h = int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:8], 16)
            vals.append(full.get((seed, h % _CMS_W), 0))
        return min(vals)

    over_bound = 0
    for key, cnt in exact.items():
        e = est(key)
        assert e >= cnt, (key, e, cnt)
        if e - cnt > bound:
            over_bound += 1
    # P(over bound) <= 2^-d = 1/16 per key; allow 2x slack.
    assert over_bound <= len(exact) / 8, over_bound


def test_kmv_merge_equals_sketch_of_union():
    """KMV mergeability: the k smallest of (sketch_A ∪ sketch_B) equal the
    k smallest of (A ∪ B) — merging sketches loses nothing. (Holds because
    any of the union's k smallest hashes is within the k smallest of the
    side it came from.) Verified directly on the real cohort hashes, plus
    the estimator error bound at k=128."""
    import duckdb

    from nyc_taxi_lakehouse_spark.functions.detsql import DUCK
    from nyc_taxi_lakehouse_spark.operators.frequency import _KMV_K

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM"
        " '/root/testdata/sf0.01/orders.parquet'"
    )
    h = DUCK.md5_int32(DUCK.to_str("o_custkey"))
    rows = con.execute(f"""
        WITH hashed AS (
          SELECT period, h FROM (
            SELECT CASE WHEN o_orderdate < TIMESTAMP '1997-01-01' THEN 'a'
                        WHEN o_orderdate >= TIMESTAMP '1999-01-01' THEN 'b'
                   END AS period, {h} AS h
            FROM orders) s WHERE period IS NOT NULL GROUP BY period, h)
        SELECT period, h FROM hashed
    """).fetchall()
    a = sorted({r[1] for r in rows if r[0] == "a"})
    b = sorted({r[1] for r in rows if r[0] == "b"})
    k = _KMV_K
    sk_a, sk_b = a[:k], b[:k]
    merged = sorted(set(sk_a) | set(sk_b))[:k]
    direct = sorted(set(a) | set(b))[:k]
    assert merged == direct

    # estimator sanity: (k-1)*H/h_k within 25% of truth at k=128
    H = 4294967295
    est = (k - 1) * H // direct[k - 1]
    truth = len(set(a) | set(b))
    assert abs(est - truth) / truth < 0.25
