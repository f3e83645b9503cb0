"""Behavioral tests for the round-4d operators: NDCG@10, the two-group
log-rank test, and Cohen's kappa.

The oracle-parity suite pins each query hash-exact against DuckDB at two
SFs — but both engines execute the SAME SQL formula, so a formula-level
bug would pass both. These tests pin the SEMANTICS against independent
serial references (python floats with REAL log2 for NDCG's discounts,
pandas group algebra for survival and agreement), per the SURVEY.md §5
differential-testing strategy.
"""

from __future__ import annotations

import math

import duckdb

from .conftest import SF_SMOKE


def _duck(sf_dir: str, tables=("events",)):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_ndcg_vs_float_log2(spark):
    """Serial NDCG@10 with math.log2 discounts (the query uses 1e12
    fixed-point literals — the reference uses the real transcendental,
    so agreement within 1e-9 proves the literal table is right)."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_ndcg"].fn(spark, SF_SMOKE).first()
    con = _duck(SF_SMOKE, ("orders", "lineitem"))
    rows = con.execute(
        """
        SELECT DISTINCT l.l_orderkey, l.l_partkey,
               CAST(floor(epoch(o.o_orderdate)) AS BIGINT) // 86400 AS day_no
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        """
    ).fetchall()
    days = [r[2] for r in rows]
    lo, hi = min(days), max(days)
    split = lo + (hi - lo) * 8 // 10
    train_counts: dict[int, int] = {}
    baskets: dict[int, set[int]] = {}
    for okey, pkey, day in rows:
        if day < split:
            train_counts[pkey] = train_counts.get(pkey, 0) + 1
        else:
            baskets.setdefault(okey, set()).add(pkey)
    top10 = sorted(train_counts, key=lambda p: (-train_counts[p], p))[:10]
    disc = [1.0 / math.log2(i + 2) for i in range(10)]
    sum_dcg = sum_idcg = 0.0
    hits1 = hits5 = hits10 = 0
    for items in baskets.values():
        m = min(len(items), 10)
        sum_idcg += sum(disc[:m])
        ranks = [i for i, p in enumerate(top10) if p in items]
        sum_dcg += sum(disc[i] for i in ranks)
        if ranks:
            hits10 += 1
            if min(ranks) == 0:
                hits1 += 1
            if min(ranks) <= 4:
                hits5 += 1
    assert got.n_baskets == len(baskets)
    assert (got.hits_at_1, got.hits_at_5, got.hits_at_10) == (hits1, hits5, hits10)
    assert abs(got.micro_ndcg - sum_dcg / sum_idcg) < 1e-9
    # fixed-point sums reproduce the float sums at 1e12 resolution
    assert abs(got.sum_dcg_fp / 1e12 - sum_dcg) < 1e-6
    assert abs(got.sum_idcg_fp / 1e12 - sum_idcg) < 1e-6
    assert 0.0 < got.micro_ndcg <= 1.0
    assert 0 < got.macro_ndcg_ppm <= 1_000_000


def test_logrank_vs_pandas(spark):
    """Serial log-rank over the same lives table built row-by-row in
    python: exact integer columns must match exactly; the per-row E/V
    terms are IEEE trees the reference recomputes with float division."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_logrank"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE)
    df = con.execute(
        "SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es"
        " FROM events"
    ).df()
    lives = []
    for uid, g in df.groupby("user_id"):
        first_h = int(g.es.min()) // 3600
        purch = g[g.event_type == "purchase"].es
        conv_h = int(purch.min()) // 3600 if len(purch) else None
        err = g[g.event_type == "error"].es
        # group = user's FIRST event (epoch-second grain) was an error
        grp = 1 if len(err) and int(err.min()) == int(g.es.min()) else 0
        if conv_h is not None and conv_h - first_h <= 48:
            lives.append((grp, conv_h - first_h, 1))
        else:
            lives.append((grp, 48, 0))
    times = sorted({t for _, t, _ in lives})
    rows = {}
    for t in times:
        d1 = sum(1 for g, tt, dd in lives if g == 1 and tt == t and dd)
        d0 = sum(1 for g, tt, dd in lives if g == 0 and tt == t and dd)
        n1 = sum(1 for g, tt, _ in lives if g == 1 and tt >= t)
        n0 = sum(1 for g, tt, _ in lives if g == 0 and tt >= t)
        if d1 + d0 > 0:
            rows[t] = (d1, d0, n1, n0)
    assert len(got) == len(rows)
    cum_o1 = cum_e1 = cum_v = 0
    for r in got:
        d1, d0, n1, n0 = rows[r.t]
        assert (r.d1, r.d0, r.n1, r.n0) == (d1, d0, n1, n0)
        dd, n = d1 + d0, n1 + n0
        assert abs(r.e1_t - dd * n1 / n) < 1e-9
        if n > 1:
            assert abs(r.v_t - dd * (n1 / n) * (1 - n1 / n) * (n - dd) / (n - 1)) < 1e-9
        cum_o1 += d1
        cum_e1 += dd * n1 * 1000000 // n
        t1 = n1 * 1000000 // n
        t2 = t1 * (n - n1) // n
        if n > 1:
            cum_v += dd * t2 * (n - dd) // (n - 1)
        assert r.cum_o1 == cum_o1
        assert r.cum_e1_ppm == cum_e1
        assert r.cum_v_ppm == cum_v
    # the final z-statistic ingredients must be sane: E1 total within the
    # death total, variance positive when both groups are populated
    last = got[-1]
    assert 0 < last.cum_e1_ppm < 1_000_000 * (last.cum_o1 + sum(r.d0 for r in got))
    assert last.cum_v_ppm > 0


def test_cohens_kappa_vs_pandas(spark):
    """Serial kappa from a python confusion matrix; integer cells exact,
    both kappas within 1e-12, and the weighted variant must credit the
    near-diagonal mass (k_w >= k for these ordinal raters unless
    disagreement is all far-off-diagonal)."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_cohens_kappa"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("documents",))
    df = con.execute("SELECT text, n_chars FROM documents").df()
    from collections import Counter

    cells: Counter = Counter()
    for text, n_chars in df.itertuples(index=False):
        tok = len(text.split(" "))
        a = 0 if tok < 40 else (2 if tok > 70 else 1)
        b = 0 if n_chars < 220 else (2 if n_chars > 385 else 1)
        cells[(a, b)] += 1
    n = sum(cells.values())
    agree = sum(v for (a, b), v in cells.items() if a == b)
    r = Counter()
    c = Counter()
    for (a, b), v in cells.items():
        r[a] += v
        c[b] += v
    chance = sum(r[i] * c[i] for i in range(3))
    kappa = (n * agree - chance) / (n * n - chance)
    wdis = sum(abs(a - b) * v for (a, b), v in cells.items())
    wchance = sum(abs(i - j) * r[i] * c[j] for i in range(3) for j in range(3))
    kappa_w = 1.0 - n * wdis / wchance
    got_cells = {(row.class_a, row.class_b): row for row in got}
    assert set(got_cells) == set(cells)
    for key, row in got_cells.items():
        assert row.n_docs == cells[key]
        assert row.row_total == r[key[0]]
        assert row.col_total == c[key[1]]
        assert row.n == n and row.n_agree == agree
        assert abs(row.kappa - kappa) < 1e-12
        assert abs(row.kappa_weighted - kappa_w) < 1e-12
    # both raters must actually disagree somewhere (otherwise the test
    # is vacuous) and kappa must show real, non-perfect agreement
    assert 0 < agree < n
    assert -1.0 < kappa < 1.0
