"""Behavioral tests for the round-4c operators: commerce indices,
forensic estimators, recommendation/link-prediction, and the SPRT walk.

The oracle-parity suite pins each query hash-exact against DuckDB at two
SFs — but both engines execute the SAME SQL formula, so a formula-level
bug would pass both. These tests pin the SEMANTICS against independent
serial references (numpy / pure-python, different algorithms where
possible), per the SURVEY.md §5 differential-testing strategy.
"""

from __future__ import annotations

import math

import numpy as np

import duckdb

from .conftest import SF_SMOKE


def _duck(sf_dir: str, tables=("events",)):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_trimmed_mean_vs_numpy(spark):
    """Trim/winsorize per event type against a numpy argsort reference:
    drop/clamp k = n//10 per tail on the (value, event_id) order."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = (
        all_queries()["q_trimmed_mean"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("event_type")
    )
    con = _duck(SF_SMOKE)
    df = con.execute(
        "SELECT event_type, value, event_id FROM events "
        "WHERE value IS NOT NULL AND event_id IS NOT NULL"
    ).df()
    for et, g in df.groupby("event_type"):
        v = g.sort_values(["value", "event_id"]).value.to_numpy()
        n = len(v)
        k = n // 10
        trimmed = v[k : n - k]
        wins = np.concatenate([[v[k]] * k, trimmed, [[v[n - k - 1]]* k][0]])
        r = got.loc[et]
        assert r.n == n and r.trimmed_each_side == k
        assert abs(r.mean_raw - v.mean()) < 1e-9
        assert abs(r.mean_trimmed - trimmed.mean()) < 1e-9
        assert abs(r.mean_winsorized - wins.mean()) < 1e-9
        assert r.winsor_lo == v[k] and r.winsor_hi == v[n - k - 1]
        # robustness ordering on a right-skewed positive mix is not
        # guaranteed, but the three must be finite and internally sane
        assert min(r.winsor_lo, v.min()) <= r.mean_trimmed <= max(r.winsor_hi, v.max())


def test_double_pay_vs_serial_reference(spark):
    """Every emitted pair matches a brute serial recomputation over
    per-payer buckets (oriented, gap ≤ 7d), deltas/flags re-derived."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_double_pay"].fn(spark, SF_SMOKE).toPandas()
    con = _duck(SF_SMOKE, tables=("orders",))
    df = con.execute(
        "SELECT o_orderkey AS okey, o_custkey AS ckey, "
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents, "
        "CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day_no "
        "FROM orders WHERE o_totalprice IS NOT NULL"
    ).df()
    expected = {}
    for _, g in df.groupby("ckey"):
        rows = sorted(g.itertuples(index=False), key=lambda r: (r.day_no, r.okey))
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = rows[i], rows[j]
                if b.day_no - a.day_no <= 7:
                    expected[(a.okey, b.okey)] = abs(b.cents - a.cents)
    assert len(got) > 0  # the screen must actually fire on this data
    assert {
        (r.okey_first, r.okey_second): r.cents_delta
        for r in got.itertuples(index=False)
    } == expected
    assert (got.gap_days >= 0).all() and (got.gap_days <= 7).all()
    assert ((got.exact_dup == 1) == (got.cents_delta == 0)).all()


def test_item_cf_vs_serial_cosine(spark):
    """Every (anchor, neighbor) cosine re-derived from raw basket sets in
    pure python; per-anchor ranks descend by cosine with neighbor-id
    tie-break; symmetric pairs agree."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_item_cf"].fn(spark, SF_SMOKE).toPandas()
    con = _duck(SF_SMOKE, tables=("lineitem",))
    df = con.execute(
        "SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem"
    ).df()
    baskets: dict[int, set] = {}
    for r in df.itertuples(index=False):
        baskets.setdefault(r.pkey, set()).add(r.okey)
    assert len(got) > 0
    for r in got.itertuples(index=False):
        co = len(baskets[r.anchor] & baskets[r.neighbor])
        assert co == r.co_orders and co >= 2
        ref = co / math.sqrt(len(baskets[r.anchor]) * len(baskets[r.neighbor]))
        assert abs(r.cosine - ref) < 1e-12
        assert 0 < r.cosine <= 1.0 + 1e-12
    for _, g in got.groupby("anchor"):
        g = g.sort_values("rk")
        assert list(g.rk) == list(range(1, len(g) + 1))
        key = list(zip(-g.cosine, g.neighbor))
        assert key == sorted(key)


def test_link_prediction_vs_serial_ra(spark):
    """Top-50 RA pairs vs a pure-python recomputation: same capped-degree
    common-neighbor walk, decimal-snapped 1/deg terms, same ordering."""
    from decimal import Decimal, ROUND_HALF_UP

    from nyc_taxi_lakehouse_spark.operators.marketing import _RA_DEG_CAP
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_link_prediction"].fn(spark, SF_SMOKE).toPandas()
    con = _duck(SF_SMOKE, tables=("orders", "lineitem"))
    df = con.execute(
        "SELECT DISTINCT o.o_custkey AS ckey, l.l_suppkey AS skey "
        "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey"
    ).df()
    by_cust: dict[int, list] = {}
    for r in df.itertuples(index=False):
        by_cust.setdefault(r.ckey, []).append(r.skey)
    scores: dict[tuple, Decimal] = {}
    commons: dict[tuple, int] = {}
    q = Decimal("1e-12")
    for _, supps in by_cust.items():
        d = len(supps)
        if d > _RA_DEG_CAP:
            continue
        term = (Decimal(1) / Decimal(d)).quantize(q, rounding=ROUND_HALF_UP)
        supps = sorted(supps)
        for i in range(d):
            for j in range(i + 1, d):
                pair = (supps[i], supps[j])
                scores[pair] = scores.get(pair, Decimal(0)) + term
                commons[pair] = commons.get(pair, 0) + 1
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert len(got) == min(50, len(ranked)) and len(got) > 0
    for row, (pair, sc) in zip(got.itertuples(index=False), ranked):
        assert (row.supp_a, row.supp_b) == pair
        assert row.common_rare == commons[pair]
        assert abs(row.ra_score - float(sc)) < 1e-12


def test_sprt_llr_walk_reference(spark):
    """LLR walk re-derived in python with math.log constants; decision day
    is the first boundary crossing; cumulative counts telescope."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_sprt"].fn(spark, SF_SMOKE).toPandas()
    p0, p1, a, b = 0.20, 0.25, 0.05, 0.05
    c1, c2 = math.log(p1 / p0), math.log((1 - p1) / (1 - p0))
    ln_a, ln_b = math.log((1 - b) / a), math.log(b / (1 - a))
    got = got.sort_values("day_no").reset_index(drop=True)
    assert (got.n_day.cumsum() == got.n_cum).all()
    assert (got.s_day.cumsum() == got.s_cum).all()
    llr_ref = got.s_cum * c1 + (got.n_cum - got.s_cum) * c2
    assert (abs(got.llr - llr_ref) < 1e-9).all()
    crossings = got[(llr_ref >= ln_a) | (llr_ref <= ln_b)]
    if len(crossings):
        first = crossings.day_no.iloc[0]
        assert (got.decision_day == first).all()
        state = got.set_index("day_no").loc[first, "state"]
        assert state in ("accept_h0", "accept_h1")
    else:
        assert got.decision_day.isna().all()


def test_lead_time_vs_numpy_disc_percentiles(spark):
    """percentile_disc semantics = smallest order statistic with
    cumulative share >= p, re-derived via numpy sort per month."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = (
        all_queries()["q_lead_time"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("month_no")
    )
    con = _duck(SF_SMOKE, tables=("orders", "lineitem"))
    df = con.execute(
        "SELECT CAST(floor(epoch(o.o_orderdate)) AS BIGINT) // 2592000 AS m, "
        "CAST(floor(epoch(l.l_shipdate)) AS BIGINT) // 86400 "
        "- CAST(floor(epoch(o.o_orderdate)) AS BIGINT) // 86400 AS gap "
        "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey"
    ).df()
    for m, g in df.groupby("m"):
        v = np.sort(g.gap.to_numpy())
        n = len(v)
        r = got.loc[m]
        assert r.n_lines == n
        for p, col in ((0.5, "p50_days"), (0.9, "p90_days"), (0.99, "p99_days")):
            disc = v[int(np.ceil(p * n)) - 1]
            assert r[col] == disc, (m, col)
        assert r.max_days == v[-1]
        assert r.n_over_30d == int((v > 30).sum())


def test_hhi_and_uvi_identities(spark):
    """HHI bounds/identities (1/n ≤ HHI ≤ 1, equivalent competitors =
    1/HHI) plus the index's base-month fixed point (index == 100, basket
    == base cost) and a serial HHI recomputation for one month."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    hhi = all_queries()["q_hhi"].fn(spark, SF_SMOKE).toPandas()
    assert ((hhi.hhi >= 1.0 / hhi.n_suppliers - 1e-12) & (hhi.hhi <= 1.0)).all()
    assert (abs(hhi.equivalent_competitors * hhi.hhi - 1.0) < 1e-9).all()

    con = _duck(SF_SMOKE, tables=("lineitem",))
    month0 = int(hhi.month_no.iloc[0])
    rev = con.execute(
        "SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 0) AS BIGINT) AS r "
        "FROM lineitem "
        "WHERE CAST(floor(epoch(l_shipdate)) AS BIGINT) // 2592000 = ? "
        "GROUP BY l_suppkey",
        [month0],
    ).df().r.to_numpy()
    ref = float((rev.astype(float) ** 2).sum() / rev.astype(float).sum() ** 2)
    assert abs(hhi.hhi.iloc[0] - ref) < 1e-12

    uvi = all_queries()["q_unit_value_index"].fn(spark, SF_SMOKE).toPandas()
    base = uvi.sort_values("month_no").iloc[0]
    assert base.unit_value_index == 100.0
    assert base.basket_cost_dollars == base.base_cost_dollars
    assert (uvi.n_parts >= 1).all()


def test_rec_hitrate_vs_serial_eval(spark):
    """Full serial re-evaluation: train CF neighbors on the first-80%%-of-
    days baskets in pure python (same cosine, same tie-breaks), score the
    holdout, and match every count; hitrates must be monotone in k."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_rec_hitrate"].fn(spark, SF_SMOKE).toPandas().iloc[0]
    con = _duck(SF_SMOKE, tables=("orders", "lineitem"))
    df = con.execute(
        "SELECT DISTINCT l.l_orderkey AS okey, l.l_partkey AS pkey, "
        "CAST(floor(epoch(o.o_orderdate)) AS BIGINT) // 86400 AS day_no "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
    ).df()
    lo, hi = df.day_no.min(), df.day_no.max()
    split = lo + (hi - lo) * 8 // 10
    train = df[df.day_no < split]
    test = df[df.day_no >= split]

    baskets: dict[int, set] = {}
    for r in train.itertuples(index=False):
        baskets.setdefault(r.pkey, set()).add(r.okey)
    by_order: dict[int, set] = {}
    for r in train.itertuples(index=False):
        by_order.setdefault(r.okey, set()).add(r.pkey)
    co: dict[tuple, int] = {}
    for parts in by_order.values():
        ps = sorted(parts)
        for i, x in enumerate(ps):
            for y in ps[i + 1:]:
                co[(x, y)] = co.get((x, y), 0) + 1
    nbrs: dict[int, list] = {}
    for (x, y), c in co.items():
        if c < 2:
            continue
        s = c / math.sqrt(len(baskets[x]) * len(baskets[y]))
        nbrs.setdefault(x, []).append((-s, y))
        nbrs.setdefault(y, []).append((-s, x))
    top5 = {
        a: [p for _, p in sorted(v)[:5]] for a, v in nbrs.items()
    }
    test_orders: dict[int, set] = {}
    for r in test.itertuples(index=False):
        test_orders.setdefault(r.okey, set()).add(r.pkey)
    n_eval = h1 = h3 = h5 = 0
    for _, parts in test_orders.items():
        if len(parts) < 2:
            continue
        for anchor in parts:
            n_eval += 1
            ranked = top5.get(anchor, [])
            best = None
            for i, nb in enumerate(ranked):
                if nb in parts and nb != anchor:
                    best = i + 1
                    break
            if best is not None:
                h1 += best <= 1
                h3 += best <= 3
                h5 += best <= 5
    assert got.n_eval == n_eval and n_eval > 0
    assert (got.hits_at_1, got.hits_at_3, got.hits_at_5) == (h1, h3, h5)
    assert got.hits_at_1 <= got.hits_at_3 <= got.hits_at_5
    assert abs(got.hitrate_at_5 - h5 / n_eval) < 1e-12


def test_ab_srm_chisq_reference(spark):
    """SRM χ² re-derived from raw distinct-unit counts; the (n0−n1)²/n
    reduction must equal the textbook two-cell Pearson form."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_ab_srm"].fn(spark, SF_SMOKE).toPandas()
    con = _duck(SF_SMOKE)
    df = con.execute(
        "SELECT event_type, COUNT(DISTINCT user_id) FILTER (user_id % 2 = 0) AS n0, "
        "COUNT(DISTINCT user_id) FILTER (user_id % 2 = 1) AS n1 "
        "FROM events WHERE user_id IS NOT NULL GROUP BY event_type"
    ).df().set_index("event_type")
    assert len(got) == len(df)
    for r in got.itertuples(index=False):
        n0, n1 = int(df.loc[r.event_type, "n0"]), int(df.loc[r.event_type, "n1"])
        assert (r.users_arm0, r.users_arm1) == (n0, n1)
        n, e = n0 + n1, (n0 + n1) / 2
        pearson = (n0 - e) ** 2 / e + (n1 - e) ** 2 / e
        assert abs(r.srm_chisq - pearson) < 1e-9
        assert r.srm_alarm == (1 if pearson > 10.828 else 0)


def test_control_chart_vs_numpy(spark):
    """XmR limits re-derived with numpy; flags must match the limits; the
    moving-range series must equal abs(diff) of the daily counts."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = (
        all_queries()["q_control_chart"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .sort_values("day_no")
        .reset_index(drop=True)
    )
    x = got.x.to_numpy(dtype=float)
    mr = np.abs(np.diff(x))
    assert got.mrange.iloc[0] is None or np.isnan(got.mrange.iloc[0])
    assert (got.mrange.to_numpy(dtype=float)[1:] == mr).all()
    center = x.mean()
    ucl = center + 2.66 * mr.mean()
    lcl = center - 2.66 * mr.mean()
    assert abs(got.center.iloc[0] - center) < 1e-9
    assert abs(got.ucl.iloc[0] - ucl) < 1e-9
    assert abs(got.lcl.iloc[0] - lcl) < 1e-9
    ref_flags = ((x > ucl) | (x < lcl)).astype(int)
    assert (got.out_of_control.to_numpy() == ref_flags).all()


def test_growth_accounting_identities(spark):
    """Set-algebra identities on real data: new+retained+resurrected =
    actives every month; churned(m) = actives(m-1) - retained(m) for
    interior months; first month is all-new; serial recomputation of one
    interior month's buckets from the raw grid."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = (
        all_queries()["q_growth_accounting"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .sort_values("month_no")
        .reset_index(drop=True)
    )
    assert (got.n_new + got.n_retained + got.n_resurrected == got.n_active).all()
    assert got.n_new.iloc[0] == got.n_active.iloc[0]
    act = got.set_index("month_no")
    for m in got.month_no[1:]:
        if m - 1 in act.index:
            assert act.loc[m, "n_churned"] == (
                act.loc[m - 1, "n_active"] - act.loc[m, "n_retained"]
            )
    con = _duck(SF_SMOKE)
    grid = con.execute(
        "SELECT DISTINCT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 2592000 AS m "
        "FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL"
    ).df()
    by_user: dict[int, list] = {}
    for r in grid.itertuples(index=False):
        by_user.setdefault(r.user_id, []).append(r.m)
    m_mid = int(got.month_no.iloc[len(got) // 2])
    new = ret = res = 0
    for months in by_user.values():
        ms = sorted(months)
        if m_mid not in ms:
            continue
        i = ms.index(m_mid)
        if i == 0:
            new += 1
        elif ms[i - 1] == m_mid - 1:
            ret += 1
        else:
            res += 1
    row = act.loc[m_mid]
    assert (row.n_new, row.n_retained, row.n_resurrected) == (new, ret, res)


def test_abc_analysis_vs_serial(spark):
    """Class boundaries re-derived serially from the exact cent revenue
    ranking; classes partition the parts; shares sum to 1."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_abc_analysis"].fn(spark, SF_SMOKE).toPandas()
    con = _duck(SF_SMOKE, tables=("lineitem",))
    df = con.execute(
        "SELECT l_partkey, CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) "
        "* 100 AS BIGINT)) AS BIGINT) AS cents FROM lineitem GROUP BY l_partkey"
    ).df()
    rows = sorted(df.itertuples(index=False), key=lambda r: (-r.cents, r.l_partkey))
    tot = sum(r.cents for r in rows)
    counts = {"A": 0, "B": 0, "C": 0}
    cents = {"A": 0, "B": 0, "C": 0}
    cum = 0
    for r in rows:
        cum += r.cents
        c = "A" if cum * 100 <= tot * 80 else ("B" if cum * 100 <= tot * 95 else "C")
        counts[c] += 1
        cents[c] += r.cents
    got = got.set_index("abc_class")
    for c in ("A", "B", "C"):
        assert got.loc[c, "n_parts"] == counts[c]
        assert got.loc[c, "revenue_cents"] == cents[c]
    assert abs(got.revenue_share.sum() - 1.0) < 1e-12
    assert got.n_parts.sum() == len(rows)


def test_holt_vs_python_recursion(spark):
    """Full Holt walk re-derived in pure python (floor division on exact
    integer cents); forecast/residual columns are algebraic identities."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = (
        all_queries()["q_holt"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    con = _duck(SF_SMOKE)
    daily = con.execute(
        "SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day, "
        "CAST(SUM(CAST(value AS DECIMAL(28,2))) * 100 AS BIGINT) AS x "
        "FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    l, b = daily[0][1], 0
    ref = [(daily[0][0], daily[0][1], l, b)]
    for day, x in daily[1:]:
        e = x - l - b
        ae = e // 4  # python // floors, matching the SQL sign-CASE
        l, b = l + b + ae, b + ae // 8
        ref.append((day, x, l, b))
    assert len(got) == len(ref)
    for row, (day, x, l, b) in zip(got.itertuples(index=False), ref):
        assert (row.day, row.total_cents, row.level_cents, row.trend_cents) == (
            day, x, l, b,
        )
    assert (got.forecast_next_cents == got.level_cents + got.trend_cents).all()
    assert (got.residual_cents == got.total_cents - got.level_cents).all()


def test_assortativity_vs_numpy_pearson(spark):
    """Assortativity re-derived with numpy corrcoef over the edge-endpoint
    degree pairs; bounds check |r| <= 1."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_assortativity"].fn(spark, SF_SMOKE).toPandas().iloc[0]
    con = _duck(SF_SMOKE, tables=("orders", "lineitem"))
    df = con.execute(
        "SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s "
        "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey"
    ).df()
    dc = df.groupby("c").size()
    ds = df.groupby("s").size()
    x = df.c.map(dc).to_numpy(dtype=float)
    y = df.s.map(ds).to_numpy(dtype=float)
    r = np.corrcoef(x, y)[0, 1]
    assert got.n_edges == len(df)
    assert abs(got.mean_cust_degree - x.mean()) < 1e-9
    assert abs(got.mean_supp_degree - y.mean()) < 1e-9
    assert abs(got.assortativity - r) < 1e-9
    assert abs(got.assortativity) <= 1.0 + 1e-12


def test_fano_factor_vs_numpy(spark):
    """Fano = sample var / mean of daily counts, re-derived with numpy."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = (
        all_queries()["q_fano_factor"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("event_type")
    )
    con = _duck(SF_SMOKE)
    df = con.execute(
        "SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d, "
        "COUNT(*) AS x FROM events GROUP BY 1, 2"
    ).df()
    for et, g in df.groupby("event_type"):
        x = g.x.to_numpy(dtype=float)
        if len(x) < 2:
            assert et not in got.index
            continue
        r = got.loc[et]
        assert r.n_days == len(x)
        assert abs(r.mean_per_day - x.mean()) < 1e-9
        assert abs(r.var_per_day - x.var(ddof=1)) < 1e-9
        assert abs(r.fano_factor - x.var(ddof=1) / x.mean()) < 1e-9
