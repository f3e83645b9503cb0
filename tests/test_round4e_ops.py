"""Behavioral tests for the round-4e operators: CEM ATT, IPS/SNIPS
off-policy evaluation, and the delete-one-day jackknife.

The oracle-parity suite pins each query hash-exact against DuckDB at two
SFs — but both engines execute the SAME SQL text, so a formula-level bug
passes both (this very batch shipped a DIV-precedence bug the parity
gate could not see). These tests pin the SEMANTICS against independent
serial references built in python from the statistical definitions.
"""

from __future__ import annotations

import duckdb

from .conftest import SF_SMOKE


def _duck(sf_dir: str, tables=("events",)):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_cem_att_vs_pandas(spark):
    """Serial CEM: strata built row-by-row, ATT as the float weighted
    difference of stratum means — the query's centi-cent integer path
    must agree to quantization (<=125 strata x 1 cc staged floor)."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_cem_att"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("customer", "orders"))
    spend = dict(
        con.execute(
            "SELECT o_custkey, CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))"
            " AS BIGINT) FROM orders GROUP BY 1"
        ).fetchall()
    )
    strata: dict[tuple, list] = {}
    for ck, nat, bal, seg in con.execute(
        "SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment FROM customer"
    ).fetchall():
        t = 1 if seg == "BUILDING" else 0
        band = 0 if bal < 0 else (1 if bal < 2500 else (2 if bal < 5000 else (3 if bal < 7500 else 4)))
        s = strata.setdefault((nat, band), [0, 0, 0, 0])  # n1 n0 y1 y0
        s[t == 0] += 1
        s[2 + (t == 0)] += spend.get(ck, 0)
    matched = {k: v for k, v in strata.items() if v[0] > 0 and v[1] > 0}
    got_rows = {(r.nation, r.bal_band): r for r in got}
    assert set(got_rows) == set(matched)
    att_num_f = att_den = 0.0
    for k, (n1, n0, y1, y0) in matched.items():
        r = got_rows[k]
        assert (r.n_treated, r.n_control) == (n1, n0)
        assert (r.y_treated_cents, r.y_control_cents) == (y1, y0)
        # stratum mean diff: integer centi-cents vs float, within 2 cc
        assert abs(r.stratum_diff_cc / 100.0 - (y1 / n1 - y0 / n0)) < 0.02
        att_num_f += n1 * (y1 / n1 - y0 / n0)
        att_den += n1
    att_f = att_num_f / att_den
    r0 = got[0]
    assert r0.n_treated_matched == int(att_den)
    # query ATT (cents, double) vs serial float ATT: staged-floor
    # quantization is <=1 cc per stratum -> < n_strata cc total / n1
    assert abs(r0.att_cents - att_f) < 0.02
    # the integer numerator reproduces the double exactly
    assert abs(r0.att_num_cc / (100.0 * r0.n_treated_matched) - r0.att_cents) < 1e-9
    # real effect direction must be consistent between int and float paths
    assert (r0.att_num_cc > 0) == (att_f > 0) or abs(att_f) < 1.0


def test_ips_eval_vs_python(spark):
    """Serial IPS/SNIPS with real float importance weights: rewards from a
    per-user sorted scan at microsecond grain, mu from empirical band
    frequencies, pi uniform over the 5 actions."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_ips_eval"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE)
    rows = con.execute(
        "SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us, event_id"
        " FROM events ORDER BY user_id, us, event_id"
    ).fetchall()
    by_user: dict[int, list] = {}
    for uid, a, us, eid in rows:
        by_user.setdefault(uid, []).append((us, eid, a))
    cells: dict[tuple, list] = {}
    for uid, evs in by_user.items():
        band = 0 if len(evs) < 60 else (1 if len(evs) < 70 else 2)
        purchase_us = sorted(us for us, _, a in evs if a == "purchase")
        import bisect

        for i, (us, eid, a) in enumerate(evs):
            # next purchase strictly after this row in the total order
            nxt = None
            for us2, eid2, a2 in evs[i + 1:]:
                if a2 == "purchase":
                    nxt = us2
                    break
            r = 1 if nxt is not None and nxt <= us + 3_600_000_000 else 0
            c = cells.setdefault((a, band), [0, 0])
            c[0] += 1
            c[1] += r
    n_band = {}
    for (a, band), (n_ab, _) in cells.items():
        n_band[band] = n_band.get(band, 0) + n_ab
    n_total = sum(n_band.values())
    ips = snips_num = snips_den = 0.0
    for (a, band), (n_ab, r_ab) in cells.items():
        w = n_band[band] / (5.0 * n_ab)
        ips += r_ab * w
        snips_num += r_ab * w
        snips_den += n_ab * w
    v_ips = ips / n_total
    v_snips = snips_num / snips_den
    got_cells = {(r.action, r.band): r for r in got}
    assert set(got_cells) == set(cells)
    for key, r in got_cells.items():
        n_ab, r_ab = cells[key]
        assert (r.n_ab, r.r_ab) == (n_ab, r_ab)
        assert r.n_band == n_band[key[1]]
        assert abs(r.w_ppm / 1e6 - n_band[key[1]] / (5.0 * n_ab)) < 1e-5
    r0 = got[0]
    assert r0.n_total == n_total
    assert abs(r0.v_ips_ppm / 1e6 - v_ips) < 1e-4
    assert abs(r0.v_snips_ppm / 1e6 - v_snips) < 1e-4
    assert abs(r0.v_logged - sum(c[1] for c in cells.values()) / n_total) < 1e-12
    # the banding must be non-degenerate (>=2 bands populated) and some
    # rewards must exist, else the whole evaluation is vacuous
    assert len({b for _, b in cells}) >= 2
    assert sum(c[1] for c in cells.values()) > 0


def test_jackknife_vs_python(spark):
    """Serial jackknife: exact-integer mirror (python ints are arbitrary
    precision with true floor division — independent of the SQL text)
    plus a float cross-check of the variance/bias formulas."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_jackknife"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("orders",))
    days = con.execute(
        "SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS d,"
        " CAST(COUNT(*) AS BIGINT), CAST(SUM(CAST(round(o_totalprice*100)"
        " AS BIGINT)) AS BIGINT) FROM orders GROUP BY 1 ORDER BY 1"
    ).fetchall()
    S = sum(r[2] for r in days)
    N = sum(r[1] for r in days)
    nd = len(days)
    assert len(got) == nd
    full_cc = S * 100 // N
    loo = {d: (S - rev) * 100 // (N - n) for d, n, rev in days}
    mean_cc = sum(loo.values()) // nd
    ss = sum((v - mean_cc) ** 2 for v in loo.values())
    for r in got:
        assert r.full_cc == full_cc
        assert r.loo_cc == loo[r.day_no]
        assert r.n_days == nd
        assert r.loo_mean_cc == mean_cc
        assert r.ss_cc2 == ss
        assert r.pseudo_cc == nd * full_cc - (nd - 1) * loo[r.day_no]
        assert r.jack_bias_cc == (nd - 1) * (mean_cc - full_cc)
        assert abs(r.jack_var_cc2 - (nd - 1) * ss / nd) < 1e-6
    # float cross-check: the true (unquantized) jackknife variance of the
    # ratio must be within the cc-quantization envelope of the query's
    loo_f = [(S - rev) * 100 / (N - n) for _, n, rev in days]
    mean_f = sum(loo_f) / nd
    var_f = (nd - 1) / nd * sum((v - mean_f) ** 2 for v in loo_f)
    got_var = got[0].jack_var_cc2
    # quantization moves each loo by <1 cc -> SS moves by O(n * dev)
    assert abs(got_var - var_f) < nd * (2 * max(abs(v - mean_f) for v in loo_f) + 1)
    # sanity: the full-sample ratio sits inside the loo range
    assert min(loo_f) <= full_cc + 1 and full_cc - 1 <= max(loo_f)
