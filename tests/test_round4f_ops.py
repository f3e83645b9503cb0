"""Behavioral tests for the round-4f operators: Good-Turing/Chao1 unseen
vocabulary, capture-recapture population estimation, and the
Cochran-Mantel-Haenszel stratified test — each pinned against an
independent python serial reference (the parity gate shares SQL text
across engines and cannot see formula-level bugs).
"""

from __future__ import annotations

import duckdb

from .conftest import SF_SMOKE


def _duck(sf_dir: str, tables=("events",)):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_unseen_vocab_vs_python(spark):
    """Serial count-of-counts over 8-grams extracted with plain python
    slicing; estimators recomputed with float division."""
    from collections import Counter

    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_unseen_vocab"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("documents",))
    texts = [r[0] for r in con.execute("SELECT text FROM documents").fetchall()]
    cnt: Counter = Counter()
    for txt in texts:
        if len(txt) >= 8:
            for i in range(len(txt) - 7):
                cnt[txt[i : i + 8]] += 1
    coc: Counter = Counter()
    tok_by_r: Counter = Counter()
    for c in cnt.values():
        r = c if c <= 10 else 11
        coc[r] += 1
        tok_by_r[r] += c
    s_obs = len(cnt)
    n_total = sum(cnt.values())
    n1, n2 = coc.get(1, 0), coc.get(2, 0)
    p0 = n1 / n_total
    chao1 = s_obs + n1 * (n1 - 1) / (2 * (n2 + 1))
    rows = {r.r: r for r in got}
    assert set(rows) == set(coc)
    for r, row in rows.items():
        assert row.n_types == coc[r]
        assert row.n_tokens == tok_by_r[r]
        assert row.s_obs == s_obs and row.n_total == n_total
        assert (row.hapax_types, row.dis_types) == (n1, n2)
        assert abs(row.gt_unseen_ppm / 1e6 - p0) < 2e-6
        assert row.coverage_ppm == 1_000_000 - row.gt_unseen_ppm
        assert abs(row.chao1_types - chao1) <= 1.0
    # the tail must be non-degenerate: hapax and doubletons both present
    assert n1 > 0 and n2 > 0 and s_obs > 100


def test_capture_recapture_vs_python(spark):
    """Serial two-window capture flags per user; Chapman/Lincoln algebra
    in exact python ints (all operands nonnegative, so python's floor
    // equals the engines' truncating DIV)."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_capture_recapture"].fn(spark, SF_SMOKE).first()
    con = _duck(SF_SMOKE)
    rows = con.execute(
        "SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) FROM events"
    ).fetchall()
    per_user: dict[int, list] = {}
    for uid, es in rows:
        s = per_user.setdefault(uid, [es, es])
        s[0] = min(s[0], es)
        s[1] = max(s[1], es)
    lo = min(v[0] for v in per_user.values())
    hi = max(v[1] for v in per_user.values())
    mid = lo + (hi - lo) // 2
    m = sum(1 for v in per_user.values() if v[0] < mid)
    c = sum(1 for v in per_user.values() if v[1] >= mid)
    r = sum(1 for v in per_user.values() if v[0] < mid and v[1] >= mid)
    n = len(per_user)
    assert (got.caught_1, got.caught_2, got.recaptured, got.true_n) == (m, c, r, n)
    assert got.chapman_n == (m + 1) * (c + 1) // (r + 1) - 1
    assert got.lincoln_n == (m * c // r if r else None)
    assert got.chapman_var == (m + 1) * (c + 1) * (m - r) * (c - r) // (
        (r + 1) * (r + 1) * (r + 2)
    )
    assert abs(got.chapman_d - ((m + 1) * (c + 1) / (r + 1) - 1)) < 1e-9
    # the estimator must be in the right ballpark of the known truth
    # (each user's activity spans most of the window on this data, so
    # both captures are near-complete and Chapman lands close to n)
    assert 0 < got.chapman_n <= 2 * n
    assert r > 0


def test_cmh_vs_python(spark):
    """Serial CMH: 2x2 tables per activity band from raw event scans,
    E/V/OR with float arithmetic; ppm columns within quantization."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_cmh"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE)
    df = con.execute(
        "SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es"
        " FROM events"
    ).df()
    tables: dict[int, list] = {}
    for uid, g in df.groupby("user_id"):
        first_h = int(g.es.min()) // 3600
        purch = g[g.event_type == "purchase"].es
        conv_h = int(purch.min()) // 3600 if len(purch) else None
        err = g[g.event_type == "error"].es
        exposed = 1 if len(err) and int(err.min()) == int(g.es.min()) else 0
        y = 1 if conv_h is not None and conv_h - first_h <= 48 else 0
        band = 0 if len(g) < 60 else (1 if len(g) < 70 else 2)
        t = tables.setdefault(band, [0, 0, 0, 0])  # a b c d
        t[(1 - exposed) * 2 + (1 - y)] += 1
    sum_ame = sum_v = orn = ord_ = 0.0
    by_band = {r.band: r for r in got}
    assert set(by_band) == set(tables)
    for band, (a, b, c, d) in tables.items():
        row = by_band[band]
        assert (row.a, row.b, row.c, row.d) == (a, b, c, d)
        n1, n0, m1, m0 = a + b, c + d, a + c, b + d
        nk = n1 + n0
        assert (row.n1k, row.n0k, row.m1k, row.m0k, row.nk) == (n1, n0, m1, m0, nk)
        e = n1 * m1 / nk
        v = n1 * n0 * m1 * m0 / (nk * nk * (nk - 1))
        assert abs(row.e_a_ppm / 1e6 - e) < m1 / 1e6 + 1e-9
        assert abs(row.v_a_ppm / 1e6 - v) < m0 / 1e6 + 1e-9
        sum_ame += a - e
        sum_v += v
        orn += a * d / nk
        ord_ += b * c / nk
    r0 = got[0]
    assert abs(r0.sum_a_minus_e_ppm / 1e6 - sum_ame) < 0.01
    assert abs(r0.sum_var_ppm / 1e6 - sum_v) < 0.01
    cmh = (abs(sum_ame) - 0.5) ** 2 / sum_v
    assert abs(r0.cmh_stat - cmh) < 0.05
    assert abs(r0.or_mh - orn / ord_) < 0.01
    # the design must be non-degenerate at the MARGIN level (individual
    # cells can be empty at the 15-user smoke SF): both exposure arms and
    # both outcome arms populated overall, and the variance positive
    assert sum(t[0] + t[1] for t in tables.values()) > 0  # exposed
    assert sum(t[2] + t[3] for t in tables.values()) > 0  # unexposed
    assert sum(t[0] + t[2] for t in tables.values()) > 0  # converted
    assert sum(t[1] + t[3] for t in tables.values()) > 0  # not converted
    assert sum_v > 0


def test_ipf_raking_vs_python(spark):
    """Serial IPF with float arithmetic: the query's ppb integer path must
    track the float fixpoint within quantization, marginals must rake to
    uniform, and total mass must be conserved."""
    from collections import Counter

    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_ipf_raking"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("documents",))
    cnt = Counter(
        dict(
            ((la, so), c)
            for la, so, c in con.execute(
                "SELECT lang, source, count(*) FROM documents GROUP BY 1, 2"
            ).fetchall()
        )
    )
    n_tot = sum(cnt.values())
    langs = sorted({la for la, _ in cnt})
    sources = sorted({so for _, so in cnt})
    p = {k: v / n_tot for k, v in cnt.items()}
    for _ in range(6):
        for axis, keys in ((0, langs), (1, sources)):
            target = 1.0 / len(keys)
            sums = Counter()
            for k, v in p.items():
                sums[k[axis]] += v
            p = {k: v * target / sums[k[axis]] for k, v in p.items()}
    rows = {(r.lang, r.source): r for r in got}
    assert set(rows) == set(cnt)
    for k, r in rows.items():
        assert r.n == cnt[k]
        assert r.share0_ppb == cnt[k] * 1_000_000_000 // n_tot
        # integer path tracks the float fixpoint (quantization + the
        # slightly different per-step normalization leave ~1e-4 slack)
        assert abs(r.share_ppb / 1e9 - p[k]) < 2e-4
        assert r.rake_w_ppm == r.share_ppb * 1_000_000 // r.share0_ppb
        # raked marginals within 0.1% of uniform
        assert abs(r.lang_gap_ppm) < 1000
        assert abs(r.source_gap_ppm) < 1000
    # mass conservation: shares still sum to ~1
    assert abs(sum(r.share_ppb for r in got) - 1_000_000_000) < len(got) * 20
    # the raking must actually DO something (non-uniform input mixture)
    assert any(abs(r.rake_w_ppm - 1_000_000) > 50_000 for r in got)


def test_shapley_attribution_vs_python(spark):
    """Serial Shapley by brute force over all 4! channel orderings — the
    definitional average-of-marginals, fully independent of the query's
    coalition-lattice algebra."""
    from itertools import permutations

    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = {r.channel: r for r in
           all_queries()["q_shapley_attribution"].fn(spark, SF_SMOKE).collect()}
    con = _duck(SF_SMOKE)
    rows = con.execute(
        "SELECT user_id, event_type, epoch_ns(ts) // 1000 FROM events"
    ).fetchall()
    by_user: dict[int, list] = {}
    for uid, et, us in rows:
        by_user.setdefault(uid, []).append((us, et))
    bits = {"click": 1, "view": 2, "signup": 4, "error": 8}
    conv: dict[int, int] = {}
    for evs in by_user.values():
        p = min((us for us, et in evs if et == "purchase"), default=None)
        if p is None:
            continue
        mask = 0
        for us, et in evs:
            if us < p and et in bits:
                mask |= bits[et]
        conv[mask] = conv.get(mask, 0) + 1

    def v(s: int) -> int:
        return sum(c for m, c in conv.items() if (m & s) == m)

    phi = {ch: 0.0 for ch in bits}
    for perm in permutations(bits):
        s = 0
        for ch in perm:
            phi[ch] += v(s | bits[ch]) - v(s)
            s |= bits[ch]
    for ch, bit in bits.items():
        r = got[ch]
        # phi_x24 is the exact 24-fold sum the permutation average makes
        assert r.phi_x24 == round(phi[ch])
        assert abs(r.phi - phi[ch] / 24.0) < 1e-12
    assert got["click"].v_full == v(15) and got["click"].v_empty == v(0)
    # efficiency: credits sum exactly to the attributable conversions
    assert sum(r.phi_x24 for r in got.values()) == 24 * (v(15) - v(0))
    assert v(15) > v(0) >= 0


def test_mediation_vs_python(spark):
    """Serial Baron-Kenny: per-user (x, m, y) built row-by-row, all three
    OLS fits recomputed with float normal equations, exact moment columns
    compared as integers."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_mediation"].fn(spark, SF_SMOKE).first()
    con = _duck(SF_SMOKE)
    df = con.execute(
        "SELECT user_id, event_type FROM events"
    ).df()
    xs, ms, ys = [], [], []
    for _, g in df.groupby("user_id"):
        xs.append(len(g))
        ms.append(int((g.event_type == "error").sum()))
        ys.append(int((g.event_type == "purchase").sum()))
    n = len(xs)
    sx, sm_, sy = sum(xs), sum(ms), sum(ys)
    sxx = sum(v * v for v in xs)
    sxm = sum(a * b for a, b in zip(xs, ms))
    sxy = sum(a * b for a, b in zip(xs, ys))
    smm = sum(v * v for v in ms)
    smy = sum(a * b for a, b in zip(ms, ys))
    cxx, cxm, cxy = n * sxx - sx * sx, n * sxm - sx * sm_, n * sxy - sx * sy
    cmm, cmy = n * smm - sm_ * sm_, n * smy - sm_ * sy
    assert (got.n, got.sx, got.sm, got.sy) == (n, sx, sm_, sy)
    assert (got.cxx, got.cxm, got.cxy, got.cmm, got.cmy) == (
        cxx, cxm, cxy, cmm, cmy,
    )
    a = cxm / cxx
    c = cxy / cxx
    det = float(cxx) * float(cmm) - float(cxm) * float(cxm)
    b = (cmy * cxx - cxy * cxm) / det
    cp = (cxy * cmm - cmy * cxm) / det
    assert abs(got.path_a - a) < 1e-12
    assert abs(got.total_c - c) < 1e-12
    assert abs(got.path_b - b) < 1e-9
    assert abs(got.direct_c_prime - cp) < 1e-9
    assert abs(got.indirect_ab - a * b) < 1e-9
    assert abs(got.prop_mediated - a * b / c) < 1e-9
    # decomposition identity: c = c' + a*b (exact property of OLS)
    assert abs(got.total_c - (got.direct_c_prime + got.indirect_ab)) < 1e-9
