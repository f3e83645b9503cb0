"""Behavioral tests for the round-4g operators: grid-blocked spatial join,
Moran's I, Croston intermittent demand, the hash-randomized permutation
test, power/MDE sizing, sequential rules, and l-diversity/t-closeness —
each pinned against an independent python serial reference (the parity
gate shares SQL text across engines and cannot see formula-level bugs).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

from .conftest import SF_SMOKE


def _duck(sf_dir: str, tables=("events",)):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _coords(key: int, mx: int, my: int) -> tuple[int, int]:
    return (key * mx) % 65536, (key * my) % 65536


def test_spatial_join_vs_bruteforce(spark):
    """The grid-blocked radius join must equal the O(N*M) brute force on
    the same hash coordinates — blocking is an optimization, never a
    semantics change (cell edge 2048 > radius 2000, so the 3x3
    neighborhood provably covers every within-radius pair)."""
    from nyc_taxi_lakehouse_spark.operators.spatial import (
        _MX_C, _MX_S, _MY_C, _MY_S, _R2,
    )
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_spatial_join"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("customer", "supplier"))
    custs = [r[0] for r in con.execute("SELECT c_custkey FROM customer").fetchall()]
    supps = [r[0] for r in con.execute("SELECT s_suppkey FROM supplier").fetchall()]
    pairs = []
    for ck in custs:
        cx, cy = _coords(ck, _MX_C, _MY_C)
        for sk in supps:
            sx, sy = _coords(sk, _MX_S, _MY_S)
            d2 = (cx - sx) ** 2 + (cy - sy) ** 2
            if d2 <= _R2:
                pairs.append((d2, ck, sk))
    pairs.sort()
    assert len(got) == min(20, len(pairs)) and len(pairs) > 0
    for row, (d2, ck, sk) in zip(got, pairs[:20]):
        assert (row.custkey, row.suppkey, row.dist2) == (ck, sk, d2)
        assert row.n_pairs == len(pairs)


def test_morans_i_vs_python(spark):
    """Moran's I recomputed serially in floats from the cell counts; under
    the hash-uniform layout it must sit near the CSR expectation
    E[I] = -1/(n-1)."""
    from nyc_taxi_lakehouse_spark.operators.spatial import _MX_C, _MY_C
    from nyc_taxi_lakehouse_spark.registry import all_queries

    row = all_queries()["q_morans_i"].fn(spark, SF_SMOKE).collect()[0]
    con = _duck(SF_SMOKE, ("customer",))
    custs = [r[0] for r in con.execute("SELECT c_custkey FROM customer").fetchall()]
    c = Counter()
    for ck in custs:
        x, y = _coords(ck, _MX_C, _MY_C)
        c[(x // 2048, y // 2048)] += 1
    n = 32 * 32
    mean = len(custs) / n
    num = w = 0.0
    for cx in range(32):
        for cy in range(32):
            zi = c.get((cx, cy), 0) - mean
            for nx, ny in ((cx + 1, cy), (cx, cy + 1)):
                if nx < 32 and ny < 32:
                    num += 2 * zi * (c.get((nx, ny), 0) - mean)
                    w += 2
    den = sum((c.get((cx, cy), 0) - mean) ** 2 for cx in range(32) for cy in range(32))
    i_ref = (n / w) * num / den
    assert row.n_cells == n and row.w == int(w)
    assert row.n_pts == len(custs)
    assert abs(row.morans_i - i_ref) < 1e-9
    assert abs(row.expected_i - (-1 / (n - 1))) < 1e-15
    # CSR validation: hash-uniform layout shows no real autocorrelation
    assert abs(row.morans_i - row.expected_i) < 0.1


def test_croston_vs_python(spark):
    """Croston recomputed serially: per part, the last 8 demand days'
    sizes and gaps under the exact 3^j*4^(7-j) weight ladder."""
    from nyc_taxi_lakehouse_spark.operators.windows import (
        _CROSTON_W, _CROSTON_WSUM,
    )
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = {r.partkey: r for r in all_queries()["q_croston"].fn(spark, SF_SMOKE).collect()}
    con = _duck(SF_SMOKE, ("lineitem", "orders"))
    rows = con.execute(
        """
        SELECT l_partkey,
               date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)),
               SUM(CAST(l_quantity AS BIGINT))
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    by_part = defaultdict(list)
    for pk, day, qty in rows:
        by_part[pk].append((day, qty))
    checked = 0
    for pk, series in by_part.items():
        if len(series) < 9:
            assert pk not in got
            continue
        days = [d for d, _ in series]
        gaps = {days[i]: days[i] - days[i - 1] for i in range(1, len(days))}
        recent = series[-8:][::-1]  # most recent first
        z_num = sum(w * q for w, (_, q) in zip(_CROSTON_W, recent))
        p_num = sum(w * gaps[d] for w, (d, _) in zip(_CROSTON_W, recent))
        r = got[pk]
        assert r.n_demand_days == len(series)
        assert r.size_ewma_ppm == z_num * 1_000_000 // _CROSTON_WSUM
        assert r.interval_ewma_ppm == p_num * 1_000_000 // _CROSTON_WSUM
        assert abs(r.croston_rate - z_num / p_num) < 1e-12
        checked += 1
    assert checked > 50


def _md5_int32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_permutation_test_vs_python(spark):
    """The whole randomization distribution recomputed serially from the
    same md5-derived relabeling — p-value, extreme count, and observed
    statistic must match exactly."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    row = all_queries()["q_permutation_test"].fn(spark, SF_SMOKE).collect()[0]
    con = _duck(SF_SMOKE, ("events",))
    per_user = con.execute(
        """
        SELECT user_id,
               CASE WHEN MIN(CASE WHEN event_type = 'error'
                             THEN epoch_ns(ts) END) = MIN(epoch_ns(ts))
                    THEN 1 ELSE 0 END,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        FROM events GROUP BY user_id
        """
    ).fetchall()
    n = len(per_user)
    n1 = sum(g for _, g, _ in per_user)
    n0 = n - n1
    s1 = sum(y for _, g, y in per_user if g)
    s0 = sum(y for _, g, y in per_user if not g)
    assert (row.n_users, row.n1, row.n0, row.s1, row.s0) == (n, n1, n0, s1, s0)
    p1_ppm = n1 * 1_000_000 // n
    obs_cross = abs(s1 * n0 - s0 * n1)
    extreme = 0
    for b in range(128):
        n1r = s1r = s0r = 0
        for uid, _, y in per_user:
            if _md5_int32(f"{uid}:{b}") % 1_000_000 < p1_ppm:
                n1r += 1
                s1r += y
            else:
                s0r += y
        n0r = n - n1r
        if n1r == 0 or n0r == 0:
            extreme += 1
        elif abs(s1r * n0r - s0r * n1r) * (n1 * n0) >= obs_cross * (n1r * n0r):
            extreme += 1
    assert row.n_extreme == extreme
    assert row.p_ppm == (1 + extreme) * 1_000_000 // 129
    assert abs(row.t_obs - (s1 / n1 - s0 / n0)) < 1e-12
    # the test must be non-degenerate: both cohorts populated
    assert n1 >= 5 and n0 >= 5


def test_power_mde_vs_python(spark):
    """MDE / required-n recomputed with numpy-free float arithmetic from
    decimal-snapped values (scale 6, matching dsum)."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = {r.event_type: r for r in all_queries()["q_power_mde"].fn(spark, SF_SMOKE).collect()}
    con = _duck(SF_SMOKE, ("events",))
    rows = con.execute(
        "SELECT event_type, user_id % 2, value FROM events"
    ).fetchall()
    groups = defaultdict(list)
    for et, v, val in rows:
        groups[(et, v)].append(round(val * 1_000_000) / 1_000_000)
    import math

    zs = 1.959963984540054 + 0.8416212335729143
    for et, r in got.items():
        a, b = groups[(et, 0)], groups[(et, 1)]
        va = (len(a) * sum(x * x for x in a) - sum(a) ** 2) / (len(a) * (len(a) - 1))
        vb = (len(b) * sum(x * x for x in b) - sum(b) ** 2) / (len(b) * (len(b) - 1))
        mean_a = sum(a) / len(a)
        mde = zs * math.sqrt(va / len(a) + vb / len(b))
        assert (r.n_a, r.n_b) == (len(a), len(b))
        assert abs(r.var_a - va) < 1e-6 * abs(va)
        assert abs(r.mde_abs - mde) < 1e-7 * mde
        assert abs(r.mde_rel - mde / mean_a) < 1e-7
        n_req = math.ceil(zs * zs * (va + vb) / (0.0001 * mean_a * mean_a))
        assert abs(r.n_per_arm_for_1pct - n_req) <= 1
    assert len(got) == 5


def test_seq_rules_vs_python(spark):
    """Support/confidence/lift recomputed from per-user first-occurrence
    maps; the rule table must cover every ordered pair with support."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = {(r.a_type, r.b_type): r for r in all_queries()["q_seq_rules"].fn(spark, SF_SMOKE).collect()}
    con = _duck(SF_SMOKE, ("events",))
    rows = con.execute(
        "SELECT user_id, event_type, MIN(epoch_ns(ts) // 1000)"
        " FROM events GROUP BY 1, 2"
    ).fetchall()
    firsts = defaultdict(dict)
    for uid, et, t0 in rows:
        firsts[uid][et] = t0
    n_u = len(firsts)
    marg = Counter()
    sup = Counter()
    for uid, m in firsts.items():
        for et in m:
            marg[et] += 1
        for a, ta in m.items():
            for b, tb in m.items():
                if a != b and ta < tb:
                    sup[(a, b)] += 1
    assert set(got) == {k for k, v in sup.items() if v > 0}
    for (a, b), r in got.items():
        assert r.sup == sup[(a, b)]
        assert (r.n_a, r.n_b, r.n_u) == (marg[a], marg[b], n_u)
        assert r.conf_ppm == sup[(a, b)] * 1_000_000 // marg[a]
        assert r.lift_ppm == sup[(a, b)] * n_u * 1_000_000 // (marg[a] * marg[b])
    # ordering is informative: purchases follow views more than precede them
    assert len(got) == 20


def test_l_diversity_vs_python(spark):
    """l and TV distance recomputed from raw (lang, source, band) counts."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = {(r.lang, r.source): r for r in all_queries()["q_l_diversity"].fn(spark, SF_SMOKE).collect()}
    con = _duck(SF_SMOKE, ("documents",))
    rows = con.execute(
        "SELECT lang, source, n_chars // 400, COUNT(*)"
        " FROM documents GROUP BY 1, 2, 3"
    ).fetchall()
    cells = {(la, so, sv): c for la, so, sv, c in rows}
    gdist = Counter()
    for (la, so, sv), c in cells.items():
        gdist[sv] += c
    gn = sum(gdist.values())
    classes = defaultdict(lambda: [0, 0])  # n, l
    for (la, so, sv), c in cells.items():
        classes[(la, so)][0] += c
        classes[(la, so)][1] += 1
    min_l = min(l for _, l in classes.values())
    assert set(got) == set(classes)
    for key, (cn, cl) in classes.items():
        r = got[key]
        assert (r.n, r.l_distinct, r.min_l) == (cn, cl, min_l)
        tv = sum(
            abs(cells.get((key[0], key[1], sv), 0) * 1_000_000 // cn
                - gc * 1_000_000 // gn)
            for sv, gc in gdist.items()
        ) // 2
        assert r.t_closeness_ppm == tv
    assert min_l >= 1 and len(got) > 10


def test_rake_vs_python(spark):
    """Full serial RAKE: stopword segmentation, degree/freq word scores,
    ppm phrase scores — the top-20 must match exactly."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_rake_keyphrases"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("documents",))
    texts = con.execute("SELECT doc_id, text FROM documents").fetchall()
    stops = {"the", "a", "of", "and", "to"}
    phrases = []
    for _, txt in texts:
        run = []
        for tok in txt.split(" "):
            if tok in stops:
                if run:
                    phrases.append(run)
                run = []
            else:
                run.append(tok)
        if run:
            phrases.append(run)
    freq = Counter()
    degree = Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            degree[w] += len(p)
    scored = Counter()
    occ = Counter()
    for p in phrases:
        text = " ".join(p)
        scored[text] = sum(degree[w] * 1_000_000 // freq[w] for w in p)
        occ[text] += 1
    top = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.phrase, r.score_ppm, r.n_occurrences) for r in got] == [
        (ph, sc, occ[ph]) for ph, sc in top
    ]


def test_brier_decomposition_identity(spark):
    """REL - RES + UNC must equal the Brier score of the binned forecast,
    recomputed serially (the identity Murphy's decomposition promises)."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    rows = all_queries()["q_brier_decomp"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("events",))
    raw = con.execute(
        "SELECT CAST(round(value * 100) AS BIGINT),"
        " CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        " FROM events WHERE value IS NOT NULL"
    ).fetchall()
    lo = min(s for s, _ in raw)
    hi = max(s for s, _ in raw)
    bins = defaultdict(list)
    for s, y in raw:
        b = min((s - lo) * 10 // (hi - lo), 9)
        bins[b].append((s, y))
    n = len(raw)
    base = sum(y for _, y in raw) / n
    rel = res = brier = 0.0
    for b, items in bins.items():
        nb = len(items)
        conf = (sum(s for s, _ in items) / nb - lo) / (hi - lo)
        acc = sum(y for _, y in items) / nb
        rel += nb * (conf - acc) ** 2 / n
        res += nb * (acc - base) ** 2 / n
        brier += sum((conf - y) ** 2 for _, y in items) / n
    got_rel = sum(r.rel_contrib for r in rows)
    got_res = sum(r.res_contrib for r in rows)
    unc = rows[0].uncertainty
    assert abs(got_rel - rel) < 1e-9
    assert abs(got_res - res) < 1e-9
    assert abs(unc - base * (1 - base)) < 1e-12
    # Murphy identity for the binned forecast
    assert abs((got_rel - got_res + unc) - brier) < 1e-9
    for r in rows:
        nb = len(bins[r.bin])
        assert r.n_b == nb and r.pos_b == sum(y for _, y in bins[r.bin])


def test_embedding_anisotropy_vs_bruteforce(spark):
    """The sum-vector identity vs the literal O(n^2) pairwise mean over
    the same quantized unit vectors."""
    import numpy as np

    from nyc_taxi_lakehouse_spark.registry import all_queries

    row = all_queries()["q_embedding_anisotropy"].fn(spark, SF_SMOKE).collect()[0]
    con = _duck(SF_SMOKE, ("embeddings",))
    vecs = [r[0] for r in con.execute("SELECT embedding FROM embeddings ORDER BY vec_id").fetchall()]
    q = np.floor(np.array(vecs, dtype=np.float64) * 32768.0 + 0.5)
    norm = np.sqrt((q * q).sum(axis=1))
    nq = np.floor(q * 10000.0 / norm[:, None] + 0.5)
    n = len(vecs)
    g = nq @ nq.T
    brute = (g.sum() - np.trace(g)) / (n * (n - 1) * 1e8)
    assert row.n == n and row.dims == len(vecs[0])
    assert abs(row.mean_pairwise_cos - brute) < 1e-12
    s = nq.sum(axis=0)
    assert row.sum_vec_norm2 == (s * s).sum()
    assert row.self_norm2 == int((nq * nq).sum())
    share = (s * s).sum() / (n * (nq * nq).sum())
    assert abs(row.mean_dir_share - share) < 1e-12
    # sanity: unit-ish self norms and a bounded cosine
    assert abs(row.self_norm2 / n - 1e8) < 1e6
    assert -1.0 <= row.mean_pairwise_cos <= 1.0


def test_compaction_plan_properties(spark):
    """Serial next-fit-decreasing replay plus the packing invariants: bins
    are consecutive from 0, every bin except possibly the last reaches
    the target once closed, and no file is lost."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    rows = all_queries()["q_compaction_plan"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("documents",))
    files = con.execute(
        "SELECT lang, source, SUM(n_chars) FROM documents GROUP BY 1, 2"
    ).fetchall()
    total = sum(b for _, _, b in files)
    target = (total + 4) // 5
    order = sorted(files, key=lambda f: (-f[2], f[0], f[1]))
    fill = 0
    expect = []
    for la, so, b in order:
        expect.append((la, so, b, fill // target, fill))
        fill += b
    got = sorted(rows, key=lambda r: (-r.bytes, r.lang, r.source))
    assert [(r.lang, r.source, r.bytes, r.bin, r.fill_before) for r in got] == expect
    assert all(r.target == target and r.ideal_bins == (total + target - 1) // target for r in rows)
    bins = sorted({r.bin for r in rows})
    assert bins == list(range(len(bins)))
    assert sum(r.bytes for r in rows) == total


def test_hll_impl_vs_python(spark):
    """Full serial HLL replay: same md5 hashes, bucket/rank split,
    register maxes, and exact dyadic harmonic sum — plus the accuracy
    contract (|rel err| within 4 standard errors of the m=256 sketch)."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    row = all_queries()["q_hll_impl"].fn(spark, SF_SMOKE).collect()[0]
    con = _duck(SF_SMOKE, ("events",))
    users = [r[0] for r in con.execute("SELECT user_id FROM events").fetchall()]
    regs = [0] * 256
    for u in users:
        h = _md5_int32(str(u))
        bucket, rest = h // 16777216, h % 16777216
        rank = 25 if rest == 0 else 24 - rest.bit_length() + 1
        regs[bucket] = max(regs[bucket], rank)
    inv_sum = sum(1 << (25 - m) for m in regs)
    alpha = 0.7182725932495458
    est = alpha * 256.0 * 256.0 * 33554432.0 / inv_sum
    n_exact = len(set(users))
    assert row.inv_sum_scaled == inv_sum
    assert row.n_zero_registers == sum(1 for m in regs if m == 0)
    assert abs(row.est_hll - est) < 1e-9 * est
    assert row.n_exact == n_exact
    # accuracy contract, applied the way the docstring prescribes: in the
    # small range (raw est < 2.5m with zero registers) the CONSUMER applies
    # linear counting m*ln(m/V) from the emitted n_zero_registers (ln is
    # banned in-query for hash determinism); outside it the raw estimate
    # stands. 1.04/sqrt(256) ~ 6.5% standard error; allow ~4 sigma.
    import math

    if row.n_zero_registers > 0 and row.est_hll < 2.5 * 256:
        corrected = 256.0 * math.log(256.0 / row.n_zero_registers)
    else:
        corrected = row.est_hll
    assert abs(corrected - n_exact) / n_exact < 0.26


def test_fdr_bh_vs_python(spark):
    """Per-type randomization p-values replayed serially from the same
    md5 relabeling, then the BH step-up walk — rejections must match."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = {r.event_type: r for r in all_queries()["q_fdr_bh"].fn(spark, SF_SMOKE).collect()}
    con = _duck(SF_SMOKE, ("events",))
    raw = con.execute(
        """
        SELECT user_id, event_type, COUNT(*),
               MIN(CASE WHEN event_type = 'error'
                   THEN epoch_ns(ts) END) IS NOT NULL
               AND MIN(CASE WHEN event_type = 'error' THEN epoch_ns(ts) END)
                   = MIN(MIN(epoch_ns(ts))) OVER (PARTITION BY user_id)
        FROM events GROUP BY user_id, event_type
        """
    ).fetchall()
    users = sorted({u for u, _, _, _ in raw})
    types = sorted({t for _, t, _, _ in raw})
    cnt = {(u, t): c for u, t, c, _ in raw}
    gmap = {}
    for u, t, c, gflag in raw:
        gmap[u] = gmap.get(u, False) or gflag
    n = len(users)
    n1 = sum(gmap[u] for u in users)
    n0 = n - n1
    p1_ppm = n1 * 1_000_000 // n
    labels = {
        (u, b): _md5_int32(f"{u}:{b}") % 1_000_000 < p1_ppm
        for u in users for b in range(128)
    }
    pvals = {}
    for t in types:
        y = {u: cnt.get((u, t), 0) for u in users}
        s1 = sum(y[u] for u in users if gmap[u])
        s0 = sum(y[u] for u in users if not gmap[u])
        obs_cross = abs(s1 * n0 - s0 * n1)
        extreme = 0
        for b in range(128):
            n1r = s1r = s0r = 0
            for u in users:
                if labels[(u, b)]:
                    n1r += 1
                    s1r += y[u]
                else:
                    s0r += y[u]
            n0r = n - n1r
            if n1r == 0 or n0r == 0 or (
                abs(s1r * n0r - s0r * n1r) * (n1 * n0)
                >= obs_cross * (n1r * n0r)
            ):
                extreme += 1
        pvals[t] = ((1 + extreme) * 1_000_000 // 129, extreme)
    order = sorted(types, key=lambda t: (pvals[t][0], t))
    m = len(types)
    k_max = 0
    for k, t in enumerate(order, 1):
        if pvals[t][0] * m <= k * 50000:
            k_max = k
    for k, t in enumerate(order, 1):
        r = got[t]
        assert (r.p_ppm, r.n_extreme) == pvals[t]
        assert r.k == k
        assert r.bh_threshold_ppm == k * 50000 // m
        assert r.rejected == (1 if k <= k_max else 0)


def test_top_paths_vs_python(spark):
    """Path strings and shares replayed from the (ts, event_id) total
    order."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_top_paths"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("events",))
    rows = con.execute(
        "SELECT user_id, event_type FROM events"
        " ORDER BY user_id, epoch_ns(ts) // 1000, event_id"
    ).fetchall()
    seqs = defaultdict(list)
    for u, t in rows:
        if len(seqs[u]) < 5:
            seqs[u].append(t)
    n_u = len(seqs)
    paths = Counter(">".join(s) for s in seqs.values())
    top = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.path, r.n_users, r.share_ppm) for r in got] == [
        (p, c, c * 1_000_000 // n_u) for p, c in top
    ]


def test_average_precision_vs_python(spark):
    """AP replayed serially over descending score groups, plus the
    staged-idiv scaling."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    row = all_queries()["q_average_precision"].fn(spark, SF_SMOKE).collect()[0]
    con = _duck(SF_SMOKE, ("events",))
    raw = con.execute(
        "SELECT CAST(round(value * 100) AS BIGINT),"
        " CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END FROM events"
    ).fetchall()
    groups = defaultdict(lambda: [0, 0])
    for s, y in raw:
        groups[s][0] += 1
        groups[s][1] += y
    n_pos = sum(p for _, p in groups.values())
    n_neg = sum(c - p for c, p in groups.values())
    cum_c = cum_pos = 0
    ap_scaled = 0
    for s in sorted(groups, reverse=True):
        c, p = groups[s]
        cum_c += c
        cum_pos += p
        ap_scaled += p * cum_pos * 1_000_000_000 // cum_c
    assert (row.n_pos, row.n_neg) == (n_pos, n_neg)
    assert row.ap_ppm == ap_scaled // (n_pos * 1000)
    assert row.prevalence_ppm == n_pos * 1_000_000 // (n_pos + n_neg)
    # AP must beat prevalence iff the score actually ranks (sanity only:
    # direction is data-dependent, but both must be valid probabilities)
    assert 0 <= row.ap_ppm <= 1_000_000


def test_ams_f2_vs_python(spark):
    """All 16 projections replayed from the same md5 parities; the mean
    estimator must land within the AMS variance envelope."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    row = all_queries()["q_ams_f2"].fn(spark, SF_SMOKE).collect()[0]
    con = _duck(SF_SMOKE, ("events",))
    counts = dict(
        con.execute("SELECT user_id, COUNT(*) FROM events GROUP BY 1").fetchall()
    )
    f2 = sum(c * c for c in counts.values())
    sketches = []
    for j in range(16):
        sk = sum(
            c * (1 if _md5_int32(f"{u}:{j}") % 2 == 0 else -1)
            for u, c in counts.items()
        )
        sketches.append(sk)
    sq = [s * s for s in sketches]
    assert row.f2_exact == f2
    assert row.f2_est == sum(sq) // 16
    assert row.est_min == min(sq) and row.est_max == max(sq)
    # Var(mean of 16) <= 2*F2^2/16 -> sd <= 0.354*F2; allow 4 sigma
    assert abs(row.rel_err) < 1.42


def test_price_elasticity_vs_python(spark):
    """Midpoint-formula replay per part with exact integer clearing."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = {r.partkey: r for r in all_queries()["q_price_elasticity"].fn(spark, SF_SMOKE).collect()}
    con = _duck(SF_SMOKE, ("lineitem", "orders"))
    raw = con.execute(
        """
        SELECT l_partkey,
               CASE WHEN o_orderdate < DATE '1996-01-01' THEN 'a' ELSE 'b' END,
               SUM(CAST(l_quantity AS BIGINT)),
               SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
        """
    ).fetchall()
    per = {(pk, p): (q, r) for pk, p, q, r in raw}
    parts = {pk for pk, _ in per}
    n_checked = 0
    for pk in parts:
        if (pk, "a") not in per or (pk, "b") not in per:
            assert pk not in got
            continue
        q_a, r_a = per[(pk, "a")]
        q_b, r_b = per[(pk, "b")]
        num = (q_b - q_a) * (r_b * q_a + r_a * q_b)
        den = (q_b + q_a) * (r_b * q_a - r_a * q_b)
        row = got[pk]
        assert (row.num, row.den) == (num, den)
        if den != 0:
            assert abs(row.elasticity - num / den) < 1e-12 * max(1.0, abs(num / den))
        cls = (
            "undefined" if den == 0
            else "elastic" if abs(num) > abs(den)
            else "unit" if abs(num) == abs(den)
            else "inelastic"
        )
        assert row.demand_class == cls
        n_checked += 1
    assert n_checked > 100


def test_hybrid_rrf_vs_python(spark):
    """Both retriever rankings and the fused RRF list replayed serially:
    BM25-rational keyword scores (decimal-snapped like the SQL), exact
    quantized-cosine dots, exact idiv fusion."""
    import numpy as np

    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_hybrid_rrf"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("documents", "embeddings"))
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    terms = ("spark", "merge", "vector")
    toks = {d: t.split(" ") for d, t in docs}
    n_docs = len(docs)
    total_tokens = sum(len(v) for v in toks.values())
    df = Counter()
    tf = {}
    for d_id, tl in toks.items():
        c = Counter(w for w in tl if w in terms)
        if c:
            tf[d_id] = c
            for w in c:
                df[w] += 1
    kw_score = {}
    for d_id, c in tf.items():
        dl = len(toks[d_id])
        s = 0
        for w, f in c.items():
            idf = max((n_docs - df[w] + 0.5) / (df[w] + 0.5), 1e-6)
            contrib = idf * (f * 2.2) / (
                f + 1.2 * (0.25 + 0.75 * (dl * n_docs / total_tokens))
            )
            s += round(contrib * 1_000_000)  # DECIMAL(28,6) snap
        kw_score[d_id] = s
    kw_rank = {
        d_id: i + 1
        for i, (d_id, _) in enumerate(
            sorted(kw_score.items(), key=lambda kv: (-kv[1], kv[0]))
        )
    }
    vecs = dict(con.execute("SELECT vec_id, embedding FROM embeddings").fetchall())
    ids = sorted(vecs)
    q = np.floor(np.array([vecs[i] for i in ids], dtype=np.float64) * 32768.0 + 0.5)
    norm = np.sqrt((q * q).sum(axis=1))
    nq = np.floor(q * 10000.0 / norm[:, None] + 0.5)
    probe = nq[ids.index(0)]
    dots = {i: int(v) for i, v in zip(ids, nq @ probe)}
    vec_rank = {
        i: r + 1
        for r, (i, _) in enumerate(
            sorted(dots.items(), key=lambda kv: (-kv[1], kv[0]))
        )
    }
    fused = {}
    for d_id in set(kw_rank) | set(vec_rank):
        s = 0
        if d_id in kw_rank:
            s += 1_000_000 // (60 + kw_rank[d_id])
        if d_id in vec_rank:
            s += 1_000_000 // (60 + vec_rank[d_id])
        fused[d_id] = s
    top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.doc_id, r.rrf_ppm) for r in got] == top
    for r in got:
        assert r.kw_rank == kw_rank.get(r.doc_id)
        assert r.vec_rank == vec_rank.get(r.doc_id)
    # the fusion is genuinely hybrid: top-20 must mix both signals
    assert any(r.kw_rank is not None and r.kw_rank <= 20 for r in got)
    assert any(r.vec_rank is not None and r.vec_rank <= 20 for r in got)


def test_hdr_histogram_vs_python(spark):
    """Full serial HDR replay (bucket ids, bounds, cum) plus the quantile
    accuracy contract: the flagged bucket's midpoint must be within the
    2^-3 relative bucket width of the true quantile."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    rows = all_queries()["q_hdr_histogram"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("orders",))
    vals = sorted(
        v
        for (v,) in con.execute(
            "SELECT CAST(round(o_totalprice * 100) AS BIGINT) FROM orders"
        ).fetchall()
        if v >= 1
    )

    def bucket(v):
        e = v.bit_length()
        if e <= 4:
            return e * 8
        return e * 8 + (v - (1 << (e - 1))) // (1 << (e - 4))

    exp = Counter(bucket(v) for v in vals)
    got = {r.bucket_id: r for r in rows}
    assert set(got) == set(exp)
    cum = 0
    n = len(vals)
    for b in sorted(exp):
        cum += exp[b]
        r = got[b]
        assert (r.cnt, r.cum, r.n) == (exp[b], cum, n)
        e = b // 8
        sub = b % 8
        unit = (1 << (e - 1 - 3)) if e > 4 else (1 << (e - 1))
        lo = (1 << (e - 1)) + sub * unit
        assert (r.lo, r.hi) == (lo, lo + unit - 1)
    for q, flag in ((50, "holds_p50"), (95, "holds_p95"), (99, "holds_p99")):
        rank = (q * n + 99) // 100
        true_q = vals[rank - 1]
        holders = [r for r in rows if getattr(r, flag) == 1]
        assert len(holders) == 1
        h = holders[0]
        assert h.lo <= true_q <= h.hi
        mid = (h.lo + h.hi) // 2
        assert abs(mid - true_q) / true_q <= 0.125


def test_qini_uplift_vs_python(spark):
    """Qini numerators, diagonal, and coefficient replayed from a serial
    NTILE over the same (score desc, user_id) order."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    rows = all_queries()["q_qini_uplift"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("events",))
    per_user = con.execute(
        """
        SELECT user_id, user_id % 2, COUNT(*),
               CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1
                             ELSE 0 END) > 0 THEN 1 ELSE 0 END
        FROM events GROUP BY user_id
        """
    ).fetchall()
    order = sorted(per_user, key=lambda r: (-r[2], r[0]))
    n = len(order)
    # NTILE(10): first n%10 tiles get ceil(n/10)
    base, extra = divmod(n, 10)
    tiles = []
    idx = 0
    for t in range(1, 11):
        size = base + (1 if t <= extra else 0)
        tiles.append(order[idx : idx + size])
        idx += size
    cnt_t = cnt_c = cy_t = cy_c = cum_n = 0
    tn_t = sum(g for _, g, _, _ in per_user)
    tn_c = n - tn_t
    ty_t = sum(y for _, g, _, y in per_user if g)
    ty_c = sum(y for _, g, _, y in per_user if not g)
    final = (ty_t * tn_c - ty_c * tn_t) / tn_c
    coeff = 0.0
    got = {r.decile: r for r in rows}
    for t, tile in enumerate(tiles, 1):
        nt = sum(g for _, g, _, _ in tile)
        nc = len(tile) - nt
        yt = sum(y for _, g, _, y in tile if g)
        yc = sum(y for _, g, _, y in tile if not g)
        cnt_t += nt
        cnt_c += nc
        cy_t += yt
        cy_c += yc
        cum_n += len(tile)
        r = got[t]
        assert (r.nt, r.nc, r.yt, r.yc) == (nt, nc, yt, yc)
        assert r.qini_num == cy_t * cnt_c - cy_c * cnt_t
        assert r.qini_den == cnt_c
        qk = (cy_t * cnt_c - cy_c * cnt_t) / cnt_c
        dk = final * cum_n / n
        assert abs(r.qini_k - qk) < 1e-9
        assert abs(r.diagonal_k - dk) < 1e-9
        coeff += qk - dk
    for r in rows:
        assert abs(r.qini_coefficient - coeff) < 1e-9


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero (both engines' semantics)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_silhouette_vs_python(spark):
    """Distances, assignment, ppm snap, and per-cell means replayed with
    numpy; plus the simplified-silhouette range contract."""
    import numpy as np

    from nyc_taxi_lakehouse_spark.llm.similarity import _KMEANS_K, _QSCALE
    from nyc_taxi_lakehouse_spark.registry import all_queries

    rows = all_queries()["q_silhouette"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("embeddings",))
    vecs = dict(con.execute("SELECT vec_id, embedding FROM embeddings").fetchall())
    ids = sorted(vecs)
    raw = np.array([vecs[i] for i in ids], dtype=np.float64) * float(_QSCALE)
    q = np.sign(raw) * np.floor(np.abs(raw) + 0.5)  # HALF_UP like SQL round()
    cents = q[:_KMEANS_K]
    d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).astype(np.int64)
    order = np.argsort(d2, axis=1, kind="stable")
    a_cell = order[:, 0]
    da = np.sqrt(d2[np.arange(len(ids)), order[:, 0]].astype(np.float64))
    db = np.sqrt(d2[np.arange(len(ids)), order[:, 1]].astype(np.float64))
    keep = np.maximum(da, db) > 0
    s_ppm = np.floor((db - da) / np.maximum(da, db) * 1e6 + 0.5).astype(np.int64)
    got = {r.cell: r for r in rows}
    tot_s = tot_n = 0
    for cell in sorted(set(a_cell[keep])):
        mask = keep & (a_cell == cell)
        n = int(mask.sum())
        ssum = int(s_ppm[mask].sum())
        r = got[cell]
        assert r.n_members == n
        assert r.mean_sil_ppm == _trunc_div(ssum, n)
        assert r.min_sil_ppm == int(s_ppm[mask].min())
        assert r.max_sil_ppm == int(s_ppm[mask].max())
        tot_s += ssum
        tot_n += n
    for r in rows:
        assert -1_000_000 <= r.min_sil_ppm <= r.max_sil_ppm <= 1_000_000
        assert r.global_mean_sil_ppm == _trunc_div(tot_s, tot_n)
    assert sum(r.n_members for r in rows) == len([k for k in keep if k])


def test_decontam_fuzzy_vs_python(spark):
    """Best-match Jaccard per eval doc replayed from raw 4-gram sets."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = {r.eval_doc: r for r in all_queries()["q_decontam_fuzzy"].fn(spark, SF_SMOKE).collect()}
    con = _duck(SF_SMOKE, ("documents",))
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    grams = {}
    split = {}
    for d_id, txt in docs:
        toks = txt.split(" ")
        if len(toks) < 4:
            continue
        g = {
            _md5_int32(" ".join(toks[j : j + 4]))
            for j in range(len(toks) - 3)
        }
        grams[d_id] = g
        split[d_id] = "train" if (d_id * 2654435761 + 104729) % 1000 < 960 else "eval"
    evals = [d for d, s in split.items() if s == "eval"]
    trains = [d for d, s in split.items() if s == "train"]
    for e in evals:
        best = None
        for t in trains:
            sh = len(grams[e] & grams[t])
            if sh == 0:
                continue
            j = sh * 1_000_000 // (len(grams[e]) + len(grams[t]) - sh)
            cand = (-j, t, sh)
            if best is None or cand < best:
                best = cand
        if best is None:
            assert e not in got
            continue
        j, t, sh = -best[0], best[1], best[2]
        r = got[e]
        assert (r.best_train_doc, r.shared, r.jaccard_ppm) == (t, sh, j)
        assert (r.eval_grams, r.train_grams) == (len(grams[e]), len(grams[t]))
        assert r.contaminated == (1 if j >= 500_000 else 0)
    assert len(got) > 5


def test_price_volume_mix_identity(spark):
    """The bridge identity: price + pure-volume + mix effects must sum to
    the exact revenue delta per brand (rational algebra, so the double
    check is at 1e-6 cents), plus a full serial replay of the terms."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    rows = all_queries()["q_price_volume_mix"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("lineitem", "orders", "part"))
    raw = con.execute(
        """
        SELECT p.p_brand,
               CASE WHEN o.o_orderdate < DATE '1996-01-01' THEN 'a' ELSE 'b' END,
               SUM(CAST(l.l_quantity AS BIGINT)),
               SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
        """
    ).fetchall()
    per = {(b, p): (q, r) for b, p, q, r in raw}
    tq = {p: sum(q for (b, pp), (q, _) in per.items() if pp == p) for p in ("a", "b")}
    checked = 0
    for r in rows:
        q_a, r_a = per[(r.brand, "a")]
        q_b, r_b = per[(r.brand, "b")]
        assert (r.q_a, r.q_b, r.r_a, r.r_b) == (q_a, q_b, r_a, r_b)
        assert (r.tq_a, r.tq_b) == (tq["a"], tq["b"])
        assert r.delta_cents == r_b - r_a
        assert r.price_num == r_b * q_a - r_a * q_b
        assert r.volume_num == r_a * (tq["b"] - tq["a"])
        assert r.mix_num == r_a * (q_b * tq["a"] - q_a * tq["b"])
        total = r.price_eff_cents + r.volume_eff_cents + r.mix_eff_cents
        assert abs(total - r.delta_cents) < 1e-5 * max(1.0, abs(r.delta_cents))
        checked += 1
    assert checked >= 20


def test_hard_negatives_vs_bruteforce(spark):
    """Band membership, ranking, and exclusions replayed with numpy over
    the full candidate set."""
    import numpy as np

    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = [(r.anchor, r.rk, r.hard_negative, r.dot_scaled) for r in
           all_queries()["q_hard_negatives"].fn(spark, SF_SMOKE).collect()]
    con = _duck(SF_SMOKE, ("embeddings",))
    vecs = dict(con.execute("SELECT vec_id, embedding FROM embeddings").fetchall())
    ids = sorted(vecs)
    q = np.floor(np.array([vecs[i] for i in ids], dtype=np.float64) * 32768.0 + 0.5)
    norm = np.sqrt((q * q).sum(axis=1))
    nq = np.floor(q * 10000.0 / norm[:, None] + 0.5)
    g = (nq @ nq.T).astype(np.int64)
    exp = []
    for a in range(10):
        cands = []
        for j, vid in enumerate(ids):
            if vid == a:
                continue
            dot = int(g[ids.index(a), j])
            if 300000 * 100 <= dot <= 850000 * 100:
                cands.append((-dot, vid))
        cands.sort()
        for rk, (nd, vid) in enumerate(cands[:3], 1):
            exp.append((a, rk, vid, -nd))
    assert got == exp
    # the band is non-trivially populated
    assert len(exp) > 10


def test_tokenizer_fertility_vs_python(spark):
    """Per-language counts and ppm ratios replayed with python regex."""
    import re

    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = {r.lang: r for r in all_queries()["q_tokenizer_fertility"].fn(spark, SF_SMOKE).collect()}
    con = _duck(SF_SMOKE, ("documents",))
    docs = con.execute("SELECT lang, text FROM documents").fetchall()
    pat = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+")
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, chars, words, toks
    for lang, txt in docs:
        a = agg[lang]
        a[0] += 1
        a[1] += len(txt)
        a[2] += len(re.split(" +", txt))
        a[3] += len(pat.findall(txt))
    t_docs = sum(a[0] for a in agg.values())
    t_toks = sum(a[3] for a in agg.values())
    assert set(got) == set(agg)
    for lang, (nd, ch, wo, tk) in agg.items():
        r = got[lang]
        assert (r.n_docs, r.chars, r.words, r.toks) == (nd, ch, wo, tk)
        assert r.fertility_ppm == tk * 1_000_000 // wo
        assert r.chars_per_token_ppm == ch * 1_000_000 // tk
        assert r.token_share_ppm == tk * 1_000_000 // t_toks
        assert r.doc_share_ppm == nd * 1_000_000 // t_docs


def test_effective_diameter_vs_python(spark):
    """Full serial multi-source BFS replay plus the 90th-percentile flag
    semantics."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    rows = all_queries()["q_effective_diameter"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("orders", "lineitem"))
    pairs = con.execute(
        """
        SELECT DISTINCT o.o_custkey * 2, l.l_suppkey * 2 + 1
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        """
    ).fetchall()
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    sources = sorted(n for n in adj if n % 2 == 0)[:8]
    dist = Counter()
    for s in sources:
        seen = {s: 0}
        frontier = [s]
        for h in range(1, 7):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in seen:
                        seen[v] = h
                        nxt.append(v)
            frontier = nxt
            if not frontier:
                break
        for h in seen.values():
            dist[h] += 1
    total = sum(dist.values())
    hop_sum = sum(h * c for h, c in dist.items())
    got = {r.hop: r for r in rows}
    assert set(got) == set(dist)
    cum = 0
    flagged = []
    for h in sorted(dist):
        prev = cum
        cum += dist[h]
        r = got[h]
        assert (r.n_pairs, r.cum, r.total) == (dist[h], cum, total)
        assert r.share_ppm == dist[h] * 1_000_000 // total
        expect_flag = 1 if cum * 10 >= total * 9 and prev * 10 < total * 9 else 0
        assert r.is_effective_diameter == expect_flag
        if expect_flag:
            flagged.append(h)
        assert r.mean_dist_ppm == hop_sum * 1_000_000 // total
    assert len(flagged) == 1  # exactly one hop carries the 90th percentile


def test_out_of_orderness_vs_python(spark):
    """Lateness replay under the planted 8 h jitter: per ingest partition,
    running-max lateness over (arrival, event_id) order, band histogram,
    and the planted-bound recovery contract (nothing past 8 h; the p99
    flag covers the jitter regime)."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    rows = all_queries()["q_out_of_orderness"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("events",))
    raw = con.execute(
        "SELECT user_id % 8, event_id, epoch_ns(ts) // 1000 FROM events"
        " WHERE ts IS NOT NULL AND event_id IS NOT NULL"
    ).fetchall()
    by_part = defaultdict(list)
    for part, eid, ts_us in raw:
        # hash scaled into [0, 8h) µs — mirrors the query's exact formula
        arrival = ts_us + _md5_int32(str(eid)) * 7_031_250 // 1_048_576
        by_part[part].append((arrival, eid, ts_us))
    bands = Counter()
    max_late = Counter()
    edges = [0, 60, 600, 3600, 14400, 43200]
    for part, evs in by_part.items():
        evs.sort()
        head = None
        for _, _, ts_us in evs:
            head = ts_us if head is None else max(head, ts_us)
            late = head - ts_us
            b = 0 if late == 0 else next(
                (i for i, e in enumerate(edges[1:], 1) if late <= e * 1_000_000), 6
            )
            bands[b] += 1
            max_late[b] = max(max_late[b], late)
    total = sum(bands.values())
    got = {r.bucket: r for r in rows}
    assert set(got) == set(bands)
    cum = 0
    for b in sorted(bands):
        prev = cum
        cum += bands[b]
        r = got[b]
        assert (r.n, r.cum, r.total) == (bands[b], cum, total)
        assert r.max_late_us == max_late[b]
        assert r.share_ppm == bands[b] * 1_000_000 // total
        assert r.is_p99_watermark == (
            1 if cum * 100 >= total * 99 and prev * 100 < total * 99 else 0
        )
    # planted-bound recovery: jitter < 8 h, so no lateness past 8 h …
    assert all(r.max_late_us < 28_800_000_000 for r in rows)
    # … and the multi-hour regime is actually exercised (a mis-scaled
    # jitter — e.g. the old `% 28.8e9` no-op, < 72 min — fails here):
    # lateness reaches past 4 h into the <=12 h band, and the p99 flag
    # sits on that band, the smallest one covering the planted bound.
    assert max(r.max_late_us for r in rows) > 14_400_000_000
    flagged = [r.bucket for r in rows if r.is_p99_watermark]
    assert flagged == [5]
    # the audit is non-degenerate: late events exist
    assert total > bands[0] > 0


def test_ab_interaction_vs_python(spark):
    """Cell moments and the interaction contrast/z replayed serially."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    row = all_queries()["q_ab_interaction"].fn(spark, SF_SMOKE).collect()[0]
    con = _duck(SF_SMOKE, ("events",))
    raw = con.execute(
        """
        SELECT user_id % 2,
               CASE WHEN MIN(CASE WHEN event_type = 'error'
                             THEN epoch_ns(ts) END) = MIN(epoch_ns(ts))
                    THEN 1 ELSE 0 END,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        FROM events GROUP BY user_id
        """
    ).fetchall()
    cells = defaultdict(lambda: [0, 0, 0])
    for a, b, y in raw:
        c = cells[(a, b)]
        c[0] += 1
        c[1] += y
        c[2] += y * y
    import math

    m = {}
    von = {}
    for (a, b), (n, sy, syy) in cells.items():
        assert getattr(row, f"n{a}{b}") == n
        assert getattr(row, f"sy{a}{b}") == sy
        m[(a, b)] = sy / n
        von[(a, b)] = (n * syy - sy * sy) / (n * (n - 1)) / n
        assert abs(getattr(row, f"mean{a}{b}") - m[(a, b)]) < 1e-12
    inter = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    z = inter / math.sqrt(sum(von.values()))
    assert abs(row.interaction - inter) < 1e-10
    assert abs(row.interaction_z - z) < 1e-10
    assert all(n >= 2 for n, _, _ in cells.values())


def test_state_runs_vs_python(spark):
    """Run-length encoding replayed from the (ts, event_id) total order."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = {r.event_type: r for r in all_queries()["q_state_runs"].fn(spark, SF_SMOKE).collect()}
    con = _duck(SF_SMOKE, ("events",))
    raw = con.execute(
        "SELECT user_id, event_type, epoch_ns(ts) // 1000 FROM events"
        " ORDER BY user_id, epoch_ns(ts) // 1000, event_id"
    ).fetchall()
    runs = defaultdict(list)  # type -> [(len, dur_us)]
    cur_u = cur_t = None
    cur = []
    def flush():
        if cur:
            runs[cur_t].append((len(cur), max(cur) - min(cur)))
    for u, t, ts in raw:
        if u != cur_u or t != cur_t:
            flush()
            cur_u, cur_t, cur = u, t, []
        cur.append(ts)
    flush()
    assert set(got) == set(runs)
    for t, rl in runs.items():
        r = got[t]
        n_runs = len(rl)
        n_events = sum(l for l, _ in rl)
        dur = sum(d for _, d in rl)
        assert (r.n_runs, r.n_events) == (n_runs, n_events)
        assert r.mean_run_len_ppm == n_events * 1_000_000 // n_runs
        assert r.max_run_len == max(l for l, _ in rl)
        assert (r.total_run_dur_us, r.mean_run_dur_us) == (dur, dur // n_runs)
    # runs genuinely coalesce: some multi-event runs exist
    assert any(r.max_run_len > 1 for r in got.values())


def test_maxsim_vs_bruteforce(spark):
    """MaxSim replayed with numpy over all subvector pairs for every
    candidate, including the unit quantization and integer ordering."""
    import numpy as np

    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = [(r.doc_vec, r.maxsim_scaled) for r in
           all_queries()["q_maxsim_retrieval"].fn(spark, SF_SMOKE).collect()]
    con = _duck(SF_SMOKE, ("embeddings",))
    vecs = dict(con.execute("SELECT vec_id, embedding FROM embeddings").fetchall())
    ids = sorted(vecs)
    raw = np.array([vecs[i] for i in ids], dtype=np.float64) * 32768.0
    q = np.floor(raw + 0.5)  # the SQL quantizer is floor(x + 0.5), signed
    # subvector split: (vec, sub, dim)
    q = q.reshape(len(ids), 8, 8)
    norms = np.sqrt((q * q).sum(axis=2))
    nq = np.floor(q * 10000.0 / norms[:, :, None] + 0.5)
    probe = nq[ids.index(0)]  # 8 x 8
    scores = {}
    for idx, vid in enumerate(ids):
        if vid == 0:
            continue
        dots = (probe @ nq[idx].T).astype(np.int64)  # psub x dsub
        scores[vid] = int(dots.max(axis=1).sum())
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == exp
    assert len(exp) == 20 and all(s > 0 for _, s in exp)


def test_skipgram_pairs_vs_python(spark):
    """Window pairs, counts, vocabulary rank, and hash negatives all
    replayed serially."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_skipgram_pairs"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("documents",))
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    pair = Counter()
    vocab_freq = Counter()
    for _, txt in docs:
        toks = txt.split(" ")
        vocab_freq.update(toks)
        for i, c in enumerate(toks):
            for off in (-2, -1, 1, 2):
                j = i + off
                if 0 <= j < len(toks):
                    pair[(c, toks[j])] += 1
    vocab = [
        t for t, _ in sorted(vocab_freq.items(), key=lambda kv: (-kv[1], kv[0]))
    ]
    n_vocab = len(vocab)
    top = sorted(pair.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    assert len(got) == 30
    for r, ((c, x), n) in zip(got, top):
        assert (r.center, r.context, r.n) == (c, x, n)
        assert r.neg1 == vocab[_md5_int32(f"{c}:{x}:1") % n_vocab]
        assert r.neg2 == vocab[_md5_int32(f"{c}:{x}:2") % n_vocab]


def test_spatial_knn_vs_bruteforce(spark):
    """Radius-bounded kNN vs the brute force restricted to the same 3x3
    neighborhood, plus the documented boundary: every emitted neighbor
    must also be a TRUE global top-3 neighbor whenever it lies strictly
    inside the cell-guaranteed radius."""
    from nyc_taxi_lakehouse_spark.operators.spatial import (
        _CELL, _MX_C, _MX_S, _MY_C, _MY_S,
    )
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = defaultdict(list)
    for r in all_queries()["q_spatial_knn"].fn(spark, SF_SMOKE).collect():
        got[r.custkey].append((r.rk, r.suppkey, r.dist2))
    con = _duck(SF_SMOKE, ("customer", "supplier"))
    custs = [r[0] for r in con.execute("SELECT c_custkey FROM customer").fetchall()]
    supps = [r[0] for r in con.execute("SELECT s_suppkey FROM supplier").fetchall()]
    scoords = {sk: _coords(sk, _MX_S, _MY_S) for sk in supps}
    n_checked = 0
    for ck in custs:
        cx, cy = _coords(ck, _MX_C, _MY_C)
        cell = (cx // _CELL, cy // _CELL)
        cands = []
        for sk, (sx, sy) in scoords.items():
            scell = (sx // _CELL, sy // _CELL)
            if abs(scell[0] - cell[0]) <= 1 and abs(scell[1] - cell[1]) <= 1:
                d2 = (cx - sx) ** 2 + (cy - sy) ** 2
                cands.append((d2, sk))
        cands.sort()
        exp = [(i + 1, sk, d2) for i, (d2, sk) in enumerate(cands[:3])]
        assert got.get(ck, []) == exp
        if exp:
            n_checked += 1
    assert n_checked > 3


def test_modern_agg_vs_python(spark):
    """GROUP BY ALL / FILTER / named-WINDOW report replayed serially."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    rows = all_queries()["q_modern_agg"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("orders",))
    raw = con.execute(
        "SELECT EXTRACT(YEAR FROM o_orderdate), o_orderstatus,"
        " o_orderpriority, CAST(o_totalprice AS DECIMAL(28,2)) FROM orders"
    ).fetchall()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for y, s, p, tp in raw:
        a = agg[(int(y), s)]
        a[0] += 1
        a[1] += tp
        a[2] += p.startswith("1-")
        a[3] += p.startswith("5-")
    got = {(r.order_year, r.status): r for r in rows}
    assert set(got) == set(agg)
    by_year = defaultdict(list)
    for (y, s), (n, rev, u, lo) in agg.items():
        r = got[(y, s)]
        assert (r.n_orders, r.n_urgent, r.n_low) == (n, u, lo)
        assert abs(r.revenue - float(rev)) < 1e-6
        by_year[y].append((-float(rev), s))
    for y, lst in by_year.items():
        lst.sort()
        for pos, (_, s) in enumerate(lst, 1):
            assert got[(y, s)].revenue_pos_in_year == pos


def test_dedup_canonical_vs_python(spark):
    """Keep/drop policy replayed over a serial union-find of the Jaccard
    >= 0.8 pair graph: the canonical is always the longest member."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = {r.doc_id: r for r in all_queries()["q_dedup_canonical"].fn(spark, SF_SMOKE).collect()}
    con = _duck(SF_SMOKE, ("documents",))
    docs = con.execute("SELECT doc_id, lang, source, text, n_chars FROM documents").fetchall()
    toksets = {d: (la, so, set(t.split(" "))) for d, la, so, t, _ in docs}
    nchars = {d: n for d, _, _, _, n in docs}
    parent = {d: d for d in toksets}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(toksets)
    for i, a in enumerate(ids):
        la, sa, ta = toksets[a]
        for b in ids[i + 1:]:
            lb, sb, tb = toksets[b]
            if (la, sa) != (lb, sb):
                continue
            inter = len(ta & tb)
            if inter and inter / (len(ta) + len(tb) - inter) >= 0.8:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    clusters = defaultdict(list)
    for d in ids:
        clusters[find(d)].append(d)
    n_multi = 0
    for root, members in clusters.items():
        canon = min(members, key=lambda d: (-nchars[d], d))
        for d in members:
            r = got[d]
            assert r.cluster_id == min(members)
            assert r.cluster_size == len(members)
            assert r.is_canonical == (1 if d == canon else 0)
            assert r.action == ("keep" if d == canon else "drop")
        if len(members) > 1:
            n_multi += 1
    assert n_multi > 3  # the policy is non-trivially exercised


def test_sql_pipe_matches_ansi_twin(spark):
    """The pipe-syntax query must equal the ANSI desugaring run through
    SPARK itself (the DuckDB oracle pins cross-engine; this pins the
    pipe parser against Spark's own ANSI planner)."""
    from nyc_taxi_lakehouse_spark.operators.modern_sql import (
        _PIPE_ORACLE,
        _PIPE_SQL,
    )
    from nyc_taxi_lakehouse_spark.sources.tables import load_tables

    load_tables(spark, SF_SMOKE, ["lineitem"])
    a = spark.sql(_PIPE_SQL).toPandas().sort_index(axis=1)
    b = spark.sql(_PIPE_ORACLE).toPandas().sort_index(axis=1)
    a = a.sort_values(list(a.columns)).reset_index(drop=True)
    b = b.sort_values(list(b.columns)).reset_index(drop=True)
    assert a.equals(b)


def test_arrow_udf_vs_python(spark):
    """Digital-root histogram replayed serially; also pins that the UDF
    really runs the Arrow path (useArrow resolved at definition)."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = {r.digit_root: r.n for r in all_queries()["q_arrow_udf"].fn(spark, SF_SMOKE).collect()}
    con = _duck(SF_SMOKE, ("orders",))
    keys = [k for (k,) in con.execute("SELECT o_orderkey FROM orders").fetchall()]
    exp = Counter(0 if k == 0 else 1 + (k - 1) % 9 for k in keys)
    assert got == dict(exp)
    assert set(got) == set(range(1, 10)) or 0 in got


def test_boxplot_vs_python(spark):
    """Five-number summaries, fences, and outlier counts replayed with
    the exact ceil-rank convention."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = {r.nation: r for r in all_queries()["q_boxplot_table"].fn(spark, SF_SMOKE).collect()}
    con = _duck(SF_SMOKE, ("customer",))
    raw = con.execute(
        "SELECT c_nationkey, CAST(round(c_acctbal * 100) AS BIGINT)"
        " FROM customer"
    ).fetchall()
    groups = defaultdict(list)
    for nat, v in raw:
        groups[nat].append(v)
    assert set(got) == set(groups)
    for nat, vs in groups.items():
        vs.sort()
        n = len(vs)
        # ceil-rank convention, computed INDEPENDENTLY of the SQL's idiv
        # form so a rank-formula slip there cannot be mirrored here
        q1 = vs[math.ceil(n / 4) - 1]
        med = vs[math.ceil(n / 2) - 1]
        q3 = vs[math.ceil(3 * n / 4) - 1]
        iqr = q3 - q1
        lo_f4, hi_f4 = 4 * q1 - 6 * iqr, 4 * q3 + 6 * iqr
        out = sum(1 for v in vs if 4 * v < lo_f4 or 4 * v > hi_f4)
        r = got[nat]
        assert (r.n, r.lo, r.q1, r.median, r.q3, r.hi) == (
            n, vs[0], q1, med, q3, vs[-1]
        )
        assert (r.iqr, r.n_outliers) == (iqr, out)
    # quartile ordering sanity on every group
    assert all(r.lo <= r.q1 <= r.median <= r.q3 <= r.hi for r in got.values())


def test_seasonal_index_vs_python(spark):
    """Calendar-slot-corrected dow indices and plain hour indices replayed
    serially; indices must average to ~1 under their weights."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    rows = all_queries()["q_seasonal_index"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("events",))
    raw = con.execute(
        "SELECT (epoch_ns(ts) // 1000) // 86400000000,"
        " (epoch_ns(ts) // 1000) // 3600000000"
        " FROM events"
    ).fetchall()
    days = [d for d, _ in raw]
    d0, d1 = min(days), max(days)
    h0, h1 = min(h for _, h in raw), max(h for _, h in raw)
    n_total = len(raw)
    n_days = d1 - d0 + 1
    n_hours = h1 - h0 + 1
    dow_n = Counter(d % 7 for d, _ in raw)
    hod_n = Counter(h % 24 for _, h in raw)
    got = {(r.grain, r.slot): r for r in rows}
    for dow, n in dow_n.items():
        slots = (d1 - d0 + 7 - ((dow - d0 % 7 + 7) % 7)) // 7
        r = got[("dow", dow)]
        assert r.n == n
        assert r.index_ppm == n * n_days * 1_000_000 // (n_total * slots)
    for h, n in hod_n.items():
        # hour-of-day slots counted over HOUR indices [h0, h1] — the
        # calendar correction the dow grain gets, applied to hours
        slots = (h1 - h0 + 24 - ((h - h0 % 24 + 24) % 24)) // 24
        r = got[("hour", h)]
        assert r.n == n
        assert r.index_ppm == n * n_hours * 1_000_000 // (n_total * slots)
    # weighted mean of indices ~ 1e6 (multiplicative profile property)
    hour_rows = [r for r in rows if r.grain == "hour"]
    mean_idx = sum(r.index_ppm * r.n for r in hour_rows) / sum(r.n for r in hour_rows)
    assert abs(mean_idx - 1_000_000) < 120_000


def test_qq_table_vs_python(spark):
    """Ventile order statistics per half replayed with the exact
    ceil-rank convention."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    rows = all_queries()["q_qq_table"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE, ("events",))
    raw = con.execute(
        "SELECT epoch_ns(ts) // 1000, CAST(round(value * 100) AS BIGINT)"
        " FROM events WHERE value IS NOT NULL"
    ).fetchall()
    mid = (min(t for t, _ in raw) + max(t for t, _ in raw)) // 2
    halves = {0: sorted(v for t, v in raw if t < mid),
              1: sorted(v for t, v in raw if t >= mid)}
    got = {r.ventile: r for r in rows}
    assert set(got) == set(range(1, 20))
    for q in range(1, 20):
        a = halves[0][(q * len(halves[0]) + 19) // 20 - 1]
        b = halves[1][(q * len(halves[1]) + 19) // 20 - 1]
        r = got[q]
        assert (r.v_first_half, r.v_second_half, r.gap_cents) == (a, b, b - a)
        if a != 0:
            assert r.gap_ppm == _trunc_div((b - a) * 1_000_000, a)
    # ventiles are monotone within each half
    vs = [got[q] for q in range(1, 20)]
    assert all(x.v_first_half <= y.v_first_half for x, y in zip(vs, vs[1:]))


def test_linear_scorer_vs_python(spark):
    """Margins replayed from a serial bag-of-hashed-bigrams scorer."""
    from nyc_taxi_lakehouse_spark.operators.inference import (
        _LM_BIAS,
        _LM_WEIGHTS,
    )
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = {r.doc_id: r for r in all_queries()["q_linear_scorer"].fn(spark, SF_SMOKE).collect()}
    con = _duck(SF_SMOKE, ("documents",))
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    n_pos = 0
    for d_id, txt in docs:
        toks = txt.split(" ")
        margin = _LM_BIAS
        n = 0
        for a, b in zip(toks, toks[1:]):
            bucket = _md5_int32(f"{a} {b}") % 16
            margin += _LM_WEIGHTS[bucket]
            n += 1
        # every document is scored: a featureless doc (< 2 tokens emits
        # no bigrams) gets the bias-only margin, not a silent drop
        r = got[d_id]
        assert (r.n_feats, r.margin_micro) == (n, margin)
        assert r.label == (1 if margin >= 0 else 0)
        n_pos += r.label
    assert set(got) == {d_id for d_id, _ in docs}
    # the frozen model is non-degenerate on this corpus: both classes occur
    assert 0 < n_pos < len(got)


def test_mode_stats_vs_python(spark):
    """Modal priority per nation with the explicit tie rule replayed."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = {r.nation: r for r in all_queries()["q_mode_stats"].fn(spark, SF_SMOKE).collect()}
    con = _duck(SF_SMOKE, ("orders", "customer"))
    raw = con.execute(
        "SELECT c.c_nationkey, o.o_orderpriority, COUNT(*)"
        " FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
        " GROUP BY 1, 2"
    ).fetchall()
    per_nation = defaultdict(list)
    for nat, prio, n in raw:
        per_nation[nat].append((-n, prio, n))
    assert set(got) == set(per_nation)
    for nat, lst in per_nation.items():
        lst.sort()
        total = sum(n for _, _, n in lst)
        r = got[nat]
        assert (r.mode_priority, r.mode_n, r.total) == (lst[0][1], lst[0][2], total)
        assert r.mode_share_ppm == lst[0][2] * 1_000_000 // total
        if len(lst) > 1:
            assert (r.runner_up, r.runner_up_n) == (lst[1][1], lst[1][2])
        else:
            assert r.runner_up is None


def test_mutual_nn_vs_python(spark):
    """Mutual-NN pairs replayed from the grid candidate set; every pair
    must be a two-sided argmin."""
    from nyc_taxi_lakehouse_spark.operators.spatial import (
        _CELL, _MX_C, _MX_S, _MY_C, _MY_S,
    )
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = [(r.custkey, r.suppkey, r.dist2) for r in
           all_queries()["q_mutual_nn"].fn(spark, SF_SMOKE).collect()]
    con = _duck(SF_SMOKE, ("customer", "supplier"))
    custs = [r[0] for r in con.execute("SELECT c_custkey FROM customer").fetchall()]
    supps = [r[0] for r in con.execute("SELECT s_suppkey FROM supplier").fetchall()]
    ccoords = {ck: _coords(ck, _MX_C, _MY_C) for ck in custs}
    scoords = {sk: _coords(sk, _MX_S, _MY_S) for sk in supps}
    cand = []
    for ck, (cx, cy) in ccoords.items():
        cc = (cx // _CELL, cy // _CELL)
        for sk, (sx, sy) in scoords.items():
            sc = (sx // _CELL, sy // _CELL)
            if abs(sc[0] - cc[0]) <= 1 and abs(sc[1] - cc[1]) <= 1:
                cand.append(((cx - sx) ** 2 + (cy - sy) ** 2, ck, sk))
    c_best = {}
    s_best = {}
    for d2, ck, sk in sorted(cand):
        if ck not in c_best:
            c_best[ck] = (sk, d2)
        if sk not in s_best:
            s_best[sk] = ck
    exp = sorted(
        (ck, sk, d2) for ck, (sk, d2) in c_best.items()
        if s_best.get(sk) == ck
    )
    assert got == exp and len(exp) > 3
