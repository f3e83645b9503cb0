"""Behavioral tests for the round-4 continuation inference operators:
rank tests, contingency association, drift, ANOVA, ACF, Gram matrix,
causal estimators.

The oracle-parity suite pins each query hash-exact against DuckDB at two
SFs — but both engines execute the SAME SQL formula, so a formula-level
bug would pass both. These tests pin the SEMANTICS against independent
serial references (numpy / pure-python, different algorithms where
possible: 2D-histogram prefix sums for tau-b, argsort midranks for MWU,
np.add.outer-free Gram, calendar convolution for ACF), per the SURVEY.md
§5 differential-testing strategy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import duckdb

from .conftest import SF_SMOKE


def _duck(sf_dir: str, tables=("documents",)):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_kendall_tau_vs_histogram_reference(spark):
    """Tau-b vs a numpy 2D-histogram reference: concordant/discordant via
    suffix-sum matrices (a different algorithm than the SQL cell
    self-join) and the textbook tie-corrected denominator."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_kendall_tau"].fn(spark, SF_SMOKE).toPandas().iloc[0]

    con = _duck(SF_SMOKE, tables=("lineitem",))
    rows = con.execute(
        "SELECT CAST(l_quantity AS BIGINT), CAST(floor(l_discount*100 + 0.5) AS BIGINT)"
        " FROM lineitem"
    ).fetchall()
    x = np.array([r[0] for r in rows])
    y = np.array([r[1] for r in rows])
    xs, xi = np.unique(x, return_inverse=True)
    ys, yi = np.unique(y, return_inverse=True)
    h = np.zeros((len(xs), len(ys)), dtype=np.int64)
    np.add.at(h, (xi, yi), 1)
    # strictly-less prefix in both axes via cumulative sums
    px = np.cumsum(h, axis=0)
    lt_both = np.zeros_like(h)
    lt_both[1:, 1:] = np.cumsum(px, axis=1)[:-1, :-1]
    gt_y = np.zeros_like(h)  # x' < x, y' > y
    rev = np.cumsum(px[:, ::-1], axis=1)[:, ::-1]
    gt_y[1:, :-1] = rev[:-1, 1:]
    C = int((h * lt_both).sum())
    D = int((h * gt_y).sum())
    n = len(x)
    tx = int(sum(c * (c - 1) for c in np.bincount(xi)))
    ty = int(sum(c * (c - 1) for c in np.bincount(yi)))
    tau = 2.0 * (C - D) / np.sqrt(float(n * (n - 1) - tx) * float(n * (n - 1) - ty))

    assert int(got.concordant) == C
    assert int(got.discordant) == D
    assert abs(got.tau_b - tau) < 1e-12


def test_mannwhitney_vs_argsort_midranks(spark):
    """U and z vs an argsort-midrank serial reference (scipy-style
    rankdata by hand), including the tie-corrected variance."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_mannwhitney_u"].fn(spark, SF_SMOKE).toPandas().iloc[0]

    con = _duck(SF_SMOKE, tables=("lineitem",))
    rows = con.execute(
        "SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2))*100 AS BIGINT),"
        " CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END"
        " FROM lineitem WHERE l_returnflag IN ('R','A')"
    ).fetchall()
    v = np.array([r[0] for r in rows], dtype=np.int64)
    g = np.array([r[1] for r in rows], dtype=np.int64)
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v), dtype=np.float64)
    sv = v[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # midrank of 1-based i+1..j
        i = j
    n, n_r = len(v), int(g.sum())
    n_a = n - n_r
    r_r = ranks[g == 1].sum()
    u_r = r_r - n_r * (n_r + 1) / 2.0
    _, counts = np.unique(v, return_counts=True)
    tie3 = float((counts.astype(np.float64) ** 3 - counts).sum())
    var = n_r * n_a / 12.0 * ((n + 1) - tie3 / (n * (n - 1.0)))
    z = (u_r - n_r * n_a / 2.0) / np.sqrt(var)

    assert int(got.n_rows) == n and int(got.n_r) == n_r and int(got.n_a) == n_a
    assert abs(got.u_r - u_r) < 1e-6
    assert abs(got.z_stat - z) < 1e-9


def test_gk_lambda_reference_and_bounds(spark):
    """λ vs a pandas crosstab reference; PRE bounds 0 ≤ λ ≤ 1."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_gk_lambda"].fn(spark, SF_SMOKE).toPandas().iloc[0]

    con = _duck(SF_SMOKE, tables=("events",))
    rows = con.execute(
        "SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) % 86400 // 3600"
        " FROM events"
    ).fetchall()
    df = pd.DataFrame(rows, columns=["x", "y"])
    ct = pd.crosstab(df.x, df.y)
    n = ct.values.sum()
    lam_yx = (ct.max(axis=1).sum() - ct.sum(axis=0).max()) / (
        n - ct.sum(axis=0).max()
    )
    lam_xy = (ct.max(axis=0).sum() - ct.sum(axis=1).max()) / (
        n - ct.sum(axis=1).max()
    )
    assert int(got.n_rows) == n
    assert abs(got.lambda_y_given_x - lam_yx) < 1e-12
    assert abs(got.lambda_x_given_y - lam_xy) < 1e-12
    assert 0.0 <= got.lambda_y_given_x <= 1.0
    assert 0.0 <= got.lambda_x_given_y <= 1.0


def test_tv_drift_reference_and_range(spark):
    """TV distance vs a Counter-based serial reference; 0 ≤ TV ≤ 1 and
    TV ≥ max per-token gap / 2."""
    from collections import Counter

    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_tv_drift"].fn(spark, SF_SMOKE).toPandas().iloc[0]

    con = _duck(SF_SMOKE)
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    max_id = max(d for d, _ in docs)
    c1, c2 = Counter(), Counter()
    for doc_id, text in docs:
        target = c1 if doc_id * 2 <= max_id else c2
        target.update(text.split())
    n1, n2 = sum(c1.values()), sum(c2.values())
    vocab = set(c1) | set(c2)
    tv = sum(abs(c1[t] / n1 - c2[t] / n2) for t in vocab) / 2.0

    assert int(got.n_tokens_first) == n1
    assert int(got.n_tokens_second) == n2
    assert int(got.vocab) == len(vocab)
    assert abs(got.tv_distance - tv) < 1e-12
    assert 0.0 <= got.tv_distance <= 1.0
    assert got.tv_distance * 2.0 >= got.max_token_gap - 1e-15


def test_anova_vs_pandas_groupby(spark):
    """F and eta² vs pandas groupby reference; SSB + SSW = SST."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_anova"].fn(spark, SF_SMOKE).toPandas().iloc[0]

    con = _duck(SF_SMOKE, tables=("orders", "customer", "nation"))
    df = con.execute(
        "SELECT n.n_name AS g, CAST(o.o_totalprice AS DECIMAL(12,2)) AS y"
        " FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
        " JOIN nation n ON c.c_nationkey = n.n_nationkey"
    ).fetchdf()
    df["y"] = df["y"].astype(float)
    grand = df.y.mean()
    ssb = sum(len(s) * (s.mean() - grand) ** 2 for _, s in df.groupby("g").y)
    ssw = sum(((s - s.mean()) ** 2).sum() for _, s in df.groupby("g").y)
    k = df.g.nunique()
    n = len(df)
    f = (ssb / (k - 1)) / (ssw / (n - k))

    assert int(got.n_rows) == n and int(got.n_groups) == k
    assert abs(got.ss_between - ssb) / ssb < 1e-9
    assert abs(got.ss_within - ssw) / ssw < 1e-9
    assert abs(got.ss_total - (ssb + ssw)) / (ssb + ssw) < 1e-9
    assert abs(got.f_stat - f) / abs(f) < 1e-9
    assert 0.0 <= got.eta_squared <= 1.0


def test_acf_vs_numpy_convolution(spark):
    """rho_k vs a numpy fixed-mean reference over the SAME zero-filled
    calendar series; lag-0 normalization sanity and LB monotonicity."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_acf"].fn(spark, SF_SMOKE).toPandas()
    assert list(got.lag) == list(range(1, 15))

    con = _duck(SF_SMOKE, tables=("orders",))
    rows = con.execute(
        "SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS d, COUNT(*)"
        " FROM orders GROUP BY d ORDER BY d"
    ).fetchall()
    d0 = rows[0][0]
    span = rows[-1][0] - d0
    x = np.zeros(span + 1, dtype=np.int64)
    for d, c in rows:
        x[d - d0] = c
    xb = x.mean()
    denom = ((x - xb) ** 2).sum()
    for _, r in got.iterrows():
        k = int(r.lag)
        rho = ((x[:-k] - xb) * (x[k:] - xb)).sum() / denom
        assert abs(r.rho_k - rho) < 1e-9, f"lag {k}"
        assert int(r.n_pairs) == len(x) - k
    # Ljung-Box is a cumulative sum of squares: nondecreasing in lag.
    assert (np.diff(got.ljung_box_q.values) >= -1e-12).all()


def test_gram_matrix_vs_numpy(spark):
    """Integer Gram vs numpy: quantize identically, compare X^T X upper
    triangle cell-for-cell (exact integer equality)."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_gram_matrix"].fn(spark, SF_SMOKE).toPandas()
    d = 64
    assert len(got) == d * (d + 1) // 2

    con = _duck(SF_SMOKE, tables=("embeddings",))
    emb = con.execute("SELECT embedding FROM embeddings").fetchall()
    X = np.array([e[0] for e in emb], dtype=np.float64)
    Q = np.floor(X * 32768.0 + 0.5).astype(np.int64)
    G = Q.T @ Q
    lut = {(int(r.i), int(r.j)): int(r.gram_q) for r in got.itertuples()}
    for i in range(d):
        for j in range(i, d):
            assert lut[(i, j)] == G[i, j], (i, j)
    # normalized diagonal ≈ mean squared component (embeddings ~unit-norm/√d)
    diag = got[got.i == got.j].gram.values
    assert (diag > 0).all()


def test_mcnemar_cells_partition_and_guard(spark):
    """The 2×2 cells partition the corpus; chi² recomputes from b, c."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_mcnemar"].fn(spark, SF_SMOKE).toPandas().iloc[0]
    con = _duck(SF_SMOKE)
    n_docs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    cells = [int(got.both_flag), int(got.only_a), int(got.only_b), int(got.neither)]
    assert sum(cells) == n_docs
    b, c = int(got.only_a), int(got.only_b)
    if b + c > 0:
        assert abs(got.mcnemar_chi2 - (b - c) ** 2 / (b + c)) < 1e-12
    else:
        assert pd.isna(got.mcnemar_chi2)


def test_poisson_rate_counts_and_z(spark):
    """Half-counts partition each type's total; z recomputes serially."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_poisson_rate"].fn(spark, SF_SMOKE).toPandas()
    con = _duck(SF_SMOKE, tables=("events",))
    totals = dict(
        con.execute(
            "SELECT event_type, COUNT(*) FROM events WHERE ts IS NOT NULL GROUP BY 1"
        ).fetchall()
    )
    for r in got.itertuples():
        assert int(r.first_half) + int(r.second_half) == totals[r.event_type]
        z = (r.first_half - r.second_half) / np.sqrt(r.first_half + r.second_half)
        assert abs(r.rate_z - z) < 1e-12


def test_did_vs_pandas_cells(spark):
    """DiD estimate and SE vs a pandas four-cell reference."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_diff_in_diff"].fn(spark, SF_SMOKE).toPandas().iloc[0]
    con = _duck(SF_SMOKE, tables=("events",))
    df = con.execute(
        "SELECT CAST(user_id % 2 AS INT) AS treat, value, epoch_ns(ts)//1000 AS t"
        " FROM events WHERE ts IS NOT NULL AND value IS NOT NULL"
    ).fetchdf()
    t0, t1 = df.t.min(), df.t.max()
    df["post"] = ((df.t - t0) * 2 > (t1 - t0)).astype(int)
    m = {
        (t, p): s.value
        for (t, p), s in df.groupby(["treat", "post"])
    }
    est = (m[(1, 1)].mean() - m[(1, 0)].mean()) - (
        m[(0, 1)].mean() - m[(0, 0)].mean()
    )
    se = np.sqrt(sum(m[k].var(ddof=1) / len(m[k]) for k in m))
    assert abs(got.did_estimate - est) < 1e-6
    # dxsum2 rounds the second-moment sum to scale 2 (documented ±0.005
    # snap) before the double cast — the SE inherits ~1e-8 of that.
    assert abs(got.did_se - se) / se < 1e-6
    assert {int(got.n_t1), int(got.n_t0), int(got.n_c1), int(got.n_c0)} == {
        len(m[(1, 1)]), len(m[(1, 0)]), len(m[(0, 1)]), len(m[(0, 0)])
    }


def test_chisq_keywords_cell_identity(spark):
    """Per-row 2×2 identity a+b = token total, a+c = source total, and the
    chi² recomputation from the four cells."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_chisq_keywords"].fn(spark, SF_SMOKE).toPandas()
    assert (got.groupby("source").size() <= 3).all()
    con = _duck(SF_SMOKE)
    tok_tot = dict(
        con.execute(
            "SELECT tok, COUNT(*) FROM (SELECT unnest(string_split_regex(text, ' +')) AS tok"
            " FROM documents) GROUP BY tok"
        ).fetchall()
    )
    n = sum(tok_tot.values())
    for r in got.itertuples():
        a, b = int(r.in_source), int(r.elsewhere)
        assert a + b == tok_tot[r.token]
        # recompute chi2 serially from the full 2x2
        src_tot = con.execute(
            "SELECT COUNT(*) FROM (SELECT unnest(string_split_regex(text, ' +'))"
            f" FROM documents WHERE source = '{r.source}')"
        ).fetchone()[0]
        c = src_tot - a
        d = n - a - b - c
        chi2 = n * (a * d - b * c) ** 2 / (
            (a + b) * (c + d) * (a + c) * (b + d)
        )
        assert abs(r.chi2 - chi2) / max(abs(chi2), 1e-12) < 1e-9


def test_zipf_deciles_cover_and_cv(spark):
    """Deciles cover the full bigram vocabulary; min ≤ mean ≤ max within
    each decile; global CV equals the serial recomputation."""
    from collections import Counter

    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_zipf_check"].fn(spark, SF_SMOKE).toPandas()
    con = _duck(SF_SMOKE)
    docs = con.execute("SELECT text FROM documents").fetchall()
    freq = Counter()
    for (text,) in docs:
        toks = text.split()
        freq.update(zip(toks, toks[1:]))
    v = len(freq)
    assert int(got.n_points.sum()) == v
    assert (got.min_rf <= got.mean_rf + 1e-9).all()
    assert (got.mean_rf <= got.max_rf + 1e-9).all()
    # serial r·f with the same (f desc, w1, w2) total order
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    rf = np.array([(i + 1) * f for i, (_, f) in enumerate(ranked)], dtype=np.float64)
    cv = rf.std(ddof=0) / rf.mean()
    assert abs(got.global_cv.iloc[0] - cv) < 1e-9


def test_modularity_vs_networkx_free_reference(spark):
    """Q vs a dict-based serial reference on the same edge set; the
    identity Q = Σ contributions; and the degree-sum identity Σd_c = 2m."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_modularity"].fn(spark, SF_SMOKE).toPandas()
    con = _duck(SF_SMOKE, tables=("orders", "lineitem", "customer", "supplier"))
    rows = con.execute(
        "SELECT c.c_nationkey AS cn, s.s_nationkey AS sn"
        " FROM (SELECT DISTINCT o.o_custkey AS cu, l.l_suppkey AS su"
        "       FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey) e"
        " JOIN customer c ON e.cu = c.c_custkey"
        " JOIN supplier s ON e.su = s.s_suppkey"
    ).fetchall()
    m = len(rows)
    e_c: dict = {}
    d_c: dict = {}
    for cn, sn in rows:
        if cn == sn:
            e_c[cn] = e_c.get(cn, 0) + 1
        d_c[cn] = d_c.get(cn, 0) + 1
        d_c[sn] = d_c.get(sn, 0) + 1
    q_ref = sum(
        e_c.get(k, 0) / m - (d_c[k] / (2 * m)) ** 2 for k in d_c
    )
    assert sum(d_c.values()) == 2 * m
    assert abs(got.modularity_q.iloc[0] - q_ref) < 1e-12
    assert abs(got.contribution.sum() - got.modularity_q.iloc[0]) < 1e-9
    assert int(got.degree_sum.sum()) == 2 * m
    assert -0.5 <= got.modularity_q.iloc[0] <= 1.0


def test_rolling_regression_vs_numpy_polyfit(spark):
    """Every emitted window's slope/intercept vs numpy lstsq on the same
    28 days of the zero-gap daily series (windows are over OBSERVED days,
    matching the query's ROWS frame)."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_rolling_regression"].fn(spark, SF_SMOKE).toPandas()
    assert len(got) > 0
    con = _duck(SF_SMOKE, tables=("orders",))
    rows = con.execute(
        "SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT)//86400 AS t, COUNT(*)"
        " FROM orders GROUP BY t ORDER BY t"
    ).fetchall()
    ts = np.array([r[0] for r in rows], dtype=np.float64)
    ys = np.array([r[1] for r in rows], dtype=np.float64)
    idx = {int(t): i for i, t in enumerate(ts)}
    for r in got.itertuples():
        i = idx[int(r.day_no)]
        x, y = ts[i - 27 : i + 1], ys[i - 27 : i + 1]
        assert len(x) == 28 == int(r.window_days)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(r.slope_28d - slope) < 1e-9
        assert abs(r.intercept_28d - intercept) < 1e-6


def test_modularity_of_composes_with_partitions(spark):
    """The generic scorer agrees with q_modularity on the nation
    partition, scores the one-community partition at exactly 0, and the
    trade graph's bipartite 2-coloring at exactly -1/2 (no within-class
    edges, two equal degree halves)."""
    from pyspark.sql import functions as F

    from nyc_taxi_lakehouse_spark.operators.graph import modularity_of
    from nyc_taxi_lakehouse_spark.registry import all_queries
    from nyc_taxi_lakehouse_spark.sources.tables import load_tables

    t = load_tables(spark, SF_SMOKE, ["orders", "lineitem", "customer", "supplier"])
    edges = (
        t["orders"]
        .join(t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )
    nodes = edges.select(F.col("a").alias("node")).unionAll(
        edges.select(F.col("b").alias("node"))
    ).distinct()

    # nation partition == q_modularity's Q
    cust = t["customer"].select(
        (F.col("c_custkey") * 2).alias("node"), F.col("c_nationkey").alias("label")
    )
    supp = t["supplier"].select(
        (F.col("s_suppkey") * 2 + 1).alias("node"), F.col("s_nationkey").alias("label")
    )
    q_nation = modularity_of(edges, cust.unionAll(supp))
    ref = all_queries()["q_modularity"].fn(spark, SF_SMOKE).toPandas()
    assert abs(q_nation - ref.modularity_q.iloc[0]) < 1e-12

    # one community: Q == 0 exactly
    one = nodes.select("node", F.lit(0).alias("label"))
    assert modularity_of(edges, one) == 0.0

    # bipartite coloring (customer vs supplier): e_c = 0, equal degree
    # halves -> Q = -(1/4 + 1/4)... with d_cust = d_supp = m: Q = -1/2.
    sides = nodes.select("node", (F.col("node") % 2).alias("label"))
    assert abs(modularity_of(edges, sides) - (-0.5)) < 1e-12
