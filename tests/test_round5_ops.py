"""Behavioral tests for the round-5 operators: exact kNN via grid
blocking + geometric ring expansion — pinned against an independent
python brute-force reference (the parity gate's DuckDB oracle is itself
a cross product, but a shared formula bug in the synthetic coordinates
would fool it; this reference recomputes everything from first
principles).
"""

from __future__ import annotations

import duckdb

from .conftest import SF_SMOKE


def _duck(sf_dir: str, tables=("customer", "supplier")):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _coords(key: int, mx: int, my: int) -> tuple[int, int]:
    return (key * mx) % 65536, (key * my) % 65536


def test_spatial_knn_exact_vs_bruteforce(spark):
    """Ring expansion must yield the TRUE k nearest suppliers for every
    probe — exactly k rows each (|suppliers| >= k at every SF), ranks
    1..k in nondecreasing distance, ties broken by suppkey — equal to
    the serial O(N*M) scan. At the smoke SF the corpus is 10 suppliers
    over 1024 cells, so almost every probe's 3x3 neighborhood is empty
    and the expansion loop genuinely runs (asserted: some true neighbor
    lies beyond the one-cell radius the radius-bounded q_spatial_knn
    would have searched)."""
    from nyc_taxi_lakehouse_spark.operators.spatial import (
        _CELL, _KNN_K, _MX_C, _MX_S, _MY_C, _MY_S,
    )
    from nyc_taxi_lakehouse_spark.registry import all_queries

    got = all_queries()["q_spatial_knn_exact"].fn(spark, SF_SMOKE).collect()
    con = _duck(SF_SMOKE)
    custs = [r[0] for r in con.execute("SELECT c_custkey FROM customer").fetchall()]
    supps = [r[0] for r in con.execute("SELECT s_suppkey FROM supplier").fetchall()]
    assert len(supps) >= _KNN_K

    expected = {}
    for ck in custs:
        cx, cy = _coords(ck, _MX_C, _MY_C)
        ranked = sorted(
            ((cx - sx) ** 2 + (cy - sy) ** 2, sk)
            for sk in supps
            for sx, sy in [_coords(sk, _MX_S, _MY_S)]
        )
        expected[ck] = ranked[:_KNN_K]

    assert len(got) == len(custs) * _KNN_K
    by_probe = {}
    for row in got:
        by_probe.setdefault(row.custkey, []).append((row.rk, row.suppkey, row.dist2))
    assert set(by_probe) == set(expected)
    for ck, rows in by_probe.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, _KNN_K + 1))
        assert [(d2, sk) for _, sk, d2 in rows] == expected[ck]

    # The expansion loop must have done real work: at this sparsity some
    # probe's nearest neighbor lies beyond the 3x3 neighborhood (its
    # distance exceeds 2*CELL, which no cell at Chebyshev distance <= 1
    # can contain).
    max_nn = max(rows[0][2] for rows in by_probe.values())
    assert max_nn > (2 * _CELL) ** 2
