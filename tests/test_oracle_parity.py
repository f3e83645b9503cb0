"""Differential tests: every registered query vs its DuckDB oracle at sf0.01.

This mirrors the driver's t2 correctness gate (CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import pytest

from nyc_taxi_lakehouse_spark.registry import all_queries

from .oracle import compare, duck_connection

SPECS = all_queries()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.fixture(scope="module")
def duck_smoke():
    from .conftest import SF_SMOKE

    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_parity(name, spark, sf_dir, duck):
    spec = SPECS[name]
    result = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        # Rows-only check, same as the driver's weaker path.
        assert result.count() >= 0
        return
    expected = duck.execute(spec.oracle).fetchdf()
    compare(result, expected, name)


@pytest.mark.parametrize("name", sorted(n for n in SPECS if SPECS[n].oracle))
def test_query_parity_smoke_sf(name, spark, duck_smoke):
    """Same gate at the SMALLEST scale factor. Tiny data hits different
    numeric edge cases — an sf0.001-only run caught a cross-engine ROUND
    divergence (dround in detsql.py) that sf0.01/sf0.1 never exposed."""
    from .conftest import SF_SMOKE

    spec = SPECS[name]
    result = spec.fn(spark, SF_SMOKE)
    expected = duck_smoke.execute(spec.oracle).fetchdf()
    compare(result, expected, name)
