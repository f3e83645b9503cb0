"""Cardinality bounds behind the whitelisted single-partition windows.

tests/test_plan_lint.py consciously whitelists queries whose plan contains a
single-partition WindowExec because the window's INPUT is bounded-grain
(calendar days, a saturating value domain, a dictionary vocabulary, a fixed
bucket count) rather than corpus-grain. Those bounds were prose until now
(VERDICT r05 #6): if a data change ever broke one, the query would silently
serialize a corpus-scale table through one task instead of failing. This
file asserts one representative bound per family, measured on the actual
testdata with DuckDB (grain checks need no Spark session).
"""

from __future__ import annotations

import duckdb
import pytest

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def _one(con, sql: str) -> int:
    return con.execute(sql).fetchone()[0]


def test_calendar_day_grain_is_calendar_bounded(con):
    """q_dau_wau_mau / q_runs_test / q_acf / q_sprt family: the cumulative
    window runs over the per-DAY aggregate. The day spine is bounded by
    the dataset calendar (1995-01-01..2001-08-01 → 2405 days), a constant
    independent of row count — the bound that makes the single-partition
    cumulative walk safe at any SF."""
    for sf in SFS:
        days = _one(
            con, f"SELECT COUNT(DISTINCT o_orderdate) FROM '{sf}/orders.parquet'"
        )
        assert days <= 2406, f"{sf}: day grain {days} exceeded the calendar bound"


def test_event_value_domain_saturates(con):
    """q_wasserstein / q_ks_drift / q_auc family: the prefix walk runs over
    the DISTINCT cent-snapped value table, never the raw stream. The value
    domain is bounded by the cent grid over the observed range (~56k cells
    here) and must grow strictly sublinearly in rows — if distinct values
    ever tracked row count, the 'per-value aggregate' would be corpus-grain
    and the whitelisted single-partition sweep would serialize the corpus."""
    prev_vals = prev_rows = None
    for sf in SFS:
        vals = _one(
            con,
            "SELECT COUNT(DISTINCT CAST(floor(value*100+0.5) AS BIGINT)) "
            f"FROM '{sf}/events.parquet' WHERE value IS NOT NULL",
        )
        rows = _one(con, f"SELECT COUNT(*) FROM '{sf}/events.parquet'")
        assert vals <= 100_000, f"{sf}: value domain {vals} left the cent grid"
        if prev_vals is not None:
            row_ratio = rows / prev_rows
            val_ratio = vals / prev_vals
            assert val_ratio < row_ratio, (
                f"{sf}: distinct values grew {val_ratio:.1f}x vs rows "
                f"{row_ratio:.1f}x — value domain no longer saturating"
            )
        prev_vals, prev_rows = vals, rows


def test_vocab_dictionary_grain_is_dictionary_bounded(con):
    """q_dedup_minhash / q_dedup_simhash / q_lsh_calibration family: the
    oracle-anchor dictionary sort ranks the DISTINCT token vocabulary (the
    production path uses xxhash64 and has no sort at all). The vocabulary
    must stay dictionary-scale — orders of magnitude below the token
    stream it encodes."""
    for sf in SFS:
        vocab = _one(
            con,
            "SELECT COUNT(DISTINCT tok) FROM (SELECT unnest(string_split("
            f"lower(text), ' ')) AS tok FROM '{sf}/documents.parquet')",
        )
        tokens = _one(
            con,
            "SELECT SUM(len(string_split(text, ' '))) "
            f"FROM '{sf}/documents.parquet'",
        )
        assert vocab <= 10_000, f"{sf}: vocabulary {vocab} is no longer bounded"
        assert vocab * 100 <= tokens, (
            f"{sf}: vocab {vocab} within 100x of the {tokens}-token stream"
        )


def test_rank2_bucket_offset_window_is_64_rows(con):
    """q_spearman / q_mannwhitney_u family: detsql.rank2_ctes buckets the
    value range into a fixed grid, so the only ordered window runs over
    the <=64-row bucket-offset table. Pin the constant AND the runtime
    grain: the bucket id formula over the real data can never emit more
    than `buckets` distinct ids."""
    import inspect

    from nyc_taxi_lakehouse_spark.functions import detsql

    sig = inspect.signature(detsql.rank2_ctes)
    buckets = sig.parameters["buckets"].default
    assert buckets == 64
    for sf in SFS:
        n = _one(
            con,
            f"""
            WITH b AS (SELECT MIN(l_extendedprice) AS vmin,
                              MAX(l_extendedprice) AS vmax
                       FROM '{sf}/lineitem.parquet')
            SELECT COUNT(DISTINCT CAST((l_extendedprice - b.vmin) * {buckets}
                       AS BIGINT) // CAST(b.vmax - b.vmin + 1 AS BIGINT))
            FROM '{sf}/lineitem.parquet' CROSS JOIN b
            """,
        )
        assert n <= buckets, f"{sf}: bucket grid emitted {n} > {buckets} ids"
