"""Local mirror of the driver's DuckDB-oracle differential check.

Runs each registered Spark query and its DuckDB oracle on the same parquet
tables and asserts row-count, column-name, and exact value equality (after
sorting columns by name and rows by value — same normalization the driver's
order-insensitive value-hash implies). Stricter than a tolerance compare on
purpose: the engine's determinism strategy (decimal sums, explicit
tiebreakers) should make results match bit-for-bit.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb
import pandas as pd

from nyc_taxi_lakehouse_spark.sources.tables import TABLES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _norm_cell(v):
    """Normalize a cell for comparison.

    Deliberately type-sensitive for numerics (int 5 != float 5.0): the
    driver's value-hash stringifies values, so a DuckDB HUGEINT arriving in
    pandas as float would hash differently from Spark's int — the engine must
    emit identical *types*, not just equal values.
    """
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if isinstance(v, bool) or type(v).__name__.startswith("bool"):
        return ("b", bool(v))
    if isinstance(v, (int,)) or type(v).__name__.startswith("int"):
        return ("i", int(v))
    if isinstance(v, float) or type(v).__name__.startswith("float"):
        return ("f", float(v))
    return v


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(type(x)), x) for x in r))


def compare(spark_df, duck_df: pd.DataFrame, name: str) -> None:
    try:
        spd = spark_df.toPandas()
    finally:
        # Result consumed (or the consume crashed) — release the query's
        # materialize-once checkpoints either way so a long oracle-gate
        # session stays bounded (ADVICE r9).
        from nyc_taxi_lakehouse_spark.plans.ckpt import release_run_checkpoints

        release_run_checkpoints()
    assert sorted(spd.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch spark={sorted(spd.columns)} duck={sorted(duck_df.columns)}"
    )
    assert len(spd) == len(duck_df), (
        f"{name}: row count spark={len(spd)} duck={len(duck_df)}"
    )
    a, b = normalize(spd), normalize(duck_df)
    n_bad = 0
    first = None
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            n_bad += 1
            if first is None:
                first = (i, ra, rb)
    assert n_bad == 0, f"{name}: {n_bad}/{len(a)} mismatched rows; first: {first}"
