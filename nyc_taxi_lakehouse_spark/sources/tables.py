"""Batch sources: the driver-provided parquet star schema.

Maps reference operator S1 (parquet batch scan, nyc_taxi_to_iceberg.py:84) and
S3 (catalog scan — here temp views registered over parquet). At cluster scale
these would be catalog tables (Delta/Iceberg); locally we read the parquet
directly so Catalyst's DataSource v2 pushdown (PushedFilters / ReadSchema)
applies to every downstream query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import configure_runtime

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def _source_snapshot(path: str):
    """Cheap on-disk fingerprint of a parquet source: (mtime_ns, size) for
    a single file, plus the sorted top-level entry stats for a directory
    dataset. Keys the per-session table memo below so a source regenerated
    in place (the test fixtures rmtree-and-rebuild derived datasets at
    fixed /tmp paths — the ADVICE-r10 staleness class) yields a DIFFERENT
    key and forces a fresh read; never returns a reusable key for a
    missing path."""
    import os
    import stat as statmod

    try:
        st = os.stat(path)
    except OSError:
        return None
    if statmod.S_ISDIR(st.st_mode):
        entries = []
        try:
            with os.scandir(path) as it:
                for e in it:
                    es = e.stat()
                    entries.append((e.name, es.st_mtime_ns, es.st_size))
        except OSError:
            return None
        entries.sort()
        return (st.st_mtime_ns, tuple(entries))
    return (st.st_mtime_ns, st.st_size)


def load_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Read the requested tables and register them as temp views.

    Registering views lets every query be expressed as Spark SQL (the
    reference's dominant style — spark.sql over catalog tables,
    comprehensive_analytics.py:204) while staying fully Catalyst-optimizable.

    The table DataFrame is memoized per session keyed on the source's
    on-disk fingerprint (optimization r11, guide §1.2: ``spark.read.
    parquet`` runs a schema-inference job on EVERY call — ~170 ms/table
    warm — and the bench/oracle harnesses construct each query fresh per
    run, so the suite paid hundreds of redundant footer reads). This is
    catalog-METADATA caching, exactly what a production catalog table
    gives: every action still scans the parquet; a source regenerated in
    place changes its fingerprint and is re-read; the memo dies with the
    session object."""
    configure_runtime(spark)
    cache: dict = spark.__dict__.setdefault("_lakehouse_table_memo", {})
    out: dict[str, DataFrame] = {}
    for name in tables or TABLES:
        path = table_path(sf_dir, name)
        key = _source_snapshot(path)
        hit = cache.get(path)
        if key is not None and hit is not None and hit[0] == key:
            df = hit[1]
        else:
            df = spark.read.parquet(path)
            if name == "events":
                from pyspark.sql import functions as F
                from pyspark.sql.types import LongType

                ts_type = df.schema["ts"].dataType
                if isinstance(ts_type, LongType):
                    # Nanosecond-precision parquet read as raw longs (see
                    # session.configure_runtime nanosAsLong); truncate to
                    # microseconds. Microsecond-precision generations arrive
                    # as TIMESTAMP_NTZ already and need no conversion.
                    df = df.withColumn(
                        "ts", F.timestamp_micros(F.expr("ts div 1000"))
                    )
            if key is not None:
                cache[path] = (key, df)
        # ALWAYS re-register the view: tests and llm/pipeline.py shadow
        # table names (e.g. "documents") with their own temp views and
        # rely on the next load_tables restoring the real one — skipping
        # registration on a memo hit would silently keep the shadow.
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
