"""Shared result-invariance observables (r9 review finding: the skew
report tool and tests/test_skew.py each spelled the content hash and the
conf-swap helper; two spellings of the SAME observable can drift, after
which the CI gate and the committed measurement tables silently measure
different things)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_hash_frame(df: DataFrame) -> DataFrame:
    """One-row frame (s, n): order-independent executor-side content hash
    (SUM of xxhash64 over all columns cast to string, decimal(38,0) so a
    billion-row sum cannot overflow) plus the row count. Stable across
    plan shapes for the registry's deterministic output types (exact
    ints/decimals/strings); a mismatch between two plans of the same
    query is a real nondeterminism bug or a float seam — both findings."""
    cols = sorted(df.columns)
    # NULL sentinel (r9 review): Spark's hash functions SKIP null inputs
    # (the running hash is unchanged), so rows differing only in WHICH
    # column holds a value — (NULL,'x') vs ('x',NULL) — would collide.
    # Coalescing to a sentinel no real string equals closes the seam.
    sent = "\x00<null>\x00"
    return df.select(
        F.xxhash64(
            *[F.coalesce(F.col(c).cast("string"), F.lit(sent)) for c in cols]
        ).alias("h")
    ).agg(
        F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )


def content_hash(df: DataFrame) -> tuple:
    """(hash, row count) — collects the one-row frame."""
    row = content_hash_frame(df).collect()[0]
    return row["s"], row["n"]


def with_conf(spark, conf: dict) -> dict:
    """Set session confs, returning the prior values (pass the return back
    to restore). A key with no registered default saves as None and the
    restore pass UNSETS it — spark.conf.get(k) would otherwise raise
    before anything was set, bypassing the caller's try/finally (r9
    review finding)."""
    saved = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
    return saved
