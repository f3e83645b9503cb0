"""Custom Python DataSource (Spark 4 DataSource API) — deterministic
synthetic event generator.

The reference ingests from fixed external feeds; an engine replacing it
needs a first-class way to plug NEW sources in. Spark 4's Python DataSource
API is the idiomatic extension point: implement DataSource/DataSourceReader,
register once per session, then `spark.read.format("synthevents")` behaves
like any built-in format — schema projection, partition-parallel reads,
Arrow transfer, the lot.

The generator is pure integer hash arithmetic over the row index, so the
produced table is a deterministic function of (n_rows, n_partitions=ANY):
partitioning changes parallelism, never content. That makes the source
oracle-checkable: DuckDB's generate_series with the same formulas produces
the identical relation (q_synth_source hash-matches it), which is also the
correctness story for using it as a reproducible load/scale-test feed.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_A_USER = 2654435761  # Knuth multiplicative constants, as in llm/curation.py
_A_TYPE = 40503
_A_CENTS = 69069
_B = 104729
_N_USERS = 1000
_TYPES = ["click", "view", "purchase", "signup", "error"]
_BASE_TS = 1_704_067_200  # 2024-01-01T00:00:00Z
_PERIOD_S = 30 * 86400

SCHEMA = (
    "event_id BIGINT, user_id BIGINT, event_type STRING, cents BIGINT, ts_s BIGINT"
)


def row_at(i: int) -> tuple[int, int, str, int, int]:
    """The pure generator: row i of the synthetic relation (engine-agnostic
    integer arithmetic — mirrored verbatim in the DuckDB oracle SQL)."""
    user = (i * _A_USER + _B) % _N_USERS
    etype = _TYPES[(i * _A_TYPE + _B) % len(_TYPES)]
    cents = (i * _A_CENTS + _B) % 50_000
    ts_s = _BASE_TS + (i * _A_USER + _B) % _PERIOD_S
    return (i, user, etype, cents, ts_s)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SynthEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 10_000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        # Contiguous row-index ranges — each task generates its slice
        # independently (no shared state, no skew: ranges are equal-width).
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield row_at(i)


class SynthEventsDataSource(DataSource):
    """spark.read.format("synthevents").option("rows", N).load()"""

    @classmethod
    def name(cls) -> str:
        return "synthevents"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SynthEventsReader:
        return SynthEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SynthEventsStreamReader":
        return SynthEventsStreamReader(self.options)


class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of the batch reader: the same deterministic relation
    delivered as micro-batches of `rowsPerBatch`, with the row index as the
    stream offset. Offsets are plain dicts checkpointed by the engine, so a
    restarted query resumes exactly where it left off — replayability comes
    from the generator being a pure function of the index range, the same
    property a Kafka offset range or a file listing gives real sources
    (SURVEY §2.9 ST6 startingOffsets semantics, re-expressed for a custom
    source)."""

    def __init__(self, options: dict):
        self.n_total = int(options.get("rows", 10_000))
        self.per_batch = int(options.get("rowsPerBatch", 1_000))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = int(start["i"])
        hi = min(lo + self.per_batch, self.n_total)
        return iter([row_at(i) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # Deterministic replay for recovery: regenerate the exact slice.
        return iter([row_at(i) for i in range(int(start["i"]), int(end["i"]))])


def register(spark) -> None:
    """Idempotent session registration."""
    spark.dataSource.register(SynthEventsDataSource)


def oracle_sql(n_rows: int) -> str:
    """DuckDB twin of the generator, for the parity gate."""
    types = ", ".join(f"'{t}'" for t in _TYPES)
    return f"""
WITH gen AS (
  SELECT i AS event_id,
         (i * {_A_USER} + {_B}) % {_N_USERS} AS user_id,
         ([{types}])[((i * {_A_TYPE} + {_B}) % {len(_TYPES)}) + 1] AS event_type,
         (i * {_A_CENTS} + {_B}) % 50000 AS cents,
         {_BASE_TS} + (i * {_A_USER} + {_B}) % {_PERIOD_S} AS ts_s
  FROM (SELECT unnest(range(0, {n_rows})) AS i)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(MIN(ts_s) AS BIGINT) AS first_ts,
       CAST(MAX(ts_s) AS BIGINT) AS last_ts
FROM gen
GROUP BY event_type
"""


def _register_query() -> None:
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql import functions as F

    from ..registry import df_query

    n_rows = 60_000

    @df_query(
        "q_synth_source",
        duck_sql=oracle_sql(n_rows),
        tables=[],
        doc="Custom Python DataSource end-to-end (Spark 4 DataSource API): "
        "the deterministic synthetic event feed read through "
        "spark.read.format('synthevents') with 16 partition-parallel "
        "range readers, aggregated per type with exact integer sums. The "
        "DuckDB oracle regenerates the identical relation via "
        "generate_series + the same hash formulas, so the WHOLE custom "
        "source path — plugin registration, partition planning, Python "
        "reader iteration, Arrow batch transfer — is hash-verified, not "
        "just smoke-tested. Content is partition-count-invariant by "
        "construction (pure function of the row index), which is exactly "
        "the property that makes a source safe to repartition at scale.",
    )
    def q_synth_source(spark: SparkSession, sf_dir: str) -> DataFrame:
        register(spark)
        df = (
            spark.read.format("synthevents")
            .option("rows", n_rows)
            .option("partitions", 16)
            .load()
        )
        return df.groupBy("event_type").agg(
            F.count("*").cast("bigint").alias("n"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum("cents").cast("bigint").alias("total_cents"),
            F.min("ts_s").cast("bigint").alias("first_ts"),
            F.max("ts_s").cast("bigint").alias("last_ts"),
        )


_register_query()


# ---------------------------------------------------------------------------
# Writer half of the Python DataSource API: a partition-parallel JSONL sink
# with task-level commit messages (the two-phase commit contract).
# ---------------------------------------------------------------------------

import json as _json
import os as _os
import uuid as _uuid

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class JsonlSinkWriter(DataSourceWriter):
    """Each task writes its partition to a uniquely-named staging file and
    returns a commit message; commit() atomically publishes the manifest
    (the same two-phase task-commit/job-commit contract FileFormatWriter
    implements for parquet — uncommitted task files are simply never
    referenced). abort() removes staged files."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, rows) -> _JsonlCommit:
        _os.makedirs(self.path, exist_ok=True)
        fname = _os.path.join(self.path, f"part-{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w") as fh:
            for row in rows:
                fh.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(fname, n)

    def commit(self, messages) -> None:
        manifest = {
            "files": sorted(m.path for m in messages if m is not None),
            "rows": sum(m.n_rows for m in messages if m is not None),
        }
        tmp = _os.path.join(self.path, "_MANIFEST.tmp")
        with open(tmp, "w") as fh:
            _json.dump(manifest, fh)
        _os.replace(tmp, _os.path.join(self.path, "_MANIFEST.json"))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and _os.path.exists(m.path):
                _os.remove(m.path)


class JsonlSinkDataSource(DataSource):
    """`df.write.format("jsonl_sink").option("path", ...).save()` — the
    writer counterpart of SynthEventsDataSource's reader/stream halves,
    completing the Python DataSource surface (reader, simple stream
    reader, writer)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
