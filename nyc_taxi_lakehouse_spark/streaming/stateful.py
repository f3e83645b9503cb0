"""Custom stateful streaming operator via applyInPandasWithState.

Built-in stateful operators (windowed aggs, dropDuplicates, session_window)
cover the reference's surface; this module adds the CUSTOM-state escape
hatch for semantics none of them express: a per-user running profile
(lifetime count / total / EWMA of event values) that updates every
micro-batch and emits the refreshed profile rows.

Arrow-batched like every sanctioned Python path in this repo: the handler
receives whole pandas batches per key group, state is a tiny tuple, and
output rows per batch are bounded by the number of ACTIVE keys in that
batch — not by history. State is checkpointed by the engine, so restarts
resume exactly (pinned by tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_EWMA_ALPHA = 0.2

# total is tracked as integer CENTS (values are exact 2-decimal doubles):
# integer accumulation is associative and exact, so the emitted total_value
# (cents / 100.0, one correctly-rounded division) is bit-identical to an
# exact-decimal SQL SUM over the same rows — the same determinism convention
# as functions/detsql.dsum, which makes the operator oracle-checkable.
STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total_cents", LongType()),
        StructField("ewma", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("ewma_value", DoubleType()),
    ]
)


def _update_profile(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, cents, ewma = state.get if state.exists else (0, 0, None)
    for pdf in batches:
        # Deterministic within-batch order: event values applied in event_time
        # order so the EWMA is replay-stable.
        for v in pdf.sort_values("event_time")["value"]:
            n += 1
            cents += int(round(float(v) * 100))
            ewma = float(v) if ewma is None else _EWMA_ALPHA * float(v) + (1 - _EWMA_ALPHA) * ewma
    state.update((n, cents, ewma))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [cents / 100.0],
            "ewma_value": [ewma],
        }
    )


def running_user_profile(parsed: DataFrame) -> DataFrame:
    """parsed: the parse_cdc output stream. Returns one refreshed profile row
    per user active in each micro-batch."""
    return parsed.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- Streaming Misra-Gries heavy hitters ---------------------------------

_MG_STREAM_K = 64  # counters per shard

MG_STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n", LongType()),
    ]
)

MG_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("key", StringType()),
        StructField("lower_bound", LongType()),
        StructField("shard_n", LongType()),
    ]
)


def _update_mg(key, batches, state):
    """Per-shard streaming Misra-Gries: state is ≤ k (key, count) counters
    plus the shard's stream length; each micro-batch folds its exact
    value_counts in (the same mg_fold as the batch operator — one algorithm,
    two execution modes) and emits the refreshed summary."""
    from ..operators.frequency import mg_fold

    (shard,) = key
    if state.exists:
        keys, counts, n = state.get
        counters = pd.Series(list(counts), index=list(keys), dtype="int64")
    else:
        counters, n = pd.Series(dtype="int64"), 0
    for pdf in batches:
        vc = pdf["key"].value_counts()
        n += int(vc.sum())
        counters = mg_fold(counters, vc, _MG_STREAM_K)
    state.update(
        (
            [str(x) for x in counters.index],
            [int(x) for x in counters.to_numpy()],
            n,
        )
    )
    yield pd.DataFrame(
        {
            "shard": shard,
            "key": counters.index.astype(str),
            "lower_bound": counters.to_numpy(dtype="int64"),
            "shard_n": n,
        }
    )


def streaming_heavy_hitter_candidates(
    keyed: DataFrame, key_col: str, n_shards: int = 8
) -> DataFrame:
    """Sharded streaming MG: keys hash-partition across n_shards state
    groups, each maintaining a k-counter summary. A key lives wholly in one
    shard, so a key with global frequency > n·s is guaranteed in its
    shard's summary whenever k ≥ n_shard/(n·s) ≈ 1/(n_shards·s) — the
    shard fan-out DIVIDES the k each summary needs (k=64 × 8 shards covers
    support ~0.2%). State is O(k) per shard forever; emissions per batch
    are ≤ k rows per ACTIVE shard."""
    sharded = keyed.select(F.col(key_col).cast("string").alias("key")).withColumn(
        "shard", F.pmod(F.xxhash64("key"), F.lit(n_shards)).cast("int")
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _update_mg,
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- transformWithStateInPandas (Spark 4 stateful API) --------------------


def _twsp_available() -> bool:
    """transformWithStateInPandas needs BOTH the Spark 4 API and protobuf
    (its state-server wire format). protobuf is not in this container, so
    the TWS twin is import-gated; the applyInPandasWithState form above is
    the exercised path and the API-parity test skips when gated."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )

        return True
    except ImportError:
        return False


def make_profile_processor():
    """The per-user profile operator re-expressed on Spark 4's
    transformWithStateInPandas — the arbitrary-state API that succeeds
    applyInPandasWithState (SPARK-49564): named state variables on a
    handle (ValueState here; ListState/MapState/timers/TTL available on
    the same handle), explicit init/close lifecycle. Semantics identical
    to _update_profile, pinned by the API-parity test in
    tests/test_streaming.py."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "profile", "n BIGINT, cents BIGINT, ewma DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, cents, ewma = (
                self._state.get() if self._state.exists() else (0, 0, None)
            )
            for pdf in rows:
                for v in pdf.sort_values("event_time")["value"]:
                    n += 1
                    cents += int(round(float(v) * 100))
                    ewma = (
                        float(v)
                        if ewma is None
                        else _EWMA_ALPHA * float(v) + (1 - _EWMA_ALPHA) * ewma
                    )
            self._state.update((n, cents, ewma))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [cents / 100.0],
                    "ewma_value": [ewma],
                }
            )

        def close(self) -> None:
            pass

    return ProfileProcessor()


def running_user_profile_tws(parsed: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of running_user_profile."""
    return parsed.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_profile_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def rocksdb_state_conf() -> dict[str, str]:
    """Writer-side session conf for the production state backend: RocksDB
    spills streaming state to local disk instead of the default HDFS-backed
    in-memory map — the difference between watermark state bounded by
    EXECUTOR MEMORY and state bounded by local disk at 100 TB (plus
    changelog checkpointing for faster recovery). Per-query override via
    .option() is not supported; set it on the session/cluster conf. Result
    equivalence with the default provider is pinned in
    tests/test_streaming.py."""
    return {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
        # incremental changelog instead of full snapshot uploads per batch
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled":
            "true",
    }


# --- transformWithState (Spark 4 arbitrary-state API) ----------------------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

TWS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_types", LongType()),
        StructField("n_click", LongType()),
        StructField("n_view", LongType()),
        StructField("n_purchase", LongType()),
        StructField("n_error", LongType()),
        StructField("n_signup", LongType()),
    ]
)

_TWS_TYPES = ["click", "view", "purchase", "error", "signup"]


class UserTypeProfileProcessor(StatefulProcessor):
    """Per-user lifetime event-type profile on the NEW transformWithState
    API (Spark 4): a ValueState holds the lifetime count, a MapState holds
    the per-type counts — the typed composite state that
    applyInPandasWithState's single-tuple state cannot express
    incrementally (its tuple is rewritten whole; MapState updates only
    the touched keys in RocksDB). Emits one refreshed profile row per
    active user per micro-batch; all counters are exact integers, so the
    final profile hash-matches a batch GROUP BY oracle."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._n = handle.getValueState("n_events", "n BIGINT")
        self._types = handle.getMapState(
            "type_counts", "event_type STRING", "cnt BIGINT"
        )

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        n = self._n.get()[0] if self._n.exists() else 0
        for pdf in rows:
            n += len(pdf)
            for t, c in pdf["event_type"].value_counts().items():
                prev = (
                    self._types.getValue((t,))[0]
                    if self._types.containsKey((t,))
                    else 0
                )
                self._types.updateValue((t,), (prev + int(c),))
        self._n.update((n,))
        counts = {
            t: (self._types.getValue((t,))[0] if self._types.containsKey((t,)) else 0)
            for t in _TWS_TYPES
        }
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "n_types": [sum(1 for c in counts.values() if c > 0)],
                **{f"n_{t}": [counts[t]] for t in _TWS_TYPES},
            }
        )

    def close(self) -> None:
        pass


def running_type_profile_tws(parsed: DataFrame) -> DataFrame:
    """parsed: the parse_cdc output stream. transformWithStateInPandas
    requires the RocksDB state store (caller sets the session conf)."""
    return parsed.groupBy("user_id").transformWithStateInPandas(
        UserTypeProfileProcessor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="None",
    )
