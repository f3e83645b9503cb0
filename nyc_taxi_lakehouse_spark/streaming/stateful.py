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
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
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
