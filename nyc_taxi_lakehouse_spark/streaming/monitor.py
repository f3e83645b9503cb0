"""Streaming observability: a StreamingQueryListener capturing per-batch
progress metrics (the monitoring surface the reference exposes through its
dashboard — rows/batch, processing rate, trigger latency — re-expressed as
engine-native listener events instead of a polling sidecar).

Metrics are collected driver-side (listener callbacks run on the driver —
that is Spark's contract, not a scale compromise; each event is a few
hundred bytes per micro-batch) and can be flushed to any lake table for
dashboarding.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.listener import StreamingQueryListener


@dataclass
class BatchMetric:
    query_id: str
    run_id: str
    batch_id: int
    num_input_rows: int
    trigger_ms: float
    sink_description: str


@dataclass
class ProgressRecorder(StreamingQueryListener):
    """Collects one BatchMetric per completed micro-batch.

    Attach with `spark.streams.addListener(rec)`; detach with
    `spark.streams.removeListener(rec)`. `to_df(spark)` snapshots the
    collected metrics as a DataFrame for writing to a lake table.
    """

    metrics: list[BatchMetric] = field(default_factory=list)
    started: list[str] = field(default_factory=list)
    terminated: list[str] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        duration = p.durationMs or {}
        self.metrics.append(
            BatchMetric(
                query_id=str(p.id),
                run_id=str(p.runId),
                batch_id=int(p.batchId),
                num_input_rows=int(p.numInputRows),
                trigger_ms=float(duration.get("triggerExecution", 0)),
                sink_description=str(p.sink.description if p.sink else ""),
            )
        )

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))

    def onQueryIdle(self, event) -> None:  # Spark 3.4+ callback
        pass

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            (m.query_id, m.run_id, m.batch_id, m.num_input_rows, m.trigger_ms,
             m.sink_description)
            for m in self.metrics
        ]
        return spark.createDataFrame(
            rows,
            "query_id string, run_id string, batch_id long, num_input_rows long,"
            " trigger_ms double, sink_description string",
        )
