#!/usr/bin/env python
"""Streaming-family scale measurement (VERDICT r10 #2): first-drain wall
time AND state-store peaks for the replay pipelines, at a given dataset
and chunked-delivery setting.

Why both knobs matter: a single-batch availableNow drain holds EVERY
window/session/join-buffer of the corpus in state at once, so its state
peak scales with corpus size no matter how correct the watermarks are —
it measures corpus volume, not streaming posture. With
spark.lakehouse.replay.chunks=N the replay delivers N event-time-ordered
files one per micro-batch, the watermark advances THROUGH the data, and
closed state is evicted mid-drain; the peak then measures what a real
unbounded stream holds: arrival rate x watermark horizon, independent of
stream length. The /tmp/sf1_events dataset (make_scale_decade --events:
10 time-SHIFTED replicas = a 10x longer stream, same user population) is
the decade axis; PLANS.md records the table.

State peaks come from StreamingQueryProgress.stateOperators
(numRowsTotal / memoryUsedBytes), captured by a listener across every
micro-batch of each query's drain.

Usage:
  python tools/streaming_scale.py [--sf=/root/testdata/sf0.1]
                                  [--chunks=1] [--queries=a,b,c]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener

from nyc_taxi_lakehouse_spark.plans.ckpt import release_run_checkpoints
from nyc_taxi_lakehouse_spark.plans.invariance import content_hash
from nyc_taxi_lakehouse_spark.registry import all_queries
from nyc_taxi_lakehouse_spark.session import get_spark
from nyc_taxi_lakehouse_spark.streaming.replay import REPLAY_CHUNKS_CONF

DEFAULT_QUERIES = [
    "q_session_stream",
    "q_cdc_windowed",
    "q_stream_join",
    "q_stream_join_outer",
    "q_stream_heavy_hitters",
    "q_stream_neardup",
    "q_stream_dedup",
]


class _StatePeakListener(StreamingQueryListener):
    """Max state rows/bytes and batch count across a drain's progresses."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.peak_rows = 0
        self.peak_bytes = 0
        self.batches = 0

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        self.batches += 1
        rows = sum(op.numRowsTotal for op in p.stateOperators)
        mem = sum(op.memoryUsedBytes for op in p.stateOperators)
        self.peak_rows = max(self.peak_rows, rows)
        self.peak_bytes = max(self.peak_bytes, mem)

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    chunks = 1
    names = list(DEFAULT_QUERIES)
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--chunks="):
            chunks = int(a.split("=", 1)[1])
        elif a.startswith("--queries="):
            names = a.split("=", 1)[1].split(",")

    spark = get_spark(app_name="streaming_scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(REPLAY_CHUNKS_CONF, str(chunks))
    listener = _StatePeakListener()
    spark.streams.addListener(listener)
    specs = all_queries()

    print(
        f"{'query':26s} {'drain_s':>8s} {'batches':>7s} {'peak_rows':>10s} "
        f"{'peak_MB':>8s} {'rows_out':>9s}   [sf={sf_dir} chunks={chunks}]"
    )
    for name in names:
        listener.reset()
        t0 = time.time()
        h, n = content_hash(specs[name].fn(spark, sf_dir))
        wall = time.time() - t0
        release_run_checkpoints()
        print(
            f"{name:26s} {wall:8.1f} {listener.batches:7d} "
            f"{listener.peak_rows:10d} {listener.peak_bytes / 2**20:8.1f} "
            f"{n:9d}  hash={h}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
