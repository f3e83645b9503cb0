"""Custom Python DataSource (batch + streaming) behavioral tests — the
properties the oracle gate can't express: partition-count invariance and
streaming offset/resume semantics."""

from __future__ import annotations

import time

from nyc_taxi_lakehouse_spark.sources.pysource import register, row_at


def test_batch_partition_count_invariance(spark):
    """The produced relation is a pure function of rows — identical content
    at any partition count (the property that makes repartitioning safe)."""
    register(spark)

    def load(parts):
        return (
            spark.read.format("synthevents")
            .option("rows", 2000)
            .option("partitions", parts)
            .load()
        )

    a = sorted(map(tuple, load(1).collect()))
    b = sorted(map(tuple, load(7).collect()))
    assert a == b and len(a) == 2000
    assert load(7).rdd.getNumPartitions() == 7
    assert a[17] == row_at(17)


def test_stream_reader_delivers_exact_relation(spark, tmp_path):
    """The streaming reader drains the full relation through micro-batches
    (offset dict advancing by rowsPerBatch) with no dupes and no gaps."""
    register(spark)
    n, per = 500, 120
    stream = (
        spark.readStream.format("synthevents")
        .option("rows", n)
        .option("rowsPerBatch", per)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            got = spark.sql("SELECT COUNT(*) FROM synth_stream_sink").first()[0]
            if got >= n:
                break
            time.sleep(0.5)
        rows = sorted(
            map(tuple, spark.sql("SELECT * FROM synth_stream_sink").collect())
        )
    finally:
        q.stop()
    assert len(rows) == n, f"drained {len(rows)}/{n}"
    assert rows == [row_at(i) for i in range(n)]
    # ceil(500/120) = 5 micro-batches minimum — the offset actually advanced
    # in per_batch steps rather than one giant batch.
    progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(progress) >= 2
