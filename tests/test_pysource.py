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


def test_python_datasource_writer_round_trip(spark, tmp_path):
    """Writer half of the Python DataSource API: partition-parallel JSONL
    sink with two-phase commit. Round trip must preserve every row, the
    manifest must account for all files/rows, and the file count must
    reflect partition parallelism (not a single driver-side file)."""
    import glob
    import json
    import os

    from nyc_taxi_lakehouse_spark.sources.pysource import register_sink

    register_sink(spark)
    out = str(tmp_path / "sink")
    df = (
        spark.range(0, 1000)
        .selectExpr("id", "CAST(id % 7 AS STRING) AS bucket")
        .repartition(4)
    )
    df.write.format("jsonl_sink").mode("append").option("path", out).save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    files = sorted(glob.glob(os.path.join(out, "part-*.jsonl")))
    assert sorted(manifest["files"]) == files and len(files) == 4
    assert manifest["rows"] == 1000
    back = spark.read.json(files)
    assert back.count() == 1000
    assert {r["id"] for r in back.collect()} == set(range(1000))
