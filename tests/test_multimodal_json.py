"""Tests: multimodal resize/frame-sample plumbing + JSON source (S2)."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from nyc_taxi_lakehouse_spark.llm.multimodal import (
    resize_images,
    sample_frames,
    to_multimodal,
)
from nyc_taxi_lakehouse_spark.sources.json_source import (
    ingest_json_dimension,
    read_json,
)

SF = "/root/testdata/sf0.001"


def _mm(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    return to_multimodal(docs)


def test_resize_images(spark):
    out = resize_images(_mm(spark), target_w=32, target_h=32).collect()
    assert len(out) == 50
    expected = (32 * 32) // 64
    assert all(r.width == 32 and r.height == 32 for r in out)
    assert all(len(r.payload) == expected and r.n_bytes == expected for r in out)


def test_sample_frames_explodes(spark):
    mm = _mm(spark)
    frames = sample_frames(mm, every_n_bytes=64, max_frames=4)
    got = frames.collect()
    assert len(got) >= 50  # at least one frame per doc
    per_doc = {}
    for r in got:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in per_doc.items():
        assert [r.frame_no for r in sorted(rows, key=lambda r: r.frame_no)] == list(
            range(len(rows))
        )
        assert len(rows) <= 4
        assert all(len(r.frame) <= 64 for r in rows)


def test_read_json_inferred_and_explicit(spark, tmp_path):
    rows = [
        {"zone_id": 1, "zone_name": "alpha", "borough": "A"},
        {"zone_id": 2, "zone_name": "beta", "borough": "B"},
    ]
    p = tmp_path / "zones.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))

    inferred = read_json(spark, str(p))
    assert inferred.count() == 2
    assert set(inferred.columns) == {"zone_id", "zone_name", "borough"}

    schema = T.StructType(
        [
            T.StructField("zone_id", T.IntegerType()),
            T.StructField("zone_name", T.StringType()),
            T.StructField("borough", T.StringType()),
        ]
    )
    explicit = read_json(spark, str(p), schema=schema)
    assert explicit.schema["zone_id"].dataType == T.IntegerType()

    dim = ingest_json_dimension(
        spark, str(p), rename={"zone_name": "name"}, schema=schema
    )
    assert "name" in dim.columns and "zone_name" not in dim.columns


def test_read_json_multiline_document(spark, tmp_path):
    doc = {"station": "X", "hours": [{"h": 0, "t": 1.5}, {"h": 1, "t": 2.5}]}
    p = tmp_path / "weather.json"
    p.write_text(json.dumps(doc))
    df = read_json(spark, str(p), multiline=True)
    assert df.count() == 1
    assert df.selectExpr("size(hours)").collect()[0][0] == 2
