"""End-to-end curation pipeline: quality gate -> exact dedup -> near-dup CC
dedup -> split -> partitioned lake write."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nyc_taxi_lakehouse_spark.llm.pipeline import curate_corpus

SF = "/root/testdata/sf0.01"


def test_curate_corpus_end_to_end(spark, tmp_path):
    table = curate_corpus(spark, SF, str(tmp_path / "curated"))
    out = table.read()
    n_in = spark.read.parquet(f"{SF}/documents.parquet").count()
    n_out = out.count()
    # The synthetic corpus contains planted dups — curation must shrink it,
    # but never to a degenerate sliver.
    assert 0 < n_out < n_in
    # No surviving exact duplicates.
    n_hashes = out.select(
        F.md5(F.lower(F.regexp_replace("text", "[^a-z0-9 ]", "")))
    ).distinct().count()
    assert n_hashes == n_out
    # Split column present with sane proportions (96/2/2 +- slack).
    frac = {r["split"]: r["cnt"] / n_out for r in
            out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert frac.get("train", 0) > 0.9
    # Physical layout: partitioned by (split, lang) for pruned reads.
    root = str(tmp_path / "curated")
    assert any(d.startswith("split=") for d in os.listdir(root) if not d.startswith("_"))
    train_dir = os.path.join(root, "split=train")
    assert any(d.startswith("lang=") for d in os.listdir(train_dir))
    # Partition pruning reaches the scan when reading one split.
    plan = (
        table.read().where("split = 'train' AND lang = 'en'")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [" in plan and "split" in plan.split("PartitionFilters:")[1].split("]")[0]
