"""Mixed-case adversarial fixture tier (VERDICT r07 #4).

The r7 lower()-after-strip bug was invisible to the all-lowercase oracle
corpus. These tests pin (a) the semantic outcomes the adversarial queries
encode and (b) that the derived corpus actually DISTINGUISHES the two
normalization orders — i.e. the r7 bug class fails red here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_lakehouse_spark.llm.adversarial import adversarial_documents
from nyc_taxi_lakehouse_spark.llm.pipeline import (
    dedup_exact_canonical,
    exact_content_hash,
)
from nyc_taxi_lakehouse_spark.sources.tables import load_tables

SF = "/root/testdata/sf0.001"


def _buggy_hash():
    """The r7 bug: strip [^a-z0-9 ] BEFORE lowercasing — uppercase letters
    are deleted instead of folded."""
    return F.md5(F.lower(F.regexp_replace("text", "[^a-z0-9 ]", "")))


def test_fixture_preconditions(spark):
    """The invariants the adversarial derivation and these tests assume,
    pinned at EVERY SF the suite consumes the corpus at (ADVICE r8: the
    id-block invariant was pinned only at sf0.001 while q_mixedcase_* run
    at sf0.1 and on the derived decade), so a regenerated fixture fails
    HERE with an explanation instead of as a mystery red driver row:
    - variant ids (doc_id·10+2) stay below the 9e9 edge-row id block;
    - originals are pure lowercase-ASCII [a-z0-9 ] (so upper() is
      engine-identical and the two normalization orders coincide on v0);
    - every doc contains a letter (so upper(text) != text on v1 and the
      two orders DIVERGE on every cased row)."""
    import os

    sf_dirs = [SF, "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    if os.path.exists("/tmp/sf1_decade/documents.parquet"):
        sf_dirs.append("/tmp/sf1_decade")
    for sf_dir in sf_dirs:
        docs = load_tables(spark, sf_dir, ["documents"])["documents"]
        max_id = docs.agg(F.max("doc_id")).first()[0]
        assert max_id * 10 + 2 < 9_000_000_000, sf_dir
        assert docs.where(F.col("text").rlike("[^a-z0-9 ]")).count() == 0, sf_dir
        assert docs.where(~F.col("text").rlike("[a-z]")).count() == 0, sf_dir


def test_id_block_precondition_raises_in_derivation(spark):
    """ADVICE r8: the precondition must be checked where the corpus is
    consumed — a doc_id >= 9e8 flips min-id survivor semantics identically
    in both engines, so the oracle would stay green while the 'original
    wins' property silently breaks. adversarial_documents now raises."""
    import pytest

    bad = spark.createDataFrame(
        [(900_000_000, "a doc with a huge id")], "doc_id LONG, text STRING"
    )
    with pytest.raises(ValueError, match="edge-row id block"):
        adversarial_documents(bad)


def test_precondition_rechecks_after_in_place_regeneration(spark, tmp_path):
    """ADVICE r10: the (session, plan-semanticHash) memo alone silently
    skipped the edge-row-id safety check when a fixed-path parquet source
    was regenerated IN PLACE mid-session — the repo's own derived-fixture
    helpers rmtree-and-rebuild at fixed /tmp paths, and a re-read of the
    same path analyzes to the same plan hash. The memo key now snapshots
    the input files' (path, mtime_ns, size), so regenerated data is
    re-checked: a violating corpus raises instead of inheriting the old
    pass."""
    import pytest

    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "a doc"), (2, "b doc")], "doc_id LONG, text STRING"
    ).repartition(1).write.mode("overwrite").parquet(path)
    assert adversarial_documents(spark.read.parquet(path)).count() == 9
    # Regenerate in place with an id inside the edge-row block.
    spark.createDataFrame(
        [(900_000_000, "huge id doc")], "doc_id LONG, text STRING"
    ).repartition(1).write.mode("overwrite").parquet(path)
    with pytest.raises(ValueError, match="edge-row id block"):
        adversarial_documents(spark.read.parquet(path))


def test_in_memory_sources_are_never_memoized(spark):
    """A frame with no input files can't be fingerprinted by data, so the
    check must run on every construction — two same-schema literal frames
    must not share a memo entry."""
    import pytest

    ok = spark.createDataFrame([(1, "fine")], "doc_id LONG, text STRING")
    adversarial_documents(ok)
    bad = spark.createDataFrame(
        [(900_000_000, "huge id")], "doc_id LONG, text STRING"
    )
    with pytest.raises(ValueError, match="edge-row id block"):
        adversarial_documents(bad)


def test_with_counts_matches_independent_group_count(spark):
    """dedup_exact_canonical(with_counts=True) — the single-window form
    VERDICT r8 #3 folded n_variants into — must agree with an
    independently spelled groupBy count over the same (buggy-order-free)
    normalization; spelled WITHOUT the production window so a frame bug
    (e.g. a running count under an accidental orderBy) fails red."""
    docs = load_tables(spark, SF, ["documents"])["documents"]
    adv = adversarial_documents(docs)
    got = {
        (r["doc_id"], r["n_variants"])
        for r in dedup_exact_canonical(adv, with_counts=True)
        .select("doc_id", "n_variants")
        .collect()
    }
    indep = {
        (r["doc_id"], r["n"])
        for r in adv.withColumn(
            "h", F.md5(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""))
        )
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n"))
        .select("doc_id", "n")
        .collect()
    }
    assert got == indep


def test_case_variants_merge_under_correct_order(spark):
    docs = load_tables(spark, SF, ["documents"])["documents"]
    adv = adversarial_documents(docs)
    survivors = dedup_exact_canonical(adv)
    ids = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    # The UPPER variant (doc_id*10+1) must never survive: it merges with
    # the original (doc_id*10), which wins min-id canonical selection.
    assert not any(i % 10 == 1 for i in ids if i < 9_000_000_000)
    # The unicode-suffixed variant is a distinct canonical and survives.
    assert any(i % 10 == 2 for i in ids if i < 9_000_000_000)
    # Unicode-only edge row (→ canonical '') never beats the empty row.
    assert 9_000_000_003 not in ids and 9_000_000_001 in ids


def test_fixture_distinguishes_normalization_orders(spark):
    """The adversarial corpus makes the two orders produce DIFFERENT
    fingerprints on every cased row — so a strip-then-lower regression
    cannot hash-match the oracle (the property the all-lowercase corpus
    lacked: there the two orders coincide on 100% of rows)."""
    docs = load_tables(spark, SF, ["documents"])["documents"]
    adv = adversarial_documents(docs).where(
        (F.col("doc_id") % 10 == 1) & (F.col("doc_id") < 9_000_000_000)
    )
    n = adv.count()
    n_equal = adv.where(exact_content_hash() == _buggy_hash()).count()
    assert n > 0 and n_equal == 0
    # And on the original all-lowercase rows they DO coincide — the reason
    # the bug was latent until this fixture existed.
    low = adversarial_documents(docs).where(
        (F.col("doc_id") % 10 == 0) & (F.col("doc_id") < 9_000_000_000)
    )
    assert low.where(exact_content_hash() != _buggy_hash()).count() == 0
