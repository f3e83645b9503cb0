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
    pinned so a regenerated fixture fails HERE with an explanation instead
    of as a mystery red driver row:
    - variant ids (doc_id·10+2) stay below the 9e9 edge-row id block;
    - originals are pure lowercase-ASCII [a-z0-9 ] (so upper() is
      engine-identical and the two normalization orders coincide on v0);
    - every doc contains a letter (so upper(text) != text on v1 and the
      two orders DIVERGE on every cased row)."""
    docs = load_tables(spark, SF, ["documents"])["documents"]
    max_id = docs.agg(F.max("doc_id")).first()[0]
    assert max_id * 10 + 2 < 9_000_000_000
    assert docs.where(F.col("text").rlike("[^a-z0-9 ]")).count() == 0
    assert docs.where(~F.col("text").rlike("[a-z]")).count() == 0


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
