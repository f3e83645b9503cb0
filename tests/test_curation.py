"""Behavioral properties of the curation operators — the guarantees a
training-data pipeline actually relies on, beyond row-level oracle parity."""

from __future__ import annotations

from nyc_taxi_lakehouse_spark.registry import all_queries

SPECS = all_queries()
SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


def test_train_split_stable_under_corpus_growth(spark):
    """The split is a pure function of doc_id: growing the corpus (sf0.001 ⊂
    sf0.01 id space) must never reassign an existing document."""
    small = {
        r.doc_id: r.split
        for r in SPECS["q_train_split"].fn(spark, SF_SMALL).collect()
    }
    big = {
        r.doc_id: r.split for r in SPECS["q_train_split"].fn(spark, SF_MED).collect()
    }
    overlap = set(small) & set(big)
    assert overlap, "expected overlapping doc_ids between scale factors"
    assert all(small[d] == big[d] for d in overlap)


def test_train_split_partitioning_invariant(spark):
    """Same assignment regardless of physical parallelism (no RNG, no
    row-order dependence)."""
    base = SPECS["q_train_split"].fn(spark, SF_SMALL)
    a = {(r.doc_id, r.split) for r in base.collect()}
    b = {(r.doc_id, r.split) for r in base.repartition(13).collect()}
    assert a == b


def test_stratified_sample_equalizes_strata(spark):
    """Kept counts per language land within rounding slack of the smallest
    stratum (the integer cross-multiplication targets min_stratum exactly)."""
    pdf = SPECS["q_stratified_sample"].fn(spark, SF_MED).toPandas()
    full = spark.read.parquet(f"{SF_MED}/documents.parquet").groupBy("lang").count()
    min_stratum = min(r["count"] for r in full.collect())
    kept = pdf.groupby("lang").size()
    # Hash buckets are uniform-ish, not exact: allow 25% relative slack.
    assert (kept >= 0.75 * min_stratum).all(), kept.to_dict()
    assert (kept <= 1.25 * min_stratum).all(), kept.to_dict()


def test_seq_packing_offsets_contiguous(spark):
    """Concat-and-chunk invariants: within each source shard, offsets are
    contiguous (no gaps/overlaps) and every boundary doc spans the right
    number of sequences."""
    pdf = (
        SPECS["q_seq_packing"]
        .fn(spark, SF_MED)
        .toPandas()
        .sort_values(["source", "doc_id"])
    )
    cap = 2048
    for _, g in pdf.groupby("source"):
        offs = g.tok_offset.to_numpy()
        toks = g.n_tokens.to_numpy()
        assert offs[0] == 0
        assert (offs[1:] == offs[:-1] + toks[:-1]).all()
        # seq range arithmetic holds row-wise.
        assert (g.seq_first == offs // cap).all()
        assert (g.seq_last == (offs + toks - 1) // cap).all()
        assert (g.seqs_spanned == g.seq_last - g.seq_first + 1).all()


def test_contamination_only_flags_eval_overlap(spark):
    """Every reported pair is (train_doc, eval_doc) with the eval membership
    rule applied — no train-train or eval-eval pairs leak through."""
    pdf = SPECS["q_contamination"].fn(spark, SF_MED).toPandas()
    assert (pdf.eval_doc % 97 == 0).all()
    assert (pdf.train_doc % 97 != 0).all()
    assert (pdf.shared_ngrams >= 1).all()


def test_contamination_join_strategy_threshold(spark, sf_dir):
    """Plan shape: eval side below the threshold broadcasts; above it the
    join hash-partitions on gram (no broadcast of an over-sized side)."""
    from pyspark.sql import functions as F

    from nyc_taxi_lakehouse_spark.llm.curation import contamination_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    ev = docs.filter(F.col("doc_id") % 97 == 0)

    small = contamination_report(train, ev)  # default threshold: broadcast
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_small

    big = contamination_report(train, ev, max_broadcast_docs=0)
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan_big
    assert "ShuffledHashJoin" in plan_big
    # Same answer either way.
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(small) == key(big)


def test_write_shards_deterministic_and_complete(spark, tmp_path):
    """Shard export invariants: (1) every doc lands in exactly one shard;
    (2) two exports produce IDENTICAL per-shard row sequences (the
    deterministic-global-shuffle contract); (3) the written manifest equals
    q_shard_manifest's aggregate over the source."""
    from nyc_taxi_lakehouse_spark.llm.curation import write_shards

    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    m1 = write_shards(docs, str(tmp_path / "e1")).collect()
    m2 = write_shards(docs, str(tmp_path / "e2")).collect()
    assert sorted(map(tuple, m1)) == sorted(map(tuple, m2))
    assert sum(r.n_docs for r in m1) == docs.count()

    # per-shard row SEQUENCES identical across exports (order included)
    for shard in (0, 7, 15):
        a = [r.doc_id for r in spark.read.parquet(str(tmp_path / "e1"))
             .filter(f"shard = {shard}").orderBy("sort_key", "doc_id").collect()]
        b = [r.doc_id for r in spark.read.parquet(str(tmp_path / "e2"))
             .filter(f"shard = {shard}").orderBy("sort_key", "doc_id").collect()]
        assert a == b and len(a) > 0

    # manifest matches the registry query run on the same corpus
    spec = SPECS["q_shard_manifest"]
    reg = {r.shard: (r.n_docs, r.n_tokens, r.doc_id_checksum)
           for r in spec.fn(spark, SF_MED).collect()}
    got = {r.shard: (r.n_docs, r.n_tokens, r.doc_id_checksum) for r in m1}
    assert got == reg
