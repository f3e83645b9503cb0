"""Checkpoint lifecycle (VERDICT r8 #2): iterative operators must RELEASE
superseded per-round localCheckpoints instead of accumulating them for the
session's lifetime — the accumulation is what GC-churned / OOMed repeat
decade runs at the default 8 GiB single-JVM heap.

The observable is the JVM's persistent-RDD map: bounded by the number of
checkpoints the RETURNED plan still references (≤1 per call), not growing
by one per iteration round or per repeat run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_lakehouse_spark.llm.dedup import (
    connected_components,
    connected_components_star,
    kcore_members,
    prod_dedup_chain,
)
from nyc_taxi_lakehouse_spark.plans.ckpt import (
    evict_local_checkpoint,
    persistent_rdd_count,
)


from tests.conftest import path_edges as _path_edges


def test_evict_requires_checkpoint_frame(spark):
    ck = spark.range(10).localCheckpoint(eager=True)
    with pytest.raises(TypeError, match="LogicalRDD"):
        evict_local_checkpoint(ck.selectExpr("id * 2 AS y"))
    before = persistent_rdd_count(spark)
    evict_local_checkpoint(ck)
    assert persistent_rdd_count(spark) == before - 1


def test_connected_components_releases_rounds(spark):
    edges = _path_edges(spark, 16)  # min-label propagation: ~15 rounds
    verts = spark.range(16).withColumnRenamed("id", "doc_id")
    before = persistent_rdd_count(spark)
    out = connected_components(edges, verts, max_iter=25)
    assert out.count() == 16
    assert out.select("cluster_id").distinct().count() == 1
    # Only the final labels round may survive; ~16 round checkpoints plus
    # the edge checkpoint would linger without eviction.
    assert persistent_rdd_count(spark) - before <= 1


def test_star_contraction_releases_rounds(spark):
    edges = _path_edges(spark, 64)  # O(log d) rounds, still several
    verts = spark.range(64).withColumnRenamed("id", "doc_id")
    before = persistent_rdd_count(spark)
    out = connected_components_star(edges, verts, max_iter=30)
    assert out.count() == 64
    assert out.select("cluster_id").distinct().count() == 1
    # Only the fixpoint edge set may survive (the returned labels read it).
    assert persistent_rdd_count(spark) - before <= 1


def test_kcore_releases_rounds(spark):
    edges = _path_edges(spark, 16)  # k=2 peels a path end-in, ~8 rounds
    before = persistent_rdd_count(spark)
    out = kcore_members(edges, k=2, rounds=12)
    assert out.count() == 0  # a path has no 2-core
    assert persistent_rdd_count(spark) - before <= 1


def test_prod_dedup_chain_repeat_runs_bounded(spark):
    # Small corpus with planted near-dup pairs so every stage (signatures,
    # banding, verify, CC) does real work.
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "pack my box with five dozen liquor jugs before the long winter",
        "a stitch in time saves nine but only when the thread is strong",
        "all that glitters is not gold yet the miners keep on digging",
    ]
    rows = []
    for i in range(40):
        t = base[i % 4] + f" variant tail {i // 4}"
        rows.append((i, t))
        rows.append((1000 + i, t + "!"))  # near-dup of row i
    docs = (
        _spark_docs(spark, rows)
    )
    before = persistent_rdd_count(spark)
    for _ in range(3):
        out = prod_dedup_chain(docs)
        assert out.where(~F.col("keep")).count() > 0  # dups actually found
    # One surviving final-labels checkpoint per run; intermediate label
    # rounds, the edge checkpoint, and the 16-column signature table must
    # all have been released (the signature table alone dominated the
    # decade-scale heap).
    assert persistent_rdd_count(spark) - before <= 3


def _spark_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "qname,kept",
    [
        ("q_bfs_hops", 1),               # final dist only
        ("q_effective_diameter", 1),     # final dist only
        ("q_kcenter_coreset", 0),        # returns a driver-side literal
    ],
)
def test_registered_iterative_queries_bounded(spark, qname, kept):
    """The frontier-BFS and k-center loops release superseded rounds; the
    surviving count is exactly what the returned plan still references."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    fn = all_queries()[qname].fn
    before = persistent_rdd_count(spark)
    out = fn(spark, SF)
    assert out.count() > 0
    assert persistent_rdd_count(spark) - before <= kept


def test_spatial_knn_releases_rounds(spark):
    """The ring-expansion kNN loop (r9: the last loop outside the eviction
    campaign) materializes its per-round done slices and releases every
    superseded state/pending round plus the supplier cell table — only the
    done slices (= the final output, one per round, <= log2(grid)) may
    survive."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    fn = all_queries()["q_spatial_knn_exact"].fn
    before = persistent_rdd_count(spark)
    out = fn(spark, SF)
    assert out.count() > 0
    assert persistent_rdd_count(spark) - before <= 8


def test_bpe_train_releases_everything(spark):
    """bpe_train returns a Python list — no plan survives, so every
    per-merge vocab checkpoint must be released."""
    from nyc_taxi_lakehouse_spark.llm.bpe import bpe_train
    from nyc_taxi_lakehouse_spark.sources.tables import load_tables

    docs = load_tables(spark, SF, ["documents"])["documents"]
    before = persistent_rdd_count(spark)
    merges = bpe_train(docs, n_merges=4)
    assert len(merges) == 4
    assert persistent_rdd_count(spark) - before == 0


def test_kmeans_lloyd_releases_rounds(spark):
    from nyc_taxi_lakehouse_spark.llm.similarity import kmeans_lloyd
    from nyc_taxi_lakehouse_spark.sources.tables import load_tables

    emb = load_tables(spark, SF, ["embeddings"])["embeddings"]
    before = persistent_rdd_count(spark)
    assign = kmeans_lloyd(emb, k=4, iterations=4)
    assert assign.count() > 0
    # Final assignment checkpoint only; 4 rounds + the component table
    # would linger without eviction.
    assert persistent_rdd_count(spark) - before <= 1


def test_materialize_once_checkpoints_release_after_consumption(spark):
    """ADVICE r9: the materialize-once sites (chargram keep table, minhash
    signature view, segment table, ...) cannot evict inside the query —
    the returned plan still references the checkpoint. They REGISTER it
    instead, and the harness releases after consuming the result. A
    bench-style repeat loop must therefore stay bounded instead of
    pinning one RDD per invocation."""
    from nyc_taxi_lakehouse_spark.plans.ckpt import (
        _RUN_CHECKPOINTS,
        release_run_checkpoints,
    )
    from nyc_taxi_lakehouse_spark.registry import all_queries

    specs = all_queries()
    sf_dir = "/root/testdata/sf0.001"
    release_run_checkpoints()  # clean slate from earlier tests
    base = persistent_rdd_count(spark)
    # chargram/minhash/segments = materialize-once tables; clusters_star /
    # hits = iterative loops whose FINAL round the returned plan references
    # (r10 review: those also go through the registry now).
    for _ in range(3):
        for name in ("q_dedup_chargram", "q_dedup_minhash", "q_dedup_segments",
                     "q_dedup_clusters_star", "q_hits"):
            df = specs[name].fn(spark, sf_dir)
            assert df.count() > 0
            assert len(_RUN_CHECKPOINTS) >= 1, (
                f"{name}: no materialize-once checkpoint registered — the "
                "site lost its register_run_checkpoint wrapper"
            )
            release_run_checkpoints()
    # without release: +1 pinned RDD per invocation (9 here); with it the
    # count returns to baseline every iteration
    assert persistent_rdd_count(spark) - base <= 0


def test_driver_entrypoint_releases_between_queries(spark):
    """VERDICT r10 #4: the external driver iterates __spark_entry__.
    queries() and never calls release_run_checkpoints(), so a 50-query
    correctness window pinned up to ~50 materialize-once RDDs for the
    session. The exported fns now release the PREVIOUS invocation's
    registered checkpoints at the next invocation's construction (the
    driver has fully consumed the previous result by then; fail-loud
    model preserved). Driver-style loop: pinned RDDs must stay bounded
    by ONE query's registrations, never accumulate across queries."""
    import __spark_entry__ as entrymod
    from nyc_taxi_lakehouse_spark.plans.ckpt import release_run_checkpoints

    qs = entrymod.queries()
    release_run_checkpoints()  # clean slate from earlier tests
    base = persistent_rdd_count(spark)
    sf_dir = "/root/testdata/sf0.001"
    # q_hits registers 4 (pairs, deg_c, 2-deep rawh tail); chargram and
    # minhash 1-2 each. Without the wrapper the loop accumulates to ~7.
    for name in ("q_hits", "q_dedup_chargram", "q_dedup_minhash"):
        df = qs[name](spark, sf_dir)
        assert df.count() > 0  # the driver consumes each result
        assert persistent_rdd_count(spark) - base <= 4, (
            f"after {name}: previous query's checkpoints not released at "
            "this query's construction"
        )
    assert release_run_checkpoints() > 0  # last query's registrations
    assert persistent_rdd_count(spark) - base <= 0


def test_release_run_checkpoints_is_idempotent(spark):
    from nyc_taxi_lakehouse_spark.plans.ckpt import (
        register_run_checkpoint,
        release_run_checkpoints,
    )

    ck = register_run_checkpoint(spark.range(10).localCheckpoint(eager=True))
    assert ck.count() == 10
    assert release_run_checkpoints() == 1
    assert release_run_checkpoints() == 0
