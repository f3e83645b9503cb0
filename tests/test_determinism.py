"""Partition-invariance meta-test: the determinism engineering's contract.

The oracle gate proves Spark == DuckDB for ONE physical configuration. The
stronger claim detsql.py makes — exact decimal sums, integer grids, unique
ORDER BY tiebreakers — is that results are invariant to HOW the data is
partitioned and shuffled. This suite re-runs representative hash-sensitive
queries under deliberately hostile physical layouts (1 vs 7 vs 64 shuffle
partitions; input pre-scattered by an unrelated key) and asserts the
canonical value-hash is bit-identical. A raw double SUM/AVG, a tie-unstable
window, or an accumulation-order-dependent aggregate would fail here even
while passing a single-layout oracle run.
"""

from __future__ import annotations

import hashlib

import pytest

from nyc_taxi_lakehouse_spark.registry import all_queries

from .conftest import SF_SMOKE

SPECS = all_queries()

# One representative per determinism mechanism:
#   decimal money sums / conditional aggs -> q_pricing_rollup
#   moment-sum STDDEV/CORR + OLS          -> q_regression
#   global NTILE with tiebreakers          -> q_user_deciles
#   integer fixed-point iteration          -> q_pagerank
#   two-pass sketch + exact recount        -> q_heavy_hitters
#   window prefix-max sweep               -> q_pareto_frontier
CASES = [
    "q_pricing_rollup",
    "q_regression",
    "q_user_deciles",
    "q_pagerank",
    "q_heavy_hitters",
    "q_pareto_frontier",
    # round-3 session additions with partition-sensitive internals:
    #   spark_partition_id + range-partition offsets -> q_dense_ids
    #   checkpointed bucket counts + per-source ranks -> q_dsir_weights
    #   greedy argmax trajectory over a checkpointed component table
    #   (a single tie broken differently would derail every later round)
    #   -> q_kcenter_coreset
    "q_dense_ids",
    "q_dsir_weights",
    "q_kcenter_coreset",
    # round-4 additions with partition-sensitive internals:
    #   global NTILE file model + integer morton codes -> q_zorder_layout
    #   bit_or word packing across partitions          -> q_bloom_prune
    #   dictionary-keyed pair join + broadcast peel    -> q_kcore
    "q_zorder_layout",
    "q_bloom_prune",
    "q_kcore",
    #   truncating L1 normalization per iterative half-step -> q_hits
    #   two-level decimal moment re-aggregation              -> q_simpson_check
    #   decorrelated per-group sort+limit tiebreakers        -> q_lateral_topk
    "q_hits",
    "q_simpson_check",
    "q_lateral_topk",
    # round-4c additions with partition-sensitive internals:
    #   checkpointed incidence + cosine-tie rank windows -> q_item_cf
    #   collect_set order (pinned by sort_array) + decimal pair sums
    #   -> q_link_prediction
    #   rank-order trimming under value ties             -> q_trimmed_mean
    "q_item_cf",
    "q_link_prediction",
    "q_trimmed_mean",
    # round-4d additions with partition-sensitive internals:
    #   TakeOrdered top-10 under count ties (broken by pkey) feeding
    #   broadcast probe + fixed-point sums -> q_ndcg
    #   suffix-sum at-risk windows over the checkpoint-free grain
    #   -> q_logrank
    "q_ndcg",
    "q_logrank",
    #   user-partitioned suffix-min reward window feeding propensity
    #   cells -> q_ips_eval
    "q_ips_eval",
    #   12 chained integer half-steps amplify any nondeterminism in the
    #   cell aggregate -> q_ipf_raking
    "q_ipf_raking",
    # round-4 parts 7-21 additions with partition-sensitive internals:
    #   top-20 under dist2 ties + 1-row count broadcast -> q_spatial_join
    #   two global rank windows fused rank-side         -> q_hybrid_rrf
    #   128-replicate relabel aggregation               -> q_permutation_test
    #   per-vec rank under exact-dot ties               -> q_maxsim_retrieval
    #   iterative CC + quality rank under n_chars ties  -> q_dedup_canonical
    #   iterative multi-source frontier bookkeeping     -> q_effective_diameter
    #   ordered path assembly + TakeOrdered under ties  -> q_top_paths
    #   ordered phrase assembly + score-tie top-20      -> q_rake_keyphrases
    "q_spatial_join",
    "q_hybrid_rrf",
    "q_permutation_test",
    "q_maxsim_retrieval",
    "q_dedup_canonical",
    "q_effective_diameter",
    "q_top_paths",
    "q_rake_keyphrases",
    # round-5 additions with partition-sensitive internals:
    #   iterative annulus expansion with per-round completion decisions
    #   (a tie broken differently in any round would ship a wrong
    #   neighbor) -> q_spatial_knn_exact
    #   star-contraction CC + min-label border assignment -> q_dbscan
    #   distinct-value prefix walk weighted by value gaps -> q_wasserstein
    #   checkpoint-free single-reference rank sweep       -> q_spearman
    "q_spatial_knn_exact",
    "q_dbscan",
    "q_wasserstein",
    "q_spearman",
    # round-6/7 step twins with partition-sensitive internals:
    #   power-iteration components + per-pc offset join    -> q_pca_project_step
    #   sign-pattern buckets + per-pair table-match counts -> q_lsh_bucket_step
    #   same-key argmax window under exact-dot ties        -> q_ivf_assign_step
    #   hash-ranked codebook seeds + argmin encoding + top-32 cut under
    #   (value, id) ties                                   -> q_pq_adc_step
    "q_pca_project_step",
    "q_lsh_bucket_step",
    "q_ivf_assign_step",
    "q_pq_adc_step",
    # round-8 additions with partition-sensitive internals:
    #   exact-BIGINT Gram cells via a vec_id self-join + 2 keyed aggs,
    #   n from a separate count action                    -> q_pca_gram_step
    #   integer fixed-point score + per-doc top-5 under (score, token)
    #   ties across an AQE-adaptive tf x df join          -> q_tfidf
    #   min-id canonical selection + variant counts over a 4-way derived
    #   union                                             -> q_mixedcase_dedup
    #   checkpointed 60-bit fingerprints + 4-chunk bucket self-join with
    #   DISTINCT pair dedup                               -> q_dedup_simhash_pairs
    #   Arrow-batched int64 GEMM whose batch boundaries move with
    #   partitioning; rank window under bit-equal cosines -> q_similarity_bruteforce_pandas
    "q_pca_gram_step",
    "q_tfidf",
    "q_mixedcase_dedup",
    "q_dedup_simhash_pairs",
    "q_similarity_bruteforce_pandas",
]


def _canonical_hash(df) -> str:
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(str(v) for v in row)
        for row in pdf[cols].itertuples(index=False)
    )
    return hashlib.sha256(repr(rows).encode()).hexdigest()


@pytest.mark.parametrize("name", CASES)
def test_partition_invariance(name, spark):
    spec = SPECS[name]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    hashes = {}
    try:
        for nparts in (1, 7, 64):
            spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
            # Drop cached temp views so load_tables re-registers under the
            # new setting; the queries read via temp views, so the config
            # applies to every exchange in the plan.
            hashes[nparts] = _canonical_hash(spec.fn(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert len(set(hashes.values())) == 1, (
        f"{name}: result depends on shuffle partitioning: { {k: v[:12] for k, v in hashes.items()} }"
    )


# Queries whose plans CHANGE SHAPE with AQE: measured-count broadcast gates
# (q_kcore, q_hits, q_deletion_vectors, q_item_cf, q_heavy_hitters) and
# AQE-decided join sides / skew splits (q_dbscan). The gates and adaptive
# fallbacks are exactly where the physical plan diverges between AQE on and
# off, so the RESULT must be pinned invariant across both — a dependency on
# runtime re-planning for correctness (not just speed) would surface here.
AQE_CASES = [
    "q_kcore",
    "q_hits",
    "q_dbscan",
    "q_deletion_vectors",
    "q_item_cf",
    "q_heavy_hitters",
    # r8: the tf x df join is deliberately unhinted so AQE decides its
    # side; the chargram per-lang df-cap join likewise. Results must not
    # depend on that runtime choice.
    "q_tfidf",
    "q_dedup_chargram",
]


@pytest.mark.parametrize("name", AQE_CASES)
def test_aqe_invariance(name, spark):
    spec = SPECS[name]
    old = spark.conf.get("spark.sql.adaptive.enabled")
    hashes = {}
    try:
        for aqe in ("true", "false"):
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            hashes[aqe] = _canonical_hash(spec.fn(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    assert hashes["true"] == hashes["false"], (
        f"{name}: result depends on adaptive execution: "
        f"{ {k: v[:12] for k, v in hashes.items()} }"
    )
