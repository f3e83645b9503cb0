"""Planted-skew invariance (VERDICT r8 #1): promote the toy AQE skew-split
demo (tests/test_scale.py::test_aqe_skew_join_split_fires) to the real
planted-skew dataset and the heavy-query families.

The dataset is the --skew decade derived from sf0.01 (so the volume is
sf0.1-equivalent and the suite stays fast): one lang block holds 50% of
documents, one supplier holds ~30% of line rows. Gate-bearing queries must
produce IDENTICAL results with AQE skew-join split forced to fire vs
disabled — the split is a physical rescue, never a semantic change.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from nyc_taxi_lakehouse_spark.plans.invariance import content_hash, with_conf
from nyc_taxi_lakehouse_spark.registry import all_queries

_SKEW_DIR = "/tmp/skew_sf01_test"

_SPLIT_CONF = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
    # Split even when it costs an extra shuffle (e.g. an aggregate reuses
    # the join partitioning — OptimizeSkewedJoin otherwise declines, and
    # the invariance test would silently test nothing).
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}


def _generator_digest() -> str:
    """md5 of the generator source — a stale or partially-written dataset
    (generator killed mid-COPY, or its constants changed since the dir was
    built) must trigger a rebuild, not a silent green run against outdated
    planted masses (r9 review finding)."""
    import hashlib

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "make_scale_decade.py",
    )
    with open(path, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()


def _derive(flag: str, out_dir: str, src: str = "/root/testdata/sf0.01") -> str:
    """Derive a planted decade variant (default from sf0.01), cached by
    generator digest (stale or partial dirs rebuild, never silently
    pass). ``flag`` may be space-separated for multi-flag derivations."""
    marker = f"{out_dir}/.complete"
    digest = _generator_digest()
    stale = True
    if os.path.exists(marker):
        with open(marker) as f:
            stale = f.read().strip() != digest
    if stale:
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        subprocess.run(
            [
                sys.executable,
                os.path.join(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools",
                    "make_scale_decade.py",
                ),
                *flag.split(),
                "--src",
                src,
                "--out",
                out_dir,
            ],
            check=True,
            capture_output=True,
        )
        # Written only after the generator exited 0 — a partial dir from a
        # killed run has no marker and is rebuilt next time.
        with open(marker, "w") as f:
            f.write(digest)
    return out_dir


@pytest.fixture(scope="module")
def skew_dir():
    return _derive("--skew", _SKEW_DIR)


@pytest.fixture(scope="module")
def hotsource_dir():
    return _derive("--hotsource", "/tmp/hotsource_sf01_test")


@pytest.fixture(scope="module")
def hotgraph_dir():
    return _derive("--hotgraph", "/tmp/hotgraph_sf01_test")


@pytest.fixture(scope="module")
def level1_small_dir():
    """A level-1 decade from sf0.001 — the composition base for the
    level-2 gates (the gates check STRUCTURE; the measured curves run on
    the real /tmp/sf10_* derivations from sf0.1)."""
    return _derive("", "/tmp/level1_sf001_test", src="/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def level2_dir(level1_small_dir):
    return _derive("--level2", "/tmp/level2_sf001_test", src=level1_small_dir)


@pytest.fixture(scope="module")
def level2_hotsource_dir(level1_small_dir):
    return _derive(
        "--level2 --hotsource", "/tmp/level2_hotsource_sf001_test",
        src=level1_small_dir,
    )




def test_planted_masses(spark, skew_dir):
    """The skew generator actually plants the documented Zipf masses."""
    docs = spark.read.parquet(f"{skew_dir}/documents.parquet")
    total = docs.count()
    hot = docs.groupBy("lang").count().orderBy(F.desc("count")).first()
    assert hot["count"] / total == pytest.approx(0.5, abs=0.02)
    line = spark.read.parquet(f"{skew_dir}/lineitem.parquet")
    hot_supp = line.groupBy("l_suppkey").count().orderBy(F.desc("count")).first()
    assert hot_supp["count"] / line.count() == pytest.approx(0.30, abs=0.03)


def test_hotsource_planted_mass(spark, hotsource_dir):
    """--hotsource plants ~52.5% of documents on one source (50% remapped
    plus the hot source's own retained half: 0.5 + 0.05*0.5 with 20
    uniform base sources) and leaves every other source small. The
    historical failure class for the residue idiom is planting 0% or 50%
    of whole replicas silently — both would miss this window."""
    docs = spark.read.parquet(f"{hotsource_dir}/documents.parquet")
    total = docs.count()
    by_src = docs.groupBy("source").count().orderBy(F.desc("count")).collect()
    assert by_src[0]["count"] / total == pytest.approx(0.525, abs=0.02)
    assert by_src[1]["count"] / total < 0.05


def test_hotgraph_planted_masses(spark, hotgraph_dir):
    """--hotgraph plants ~30% of orders on one customer and a 300-doc
    near-dup template farm in exactly one (lang, source) blocking
    bucket."""
    orders = spark.read.parquet(f"{hotgraph_dir}/orders.parquet")
    hot = orders.groupBy("o_custkey").count().orderBy(F.desc("count")).first()
    assert hot["count"] / orders.count() == pytest.approx(0.30, abs=0.03)
    docs = spark.read.parquet(f"{hotgraph_dir}/documents.parquet")
    farm = docs.filter(F.col("lang") == "farm0")
    assert farm.count() == 300
    assert farm.select("lang", "source").distinct().count() == 1


def test_level2_composition_is_permutation_disjoint(spark, level2_dir):
    """VERDICT r10 #1 gate: composing a second decade must keep every
    shard-of-a-shard letter-permutation-distinct. A second Caesar layer
    would collapse 100 shards onto 19 rotation sums (~5 byte-identical
    clones of every base doc — quadratic cross-shard pair blowup); the
    affine level-2 cipher must keep every shard's texts distinct, so the
    DISTINCT-text count scales exactly 100x (zero cross-shard collisions
    AND each shard preserving the base's internal dup structure — with
    100 shards of the same base, a double-Caesar composition would read
    ~19x here, not 100x)."""
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lvl2 = spark.read.parquet(f"{level2_dir}/documents.parquet")
    n_base, n_lvl2 = base.count(), lvl2.count()
    assert n_lvl2 == 100 * n_base
    assert (
        lvl2.select("text").distinct().count()
        == 100 * base.select("text").distinct().count()
    )
    # One base doc's 100 shards must all carry distinct permuted texts.
    one = lvl2.filter((F.col("doc_id") % n_base) == 7)
    assert one.count() == 100
    assert one.select("text").distinct().count() == 100


def test_level2_hotsource_replants_mass(spark, level2_hotsource_dir):
    """--level2 --hotsource must re-plant the ~52.5% hot-source mass at
    the composed scale (same window as the level-1 gate)."""
    docs = spark.read.parquet(f"{level2_hotsource_dir}/documents.parquet")
    total = docs.count()
    by_src = docs.groupBy("source").count().orderBy(F.desc("count")).collect()
    assert by_src[0]["count"] / total == pytest.approx(0.525, abs=0.02)


def test_level2_refuses_skew():
    """--skew's hottest-base-lang heuristic is meaningless over a source
    whose langs are already decade shards; the generator must refuse,
    not plant garbage."""
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "tools",
                "make_scale_decade.py",
            ),
            "--level2",
            "--skew",
            "--out",
            "/tmp/level2_refused_test",
        ],
        capture_output=True,
        text=True,
    )
    assert proc.returncode != 0
    assert "--level2" in proc.stderr


def test_skew_split_fires_on_planted_data(spark, skew_dir):
    """The toy demo, promoted: a suppkey-keyed SMJ over the PLANTED hot
    supplier must carry skew=true under lowered thresholds, and its result
    must equal the non-split join exactly."""
    line = spark.read.parquet(f"{skew_dir}/lineitem.parquet").select(
        "l_suppkey", "l_orderkey", "l_quantity"
    )
    supp = spark.read.parquet(f"{skew_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    def run():
        return line.join(supp, "l_suppkey").groupBy("l_suppkey", "s_name").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(20,2)")).alias("q"),
        )

    conf = dict(_SPLIT_CONF)
    conf["spark.sql.autoBroadcastJoinThreshold"] = "-1"  # force SMJ
    saved = with_conf(spark, conf)
    try:
        j = run()
        rows_on = sorted(map(tuple, j.collect()))  # finalize THIS plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        # The aggregate reuses the join partitioning, so the split only
        # happens because forceOptimizeSkewedJoin accepts the extra
        # shuffle — without it OptimizeSkewedJoin declines and the hot
        # supplier partition runs monolithic (verified red during
        # development).
        assert "skew=true" in plan, plan[:2000]
    finally:
        with_conf(spark, saved)
    saved = with_conf(
        spark,
        {
            "spark.sql.adaptive.skewJoin.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    try:
        rows_off = sorted(map(tuple, run().collect()))
    finally:
        with_conf(spark, saved)
    assert rows_on == rows_off


# Gate-bearing representatives of the heavy families: relational join/agg,
# graph iteration, LSH/banding dedup, blocking-keyed chargram dedup, LPA.
_INVARIANT_QUERIES = [
    "q_zone_performance",
    "q_ingest_clean",
    "q_pagerank",
    "q_label_propagation",
    "q_dedup_minhash",
    "q_dedup_chargram",
]


@pytest.mark.parametrize("qname", _INVARIANT_QUERIES)
def test_heavy_queries_invariant_under_skew_split(spark, skew_dir, qname):
    fn = all_queries()[qname].fn
    saved = with_conf(spark, _SPLIT_CONF)
    try:
        h_on = content_hash(fn(spark, skew_dir))
    finally:
        with_conf(spark, saved)
    saved = with_conf(
        spark, {"spark.sql.adaptive.skewJoin.enabled": "false"}
    )
    try:
        h_off = content_hash(fn(spark, skew_dir))
    finally:
        with_conf(spark, saved)
    assert h_on == h_off
