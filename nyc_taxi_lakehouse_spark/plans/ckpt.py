"""Local-checkpoint lifecycle management for iterative operators.

VERDICT r8 #2: the iterative pipelines (CC star loop, k-core peel, the
production dedup chain) localCheckpoint per-round state to keep lineage
O(1), but a long-lived session never released SUPERSEDED rounds — every
round's blocks stayed persisted until the driver GC'd the Python frame and
the async ContextCleaner caught up. At decade scale (sf1-equivalent) that
accumulation is what produced the GC churn / repeat-run OOM at the default
8 GiB single-JVM heap. The fix is explicit eviction: once round N+1 has
eagerly materialized, round N's blocks are unreachable by any live plan and
are released immediately.

Safety model: local checkpoints TRUNCATE lineage, so an action on an
evicted frame fails LOUDLY (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND) rather than
silently recomputing stale data — misplacing an evict is a crash in tests,
never a wrong answer. Eviction sites therefore only release state that is
provably dead: the previous round after the next round materialized
eagerly, and loop-internal inputs (edge sets) after the loop has produced
its final checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def evict_local_checkpoint(df: DataFrame) -> None:
    """Release the executor blocks behind a localCheckpointed DataFrame.

    ``df`` must be the checkpointed frame itself (its analyzed plan is the
    LogicalRDD the checkpoint produced), not a transformation of one — the
    guard raises on anything else so a refactor that slips a projection in
    between fails red instead of silently leaking the blocks.

    Non-blocking unpersist: the BlockManager frees the partitions
    asynchronously, which is fine — the next round's materialization has
    already completed by the time any caller invokes this.
    """
    plan = df._jdf.queryExecution().analyzed()
    if plan.getClass().getSimpleName() != "LogicalRDD":
        raise TypeError(
            "evict_local_checkpoint expects the localCheckpointed frame "
            f"itself; analyzed plan is {plan.getClass().getSimpleName()}, "
            "not LogicalRDD"
        )
    plan.rdd().unpersist(False)


def persistent_rdd_count(spark) -> int:
    """Number of currently persisted RDDs in the JVM — the observable the
    checkpoint-lifecycle tests pin (bounded across rounds and across
    repeat runs, instead of growing by one per iteration)."""
    return spark.sparkContext._jsc.getPersistentRDDs().size()
