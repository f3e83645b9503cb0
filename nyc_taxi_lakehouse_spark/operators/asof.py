"""As-of and range joins — time-series operators Spark has no native form of.

Two operators the reference's event-analytics family implies but no SQL
engine-agnostic form exists for in Spark (SURVEY §2.3 join family; DuckDB
grew native ASOF JOIN precisely because plain SQL can't plan it well):

- q_asof_join: purchase→click attribution — each purchase matched to the
  SAME user's most recent click at-or-before it. Spark side is the canonical
  distributed merge-as-of: union both sides, one shuffle on the key, one
  ordered window pass with a forward-fill (last ignoreNulls). That is the
  shape that scales — the naive inequality join would plan as a per-user
  range cross product, and a pure theta-join would fall off the hash-join
  path entirely. The DuckDB oracle uses its native ASOF LEFT JOIN, so this
  also pins our window encoding against a reference implementation.
- q_range_join: per-purchase lookback aggregate (clicks in the preceding 30
  minutes). The equality key (user_id) keeps it on the hash/sort-merge join
  path; the range predicate is a post-join filter — at scale the join
  shuffles once on user_id and AQE handles skewed users.

Both emit epoch-microsecond BIGINTs (events parquet is ns-precision; raw
timestamps would hash-mismatch — see functions/detsql.py conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.detsql import DUCK, SPARK, Dialect
from ..registry import df_query, sql_query
from ..sources.tables import load_tables

_CLEAN = "event_id IS NOT NULL AND ts IS NOT NULL AND value > 0"

_ASOF_ORACLE = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, value, (epoch_ns(ts) // 1000) AS ts_us
  FROM events WHERE {_CLEAN}
),
clicks AS (
  SELECT user_id, ts_us, MAX(event_id) AS click_event_id
  FROM ev WHERE event_type = 'click' GROUP BY user_id, ts_us
),
purch AS (
  SELECT event_id AS purchase_event_id, user_id, ts_us, value FROM ev
  WHERE event_type = 'purchase'
)
SELECT p.purchase_event_id,
       p.user_id,
       p.ts_us AS purchase_ts_us,
       p.value AS purchase_value,
       c.click_event_id,
       c.ts_us AS click_ts_us,
       p.ts_us - c.ts_us AS gap_us
FROM purch p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
"""


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Distributed merge-as-of: for each left row, the right row with the
    greatest right_ts <= left_ts within the same `on` key (inclusive).

    Union-sentinel encoding: right rows sort before left rows at equal
    timestamps (kind 0 < 1), a forward-fill window (last ignoreNulls, rows
    unbounded-preceding..current) carries the latest right values onto every
    left row, then left rows are filtered back out. ONE shuffle on the key,
    one sort, no range join — linear in partition size, skew-bounded by the
    key's own cardinality. Right side must be unique per (on, right_ts);
    pre-aggregate to enforce (callers here dedup by MAX id).

    The fill carries ONE struct holding the right timestamp plus all
    right_cols, so every output row's right-side values come from the same
    matched right row even when some right_cols are genuinely NULL
    (per-column last(ignorenulls) would skip past a NULL payload column and
    stitch together values from different right rows).
    """
    lcols = [c for c in left.columns if c != on]
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__kind"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(
            F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
        ).alias("__r"),
    )
    l = left.select(  # noqa: E741
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__kind"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
    )
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r.unionByName(l).withColumn(
        "__r", F.last("__r", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("__kind") == 1)
    for c in right_cols:
        out = out.withColumn(c, F.col("__r")[c])
    return out.withColumn("__rts", F.col("__r.__rts")).drop("__kind", "__r")


@df_query(
    "q_asof_join",
    duck_sql=_ASOF_ORACLE,
    tables=["events"],
    doc="As-of join (purchase→click attribution): each purchase matched to "
    "the same user's most recent click at-or-before it, NULL-preserving for "
    "never-clicked purchases. Spark: union-sentinel merge-as-of — one "
    "shuffle on user_id, one ordered window with forward-fill; oracle: "
    "DuckDB's native ASOF LEFT JOIN, pinning the encoding against a "
    "first-class implementation. Clicks pre-deduped per (user, ts) by MAX "
    "event_id so ties are deterministic in both engines.",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    ev = (
        t["events"]
        .filter(_CLEAN)
        .select(
            "event_id", "user_id", "event_type", "value",
            F.unix_micros("ts").alias("ts_us"),
        )
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        "ts_us",
        F.col("value").alias("purchase_value"),
    )
    joined = asof_join(
        purch,
        clicks,
        on="user_id",
        left_ts="ts_us",
        right_ts="ts_us",
        right_cols=["click_event_id"],
    )
    return joined.select(
        "purchase_event_id",
        "user_id",
        F.col("__ts").alias("purchase_ts_us"),
        "purchase_value",
        "click_event_id",
        F.col("__rts").alias("click_ts_us"),
        (F.col("__ts") - F.col("__rts")).alias("gap_us"),
    )


_RANGE_WINDOW_US = 30 * 60 * 1000000  # 30-minute lookback

_RANGE_ORACLE = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, value, (epoch_ns(ts) // 1000) AS ts_us
  FROM events WHERE {_CLEAN}
),
clicks AS (SELECT user_id, ts_us, value FROM ev WHERE event_type = 'click'),
purch AS (
  SELECT event_id AS purchase_event_id, user_id, ts_us FROM ev
  WHERE event_type = 'purchase'
)
SELECT p.purchase_event_id,
       p.user_id,
       p.ts_us AS purchase_ts_us,
       CAST(COUNT(c.ts_us) AS BIGINT) AS n_clicks_30m,
       CAST(SUM(CAST(c.value AS DECIMAL(28,2))) AS DOUBLE) AS click_value_30m
FROM purch p
LEFT JOIN clicks c
  ON p.user_id = c.user_id
 AND c.ts_us > p.ts_us - {_RANGE_WINDOW_US}
 AND c.ts_us <= p.ts_us
GROUP BY p.purchase_event_id, p.user_id, p.ts_us
"""


@df_query(
    "q_range_join",
    duck_sql=_RANGE_ORACLE,
    tables=["events"],
    doc="Range (interval) join: per-purchase count/value of the same user's "
    "clicks in the preceding 30 minutes, zero-click purchases kept at count "
    "0. The user_id equality keeps Spark on the shuffled hash-join path "
    "(the range predicate is a join-level filter, NOT a nested-loop "
    "trigger); decimal-exact click-value sum per the engine's determinism "
    "conventions.",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    ev = (
        t["events"]
        .filter(_CLEAN)
        .select(
            "event_id", "user_id", "event_type", "value",
            F.unix_micros("ts").alias("ts_us"),
        )
    )
    # Both sides derive from the same `ev` plan — rename the click side's
    # columns outright so the join carries no ambiguous attribute (a
    # drop(clicks.user_id) would resolve by expression id, not by side, and
    # can silently keep the null-filled click copy).
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts_us").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
    )
    joined = purch.join(
        clicks,
        (purch.user_id == clicks.c_user)
        & (clicks.c_ts > purch.purchase_ts_us - _RANGE_WINDOW_US)
        & (clicks.c_ts <= purch.purchase_ts_us),
        "left",
    ).drop("c_user")
    return joined.groupBy("purchase_event_id", "user_id", "purchase_ts_us").agg(
        F.count("c_ts").alias("n_clicks_30m"),
        F.sum(F.col("c_value").cast("decimal(28,2)")).cast("double").alias(
            "click_value_30m"
        ),
    )


# ---------------------------------------------------------------------------
# SCD Type-2: dimension history build + point-in-time join.
# ---------------------------------------------------------------------------

_TS_MAX = 9_223_372_036_854_775_807  # open-ended validity sentinel


def _scd2_sql(d: Dialect) -> str:
    """Build the Type-2 history from the raw change stream (each non-purchase
    event = an attribute change; LEAD closes the validity interval), then
    point-in-time join the purchase facts by interval containment
    [valid_from, valid_to). The interval build and the containment join are
    pure integer comparisons — hash-exact."""
    return f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, value, {d.epoch_us('ts')} AS ts_us
  FROM events
  WHERE event_id IS NOT NULL AND ts IS NOT NULL AND value > 0
),
dim AS (
  SELECT user_id, event_type AS state, ts_us AS valid_from,
         COALESCE(LEAD(ts_us) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
         ), {_TS_MAX}) AS valid_to
  FROM ev WHERE event_type <> 'purchase'
),
facts AS (
  SELECT event_id, user_id, ts_us, value FROM ev WHERE event_type = 'purchase'
)
SELECT
  d2.state,
  CAST(COUNT(*) AS BIGINT) AS n_purchases,
  CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_users,
  CAST(SUM(CAST(f.value AS DECIMAL(28,2))) AS DOUBLE) AS total_value,
  CAST(MIN(f.ts_us - d2.valid_from) AS BIGINT) AS min_state_age_us,
  CAST(MAX(f.ts_us - d2.valid_from) AS BIGINT) AS max_state_age_us
FROM facts f
JOIN dim d2
  ON f.user_id = d2.user_id
 AND f.ts_us >= d2.valid_from
 AND f.ts_us < d2.valid_to
GROUP BY d2.state
"""


sql_query(
    "q_scd2_point_in_time",
    spark_sql=_scd2_sql(SPARK),
    duck_sql=_scd2_sql(DUCK),
    tables=["events"],
    doc="SCD Type-2 end-to-end: the dimension HISTORY is built from the raw "
    "change stream (each non-purchase event opens a validity interval; "
    "LEAD over (user, time) closes the previous one — the standard "
    "Kimball Type-2 build as one window pass), then purchase facts join "
    "point-in-time by interval containment [valid_from, valid_to), "
    "answering 'what state was the user in WHEN they bought' — the "
    "question Type-1 overwrite dimensions cannot answer and the reason "
    "lakehouse CDC pipelines keep history. Plan: the containment join "
    "keys on user_id equality (hash join; the interval predicate rides "
    "as a join filter — same shape as q_range_join), and the window "
    "build shares the user_id exchange. At 100 TB both sides partition "
    "on user_id and the unbounded current rows (valid_to = +inf "
    "sentinel) cost nothing extra.",
)


@df_query(
    "q_asof_cogroup",
    duck_sql=_ASOF_ORACLE,
    tables=["events"],
    doc="The SAME as-of attribution through Spark's remaining Arrow API "
    "surface: cogrouped pandas (groupBy().cogroup().applyInPandas) — both "
    "sides shuffle ONCE on a 32-way hash bucket of the user, each bucket's "
    "purchase/click frames arrive as one pandas pair, and "
    "pandas.merge_asof(left_by/right_by=user) keeps the per-user asof "
    "discipline inside the batch. Bucketing the cogroup (instead of "
    "per-user groups) amortizes the per-group Arrow marshalling ~50x: "
    "measured 6.5 s -> 0.8 s at sf0.1, now at par with the relational "
    "q_asof_join. Two engine gotchas are pinned in comments: duplicate "
    "output-column names make Spark prune the right child's copy from "
    "the Arrow batch (hence cuser_id), and per-task memory is one "
    "bucket's frames — bucket count is the memory/overhead dial. "
    "Hash-checked against the identical DuckDB ASOF LEFT JOIN oracle as "
    "q_asof_join at three SFs.",
)
def q_asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    t = load_tables(spark, sf_dir, ["events"])
    ev = (
        t["events"]
        .filter(_CLEAN)
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.unix_micros("ts").alias("ts_us"),
        )
    )
    purch = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        F.col("value").alias("purchase_value"),
    )
    # The click-side user key is RENAMED to cuser_id: with both sides
    # carrying a column named user_id, Spark resolves the output schema's
    # user_id to the LEFT child and prunes the right child's copy out of
    # the Arrow batch entirely (observed: c arrived without user_id) —
    # merge_asof then uses left_by/right_by across the two names.
    clicks = (
        ev.filter("event_type = 'click'")
        .groupBy(F.col("user_id").alias("cuser_id"), F.col("ts_us").alias("click_ts_us"))
        .agg(F.max("event_id").alias("click_event_id"))
    )

    schema = (
        "purchase_event_id long, user_id long, purchase_ts_us long, "
        "purchase_value double, click_event_id long, click_ts_us long, gap_us long"
    )

    def merge(p: "pd.DataFrame", c: "pd.DataFrame") -> "pd.DataFrame":
        if len(p) == 0:
            return pd.DataFrame(
                columns=[
                    "purchase_event_id", "user_id", "purchase_ts_us",
                    "purchase_value", "click_event_id", "click_ts_us", "gap_us",
                ]
            )
        p = p.sort_values("purchase_ts_us")
        if len(c) == 0:
            out = p.copy()
            out["click_event_id"] = pd.array([None] * len(p), dtype="Int64")
            out["click_ts_us"] = pd.array([None] * len(p), dtype="Int64")
        else:
            c = c.sort_values("click_ts_us")
            out = pd.merge_asof(
                p,
                c,
                left_on="purchase_ts_us",
                right_on="click_ts_us",
                left_by="user_id",
                right_by="cuser_id",
                direction="backward",
                allow_exact_matches=True,
            )
            out["click_event_id"] = out["click_event_id"].astype("Int64")
            out["click_ts_us"] = out["click_ts_us"].astype("Int64")
        out["gap_us"] = (out["purchase_ts_us"] - out["click_ts_us"]).astype("Int64")
        return out[
            [
                "purchase_event_id", "user_id", "purchase_ts_us",
                "purchase_value", "click_event_id", "click_ts_us", "gap_us",
            ]
        ]

    # Cogroup on a HASH BUCKET of the user, not the user itself: each Arrow
    # group carries ~|users|/32 users and pandas.merge_asof(by="user_id")
    # does the per-user discipline inside the batch — same semantics, but
    # the per-group Arrow marshalling overhead amortizes over the bucket
    # (measured 6.5 s -> ~1 s at sf0.1 against the identical oracle).
    purch = purch.withColumn("b", F.pmod(F.col("user_id"), F.lit(32)))
    clicks = clicks.withColumn("b", F.pmod(F.col("cuser_id"), F.lit(32)))
    return (
        purch.groupBy("b")
        .cogroup(clicks.groupBy("b"))
        .applyInPandas(merge, schema)
    )
