"""Behavioral / product analytics: conversion funnels and cohort
retention — the two event-sequence rollups every OLAP engine over an
events table ends up serving (the reference's events analog is its
per-wallet tx timeline, btcolap.sql:251-309, which it sequences with
ROW_NUMBER + self-joins; these are the generalized shapes).

Scale notes (100 TB posture):
- win_funnel is ONE shuffle on user_id: the staged "first A, then
  first B after it, then first C after that" semantics collapse into a
  per-user ordered fold (`aggregate` over a sorted event array), all
  JVM higher-order functions — no k-way self-join (the naive funnel is
  k joins of the fact against itself), no window, no Python. Per-user
  arrays are bounded by per-user activity, the same envelope any
  per-entity sessionization carries; a hot user is AQE skew territory,
  not a plan change.
- agg_retention shuffles on user_id (first-touch cohort), reuses that
  key for the activity join, and finishes with a calendar-bounded
  (cohort, offset) aggregate — every shuffle is keyed, no windows at
  fact grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import epoch_us
from ..registry import query

#: funnel stage order: the canonical view -> click -> purchase path.
FUNNEL_STAGES = ("view", "click", "purchase")

#: padded sort key — total order over (event-time, event_id), the same
#: cross-engine trick ts_ohlc uses (DuckDB min() on VARCHAR == Spark
#: min on format_string; struct ordering differs between engines).
_KEY = "printf('%020d-%012d', epoch_us(CAST(ts AS TIMESTAMP)), event_id)"


@query(
    "win_funnel",
    oracle=f"""
    WITH f AS (
        SELECT user_id, event_type,
               {_KEY} AS k
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ),
    v AS (SELECT user_id, MIN(k) AS k1 FROM f
          WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT f.user_id, MIN(f.k) AS k2
          FROM f JOIN v USING (user_id)
          WHERE f.event_type = 'click' AND f.k > v.k1 GROUP BY 1),
    p AS (SELECT f.user_id, MIN(f.k) AS k3
          FROM f JOIN c USING (user_id)
          WHERE f.event_type = 'purchase' AND f.k > c.k2 GROUP BY 1)
    SELECT (SELECT COUNT(*) FROM v) AS users_viewed,
           (SELECT COUNT(*) FROM c) AS users_clicked,
           (SELECT COUNT(*) FROM p) AS users_purchased
    """,
)
def win_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel view -> click -> purchase: how many users
    reached each stage IN ORDER (a click only counts after the user's
    first view; a purchase only after that click).

    The textbook formulation is k chained self-joins (the oracle says
    it that way: first view, first click strictly after it, first
    purchase strictly after that). Here the whole state machine runs in
    one hash aggregate: per user, sort the (key, type) events and fold
    a stage counter over them with `aggregate` — acc advances 0->1 on
    'view', 1->2 on 'click', 2->3 on 'purchase', monotone, so the
    result equals the chained-min semantics under the same total order
    (the padded epoch_us+event_id key; ties cannot reorder because keys
    are unique). One shuffle, JVM-only lambdas, output is a single
    3-column row."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*FUNNEL_STAGES)
    )
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.format_string(
                        "%020d-%012d", epoch_us("ts"), F.col("event_id")
                    ).alias("k"),
                    F.col("event_type").alias("et"),
                )
            )
        ).alias("seq")
    )
    stage = per_user.select(
        F.aggregate(
            "seq",
            F.lit(0),
            lambda acc, x: F.when(
                (acc == 0) & (x["et"] == FUNNEL_STAGES[0]), F.lit(1)
            )
            .when((acc == 1) & (x["et"] == FUNNEL_STAGES[1]), F.lit(2))
            .when((acc == 2) & (x["et"] == FUNNEL_STAGES[2]), F.lit(3))
            .otherwise(acc),
        ).alias("stage")
    )
    return stage.agg(
        F.count(F.when(F.col("stage") >= 1, 1)).alias("users_viewed"),
        F.count(F.when(F.col("stage") >= 2, 1)).alias("users_clicked"),
        F.count(F.when(F.col("stage") >= 3, 1)).alias("users_purchased"),
    )


@query(
    "agg_retention",
    oracle="""
    WITH first_touch AS (
        SELECT user_id,
               date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS cohort
        FROM events GROUP BY 1
    ),
    active AS (
        SELECT DISTINCT user_id,
               date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
        FROM events
    )
    SELECT CAST(f.cohort AS TIMESTAMP) AS cohort,
           date_diff('day', f.cohort, a.wk) // 7 AS week_offset,
           COUNT(*) AS active_users
    FROM active a JOIN first_touch f USING (user_id)
    GROUP BY 1, 2
    """,
)
def agg_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by the week of their
    first event (the cohort), counted in each subsequent week they were
    active — the (cohort, week_offset, active_users) triangle behind
    every retention curve.

    Plan: first-touch is a user_id hash aggregate; weekly activity is a
    (user_id, week) distinct; the join back is on user_id (same key,
    co-partitioned — AQE reuses the exchange where plans align and the
    first-touch side is aggregate-sized anyway); the final rollup keys
    on (cohort, offset), calendar-bounded. Both engines truncate weeks
    to Monday and the offset is integer floor-div of exact day counts,
    so no arithmetic can drift."""
    ev = table(spark, sf_dir, "events")
    first_touch = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    return (
        active.join(first_touch, "user_id")
        .groupBy(
            F.col("cohort"),
            F.floor(
                F.datediff(F.col("wk"), F.col("cohort")) / F.lit(7)
            ).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@query(
    "win_streak_runs",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn_all,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn_type
        FROM events
    ),
    runs AS (
        SELECT user_id, COUNT(*) AS run_len
        FROM seq WHERE event_type = 'purchase'
        GROUP BY user_id, rn_all - rn_type
    )
    SELECT user_id,
           MAX(run_len) AS longest_streak,
           COUNT(*) AS n_streaks
    FROM runs GROUP BY user_id
    """,
)
def win_streak_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding over each user's ordered event sequence —
    the longest consecutive-purchase streak and the number of purchase
    runs per user. This is the relational stand-in for
    MATCH_RECOGNIZE-style sequence patterns (which neither Spark nor
    DuckDB ships): rn_all - rn_type is constant exactly within a
    maximal run of one event type (the sequence twin of
    win_gaps_islands' date anchor), so a hash aggregate on the
    difference folds each run with no self-join and no iteration —
    the shape that survives billions of events per day. Two
    user-keyed window shuffles ((user) and (user, type) partitionings)
    then aggregates on the same keys; (ts, event_id) tiebreaks make
    run boundaries deterministic on both engines."""
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    seq = e.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias(
            "grp"
        ),
    )
    runs = (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return runs.groupBy("user_id").agg(
        F.max("run_len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )
