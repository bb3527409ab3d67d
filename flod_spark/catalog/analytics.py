"""Event-analytics operators over the `events` table (extension mandate —
the product-analytics queries an event pipeline feeds): ordered funnel
conversion and cohort retention. Pure DataFrame built-ins; every join is
on user_id so the per-user aggregates co-partition and Catalyst reuses
one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flod_spark.io import load
from flod_spark.registry import query


@query(
    "funnel_steps",
    oracle=(
        # ordered funnel: first signup -> first click AFTER it -> first
        # purchase AFTER that click, per user; depth = steps reached
        "WITH s AS (SELECT user_id, MIN(ts) AS t_signup FROM events "
        "    WHERE event_type = 'signup' GROUP BY user_id), "
        "c AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e JOIN s USING (user_id) "
        "    WHERE e.event_type = 'click' AND e.ts > s.t_signup GROUP BY e.user_id), "
        "p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase FROM events e JOIN c USING (user_id) "
        "    WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id) "
        "SELECT s.user_id, s.t_signup, c.t_click, p.t_purchase, "
        "  CAST(1 + (CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) "
        "     + (CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS funnel_depth "
        "FROM s LEFT JOIN c ON s.user_id = c.user_id LEFT JOIN p ON s.user_id = p.user_id"
    ),
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup -> click -> purchase): each step's first
    event must follow the previous step's. Scale: three per-user MIN
    aggregates + two left joins, ALL keyed on user_id — one hash
    partitioning serves every stage (Catalyst reuses the exchange), so
    the whole funnel costs one shuffle of |users|-sized aggregates."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    c = (
        ev.join(s, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("t_signup")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.join(c, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_signup",
            "t_click",
            "t_purchase",
            (
                F.lit(1)
                + F.when(F.col("t_click").isNotNull(), 1).otherwise(0)
                + F.when(F.col("t_purchase").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("funnel_depth"),
        )
    )


@query(
    "cohort_retention",
    oracle=(
        # cohort = week of a user's FIRST event; the retention matrix
        # counts distinct users active k weeks later. Week offsets are
        # exact day-diffs / 7 (both week-starts are truncated Mondays)
        "WITH f AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_w "
        "    FROM events GROUP BY user_id), "
        "a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events) "
        "SELECT cohort_w, CAST(date_diff('day', cohort_w, w) // 7 AS BIGINT) AS week_offset, "
        "  CAST(COUNT(*) AS BIGINT) AS n_active "
        "FROM a JOIN f USING (user_id) GROUP BY cohort_w, week_offset"
    ),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active week,
    counted in each later active week. Scale: first-event agg and the
    distinct-activity set both partial-agg on user_id (one exchange,
    reused); the final matrix is |weeks²| rows — tiny. Both engines
    truncate weeks to Monday, so buckets align exactly."""
    ev = load(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort_w"))
    a = ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("w")).distinct()
    return (
        a.join(f, "user_id")
        .groupBy(
            "cohort_w",
            (F.datediff(F.col("w"), F.col("cohort_w")) / 7).cast("long").alias("week_offset"),
        )
        .agg(F.count("*").alias("n_active"))
    )
