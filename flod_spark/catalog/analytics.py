"""Event-analytics operators over the `events` table (extension mandate —
the product-analytics queries an event pipeline feeds): ordered funnel
conversion and cohort retention. Pure DataFrame built-ins; every join is
on user_id so the per-user aggregates co-partition and Catalyst reuses
one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@query(
    "orders_rfm",
    oracle=(
        # RFM scoring: recency (days since last order at corpus max
        # date), frequency, monetary — each quartiled over a total order
        "WITH mx AS (SELECT MAX(o_orderdate) AS mxd FROM orders), "
        "base AS (SELECT o_custkey AS custkey, "
        "    CAST(date_diff('day', MAX(o_orderdate), (SELECT mxd FROM mx)) AS BIGINT) AS recency_days, "
        "    CAST(COUNT(*) AS BIGINT) AS frequency, "
        "    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary "
        "  FROM orders GROUP BY o_custkey) "
        "SELECT custkey, recency_days, frequency, monetary, "
        "  CAST(ntile(4) OVER (ORDER BY recency_days, custkey) AS BIGINT) AS r_score, "
        "  CAST(ntile(4) OVER (ORDER BY frequency DESC, custkey) AS BIGINT) AS f_score, "
        "  CAST(ntile(4) OVER (ORDER BY monetary DESC, custkey) AS BIGINT) AS m_score "
        "FROM base"
    ),
)
def orders_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) customer scoring — the classic
    value-segmentation pass. One partial-agg shuffle builds the per-
    customer base; each score is an EXACT quartile over a total (metric,
    custkey) order, computed by _dist_over_total_order's bucketed-rank
    machinery (never an unpartitioned ntile window — three of those were
    three single-partition sorts). DESC orders become ASC on the negated
    metric (no NULLs in the base, so the total orders are identical).
    The base is localCheckpoint-ed: each rank pass reads it three times
    (boundary sample, ranked exchange, total count), so materializing
    |customers| rows once beats re-running the orders aggregation ~10x."""
    from flod_spark.catalog.relational import _dist_over_total_order

    o = load(spark, sf_dir, "orders")
    mxd = o.agg(F.max("o_orderdate").alias("mxd"))
    base = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("monetary"),
        )
        .crossJoin(F.broadcast(mxd))
        .select(
            "custkey",
            F.datediff("mxd", "last_order").cast("long").alias("recency_days"),
            "frequency",
            "monetary",
        )
        .localCheckpoint()
    )

    def quartile(order_cols, alias):
        d = _dist_over_total_order(base, order_cols, 4)
        return d.select("custkey", F.col("_ntile").alias(alias))

    r = quartile(["recency_days", "custkey"], "r_score")
    f = quartile([(-F.col("frequency")).alias("neg_f"), F.col("custkey")], "f_score")
    m = quartile([(-F.col("monetary")).alias("neg_m"), F.col("custkey")], "m_score")
    return base.join(r, "custkey").join(f, "custkey").join(m, "custkey")
