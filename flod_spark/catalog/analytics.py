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
    |customers| rows once beats re-running the orders aggregation ~10x.

    Scale: one partial-agg shuffle plus three bucketed-rank passes over
    a localCheckpoint-ed base; no unpartitioned windows."""
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


_PR_FXP = 1099511627776.0  # 2^40 — exact cross-row sums (the embed_centroids rule)
_PR_D = 0.85  # damping


def _pr_round_sql(prev: str, out: str) -> str:
    """One unrolled PageRank round in SQL: per-edge contribution
    floor(r/deg * 2^40) summed as BIGINT (order-independent), then
    r' = (1-d)/n + d * sum/2^40. All per-row double ops are identical
    IEEE in both engines; only exact integers cross the aggregation."""
    return (
        f"c_{out} AS (SELECT e.dst AS node, "
        f"    SUM(CAST(floor({prev}.r / deg.d * {_PR_FXP}) AS BIGINT)) AS s "
        f"  FROM edges e JOIN deg ON deg.node = e.src JOIN {prev} ON {prev}.node = e.src "
        "  GROUP BY e.dst), "
        f"{out} AS (SELECT nodes.node, "
        f"    CAST({1 - _PR_D} AS DOUBLE) / (SELECT n FROM nn) "
        f"    + CAST({_PR_D} AS DOUBLE) * (CAST(COALESCE(c_{out}.s, 0) AS DOUBLE) / {_PR_FXP}) AS r "
        f"  FROM nodes LEFT JOIN c_{out} ON c_{out}.node = nodes.node)"
    )


@query(
    "pagerank_iter",
    oracle=(
        "WITH e0 AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src, "
        "    's' || CAST(l_suppkey AS VARCHAR) AS dst "
        "  FROM orders JOIN lineitem ON l_orderkey = o_orderkey), "
        "edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0), "
        "deg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src), "
        "nodes AS (SELECT DISTINCT src AS node FROM edges), "
        "nn AS (SELECT COUNT(*) AS n FROM nodes), "
        "r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes), "
        + _pr_round_sql("r0", "r1")
        + ", "
        + _pr_round_sql("r1", "r2")
        + " SELECT n1.node, n1.r AS rank_round1, n2.r AS rank_round2 "
        "FROM r1 n1 JOIN r2 n2 ON n1.node = n2.node"
    ),
)
def pagerank_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled PageRank rounds over the customer-supplier bipartite
    graph (who-buys-from-whom, both directions) — the second iterative-
    algorithm template next to kmeans_iter, exact cross-engine: per-edge
    contributions r/deg are identical IEEE doubles, quantized to 2^40
    fixed-point BIGINTs before the SUM so the aggregation is order-
    independent, then r' = (1-d)/n + d*sum/2^40 is again pure identical
    double arithmetic.

    Scale: edges = one distinct projection of the join (|C x S| pairs
    that traded, both directions); each round is ONE shuffle — the
    contribution aggregate on dst — with deg/rank co-partitioned on the
    node key and the 1-row node count broadcast. The edge table and each
    round's ranks are localCheckpointed (kmeans_fit's rule): without the
    truncation, r2 + the final r1-r2 join re-derive the edge-build
    subtree repeatedly (measured 51 exchanges in the pure-lineage plan
    vs ~10 truncated) — the difference between an iterative algorithm
    that scales linearly in rounds and one that scales with the unrolled
    lineage."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    nn = nodes.agg(F.count("*").alias("n"))

    def pr_round(prev: DataFrame) -> DataFrame:
        contrib = (
            edges.join(deg, edges["src"] == deg["node"])
            .join(prev.withColumnRenamed("node", "_pn"), F.col("src") == F.col("_pn"))
            .select(
                "dst",
                F.floor(F.col("r") / F.col("d") * F.lit(_PR_FXP)).cast("long").alias("c"),
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s"))
        )
        return (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                (
                    F.lit(1 - _PR_D) / F.col("n")
                    + F.lit(_PR_D) * (F.coalesce("s", F.lit(0)).cast("double") / F.lit(_PR_FXP))
                ).alias("r"),
            )
        )

    r0 = nodes.crossJoin(F.broadcast(nn)).select("node", (F.lit(1.0) / F.col("n")).alias("r"))
    r1 = pr_round(r0).localCheckpoint()
    r2 = pr_round(r1)
    return (
        r1.withColumnRenamed("r", "rank_round1")
        .join(r2.withColumnRenamed("r", "rank_round2"), "node")
        .select("node", "rank_round1", "rank_round2")
    )


def _curation_oracle() -> str:
    from flod_spark.catalog.text import (
        PUNCT_RE,
        QUALITY_MAX_PUNCT,
        QUALITY_MIN_CHARS,
        QUALITY_MIN_STOP,
        QUALITY_MIN_TOKENS,
        STOP_COUNT_SQL,
        TOKEN_RE,
    )

    keep = (
        f"length(text) >= {QUALITY_MIN_CHARS} "
        f"AND length(regexp_extract_all(lower(text), '{TOKEN_RE}')) >= {QUALITY_MIN_TOKENS} "
        f"AND CAST(length(regexp_extract_all(text, '{PUNCT_RE}')) AS DOUBLE) "
        f"  / NULLIF(length(text), 0) < {QUALITY_MAX_PUNCT} "
        f"AND CAST({STOP_COUNT_SQL} AS DOUBLE) "
        f"  / NULLIF(length(regexp_extract_all(lower(text), '{TOKEN_RE}')), 0) >= {QUALITY_MIN_STOP}"
    )
    return (
        "WITH d AS (SELECT doc_id, lang, "
        f"    CAST(length(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS BIGINT) AS n_tok, "
        f"    CASE WHEN {keep} THEN 1 ELSE 0 END AS keep FROM documents) "
        "SELECT d.lang, e.label, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "  CAST(SUM(d.keep) AS BIGINT) AS n_keep, "
        "  CAST(SUM(d.keep) AS DOUBLE) / COUNT(*) AS keep_rate, "
        "  CAST(SUM(d.n_tok) AS BIGINT) AS total_tokens "
        "FROM d JOIN embeddings e ON e.vec_id = d.doc_id "
        "GROUP BY d.lang, e.label"
    )


@query("curation_join", oracle=_curation_oracle())
def curation_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal curation matrix — the table a training-data curator
    reads before setting mixture weights: text-quality keep-rate and
    token mass per (lang, semantic cluster) cell, joining the documents
    table to its embedding clusters on the shared id. The quality
    predicate is the shared C4-style keep rule (same constants as
    doc_quality / prep_pipeline). Scale: one co-partitioned id join
    (both sides pre-projected to a few columns) + a partial-agg over
    |langs x labels| cells; at 100 TB the embedding side is the narrow
    one and broadcast-bucketing by id range applies."""
    from flod_spark.catalog.text import TOKEN_RE, quality_keep_col

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), F.lit(0)))
        .cast("long")
        .alias("n_tok"),
        F.when(quality_keep_col(), 1).otherwise(0).alias("keep"),
    )
    e = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        d.join(e, d["doc_id"] == e["vec_id"])
        .groupBy("lang", "label")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("keep").alias("n_keep"),
            (F.sum("keep").cast("double") / F.count("*")).alias("keep_rate"),
            F.sum("n_tok").alias("total_tokens"),
        )
    )
