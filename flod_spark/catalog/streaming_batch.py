"""Event-time windowing (SURVEY.md §2.5 streaming row) — batch-equivalent
queries over `events` so the DuckDB oracle applies. The true Structured
Streaming path (readStream + watermark + window/session_window) lives in
flod_spark/streaming/ and is asserted equal to these batch results in
tests/test_streaming.py (streaming-batch parity is Spark's own guarantee
for aligned windows; the test makes it explicit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flod_spark.io import load, ts_micros
from flod_spark.registry import query


@query(
    "stream_window",
    oracle=(
        "SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type, "
        "  COUNT(*) AS n_events, "
        "  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value "
        "FROM events GROUP BY win_start, event_type"
    ),
)
def stream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window per event_type.
    Streaming twin: streaming/windows.py::tumbling_counts (withWatermark +
    window()). Scale: windowed agg shuffles on (window, type) — partial agg
    collapses each task to |windows x types| rows first."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "sum_value")
    )


@query(
    "stream_sliding",
    oracle=(
        # Each event lands in exactly length/slide = 4 overlapping windows;
        # DuckDB time_bucket's fixed origin (2000-01-03) and Spark's (epoch)
        # are both 15-min aligned, so the window starts agree.
        "WITH w AS (SELECT event_type, value, unnest(generate_series("
        "    time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '45 minutes', "
        "    time_bucket(INTERVAL '15 minutes', ts), INTERVAL '15 minutes')) AS win_start "
        "  FROM events) "
        "SELECT win_start, event_type, COUNT(*) AS n_events, "
        "  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value "
        "FROM w GROUP BY win_start, event_type"
    ),
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window, 15-minute slide, per event_type (flod has no
    native windows; SURVEY §2.5 maps its chunked re-aggregation onto
    Spark's windowed groupBy). Streaming twin: streaming/windows.py::
    sliding_counts (withWatermark + window(len, slide)).
    Scale: Spark expands each row to len/slide = 4 window instances before
    the shuffle — partial agg collapses them to |windows × types| rows per
    task, so the exchange carries aggregates, not events."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "sum_value")
    )


@query(
    "stream_session",
    oracle=(
        "WITH o AS (SELECT user_id, event_id, ts, value, "
        "    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events), "
        "m AS (SELECT *, CASE WHEN prev_ts IS NULL "
        "    OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_s FROM o), "
        # CAST: DuckDB SUM() OVER yields HUGEINT (renders as float in the
        # compare layer); Spark emits BIGINT — cast so both agree bitwise.
        "s AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM m) "
        "SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end, "
        "  COUNT(*) AS n_events, "
        "  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value "
        "FROM s GROUP BY user_id, session_id"
    ),
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) via gaps-and-islands.
    Streaming twin: session_window('ts', '30 minutes') in streaming/windows.py.
    Scale: one shuffle on user_id; both window passes share the same
    partitioning (Catalyst reuses the exchange)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = 30 * 60 * 1_000_000
    sessionized = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev_ts").isNull()
                | (ts_micros("ts") - ts_micros("prev_ts") > gap_us),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_s").over(frame))
    )
    return sessionized.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


@query(
    "stream_dedup",
    oracle=(
        "SELECT user_id, event_type, MIN(event_id) AS first_event_id, MIN(ts) AS first_ts "
        "FROM events GROUP BY user_id, event_type"
    ),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup (first occurrence per (user, type)) — the batch shadow of
    streaming dropDuplicatesWithinWatermark (streaming/dedup.py). min_by on
    (ts, event_id) gives the deterministic 'first'.

    Scale: min_by collapses map-side; the shuffle carries one row per
    key per task."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"),
        F.min("ts").alias("first_ts"),
    )


@query(
    "resample_gapfill",
    oracle=(
        "WITH agg AS (SELECT user_id, date_trunc('day', ts) AS bucket, "
        "    CAST(COUNT(*) AS BIGINT) AS n_events, "
        "    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum "
        "  FROM events GROUP BY user_id, bucket), "
        "span AS (SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx FROM agg GROUP BY user_id), "
        "grid AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS bucket FROM span), "
        "j AS (SELECT g.user_id, g.bucket, a.n_events, a.val_sum "
        "  FROM grid g LEFT JOIN agg a USING (user_id, bucket)) "
        "SELECT user_id, bucket, COALESCE(n_events, 0) AS n_events, "
        "  last_value(val_sum IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket "
        "    ROWS UNBOUNDED PRECEDING) AS val_ffill, "
        "  n_events IS NULL AS is_gap "
        "FROM j"
    ),
)
def resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill: per-user daily buckets over each
    user's own active span, with empty buckets materialized (n_events=0)
    and the last observed daily sum carried forward — the downsample /
    regularize step before any per-entity sequence modeling.

    Scale: the bucket agg is one partial-agg shuffle; the per-user grid
    is generated by sequence()+explode from a 2-column span table (rows
    = span_days per user, never events); grid⋈agg co-partitions on
    (user_id, bucket); the forward fill is a bounded per-user window.
    First grid bucket always has events (span starts at the user's min),
    so the fill never reads an empty frame."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("bucket")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("val_sum"),
    )
    span = agg.groupBy("user_id").agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
    grid = span.select(
        "user_id", F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("bucket")
    )
    j = grid.join(agg, ["user_id", "bucket"], "left")
    w = Window.partitionBy("user_id").orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return j.select(
        "user_id",
        "bucket",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.last("val_sum", ignorenulls=True).over(w).alias("val_ffill"),
        F.col("n_events").isNull().alias("is_gap"),
    )


@query(
    "resample_interp",
    oracle=(
        # linear interpolation between observed daily sums: every gap
        # bucket has both neighbors (the grid spans min..max observed),
        # and the interpolation arithmetic is written with the SAME op
        # order both sides so doubles match bitwise
        "WITH agg AS (SELECT user_id, date_trunc('day', ts) AS bucket, "
        "    CAST(COUNT(*) AS BIGINT) AS n_events, "
        "    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum "
        "  FROM events GROUP BY user_id, bucket), "
        "span AS (SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx FROM agg GROUP BY user_id), "
        "grid AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS bucket FROM span), "
        "j AS (SELECT g.user_id, g.bucket, a.n_events, a.val_sum "
        "  FROM grid g LEFT JOIN agg a USING (user_id, bucket)), "
        "nb AS (SELECT user_id, bucket, n_events, val_sum, "
        "  last_value(val_sum IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket "
        "    ROWS UNBOUNDED PRECEDING) AS pv, "
        "  last_value(CASE WHEN val_sum IS NOT NULL THEN bucket END IGNORE NULLS) "
        "    OVER (PARTITION BY user_id ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS pb, "
        "  first_value(val_sum IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket "
        "    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv, "
        "  first_value(CASE WHEN val_sum IS NOT NULL THEN bucket END IGNORE NULLS) "
        "    OVER (PARTITION BY user_id ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb_ "
        "  FROM j) "
        "SELECT user_id, bucket, COALESCE(n_events, 0) AS n_events, "
        "  CASE WHEN val_sum IS NOT NULL THEN val_sum "
        "    ELSE pv + (nv - pv) * (CAST(date_diff('day', pb, bucket) AS DOUBLE) "
        "                           / CAST(date_diff('day', pb, nb_) AS DOUBLE)) END AS val_interp, "
        "  val_sum IS NULL AS is_gap "
        "FROM nb"
    ),
)
def resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with LINEAR interpolation — gapfill's twin
    for signals where carry-forward biases downstream models (sensor
    values, prices): each missing daily bucket gets
    prev + (next-prev) * elapsed/gap_span. Every gap has both
    neighbors by construction (the grid spans each user's own
    min..max observed day). Exactness: neighbor sums are decimal-exact
    doubles; day offsets are exact ints; the interpolation expression
    is written in the identical op order both engines, so IEEE gives
    identical results.

    Scale: same shape as resample_gapfill — one partial-agg shuffle,
    sequence()-generated grid (rows = span days, never events), one
    co-partitioned join, and four per-user (partitioned, never global)
    windows that Catalyst evaluates in a single WindowExec pass."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("bucket")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("val_sum"),
    )
    span = agg.groupBy("user_id").agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
    grid = span.select(
        "user_id", F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("bucket")
    )
    j = grid.join(agg, ["user_id", "bucket"], "left")
    wp = Window.partitionBy("user_id").orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.partitionBy("user_id").orderBy("bucket").rowsBetween(0, Window.unboundedFollowing)
    obs_bucket = F.when(F.col("val_sum").isNotNull(), F.col("bucket"))
    pv = F.last("val_sum", ignorenulls=True).over(wp)
    pb = F.last(obs_bucket, ignorenulls=True).over(wp)
    nv = F.first("val_sum", ignorenulls=True).over(wn)
    nbk = F.first(obs_bucket, ignorenulls=True).over(wn)
    interp = pv + (nv - pv) * (
        F.datediff(F.col("bucket"), pb).cast("double") / F.datediff(nbk, pb).cast("double")
    )
    return j.select(
        "user_id",
        "bucket",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.when(F.col("val_sum").isNotNull(), F.col("val_sum")).otherwise(interp).alias("val_interp"),
        F.col("val_sum").isNull().alias("is_gap"),
    )


@query(
    "rollup_hierarchy",
    oracle=(
        # minute -> hour -> day: each level aggregates the PREVIOUS level's
        # rows; SQL states each level against raw events, which is equal
        # because COUNT/SUM are decomposable and the decimal sums exact.
        "WITH m AS (SELECT time_bucket(INTERVAL '1 minute', ts) AS b, event_type, "
        "    COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS sv FROM events GROUP BY 1, 2), "
        "h AS (SELECT time_bucket(INTERVAL '1 hour', b) AS b, event_type, "
        "    SUM(n) AS n, SUM(sv) AS sv FROM m GROUP BY 1, 2), "
        "d AS (SELECT time_bucket(INTERVAL '1 day', b) AS b, event_type, "
        "    SUM(n) AS n, SUM(sv) AS sv FROM h GROUP BY 1, 2) "
        "SELECT 'minute' AS level, b AS bucket_start, event_type, CAST(n AS BIGINT) AS n_events, "
        "  CAST(sv AS DOUBLE) AS sum_value FROM m "
        "UNION ALL SELECT 'hour', b, event_type, CAST(n AS BIGINT), CAST(sv AS DOUBLE) FROM h "
        "UNION ALL SELECT 'day', b, event_type, CAST(n AS BIGINT), CAST(sv AS DOUBLE) FROM d"
    ),
)
def rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (TimescaleDB continuous-aggregate /
    Druid rollup analog): the minute level aggregates raw events ONCE;
    the hour level aggregates the |minutes| minute rows, and the day
    level the |hours| hour rows — never touching raw data again. COUNT
    and DECIMAL SUM are decomposable, so re-aggregating partials is
    exact (averages derive as sv/n at read time from the same partials).
    The output unions all three levels with a level tag — the serving
    table of a metrics store.

    Scale: THE pattern for 100 TB metrics — raw data is read exactly
    once (the minute pass); each higher level costs |lower-level rows|,
    orders of magnitude smaller. Incrementally maintained in production
    by merge_upsert on late-arriving minute partials; each level is one
    partial-agg shuffle on (bucket, type)."""
    ev = load(spark, sf_dir, "events")
    # each level is MATERIALIZED before the next consumes it (and before
    # the 3-way union below) — without the checkpoints Spark re-derives
    # minute 3x and hour 2x across the union branches (measured 6
    # exchanges vs 3; ReuseExchange does not fire across the branches),
    # which at 100 TB means re-reading the raw table three times. This is
    # exactly what a metrics store does: each rollup level is a TABLE.
    minute = ev.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("b"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
    ).localCheckpoint()
    hour = minute.groupBy(
        F.date_trunc("hour", F.col("b")).alias("b"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("sv").alias("sv")).localCheckpoint()
    day = hour.groupBy(
        F.date_trunc("day", F.col("b")).alias("b"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))

    def lvl(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("level"),
            F.col("b").alias("bucket_start"),
            "event_type",
            F.col("n").alias("n_events"),
            F.col("sv").cast("double").alias("sum_value"),
        )

    return lvl(minute, "minute").unionByName(lvl(hour, "hour")).unionByName(lvl(day, "day"))


@query(
    "sliding_distinct",
    oracle=(
        "WITH w AS (SELECT DISTINCT user_id, unnest(generate_series("
        "    time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '45 minutes', "
        "    time_bucket(INTERVAL '15 minutes', ts), INTERVAL '15 minutes')) AS win_start "
        "  FROM events WHERE user_id IS NOT NULL) "
        "SELECT win_start, COUNT(*) AS n_users FROM w GROUP BY win_start"
    ),
)
def sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per sliding 1-hour window (15-min slide) — the
    active-users metric, computed EXACTLY with the two-level plan:
    level 1 dedups (window, user) pairs (partial agg collapses each
    task's repeats before the exchange), level 2 counts the deduped
    pairs per window. A direct countDistinct would ship every event
    occurrence to the window's reducer; this ships each (window, user)
    pair once per task.

    Scale: the partial-dedup level bounds the exchange at
    |windows x users-per-task|, independent of event volume; beyond
    ~10^9 users per window the exact form hands off to HLL sketches
    (agg_approx's documented territory) with mergeable state."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    pairs = ev.groupBy(
        F.window("ts", "1 hour", "15 minutes").alias("w"), "user_id"
    ).agg(F.lit(1).alias("_one"))
    return (
        pairs.groupBy(F.col("w.start").alias("win_start"))
        .agg(F.count("*").alias("n_users"))
    )


# (ts, event_id) packed into one exact integer so arg_min/arg_max pick a
# deterministic first/last arrival under ts ties. The multiplier must
# DOMINATE every possible event_id or the packing silently reorders
# (ADVICE r6: *1e6 broke at >=1M events) — 2^63 bounds any BIGINT id,
# and epoch_us * 2^63 ~ 1.6e34 still fits DECIMAL(38,0)/HUGEINT exactly.
_ORDER_KEY_MULT = 2**63


@query(
    "bars_ohlc",
    oracle=(
        # open/close = value at the min/max (ts, event_id) arrival in
        # the bucket — the composite order packed into one exact
        # integer key (epoch micros * 2^63 + event_id; HUGEINT in
        # DuckDB, DECIMAL(38,0) in Spark: no overflow, no float, and
        # the 2^63 multiplier dominates any BIGINT event_id)
        "SELECT time_bucket(INTERVAL '1 hour', ts) AS bar_start, "
        "  CAST(COUNT(*) AS BIGINT) AS n_events, "
        f"  arg_min(value, CAST(epoch_us(ts) AS HUGEINT) * {_ORDER_KEY_MULT} + event_id) AS open, "
        "  MAX(value) AS high, MIN(value) AS low, "
        f"  arg_max(value, CAST(epoch_us(ts) AS HUGEINT) * {_ORDER_KEY_MULT} + event_id) AS close, "
        "  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS volume "
        "FROM events GROUP BY bar_start"
    ),
)
def bars_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC time bars (the TimescaleDB candlestick / Druid rollup
    staple): per 1-hour bucket, the OPEN and CLOSE are the values at
    the first and last arrival — selected by min_by/max_by over an
    exact composite order key ((ts, event_id) packed into one
    DECIMAL(38,0)/HUGEINT integer with a 2^63 multiplier that dominates
    any BIGINT event_id, since a bare ts can tie across users and
    arg_min under ties is engine-nondeterministic) — plus high/low
    extremes and a DECIMAL-exact volume sum.

    Scale: a single partial-agg groupBy — min_by/max_by carry one
    (value, key) pair of running state per bucket per task, so the
    exchange moves |buckets| pre-combined rows exactly like stream_
    window; no window function, no sort anywhere. The same aggregate
    runs incrementally under update-mode streaming (min_by/max_by
    merge), making this the batch twin of a live candlestick feed."""
    ev = load(spark, sf_dir, "events")
    # the 2^63 literal exceeds LongType — route it through a string cast
    key = ts_micros("ts").cast("decimal(38,0)") * F.lit(str(_ORDER_KEY_MULT)).cast(
        "decimal(19,0)"
    ) + F.col("event_id")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("bar_start"))
        .agg(
            F.count("*").alias("n_events"),
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("volume"),
        )
    )
