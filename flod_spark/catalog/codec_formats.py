"""Codec pipeline + non-parquet format round-trips.

codec_gzip re-creates the reference's README flagship pipeline
(README.md:10-14): deflate/inflate a text stream around a byLine ->
strip-trailing-whitespace -> rejoin transformation. The oracle computes
only the text transformation — if the codec round-trip corrupted
anything, the hashes would differ, so the comparison covers the codec
too.

sink_csv / sink_json mirror sink_file (K1) for the two ubiquitous text
formats: write to a temp dir, read back with the ORIGINAL schema (format
round-trips must never rely on inference), return the read-back rows.

100 TB notes: format round-trip cost is scan+write bandwidth, no shuffle.
CSV/JSON lose types without an explicit schema — the engine always
supplies one on read. Parquet (sink_file) remains the production format;
these exist for interchange.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flod_spark.io import load
from flod_spark.operators.codec import deflate, inflate
from flod_spark.registry import query


@query(
    "codec_gzip",
    oracle=(
        "SELECT doc_id, array_to_string("
        "  list_transform(string_split(text, chr(10)), x -> regexp_replace(x, '[ \\t]+$', '')), "
        "  chr(10)) AS cleaned "
        "FROM documents"
    ),
)
def codec_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flod README flagship (README.md:10-14): deflate -> inflate -> byLine
    -> stripRight each line -> join('\\n'). The deflate/inflate pair is a
    real zlib round-trip through Arrow-batched pandas UDFs; the line
    transformation runs JVM-side (split/transform/array_join). The oracle
    checks the final text, which transitively verifies the codec.

    Scale: Arrow-batched codec stages are narrow; the line transform is
    JVM map-only."""
    docs = load(spark, sf_dir, "documents")
    packed = docs.select("doc_id", deflate(F.col("text")).alias("z"))
    unpacked = packed.select("doc_id", inflate(F.col("z")).alias("t"))
    lines = F.split(F.col("t"), "\n", -1)
    stripped = F.transform(lines, lambda x: F.regexp_replace(x, "[ \\t]+$", ""))
    return unpacked.select("doc_id", F.array_join(stripped, "\n").alias("cleaned"))


def _roundtrip(spark: SparkSession, df: DataFrame, fmt: str, **options) -> DataFrame:
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/rt.{fmt}"
        df.write.mode("overwrite").options(**options).format(fmt).save(path)
        back = (
            spark.read.schema(df.schema).options(**options).format(fmt).load(path)
        ).localCheckpoint(eager=True)  # materialize before tmpdir vanishes
    return back


@query("sink_csv", oracle="SELECT * FROM supplier")
def sink_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 write() for CSV: round-trip with explicit schema on read-back.
    Scale: scan+write bandwidth only, no shuffle; schema-on-read keeps
    types stable (inference is banned — module docstring)."""
    return _roundtrip(spark, load(spark, sf_dir, "supplier"), "csv", header="true")


@query("sink_json", oracle="SELECT * FROM supplier")
def sink_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 write() for JSON lines: round-trip with explicit schema.
    Scale: scan+write bandwidth only, no shuffle; same schema-on-read
    rule as CSV."""
    return _roundtrip(spark, load(spark, sf_dir, "supplier"), "json")


@query("sink_partitioned", oracle="SELECT * FROM orders WHERE o_orderstatus = 'F'")
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned write + partition-PRUNED read: the scan of
    one status touches only that directory (PartitionFilters in the plan,
    asserted in tests/test_plans.py). At 100 TB partition pruning is the
    difference between scanning a shard and scanning the lake; partition
    columns must be low-cardinality (status: 3 values), never ids.

    Scale: partition pruning reads one directory of the lake
    (PartitionFilters pinned in tests/test_plans.py)."""
    o = load(spark, sf_dir, "orders")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/orders_part"
        o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
        back = (
            spark.read.parquet(path)
            .filter(F.col("o_orderstatus") == "F")
            # partition col comes back last + as read type; restore order/type
            .select(*o.columns)
            .localCheckpoint(eager=True)
        )
    return back


@query(
    "join_bucketed",
    oracle=(
        "SELECT o.o_orderkey, COUNT(*) AS n_lines, "
        "  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total "
        "FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "GROUP BY o.o_orderkey"
    ),
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: both sides written bucketBy(orderkey) ->
    the join needs NO exchange (both inputs pre-hashed on the key; the
    plan joins scan-to-scan). THE technique for repeated 100 TB
    fact-to-fact joins: pay the shuffle once at write time, never again.
    The groupBy on the same key also reuses the bucketing.

    Scale: the bucketed write pre-pays the shuffle once; every later
    join/agg on the key is exchange-free."""
    import uuid as _uuid

    o = load(spark, sf_dir, "orders").select("o_orderkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    tag = _uuid.uuid4().hex[:8]
    to, tl = f"b_orders_{tag}", f"b_lineitem_{tag}"
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(to)
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(tl)
    try:
        bo, bl = spark.table(to), spark.table(tl)
        out = (
            bo.join(bl, bl.l_orderkey == bo.o_orderkey)
            .groupBy("o_orderkey")
            .agg(
                F.count("*").alias("n_lines"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("total"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {to}")
        spark.sql(f"DROP TABLE IF EXISTS {tl}")
    return out


@query("sink_pysink", oracle="SELECT * FROM supplier")
def sink_pysink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 write() through a PLUGGABLE Python sink (Spark 4
    DataSourceWriter, sources/pygen.py::FlodDumpDataSource): each task
    streams its partition into a JSON-lines part file; two-phase
    commit() finalizes driver-side. Read back with the original schema
    — a byte-faithful round-trip proves the custom write path. This is
    the sink-side twin of scan_pysource (source-side custom API).

    Scale: each task streams its own partition; the two-phase commit is
    the only driver-side step."""
    from flod_spark.sources import register_flodgen

    register_flodgen(spark)
    sup = load(spark, sf_dir, "supplier")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/dump"
        sup.write.format("floddump").option("path", path).mode("append").save()
        back = (
            spark.read.schema(sup.schema).json(f"{path}/*.jsonl").localCheckpoint(eager=True)
        )
    return back


@query("sink_compact", oracle="SELECT * FROM events")
def sink_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance pass every long-run
    ingestion needs (streaming sinks and fine-grained partitions leave
    thousands of KB-sized files; scan cost then goes to task-launch
    overhead, not bytes). Simulate the problem (64-way fragmented
    write), compact with a coalesce to the byte-budget file count, and
    prove content identity on read-back. coalesce, not repartition: a
    compaction must not pay a shuffle — it narrows existing partitions
    into fewer write tasks. At 100 TB the same job runs per partition
    directory with target = bytes / 1 GB.

    Scale: coalesce narrows partitions without a shuffle; at 100 TB the
    job runs per partition directory."""
    ev = load(spark, sf_dir, "events")
    with tempfile.TemporaryDirectory() as d:
        frag = f"{d}/fragmented"
        ev.repartition(64).write.mode("overwrite").parquet(frag)
        small = spark.read.parquet(frag)
        compacted = f"{d}/compacted"
        small.coalesce(4).write.mode("overwrite").parquet(compacted)
        import glob as _glob

        n_files = len(_glob.glob(f"{compacted}/part-*"))
        assert n_files <= 4, n_files
        back = (
            spark.read.parquet(compacted)
            .select(*ev.columns)
            .localCheckpoint(eager=True)  # materialize before tmpdir vanishes
        )
    return back


@query(
    "scan_evolved",
    oracle=(
        # batch 1 wrote (o_orderkey, o_totalprice) for even keys; batch 2
        # added o_orderstatus for odd keys; the merged read NULL-pads the
        # pre-evolution rows
        "SELECT o_orderkey, o_totalprice, "
        "  CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS o_orderstatus "
        "FROM orders"
    ),
)
def scan_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: a table whose later files carry a new
    column (the normal life of a year-long ingestion directory) reads
    as ONE DataFrame with mergeSchema — old files NULL-pad the new
    column, no rewrite of historical data. At 100 TB this is why you
    never backfill a column into a petabyte of parquet; the read-side
    union is free. (Production pins the evolved schema explicitly once
    known; mergeSchema's footer-union pass is the discovery step.)

    Scale: read-side schema union only — no historical rewrite; the cost
    is one footer pass."""
    o = load(spark, sf_dir, "orders")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/evolving"
        o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_totalprice"
        ).write.mode("append").parquet(path)
        o.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_totalprice", "o_orderstatus"
        ).write.mode("append").parquet(path)
        back = (
            spark.read.option("mergeSchema", "true")
            .parquet(path)
            .select("o_orderkey", "o_totalprice", "o_orderstatus")
            .localCheckpoint(eager=True)
        )
    return back


@query("sink_orc", oracle="SELECT * FROM supplier")
def sink_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 write() for ORC — the other production columnar format (Hive
    lineage; same predicate-pushdown + stripe-statistics story as
    parquet). Round-trip with the original schema, like sink_csv/json.

    Scale: scan+write bandwidth only, no shuffle; ORC stripes carry
    min/max indexes so downstream filters skip stripes exactly as
    parquet row-groups do."""
    return _roundtrip(spark, load(spark, sf_dir, "supplier"), "orc")


# Z-order quantization width: 16 bits per dimension -> 32-bit z-values.
_Z_BITS = 16


def _zorder_oracle() -> str:
    """DuckDB twin of the Spark z-value computation, generated from the
    same constants so both engines interleave identical bits."""
    interleave = " + ".join(
        f"(((qp >> {i}) & 1) << {2 * i}) + (((qd >> {i}) & 1) << {2 * i + 1})"
        for i in range(_Z_BITS)
    )
    return (
        "WITH s AS (SELECT MIN(o_totalprice) mnp, MAX(o_totalprice) mxp, "
        "    MIN(datediff('day', DATE '1970-01-01', o_orderdate)) mnd, "
        "    MAX(datediff('day', DATE '1970-01-01', o_orderdate)) mxd FROM orders), "
        # degenerate-dimension guard (mx = mn): bucket 0 on both engines —
        # DuckDB would otherwise error on x/0 -> inf -> BIGINT while Spark
        # NULLs it (histogram_bins' rule)
        "q AS (SELECT "
        "  CASE WHEN mxp = mnp THEN 0 ELSE "
        "    LEAST(65535, GREATEST(0, CAST(FLOOR(((o_totalprice - mnp) * 65535.0) / (mxp - mnp)) AS BIGINT))) END AS qp, "
        "  CASE WHEN mxd = mnd THEN 0 ELSE "
        "    LEAST(65535, GREATEST(0, (CAST(datediff('day', DATE '1970-01-01', o_orderdate) - mnd AS BIGINT) * 65535) // CAST(mxd - mnd AS BIGINT))) END AS qd "
        "  FROM orders, s), "
        f"z AS (SELECT qp, qd, {interleave} AS zval FROM q) "
        "SELECT zval >> 24 AS z_bucket, COUNT(*) AS n, "
        "  MIN(qp) AS min_qp, MAX(qp) AS max_qp, "
        "  MIN(qd) AS min_qd, MAX(qd) AS max_qd "
        "FROM z GROUP BY zval >> 24"
    )


@query("sort_zorder", oracle=_zorder_oracle())
def sort_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton curve) layout — the multi-dimensional clustering
    technique behind Delta's OPTIMIZE ZORDER: quantize each dimension to
    16 bits, interleave the bits into one 32-bit z-value, and lay data
    out in z-value ranges. Each z-range then spans a NARROW rectangle in
    BOTH dimensions, so file-level min/max statistics prune scans for
    predicates on either column — a total sort on one column can only
    ever prune that column. The gated query proves the mechanism: per
    z-bucket (top 8 bits), the min/max of both quantized dims show each
    bucket covering a small sub-rectangle. Bit-exact cross-engine: the
    price quantization is one IEEE double expression in identical op
    order, the date side is pure integer arithmetic, the interleave is
    integer bit ops generated from the same constants as the oracle.

    Scale: min/max come from one broadcast 1-row agg (at 100 TB use
    approx quantile breakpoints instead of min/max so outliers don't
    crush the grid); the z-value itself is a map-only expression, and
    the production write is repartitionByRange(zval) -> parquet, giving
    every file tight min/max on BOTH dims for skipping."""
    o = load(spark, sf_dir, "orders").select("o_totalprice", "o_orderdate")
    stats = o.agg(
        F.min("o_totalprice").alias("mnp"),
        F.max("o_totalprice").alias("mxp"),
        F.min(F.datediff("o_orderdate", F.lit("1970-01-01"))).alias("mnd"),
        F.max(F.datediff("o_orderdate", F.lit("1970-01-01"))).alias("mxd"),
    )
    qp_expr = F.when(F.col("mxp") == F.col("mnp"), F.lit(0).cast("long")).otherwise(
        F.least(
            F.lit(65535),
            F.greatest(
                F.lit(0),
                F.floor(
                    ((F.col("o_totalprice") - F.col("mnp")) * F.lit(65535.0))
                    / (F.col("mxp") - F.col("mnp"))
                ),
            ),
        )
    )
    qd_expr = F.when(F.col("mxd") == F.col("mnd"), F.lit(0).cast("long")).otherwise(
        F.least(
            F.lit(65535),
            F.floor(
                (
                    (F.datediff("o_orderdate", F.lit("1970-01-01")) - F.col("mnd")).cast(
                        "long"
                    )
                    * F.lit(65535)
                )
                / (F.col("mxd") - F.col("mnd"))
            ).cast("long"),
        )
    )
    q = o.crossJoin(F.broadcast(stats)).select(qp_expr.alias("qp"), qd_expr.alias("qd"))
    zval = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        zval = zval + F.shiftleft(F.shiftright(F.col("qp"), i).bitwiseAND(F.lit(1)), 2 * i)
        zval = zval + F.shiftleft(
            F.shiftright(F.col("qd"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return (
        q.withColumn("zval", zval)
        .groupBy(F.shiftright(F.col("zval"), 24).alias("z_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("qp").alias("min_qp"),
            F.max("qp").alias("max_qp"),
            F.min("qd").alias("min_qd"),
            F.max("qd").alias("max_qd"),
        )
    )


@query("sink_xml", oracle="SELECT * FROM supplier")
def sink_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 write() for XML — Spark 4's built-in XML source (the
    spark-xml package absorbed upstream), completing the text-format
    trio next to sink_csv/sink_json: one element per row under a
    configurable rowTag, schema-on-read (inference banned, module
    docstring). The enterprise-feed format every ingestion edge still
    meets; the round-trip proves both directions.

    Scale: scan+write bandwidth only, no shuffle; XML parse/emit is
    JVM-side (StAX) and splits by rowTag, so a 100 TB feed reads with
    normal input-split parallelism."""
    return _roundtrip(
        spark, load(spark, sf_dir, "supplier"), "xml",
        rowTag="supplier", rootTag="suppliers",
    )
