"""Table loading helpers for the driver's parquet testdata (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _respread(spark: SparkSession, df: DataFrame, path: str, amplify: float = 1.0) -> DataFrame:
    """Restore compute parallelism for under-split inputs.

    A table stored as few/small files yields fewer scan splits than cores,
    so everything downstream of the scan runs on a handful of threads. When
    the split count is far below the cluster's parallelism AND the table is
    big enough that spreading pays for the exchange, insert a round-robin
    repartition. Column pruning and filter pushdown pass through the
    Exchange (verified: ReadSchema/PushedFilters unchanged), so the scan
    stays minimal and only surviving rows are shuffled. At 100 TB the
    condition never fires (thousands of splits >= cores); this is purely
    the small-input adaptive path, the same judgment AQE applies to
    too-few shuffle partitions.

    ``amplify`` is the caller's compute-amplification estimate (an
    explode-heavy op does ~amplify times the input bytes of work, e.g.
    shingling every char position): the pays-for-itself test scales input
    size by it, so a tiny-but-explosive table still spreads. The
    splits-vs-cores condition is unchanged — at 100 TB splits >= cores
    and nothing here ever fires."""
    try:
        import glob

        files = glob.glob(path) if "*" in path else [path]
        if os.path.isdir(path):
            files = glob.glob(os.path.join(path, "*.parquet"))
        total = sum(os.path.getsize(f) for f in files)
        max_split = int(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728").rstrip("b"))
        splits = sum(max(1, -(-os.path.getsize(f) // max_split)) for f in files)
        par = spark.sparkContext.defaultParallelism
        if splits < par // 2 and total * amplify > 4 * 1024 * 1024:
            return df.repartition(par)
    except (OSError, ValueError):
        pass
    return df


def load(
    spark: SparkSession, sf_dir: str, table: str, spread: bool = False, amplify: float = 1.0
) -> DataFrame:
    """Parquet scan. Catalyst pushes filters/projections into this scan —
    callers must NOT .cache() eagerly or pushdown is lost.

    events.ts is INT64 TIMESTAMP(NANOS) parquet, which Spark rejects by
    default: read it as raw nanos (legacy conf) and truncate to µs —
    exactly what DuckDB does on the same file, so oracles agree."""
    path = f"{sf_dir}/{table}.parquet"
    if table == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _respread(spark, df, path, amplify) if spread else df
    df = spark.read.parquet(path)
    return _respread(spark, df, path, amplify) if spread else df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}
