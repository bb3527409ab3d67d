"""Deterministic micro-batch replay of a batch table (test harness).

Splits a DataFrame into N parquet files ordered by a time column and
replays them with maxFilesPerTrigger=1 — a reproducible stand-in for a
Kafka-like source. At production scale the same code reads a real stream
source; every transformation downstream is identical (that is the point
of Structured Streaming's unified model).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def replay_stream(
    spark: SparkSession,
    df: DataFrame,
    order_col: str,
    out_dir: str,
    n_batches: int = 10,
) -> DataFrame:
    """Write df as n_batches time-ordered parquet files under out_dir and
    return a streaming DataFrame reading them one file per trigger."""
    n = df.count()
    per = max(1, math.ceil(n / n_batches))
    ordered = df.withColumn(
        "_b", F.floor((F.row_number().over(Window.orderBy(order_col)) - 1) / per)
    )
    for b in range(n_batches):
        part = ordered.filter(F.col("_b") == b).drop("_b")
        if part.isEmpty():
            continue
        part.coalesce(1).write.mode("append").parquet(out_dir)
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(out_dir)
    )
