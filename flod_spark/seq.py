"""Ordered-stream convention (SURVEY.md §4.2-1).

flod pipelines are strictly order-preserving (the reference's chain tests
assert exact output prefixes — pipeline.d:1325-1347). Spark DataFrames are
unordered, so order-sensitive operators (take, by_line across chunks,
by_chunk regrouping) key on an explicit ``seq: long`` column.

``with_seq`` computes a gap-free global rank 0..n-1 over a total order
WITHOUT a single-partition window:

1. ``repartitionByRange`` on the order columns — range partitioner assigns
   ascending key ranges to ascending partition ids, so partition id order
   == key order.
2. per-partition local rank (window partitioned by ``spark_partition_id()``
   — parallel, no global shuffle to one reducer).
3. per-partition row counts (tiny: one row per partition) are collected,
   turned into cumulative offsets, and broadcast-joined back.

At 100 TB this is two narrow passes + one range shuffle; the collected
offset table is O(#partitions), never O(rows). This is the same trick as
RDD.zipWithIndex, expressed in DataFrame ops so codegen/AQE still apply.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SEQ = "seq"


def with_seq(df: DataFrame, *order_cols: str | Column, num_partitions: int | None = None) -> DataFrame:
    """Add a deterministic gap-free ``seq`` column ranking by ``order_cols``.

    ``order_cols`` must be a total order (add a unique key as tiebreak).
    """
    if not order_cols:
        raise ValueError("with_seq requires at least one order column")
    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ranged = df.repartitionByRange(int(parts), *order_cols)
    local = (
        ranged.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lrank", F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols)) - 1)
        # RangePartitioner samples with an RDD-id-derived seed, so two separate
        # actions (the offset collect below + the caller's action) could see
        # DIFFERENT boundaries. persist() pins one materialization; eviction
        # recomputes the same RDD lineage (same id -> same seed), still stable.
        .persist()
    )
    # tiny per-partition histogram -> cumulative offsets on the driver
    counts = local.groupBy("_pid").count().collect()
    offsets: dict[int, int] = {}
    running = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = running
        running += row["count"]
    if not offsets:  # empty input: no partitions reported, seq == local rank
        return local.withColumn(SEQ, F.col("_lrank")).drop("_pid", "_lrank")
    offmap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    return (
        local.withColumn(SEQ, F.coalesce(offmap[F.col("_pid")], F.lit(0)) + F.col("_lrank"))
        .drop("_pid", "_lrank")
    )


def take_by_seq(df: DataFrame, n: int) -> DataFrame:
    """flod ``take(n)`` (package.d:114-199) on an ordered stream: first n by seq."""
    return df.filter(F.col(SEQ) < F.lit(n))
