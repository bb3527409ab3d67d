"""Deterministic micro-batch replay of a batch table (test harness).

Splits a DataFrame into N parquet files ordered by a time column and
replays them with maxFilesPerTrigger=1 — a reproducible stand-in for a
Kafka-like source. At production scale the same code reads a real stream
source; every transformation downstream is identical (that is the point
of Structured Streaming's unified model).

Scale: batch assignment is by exact-quantile RANGE boundaries on the
time column — one quantile pass + one pushdown-filtered scan per batch.
No global sort, no window function, nothing driver-side that grows with
row count (the only collected values are the n_batches-1 boundaries).
Rows tie-ing with a boundary go to the later batch, so cross-batch
event-time ordering (every row in batch b <= every row in batch b+1)
still holds; within-batch ordering is enforced by an explicit sort on
(order_col, *tiebreak) before each single-file write — together these
are the full determinism contract catalog/streaming_live.py relies on.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def replay_stream(
    spark: SparkSession,
    df: DataFrame,
    order_col: str,
    out_dir: str,
    n_batches: int = 10,
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """Write df as n_batches time-range parquet files under out_dir and
    return a streaming DataFrame reading them one file per trigger.

    Within-batch arrival order is ENFORCED, not assumed: each batch is
    sorted on (order_col, *tiebreak) before its single-file write, so
    downstream first-arrival semantics (dropDuplicates keeping the
    min-order row) hold by construction for any physical source layout —
    reordered parquet, multi-row-group files split across scan
    partitions, regenerated data. Pass a unique ``tiebreak`` column to
    make arrival order total (ties on order_col otherwise keep source
    scan order within the sort, which is stable but layout-dependent)."""
    # Deterministic quantile boundaries. relativeError bounds the summary
    # memory (0 would buffer every value); boundary inexactness only
    # shifts batch BALANCE — every row still lands in exactly one batch
    # and cross-batch ts ordering holds because boundaries are monotone.
    # Micros fit a double exactly (< 2^53) so the round-trip is lossless.
    mc = "_replay_us"
    bc = "_replay_b"
    from pyspark import StorageLevel

    from flod_spark.io import ts_micros

    # one materialization feeds the quantile pass and the batch write —
    # without it the source table is rescanned per pass (measured >2x
    # the whole build cost at sf0.1)
    with_us = df.withColumn(mc, ts_micros(order_col)).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        fracs = [b / n_batches for b in range(1, n_batches)]
        bounds = (
            [int(v) for v in with_us.stat.approxQuantile(mc, fracs, 0.001)] if fracs else []
        )
        # approxQuantile returns [] on an empty (or all-NULL order key)
        # input: everything lands in one unbounded batch below.
        # Batch membership as ONE column expression (identical to the
        # former per-batch range filters, counts-job-verified before the
        # rewrite): bucket = #boundaries <= mc; NULL order keys sort
        # first, i.e. bucket 0. Duplicate boundaries leave their earlier
        # bucket indexes provably empty — they simply write no file.
        bucket = F.lit(0)
        for bnd in bounds:
            bucket = bucket + (F.col(mc) >= bnd).cast("int")
        # ONE write job for every batch file (replaces n_batches
        # sequential coalesce(1) jobs — guide §1.2 'remove passes'):
        # repartition ON the bucket id puts each bucket's rows in exactly
        # one task; the partitioned write then emits exactly one file per
        # non-empty bucket, sorted within the file by (mc, *tiebreak) —
        # the same total within-batch order the sequential writes
        # enforced. Hash collisions across buckets only co-locate two
        # buckets in one task; partitionBy still splits them into their
        # own directories.
        staged = out_dir + ".staging"
        shutil.rmtree(staged, ignore_errors=True)
        (
            with_us.withColumn(bc, F.coalesce(bucket, F.lit(0)))
            .repartition(n_batches, F.col(bc))
            .sortWithinPartitions(bc, mc, *tiebreak)
            .drop(mc)
            .write.mode("overwrite")
            .partitionBy(bc)
            .parquet(staged)
        )
        # publish <staged>/<bc>=<b>/part-* as out_dir/part-b<b>.parquet
        # with EXPLICITLY pinned ascending mod-times (the file source
        # replays in mod-time order; pinning removes the coarse-mtime
        # hazard the sequential writes tolerated by luck — the
        # replay_buckets discipline)
        os.makedirs(out_dir, exist_ok=True)
        for d in sorted(
            glob.glob(os.path.join(staged, f"{bc}=*")),
            key=lambda p: int(p.rsplit("=", 1)[1]),
        ):
            b = int(d.rsplit("=", 1)[1])
            files = [
                f
                for f in glob.glob(os.path.join(d, "part-*"))
                if not f.endswith(".crc")
            ]
            assert len(files) == 1, f"bucket {b}: {files}"
            dst = os.path.join(out_dir, f"part-b{b:05d}.parquet")
            os.replace(files[0], dst)
            os.utime(dst, (10.0 * (b + 1), 10.0 * (b + 1)))
        shutil.rmtree(staged, ignore_errors=True)
    finally:
        with_us.unpersist()
    # an all-empty input writes no file; the stream source still needs the
    # directory to exist (first run of an empty day must idle, not throw)
    os.makedirs(out_dir, exist_ok=True)
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(out_dir)
    )


def replay_buckets(
    spark: SparkSession, df: DataFrame, bucket_col: str, out_dir: str
) -> DataFrame:
    """Write one parquet file per DISTINCT value of ``bucket_col``
    (ascending) and return a file stream replaying them one per
    trigger — the EXPLICIT, SQL-expressible twin of replay_stream for
    operators whose FINAL STATE depends on micro-batch membership
    (lossy counting's bucket-boundary eviction): batch assignment is a
    pure column function both engines compute identically, not an
    approx-quantile split a DuckDB oracle cannot reproduce. Files are
    written sequentially so mod-times ascend in bucket order, the
    order the file source replays them in (replay_stream's contract).

    Scale: the only driver-side collect is the distinct bucket VALUES
    (micro-batch count, a test-harness constant — never rows); each
    write is one pushdown-filtered scan of the persisted input."""
    from pyspark import StorageLevel

    dfp = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        buckets = sorted(
            r[0] for r in dfp.select(bucket_col).distinct().collect()
        )
        # ONE write job for every bucket file (the replay_stream
        # single-pass discipline): repartition on the bucket value puts
        # each bucket in one task, the partitioned write emits one file
        # per bucket dir, and the publish loop pins ascending mod-times
        # in bucket order — bucket MEMBERSHIP is this replay's whole
        # contract, and the explicit utime removes the coarse-mtime
        # hazard outright.
        staged = out_dir + ".staging"
        shutil.rmtree(staged, ignore_errors=True)
        (
            dfp.repartition(max(len(buckets), 1), F.col(bucket_col))
            .write.mode("overwrite")
            .partitionBy(bucket_col)
            .parquet(staged)
        )
        os.makedirs(out_dir, exist_ok=True)
        by_dir = {
            d.rsplit("=", 1)[1]: d
            for d in glob.glob(os.path.join(staged, f"{bucket_col}=*"))
        }
        for i, b in enumerate(buckets):
            d = by_dir.get(str(b))
            # every collected bucket MUST have a staged dir: a miss here
            # means the str() key didn't round-trip Hive's partition-dir
            # encoding (escaped strings, floats, NULL) and a silent
            # `continue` would drop an entire micro-batch (r16 ADVICE).
            # Int buckets (every current caller) always round-trip.
            assert d is not None, (
                f"bucket {b!r} collected but no staged dir matches "
                f"{bucket_col}={b} — partition-value encoding mismatch "
                f"(staged: {sorted(by_dir)})"
            )
            files = glob.glob(os.path.join(d, "part-*"))
            assert len(files) == 1, f"bucket {b}: {files}"
            dst = os.path.join(out_dir, f"part-b{i:05d}.parquet")
            os.replace(files[0], dst)
            os.utime(dst, (10.0 * (i + 1), 10.0 * (i + 1)))
        shutil.rmtree(staged, ignore_errors=True)
    finally:
        dfp.unpersist()
    os.makedirs(out_dir, exist_ok=True)
    return (
        spark.readStream.schema(df.drop(bucket_col).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(out_dir)
    )


def append_sentinel_batches(spark, out_dir: str, rows, schema) -> None:
    """Append each row as its OWN single-file micro-batch replayed AFTER
    every existing file (strictly increasing pinned mod times — the file
    source replays in mod-time order).

    Far-future sentinel rows are how a finite replay makes watermark-
    driven emission deterministic: eviction/null-emission happens only in
    a batch AFTER the watermark advances, so end-of-stream results would
    otherwise depend on Spark's best-effort no-data micro-batches. One
    sentinel advances a watermark node; one more batch applies it — use
    as many as the query has watermark nodes, plus one."""
    import glob as _glob
    import os as _os

    base = max(
        (_os.path.getmtime(f) for f in _glob.glob(f"{out_dir}/part-*")),
        default=0.0,
    )
    from flod_spark.io import tiny_df

    for i, row in enumerate(rows):
        before = set(_glob.glob(f"{out_dir}/part-*"))
        # tiny_df, not createDataFrame(list): the parallelize form plans
        # a PythonRDD whose coalesce(1) write walks every slice through
        # a serial Python-worker round trip (~5 s PER SENTINEL on
        # local[32], measured); the Arrow LocalTableScan write is ~0.2 s
        tiny_df(spark, [row], schema).coalesce(1).write.mode(
            "append"
        ).parquet(out_dir)
        for f in set(_glob.glob(f"{out_dir}/part-*")) - before:
            _os.utime(f, (base + 10.0 * (i + 1), base + 10.0 * (i + 1)))
