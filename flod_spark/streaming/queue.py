"""Streaming queue source — flod entry point C (`pass!E` as output range,
range.d:211-237, SURVEY §3.3): the CALLER pushes chunks in; each put()
becomes a micro-batch.

Implemented as a spooled file source: put() writes one parquet file to a
spool dir, the returned readStream consumes one file per trigger in
write order. On a real cluster the spool dir is object storage (or the
queue is simply Kafka) — downstream code is identical either way, which
is the point of Structured Streaming's unified model.

Scale notes: the driver is the producer, so throughput is bounded by one
process — this source is for control-plane streams (commands, config,
small event feeds), not data-plane volume. State downstream is governed
by the usual watermark rules.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession


class StreamingQueue:
    """put() chunks of values; stream() is an unbounded DataFrame of them."""

    def __init__(self, spark: SparkSession, type_hint: str = "long", spool_dir: str | None = None):
        self.spark = spark
        self.type_hint = type_hint
        self.dir = spool_dir or tempfile.mkdtemp(prefix="flod_squeue_")
        self._n = 0

    def put(self, chunk: Iterable) -> None:
        """One micro-batch: write the chunk as the next spool file.

        tiny_df, not createDataFrame(list): the parallelize form makes
        the coalesce(1) spool write walk every slice through a serial
        Python-worker round trip (~5 s PER put() on local[32]); the
        Arrow LocalTableScan write is ~0.2 s — control-plane puts
        should cost control-plane time."""
        from flod_spark.io import tiny_df

        rows = [(v,) for v in chunk]
        df = tiny_df(self.spark, rows, f"value {self.type_hint}")
        # one file, stable name order == arrival order
        df.coalesce(1).write.mode("append").parquet(os.path.join(self.dir, f"b{self._n:09d}"))
        self._n += 1

    def stream(self) -> DataFrame:
        """Unbounded stream of the spooled chunks, one file per trigger."""
        return (
            self.spark.readStream.schema(f"value {self.type_hint}")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(self.dir)
        )
