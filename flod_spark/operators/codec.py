"""Compression codec stages (flod's flagship example, README.md:10-14:
``read(f).inflate(gzip).byLine.map(stripRight).join("\\n").deflate(gzip)
.write(g)`` — inflate/deflate live in external flod packages,
README.md:51-61; we provide them as first-class column stages).

Arrow-batched scalar pandas UDFs over zlib: the codec runs vectorized in
the Python worker, one Arrow batch at a time. This IS the UDF slow path
(SURVEY §2.5) — justified here because the JVM has no built-in zlib
column function and the work is pure CPU per value.

100 TB notes: compression is a narrow per-row transform — no shuffle, no
state; throughput scales linearly with cores. Compress EARLY (before any
exchange) so shuffles move compressed bytes; decompress LATE. Codec
level 6 default mirrors gzip's.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType


@F.pandas_udf(BinaryType())
def deflate(text: pd.Series) -> pd.Series:
    """zlib-compress a string column into binary (flod ``deflate``)."""
    return text.map(lambda s: zlib.compress(s.encode("utf-8"), 6) if s is not None else None)


@F.pandas_udf(StringType())
def inflate(blob: pd.Series) -> pd.Series:
    """zlib-decompress a binary column back to text (flod ``inflate``)."""
    return blob.map(lambda b: zlib.decompress(bytes(b)).decode("utf-8") if b is not None else None)
