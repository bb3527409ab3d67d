"""Streaming deduplication (SURVEY §2.5 streaming row).

Two state regimes, picked by whether the duplicate horizon is bounded:

- drop_duplicates_unbounded: exact first-arrival dedup; state = one entry
  per distinct key FOREVER. Only sane for key spaces that fit in state
  (ids, fingerprints) — which is exactly the dedup-pipeline case (the
  16-byte md5 fingerprint of catalog/dedup.py::dedup_exact).
- drop_duplicates_within: dropDuplicatesWithinWatermark — duplicates are
  only guaranteed dropped if they arrive within the watermark delay of
  the first occurrence; state is evicted past the horizon. The 100 TB
  default: bounded state, bounded guarantee.

Batch shadow: catalog/streaming_batch.py::stream_dedup (oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def drop_duplicates_unbounded(stream: DataFrame, *keys: str) -> DataFrame:
    """First arrival per key, unbounded state (exact, state grows with
    |distinct keys| — size it like any big-table fingerprint set)."""
    return stream.dropDuplicates(list(keys))


def drop_duplicates_within(
    stream: DataFrame, time_col: str, delay: str, *keys: str
) -> DataFrame:
    """First arrival per key among rows within the watermark horizon;
    state evicted past `delay` (the bounded-state production regime)."""
    return stream.withWatermark(time_col, delay).dropDuplicatesWithinWatermark(list(keys))
