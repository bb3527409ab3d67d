"""Query/oracle registry — the driver-contract surface.

Every operator from SURVEY.md §2 registers here with a canonical qkey, a
(spark, sf_dir) -> DataFrame callable, and (where SQL-expressible) a DuckDB
oracle string. ``__spark_entry__.py`` re-exports these.

Determinism rules (so the driver's order-insensitive value-hash matches):
- Any SUM/AVG over doubles goes through CAST(x AS DECIMAL(…)) first (exact,
  associative), then the result is CAST back to DOUBLE — bit-identical in
  Spark and DuckDB regardless of partial-aggregation order.
- If the decimal's UNSCALED value can exceed 2^53 (second moments: sums of
  squares/products), the DuckDB cast must round-trip through VARCHAR —
  DuckDB's direct decimal->double double-rounds (int128 -> double, then
  / 10^scale) and can land one ulp off Spark's correctly-rounded
  BigDecimal.doubleValue (observed: agg_corr at sf0.001). Plain money sums
  at our scale factors stay below 2^53 and are safe either way.
- Per-row double arithmetic (IEEE, fixed op order) is bit-identical already.
- Array reductions use sequential fold on DOUBLE in both engines
  (Spark aggregate() / DuckDB list_reduce()) so dot products match bitwise.
- Every rank/limit has a total-order tiebreak on a unique key.
- Hash functions in dedup/fingerprint ops are md5 (identical hex in both).
"""

from __future__ import annotations

import functools
import importlib
import os
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def ensure_shipped(spark: SparkSession) -> None:
    """Make flod_spark importable on every executor of THIS session.

    The grading driver (and any real cluster) builds its own session with
    no knowledge of our PYTHONPATH; module-level Python stage functions
    are cloudpickled BY REFERENCE, so workers must be able to import the
    package. addPyFile ships a zip once per session and prepends it to
    every worker's sys.path — the standard way to ship a driver-local
    package without a deploy step."""
    if getattr(spark, "_flod_spark_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(), "flod_spark_pkg.zip")
    # rebuild when any source is newer than the cached zip — a stale zip
    # makes workers fail to unpickle by-reference functions added since
    src_mtime = max(
        os.path.getmtime(os.path.join(root, f))
        for root, _dirs, files in os.walk(pkg_dir)
        for f in files
        if f.endswith(".py")
    )
    if not os.path.exists(zpath) or os.path.getmtime(zpath) < src_mtime:
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join("flod_spark", os.path.relpath(full, pkg_dir))
                        z.write(full, rel)
        os.replace(tmp, zpath)
    spark.sparkContext.addPyFile(zpath)
    spark._flod_spark_shipped = True

# The latest CORRECTNESS round the current gate window was planned from.
# The rotation tests clamp driver_rounds() to this, so the driver dropping
# CORRECTNESS_r{N+1}.json into the tree after the builder's final commit
# cannot flip a committed-green pytest (round-6 verdict, top finding).
_PLANNED_FROM_ROUND = 11

# The driver's correctness gate checks only the FIRST 50 entries of
# queries(). _GATE_ORDER makes the window explicit, and ROTATES each
# round so every registered query earns at least one driver CORRECTNESS
# row across rounds (round-2 verdict item 4). Rotation planning reads
# COVERAGE.md (tools/coverage_table.py — per-qkey driver rounds +
# staleness from CORRECTNESS_r*.json); tests/test_chains.py pins this
# window against the same data, clamped to _PLANNED_FROM_ROUND, so the
# two cannot drift and later driver artifacts cannot break it.
# Round-12 window = 17 + 1 + 5 + 27 = 50:
#   (b) the 17 new round-12 registrations (first driver row) — no
#       recorded row at _PLANNED_FROM_ROUND, so the membership test
#       auto-derives them as must-gate: the r11-verdict-item-1 queue
#       (sink_tar_shards, stream_archive_live, dedup_incremental,
#       sim_mrl_rerank, sim_pq_adc_persisted, sim_ivfpq_persisted)
#       plus the composed streaming-ingestion qkey
#       (stream_archive_dedup_live, r11 verdict item 5), plus the
#       late-round pull-forward of the r13 queue (BENCH_NOTES r12):
#       the streaming tar-shard SINK (stream_sink_tar_live), the full
#       curation loop (stream_curate_loop_live), the crawl-native
#       WARC writer (sink_warc_shards), the incremental fuzzy
#       claim table (dedup_minhash_incremental), binary-quantized
#       retrieval (sim_binary_rerank), WebDataset paired-sample
#       assembly (scan_wds_samples) and its zero-shuffle streaming
#       twin (stream_wds_samples_live), incremental IVF-PQ index
#       maintenance (sim_ivfpq_advanced), the per-shard Bloom
#       skipping index (scan_bloom_pruned), and multi-turn
#       conversation-doc construction (conversation_pack),
#   (c) changed-implementation re-proof: scan_archive (the shared
#       archive_member_rows split now dispatches ZIP/tar on leading
#       magic bytes instead of the filename — r11 ADVICE) — 1 key.
#       (dedup_against_claims' distinct-claims fix and the claim-table
#       slice layout ship inside the NEW dedup_incremental key.)
#   (d) the stalest tiers in registration order: the 5-key r5 spill
#       (sink_compact .. length_buckets — 7 rounds stale) then the
#       first 27 of the 45-key r6 tail (scan_queue .. scd2_build);
#       the remaining 18 r6 keys (window_rolling_median, bm25_score,
#       vocab_coverage, embed_pq,
#       sim_pq_adc, sim_ivfpq, embed_truncate_energy,
#       media_audio_rms, udf_arrow, triangle_count + the agg_mad tier
#       tail) spill to the round-13 fill pool, covered by this round's
#       complement sweep.
# Keys not listed here sort after listed ones, in registration order.
_GATE_ORDER = (
    # (b) new round-12 registrations — 17 keys
    "sink_tar_shards", "stream_archive_live", "stream_archive_dedup_live",
    "dedup_incremental", "sim_mrl_rerank", "sim_pq_adc_persisted",
    "sim_ivfpq_persisted", "stream_sink_tar_live",
    "stream_curate_loop_live", "sink_warc_shards",
    "dedup_minhash_incremental", "sim_binary_rerank",
    "scan_wds_samples", "sim_ivfpq_advanced", "scan_bloom_pruned",
    "stream_wds_samples_live", "conversation_pack",
    # (c) changed-implementation re-proof — 1 key
    "scan_archive",
    # (d) r5-tier spill — 5 keys
    "sink_compact", "scan_evolved", "sink_orc", "sort_zorder",
    "length_buckets",
    # (d) r6-tier head in registration order — 27 keys
    "scan_queue", "take_limit", "by_line", "by_chunk",
    "by_chunk_arrays", "by_element", "adapter_noop", "sink_collect",
    "sink_discard", "sink_file", "sink_copy", "scan_binary",
    "agg_group", "agg_distinct", "join_equi", "join_anti",
    "join_asof", "join_asof_nearest", "join_range",
    "k_anonymity_audit", "join_bloom", "window_reset_cumsum",
    "window_rolling_regression", "quantile_exact_2pass", "cdc_apply",
    "cdc_time_travel", "scd2_build",
)


def gate_order(d: dict) -> dict:
    """Reorder a qkey->X dict so _GATE_ORDER keys come first (in that
    order), then everything else in registration order (sorted() is
    stable, so ranking alone preserves the unranked tail's order)."""
    rank = {k: i for i, k in enumerate(_GATE_ORDER)}
    n = len(rank)
    keys = sorted(d, key=lambda k: rank.get(k, n))
    return {k: d[k] for k in keys}


_CATALOG_MODULES = (
    "flod_spark.catalog.surface",
    "flod_spark.catalog.relational",
    "flod_spark.catalog.streaming_batch",
    "flod_spark.catalog.text",
    "flod_spark.catalog.dedup",
    "flod_spark.catalog.similarity",
    "flod_spark.catalog.media",
    "flod_spark.catalog.udf",
    "flod_spark.catalog.streaming_live",
    "flod_spark.catalog.codec_formats",
    "flod_spark.catalog.sampling",
    "flod_spark.catalog.packing",
    "flod_spark.catalog.prep",
    "flod_spark.catalog.analytics",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a qkey. ``oracle`` is ANSI SQL DuckDB runs on the same tables;
    omit only for genuinely non-SQL-expressible ops (driver then records a
    weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_shipped(spark)
            # Deterministic temporal semantics in ANY session (the driver
            # builds its own): event time is naive end-to-end; the one
            # NTZ->LTZ->NTZ round-trip (streaming watermarks) is only a
            # bijection when the session timezone is fixed — pin UTC.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_catalog() -> None:
    """Import all catalog modules (idempotent) so registries are populated."""
    for mod in _CATALOG_MODULES:
        importlib.import_module(mod)
