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

# The driver's correctness gate checks only the FIRST 50 entries of
# queries(). _GATE_ORDER makes the window explicit, and ROTATES each
# round so every registered query earns at least one driver CORRECTNESS
# row across rounds (round-2 verdict item 4). Rotation planning reads
# COVERAGE.md (tools/coverage_table.py — per-qkey driver rounds +
# staleness from CORRECTNESS_r*.json); tests/test_chains.py pins this
# window against the same data so they cannot drift. Round-6 window =
#   (a) every never-driver-gated qkey: the 5 late-round-5 registrations
#       (cdc_apply, scd2_build, stream_heavy_hitters_live, udf_arrow,
#       window_rolling_median — all parity-green since r5),
#   (b) the new round-6 registrations (first driver row),
#   (c) changed-implementation re-proofs (the simhash_pairs precedent):
#       triangle_count (degree-oriented wedge enumeration), embed_pq /
#       sim_pq_adc / sim_ivfpq (PQ geometry widened to M=8 x K=64 for
#       the recall gate), quantile_exact_2pass (recursive refinement),
#   (d) round-robin re-proofs of the STALEST driver rows (last proven
#       round 2, registration order; COVERAGE.md's tail) filling to 50.
#       New round-6 registrations displace (d) slots, never (a)-(c) —
#       the (d) list below is the FULL 44-key r2-stale backlog, so the
#       window self-adjusts: whatever (b) doesn't claim goes to the
#       oldest re-proofs, and the overflow is round 7's (d).
# Keys not listed here sort after listed ones, in registration order.
_GATE_ORDER = (
    # (a) never driver-gated
    "cdc_apply", "scd2_build", "stream_heavy_hitters_live", "udf_arrow",
    "window_rolling_median",
    # (b) new round-6 registrations
    "stream_dedup_substring_live", "join_bloom", "sketch_countmin",
    "bars_ohlc", "stream_cdc_apply_live", "bm25_score",
    "window_rolling_regression", "stream_bars_ohlc_live",
    "stream_asof_enrich_live", "udf_grouped_agg", "k_anonymity_audit",
    "stream_sketch_countmin_live", "window_reset_cumsum",
    "media_audio_rms", "join_asof_nearest", "embed_truncate_energy",
    "graph_jaccard", "cdc_time_travel", "sample_temperature",
    "stream_split_router_live", "vocab_coverage", "agg_mad",
    # (c) changed-implementation re-proofs
    "triangle_count", "embed_pq", "sim_pq_adc", "sim_ivfpq",
    "quantile_exact_2pass",
    # (d) stalest-row re-proofs (last driver-proven round 2), filling
    # to the 50-cap in registration order — overflow rolls to round 7
    "scan_queue", "take_limit", "by_line", "by_chunk", "by_chunk_arrays",
    "by_element", "adapter_noop", "sink_collect", "sink_discard",
    "sink_file", "sink_copy", "scan_binary", "agg_group", "agg_distinct",
    "join_equi", "join_anti", "join_asof", "join_range", "window_rank",
    "sort_topk", "set_union", "set_except", "scalar_fns", "tpch_q6",
    "tpch_q3", "stream_window", "stream_sliding", "stream_dedup",
    "text_stats", "lang_id", "doc_quality", "json_extract", "dedup_exact",
    "dedup_minhash", "dedup_simhash", "dedup_ngram", "sim_topk", "sim_lsh",
    "embed_dedup", "media_meta", "udf_stage", "codec_gzip", "sample_hash",
    "sample_stratified",
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
