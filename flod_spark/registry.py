"""Query/oracle registry — the driver-contract surface.

Every operator from SURVEY.md §2 registers here with a canonical qkey, a
(spark, sf_dir) -> DataFrame callable, and (where SQL-expressible) a DuckDB
oracle string. ``__spark_entry__.py`` re-exports these.

Determinism rules (so the driver's order-insensitive value-hash matches):
- Any SUM/AVG over doubles goes through CAST(x AS DECIMAL(…)) first (exact,
  associative), then the result is CAST back to DOUBLE — bit-identical in
  Spark and DuckDB regardless of partial-aggregation order.
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
# row across rounds (round-2 verdict item 4). Round-3 window =
#   (a) the 2 round-2 red cells (now fixed — must re-prove green),
#   (b) all 33 queries that have never had a driver row,
#   (c) the 13 round-1 cells rotated out in round 2,
#   (d) the 2 new round-3 qkeys (tag_roundtrip, by_line_sep).
# Everything rotated out here was driver-green in r1/r2 AND stays
# verified by tools/parity.py locally each round.
# Keys not listed here sort after listed ones, in registration order.
_GATE_ORDER = (
    # (a) round-2 red cells, fixed this round
    "stream_session", "prep_pipeline",
    # (b) never-gated: relational/TPC-H composites
    "tpch_q5", "tpch_q10", "tpch_q14", "tpch_q18",
    "agg_grouping_sets", "agg_approx", "window_range_frame",
    "join_salted", "join_bucketed", "resample_gapfill",
    # (b) never-gated: LLM-data ops
    "dedup_cluster", "dedup_apply", "decontaminate", "semdedup",
    "sim_ivf", "embed_centroids", "kmeans_iter",
    "token_histogram", "doc_repetition",
    "sample_mixture", "split_assign", "pack_sequences", "sample_shuffle",
    # (b) never-gated: UDF variants
    "udf_scalar", "udf_grouped",
    # (b) never-gated: LIVE Structured Streaming (the north-star path)
    "stream_window_live", "stream_session_live", "stream_take_live",
    "stream_join_live", "stream_queue_live",
    # (b) never-gated: sink formats
    "sink_csv", "sink_json", "sink_partitioned",
    # (c) round-1 cells rotated out in round 2
    "agg_rollup", "agg_cube", "agg_pivot", "agg_percentile", "agg_collect",
    "array_fns", "fingerprint", "join_outer", "join_semi", "set_intersect",
    "text_clean", "token_count", "window_running",
    # (d) new round-3 qkeys
    "tag_roundtrip", "by_line_sep",
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
