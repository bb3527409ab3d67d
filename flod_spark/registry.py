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
    if not os.path.exists(zpath):
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
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a qkey. ``oracle`` is ANSI SQL DuckDB runs on the same tables;
    omit only for genuinely non-SQL-expressible ops (driver then records a
    weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_shipped(spark)
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
