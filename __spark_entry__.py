"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in flod_spark/catalog/* (one module per operator
family, SURVEY.md §2 qkeys); this file just re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The composed training-data prep chain — C4-style quality filter ->
    exact dedup -> deterministic train/val/test split -> mixture audit
    (flod_spark/catalog/prep.py::prep_pipeline; each stage is also a
    standalone oracle-gated qkey). 15 rows, stable (split, lang) schema.
    """
    from flod_spark.catalog.prep import prep_pipeline
    from flod_spark.registry import ensure_shipped

    ensure_shipped(spark)  # executors can import flod_spark in any session
    return prep_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from flod_spark import registry

    registry.load_catalog()
    return registry.gate_order(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (same column names)."""
    from flod_spark import registry

    registry.load_catalog()
    return registry.gate_order(registry.ORACLES)
