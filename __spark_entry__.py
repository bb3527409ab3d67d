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

    TPC-H Q1-shaped grouped aggregation over lineitem (decimal-exact sums,
    map-side partial agg — see flod_spark/catalog/relational.py::agg_group).
    """
    from flod_spark.catalog.relational import agg_group
    from flod_spark.registry import ensure_shipped

    ensure_shipped(spark)  # executors can import flod_spark in any session
    return agg_group(spark, "/root/testdata/sf0.001")


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
