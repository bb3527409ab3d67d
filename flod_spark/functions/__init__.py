"""Column-function library: text metrics, media decode plumbing, vector ops."""

from pyspark.sql import Column
from pyspark.sql import functions as _F


def approx_distinct(col: str | Column, rsd: float = 0.05) -> Column:
    """HLL approximate count-distinct (mergeable partial agg, no second
    shuffle — the 100 TB replacement for exact countDistinct; see
    catalog/relational.py::agg_distinct). Excluded from oracles: HLL
    estimates are not deterministic across engines."""
    return _F.approx_count_distinct(col, rsd)
