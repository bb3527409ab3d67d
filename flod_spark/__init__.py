"""flod_spark — a PySpark-native analytics engine with the capability surface of
epi/flod (reference: /root/reference, a D compile-time streaming-pipeline library),
re-expressed Spark-first, plus relational / streaming / LLM-data-pipeline extensions.

Design stance (see SURVEY.md §0/§4): flod's machinery (method negotiation,
adapter insertion, fibers, buffers — pipeline.d:30-104, adapter.d:12-580) is
replaced wholesale by Catalyst/Tungsten; what we re-create is the *observable
operator surface* (SURVEY.md §2) as idiomatic DataFrame / Structured Streaming
code, designed for 100 TB scale (partitioning, broadcast, pushdown).
"""

from flod_spark.session import get_spark
from flod_spark.pipeline import (
    Pipeline,
    Queue,
    from_array,
    from_generator,
    from_range,
    read_parquet,
    read_text,
)

__all__ = [
    "get_spark",
    "Pipeline",
    "Queue",
    "read_parquet",
    "read_text",
    "from_array",
    "from_generator",
    "from_range",
]

__version__ = "0.1.0"
