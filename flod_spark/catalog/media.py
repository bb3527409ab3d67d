"""Multimodal columns (driver mandate): media as opaque binary + typed
metadata. The decode/feature-extract stages are Pandas-UDF plumbing over
mapInPandas with a deterministic fake decoder (image/audio libs absent in
this container — see functions/media.py); the Spark-side schema,
partitioning and batch shape are real and tested (tests/test_media.py).

The oracle-checked query covers the SQL-expressible metadata layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flod_spark.io import load
from flod_spark.registry import query


@query(
    "media_meta",
    oracle=(
        "SELECT doc_id, "
        "  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
        "  CAST(length(text) AS BIGINT) AS n_chars_calc, "
        "  CAST(length(regexp_replace(text, '[^ -~]', '', 'g')) AS DOUBLE) "
        "    / NULLIF(length(text), 0) AS ascii_ratio, "
        "  substr(md5(text), 1, 16) AS content_id "
        "FROM documents"
    ),
)
def media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata: byte length (UTF-8), printable-ASCII ratio,
    16-hex content id — the typed-metadata sidecar every media column
    carries (mirrors flod's tag metadata for 'stream encoding' README.md:27).
    Map-only; at 100 TB this runs inside the scan stage."""
    docs = load(spark, sf_dir, "documents")
    as_bin = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.length(as_bin).cast("long").alias("n_bytes"),
        F.length("text").cast("long").alias("n_chars_calc"),
        (
            F.length(F.regexp_replace("text", "[^ -~]", "")).cast("double")
            / F.nullif(F.length("text"), F.lit(0))
        ).alias("ascii_ratio"),
        F.substring(F.md5(as_bin), 1, 16).alias("content_id"),
    )
