"""Codec round-trip + user-stage (mapInPandas) regression tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from flod_spark.io import load
from flod_spark.operators.codec import deflate, inflate


def test_deflate_inflate_roundtrip(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    back = docs.select(
        "doc_id", "text", inflate(deflate(F.col("text"))).alias("rt")
    ).filter(F.col("text") != F.col("rt"))
    assert back.count() == 0


def test_deflate_actually_compresses(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("text").limit(50)
    stats = docs.select(
        F.length("text").alias("n"), F.length(deflate(F.col("text"))).alias("z")
    ).agg(F.sum("n").alias("n"), F.sum("z").alias("z")).collect()[0]
    assert stats.z < stats.n  # text compresses


def test_udf_stage_matches_builtin(spark, sf_dir):
    """The mapInPandas stage must equal the same arithmetic done JVM-side."""
    from flod_spark.catalog.udf import udf_stage

    got = udf_stage(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem")
    charge = (F.col("l_extendedprice") * (1.0 - F.col("l_discount"))) * (1.0 + F.col("l_tax"))
    expect = li.select(
        "l_orderkey",
        "l_linenumber",
        charge.alias("charge"),
        F.when(charge < 20000.0, "low").when(charge >= 60000.0, "high").otherwise("mid").alias("band"),
    )
    assert got.exceptAll(expect).count() == 0 and expect.exceptAll(got).count() == 0
