"""with_seq (the ordered-stream convention, SURVEY §4.2-1): gap-free global
rank, stable across repeated actions (the RangePartitioner-seed pitfall)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flod_spark.seq import with_seq


def test_seq_is_gap_free_permutation(spark):
    df = spark.range(0, 1000).select((F.col("id") * 37 % 1000).alias("k"))
    s = with_seq(df, "k")
    seqs = sorted(r.seq for r in s.collect())
    assert seqs == list(range(1000))


def test_seq_matches_sort_order(spark):
    df = spark.range(0, 500).select((499 - F.col("id")).alias("k"))
    s = with_seq(df, "k")
    rows = sorted(((r.seq, r.k) for r in s.collect()))
    assert all(seq == k for seq, k in rows)


def test_seq_stable_across_actions(spark):
    df = spark.range(0, 2000).select((F.col("id") * 7919 % 2000).alias("k"))
    s = with_seq(df, "k")
    a = {(r.k, r.seq) for r in s.collect()}
    b = {(r.k, r.seq) for r in s.collect()}  # second action, same partitioning
    assert a == b


def test_seq_empty_input(spark):
    df = spark.range(0).select(F.col("id").alias("k"))
    assert with_seq(df, "k").count() == 0
