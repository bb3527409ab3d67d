"""Degenerate-input hardening: empty and single-row inputs through the
core distributed helpers. A 100 TB pipeline's first run is often an
EMPTY partition of a new day — none of these may throw or mis-count."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_with_seq_empty_and_single(spark):
    from flod_spark.seq import with_seq

    empty = spark.createDataFrame([], "x long, y string")
    assert with_seq(empty, "x", "y").count() == 0
    one = spark.createDataFrame([(7, "a")], "x long, y string")
    rows = with_seq(one, "x", "y").collect()
    assert len(rows) == 1 and rows[0]["seq"] == 0


def test_replay_empty_table_single_unbounded_batch(spark, tmp_path):
    import glob
    import os

    from flod_spark.streaming.replay import replay_stream

    empty = spark.createDataFrame([], "event_id long, ts timestamp")
    out = str(tmp_path / "replay_empty")
    stream = replay_stream(spark, empty, "ts", out, n_batches=4)
    assert stream.isStreaming
    assert not glob.glob(os.path.join(out, "*.parquet"))  # nothing written


def test_split_hot_cells_empty(spark):
    from flod_spark.catalog.similarity import split_hot_cells

    empty = spark.createDataFrame([], "vec_id long, v array<double>, cell string")
    assert split_hot_cells(empty, max_cell=4).count() == 0


def test_minhash_on_empty_corpus(spark):
    from flod_spark.operators.minhash import minhash_candidates

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert minhash_candidates(empty).count() == 0


def test_update_centroids_empty_assignment(spark):
    from flod_spark.catalog.similarity import update_centroids

    empty = spark.createDataFrame([], "vec_id long, v array<double>, cell string")
    assert update_centroids(empty).count() == 0
