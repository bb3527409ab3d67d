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


def test_distinct_auto_empty_and_single(spark):
    """An empty key frame routes to the (vacuous) bitmap path with
    zero output groups; a single key is fully dense by definition."""
    from flod_spark.catalog.analytics import distinct_count_auto

    empty = spark.createDataFrame([], "g string, k long")
    path, out = distinct_count_auto(empty, "g", "k")
    assert path == "bitmap" and out.count() == 0
    one = spark.createDataFrame([("x", 42)], "g string, k long")
    path, out = distinct_count_auto(one, "g", "k")
    assert path == "bitmap"
    assert [(r.g, r.n_distinct) for r in out.collect()] == [("x", 1)]


def test_kcore_converged_empty_and_isolated(spark):
    """Empty edge set: the peel terminates immediately with an empty
    core (count-flat on 0 = 0). A graph below k everywhere peels to
    empty rather than looping."""
    from flod_spark.operators.graph import kcore_converged

    empty = spark.createDataFrame([], "a string, b string")
    assert kcore_converged(empty, k=2).count() == 0
    pair = spark.createDataFrame([("x", "y"), ("y", "x")], "a string, b string")
    assert kcore_converged(pair, k=2).count() == 0


def test_lossy_shard_fn_empty_batch():
    """An all-empty micro-batch chunk still advances the bucket and
    applies eviction to carried state without throwing."""
    import pandas as pd

    from flod_spark.streaming.lossy import _lossy_shard_fn

    class FakeState:
        exists = False
        _v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    st = FakeState()
    pdf = pd.DataFrame({"k": ["a", "a", "a", "b"], "c": [1, 1, 1, 1]})
    list(_lossy_shard_fn((0,), iter([pdf]), st))
    out = list(_lossy_shard_fn((0,), iter([pd.DataFrame({"k": [], "c": []})]), st))[0]
    ks, cs, ds, bucket = st.get
    assert bucket == 2
    # b (singleton) evicted at bucket 1; a (c=3 > bucket 2) carried
    assert list(ks) == ["a"]
    # survivor row + the k=NULL bucket marker (the marker is what keeps
    # an all-evicted bucket visible to the downstream max-bucket pick)
    assert len(out) == 2
    assert set(out["k"]) == {None, "a"}


def test_pareto_single_part_brand(spark):
    """A brand with ONE part must classify it A with cum_share 1.0 —
    the crossing rule's boundary case (share-before-item = 0 < 80%)."""
    from pyspark.sql import Window
    # replicate the classification tail on a planted 1-row frame
    b = spark.createDataFrame([(1, "B#1", 1000000)], "p long, p_brand string, rev_us long")
    wrun = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("rev_us").desc(), "p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("p_brand")
    w = b.withColumn("cum", F.sum("rev_us").over(wrun)).withColumn(
        "total", F.sum("rev_us").over(wall)
    )
    before = F.col("cum") - F.col("rev_us")
    cls = (
        F.when(before * 5 < F.col("total") * 4, "A")
        .when(before * 20 < F.col("total") * 19, "B")
        .otherwise("C")
    )
    r = w.select(cls.alias("c"), (F.col("cum") / F.col("total")).alias("sh")).first()
    assert r.c == "A" and r.sh == 1.0


def test_converged_loops_on_empty_inputs(spark):
    """The round-10 to-convergence twins on empty inputs: an empty
    graph / embedding table converges vacuously (no crash on the
    MAX-over-zero-rows delta or the missing first row), returning
    empty results and empty delta trails."""
    from flod_spark.catalog.analytics import pagerank_converged
    from flod_spark.catalog.similarity import pca_power_converged

    edges = spark.createDataFrame([], "src string, dst string")
    ranks, deltas = pagerank_converged(edges, tol=1e-9, max_rounds=3)
    assert ranks.count() == 0 and deltas == []

    e = spark.createDataFrame([], "x array<double>")
    v, lams = pca_power_converged(e, tol=1e-9, max_rounds=3)
    assert v == [] and lams == []
