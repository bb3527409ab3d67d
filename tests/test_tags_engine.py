"""Engine-layer tag propagation (flod_spark.tags; metadata.d:1-448).

flod's tag semantics under test:
- @tagSetter publishes a value visible to every downstream @tagGetter
  (metadata.d:38-41, 102-116);
- nearest-upstream-setter wins — a later setter shadows an earlier one
  for ITS downstream subtree only (metadata.d:256-264);
- onChange fires when a setter republishes (pipeline.d:251-262).

Spark mapping: static tags ride StructField.metadata through the plan
(and parquet round-trips); dynamic per-run tags are observe() metrics
surfaced via Observation (batch) / StreamingQueryListener (streams).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from flod_spark import tags


def _df(spark):
    return spark.range(10).select(
        F.col("id"), (F.col("id") * 2).alias("dbl"), F.lit("x").alias("s")
    )


def test_set_get_roundtrip(spark):
    df = tags.set_tag(_df(spark), "rates/sample_rate", 48000)
    assert tags.get_tag(df, "rates/sample_rate") == 48000


def test_get_without_setter_raises(spark):
    with pytest.raises(KeyError):
        tags.get_tag(_df(spark), "nope")
    assert tags.get_tag(_df(spark), "nope", default=7) == 7


def test_tag_survives_transforms(spark):
    # projection, filter, limit, aggregation keeping a tagged column —
    # Catalyst propagates field metadata through all of them
    df = tags.set_tag(_df(spark), "k", "v")
    assert tags.get_tag(df.select("id", "dbl"), "k") == "v"
    assert tags.get_tag(df.filter(F.col("id") > 3), "k") == "v"
    assert tags.get_tag(df.limit(2), "k") == "v"
    assert tags.get_tag(df.groupBy("s").agg(F.count("*").alias("n")), "k") == "v"


def test_nearest_upstream_setter_shadows(spark):
    # downstream setter shadows the upstream one for its subtree only
    # (metadata.d:256-264)
    up = tags.set_tag(_df(spark), "k", 1)
    down = tags.set_tag(up.filter(F.col("id") > 1), "k", 2)
    assert tags.get_tag(down, "k") == 2
    assert tags.get_tag(up, "k") == 1  # sibling/upstream view unchanged


def test_tags_of_merges(spark):
    df = tags.set_tag(tags.set_tag(_df(spark), "a", 1), "b", 2)
    assert tags.tags_of(df) == {"a": 1, "b": 2}


def test_tag_survives_parquet_roundtrip(spark, tmp_path):
    # Spark persists field metadata in the parquet footer schema
    path = str(tmp_path / "tagged")
    tags.set_tag(_df(spark), "k", "persisted").write.parquet(path)
    back = spark.read.parquet(path)
    assert tags.get_tag(back, "k") == "persisted"


def test_observe_tags_batch(spark):
    # dynamic per-run tag: the value exists only after data flows
    df, obs = tags.observe_tags(
        _df(spark), "stats", max_id=F.max("id"), n=F.count(F.lit(1))
    )
    df.collect()  # action materializes the observation
    got = obs.get
    assert got["max_id"] == 9 and got["n"] == 10


def test_stream_listener_fires_on_change(spark, tmp_path):
    # streaming onChange bridge: metric change between micro-batches
    # fires the callback exactly once per distinct value
    src = str(tmp_path / "src")
    out_ck = str(tmp_path / "ck")
    spark.range(5).select(F.col("id").alias("v")).coalesce(1).write.parquet(src)

    seen: list = []
    lis = tags.TagChangeListener({"m/max_v": seen.append})
    spark.streams.addListener(lis)
    try:
        stream = (
            spark.readStream.schema("v long")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        stream = tags.observe_stream_tags(stream, "m", max_v=F.max("v"))
        q = (
            stream.writeStream.format("noop")
            .option("checkpointLocation", out_ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        # listener bus is async — give it a beat to drain
        deadline = time.time() + 10
        while not seen and time.time() < deadline:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(lis)
    assert seen == [4]


def test_tag_as_column_sub_batch_transitions(spark):
    """SURVEY §1.5's documented workaround as a shipped API (round 11):
    tag_as_column materializes the nearest-upstream-setter value as
    per-row data, so a union of differently-tagged segments shows EVERY
    tag transition within one batch in element order — the sub-batch
    granularity flod's per-setter-write onChange has and the
    coalescing observe() listener (one delivery per micro-batch) does
    not. Also pins nearest-setter resolution: re-tagging downstream
    changes only that segment's rows, and the column prunes away when
    not projected (a literal, not data movement)."""
    import flod_spark as fs

    a = (
        fs.from_array(spark, [1, 2, 3], type_hint="long")
        .set_tag("rate", 8000)
        .tag_as_column("rate")
    )
    # downstream re-set: nearest-upstream-setter wins for THIS segment
    b = (
        fs.from_array(spark, [4, 5], type_hint="long")
        .set_tag("rate", 8000)
        .set_tag("rate", 16000)
        .tag_as_column("rate")
    )
    merged = a.df.select("value", "tag_rate").unionByName(
        b.df.select("value", "tag_rate")
    )
    rows = {(r["value"], r["tag_rate"]) for r in merged.collect()}
    assert rows == {(1, 8000), (2, 8000), (3, 8000), (4, 16000), (5, 16000)}
    # both values visible in ONE batch — the transition the listener
    # bridge would coalesce to 16000
    assert {v for _, v in rows} == {8000, 16000}
    # non-literal tag values materialize as their JSON image
    c = (
        fs.from_array(spark, [9], type_hint="long")
        .set_tag("meta", {"codec": "pcm", "ch": 2})
        .tag_as_column("meta")
    )
    got = c.df.select("tag_meta").first()[0]
    assert got == '{"ch": 2, "codec": "pcm"}'
    # the literal column prunes when not projected
    plan = a.df.select("value")._jdf.queryExecution().optimizedPlan().toString()
    assert "tag_rate" not in plan
