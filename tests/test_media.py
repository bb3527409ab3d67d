"""Multimodal plumbing tests: binary columns through mapInPandas with the
deterministic fake decoder (real schema/batching, stubbed codec)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flod_spark.functions.media import decode_media, frame_sample_plan, pack_media, resize_stub


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (0, pack_media(0, 640, 480, 1, b"imagepayload" * 100)),
        (1, pack_media(1, 0, 0, 0, b"audiopayload" * 50)),
        (2, pack_media(2, 1920, 1080, 240, b"videopayload" * 200)),
        (3, b"not-a-media-file"),
        (4, None),
    ]
    return spark.createDataFrame(rows, "media_id long, blob binary")


def test_decode_media(spark, media_df):
    out = {r.media_id: r for r in decode_media(media_df).collect()}
    assert out[0].kind == "image" and (out[0].width, out[0].height) == (640, 480)
    assert out[1].kind == "audio"
    assert out[2].kind == "video" and out[2].n_frames == 240
    assert out[3].kind == "unknown"
    assert out[4].kind == "unknown" and out[4].n_bytes == 0
    # feature vector: fixed dim, deterministic
    assert len(out[0].feature) == 8
    again = {r.media_id: r for r in decode_media(media_df).collect()}
    assert out[0].feature == again[0].feature


def test_frame_sample_plan(spark, media_df):
    decoded = decode_media(media_df)
    sampled = {r.media_id: r.sampled_frames for r in frame_sample_plan(decoded, 60).collect()}
    assert sampled[2] == [0, 60, 120, 180]


def test_resize_stub_raises_clearly(spark, media_df):
    with pytest.raises(Exception, match="codec"):
        resize_stub(media_df, 100, 100).collect()
