"""Multimodal plumbing tests: binary columns through mapInPandas with the
deterministic fake decoder (real schema/batching, stubbed codec)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flod_spark.functions.media import (
    decode_media,
    frame_sample_plan,
    pack_media,
    resize_nearest,
)


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


def test_resize_nearest_identity_and_downscale(spark):
    """resize_nearest is a REAL codec round-trip: same-size resize is the
    identity on pixels; a 2x downscale keeps exactly the even-index
    pixels (nearest-neighbor floor map); non-PNG blobs pass through as
    NULL."""
    import pandas as pd

    from flod_spark.functions.media import png_decode, png_encode

    w, h = 4, 2
    px = bytes(range(10, 10 + w * h * 3))
    blob = png_encode(w, h, px, color_type=2, filters=[0] * h)
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": pd.Series([1, 2], dtype="int64"),
                      "blob": [blob, b"not a png at all"]})
    )
    same = {r["media_id"]: r["blob"] for r in resize_nearest(df, w, h).collect()}
    assert png_decode(bytes(same[1]))["pixels"] == px
    assert same[2] is None
    down = resize_nearest(df, 2, 1).collect()
    got = png_decode(bytes(next(r["blob"] for r in down if r["media_id"] == 1)))
    # output (x2, 0) samples source ((x2*4)//2, (0*2)//1) = (2*x2, 0)
    want = px[0:3] + px[6:9]
    assert got["pixels"] == want and (got["width"], got["height"]) == (2, 1)


def test_decode_media_real_wav_and_fallbacks(spark):
    """The real-codec adapter: a genuine RIFF/WAVE blob decodes through
    the stdlib wave module (real sample rate / bit depth / frame count),
    FMED blobs fall back to the synthetic parse, PNG without Pillow
    degrades to 'unknown' instead of failing the stage, and garbage is
    'unknown' — one mixed batch through one mapInPandas stage."""
    import io
    import wave

    from flod_spark.functions.media import decode_media_real, pack_media

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"\x01\x02\x03\x04" * 250)  # 250 stereo 16-bit frames
    wav = buf.getvalue()
    fmed = pack_media(2, 64, 48, 12, b"payload")
    png_hdr = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
    rows = [(1, wav), (2, fmed), (3, png_hdr), (4, b"garbage-bytes")]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    out = {r.media_id: r for r in decode_media_real(df).collect()}
    assert (out[1].kind, out[1].width, out[1].height, out[1].n_frames) == ("audio", 16000, 32, 250)
    assert len(out[1].feature) == 8 and all(0 <= v <= 1 for v in out[1].feature)
    assert (out[2].kind, out[2].width, out[2].height, out[2].n_frames) == ("video", 64, 48, 12)
    try:
        import PIL  # noqa: F401

        assert out[3].kind == "unknown"  # header-only PNG is not decodable anyway
    except ImportError:
        assert out[3].kind == "unknown"  # no image codec -> honest degraded mode
    assert out[4].kind == "unknown"
    assert out[4].n_bytes == 13


@pytest.mark.parametrize("color_type", [0, 2, 6])
@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_roundtrip_all_filters(color_type, filters):
    """png_decode(png_encode(x)) == x for 8-bit gray/RGB/RGBA across all
    five PNG filter types, odd widths included — the unfilter logic is
    exercised for real, not just the zlib inflate."""
    from flod_spark.functions.media import png_decode, png_encode

    bpp = {0: 1, 2: 3, 6: 4}[color_type]
    w, h = 17, 9
    px = bytes((i * 37 + 11) % 256 for i in range(w * h * bpp))
    blob = png_encode(w, h, px, color_type=color_type, filters=filters)
    d = png_decode(blob)
    assert (d["width"], d["height"], d["color_type"]) == (w, h, color_type)
    assert d["pixels"] == px


def test_png_decode_rejects_unsupported():
    from flod_spark.functions.media import png_decode

    with pytest.raises(ValueError):
        png_decode(b"not a png at all")
    # truncated: signature only
    with pytest.raises(ValueError):
        png_decode(b"\x89PNG\r\n\x1a\n")


def test_decode_media_real_png_stdlib_path(spark):
    """Planted PNGs through the decode_media_real stage: real dims and a
    feature equal to sha256(raw pixels) — via the stdlib inflate +
    unfilter leg when Pillow is absent (this container), via Pillow
    when present; both must produce these exact values."""
    import hashlib

    from flod_spark.functions.media import decode_media_real, png_encode

    rows = []
    expected = {}
    for mid, (w, h) in enumerate([(1, 1), (5, 3), (16, 9)]):
        px = bytes((mid * 7 + i) % 256 for i in range(w * h * 3))
        rows.append((mid, png_encode(w, h, px, color_type=2, filters=[0, 1, 2, 3, 4])))
        expected[mid] = (w, h, [b / 255.0 for b in hashlib.sha256(px).digest()[:8]])
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    got = {r["media_id"]: r for r in decode_media_real(df).collect()}
    assert set(got) == set(expected)
    for mid, (w, h, feat) in expected.items():
        r = got[mid]
        assert (r["kind"], r["width"], r["height"], r["n_frames"]) == ("image", w, h, 1)
        assert r["feature"] == pytest.approx(feat)
