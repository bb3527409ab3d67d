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
    Map-only; at 100 TB this runs inside the scan stage.

    Scale: map-only; runs inside the scan stage at 100 TB."""
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


@query(
    "media_decode_png",
    oracle=(
        # closed-form twin of the PNG pack -> inflate -> unfilter ->
        # feature path: pixel (x, y) channel values are pure doc_id
        # arithmetic kept in [32, 96) so chr() is one UTF-8 byte and
        # DuckDB's sha256 over the assembled string hashes EXACTLY the
        # raw pixel bytes the Spark side decodes — the sha256 check
        # therefore proves every pixel byte of every image, not a
        # sample
        "WITH p AS (SELECT doc_id AS media_id, "
        "    1 + doc_id % 16 AS w, 1 + (doc_id * 7) % 16 AS h FROM documents), "
        "px AS (SELECT media_id, w, h, array_to_string(list_transform(range(0, h), y -> "
        "    array_to_string(list_transform(range(0, w), x -> "
        "      chr(CAST(32 + (media_id + 3*x + 5*y) % 64 AS INT)) || "
        "      chr(CAST(32 + (2*media_id + x + 7*y) % 64 AS INT)) || "
        "      chr(CAST(32 + (media_id + x + y) % 64 AS INT))), '')), '') AS raw "
        "  FROM p) "
        "SELECT media_id, 'image' AS kind, "
        "  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height, "
        "  CAST(1 AS BIGINT) AS n_frames, "
        "  CAST(w * h * 3 AS BIGINT) AS n_raw_bytes, "
        "  array_to_string(list_transform(range(1, 9), "
        "    i -> CAST(CAST('0x' || substr(sha256(raw), 2*i - 1, 2) AS INT) AS VARCHAR)), ',') "
        "    AS feat_bytes "
        "FROM px"
    ),
)
def media_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode under the gate — no Pillow required: per-doc
    deterministic RGB pixels -> spec-conformant PNG bytes (stdlib
    png_encode, zlib-compressed scanlines with CYCLING filter types
    0-4) -> decode_media_real, whose PNG leg runs the pure-stdlib
    inflate + per-scanline unfilter (functions/media.py::png_decode;
    Pillow is used instead when installed and agrees byte-for-byte).
    The oracle recomputes the pixel closed form and its sha256, so a
    single wrong byte in any scanline of any image — a filter
    mis-applied, a stride off by one — breaks the gate. This closes
    the 'real image codec' gap honestly: the decode is real, only the
    image CONTENT is synthetic (the container ships no image files).

    Scale: two Arrow-batched map-only stages, same shape as
    media_decode; blobs die at the decode stage."""
    from flod_spark.io import load as _load  # noqa: F401 (uniform import style)

    from flod_spark.functions.media import decode_media_real

    decoded = decode_media_real(_synth_png_stream(spark, sf_dir))
    feat_bytes = F.array_join(
        F.transform(F.col("feature"), lambda f: F.round(f * 255).cast("int").cast("string")), ","
    )
    return decoded.select(
        "media_id",
        "kind",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_frames").cast("long").alias("n_frames"),
        (F.col("width") * F.col("height") * 3).cast("long").alias("n_raw_bytes"),
        feat_bytes.alias("feat_bytes"),
    )


@query(
    "media_decode",
    oracle=(
        # closed-form twin of the pack->decode->frame-sample pipeline:
        # every decoded field is derivable from the synthetic params, and
        # the feature bytes are sha256(payload) — engine-identical
        "WITH p AS (SELECT doc_id AS media_id, doc_id % 3 AS kc, "
        "    16 + doc_id % 64 AS width, 16 + (doc_id * 3) % 64 AS height, "
        "    1 + doc_id % 30 AS n_frames, "
        "    repeat(chr(CAST(65 + doc_id % 26 AS INT)), CAST(doc_id % 100 AS INT)) AS payload "
        "  FROM documents) "
        "SELECT media_id, "
        "  CASE kc WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind, "
        "  CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height, "
        "  CAST(n_frames AS BIGINT) AS n_frames, "
        "  CAST(11 + length(payload) AS BIGINT) AS n_bytes, "
        "  CAST((n_frames - 1) // 5 + 1 AS BIGINT) AS n_sampled, "
        "  array_to_string(list_transform(range(1, 9), "
        "    i -> CAST(CAST('0x' || substr(sha256(payload), 2*i - 1, 2) AS INT) AS VARCHAR)), ',') "
        "    AS feat_bytes "
        "FROM p"
    ),
)
def media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL multimodal pipeline under the gate: synthesize per-doc media
    params -> PACK into FMED blobs (encode_media, mapInPandas) -> DECODE
    back (decode_media, mapInPandas: header parse + sha256 feature
    sketch) -> frame-sample plan (JVM arithmetic). The oracle knows the
    closed form of every decoded field, so the whole Arrow round-trip —
    pack, binary transfer, parse, feature extraction — is value-checked,
    not just schema-checked (media_meta covers the SQL metadata layer).
    Feature floats are byte/255 by construction; round(f*255) recovers
    the exact sha256 bytes the oracle computes.

    Scale: two Arrow-batched mapInPandas stages, map-only (no shuffle);
    raw blobs die at the decode stage — only 8-double features and
    scalar metadata flow on. Batch size is bounded by
    arrow.maxRecordsPerBatch for MB-scale real media."""
    from flod_spark.functions.media import decode_media, encode_media, frame_sample_plan

    docs = load(spark, sf_dir, "documents")
    params = docs.select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 3).cast("int").alias("kind_code"),
        (F.lit(16) + F.col("doc_id") % 64).cast("int").alias("width"),
        (F.lit(16) + (F.col("doc_id") * 3) % 64).cast("int").alias("height"),
        (F.lit(1) + F.col("doc_id") % 30).cast("int").alias("n_frames"),
        F.expr("CAST(repeat(char(65 + doc_id % 26), CAST(doc_id % 100 AS INT)) AS BINARY)").alias(
            "payload"
        ),
    )
    decoded = decode_media(encode_media(params))
    sampled = frame_sample_plan(decoded, every_n=5)
    feat_bytes = F.array_join(
        F.transform(F.col("feature"), lambda f: F.round(f * 255).cast("int").cast("string")), ","
    )
    return sampled.select(
        "media_id",
        "kind",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_frames").cast("long").alias("n_frames"),
        F.col("n_bytes").alias("n_bytes"),
        F.size("sampled_frames").cast("long").alias("n_sampled"),
        feat_bytes.alias("feat_bytes"),
    )


# media_resize target dims (fixed output raster)
_RZ_W, _RZ_H = 8, 8


def _resize_oracle() -> str:
    def sx(expr: str) -> str:
        return f"(({expr} * w) // CAST({_RZ_W} AS BIGINT))"

    def sy(expr: str) -> str:
        return f"(({expr} * h) // CAST({_RZ_H} AS BIGINT))"

    px = (
        f"chr(CAST(32 + (media_id + 3 * {sx('x2')} + 5 * {sy('y2')}) % 64 AS INT)) || "
        f"chr(CAST(32 + (2 * media_id + {sx('x2')} + 7 * {sy('y2')}) % 64 AS INT)) || "
        f"chr(CAST(32 + (media_id + {sx('x2')} + {sy('y2')}) % 64 AS INT))"
    )
    return (
        "WITH p AS (SELECT doc_id AS media_id, "
        "    CAST(1 + doc_id % 16 AS BIGINT) AS w, "
        "    CAST(1 + (doc_id * 7) % 16 AS BIGINT) AS h FROM documents), "
        f"px AS (SELECT media_id, array_to_string(list_transform(range(0, {_RZ_H}), y2 -> "
        f"    array_to_string(list_transform(range(0, {_RZ_W}), x2 -> {px}), '')), '') AS raw "
        "  FROM p) "
        f"SELECT media_id, CAST({_RZ_W} AS BIGINT) AS width, "
        f"  CAST({_RZ_H} AS BIGINT) AS height, sha256(raw) AS px_sha FROM px"
    )


@query("media_resize", oracle=_resize_oracle())
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize under the gate — the mandate's resize stage,
    no longer a stub: the same deterministic PNGs as media_decode_png
    run encode -> nearest-neighbor resample to 8x8 -> re-encode -> final
    decode, every codec step the pure-stdlib real path
    (functions/media.py::resize_nearest / png_decode). The output is
    sha256 over the RESIZED raw pixels, and the oracle recomputes the
    nearest-neighbor index map ((x2*w)//8, (y2*h)//8) in closed form —
    one wrong sampled pixel in any image breaks the gate. Up- and
    down-scaling are both exercised (source dims cycle 1..16 around the
    8x8 target).

    Scale: three Arrow-batched map-only stages (pack, resize, unpack);
    resized bytes are bounded by the target raster regardless of
    source size, the property that makes resize the FIRST stage of any
    100 TB image pipeline."""
    from flod_spark.functions.media import resize_nearest

    resized = resize_nearest(_synth_png_stream(spark, sf_dir), _RZ_W, _RZ_H)

    def unpack(batches):
        import pandas as pd

        from flod_spark.functions.media import png_decode

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "raw": [
                        png_decode(bytes(b))["pixels"] if b is not None else None
                        for b in pdf["blob"]
                    ],
                }
            )

    raw = resized.mapInPandas(unpack, schema="media_id long, raw binary")
    return raw.select(
        "media_id",
        F.lit(_RZ_W).cast("long").alias("width"),
        F.lit(_RZ_H).cast("long").alias("height"),
        F.sha2("raw", 256).alias("px_sha"),
    )


@query(
    "media_decode_wav",
    oracle=(
        # closed form of the synthesized 8-bit mono PCM: sample i is the
        # single byte 32 + (id + 11*i) % 64, so DuckDB's sha256 over the
        # chr()-assembled string hashes exactly the raw sample bytes the
        # stdlib wave decoder returns
        "WITH p AS (SELECT doc_id AS media_id, "
        "    8000 + (doc_id % 8) * 1000 AS rate, "
        "    50 + doc_id % 100 AS n FROM documents), "
        "raw AS (SELECT media_id, rate, n, "
        "    array_to_string(list_transform(range(0, n), "
        "      i -> chr(CAST(32 + (media_id + 11 * i) % 64 AS INT))), '') AS pcm "
        "  FROM p) "
        "SELECT media_id, 'audio' AS kind, CAST(rate AS BIGINT) AS sample_rate, "
        "  CAST(8 AS BIGINT) AS bits, CAST(n AS BIGINT) AS n_frames, "
        "  array_to_string(list_transform(range(1, 9), "
        "    i -> CAST(CAST('0x' || substr(sha256(pcm), 2*i - 1, 2) AS INT) AS VARCHAR)), ',') "
        "    AS feat_bytes "
        "FROM raw"
    ),
)
def media_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode under the gate: per-doc deterministic 8-bit mono
    PCM -> spec-conformant RIFF/WAVE bytes (stdlib ``wave`` writer) ->
    decode_media_real, whose WAV leg re-parses them with the stdlib
    reader (genuine container decode: fmt chunk, sample rate, width,
    frame count, raw sample bytes). The oracle recomputes the PCM
    closed form and its sha256 — the audio twin of media_decode_png,
    closing the 'real audio codec' leg with its own gate row instead of
    only adapter tests.

    Scale: two Arrow-batched map-only stages; blobs die at the decode
    stage, exactly media_decode's shape."""
    from flod_spark.functions.media import decode_media_real

    decoded = decode_media_real(_synth_wav_stream(spark, sf_dir))
    feat_bytes = F.array_join(
        F.transform(F.col("feature"), lambda f: F.round(f * 255).cast("int").cast("string")), ","
    )
    return decoded.select(
        "media_id",
        "kind",
        F.col("width").cast("long").alias("sample_rate"),
        F.col("height").cast("long").alias("bits"),
        F.col("n_frames").cast("long").alias("n_frames"),
        feat_bytes.alias("feat_bytes"),
    )


def _synth_wav_batches(batches):
    """mapInPandas stage: per-doc closed-form 8-bit mono PCM packed as
    spec-conformant RIFF/WAVE bytes (stdlib ``wave`` writer) — the ONE
    source of the synthetic-audio formula media_decode_wav's and
    media_audio_rms's oracles both mirror (sample i = 32 +
    (media_id + 11*i) % 64)."""
    import io as _io
    import wave as _wave

    import pandas as pd

    for pdf in batches:
        ids, blobs = [], []
        for mid, rate, n in zip(pdf["media_id"], pdf["rate"], pdf["n"]):
            mid, rate, n = int(mid), int(rate), int(n)
            pcm = bytes(32 + (mid + 11 * i) % 64 for i in range(n))
            buf = _io.BytesIO()
            with _wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(1)
                w.setframerate(rate)
                w.writeframes(pcm)
            ids.append(mid)
            blobs.append(buf.getvalue())
        yield pd.DataFrame({"media_id": pd.Series(ids, dtype="int64"),
                            "blob": blobs})


def _synth_wav_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, blob) frame of the deterministic per-doc WAVs (rate
    cycles over 8 values, length 50..149 samples)."""
    docs = load(spark, sf_dir, "documents")
    params = docs.select(
        F.col("doc_id").alias("media_id"),
        (F.lit(8000) + (F.col("doc_id") % 8) * 1000).cast("int").alias("rate"),
        (F.lit(50) + F.col("doc_id") % 100).cast("int").alias("n"),
    )
    return params.mapInPandas(_synth_wav_batches, schema="media_id long, blob binary")


_RMS_FRAME = 16  # samples per analysis frame


def _rms_kernel(batches):
    """Arrow stage: REAL stdlib WAV decode -> centered int samples ->
    per-frame integer energy + IEEE rms (sqrt is correctly rounded by
    spec, so the float matches DuckDB's bit-for-bit)."""
    import io as _io
    import math as _math
    import wave as _wave

    import numpy as np
    import pandas as pd

    for pdf in batches:
        mids, fidx, ns, energies, rms = [], [], [], [], []
        for mid, blob in zip(pdf["media_id"], pdf["blob"]):
            with _wave.open(_io.BytesIO(bytes(blob))) as w:
                pcm = w.readframes(w.getnframes())
            v = np.frombuffer(pcm, np.uint8).astype(np.int64) - 128
            for f in range(0, len(v), _RMS_FRAME):
                frame = v[f : f + _RMS_FRAME]
                e = int((frame * frame).sum())
                mids.append(int(mid))
                fidx.append(f // _RMS_FRAME)
                ns.append(len(frame))
                energies.append(e)
                rms.append(_math.sqrt(e / len(frame)))
        yield pd.DataFrame(
            {
                "media_id": pd.Series(mids, dtype="int64"),
                "frame_idx": pd.Series(fidx, dtype="int64"),
                "n_samples": pd.Series(ns, dtype="int64"),
                "energy": pd.Series(energies, dtype="int64"),
                "rms": pd.Series(rms, dtype="float64"),
            }
        )


@query(
    "media_audio_rms",
    oracle=(
        # same closed-form PCM as media_decode_wav's oracle, centered at
        # 128; per 16-sample frame: integer energy and sqrt(e/n) — both
        # divisions and sqrt are correctly-rounded IEEE on both engines
        "WITH p AS (SELECT doc_id AS media_id, 50 + doc_id % 100 AS n FROM documents), "
        f"fr AS (SELECT media_id, n, unnest(range(0, (n + {_RMS_FRAME - 1}) // {_RMS_FRAME})) AS f FROM p), "
        "v AS (SELECT media_id, f, list_transform("
        f"    range(f * {_RMS_FRAME}, least(n, (f + 1) * {_RMS_FRAME})), "
        "      i -> CAST(32 + (media_id + 11 * i) % 64 AS BIGINT) - 128) AS vals "
        "  FROM fr) "
        "SELECT media_id, CAST(f AS BIGINT) AS frame_idx, "
        "  CAST(len(vals) AS BIGINT) AS n_samples, "
        "  CAST(list_sum(list_transform(vals, x -> x * x)) AS BIGINT) AS energy, "
        "  sqrt(CAST(list_sum(list_transform(vals, x -> x * x)) AS DOUBLE) / len(vals)) AS rms "
        "FROM v"
    ),
)
def media_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level audio FEATURE EXTRACTION on the real decode path —
    the mandate's feature-extract stage with genuine signal math: the
    shared synthetic WAVs decode through the stdlib ``wave`` reader (a
    real container parse, same leg as media_decode_wav), samples center
    at the 8-bit midpoint, and each 16-sample analysis frame reports
    its exact INTEGER energy plus IEEE rms — the envelope a
    silence-trimming / voice-activity pipeline thresholds. Exactness:
    energy is pure int64; rms = sqrt(energy/n) is two correctly-rounded
    IEEE ops, bit-identical cross-engine (unlike ln, sqrt is required
    exact by IEEE 754).

    Scale: two Arrow-batched map-only stages (pack -> decode+frame);
    blobs die inside the kernel and only (media, frame) feature rows
    survive — ~n/16 rows per clip, the media.py shape throughout. A
    real corpus swaps the pack stage for a binaryFile scan; the frame
    kernel is unchanged."""
    packed = _synth_wav_stream(spark, sf_dir)
    return packed.mapInPandas(
        _rms_kernel,
        "media_id long, frame_idx long, n_samples long, energy long, rms double",
    )


def _synth_png_batches(batches):
    """mapInPandas stage: per-doc closed-form RGB pixels packed as
    spec-conformant PNGs with cycling filter types — the ONE source of
    the synthetic-image formula media_decode_png's and media_resize's
    oracles both mirror (keep the three in lockstep)."""
    import pandas as pd

    from flod_spark.functions.media import png_encode

    for pdf in batches:
        ids, blobs = [], []
        for mid, w, h in zip(pdf["media_id"], pdf["w"], pdf["h"]):
            mid, w, h = int(mid), int(w), int(h)
            px = bytearray()
            for y in range(h):
                for x in range(w):
                    px.append(32 + (mid + 3 * x + 5 * y) % 64)
                    px.append(32 + (2 * mid + x + 7 * y) % 64)
                    px.append(32 + (mid + x + y) % 64)
            blobs.append(
                png_encode(
                    w, h, bytes(px), color_type=2,
                    filters=[(mid + y) % 5 for y in range(h)],
                )
            )
            ids.append(mid)
        yield pd.DataFrame({"media_id": pd.Series(ids, dtype="int64"),
                            "blob": blobs})


def _synth_png_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, blob) frame of the deterministic per-doc PNGs (dims
    cycle 1..16 on each axis)."""
    docs = load(spark, sf_dir, "documents")
    params = docs.select(
        F.col("doc_id").alias("media_id"),
        (F.lit(1) + F.col("doc_id") % 16).cast("int").alias("w"),
        (F.lit(1) + (F.col("doc_id") * 7) % 16).cast("int").alias("h"),
    )
    return params.mapInPandas(_synth_png_batches, schema="media_id long, blob binary")


# ---- video frame sampling (the mandate's frame-sample stage) ----------
# Deterministic fake container "FVID1" (no stdlib video codec exists;
# the brief's deterministic-fake rule): 16-byte header
# struct('<4sHHII': magic, w, h, n_frames, fps) + n_frames grayscale
# frames of w*h bytes. Pixel (frame f, x, y) of media m is
# 32 + (m + 7f + 3x + 5y) % 64 — printable ASCII, so the oracle can
# chr()-assemble a frame and sha256 exactly the bytes the kernel slices.
_VID_W, _VID_H = 8, 6
_VID_STRIDE = 3  # keep every 3rd frame


def _synth_video_batches(batches):
    """mapInPandas stage: pack the closed-form frames into FVID1 blobs
    — the ONE source of the synthetic-video formula media_frame_sample's
    oracle mirrors."""
    import struct as _struct

    import pandas as pd

    for pdf in batches:
        ids, blobs = [], []
        for mid, nf, fps in zip(pdf["media_id"], pdf["n_frames"], pdf["fps"]):
            mid, nf, fps = int(mid), int(nf), int(fps)
            frames = b"".join(
                bytes(
                    32 + (mid + 7 * f + 3 * x + 5 * y) % 64
                    for y in range(_VID_H)
                    for x in range(_VID_W)
                )
                for f in range(nf)
            )
            blobs.append(
                _struct.pack("<4sHHII", b"FVID", _VID_W, _VID_H, nf, fps) + frames
            )
            ids.append(mid)
        yield pd.DataFrame(
            {"media_id": pd.Series(ids, dtype="int64"), "blob": blobs}
        )


def _frame_sample_kernel(batches):
    """Arrow stage: parse the FVID1 header, STRIDE-SLICE every
    _VID_STRIDE-th frame without touching the rest (the entire point of
    frame sampling: unsampled frames are never decoded — here never
    even copied out of the blob), and report per sampled frame the
    exact integer pixel sum plus the sha256 prefix of its raw bytes."""
    import hashlib as _hashlib
    import struct as _struct

    import numpy as np
    import pandas as pd

    for pdf in batches:
        mids, fidx, nfs, sums, shas = [], [], [], [], []
        for mid, blob in zip(pdf["media_id"], pdf["blob"]):
            raw = bytes(blob)
            magic, w, h, nf, _fps = _struct.unpack_from("<4sHHII", raw, 0)
            assert magic == b"FVID", "not an FVID1 container"
            fsz = w * h
            for f in range(0, nf, _VID_STRIDE):
                frame = raw[16 + f * fsz : 16 + (f + 1) * fsz]
                v = np.frombuffer(frame, np.uint8)
                mids.append(int(mid))
                fidx.append(f)
                nfs.append(nf)
                sums.append(int(v.sum()))
                shas.append(_hashlib.sha256(frame).hexdigest()[:16])
        yield pd.DataFrame(
            {
                "media_id": pd.Series(mids, dtype="int64"),
                "frame_idx": pd.Series(fidx, dtype="int64"),
                "n_frames": pd.Series(nfs, dtype="int64"),
                "px_sum": pd.Series(sums, dtype="int64"),
                "frame_sha": pd.Series(shas, dtype="object"),
            }
        )


@query(
    "media_frame_sample",
    oracle=(
        # closed-form twin: sampled frame indices are range(0, n, 3);
        # each frame's bytes reassemble as chr(32 + (m + 7f + 3x + 5y)
        # % 64) in row-major order (printable ASCII -> 1-byte UTF-8),
        # so sha256 hashes EXACTLY the bytes the kernel slices and the
        # pixel sum is pure integer arithmetic
        "WITH p AS (SELECT doc_id AS media_id, 4 + doc_id % 12 AS nf FROM documents), "
        f"fr AS (SELECT media_id, nf, unnest(range(0, nf, {_VID_STRIDE})) AS f FROM p), "
        "px AS (SELECT media_id, nf, f, "
        f"    list_transform(range(0, {_VID_W * _VID_H}), "
        f"      j -> 32 + (media_id + 7 * f + 3 * (j % {_VID_W}) + 5 * (j // {_VID_W})) % 64) AS vals "
        "  FROM fr) "
        "SELECT media_id, CAST(f AS BIGINT) AS frame_idx, CAST(nf AS BIGINT) AS n_frames, "
        "  CAST(list_sum(vals) AS BIGINT) AS px_sum, "
        "  substr(sha256(array_to_string(list_transform(vals, x -> chr(CAST(x AS INT))), '')), 1, 16) "
        "    AS frame_sha "
        "FROM px"
    ),
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO FRAME SAMPLING — the mandate's frame-sample stage: opaque
    video blobs (deterministic FVID1 container; no stdlib video codec
    exists, so the container is the brief's deterministic fake while
    the Spark plumbing — schema, Arrow batches, stride slicing — is
    real) parse their header and keep every _VID_STRIDE-th frame
    WITHOUT decoding the rest: unsampled frames are never copied out
    of the blob, which is the whole economics of frame sampling (a
    30 fps corpus read at 1 fps costs 1/30th of the decode). Each
    sampled frame reports its exact integer pixel sum and the sha256
    prefix of its raw bytes, so the oracle proves every sampled byte
    (the media_decode_png discipline) and would catch an off-by-one
    stride or header-offset slip outright.

    Scale: two Arrow-batched map-only stages (pack -> sample); blobs
    die inside the kernel and only ~n_frames/stride feature rows
    survive. A real corpus swaps the pack stage for a binaryFile scan
    + a keyframe-index seek (the same stride logic against container
    byte offsets); the sampling kernel is unchanged."""
    docs = load(spark, sf_dir, "documents")
    params = docs.select(
        F.col("doc_id").alias("media_id"),
        (F.lit(4) + F.col("doc_id") % 12).cast("int").alias("n_frames"),
        F.lit(24).cast("int").alias("fps"),
    )
    packed = params.mapInPandas(_synth_video_batches, "media_id long, blob binary")
    return packed.mapInPandas(
        _frame_sample_kernel,
        "media_id long, frame_idx long, n_frames long, px_sum long, frame_sha string",
    )
