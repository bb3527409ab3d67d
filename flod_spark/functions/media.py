"""Multimodal column plumbing (driver mandate): media as opaque binary +
typed metadata, processed by Arrow-batched mapInPandas stages.

The container has no image/audio codecs, so `decode` is a clearly-marked
DETERMINISTIC FAKE (parses our own header format); everything around it —
schema, batch iteration, partition sizing — is the real production shape.
Swap `_fake_decode` for PIL/ffmpeg bindings and nothing else changes.

Scale notes: media rows are big (MBs); the mapInPandas stage must bound
Arrow batch size (spark.sql.execution.arrow.maxRecordsPerBatch) and the
input should be repartitioned by size, not row count, upstream. Decoded
features (small) flow on; raw bytes are dropped as early as possible.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# our synthetic media header: magic(4s) kind(B) width(H) height(H) n_frames(H)
_HEADER = struct.Struct("<4sBHHH")
MAGIC = b"FMED"
KINDS = {0: "image", 1: "audio", 2: "video"}


def pack_media(kind: int, width: int, height: int, n_frames: int, payload: bytes) -> bytes:
    """Build a synthetic media blob (test fixture generator)."""
    return _HEADER.pack(MAGIC, kind, width, height, n_frames) + payload


def _fake_decode(blob: bytes) -> dict:
    """DETERMINISTIC FAKE decoder. A real build replaces this with
    PIL.Image.open / soundfile / pyav; the returned dict schema is the
    contract that stays fixed."""
    if blob is None or len(blob) < _HEADER.size or blob[:4] != MAGIC:
        return {"kind": "unknown", "width": 0, "height": 0, "n_frames": 0, "feature": None}
    magic, kind, w, h, nf = _HEADER.unpack(blob[: _HEADER.size])
    payload = blob[_HEADER.size :]
    # "feature extraction": stable 8-dim sketch of the payload bytes
    digest = hashlib.sha256(payload).digest()
    feature = [b / 255.0 for b in digest[:8]]
    return {
        "kind": KINDS.get(kind, "unknown"),
        "width": w,
        "height": h,
        "n_frames": nf,
        "feature": feature,
    }


DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "n_bytes long, feature array<double>"
)


def decode_media(df: DataFrame, id_col: str = "media_id", blob_col: str = "blob") -> DataFrame:
    """mapInPandas decode stage: iterator-of-Arrow-batches in, decoded
    metadata + feature vector out. Raw bytes do NOT survive this stage.

    The worker closure is deliberately SELF-CONTAINED: cloudpickle
    serializes module-level helpers by reference, which requires
    flod_spark to be importable on every executor; inlining the decode
    keeps the stage runnable on clusters that only ship the driver script.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl
        import struct as _st

        header = _st.Struct("<4sBHHH")
        kinds = {0: "image", 1: "audio", 2: "video"}

        def fake_decode(blob):
            if blob is None or len(blob) < header.size or bytes(blob[:4]) != b"FMED":
                return {"kind": "unknown", "width": 0, "height": 0, "n_frames": 0, "feature": None}
            _, kind, w, h, nf = header.unpack(bytes(blob[: header.size]))
            digest = _hl.sha256(bytes(blob[header.size :])).digest()
            return {
                "kind": kinds.get(kind, "unknown"),
                "width": w,
                "height": h,
                "n_frames": nf,
                "feature": [b / 255.0 for b in digest[:8]],
            }

        for pdf in batches:
            decoded = [fake_decode(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "kind": [d["kind"] for d in decoded],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "n_frames": [d["n_frames"] for d in decoded],
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf[blob_col]],
                    "feature": [d["feature"] for d in decoded],
                }
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def resize_nearest(
    df: DataFrame, width: int, height: int, id_col: str = "media_id", blob_col: str = "blob"
) -> DataFrame:
    """REAL resize stage (formerly a stub): PNG in -> nearest-neighbor
    resample to (width, height) -> PNG out (filter 0), all stdlib via
    :func:`png_decode` / :func:`png_encode`. Nearest-neighbor index map
    is pure integer arithmetic — source pixel of output (x2, y2) is
    ((x2 * src_w) // width, (y2 * src_h) // height) — so the result is
    bit-deterministic and SQL-derivable for synthetic pixel content
    (catalog/media.py::media_resize's oracle). Blobs that are not
    supported PNGs pass through as NULL (the decode-stage degraded-mode
    convention).

    Scale: Arrow-batched map-only stage; output bytes are bounded by
    width * height * channels regardless of input size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def rz(blob):
            if blob is None:
                return None
            try:
                d = png_decode(bytes(blob))
            except ValueError:
                return None
            sw, sh = d["width"], d["height"]
            ch = _PNG_CHANNELS[d["color_type"]]
            px, out = d["pixels"], bytearray()
            for y2 in range(height):
                sy = (y2 * sh) // height
                for x2 in range(width):
                    sx = (x2 * sw) // width
                    o = (sy * sw + sx) * ch
                    out += px[o : o + ch]
            return png_encode(
                width, height, bytes(out), color_type=d["color_type"],
                filters=[0] * height,
            )

        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], blob_col: [rz(b) for b in pdf[blob_col]]}
            )

    return df.mapInPandas(run, schema=f"{id_col} long, {blob_col} binary")


def frame_sample_plan(df: DataFrame, every_n: int) -> DataFrame:
    """Frame-sampling as pure metadata arithmetic (no codec needed):
    which frame indexes a video decoder would emit."""
    return df.withColumn(
        "sampled_frames",
        F.when(
            F.col("n_frames") > 0,
            F.filter(
                F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0))),
                lambda i: i % every_n == 0,
            ),
        ).otherwise(F.array().cast("array<bigint>")),
    )


def encode_media(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """mapInPandas PACK stage — the writer side of the synthetic FMED
    container (inverse of decode_media; a real build swaps the packer
    for an image/audio encoder and the schema contract stays fixed).
    Expects columns: kind_code int, width int, height int, n_frames int,
    payload binary. Self-contained closure, same rationale as
    decode_media."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _st

        header = _st.Struct("<4sBHHH")
        for pdf in batches:
            blobs = [
                header.pack(b"FMED", int(k), int(w), int(h), int(nf))
                + (bytes(p) if p is not None else b"")
                for k, w, h, nf, p in zip(
                    pdf["kind_code"], pdf["width"], pdf["height"], pdf["n_frames"], pdf["payload"]
                )
            ]
            yield pd.DataFrame({"media_id": pdf[id_col].values, "blob": blobs})

    return df.mapInPandas(run, schema="media_id long, blob binary")


# ---- pure-stdlib PNG codec (zlib inflate + scanline unfilter) ----------
# Closes the "real image codec" gap without Pillow: 8-bit gray / RGB /
# RGBA, all five PNG filter types. ~Both directions are exercised by
# tests/test_media.py roundtrips and the media_decode_png gate.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib as _zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", _zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 2,
    filters: list[int] | None = None,
) -> bytes:
    """Encode raw 8-bit pixels as a spec-conformant PNG using only the
    stdlib. ``filters`` optionally forces a filter type per scanline
    (default all-0) — the fixture generator uses a cycling pattern so
    decode must genuinely unfilter, not just inflate."""
    import zlib as _zlib

    bpp = _PNG_CHANNELS[color_type]
    stride = width * bpp
    if len(pixels) != stride * height:
        raise ValueError(f"expected {stride * height} pixel bytes, got {len(pixels)}")
    prev = bytearray(stride)
    out = bytearray()
    for y in range(height):
        line = bytearray(pixels[y * stride : (y + 1) * stride])
        ft = filters[y % len(filters)] if filters else 0
        raw = bytes(line)
        if ft == 0:
            filt = raw
        elif ft == 1:  # Sub
            filt = bytes(
                (line[i] - (line[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:  # Up
            filt = bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:  # Average
            filt = bytes(
                (line[i] - (((line[i - bpp] if i >= bpp else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(stride)
            )
        elif ft == 4:  # Paeth
            filt = bytes(
                (line[i] - _paeth(line[i - bpp] if i >= bpp else 0, prev[i],
                                  prev[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        else:
            raise ValueError(f"bad filter {ft}")
        out.append(ft)
        out += filt
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(blob: bytes) -> dict:
    """Decode an 8-bit gray/RGB/RGBA PNG with the stdlib only: chunk
    walk, concatenated-IDAT zlib inflate, per-scanline unfilter (all
    five filter types). Returns {width, height, color_type, pixels};
    raises ValueError on anything that is not such a PNG (interlace,
    palette, 16-bit — the honest unsupported set)."""
    import zlib as _zlib

    b = bytes(blob)
    if b[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, width = len(_PNG_SIG), None
    idat = bytearray()
    height = color_type = None
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + tag + body + crc
        if tag == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in _PNG_CHANNELS or interlace:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    raw = _zlib.decompress(bytes(idat))
    bpp = _PNG_CHANNELS[color_type]
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise ValueError("bad scanline payload")
    prev = bytearray(stride)
    pixels = bytearray()
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft == 1:
            for i in range(stride):
                line[i] = (line[i] + (line[i - bpp] if i >= bpp else 0)) & 0xFF
        elif ft == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:
            for i in range(stride):
                line[i] = (
                    line[i] + (((line[i - bpp] if i >= bpp else 0) + prev[i]) >> 1)
                ) & 0xFF
        elif ft == 4:
            for i in range(stride):
                line[i] = (
                    line[i]
                    + _paeth(line[i - bpp] if i >= bpp else 0, prev[i],
                             prev[i - bpp] if i >= bpp else 0)
                ) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad filter byte {ft}")
        pixels += line
        prev = line
    return {"width": width, "height": height, "color_type": color_type, "pixels": bytes(pixels)}


def decode_media_real(df: DataFrame, id_col: str = "media_id", blob_col: str = "blob") -> DataFrame:
    """REAL-codec decode stage (the production adapter the fake stands in
    for): same mapInPandas shape and DECODED_SCHEMA contract as
    decode_media, with per-blob container sniffing:

    - RIFF/WAVE  -> stdlib ``wave`` (always available — this leg is real
      and tested in this container): width=sample rate, height=bits per
      sample x channels, n_frames=frame count, feature=sha256 sketch of
      the raw sample bytes.
    - PNG        -> Pillow when installed, else the pure-stdlib
      :func:`png_decode` (zlib inflate + unfilter) — REAL pixels either
      way; the two agree byte-for-byte on the supported 8-bit
      gray/RGB/RGBA set (tests/test_media.py).
    - JPEG       -> Pillow, IMPORT-GUARDED: absent (as in this
      container) the blob reports kind='unknown' rather than failing
      the stage — the honest degraded mode (a DCT decoder is out of
      scope for stdlib).
    - FMED       -> the synthetic fallback (same parse as decode_media),
      so pipelines mixing fixture and real blobs decode uniformly.

    The gated `media_decode` query stays on the synthetic path (its
    oracle reproduces FMED in SQL); this stage is the swap-in adapter."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl
        import io as _io
        import struct as _st
        import wave as _wave

        try:  # import-guarded image codec: optional by design
            from PIL import Image as _Image  # type: ignore
        except ImportError:
            _Image = None

        header = _st.Struct("<4sBHHH")
        kinds = {0: "image", 1: "audio", 2: "video"}
        unknown = {"kind": "unknown", "width": 0, "height": 0, "n_frames": 0, "feature": None}

        def sketch(raw: bytes) -> list[float]:
            return [b / 255.0 for b in _hl.sha256(raw).digest()[:8]]

        def dec(blob) -> dict:
            if blob is None or len(blob) < 12:
                return unknown
            b = bytes(blob)
            if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                try:
                    with _wave.open(_io.BytesIO(b)) as w:
                        frames = w.readframes(w.getnframes())
                        return {
                            "kind": "audio",
                            "width": w.getframerate(),
                            "height": 8 * w.getsampwidth() * w.getnchannels(),
                            "n_frames": w.getnframes(),
                            "feature": sketch(frames),
                        }
                except _wave.Error:
                    return unknown
            if b[:8] == b"\x89PNG\r\n\x1a\n":
                if _Image is not None:
                    with _Image.open(_io.BytesIO(b)) as im:
                        return {
                            "kind": "image",
                            "width": im.width,
                            "height": im.height,
                            "n_frames": getattr(im, "n_frames", 1),
                            "feature": sketch(im.tobytes()),
                        }
                # stdlib fallback: real inflate + unfilter (agrees with
                # Pillow byte-for-byte on 8-bit gray/RGB/RGBA)
                from flod_spark.functions.media import png_decode as _png_decode

                try:
                    d = _png_decode(b)
                except ValueError:
                    return unknown  # interlace/palette/16-bit variant
                return {
                    "kind": "image",
                    "width": d["width"],
                    "height": d["height"],
                    "n_frames": 1,
                    "feature": sketch(d["pixels"]),
                }
            if b[:3] == b"\xff\xd8\xff":
                if _Image is None:
                    return unknown  # no JPEG codec in this build
                with _Image.open(_io.BytesIO(b)) as im:
                    return {
                        "kind": "image",
                        "width": im.width,
                        "height": im.height,
                        "n_frames": getattr(im, "n_frames", 1),
                        "feature": sketch(im.tobytes()),
                    }
            if b[:4] == MAGIC:
                _, kind, w, h, nf = header.unpack(b[: header.size])
                return {
                    "kind": kinds.get(kind, "unknown"),
                    "width": w,
                    "height": h,
                    "n_frames": nf,
                    "feature": sketch(b[header.size :]),
                }
            return unknown

        for pdf in batches:
            decoded = [dec(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "kind": [d["kind"] for d in decoded],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "n_frames": [d["n_frames"] for d in decoded],
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf[blob_col]],
                    "feature": [d["feature"] for d in decoded],
                }
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)
