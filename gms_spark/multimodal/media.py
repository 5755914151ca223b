"""Multimodal columns: opaque binary media + typed metadata.

Design for a 100 TB multimodal corpus: media payloads are opaque
``binary`` columns with typed metadata alongside (media_type, width,
height, duration_ms, codec); decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so bytes move
JVM→Python once per batch, never per row.

The image/audio codec libraries are NOT in this container, so the codec
call itself is stubbed: ``decode_media(..., codec="real")`` raises
NotImplementedError at the exact seam where PIL/ffmpeg would plug in,
and ``codec="fake"`` is a deterministic stand-in (bytes → pseudo-pixel
stats) so the Spark-side plumbing — schema, batching, partitioning, UDF
signatures — is real and fully tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("codec", StringType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def synth_media(spark, n: int, seed: int = 3) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(seed * 1_000_003 + i)
                size = 64 + (i * 37) % 192
                rows.append(
                    {
                        "media_id": i,
                        "media_type": ["image", "audio", "video"][i % 3],
                        "payload": rng.integers(0, 256, size, dtype=np.uint8).tobytes(),
                        "width": 16 + i % 64,
                        "height": 16 + (i * 7) % 64,
                        "duration_ms": 1000 + (i * 113) % 9000,
                        "codec": "fake",
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, 4).mapInPandas(gen, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real image decode: byte histogram stats."""
    a = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    return np.array([a.mean(), a.std(), a.min(), a.max(), float(width * height)])


# ---- pure-numpy container codecs -------------------------------------
# Real byte-level decoders for two trivial containers (binary PPM P6
# images, PCM16 WAV audio) so the decode path runs END-TO-END in CI with
# no external libraries: payload bytes → pixel/sample arrays → features.
# PIL/ffmpeg remain the codec="real" seam for everything else.


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6) bytes."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("PPM P6 is 3-channel RGB")
    return f"P6\n{w} {h}\n255\n".encode() + np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → (h, w, 3) uint8. Handles '#' comment
    lines and arbitrary whitespace in the header, maxval 255 only."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 whitespace-separated ints, '#'-comments allowed
    vals, pos = [], 2
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"only maxval 255 PPM supported, got {maxval}")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples → PCM16 WAV (RIFF) bytes."""
    import struct

    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV bytes → (int16 sample array, sample rate). Walks the
    RIFF chunk list, so extra chunks (LIST, fact) are tolerated."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_tag != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM16 mono WAV supported")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return data, rate


def _numpy_decode(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch → 5 features, from DECODED values (pixels /
    samples), not raw container bytes."""
    if payload[:2] == b"P6":
        px = decode_ppm(payload).astype(np.float64)
        return np.array([px.mean(), px.std(), px.min(), px.max(), float(px.shape[0] * px.shape[1])])
    if payload[:4] == b"RIFF":
        samples, rate = decode_wav(payload)
        s = samples.astype(np.float64)
        return np.array([s.mean(), s.std(), s.min(), s.max(), float(len(s))])
    raise ValueError("unrecognized container (numpy codec handles PPM P6 and PCM16 WAV)")


def synth_encoded_media(spark, n: int, seed: int = 3) -> DataFrame:
    """Deterministic media table whose payloads are REAL container bytes
    (even media_id → PPM image, odd → WAV audio) so the decode path can
    be exercised end-to-end."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(seed * 1_000_003 + i)
                if i % 2 == 0:
                    w, h = 8 + i % 24, 8 + (i * 7) % 24
                    payload = encode_ppm(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
                    row = ("image", payload, w, h, 0)
                else:
                    k = 256 + (i * 37) % 512
                    payload = encode_wav(rng.integers(-3000, 3000, k).astype(np.int16))
                    row = ("audio", payload, 0, 0, int(k * 1000 / 16000))
                rows.append(dict(zip(
                    ["media_id", "media_type", "payload", "width", "height", "duration_ms", "codec"],
                    (i, *row, "numpy"),
                )))
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, 4).mapInPandas(gen, MEDIA_SCHEMA)


def synth_lcg_media(spark, n: int, seed: int = 3) -> DataFrame:
    """Media table whose payloads are real container bytes with
    ENGINE-REPLAYABLE content: every pixel/sample is the engine-wide LCG
    mix (the same int64 arithmetic contract as the MinHash coefficients
    and coloring draws), so a SQL oracle can recompute the decoded
    values analytically — this is what lets the `media_decode` driver
    query be hash-checked end-to-end THROUGH the codec seam, not just
    row-counted. Even media_id → PPM P6 image, odd → PCM16 WAV.

    Value contract (flat index j over the decoded array):
      image pixel  v = mix(i, j) % 256                  (uint8)
      audio sample s = mix(i, j) % 4001 - 2000          (int16)
    with mix(i, j) = ((i % P)·A + j·C + seed·B % P) % P.
    """
    from gms_spark.graph.coloring import ARITH_A, ARITH_B, ARITH_C, ARITH_P

    salt = seed * ARITH_B % ARITH_P

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)

                def mix(count: int) -> np.ndarray:
                    j = np.arange(count, dtype=np.int64)
                    return ((i % ARITH_P) * ARITH_A + j * ARITH_C + salt) % ARITH_P

                if i % 2 == 0:
                    w, h = 8 + i % 24, 8 + (i * 7) % 24
                    px = (mix(w * h * 3) % 256).astype(np.uint8).reshape(h, w, 3)
                    row = ("image", encode_ppm(px), w, h, 0)
                else:
                    k = 256 + (i * 37) % 512
                    s = (mix(k) % 4001 - 2000).astype(np.int16)
                    row = ("audio", encode_wav(s), 0, 0, int(k * 1000 / 16000))
                rows.append(dict(zip(
                    ["media_id", "media_type", "payload", "width", "height", "duration_ms", "codec"],
                    (i, *row, "numpy"),
                )))
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, 4).mapInPandas(gen, MEDIA_SCHEMA)


CHECKSUM_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_values", LongType()),
        StructField("value_sum", LongType()),
        StructField("value_min", LongType()),
        StructField("value_max", LongType()),
    ]
)


def media_checksums(media: DataFrame) -> DataFrame:
    """Decode every payload (magic-byte dispatch, pure-numpy codecs) and
    reduce the DECODED values to exact integer stats — the hash-checkable
    twin of `decode_media` (float features can't hash-match across
    engines; int64 sums can). Arrow-batched like every media stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "n_values": [], "value_sum": [], "value_min": [], "value_max": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload[:2] == b"P6":
                    vals = decode_ppm(payload).astype(np.int64).ravel()
                else:
                    vals = decode_wav(payload)[0].astype(np.int64)
                out["media_id"].append(int(mid))
                out["n_values"].append(int(vals.size))
                out["value_sum"].append(int(vals.sum()))
                out["value_min"].append(int(vals.min()))
                out["value_max"].append(int(vals.max()))
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(run, CHECKSUM_SCHEMA)


def decode_media(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Media → fixed-width feature vectors, Arrow-batched.

    ``codec="numpy"`` really decodes (pure-numpy PPM/WAV byte parsers,
    magic-byte dispatch); ``codec="fake"`` is the deterministic
    stand-in; ``codec="real"`` is the PIL/ffmpeg seam — intentionally
    NotImplementedError in this container.
    """
    if codec == "real":
        raise NotImplementedError(
            "real codecs (PIL/ffmpeg) are not installed in this container; "
            "plug the decoder in here — the surrounding Spark plumbing is final"
        )
    decode = _numpy_decode if codec == "numpy" else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode is not None:
                feats = [decode(p) for p in pdf["payload"]]
            else:
                feats = [
                    _fake_decode(p, w, h)
                    for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.select("media_id", "payload", "width", "height").mapInPandas(run, FEATURES_SCHEMA)


def resize_ppm(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor (floor-map) resize of an (h, w, 3) uint8 image:
    ``out[y, x] = in[(y*h)//out_h, (x*w)//out_w]``. Pure index selection —
    deterministic and integer-exact, so a SQL oracle can replay the map."""
    h, w, _ = pixels.shape
    sy = (np.arange(out_h, dtype=np.int64) * h) // out_h
    sx = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return pixels[sy][:, sx]


def resize_media(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize every image payload to (out_w, out_h), nearest-neighbor;
    non-image rows pass through untouched. Output keeps MEDIA_SCHEMA
    (payload re-encoded PPM, width/height updated), so the stage composes
    with `media_checksums` / `decode_media` like any other media table.
    Arrow-batched mapInPandas: bytes cross JVM→Python once per batch, and
    the stage is embarrassingly parallel — no shuffle, partitioning
    inherited from the input scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            payloads, widths, heights = [], [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                if bytes(payload[:2]) == b"P6":
                    px = resize_ppm(decode_ppm(bytes(payload)), out_w, out_h)
                    payloads.append(encode_ppm(px))
                    widths.append(out_w)
                    heights.append(out_h)
                else:
                    payloads.append(payload)
                    widths.append(w)
                    heights.append(h)
            pdf["payload"], pdf["width"], pdf["height"] = payloads, widths, heights
            yield pdf

    return media.mapInPandas(run, MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → (media_id, frame_idx, frame_ts_ms) sampling plan, JVM-side.

    The decode of each sampled frame is the same stubbed codec seam; the
    *plan* (which frames, partitioned how) is real: explode a sequence —
    no Python involved.
    """
    return (
        media.where(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), (F.col("duration_ms") / every_ms).cast("int"))).alias("frame_idx"),
        )
        .select("media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("frame_ts_ms"))
    )
