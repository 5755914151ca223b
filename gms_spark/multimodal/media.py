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


def decode_media(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Media → fixed-width feature vectors, Arrow-batched.

    ``codec="real"`` is the PIL/ffmpeg seam — intentionally
    NotImplementedError in this container.
    """
    if codec == "real":
        raise NotImplementedError(
            "real codecs (PIL/ffmpeg) are not installed in this container; "
            "plug the decoder in here — the surrounding Spark plumbing is final"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
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
