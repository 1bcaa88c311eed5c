"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata (SURVEY graft requirement).

The container ships no image/audio libs, so the *decode* step is stubbed:
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic byte-hash "decoder" stands in. Everything Spark-side
— schema, Arrow batch shape, mapInPandas signatures, partition behavior —
is real and tested; swapping the fake for PIL/ffmpeg is a one-function
change inside the UDF.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta_w", IntegerType()),
        StructField("meta_h", IntegerType()),
        StructField("meta_ms", IntegerType()),
    ]
)

FEATURES = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

FRAMES = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)

FEATURE_DIM = 16


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real decode needs PIL/libjpeg (absent in this container).
    fake=True → deterministic pseudo-decode from the byte hash."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    h = hashlib.sha256(payload).digest()
    return np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4],
                         dtype=np.uint8).astype(np.float32).reshape(FEATURE_DIM, 4)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """media → per-item feature vector. mapInPandas: Arrow batches of
    binary payloads in, fixed-dim float arrays out — the exact shape a
    real embedding model stage has."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            feats = [
                decode_image(p, fake=fake).mean(axis=1).round(3).tolist()
                if p is not None
                else None
                for p in b["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in b["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(gen, schema=FEATURES)


def sample_frames(media: DataFrame, every_bytes: int = 256, max_frames: int = 8) -> DataFrame:
    """video → frame rows (1→N). Deterministic fake "frame sampler":
    fixed-size byte windows; the 1→N mapInPandas shape matches a real
    ffmpeg-based sampler."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            rows = []
            for mid, kind, payload in zip(b["media_id"], b["kind"], b["payload"]):
                if kind != "video" or payload is None:
                    continue
                for i in range(min(max_frames, max(1, len(payload) // every_bytes))):
                    rows.append((int(mid), i, bytes(payload[i * every_bytes:(i + 1) * every_bytes])))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return media.mapInPandas(gen, schema=FRAMES)


def media_metadata(media: DataFrame) -> DataFrame:
    """Pure-Catalyst metadata projection: magic-byte sniff + sizes.
    No UDF — stays in whole-stage codegen."""
    magic = F.hex(F.substring("payload", 1, 4))
    return media.select(
        "media_id",
        "kind",
        F.length("payload").alias("n_bytes"),
        magic.alias("magic_hex"),
        F.when(magic == F.lit("89504E47"), "png")
        .when(magic.startswith("FFD8"), "jpeg")
        .otherwise("unknown")
        .alias("sniffed"),
        (F.col("meta_w") * F.col("meta_h")).alias("pixels"),
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (seeded bytes)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        base = hashlib.sha256(f"media-{i}".encode()).digest()
        payload = (base * (4 + i % 5))[: 128 + (i * 37) % 2048]
        if kind == "image" and i % 2 == 0:
            payload = b"\x89PNG\r\n\x1a\n" + payload
        rows.append((i, kind, payload, 64 + i, 48 + i, 1000 * (1 + i % 7)))
    return spark.createDataFrame(rows, MEDIA)
