"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The crawl engine's media spans carry ``media_ref`` URIs. A production
pipeline materializes those refs into binary columns and runs decode /
feature-extract / resize / frame-sample stages over ``mapInPandas``. The
image/audio codec libraries are NOT in this container, so the decode step
is a deterministic fake behind ``decode_stub`` — but everything Spark-side
(schema, Arrow batching, partitioning, output shape) is real and tested.

Schema contract:
    media(media_ref string, kind string, payload binary,
          meta struct<width:int, height:int, duration_ms:int>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, StringType, StructField, StructType, ArrayType, FloatType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Extract media refs from span arrays into a media work-list."""
    return (
        docs.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
        .withColumn(
            "kind",
            F.when(F.col("media_ref").endswith(".png"), "image").otherwise("audio"),
        )
    )


def fetch_payload_stub(media: DataFrame) -> DataFrame:
    """Materialize deterministic fake payloads (pure function of the ref).
    A real deployment replaces the batch body with an object-store read;
    partitioning/batching stays identical."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                h = hashlib.blake2b(r.media_ref.encode(), digest_size=32).digest()
                rows.append(
                    {
                        "media_ref": r.media_ref,
                        "kind": r.kind,
                        "payload": h * 4,  # 128 deterministic bytes
                        "width": 16 + h[0] % 64 if r.kind == "image" else None,
                        "height": 16 + h[1] % 64 if r.kind == "image" else None,
                        "duration_ms": 1000 + h[2] * 37 if r.kind == "audio" else None,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields]
            )

    return media.mapInPandas(gen, MEDIA_SCHEMA)


def decode_stub(payload: bytes, kind: str) -> list[float]:
    """STUB: real image/audio decoding needs codec libs not present in
    this container. Deterministic fake feature: normalized byte histogram
    over 8 buckets. Replace the body with PIL/librosa in production —
    the Spark plumbing around it is unchanged."""
    if payload is None:
        raise NotImplementedError("no payload; real decode needs codec libs")
    buckets = [0] * 8
    for b in payload:
        buckets[b % 8] += 1
    total = float(len(payload)) or 1.0
    return [round(c / total, 6) for c in buckets]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the (stub) decoder."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "feature": [
                        decode_stub(p, k)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(gen, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("t_ms", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def resize_images(media: DataFrame, target: int = 32) -> DataFrame:
    """Resize stage for image payloads. STUB decode: a real deployment
    swaps the body for PIL's ``Image.resize`` — here the deterministic
    fake "resamples" the payload to target*target/64 bytes so output
    sizes, schema, and Arrow batch shapes match a real resizer."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = max(1, target * target // 64)
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                p = bytes(r.payload)
                step = max(1, len(p) // n_out)
                rows.append(
                    {
                        "media_ref": r.media_ref,
                        "payload": p[::step][:n_out],
                        "width": target,
                        "height": target,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.where(F.col("kind") == "image").mapInPandas(gen, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """Frame-sampling stage for audio/video payloads: one output row per
    sampled timestamp (a fan-out mapInPandas — batch in, more rows out).
    STUB decode: deterministic byte-slice per frame; a real deployment
    uses pyav/ffmpeg inside the same iterator."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                dur = int(r.duration_ms or 0)
                n = min(max_frames, max(1, dur // every_ms))
                p = bytes(r.payload)
                for i in range(n):
                    rows.append(
                        {
                            "media_ref": r.media_ref,
                            "frame_idx": i,
                            "t_ms": i * every_ms,
                            "frame": p[i % max(1, len(p)):][:16],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.where(F.col("kind") == "audio").mapInPandas(gen, FRAME_SCHEMA)
