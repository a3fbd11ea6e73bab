"""Multimodal (image/audio/video) column operators.

Representation: opaque ``binary`` payload column + typed metadata struct
(format, width/height or sample_rate/duration, codec). The Spark-side
plumbing — schema, partition sizing, Arrow batch shape, mapInPandas
signatures — is real and tested; the actual media decode is STUBBED
(`decode_stub=True` produces deterministic fake features; decode_stub=False
raises NotImplementedError) because no image/audio libraries ship in this
environment. Swapping in PIL/torchaudio later only changes the inner
function body.

Scale notes: media blobs make rows heavy — mapInPandas with
spark.sql.execution.arrow.maxRecordsPerBatch tuned low keeps Arrow batches
bounded; never collect; feature extraction is embarrassingly parallel
(narrow), so the only shuffle is whatever analysis follows.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame as SDF
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

AUDIO_META = T.StructType(
    [
        T.StructField("codec", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)


def attach_image_meta(df: SDF, bin_col: str = "payload") -> SDF:
    """Parse cheap header fields from the binary (stub: derive deterministic
    metadata from content hash so the pipeline is testable end-to-end)."""
    h = F.crc32(F.col(bin_col))
    return df.withColumn(
        "meta",
        F.struct(
            F.lit("png").alias("format"),
            (F.pmod(h, F.lit(1920)) + 32).cast("int").alias("width"),
            (F.pmod(F.shiftright(h, 8), F.lit(1080)) + 32).cast("int").alias("height"),
        ),
    )


def _fake_embedding(data: bytes, dim: int) -> np.ndarray:
    """Deterministic fake feature vector from content bytes."""
    dg = hashlib.sha256(data or b"").digest()
    rng = np.random.default_rng(int.from_bytes(dg[:8], "little"))
    return rng.standard_normal(dim).astype(np.float32)


def image_features(df: SDF, bin_col: str = "payload", dim: int = 64, decode_stub: bool = True) -> SDF:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    Output schema: input columns + feature array<float>. The mapInPandas
    shape (iterator of pandas batches) is the real contract a PIL/torch
    implementation drops into.
    """
    out_schema = T.StructType(df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()))])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub:
                feats = [_fake_embedding(b, dim).tolist() for b in pdf[bin_col]]
            else:
                raise NotImplementedError("real image decode requires PIL/cv2 (not in this environment)")
            yield pdf.assign(features=feats)

    return df.mapInPandas(extract, out_schema)


def audio_features(df: SDF, bin_col: str = "payload", dim: int = 32, decode_stub: bool = True) -> SDF:
    """Audio decode + feature extraction (MFCC-shaped) via mapInPandas.
    Same batch contract as image_features; real impl would use torchaudio."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("audio_features", T.ArrayType(T.FloatType()))])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub:
                feats = [_fake_embedding(b, dim).tolist() for b in pdf[bin_col]]
            else:
                raise NotImplementedError("real audio decode requires torchaudio/librosa (not in this environment)")
            yield pdf.assign(audio_features=feats)

    return df.mapInPandas(extract, out_schema)


def resize_images(df: SDF, bin_col: str = "payload", size: tuple[int, int] = (224, 224), decode_stub: bool = True) -> SDF:
    """Resize stub: passes payload through, rewrites meta dims (real impl
    would re-encode); keeps the operator signature and plan shape honest."""
    if not decode_stub:
        raise NotImplementedError("real resize requires an image library")
    df = attach_image_meta(df, bin_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.format").alias("format"),
            F.lit(size[0]).cast("int").alias("width"),
            F.lit(size[1]).cast("int").alias("height"),
        ),
    )


def sample_frames(df: SDF, bin_col: str = "payload", every_n: int = 10, decode_stub: bool = True) -> SDF:
    """Video frame sampling stub: emits (frame_idx, frame_payload) rows via
    posexplode of deterministic frame splits — the explode/partition shape
    of a real ffmpeg-backed splitter."""
    if not decode_stub:
        raise NotImplementedError("real frame sampling requires ffmpeg bindings")
    n_frames = (F.crc32(F.col(bin_col)) % 50 + 1).cast("int")
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    exploded = df.withColumn("frame_idx", F.explode(idx))
    return exploded.withColumn("frame_payload", F.sha2(F.concat(F.col(bin_col), F.col("frame_idx").cast("binary")), 256).cast("binary"))


def make_synthetic_media(spark, n: int = 100, seed: int = 42) -> SDF:
    """Deterministic synthetic binary table for tests (no media libs needed)."""
    rows = []
    rng = np.random.default_rng(seed)
    for i in range(n):
        rows.append((i, bytes(rng.integers(0, 256, size=64, dtype=np.uint8).tolist())))
    return spark.createDataFrame(rows, T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]))
