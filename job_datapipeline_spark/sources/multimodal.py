"""Multimodal columns: images/audio/video as opaque binary columns with
typed metadata (BASELINE north-star surface).

Model: a blob is a row — ``binaryFile`` source yields (path,
modificationTime, length, content: binary). Everything cheap happens
JVM-side (md5 content fingerprint, length, name/extension parsing,
dedup-by-content); per-byte decoding is the ONLY Python stage, Arrow-
batched through ``mapInPandas`` exactly like the HTML surface.

At 100 TB: blobs are read with a path glob + partition-pruned manifest,
content dedup is a hash-aggregate on the 32-byte md5 (never on content),
and the decode stage is embarrassingly parallel with per-partition decoder
reuse. Spark never shuffles raw bytes — dedup/grouping keys are
fingerprints; joins against metadata broadcast.

STUBS: real image/audio codecs are not available in this environment, so
``decode_image_features`` ships with a deterministic fake decoder for a
toy header format (clearly marked; swap in a real decoder callable), and
``sample_video_frames`` raises NotImplementedError unless a decoder is
injected. The Spark-side plumbing — schemas, UDF signatures, Arrow batch
shapes, partitioning — is real and tested.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..deploy import ensure_shipped
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def read_binary_dir(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Blob source: one row per file with (path, modificationTime, length,
    content). ``glob`` filters by filename pattern at the listing, so
    non-matching files are never opened."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def with_blob_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed metadata struct per blob, all JVM-side: file name, extension
    (the cheap modality signal), byte length, md5 content fingerprint."""
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    ext = F.lower(F.element_at(F.split(name, r"\."), -1))
    return df.withColumn(
        "meta",
        F.struct(
            name.alias("file_name"),
            ext.alias("extension"),
            F.col("length").alias("n_bytes"),
            F.md5(F.col(content_col)).alias("content_md5"),
        ),
    )


def dedup_blobs(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Exact content dedup: keep the lexicographically-first path per md5
    fingerprint. The group key is the 32-byte hash — content never rides
    the shuffle wire."""
    return (
        df.withColumn("content_md5", F.md5(F.col(content_col)))
        .groupBy("content_md5")
        .agg(F.min("path").alias("path"), F.count("*").alias("copies"))
    )


# ---------------------------------------------------------------------------
# Decode stage (the Python boundary)
# ---------------------------------------------------------------------------

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)

# A decoder maps raw bytes -> (width, height, format, feature vector) or
# None when undecodable. Swap in a real one (PIL/libvips/ffmpeg) in an
# environment that has it.
Decoder = Callable[[bytes], "tuple[int, int, str, list[float]] | None"]

_FAKE_MAGIC = b"FAKEIMG\x00"


def fake_image_decoder(content: bytes) -> tuple[int, int, str, list[float]] | None:
    """DETERMINISTIC FAKE DECODER (stub). Parses the toy fixture format
    ``FAKEIMG\\x00 | u16be width | u16be height | payload`` and emits an
    8-bin normalized byte histogram as the feature vector. It exists so the
    decode stage's plumbing is executable and testable here; it is NOT an
    image codec."""
    if not content or not content.startswith(_FAKE_MAGIC):
        return None
    w, h = struct.unpack(">HH", content[8:12])
    payload = content[12:]
    bins = [0] * 8
    for b in payload:
        bins[b >> 5] += 1
    total = max(len(payload), 1)
    return w, h, "fakeimg", [round(c / total, 6) for c in bins]


def decode_image_features(
    df: DataFrame,
    decoder: Decoder = fake_image_decoder,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """The decode/feature-extract stage: binary rows -> (path, width,
    height, format, features). One Arrow-batched Python stage; undecodable
    blobs yield a row with null dimensions (auditable, never silently
    dropped)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                decoded = decoder(bytes(content) if content is not None else b"")
                if decoded is None:
                    rows.append({"path": path, "width": None, "height": None,
                                 "format": None, "features": None})
                else:
                    w, h, fmt, feats = decoded
                    rows.append({"path": path, "width": w, "height": h,
                                 "format": fmt, "features": feats})
            yield pd.DataFrame(rows, columns=["path", "width", "height", "format", "features"])

    ensure_shipped(df.sparkSession)
    return df.mapInPandas(gen, IMAGE_FEATURES_SCHEMA)


VIDEO_FRAMES_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_features", ArrayType(DoubleType())),
    ]
)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 30,
    frame_decoder: Callable[[bytes, int], list] | None = None,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Frame-sampling stage shape (one row per sampled frame). STUB: no
    video codec ships in this environment — raises unless a
    ``frame_decoder(content, every_n) -> [(idx, features), ...]`` is
    injected. The schema, fan-out shape, and batching are the real
    contract a codec-equipped deployment plugs into."""
    if frame_decoder is None:
        raise NotImplementedError(
            "no video codec in this environment; inject frame_decoder "
            "(e.g. an ffmpeg/pyav-backed callable) to enable frame sampling"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                for idx, feats in frame_decoder(bytes(content), every_n):
                    rows.append({"path": path, "frame_index": idx, "frame_features": feats})
            yield pd.DataFrame(rows, columns=["path", "frame_index", "frame_features"])

    ensure_shipped(df.sparkSession)
    return df.mapInPandas(gen, VIDEO_FRAMES_SCHEMA)
