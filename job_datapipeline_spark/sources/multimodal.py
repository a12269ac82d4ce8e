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

Decoders: ``real_image_decoder`` is the production seam — PIL when
importable (not in this container), with a REAL dependency-free BMP codec
(``bmp_image_decoder``: actual format parsing — header, bottom-up rows,
stride padding) always available, and the deterministic FAKEIMG toy format
kept for plumbing tests. Video mirrors the same pattern:
``real_video_frame_decoder`` probes pyav and the ffmpeg CLI once at
import and falls back to the deterministic toy container; with no codec
in the environment an undecodable blob yields an auditable null row, not
an error. The Spark-side plumbing — schemas, UDF signatures, Arrow batch
shapes, partitioning — is real and tested either way.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..deploy import ensure_shipped
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
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


def bmp_image_decoder(content: bytes) -> tuple[int, int, str, list[float]] | None:
    """REAL codec path, dependency-free: uncompressed 24/32-bit BI_RGB
    Windows BMP (BITMAPINFOHEADER). Parses the actual file format —
    magic, pixel-array offset, dimensions, bottom-up row order, 4-byte row
    padding — with stdlib ``struct`` + numpy, and emits the same feature
    contract as the other decoders: an 8-bin normalized luminance
    histogram. Anything that is not a plain BI_RGB BMP returns None (the
    auditable undecodable-row path), it never raises."""
    if len(content) < 54 or content[:2] != b"BM":
        return None
    try:
        pixel_offset = struct.unpack_from("<I", content, 10)[0]
        header_size = struct.unpack_from("<I", content, 14)[0]
        if header_size < 40:  # BITMAPCOREHEADER etc. — out of scope
            return None
        width, height = struct.unpack_from("<ii", content, 18)
        planes, bpp = struct.unpack_from("<HH", content, 26)
        compression = struct.unpack_from("<I", content, 30)[0]
        if planes != 1 or bpp not in (24, 32) or compression != 0:
            return None
        if width <= 0 or height == 0:
            return None
        top_down = height < 0
        height = abs(height)
        channels = bpp // 8
        stride = (width * channels + 3) // 4 * 4
        need = pixel_offset + stride * height
        if len(content) < need:
            return None
        raw = np.frombuffer(content, dtype=np.uint8, count=stride * height, offset=pixel_offset)
        rows = raw.reshape(height, stride)[:, : width * channels].reshape(height, width, channels)
        if not top_down:
            rows = rows[::-1]  # BMP stores bottom-up
        b, g, r = rows[..., 0].astype(np.float64), rows[..., 1].astype(np.float64), rows[..., 2].astype(np.float64)
        lum = (0.299 * r + 0.587 * g + 0.114 * b).astype(np.uint8)
        bins = np.bincount(lum.ravel() >> 5, minlength=8)
        total = max(lum.size, 1)
        return width, height, "bmp", [round(float(c) / total, 6) for c in bins]
    except (struct.error, ValueError):
        return None


try:  # probed ONCE at import: a failed `from PIL import ...` inside the
    # per-row decode loop would re-scan sys.path for every blob
    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None


def pil_image_decoder(content: bytes) -> tuple[int, int, str, list[float]] | None:
    """PIL-backed decoder (png/jpeg/gif/...), selected only when Pillow is
    importable — this container ships no image libs, so the import is
    gated, not assumed. Same feature contract: 8-bin luminance histogram."""
    if _PILImage is None:
        return None
    Image = _PILImage
    import io

    try:
        with Image.open(io.BytesIO(content)) as im:
            fmt = (im.format or "unknown").lower()
            gray = np.asarray(im.convert("L"), dtype=np.uint8)
            bins = np.bincount(gray.ravel() >> 5, minlength=8)
            total = max(gray.size, 1)
            return im.width, im.height, fmt, [round(float(c) / total, 6) for c in bins]
    except Exception:  # noqa: BLE001 — undecodable blob -> auditable null row
        return None


def real_image_decoder(content: bytes) -> tuple[int, int, str, list[float]] | None:
    """The production decoder seam: the dependency-free BMP codec first
    (deterministic uint8-truncation luminance — PIL's convert('L') ROUNDS,
    so letting PIL grab BMPs would make features environment-dependent),
    then PIL for every other format when importable, then the FAKEIMG test
    format — one decoder handles real fixtures and synthetic ones alike."""
    for dec in (bmp_image_decoder, pil_image_decoder, fake_image_decoder):
        out = dec(content)
        if out is not None:
            return out
    return None


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


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("format", StringType()),
        StructField("rms", DoubleType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def wav_audio_decoder(
    content: bytes,
) -> "tuple[int, int, int, str, float, list[float]] | None":
    """REAL audio codec path, dependency-free: 16-bit PCM WAV via stdlib
    ``wave`` + numpy. Emits (channels, rate, frames, 'wav', rms,
    8-bin |amplitude| histogram); rms is normalized to [0, 1] by the int16
    full scale. The squared-sample sum is exact int64 arithmetic, so the
    value is bit-stable across numpy versions and replayable by a plain
    python accumulation (the golden-oracle property every decoder here
    keeps). Non-PCM16/RIFF content returns None, never raises."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(content), "rb") as w:
            if w.getsampwidth() != 2 or w.getcomptype() != "NONE":
                return None
            nch, rate, nframes = w.getnchannels(), w.getframerate(), w.getnframes()
            raw = w.readframes(nframes)
    except (wave.Error, EOFError):
        return None
    samples = np.frombuffer(raw, dtype="<i2")
    if samples.size == 0:
        return nch, rate, 0, "wav", 0.0, [0.0] * 8
    sq = int(np.sum(samples.astype(np.int64) ** 2))
    rms = (sq / samples.size) ** 0.5 / 32768.0
    mag = np.abs(samples.astype(np.int32))
    bins = np.bincount(np.minimum(mag >> 12, 7), minlength=8)
    return (
        nch,
        rate,
        nframes,
        "wav",
        round(float(rms), 6),
        [round(float(c) / samples.size, 6) for c in bins],
    )


AudioDecoder = Callable[[bytes], "tuple[int, int, int, str, float, list[float]] | None"]


def decode_audio_features(
    df: DataFrame,
    decoder: AudioDecoder = wav_audio_decoder,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Audio twin of ``decode_image_features``: binary rows -> (path,
    n_channels, sample_rate, n_samples, format, rms, features), one
    Arrow-batched Python stage; undecodable blobs keep their row with null
    metadata (auditable, never silently dropped)."""

    cols = ["path", "n_channels", "sample_rate", "n_samples", "format", "rms", "features"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                decoded = decoder(bytes(content) if content is not None else b"")
                if decoded is None:
                    rows.append(dict.fromkeys(cols) | {"path": path})
                else:
                    nch, rate, n, fmt, rms, feats = decoded
                    rows.append(
                        {
                            "path": path,
                            "n_channels": nch,
                            "sample_rate": rate,
                            "n_samples": n,
                            "format": fmt,
                            "rms": rms,
                            "features": feats,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    ensure_shipped(df.sparkSession)
    return df.mapInPandas(gen, AUDIO_FEATURES_SCHEMA)


AUDIO_ENERGY_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("win", LongType()),
        StructField("energy", LongType()),
    ]
)


def audio_energy_windows(
    df: DataFrame,
    window: int = 160,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Per-window audio energy — the front half of every energy-threshold
    VAD (voice-activity detection) pass over a speech corpus: 16-bit PCM
    WAV bytes -> fixed-size sample windows -> EXACT int64 sum of squared
    samples per window, one Arrow-batched Python stage (the only place
    bytes are touched); thresholding and segment assembly stay JVM-side
    on the (path, win, energy) rows.  Trailing partial windows are kept
    (their energy sums fewer samples).  Undecodable or non-MONO blobs emit no rows —
    blob-level auditing is ``decode_audio_features``'s job.  Exactness:
    |int16|^2 * window <= 2^31 * 2^8 per window, far inside int64, so
    the energies replay bit-identically in any engine or a plain python
    accumulation (the golden-oracle property every decoder here keeps)."""
    import io
    import wave

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                try:
                    with wave.open(
                        io.BytesIO(bytes(content) if content is not None else b""),
                        "rb",
                    ) as w:
                        if (
                            w.getsampwidth() != 2
                            or w.getcomptype() != "NONE"
                            or w.getnchannels() != 1
                        ):
                            # windows are TIME-aligned sample runs; an
                            # interleaved multi-channel stream would halve
                            # the covered frames per window and mix
                            # channels — mono only, like the VAD semantics
                            continue
                        raw = w.readframes(w.getnframes())
                except (wave.Error, EOFError):
                    continue
                samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                for i in range(0, len(samples), window):
                    rows.append(
                        {
                            "path": path,
                            "win": i // window,
                            "energy": int(np.sum(samples[i : i + window] ** 2)),
                        }
                    )
            yield pd.DataFrame(rows, columns=["path", "win", "energy"])

    ensure_shipped(df.sparkSession)
    return df.mapInPandas(gen, AUDIO_ENERGY_SCHEMA)


VIDEO_FRAMES_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_features", ArrayType(DoubleType())),
    ]
)

# A video frame decoder maps (content, every_n) -> [(frame_index,
# [mean_lum, max_lum]), ...] for every n-th frame, with luminance
# normalized to [0, 1] and rounded to 6dp, or None when the bytes are not
# decodable by that codec. Same contract for the toy container, pyav, and
# ffmpeg — callers can swap decoders without changing the plan.
VideoFrameDecoder = Callable[[bytes, int], "list | None"]

try:  # probed ONCE at import, like the PIL probe above — a failed import
    # inside the per-blob loop would re-scan sys.path for every row
    import av as _pyav  # pyav: ffmpeg bindings
except Exception:  # noqa: BLE001 — pyav can raise beyond ImportError on load
    _pyav = None

import shutil as _shutil

_FFMPEG_BIN = _shutil.which("ffmpeg")
_FFPROBE_BIN = _shutil.which("ffprobe")


def is_toy_video(content: bytes) -> bool:
    """The toy container has an exact length signature: 4-byte LE frame
    count then 16 bytes per frame. Real container formats (mp4/mkv/webm)
    can never satisfy it — their headers alone exceed a plausible count."""
    if len(content) < 4:
        return False
    n = int.from_bytes(content[:4], "little")
    return len(content) == 4 + 16 * n


def toy_video_frame_decoder(content: bytes, every_n: int) -> "list | None":
    """Deterministic toy-container codec (4-byte LE frame count + 16
    luminance bytes per frame) — the always-available test path of the
    seam, exactly as FAKEIMG is for images. Emits (frame_index,
    [mean_lum, max_lum]) per sampled frame."""
    if not is_toy_video(content):
        return None
    n = int.from_bytes(content[:4], "little")
    frames = np.frombuffer(content, dtype=np.uint8, offset=4).reshape(n, 16) if n else np.zeros((0, 16), np.uint8)
    out = []
    for i in range(0, n, every_n):
        chunk = frames[i]
        out.append(
            (
                i,
                [
                    round(float(chunk.sum()) / 16 / 255, 6),
                    round(float(chunk.max()) / 255, 6),
                ],
            )
        )
    return out


def av_video_frame_decoder(content: bytes, every_n: int) -> "list | None":
    """pyav-backed REAL codec path (mp4/mkv/webm/...), selected only when
    ``av`` is importable — this container ships no video libs, so the
    import is gated at module load, not assumed. Features are computed on
    the full-resolution gray plane: the same [mean_lum, max_lum] contract
    as the toy codec."""
    if _pyav is None:
        return None
    import io

    try:
        with _pyav.open(io.BytesIO(content)) as container:
            stream = container.streams.video[0]
            out = []
            for i, frame in enumerate(container.decode(stream)):
                if i % every_n:
                    continue
                gray = frame.to_ndarray(format="gray")
                out.append(
                    (
                        i,
                        [
                            round(float(gray.mean()) / 255.0, 6),
                            round(float(gray.max()) / 255.0, 6),
                        ],
                    )
                )
            return out
    except Exception:  # noqa: BLE001 — undecodable blob -> auditable null row
        return None


def ffmpeg_video_frame_decoder(content: bytes, every_n: int) -> "list | None":
    """ffmpeg-CLI-backed REAL codec path, selected when the ``ffmpeg`` +
    ``ffprobe`` binaries are on PATH (probed once at import). ffprobe
    reads the stream geometry, ffmpeg emits every n-th frame as raw
    full-resolution gray bytes, and features follow the shared
    [mean_lum, max_lum] contract. Bytes go through a temp file because
    most containers need seekable input for their index."""
    if _FFMPEG_BIN is None or _FFPROBE_BIN is None:
        return None
    import json
    import os
    import subprocess
    import tempfile

    try:
        fd, path = tempfile.mkstemp(suffix=".video")
        try:
            with os.fdopen(fd, "wb") as fh:
                fh.write(content)
            probe = subprocess.run(
                [
                    _FFPROBE_BIN, "-v", "error", "-select_streams", "v:0",
                    "-show_entries", "stream=width,height", "-of", "json", path,
                ],
                capture_output=True,
                check=True,
            )
            info = json.loads(probe.stdout)["streams"][0]
            w, h = int(info["width"]), int(info["height"])
            raw = subprocess.run(
                [
                    _FFMPEG_BIN, "-v", "error", "-i", path,
                    "-vf", f"select='not(mod(n\\,{every_n}))'", "-vsync", "vfr",
                    "-f", "rawvideo", "-pix_fmt", "gray", "pipe:1",
                ],
                capture_output=True,
                check=True,
            ).stdout
        finally:
            os.unlink(path)
        frames = np.frombuffer(raw, dtype=np.uint8)
        if w <= 0 or h <= 0 or frames.size % (w * h):
            return None
        out = []
        for k in range(frames.size // (w * h)):
            g = frames[k * w * h : (k + 1) * w * h]
            out.append(
                (
                    k * every_n,
                    [
                        round(float(g.mean()) / 255.0, 6),
                        round(float(g.max()) / 255.0, 6),
                    ],
                )
            )
        return out
    except Exception:  # noqa: BLE001 — undecodable blob -> auditable null row
        return None


def real_video_frame_decoder(content: bytes, every_n: int) -> "list | None":
    """The production decoder seam, mirroring real_image_decoder: the
    deterministic toy container first (exact length signature, can never
    shadow a real format), then pyav, then the ffmpeg CLI — whichever this
    environment provides. None when nothing decodes; the mapInPandas stage
    surfaces that as a null row, never a dropped blob or a task failure."""
    for dec in (toy_video_frame_decoder, av_video_frame_decoder, ffmpeg_video_frame_decoder):
        out = dec(content, every_n)
        if out is not None:
            return out
    return None


def video_codec_available() -> bool:
    """True when a REAL codec path (pyav or ffmpeg) exists — the toy
    container doesn't count. Lets deployments assert their environment
    instead of discovering null rows downstream."""
    return _pyav is not None or (_FFMPEG_BIN is not None and _FFPROBE_BIN is not None)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 30,
    frame_decoder: VideoFrameDecoder | None = None,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Frame-sampling stage (one row per sampled frame), defaulting to the
    ``real_video_frame_decoder`` seam: toy container always, pyav/ffmpeg
    when the environment ships them (probed once at import, like PIL for
    images). Undecodable blobs keep one row with null frame columns —
    auditable, never silently dropped, never a task failure."""
    if frame_decoder is None:
        frame_decoder = real_video_frame_decoder

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                decoded = frame_decoder(bytes(content) if content is not None else b"", every_n)
                if decoded is None:
                    rows.append({"path": path, "frame_index": None, "frame_features": None})
                    continue
                for idx, feats in decoded:
                    rows.append({"path": path, "frame_index": idx, "frame_features": feats})
            yield pd.DataFrame(rows, columns=["path", "frame_index", "frame_features"])

    ensure_shipped(df.sparkSession)
    return df.mapInPandas(gen, VIDEO_FRAMES_SCHEMA)


def bmp_luminance_matrix(content: bytes):
    """Decode a BI_RGB 24-bit BMP to a (height, width) uint8 luminance
    matrix (same deterministic uint8-truncation luminance as
    ``bmp_image_decoder``); None when not parseable."""
    import struct

    try:
        if len(content) < 54 or content[:2] != b"BM":
            return None
        pixel_offset = struct.unpack_from("<I", content, 10)[0]
        width, height_raw = struct.unpack_from("<ii", content, 18)
        bpp = struct.unpack_from("<H", content, 28)[0]
        comp = struct.unpack_from("<I", content, 30)[0]
        if bpp != 24 or comp != 0 or width <= 0 or height_raw == 0:
            return None
        top_down = height_raw < 0
        height = abs(height_raw)
        stride = (width * 3 + 3) // 4 * 4
        need = pixel_offset + stride * height
        if len(content) < need:
            return None
        raw = np.frombuffer(content, dtype=np.uint8, count=stride * height,
                            offset=pixel_offset)
        rows = raw.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
        if not top_down:
            rows = rows[::-1]
        b = rows[..., 0].astype(np.float64)
        g = rows[..., 1].astype(np.float64)
        r = rows[..., 2].astype(np.float64)
        return (0.299 * r + 0.587 * g + 0.114 * b).astype(np.uint8)
    except (struct.error, ValueError):
        return None


def resize_nearest(lum, out_w: int, out_h: int):
    """Nearest-neighbor resize of a (H, W) matrix: output pixel (i, j)
    samples source (floor(i*H/out_h), floor(j*W/out_w)) — the standard
    deterministic NN mapping, no interpolation, so any engine (or the
    golden python replay) reproduces it bit-for-bit."""
    h, w = lum.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return lum[np.ix_(ys, xs)]


RESIZED_IMAGE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("mean_lum", DoubleType()),
        StructField("resized_md5", StringType()),
    ]
)


def resize_image_features(
    df: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    matrix_decoder: Callable = bmp_luminance_matrix,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Decode + RESIZE stage (the brief's resize op): binary rows ->
    (path, out_w, out_h, mean of resized luminance, md5 of the resized
    row-major bytes). Arrow-batched mapInPandas; undecodable blobs yield
    null feature columns. The md5 makes the resized pixel block itself
    hash-checkable by an independent replay."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                lum = matrix_decoder(bytes(content) if content is not None else b"")
                if lum is None:
                    rows.append({"path": path, "out_w": None, "out_h": None,
                                 "mean_lum": None, "resized_md5": None})
                    continue
                rs = resize_nearest(lum, out_w, out_h)
                rows.append({
                    "path": path, "out_w": out_w, "out_h": out_h,
                    "mean_lum": round(float(rs.sum()) / rs.size, 6),
                    "resized_md5": hashlib.md5(rs.tobytes()).hexdigest(),
                })
            yield pd.DataFrame(
                rows, columns=["path", "out_w", "out_h", "mean_lum", "resized_md5"]
            )

    ensure_shipped(df.sparkSession)
    return df.mapInPandas(gen, RESIZED_IMAGE_SCHEMA)


DHASH_IMAGE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("dhash", LongType()),
    ]
)


def dhash_bits(lum, hash_w: int = 8, hash_h: int = 8) -> int:
    """Difference hash of a luminance matrix: nearest-neighbor resize to
    (hash_h, hash_w + 1), then bit (y, x) = 1 iff pixel (y, x) > pixel
    (y, x + 1) — the standard dHash, fully integer-deterministic given
    the deterministic NN resample. Bits pack row-major, MSB first, into
    one int (64 bits at the default 8x8), returned as SIGNED two's
    complement so it round-trips through int64 columns."""
    rs = resize_nearest(lum, hash_w + 1, hash_h)
    h = 0
    for y in range(hash_h):
        for x in range(hash_w):
            h = (h << 1) | (1 if int(rs[y][x]) > int(rs[y][x + 1]) else 0)
    if h >= 1 << (hash_w * hash_h - 1):
        h -= 1 << (hash_w * hash_h)
    return h


def dhash_image_features(
    df: DataFrame,
    hash_w: int = 8,
    hash_h: int = 8,
    matrix_decoder: Callable = bmp_luminance_matrix,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Perceptual difference-hash stage: binary rows -> (path, dhash int64).
    Arrow-batched mapInPandas; undecodable blobs yield a null hash. The
    dHash is the workhorse of image near-dedup: brightness/contrast shifts
    preserve horizontal gradients, so shifted copies collide while
    different images land far in Hamming space."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                lum = matrix_decoder(bytes(content) if content is not None else b"")
                rows.append(
                    {
                        "path": path,
                        "dhash": None
                        if lum is None
                        else dhash_bits(lum, hash_w, hash_h),
                    }
                )
            yield pd.DataFrame(rows, columns=["path", "dhash"])

    ensure_shipped(df.sparkSession)
    return df.mapInPandas(gen, DHASH_IMAGE_SCHEMA)
