"""Multimodal blob surface: binaryFile scan, metadata fingerprints,
content dedup, and the decode-stage plumbing (deterministic fake decoder +
explicit stub for codec-dependent paths)."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from job_datapipeline_spark.sources import multimodal as MM

BLOB_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "blobs")


def test_blob_metadata_matches_hashlib(spark):
    df = MM.with_blob_metadata(MM.read_binary_dir(spark, BLOB_DIR))
    got = {r["meta"]["file_name"]: r["meta"].asDict() for r in df.collect()}
    assert len(got) == 5
    for name, meta in got.items():
        with open(os.path.join(BLOB_DIR, name), "rb") as f:
            content = f.read()
        assert meta["n_bytes"] == len(content)
        assert meta["content_md5"] == hashlib.md5(content).hexdigest()


def test_glob_filter_limits_listing(spark):
    only_img = MM.read_binary_dir(spark, BLOB_DIR, glob="*.img")
    assert only_img.count() == 4


def test_dedup_blobs_by_content(spark):
    dedup = MM.dedup_blobs(MM.read_binary_dir(spark, BLOB_DIR))
    rows = {r["path"].rsplit("/", 1)[-1]: r["copies"] for r in dedup.collect()}
    # img_001 and its copy collapse; min-path keeps img_001.img
    assert rows["img_001.img"] == 2
    assert "img_001_copy.img" not in rows
    assert sum(rows.values()) == 5 and len(rows) == 4


def test_decode_image_features_fake_decoder(spark):
    df = MM.read_binary_dir(spark, BLOB_DIR)
    feats = {r["path"].rsplit("/", 1)[-1]: r for r in MM.decode_image_features(df).collect()}
    assert feats["img_001.img"]["width"] == 16 and feats["img_001.img"]["height"] == 9
    assert feats["img_002.img"]["width"] == 8
    v = feats["img_001.img"]["features"]
    assert len(v) == 8 and abs(sum(v) - 1.0) < 1e-4
    # the audio blob is undecodable by the image decoder: null row, not dropped
    assert feats["clip_001.aud"]["width"] is None
    assert feats["clip_001.aud"]["features"] is None


def test_video_stub_raises_without_decoder(spark):
    df = MM.read_binary_dir(spark, BLOB_DIR)
    with pytest.raises(NotImplementedError, match="codec"):
        MM.sample_video_frames(df)


def test_video_plumbing_with_injected_decoder(spark):
    df = MM.read_binary_dir(spark, BLOB_DIR, glob="img_001.img")

    def frame_decoder(content, every_n):
        return [(i, [float(i), float(len(content))]) for i in range(0, 90, every_n)]

    rows = MM.sample_video_frames(df, every_n=30, frame_decoder=frame_decoder).collect()
    assert [(r["frame_index"], r["frame_features"][1]) for r in rows] == [
        (0, 156.0), (30, 156.0), (60, 156.0)
    ]
