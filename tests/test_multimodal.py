"""Multimodal plumbing: schemas, batch shapes, and geometry algebra of
the stubbed-codec operators (decode itself is NotImplementedError by
design — the container has no image/audio libraries)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from trace_data_pipeline_spark.datapipe.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    resize_images,
    sample_frames,
)


def _media(spark, rows):
    return spark.createDataFrame(
        rows, "media_id long, payload binary, meta struct<mime:string, width:int, height:int, duration_ms:int>"
    )


def test_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_extract_features_shape_and_determinism(spark):
    m = _media(
        spark,
        [
            (1, b"payload-a", ("image/png", 4, 4, None)),
            (2, b"payload-b", ("image/png", 4, 4, None)),
            (3, None, ("image/png", None, None, None)),
        ],
    )
    out = extract_features(m).orderBy("media_id").collect()
    assert [r.media_id for r in out] == [1, 2, 3]
    assert all(len(r.features) == FEATURE_DIM for r in out)
    # deterministic: same payload -> same vector, md5-derived
    want0 = hashlib.md5(b"payload-a").digest()[0] / 256.0
    assert abs(out[0].features[0] - want0) < 1e-9
    assert out[2].n_bytes == 0


def test_resize_geometry_is_jvm_side(spark):
    m = _media(
        spark,
        [
            (1, b"wide", ("image/png", 1024, 512, None)),  # downscale 4x
            (2, b"tall", ("image/png", 100, 400, None)),  # downscale /256 on h
            (3, b"small", ("image/png", 64, 48, None)),  # never upscaled
            (4, b"nometa", ("image/png", None, None, None)),  # pass-through
        ],
    )
    out = {r.media_id: r for r in resize_images(m, max_side=256).collect()}
    assert (out[1].out_width, out[1].out_height) == (256, 128)
    assert (out[2].out_width, out[2].out_height) == (64, 256)
    assert (out[3].out_width, out[3].out_height) == (64, 48)
    assert (out[4].out_width, out[4].out_height) == (None, None)
    # payload transform is the tagged content hash (stub contract)
    assert out[1].payload == hashlib.md5(b"wide").digest() + (256).to_bytes(
        4, "big"
    ) + (128).to_bytes(4, "big")


def test_sample_frames_from_metadata(spark):
    m = _media(
        spark,
        [
            (1, b"v", ("video/mp4", None, None, 3500)),
            (2, b"v", ("video/mp4", None, None, 0)),
        ],
    )
    out = sample_frames(m, every_ms=1000)
    rows = out.filter(F.col("media_id") == 1).orderBy("frame_idx").collect()
    assert [r.frame_ts_ms for r in rows] == [0, 1000, 2000, 3000]
    assert out.filter(F.col("media_id") == 2).count() == 1  # frame 0 only
