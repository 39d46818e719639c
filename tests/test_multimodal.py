"""Multimodal plumbing: schema, mapInPandas batching, stubbed decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_plan,
)


def _media_df(spark):
    rows = [
        (1, "image", "image/png", bytearray(b"\x89PNG fake bytes" * 10),
         {"width": 4, "height": 4, "duration_ms": None, "sample_rate": None}),
        (2, "audio", "audio/wav", bytearray(b"RIFF fake" * 20),
         {"width": None, "height": None, "duration_ms": 2500, "sample_rate": 16000}),
        (3, "video", "video/mp4", bytearray(b"\x00\x00ftyp" * 30),
         {"width": 640, "height": 480, "duration_ms": 3000, "sample_rate": None}),
        (4, "image", "image/png", None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_shapes(spark):
    out = extract_features(_media_df(spark), dim=8).collect()
    by_id = {r["media_id"]: r for r in out}
    assert len(out) == 4
    assert all(len(r["feature"]) == 8 for r in out)
    assert by_id[4]["n_bytes"] == 0 and by_id[1]["n_bytes"] > 0
    assert abs(sum(by_id[1]["feature"]) - 1.0) < 1e-6  # histogram normalized


def test_extract_features_deterministic(spark):
    a = extract_features(_media_df(spark)).collect()
    b = extract_features(_media_df(spark)).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_codec_stub_raises(spark):
    with pytest.raises(Exception) as ei:
        extract_features(_media_df(spark), use_stub=False).collect()
    assert "STUB" in str(ei.value)


def test_frame_sample_plan(spark):
    out = frame_sample_plan(_media_df(spark), every_ms=1000).collect()
    # only the video row expands; duration 3000 → ts 0,1000,2000,3000
    assert {r["media_id"] for r in out} == {3}
    assert sorted(r["frame_ts_ms"] for r in out) == [0, 1000, 2000, 3000]
