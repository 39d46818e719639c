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


def test_resize_media_deterministic_and_passthrough(spark):
    from spanner_data_validator_spark.operators.multimodal import resize_media

    rows = [
        (1, "image", "image/x", bytearray(b"abcdefghij" * 20), (100, 50, None, None)),
        (2, "audio", "audio/x", bytearray(b"xyz"), (None, None, 3000, 16000)),
        (3, "image", "image/x", None, (10, 10, None, None)),
    ]
    df = spark.createDataFrame(
        rows, "media_id LONG, kind STRING, mime STRING, payload BINARY, "
              "meta STRUCT<width INT, height INT, duration_ms LONG, sample_rate INT>")
    out = {r["media_id"]: r for r in resize_media(df, 8, 4).collect()}
    # images: payload exactly w*h bytes, dims updated; deterministic bytes
    assert len(out[1]["payload"]) == 32
    assert (out[1]["width"], out[1]["height"]) == (8, 4)
    again = {r["media_id"]: r for r in resize_media(df, 8, 4).collect()}
    assert bytes(out[1]["payload"]) == bytes(again[1]["payload"])
    # null image payload -> zero bytes of the right length
    assert bytes(out[3]["payload"]) == bytes(32)
    # non-image passes through untouched
    assert bytes(out[2]["payload"]) == b"xyz"
    assert (out[2]["width"], out[2]["height"]) == (None, None)


def test_resize_media_stub_gate(spark):
    import pytest as _pytest

    from spanner_data_validator_spark.operators.multimodal import resize_media

    df = spark.createDataFrame(
        [(1, "image", "m", bytearray(b"zz"), (2, 1, None, None))],
        "media_id LONG, kind STRING, mime STRING, payload BINARY, "
        "meta STRUCT<width INT, height INT, duration_ms LONG, sample_rate INT>")
    with _pytest.raises(Exception, match="STUB: codec"):
        resize_media(df, 4, 4, use_stub=False).collect()
