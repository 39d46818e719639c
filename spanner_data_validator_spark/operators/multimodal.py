"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; decode /
feature-extract / resize / frame-sample are ``mapInPandas`` stages so each
Arrow batch crosses the JVM↔Python boundary once. The actual codecs (PIL,
ffmpeg, torchaudio) are NOT in this container — the decode kernels are
STUBBED behind ``_require_codec`` (clearly-marked NotImplementedError) or a
deterministic fake, while the Spark-side plumbing (schema, batch shape,
partition sizing) is real and tested.

Scale notes: binary payloads make rows wide — ``repartition_for_media`` sizes
partitions by *bytes*, not rows, so a 100 TB scan doesn't OOM executors; the
metadata-only projection never touches the payload column (parquet column
pruning keeps the scan cheap when only metadata is needed).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),     # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]), True),
])

FEATURE_SCHEMA = ("media_id LONG, kind STRING, n_bytes LONG, feature ARRAY<FLOAT>")


def _require_codec(name: str):
    raise NotImplementedError(
        f"STUB: codec '{name}' is not available in this environment. "
        "Plug a real decoder in here (PIL/ffmpeg/torchaudio); the Spark-side "
        "plumbing (schema, batching, partitioning) is already wired.")


def _fake_feature(payload: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decode+embed kernel: byte-histogram
    moments. Keeps tests meaningful without codecs."""
    if payload is None:
        return [0.0] * dim
    b = memoryview(payload)
    n = len(b)
    if n == 0:
        return [0.0] * dim
    buckets = [0] * dim
    for i in range(0, n, max(1, n // 256)):  # stride-sampled, bounded work
        buckets[b[i] % dim] += 1
    total = sum(buckets) or 1
    return [x / total for x in buckets]


def extract_features(df: DataFrame, *, dim: int = 8, use_stub: bool = True) -> DataFrame:
    """mapInPandas decode/feature stage: one Arrow batch in, one out.

    With ``use_stub=False`` this raises the clearly-marked codec stub — the
    integration point for a real decoder."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_stub:
                _require_codec("image/audio decode")
            feats = [_fake_feature(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                "feature": feats,
            })

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = ("media_id LONG, kind STRING, mime STRING, payload BINARY, "
                  "width INT, height INT")


def _fake_resize(payload: bytes | None, w: int, h: int) -> bytes:
    """Deterministic stand-in for an image-resize kernel: nearest-neighbor
    byte sampling to exactly w*h bytes. Keeps output size/shape semantics
    (and therefore the Arrow plumbing) real without PIL."""
    n_out = w * h
    if not payload:
        return bytes(n_out)
    n = len(payload)
    return bytes(payload[(i * n) // n_out] for i in range(n_out))


def resize_media(df: DataFrame, width: int, height: int,
                 *, use_stub: bool = True) -> DataFrame:
    """mapInPandas resize stage over image payloads: one Arrow batch in/out,
    payload replaced by the (stubbed) resized encoding, meta width/height
    updated. Non-image rows pass through untouched with their original
    dimensions. ``use_stub=False`` raises the marked codec integration point.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_stub:
                _require_codec("image resize")
            is_img = pdf["kind"] == "image"
            payloads, ws, hs = [], [], []
            for img, p, meta in zip(is_img, pdf["payload"], pdf["meta"]):
                if img:
                    payloads.append(_fake_resize(p, width, height))
                    ws.append(width)
                    hs.append(height)
                else:
                    payloads.append(p)
                    ws.append(meta["width"] if meta is not None else None)
                    hs.append(meta["height"] if meta is not None else None)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "mime": pdf["mime"],
                "payload": payloads,
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
            })

    return df.mapInPandas(op, schema=RESIZED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands metadata into (media_id, frame_ts_ms)
    rows without touching payloads (pure expressions — sequence over duration).
    The decode of each sampled frame is the stubbed kernel above."""
    return (df.where(F.col("kind") == "video")
              .select("media_id",
                      F.explode(F.sequence(
                          F.lit(0),
                          F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                          F.lit(every_ms))).alias("frame_ts_ms")))


def repartition_for_media(df: DataFrame, approx_rows: int,
                          target_bytes_per_partition: int = 128 << 20,
                          avg_payload_bytes: int = 1 << 20) -> DataFrame:
    """Size partitions by payload bytes (rows × avg size), not row count —
    a 128 MiB partition holds ~128 one-MiB images, not 10^6 rows."""
    rows_per_part = max(1, target_bytes_per_partition // max(1, avg_payload_bytes))
    n_parts = max(df.sparkSession.sparkContext.defaultParallelism,
                  -(-approx_rows // rows_per_part))
    return df.repartition(n_parts, F.col("media_id"))
