"""Custom row transformation before fingerprinting (reference P6).

The reference lets a user JAR rewrite/filter source rows before hashing
(dofns/CustomTransformationDoFn.java:90-133; loader
transform/CustomTransformationImplFetcher.java:17-40,
transform/JarFileReader.java:24-48): add/replace columns, drop events, carry
a ``logicalShardId``. The Spark-native surface is a user-supplied Python
callable over Arrow batches via ``mapInPandas`` — vectorized (no per-row
Python), schema-checked, composable with the fingerprint projection.

The callable receives one ``pd.DataFrame`` per Arrow batch and returns the
transformed batch (fewer/more rows allowed; columns must match ``schema``).
Returning ``None`` or an empty frame drops the whole batch — the "filter
event" path of the reference (CustomTransformationDoFn.java:117-121).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

TransformFn = Callable[[pd.DataFrame], "pd.DataFrame | None"]


def load_custom_transformation(path: str,
                               custom_parameters: str | None = None) -> TransformFn:
    """Config-driven transform loading: ``"pkg.module:function"`` → callable.

    The Python analogue of the reference's jarPath/classPath dynamic loading
    (transform/CustomTransformation.java builder,
    CustomTransformationImplFetcher.java:17-40, JarFileReader.java:24-48) —
    a spec file can name the transform instead of code passing a callable.
    ``custom_parameters`` mirrors the reference's opaque parameter string:
    when it is given (non-None), the named object MUST be a factory taking
    that one string and returning the transform; when it is None, the named
    object itself is the transform. (Specs pairing a plain transform with
    parameters are a config error and fail loudly at load time.)
    """
    import importlib

    mod_name, sep, attr = path.partition(":")
    if not sep or not attr:
        raise ValueError(
            f"transformation path must be 'module:function', got {path!r}")
    obj = getattr(importlib.import_module(mod_name), attr)
    if custom_parameters is not None:
        return obj(custom_parameters)
    return obj


def apply_custom_transformation(
    df: DataFrame,
    fn: TransformFn,
    *,
    schema: T.StructType | str | None = None,
    shard_id: str | None = None,
) -> DataFrame:
    """Run a user transformation batch-wise before validation.

    ``schema`` — output schema; defaults to the input schema (row-rewriting
    transforms). ``shard_id`` — forwarded to the callable via a ``_shard_id``
    attribute on each batch, mirroring the reference's logicalShardId
    forwarding (dofns/CustomTransformationDoFn.java:97-98).
    """
    out_schema = schema or df.schema

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if shard_id is not None:
                pdf.attrs["_shard_id"] = shard_id
            out = fn(pdf)
            if out is not None and len(out):
                yield out

    return df.mapInPandas(op, schema=out_schema)
