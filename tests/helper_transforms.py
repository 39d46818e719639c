"""Importable user transforms for config-driven loading tests
(the jarPath/classPath analogue — specs reference these by module path)."""

from __future__ import annotations

import pandas as pd


def uppercase_v(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out["v"] = out["v"].str.upper()
    return out


def drop_mod_factory(params: str):
    """Factory taking the reference-style opaque parameter string."""
    mod = int(params)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf[pdf["id"] % mod != 0]

    return fn
