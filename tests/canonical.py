"""Canonical result comparison shared by the oracle-parity tests.

Mirrors the driver's t2 gate: column order is irrelevant (sorted by
name), row order is irrelevant (rows sorted canonically), values must
match exactly after the query's own rounding (a 1e-9 representation
epsilon is absorbed by rounding floats to 9 dp before comparison).
"""

from __future__ import annotations

import datetime as dt
import math
from typing import Any

import pandas as pd


def _canon_value(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):  # numpy scalar/array
        return _canon_value(v.tolist())
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return v


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_value(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
