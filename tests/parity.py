"""Value-level Spark vs DuckDB comparison (replicates the driver's t2:
row-count + schema + order-insensitive values, but cell-exact with
readable diffs for failure localization — SURVEY.md §5.3.1)."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import numpy as np
import pandas as pd


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        if f == 0.0:
            return repr(0.0)  # merge -0.0 / +0.0
        return repr(f)
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if isinstance(v, (np.integer, int)):
        return int(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return None
        return v.isoformat()
    if isinstance(v, dt.datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if v is pd.NaT:
        return None
    return v


def _rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(c) for c in row))
    out.sort(key=repr)
    return out


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    s_rows, d_rows = _rows(spark_pdf), _rows(duck_pdf)
    if s_rows == d_rows:
        return
    diffs = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ][:5]
    cols = sorted(spark_pdf.columns)
    msg = [f"{name}: {sum(a != b for a, b in zip(s_rows, d_rows))} differing rows; cols={cols}"]
    for i, a, b in diffs:
        msg.append(f"  row {i}: spark={a}")
        msg.append(f"          duck ={b}")
    raise AssertionError("\n".join(msg))
