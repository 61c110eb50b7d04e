"""Vector math as pure Column expressions (no UDFs — stays inside
whole-stage codegen; SURVEY.md §2 f4/f6).

All helpers take/return ``array<double>`` columns. Inputs stored as
float32 (``embeddings.embedding``) must be cast first via
``to_double_array`` so accumulation happens in float64 on both engines
(the DuckDB oracle casts to DOUBLE[] for the same reason).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(c: Column | str) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sum of elementwise products — sequential left-to-right fold, the
    same association order DuckDB's list math uses."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
