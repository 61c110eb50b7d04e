"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def r2(c: Column) -> Column:
    """Round a LARGE-magnitude floating aggregate (sums over many rows).

    2dp granularity dwarfs cross-engine summation-order noise (~1e-4 at
    sf0.1 magnitudes) while staying far under 2^53 exact-integer range,
    so the rounded doubles are bit-identical across engines
    (SURVEY.md §5.4 determinism law).
    """
    return F.round(c, 2)


def r6(c: Column) -> Column:
    """Round an O(1)..O(1e4)-magnitude floating value (avgs, ratios)."""
    return F.round(c, 6)
