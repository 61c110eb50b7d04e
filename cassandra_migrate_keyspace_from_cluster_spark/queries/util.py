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

    Declared residual (r12 probe): the engines' round(double, 2) ITSELF
    disagrees on exact half-boundary doubles (Spark HALF_UPs the
    shortest decimal repr — round(1.005, 2) = 1.01 — where DuckDB
    rounds the binary value — 1.00; the same dichotomy as the %.2f
    format law, test_round2_quotient_battery pins it). A SUM lands in
    that class only when the accumulated double sits within an ulp of
    k.xy5 — a measure-zero conspiracy no single adversarial row shape
    can force (unlike the İ/NBSP/2.675 classes, which are one-row
    data shapes) — so sums keep the coarse round; the exact-cents sum
    machinery (cents()/dec_sum, the b5 family) is the conversion path
    if a driver row ever lands on it.
    """
    return F.round(c, 2)


def r6(c: Column) -> Column:
    """Round an O(1)..O(1e4)-magnitude floating value (avgs, ratios)."""
    return F.round(c, 6)
