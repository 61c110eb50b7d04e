"""Banded range join: interval/theta joins as shuffle equi-joins.

A pure range-predicate join (``l.val BETWEEN r.lo AND r.hi``) has no
equi key, so Spark plans BroadcastNestedLoopJoin (fine when one side is
tiny — b14's shape) or CartesianProduct (never fine). The standard
scale rewrite is BANDING: quantize the value axis into fixed-width
bands; a probe row lives in exactly ONE band, an interval row is
replicated to EVERY band its [lo, hi] overlaps; banding equality is
then a real equi key for the shuffle join and the original range
predicate remains as a residual filter. Each true match surfaces
exactly once (via the probe row's single band), so no dedup pass is
needed.

Cost model: replication factor = avg interval width / band width + 1;
pairs examined collapse from |L|·|R| to Σ per-band |L_b|·|R_b|. Pick
``band_width`` ≈ the typical interval width (replication ~2×). This is
the same trick the as-of composite (operators/asof.py) and Spark's own
range-join hints on Databricks use — here as an explicit, testable
operator (equality with the BNLJ form is pytest-asserted, and the plan
is asserted free of CartesianProduct/BNLJ).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BAND = "__rj_band"


def banded_range_join(
    probe: DataFrame,
    intervals: DataFrame,
    probe_val: Column,
    lo: Column,
    hi: Column,
    band_width: float,
) -> DataFrame:
    """Inner-join ``probe`` to ``intervals`` on
    ``lo <= probe_val <= hi`` via band equality + residual filter.
    Column name collisions between the two inputs are the caller's
    responsibility (select/alias first), as with any join."""
    p = probe.withColumn(_BAND, F.floor(probe_val / band_width))
    i = intervals.withColumn(
        _BAND,
        F.explode(F.sequence(F.floor(lo / band_width), F.floor(hi / band_width))),
    )
    return p.join(i, _BAND).filter((probe_val >= lo) & (probe_val <= hi)).drop(_BAND)
