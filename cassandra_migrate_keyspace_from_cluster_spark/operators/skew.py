"""Skew mitigation: salted two-phase aggregation (SCALE.md).

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; this operator is the *explicit* form for the one case AQE can't
fix — a groupBy whose key distribution is so hot that a single final
partition dominates the stage. Salting splits each hot key into
``n_salts`` subkeys so the heavy partial aggregation spreads across
executors; the second phase re-aggregates the tiny per-salt partials.

Results are identical to a plain groupBy for any DECOMPOSABLE aggregate
(sum/count/min/max — and avg via sum+count); pytest asserts equality.
Cost: one extra (cheap) shuffle of |keys|·n_salts partial rows — worth
it only when a key's group is larger than an executor's share, i.e.
at the 100-TB design point, not at sf0.1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame, key: str, value: str, n_salts: int = 8
) -> DataFrame:
    """Two-phase salted sum/count of ``value`` per ``key``.

    Phase 1 groups on (key, salt) — salt derived from a uniform hash of
    a distinct-ish column set so rows of a hot key spread evenly; phase 2
    merges the ``n_salts`` partials per key. Deterministic: the salt
    only routes rows, every routing yields the same merged result
    (floating sums then rounded per the §5.4 law by callers).

    The salt uses ``pmod``, not ``abs(hash) % n``: ``abs`` of a hash
    that lands exactly on Long.MIN_VALUE overflows back to a negative
    (non-ANSI) or throws (ANSI), and a negative salt would silently
    route the row to a partition no exploded dim copy matches. ``pmod``
    is total on [0, n_salts).
    """
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).alias("__salt")
    partial = (
        df.select(F.col(key), F.col(value), salt)
        .groupBy(key, "__salt")
        .agg(F.sum(value).alias("__psum"), F.count(F.lit(1)).alias("__pcnt"))
    )
    return partial.groupBy(key).agg(
        F.sum("__psum").alias("sum_value"),
        F.sum("__pcnt").alias("n"),
    )


def plain_sum_count(df: DataFrame, key: str, value: str) -> DataFrame:
    """The unsalted twin (Spark's own partial+final hash aggregate)."""
    return df.groupBy(key).agg(
        F.sum(value).alias("sum_value"), F.count(F.lit(1)).alias("n")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe fact⋈dim equi-join by key salting — the explicit form
    of what AQE's skew-join split does at runtime, for when the skew is
    known up front (one hot key owning >1 executor's share of rows).

    The FACT side gets a uniform random-ish salt in [0, n_salts); the
    DIM side is EXPLODED n_salts× (one copy per salt value), and the
    join key becomes (key, salt) — a hot key's rows now land in
    n_salts different shuffle partitions instead of one. Results are
    row-identical to the plain join (every fact row still matches
    exactly its key's dim row, just via its salted copy). Cost:
    dim × n_salts rows shuffled — cheap when dim is small relative to
    the hot key's row count, which is exactly the skew regime.

    Equality with the plain join is pytest-asserted; at true scale pick
    n_salts ≈ ceil(hot-key rows / target partition rows).
    """
    salt = F.pmod(F.xxhash64(*fact.columns), F.lit(n_salts)).alias("__salt")
    salted_fact = fact.select("*", salt)
    salted_dim = dim.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    )
    return salted_fact.join(salted_dim, [key, "__salt"]).drop("__salt")
