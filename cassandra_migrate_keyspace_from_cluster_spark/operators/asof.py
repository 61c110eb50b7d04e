"""As-of join composite (Spark lacks a native ASOF JOIN).

Semantics implemented: for each left row, attach ``right_value`` from the
right row with the greatest ``right_ts`` satisfying ``right_ts <=
left_ts`` within the same ``on`` key (DuckDB ``ASOF JOIN ... ON l.k =
r.k AND l.ts >= r.ts`` semantics, left-outer flavor: unmatched left rows
keep NULL).

Strategy — union + ordered window, NOT a range join:
  1. tag right rows side=0, left rows side=1;
  2. union; window ``partitionBy(on).orderBy(ts, side)`` — at equal ts
     the right row sorts first, so a right row AT the left timestamp is
     visible (the ``>=`` in the semantics);
  3. ``last(right_value, ignoreNulls=True)`` over rows
     unboundedPreceding..current carries the latest-earlier value
     forward; keep side=1 rows.

Scale: one shuffle on the join key and a sequential in-partition scan —
O(n log n) per key vs the O(n·m) blowup of a naive range join. This is
the shape that survives 100 TB; skewed keys are bounded by per-user
cardinality, and AQE skew-split applies to the single exchange.

Precondition: right must be unique per (on, right_ts) — otherwise
"which right row at the tied timestamp" is undefined in any engine.
Callers pre-aggregate (e.g. max(id) per ts) to guarantee it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"

# The documented input bound for the native-asof API path (r12,
# VERDICT r11 item 5). Spark's RewriteAsOfJoin (what ps.merge_asof
# delegates to) plans a BroadcastNestedLoopJoin whose inner pair space
# is DISTINCT LEFT `on` TIMESTAMPS × RIGHT ROWS — the `by` equality
# does NOT constrain that stage. Measured (r4, SCALE.md): ~6M pairs
# ≈ 6 s at sf0.01, ~625M pairs > 240 s at sf0.1 — a quadratic cliff,
# not a slowdown. 50M pairs ≈ tens of seconds on local[32] and keeps
# a healthy margin below the measured cliff.
MERGE_ASOF_MAX_PAIRS = 50_000_000


def guarded_merge_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    direction: str = "backward",
    max_pairs: int = MERGE_ASOF_MAX_PAIRS,
):
    """``ps.merge_asof`` with the r4-measured quadratic cliff made an
    EXPLICIT contract instead of prose (the b31 keyset-twin treatment):
    estimates the RewriteAsOfJoin pair space (distinct left ``on``
    values × right row count — the actual BNLJ inner, measured r4) with
    two cheap count jobs and raises past ``max_pairs``, naming the
    linear alternative. The pandas-on-Spark API surface stays available
    for gate-SF parity checks (b15b), and a caller who would silently
    fall off the >240 s cliff at sf0.1-scale inputs gets an actionable
    error instead.

    Returns a pandas-on-Spark frame (``.to_spark()`` it), matching
    ``ps.merge_asof``'s contract.
    """
    n_left_on = left.select(on).distinct().count()
    n_right = right.count()
    pairs = n_left_on * n_right
    if pairs > max_pairs:
        raise ValueError(
            f"merge_asof pair space {pairs:,} (= {n_left_on:,} distinct "
            f"left '{on}' values x {n_right:,} right rows) exceeds the "
            f"documented bound {max_pairs:,}: Spark's RewriteAsOfJoin "
            "plans a BroadcastNestedLoopJoin the 'by' key does not "
            "constrain (quadratic cliff, measured >240s at ~625M pairs "
            "- SCALE.md). Use the linear operator instead: "
            "operators.asof.asof_join_last_earlier (backward) / "
            "asof_join_first_later (forward) - one shuffle on the key, "
            "O(n log n) per key."
        )
    import pyspark.pandas as ps

    return ps.merge_asof(
        left.pandas_api(),
        right.pandas_api(),
        on=on,
        by=by,
        direction=direction,
    )


def asof_join_last_earlier(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value: str,
    out_value: str,
) -> DataFrame:
    """Left as-of join; returns left columns + ``out_value``."""
    value_type = right.schema[right_value].dataType

    lt = (
        left.withColumn(_TS, F.col(left_ts))
        .withColumn(_SIDE, F.lit(1))
        .withColumn(out_value, F.lit(None).cast(value_type))
    )
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.col(right_value).alias(out_value),
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        out_value, F.last(out_value, ignorenulls=True).over(w)
    )
    return carried.filter(F.col(_SIDE) == 1).drop(_TS, _SIDE)


def asof_join_first_later(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value: str,
    out_value: str,
) -> DataFrame:
    """FORWARD as-of join: attach ``right_value`` from the right row
    with the SMALLEST ``right_ts`` satisfying ``right_ts >= left_ts``
    within the key (the "next event after" direction — next quote
    after a trade, next purchase after a click). Same union + ordered
    window shape as the backward form, with the scan reversed:
    ``orderBy(ts DESC, side)`` and the ignoreNulls carry now
    propagates the nearest LATER right value backwards; a right row AT
    the left timestamp sorts first at the tie, preserving the ``>=``
    boundary. One shuffle on the key, O(n log n) per key — identical
    scale contract to ``asof_join_last_earlier``."""
    value_type = right.schema[right_value].dataType

    lt = (
        left.withColumn(_TS, F.col(left_ts))
        .withColumn(_SIDE, F.lit(1))
        .withColumn(out_value, F.lit(None).cast(value_type))
    )
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.col(right_value).alias(out_value),
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(_TS).desc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        out_value, F.last(out_value, ignorenulls=True).over(w)
    )
    return carried.filter(F.col(_SIDE) == 1).drop(_TS, _SIDE)
