"""Plan-inspection helpers: assert Catalyst did what we designed for.

Used by tests/test_plans.py to keep the scale-critical plan properties
(pushdown, pruning, broadcast, top-k) from regressing silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Formatted physical plan as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert a predicate reached the parquet scan (PushedFilters)."""
    plan = physical_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, f"no PushedFilters line in plan:\n{plan}"
    assert any(fragment in ln for ln in pushed), (
        f"filter {fragment!r} not pushed; PushedFilters lines: {pushed}"
    )


def assert_broadcast(df: DataFrame) -> None:
    """Assert the plan contains a broadcast join."""
    plan = physical_plan(df)
    assert "Broadcast" in plan, f"no broadcast join in plan:\n{plan}"


def assert_contains(df: DataFrame, fragment: str) -> None:
    plan = physical_plan(df)
    assert fragment in plan, f"{fragment!r} not in plan:\n{plan}"
