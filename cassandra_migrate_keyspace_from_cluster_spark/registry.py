"""Query registry: the single source of truth for the declared inventory.

Each SURVEY.md §2 QueryID registers here with:
  - ``fn(spark, sf_dir) -> DataFrame``  — the PySpark implementation,
  - ``oracle``                          — the DuckDB ANSI-SQL twin, or
    ``None`` for ops whose values are engine-specific by design
    (approx sketches, LSH) → the driver records a rows-only check.

``__spark_entry__.py`` simply re-exports ``queries()`` / ``oracle_sql()``.

Determinism laws (SURVEY.md §5.4) every registered query obeys:
  - floating aggregates rounded: coarse (2dp) for large-magnitude sums,
    6dp for O(1..1e4)-magnitude values — both sides identically;
  - every window/limit ordering carries a unique tie-break column;
  - computed columns aliased identically in Spark and SQL;
  - explicit casts where engine default types diverge (JSON, ntile).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = ()

    @property
    def doc(self) -> str:
        return (self.fn.__doc__ or "").strip()


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query implementation + its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


def load_all() -> None:
    """Import every query module so the registry is fully populated."""
    from .queries import ALL_MODULES  # noqa: F401  (import side effect)


def queries() -> dict[str, QueryFn]:
    load_all()
    return {name: spec.fn for name, spec in sorted(QUERIES.items())}


def oracle_sql() -> dict[str, str]:
    load_all()
    return {
        name: spec.oracle
        for name, spec in sorted(QUERIES.items())
        if spec.oracle is not None
    }


def specs() -> dict[str, QuerySpec]:
    load_all()
    return dict(sorted(QUERIES.items()))
