"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The implementations live in ``cassandra_migrate_keyspace_from_cluster_spark``;
this module only adapts the registry to the driver's interface and
forces the runtime session invariants (UTC timezone, Arrow) that oracle
parity depends on, since the driver supplies its own SparkSession.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cassandra_migrate_keyspace_from_cluster_spark import registry
from cassandra_migrate_keyspace_from_cluster_spark.session import configure_existing

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped b5) on /root/testdata/sf0.001."""
    configure_existing(spark)
    return registry.queries()["b5_agg_groupby"](spark, SMOKE_SF_DIR)


def _wrap(fn: registry.QueryFn) -> registry.QueryFn:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        configure_existing(spark)
        return fn(spark, sf_dir)

    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; keys absent here are rows-only by design (approx/LSH)."""
    return registry.oracle_sql()
