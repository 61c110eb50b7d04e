"""Oracle-parity: every registered query vs its DuckDB twin, cell-exact.

This is a local replica of the driver's t2 gate (run at the same
sf0.01 by default) with precise failure localization.
"""

from __future__ import annotations

import pytest

from cassandra_migrate_keyspace_from_cluster_spark.registry import specs

from .conftest import PARITY_SF
from .parity import compare_frames

ALL_SPECS = specs()


@pytest.mark.parametrize("name", sorted(ALL_SPECS))
def test_parity(name, spark, duck):
    spec = ALL_SPECS[name]
    sdf = spec.fn(spark, PARITY_SF)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        # rows-only queries: smoke here; semantic checks live in
        # dedicated tests (containment / recall).
        assert len(spark_pdf) >= 0
        return
    duck_pdf = duck(PARITY_SF).execute(spec.oracle).df()
    compare_frames(spark_pdf, duck_pdf, name)


def test_registry_tier_sets_reference_real_queries():
    """_DRIVER_GREEN / _WINDOW must only contain names that are actually
    registered (a typo would silently fall out of the driver-window
    rotation policy); the window must hold EXACTLY the driver's 50
    slots and lead the registry ordering."""
    from cassandra_migrate_keyspace_from_cluster_spark import registry

    names = set(registry.specs())
    assert registry._DRIVER_GREEN <= names, registry._DRIVER_GREEN - names
    assert registry._WINDOW <= names, registry._WINDOW - names
    assert len(registry._WINDOW) == 50, len(registry._WINDOW)
    assert set(list(registry.queries())[:50]) == registry._WINDOW
