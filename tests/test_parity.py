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
    """_DRIVER_GREEN / _NEW_THIS_ROUND must only contain names that are
    actually registered — a typo would silently fall out of the
    driver-window rotation policy."""
    from cassandra_migrate_keyspace_from_cluster_spark import registry

    names = set(registry.specs())
    assert registry._DRIVER_GREEN <= names, registry._DRIVER_GREEN - names
    assert registry._NEW_THIS_ROUND <= names, registry._NEW_THIS_ROUND - names
