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


# Raw double columns every fixture table carries (generator output);
# the r12 NaN-zonemap law (SURVEY §5.4.2) makes any oracle comparison
# over a NaN-able scanned double layout-dependent in DuckDB 1.0, so
# the unguarded comparison sites (b2/b3/b14/b23/b27/b30/d15/e8/g-part
# buckets — audit table in SURVEY §5.4.2) are correct ONLY while these
# columns stay NaN/Inf/NULL-free.
_FIXTURE_DOUBLE_COLS = {
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
    "orders": ["o_totalprice"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "events": ["value"],
}


def test_fixture_doubles_nan_free_tripwire(duck):
    """NaN-zonemap fixture tripwire (VERDICT r12 item 4): the sweep
    closed the unguarded raw-double comparison sites by FIXTURE PROOF
    (verified NaN/Inf/NULL-free at sf0.001/sf0.01/sf0.1 on 2026-08-17),
    not by per-site isnan conversion. This test turns that proof into a
    loud failure: if a driver-side fixture regen ever introduces a
    non-finite or NULL double (or a non-finite embedding element), the
    proof is void and every site in the SURVEY §5.4.2 audit table must
    be re-dispositioned — convert them per the d10 isnan pattern."""
    con = duck(PARITY_SF)
    bad = []
    for tbl, cols in _FIXTURE_DOUBLE_COLS.items():
        for c in cols:
            n = con.execute(
                f"SELECT count(*) FROM {tbl} "
                f"WHERE {c} IS NULL OR isnan({c}) OR isinf({c})"
            ).fetchone()[0]
            if n:
                bad.append((tbl, c, n))
    n_emb = con.execute(
        "SELECT count(*) FROM (SELECT unnest(embedding) AS x FROM embeddings) "
        "WHERE x IS NULL OR isnan(x) OR isinf(x)"
    ).fetchone()[0]
    if n_emb:
        bad.append(("embeddings", "embedding[*]", n_emb))
    assert not bad, (
        "fixture regen introduced non-finite/NULL doubles — the "
        "SURVEY §5.4.2 fixture proof is VOID; isnan-convert the "
        f"unguarded oracle comparison sites: {bad}"
    )
