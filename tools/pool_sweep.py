"""Per-query generated-keyspace sweep: run EVERY oracle-paired
registered query (or a given list) against generated micro-keyspaces
and report which survive.

Originally the pool-EXPANSION triage (which unpooled queries can ride
the generated-keyspace hunt?); its first full r9 run answered that for
good — 149/150 passed as-is and the one failure was a real bug (f4d's
tier-selector stats on a null-leading corpus, fixed with a regression
test) — so tests/test_properties.py::KEYSPACE_POOL now covers the
whole oracle-paired inventory and this tool remains as the DIRECT
sweeper: unlike the hunt's random (query, data) sampling, it
guarantees N examples for EVERY query, which is the right shape for a
round-close exhaustive pass or for pinning one query under suspicion.

Queries whose Spark side writes/stages output (a4*/a9/a13/a16...) run
too: they take only (spark, sf_dir) and manage their own scratch space,
so generated dirs are as good as the fixtures.

Usage: python tools/pool_sweep.py [examples_per_query] [query ...]
       (defaults: 6 examples; every oracle-paired query)
Prints one line per query; exit 1 only on harness errors, not FAILs —
the output is a triage worklist, not a gate.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

import tests.test_properties as tp  # noqa: E402


TABLES = ["region", "nation", "supplier", "customer", "orders",
          "lineitem", "part", "events", "documents", "embeddings"]


def main() -> None:
    import duckdb

    from cassandra_migrate_keyspace_from_cluster_spark import registry
    from cassandra_migrate_keyspace_from_cluster_spark.session import build_session
    from tests.parity import compare_frames

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    registry.load_all()
    wanted = sys.argv[2:] or sorted(
        name for name, spec in registry.QUERIES.items()
        if spec.oracle is not None
    )
    unknown = [w for w in wanted if w not in registry.QUERIES]
    if unknown:
        sys.exit(f"unknown query(s): {unknown}")

    spark = build_session(app_name="pool_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    import pathlib
    import tempfile

    def one_example(ks, qname):
        d = tempfile.mkdtemp(prefix="sweep")
        tp._write_micro_keyspace(d, ks)
        got = registry.QUERIES[qname].fn(spark, d).toPandas()
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
                f"'{os.path.join(d, t + '.parquet')}')"
            )
        want = con.execute(registry.QUERIES[qname].oracle).df()
        compare_frames(got, want, f"{qname}_sweep")

    def make_probe(qname):
        # close over qname via factory — @given rejects default args
        @given(ks=tp._keyspace_st)
        @settings(max_examples=n, deadline=None)
        def probe(ks):
            one_example(ks, qname)

        return probe

    passes, fails = [], []
    for qname in wanted:
        t0 = time.time()
        probe = make_probe(qname)
        try:
            probe()
            passes.append(qname)
            print(f"PASS {qname} ({n} ex, {time.time() - t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — triage list, keep going
            fails.append(qname)
            msg = " | ".join(str(e).splitlines()[:3])[:300]
            print(f"FAIL {qname}: {msg}", flush=True)

    print(f"POOL-SWEEP RESULT: pass={len(passes)} fail={len(fails)}")
    if fails:
        print("fails:", " ".join(fails))


if __name__ == "__main__":
    main()
