"""Input row-order invariance probe: every registered query must
produce IDENTICAL results when the physical row order (and row-group
layout) of every input table is permuted.

Why this exists (SURVEY.md §5.3 posture — probe off-gate axes the
per-round driver cannot see): every gate — the driver's t2, the parity
suite, the scale sweep, even the conf-invariance probe — reads the
fixtures in their on-disk row order. On a real cluster scan order is an
accident of task scheduling and file layout, so any query whose answer
depends on physical order passes every gate here and silently breaks
there. The classes this catches:

  - ``collect_list``/``listagg`` aggregates whose array/string output
    is not explicitly sorted (Spark documents them non-deterministic
    under reordering — the house law says every one carries a sort);
  - ``first``/``last``/``min_by``-style picks without a total order
    (incl. dedup survivor choices);
  - ``LIMIT``/top-k with an incomplete tie-break (two rows tied on the
    sort key swap in and out of the cut line as scan order changes);
  - Python-crossing ops with per-batch or per-partition state that
    leaks input order into the answer.

Mechanics: each fixture table is rewritten once into a scratch dir via
pyarrow with a seeded deterministic permutation of its rows and a
3-row-group layout (perturbing both intra-file order and row-group
boundaries — the schema bytes, incl. the NTZ timestamp encoding the
loader normalizes, are preserved exactly). The inventory then runs
against the original dir and the permuted dir in one session and
compares with the same order-insensitive cell-exact normalization as
every other gate (tests/parity.py).

Rows-only queries (seeded sketches — see conf_invariance) are WARN on
drift, FAIL only on error: MLlib MinHash/KMeans internals may iterate
in input order, which is exactly the approx contract those tiers
declare; their semantic floors are the recall/containment pytest laws.

Usage: python tools/order_invariance.py [sf_dir] [seed]
       (defaults: /root/testdata/sf0.001, seed 8)
Prints one line per divergence and a final summary; exit 1 on FAIL.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def permute_fixtures(sf_dir: str, out_dir: str, seed: int) -> None:
    """Write a permuted copy of every fixture table into ``out_dir``.

    pyarrow ``Table.take`` preserves the parquet logical types exactly
    (a Spark rewrite would re-encode timestamps and lose the NTZ-drift
    coverage the loader is tested for), and ``row_group_size`` forces a
    multi-row-group layout so split boundaries move too.
    """
    import numpy as np
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    for name in TABLES:
        src = os.path.join(sf_dir, f"{name}.parquet")
        tbl = pq.read_table(src)
        n = tbl.num_rows
        perm = rng.permutation(n)
        permuted = tbl.take(perm)
        pq.write_table(
            permuted,
            os.path.join(out_dir, f"{name}.parquet"),
            row_group_size=max(1, (n + 2) // 3),
        )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from cassandra_migrate_keyspace_from_cluster_spark.registry import specs
    from cassandra_migrate_keyspace_from_cluster_spark.session import build_session
    from tests.parity import compare_frames

    perm_dir = tempfile.mkdtemp(prefix="order_inv_")
    try:
        permute_fixtures(sf_dir, perm_dir, seed)
        spark = build_session(app_name="order_invariance")
        spark.sparkContext.setLogLevel("ERROR")
        all_specs = specs()

        t_all = time.time()
        print(f"baseline: {len(all_specs)} queries at {sf_dir}; "
              f"permuted copy at {perm_dir} (seed {seed})", flush=True)
        fails: list[str] = []
        warns: list[str] = []
        base_err: dict[str, str] = {}
        n_ok = 0
        for name, spec in all_specs.items():
            rows_only = spec.oracle is None
            try:
                base = spec.fn(spark, sf_dir).toPandas()
            except Exception as ex:  # noqa: BLE001 — record, probe the rest
                base_err[name] = f"{type(ex).__name__}: {str(ex)[:160]}"
                print(f"BASELINE-ERROR {name}: {base_err[name]}", flush=True)
                continue
            try:
                got = spec.fn(spark, perm_dir).toPandas()
                compare_frames(base, got, f"order/{name}")
                n_ok += 1
            except AssertionError as diff:
                line = str(diff).splitlines()[0][:200]
                if rows_only:
                    warns.append(name)
                    print(f"WARN drift (rows-only) {name}: {line}", flush=True)
                else:
                    fails.append(name)
                    print(f"FAIL {name}: {line}", flush=True)
            except Exception as ex:  # noqa: BLE001
                fails.append(name)
                print(f"FAIL {name}: {type(ex).__name__}: {str(ex)[:160]}",
                      flush=True)
        print(
            f"ORDER-INVARIANCE RESULT: {n_ok}/{len(all_specs) - len(base_err)} "
            f"identical fails={fails or 'none'} "
            f"rows-only-drift={warns or 'none'} "
            f"baseline-errors={sorted(base_err) or 'none'} "
            f"({time.time() - t_all:.0f}s)"
        )
        sys.exit(1 if (fails or base_err) else 0)
    finally:
        shutil.rmtree(perm_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
