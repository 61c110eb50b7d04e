"""Scale sweep: run every hash-checkable query against its DuckDB
oracle at a LARGER scale factor than the correctness gate (default
sf0.1 vs the gate's sf0.01).

Why this exists (SURVEY.md §5.3 item 7): the per-round driver gate
compares engines at sf0.01, where size-dependent divergence hides —
float-summation noise crossing a rounding boundary, integer overflow,
quadratic plans that still finish fast. The first run of this sweep
caught three real rounding divergences (f14/f32 half-boundary
round(double,6); g3/b4/b5 summation-order noise at 6dp) and one
quadratic plan cliff (b15b) — all at sf0.1, all invisible at sf0.01.

Usage:  python tools/scale_sweep.py [sf_dir]    (default sf0.1)
Prints one line per query and a final JSON summary. Oracles run in a
subprocess with a timeout so a slow DuckDB plan cannot hang the sweep.
"""

import json
import multiprocessing as mp
import os
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Documented exclusions (see the query docstrings):
#   b15b — Spark's native RewriteAsOfJoin plans a BNLJ quadratic in
#          time-key cardinality; >240 s at sf0.1. API-surface check
#          only; kept at the gate SF.
SKIP = {"b15b_asof_pandas_api"}


def run_oracle(sql, sf_dir, q):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    q.put(con.execute(sql).df())


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    bad = {}
    n_checked = 0
    for name in qs:
        if name not in oracles or name in SKIP:
            continue
        n_checked += 1
        t0 = time.time()
        try:
            a = qs[name](spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            bad[name] = f"SPARK_ERROR {type(ex).__name__}: {str(ex)[:150]}"
            print(f"{name}: {bad[name]}", flush=True)
            continue
        q = mp.Queue()
        p = mp.Process(target=run_oracle, args=(oracles[name], sf_dir, q))
        p.start()
        try:
            b = q.get(timeout=240)
        except Exception:  # noqa: BLE001 — timeout/crash both land here
            p.kill()
            p.join()
            bad[name] = "ORACLE_TIMEOUT"
            print(f"{name}: ORACLE_TIMEOUT", flush=True)
            continue
        p.join()
        a = a[sorted(a.columns)].sort_values(by=sorted(a.columns)).reset_index(drop=True)
        b = b[sorted(b.columns)].sort_values(by=sorted(b.columns)).reset_index(drop=True)
        if len(a) != len(b):
            bad[name] = f"ROWS {len(a)} vs {len(b)}"
        elif sorted(a.columns) != sorted(b.columns):
            bad[name] = f"SCHEMA {sorted(a.columns)} vs {sorted(b.columns)}"
        elif not a.astype(str).equals(b.astype(str)):
            n_diff = (a.astype(str) != b.astype(str)).any(axis=1).sum()
            bad[name] = f"VALUES {n_diff} differing rows of {len(a)}"
        status = bad.get(name, "OK")
        print(f"{name}: {status} ({time.time() - t0:.1f}s)", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "checked": n_checked,
                      "skipped": sorted(SKIP), "bad": bad}), flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
