"""Round-13 full-registry timing sweep: one noop-sink execution per
registered query at sf0.1 (cold-ish: single warmed session, registry
order). Purpose: find non-headline stragglers for the optimization
checklist. NOT the bench — single rep, relative numbers only.

Usage: python tools/r13_sweep_timing.py [start_idx] [end_idx]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_migrate_keyspace_from_cluster_spark.registry import queries
from cassandra_migrate_keyspace_from_cluster_spark.session import build_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SKIP = {"b15b_asof_pandas_api"}  # guarded-quadratic API surface; >240s at sf0.1


def main():
    spark = build_session(app_name="r13_sweep")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64).mapInPandas(lambda it: it, schema="id: long").write.mode(
        "overwrite"
    ).format("noop").save()
    qs = queries()
    names = list(qs)
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else len(names)
    out = {}
    for name in names[lo:hi]:
        if name in SKIP:
            print(f"{name:40s} SKIP (declared)")
            continue
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        start = time.perf_counter()
        try:
            qs[name](spark, SF).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - start
            out[name] = round(dt, 3)
            print(f"{name:40s} {dt:7.3f}")
        except Exception as exc:
            out[name] = f"ERR {type(exc).__name__}"
            print(f"{name:40s} ERR {type(exc).__name__}: {str(exc)[:120]}")
        sys.stdout.flush()
    with open(f"/tmp/r13_sweep_{lo}_{hi}.json", "w") as fh:
        json.dump(out, fh, indent=1)
    slow = sorted(
        ((v, k) for k, v in out.items() if isinstance(v, float)), reverse=True
    )[:25]
    print("\nSLOWEST 25:")
    for v, k in slow:
        print(f"{k:40s} {v:7.3f}")


if __name__ == "__main__":
    main()
