"""Round-14 optimization experiments (guide §1: measure first; noop
sink; interleaved same-session A/B with min-of-K — the only credible
delta on a load-banded host). Scratch harness, not part of the bench
contract.

Experiments:
  cc    — CC loops (f21/f21b/f23/f47): eager per-frame localCheckpoint
          jobs (r13 baseline) vs lazy checkpoint folded into the
          round's convergence aggregate (VERDICT r13 item 4). Also
          reports driver job counts per variant via job groups.
  a15   — a15_repair_apply: status quo vs localCheckpoint on the
          3x-referenced diff frame (VERDICT r13 item 6).
  kmeans— f42b/f5b/f3/f5/f33 MLlib iteration cost (VERDICT r13 item 5).
  e21   — e21_commitlog_replay micro-batch machinery (VERDICT r13
          item 7).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_migrate_keyspace_from_cluster_spark.queries.util import t
from cassandra_migrate_keyspace_from_cluster_spark.registry import queries
from cassandra_migrate_keyspace_from_cluster_spark.session import build_session
from cassandra_migrate_keyspace_from_cluster_spark.util import drain_persisted

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("R14_REPS", "4"))


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def interleaved_ab(spark, name, variants):
    """variants: {label: thunk}. Runs A,B,A,B,... REPS times each,
    draining the cache before every run; reports per-variant min and
    the job count of the LAST run of each variant."""
    times: dict[str, list[float]] = {k: [] for k in variants}
    jobs: dict[str, int] = {}
    tracker = spark.sparkContext.statusTracker()
    for rep in range(REPS):
        for label, thunk in variants.items():
            drain_persisted()
            spark.catalog.clearCache()
            group = f"{name}:{label}:rep{rep}"
            spark.sparkContext.setJobGroup(group, group)
            start = time.perf_counter()
            thunk()
            times[label].append(time.perf_counter() - start)
            jobs[label] = len(tracker.getJobIdsForGroup(group))
    for label, ts in times.items():
        print(
            f"{name}/{label:18s} min={min(ts):.3f} jobs={jobs[label]:3d} "
            f"all={[round(x, 3) for x in ts]}"
        )


def main():
    spark = build_session(app_name="r14_experiments")
    qs = queries()
    # warm: codegen + python workers
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64).mapInPandas(lambda it: it, schema="id: long").write.mode(
        "overwrite"
    ).format("noop").save()

    which = set(sys.argv[1:]) or {"cc"}

    if "cc" in which:
        from cassandra_migrate_keyspace_from_cluster_spark.operators import (
            dedup as dd,
        )

        lazy = dd._loop_ckpt  # current (r14) implementation

        def eager(df):
            return df.localCheckpoint()

        for qname in ("f21_neardup_clusters", "f21b_neardup_clusters_star",
                      "f23_dedup_suppression", "f47_cluster_quality"):
            if qname not in qs:
                continue
            # warm this query's codegen once per variant
            def run():
                noop(qs[qname](spark, SF))

            dd._loop_ckpt = eager
            run()
            dd._loop_ckpt = lazy
            run()

            def run_eager():
                dd._loop_ckpt = eager
                try:
                    noop(qs[qname](spark, SF))
                finally:
                    dd._loop_ckpt = lazy

            interleaved_ab(
                spark, qname, {"eager_ckpt": run_eager, "lazy_ckpt": run}
            )

    spark.stop()


if __name__ == "__main__":
    main()
