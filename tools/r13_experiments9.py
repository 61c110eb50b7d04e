"""Round-13 experiments, part 9: whole-headline-set conf A/B.

Runs the bench's headline loop under conf variants in ONE session
(runtime-settable confs only), interleaved, min-of-K per query.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from cassandra_migrate_keyspace_from_cluster_spark.registry import queries
from cassandra_migrate_keyspace_from_cluster_spark.session import build_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

VARIANTS = {
    "base": {},
    "minpart64k": {"spark.sql.adaptive.coalescePartitions.minPartitionSize": "65536"},
}


def main():
    spark = build_session(app_name="r13_experiments9")
    qs = queries()
    names = [n for n in HEADLINE if n in qs]
    # warm every query once at sf0.001 (codegen) and stage f4
    from cassandra_migrate_keyspace_from_cluster_spark.operators.similarity import (
        prestage_cosine_corpus,
    )
    from cassandra_migrate_keyspace_from_cluster_spark.queries.util import t as _t

    prestage_cosine_corpus(_t(spark, SF, "embeddings"), corpus_key=SF)
    for n in names:
        qs[n](spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop"
        ).save()

    res = {v: {n: [] for n in names} for v in VARIANTS}
    defaults = {
        k: spark.conf.get(k) for v in VARIANTS.values() for k in v
    }
    for rep in range(3):
        for vname, confs in VARIANTS.items():
            for k, dv in defaults.items():
                spark.conf.set(k, confs.get(k, dv))
            for n in names:
                start = time.perf_counter()
                qs[n](spark, SF).write.mode("overwrite").format("noop").save()
                res[vname][n].append(round(time.perf_counter() - start, 3))
    for vname, per in res.items():
        mins = {n: min(ts) for n, ts in per.items()}
        print(f"{vname:12s} total={sum(mins.values()):7.3f}")
        for n, v in mins.items():
            print(f"   {n:28s} {v:6.3f}  {per[n]}")


if __name__ == "__main__":
    main()
