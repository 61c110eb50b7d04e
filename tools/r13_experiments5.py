"""Round-13 experiments, part 5: f2b single-tokenize-pass A/B.

Old dataflow = stats pass (own tokenize) + postings tier (own
tokenize); new = auto_neardup sharing one persisted token-set frame.
Interleaved in one session, cache cleared per rep."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_migrate_keyspace_from_cluster_spark.operators import dedup as dd
from cassandra_migrate_keyspace_from_cluster_spark.queries.util import t
from cassandra_migrate_keyspace_from_cluster_spark.session import build_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def old_f2b(docs):
    stats = dd.neardup_corpus_stats(docs, ["lang", "source"])
    tier = dd.choose_neardup_tier(
        stats["n_docs"], stats["cand_pairs"], stats["light_pairs"],
        exact_required=True,
    )
    assert tier == "postings", tier
    return dd.jaccard_pairs_postings(docs, ["lang", "source"], 0.6)


def new_f2b(docs):
    return dd.auto_neardup(
        docs, blocking=["lang", "source"], threshold=0.6, exact_required=True
    )


def main():
    spark = build_session(app_name="r13_experiments5")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = t(spark, SF, "documents")
    wdocs = t(spark, "/root/testdata/sf0.001", "documents")
    noop(old_f2b(wdocs))
    noop(new_f2b(wdocs))
    res = {"old": [], "new": []}
    for _ in range(4):
        for name, fn in (("old", old_f2b), ("new", new_f2b)):
            spark.catalog.clearCache()
            start = time.perf_counter()
            noop(fn(docs))
            res[name].append(round(time.perf_counter() - start, 3))
    for name, ts in res.items():
        print(f"f2b {name:4s} min={min(ts):.3f} all={ts}")
    # equality check
    a = sorted(map(tuple, old_f2b(docs).collect()))
    b = sorted(map(tuple, new_f2b(docs).collect()))
    print("equal:", a == b, len(a))


if __name__ == "__main__":
    main()
