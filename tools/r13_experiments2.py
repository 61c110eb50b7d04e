"""Round-13 experiments, part 2: a4 codec A/B, g5 arrow batch size,
f2/f18 component profile."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_migrate_keyspace_from_cluster_spark.queries.util import t
from cassandra_migrate_keyspace_from_cluster_spark.registry import queries
from cassandra_migrate_keyspace_from_cluster_spark.session import build_session
from cassandra_migrate_keyspace_from_cluster_spark.util import scratch_dir_unique

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("R13_REPS", "3"))


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timed(name, fn):
    ts = []
    for _ in range(REPS):
        start = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - start)
    print(f"{name:55s} min={min(ts):.3f} all={[round(x,3) for x in ts]}")
    return min(ts)


def main():
    spark = build_session(app_name="r13_experiments2")
    qs = queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64).mapInPandas(lambda it: it, schema="id: long").write.mode(
        "overwrite"
    ).format("noop").save()

    li = t(spark, SF, "lineitem")
    docs = t(spark, SF, "documents")
    which = set(sys.argv[1:]) or {"a4", "g5", "f2", "f18"}

    if "a4" in which:
        for codec in ["snappy", "lz4", "zstd", "uncompressed"]:
            def roundtrip(codec=codec):
                dst = os.path.join(scratch_dir_unique("r13x_codec"), "li.parquet")
                li.write.mode("overwrite").option("compression", codec).parquet(dst)
                noop(spark.read.parquet(dst))

            timed(f"a4 roundtrip codec={codec}", roundtrip)

    if "g5" in which:
        import pandas as pd

        def net(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "l_orderkey": pdf["l_orderkey"],
                        "l_linenumber": pdf["l_linenumber"],
                        "net_price": (
                            pdf["l_extendedprice"]
                            * (1 - pdf["l_discount"])
                            * (1 + pdf["l_tax"])
                        ).round(6),
                    }
                )

        cols = ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"]
        for batch in [10000, 65536, 200000]:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
            timed(
                f"g5 arrow batch={batch}",
                lambda: noop(
                    li.select(*cols).mapInPandas(
                        net, "l_orderkey bigint, l_linenumber int, net_price double"
                    )
                ),
            )
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")

    if "f2" in which:
        from cassandra_migrate_keyspace_from_cluster_spark.operators import dedup as dd

        # component: the postings build (distinct + explode), uncached
        def postings_build():
            toks = F.array_distinct(F.split("text", " "))
            d = (
                docs.select(
                    F.col("doc_id").alias("id"), "lang", "source",
                    toks.alias("toks"),
                )
                .filter(F.size("toks") > 0)
                .distinct()
                .withColumn("n", F.size("toks"))
            )
            post = d.select("id", "n", "lang", "source", F.explode("toks").alias("tok"))
            return post

        timed("f2 postings build (uncached) noop", lambda: noop(postings_build()))
        spark.catalog.clearCache()
        timed("f2 shipped (cold cache each rep)",
              lambda: (noop(qs["f2_token_jaccard_neardup"](spark, SF)),
                       spark.catalog.clearCache())[0])
        timed("f2 shipped (warm cache)",
              lambda: noop(qs["f2_token_jaccard_neardup"](spark, SF)))

    if "f18" in which:
        from cassandra_migrate_keyspace_from_cluster_spark.operators import dedup as dd
        from cassandra_migrate_keyspace_from_cluster_spark.operators import text as tx

        kept = dd.exact_dedup(docs).select("doc_id", "lang", "text", "n_chars")
        timed("f18 component: exact_dedup noop", lambda: noop(kept))
        q = tx.quality_scores(kept, keep=("lang",)).select("doc_id", "lang", "quality")
        timed("f18 component: dedup+quality noop", lambda: noop(q))
        timed("f18 shipped", lambda: noop(qs["f18_pipeline_report"](spark, SF)))

    print("done")


if __name__ == "__main__":
    main()
