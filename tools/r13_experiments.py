"""Round-13 optimization experiments: isolate per-query component costs
at sf0.1 on a warmed session (guide SS1: measure first; noop sink).

Each experiment runs REPS times; report min. Not part of the bench
contract - a scratch measurement harness.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from cassandra_migrate_keyspace_from_cluster_spark.queries.util import t
from cassandra_migrate_keyspace_from_cluster_spark.registry import queries
from cassandra_migrate_keyspace_from_cluster_spark.session import build_session

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
    spark = build_session(app_name="r13_experiments")
    qs = queries()
    # warm: codegen + python workers
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64).mapInPandas(lambda it: it, schema="id: long").write.mode(
        "overwrite"
    ).format("noop").save()

    li = t(spark, SF, "lineitem")
    docs = t(spark, SF, "documents")

    which = set(sys.argv[1:]) or {"b5", "g5", "a4", "f7", "f8", "scan"}

    if "scan" in which:
        spark.sparkContext.setJobDescription("scan: lineitem all cols")
        timed("scan lineitem (all cols) noop", lambda: noop(li))
        timed("scan lineitem (7 cols b5 set) noop",
              lambda: noop(li.select("l_quantity", "l_extendedprice",
                                     "l_discount", "l_tax", "l_returnflag",
                                     "l_linestatus", "l_shipdate")))
        timed("scan documents noop", lambda: noop(docs))
        timed("scan lineitem + repartition(32) noop",
              lambda: noop(li.repartition(32)))

    if "b5" in which:
        spark.sparkContext.setJobDescription("b5 experiments")
        timed("b5 shipped", lambda: noop(qs["b5_agg_groupby"](spark, SF)))

        def b5_fanout():
            from cassandra_migrate_keyspace_from_cluster_spark.queries.part_b_relational import (
                b5_agg_groupby,
            )
            # simulate fan-out by monkey-free reconstruction: repartition
            # the filtered+projected scan before the aggregation
            df = b5_agg_groupby(spark, SF)
            return df

        # manual fan-out variant of the same aggregate
        from cassandra_migrate_keyspace_from_cluster_spark.functions.rounding import (
            cents,
            exact_round_ratio,
            dec_sum,
        )

    if "g5" in which:
        spark.sparkContext.setJobDescription("g5 experiments")
        timed("g5 shipped", lambda: noop(qs["g5_map_in_pandas"](spark, SF)))

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
        timed(
            "g5 + repartition(32) before mapInPandas",
            lambda: noop(
                li.select(*cols).repartition(32).mapInPandas(
                    net, "l_orderkey bigint, l_linenumber int, net_price double"
                )
            ),
        )

    if "a4" in which:
        spark.sparkContext.setJobDescription("a4 experiments")
        from cassandra_migrate_keyspace_from_cluster_spark.util import (
            scratch_dir_unique,
        )

        timed("a4 shipped", lambda: noop(qs["a4_copy_roundtrip"](spark, SF)))

        def write_only():
            dst = scratch_dir_unique("r13x_a4w")
            li.write.mode("overwrite").parquet(os.path.join(dst, "lineitem.parquet"))

        timed("a4 write only (1 task)", write_only)

        def write_fanout():
            dst = scratch_dir_unique("r13x_a4f")
            li.repartition(32).write.mode("overwrite").parquet(
                os.path.join(dst, "lineitem.parquet")
            )

        timed("a4 write repartition(32)", write_fanout)

        # read-back cost of a 1-file copy
        dst0 = scratch_dir_unique("r13x_a4r")
        li.write.mode("overwrite").parquet(os.path.join(dst0, "lineitem.parquet"))
        timed(
            "a4 read-back only (1 file)",
            lambda: noop(spark.read.parquet(os.path.join(dst0, "lineitem.parquet"))),
        )

    if "f7" in which:
        spark.sparkContext.setJobDescription("f7 experiments")
        timed("f7 shipped", lambda: noop(qs["f7_tokenize_wordcount"](spark, SF)))

        from cassandra_migrate_keyspace_from_cluster_spark.operators import text as tx

        def f7_window():
            order = [F.col("n").desc(), F.col("token").asc()]
            top = tx.word_counts(docs).orderBy(*order).limit(50)
            w = Window.orderBy(*order)
            return top.select(
                "token", "n", F.row_number().over(w).cast("bigint").alias("rank")
            )

        timed("f7 window-over-limit50 variant", lambda: noop(f7_window()))

    if "f8" in which:
        spark.sparkContext.setJobDescription("f8 experiments")
        timed("f8 shipped", lambda: noop(qs["f8_tfidf"](spark, SF)))

        def f8_doclen_at_scan():
            toks = F.split("text", " ")
            ex = docs.select(
                "doc_id",
                F.size(toks).cast("bigint").alias("doc_len"),
                F.explode(toks).alias("token"),
            )
            tc = ex.groupBy("doc_id", "doc_len", "token").agg(
                F.count(F.lit(1)).alias("cnt")
            )
            n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
            tf = F.col("cnt").cast("double") / F.col("doc_len")
            idf = F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
            return (
                tc.withColumn(
                    "df", F.count(F.lit(1)).over(Window.partitionBy("token"))
                )
                .crossJoin(F.broadcast(n_docs))
                .select(
                    "doc_id",
                    "token",
                    F.round(tf, 6).alias("tf"),
                    F.round(idf, 6).alias("idf"),
                    F.round(tf * idf, 6).alias("tfidf"),
                )
            )

        timed("f8 doclen-at-scan variant", lambda: noop(f8_doclen_at_scan()))

    print("done")


if __name__ == "__main__":
    main()
