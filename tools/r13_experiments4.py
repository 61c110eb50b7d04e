"""Round-13 experiments, part 4: interleaved A/B for a4 codec and f2
persist variants under bench-like (warm-cache min-of-K) conditions."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_migrate_keyspace_from_cluster_spark.operators.dedup import tokens
from cassandra_migrate_keyspace_from_cluster_spark.queries.util import t
from cassandra_migrate_keyspace_from_cluster_spark.session import build_session
from cassandra_migrate_keyspace_from_cluster_spark.util import scratch_dir_unique

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def build_f2(docs, persist_mode):
    blocking = ["lang", "source"]
    d = docs.select(
        F.col("doc_id").alias("id"), "lang", "source",
        F.array_distinct(tokens("text")).alias("toks"),
    ).distinct().withColumn("n", F.size("toks"))
    if persist_mode == "pre_explode":
        d = d.persist()
    post = d.select("id", "n", "lang", "source", F.explode("toks").alias("tok"))
    if persist_mode == "post":
        post = post.persist()
    a, b = post.alias("a"), post.alias("b")
    cond = [F.col("a.tok") == F.col("b.tok"),
            F.col("a.lang") == F.col("b.lang"),
            F.col("a.source") == F.col("b.source"),
            F.col("a.id") < F.col("b.id")]
    inter = (
        a.join(b, cond)
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"),
                 F.col("a.n").alias("n_a"), F.col("b.n").alias("n_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double")
    return inter.select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
                        ).filter(F.col("jaccard") >= 0.6)


def main():
    spark = build_session(app_name="r13_experiments4")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    li = t(spark, SF, "lineitem")
    docs = t(spark, SF, "documents")
    which = set(sys.argv[1:]) or {"a4", "f2"}

    if "a4" in which:
        # interleaved codec A/B, 5 rounds, fresh dst per write like a4
        res = {"snappy": [], "zstd": []}
        # warm both codec paths first
        for codec in ("snappy", "zstd"):
            dst = os.path.join(scratch_dir_unique("r13x4w"), "li.parquet")
            li.write.mode("overwrite").option("compression", codec).parquet(dst)
            noop(spark.read.parquet(dst))
        for _ in range(5):
            for codec in ("snappy", "zstd"):
                dst = os.path.join(scratch_dir_unique("r13x4"), "li.parquet")
                start = time.perf_counter()
                li.write.mode("overwrite").option("compression", codec).parquet(dst)
                noop(spark.read.parquet(dst))
                res[codec].append(round(time.perf_counter() - start, 3))
        for codec, ts in res.items():
            print(f"a4 roundtrip {codec:8s} min={min(ts):.3f} all={ts}")

    if "f2" in which:
        # bench-like: per variant, 3 reps WITHOUT clearing cache between
        # reps (cache cleared only between variants), interleaved twice
        for trial in range(2):
            for mode in ("post", "pre_explode"):
                spark.catalog.clearCache()
                ts = []
                for _ in range(3):
                    start = time.perf_counter()
                    noop(build_f2(docs, mode))
                    ts.append(round(time.perf_counter() - start, 3))
                print(f"f2 warm-min trial{trial} {mode:12s} min={min(ts):.3f} all={ts}")
    print("done")


if __name__ == "__main__":
    main()
