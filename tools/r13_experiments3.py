"""Round-13 experiments, part 3: f2 persist-strategy A/B."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_migrate_keyspace_from_cluster_spark.operators.dedup import tokens
from cassandra_migrate_keyspace_from_cluster_spark.queries.util import t
from cassandra_migrate_keyspace_from_cluster_spark.registry import queries
from cassandra_migrate_keyspace_from_cluster_spark.session import build_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("R13_REPS", "4"))


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timed(name, fn, clear=True):
    ts = []
    for _ in range(REPS):
        spark = build_session()
        if clear:
            spark.catalog.clearCache()
        start = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - start)
    print(f"{name:55s} min={min(ts):.3f} all={[round(x,3) for x in ts]}")
    return min(ts)


def build_variant(docs, blocking, threshold, persist_mode):
    d = docs.select(
        F.col("doc_id").alias("id"),
        *[F.col(b) for b in blocking],
        F.array_distinct(tokens("text")).alias("toks"),
    ).distinct().withColumn("n", F.size("toks"))
    if persist_mode == "pre_explode":
        d = d.persist()
    post = d.select("id", "n", *blocking, F.explode("toks").alias("tok"))
    if persist_mode == "post":
        post = post.persist()
    a, b = post.alias("a"), post.alias("b")
    cond = [F.col("a.tok") == F.col("b.tok")]
    cond += [F.col(f"a.{k}") == F.col(f"b.{k}") for k in blocking]
    cond.append(F.col("a.id") < F.col("b.id"))
    inter = (
        a.join(b, cond)
        .groupBy(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("inter")
    ).cast("double")
    return inter.select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def main():
    spark = build_session(app_name="r13_experiments3")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = t(spark, SF, "documents")
    blocking = ["lang", "source"]

    # codegen warmup for all variants at tiny scale
    wdocs = t(spark, "/root/testdata/sf0.001", "documents")
    for mode in ["post", "pre_explode", "none"]:
        noop(build_variant(wdocs, blocking, 0.6, mode))
    spark.catalog.clearCache()

    for mode in ["post", "pre_explode", "none"]:
        timed(
            f"f2 variant persist={mode} (cold cache per rep)",
            lambda m=mode: noop(build_variant(docs, blocking, 0.6, m)),
        )
    # row-count sanity: all variants agree
    a = build_variant(docs, blocking, 0.6, "none").count()
    b = build_variant(docs, blocking, 0.6, "post").count()
    print("counts", a, b)
    print("done")


if __name__ == "__main__":
    main()
