"""Round-13 experiments, part 6: f42 assigned-persist A/B."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from cassandra_migrate_keyspace_from_cluster_spark.functions.vector import cosine
from cassandra_migrate_keyspace_from_cluster_spark.operators import similarity as sim
from cassandra_migrate_keyspace_from_cluster_spark.operators.similarity import (
    with_double_embedding,
)
from cassandra_migrate_keyspace_from_cluster_spark.queries.util import t
from cassandra_migrate_keyspace_from_cluster_spark.session import build_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def dup_flags_nopersist(assigned, threshold):
    earlier = assigned.select(
        F.col("vec_id").alias("vec_b"),
        F.col("emb").alias("emb_b"),
        F.col("cluster_id").alias("cluster_b"),
    )
    dup_counts = (
        assigned.join(
            earlier,
            (F.col("cluster_id") == F.col("cluster_b"))
            & (F.col("vec_b") < F.col("vec_id")),
        )
        .filter(F.round(cosine(F.col("emb"), F.col("emb_b")), 6) >= threshold)
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n_dup_partners"))
    )
    return (
        assigned.join(dup_counts, "vec_id", "left")
        .select(
            "vec_id",
            "cluster_id",
            F.coalesce(F.col("n_dup_partners"), F.lit(0))
            .cast("bigint")
            .alias("n_dup_partners"),
        )
        .withColumn("is_dup", (F.col("n_dup_partners") > 0).cast("bigint"))
    )


def assigned_frame(emb):
    e = (
        with_double_embedding(emb)
        .select(F.col("vec_id").alias("vec_id"), "emb")
        .distinct()
    )
    seeds = (
        e.orderBy("vec_id")
        .limit(8)
        .select(F.col("vec_id").alias("seed_id"), F.col("emb").alias("semb"))
    )
    scored = e.crossJoin(F.broadcast(seeds)).select(
        "vec_id", "emb", "seed_id",
        F.round(cosine(F.col("emb"), F.col("semb")), 6).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("seed_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "emb", F.col("seed_id").alias("cluster_id"))
    )


def main():
    spark = build_session(app_name="r13_experiments6")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    emb = t(spark, SF, "embeddings")
    wemb = t(spark, "/root/testdata/sf0.001", "embeddings")
    noop(dup_flags_nopersist(assigned_frame(wemb), 0.8))
    noop(sim.semantic_dedup(wemb))
    res = {"old": [], "new": []}
    for _ in range(4):
        for name, fn in (
            ("old", lambda: dup_flags_nopersist(assigned_frame(emb), 0.8)),
            ("new", lambda: sim.semantic_dedup(emb)),
        ):
            spark.catalog.clearCache()
            start = time.perf_counter()
            noop(fn())
            res[name].append(round(time.perf_counter() - start, 3))
    for name, ts in res.items():
        print(f"f42 {name:4s} min={min(ts):.3f} all={ts}")
    a = sorted(map(tuple, dup_flags_nopersist(assigned_frame(emb), 0.8).collect()))
    b = sorted(map(tuple, sim.semantic_dedup(emb).collect()))
    print("equal:", a == b, len(a))


if __name__ == "__main__":
    main()
