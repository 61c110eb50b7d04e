"""Round-13 experiments, part 7: does persisting the KMeans input help?
Same-session interleaved A/B for the f42b-shaped flow."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import functions as F

from cassandra_migrate_keyspace_from_cluster_spark.operators.similarity import (
    _dup_flags_within,
    with_double_embedding,
)
from cassandra_migrate_keyspace_from_cluster_spark.queries.util import t
from cassandra_migrate_keyspace_from_cluster_spark.session import build_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def f42b_flow(emb, persist_input):
    e = with_double_embedding(emb).select(F.col("vec_id").alias("vec_id"), "emb")
    d = e.withColumn("features", array_to_vector("emb"))
    if persist_input:
        d = d.persist()
    n = d.count()
    model = KMeans(k=min(16, n), seed=42, maxIter=10, featuresCol="features").fit(d)
    assigned = model.transform(d).select(
        "vec_id", "emb", F.col("prediction").cast("bigint").alias("cluster_id")
    )
    return _dup_flags_within(assigned, 0.8)


def main():
    spark = build_session(app_name="r13_experiments7")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    emb = t(spark, SF, "embeddings")
    wemb = t(spark, "/root/testdata/sf0.001", "embeddings")
    noop(f42b_flow(wemb, False))
    res = {"nopersist": [], "persist": []}
    for _ in range(4):
        for name, flag in (("nopersist", False), ("persist", True)):
            spark.catalog.clearCache()
            start = time.perf_counter()
            noop(f42b_flow(emb, flag))
            res[name].append(round(time.perf_counter() - start, 3))
    for name, ts in res.items():
        print(f"f42b kmeans-input {name:10s} min={min(ts):.3f} all={ts}")


if __name__ == "__main__":
    main()
