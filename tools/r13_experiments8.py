"""Round-13 experiments, part 8: a15 persist A/B (interleaved)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_migrate_keyspace_from_cluster_spark.operators import migrate as mig
from cassandra_migrate_keyspace_from_cluster_spark.queries.util import t
from cassandra_migrate_keyspace_from_cluster_spark.session import build_session
from cassandra_migrate_keyspace_from_cluster_spark.util import bounded_persist

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def a15(spark, sf_dir, persist):
    base = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    ).distinct()
    k = F.col("o_orderkey")
    kept = base.filter(k % 101 != 0).withColumn(
        "o_orderstatus",
        F.when(k % 103 == 0, "X").otherwise(F.col("o_orderstatus")),
    )
    extra = base.filter(k % 107 == 0).withColumn("o_orderkey", k + 10000000)
    target = kept.unionByName(extra)
    cols = ("o_orderkey", "o_orderstatus", "o_orderpriority")
    plan = mig.snapshot_diff(base, target, "o_orderkey", cols)
    if persist:
        plan = bounded_persist(plan)
    remove_keys = plan.filter(
        F.col("action").isin("delete", "recopy")
    ).select("o_orderkey")
    fetch_keys = plan.filter(
        F.col("action").isin("copy", "recopy")
    ).select("o_orderkey")
    repaired = target.join(remove_keys, "o_orderkey", "left_anti").unionByName(
        base.join(fetch_keys, "o_orderkey", "left_semi")
    )
    if persist:
        repaired = bounded_persist(repaired)
    post = mig.snapshot_diff(base, repaired, "o_orderkey", cols)
    action_spine = spark.createDataFrame(
        [("copy",), ("recopy",), ("delete",)], "action string"
    )
    applied = (
        action_spine.join(
            plan.groupBy("action").agg(F.count(F.lit(1)).alias("n")),
            "action",
            "left",
        )
        .select(
            F.concat(F.lit("applied_"), F.col("action")).alias("metric"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        )
    )
    post_n = post.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("post_repair_diffs").alias("metric"), "n"
    )
    rows_n = repaired.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("rows_after_repair").alias("metric"), "n"
    )
    return applied.unionByName(post_n).unionByName(rows_n)


def main():
    spark = build_session(app_name="r13_experiments8")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    wsf = "/root/testdata/sf0.001"
    noop(a15(spark, wsf, False))
    noop(a15(spark, wsf, True))
    res = {"old": [], "new": []}
    for _ in range(4):
        for name, flag in (("old", False), ("new", True)):
            spark.catalog.clearCache()
            start = time.perf_counter()
            noop(a15(spark, SF, flag))
            res[name].append(round(time.perf_counter() - start, 3))
    for name, ts in res.items():
        print(f"a15 {name:4s} min={min(ts):.3f} all={ts}")
    a = sorted(map(tuple, a15(spark, SF, False).collect()))
    b = sorted(map(tuple, a15(spark, SF, True).collect()))
    print("equal:", a == b, a)


if __name__ == "__main__":
    main()
