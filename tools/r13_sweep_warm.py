"""Round-13 warm re-timing of the cold-sweep stragglers: 3 reps each in
one session (min = steady-state), registry heavies only."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_migrate_keyspace_from_cluster_spark.registry import queries
from cassandra_migrate_keyspace_from_cluster_spark.session import build_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEAVIES = [
    "f21_neardup_clusters",
    "f42_semantic_dedup",
    "f42b_semantic_dedup_kmeans",
    "a15_repair_apply",
    "f3_minhash_lsh",
    "f40_incremental_dedup",
    "f24_minhash_pinned_lsh",
    "f17b_wav_decode_features",
    "f47_cluster_quality",
    "b4_agg_global",
    "a1_cluster_scan",
    "f5_ann_lsh",
    "f5b_ivf_topk",
    "f21b_neardup_clusters_star",
    "a10_throttled_copy",
    "f33_pq_topk",
    "a9_resumable_copy",
    "a4f_copy_compacted",
    "f4c_cosine_topk_chunked",
    "c16_ntile_pctrank",
    "b26_tpch_q10_shaped",
    "c25_count_min",
    "e21_commitlog_replay",
    "f2b_auto_neardup",
    "f23_dedup_suppression",
]


def main():
    spark = build_session(app_name="r13_sweep_warm")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = queries()
    names = sys.argv[1:] or HEAVIES
    for name in names:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        ts = []
        for _ in range(3):
            start = time.perf_counter()
            qs[name](spark, SF).write.mode("overwrite").format("noop").save()
            ts.append(round(time.perf_counter() - start, 3))
        print(f"{name:40s} min={min(ts):7.3f} all={ts}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
