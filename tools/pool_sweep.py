"""Pool-expansion sweep: run EVERY oracle-paired registered query (or a
given list) against generated micro-keyspaces and report which survive.

The randomized micro-driver families (tests/test_properties.py,
tools/property_hunt.py) curate per-family query pools; this tool
answers "which of the remaining oracle-paired queries can ride the
generated-keyspace hunt as-is?" so the pools can grow to the whole
inventory instead of a hand-picked subset. A FAIL here is triaged, not
auto-filed: it is either (a) a genuine engine/oracle divergence — fix
it — or (b) a fixture-contract the generator does not satisfy (e.g. a
query that embeds fixture-derived constants or needs minimum data
richness) — then the exclusion gets a documented reason.

Queries whose Spark side writes/stages output (a4*/a9/a13/a16...) run
too: they take only (spark, sf_dir) and manage their own scratch space,
so generated dirs are as good as the fixtures.

Usage: python tools/pool_sweep.py [examples_per_query] [query ...]
       (defaults: 6 examples; all oracle-paired queries not already in
        a property_hunt family pool)
Prints one line per query; exit 1 only on harness errors, not FAILs —
the output is a triage worklist, not a gate.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

import tests.test_properties as tp  # noqa: E402

# the queries already pooled in tools/property_hunt.py families
POOLED = {
    "b5_agg_groupby", "b4_agg_global", "c1_rollup", "c20_unpivot",
    "c3_grouping_sets", "b36_skew_profile",
    "e1_tumbling", "e2_sliding", "e3_session", "e7_event_funnel",
    "e12_out_of_order_profile", "e16_peak_concurrency",
    "c14_frame_range", "c12_lag_lead", "c17_first_last",
    "f1_exact_dedup", "f7_tokenize_wordcount", "f9_ngrams",
    "f13_langid", "f14_quality", "f15_token_count",
    "f16_fingerprint", "f22_redact_pii", "f26_repetition",
    "f27_rule_filters", "f35_token_spectrum", "f12_doc_length_dedup_rate",
    "f4_cosine_topk", "f4b_cosine_neardup", "f19_quantize_int8",
    "f6_centroid_knn", "f46_embedding_outliers",
    "b8_join_inner_eq", "b9_join_multiway_star", "b10_join_outer",
    "b11_join_semi", "b12_join_anti", "b25_tpch_q3_shaped",
    "b26_tpch_q10_shaped", "a18_referential_check",
    "a5_range_partition_counts", "a7_table_counts", "a8_content_checksum",
    "b14_join_theta_range", "d4_datetime", "f11_multimodal_join",
    "f36_cross_source_dups", "f25_contamination", "f48_split_leakage",
}

TABLES = ["region", "nation", "supplier", "customer", "orders",
          "lineitem", "part", "events", "documents", "embeddings"]


def main() -> None:
    import duckdb

    from cassandra_migrate_keyspace_from_cluster_spark import registry
    from cassandra_migrate_keyspace_from_cluster_spark.session import build_session
    from tests.parity import compare_frames

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    registry.load_all()
    wanted = sys.argv[2:] or sorted(
        name for name, spec in registry.QUERIES.items()
        if spec.oracle is not None and name not in POOLED
    )
    unknown = [w for w in wanted if w not in registry.QUERIES]
    if unknown:
        sys.exit(f"unknown query(s): {unknown}")

    spark = build_session(app_name="pool_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    import pathlib
    import tempfile

    def one_example(ks, qname):
        d = tempfile.mkdtemp(prefix="sweep")
        tp._write_micro_keyspace(d, ks)
        got = registry.QUERIES[qname].fn(spark, d).toPandas()
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
                f"'{os.path.join(d, t + '.parquet')}')"
            )
        want = con.execute(registry.QUERIES[qname].oracle).df()
        compare_frames(got, want, f"{qname}_sweep")

    def make_probe(qname):
        # close over qname via factory — @given rejects default args
        @given(ks=tp._keyspace_st)
        @settings(max_examples=n, deadline=None)
        def probe(ks):
            one_example(ks, qname)

        return probe

    passes, fails = [], []
    for qname in wanted:
        t0 = time.time()
        probe = make_probe(qname)
        try:
            probe()
            passes.append(qname)
            print(f"PASS {qname} ({n} ex, {time.time() - t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — triage list, keep going
            fails.append(qname)
            msg = " | ".join(str(e).splitlines()[:3])[:300]
            print(f"FAIL {qname}: {msg}", flush=True)

    print(f"POOL-SWEEP RESULT: pass={len(passes)} fail={len(fails)}")
    if fails:
        print("fails:", " ".join(fails))


if __name__ == "__main__":
    main()
