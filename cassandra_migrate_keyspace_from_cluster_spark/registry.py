"""Query registry: the single source of truth for the declared inventory.

Each SURVEY.md §2 QueryID registers here with:
  - ``fn(spark, sf_dir) -> DataFrame``  — the PySpark implementation,
  - ``oracle``                          — the DuckDB ANSI-SQL twin, or
    ``None`` for ops whose values are engine-specific by design
    (approx sketches, LSH) → the driver records a rows-only check.

``__spark_entry__.py`` simply re-exports ``queries()`` / ``oracle_sql()``.

Determinism laws (SURVEY.md §5.4) every registered query obeys:
  - floating aggregates rounded: coarse (2dp) for large-magnitude sums,
    6dp for O(1..1e4)-magnitude values — both sides identically;
  - every window/limit ordering carries a unique tie-break column;
  - computed columns aliased identically in Spark and SQL;
  - explicit casts where engine default types diverge (JSON, ntile).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = ()

    @property
    def doc(self) -> str:
        return (self.fn.__doc__ or "").strip()


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query implementation + its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


def load_all() -> None:
    """Import every query module so the registry is fully populated."""
    from .queries import ALL_MODULES  # noqa: F401  (import side effect)


# Queries already driver-verified green (CORRECTNESS_r01 ∪ … ∪ r07 —
# all 207 names have ridden a driver window at least once; zero driver
# failures ever recorded against current code. Rounds 6 and 7 re-rode
# their 50-name staleness windows 49/49 hash + 1/1 rows-only each —
# every r6/r7 name was already green in an earlier round, so the set
# below is unchanged by them).
# The driver's per-round correctness harness caps at the first 50
# registry entries, so ordering is coverage policy: this round's explicit
# window FIRST, then the remaining never-driver-checked queries,
# already-green ones last. Across rounds this rotates the whole
# inventory through the driver's window; tests/test_parity.py still
# checks all queries every run.
_DRIVER_GREEN = frozenset({
    # --- CORRECTNESS_r01.json (round 1) ---
    "a2_schema_manifest", "a3_ddl_manifest", "a4_copy_roundtrip", "a4b_copy_roundtrip_csv",
    "a4c_copy_roundtrip_json", "a4d_copy_partitioned", "a4e_copy_roundtrip_orc", "a5_range_partition_counts",
    "a6_writetime_copy", "a7_table_counts", "a8_content_checksum", "a9_resumable_copy",
    "b10_join_outer", "b11_join_semi", "b12_join_anti", "b13_join_cross",
    "b14_join_theta_range", "b15_join_asof", "b15b_asof_pandas_api", "b16_union_all",
    "b17_union_distinct", "b18_intersect", "b19_except", "b1_scan_project",
    "b21_limit_topk", "b22_distinct_rows", "b23_exists_subquery",
    "b24_salted_agg", "b25_tpch_q3_shaped", "b26_tpch_q10_shaped", "b2_filter_pred",
    "b3_case_when", "b4_agg_global", "b5_agg_groupby", "b6_count_distinct",
    "b7_having", "b8_join_inner_eq", "b9_join_multiway_star", "c10_row_number",
    "c11_topk_per_group", "c12_lag_lead", "c13_frame_rows", "c14_frame_range",
    "c15_running_total", "c17_first_last", "c18_forward_fill",
    "c19_filtered_agg", "c1_rollup",
    # --- CORRECTNESS_r02.json (round 2) ---
    "a10_throttled_copy", "a11_snapshot_diff", "a12_schema_evolution_copy",
    "a13_full_keyspace_copy", "a14_range_checksums", "a1_cluster_scan",
    "a4f_copy_compacted", "b14b_range_join_banded", "b27_scalar_subquery",
    "b28_join_disjunctive", "b29_lateral_join", "b30_in_subquery",
    "b31_limit_offset", "b32_group_by_all", "b33_union_evolved",
    "c20_unpivot", "c21_date_spine_gapfill", "c22_window_count_distinct",
    "c23_listagg", "c24_hll_mergeable", "c2_cube", "d13_regex_array",
    "d14_timestamp_arith", "d15_conditional", "d16_encoding", "d17_trig",
    "e11_anomaly_zscore", "e12_out_of_order_profile", "e13_windowed_topn",
    "e15_interarrival_histogram", "e17_transition_matrix", "e18_bounded_funnel",
    "e19_watermark_whatif", "e20_rolling_wau", "f24_minhash_pinned_lsh",
    "f25_contamination", "f26_repetition", "f27_rule_filters",
    "f28_source_mix_sample", "f30_pipeline_yield", "f31_unigram_logprob",
    "f32_quality_aware_dedup", "f33_pq_topk", "f35_token_spectrum",
    "f36_cross_source_dups", "f37_url_domain_stats", "f38_chunk_dedup",
    "f39_source_kl_divergence", "g10_arrow_python_udf", "g9_cogrouped_map",
    # --- CORRECTNESS_r03.json (round 3, 50/50 full hash pass) ---
    "b20_sort_multikey", "c16_ntile_pctrank", "c3_grouping_sets", "c4_stats_agg",
    "c5_percentiles", "c5b_mode", "d1_string_basic", "d2_string_regex",
    "d3_string_distance", "d4_datetime", "d5_math", "d6_array",
    "d7_map_json", "d8_hash", "e10_stream_stream_join", "e1_tumbling",
    "e2_sliding", "e3_session", "e4_watermark_late", "e5_stream_dedup",
    "e6_stateful_runagg", "e7_event_funnel", "e8_rate_histogram", "e9_retention_cohort",
    "f13_langid", "f14_quality", "f15_token_count", "f16_fingerprint",
    "f18_pipeline_report", "f19_quantize_int8", "f1_exact_dedup", "f20_stratified_sample",
    "f21_neardup_clusters", "f21b_neardup_clusters_star", "f22_redact_pii", "f23_dedup_suppression",
    "f2_token_jaccard_neardup", "f4_cosine_topk", "f4b_cosine_neardup", "f4c_cosine_topk_chunked",
    "f7_tokenize_wordcount", "f8_tfidf", "g1_python_udf", "g2_pandas_udf_scalar",
    "g3_grouped_agg_udaf", "g4_grouped_map", "g5_map_in_pandas", "g6_python_udtf",
    "g7_map_in_arrow", "g8_pandas_udf_iter",
    # --- CORRECTNESS_r04.json (round 4, 50/50 full hash pass) ---
    "a15_repair_apply", "a16_clustered_copy_scan", "a17_scd2_history",
    "a18_referential_check", "a19_migration_plan_estimate",
    "a20_schema_drift_report", "a21_data_expectations",
    "b34_bloom_semi_reduction", "b35_salted_join", "b36_skew_profile",
    "b37_join_asof_forward",
    "c25_count_min", "c8_collect", "c9_pivot",
    "d9_conditional_null", "d10_cast_types", "d11_bitwise",
    "d12_string_parts", "d18_url_parse",
    "e14_session_shape", "e16_peak_concurrency", "e21_commitlog_replay",
    "e22_stream_enrich", "e23_foreachbatch_sink",
    "f6_centroid_knn", "f9_ngrams", "f10_lang_stats", "f11_multimodal_join",
    "f12_doc_length_dedup_rate", "f17_multimodal_features",
    "f17b_wav_decode_features", "f17c_bmp_decode_features",
    "f17d_jpeg_decode_features", "f17e_png_decode_features",
    "f17f_video_frame_sample", "f17g_image_resize_features",
    "b4_agg_global", "b5_agg_groupby", "c20_unpivot",
    "g3_grouped_agg_udaf",
    "f29_train_split", "f34_hybrid_rrf_search", "f40_incremental_dedup",
    "f41_perplexity_buckets", "f43_chunk_dedup_rewrite", "f44_token_packing",
    "f45_domain_pagerank", "f46_embedding_outliers", "f48_split_leakage",
    "f49_threshold_calibration", "f50_domain_quota_sample",
    "f51_ngram_novelty", "f52_dataset_card",
    "g11_apply_in_arrow",
    # --- CORRECTNESS_r05.json (round 5, 42 hash + 8 rows-only) ---
    # (names not already green in earlier rounds)
    "f42_semantic_dedup", "f47_cluster_quality",
    "c6_approx_quantile", "c7_approx_cd", "f3_minhash_lsh", "f3b_simhash",
    "f5_ann_lsh", "f5b_ivf_topk", "f42b_semantic_dedup_kmeans",
})

# Round-9 driver window (exactly 50 names), assembled at r9 start per
# the standing rule — REWRITES FIRST (any query whose Spark code or
# oracle changed since the last recorded CORRECTNESS), then the
# deferred pristine-value-neutral r8 law rewrites, then oldest-row
# staleness padding — and pre-flighted by tools/window_sim.py. For the
# record, the r8 window (CORRECTNESS_r08: 45 hash + 5 rows-only, zero
# fails) was the 47 mid/late-r8 data-shift rewrites + c4/c5/e8
# extremes-probe rows + 3 oldest r3 rows; its full composition is in
# git history at this file, r8 vintage.
#
#   rewritten since the r8 record (25) — the ADVICE-closure commit
#     ("Close r8 advice items") touched three classes AFTER
#     CORRECTNESS_r08 was written, so every consumer re-rides:
#     (a) decimal-lift exact rounding (rounding.py dec_sum /
#         exact_round_ratio DECIMAL(38,0) lift): b4, b5, b9, b25, b26,
#         b34, b35, b36, c1, c20;
#     (b) null-element vector-validity clause (valid_vector +
#         sql_valid_vector + inlined oracle copies): f4, f4b, f4c, f5,
#         f6, f19, f34, f42, f46, f52, f3b, f18, f29, f43;
#     (c) g3 zero-weight guard: g3.
#     The r9 bench-warmup prestage refactor (prestage_cosine_corpus
#     extraction) also touches f4/f4c — already riding via (b).
#   deferred r8 law rewrites, pristine-value-neutral by construction,
#     promised this window by the r8 plan (13): c22 (ROWS->RANGE),
#     d14/e14/e18 (negative-epoch floor forms), d17, g4 (oracle law),
#     d11 (gated left shift) and the f17b-f17g pmod-form oracles.
#     (f6/f19/f46 of that list already ride via (b).)
#   oldest staleness padding, last-ridden r3, alphabetical (12): d3,
#     d5, d7, d8, e1, e2, e3, e4, e5, e6, e7, e10.
#
# Continuation-session note for the r10 assembler: the late-r9
# operator rewrites (f4 staged-layout fan-out + f4c pass-layout
# task sizing + f4d/auto_cosine_topk valid-vector stats, and the e19
# lateness-law rewrite below) all landed BEFORE the r9 driver run and
# all four names ride this window, so their r9 rows cover current
# code — no forced r10 re-ride on their account. e10_stream_stream_join
# joins the r10 padding pool (displaced by e19).
#
# CONCRETE r10 window plan (assemble at r10 start, once
# CORRECTNESS_r09 is green): r10 rewrites first, then the remaining
# never-re-ridden-since-r3 rows (e7, e9, f15, f20, f22, g5, g7, g8;
# e7 displaced by r9's new f4d; e3, e4, e5, e6 displaced by the
# late-r9 _dec_intdiv consumer swap), then
# oldest r4 rows alphabetical (a17-a21, b37, c8, c9, d9, d18, e16,
# e21, e22, e23, f1, f9, f10, f11, f44, f48, f50, f8?=r5 ...), then
# oldest r5 rows to the 50 cap. Every subsequent round repeats the
# same rule: rewrites first, then oldest-row rotation.
_WINDOW = frozenset({
    # (a) decimal-lift exact-rounding consumers (10)
    "b4_agg_global", "b5_agg_groupby", "b9_join_multiway_star",
    "b25_tpch_q3_shaped", "b26_tpch_q10_shaped",
    "b34_bloom_semi_reduction", "b35_salted_join", "b36_skew_profile",
    "c1_rollup", "c20_unpivot",
    # (b) null-element vector law consumers (14)
    "f3b_simhash", "f4_cosine_topk", "f4b_cosine_neardup",
    "f4c_cosine_topk_chunked", "f5_ann_lsh", "f6_centroid_knn",
    "f18_pipeline_report", "f19_quantize_int8", "f29_train_split",
    "f34_hybrid_rrf_search", "f42_semantic_dedup",
    "f43_chunk_dedup_rewrite", "f46_embedding_outliers",
    "f52_dataset_card",
    # (c) g3 zero-weight guard (1)
    "g3_grouped_agg_udaf",
    # deferred pristine-neutral r8 law rewrites (13)
    "c22_window_count_distinct", "d11_bitwise", "d14_timestamp_arith",
    "d17_trig", "e14_session_shape", "e18_bounded_funnel",
    "f17b_wav_decode_features", "f17c_bmp_decode_features",
    "f17d_jpeg_decode_features", "f17e_png_decode_features",
    "f17f_video_frame_sample", "f17g_image_resize_features",
    "g4_grouped_map",
    # NEW in r9 (1): the auto-tier routing demonstration (r8 VERDICT
    # item 6) — a new query has no prior green row, so it rides now;
    # its slot displaces e7_event_funnel (last of the padding pool's
    # (round, name) order) to the r10 rotation.
    "f4d_auto_tier",
    # late-r9 law rewrite (4): the _dec_intdiv quotient fix (a
    # hypothesis property found Spark's decimal `div` silently
    # wrapping past int64) changes the PLAN of every exact_round_ratio
    # / exact_mean6 consumer; all ride the window already via the
    # advice-closure groups above except these four, which swap in —
    # rewrites-first outranks staleness padding (displacing e3-e6 to
    # r10). Value-neutral at gate SFs (parity suite green), like the
    # r8 d17/f6/f19/f46 precedent, but slots were available here.
    "c16_ntile_pctrank", "f10_lang_stats", "f12_doc_length_dedup_rate",
    "f51_ngram_novelty",
    # late-r9 law rewrite #2 (1): e19's lateness laws — the first
    # full pool-expansion sweep caught raw date_diff('second')
    # partitioning negative epochs toward zero (Spark's date_trunc
    # form floors; divergent only when a ts and its shard running-max
    # straddle epoch 0 inside one second), and the fix batch also
    # pinned the duplicate-arrival-id multiset law ((event_id, ts)
    # window order, both sides). Rewrites-first: swaps in, displacing
    # e10_stream_stream_join (last of the remaining padding) to r10.
    "e19_watermark_whatif",
    # late-r9 law rewrite #3 (1): e15 carried the SAME raw-date_diff
    # negative-epoch hazard (audit of every date_diff oracle after the
    # e19 find; divergence proven on an hour-boundary epoch-straddle
    # pair — old oracle bucket 0, Spark+new oracle bucket 1). Swaps
    # in, displacing e2_sliding (last remaining padding) to r10.
    "e15_interarrival_histogram",
    # oldest-r3 staleness padding (5)
    "d3_string_distance", "d5_math", "d7_map_json", "d8_hash",
    "e1_tumbling",
})


def _tier(name: str) -> int:
    if name in _WINDOW:
        return 0
    if name in _DRIVER_GREEN:
        return 2
    return 1


def _ordered() -> list[tuple[str, QuerySpec]]:
    return sorted(QUERIES.items(), key=lambda kv: (_tier(kv[0]), kv[0]))


def queries() -> dict[str, QueryFn]:
    load_all()
    return {name: spec.fn for name, spec in _ordered()}


def oracle_sql() -> dict[str, str]:
    load_all()
    return {
        name: spec.oracle for name, spec in _ordered() if spec.oracle is not None
    }


def specs() -> dict[str, QuerySpec]:
    load_all()
    return dict(_ordered())
