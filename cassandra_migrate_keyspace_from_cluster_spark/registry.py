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


# Queries already driver-verified green in CORRECTNESS_r01.json. The
# driver's per-round correctness harness caps at the first 50 registry
# entries, so ordering is coverage policy: queries with no green row yet
# are emitted FIRST (sorted among themselves), already-green ones last.
# Across rounds this rotates the whole inventory through the driver's
# window; tests/test_parity.py still checks all queries every run.
_DRIVER_GREEN = frozenset({
    "a2_schema_manifest", "a3_ddl_manifest", "a4_copy_roundtrip", "a4b_copy_roundtrip_csv",
    "a4c_copy_roundtrip_json", "a4d_copy_partitioned", "a4e_copy_roundtrip_orc", "a5_range_partition_counts",
    "a6_writetime_copy", "a7_table_counts", "a8_content_checksum", "a9_resumable_copy",
    "b10_join_outer", "b11_join_semi", "b12_join_anti", "b13_join_cross",
    "b14_join_theta_range", "b15_join_asof", "b15b_asof_pandas_api", "b16_union_all",
    "b17_union_distinct", "b18_intersect", "b19_except", "b1_scan_project",
    "b20_sort_multikey", "b21_limit_topk", "b22_distinct_rows", "b23_exists_subquery",
    "b24_salted_agg", "b25_tpch_q3_shaped", "b26_tpch_q10_shaped", "b2_filter_pred",
    "b3_case_when", "b4_agg_global", "b5_agg_groupby", "b6_count_distinct",
    "b7_having", "b8_join_inner_eq", "b9_join_multiway_star", "c10_row_number",
    "c11_topk_per_group", "c12_lag_lead", "c13_frame_rows", "c14_frame_range",
    "c15_running_total", "c16_ntile_pctrank", "c17_first_last", "c18_forward_fill",
    "c19_filtered_agg", "c1_rollup",
})


# Queries first declared in this round's build session (no prior local-
# parity history in any driver artifact): highest priority for the
# driver's 50-entry window, ahead of the r1-unchecked block.
_NEW_THIS_ROUND = frozenset({
    "g9_cogrouped_map", "c20_unpivot", "c21_date_spine_gapfill",
    "f24_minhash_pinned_lsh", "f25_contamination", "f26_repetition",
    "f27_rule_filters", "f28_source_mix_sample", "e11_anomaly_zscore",
    "a4f_copy_compacted", "a11_snapshot_diff", "a12_schema_evolution_copy",
    "c22_window_count_distinct", "d13_regex_array", "b28_join_disjunctive",
    "f30_pipeline_yield", "f31_unigram_logprob", "f32_quality_aware_dedup",
    "e12_out_of_order_profile", "d14_timestamp_arith", "c23_listagg",
    "g10_arrow_python_udf", "e13_windowed_topn", "f33_pq_topk", "b29_lateral_join",
    "a13_full_keyspace_copy", "b30_in_subquery", "d15_conditional",
    "f35_token_spectrum", "e15_interarrival_histogram", "b31_limit_offset",
    "d16_encoding", "f36_cross_source_dups", "d17_trig", "b32_group_by_all",
    "e17_transition_matrix", "f37_url_domain_stats", "e18_bounded_funnel",
    "f38_chunk_dedup", "b33_union_evolved", "a14_range_checksums",
    "e19_watermark_whatif", "e20_rolling_wau", "f39_source_kl_divergence",
    "c24_hll_mergeable",
})


def _tier(name: str) -> int:
    if name in _NEW_THIS_ROUND:
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
