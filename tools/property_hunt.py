"""Deep property hunt: the randomized micro-driver families from
tests/test_properties.py, re-run with a LARGE example budget.

The in-suite battery runs 8 examples per law (suite wall-clock budget);
this tool is the round-close deep hunt (SCALE.md verification-tiering):
hypothesis GENERATES whole micro-fixtures — money shapes, negative
epochs, adversarial unicode, adversarial float32 vectors, ragged
multi-table keyspaces — and runs REGISTERED queries against their
REGISTERED oracles on them, i.e. the driver's own check over input
shapes no fixture battery enumerates. Its first session (r9) caught a
silent int64 wrap in Spark's decimal `div` quotient that eight rounds
of fixture-derived gates could not reach.

Usage: python tools/property_hunt.py [examples_per_family] [family ...]
       (defaults: 60; families: lineitem events documents embeddings
        joins props names url_pii encoding money_fmt keyspace confs —
        props generates adversarial JSON payloads through the d7/d13
        scalar surface; names (r11) generates adversarial unicode
        customer names through the d1/d2/d3 case-fold/regex/distance
        surface;
        url_pii/encoding (r11) generate adversarial langs/texts and
        arbitrary unicode through the d18/f37/f22 regex surfaces and
        the d16 encode/decode round trip; money_fmt (r12) generates
        arbitrary doubles (NaN/±inf/±1e308/half-boundary) through
        d10's guarded exact-cents format surface; confs draws random
        1-3-perturbation conf combinations on top of generated
        keyspaces)
Prints one line per family; exit 1 on any failure.
"""

from __future__ import annotations

import os
import sys
import tempfile
import pathlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

import tests.test_properties as tp  # noqa: E402


class _TPF:
    def mktemp(self, p: str) -> pathlib.Path:
        return pathlib.Path(tempfile.mkdtemp(prefix=p))


def _parity(spark, write_fixture, tables, qname, gen_args):
    import duckdb

    from cassandra_migrate_keyspace_from_cluster_spark import registry
    from tests.parity import compare_frames

    d = str(_TPF().mktemp("hunt"))
    write_fixture(d, *gen_args)
    registry.load_all()
    got = registry.QUERIES[qname].fn(spark, d).toPandas()
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{os.path.join(d, t + '.parquet')}')"
        )
    want = con.execute(registry.QUERIES[qname].oracle).df()
    compare_frames(got, want, f"{qname}_hunt")


FAMILIES: dict[str, tuple] = {}


def _register_families(spark, n_examples: int) -> None:
    hard = dict(max_examples=n_examples, deadline=None)

    @given(rows=st.lists(tp._li_row_st, min_size=1, max_size=30),
           qname=st.sampled_from(
               ["b5_agg_groupby", "b4_agg_global", "c1_rollup",
                "c20_unpivot", "c3_grouping_sets", "b36_skew_profile"]))
    @settings(**hard)
    def lineitem(rows, qname):
        _parity(spark, tp._write_micro_lineitem, ["lineitem"], qname, (rows,))

    @given(rows=st.lists(tp._ev_row_st, min_size=1, max_size=30),
           qname=st.sampled_from(
               ["e1_tumbling", "e2_sliding", "e3_session", "e7_event_funnel",
                "e12_out_of_order_profile", "e16_peak_concurrency",
                "c14_frame_range", "c12_lag_lead", "c17_first_last"]))
    @settings(**hard)
    def events(rows, qname):
        _parity(spark, tp._write_micro_events, ["events"], qname, (rows,))

    @given(rows=st.lists(tp._doc_row_st, min_size=1, max_size=14),
           qname=st.sampled_from(
               ["f1_exact_dedup", "f7_tokenize_wordcount", "f9_ngrams",
                "f13_langid", "f14_quality", "f15_token_count",
                "f16_fingerprint", "f22_redact_pii", "f26_repetition",
                "f27_rule_filters", "f35_token_spectrum",
                "f12_doc_length_dedup_rate"]))
    @settings(**hard)
    def documents(rows, qname):
        _parity(spark, tp._write_micro_documents, ["documents"], qname, (rows,))

    @given(rows=st.lists(tp._emb_row_st, min_size=1, max_size=10),
           qname=st.sampled_from(
               ["f4_cosine_topk", "f4b_cosine_neardup", "f19_quantize_int8",
                "f6_centroid_knn", "f46_embedding_outliers"]))
    @settings(**hard)
    def embeddings(rows, qname):
        _parity(spark, tp._write_micro_embeddings, ["embeddings"], qname,
                (rows,))

    @given(custs=st.lists(tp._cust_row_st, min_size=1, max_size=8),
           ords=st.lists(tp._ord_row_st, min_size=0, max_size=10),
           lis=st.lists(tp._li_row_st, min_size=1, max_size=15),
           qname=st.sampled_from(
               ["b8_join_inner_eq", "b9_join_multiway_star", "b10_join_outer",
                "b11_join_semi", "b12_join_anti", "b25_tpch_q3_shaped",
                "b26_tpch_q10_shaped", "a18_referential_check"]))
    @settings(**hard)
    def joins(custs, ords, lis, qname):
        _parity(
            spark, tp._write_micro_warehouse,
            ["region", "nation", "supplier", "customer", "orders", "lineitem"],
            qname, (custs, ords, lis),
        )

    @given(payloads=st.lists(tp._props_st, min_size=1, max_size=20),
           qname=st.sampled_from(tp.PROPS_POOL))
    @settings(**hard)
    def props(payloads, qname):
        _parity(spark, tp._write_micro_props, ["events"], qname, (payloads,))

    # r11 surface families (VERDICT r10 item 2): adversarial langs/texts
    # through the URL/PII regex surfaces and arbitrary unicode through
    # the d16 encode/decode round trip — the generated tier behind
    # URL_LANG_BATTERY / URL_TEXT_BATTERY / PII_TEXT_BATTERY /
    # ENCODING_BATTERY.
    @given(langs=st.lists(tp._url_lang_st, min_size=1, max_size=12),
           texts=st.lists(tp._url_text_st, min_size=1, max_size=8),
           qname=st.sampled_from(
               ["d18_url_parse", "f37_url_domain_stats", "f22_redact_pii"]))
    @settings(**hard)
    def url_pii(langs, texts, qname):
        n = max(len(langs), len(texts))
        rows = [(t_, l_, "src0")
                for t_, l_ in zip((texts * n)[:n], (langs * n)[:n])]
        _parity(spark, tp._write_micro_documents, ["documents"], qname,
                (rows,))

    @given(pris=st.lists(st.text(max_size=120), min_size=1, max_size=15),
           qname=st.sampled_from(["d16_encoding", "d12_string_parts"]))
    @settings(**hard)
    def encoding(pris, qname):
        _parity(spark, tp._write_micro_orders, ["orders"], qname, (pris,))

    # r11 case-fold family: adversarial customer names through the
    # d1/d2/d3 string surface (the probe that found the case-mapping /
    # grapheme / trim divergence classes — casefold.py)
    @given(names=st.lists(tp._name_st, min_size=1, max_size=12),
           qname=st.sampled_from(
               ["d1_string_basic", "d2_string_regex", "d3_string_distance"]))
    @settings(**hard)
    def names(names, qname):
        _parity(spark, tp._write_micro_customer, ["customer"], qname,
                (names,))

    @given(ks=tp._keyspace_st,
           # the full oracle-paired inventory (pool-sweep-proven, r9)
           qname=st.sampled_from(tp.KEYSPACE_POOL))
    @settings(**hard)
    def keyspace(ks, qname):
        _parity(
            spark, tp._write_micro_keyspace,
            ["region", "nation", "supplier", "customer", "orders",
             "lineitem", "part", "events", "documents", "embeddings"],
            qname, (ks,),
        )

    # confs: random CONF-perturbation combinations x generated keyspaces
    # x the union of every family's oracle-paired query pool. Composes
    # two gates that each hold alone (conf-invariance runs on the FIXED
    # fixtures; the families above run at the FIXED build_session confs)
    # into the joint space neither covers: a query whose answer depends
    # on, say, arrow re-batching ONLY for a data shape the fixtures
    # never produce (single-row groups, all-null batch tails) is
    # invisible to both parents. Perturbation sets of size 1-3 also
    # probe pairwise/triple conf interactions for the first time.
    from tools.conf_invariance import PERTURBATIONS

    conf_pool = sorted(
        {"b5_agg_groupby", "b4_agg_global", "c1_rollup", "c20_unpivot",
         "c3_grouping_sets", "b36_skew_profile",
         "e1_tumbling", "e2_sliding", "e3_session", "e7_event_funnel",
         "e12_out_of_order_profile", "e16_peak_concurrency",
         "c14_frame_range", "c12_lag_lead", "c17_first_last",
         "f1_exact_dedup", "f7_tokenize_wordcount", "f9_ngrams",
         "f13_langid", "f14_quality", "f15_token_count",
         "f16_fingerprint", "f22_redact_pii", "f26_repetition",
         "f27_rule_filters", "f35_token_spectrum",
         "f12_doc_length_dedup_rate",
         "f4_cosine_topk", "f4b_cosine_neardup", "f19_quantize_int8",
         "f6_centroid_knn", "f46_embedding_outliers",
         "b8_join_inner_eq", "b9_join_multiway_star", "b10_join_outer",
         "b11_join_semi", "b12_join_anti", "b25_tpch_q3_shaped",
         "b26_tpch_q10_shaped", "a18_referential_check",
         "a5_range_partition_counts", "a7_table_counts",
         "a8_content_checksum", "b14_join_theta_range", "d4_datetime",
         "d7_map_json", "d13_regex_array",
         "f11_multimodal_join", "f36_cross_source_dups",
         "f25_contamination", "f48_split_leakage"}
    )

    @given(ks=tp._keyspace_st,
           pnames=st.lists(st.sampled_from(sorted(PERTURBATIONS)),
                           min_size=1, max_size=3, unique=True),
           qname=st.sampled_from(conf_pool))
    @settings(**hard)
    def confs(ks, pnames, qname):
        merged: dict[str, str] = {}
        for p in pnames:
            merged.update(PERTURBATIONS[p])
        saved = {k: spark.conf.get(k) for k in merged}
        for k, v in merged.items():
            spark.conf.set(k, v)
        try:
            _parity(
                spark, tp._write_micro_keyspace,
                ["region", "nation", "supplier", "customer", "orders",
                 "lineitem", "part", "events", "documents", "embeddings"],
                qname, (ks,),
            )
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)

    @given(prices=st.lists(tp._price_st, min_size=1, max_size=15))
    @settings(**hard)
    def money_fmt(prices):
        _parity(
            spark,
            lambda d, ps: tp._write_micro_orders_prices(
                d, [None if x is None else float(x) for x in ps]
            ),
            ["orders"], "d10_cast_types", (prices,),
        )

    FAMILIES.update(
        lineitem=lineitem, events=events, documents=documents,
        embeddings=embeddings, joins=joins, props=props,
        url_pii=url_pii, encoding=encoding, names=names,
        keyspace=keyspace, confs=confs, money_fmt=money_fmt,
    )


def main() -> None:
    import time

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    from cassandra_migrate_keyspace_from_cluster_spark.session import build_session

    spark = build_session(app_name="property_hunt")
    _register_families(spark, n)
    wanted = sys.argv[2:] or list(FAMILIES)
    unknown = [w for w in wanted if w not in FAMILIES]
    if unknown:
        sys.exit(f"unknown family(s): {unknown}; have {list(FAMILIES)}")
    fails = []
    for name in wanted:
        t0 = time.time()
        try:
            FAMILIES[name]()
            print(f"{name}: {n} examples PASS ({time.time() - t0:.0f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"{name}: FAIL {str(e)[:1500]}", flush=True)
    print(f"PROPERTY-HUNT RESULT: families={wanted} fails={fails or 'none'}")
    if fails:
        sys.exit(1)


if __name__ == "__main__":
    main()
