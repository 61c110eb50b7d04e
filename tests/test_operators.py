"""Semantic tests for operators whose values can't hash-match an oracle
(SURVEY.md §5.3.4): approximate ops are checked against their exact
twins (recall / rtol / containment), SimHash for its locality property.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_migrate_keyspace_from_cluster_spark.operators import (
    dedup as dd,
    similarity as sim,
)
from cassandra_migrate_keyspace_from_cluster_spark.registry import specs
from cassandra_migrate_keyspace_from_cluster_spark.sources import load_table

from .conftest import SF_T2

ALL = specs()


def _pair_set(df, a, b):
    return {(r[a], r[b]) for r in df.select(a, b).collect()}


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """f3 (MLlib MinHash-LSH over 3-shingles) must recover >=90% of the
    exact shingle-Jaccard >= 0.6 pairs (brute force here). f3 may
    legitimately emit MORE pairs (its Jaccard is over hashed feature
    vectors); recall is measured on the exact set."""
    docs = load_table(spark, SF_T2, "documents")
    sh = docs.filter(F.size(F.split("text", " ")) >= 3).select(
        "doc_id", dd.shingles("text", 3).alias("sh")
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    exact_df = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "j",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("j") >= 0.6)
    )
    exact = _pair_set(exact_df, "doc_a", "doc_b")
    approx = _pair_set(ALL["f3_minhash_lsh"].fn(spark, SF_T2), "doc_a", "doc_b")
    assert exact, "exact shingle jaccard found no pairs — threshold too high?"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.3f} < 0.9 ({len(exact)} exact pairs)"


def test_brp_lsh_recall_vs_exact_euclidean(spark):
    """f5 (BRP-LSH) must recover >=80% of exact close pairs (euclidean
    < 1.12, the selective p0.1-tail threshold) — LSH may miss some,
    not hallucinate."""
    emb = sim.with_double_embedding(load_table(spark, SF_T2, "embeddings"))
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("emb").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("emb").alias("eb"))
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("ea", "eb", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    exact = _pair_set(
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("d", dist)
        .filter(F.col("d") < 1.12),
        "vec_a",
        "vec_b",
    )
    approx = _pair_set(ALL["f5_ann_lsh"].fn(spark, SF_T2), "vec_a", "vec_b")
    assert exact, "no exact close pairs below threshold"
    recall = len(exact & approx) / len(exact)
    # floor raised r11 (VERDICT r10 item 5): seed=42 makes the measured
    # recall a deterministic constant of the dataset (0.9716 at this
    # fixture); 0.9 keeps a regeneration buffer without being trivially
    # loose.
    assert recall >= 0.9, f"BRP-LSH recall {recall:.3f} < 0.9 ({len(exact)} pairs)"
    # no hallucinated pairs: every approx pair really is under threshold
    assert approx <= exact, "approxSimilarityJoin returned pairs above threshold"
    # second operating point (r11): the p1-ish tail (threshold 1.2 →
    # ~1.5k exact pairs, 10x the 1.12 sample, so far less sample noise)
    # must hold the same floor — the floor is a property of the
    # operator's parameter geometry, not of one threshold's luck
    # (measured 0.9555 here).
    exact2 = _pair_set(
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("d", dist)
        .filter(F.col("d") < 1.2),
        "vec_a",
        "vec_b",
    )
    approx2 = _pair_set(
        sim.brp_lsh_neighbors(emb, distance_threshold=1.2), "vec_a", "vec_b"
    )
    recall2 = len(exact2 & approx2) / len(exact2)
    assert recall2 >= 0.9, (
        f"BRP-LSH recall@1.2 {recall2:.3f} < 0.9 ({len(exact2)} pairs)"
    )


def test_int8_quantization_error_bound(spark):
    """Dequantized vectors must stay close: per-dim error <= scale/2
    by construction, and cosine(orig, dequant) >= 0.999 on real data."""
    import numpy as np

    emb = load_table(spark, SF_T2, "embeddings")
    rows = (
        sim.quantize_int8(emb)
        .join(emb, "vec_id")
        .select("vec_id", "scale", "q", "embedding")
        .limit(200)
        .collect()
    )
    assert rows
    for r in rows:
        orig = np.asarray(r.embedding, dtype=np.float64)
        deq = np.asarray(r.q, dtype=np.float64) * r.scale
        # bound: scale/2 from quantization + 127 * 5e-7 because the
        # reported scale is rounded to 6dp before dequantization here
        assert np.max(np.abs(orig - deq)) <= r.scale / 2 + 127 * 5e-7
        cos = orig @ deq / (np.linalg.norm(orig) * np.linalg.norm(deq))
        assert cos >= 0.999, (r.vec_id, cos)
    assert all(max(abs(v) for v in r.q) <= 127 for r in rows)


def test_jaccard_postings_equals_crossjoin(spark):
    """The inverted-index jaccard (what f2 runs) must produce exactly
    the blocked cross-join form's pairs and scores."""
    docs = load_table(spark, SF_T2, "documents")
    a = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dd.jaccard_pairs(docs, ["lang", "source"], 0.6).collect()
    }
    b = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dd.jaccard_pairs_postings(docs, ["lang", "source"], 0.6).collect()
    }
    assert a == b and a
    # the prefix-filtered (SSJoin) form is the third implementation of
    # the same contract — must match exactly too, including at a
    # threshold whose float repr is ABOVE the rational value (0.7),
    # where a missing ε-guard on ⌈t·n⌉ would over-prune
    c = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dd.jaccard_pairs_prefix(docs, ["lang", "source"], 0.6).collect()
    }
    assert a == c
    hi_post = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dd.jaccard_pairs_postings(docs, ["lang", "source"], 0.7).collect()
    }
    hi_pref = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dd.jaccard_pairs_prefix(docs, ["lang", "source"], 0.7).collect()
    }
    assert hi_post == hi_pref and hi_pref


def test_jaccard_postings_df_cap_law(spark):
    """The opt-in df_cap pre-filter must be invisible in the results for
    ANY (cap, threshold): blocks where a doc violates the capped-postings
    theorem's guard (h < ceil(t*n)) keep all their postings, and the
    surviving candidates are re-verified on full token sets. Caps span
    aggressive (2), moderate (25), and no-op (1e6) regimes."""
    docs = load_table(spark, SF_T2, "documents")
    for thr in (0.6, 0.7):
        base = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dd.jaccard_pairs_postings(
                docs, ["lang", "source"], thr
            ).collect()
        }
        assert base
        for cap in (2, 25, 10**6):
            capped = {
                (r.doc_a, r.doc_b, r.jaccard)
                for r in dd.jaccard_pairs_postings(
                    docs, ["lang", "source"], thr, df_cap=cap
                ).collect()
            }
            assert capped == base, (thr, cap)


def test_jaccard_postings_df_cap_drops_stopwords(spark):
    """Non-vacuity: on a corpus where one stopword rides every doc but
    each doc has plenty of distinctive tokens, the cap must actually
    drop the stopword postings (the df² hazard it exists for) while the
    pair results stay identical."""
    rows = [
        # 12 docs, all contain 'the'; doc i shares its other 9 tokens
        # with doc i+1 only when i is even (pairs 0-1, 2-3, ...).
        (i, "en", "web",
         "the " + " ".join(f"w{(i // 2)}_{j}" for j in range(9)))
        for i in range(12)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, lang string, source string, text string"
    )
    base = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dd.jaccard_pairs_postings(docs, ["lang", "source"], 0.6).collect()
    }
    assert base == {(2 * k, 2 * k + 1, 1.0) for k in range(6)}
    stats: dict = {}
    capped = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dd.jaccard_pairs_postings(
            docs, ["lang", "source"], 0.6, df_cap=3, stats=stats
        ).collect()
    }
    assert capped == base
    # every doc: n=10, h=1 ('the', df=12 > 3), guard 1 < ceil(6) holds
    # -> block capped, the 12 'the' postings dropped.
    assert stats["blocks_capped"] == 1 and stats["postings_dropped"] == 12


def test_jaccard_postings_df_cap_guard_blocks_unsafe_drop(spark):
    """Adversarial guard case: identical one-token docs. Every token is
    heavy under df_cap=1 and ALSO the doc's entire overlap budget
    (h = 1 = ceil(t*n)), so the guard must refuse to cap the block —
    dropping 'x' would silently lose the J=1.0 pairs."""
    rows = [(i, "en", "web", "x") for i in range(5)]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, lang string, source string, text string"
    )
    base = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dd.jaccard_pairs_postings(docs, ["lang", "source"], 0.6).collect()
    }
    assert len(base) == 10  # C(5,2) identical pairs
    stats: dict = {}
    capped = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dd.jaccard_pairs_postings(
            docs, ["lang", "source"], 0.6, df_cap=1, stats=stats
        ).collect()
    }
    assert capped == base
    assert stats["blocks_capped"] == 0 and stats["postings_dropped"] == 0


def test_ivf_recall_and_probe_monotonicity(spark):
    """f5b (IVF) recall vs the exact f4 truth. Random gaussian vectors
    are IVF's worst case (no real cluster structure), so the bound is
    modest; recall must also improve as more cells are probed."""
    from cassandra_migrate_keyspace_from_cluster_spark.sources import (
        load_table as lt,
    )

    exact = _pair_set(
        ALL["f4_cosine_topk"].fn(spark, SF_T2), "query_id", "neighbor_id"
    )
    emb = lt(spark, SF_T2, "embeddings")
    r = {}
    for n_probe in (4, 8):
        approx = _pair_set(
            sim.ivf_cosine_topk(emb, k=5, n_cells=16, n_probe=n_probe),
            "query_id",
            "neighbor_id",
        )
        r[n_probe] = len(exact & approx) / len(exact)
    assert r[4] >= 0.5, f"IVF n_probe=4 recall {r[4]:.3f} < 0.5"
    assert r[8] >= 0.75, f"IVF n_probe=8 recall {r[8]:.3f} < 0.75"
    assert r[8] > r[4], f"recall not monotone in n_probe: {r}"


def test_simhash_locality(spark):
    """Near-identical texts get near-identical SimHashes; disjoint-vocab
    texts do not."""
    rows = [
        ("base", "join filter scan window agg hash merge sort table column"),
        ("near", "join filter scan window agg hash merge sort table row"),
        ("far", "zebra yak xylophone wombat vulture unicorn tapir snake quail pig"),
    ]
    df = spark.createDataFrame(rows, ["name", "text"])
    got = {
        r["name"]: r["h"]
        for r in df.select("name", dd.simhash60_pinned("text").alias("h")).collect()
    }
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(got["base"], got["near"]) < ham(got["base"], got["far"])
    assert ham(got["base"], got["near"]) <= 16


def test_approx_count_distinct_rtol(spark, duck):
    """c7 approx distinct within 10% of the exact twin."""
    approx = {
        r["event_type"]: r["n_users_approx"]
        for r in ALL["c7_approx_cd"].fn(spark, SF_T2).collect()
    }
    exact = dict(
        duck(SF_T2)
        .execute("SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1")
        .fetchall()
    )
    for et, n in exact.items():
        assert abs(approx[et] - n) / n < 0.10, (et, approx[et], n)


def test_approx_percentile_rtol(spark, duck):
    """c6 approx percentiles within 10% of exact."""
    approx = {
        r["event_type"]: (r["p50_approx"], r["p90_approx"])
        for r in ALL["c6_approx_quantile"].fn(spark, SF_T2).collect()
    }
    exact = {
        et: (p50, p90)
        for et, p50, p90 in duck(SF_T2)
        .execute(
            "SELECT event_type, quantile_cont(value, 0.5), "
            "quantile_cont(value, 0.9) FROM events GROUP BY 1"
        )
        .fetchall()
    }
    for et, (p50, p90) in exact.items():
        assert abs(approx[et][0] - p50) / p50 < 0.10
        assert abs(approx[et][1] - p90) / p90 < 0.10


def test_exact_dedup_idempotent(spark):
    """Dedup of a deduped corpus is a no-op (fixed point)."""
    docs = load_table(spark, SF_T2, "documents")
    once = dd.exact_dedup(docs).select("doc_id", "text")
    twice = dd.exact_dedup(once).select("doc_id", "text")
    assert once.count() == twice.count()


def test_dedup_removes_injected_duplicates(spark):
    """Injecting copies with higher ids leaves exactly the originals."""
    docs = load_table(spark, SF_T2, "documents").select("doc_id", "text")
    copies = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    merged = docs.unionByName(copies)
    kept = dd.exact_dedup(merged)
    assert kept.count() == docs.count()
    # survivors are the low-id originals
    assert kept.filter(F.col("doc_id") >= 1_000_000).count() == 0


def test_salted_agg_equals_plain(spark):
    """Salting must not change results (decomposable aggregates)."""
    from cassandra_migrate_keyspace_from_cluster_spark.operators.skew import (
        plain_sum_count,
        salted_sum_count,
    )

    ev = load_table(spark, SF_T2, "events")
    a = {
        (r.event_type, round(r.sum_value, 6), r.n)
        for r in salted_sum_count(ev, "event_type", "value").collect()
    }
    b = {
        (r.event_type, round(r.sum_value, 6), r.n)
        for r in plain_sum_count(ev, "event_type", "value").collect()
    }
    assert a == b


def test_neardup_clusters_consistency(spark):
    """Cluster labels must be consistent with the pair graph: paired
    docs share a cluster; a cluster's label is its smallest member."""
    docs = load_table(spark, SF_T2, "documents")
    pairs = dd.jaccard_pairs_postings(docs, ["lang", "source"], 0.6)
    clusters = dd.neardup_clusters(docs, pairs)
    lbl = {r.doc_id: r.cluster_id for r in clusters.collect()}
    for p in pairs.collect():
        assert lbl[p.doc_a] == lbl[p.doc_b], (p.doc_a, p.doc_b)
    from collections import defaultdict

    members = defaultdict(list)
    for d, c in lbl.items():
        members[c].append(d)
    for c, ds in members.items():
        assert c == min(ds)


def test_two_phase_rank_matches_window_functions(spark):
    """operators/rank.py closed-form ntile/percent_rank/cume_dist must
    equal Spark's own window functions on a total order, across Ns that
    exercise the uneven-bucket arithmetic (N mod k != 0) and k > N."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cassandra_migrate_keyspace_from_cluster_spark.operators.rank import (
        cume_dist_from_rn,
        ntile_from_rn,
        percent_rank_from_rn,
        with_global_row_number,
    )

    for n, k in [(103, 4), (100, 7), (5, 8), (1, 3)]:
        df = spark.range(n).select(
            (F.col("id") * 37 % n).alias("key"), F.col("id").alias("uid")
        )
        order = [F.col("key").asc(), F.col("uid").asc()]
        got = with_global_row_number(df, order, "rn", total_col="nt")
        got = got.select(
            "uid",
            F.col("rn"),
            ntile_from_rn(F.col("rn"), F.col("nt"), k).alias("nt_k"),
            F.round(percent_rank_from_rn(F.col("rn"), F.col("nt")), 9).alias("pr"),
            F.round(cume_dist_from_rn(F.col("rn"), F.col("nt")), 9).alias("cd"),
        )
        w = Window.orderBy(*order)
        want = df.select(
            "uid",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.ntile(k).over(w).alias("nt_k"),
            F.round(F.percent_rank().over(w), 9).alias("pr"),
            F.round(F.cume_dist().over(w), 9).alias("cd"),
        )
        g = {r.uid: (r.rn, r.nt_k, r.pr, r.cd) for r in got.collect()}
        e = {r.uid: (r.rn, r.nt_k, r.pr, r.cd) for r in want.collect()}
        assert g == e, f"mismatch at n={n} k={k}"


def test_two_phase_rank_materialize_modes_agree(spark):
    """Both materialization modes (local_checkpoint / cluster-safe
    persist) must number identically; unknown modes must raise."""
    import pytest
    from pyspark.sql import functions as F

    from cassandra_migrate_keyspace_from_cluster_spark.operators.rank import (
        with_global_row_number,
    )

    df = spark.range(257).select(
        (F.col("id") * 41 % 257).alias("key"), F.col("id").alias("uid")
    )
    order = [F.col("key").asc(), F.col("uid").asc()]
    lc = with_global_row_number(df, order, "rn", materialize="local_checkpoint")
    ps = with_global_row_number(df, order, "rn", materialize="persist")
    assert {(r.uid, r.rn) for r in lc.collect()} == {
        (r.uid, r.rn) for r in ps.collect()
    }
    with pytest.raises(ValueError, match="materialize"):
        with_global_row_number(df, order, "rn", materialize="checkpoint")


def test_srp_neardup_equals_bruteforce(spark):
    """f4b's LSH-candidates + exact-rescore must return exactly the
    brute-force all-pairs result. Two regimes: the real embeddings table
    (no qualifying pairs at 0.8 — both sides must agree on empty) and a
    lowered threshold where real pairs exist."""
    from cassandra_migrate_keyspace_from_cluster_spark.operators import similarity as sm

    emb = load_table(spark, SF_T2, "embeddings")
    # production threshold: exact equality (the sf0.01 corpus has no
    # qualifying pairs — both tiers must agree on empty, not error)
    got = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in sm.cosine_neardup_pairs(emb, 0.8).collect()
    }
    want = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in sm.cosine_pairs_bruteforce(emb, 0.8).collect()
    }
    assert got == want
    # below the design threshold the SRP recall law <1 applies (that IS
    # the LSH contract) — but precision must stay exact: every emitted
    # pair is a true pair with the identical rounded score.
    got_low = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in sm.cosine_neardup_pairs(emb, 0.45).collect()
    }
    want_low = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in sm.cosine_pairs_bruteforce(emb, 0.45).collect()
    }
    assert got_low <= want_low, f"false pairs: {sorted(got_low - want_low)[:5]}"


def test_srp_neardup_recall_on_planted_dups(spark):
    """Recall property on data with REAL near-dup structure: plant
    noisy copies (cos ~0.95+, the regime true duplicates live in) and
    assert the LSH tier finds the identical pair set brute force finds."""
    import numpy as np

    from cassandra_migrate_keyspace_from_cluster_spark.operators import similarity as sm

    rng = np.random.default_rng(7)
    base = rng.standard_normal((300, 64))
    rows = [(i, base[i].tolist()) for i in range(300)]
    # 40 planted near-dups: unit-scale noise at 1/8 amplitude -> cos ~0.96
    for j in range(40):
        noisy = base[j] + rng.standard_normal(64) * 0.125 * np.linalg.norm(
            base[j]
        ) / 8.0
        rows.append((1000 + j, noisy.tolist()))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = {(r.vec_a, r.vec_b) for r in sm.cosine_neardup_pairs(df, 0.8).collect()}
    want = {(r.vec_a, r.vec_b) for r in sm.cosine_pairs_bruteforce(df, 0.8).collect()}
    assert len(want) >= 40  # every planted copy qualifies
    assert got == want, f"missed: {sorted(want - got)[:5]} extra: {sorted(got - want)[:5]}"


def test_star_cc_equals_propagation(spark):
    """Small-star/large-star CC must produce the identical labeling as
    the min-label propagation loop on the real sf0.01 pair graph."""
    docs = load_table(spark, SF_T2, "documents")
    pairs = dd.jaccard_pairs_postings(docs, ["lang", "source"], 0.6)
    a = {(r.doc_id, r.cluster_id) for r in dd.neardup_clusters(docs, pairs).collect()}
    b = {
        (r.doc_id, r.cluster_id)
        for r in dd.neardup_clusters_star(docs, pairs).collect()
    }
    assert a == b


def test_star_cc_logarithmic_rounds_on_path_graph(spark):
    """Worst case for label propagation: a path of n nodes needs
    O(n) propagation rounds, but small-star/large-star must converge in
    O(log n). Assert the bound (2*log2(n)+4) on a 128-node path and
    that the labeling is the single full-path component."""
    import math

    n = 128
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a bigint, doc_b bigint"
    )
    stats = {}
    labels = dd.neardup_clusters_star(docs, pairs, stats=stats)
    got = {(r.doc_id, r.cluster_id) for r in labels.collect()}
    assert got == {(i, 0) for i in range(n)}
    bound = 2 * int(math.log2(n)) + 4
    assert stats["rounds"] <= bound, f"{stats['rounds']} rounds > {bound}"


def test_chunked_cosine_equals_single_broadcast(spark):
    """The chunked exact tier must be value-identical to f4's single
    broadcast across chunk sizes: many chunks, uneven last chunk, and
    one degenerate covers-everything chunk."""
    emb = load_table(spark, SF_T2, "embeddings")
    want = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in sim.cosine_topk(emb, k=5).collect()
    }
    for chunk in (64, 150, 10_000):
        got = {
            (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
            for r in sim.cosine_topk_chunked(emb, k=5, chunk_size=chunk).collect()
        }
        assert got == want, f"chunk_size={chunk} diverges from f4"


def test_wav_codec_roundtrip():
    """Pure-python WAV codec: encode→decode is identity for mono and
    stereo, odd/even sample counts (pad-byte path), varied rates."""
    import numpy as np

    from cassandra_migrate_keyspace_from_cluster_spark.operators import multimodal as mm

    rng = np.random.default_rng(3)
    for n, ch, rate in [(7, 1, 8000), (64, 1, 44100), (10, 2, 16000), (1, 1, 12000)]:
        s = rng.integers(-32768, 32767, size=n * ch, dtype=np.int16)
        payload = mm.encode_wav_pcm16(s, rate, n_channels=ch)
        r_rate, r_ch, r_s = mm.decode_wav_pcm16(payload)
        assert (r_rate, r_ch) == (rate, ch)
        assert np.array_equal(r_s, s)
    # malformed payloads must be rejected, not mis-parsed
    import pytest

    with pytest.raises(ValueError):
        mm.decode_wav_pcm16(b"RIFFxxxxJUNK")
    with pytest.raises(ValueError):
        mm.decode_wav_pcm16(b"\x00" * 40)


def test_bmp_codec_roundtrip():
    """Pure-python BMP codec: encode→decode is identity across widths
    that exercise every row-padding remainder (w*3 mod 4)."""
    import numpy as np
    import pytest

    from cassandra_migrate_keyspace_from_cluster_spark.operators import multimodal as mm

    rng = np.random.default_rng(11)
    for w, h in [(1, 1), (2, 3), (3, 2), (4, 5), (5, 4), (8, 6), (13, 7)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = mm.encode_bmp_24(img)
        back = mm.decode_bmp_24(payload)
        assert back.shape == (h, w, 3)
        assert np.array_equal(back, img), (w, h)
    with pytest.raises(ValueError):
        mm.decode_bmp_24(b"JUNK" + b"\x00" * 60)
    # top-down layout (negative height) must also decode
    import struct

    img = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    p = bytearray(mm.encode_bmp_24(img[::-1]))  # stored rows become top-down
    p[22:26] = struct.pack("<i", -3)
    assert np.array_equal(mm.decode_bmp_24(bytes(p)), img[::-1][::-1])


def test_png_codec_roundtrip_all_filters():
    """Stdlib-zlib PNG codec: encode→decode is IDENTITY (lossless), the
    adaptive encoder's streams collectively exercise every scanline
    filter (0-4), and corrupt CRCs are rejected."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from cassandra_migrate_keyspace_from_cluster_spark.operators import multimodal as mm

    rng = np.random.RandomState(5)
    used = set()
    for w, h in [(1, 1), (5, 4), (15, 9), (33, 17)]:
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        img = np.stack(
            [(2 * x + 13 * y) % 256, (9 * x + 4 * y) % 256,
             rng.randint(0, 256, (h, w))],
            axis=-1,
        ).astype(np.uint8)
        p = mm.encode_png_rgb8(img)
        assert p[:8] == b"\x89PNG\r\n\x1a\n"
        assert np.array_equal(mm.decode_png_rgb8(p), img), (w, h)
        pos = 8
        while True:
            ln, ct = struct.unpack(">I4s", p[pos : pos + 8])
            if ct == b"IDAT":
                raw = zlib.decompress(p[pos + 8 : pos + 8 + ln])
                break
            pos += 12 + ln
        used |= {raw[r * (w * 3 + 1)] for r in range(h)}
    assert used == {0, 1, 2, 3, 4}, used
    bad = bytearray(mm.encode_png_rgb8(np.zeros((2, 2, 3), np.uint8)))
    bad[20] ^= 0xFF
    with pytest.raises(ValueError):
        mm.decode_png_rgb8(bytes(bad))
    with pytest.raises(ValueError):
        mm.decode_png_rgb8(b"JUNKJUNK")


def test_avi_mjpeg_container_roundtrip():
    """Pure-python MJPEG-AVI: mux N frames → demux returns the same
    count/dims and per-frame JPEG payloads; sampling every 2nd frame
    decodes exactly the right frames; malformed containers and
    header/movi count mismatches are rejected."""
    import struct

    import numpy as np
    import pytest

    from cassandra_migrate_keyspace_from_cluster_spark.operators import multimodal as mm

    frames = []
    for fi in range(5):
        img = np.full((8, 16, 3), 40 * fi, np.uint8)
        frames.append(img)
    avi = mm.encode_avi_mjpeg(frames)
    n, w, h, payloads = mm.demux_avi_mjpeg(avi)
    assert (n, w, h) == (5, 16, 8)
    assert [p[:2] for p in payloads] == [b"\xff\xd8"] * 5
    sampled = mm.sample_video_frames(avi, 2)
    assert [i for i, _f in sampled] == [0, 2, 4]
    for i, f in sampled:
        assert f.shape == (8, 16, 3)
        assert np.array_equal(f, mm.decode_jpeg_baseline(payloads[i]))
    with pytest.raises(ValueError):
        mm.demux_avi_mjpeg(b"RIFFxxxxWAVE")
    # corrupt the avih frame count -> count mismatch must be caught
    bad = bytearray(avi)
    pos = bad.find(b"avih") + 8 + 16
    bad[pos : pos + 4] = struct.pack("<I", 99)
    with pytest.raises(ValueError):
        mm.demux_avi_mjpeg(bytes(bad))


def test_jpeg_codec_roundtrip_psnr():
    """Pure-numpy baseline JPEG codec: a smooth non-trivial image (AC
    coefficients, ZRL/EOB paths, byte stuffing all exercised) must
    survive encode→decode at quality 90 with PSNR > 35 dB and exact
    dimensions — including non-multiple-of-8 sizes (edge-padding path).
    Non-JPEG payloads and progressive markers must be rejected."""
    import numpy as np
    import pytest

    from cassandra_migrate_keyspace_from_cluster_spark.operators import multimodal as mm

    for h, w in [(40, 56), (17, 23)]:
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.clip(
            np.stack(
                [
                    128 + 100 * np.sin(xx / 9.0) * np.cos(yy / 7.0),
                    128 + 80 * np.cos(xx / 11.0),
                    128 + 60 * np.sin((xx + yy) / 13.0),
                ],
                axis=-1,
            ),
            0,
            255,
        ).astype(np.uint8)
        payload = mm.encode_jpeg_baseline(img, quality=90)
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        dec = mm.decode_jpeg_baseline(payload)
        assert dec.shape == img.shape
        mse = ((dec.astype(float) - img.astype(float)) ** 2).mean()
        psnr = 10 * np.log10(255.0**2 / mse)
        assert psnr > 35.0, (h, w, psnr)
        assert len(payload) < img.size, "no compression achieved"
    with pytest.raises(ValueError):
        mm.decode_jpeg_baseline(b"JUNK")


def test_jpeg_constant_tiles_decode_exactly():
    """The f17d determinism contract: constant-8x8-tile images decode
    to EXACTLY the arithmetic DC-chain prediction (YCbCr → half-up DC
    quantize at q=3 → reconstruct → clip) for every tile — this is the
    law the DuckDB oracle replays."""
    import math

    import numpy as np

    from cassandra_migrate_keyspace_from_cluster_spark.operators import multimodal as mm

    def predict(r, g, b):
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        rec = lambda v: math.floor(8.0 * (v - 128.0) / 3.0 + 0.5) * 3.0 / 8.0 + 128.0
        y2, cb2, cr2 = rec(y), rec(cb), rec(cr)
        clip = lambda x: min(255.0, max(0.0, math.floor(x + 0.5)))
        return (
            clip(y2 + 1.402 * (cr2 - 128.0)),
            clip(y2 - 0.344136 * (cb2 - 128.0) - 0.714136 * (cr2 - 128.0)),
            clip(y2 + 1.772 * (cb2 - 128.0)),
        )

    for doc_id in range(0, 2000, 29):
        wt, ht = 2 + doc_id % 3, 1 + doc_id % 2
        img = np.zeros((ht * 8, wt * 8, 3), np.uint8)
        preds = {}
        for ty in range(ht):
            for tx in range(wt):
                rgb = (
                    (doc_id + 37 * tx + 53 * ty) % 256,
                    (2 * doc_id + 11 * tx + 29 * ty) % 256,
                    (3 * doc_id + 17 * tx + 7 * ty) % 256,
                )
                img[ty * 8 : (ty + 1) * 8, tx * 8 : (tx + 1) * 8] = rgb
                preds[(tx, ty)] = predict(*map(float, rgb))
        dec = mm.decode_jpeg_baseline(mm.encode_jpeg_baseline(img, 90))
        for (tx, ty), exp in preds.items():
            tile = dec[ty * 8 : (ty + 1) * 8, tx * 8 : (tx + 1) * 8]
            assert (tile == np.asarray(exp, np.uint8)).all(), (doc_id, tx, ty)


def test_salted_join_equals_plain_join(spark):
    """The explicit salted join must be row-identical to the plain
    equi-join (fact=orders, dim=customer-per-key aggregate)."""
    from cassandra_migrate_keyspace_from_cluster_spark.operators import skew

    orders = load_table(spark, SF_T2, "orders")
    cust = load_table(spark, SF_T2, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_nationkey"
    )
    plain = orders.join(cust, "o_custkey")
    salted = skew.salted_join(orders, cust, "o_custkey", n_salts=8)
    assert salted.columns == plain.columns
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_banded_range_join_equals_nested_loop(spark):
    """The banded equi-join rewrite must return exactly the plain
    range-join pairs, across band widths (narrow = high replication,
    wide = one mega-band degenerating toward the cross form)."""
    from cassandra_migrate_keyspace_from_cluster_spark.operators.rangejoin import (
        banded_range_join,
    )

    p = load_table(spark, SF_T2, "part").filter(F.col("p_size") == 1).select(
        "p_partkey", "p_retailprice"
    )
    li = load_table(spark, SF_T2, "lineitem").limit(2000).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    lo, hi = F.col("p_retailprice") * 0.9, F.col("p_retailprice") * 1.1
    want = {
        (r.p_partkey, r.l_orderkey, r.l_linenumber)
        for r in li.join(
            p, F.col("l_extendedprice").between(lo, hi)
        ).collect()
    }
    for w in (64.0, 256.0, 1e6):
        got = {
            (r.p_partkey, r.l_orderkey, r.l_linenumber)
            for r in banded_range_join(
                li, p, F.col("l_extendedprice"), lo, hi, band_width=w
            ).collect()
        }
        assert got == want, f"band_width={w}"


def test_minhash_vocab_broadcast_path_equals_inline(spark):
    """r14 vocab-dedup fast path: minhash_signatures_wide must produce
    BIT-IDENTICAL signatures whether the pinned hashes are computed
    per shingle ROW (inline; budget=0 forces it), per DISTINCT shingle
    via the broadcast vocab (budget high), or via the budget-overflow
    fallback (budget=1 counts the vocab and falls back) — the pinned
    md5 value per (seed, shingle) is the cross-engine contract."""
    from cassandra_migrate_keyspace_from_cluster_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "the quick brown fox jumps over the lazy dog"),
            (4, "entirely different words live here today folks"),
            (5, "xx"),  # < k tokens: dropped by every path
        ],
        "doc_id bigint, text string",
    )
    outs = {
        budget: sorted(
            map(
                tuple,
                dd.minhash_signatures_wide(
                    docs, n_hashes=8, vocab_broadcast_budget=budget
                ).collect(),
            )
        )
        for budget in (0, 10**6, 1)
    }
    assert outs[0] == outs[10**6] == outs[1]
    assert len(outs[0]) == 4  # doc 5 dropped, all others signed


def test_pinned_minhash_recall_vs_exact_shingle_jaccard(spark):
    """f24 (pinned-hash MinHash-LSH) candidates must recover >=90% of
    the truly-near-dup pairs (exact 3-shingle Jaccard >= 0.9, computed
    by brute force here). Deterministic: pinned md5 hashes mean the
    same candidates on every run/engine, so the measured recall is a
    constant of the dataset, not a flaky sample."""
    docs = load_table(spark, SF_T2, "documents")
    sh = docs.filter(F.size(F.split("text", " ")) >= 3).select(
        "doc_id", dd.shingles("text", 3).alias("sh")
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    exact_df = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "j",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("j") >= 0.9)
    )
    exact = _pair_set(exact_df, "doc_a", "doc_b")
    cand = _pair_set(ALL["f24_minhash_pinned_lsh"].fn(spark, SF_T2), "doc_a", "doc_b")
    assert exact, "no exact near-dup pairs at >=0.9 — planted dups missing?"
    recall = len(exact & cand) / len(exact)
    assert recall >= 0.9, f"pinned-LSH recall {recall:.3f} < 0.9 ({len(exact)} exact pairs)"


def test_pq_recall_vs_exact_cosine(spark):
    """f33 (PQ-ADC, 8 bytes/vector = 32x compression) recall against
    the exact f4 truth. Near-gaussian vectors are PQ's WORST case
    (no subspace structure to exploit), so absolute recall is modest —
    but it must beat chance (5/499 ≈ 1%) by a wide margin, and the
    seeded codebooks make the measured value a deterministic constant
    of the dataset, not a flaky sample."""
    pq = ALL["f33_pq_topk"].fn(spark, SF_T2).toPandas()
    exact = ALL["f4_cosine_topk"].fn(spark, SF_T2).toPandas()
    pq_set = {(r.query_id, r.neighbor_id) for r in pq.itertuples()}
    ex_set = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    recall5 = len(pq_set & ex_set) / len(ex_set)
    ex1 = exact[exact["rank"] == 1]
    ex1_set = {(r.query_id, r.neighbor_id) for r in ex1.itertuples()}
    top1 = len(ex1_set & pq_set) / len(ex1_set)
    assert recall5 >= 0.25, f"PQ recall@5 {recall5:.3f} < 0.25"
    assert top1 >= 0.40, f"PQ top1-in-top5 {top1:.3f} < 0.40"


def test_hll_sketch_merge_consistency(spark):
    """c24: the union of per-day HLL sketches must estimate the SAME
    value as one sketch built over the whole month (merge = rescan,
    the mergeability law), and land within 5% of the exact distinct
    count."""
    ev = load_table(spark, SF_T2, "events")
    merged = (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0]["est"]
    exact = ev.select("user_id").distinct().count()
    assert merged == direct, (merged, direct)
    assert abs(merged - exact) / exact < 0.05, (merged, exact)


def test_count_min_sketch_merge_law_and_overcount(spark):
    """c25: CMS sketches of disjoint corpus halves must ADD cell-wise
    to the whole-corpus sketch (merge = rescan), and point estimates
    must never undercount the exact frequency."""
    from pyspark.sql import functions as F

    from cassandra_migrate_keyspace_from_cluster_spark.operators import text as tx

    docs = load_table(spark, SF_T2, "documents")
    tok = lambda d: (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    full = tx.count_min_sketch(tok(docs), depth=4, width=512)
    h1 = tx.count_min_sketch(tok(docs.filter(F.col("doc_id") % 2 == 0)), 4, 512)
    h2 = tx.count_min_sketch(tok(docs.filter(F.col("doc_id") % 2 == 1)), 4, 512)
    summed = (
        h1.unionByName(h2)
        .groupBy("r", "cell")
        .agg(F.sum("n_cell").alias("n_cell"))
    )
    diff = (
        full.withColumnRenamed("n_cell", "n_full")
        .join(summed, ["r", "cell"], "full")
        .filter(
            F.coalesce(F.col("n_full"), F.lit(0))
            != F.coalesce(F.col("n_cell"), F.lit(0))
        )
        .count()
    )
    assert diff == 0, f"{diff} cells differ between merged and direct sketches"

    # estimates never undercount
    exact = tok(docs).groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    probe = exact.select(
        "token", "exact_n", F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("r")
    ).withColumn("cell", tx.cms_cell(F.col("token"), F.col("r"), 512))
    est = (
        probe.join(F.broadcast(full), ["r", "cell"])
        .groupBy("token", "exact_n")
        .agg(F.min("n_cell").alias("est"))
    )
    under = est.filter(F.col("est") < F.col("exact_n")).count()
    assert under == 0, f"{under} tokens undercounted"


def test_semantic_dedup_kmeans_recall_on_planted_dups(spark):
    """f42b: planted noisy copies (cos ~0.96 to their source) must be
    flagged as semantic duplicates by the KMeans tier — a very-near
    duplicate lands in its source's KMeans cell, so the within-cell
    rule must catch it (recall >= 0.9 tolerates rare cell-boundary
    splits). The seed-based tier must flag planted copies too."""
    import numpy as np

    from cassandra_migrate_keyspace_from_cluster_spark.operators import similarity as sm

    rng = np.random.default_rng(11)
    base = rng.standard_normal((300, 64))
    rows = [(i, base[i].tolist()) for i in range(300)]
    planted = []
    for j in range(40):
        noisy = base[j] + rng.standard_normal(64) * np.linalg.norm(base[j]) / 64.0
        rows.append((1000 + j, noisy.tolist()))
        planted.append(1000 + j)
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = sm.semantic_dedup_kmeans(df, k=16, threshold=0.9)
    flagged = {
        r.vec_id for r in out.filter(F.col("is_dup") == 1).collect()
    }
    recall = len(set(planted) & flagged) / len(planted)
    assert recall >= 0.9, f"KMeans-tier recall {recall:.2f}; flagged={sorted(flagged)[:10]}"


def test_hof_let_binds_value_once_and_nests(spark):
    """functions/hof.let: body sees the bound value (list + scalar),
    null propagates as a bound null (body still runs), and nested
    higher-order functions can close over the bound variable."""
    from cassandra_migrate_keyspace_from_cluster_spark.functions.hof import let

    df = spark.createDataFrame(
        [(1, "a b c"), (2, None)], "id bigint, txt string"
    )
    out = df.select(
        "id",
        let(
            F.split("txt", " "),
            lambda toks: F.when(
                toks.isNull(), F.lit(-1)
            ).otherwise(
                F.aggregate(
                    toks,
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + F.length(x).cast("bigint"),
                )
            ),
        ).alias("total_len"),
    ).orderBy("id")
    rows = [tuple(r) for r in out.collect()]
    assert rows == [(1, 3), (2, -1)], rows

    # long-form minhash signatures (unpivoted from wide) keep the
    # (doc, j, mh) contract: n_hashes rows per doc, j densely 0..n-1
    import cassandra_migrate_keyspace_from_cluster_spark.operators.dedup as dd

    docs = spark.createDataFrame(
        [(1, "one two three four"), (2, "alpha beta gamma")],
        "doc_id bigint, text string",
    )
    sig = dd.minhash_signatures(docs, n_hashes=8).collect()
    assert len(sig) == 16
    per_doc = {}
    for r in sig:
        per_doc.setdefault(r.doc_id, []).append(r.j)
    assert all(sorted(js) == list(range(8)) for js in per_doc.values())


def test_jaccard_three_forms_on_adversarial_shapes(spark):
    """The three exact-Jaccard implementations must agree on shapes the
    fixture corpus doesn't exercise: identical docs, strict token
    subsets, single-token docs, disjoint docs, and a token shared by
    every doc in a block (stopword df spike). Seeded, deterministic."""
    rows = [
        (1, "en", "web", "a b c d"),
        (2, "en", "web", "a b c d"),        # identical to 1
        (3, "en", "web", "a b c"),          # strict subset
        (4, "en", "web", "x"),              # single token
        (5, "en", "web", "p q r s t"),      # disjoint from 1-3 except none
        (6, "en", "web", "a p q r s"),      # bridges via 'a'
        (7, "en", "cc", "a b c d"),         # other block: never pairs with 1
        (8, "fr", "web", "a b c d"),        # other block again
        (9, "en", "web", "b c d a"),        # same set as 1, other order
        (10, "en", "web", "a a b b c c d"), # dup tokens collapse distinct
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, lang string, source string, text string"
    )
    for thr in (0.3, 0.6, 1.0):
        forms = [
            dd.jaccard_pairs(docs, ["lang", "source"], thr),
            dd.jaccard_pairs_postings(docs, ["lang", "source"], thr),
            dd.jaccard_pairs_prefix(docs, ["lang", "source"], thr),
        ]
        sets = [
            {(r.doc_a, r.doc_b, r.jaccard) for r in f.collect()} for f in forms
        ]
        assert sets[0] == sets[1] == sets[2], (thr, sets)
    # sanity at thr=1.0: exactly the identical-set pairs within block
    exact = {
        (r.doc_a, r.doc_b)
        for r in dd.jaccard_pairs_prefix(docs, ["lang", "source"], 1.0).collect()
    }
    assert exact == {(1, 2), (1, 9), (2, 9), (1, 10), (2, 10), (9, 10)}, exact


def test_content_fingerprint_tracks_source_mutation(tmp_path):
    """Staging tags must change when the data at a stable path changes:
    the grading driver regenerates fixtures in-place mid-round, and a
    (path, row-count)-keyed tag silently reused stale stagings (ADVICE
    r4, medium). Non-path keys pass through untouched."""
    import os
    import time

    from cassandra_migrate_keyspace_from_cluster_spark.util import content_fingerprint

    src = tmp_path / "embeddings.parquet"
    src.write_bytes(b"v1-bytes")
    fp_dir_1 = content_fingerprint(str(tmp_path))
    fp_file_1 = content_fingerprint(str(src))
    # same content, same stat → identical fingerprint (reuse works)
    assert content_fingerprint(str(tmp_path)) == fp_dir_1
    # regenerate in place with the SAME size (the dangerous case:
    # row-count-keyed tags cannot see this) — mtime must flip the tag
    time.sleep(0.01)
    src.write_bytes(b"v2-bytes")
    assert content_fingerprint(str(tmp_path)) != fp_dir_1
    assert content_fingerprint(str(src)) != fp_file_1
    # non-path keys are passed through verbatim
    assert content_fingerprint("sf0.01|m=8") == "sf0.01|m=8"
    # non-parquet files do not affect the directory fingerprint
    (tmp_path / "_SUCCESS").write_bytes(b"")
    fp_dir_2 = content_fingerprint(str(tmp_path))
    (tmp_path / "_SUCCESS").write_bytes(b"x")
    assert content_fingerprint(str(tmp_path)) == fp_dir_2


def test_evict_stale_tags_keeps_recent_siblings(tmp_path):
    """Alternating two corpora (sf0.01 parity / sf0.1 bench) must keep
    both stagings warm; evicting every sibling on each call silently
    defeated the reuse (ADVICE r4, low)."""
    import os
    import time

    from cassandra_migrate_keyspace_from_cluster_spark.util import evict_stale_tags

    tags = []
    for i in range(6):
        d = tmp_path / f"tag{i}"
        d.mkdir()
        os.utime(d, ns=(i * 10**9, i * 10**9))  # distinct, ordered mtimes
        tags.append(d)
    keep = tags[0]  # oldest is the active tag
    evict_stale_tags(str(tmp_path), keep=str(keep), max_tags=4)
    survivors = sorted(p.name for p in tmp_path.iterdir())
    # active tag + the 3 most recently modified siblings survive
    assert survivors == ["tag0", "tag3", "tag4", "tag5"]


def test_bounded_persist_caps_cached_frames(spark):
    """The FIFO persist registry must unpersist the oldest frame past
    the cap so long-lived sessions hold a bounded cached working set,
    and eviction must not break later reuse (recompute is fine)."""
    from cassandra_migrate_keyspace_from_cluster_spark import util as U

    registered = []
    try:
        for i in range(U._PERSIST_CAP + 3):
            df = U.bounded_persist(spark.range(10 + i))
            registered.append(df)
            df.count()
        assert len(U._PERSISTED) == U._PERSIST_CAP
        # oldest frames were unpersisted but still compute correctly
        assert registered[0].count() == 10
        assert not registered[0].storageLevel.useMemory
        assert registered[-1].storageLevel.useMemory
    finally:
        for df in registered:
            df.unpersist(blocking=False)
        U._PERSISTED.clear()


def test_drain_persisted_empties_fifo_and_uncaches(spark):
    """drain_persisted (r14 bench rep hygiene) must unpersist and
    forget every registered frame — a timed bench rep then starts with
    an empty cache — while leaving the frames recomputable."""
    from cassandra_migrate_keyspace_from_cluster_spark import util as U

    dfs = [U.bounded_persist(spark.range(20 + i)) for i in range(3)]
    for df in dfs:
        df.count()
    assert len(U._PERSISTED) == 3
    U.drain_persisted()
    assert U._PERSISTED == []
    for i, df in enumerate(dfs):
        assert not df.storageLevel.useMemory
        assert df.count() == 20 + i


def test_chunked_staging_refreshes_on_source_change(spark, tmp_path):
    """cosine_topk_chunked's content-keyed staging must be reused while
    the source is unchanged and REBUILT when the parquet at the same
    path is regenerated (ADVICE r4 medium: a (path, row-count) tag
    silently served neighbors computed from pre-regeneration data)."""
    import os
    import shutil
    import time

    import numpy as np

    from cassandra_migrate_keyspace_from_cluster_spark.operators import similarity as sim
    from cassandra_migrate_keyspace_from_cluster_spark.util import scratch_dir

    rng = np.random.default_rng(7)
    src = str(tmp_path / "emb")

    def write_corpus(seed):
        r = np.random.default_rng(seed)
        rows = [
            (int(i), [float(x) for x in r.normal(size=8)]) for i in range(40)
        ]
        spark.createDataFrame(rows, "vec_id bigint, embedding array<float>").coalesce(
            1
        ).write.mode("overwrite").parquet(src)

    def run():
        emb = spark.read.parquet(src)
        return {
            (r.query_id, r.neighbor_id)
            for r in sim.cosine_topk_chunked(
                emb, k=2, chunk_size=25, corpus_key=src
            ).collect()
        }

    write_corpus(1)
    first = run()
    tags_after_first = set(os.listdir(scratch_dir("f4c_corpus")))
    # unchanged source → same tag set (staging reused, not rewritten)
    assert run() == first
    assert set(os.listdir(scratch_dir("f4c_corpus"))) == tags_after_first
    # regenerated source, same row count → new tag, fresh neighbors
    time.sleep(0.05)
    write_corpus(2)
    second = run()
    assert set(os.listdir(scratch_dir("f4c_corpus"))) != tags_after_first
    assert second != first  # different embeddings ⇒ different neighbors


def test_registry_window_is_the_first_fifty():
    """The driver's correctness harness checks the FIRST 50 registry
    entries, so the rotation mechanism is ordering: the declared window
    must be exactly the first 50 names queries() yields, every window
    name must resolve, and the rows-only set (no oracle) must stay the
    8 declared engine-specific ops (f3b graduated to hash-checkable in
    r10 via the pinned md5 simhash)."""
    from cassandra_migrate_keyspace_from_cluster_spark import registry

    registry.load_all()
    names = list(registry.queries())
    assert len(registry._WINDOW) == 50
    assert set(names[:50]) == registry._WINDOW
    assert registry._WINDOW <= set(registry.QUERIES)
    no_oracle = {n for n, s in registry.specs().items() if s.oracle is None}
    assert no_oracle == {
        "c6_approx_quantile", "c7_approx_cd", "c24_hll_mergeable",
        "f3_minhash_lsh", "f5_ann_lsh", "f5b_ivf_topk",
        "f33_pq_topk", "f42b_semantic_dedup_kmeans",
    }
    # oracle_sql only carries hash-checkable queries, same order
    assert set(registry.oracle_sql()) == set(names) - no_oracle


def test_similarity_tier_choice_table():
    """The SURVEY §4 auto-selector: documented decision table over
    (rows x dim vs executor memory), plus the monotonicity law — growing
    the corpus never moves the choice back toward a tier that assumes a
    smaller memory footprint."""
    GB = 1 << 30
    # (n_rows, dim, mem, exact_required) -> expected tier
    table = [
        # fits the broadcast fraction -> exact wins regardless of flag
        (10_000, 128, 1 * GB, False, "exact_broadcast"),
        (10_000, 128, 1 * GB, True, "exact_broadcast"),
        # 8 GB corpus vs 4 GB executor: too big to broadcast
        (8_000_000, 128, 4 * GB, True, "exact_chunked"),
        (8_000_000, 128, 4 * GB, False, "ivf"),
        # 1 TB corpus vs 4 GB executor: past the IVF spill bound (64x)
        (1_000_000_000, 128, 4 * GB, False, "pq"),
        (1_000_000_000, 128, 4 * GB, True, "exact_chunked"),
    ]
    for n, d, mem, exact, want in table:
        got = sim.choose_similarity_tier(n, d, mem, exact_required=exact)
        assert got == want, (n, d, mem, exact, got, want)
    # monotonicity law: as n grows with mem fixed, the approximate
    # ladder only ever descends exact_broadcast -> ivf -> pq
    order = ["exact_broadcast", "ivf", "pq"]
    last = 0
    for n in [10**i for i in range(2, 11)]:
        tier = sim.choose_similarity_tier(n, 128, 4 * GB)
        idx = order.index(tier)
        assert idx >= last, (n, tier)
        last = idx
    # and with exact_required the ladder is exact_broadcast -> chunked
    order_e = ["exact_broadcast", "exact_chunked"]
    last = 0
    for n in [10**i for i in range(2, 11)]:
        tier = sim.choose_similarity_tier(n, 128, 4 * GB, exact_required=True)
        idx = order_e.index(tier)
        assert idx >= last, (n, tier)
        last = idx
    import pytest

    with pytest.raises(ValueError):
        sim.choose_similarity_tier(0, 128, 4 * GB)


def test_parse_spark_mem_bytes_contract():
    """Spark's byte-string contract for spark.executor.memory: bare
    numbers are MiB (not bytes — the bytes reading is a 2^20
    underestimate that would misroute a broadcast-fit corpus to an
    approximate tier), unit suffixes are binary with an optional
    trailing 'b', and fractional magnitudes parse leniently."""
    GB = 1 << 30
    assert sim.parse_spark_mem_bytes("1g") == GB
    assert sim.parse_spark_mem_bytes("4G") == 4 * GB
    assert sim.parse_spark_mem_bytes("512m") == 512 << 20
    assert sim.parse_spark_mem_bytes("512mb") == 512 << 20
    assert sim.parse_spark_mem_bytes("  2T ") == 2 << 40
    # suffix-less = MiB, the Spark reading (NOT bytes)
    assert sim.parse_spark_mem_bytes("1024") == 1 << 30
    assert sim.parse_spark_mem_bytes("1.5g") == int(1.5 * GB)
    assert sim.parse_spark_mem_bytes("0.5k") == 512
    # a bare 'b' after digits is JavaUtils' bytes suffix, not a crash
    assert sim.parse_spark_mem_bytes("1048576b") == 1 << 20
    assert sim.parse_spark_mem_bytes("0b") == 0
    assert sim.parse_spark_mem_bytes(" 2.5B ") == 2


def test_auto_cosine_topk_embedding_col_param(spark):
    """A corpus whose vector column is not named 'embedding' must route
    and answer identically once embedding_col names it."""
    emb = sim.with_double_embedding(
        load_table(spark, "/root/testdata/sf0.001", "embeddings")
    )
    renamed = emb.withColumnRenamed("embedding", "vec")
    chosen: dict = {}
    got = sim.auto_cosine_topk(
        renamed, k=3, embedding_col="vec", chosen=chosen
    ).collect()
    assert chosen["tier"] == "exact_broadcast"
    want = sim.auto_cosine_topk(emb, k=3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # an unrelated pre-existing 'embedding' column must not collide
    # with the rename (duplicate names → ambiguous downstream F.col)
    decoy = renamed.withColumn("embedding", F.lit("decoy"))
    got2 = sim.auto_cosine_topk(decoy, k=3, embedding_col="vec").collect()
    assert sorted(map(tuple, got2)) == sorted(map(tuple, want))


def test_auto_cosine_topk_dispatches_and_matches_exact(spark):
    """The dispatcher must (a) route the fixture corpus (tiny) to the
    exact broadcast tier and reproduce cosine_topk's rows exactly, and
    (b) route to IVF when executor memory is squeezed below the corpus
    footprint while approximate is allowed."""
    emb = sim.with_double_embedding(
        load_table(spark, "/root/testdata/sf0.001", "embeddings")
    )
    chosen: dict = {}
    got = sim.auto_cosine_topk(emb, k=3, chosen=chosen).collect()
    assert chosen["tier"] == "exact_broadcast"
    want = sim.cosine_topk(emb, k=3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # squeeze memory: footprint = n*d*8; force it past the broadcast
    # fraction but inside the IVF spill bound
    footprint = chosen["n_rows"] * chosen["dim"] * 8
    squeezed = int(footprint / 0.25) // 2
    chosen2: dict = {}
    out = sim.auto_cosine_topk(
        emb, k=3, executor_mem_bytes=squeezed, chosen=chosen2, n_probe=2
    )
    assert chosen2["tier"] == "ivf"
    assert out.count() > 0


def test_auto_cosine_topk_chunked_and_pq_routes_run(spark):
    """The two remaining dispatch routes end to end: exact_required
    under squeezed memory must route to the chunked tier and still
    reproduce the exact result (recall 1.0 is the tier's contract);
    a footprint past the IVF spill bound must route to PQ and return
    k candidates per query."""
    emb = sim.with_double_embedding(
        load_table(spark, "/root/testdata/sf0.001", "embeddings")
    )
    n, d = emb.count(), len(emb.select("embedding").first()[0])
    footprint = n * d * 8
    squeezed = int(footprint / 0.25) // 2
    chosen: dict = {}
    got = sim.auto_cosine_topk(
        emb, k=3, executor_mem_bytes=squeezed, chosen=chosen,
        exact_required=True, chunk_size=max(200, n // 3),
    ).collect()
    assert chosen["tier"] == "exact_chunked"
    want = sim.cosine_topk(emb, k=3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    chosen2: dict = {}
    out = sim.auto_cosine_topk(
        emb, k=3, executor_mem_bytes=max(1, footprint // 128), chosen=chosen2
    )
    assert chosen2["tier"] == "pq"
    assert out.groupBy("query_id").count().filter("count > 3").count() == 0
    assert out.count() > 0


def test_f4d_auto_tier_routes_exact_and_matches_f4(spark):
    """The REGISTERED auto-tier query (f4d) must route the sandbox
    corpus to the exact broadcast tier end to end and return exactly
    f4's rows — the driver-path proof that the selector's dispatch
    adds routing, not a silent recall trade (r8 VERDICT item 6)."""
    from cassandra_migrate_keyspace_from_cluster_spark.queries.part_f_llm import (
        f4_cosine_topk,
        f4d_auto_tier,
    )

    sf = "/root/testdata/sf0.001"
    got = f4d_auto_tier(spark, sf).collect()
    want = f4_cosine_topk(spark, sf).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) > 0


def test_auto_cosine_topk_empty_corpus_degrades_gracefully(spark):
    """An empty corpus must route to the exact tier's empty-staging
    path (0 rows, contract schema) — not reach choose_similarity_tier,
    whose n_rows=0 ValueError is a law about sizing a corpus that
    does not exist (the empty-input gate's quiet-day shape)."""
    emb = spark.createDataFrame(
        [], "vec_id bigint, embedding array<float>"
    )
    chosen: dict = {}
    out = sim.auto_cosine_topk(emb, k=3, chosen=chosen)
    assert chosen["tier"] == "exact_broadcast"
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "cos_sim", "rank",
    ]


def test_auto_cosine_topk_null_leading_vectors(spark):
    """Corpus stats must be computed over the VALID vectors: with a
    NULL embedding in row 0, a raw first(size(embedding)) returns
    d=None and the selector crashes on None <= int (pool-sweep find,
    r9 — any generated keyspace whose first row is a null vector);
    with ALL vectors invalid the filtered count is 0 and the empty
    branch owns the route. Results must equal the same search with
    the invalid rows pre-dropped (the tiers drop them anyway)."""
    rows = [
        (1, None),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.5, 0.5, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    chosen: dict = {}
    got = sim.auto_cosine_topk(emb, k=2, chosen=chosen)
    assert chosen["tier"] == "exact_broadcast"
    assert chosen["n_rows"] == 3 and chosen["dim"] == 4
    want = sim.auto_cosine_topk(emb.filter("embedding IS NOT NULL"), k=2)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    all_null = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id bigint, embedding array<float>"
    )
    chosen2: dict = {}
    out = sim.auto_cosine_topk(all_null, k=2, chosen=chosen2)
    assert chosen2["tier"] == "exact_broadcast"
    assert out.count() == 0


def test_exact_mean6_matches_rational_truth(spark):
    """functions/rounding.exact_mean6 (Spark), sql_exact_mean6 (DuckDB),
    and multimodal.exact_mean6 (numpy path) must all equal the true
    rational mean rounded half-away-from-zero at 6dp — including the
    dyadic exact-half family (s odd, n = 128) where the engines' own
    round() implementations disagree (measured 74/5000 on constructed
    halves: Spark shortest-repr HALF_UP vs DuckDB binary vs Python/
    numpy half-even)."""
    import math
    from fractions import Fraction

    import duckdb
    import numpy as np

    from cassandra_migrate_keyspace_from_cluster_spark.functions.rounding import (
        exact_mean6,
        sql_exact_mean6,
    )
    from cassandra_migrate_keyspace_from_cluster_spark.operators.multimodal import (
        exact_mean6 as np_mean6,
    )

    cases = [(s, 128) for s in (-257, -3, 1, 5, 321, 999)]  # dyadic halves
    cases += [(s, n) for s in (-10**9, -12345, 0, 7, 10**9) for n in (3, 7, 100, 640)]
    df = spark.createDataFrame(cases, "s long, n long")
    got = {(r.s, r.n): r.m for r in df.select("s", "n", exact_mean6("s", "n").alias("m")).collect()}
    con = duckdb.connect()
    # named params: the SQL references each of s/n several times (the
    # n=0 guard and both sign branches), so positional ? would demand
    # one bind per textual occurrence
    sql = f"SELECT {sql_exact_mean6('$s::BIGINT', '$n::BIGINT')}"
    for s, n in cases:
        fr = Fraction(s, n) * 10**6
        truth = (
            math.floor(fr + Fraction(1, 2)) if s >= 0
            else -math.floor(-fr + Fraction(1, 2))
        ) / 1e6
        assert got[(s, n)] == truth, (s, n, got[(s, n)], truth)
        assert con.execute(sql, {"s": s, "n": n}).fetchone()[0] == truth, (s, n)
        # numpy-path helper: an integer array with this sum/size
        arr = np.full(n, s // n, dtype=np.int64)
        arr[: s - (s // n) * n] += 1
        assert int(arr.sum()) == s
        assert np_mean6(arr) == truth, (s, n)
    # n = 0 (empty group / empty input) -> NULL in both engines, not a
    # division error: the CASE guard must short-circuit the div
    df0 = spark.createDataFrame([(5, 0)], "s long, n long")
    assert df0.select(exact_mean6("s", "n").alias("m")).collect()[0].m is None
    assert con.execute(sql, {"s": 5, "n": 0}).fetchone()[0] is None


def test_textedge_engine_string_laws(spark):
    """Pin the cross-engine string laws the textedge data-shift mode
    rests on (SURVEY.md §5.4). Each assertion is an ENGINE property
    probed 2026-08-15 on Spark 4.1 / DuckDB 1.0.0; if an engine
    upgrade flips one, the textedge shape policy must be re-derived.

    1. base64: Spark's base64() is MIME-chunked (CRLF every 76 chars);
       DuckDB's and Python's are RFC 4648 unwrapped. The declared
       contract is unwrapped — d16 strips the wraps.
    2. levenshtein: Spark computes over CODEPOINTS, DuckDB over UTF-8
       BYTES — equal exactly on ASCII. Oracle-checked distance queries
       must keep non-ASCII out of the distance operands (d3's
       replace-derived operand pairs are alignment-safe by
       construction: the multibyte segments are identical).
    3. case mapping: Spark implements Unicode FULL mapping (Java:
       'ß'→'SS', 'İ'→'i'+U+0307), DuckDB SIMPLE 1:1 ('ß'→'ẞ',
       'İ'→'i'). They agree outside SpecialCasing/contextual-Σ, which
       is where TEXT_EDGE_SHAPES lives.
    4. string sort: Spark orders strings UTF-8-bytewise (unsigned).
       DuckDB's '<' comparator agrees, but its 1.0.0 ORDER BY sort-key
       path can misorder non-ASCII when long strings share the sort
       (signed-byte radix) — so every value-affecting oracle sort key
       over a possibly-non-ASCII string rides encode() (BLOB keys
       sort correctly and identically to Spark).
    """
    import base64 as b64mod
    import os
    import sys

    import duckdb

    from pyspark.sql import functions as F

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), os.pardir, "tools")
    )
    from data_shift import TEXT_EDGE_SHAPES

    con = duckdb.connect()

    # 1. base64 wrap/strip
    long = "z" * 100
    raw = spark.createDataFrame([(long,)], "s string").select(
        F.base64(F.col("s").cast("binary")).alias("b")
    ).collect()[0].b
    assert "\r\n" in raw  # Spark wraps...
    want = b64mod.b64encode(long.encode()).decode()
    assert raw.replace("\r\n", "") == want  # ...and stripping = RFC 4648
    assert con.execute("SELECT base64(encode(?))", [long]).fetchone()[0] == want

    # 2. levenshtein units
    a, b = "ΔΣθ", "z"
    s_lev = spark.createDataFrame([(a, b)], "a string, b string").select(
        F.levenshtein("a", "b").alias("d")
    ).collect()[0].d
    assert s_lev == 3  # codepoints
    assert con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0] == 6  # bytes
    # d3's operand construction stays engine-agnostic even on unicode:
    # replace('0'->'1') only edits ASCII positions, so byte and
    # codepoint distance both equal the number of '0's
    u = "naï0ve0🚀"
    got = spark.createDataFrame([(u,)], "s string").select(
        F.levenshtein("s", F.replace("s", F.lit("0"), F.lit("1"))).alias("d")
    ).collect()[0].d
    assert got == 2
    assert con.execute(
        "SELECT levenshtein(?, replace(?, '0', '1'))", [u, u]
    ).fetchone()[0] == 2

    # 3. case mapping: full-vs-simple divergence pinned...
    s_up = spark.createDataFrame([("ß", "İ")], "a string, b string").select(
        F.upper("a").alias("ua"), F.lower("b").alias("lb")
    ).collect()[0]
    assert (s_up.ua, s_up.lb) == ("SS", "i̇")
    d_up = con.execute("SELECT upper('ß'), lower('İ')").fetchone()
    assert d_up == ("ẞ", "i")
    # ...and the r11 policy boundary: the GUARDED forms (the case-fold
    # law, functions/casefold.py) agree on EVERY textedge shape —
    # including the divergent ones the pre-r11 policy had to exclude
    from cassandra_migrate_keyspace_from_cluster_spark.functions import (
        casefold as cf,
    )

    sdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(TEXT_EDGE_SHAPES)], "i int, s string"
    ).select(
        "i", cf.guarded_upper("s").alias("u"), cf.guarded_lower("s").alias("l"),
        cf.exact_fold("s").alias("f"),
    ).collect()
    for row, shape in zip(sorted(sdf, key=lambda r: r.i), TEXT_EDGE_SHAPES):
        du, dl, df_ = con.execute(
            f"SELECT {cf.sql_guarded_upper('?')}, "
            f"{cf.sql_guarded_lower('?')}, {cf.sql_exact_fold('?')}",
            [shape] * 7,
        ).fetchone()
        assert (row.u, row.l, row.f) == (du, dl, df_), shape

    # 4. sort order: Spark == python byte order == DuckDB encode()
    # order on the misorder trigger set (long string + non-ASCII)
    vals = ["", "🚀x", "z", "naïve é 12byte", "Δgreek", "a" * 13]
    want_order = sorted(vals, key=lambda s: s.encode())
    s_order = [
        r.s
        for r in spark.createDataFrame([(v,) for v in vals], "s string")
        .orderBy("s")
        .collect()
    ]
    assert s_order == want_order
    con.execute("CREATE TABLE tsort (s VARCHAR)")
    con.executemany("INSERT INTO tsort VALUES (?)", [(v,) for v in vals])
    d_order = [
        r[0]
        for r in con.execute("SELECT s FROM tsort ORDER BY encode(s)").fetchall()
    ]
    assert d_order == want_order
    # DuckDB's comparator itself agrees too (the bug is only in the
    # ORDER BY sort-key path, which is why encode() is the law)
    assert con.execute("SELECT 'z' < 'Δ', '' < '🚀'").fetchone() == (True, True)


def test_degenerate_stddev_engine_epsilon_law(spark):
    """Pin the engine behavior behind the exact-degeneracy-gate law
    (SURVEY.md §5.4, from the skewkey probe): on the skewkey-perturbed
    events table (one user's rows replicated 100x -> RANGE frames of
    101 identical values inside a large mixed partition), DuckDB's
    WINDOWED stddev_samp returns a small positive accumulator epsilon
    (~8e-17 measured; its plain aggregate and simple synthetic windows
    return exact 0 — the epsilon is a property of its windowed
    accumulator on this real layout), while Spark returns exactly 0.
    So any `sd > 0` definedness gate flips between engines; the
    shipped gate is the exact `min < max` comparison (e11, g4). If an
    engine upgrade makes this pin fail, re-derive the law (the exact
    gate stays correct either way)."""
    import os
    import sys
    import tempfile

    import duckdb

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), os.pardir, "tools")
    )
    from data_shift import perturb_skewkey

    with tempfile.TemporaryDirectory(prefix="skewpin_") as out:
        perturb_skewkey("/root/testdata/sf0.001", out)
        win = """
          SELECT stddev_samp(value) OVER w AS sd,
                 min(value) OVER w AS mn, max(value) OVER w AS mx,
                 count(*) OVER w AS n
          FROM events
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY date_trunc('second', ts)
                       RANGE BETWEEN INTERVAL 7 DAY PRECEDING
                             AND CURRENT ROW)
        """
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{out}/events.parquet')"
        )
        eps = con.execute(
            f"SELECT max(sd) FROM ({win}) WHERE mn = mx AND n > 1"
        ).fetchone()[0]
        assert eps is not None and 0 < eps < 1e-9, eps
        # Spark, same frames: all-equal -> exactly 0 (load_table for
        # the NTZ-timestamp normalization the whole query layer uses)
        from pyspark.sql import Window

        from cassandra_migrate_keyspace_from_cluster_spark.sources import (
            load_table,
        )

        w = (
            Window.partitionBy("user_id")
            .orderBy(F.unix_timestamp("ts"))
            .rangeBetween(-7 * 86400, 0)
        )
        sp = (
            load_table(spark, out, "events")
            .select(
                F.stddev_samp("value").over(w).alias("sd"),
                F.min("value").over(w).alias("mn"),
                F.max("value").over(w).alias("mx"),
                F.count(F.lit(1)).over(w).alias("n"),
            )
            .filter((F.col("mn") == F.col("mx")) & (F.col("n") > 1))
            .agg(F.max("sd").alias("m"))
            .collect()[0]
            .m
        )
        assert sp == 0.0, sp


def test_extremes_engine_ieee_laws(spark):
    """Pin the engine-pair facts behind the vector-validity and
    metric-domain laws (SURVEY.md §5.4, from the extremes probe).
    Each is an ENGINE property probed 2026-08-15 on Spark 4.1 /
    DuckDB 1.0.0; if an upgrade flips one, re-derive the law.

    1. NaN total order: BOTH engines place NaN above +Inf in
       comparisons, so `abs(x) <= bound` excludes NaN, +-Inf, and
       huge values in ONE portable comparison — the whole metric-
       domain gate rests on this.
    2. Failure-mode disagreement, statistics: DuckDB RAISES on
       non-finite stddev input; Spark yields NaN. No gateless
       formulation can be parity-exact.
    3. Failure-mode disagreement, trig: DuckDB RAISES on sin(Inf);
       Spark yields NaN.
    4. Zero-vector cosine: 0/0 is DIVIDE_BY_ZERO under ANSI Spark
       SQL, but DuckDB's list_cosine_similarity returns a LEGAL-
       LOOKING -1.0 — the most insidious disagreement of the set (not
       even an error to notice).
    5. tanh overflow stability: the exp identity (e^2x-1)/(e^2x+1)
       collapses to inf/inf = NaN in DuckDB for finite x where
       native tanh saturates to 1 — why the d17 oracle uses the
       sign form, which saturates identically to Spark.
    """
    import duckdb

    from pyspark.sql import functions as F

    con = duckdb.connect()

    # 1. NaN above +Inf, both engines; the one-comparison gate excludes
    # exactly {NaN, +-Inf, |x| > bound} in both
    probe = [float("nan"), float("inf"), float("-inf"), 2.0**100,
             -0.0, 5e-324, 1.0e7, 1.0000001e7]
    d = [con.execute(
            "SELECT ? > 'Infinity'::DOUBLE, abs(?) <= 10000000.0",
            [v, v]).fetchone() for v in probe]
    assert [r[1] for r in d] == [False, False, False, False,
                                 True, True, True, False]
    assert d[0][0] is True  # NaN > Inf in DuckDB
    s = (
        spark.createDataFrame([(v,) for v in probe], "v double")
        .select(
            (F.col("v") > F.lit(float("inf"))).alias("gt"),
            (F.abs("v") <= F.lit(1.0e7)).alias("ok"),
        )
        .collect()
    )
    assert [r.ok for r in s] == [r[1] for r in d]
    assert s[0].gt is True  # NaN > Inf in Spark too

    # 2. stddev over non-finite: DuckDB raises, Spark yields NaN
    import pytest as _pytest

    with _pytest.raises(duckdb.OutOfRangeException):
        con.execute(
            "SELECT stddev_samp(v) FROM (VALUES (1.0), ('Infinity'::DOUBLE))"
            " t(v)"
        ).fetchone()
    sp_sd = (
        spark.createDataFrame([(1.0,), (float("inf"),)], "v double")
        .agg(F.stddev_samp("v").alias("sd"))
        .collect()[0]
        .sd
    )
    assert sp_sd != sp_sd  # NaN

    # 3. sin(Inf): DuckDB raises, Spark NaN
    with _pytest.raises(duckdb.OutOfRangeException):
        con.execute("SELECT sin('Infinity'::DOUBLE)").fetchone()
    sp_sin = (
        spark.createDataFrame([(float("inf"),)], "v double")
        .select(F.sin("v").alias("x"))
        .collect()[0]
        .x
    )
    assert sp_sin != sp_sin

    # 4. zero-vector cosine: DuckDB a plausible -1.0, ANSI Spark raises
    dc = con.execute(
        "SELECT list_cosine_similarity([0.0, 0.0], [1.0, 0.0])"
    ).fetchone()[0]
    assert dc == -1.0  # not an error, not NaN: a silent wrong answer
    from pyspark.errors import ArithmeticException

    zdf = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 0.0])], "a array<double>, b array<double>"
    )
    dot = F.aggregate(
        F.zip_with("a", "b", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    with _pytest.raises(ArithmeticException):
        zdf.select(
            (dot / (norm(F.col("a")) * norm(F.col("b")))).alias("c")
        ).collect()

    # 5. tanh: exp identity NaN vs sign form == native saturation
    big = 2.0**100
    naive, stable = con.execute(
        "SELECT (exp(?) - 1) / (exp(?) + 1),"
        " sign(?) * (1 - 2 / (exp(abs(?)) + 1))",
        [big, big, big, big],
    ).fetchone()
    assert naive != naive  # inf/inf = NaN
    assert stable == 1.0
    sp_tanh = (
        spark.createDataFrame([(big,)], "v double")
        .select(F.tanh("v").alias("x"))
        .collect()[0]
        .x
    )
    assert sp_tanh == 1.0


def test_tsedge_negative_epoch_floor_laws(spark):
    """Pin the engine-pair facts behind the negative-epoch floor law
    (SURVEY.md §5.4, from the tsedge probe). Each is an ENGINE
    property probed 2026-08-15 on Spark 4.1 / DuckDB 1.0.0; if an
    upgrade flips one, re-derive the law.

    1. Spark `unix_timestamp` truncates toward zero: a pre-1970
       fractional instant lands one second LATE; truncating the wall
       clock FIRST (`date_trunc('second')` floors at any sign in both
       engines) then converting the whole second is exact — why c14's
       and e11's RANGE frames order by the date_trunc-first form.
    2. DuckDB `date_diff` partitions each ENDPOINT by truncation
       toward zero, Spark `timestampdiff` subtracts first — they
       split by one unit on negative-epoch fractional endpoints;
       flooring both endpoints first equalizes them at any sign
       (e14/e18), and wall-clock components (`hour*60+minute`) equal
       Spark's subtract-first form for minutes-into-day (d14).
    """
    import datetime as dt

    import duckdb

    con = duckdb.connect()
    halfsec = dt.datetime(1969, 12, 31, 23, 59, 59, 500000)
    onemicro = dt.datetime(1969, 7, 20, 20, 17, 40, 1)

    # 1. bare truncates toward zero (one second late pre-1970);
    # date_trunc-first floors — and DuckDB's date_trunc agrees
    rows = (
        spark.createDataFrame(
            [(halfsec,), (onemicro,)], "ts timestamp_ntz"
        )
        .select(
            F.unix_timestamp("ts").alias("bare"),
            F.unix_timestamp(F.date_trunc("second", "ts")).alias("floored"),
        )
        .collect()
    )
    assert [(r.bare, r.floored) for r in rows] == [
        (0, -1),
        (-14182939, -14182940),
    ]
    for ts, want in [(halfsec, -1.0), (onemicro, -14182940.0)]:
        got = con.execute(
            "SELECT epoch(date_trunc('second', ?::TIMESTAMP))", [ts]
        ).fetchone()[0]
        assert got == want

    # 2a. DuckDB date_diff vs floor-first on a negative fractional
    # endpoint: the naive form loses the epoch-sign crossing
    naive, floorfirst = con.execute(
        "SELECT date_diff('second', a, b),"
        "       date_diff('second', date_trunc('second', a),"
        "                 date_trunc('second', b)) "
        "FROM (SELECT TIMESTAMP '1969-12-31 23:59:59.5' a,"
        "             TIMESTAMP '1970-01-01 00:00:00.2' b)"
    ).fetchone()
    assert (naive, floorfirst) == (0, 1)
    # Spark's floor-first subtraction (the e14/e18 form) agrees with
    # DuckDB's floor-first date_diff; Spark's own subtract-first
    # timestampdiff is 0 here — also != floorfirst, hence floor BOTH
    sp = (
        spark.createDataFrame(
            [(halfsec, dt.datetime(1970, 1, 1, 0, 0, 0, 200000))],
            "a timestamp_ntz, b timestamp_ntz",
        )
        .select(
            (
                F.unix_timestamp(F.date_trunc("second", "b"))
                - F.unix_timestamp(F.date_trunc("second", "a"))
            ).alias("floorfirst"),
            F.expr("timestampdiff(SECOND, a, b)").alias("subfirst"),
        )
        .collect()[0]
    )
    assert (sp.floorfirst, sp.subfirst) == (1, 0)

    # 2b. minutes-into-day: DuckDB's naive date_diff is one minute
    # high pre-1970; components match Spark's subtract-first form
    d_naive, d_comp = con.execute(
        "SELECT date_diff('minute', date_trunc('day', t), t),"
        "       hour(t) * 60 + minute(t) "
        "FROM (SELECT TIMESTAMP '1969-12-31 23:59:30.5' t)"
    ).fetchone()
    assert (d_naive, d_comp) == (1440, 1439)
    sp2 = (
        spark.createDataFrame([(dt.datetime(1969, 12, 31, 23, 59, 30, 500000),)], "t timestamp_ntz")
        .select(
            F.expr("timestampdiff(MINUTE, date_trunc('day', t), t)").alias("sub"),
            (F.hour("t") * 60 + F.minute("t")).alias("comp"),
        )
        .collect()[0]
    )
    assert (sp2.sub, sp2.comp) == (1439, 1439)


def test_cosine_topk_id_isomorphism(spark):
    """Id-space portability law (SURVEY.md §5.4, from the idspace
    probe): the exact similarity tiers must give the SAME answers
    under any order-preserving id remap — snowflake-scale (>= 2^32)
    and negative int64 ids included. Raw-id bit-packing
    (key = sim_int*2^32 + id) silently corrupted the (sim DESC,
    id ASC) total order past 2^32; packing the POSITION of an
    id-sorted load is isomorphic to the id order at any magnitude."""
    emb = load_table(spark, SF_T2, "embeddings").filter(F.col("vec_id") < 64)

    def f(i):
        return (i - 5) * 3_000_000_029

    base = sim.cosine_topk(emb, k=5).collect()
    want = {(f(r.query_id), f(r.neighbor_id), r.cos_sim, r.rank) for r in base}
    shifted = emb.withColumn(
        "vec_id", (F.col("vec_id") - F.lit(5)) * F.lit(3_000_000_029)
    )
    got = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in sim.cosine_topk(shifted, k=5).collect()
    }
    assert got == want
    got_chunked = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in sim.cosine_topk_chunked(shifted, k=5, chunk_size=16).collect()
    }
    assert got_chunked == want


def test_idspace_engine_int64_laws(spark):
    """Pin the engine-pair facts behind the id-space portability law
    (SURVEY.md §5.4, from the idspace probe). Each is an ENGINE
    property probed 2026-08-15 on Spark 4.1 / DuckDB 1.0.0; if an
    upgrade flips one, re-derive the law.

    1. Left shift: DuckDB RAISES on a negative LHS and on overflow;
       Spark wraps silently (Java <<) — no gateless spelling can be
       parity-exact, hence d11's [0, 2^61-1] domain gate.
    2. &, |, xor, >>, bit_count: two's-complement identical at ANY
       int64 in both engines — they need no gate.
    3. Python % is sign-of-divisor, SQL % (both engines) is
       sign-of-dividend — oracles replaying Python generative
       formulas must spell sql_pmod.
    4. Zero-variance correlation: ANSI Spark's corr() RAISES
       DIVIDE_BY_ZERO (the divide is inside the aggregate, outer
       gates can't stop it) where DuckDB yields NULL — hence c4's
       manual gated co-moment quotient.
    """
    import duckdb
    import pytest as _pytest

    from cassandra_migrate_keyspace_from_cluster_spark.functions.rounding import (
        sql_pmod,
    )

    con = duckdb.connect()

    # 1. left shift disagreement
    with _pytest.raises(duckdb.OutOfRangeException):
        con.execute("SELECT (-5)::BIGINT << 2").fetchone()
    with _pytest.raises(duckdb.OutOfRangeException):
        con.execute("SELECT 4611686018427387904 << 2").fetchone()
    sp = (
        spark.createDataFrame([(-5,), (4611686018427387904,)], "x bigint")
        .select(F.shiftleft("x", 2).alias("s"))
        .collect()
    )
    assert [r.s for r in sp] == [-20, 0]  # Java wrap, no error

    # 2. the other bitwise ops agree at any int64
    vals = [-5, -15_000_000_145, (1 << 62) + 12_345]
    for v in vals:
        d = con.execute(
            "SELECT ?::BIGINT & 255, ?::BIGINT | 16, xor(?::BIGINT, 255),"
            " ?::BIGINT >> 1, bit_count(?::BIGINT)",
            [v, v, v, v, v],
        ).fetchone()
        s = (
            spark.createDataFrame([(v,)], "x bigint")
            .select(
                F.col("x").bitwiseAND(F.lit(255)),
                F.col("x").bitwiseOR(F.lit(16)),
                F.col("x").bitwiseXOR(F.lit(255)),
                F.shiftright("x", 1),
                F.bit_count("x"),
            )
            .collect()[0]
        )
        assert tuple(s) == tuple(d), v

    # 3. modulus sign: SQL % agrees with itself across engines and
    # disagrees with Python at negative dividends; sql_pmod == Python %
    assert (-5) % 7 == 2  # Python: sign of the divisor
    d_mod, d_pmod = con.execute(
        f"SELECT (-5) % 7, {sql_pmod('-5', 7)}"
    ).fetchone()
    assert (d_mod, d_pmod) == (-5, 2)
    s_mod, s_pmod = (
        spark.createDataFrame([(-5,)], "x bigint")
        .select(F.expr("x % 7"), F.expr(f"(((x % 7) + 7) % 7)"))
        .collect()[0]
    )
    assert (s_mod, s_pmod) == (-5, 2)

    # 4. zero-variance corr: Spark ANSI raises, DuckDB NULL
    assert (
        con.execute(
            "SELECT corr(v, u) FROM (VALUES (1.0, 0.0), (2.0, 0.0)) t(v, u)"
        ).fetchone()[0]
        is None
    )
    from pyspark.errors import ArithmeticException

    zdf = spark.createDataFrame([(1.0, 0.0), (2.0, 0.0)], "v double, u double")
    with _pytest.raises(ArithmeticException):
        zdf.agg(F.corr("v", "u")).collect()


def test_lakemix_byte_stream_split_reader_gap(spark, tmp_path):
    """Pin the one engine gap the lakemix encoding probe found
    (probed 2026-08-15, Spark 4.1 / DuckDB 1.0.0; if an upgrade
    closes it, drop the SCALE.md ingestion caveat and add BSS to
    LAKEMIX_PROFILES): BYTE_STREAM_SPLIT-encoded parquet is readable
    by DuckDB and by Spark's row-wise parquet-mr path, but Spark's
    VECTORIZED reader rejects it. Everything else in the probe's
    matrix (v2 pages, zstd/gzip/lz4/snappy/none, dictionary off,
    DELTA_BINARY_PACKED, DELTA_LENGTH_BYTE_ARRAY, odd row groups) is
    read cell-exact by both engines — lakemix runs 207/207 on it."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    p = str(tmp_path / "bss.parquet")
    pq.write_table(
        pa.table({"d": pa.array([1.5, 2.5, 3.5], pa.float64())}),
        p,
        use_dictionary=False,
        use_byte_stream_split=["d"],
    )
    assert duckdb.connect().execute(
        f"SELECT sum(d) FROM read_parquet('{p}')"
    ).fetchone()[0] == 7.5

    with _pytest.raises(Exception, match="BYTE_STREAM_SPLIT"):
        spark.read.parquet(p).agg(F.sum("d")).collect()
    old = spark.conf.get("spark.sql.parquet.enableVectorizedReader")
    try:
        spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
        got = spark.read.parquet(p).agg(F.sum("d")).collect()[0][0]
    finally:
        spark.conf.set("spark.sql.parquet.enableVectorizedReader", old)
    assert got == 7.5


def test_round6_huge_magnitude_engine_law(spark):
    """Pin the huge-magnitude round corollary (SURVEY.md §5.4, from
    the sf0.1 storm probe; Spark 4.1 / DuckDB 1.0.0): round(x, 6) for
    |x| >= ~1e10 is mathematically the identity (double spacing >
    1e-6), and Spark's BigDecimal path returns x EXACTLY while
    DuckDB's fp-scaling path perturbs x by an ulp — so any displayed
    round of an unbounded magnitude must skip the vacuous round above
    the 1e10 gate (f19's quantization scale)."""
    import duckdb

    x = 3.1699408823906713e22
    d = duckdb.connect().execute(
        "SELECT round(?::DOUBLE, 6)", [x]
    ).fetchone()[0]
    assert d != x  # DuckDB: ulp-perturbed
    s = (
        spark.createDataFrame([(x,)], "x double")
        .select(F.round("x", 6).alias("r"))
        .collect()[0]
        .r
    )
    assert s == x  # Spark: exact identity
    # the gated form is engine-exact at any magnitude
    g = (
        spark.createDataFrame([(x,), (12345.6789012345,)], "x double")
        .select(
            F.when(F.col("x") >= 1.0e10, F.col("x"))
            .otherwise(F.round("x", 6))
            .alias("r")
        )
        .collect()
    )
    dg = duckdb.connect().execute(
        "SELECT CASE WHEN x >= 1e10 THEN x ELSE round(x, 6) END "
        "FROM (VALUES (?::DOUBLE), (12345.6789012345::DOUBLE)) t(x)",
        [x],
    ).fetchall()
    assert [r.r for r in g] == [v[0] for v in dg] == [x, 12345.678901]


def test_exact_round_ratio_survives_sf1_charge_sums(spark):
    """r9 closure of the ADVICE r8 HIGH item: exact_round_ratio /
    exact_mean6 must survive |s| beyond the old bigint algebra bound
    (2*|s|*10^dp < 2^63, i.e. |s| < 4.6e16 at dp=2). A TPC-H Q1 group
    at SF1 holds ~$5.7e10 of charge in 1e-6-dollar units (s ~ 5.7e16)
    — past the bound, where the pre-r9 form raised ARITHMETIC_OVERFLOW
    under ANSI and silently wrapped with ANSI off. The fix lifts s to
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) before the blow-up; this
    test pins all three against the Fraction ground truth, including
    an exact half-cent AT the huge magnitude (the two hazards
    composed), and pins the dec_sum accumulator path b5/b9/b25/b26/
    b34/c1 use (a bigint SUM would saturate near SF160)."""
    import math
    from fractions import Fraction

    import duckdb

    from cassandra_migrate_keyspace_from_cluster_spark.functions.rounding import (
        dec_sum,
        exact_round_ratio,
        sql_exact_round_ratio,
    )

    cases = [
        57_000_000_000_000_001,   # SF1-scale charge sum (odd -> nontrivial)
        -57_000_000_000_000_001,
        123_456_789_012_345_005_000,  # exact half-cent at 1e20 (> int64)
        9_223_372_036_854_775_807,    # int64 max itself as a sum
    ]
    con = duckdb.connect()
    sql = f"SELECT {sql_exact_round_ratio('$s::HUGEINT', '1000000', dp=2)}"
    for s in cases:
        # dec_sum accumulates past int64 where F.sum(bigint) cannot:
        # split s into int64-safe terms
        chunk = 5_000_000_000_000_000_000
        sign = 1 if s >= 0 else -1
        n_full, rem = divmod(abs(s), chunk)
        terms = [(sign * chunk,)] * n_full + [(sign * rem,)]
        df = spark.createDataFrame(terms, "v: long")
        got = (
            df.agg(dec_sum(F.col("v")).alias("s"))
            .select(exact_round_ratio("s", "1000000", dp=2).alias("r"))
            .collect()[0]
            .r
        )
        fr = Fraction(s, 1_000_000) * 100
        truth = (
            math.floor(fr + Fraction(1, 2)) if s >= 0
            else -math.floor(-fr + Fraction(1, 2))
        ) / 100.0
        assert got == truth, (s, got, truth)
        assert con.execute(sql, {"s": s}).fetchone()[0] == truth, s


def test_g3_wmean_all_zero_discount_group(spark, tmp_path):
    """r9 closure of the ADVICE r8 MEDIUM item: a group whose valid
    rows all carry l_discount = 0.00 must yield NULL from the pandas
    UDAF (previously ZeroDivisionError) — mirroring the oracle's
    CASE WHEN m = 0 guard — while normal groups stay exact."""
    import duckdb
    import pandas as pd

    from cassandra_migrate_keyspace_from_cluster_spark.registry import specs

    pd.DataFrame(
        {
            "l_returnflag": ["Z", "Z", "A", "A"],
            "l_extendedprice": [100.00, 250.50, 100.00, 200.00],
            "l_discount": [0.00, 0.00, 0.05, 0.10],
        }
    ).to_parquet(tmp_path / "lineitem.parquet", index=False)
    spec = specs()["g3_grouped_agg_udaf"]
    got = {
        r.l_returnflag: r.discount_weighted_price
        for r in spec.fn(spark, str(tmp_path)).collect()
    }
    assert got["Z"] is None
    # A: (100*0.05 + 200*0.10) / 0.15 = 166.67 (exact integer form)
    assert got["A"] == 166.67
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'lineitem.parquet'}')"
    )
    duck = {k: v for k, v in con.execute(spec.oracle).fetchall()}
    assert duck == got


def test_valid_vector_null_element_parity(spark):
    """r9 closure of the ADVICE r8 LOW item: vectors with NULL
    ELEMENTS. Spark's exists() three-valued logic already dropped
    them, but DuckDB's list_filter silently excludes NULL-predicate
    elements, so the un-guarded SQL mirror KEPT a [1.0, NULL, 2.0]
    vector. Both sides must now keep exactly the fully-valid vector."""
    import duckdb

    from cassandra_migrate_keyspace_from_cluster_spark.operators.similarity import (
        sql_valid_vector,
        valid_vector,
    )

    rows = [
        (1, [1.0, None, 2.0]),   # null element, otherwise valid
        (2, [None, 0.0]),        # null element + zero
        (3, [None] * 3),         # all-null elements
        (4, None),               # null vector
        (5, [0.0, 0.0]),         # all-zero
        (6, [1.0, float("nan")]),  # NaN
        (7, [1.0, 2.0]),         # valid
    ]
    df = spark.createDataFrame(rows, "id: long, embedding: array<double>")
    kept_spark = sorted(r.id for r in df.filter(valid_vector()).collect())
    con = duckdb.connect()
    vals = ",".join(
        "(%d, %s)"
        % (
            i,
            "NULL"
            if v is None
            else "["
            + ",".join("NULL" if x is None else ("'NaN'::DOUBLE" if x != x else repr(x)) for x in v)
            + "]",
        )
        for i, v in rows
    )
    kept_duck = sorted(
        r[0]
        for r in con.execute(
            f"SELECT id FROM (VALUES {vals}) t(id, embedding) "
            f"WHERE {sql_valid_vector()}"
        ).fetchall()
    )
    assert kept_spark == kept_duck == [7]


# ---------------------------------------------------------------------------
# r11 corrupt-payload quarantine law (multimodal._guarded_feature_batches):
# at 100 TB a truncated/bit-flipped media blob is routine — one bad blob
# must NULL its own feature row, never abort the scan. The expectation is
# computed by REPLAYING the law single-node (guarded decode of the same
# bytes), so a bit flip that still decodes is expected to produce the
# decoded features, and one that raises is expected to produce NULLs.


def _corrupt_variants(payload: bytes, seed: int):
    """Deterministic corruption family for one valid payload: header-,
    mid-, and tail-truncations, single bit flips at seeded offsets,
    empty bytes, pure junk, and a wrong-magic swap."""
    import numpy as np

    rng = np.random.default_rng(seed)
    out = [
        payload[: len(payload) // 4],          # truncate in the header region
        payload[: len(payload) // 2],          # truncate mid-payload
        payload[:-1],                          # drop the last byte
        b"",                                   # empty blob
        b"garbage-not-a-media-file",           # junk
        b"XXXX" + payload[4:],                 # wrong magic
    ]
    for _ in range(4):                         # seeded single bit flips
        pos = int(rng.integers(0, len(payload)))
        bit = int(rng.integers(0, 8))
        flipped = bytearray(payload)
        flipped[pos] ^= 1 << bit
        out.append(bytes(flipped))
    return out


def _quarantine_check(spark, extractor, payloads, decode_row, n_features):
    """Run the extractor over good + corrupt + NULL payloads and assert
    the law row-for-row against the single-node guarded replay."""
    rows, want = [], {}
    for i, p in enumerate(payloads):
        rows.append((i, bytearray(p) if p is not None else None, "media"))
        if p is None:
            want[i] = (None,) * n_features
        else:
            try:
                want[i] = tuple(decode_row(bytes(p)))
            except Exception:
                want[i] = (None,) * n_features
    df = spark.createDataFrame(
        rows, "doc_id bigint, payload binary, mime string"
    )
    got = {r[0]: tuple(r[1:]) for r in extractor(df).collect()}
    assert set(got) == set(want), "row set changed (rows dropped or added)"
    n_null = 0
    for i in sorted(want):
        assert got[i] == want[i], (
            f"doc {i}: got {got[i]} want {want[i]}"
        )
        n_null += got[i] == (None,) * n_features
    # the family must actually exercise BOTH arms of the law
    assert 0 < n_null < len(want), (n_null, len(want))


def test_corrupt_payload_quarantine_wav(spark):
    import numpy as np

    from cassandra_migrate_keyspace_from_cluster_spark.operators import (
        multimodal as mm,
    )

    rng = np.random.default_rng(7)
    good = [
        mm.encode_wav_pcm16(
            rng.integers(-32768, 32767, size=n, dtype=np.int16), 8000
        )
        for n in (5, 32, 1)
    ]
    payloads = good + _corrupt_variants(good[0], 101) + [None]

    def decode_row(p):
        rate, _ch, s = mm.decode_wav_pcm16(p)
        x = s.astype(np.float64)
        return (
            rate, len(s), mm.exact_mean6(x),
            round(float(np.sqrt((x * x).mean())), 6),
            int(np.abs(s).max()),
        )

    _quarantine_check(spark, mm.extract_wav_features, payloads, decode_row, 5)


def _image_replay(decode):
    from cassandra_migrate_keyspace_from_cluster_spark.operators import (
        multimodal as mm,
    )

    return mm._image_feature_row(decode)


def test_corrupt_payload_quarantine_bmp(spark):
    import numpy as np

    from cassandra_migrate_keyspace_from_cluster_spark.operators import (
        multimodal as mm,
    )

    rng = np.random.default_rng(13)
    good = [
        mm.encode_bmp_24(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
        for w, h in ((4, 3), (5, 2))
    ]
    payloads = good + _corrupt_variants(good[0], 103) + [None]
    _quarantine_check(
        spark, mm.extract_bmp_features, payloads,
        _image_replay(mm.decode_bmp_24), 5,
    )


def test_corrupt_payload_quarantine_jpeg(spark):
    import numpy as np

    from cassandra_migrate_keyspace_from_cluster_spark.operators import (
        multimodal as mm,
    )

    # constant 8x8 tiles (the f17d exactness domain)
    imgs = [
        np.full((8, 16, 3), (40 * k + 9, 70 * k + 3, 11 * k) , np.uint8)
        for k in range(2)
    ]
    good = [mm.encode_jpeg_baseline(img) for img in imgs]
    payloads = good + _corrupt_variants(good[0], 107) + [None]
    _quarantine_check(
        spark, mm.extract_jpeg_features, payloads,
        _image_replay(mm.decode_jpeg_baseline), 5,
    )


def test_corrupt_payload_quarantine_png(spark):
    import numpy as np

    from cassandra_migrate_keyspace_from_cluster_spark.operators import (
        multimodal as mm,
    )

    rng = np.random.default_rng(17)
    good = [
        mm.encode_png_rgb8(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
        for w, h in ((6, 4), (3, 5))
    ]
    payloads = good + _corrupt_variants(good[0], 109) + [None]
    _quarantine_check(
        spark, mm.extract_png_features, payloads,
        _image_replay(mm.decode_png_rgb8), 5,
    )


def test_corrupt_payload_quarantine_video(spark):
    import numpy as np

    from cassandra_migrate_keyspace_from_cluster_spark.operators import (
        multimodal as mm,
    )

    def mkframes(k, n):
        frames = []
        for fi in range(n):
            img = np.zeros((8, 16, 3), np.uint8)
            for tx in range(2):
                img[:, tx * 8:(tx + 1) * 8] = (
                    (k + 37 * tx + 19 * fi) % 256,
                    (2 * k + 11 * tx + 23 * fi) % 256,
                    (3 * k + 17 * tx + 29 * fi) % 256,
                )
            frames.append(img)
        return frames

    good = [mm.encode_avi_mjpeg(mkframes(k, 2 + k)) for k in range(2)]
    payloads = good + _corrupt_variants(good[0], 113) + [None]

    def decode_row(p):
        n, w, h, _frames = mm.demux_avi_mjpeg(p)
        sampled = mm.sample_video_frames(p, 2)
        stack = np.stack([f for _i, f in sampled]).astype(np.float64)
        return (
            n, len(sampled), w, h,
            mm.exact_mean6(stack[:, :, :, 0]),
            mm.exact_mean6(stack[:, :, :, 1]),
            mm.exact_mean6(stack[:, :, :, 2]),
        )

    _quarantine_check(
        spark,
        lambda df: mm.extract_video_features(df, every_n=2),
        payloads, decode_row, 7,
    )


def test_quarantine_preserves_valid_rows_exactly(spark):
    """The law must be a no-op on an all-valid corpus: the guarded
    extractor over the f17c generative payloads equals the pre-law
    unguarded decode, row for row (the queries' oracle contract is
    untouched by the quarantine)."""
    from cassandra_migrate_keyspace_from_cluster_spark.operators import (
        multimodal as mm,
    )

    docs = spark.range(40).withColumnRenamed("id", "doc_id")
    media = mm.attach_bmp_payload(docs)
    got = {
        r["doc_id"]: (r["width"], r["height"], r["mean_r"], r["mean_g"],
                      r["mean_b"])
        for r in mm.extract_bmp_features(media).collect()
    }
    replay = _image_replay(mm.decode_bmp_24)
    for r in media.collect():
        assert got[r["doc_id"]] == replay(bytes(r["payload"]))
    assert len(got) == 40


def test_keyset_pagination_equals_limit_offset(spark):
    """Walking pages with keyset_page must reproduce LIMIT k OFFSET n
    page-for-page under the same total order (price DESC, orderkey ASC
    tie-break) — the equality that makes the keyset form a drop-in
    replacement for b31-style pagination at any depth."""
    import os

    from tests.conftest import SF_SMOKE

    from cassandra_migrate_keyspace_from_cluster_spark.operators.rank import (
        keyset_page,
    )

    o = spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet")).select(
        "o_orderkey", "o_totalprice"
    )
    keys = [("o_totalprice", False), ("o_orderkey", True)]
    k = 7
    last = None
    for pageno in range(5):
        want = [
            (r["o_orderkey"], r["o_totalprice"])
            for r in o.orderBy(
                o.o_totalprice.desc(), o.o_orderkey.asc()
            ).offset(pageno * k).limit(k).collect()
        ]
        got_rows = keyset_page(o, keys, last_seen=last, page_size=k).collect()
        got = [(r["o_orderkey"], r["o_totalprice"]) for r in got_rows]
        assert got == want, f"page {pageno}: keyset != offset"
        last = (got_rows[-1]["o_totalprice"], got_rows[-1]["o_orderkey"])


def test_guarded_merge_asof_bound_and_equality(spark):
    """The executable quadratic-cliff contract for the native-asof API
    path (VERDICT r11 item 5, the b31 keyset-twin treatment): (1) under
    the bound, guarded_merge_asof must equal the linear union+window
    operator row-for-row — the two implementations agree, so swapping
    the API surface for the scale path is a pure plan change; (2) past
    the bound (forced tiny here), it must raise BEFORE planning the
    BroadcastNestedLoopJoin, and the error must name the linear
    operator so the caller knows the scale path."""
    import pytest

    from cassandra_migrate_keyspace_from_cluster_spark.operators.asof import (
        asof_join_last_earlier,
        guarded_merge_asof,
    )

    left = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 15, 150.0), (3, 5, 50.0)],
        "user_id int, ts int, value double",
    )
    right = spark.createDataFrame(
        [(1, 8, 1000), (1, 18, 1001), (2, 15, 1002), (2, 30, 1003)],
        "user_id int, ts int, click_id int",
    )

    got = (
        guarded_merge_asof(left, right, on="ts", by="user_id")
        .to_spark()
        .select("user_id", "ts", "value", "click_id")
    )
    want = asof_join_last_earlier(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_value="click_id", out_value="click_id",
    ).select("user_id", "ts", "value", "click_id")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    # 4 distinct left ts (5,10,15,20) x 4 right rows = 16 pairs > max_pairs=10
    with pytest.raises(ValueError, match="asof_join_last_earlier"):
        guarded_merge_asof(left, right, on="ts", by="user_id", max_pairs=10)


def test_neardup_tier_selector_table_and_monotonicity():
    """The auto_neardup decision table (SURVEY §4's f2→f3 auto-switch,
    the f4d idiom) + the monotone-ladder law: growing any stat never
    moves the choice back toward a cheaper-assumption tier."""
    import pytest

    from cassandra_migrate_keyspace_from_cluster_spark.operators.dedup import (
        choose_neardup_tier,
    )

    B, PB = 1000.0, 300.0  # pair budget / postings budget for the table
    kw = dict(pair_budget=B, postings_pair_budget=PB)
    # 1. small candidate space -> postings REGARDLESS of profile
    #    (measured law: the sf0.1 corpus at heavy_share 0.64 runs ~2x
    #    faster through postings — absolute volume decides, not shape)
    assert choose_neardup_tier(100, 250.0, 240.0, **kw) == "postings"
    assert choose_neardup_tier(100, 250.0, 10.0, **kw) == "postings"
    # 2. large candidate space, prunable excess -> prefix
    assert choose_neardup_tier(100, 50_000.0, 800.0, **kw) == "prefix"
    assert choose_neardup_tier(100, 500.0, 100.0, **kw) == "prefix"
    # 3. even the rare-token floor exceeds the budget -> lsh
    assert choose_neardup_tier(100, 50_000.0, 20_000.0, **kw) == "lsh"
    # misroute-raises: recall is a contract the selector never spends
    with pytest.raises(ValueError, match="recall"):
        choose_neardup_tier(
            100, 50_000.0, 20_000.0, exact_required=True, **kw
        )
    with pytest.raises(ValueError):
        choose_neardup_tier(100, 500.0, 600.0)  # light > cand: invalid

    # FULLY monotone ladder: growing cand_pairs and/or light_pairs
    # never routes back toward a cheaper-assumption tier.
    rank = {"postings": 0, "prefix": 1, "lsh": 2}
    grid = [0.0, 100.0, 250.0, 350.0, 900.0, 1100.0, 40_000.0]
    pts = [(c, l) for c in grid for l in grid if l <= c]
    for cand, light in pts:
        here = rank[choose_neardup_tier(10, cand, light, **kw)]
        for cand2, light2 in pts:
            if cand2 >= cand and light2 >= light:
                there = rank[choose_neardup_tier(10, cand2, light2, **kw)]
                assert there >= here, (cand, light, cand2, light2)


def test_auto_neardup_routing_and_tier_equality(spark):
    """auto_neardup end-to-end: (1) the dense micro corpus routes to
    postings and the result equals BOTH exact dataflows pair-for-pair;
    (2) a tiny postings budget forces the prefix tier with the same
    pairs; (3) an impossible budget routes to lsh, whose pairs are a
    subset of exact at the pytest recall floor; (4) exact_required
    past the floor raises."""
    import pytest

    from cassandra_migrate_keyspace_from_cluster_spark.operators import (
        dedup as dd,
    )

    rows = []
    # 12 near-dup pairs: doc 2i+1 = doc 2i with one token changed
    for i in range(12):
        base = f"alpha bravo charlie delta echo tok{i} foxtrot golf"
        rows.append((2 * i, "en", base))
        rows.append((2 * i + 1, "en", base.replace("echo", "hotel")))
    # 8 unrelated docs in another block
    for i in range(8):
        rows.append((100 + i, "de", f"unique{i} wort{i} zeichen{i} berg{i}"))
    docs = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    blocking, t = ["lang"], 0.6

    want = sorted(
        map(tuple, dd.jaccard_pairs_postings(docs, blocking, t).collect())
    )
    assert want == sorted(
        map(tuple, dd.jaccard_pairs_prefix(docs, blocking, t).collect())
    )
    assert len(want) >= 12

    chosen: dict = {}
    got = sorted(map(tuple, dd.auto_neardup(
        docs, blocking, t, chosen=chosen
    ).collect()))
    assert chosen["tier"] == "postings" and got == want

    # tiny postings budget -> prefix, identical pairs
    chosen = {}
    got = sorted(map(tuple, dd.auto_neardup(
        docs, blocking, t, postings_pair_budget=10.0, chosen=chosen
    ).collect()))
    assert chosen["tier"] == "prefix" and got == want

    # impossible budgets -> lsh; verified pairs are a recall-floored
    # subset of exact (same schema, same meaning)
    chosen = {}
    got = sorted(map(tuple, dd.auto_neardup(
        docs, blocking, t, pair_budget=1.0, postings_pair_budget=1.0,
        chosen=chosen,
    ).collect()))
    assert chosen["tier"] == "lsh"
    assert set(got) <= set(want)
    assert len(got) >= 0.8 * len(want)

    with pytest.raises(ValueError, match="recall"):
        dd.auto_neardup(
            docs, blocking, t, pair_budget=1.0, postings_pair_budget=1.0,
            exact_required=True,
        )
