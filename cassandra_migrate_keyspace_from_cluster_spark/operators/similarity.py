"""Similarity search over embedding columns (SURVEY.md §2 f4-f6).

Tiers:
  - cosine_topk: exact brute-force top-k, pure column expressions
    (zip_with/aggregate — stays in codegen, no UDF). O(n²·d): the
    verifiable baseline and fine to ~10⁴ vectors; at 100 TB this is
    the per-LSH-bucket inner loop, not the global algorithm.
  - brp_lsh_neighbors: BucketedRandomProjectionLSH (MLlib) — the scale
    path: random-projection buckets turn the cross join into a
    bucket-join. Engine-specific hashes → rows-only + recall-tested.
  - centroid_classify: nearest label-centroid per vector (IVF-style
    coarse quantization is this exact shape: centroids = coarse index).

Determinism law: ranking always on ROUNDED cosine (6dp) + vec_id
tie-break so float noise in the last ulp can't flip cross-engine order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine, l2_norm, to_double_array


def with_double_embedding(df: DataFrame, col: str = "embedding") -> DataFrame:
    """float32 list → array<double> (accumulate in f64 on both engines)."""
    return df.withColumn("emb", to_double_array(col))


def cosine_topk(
    embeddings: DataFrame, k: int = 5, id_col: str = "vec_id"
) -> DataFrame:
    """Exact top-k cosine neighbors per vector (self excluded).

    Execution shape — a broadcast nested-loop join done in BLAS:
      - corpus side: collected once (n·d doubles) and broadcast to every
        executor, exactly like the build side of a broadcast join;
      - query side: stays a distributed scan; each Arrow batch computes
        ``Q_norm @ C_normᵀ`` (float64 matmul) and its own top-k locally,
        so the whole op is one narrow stage, no shuffle at all.

    This replaces the expression-level crossJoin+zip_with formulation
    (O(n²·d) interpreted lambda evals — measured ~40x slower at n=2000)
    with vectorized math; output is identical because scores are rounded
    to 6dp before ranking with a vec_id tie-break (SURVEY.md §5.4).

    100-TB design point: this is the *exact* tier and assumes one side
    fits in executor memory (same contract as a broadcast join). When
    the corpus outgrows that, either block the corpus into broadcastable
    chunks and merge per-chunk top-k (still shuffle-free until the final
    per-query merge), or switch to the LSH tier (``brp_lsh_neighbors``)
    whose bucket-join prunes the pair space.
    """
    import numpy as np
    import pandas as pd

    corpus = embeddings.select(F.col(id_col).alias("id"), "embedding").toPandas()
    c_ids = corpus["id"].to_numpy(dtype=np.int64)
    c_mat = np.vstack(corpus["embedding"].to_numpy()).astype(np.float64)
    c_norm = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
    bc = embeddings.sparkSession.sparkContext.broadcast((c_ids, c_norm))

    def topk(batches):
        ids_c, nmat_c = bc.value
        for pdf in batches:
            q_ids = pdf["id"].to_numpy(dtype=np.int64)
            q_mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
            sims = np.round(q_norm @ nmat_c.T, 6)
            out_q, out_n, out_s, out_r = [], [], [], []
            for i in range(len(q_ids)):
                row = sims[i]
                mask = ids_c == q_ids[i]
                row = np.where(mask, -np.inf, row)
                order = np.lexsort((ids_c, -row))[:k]
                out_q.extend([q_ids[i]] * k)
                out_n.extend(ids_c[order])
                out_s.extend(row[order])
                out_r.extend(range(1, k + 1))
            yield pd.DataFrame(
                {
                    "query_id": np.asarray(out_q, dtype=np.int64),
                    "neighbor_id": np.asarray(out_n, dtype=np.int64),
                    "cos_sim": np.asarray(out_s, dtype=np.float64),
                    "rank": np.asarray(out_r, dtype=np.int64),
                }
            )

    return embeddings.select(F.col(id_col).alias("id"), "embedding").mapInPandas(
        topk, "query_id bigint, neighbor_id bigint, cos_sim double, rank bigint"
    )


def cosine_topk_chunked(
    embeddings: DataFrame,
    k: int = 5,
    chunk_size: int = 100_000,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors when the corpus outgrows ONE
    broadcast — the documented fallback tier between ``cosine_topk``
    (single broadcast) and the approximate LSH/IVF tiers.

    The corpus is blocked into ``ceil(n / chunk_size)`` chunks; each
    chunk runs the same shuffle-free broadcast-matmul pass as f4
    (queries stay a distributed scan, chunk rides a broadcast), keeping
    per-executor memory at O(chunk_size · d) instead of O(n · d). The
    per-chunk top-k candidates (k rows per query per chunk) then merge
    with a window partitioned by query_id — the only shuffle, over
    n_queries · k · n_chunks candidate rows, not n² scores. Global
    top-k ⊆ union of per-chunk top-k, so the result is EXACT; identical
    ranking law as f4 (6dp-rounded score, neighbor-id tie-break) —
    hash-equality with f4 is pytest-asserted across chunk sizes.

    Each chunk is its own broadcast variable. At this test scale the
    chunk branches are planned as one DAG; the true 100-TB form runs
    the loop pass-at-a-time (materialize per-chunk candidates, then
    ``bc.unpersist()`` before the next chunk) off a bucketed corpus
    layout (each chunk = one bucket read, not a driver collect), so
    peak executor memory stays one chunk regardless of corpus size.
    """
    import math

    import numpy as np
    import pandas as pd

    corpus = embeddings.select(F.col(id_col).alias("id"), "embedding").toPandas()
    c_ids = corpus["id"].to_numpy(dtype=np.int64)
    c_mat = np.vstack(corpus["embedding"].to_numpy()).astype(np.float64)
    c_norm = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
    n = len(c_ids)
    n_chunks = max(1, math.ceil(n / chunk_size))
    spark = embeddings.sparkSession
    queries = embeddings.select(F.col(id_col).alias("id"), "embedding")
    out_schema = "query_id bigint, neighbor_id bigint, cos_sim double"

    parts = []
    for ci in range(n_chunks):
        lo, hi = ci * chunk_size, min((ci + 1) * chunk_size, n)
        bc = spark.sparkContext.broadcast((c_ids[lo:hi], c_norm[lo:hi]))

        def chunk_topk(batches, _bc=bc):
            ids_c, nmat_c = _bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                q_ids = pdf["id"].to_numpy(dtype=np.int64)
                q_mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
                q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
                sims = np.round(q_norm @ nmat_c.T, 6)
                kk = min(k, len(ids_c))
                rows = []
                for i in range(len(q_ids)):
                    row = np.where(ids_c == q_ids[i], -np.inf, sims[i])
                    order = np.lexsort((ids_c, -row))[:kk]
                    keep = order[np.isfinite(row[order])]
                    rows.append(
                        pd.DataFrame(
                            {
                                "query_id": q_ids[i],
                                "neighbor_id": ids_c[keep],
                                "cos_sim": row[keep],
                            }
                        )
                    )
                if rows:
                    yield pd.concat(rows, ignore_index=True)

        parts.append(queries.mapInPandas(chunk_topk, out_schema))

    from functools import reduce

    cand = reduce(lambda a, b: a.unionAll(b), parts)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def ivf_cosine_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k cosine neighbors via IVF (inverted-file) coarse
    quantization — the other scale path next to LSH.

    Index build (distributed): MLlib KMeans partitions the corpus into
    ``n_cells`` Voronoi cells; each vector is assigned to one cell
    (the inverted lists). Search: each query scores only the vectors in
    its ``n_probe`` nearest cells — compute drops to ~n_probe/n_cells of
    brute force at the cost of recall (measured in pytest vs the exact
    f4 truth; random gaussian vectors are IVF's worst case, real
    embedding corpora cluster far better).

    At 100 TB: fit KMeans on a sample, broadcast the centroids, write
    the corpus bucketed by cell id; a query then touches only its probed
    cells' files (partition pruning does the gather). Here the inverted
    lists are broadcast like f4's corpus — same memory contract.
    Rows-only for t2 (KMeans cell boundaries are engine-specific).
    """
    import numpy as np
    import pandas as pd
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    d = with_double_embedding(embeddings).select(
        F.col(id_col).alias("id"), array_to_vector("emb").alias("features")
    )
    model = KMeans(k=n_cells, seed=42, maxIter=20, featuresCol="features").fit(d)
    assigned = model.transform(d).select("id", "prediction").toPandas()

    corpus = embeddings.select(F.col(id_col).alias("id"), "embedding").toPandas()
    c_ids = corpus["id"].to_numpy(dtype=np.int64)
    c_mat = np.vstack(corpus["embedding"].to_numpy()).astype(np.float64)
    c_norm = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
    cell_of = (
        assigned.set_index("id").loc[c_ids, "prediction"].to_numpy(dtype=np.int64)
    )
    cents = np.asarray(model.clusterCenters(), dtype=np.float64)
    cents_norm = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    bc = embeddings.sparkSession.sparkContext.broadcast(
        (c_ids, c_norm, cell_of, cents_norm)
    )

    def topk(batches):
        ids_c, nmat_c, cells_c, cn = bc.value
        for pdf in batches:
            q_ids = pdf["id"].to_numpy(dtype=np.int64)
            q_mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
            cell_sims = q_norm @ cn.T
            probed = np.argsort(-cell_sims, axis=1)[:, :n_probe]
            out = []
            for i in range(len(q_ids)):
                cand = np.isin(cells_c, probed[i]) & (ids_c != q_ids[i])
                idx = np.nonzero(cand)[0]
                sims = np.round(nmat_c[idx] @ q_norm[i], 6)
                order = np.lexsort((ids_c[idx], -sims))[:k]
                for r, j in enumerate(order, start=1):
                    out.append((q_ids[i], ids_c[idx[j]], sims[j], r))
            yield pd.DataFrame(
                out, columns=["query_id", "neighbor_id", "cos_sim", "rank"]
            )

    return embeddings.select(F.col(id_col).alias("id"), "embedding").mapInPandas(
        topk, "query_id bigint, neighbor_id bigint, cos_sim double, rank bigint"
    )


def srp_candidate_pairs(
    embeddings: DataFrame,
    n_bands: int = 64,
    band_bits: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
) -> DataFrame:
    """Candidate near-dup pairs via sign-random-projection (SRP) LSH —
    the cosine-native banding scheme (Charikar's SimHash for angles).

    Each vector gets ``n_bands`` band keys, every key packing
    ``band_bits`` sign bits of fixed random projections (deterministic
    seed → stable across runs/executors, no fitted model to ship).
    A pair is a candidate iff it collides on at least one (band, key) —
    a plain equi self-join on the exploded (band, key) postings, so the
    pair space is Σ bucket², never n².

    Tuning law (θ = angle of a true pair): P(bit match) = 1 − θ/π,
    P(band match) = p^band_bits, recall = 1 − (1 − p^b)^n_bands.
    Defaults (64 bands × 16 bits) give recall ≈ 1 − 3e−6 at cos 0.95,
    ≈ 0.9997 at cos 0.9, degrading toward the 0.8 threshold boundary —
    the standard LSH contract (same as f3/f5), recall-tested on planted
    near-dups in tests/test_operators.py. At 100 TB: raise band_bits as
    n grows (keyspace 2^b bounds bucket sizes; uncorrelated collisions
    ≈ n_bands·2^−b·n²/2) and raise n_bands to buy recall back; band
    keys are 16 small ints per row, stored scan-side — no model state.
    """
    import numpy as np
    import pandas as pd

    def hash_bands(batches):
        proj = None
        weights = 1 << np.arange(band_bits, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            if proj is None:
                rng = np.random.default_rng(seed)
                proj = rng.standard_normal((q.shape[1], n_bands * band_bits))
            bits = ((q @ proj) > 0).astype(np.int64)
            keys = bits.reshape(len(q), n_bands, band_bits) @ weights
            ids = pdf["id"].to_numpy(dtype=np.int64)
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, n_bands),
                    "band": np.tile(np.arange(n_bands, dtype=np.int32), len(q)),
                    "key": keys.reshape(-1),
                }
            )

    bands = embeddings.select(F.col(id_col).alias("id"), "embedding").mapInPandas(
        hash_bands, "id bigint, band int, key bigint"
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            [
                F.col("a.band") == F.col("b.band"),
                F.col("a.key") == F.col("b.key"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    n_bands: int = 64,
    band_bits: int = 16,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold: SRP-LSH candidate
    generation + exact rescore — the scalable form of the all-pairs
    cross join (which materializes n²/2 pairs; at 2×10⁵ vectors that is
    2×10¹⁰ — the one shape that cannot survive 100×).

    Candidates come from ``srp_candidate_pairs`` (equi-join on band
    keys); each candidate is then EXACTLY rescored on the original
    vectors (rounded-6dp cosine, same determinism law as f4), so
    precision is exact and recall follows the documented SRP law."""
    cand = srp_candidate_pairs(
        embeddings, n_bands=n_bands, band_bits=band_bits, id_col=id_col
    )
    e = with_double_embedding(embeddings).select(F.col(id_col).alias("id"), "emb")
    return (
        cand.join(e.select(F.col("id").alias("id_a"), F.col("emb").alias("ea")), "id_a")
        .join(e.select(F.col("id").alias("id_b"), F.col("emb").alias("eb")), "id_b")
        .select(
            F.col("id_a").alias("vec_a"),
            F.col("id_b").alias("vec_b"),
            F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def cosine_pairs_bruteforce(
    embeddings: DataFrame, threshold: float, id_col: str = "vec_id"
) -> DataFrame:
    """All-pairs exact cosine pairs (crossJoin) — O(n²) ground truth for
    recall tests of the LSH tier; never the production path."""
    e = with_double_embedding(embeddings).select(F.col(id_col).alias("id"), "emb")
    a = e.select(F.col("id").alias("vec_a"), F.col("emb").alias("ea"))
    b = e.select(F.col("id").alias("vec_b"), F.col("emb").alias("eb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def brp_lsh_neighbors(
    embeddings: DataFrame,
    distance_threshold: float,
    id_col: str = "vec_id",
    bucket_length: float = 0.25,
    num_hash_tables: int = 4,
) -> DataFrame:
    """Approximate neighbor pairs under Euclidean distance via MLlib
    BucketedRandomProjectionLSH (random projections → bucket join).

    Parameter geometry matters (r2 fix): for unit-norm vectors a random
    projection has std ||x||/sqrt(d) ≈ 0.125 here, so bucket_length
    must be O(that) — the old 2.0 put EVERY vector in one bucket (no
    pruning), and a distance_threshold above the distance distribution
    (old 6.0 vs median 1.414) made the "neighbor" set 93% of all pairs.
    With threshold at the ~p0.1 tail (1.12) and 2-std buckets the same
    join runs 7x faster and returns an actual neighbor set."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    d = with_double_embedding(embeddings).select(
        F.col(id_col).alias("id"), array_to_vector("emb").alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="buckets",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(d)
    pairs = model.approxSimilarityJoin(d, d, distance_threshold, distCol="eucl_dist")
    return pairs.filter(F.col("datasetA.id") < F.col("datasetB.id")).select(
        F.col("datasetA.id").alias("vec_a"),
        F.col("datasetB.id").alias("vec_b"),
        F.round("eucl_dist", 6).alias("eucl_dist"),
    )


def quantize_int8(
    embeddings: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x| / 127``,
    ``q_i = round(x_i / scale)`` ∈ [-127, 127].

    The 100-TB memory lever for vector search: 4x smaller than float32
    (16x smaller than the float64 math copies), so 4x more corpus fits
    in the f4 broadcast budget / per-IVF-cell memory; dequantized cosine
    error is bounded (~1/254 per dim, property-tested). Pure column
    expressions — quantization runs in codegen at scan speed.
    """
    e = with_double_embedding(embeddings, "embedding")
    max_abs = F.aggregate(
        "emb", F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scaled = e.select(
        F.col(id_col), "emb", (max_abs / F.lit(127.0)).alias("raw_scale")
    )
    return scaled.select(
        id_col,
        F.round("raw_scale", 6).alias("scale"),
        F.transform(
            "emb", lambda x: F.round(x / F.col("raw_scale"), 0).cast("int")
        ).alias("q"),
    )


def label_centroids(embeddings: DataFrame, label_col: str = "label") -> DataFrame:
    """Per-label mean vector via posexplode → (label, dim) avg →
    re-assemble ordered by position. Two narrow shuffles, both on small
    keys — scales linearly in rows."""
    e = with_double_embedding(embeddings)
    per_dim = (
        e.select(label_col, F.posexplode("emb").alias("pos", "val"))
        .groupBy(label_col, "pos")
        .agg(F.avg("val").alias("avg_val"))
    )
    return (
        per_dim.groupBy(label_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "avg_val"))),
                lambda s: s.getField("avg_val"),
            ).alias("centroid")
        )
        .select(F.col(label_col).alias("centroid_label"), "centroid")
    )


def centroid_classify(embeddings: DataFrame, label_col: str = "label") -> DataFrame:
    """Assign each vector to its nearest centroid (rounded-cosine
    ranking); returns the confusion matrix (label, pred_label, n)."""
    e = with_double_embedding(embeddings).select("vec_id", "emb", label_col)
    cents = label_centroids(embeddings, label_col)
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        label_col,
        "centroid_label",
        F.round(cosine(F.col("emb"), F.col("centroid")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("centroid_label")
    )
    assigned = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return (
        assigned.groupBy(label_col, F.col("centroid_label").alias("pred_label"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def pq_topk(
    embeddings: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 32,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k cosine neighbors via PRODUCT QUANTIZATION with
    asymmetric distance computation (ADC) — the memory-side compression
    tier of the vector-search ladder (f4 exact / f4c chunked / f5 LSH /
    f5b IVF / f33 PQ).

    Vectors are L2-normalized (so L2 ordering == cosine ordering), cut
    into ``m`` subvectors, and each subspace is vector-quantized against
    its own ``n_codes``-entry codebook (seeded Lloyd iterations on a
    driver-side sample — codebook training is sample-based in every PQ
    system; FAISS does the same). A vector then stores only ``m`` small
    codes: 8 bytes here vs 256 for float32×64 — a 32x index shrink,
    which is what lets a 100-TB corpus's index live in executor memory.

    Search (ADC): each query computes an (m × n_codes) table of exact
    subspace distances to the codebooks, then every corpus item's
    approximate distance is m table lookups over its codes — no
    original vectors touched. Distributed shape: queries are a scan;
    the code matrix + codebooks ride ONE broadcast (the 32x-compressed
    index); encode is a separate scan. Rows-only query (codebooks are
    data-derived); recall vs the exact f4 truth is pytest-asserted.
    """
    import numpy as np
    import pandas as pd

    corpus = embeddings.select(F.col(id_col).alias("id"), "embedding").toPandas()
    ids = corpus["id"].to_numpy(dtype=np.int64)
    mat = np.vstack(corpus["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    n, d = mat.shape
    assert d % m == 0, (d, m)
    sub_d = d // m

    rng = np.random.RandomState(7)
    codebooks = np.empty((m, n_codes, sub_d))
    codes = np.empty((n, m), dtype=np.int32)
    for j in range(m):
        sub = mat[:, j * sub_d : (j + 1) * sub_d]
        centers = sub[rng.choice(n, size=n_codes, replace=False)]
        for _ in range(10):  # seeded Lloyd iterations
            d2 = ((sub[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                pts = sub[assign == c]
                if len(pts):
                    centers[c] = pts.mean(axis=0)
        codebooks[j] = centers
        codes[:, j] = ((sub[:, None, :] - centers[None, :, :]) ** 2).sum(
            axis=2
        ).argmin(axis=1)

    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast((ids, codes, codebooks))
    queries = embeddings.select(F.col(id_col).alias("id"), "embedding")

    def adc_topk(batches):
        c_ids, c_codes, books = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q_ids = pdf["id"].to_numpy(dtype=np.int64)
            q = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            rows = []
            for i in range(len(q_ids)):
                # (m, n_codes) exact subspace distances for this query
                tables = np.stack(
                    [
                        ((books[j] - q[i, j * sub_d : (j + 1) * sub_d]) ** 2).sum(
                            axis=1
                        )
                        for j in range(m)
                    ]
                )
                approx = tables[np.arange(m)[None, :], c_codes].sum(axis=1)
                approx = np.where(c_ids == q_ids[i], np.inf, np.round(approx, 6))
                order = np.lexsort((c_ids, approx))[:k]
                keep = order[np.isfinite(approx[order])]
                rows.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[i],
                            "neighbor_id": c_ids[keep],
                            "approx_dist": approx[keep],
                        }
                    )
                )
            if rows:
                yield pd.concat(rows, ignore_index=True)

    return queries.mapInPandas(
        adc_topk, "query_id bigint, neighbor_id bigint, approx_dist double"
    )
