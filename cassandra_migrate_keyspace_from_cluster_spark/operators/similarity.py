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
    """Exact top-k cosine neighbors per vector (self excluded)."""
    e = with_double_embedding(embeddings).select(
        F.col(id_col).alias("id"), "emb"
    )
    q = e.select(F.col("id").alias("query_id"), F.col("emb").alias("q_emb"))
    c = e.select(F.col("id").alias("neighbor_id"), F.col("emb").alias("n_emb"))
    pairs = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("q_emb"), F.col("n_emb")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def brp_lsh_neighbors(
    embeddings: DataFrame,
    distance_threshold: float,
    id_col: str = "vec_id",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
) -> DataFrame:
    """Approximate neighbor pairs under Euclidean distance via MLlib
    BucketedRandomProjectionLSH (random projections → bucket join)."""
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
