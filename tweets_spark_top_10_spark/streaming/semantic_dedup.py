"""Incrementally maintained semantic deduplication.

The streaming twin of the ``semantic_dedup_keep`` catalog query
(SemDeDup shape, Abbas et al. 2023): as vectors arrive, each
micro-batch is cell-assigned against a FIXED coarse quantizer, compared
only against its own cell's stored members, and the surviving
near-duplicate pairs accumulate in a pair table; cluster labels and the
canonical-keep decision are derived on demand by running the
star-contraction connected components over the stored pairs.

Scale shape per micro-batch: one broadcast centroid argmin over the
batch, one cell-keyed equi-join of (batch x stored-cell-members) — the
batch side is small and the stored side is partition-pruned by the
bucket upsert layout — and one distinct-merge of the (tiny relative to
corpus) pair table.  Nothing ever compares across cells, and replaying
a micro-batch regenerates the identical state (cell upsert is
last-writer-wins; the pair merge is a distinct set union).

Semantics note: the corpus is treated as APPEND-ONLY for dedup
purposes — re-keying an id with a different vector updates its cell
row (last writer wins) but previously recorded pairs for the old
vector are not retracted, matching how production dedup treats
immutable content-addressed documents.  Full retraction needs the
batch pipeline.

Cites: reference has no streaming analog (its speed layer,
App.java:159-178, is commented out); this is engine-only capability.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tweets_spark_top_10_spark.functions.similarity import (
    dot,
    ivf_assign_cells,
    l2_norm,
)
from tweets_spark_top_10_spark.streaming.ann import _one_per_id
from tweets_spark_top_10_spark.streaming.heavy_hitters import (
    _recover,
    _swap_in,
)
from tweets_spark_top_10_spark.functions.sampling import hash_bucket
from tweets_spark_top_10_spark.streaming.sketch import upsert_rows_by_bucket


def upsert_semantic_pairs_batch(
    spark,
    batch_vecs: DataFrame,
    centroids: DataFrame,
    cells_path: str,
    pairs_path: str,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    threshold: float = 0.3,
    n_buckets: int = 16,
    seq_col: str | None = None,
) -> None:
    """Fold one micro-batch of vectors into the semantic-dedup state.

    Order matters: cells upsert FIRST (so the pair join sees the batch's
    own rows and emits new-vs-new pairs without a separate self-join),
    then the batch x stored-cell-members cosine pairs distinct-merge
    into the pair table under the same atomic swap protocol the MG
    summaries use.
    """
    one = _one_per_id(batch_vecs, id_col, vec_col, seq_col)
    assigned = ivf_assign_cells(
        one, centroids, id_col, vec_col, n_probe=1
    ).withColumn("bucket", hash_bucket(id_col, n_buckets))
    upsert_rows_by_bucket(spark, assigned, cells_path, id_col)

    stored = spark.read.parquet(cells_path)
    a = assigned.select(
        F.col("cell_id"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        l2_norm(F.col(vec_col)).alias("na"),
    )
    b = stored.select(
        F.col("cell_id"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        l2_norm(F.col(vec_col)).alias("nb"),
    )
    new_pairs = (
        a.join(b, "cell_id")
        .filter(F.col("id_a") != F.col("id_b"))
        .withColumn(
            "__cos",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ),
        )
        .filter(F.col("__cos") >= threshold)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )
    _recover(pairs_path)
    if os.path.exists(pairs_path):
        merged = (
            spark.read.parquet(pairs_path).unionByName(new_pairs).distinct()
        )
    else:
        merged = new_pairs
    _swap_in(
        pairs_path,
        lambda staging: merged.write.mode("overwrite").parquet(staging),
    )


def maintain_semantic_dedup(
    stream_vecs: DataFrame,
    centroids: DataFrame,
    cells_path: str,
    pairs_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    threshold: float = 0.3,
    n_buckets: int = 16,
    seq_col: str | None = None,
):
    """Attach the semantic-dedup state maintenance to a vector stream
    (availableNow trigger, as the other maintained indexes)."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_semantic_pairs_batch(
            batch_df.sparkSession,
            batch_df,
            centroids,
            cells_path,
            pairs_path,
            id_col,
            vec_col,
            threshold,
            n_buckets,
            seq_col,
        )

    return (
        stream_vecs.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def semantic_clusters_from_state(
    spark,
    cells_path: str,
    pairs_path: str,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cluster, keep) from the maintained state: star-contraction
    CC over the stored pairs, every indexed id labeled (isolated ids
    are their own cluster and kept) — same contract as the batch
    ``semantic_dedup_keep`` query, which the differential test pins."""
    from tweets_spark_top_10_spark.functions.dedup import connected_components

    ids = spark.read.parquet(cells_path).select(F.col(id_col))
    if os.path.exists(pairs_path):
        comp = connected_components(spark.read.parquet(pairs_path))
    else:
        comp = ids.select(
            F.col(id_col).alias("node"), F.col(id_col).alias("component")
        ).limit(0)
    return (
        ids.join(comp, ids[id_col] == comp["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("cluster"),
            (F.coalesce("component", F.col(id_col)) == F.col(id_col)).alias(
                "keep"
            ),
        )
    )
