"""Incremental heavy-hitters: streaming Misra-Gries summary maintenance.

The reference's companion speed layer kept live per-hour hashtag
counts next to the batch job (the commented-out Storm/ES half,
``App.java:159-178``).  This is that idea at 100 TB shape: instead of
a live exact count of EVERY distinct token (unbounded state), the
stream maintains one bounded Misra-Gries summary — ``capacity`` rows
plus one total-count row — that at any moment certifies top-K
candidates for the data seen so far (``functions/heavy_hitters.
candidates_from_summary``); an exact rerank pass over the stored
corpus turns the candidates into the exact top-K on demand.

Merge step per micro-batch (mergeable-summaries reduction, same
N/(capacity+1) bound as the batch sketch):

1. exact batch token counts (map-side-combined groupBy — the batch is
   one trigger's worth of data),
2. union with the stored summary, sum per token (the NULL-token total
   row sums along with everything else),
3. prune back to ``capacity`` by subtracting the (capacity+1)-th
   largest counter from all and dropping non-positives.

State is a plain parquet dir swapped atomically (stage → aside →
live), so a replayed micro-batch after a crash re-derives the same
merge from either the old or new state plus the batch.

One bounded driver collect per merge: the (capacity+1) largest
estimates, to find the prune threshold — O(capacity), not O(data).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_mg_batch(
    spark,
    batch_tokens: DataFrame,
    table_path: str,
    token_col: str = "token",
    capacity: int = 512,
    batch_id: int | None = None,
) -> None:
    """Fold one micro-batch of tokens into the stored MG summary.

    ``batch_id`` (when the caller is a foreachBatch sink) makes the
    merge idempotent under at-least-once replay: the last merged id is
    persisted INSIDE the swapped summary dir (underscore-prefixed, so
    parquet readers skip it) and a replayed batch with id <= the stored
    high-water mark is a no-op.  Without the marker a crash after the
    swap commits but before the streaming checkpoint commits would
    double-merge the batch, inflating est and the NULL-token total.
    """
    _recover(table_path)
    if _already_merged(table_path, batch_id):
        return
    batch_summary = (
        batch_tokens.groupBy(token_col).agg(F.count(F.lit(1)).alias("est"))
    ).unionByName(
        batch_tokens.agg(
            F.lit(None).cast("string").alias(token_col),
            F.count(F.lit(1)).alias("est"),
        )
    )
    if os.path.exists(table_path):
        merged = spark.read.parquet(table_path).unionByName(batch_summary)
    else:
        merged = batch_summary
    merged = (
        merged.groupBy(token_col).agg(F.sum("est").alias("est"))
    ).persist()

    top = (
        merged.where(F.col(token_col).isNotNull())
        .orderBy(F.desc("est"))
        .limit(capacity + 1)
        .collect()
    )
    if len(top) > capacity:
        kth = int(top[-1]["est"])
        pruned = merged.where(
            F.col(token_col).isNull() | (F.col("est") > F.lit(kth))
        ).withColumn(
            "est",
            F.when(F.col(token_col).isNull(), F.col("est")).otherwise(
                F.col("est") - F.lit(kth)
            ),
        )
    else:
        pruned = merged

    def _write(staging: str) -> None:
        pruned.coalesce(1).write.mode("overwrite").parquet(staging)
        _stamp_batch_id(staging, batch_id)

    _swap_in(table_path, _write)
    merged.unpersist(blocking=False)


def maintain_heavy_hitters(
    stream_tokens: DataFrame,
    table_path: str,
    checkpoint: str,
    token_col: str = "token",
    capacity: int = 512,
):
    """Attach the MG merge to a token stream via foreachBatch
    (availableNow trigger, as the other maintained indexes)."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_mg_batch(
            batch_df.sparkSession,
            batch_df,
            table_path,
            token_col,
            capacity,
            batch_id=batch_id,
        )

    return (
        stream_tokens.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _recover(table_path: str) -> None:
    """Crash recovery for the swap protocol (same as
    :func:`merge_mg_batch`): a crash between the two renames leaves
    the only valid summary in the aside dir — restore it; a
    half-written staging dir is garbage — drop it.  MUST run before
    the stored summary is READ, not just before it is replaced (a
    post-read recovery silently merges against an empty live dir and
    halves the state — caught by
    ``test_grouped_mg_merge_recovers_from_stale_swap_dirs``)."""
    aside = table_path.rstrip("/") + "__old"
    staging = table_path.rstrip("/") + "__stage"
    if os.path.exists(aside):
        if not os.path.exists(table_path):
            os.rename(aside, table_path)
        else:
            shutil.rmtree(aside)
    if os.path.exists(staging):
        shutil.rmtree(staging)


_BATCH_MARKER = "_mg_last_batch_id"


def _stamp_batch_id(summary_dir: str, batch_id: int | None) -> None:
    """Record the merged micro-batch id inside the summary dir so it
    swaps atomically with the state it describes (underscore-prefixed
    files are invisible to parquet scans)."""
    if batch_id is not None:
        with open(os.path.join(summary_dir, _BATCH_MARKER), "w") as fh:
            fh.write(str(int(batch_id)))


def _already_merged(table_path: str, batch_id: int | None) -> bool:
    """True when a replayed micro-batch (at-least-once foreachBatch
    redelivery after a crash between the state swap and the streaming
    checkpoint commit) has already been folded into the live summary."""
    if batch_id is None:
        return False
    marker = os.path.join(table_path, _BATCH_MARKER)
    if not os.path.exists(marker):
        return False
    with open(marker) as fh:
        return int(batch_id) <= int(fh.read().strip())


def _swap_in(table_path: str, write) -> None:
    """Atomic stage → aside → live replacement for a summary dir."""
    aside = table_path.rstrip("/") + "__old"
    staging = table_path.rstrip("/") + "__stage"
    _recover(table_path)
    write(staging)
    if os.path.exists(table_path):
        os.rename(table_path, aside)
    os.rename(staging, table_path)
    if os.path.exists(aside):
        shutil.rmtree(aside)


def merge_mg_batch_grouped(
    spark,
    batch_df: DataFrame,
    table_path: str,
    group_col: str,
    token_col: str = "token",
    capacity: int = 512,
    batch_id: int | None = None,
) -> None:
    """Fold one micro-batch into per-GROUP stored MG summaries.

    The grouped twin of :func:`merge_mg_batch` — one independent
    capacity-``capacity`` sketch per group value, all in one table
    ``(group, token, est)`` with a NULL-token total row per group.
    Unlike the flat merge (whose prune threshold is a single scalar,
    collected), the per-group thresholds stay IN the plan: the
    (capacity+1)-th largest est per group comes from a row_number
    window and joins back — no driver collect at all, state stays
    <= (capacity+1) x groups rows.
    """
    from pyspark.sql import Window

    _recover(table_path)  # BEFORE reading state, not just before swap
    if _already_merged(table_path, batch_id):  # at-least-once replay
        return
    batch_df = batch_df.where(
        F.col(group_col).isNotNull() & F.col(token_col).isNotNull()
    )
    batch_summary = (
        batch_df.groupBy(group_col, token_col).agg(
            F.count(F.lit(1)).alias("est")
        )
    ).unionByName(
        batch_df.groupBy(group_col).agg(
            F.lit(None).cast("string").alias(token_col),
            F.count(F.lit(1)).alias("est"),
        )
    )
    if os.path.exists(table_path):
        merged = spark.read.parquet(table_path).unionByName(batch_summary)
    else:
        merged = batch_summary
    merged = merged.groupBy(group_col, token_col).agg(
        F.sum("est").alias("est")
    )
    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(F.desc("est"), F.asc(token_col))
    )
    kth = (
        merged.where(F.col(token_col).isNotNull())
        .withColumn("rn", rn)
        .where(F.col("rn") == capacity + 1)
        .select(group_col, F.col("est").alias("kth"))
    )
    pruned = (
        merged.join(kth, group_col, "left")
        .where(
            F.col(token_col).isNull()
            | F.col("kth").isNull()
            | (F.col("est") > F.col("kth"))
        )
        .select(
            group_col,
            token_col,
            F.when(
                F.col(token_col).isNull() | F.col("kth").isNull(),
                F.col("est"),
            )
            .otherwise(F.col("est") - F.col("kth"))
            .alias("est"),
        )
    )
    def _write(staging: str) -> None:
        pruned.coalesce(1).write.mode("overwrite").parquet(staging)
        _stamp_batch_id(staging, batch_id)

    _swap_in(table_path, _write)


def maintain_grouped_heavy_hitters(
    stream_df: DataFrame,
    table_path: str,
    checkpoint: str,
    group_col: str,
    token_col: str = "token",
    capacity: int = 512,
):
    """Attach the grouped MG merge to a (group, token) stream via
    foreachBatch (availableNow trigger, as the other maintained
    indexes)."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_mg_batch_grouped(
            batch_df.sparkSession,
            batch_df,
            table_path,
            group_col,
            token_col,
            capacity,
            batch_id=batch_id,
        )

    return (
        stream_df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def grouped_top_k_from_summary(
    spark,
    table_path: str,
    corpus: DataFrame,
    group_col: str,
    token_col: str = "token",
    k: int = 10,
    capacity: int = 512,
) -> DataFrame:
    """Exact per-group top-``k`` using the maintained grouped summary
    for candidates and ``corpus`` for the exact rerank — the streaming
    read side of ``functions/heavy_hitters.grouped_exact_top_k``
    (identical certify-or-degrade contract, via the shared
    ``grouped_candidate_rerank``)."""
    from tweets_spark_top_10_spark.functions.heavy_hitters import (
        grouped_candidate_rerank,
    )

    summary = spark.read.parquet(table_path)
    corpus = corpus.where(
        F.col(group_col).isNotNull() & F.col(token_col).isNotNull()
    )
    return grouped_candidate_rerank(
        summary, corpus, group_col, token_col, k, capacity
    )


def top_k_from_summary(
    spark,
    table_path: str,
    corpus_tokens: DataFrame,
    token_col: str = "token",
    k: int = 10,
    capacity: int = 512,
) -> DataFrame:
    """Exact top-``k`` using the maintained summary for candidates and
    ``corpus_tokens`` for the exact rerank (same certify-or-fallback
    contract as the batch two-pass operator)."""
    from tweets_spark_top_10_spark.functions.heavy_hitters import (
        candidates_from_summary,
    )

    summary = spark.read.parquet(table_path)
    candidates = candidates_from_summary(summary, token_col, k, capacity)
    counted = corpus_tokens
    if candidates is not None:
        counted = corpus_tokens.join(F.broadcast(candidates), token_col, "left_semi")
    return (
        counted.groupBy(token_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc(token_col))
        .limit(k)
    )
