"""Exact distributed top-K without a full-cardinality shuffle.

The reference computes its top-10 hashtags with a plain
groupBy-count over every distinct token (``App.java:97-99``) — fine
while the distinct-key cardinality fits a shuffle, but at 100 TB the
group-by materializes billions of distinct keys to answer a question
about 10 of them.  This module is the scale shape of that same query:

phase 1  ONE pass over the data.  Each partition summarizes its
         tokens with a capacity-``C`` Misra-Gries sketch
         (``mapInPandas``; sketch state lives across Arrow batches
         within the partition, per-batch counts folded in vectorized
         via ``value_counts``) and emits at most ``C`` (token, est)
         rows plus one ``(NULL, n_p)`` row carrying the partition's
         total token count.  Output size is C x partitions — KBs,
         independent of data volume.
phase 2  The union of summaries is aggregated per token.  The
         Misra-Gries merge bound (Agarwal et al., "Mergeable
         Summaries", PODS'12) gives ``sum(est)(x) >= freq(x) -
         N/(C+1)`` for every token x, so the candidate cut

             est(x) + N/(C+1) >= (K-th largest est)

         provably keeps every token whose true frequency ties or
         beats the true K-th frequency:  est(x) >= freq(x) - slack >=
         freq_K - slack >= (K-th largest est) - slack, because est is
         an underestimate.  Candidates are therefore a SUPERSET of
         the exact top-K, unconditionally — no distributional
         assumption.
phase 3  Second pass: exact counts restricted to the candidate set
         (broadcast semi-join, map-side partial aggregation — the
         shuffle now carries only candidate tokens) -> exact top-K.

The final answer is bit-identical to the exhaustive groupBy-count
top-K (which is exactly what the full-value oracle checks), while the
only unbounded shuffle in the plan is keyed by a list provably capped
at ~C·P + false-positive candidates.

Two driver-side ``collect``s occur in phase 2 — both metadata-size
(one scalar N, one scalar K-th-largest-est), not data-size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tweets_spark_top_10_spark.functions.cachectl import persist_tracked


def mg_partition_summaries(
    tokens: DataFrame, token_col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``tokens[token_col]``.

    Returns ``(token_col string, est long)`` rows: <= ``capacity``
    token rows per partition (est underestimates the partition
    frequency by at most ``n_p/(capacity+1)``) plus one row with
    ``token_col = NULL`` and ``est = n_p`` (the partition's total item
    count, needed for the global error bound).
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n = 0
        for pdf in batches:
            col = pdf[token_col].dropna()
            n += len(col)
            # Fold the batch's exact counts into the sketch (weighted
            # Misra-Gries update), then prune back to `capacity` by
            # subtracting the (capacity+1)-th largest counter from all
            # — the mergeable-summaries reduction, which preserves the
            # n_p/(capacity+1) undercount bound.
            for tok, cnt in col.value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(cnt)
            if len(counters) > capacity:
                kth = sorted(counters.values(), reverse=True)[capacity]
                counters = {t: c - kth for t, c in counters.items() if c > kth}
        out = pd.DataFrame(
            {
                token_col: list(counters) + [None],
                "est": list(counters.values()) + [n],
            }
        )
        out["est"] = out["est"].astype("int64")
        yield out

    return tokens.select(token_col).mapInPandas(
        summarize, schema=f"{token_col} string, est long"
    )


def candidates_from_summary(
    summary: DataFrame, token_col: str, k: int, capacity: int
) -> DataFrame | None:
    """Provable top-``k`` candidate superset from a merged MG summary
    table (``(token_col, est)`` rows plus NULL-token total rows), or
    ``None`` when the sketch can't certify one.

    A token absent from the summary has true frequency <= slack =
    N/(capacity+1) (sum of all per-partition / per-merge prune
    subtractions).  When slack < (k-th largest merged est), absent
    tokens therefore cannot reach (or tie) the true k-th frequency,
    so filtering the summary with

        est + slack >= k-th largest est

    yields a certified superset of the exact top-k.  When slack >=
    k-th largest est the sketch is too coarse to rule out dropped
    tokens — the caller must fall back to the exhaustive count
    (capacity was undersized for this distribution).  Works for both
    the batch per-partition summaries and the incrementally
    maintained streaming summary — the error bound is the same
    N/(capacity+1) in both (mergeable-summaries reduction).
    """
    summary = persist_tracked(summary)
    merged = persist_tracked(
        summary.where(F.col(token_col).isNotNull())
        .groupBy(token_col)
        .agg(F.sum("est").alias("est"))
    )
    # Two metadata-size collects: one scalar each.
    n_total = int(
        summary.where(F.col(token_col).isNull())
        .agg(F.sum("est").alias("n"))
        .collect()[0]["n"]
        or 0
    )
    kth_rows = (
        merged.orderBy(F.desc("est"))
        .limit(k)
        .agg(F.min("est").alias("kth"), F.count(F.lit(1)).alias("m"))
        .collect()
    )
    kth_est = int(kth_rows[0]["kth"] or 0)
    # Fewer than k surviving summary tokens: pruned (absent) tokens
    # could still rank inside the top-k purely by being distinct, so
    # the summary cannot certify regardless of the slack bound.
    if int(kth_rows[0]["m"]) < k:
        return None
    slack = n_total / (capacity + 1)
    if slack >= kth_est:
        return None
    return merged.where(F.col("est") + F.lit(slack) >= F.lit(kth_est)).select(
        token_col
    )


def mg_candidate_tokens(
    tokens: DataFrame, token_col: str, k: int, capacity: int
) -> DataFrame | None:
    """Batch form: sketch the data per-partition, then certify (see
    :func:`candidates_from_summary`)."""
    return candidates_from_summary(
        mg_partition_summaries(tokens, token_col, capacity), token_col, k, capacity
    )


def mg_partition_summaries_grouped(
    df: DataFrame, group_col: str, token_col: str, capacity: int
) -> DataFrame:
    """Per-partition, per-group Misra-Gries summaries.

    Like :func:`mg_partition_summaries` but one independent
    capacity-``capacity`` sketch per distinct ``group_col`` value seen
    in the partition.  Returns ``(group_col string, token_col string,
    est long)``: <= ``capacity`` token rows per (partition, group) plus
    one ``(group, NULL, n_pg)`` total row per (partition, group).
    Output size is C x P x G_p — bounded by sketch capacity, never by
    data volume (G_p = groups present in the partition).
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, dict[str, int]] = {}
        totals: dict[str, int] = {}
        for pdf in batches:
            pdf = pdf.dropna(subset=[group_col, token_col])
            for (grp, tok), cnt in (
                pdf.groupby([group_col, token_col], sort=False).size().items()
            ):
                g = counters.setdefault(grp, {})
                g[tok] = g.get(tok, 0) + int(cnt)
                totals[grp] = totals.get(grp, 0) + int(cnt)
            for grp, g in counters.items():
                if len(g) > capacity:
                    kth = sorted(g.values(), reverse=True)[capacity]
                    counters[grp] = {t: c - kth for t, c in g.items() if c > kth}
        groups, toks, ests = [], [], []
        for grp, g in counters.items():
            groups += [grp] * (len(g) + 1)
            toks += list(g) + [None]
            ests += list(g.values()) + [totals[grp]]
        out = pd.DataFrame({group_col: groups, token_col: toks, "est": ests})
        out["est"] = out["est"].astype("int64")
        yield out

    return df.select(group_col, token_col).mapInPandas(
        summarize, schema=f"{group_col} string, {token_col} string, est long"
    )


def grouped_exact_top_k(
    df: DataFrame,
    group_col: str,
    token_col: str,
    k: int,
    capacity: int = 4096,
) -> DataFrame:
    """Exact top-``k`` tokens per group, two-pass, per-group fallback.

    The grouped form of :func:`exact_top_k_two_pass`, with the
    certification decided PER GROUP and entirely inside the plan — no
    driver-side collect at all (the global form needs two scalar
    collects; here the thresholds ride along as join columns):

    1. one data pass -> per-(partition, group) MG summaries;
    2. merge summaries per (group, token); per group compute the k-th
       largest merged est, the surviving-token count m_g, and the
       slack N_g/(C+1).  A group is *certified* when m_g >= k and
       slack_g < kth_g — by the mergeable-summaries bound its
       candidate set (est + slack_g >= kth_g) is then a provable
       superset of its exact top-k;
    3. second pass restricted to [certified-group candidates UNION all
       rows of uncertified groups] -> exact per-group counts ->
       row_number <= k.

    Result ``(group_col, token_col, n)``, per group ordered by n desc,
    token asc — bit-identical to the exhaustive grouped count, which
    is what the catalog oracle checks.  Skew note: a group too skewed
    or too flat to certify only degrades ITSELF to the exhaustive
    path; well-behaved groups keep the bounded shuffle.
    """
    # NULL groups/tokens carry no top-k semantics (the summaries drop
    # them too); filter up front so the uncertified-group pass can't
    # resurrect NULL-token rows into the exact recount.
    df = df.where(F.col(group_col).isNotNull() & F.col(token_col).isNotNull())
    summaries = persist_tracked(
        mg_partition_summaries_grouped(df, group_col, token_col, capacity)
    )
    return grouped_candidate_rerank(
        summaries, df, group_col, token_col, k, capacity
    )


def grouped_candidate_rerank(
    summaries: DataFrame,
    df: DataFrame,
    group_col: str,
    token_col: str,
    k: int,
    capacity: int,
) -> DataFrame:
    """Steps 2-3 of the grouped two-pass: merge (group, token) summary
    rows, certify per group, rerank exactly over ``df`` restricted to
    [certified candidates UNION uncertified groups' full rows].

    Shared by the batch operator (per-partition summaries) and the
    streaming maintenance path (one stored pre-merged summary per
    group, ``streaming/heavy_hitters.grouped_top_k_from_summary``) —
    mergeability means the same reduction works on either shape.
    """
    merged = summaries.where(F.col(token_col).isNotNull()).groupBy(
        group_col, token_col
    ).agg(F.sum("est").alias("est"))
    totals = (
        summaries.where(F.col(token_col).isNull())
        .groupBy(group_col)
        .agg((F.sum("est") / F.lit(capacity + 1)).alias("slack"))
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(F.desc("est"), F.asc(token_col))
    )
    # totals is the group spine: a group whose counters were ALL pruned
    # away has no merged rows at all (a flat distribution under a small
    # capacity does this) — it must land in the uncertified branch, not
    # silently vanish, so left-join from totals and null-coalesce to
    # "not certified".
    stats = (
        totals.join(
            merged.withColumn("rn", rn)
            .where(F.col("rn") <= k)
            .groupBy(group_col)
            .agg(F.min("est").alias("kth"), F.count(F.lit(1)).alias("m")),
            group_col,
            "left",
        )
        .withColumn(
            "certified",
            F.coalesce(
                (F.col("m") >= k) & (F.col("slack") < F.col("kth")),
                F.lit(False),
            ),
        )
    )
    stats = persist_tracked(stats)
    candidates = (
        merged.join(F.broadcast(stats.where("certified")), group_col)
        .where(F.col("est") + F.col("slack") >= F.col("kth"))
        .select(group_col, token_col)
    )
    uncertified = stats.where(~F.col("certified")).select(group_col)
    keep = df.join(F.broadcast(candidates), [group_col, token_col], "left_semi").unionByName(
        df.join(F.broadcast(uncertified), [group_col], "left_semi")
    )
    exact = keep.groupBy(group_col, token_col).agg(F.count(F.lit(1)).alias("n"))
    out_rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(F.desc("n"), F.asc(token_col))
    )
    return exact.withColumn("rn", out_rn).where(F.col("rn") <= k).drop("rn")


def exact_top_k_two_pass(
    tokens: DataFrame, token_col: str, k: int, capacity: int = 4096
) -> DataFrame:
    """Exact global top-``k`` of ``token_col`` by count, two-pass.

    Pass 1 builds Misra-Gries candidates (see module docstring for the
    superset proof); pass 2 re-counts only the candidates exactly.
    Result: ``(token_col, n)`` ordered by ``n`` desc, ``token_col``
    asc — identical to the exhaustive groupBy-count top-K.  If the
    sketch can't certify a candidate set (capacity too small for the
    distribution), falls back to the exhaustive count — exactness is
    unconditional either way.
    """
    candidates = mg_candidate_tokens(tokens, token_col, k, capacity)
    counted = tokens
    if candidates is not None:
        counted = tokens.join(F.broadcast(candidates), token_col, "left_semi")
    exact = counted.groupBy(token_col).agg(F.count(F.lit(1)).alias("n"))
    return exact.orderBy(F.desc("n"), F.asc(token_col)).limit(k)
