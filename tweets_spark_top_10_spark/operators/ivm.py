"""Incremental view maintenance for additive aggregates.

A 100 TB fact table with a keyed change feed should not recompute its
rollups from scratch per batch: for ADDITIVE aggregates (count, sum —
and avg as sum/count) the change feed translates into a churn-sized
DELTA on the view, and applying the delta costs O(groups touched),
not O(facts).  This is classic IVM (Blakeley et al., SIGMOD'86 view
maintenance; the same algebra Materialize/Delta Live Tables apply).

Non-additive aggregates (min/max/distinct) are NOT maintainable under
deletes without auxiliary state; :func:`minmax_from_support` provides
the standard auxiliary — a maintained SUPPORT multiset, which is just
this module's own view/delta machinery with the measure folded into
the grouping key.

The delta needs PRE-IMAGES for updates/deletes (subtract the old
row's contribution, add the new one's).  Feeds that carry
before-images (Debezium-style) can skip the join; this operator
derives pre-images by joining the compacted feed against the base
snapshot on the merge key — co-located when the base is bucketed by
key, and the join output is churn-sized either way.

Gate: the catalog query computes the view via base-aggregate + delta
while the oracle aggregates the merged snapshot directly — two
completely different plans, value-identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_agg_view(
    df: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Materialize the view: ``group_cols + (n, sum_<c>...)``."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
    )


def agg_delta(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    group_cols: list[str],
    sum_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Churn-sized view delta from a keyed I/U/D change feed.

    Per affected key (latest change wins, same compaction as
    ``apply_changes``): subtract the pre-image's contribution from its
    old group (if the key existed in ``base``), add the post-image's
    to its new group (unless deleted).  Group-changing updates thus
    move mass between groups correctly.  Returns
    ``group_cols + (dn, dsum_<c>...)`` — possibly negative.
    """
    w = Window.partitionBy(key).orderBy(F.desc(seq_col), F.desc(op_col))
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .select(
            F.col(key).alias("__k"),
            (F.col(op_col) == "D").alias("__del"),
            *[F.col(c).alias(f"__new_{c}") for c in group_cols + sum_cols],
        )
    )
    pre = base.select(
        F.col(key).alias("__k"),
        F.lit(True).alias("__existed"),
        *[F.col(c).alias(f"__old_{c}") for c in group_cols + sum_cols],
    )
    j = latest.join(pre, "__k", "left")
    minus = j.where(F.col("__existed").isNotNull()).select(
        *[F.col(f"__old_{c}").alias(c) for c in group_cols],
        F.lit(-1).cast("long").alias("dn"),
        *[(-F.col(f"__old_{c}")).alias(f"dsum_{c}") for c in sum_cols],
    )
    plus = j.where(~F.col("__del")).select(
        *[F.col(f"__new_{c}").alias(c) for c in group_cols],
        F.lit(1).cast("long").alias("dn"),
        *[F.col(f"__new_{c}").alias(f"dsum_{c}") for c in sum_cols],
    )
    return (
        minus.unionByName(plus)
        .groupBy(*group_cols)
        .agg(
            F.sum("dn").alias("dn"),
            *[F.sum(f"dsum_{c}").alias(f"dsum_{c}") for c in sum_cols],
        )
    )


def apply_agg_delta(
    view: DataFrame, delta: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Merge a delta into the view: full-outer on the group key, add
    counts and sums, drop groups whose count reaches zero (their sums
    are exact zeros of cancellation, not data)."""
    j = view.join(delta, group_cols, "full_outer")
    merged = j.select(
        *group_cols,
        (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
        *[
            (
                F.coalesce(f"sum_{c}", F.lit(0))
                + F.coalesce(f"dsum_{c}", F.lit(0))
            ).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
    return merged.where(F.col("n") > 0)


def minmax_from_support(
    support: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """min/max per group from a maintained SUPPORT multiset.

    min/max are not additively maintainable: deleting the current
    minimum needs the runner-up, which a scalar view has already
    forgotten.  The standard fix is to maintain the support —
    ``build_agg_view(df, group_cols + [value_col], [])`` gives the
    per-(group, value) count, ``agg_delta``/``apply_agg_delta`` with
    the same widened key maintain it under I/U/D (counts reaching
    zero drop the value, resurfacing the runner-up) — and derive
    min/max by aggregating the support.

    Size caveat, stated not hidden: support is groups x distinct
    values of the measure.  Bounded-cardinality measures (status
    codes, bucketed prices, enum-ish dims) are the use case; a
    continuous measure should be bucketed first or min/max recomputed
    from facts.
    """
    return support.groupBy(*group_cols).agg(
        F.min(value_col).alias(f"min_{value_col}"),
        F.max(value_col).alias(f"max_{value_col}"),
    )
