"""Top-K: global (the reference's top-10) and per-group.

Reference: ``App.java:99,134`` — ``orderBy(desc).limit(10)``. Spark plans
this as ``TakeOrderedAndProject``: each partition keeps a K-row heap, the
driver merges P heaps — O(N) scan, no global sort materialized. That is
the right physical shape at any scale, so we express exactly that and add
the deterministic tie-break the reference lacked (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: list[Column], k: int = 10) -> DataFrame:
    """Global top-K. Pass a full tie-break in ``order_by`` for determinism.

    ``orderBy(...).limit(k)`` → ``TakeOrderedAndProject`` (verify via
    ``.explain``); never a full sort for small k.
    """
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-K rows within each group via ``row_number``.

    One shuffle on the group keys; within each partition a sort bounded
    by the window. At 100 TB the shuffle is unavoidable (it IS the
    grouping); skewed groups are split by AQE. For k=1 prefer
    ``max_by``-style aggregation, which map-side combines.
    """
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)
