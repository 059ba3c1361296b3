"""Join helpers with explicit physical-strategy intent.

The reference has zero joins (SURVEY.md §2.1); these exist for the
engine's extended surface. The helpers make the broadcast decision
explicit and auditable instead of buried in session thresholds.

Scale notes (100 TB):
- Dimension tables (region/nation/supplier/part at any realistic scale)
  must broadcast — a shuffle join on a 100 TB fact table for a 25-row
  dim is the classic catastrophe. ``F.broadcast`` pins the strategy.
- Fact-fact joins shuffle on the key; co-locate repeated joins by
  bucketing both sides on the key at write time, and let AQE split skew.
- semi/anti express EXISTS / NOT IN without materializing the right side
  into the output — and broadcast the filter side when it is small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

JOIN_TYPES = {
    "inner",
    "left",
    "right",
    "full",
    "left_semi",
    "left_anti",
    "cross",
}


def join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    if how not in JOIN_TYPES:
        raise ValueError(f"unsupported join type {how!r}; supported: {sorted(JOIN_TYPES)}")
    if how == "cross":
        return left.crossJoin(right)
    return left.join(right, on=on, how=how)


def broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Join with the (small) ``dim`` side broadcast to every executor."""
    return join(fact, F.broadcast(dim), on=on, how=how)
