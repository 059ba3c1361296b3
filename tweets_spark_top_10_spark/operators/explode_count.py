"""The reference's core dataflow: explode an array column and count.

Reference: ``App.java:97-98`` —
``tweets.withColumn("hashtag", explode(col("hashtags"))).drop(col("hashtags"))
.groupBy("hashtag").agg(count("*").alias("NumberOfHashtags"))``.

Scale notes (100 TB):
- ``explode`` is a Catalyst ``Generate`` — pipelined inside whole-stage
  codegen, no shuffle of its own.
- The group-count is a partial+final HashAggregate: map-side combine
  collapses each input partition to (#distinct keys) rows before the
  single shuffle, so a skewed hot key (a viral hashtag) arrives at the
  final agg as at-most-one-row-per-map-partition. AQE handles residual
  skew; no manual salting needed for COUNT-shaped aggs.
- Explicitly dropping the array column matters less than it looks:
  Catalyst's ColumnPruning already prunes it below the Generate
  (the reference's ``.drop`` at App.java:97 was redundant — SURVEY §4.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_count(
    df: DataFrame,
    array_col: str | Column,
    out_key: str = "key",
    out_count: str = "cnt",
) -> DataFrame:
    """One row per array element, counted per distinct element.

    Null/empty arrays contribute nothing (``explode`` drops them) —
    matching the reference's semantics for tweets without hashtags.
    """
    col = F.col(array_col) if isinstance(array_col, str) else array_col
    return (
        df.select(F.explode(col).alias(out_key))
        .groupBy(out_key)
        .agg(F.count(F.lit(1)).alias(out_count))
    )
