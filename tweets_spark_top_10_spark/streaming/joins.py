"""Streaming joins: stream-static enrichment and stream-stream interval
joins.

- Stream-static: the dimension is a plain batch DataFrame, re-resolved
  per micro-batch; broadcast it — a 100 TB/day stream must never
  shuffle to meet a dimension table.
- Stream-stream: both sides buffered in state, bounded by watermarks +
  the join's time-interval condition; without the interval bound the
  state store grows forever, so this wrapper REQUIRES one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Stream-static join with the static side broadcast."""
    return stream.join(F.broadcast(dim), on, how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join: right-side events within
    ``[left_ts - lookback, left_ts]`` for the same key.

    Both sides get watermarks; the interval condition lets Spark expire
    right-side state older than (watermark + lookback) and left-side
    state older than the watermark — bounded state by construction.
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lookback}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    return lw.join(rw, cond, "inner")
