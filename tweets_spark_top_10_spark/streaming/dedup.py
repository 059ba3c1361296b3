"""Streaming deduplication.

``dropDuplicatesWithinWatermark`` keeps dedup state bounded by the
watermark horizon — the 100 TB/day answer to "the same event arrives
twice from the at-least-once bus". Exact-once-forever dedup would need
unbounded state; bounding by event-time horizon is the standard
trade (late duplicates beyond the watermark pass through).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate rows by ``keys`` within the watermark horizon."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
