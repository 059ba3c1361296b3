"""Time-series resampling: per-key regular grid + gap filling.

Sensor/metric/event feeds arrive irregularly; downstream consumers
(joins against other series, window models, charting) want one row per
(key, bucket) on a regular grid with gaps filled deterministically.
The reference has no time-series surface (its only temporal logic is
the hour-partition path walk, ``App.java:43-63``); this is part of the
capability envelope a 100 TB pipeline needs.

Scale shape:

- bucketing is a ``date_trunc`` projection + keyed aggregate (map-side
  partial, one shuffle on (key, bucket));
- the spine is generated per key with ``sequence() + explode`` from
  that key's own [min, max] bucket range — no driver-side calendar, no
  cross join against a global grid (a global grid would multiply every
  key by the full time span; per-key ranges stay churn-sized);
- LOCF is one ordered window per key (``last(ignorenulls)``), which
  shuffles on the key — the same partitioning the aggregate already
  produced, so AQE/exchange-reuse keeps it to one effective shuffle.

Guard: ``max_buckets_per_key`` bounds the spine explode (a key with a
25-year span at 1-second resolution would otherwise emit 10^9 rows
from one input row — the classic sequence-bomb); violating keys fail
loudly rather than OOM an executor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval: str = "1 hour",
    agg: Column | None = None,
    max_buckets_per_key: int = 1_000_000,
) -> DataFrame:
    """Per-``key_col`` regular time grid with last-observation-carried-
    forward fill.

    Buckets ``ts_col`` to ``interval`` boundaries, aggregates
    ``value_col`` per (key, bucket) with ``agg`` (default: avg rounded
    to 6 digits), generates each key's full bucket spine between its
    first and last observation, and fills empty buckets by carrying the
    most recent observed aggregate forward.

    Returns ``(key_col, bucket timestamp, v double, is_gap boolean)``
    where ``v`` is the filled value and ``is_gap`` marks spine rows
    with no observation in that bucket.  The first bucket per key is
    never a gap by construction, so ``v`` is never NULL.
    """
    if agg is None:
        agg = F.round(F.avg(value_col), 6)
    unit = interval.split()[-1].rstrip("s")  # "1 hour" -> "hour"
    hourly = df.groupBy(
        F.col(key_col), F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    ).agg(agg.alias("v_obs"))
    bounds = hourly.groupBy(key_col).agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    seq = F.sequence("b0", "b1", F.expr(f"interval {interval}"))
    checked = F.when(F.size(seq) <= max_buckets_per_key, seq).otherwise(
        F.raise_error(
            F.concat(
                F.lit("resample_locf: key "),
                F.col(key_col).cast("string"),
                F.lit(
                    f" spans more than {max_buckets_per_key} buckets at"
                    f" interval '{interval}'"
                ),
            )
        )
    )
    spine = bounds.select(key_col, F.explode(checked).alias("bucket"))
    joined = spine.join(hourly, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key_col,
        "bucket",
        F.last("v_obs", ignorenulls=True).over(w).alias("v"),
        F.col("v_obs").isNull().alias("is_gap"),
    )
