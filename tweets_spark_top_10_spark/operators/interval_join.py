"""Interval overlap join without a theta-join cartesian.

``a.start <= b.end AND b.start <= a.end`` is a pure theta predicate —
expressed directly, Spark plans BroadcastNestedLoopJoin (all pairs
compared; quadratic, and impossible when neither side broadcasts).
The classic distributed reshape: quantize time into fixed buckets,
emit each interval once per bucket it touches, EQUI-join on (keys,
bucket), then close with the exact overlap predicate.  Two overlapping
intervals always share at least the bucket containing the later start,
so no pair is lost; a pair sharing several buckets would duplicate,
which the first-common-bucket claim kills WITHOUT a distinct shuffle:
the pair is kept only in bucket ``floor(max(starts)/width)``.

Cost model: shuffle volume = sum over rows of buckets-touched =
|data| x (avg interval length / bucket width + 1).  Pick the width
near the typical interval length; a pathological row spanning
``max_buckets_per_row`` buckets fails loudly (the sequence-bomb guard,
same contract as ``operators/resample.py``) instead of flooding an
executor.  The equi-key (when given) co-partitions the join exactly
like any other shuffle join — AQE handles residual bucket skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_ids(start: Column, end: Column, width_s: int, max_buckets: int) -> Column:
    b0 = F.floor(F.unix_timestamp(start) / F.lit(width_s))
    b1 = F.floor(F.unix_timestamp(end) / F.lit(width_s))
    seq = F.sequence(b0, b1)
    return F.when(F.size(seq) <= max_buckets, seq).otherwise(
        F.raise_error(
            F.concat(
                F.lit("interval_overlap_join: interval ["),
                start.cast("string"),
                F.lit(", "),
                end.cast("string"),
                F.lit(f"] spans more than {max_buckets} buckets of {width_s}s"),
            )
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    on: list[tuple[str, str]] | None = None,
    bucket_seconds: int = 30 * 86400,
    max_buckets_per_row: int = 10_000,
) -> DataFrame:
    """All (left, right) row pairs whose [start, end] intervals overlap
    (closed ends, ``l_start <= r_end AND r_start <= l_end``), optionally
    restricted by equality keys ``on = [(l_col, r_col), ...]``.

    Column names must be disjoint between the two inputs (rename
    before a self-join); the result carries all columns of both.
    Start/end may be date or timestamp; NULL bounds drop the row (an
    unbounded interval would touch every bucket — model open ends
    explicitly with sentinel dates if needed).
    """
    dup = set(left.columns) & set(right.columns)
    if dup:
        raise ValueError(f"column names must be disjoint; shared: {sorted(dup)}")
    lb = left.where(
        F.col(l_start).isNotNull() & F.col(l_end).isNotNull()
    ).withColumn(
        "__lb",
        F.explode(
            _bucket_ids(F.col(l_start), F.col(l_end), bucket_seconds, max_buckets_per_row)
        ),
    )
    rb = right.where(
        F.col(r_start).isNotNull() & F.col(r_end).isNotNull()
    ).withColumn(
        "__rb",
        F.explode(
            _bucket_ids(F.col(r_start), F.col(r_end), bucket_seconds, max_buckets_per_row)
        ),
    )
    cond = lb["__lb"] == rb["__rb"]
    for l_col, r_col in on or []:
        cond = cond & (lb[l_col] == rb[r_col])
    overlap = (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    first_common = F.col("__lb") == F.floor(
        F.greatest(F.unix_timestamp(l_start), F.unix_timestamp(r_start))
        / F.lit(bucket_seconds)
    )
    return lb.join(rb, cond).where(overlap & first_common).drop("__lb", "__rb")
