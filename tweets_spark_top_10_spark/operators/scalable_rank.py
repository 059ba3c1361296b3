"""Scalable global ordering primitives: dense rank and running sum
over a TOTAL order, without a single-partition window.

A ``Window.orderBy(...)`` with no ``partitionBy`` plans as
``Exchange SinglePartition`` → one task sorts and scans EVERY row —
fine for metadata-sized inputs, a serialization cliff on anything
corpus-proportional (a 100M-token vocabulary, a per-slot size table
with one row per document of the largest language).  These helpers
replace it with the standard two-phase shape:

1. ``repartitionByRange`` on the sort key — a parallel range exchange;
   partition *i*'s keys all precede partition *i+1*'s in the total
   order, so a per-partition rank plus a per-partition offset IS the
   global rank.
2. One tiny aggregate (one row per partition) computes the offsets;
   its own running sum is the only unpartitioned window left, over a
   few-hundred-row input bounded by the partition count — metadata,
   never data.
3. In-partition positions: :func:`global_row_number` reads them off
   ``monotonically_increasing_id`` on the partition-sorted rows (no
   second exchange at all); :func:`global_running_sum` needs an
   ordered accumulation, so it windows partitioned BY the
   range-partition id — one further fixed-width-row exchange, applied
   only to inputs that are already aggregates (per-slot sizes), never
   to the raw corpus.

Correctness requires the sort key to be a TOTAL order (unique per
row): ranks are then identical for ANY boundary placement the range
partitioner picks, so the output is deterministic even though the
partitioner samples.  Callers pass keys made unique by construction
(vocab tokens; slot numbers from a groupBy).

Cites: reference has no ranking surface at all (its one global sort is
the top-10 ``orderBy().limit()``, `App.java:99-100`, which is
``TakeOrderedAndProject`` — already scalable); this generalizes the
[EXT] vocabulary/curriculum operators to 100 TB inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tweets_spark_top_10_spark.functions.cachectl import persist_tracked


def _range_tagged(df: DataFrame, order_by: list[Column | str]) -> DataFrame:
    """Range-partition ``df`` on the (total-order) sort key and tag each
    row with its partition id.  Persisted: both the offset aggregate and
    the ranked output read it, and the tag must be pinned before the
    window's own hash exchange re-clusters the rows."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    return persist_tracked(
        df.repartitionByRange(parallelism, *order_by).withColumn(
            "__pid", F.spark_partition_id()
        )
    )


def _pid_offsets(per_pid: DataFrame, agg: Column) -> DataFrame:
    """(__pid, __off): exclusive running total of ``agg`` in partition-id
    order.  One row per range partition — the single unpartitioned
    window in the plan, bounded by the partition count."""
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    return (
        per_pid.groupBy("__pid")
        .agg(agg.alias("__n"))
        .withColumn("__off", F.coalesce(F.sum("__n").over(w), F.lit(0)))
        .select("__pid", "__off")
    )


def global_row_number(
    df: DataFrame,
    order_by: list[Column | str],
    out_col: str = "rn",
    start: int = 1,
) -> DataFrame:
    """``row_number() OVER (ORDER BY order_by)`` (1-based unless
    ``start`` says otherwise), computed with full parallelism and ONE
    corpus exchange.

    In-partition positions come from ``monotonically_increasing_id``
    over the range-partitioned, partition-sorted rows — the DataFrame
    ``zipWithIndex`` pattern: ``mid - min(mid per partition)`` is the
    local index, so no ``Window.partitionBy(__pid)`` (whose required
    clustering would re-shuffle the corpus a second time) and no
    second sort.  This leans on mid being CONSECUTIVE within a
    partition (a per-partition counter in Spark's implementation since
    1.6; the API contract only promises monotonicity), so the contract
    is ENFORCED in the plan itself: the per-partition offset aggregate
    also computes ``max(__mid)`` and an ``assert_true(max - min + 1 ==
    count)`` folded into the offset arithmetic (one row per partition —
    metadata cost) makes any engine that batches/strides mids fail
    loudly at first execution, everywhere, not only in the pinned
    skewed-input differential in ``tests/test_scalable_rank.py``.

    ``order_by`` must be a total order (unique per row) — see module
    docstring.  Output: ``df``'s columns plus ``out_col`` (long).
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    tagged = persist_tracked(
        df.repartitionByRange(parallelism, *order_by)
        .sortWithinPartitions(*order_by)
        .select(
            "*",
            F.spark_partition_id().alias("__pid"),
            F.monotonically_increasing_id().alias("__mid"),
        )
    )
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    # __off carries a zero-valued assert_true term so Catalyst cannot
    # prune it: mids must be consecutive within each partition
    # (max - min + 1 == count) or the local index below is wrong — fail
    # the job, never emit wrong ranks.
    consecutive = F.assert_true(
        F.col("__max") - F.col("__base") + F.lit(1) == F.col("__n"),
        F.lit(
            "global_row_number: monotonically_increasing_id is not "
            "consecutive within a partition; engine broke the "
            "per-partition-counter behavior this operator leans on"
        ),
    )
    offs = (
        tagged.groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min("__mid").alias("__base"),
            F.max("__mid").alias("__max"),
        )
        .withColumn(
            "__off",
            F.coalesce(F.sum("__n").over(w), F.lit(0))
            + F.coalesce(consecutive.cast("long"), F.lit(0)),
        )
        .select("__pid", "__base", "__off")
    )
    return (
        tagged.join(F.broadcast(offs), "__pid")
        .withColumn(
            out_col,
            (
                F.col("__mid") - F.col("__base") + F.col("__off") + F.lit(start)
            ).cast("long"),
        )
        .drop("__pid", "__mid", "__base", "__off")
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    order_by: list[Column | str],
    quantiles: list[float],
    out_prefix: str = "e",
) -> DataFrame:
    """One row of EXACT interpolated quantiles of ``value_col``
    (columns ``{out_prefix}0..{out_prefix}{k-1}``, one per entry of
    ``quantiles``), computed with full parallelism — the distributed
    replacement for the builtin ``percentile``, which buffers the
    ENTIRE column inside a single aggregation buffer (3-task partials
    + a one-task merge holding every value at once: a memory cliff on
    anything corpus-proportional, and the exact shape guide §5 bans).

    Execution: one range exchange + per-partition sort assigns global
    ranks (:func:`global_row_number`), a broadcast of the <=2k probe
    rows picks the two order statistics around each quantile position,
    and a metadata-sized aggregate interpolates.  The interpolation
    REPLAYS Spark's ``percentile`` arithmetic bit-for-bit —
    ``pos = q * (n-1)``;
    ``(ceil(pos) - pos) * v[floor(pos)] + (pos - floor(pos)) * v[ceil(pos)]``
    over the 0-based sorted values — so swapping this in for the
    builtin changes NOTHING about emitted doubles (r16: verified
    bit-identical on lineitem at sf0.001/0.01/0.1), only the plan.

    ``order_by`` must start with ``value_col`` and be a total order
    (unique per row — the :func:`global_row_number` contract); ties in
    ``value_col`` are fine because the value AT a rank is invariant to
    how a run of equal values is ordered internally.
    """
    ranked = global_row_number(
        df.select(value_col, *[c for c in order_by if c != value_col]),
        order_by,
        "__rn",
        start=0,
    )
    n1 = df.agg((F.count(value_col) - 1).cast("double").alias("__n1"))
    qarr = F.array(*[F.lit(float(q)) for q in quantiles])
    probes = (
        n1.select(F.explode(qarr).alias("__q"), "__n1")
        .select("__q", (F.col("__q") * F.col("__n1")).alias("__pos"))
        .select(
            "__q",
            "__pos",
            F.floor("__pos").cast("long").alias("__lo"),
            F.ceil("__pos").cast("long").alias("__hi"),
        )
        .select(
            "__q", "__pos", "__lo", "__hi",
            F.explode(F.array("__lo", "__hi")).alias("__idx"),
        )
    )
    hit = ranked.join(F.broadcast(probes), ranked["__rn"] == probes["__idx"])
    v = F.col(value_col)
    per_q = hit.groupBy("__q", "__pos", "__lo", "__hi").agg(
        F.min(F.when(F.col("__rn") == F.col("__lo"), v)).alias("__vlo"),
        F.min(F.when(F.col("__rn") == F.col("__hi"), v)).alias("__vhi"),
    )
    interp = F.when(F.col("__lo") == F.col("__hi"), F.col("__vlo")).otherwise(
        (F.col("__hi").cast("double") - F.col("__pos")) * F.col("__vlo")
        + (F.col("__pos") - F.col("__lo").cast("double")) * F.col("__vhi")
    )
    return per_q.groupBy().agg(
        *[
            F.min(F.when(F.col("__q") == float(q), interp)).alias(
                f"{out_prefix}{i}"
            )
            for i, q in enumerate(quantiles)
        ]
    )


def global_running_sum(
    df: DataFrame,
    order_by: list[Column | str],
    value_col: str,
    out_col: str = "running",
    exclusive: bool = True,
) -> DataFrame:
    """Prefix sum of ``value_col`` in ``order_by`` order (exclusive by
    default: the row's own value is not included), with full
    parallelism.  Same total-order contract as
    :func:`global_row_number`."""
    tagged = _range_tagged(df, order_by)
    offs = _pid_offsets(tagged, F.sum(value_col))
    hi = -1 if exclusive else 0
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    return (
        tagged.join(F.broadcast(offs), "__pid")
        .withColumn(
            out_col,
            F.coalesce(F.sum(value_col).over(w_in), F.lit(0)) + F.col("__off"),
        )
        .drop("__pid", "__off")
    )
