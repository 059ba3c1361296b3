"""Fixed pure-JVM calibration workload (round-14 verdict item 2).

The round-14 wall-reference rebase was evidenced by a half-day of
unchanged-code same-hour controls; this makes box speed MEASURABLE
instead of argued.  The workload is deterministic — a fixed-size
``spark.range`` pushed through whole-stage-codegen'd integer
arithmetic into a single partial-aggregate (the only exchange is the
32-row final combine) — so its wall time is a pure function of how
fast the box executes JVM compute RIGHT NOW: no data, no IO, no
Python, no shuffle to speak of.  That is the same resource the
catalog's walls are made of, so every bench/sentinel history line
records ``calib_s`` and the sentinel's wall tier compares walls
NORMALIZED by it (``wall / calib``):

- host regime shift  -> calib moves WITH the walls -> ratio flat ->
  no flag (the r14 rebase becomes arithmetic, not an escalation
  debate);
- code regression    -> walls move, calib flat -> ratio jumps ->
  flags exactly as before.

The aggregate's VALUE is asserted every run (Knuth multiplicative
hash of each id mod a prime, summed) — a wrong sum means the JVM is
miscomputing and no timing from that box is trustworthy.
"""

from __future__ import annotations

import statistics
import time

CALIB_ROWS = 8_000_000_000
CALIB_PARTS = 32
# sum(((id % 1000003) * 2654435761) % 1000003 for id in range(CALIB_ROWS))
# — precomputed once with exact integer arithmetic (no JVM involved).
# The inner mod keeps the product under ~2.65e15 (int64-safe at ANY row
# count; the unreduced form overflows past ~3.4e9 rows under ANSI mode).
# 8e9 rows / 32 partitions = one wave of ~2 s tasks on this box —
# long enough that scheduler jitter is a small fraction of the wall,
# short enough that warm + 5 passes stays under ~15 s per run;
# measured pass spread ±15-20%, which median-of-5 compresses well
# below the 1.5x wall-tier gate it feeds.
CALIB_EXPECT_SUM = 4000008002943381


def calibrate(spark, passes: int = 5) -> float:
    """Median wall seconds over ``passes`` runs of the fixed workload
    (one untimed warm pass first absorbs codegen compilation).  Median,
    not min: the point is the box's CURRENT regime including steady
    CPU steal — min would dodge exactly the slowdown the catalog's
    queries cannot dodge."""
    from pyspark.sql import functions as F

    def _run() -> int:
        row = (
            spark.range(0, CALIB_ROWS, 1, CALIB_PARTS)
            .select(
                (
                    (F.col("id") % F.lit(1_000_003)) * F.lit(2654435761)
                    % F.lit(1_000_003)
                ).alias("h")
            )
            .agg(F.sum("h").alias("s"))
            .collect()[0]
        )
        return row["s"]

    _run()  # warm: codegen compile + JIT
    walls = []
    for _ in range(passes):
        t0 = time.perf_counter()
        got = _run()
        walls.append(time.perf_counter() - t0)
        if got != CALIB_EXPECT_SUM:
            raise RuntimeError(
                f"calibration sum {got} != {CALIB_EXPECT_SUM} — JVM "
                "arithmetic is broken on this box; timings untrustworthy"
            )
    return round(statistics.median(walls), 3)


# Shuffle-tier calibration (round-15 closing): the pure-arithmetic
# workload above measures the CPU regime, but the r15 close anchor
# showed a host slowdown (44/147 catalog queries uniformly ~1.6x
# slower, shuffle-heavy family worst) with calib_s FLAT — contention in
# the IO/memory path is invisible to pure compute.  This second tier
# moves real shuffle bytes: same deterministic hash column, but hashed
# into 32 partitions and re-aggregated, so its wall tracks the
# exchange write+read path (~1.6 GB moved).  Recorded as telemetry
# (`calib_shuffle_s`) from r15; gating decisions wait for a round of
# live baseline data.
CALIB_SHUFFLE_ROWS = 200_000_000
CALIB_SHUFFLE_EXPECT_SUM = 100000202928013


def calibrate_shuffle(spark, passes: int = 3) -> float:
    """Median wall seconds for the fixed shuffle workload (one untimed
    warm pass first).  Value-asserted like :func:`calibrate`."""
    from pyspark.sql import functions as F

    def _run() -> int:
        h = (
            (F.col("id") % F.lit(1_000_003)) * F.lit(2654435761)
            % F.lit(1_000_003)
        ).alias("h")
        row = (
            spark.range(0, CALIB_SHUFFLE_ROWS, 1, CALIB_PARTS)
            .select(h)
            .repartition(CALIB_PARTS, "h")
            .groupBy((F.col("h") % F.lit(1024)).alias("b"))
            .agg(F.sum("h").alias("s"))
            .agg(F.sum("s").alias("total"))
            .collect()[0]
        )
        return row["total"]

    _run()
    walls = []
    for _ in range(passes):
        t0 = time.perf_counter()
        got = _run()
        walls.append(time.perf_counter() - t0)
        if got != CALIB_SHUFFLE_EXPECT_SUM:
            raise RuntimeError(
                f"shuffle calibration sum {got} != "
                f"{CALIB_SHUFFLE_EXPECT_SUM} — shuffle path is corrupting "
                "data on this box; timings untrustworthy"
            )
    return round(statistics.median(walls), 3)
