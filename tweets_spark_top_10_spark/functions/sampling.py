"""Deterministic sampling for training-data pipelines.

[EXT] surface (SURVEY.md §2.2).  ``DataFrame.sample``/``sampleBy`` are
seed-dependent AND partitioning-dependent — re-running on a repartitioned
table yields a different sample, which is unacceptable for held-out
splits and ablation corpora.  Everything here derives the keep/drop
decision from a content hash of the row key, so the sample is a pure
function of the data: reproducible across engines, runs, partitionings,
and cluster sizes, and the predicate pushes down to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, n_buckets: int = 10_000) -> Column:
    """Uniform bucket in [0, n_buckets) from md5 of the key.

    md5 (not ``xxhash64``) so any engine can replay the assignment —
    the first 8 hex chars give 32 uniform bits, far more than any
    realistic bucket count needs."""
    col = F.col(key) if isinstance(key, str) else key
    h = F.substring(F.md5(col.cast("string")), 1, 8)
    return (F.conv(h, 16, 10).cast("long") % n_buckets).cast("long")


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    n_buckets: int = 10_000,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its key's
    hash bucket falls under its stratum's rate.

    The training-data use case is rebalancing (e.g. downsample the
    dominant language, keep all of a low-resource one).  The rate map
    is a literal CASE expression — no join, no shuffle, scan-predicate
    only; strata absent from ``rates`` get ``default_rate``.
    """
    bucket = hash_bucket(key_col, n_buckets)
    rate: Column = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, float(r)).otherwise(rate)
    return df.filter(bucket < rate * n_buckets)


def weighted_hash_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "ws",
) -> DataFrame:
    """Weighted sample WITHOUT replacement of ``k`` rows, deterministic.

    Efraimidis–Spirakis A-Res: each row draws u in (0,1] and scores
    ``ln(u) / w``; the k LARGEST scores are the sample, which realizes
    exactly the "probability proportional to weight, without
    replacement" draw.  The randomness is the content hash of the key
    (md5, like everything in this module), so the sample is a pure
    function of (data, salt): reproducible across engines, runs and
    partitionings, and replayable in SQL for the oracle gate.

    Scale shape: scoring is a scan-side projection; selection is a
    global top-k (``TakeOrderedAndProject`` — per-partition heaps, one
    k-row merge at the driver), never a full sort.  Rows with
    non-positive or NULL weight are excluded (zero-weight rows must
    never appear; the score formula would put them first otherwise).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    hx = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt))), 1, 6
    )
    hv = F.conv(hx, 16, 10).cast("double")
    u = (hv + F.lit(1.0)) / F.lit(float(16**6))
    score = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__ws", score)
        .orderBy(F.desc("__ws"), F.col(key_col))
        .limit(k)
        .drop("__ws")
    )
