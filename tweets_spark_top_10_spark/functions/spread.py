"""Scale-adaptive scan fan-out for expression-heavy pipelines.

The fixture parquet files are single-row-group, so every scan arrives
as ONE input split and Spark runs the whole pre-exchange expression
chain — tokenize, shingle explode, langid/quality scoring, signature
hashing — on a single core (measured at sf0.1: the training pipeline's
scoring stage spent 2.8 s in one task; spread across local[32] it runs
in ~0.3 s).  A production 100 TB corpus arrives as tens of thousands of
splits and has no such problem — which is exactly why the fan-out must
be CONDITIONAL, not a constant repartition baked into every plan:

- narrower than ``defaultParallelism``  -> one round-robin repartition
  (deterministic: Spark sorts before round-robin under
  ``spark.sql.execution.sortBeforeRepartition``, on by default);
- already at least that wide (every real cluster scan) -> NO-OP, no
  exchange added, predicate pushdown and scan pruning untouched.

The check reads the physical plan's partition count at query-construction
time (no job runs).  Streaming DataFrames pass through untouched —
micro-batch partitioning is the source's concern.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` up to ``defaultParallelism`` partitions iff
    its current plan is narrower; identity otherwise (see module doc).

    Apply at the START of an expression-heavy pipeline (before the
    tokenize/shingle/scoring projections), AFTER any selective filter
    (fewer rows shuffle; the filter itself still pushes down — Catalyst
    moves filters through Repartition in either case).

    ``SPARK_GRAFT_SPREAD_OFF=1`` forces the identity branch — the
    measurement knob for interleaved on/off A/Bs within one session
    (tools/ab_interleave.py); unset in production and in the bench."""
    if df.isStreaming:
        return df
    if os.environ.get("SPARK_GRAFT_SPREAD_OFF"):
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
