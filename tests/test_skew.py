"""AQE skew handling: a deliberately hot join key must be split by
adaptive skew-join optimization (the runtime half of the engine's skew
story; the compile-time half is the salted aggregation in
``salted_token_count_top20``)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        # force a sort-merge join (broadcast would hide the skew)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # shrink AQE's skew thresholds so local-scale data triggers the
        # same split a 100x partition would at the defaults
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # keep AQE from first coalescing the skew away
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        # apply the split even where it adds a downstream shuffle
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 200k rows, 90% on key 0 → one partition ~25x the median
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
        dim = spark.range(200_000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
        )
        joined = fact.join(dim, "k").select("k", "v", "grp")
        # collect() finalizes THIS DataFrame's adaptive plan (count()
        # would execute a different QueryExecution)
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "SortMergeJoin(skew=true)" in plan, (
            f"AQE did not split the skewed join:\n{plan}"
        )
        assert "AQEShuffleRead skewed" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
