"""End-to-end twin of the reference's batch lifecycle (App.java:35-134),
Spark-native: partitioned write → pruned hourly read → group-count →
top-10 → single-file headered CSV — plus the bucketed-join evidence for
the 100 TB co-located-join story.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from tweets_spark_top_10_spark.operators.topk import top_k
from tweets_spark_top_10_spark.sources.readers import read_hour_partition
from tweets_spark_top_10_spark.sources.registry import load_table
from tweets_spark_top_10_spark.sources.writers import write_csv_top_k, write_partitioned


def test_reference_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """Hour-partitioned table → prune one hour → count → top-10 → CSV,
    verified against a direct computation on the same hour."""
    events = load_table(spark, sf_dir, "events").withColumns(
        {
            "year": F.year("ts"),
            "month": F.month("ts"),
            "day": F.dayofmonth("ts"),
            "hour": F.hour("ts"),
        }
    )
    base = str(tmp_path / "events_hourly")
    write_partitioned(events, base, ["year", "month", "day", "hour"])

    # the hour the reference would process (pick one that exists)
    y, mo, d, h = (
        events.select("year", "month", "day", "hour").distinct().orderBy(
            "year", "month", "day", "hour"
        ).collect()[5]
    )
    hour_df = read_hour_partition(spark, base, y, mo, d, h)
    counts = hour_df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    top = top_k(counts, [F.desc("n"), F.asc("event_type")], k=10).select(
        "event_type", "n"
    )
    out = str(tmp_path / f"top10-{y}-{mo}-{d}-{h}")
    write_csv_top_k(top, out, k=10)

    csv_file = glob.glob(f"{out}/part-*.csv")[0]
    lines = open(csv_file).read().strip().splitlines()
    assert lines[0] == "event_type,n"

    expected = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.year("ts") == y)
            & (F.month("ts") == mo)
            & (F.dayofmonth("ts") == d)
            & (F.hour("ts") == h)
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("event_type"))
        .collect()
    )
    got = [tuple(line.split(",")) for line in lines[1:]]
    want = [(r.event_type, str(r.n)) for r in expected[:10]]
    assert got == want


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key into the same bucket count
    sort-merge-join with NO shuffle exchange — the co-located-join
    strategy for repeated large-large joins at scale."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    for name, df, key in (
        ("b_orders", orders, "o_custkey"),
        ("b_customer", cust, "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    try:
        # force the large-large join shape this test is about (small
        # fixtures would otherwise broadcast)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("b_orders")
            .join(
                spark.table("b_customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_mktsegment")
            .agg(F.sum("o_totalprice").alias("rev"))
        )
        assert joined.count() > 0  # finalize the AQE plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        # no shuffle below the join: bucket layout co-locates both sides
        join_part = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange hashpartitioning" not in join_part, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
