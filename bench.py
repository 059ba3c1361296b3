#!/usr/bin/env python
"""Benchmark harness: run the catalog's headline queries and print ONE
JSON line ``{"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}``.

Inputs:   $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
Parallel: local[$SPARK_GRAFT_CPUS] (default 32)

Materialization is a noop-format write — full execution on executors,
zero driver collect, so timings measure the plan, not py4j transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tweets_spark_top_10_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = get_spark(
        app_name=f"bench-sf{sf}",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from tweets_spark_top_10_spark.queries import QUERIES
    from tweets_spark_top_10_spark.sources.registry import TABLES, load_table

    # Warm up JVM/codegen/shuffle machinery and the page cache so the
    # first timed query doesn't absorb session startup.
    spark.range(10_000_000).groupBy((F.col("id") % 7).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()
    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        start = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - start, 3)
        except Exception as exc:  # keep the bench line parseable on failure
            timings[name] = -1.0
            print(f"# bench failure {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
