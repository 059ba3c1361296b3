#!/usr/bin/env python
"""Interleaved on/off A/B harness (r17, VERDICT item 1): time a family
of catalog queries with an env toggle flipped between INTERLEAVED
passes in ONE driver-style session, so both arms see the same host
regime — the adjudication tool for claims where an isolated A/B and
the driver's cold run disagreed (the r16 spread_scan LSH family).

Methodology matches bench.py (same session factory, warm tables, noop
sink, cache-clear + forced GC between timings OUTSIDE the timed
region).  Pass order is A B A B ... per query (A first), so slow host
drift taxes both arms equally; report the per-arm MIN.

Usage:
    python tools/ab_interleave.py --env SPARK_GRAFT_SPREAD_OFF \
        [--passes 4] query [query ...]

Arm "on"  = env var UNSET  (production behavior)
Arm "off" = env var set to "1"
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tweets_spark_top_10_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--env", required=True, help="toggle env var name")
    ap.add_argument("--passes", type=int, default=4, help="passes PER ARM")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ab-interleave",
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

    spark.range(10_000_000).groupBy((F.col("id") % 7).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()
    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, list[float]]] = {
        q: {"on": [], "off": []} for q in args.queries
    }
    for p in range(2 * args.passes):
        arm = "on" if p % 2 == 0 else "off"
        if arm == "off":
            os.environ[args.env] = "1"
        else:
            os.environ.pop(args.env, None)
        for name in args.queries:
            fn = QUERIES[name]
            spark.sparkContext.setJobDescription(f"ab:{name}:{arm}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            results[name][arm].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            spark.range(1).count()
    os.environ.pop(args.env, None)

    summary = {}
    for q, r in results.items():
        summary[q] = {
            "on_min": min(r["on"]),
            "off_min": min(r["off"]),
            "on": r["on"],
            "off": r["off"],
        }
        print(
            f"{q:32s}  on(min)={summary[q]['on_min']:7.3f}  "
            f"off(min)={summary[q]['off_min']:7.3f}",
            file=sys.stderr,
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
