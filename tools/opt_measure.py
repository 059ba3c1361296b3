#!/usr/bin/env python
"""Optimization-round harness (r16, reused r17): isolate catalog
queries with the noop sink (guide §1.4), time min-of-N, and capture
``explain("formatted")`` to ``plans/<round>/<query>_<tag>.txt`` so plan
claims are judge-checkable.

Usage:
    python tools/opt_measure.py [--tag before|after] [--passes N]
        [--no-plans] [--round r17] query [query ...]

Methodology matches bench.py: same session factory ($SPARK_GRAFT_CPUS /
$SPARK_GRAFT_SF_DIR), warm tables first, clear tracked caches + force a
GC between queries OUTSIDE the timed region, report the min.
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
    ap.add_argument("--tag", default=None, help="plans/<round>/<q>_<tag>.txt")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--round", default="r17", help="plans subdirectory")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="opt-measure",
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

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.round,
    )
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, float] = {}
    for name in args.queries:
        fn = QUERIES[name]
        if args.tag and not args.no_plans:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
            spark.catalog.clearCache()
        best = None
        for _ in range(args.passes):
            spark.sparkContext.setJobDescription(f"opt:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            spark.range(1).count()
        out[name] = round(best, 3)
        print(f"{out[name]:8.3f}  {name}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
