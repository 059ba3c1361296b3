#!/usr/bin/env python
"""Round-16: per-query job-count profile.

For each named catalog query: one warm pass, then a timed pass that
reports wall seconds, number of Spark jobs, sum of job durations, and
the scheduling/planning gap (wall - sum_dur estimate via job windows).
High njobs with tiny mean duration = sequential-stage-overhead bound
(the r16 finding); high sum_dur with few jobs = genuinely compute bound.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tweets_spark_top_10_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="job-profile",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from tweets_spark_top_10_spark.queries import QUERIES
    from tweets_spark_top_10_spark.sources.registry import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    store = sc._jsc.sc().statusStore()
    out = {}
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        sc._jvm.System.gc()
        spark.range(1).count()
        n0 = store.jobsList(None).size()
        sc.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        jl = store.jobsList(None)
        rows = []
        for i in range(jl.size() - n0):
            j = jl.apply(i)
            st = j.submissionTime().get().getTime()
            ct = j.completionTime().get().getTime()
            rows.append((st, ct, (ct - st) / 1000.0))
        rows.sort()
        gap = 0.0
        prev = None
        for st, ct, dur in rows:
            if prev is not None and st > prev:
                gap += (st - prev) / 1000.0
            prev = ct if prev is None else max(prev, ct)
        sum_dur = sum(r[2] for r in rows)
        out[name] = {
            "wall": round(wall, 3),
            "njobs": len(rows),
            "sum_dur": round(sum_dur, 3),
            "gaps": round(gap, 3),
        }
        print(
            f"{name:32s} wall {wall:7.3f}  njobs {len(rows):3d}  "
            f"sum_dur {sum_dur:7.3f}  gaps {gap:6.3f}",
            file=sys.stderr,
        )
        spark.catalog.clearCache()
        sc._jvm.System.gc()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
