"""Bucket-count growth probe (round-13 verdict item 7).

The catalog's bucketed-layout family runs at n_buckets=8 (right for
local[4] fixtures) and claims "~4096 at 100 TB"; this probe checks the
two invariants that must survive task-granularity growth — ONE file
per bucket after ``write_bucketed`` and ZERO join-side Exchange in the
co-located SMJ — at 64 and 256 buckets over a 10x-replicated
orders x customer corpus, recording build cost (the bucketed write)
next to serve cost (the join+rollup), the prebuilt-ANN build/serve
split applied to layout.

Usage: python tools/bucket_count_probe.py [replicas] [bucket counts]
       (defaults: 10 8,64,256)
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_corpus(work: str, replicas: int) -> str:
    """orders x customer replicated content-disjointly (shifted keys —
    new customers placing new orders, the scale_probe_100x discipline)."""
    import duckdb

    out = os.path.join(work, f"x{replicas}")
    os.makedirs(out)
    mc = f"(SELECT MAX(c_custkey)+1 FROM read_parquet('{BASE}/customer.parquet'))"
    mo = f"(SELECT MAX(o_orderkey)+1 FROM read_parquet('{BASE}/orders.parquet'))"
    duckdb.sql(f"""
      COPY (
        SELECT * REPLACE (c_custkey + r.k * {mc} AS c_custkey)
        FROM read_parquet('{BASE}/customer.parquet'),
             (SELECT UNNEST(RANGE({replicas})) AS k) r
      ) TO '{out}/customer.parquet' (FORMAT PARQUET)
    """)
    duckdb.sql(f"""
      COPY (
        SELECT * REPLACE (o_orderkey + r.k * {mo} AS o_orderkey,
                          o_custkey + r.k * {mc} AS o_custkey)
        FROM read_parquet('{BASE}/orders.parquet'),
             (SELECT UNNEST(RANGE({replicas})) AS k) r
      ) TO '{out}/orders.parquet' (FORMAT PARQUET)
    """)
    return out


def one_file_per_bucket(path: str, n_buckets: int) -> bool:
    files = glob.glob(f"{path}/part-*")
    ids = [m.group(1) for f in files if (m := re.search(r"_(\d{5})\.", f))]
    return 0 < len(files) <= n_buckets and len(ids) == len(set(ids))


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    counts = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [8, 64, 256]
    )
    from pyspark.sql import functions as F

    from tweets_spark_top_10_spark.session import get_spark
    from tweets_spark_top_10_spark.sources.writers import write_bucketed

    work = tempfile.mkdtemp(prefix="bucket_probe_")
    t0 = time.perf_counter()
    corpus = build_corpus(work, replicas)
    print(f"# corpus built in {time.perf_counter() - t0:.1f}s", flush=True)

    spark = get_spark(
        app_name="bucket-count-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "16g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    orders = spark.read.parquet(f"{corpus}/orders.parquet")
    cust = spark.read.parquet(f"{corpus}/customer.parquet")
    n_orders, n_cust = orders.count(), cust.count()
    print(f"# 10x corpus: {n_orders} orders, {n_cust} customers", flush=True)

    out = []
    for nb in counts:
        to, tc = f"probe_ord_{nb}", f"probe_cust_{nb}"
        po, pc = os.path.join(work, to), os.path.join(work, tc)
        for t in (to, tc):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        t0 = time.perf_counter()
        write_bucketed(
            orders, table_name=to, path=po,
            bucket_cols=["o_custkey"], num_buckets=nb, sort_cols=["o_custkey"],
        )
        write_bucketed(
            cust, table_name=tc, path=pc,
            bucket_cols=["c_custkey"], num_buckets=nb, sort_cols=["c_custkey"],
        )
        build_s = round(time.perf_counter() - t0, 2)
        files_ok = one_file_per_bucket(po, nb) and one_file_per_bucket(pc, nb)

        o, c = spark.table(to), spark.table(tc)
        j = (
            o.hint("merge")
            .join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 4).alias("total_revenue"),
            )
        )
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            j.write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        plan = (
            j._jdf.queryExecution().executedPlan().toString().split(
                "+- == Initial Plan =="
            )[0]
        )
        rec = {
            "n_buckets": nb,
            "build_s": build_s,
            "serve_s": round(best, 2),
            "one_file_per_bucket": files_ok,
            "exchanges": plan.count("Exchange"),
            "join_side_exchange": "hashpartitioning(o_custkey" in plan
            or "hashpartitioning(c_custkey" in plan,
            "sorts": len(re.findall(r"\bSort \[", plan)),
        }
        out.append(rec)
        print(f"# n_buckets={nb}: {rec}", flush=True)
        for t in (to, tc):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
