"""Bucketed (co-located) storage layout: the write-side contract of
``sources/writers.write_bucketed`` and the plans it buys.

What 100 TB cares about, pinned at fixture scale:

- both-sides-bucketed join: ZERO Exchange on either join input and
  ZERO Sort (the scan reports hash partitioning AND the written sort
  order) — the recurring fact-fact shuffle eliminated at write time;
- one-side-bucketed join: exactly ONE Exchange (the unbucketed side) —
  co-location degrades gracefully, it never penalizes;
- groupBy on the bucket key: ZERO Exchange;
- one file per bucket — load-bearing for the Sort elimination (Spark
  only trusts a written sort order when a bucket is a single file);
- layout never changes results: the catalog query matches its plain
  SQL oracle.
"""

from __future__ import annotations

import glob
import re

from pyspark.sql import functions as F

from tests.oracle_harness import compare, duckdb_con
from tweets_spark_top_10_spark.queries import ORACLE, QUERIES
from tweets_spark_top_10_spark.queries.layout_queries import bucketed_table
from tweets_spark_top_10_spark.sources.registry import load_table
from tweets_spark_top_10_spark.sources.writers import write_bucketed


def _final_plan(df) -> str:
    """Executed (post-AQE) physical plan, final section only — the
    Initial Plan section repeats every node and would double-count."""
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("+- == Initial Plan ==")[0]


def _sorted_scan(spark):
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")


def test_write_bucketed_one_file_per_bucket(spark, sf_dir, tmp_path):
    spark.sql("DROP TABLE IF EXISTS t_bkt_contract")
    write_bucketed(
        load_table(spark, sf_dir, "orders"),
        table_name="t_bkt_contract",
        path=str(tmp_path / "orders_bkt"),
        bucket_cols=["o_custkey"],
        num_buckets=8,
        sort_cols=["o_custkey"],
    )
    files = glob.glob(str(tmp_path / "orders_bkt" / "part-*"))
    assert len(files) == 8, files
    # round-trip preserves the rows
    n_src = load_table(spark, sf_dir, "orders").count()
    assert spark.table("t_bkt_contract").count() == n_src
    spark.sql("DROP TABLE IF EXISTS t_bkt_contract")


def test_bucketed_join_zero_exchange_zero_sort(spark, sf_dir):
    _sorted_scan(spark)
    orders = spark.table(bucketed_table(spark, sf_dir, "orders", "o_custkey"))
    cust = spark.table(bucketed_table(spark, sf_dir, "customer", "c_custkey"))
    j = orders.hint("merge").join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_mktsegment"
    )
    plan = _final_plan(j)
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Exchange") == 0, plan
    assert not re.findall(r"\bSort \[", plan), plan
    assert plan.count("Bucketed: true") == 2, plan


def test_one_side_bucketed_single_exchange(spark, sf_dir):
    _sorted_scan(spark)
    orders = spark.table(bucketed_table(spark, sf_dir, "orders", "o_custkey"))
    cust = load_table(spark, sf_dir, "customer")
    j = orders.hint("merge").join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_mktsegment"
    )
    plan = _final_plan(j)
    assert "SortMergeJoin" in plan, plan
    # the unbucketed customer side shuffles (and sorts); orders does neither
    assert plan.count("Exchange") == 1, plan
    assert len(re.findall(r"\bSort \[c_custkey", plan)) == 1, plan
    assert not re.findall(r"\bSort \[o_custkey", plan), plan


def test_groupby_bucket_key_zero_exchange(spark, sf_dir):
    _sorted_scan(spark)
    orders = spark.table(bucketed_table(spark, sf_dir, "orders", "o_custkey"))
    g = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
    plan = _final_plan(g)
    assert plan.count("Exchange") == 0, plan


def test_bucketed_layout_never_changes_results(spark, sf_dir):
    con = duckdb_con(sf_dir)
    df = QUERIES["bucketed_segment_revenue"](spark, sf_dir)
    res = compare(df, con, ORACLE["bucketed_segment_revenue"])
    assert res.ok, res.detail


def test_user_cache_dir_tightens_permissive_mode(tmp_path, monkeypatch):
    import os

    from tweets_spark_top_10_spark.sources.cache import user_cache_dir

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    loose = tmp_path / "ns_loose"
    loose.mkdir(mode=0o755)
    got = user_cache_dir("ns_loose")
    assert got == loose
    assert os.stat(got).st_mode & 0o077 == 0


def test_fingerprint_tracks_source_mutation(tmp_path):
    import os

    from tweets_spark_top_10_spark.sources.cache import fingerprint_paths

    f = tmp_path / "x.parquet"
    f.write_bytes(b"abc")
    fp1 = fingerprint_paths(f)
    os.utime(f, ns=(1, 1))
    fp2 = fingerprint_paths(f)
    assert fp1 != fp2
    assert fingerprint_paths(f) == fp2  # deterministic
    assert fingerprint_paths(tmp_path / "nope") != fp2  # missing is distinct


def test_prune_stale_keeps_newest_and_protected(tmp_path):
    import os

    from tweets_spark_top_10_spark.queries.layout_queries import _prune_stale

    for i in range(9):
        d = tmp_path / f"sg_bkt_orders_8_fp{i}"
        d.mkdir()
        os.utime(d, ns=(i * 10**9, i * 10**9))  # fp0 oldest ... fp8 newest
    (tmp_path / "sg_bkt_customer_8_other").mkdir()  # different family
    evicted = _prune_stale(
        tmp_path, "sg_bkt_orders_8_", keep=6, protect={"sg_bkt_orders_8_fp0"}
    )
    # 9 entries, keep newest 6 -> fp0/fp1/fp2 are candidates; fp0 protected
    assert sorted(evicted) == ["sg_bkt_orders_8_fp1", "sg_bkt_orders_8_fp2"]
    left = {p.name for p in tmp_path.iterdir()}
    assert "sg_bkt_orders_8_fp0" in left and "sg_bkt_customer_8_other" in left
    assert "sg_bkt_orders_8_fp1" not in left


def test_stale_staging_swept_across_fingerprints(spark, sf_dir, tmp_path, monkeypatch):
    """A builder that crashed on a SUPERSEDED corpus leaves a staging
    dir whose name embeds the old fingerprint; the sweep must reclaim
    hour-old dirs for the whole (table, bucket-count) family, not just
    the current name (round-13 review). Young dirs stay — they may be
    live concurrent builds."""
    import os
    import time

    import tweets_spark_top_10_spark.queries.layout_queries as lq
    from tweets_spark_top_10_spark.sources.cache import (
        fingerprint_paths,
        user_cache_dir,
    )

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    root = user_cache_dir("spark_graft_bucketed")
    dead = root / "__stage_999_sg_bkt_orders_8_deadbeefdeadbeef"
    dead.mkdir(parents=True)
    old = time.time() - 7200
    os.utime(dead, (old, old))
    young = root / "__stage_998_sg_bkt_orders_8_cafef00dcafef00d"
    young.mkdir()

    from pathlib import Path

    src = Path(sf_dir) / "orders.parquet"
    name = f"sg_bkt_orders_8_{fingerprint_paths(src)}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")  # force the build path
    try:
        lq.bucketed_table(spark, sf_dir, "orders", "o_custkey")
        assert not dead.exists()  # superseded fingerprint, hour-old: reclaimed
        assert young.exists()  # young: possibly live, untouched
    finally:
        # the catalog entry points into tmp_path; drop it so later tests
        # re-register against the real cache root
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_reuse_registers_published_files_without_rewrite(spark, sf_dir, monkeypatch):
    """A fresh session (simulated by dropping the catalog entry) must
    re-register the published files via DDL, never rebuild: build once,
    register anywhere."""
    import os

    import tweets_spark_top_10_spark.queries.layout_queries as lq
    from tweets_spark_top_10_spark.sources.cache import (
        fingerprint_paths,
        user_cache_dir,
    )

    name = bucketed_table(spark, sf_dir, "orders", "o_custkey")
    final = user_cache_dir("spark_graft_bucketed") / name
    before = os.stat(final / "_SUCCESS").st_mtime_ns
    spark.sql(f"DROP TABLE {name}")  # external: files survive

    def boom(*a, **k):
        raise AssertionError("rebuild attempted despite published files")

    monkeypatch.setattr(lq, "write_bucketed", boom)
    name2 = bucketed_table(spark, sf_dir, "orders", "o_custkey")
    assert name2 == name
    assert os.stat(final / "_SUCCESS").st_mtime_ns == before
    # and the re-registered table still carries the bucket spec
    g = spark.table(name).groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    g.collect()
    plan = g._jdf.queryExecution().executedPlan().toString().split(
        "+- == Initial Plan =="
    )[0]
    assert plan.count("Exchange") == 0, plan
