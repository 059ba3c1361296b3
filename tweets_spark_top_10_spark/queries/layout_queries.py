"""Storage-layout queries: co-located (bucketed) execution.

The reference reads raw hour-partitioned Avro and never joins
(``App.java:66-94`` — one table, one aggregation), so its layout story
ends at directory partitioning. This engine's extended surface runs
repeated fact-fact joins, and at 100 TB the dominant recurring cost of
``orders JOIN customer ON custkey`` is the two-sided shuffle — unless
both tables were BUCKETED on the key at write time, in which case the
sort-merge join runs with zero Exchange and (under the one-file-per-
bucket contract of ``sources/writers.write_bucketed``) zero Sort.

``bucketed_segment_revenue`` is that capability as a catalog entry:
it materializes bucketed copies of ``orders`` and ``customer`` into a
per-user fingerprinted cache (build once per corpus, serve from the
catalog thereafter — the same build/serve split as the prebuilt ANN
indexes), then runs the join+rollup through the bucketed tables. The
oracle is the plain SQL join — layout must never change results, only
the plan. ``tests/test_bucketed.py`` pins the plan half: zero join
Exchange both-sides-bucketed, one Exchange one-side-bucketed, zero
Exchange for a groupBy on the bucket key, and the one-file-per-bucket
invariant that lets the scan report its sort order.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tweets_spark_top_10_spark.queries.registry import register
from tweets_spark_top_10_spark.sources.cache import fingerprint_paths, user_cache_dir
from tweets_spark_top_10_spark.sources.registry import load_table
from tweets_spark_top_10_spark.sources.writers import write_bucketed

# Fixed per subject area (see write_bucketed's scale note): every table
# bucketed for the custkey join family uses the SAME count, because
# co-location requires equal bucket counts on both sides. 8 spreads the
# local[4] test fixtures across >1 task per core; at 100 TB the same
# code path runs with ~4096.
_N_BUCKETS = 8


def bucketed_table(
    spark: SparkSession, sf_dir: str, table: str, key: str, n_buckets: int = _N_BUCKETS
) -> str:
    """Register-or-build the bucketed copy of one fixture table; return
    its catalog name.

    Cache key = corpus fingerprint (size+mtime of the source parquet),
    so a regenerated corpus gets a fresh build instead of stale
    buckets. Within one session the catalog entry short-circuits the
    filesystem check; a fresh session finding published files
    re-registers them with ``CREATE TABLE ... CLUSTERED BY ...
    LOCATION`` — no rewrite (build once, register anywhere: the
    bucketed analogue of the prebuilt-index build/serve split).

    Publication follows the ``_publish_index_kind`` discipline from
    the prebuilt-ANN cache: build under a pid-unique STAGING dir, then
    promote with ONE atomic ``os.rename`` — ``rename`` refuses to
    replace a non-empty dir, so concurrent builders race benignly
    (exactly one wins; losers discard their staging copy and register
    the winner's files). A reader can never observe a half-written
    table: the final path either doesn't exist or is complete.
    """
    import os
    import shutil
    import time

    src = Path(sf_dir) / f"{table}.parquet"
    fp = fingerprint_paths(src)
    name = f"sg_bkt_{table}_{n_buckets}_{fp}"
    if spark.catalog.tableExists(name):
        return name
    root = user_cache_dir("spark_graft_bucketed")
    final = root / name
    df = load_table(spark, sf_dir, table)
    if not (final / "_SUCCESS").exists():
        # crashed builders leave staging dirs behind; an hour-old one
        # is certainly dead (builds take seconds), never a live build.
        # Match ANY fingerprint for this (table, bucket-count) family —
        # a builder that crashed on a since-superseded corpus leaves a
        # staging dir whose name embeds the OLD fingerprint, which a
        # current-name-only glob would never reclaim (round-13 review)
        for stale in root.glob(f"__stage_*_sg_bkt_{table}_{n_buckets}_*"):
            if time.time() - stale.stat().st_mtime > 3600:
                shutil.rmtree(stale, ignore_errors=True)
        staging = root / f"__stage_{os.getpid()}_{name}"
        stage_tbl = f"{name}__stage_{os.getpid()}"
        spark.sql(f"DROP TABLE IF EXISTS {stage_tbl}")
        write_bucketed(
            df,
            table_name=stage_tbl,
            path=str(staging),
            bucket_cols=[key],
            num_buckets=n_buckets,
            sort_cols=[key],
        )
        spark.sql(f"DROP TABLE {stage_tbl}")  # external: files stay
        try:
            os.rename(staging, final)
        except OSError:
            # benign ONLY if a concurrent builder already published a
            # complete copy; any other rename failure (EACCES, EXDEV,
            # transient I/O) must not fall through to registering an
            # empty LOCATION as a zero-row table
            if not (final / "_SUCCESS").exists():
                raise
            shutil.rmtree(staging, ignore_errors=True)
        _prune_stale(root, f"sg_bkt_{table}_{n_buckets}_", keep=_KEEP, protect={name})
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    spark.sql(
        f"CREATE TABLE {name} ({ddl}) USING PARQUET "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {n_buckets} BUCKETS "
        f"LOCATION '{final}'"
    )
    return name


# Retention per (table, bucket-count) family: the standing sf fixtures
# need 3 entries; probe/test corpora mint throwaway fingerprints that
# would otherwise accumulate ~200 MB per probe run. 6 = the standing
# set plus headroom.
_KEEP = 6


def _prune_stale(root: Path, prefix: str, keep: int, protect: set[str]) -> list[str]:
    """Evict the oldest-by-mtime cache dirs under ``root`` matching
    ``prefix`` beyond the newest ``keep``; never the ``protect``\\ ed
    (just-built) ones.  Runs only at build time — a pruned entry was by
    definition not the one this session just registered, and the next
    session that needs it rebuilds from source (the cache is a pure
    rebuildable derivative; losing an entry costs one write, never
    correctness).  Returns the evicted names (for the unit test)."""
    import shutil

    entries = sorted(
        (p for p in root.iterdir() if p.is_dir() and p.name.startswith(prefix)),
        key=lambda p: p.stat().st_mtime,
        reverse=True,
    )
    evicted = []
    for p in entries[keep:]:
        if p.name in protect:
            continue
        shutil.rmtree(p, ignore_errors=True)
        evicted.append(p.name)
    return evicted


@register(
    "bucketed_segment_revenue",
    oracle="""
    SELECT
      c.c_mktsegment,
      COUNT(*) AS n_orders,
      ROUND(SUM(o.o_totalprice), 4) AS total_revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def bucketed_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rollup by market segment through BUCKETED orders x
    customer — the co-located join the reference's layout story lacks.

    Both sides are bucketed on custkey with equal counts, so the join
    is a zero-Exchange, zero-Sort sort-merge (plan-asserted in
    ``tests/test_bucketed.py``); the only shuffle left in the query is
    the 5-group mktsegment re-aggregate, which is map-side combined
    down to |segments| x |tasks| rows. The ``merge`` hint pins SMJ so
    the assertion is deterministic at fixture scale, where customer
    would otherwise broadcast — at 100 TB (both sides huge) SMJ is
    what AQE picks anyway, and co-location is the difference between
    that join shuffling 100 TB or nothing.

    The legacy ``outputOrdering`` conf is set SESSION-WIDE and left
    set (the returned DataFrame is lazy — restoring the conf before
    execution would undo the Sort elimination it exists for). That is
    safe, not just convenient: Spark consults it only for bucketed
    scans, and only claims the written sort order when a bucket is a
    single file (multi-file buckets still get their Sort node), so it
    can change plans solely by REMOVING provably-redundant Sorts —
    never results, never exchange counts (what ``plan_shapes.json``
    pins). See ``write_bucketed`` for the one-file contract.
    """
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    orders = spark.table(bucketed_table(spark, sf_dir, "orders", "o_custkey"))
    cust = spark.table(bucketed_table(spark, sf_dir, "customer", "c_custkey"))
    return (
        orders.hint("merge")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_revenue"),
        )
    )
