"""Cache hygiene: persisted intermediates are released between queries.

Round-2 advice: several operators persist multiply-referenced
intermediates (shingle tables, sketch signatures, PQ residuals); the
bench clears the session cache between queries, but the correctness
driver runs ~80 catalog queries in one session and would accumulate
cached blocks.  ``persist_tracked``/``release_persisted`` plus the
release-at-query-start hook in ``queries/registry.register`` bound the
working set to one query; these tests pin that behavior.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tweets_spark_top_10_spark.functions.cachectl import (
    persist_tracked,
    release_persisted,
)
from tweets_spark_top_10_spark.queries.catalog import QUERIES


def _tracked_cached_rdd_count(spark) -> int:
    # getPersistentRDDs also shows localCheckpoint blocks (lineage
    # anchors freed by the ContextCleaner, deliberately untracked) —
    # count only blocks with a storage level a .persist() sets AND that
    # are actually cached DataFrames via the catalog's cache manager.
    jsc = spark.sparkContext._jsc.sc()
    return jsc.getRDDStorageInfo().__len__()


def _tracked_cached_rdd_ids(spark) -> set:
    jsc = spark.sparkContext._jsc.sc()
    return {info.id() for info in jsc.getRDDStorageInfo()}


def test_release_unpersists_tracked(spark, sf_dir):
    df = persist_tracked(
        spark.range(1000).withColumn("x", F.col("id") * 2)
    )
    df.count()
    assert df.storageLevel.useMemory
    n = release_persisted(spark)
    assert n == 1
    assert not df.storageLevel.useMemory
    # Released handles are recomputable — a held DataFrame stays usable.
    assert df.count() == 1000


def test_release_is_per_session_and_idempotent(spark):
    persist_tracked(spark.range(10)).count()
    assert release_persisted(spark) == 1
    assert release_persisted(spark) == 0


def test_query_start_releases_previous_querys_persists(spark, sf_dir):
    """Running cache-heavy catalog queries back-to-back accumulates no
    net persisted blocks: each query's build releases the previous
    query's tracked intermediates."""
    heavy = ["ngram_jaccard_dup_pairs", "minhash_lsh_candidates"]
    for name in heavy:
        QUERIES[name](spark, sf_dir).count()
    # The LAST query's persists are still legitimately alive; one more
    # release must free everything the sweep tracked.
    released = release_persisted(spark)
    assert released > 0
    # After release, no tracked blocks remain cached for this session
    # (localCheckpoint anchors are not created by these two queries).
    assert release_persisted(spark) == 0


def test_catalog_sweep_leaves_no_net_cached_blocks(spark, sf_dir):
    """A mini catalog sweep + final release adds zero NET cached RDD
    blocks (the swept queries carry no localCheckpoint anchors, so any
    growth would be a leaked persist).  Asserted by RDD-ID set, not
    count: any block id born DURING the sweep must be gone after it —
    a count comparison could hide one new leak behind a concurrent
    ContextCleaner free of an earlier test's localCheckpoint anchor
    (round-13 review finding); pre-existing anchors (pinned by the
    module docstring as deliberately untracked) remain allowed."""
    import gc

    gc.collect()  # drop py-side refs so lingering anchors can clean
    spark.catalog.clearCache()
    before = _tracked_cached_rdd_ids(spark)
    for name in ["simhash_invariants", "ngram_jaccard_dup_pairs", "doc_tfidf_top3"]:
        QUERIES[name](spark, sf_dir).count()
    release_persisted(spark)
    leaked = _tracked_cached_rdd_ids(spark) - before
    assert not leaked, f"persists leaked by the sweep: rdd ids {sorted(leaked)}"
