"""Catalog-wide physical-plan audit.

Two invariants every query must satisfy (SURVEY.md §4 / the 100 TB
design rules):

1. No row-at-a-time Python UDFs anywhere (``BatchEvalPython``): Python
   is allowed only through Arrow surfaces (``ArrowEvalPython``,
   ``MapInPandas``, ``FlatMapGroupsInPandas``, UDTF).
2. No cartesian product, except queries that deliberately broadcast a
   tiny side (kNN query sets, IVF centroids) — those must plan as
   ``BroadcastNestedLoopJoin``/``CartesianProduct`` with the broadcast
   hint present, and are whitelisted here explicitly.
"""

from __future__ import annotations

import pytest

from tweets_spark_top_10_spark.queries import QUERIES

# Queries whose plan intentionally contains a (broadcast) nested-loop or
# cartesian join of a deliberately tiny side.
CROSS_JOIN_OK = {
    "knn_cosine_top5",  # 10 broadcast query vectors x candidates
    "ivf_knn_top5",  # broadcast centroid assignment (<=16 rows)
    "lsh_knn_top5",  # MinHashLSH approxSimilarityJoin internals
    "quantity_bucket_ranges",  # broadcast 5-row bucket dim, range predicate
    "doc_tfidf_top3",  # broadcast 1-row N (total doc count) into the scorer
    "simhash_invariants",  # final assembly of four 1-row invariant counts
    "lsh_knn_invariants",  # exact side: 10 broadcast query vectors x candidates
    "ivfpq_adc_top5",  # broadcast centroid assignment (<=16 rows), as ivf_knn_top5
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_invariants(name, spark, sf_dir):
    plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in plan\n{plan}"
    )
    if name not in CROSS_JOIN_OK:
        for op in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            assert op not in plan, f"{name}: unintended {op}\n{plan}"


def test_catalog_priority_tiers_are_valid():
    """Every name in the priority tiers must exist in the registry
    (the reorder silently skips unknown names — a typo would quietly
    demote a query out of the driver's row budget) and appear once."""
    from tweets_spark_top_10_spark.queries.catalog import (
        _FIXED_SINCE_R1,
        _NEVER_CHECKED,
    )

    tiers = _NEVER_CHECKED + _FIXED_SINCE_R1
    unknown = [n for n in tiers if n not in QUERIES]
    assert not unknown, f"priority tier names not in registry: {unknown}"
    assert len(tiers) == len(set(tiers)), "duplicate names across tiers"
    # and the reorder actually took effect: tier names occupy the prefix
    assert list(QUERIES)[: len(tiers)] == tiers
