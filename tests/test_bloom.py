"""Bloom-filter semi-join reduction (``functions/bloom.py``).

The catalog query ``bloom_semi_revenue`` proves end-to-end exactness
under the oracle; these tests pin the filter's own contract: zero
false negatives (the exactness precondition), a sane false-positive
rate, and real pre-shuffle row reduction on the TPC-H tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tweets_spark_top_10_spark.functions.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_prefilter,
)
from tweets_spark_top_10_spark.sources.registry import load_table


def test_no_false_negatives(spark):
    keys = spark.range(0, 2000).select((F.col("id") * 7 + 3).alias("k"))
    words = bloom_build(keys, "k")
    hits = keys.where(bloom_might_contain(F.col("k"), words)).count()
    assert hits == 2000, "a member key failed the membership test"


def test_false_positive_rate_bounded(spark):
    members = spark.range(0, 1500).select((F.col("id") * 2).alias("k"))
    words = bloom_build(members, "k")
    # disjoint probe set: odd numbers
    probes = spark.range(0, 20000).select((F.col("id") * 2 + 1).alias("k"))
    fp = probes.where(bloom_might_contain(F.col("k"), words)).count()
    # theoretical FPR at n=1500, m=2^16, k=5 is ~2e-5; allow 100x margin
    assert fp <= 40, f"false-positive rate too high: {fp}/20000"


def test_prefilter_superset_and_selective(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "AUTOMOBILE"
    )
    orders = load_table(spark, sf_dir, "orders")
    dim = cust.select("c_custkey")
    filtered = bloom_prefilter(orders, "o_custkey", dim, "c_custkey")
    true_semi = orders.join(
        dim, orders.o_custkey == F.col("c_custkey"), "left_semi"
    )
    n_all, n_filtered, n_true = orders.count(), filtered.count(), true_semi.count()
    # superset of the exact semi-join (no false negatives) ...
    assert filtered.join(
        dim, filtered.o_custkey == F.col("c_custkey"), "left_anti"
    ).count() == n_filtered - n_true
    assert n_filtered >= n_true
    # ... that still drops the bulk of non-matching fact rows pre-shuffle
    assert n_filtered <= n_true + max(10, int(0.01 * n_all)), (
        f"bloom not selective: {n_filtered} kept of {n_all}, true {n_true}"
    )


def test_build_rejects_bad_width(spark):
    import pytest

    keys = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        bloom_build(keys, "k", m_bits=100)
