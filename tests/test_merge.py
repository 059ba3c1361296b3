"""Batch CDC apply (``operators/merge.py``) edge semantics.

The catalog query ``orders_cdc_merge`` oracle-gates the end-to-end
plan; these pin the contract corners: last-writer-wins ordering,
equal-seq tie-break, upsert-on-existing-key, and schema validation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from tweets_spark_top_10_spark.operators.merge import apply_changes


def _base(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )


def test_latest_change_wins_and_delete_removes(spark):
    changes = spark.createDataFrame(
        [
            (1, "a1", "U", 1),
            (1, "a2", "U", 2),  # newer update wins
            (2, "bX", "U", 1),
            (2, "b_dead", "D", 2),  # delete supersedes the update
            (9, "new", "I", 1),  # insert of an unseen key
        ],
        "k int, v string, op string, seq int",
    )
    got = {r["k"]: r["v"] for r in apply_changes(_base(spark), changes, "k").collect()}
    assert got == {1: "a2", 3: "c", 9: "new"}


def test_equal_seq_tie_breaks_deterministically(spark):
    # same key, same seq: 'U' sorts after 'D' descending -> U wins
    changes = spark.createDataFrame(
        [(1, "dead", "D", 5), (1, "alive", "U", 5)],
        "k int, v string, op string, seq int",
    )
    got = {r["k"]: r["v"] for r in apply_changes(_base(spark), changes, "k").collect()}
    assert got[1] == "alive"


def test_insert_on_existing_key_upserts(spark):
    changes = spark.createDataFrame(
        [(2, "b_v2", "I", 1)], "k int, v string, op string, seq int"
    )
    got = {r["k"]: r["v"] for r in apply_changes(_base(spark), changes, "k").collect()}
    assert got == {1: "a", 2: "b_v2", 3: "c"}


def test_missing_columns_fail_loud(spark):
    changes = spark.createDataFrame([(1, "U", 1)], "k int, op string, seq int")
    with pytest.raises(ValueError, match="missing columns"):
        apply_changes(_base(spark), changes, "k")


def test_snapshot_diff_inverts_apply(spark):
    """apply_changes(old, snapshot_diff(old, new) + seq) == new, and a
    no-churn diff is empty."""
    from tweets_spark_top_10_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k int, v string, x double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B2", 20.0), (3, "c", 3.5), (9, "ins", None)],
        "k int, v string, x double",
    )
    diff = snapshot_diff(old, new, "k")
    ops = {r["k"]: r["op"] for r in diff.collect()}
    assert ops == {2: "U", 3: "U", 4: "D", 9: "I"}

    from tweets_spark_top_10_spark.operators.merge import apply_changes
    from pyspark.sql import functions as F2

    rebuilt = apply_changes(old, diff.withColumn("seq", F2.lit(1)), "k")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))
    assert snapshot_diff(old, old, "k").count() == 0
