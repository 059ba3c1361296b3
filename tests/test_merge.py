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


def test_pit_join_picks_exactly_the_valid_version(spark):
    """PIT semantics on a handmade history: probes resolve to the one
    interval containing them, pre-birth and post-delete probes drop,
    open intervals serve all later probes, and the column-disjointness
    guard fails loud."""
    from tweets_spark_top_10_spark.operators.merge import pit_join

    hist = spark.createDataFrame(
        [
            (1, "v0", 0, 5),
            (1, "v1", 5, None),       # current
            (2, "only", 3, 7),        # closed by a delete at 7
        ],
        "k int, state string, valid_from int, valid_to int",
    )
    probe = spark.createDataFrame(
        [(1, 0), (1, 4), (1, 5), (1, 99), (2, 2), (2, 6), (2, 7), (3, 1)],
        "k int, at int",
    )
    got = sorted(
        (r["k"], r["at"], r["state"])
        for r in pit_join(probe, hist, "k", "at").collect()
    )
    assert got == [
        (1, 0, "v0"),
        (1, 4, "v0"),
        (1, 5, "v1"),   # boundary belongs to the NEW version
        (1, 99, "v1"),  # open interval
        (2, 6, "only"),
        # (2, 2): pre-birth; (2, 7): deleted; (3, 1): unknown key — all drop
    ]

    with pytest.raises(ValueError, match="disjoint"):
        pit_join(probe.withColumnRenamed("at", "state"), hist, "k", "state")


def test_ivm_delta_moves_mass_between_groups(spark):
    """agg_delta + apply_agg_delta on a handmade feed: a group-changing
    update moves count AND sum between groups, a delete that empties a
    group removes the group row, an insert creates a new group, and an
    update of a never-seen key behaves as an insert (no pre-image to
    subtract). Maintained view == direct aggregate of the merged
    snapshot."""
    from tweets_spark_top_10_spark.operators.ivm import (
        agg_delta,
        apply_agg_delta,
        build_agg_view,
    )
    from tweets_spark_top_10_spark.operators.merge import apply_changes

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)],
        "k int, g string, v long",
    )
    changes = spark.createDataFrame(
        [
            (2, "b", 25, "U", 1),   # moves from a to b
            (4, "c", 40, "D", 1),   # empties group c
            (5, "d", 50, "I", 1),   # new group
            (6, "a", 60, "U", 1),   # update of unseen key == insert
        ],
        "k int, g string, v long, op string, seq int",
    )
    view = build_agg_view(base, ["g"], ["v"])
    out = apply_agg_delta(
        view, agg_delta(base, changes, "k", ["g"], ["v"]), ["g"], ["v"]
    )
    got = {r["g"]: (r["n"], r["sum_v"]) for r in out.collect()}
    direct = {
        r["g"]: (r["n"], r["sum_v"])
        for r in build_agg_view(
            apply_changes(base, changes, "k"), ["g"], ["v"]
        ).collect()
    }
    assert got == direct == {
        "a": (2, 70),   # k1 + k6
        "b": (2, 55),   # k3 + moved k2
        "d": (1, 50),
    }


def test_minmax_support_resurfaces_runner_up_on_delete(spark):
    """Deleting the group's current minimum must resurface the
    runner-up — the case scalar min/max views get wrong and the
    support multiset exists to fix. Duplicated values survive one
    deletion (count 2 -> 1)."""
    from tweets_spark_top_10_spark.operators.ivm import (
        agg_delta,
        apply_agg_delta,
        build_agg_view,
        minmax_from_support,
    )

    base = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 7), (3, "a", 9), (4, "b", 3), (5, "b", 3)],
        "k int, g string, v long",
    )
    changes = spark.createDataFrame(
        [
            (1, "a", 5, "D", 1),   # delete group a's minimum
            (3, "a", 2, "U", 1),   # new minimum arrives via update
            (4, "b", 3, "D", 1),   # one of two equal minima
        ],
        "k int, g string, v long, op string, seq int",
    )
    skey = ["g", "v"]
    support = apply_agg_delta(
        build_agg_view(base, skey, []),
        agg_delta(base, changes, "k", skey, []),
        skey,
        [],
    )
    got = {
        r["g"]: (r["min_v"], r["max_v"])
        for r in minmax_from_support(support, ["g"], "v").collect()
    }
    assert got == {"a": (2, 7), "b": (3, 3)}
