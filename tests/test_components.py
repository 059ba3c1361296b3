"""connected_components unit semantics on hand-built graphs."""

from __future__ import annotations


from tweets_spark_top_10_spark.functions.dedup import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {
        (r.node, r.component) for r in connected_components(df).collect()
    }


def test_two_disjoint_chains(spark):
    # chain 1-2-3-4 and chain 10-11; min label wins per component
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_cycle_and_star(spark):
    # cycle 5-6-7-5 plus star 20-(21,22,23)
    got = _cc(spark, [(5, 6), (6, 7), (7, 5), (20, 21), (20, 22), (20, 23)])
    assert got == {
        (5, 5), (6, 5), (7, 5),
        (20, 20), (21, 20), (22, 20), (23, 20),
    }


def test_long_path_converges(spark):
    # path of length 12 needs several propagation rounds
    pairs = [(i, i + 1) for i in range(12)]
    got = _cc(spark, pairs)
    assert got == {(i, 0) for i in range(13)}
