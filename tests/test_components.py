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


def test_cc_deep_chain_converges_in_log_rounds(spark):
    """Adversarial DEEP chain (diameter 1024): the Kiveris'14
    large-star/small-star alternation must label it exactly AND inside
    a logarithmic round budget.  Min-label propagation needs ~d/2
    rounds (512 here — far past any sane max_iter); the star algorithm
    contracts it in O(log d).  This is the iteration-count A/B from
    round-6 verdict item 5."""
    import tweets_spark_top_10_spark.functions.dedup as dd

    n = 1024
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    got = {(r.node, r.component) for r in connected_components(pairs).collect()}
    assert got == {(i, 0) for i in range(n + 1)}
    assert dd._last_cc_rounds <= 14, (
        f"deep chain took {dd._last_cc_rounds} rounds — lost the "
        "logarithmic contraction (label propagation would need ~512)"
    )
