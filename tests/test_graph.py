"""Weighted PageRank: fixed-round power iteration on DataFrames.

The catalog query ``nation_trade_pagerank`` is oracle-gated (DuckDB
unrolls the same rounds as CTEs); these tests pin the numeric kernel
against a straight numpy power iteration on handmade graphs, including
weights, a dangling node, and a disconnected node.
"""

from __future__ import annotations

import pytest

from tweets_spark_top_10_spark.functions.graph import pagerank


def _numpy_pagerank(edges, iterations, damping=0.85):
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outw = {}
    for u, _, w in edges:
        outw[u] = outw.get(u, 0.0) + w
    pr = {m: 1.0 / n for m in nodes}
    for _ in range(iterations):
        mass = {m: 0.0 for m in nodes}
        for u, v, w in edges:
            mass[v] += pr[u] * w / outw[u]
        pr = {m: (1 - damping) / n + damping * mass[m] for m in nodes}
    return pr


def test_pagerank_matches_numpy_power_iteration(spark):
    # weighted, cyclic, with a dangling sink (D has no out-edges) and
    # an in-degree-0 source (A): the simplified dangling handling must
    # match the same convention in the numpy replay.
    edges = [
        ("A", "B", 3.0),
        ("A", "C", 1.0),
        ("B", "C", 2.0),
        ("C", "B", 1.0),
        ("C", "D", 1.0),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    for iters in (1, 3, 5):
        got = {r["node"]: r["pr"] for r in pagerank(df, iterations=iters).collect()}
        want = _numpy_pagerank(edges, iters)
        assert got.keys() == want.keys()
        for node in want:
            assert got[node] == pytest.approx(want[node], abs=1e-12), (
                f"iters={iters} node={node}"
            )


def test_pagerank_unweighted_and_validation(spark):
    df = spark.createDataFrame(
        [("A", "B"), ("B", "A"), ("A", "C")], "src string, dst string"
    )
    got = {r["node"]: r["pr"] for r in pagerank(df, iterations=2, weight=None).collect()}
    want = _numpy_pagerank(
        [("A", "B", 1.0), ("B", "A", 1.0), ("A", "C", 1.0)], 2
    )
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12)
    with pytest.raises(ValueError, match="iterations"):
        pagerank(df, iterations=0)
