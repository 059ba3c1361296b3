"""Graph queries: iterative propagation over joins-derived edge lists.

The edge list is itself a distributed multi-join aggregate (the 100 TB
part); the iteration then runs on node/edge-sized tables.  Oracle: the
same fixed number of rounds unrolled as SQL CTEs — DuckDB replays the
exact power iteration, so the comparison is full-value, not an
invariant gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tweets_spark_top_10_spark.queries.registry import register
from tweets_spark_top_10_spark.sources.registry import load_table

_PR_ITER_CTE = """
    p{i} AS (
      SELECT nodes.node,
             (1 - 0.85) / (SELECT n FROM nc)
               + 0.85 * COALESCE(m.mass, 0) AS pr
      FROM nodes LEFT JOIN (
        SELECT t.dst AS node, SUM(p{prev}.pr * t.p) AS mass
        FROM trans t JOIN p{prev} ON p{prev}.node = t.src
        GROUP BY t.dst
      ) m ON m.node = nodes.node
    )"""


def _pagerank_oracle(iterations: int) -> str:
    ctes = ",".join(
        _PR_ITER_CTE.format(i=i, prev=i - 1) for i in range(1, iterations + 1)
    )
    return f"""
    WITH edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(COUNT(*) AS DOUBLE) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    trans AS (
      SELECT src, dst, w / SUM(w) OVER (PARTITION BY src) AS p FROM edges
    ),
    p0 AS (SELECT node, 1.0 / (SELECT n FROM nc) AS pr FROM nodes),
    {ctes}
    SELECT n.n_name, ROUND(p{iterations}.pr, 6) AS pr
    FROM p{iterations} JOIN nation n ON n.n_nationkey = p{iterations}.node
    """


@register("nation_trade_pagerank", oracle=_pagerank_oracle(3))
def nation_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation-level trade graph, 3 fixed
    power-iteration rounds.

    Edges = (customer's nation -> supplier's nation, lineitem count):
    a 4-table multi-join aggregate whose fact-side shuffle is the real
    work; the iteration itself runs on node-count-sized tables with
    localCheckpoint lineage truncation per round
    (``functions/graph.py:pagerank``).  The oracle unrolls the same 3
    rounds as SQL CTEs, so values match to the rounding digit."""
    from tweets_spark_top_10_spark.functions.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(
            cust["c_nationkey"].alias("src"), supp["s_nationkey"].alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    ranks = pagerank(edges, iterations=3, damping=0.85)
    return ranks.join(
        F.broadcast(nation), ranks["node"] == nation["n_nationkey"]
    ).select("n_name", F.round("pr", 6).alias("pr"))
