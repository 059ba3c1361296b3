"""Iterative graph propagation on DataFrames: weighted PageRank.

The reference has no graph surface; this is the iterative-algorithm
showcase of the capability envelope (SURVEY.md §11), complementing the
min-label connected components in ``functions/dedup.py``.  The shape
generalizes to any fixed-point edge propagation (label propagation,
belief push, embedding smoothing).

Scale shape per iteration:

- one equi-join ranks×edges on ``src`` (ranks is node-sized — for
  billion-edge graphs both sides shuffle on src once; edges can be
  pre-bucketed on src so only ranks moves),
- one ``groupBy(dst).sum`` with map-side partial aggregation,
- one node-spine left join to re-inject nodes with no inbound mass.

Lineage discipline mirrors ``connected_components``: each iteration
``localCheckpoint`` (lazy, r16) truncates the plan so K iterations
cost K bounded stages, not one exponentially nested plan.  Iteration
count is FIXED (the catalog query unrolls the same count in SQL) —
convergence-driven stopping would need a driver-side delta check per
round (one scalar collect), which callers can layer on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = "w",
) -> DataFrame:
    """Weighted PageRank, ``iterations`` fixed rounds, simplified
    dangling handling (dangling mass is dropped, not redistributed —
    the standard power-iteration-lite used when dangling nodes are
    rare; document if your graph has many).

    ``edges``: one row per directed edge ``(src, dst, weight)``
    (``weight=None`` → unweighted).  Returns ``(node, pr double)`` for
    every node appearing as src or dst.  pr_{t+1}(v) = (1-d)/N +
    d * Σ_u pr_t(u) · w(u,v)/outw(u).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    norm = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w_col.alias("w")
    )
    nodes = (
        norm.select(F.col("src").alias("node"))
        .unionByName(norm.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # one scalar; the teleport term needs N
    out_w = norm.groupBy("src").agg(F.sum("w").alias("ow"))
    # transition weight per edge, fixed across iterations — persist it
    # once instead of re-deriving the join every round
    # LAZY checkpoints for the fixed-count iteration (r16): nothing
    # needs these materialized before the final action, so eager=True
    # paid one driver-blocking job per round at query-construction
    # time; lazy keeps the same lineage truncation but lets the final
    # action drive the whole K-round DAG.
    trans = (
        norm.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("p"))
        .localCheckpoint(eager=False)
    )
    teleport = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("pr"))
    for _ in range(iterations):
        inbound = (
            ranks.join(trans, ranks["node"] == trans["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") * F.col("p")).alias("mass"))
        )
        ranks = (
            nodes.join(inbound, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce("mass", F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
