"""JL-projected ANN serving on CLUSTERED geometry (round-14 verdict
item 4).

The catalog pins ``rp_ivf_rerank`` recall on the quasi-random fixture —
the documented JL WORST case (rank-5→20 cosine gap 0.076 vs JL ranking
noise ~1/sqrt(d_out)), where recall@5 reads 0.60 at the catalog's
32-dim/50-shortlist.  Real embedding corpora are clustered: a query's
true neighbors sit in a tight cluster whose cosine gap to the rest of
the corpus is LARGE, so the projection's ranking noise cannot flip
top-5 membership and the operator's actual selling point — index
arithmetic and shuffle width cut by dim/d_out at ~full recall — shows
up.  This probe measures that claim instead of arguing it.

Fixture: each base vector of ``$SPARK_GRAFT_SF_DIR/embeddings.parquet``
becomes a ``replicas``-member cluster — replica k is ``v + eps *
cyclic_shift(v, k)`` (deterministic, no RNG; shifts of a quasi-random
vector are near-orthogonal, so members spread in DIFFERENT directions
around v).  At eps=0.15 the intra-cluster cosine is ~0.989 while
cross-cluster cosines keep the base corpus's quasi-random spread (~0 ±
noise) — the clustered regime.  Queries are the first 10 BASE vectors;
their true top-5 are their own cluster members.

Measured per point (mirrors ``bench._rp_recall_curve``'s protocol):
recall@5 vs brute force, index build seconds (projection + centroid
book + 1-probe assignment, eagerly materialized), query seconds
(probe + rank + original-space rerank), for the 64-dim IVF reference
and the projected pipeline at d_out ∈ {16, 32}.

Usage: python tools/rp_clustered_probe.py [replicas] [eps_pct]
       (defaults 10, 15 — eps as a percentage)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def clustered_corpus(spark, sf_dir: str, replicas: int = 10,
                     eps: float = 0.15, dim: int = 64):
    """(vec_id, label, embedding) with every base vector expanded into
    a ``replicas``-member cluster: replica k = v + eps*shift(v, k)
    (k=0 keeps v up to the member expression's round(., 6) on the
    float->double->float cast — NOT bit-identical to the source, which
    is harmless here because the exact and approximate paths rank the
    same corpus; ids shift by k*(max_id+1) like every other replica
    protocol in tools/).  Pure DataFrame — shared by the probe and the
    pytest recall floor (tests/test_rp.py)."""
    from pyspark.sql import functions as F

    from tweets_spark_top_10_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n_base = emb.agg(F.max("vec_id")).first()[0] + 1
    k = F.col("k")
    e = F.transform("embedding", lambda x: x.cast("double"))
    shifted = F.concat(
        F.slice(e, k + F.lit(1), F.lit(dim) - k), F.slice(e, F.lit(1), k)
    )
    eps_k = F.when(k == 0, F.lit(0.0)).otherwise(F.lit(eps))
    member = F.zip_with(
        e, shifted, lambda a, b: F.round(a + eps_k * b, 6).cast("float")
    )
    return (
        emb.select(
            "vec_id",
            "label",
            "embedding",
            F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("k"),
        )
        .select(
            (F.col("vec_id") + k * F.lit(n_base)).alias("vec_id"),
            "label",
            member.alias("embedding"),
        )
    )


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    eps = (int(sys.argv[2]) if len(sys.argv) > 2 else 15) / 100

    from pyspark.sql import functions as F

    from tweets_spark_top_10_spark.functions.similarity import (
        brute_force_knn,
        ivf_assign_cells,
        ivf_centroids,
        ivf_knn,
        rp_array,
        rp_ivf_rerank_knn,
    )
    from tweets_spark_top_10_spark.session import get_spark

    spark = get_spark(
        app_name="rp-clustered-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "16g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = clustered_corpus(spark, BASE, replicas, eps).localCheckpoint(
        eager=True
    )
    q = corpus.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    c = (
        corpus.filter(F.col("vec_id") >= 10)
        .select(F.col("vec_id").alias("neighbor_id"), "embedding")
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    n = c.count()
    n_cells = 64
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_knn(q, c, k=5).collect()
    }

    def _built(df):
        t0 = time.perf_counter()
        out = df.localCheckpoint(eager=True)
        return out, round(time.perf_counter() - t0, 3)

    points = []
    cents64, b1 = _built(ivf_centroids(c, "neighbor_id", "embedding", n_cells))
    cells64, b2 = _built(
        ivf_assign_cells(c, cents64, "neighbor_id", "embedding", n_probe=1)
    )
    t0 = time.perf_counter()
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivf_knn(
            q, c, k=5, n_cells=n_cells, n_probe=4,
            centroids=cents64, cand_cells=cells64,
        ).collect()
    }
    points.append({
        "space": "ivf_orig64",
        "recall_at5": round(len(exact & got) / len(exact), 3),
        "build_s": round(b1 + b2, 3),
        "query_s": round(time.perf_counter() - t0, 3),
    })
    print(f"# {points[-1]}", flush=True)

    for d_out, shortlist in ((16, 20), (32, 50)):
        cp, b3 = _built(rp_array(c, "neighbor_id", d_out=d_out))
        cents_p, b4 = _built(
            ivf_centroids(cp, "neighbor_id", "rp_vec", n_cells)
        )
        cells_p, b5 = _built(
            ivf_assign_cells(cp, cents_p, "neighbor_id", "rp_vec", n_probe=1)
        )
        t0 = time.perf_counter()
        got = {
            (r.query_id, r.neighbor_id)
            for r in rp_ivf_rerank_knn(
                q, c, k=5, d_out=d_out, shortlist=shortlist,
                n_cells=n_cells, centroids=cents_p, cand_cells=cells_p,
            ).collect()
        }
        points.append({
            "space": f"rp{d_out}_ivf_rerank{shortlist}",
            "recall_at5": round(len(exact & got) / len(exact), 3),
            "build_s": round(b3 + b4 + b5, 3),
            "query_s": round(time.perf_counter() - t0, 3),
        })
        print(f"# {points[-1]}", flush=True)

    print(json.dumps({
        "replicas": replicas,
        "eps": eps,
        "corpus_n": n,
        "n_cells": n_cells,
        "points": points,
    }))


if __name__ == "__main__":
    main()
