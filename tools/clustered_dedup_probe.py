"""Deliberately-clustered 10x probe for semantic dedup (round-8 item 6).

The bench's content-disjoint protocol (cyclic-shift replicas) spreads
replicas across embedding space — the BALANCED case.  This probe
measures the opposite extreme, in two flavors, with 90% of the corpus
piled onto one direction:

- ``dup``: the hot mass is the bitwise-IDENTICAL e0 vector.  The
  exact-duplicate collapse absorbs it (one representative), so the
  whole hot pile costs one group-by — wall should scale like the
  balanced corpus.
- ``near``: the hot vectors are DISTINCT floats (collapse cannot
  absorb them) whose mutual/centroid cosines still round to 1.0, so
  every same-direction centroid ties and the deterministic tie-break
  drops the entire hot mass into ONE cell — the worst case the
  ``subcell_split`` cap exists for.  Without the cap the hot cell
  self-joins quadratically (1.6e8 pairs at 10x — locally
  intractable); with it, per-vector pair work is bounded by
  cap ~ 4*sqrt(N), total O(N^1.5), and every capped pair is a TRUE
  near-dup edge the output must represent — the residual wall growth
  is emitted-edge volume, not wasted shuffle.

Reports min-of-2 wall at 1x and 10x per protocol, capped vs uncapped
hot-pair counts, wall ratios, and — round-9 verdict item 5 — the
RECALL cost of the cap on the hot mass, measured two ways:

- ``pair_recall``: pairs the pipeline emits between hot vectors
  (intra-sub-cell + rep-bridge links) / true ≥threshold hot pairs
  (C(hot, 2) by construction — every hot vector is within threshold of
  every other).  Low by design (~1/s): the cap trades pair
  ENUMERATION for bounded work.
- ``dedup_recall``: (hot - keeps_in_hot) / (hot - 1) from the query
  output — the metric dedup actually ships.  The rep-sampling bridge
  (``subcell_rep_pairs``) restores the split clique's transitive
  closure, so this must be 1.0 (one keep) even though pair_recall
  is ~1/s.

Usage: python tools/clustered_dedup_probe.py [replicas] [hot_pct]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(
    work: str, replicas: int, hot_pct: int, mode: str = "dup"
) -> dict[str, str]:
    """Skewed fixtures: ``hot_pct``% of ids carry a hot-direction
    vector (all replicas included — the hot mass grows with the
    corpus); the rest keep their original embedding, cyclic-shifted
    per replica so the cold remainder stays content-disjoint.

    ``mode='dup'``: hot vector is exactly e0 (collapse path).
    ``mode='near'``: hot vector is [1, new_id*1e-9, 0...] — distinct
    floats, but delta <= 2e-5 keeps every mutual/centroid cosine
    >= 1 - 2e-10, rounding to 1.0 at both the 9-digit assignment and
    6-digit pair precision (cap path)."""
    import duckdb

    src = os.path.join(BASE, "embeddings.parquet")
    # lambda bodies may reference outer COLUMNS but not subqueries:
    # the replicated id is computed in the inner select as `nid`
    hot_dim1 = (
        "CAST(0.0 AS FLOAT)" if mode == "dup" else "CAST(b.nid * 1e-9 AS FLOAT)"
    )
    out = {}
    for tag, n in (("1x", 1), (f"{replicas}x", replicas)):
        d = os.path.join(work, f"{mode}_{tag}")
        os.makedirs(d)
        duckdb.sql(f"""
          COPY (
            SELECT b.nid AS vec_id,
                   b.label,
                   CASE WHEN b.base_id % 100 < {hot_pct}
                        THEN list_transform(range(64),
                               i -> CASE WHEN i = 0 THEN CAST(1.0 AS FLOAT)
                                         WHEN i = 1 THEN {hot_dim1}
                                         ELSE CAST(0.0 AS FLOAT) END)
                        ELSE b.shifted
                   END AS embedding
            FROM (
              SELECT e.vec_id + r.k * (SELECT MAX(vec_id)+1 FROM read_parquet('{src}')) AS nid,
                     e.vec_id AS base_id, e.label,
                     e.embedding[(r.k % 64) + 1:] || e.embedding[:(r.k % 64)] AS shifted
              FROM read_parquet('{src}') e, (SELECT UNNEST(RANGE({n})) AS k) r
            ) b
          ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)
        """)
        out[tag] = d
    return out


def hot_recall(spark, d: str, hot_pct: int, result_df) -> dict:
    """Measured recall on the hot mass: re-run the query's own pair
    stage (same building blocks: collapse, √N assignment, sub-cell
    split, thresholded intra pairs, rep-bridge links) and count pairs
    with BOTH endpoints hot; read keeps-in-hot off the query output."""
    import duckdb

    from pyspark.sql import functions as F

    from tweets_spark_top_10_spark.functions.similarity import (
        dot,
        ivf_assign_cells,
        ivf_centroids,
        l2_norm,
        scaled_cell_params,
        subcell_cap,
        subcell_rep_pairs,
        subcell_split,
    )

    src = os.path.join(d, "embeddings.parquet")
    # replica k's ids are orig + k*(max_orig+1), so nid % base_mod
    # recovers the original id — hot iff the ORIGINAL id was hot
    base_mod = duckdb.sql(
        f"SELECT MAX(vec_id)+1 FROM read_parquet('{os.path.join(BASE, 'embeddings.parquet')}')"
    ).fetchone()[0]

    def is_hot(col):
        return (col % base_mod) % 100 < hot_pct

    vecs = spark.read.parquet(src).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vec")
    )
    # exact-dup collapse (the query's prepass): reps only enter pairing
    fp = F.xxhash64("vec").alias("__fp")
    reps = vecs.select(fp, "vec_id").groupBy("__fp").agg(F.min("vec_id").alias("rep"))
    rep_vecs = (
        vecs.select("vec_id", fp)
        .join(reps, "__fp")
        .filter(F.col("vec_id") == F.col("rep"))
        .join(vecs, "vec_id")
        .select("vec_id", "vec")
    )
    n = vecs.count()
    n_cells, stride = scaled_cell_params(n)
    cap = subcell_cap(n, n_cells)
    cents = ivf_centroids(vecs, "vec_id", "vec", n_cells, stride)
    assigned = ivf_assign_cells(
        rep_vecs.repartition(spark.sparkContext.defaultParallelism),
        cents,
        "vec_id",
        vec_col="vec",
        n_probe=1,
    )
    cells = subcell_split(assigned, "vec_id", cap).repartition(
        spark.sparkContext.defaultParallelism, "cell_id", "sub_cell"
    ).persist()
    a = cells.select(
        "cell_id", "sub_cell", F.col("vec_id").alias("id_a"),
        F.col("vec").alias("va"), l2_norm(F.col("vec")).alias("na"),
    )
    b = cells.select(
        "cell_id", "sub_cell", F.col("vec_id").alias("id_b"),
        F.col("vec").alias("vb"), l2_norm(F.col("vec")).alias("nb"),
    )
    intra = (
        a.join(b, ["cell_id", "sub_cell"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "__cos",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6),
        )
        .filter(F.col("__cos") >= 0.3)
        .select("id_a", "id_b")
    )
    bridge = subcell_rep_pairs(cells, "vec_id", "vec", threshold=0.3)
    emitted = (
        intra.unionByName(bridge)
        .filter(is_hot(F.col("id_a")) & is_hot(F.col("id_b")))
        .count()
    )
    cells.unpersist()
    hot_n = vecs.filter(is_hot(F.col("vec_id"))).count()
    true_pairs = math.comb(hot_n, 2)
    keeps = result_df.filter(
        is_hot(F.col("vec_id")) & F.col("keep")
    ).count()
    return {
        "hot_n": hot_n,
        "hot_pairs_emitted": emitted,
        "hot_true_pairs": true_pairs,
        "pair_recall": round(emitted / true_pairs, 6) if true_pairs else None,
        "keeps_in_hot": keeps,
        "dedup_recall": round((hot_n - keeps) / (hot_n - 1), 6)
        if hot_n > 1
        else None,
    }


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    hot_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 90
    work = tempfile.mkdtemp(prefix="clustered_dedup_")

    from tweets_spark_top_10_spark.session import get_spark

    spark = get_spark(
        app_name="clustered-dedup-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tweets_spark_top_10_spark.functions.similarity import (
        scaled_cell_params,
        subcell_cap,
    )
    from tweets_spark_top_10_spark.queries.catalog import QUERIES

    fn = QUERIES["semantic_dedup_keep"]
    results: dict[str, dict] = {}
    for mode in ("dup", "near"):
        dirs = build(work, replicas, hot_pct, mode)
        walls = {}
        for tag, d in dirs.items():
            fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                t = time.perf_counter() - t0
                best = t if best is None else min(best, t)
            import duckdb

            n = duckdb.sql(
                f"SELECT COUNT(*) FROM read_parquet('{d}/embeddings.parquet')"
            ).fetchone()[0]
            n_cells, _ = scaled_cell_params(n)
            cap = subcell_cap(n, n_cells)
            hot = n * hot_pct // 100
            s = (hot + cap - 1) // cap
            capped_pairs = s * math.comb((hot + s - 1) // s + 1, 2)
            walls[tag] = round(best, 2)
            results[f"{mode}_{tag}"] = {
                "wall_s": round(best, 2),
                "n": n,
                "cap": cap,
                "hot_subcells_if_uncollapsed": s,
                "capped_hot_pairs_approx": capped_pairs,
                "uncapped_hot_pairs": math.comb(hot, 2),
            }
            if tag != "1x":  # recall cost of the cap, measured at scale
                results[f"{mode}_{tag}"]["hot_recall"] = hot_recall(
                    spark, d, hot_pct, fn(spark, d)
                )
            print(f"{mode} {tag}: {results[f'{mode}_{tag}']}", flush=True)
            spark.catalog.clearCache()
        tags = list(walls)
        results[f"{mode}_ratio"] = round(walls[tags[1]] / walls[tags[0]], 2)
    print(json.dumps(results))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
