"""Deliberately-clustered 10x probe for semantic dedup (round-8 item 6).

The bench's content-disjoint protocol (cyclic-shift replicas) spreads
replicas across embedding space — the BALANCED case.  This probe
measures the opposite extreme: a corpus where 90% of vectors are the
IDENTICAL direction, so every same-direction centroid ties at cosine
1.0 and the deterministic tie-break drops the entire hot mass into ONE
cell — the worst case the ``subcell_split`` cap exists for.  Without
the cap the hot cell self-joins quadratically (1.6e8 pairs at 10x —
locally intractable); with it, per-vector pair work is bounded by
cap = 4*ceil(N/sqrt(N)) ~ 4*sqrt(N), so total work stays O(N^1.5) —
the SAME complexity as the balanced corpus.

Reports min-of-2 wall at 1x and 10x of the skewed corpus, the capped
vs uncapped pair counts, and the wall ratio.

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


def build(work: str, replicas: int, hot_pct: int) -> dict[str, str]:
    """Skewed fixtures: ``hot_pct``% of ids carry the exact e0 vector
    (all replicas included — the hot mass grows with the corpus);
    the rest keep their original embedding, cyclic-shifted per replica
    so the cold remainder stays content-disjoint."""
    import duckdb

    src = os.path.join(BASE, "embeddings.parquet")
    out = {}
    for tag, n in (("1x", 1), (f"{replicas}x", replicas)):
        d = os.path.join(work, tag)
        os.makedirs(d)
        duckdb.sql(f"""
          COPY (
            SELECT e.vec_id + r.k * (SELECT MAX(vec_id)+1 FROM read_parquet('{src}')) AS vec_id,
                   e.label,
                   CASE WHEN e.vec_id % 100 < {hot_pct}
                        THEN list_transform(range(64),
                               i -> CASE WHEN i = 0 THEN CAST(1.0 AS FLOAT)
                                         ELSE CAST(0.0 AS FLOAT) END)
                        ELSE e.embedding[(r.k % 64) + 1:] || e.embedding[:(r.k % 64)]
                   END AS embedding
            FROM read_parquet('{src}') e, (SELECT UNNEST(RANGE({n})) AS k) r
          ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)
        """)
        out[tag] = d
    return out


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    hot_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 90
    work = tempfile.mkdtemp(prefix="clustered_dedup_")
    dirs = build(work, replicas, hot_pct)

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
        results[tag] = {
            "wall_s": round(best, 2),
            "n": n,
            "cap": cap,
            "hot_subcells": s,
            "capped_hot_pairs_approx": capped_pairs,
            "uncapped_hot_pairs": math.comb(hot, 2),
        }
        print(f"{tag}: {results[tag]}", flush=True)
        spark.catalog.clearCache()
    tags = list(results)
    r = results[tags[1]]["wall_s"] / results[tags[0]]["wall_s"]
    results["ratio"] = round(r, 2)
    print(json.dumps(results))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
