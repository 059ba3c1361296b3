"""Streaming-state scale probe (round-8 verdict item 5).

The 10x/100x evidence so far is batch-only; this probe replays a
content-disjoint 10x corpus through the two stateful streaming
maintainers and records, PER MICRO-BATCH, the merge wall and the state
footprint — the two quantities that decide whether the maintainers
survive an unbounded stream:

1. **Windowed-watermarked Misra-Gries**
   (``streaming/heavy_hitters.merge_mg_batch_windowed``): events
   replayed in event-time order as K batches; replica k rewrites every
   token to ``r{k}u<user>`` so the 10x side has 10x the distinct-token
   pressure while windows/groups stay fixed.  The claim under test:
   live state stays bounded by (windows inside the watermark horizon)
   x groups x (capacity+1) — NOT by distinct tokens — and per-batch
   merge wall stays ~flat as total history grows, because each merge
   touches only the live summary + one batch.

2. **Streaming semantic-dedup maintenance**
   (``streaming/semantic_dedup.upsert_semantic_pairs_batch``):
   embeddings replicated 10x content-disjointly (cyclic shift, the
   bench protocol) against a FIXED full-corpus quantizer.  Cell state
   necessarily grows with the corpus (it IS the corpus); the quantity
   that must stay sane is per-batch merge wall — batch x own-cell
   members plus the pair-table distinct-merge — reported per batch so
   super-linear drift is visible.

3. **Quantizer re-fit lever** (mode ``refit``): stale-quantizer vs
   mid-stream-refit arms over the same replicated corpus — see
   :func:`probe_semantic_refit`.

4. **Production-loop refit** (mode ``loop``): the refit arm driven by
   ``maintain_semantic_dedup(refit_growth=2.0)`` itself — the LOOP
   decides every refit from the durable ``fitted_n`` book — see
   :func:`probe_semantic_refit_loop` (round-10 verdict item 5).

Usage: python tools/stream_scale_probe.py [replicas] [batches] [mode]
``mode`` is a comma set of {mg, sd, refit, loop, bpe} (default
``mg,sd``); ``bpe`` probes the streaming tokenizer-vocab maintainer
(:func:`probe_bpe_vocab`, round-13).
Prints one JSON object; paste the summary table into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def probe_windowed_mg(spark, work: str, replicas: int, batches: int, capacity: int):
    """Replay events x``replicas`` through the watermarked MG merge."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tweets_spark_top_10_spark.streaming import heavy_hitters as hh

    ev = spark.read.parquet(os.path.join(BASE, "events.parquet"))
    reps = spark.range(replicas).select(F.col("id").alias("k"))
    feed = (
        ev.crossJoin(F.broadcast(reps))
        .select(
            # driver parquet carries TIMESTAMP_NTZ; the MG merge wants TIMESTAMP
            F.col("ts").cast("timestamp").alias("ts"),
            F.col("event_type").alias("grp"),
            F.concat(F.lit("r"), F.col("k"), F.lit("u"), F.col("user_id")).alias(
                "token"
            ),
        )
        # feed prep, not the measured path: a single-partition ntile
        # sort is fine at probe scale (event-time-ordered micro-batches)
        .withColumn("batch", F.ntile(batches).over(Window.orderBy("ts")))
    )
    feed_path = os.path.join(work, f"mg_feed_x{replicas}")
    feed.write.partitionBy("batch").mode("overwrite").parquet(feed_path)

    state = os.path.join(work, f"mg_state_x{replicas}")
    closed = state + "__closed"
    per_batch = []
    for b in range(1, batches + 1):
        batch_df = spark.read.parquet(os.path.join(feed_path, f"batch={b}"))
        t0 = time.perf_counter()
        hh.merge_mg_batch_windowed(
            spark,
            batch_df,
            state,
            time_col="ts",
            group_col="grp",
            token_col="token",
            capacity=capacity,
            delay_seconds=3600,
            window="hour",
            batch_id=b,
        )
        wall = time.perf_counter() - t0
        live = spark.read.parquet(state)
        live_rows = live.count()
        # the contract: per-(window, group) rows never exceed capacity+1
        over = (
            live.groupBy("window", "grp")
            .count()
            .filter(F.col("count") > capacity + 1)
            .count()
        )
        per_batch.append(
            {
                "batch": b,
                "merge_s": round(wall, 2),
                "live_rows": live_rows,
                "live_mb": round(_du(state) / 1e6, 2),
                "closed_mb": round(_du(closed) / 1e6, 2),
                "keys_over_capacity": over,
            }
        )
        print(f"mg x{replicas} batch {b}: {per_batch[-1]}", flush=True)
    walls = [r["merge_s"] for r in per_batch]
    return {
        "per_batch": per_batch,
        "max_live_rows": max(r["live_rows"] for r in per_batch),
        "keys_over_capacity_total": sum(r["keys_over_capacity"] for r in per_batch),
        "merge_s_first3_avg": round(sum(walls[:3]) / max(1, len(walls[:3])), 2),
        "merge_s_last3_avg": round(sum(walls[-3:]) / max(1, len(walls[-3:])), 2),
    }


def _sd_feed(spark, work: str, replicas: int):
    """Content-disjoint x``replicas`` embedding corpus (cyclic-shift, the
    bench protocol), shared by the fixed-quantizer and refit probes."""
    import duckdb

    src = os.path.join(BASE, "embeddings.parquet")
    feed_path = os.path.join(work, f"sd_feed_x{replicas}.parquet")
    if not os.path.exists(feed_path):
        duckdb.sql(f"""
          COPY (
            SELECT e.vec_id + r.k * (SELECT MAX(vec_id)+1 FROM read_parquet('{src}')) AS vec_id,
                   list_transform(
                     e.embedding[(r.k % 64) + 1:] || e.embedding[:(r.k % 64)],
                     x -> CAST(x AS DOUBLE)) AS vec
            FROM read_parquet('{src}') e, (SELECT UNNEST(RANGE({replicas})) AS k) r
          ) TO '{feed_path}' (FORMAT PARQUET)
        """)
    return spark.read.parquet(feed_path)


def probe_semantic_dedup(spark, work: str, replicas: int, batches: int):
    """Replay embeddings x``replicas`` (cyclic-shift content-disjoint)
    through the semantic-dedup state maintenance."""
    from pyspark.sql import functions as F

    from tweets_spark_top_10_spark.functions.similarity import semdedup_centroids
    from tweets_spark_top_10_spark.streaming.semantic_dedup import (
        upsert_semantic_pairs_batch,
    )

    vecs = _sd_feed(spark, work, replicas)
    n = vecs.count()
    # offline quantizer fit over the full corpus (the fixed coarse book
    # a production deployment trains before attaching the stream)
    cents = semdedup_centroids(vecs, cand_id="vec_id", vec_col="vec")
    cents = cents.localCheckpoint(eager=True)
    per = (n + batches - 1) // batches
    cells_path = os.path.join(work, f"sd_cells_x{replicas}")
    pairs_path = os.path.join(work, f"sd_pairs_x{replicas}")
    per_batch = []
    for b in range(batches):
        batch_df = vecs.filter(
            (F.col("vec_id") >= b * per) & (F.col("vec_id") < (b + 1) * per)
        )
        t0 = time.perf_counter()
        upsert_semantic_pairs_batch(
            spark, batch_df, cents, cells_path, pairs_path, "vec_id", "vec"
        )
        wall = time.perf_counter() - t0
        per_batch.append(
            {
                "batch": b,
                "merge_s": round(wall, 2),
                "cells_mb": round(_du(cells_path) / 1e6, 2),
                "pairs_rows": spark.read.parquet(pairs_path).count()
                if os.path.exists(pairs_path)
                else 0,
                "pairs_mb": round(_du(pairs_path) / 1e6, 2),
            }
        )
        print(f"sd x{replicas} batch {b}: {per_batch[-1]}", flush=True)
    walls = [r["merge_s"] for r in per_batch]
    return {
        "per_batch": per_batch,
        "merge_s_first3_avg": round(sum(walls[:3]) / max(1, len(walls[:3])), 2),
        "merge_s_last3_avg": round(sum(walls[-3:]) / max(1, len(walls[-3:])), 2),
    }


def probe_semantic_refit(spark, work: str, replicas: int, batches: int):
    """Stale-quantizer vs mid-stream-refit arms (round-9: the re-fit
    lever, measured).

    Production reality for an unbounded stream: the coarse quantizer is
    fit on the corpus available at stream START.  Both arms here fit it
    on batch 0's slice only (1/``batches`` of the corpus — too few
    cells, and later cyclic-shift replicas drift away from its
    directions), then drain all batches:

    - **stale** never re-fits: per-cell occupancy grows linearly, so
      the batch x cell-members merge join degrades batch over batch.
    - **refit** calls :func:`refit_semantic_state` at each corpus
      doubling (after batches 2, 4, 8, ...), continuing with the
      returned corpus-scaled centroids.

    The claim under test: late-batch merge wall in the refit arm stays
    near-flat while the stale arm's grows, and the total refit cost is
    bounded (each refit is one batch-pipeline pass, amortized O(√N)
    per vector across doublings).
    """
    from pyspark.sql import functions as F

    from tweets_spark_top_10_spark.functions.similarity import semdedup_centroids
    from tweets_spark_top_10_spark.streaming.semantic_dedup import (
        refit_semantic_state,
        upsert_semantic_pairs_batch,
    )

    vecs = _sd_feed(spark, work, replicas)
    n = vecs.count()
    per = (n + batches - 1) // batches
    # Stale quantizer = fit on the ORIGINAL (replica-0) corpus slice —
    # "the stream started when the corpus was 1/replicas of its final
    # size".  Replica k's ids are orig + k*(max_orig_id+1), so replica 0
    # is selected BY CONSTRUCTION as vec_id <= max_orig_id (row-count
    # arithmetic `< n // replicas` silently drifts off replica 0 when
    # source ids are 1-based or gappy — r9 advisor finding).  Frozen at
    # k₀=√N₀, per-batch merge cost grows as B·(k₀ + N/k₀) → B·N/√N₀, vs
    # ~2B·√N with doubling refits: the separation on late batches is
    # ~√(N/N₀)/2.
    import duckdb

    src = os.path.join(BASE, "embeddings.parquet")
    max_orig_id = duckdb.sql(
        f"SELECT MAX(vec_id) FROM read_parquet('{src}')"
    ).fetchone()[0]
    stale = (
        semdedup_centroids(
            vecs.filter(F.col("vec_id") <= max_orig_id),
            cand_id="vec_id",
            vec_col="vec",
        )
        .localCheckpoint(eager=True)
    )
    refit_after = {2**i for i in range(1, 32) if 2**i < batches}
    arms = {}
    for arm in ("stale", "refit"):
        cells_path = os.path.join(work, f"sdr_cells_{arm}_x{replicas}")
        pairs_path = os.path.join(work, f"sdr_pairs_{arm}_x{replicas}")
        cents = stale
        per_batch = []
        refits = []
        for b in range(batches):
            batch_df = vecs.filter(
                (F.col("vec_id") >= b * per) & (F.col("vec_id") < (b + 1) * per)
            )
            t0 = time.perf_counter()
            upsert_semantic_pairs_batch(
                spark, batch_df, cents, cells_path, pairs_path, "vec_id", "vec"
            )
            per_batch.append(
                {"batch": b, "merge_s": round(time.perf_counter() - t0, 2)}
            )
            print(f"sd-refit[{arm}] x{replicas} batch {b}: {per_batch[-1]}", flush=True)
            if arm == "refit" and (b + 1) in refit_after:
                t0 = time.perf_counter()
                cents = refit_semantic_state(spark, cells_path, pairs_path)
                refits.append(
                    {
                        "after_batch": b + 1,
                        "refit_s": round(time.perf_counter() - t0, 2),
                        "n_cells": cents.count(),
                    }
                )
                print(f"sd-refit[{arm}] refit: {refits[-1]}", flush=True)
        walls = [r["merge_s"] for r in per_batch]
        arms[arm] = {
            "per_batch": per_batch,
            "merge_s_first3_avg": round(sum(walls[:3]) / max(1, len(walls[:3])), 2),
            "merge_s_last3_avg": round(sum(walls[-3:]) / max(1, len(walls[-3:])), 2),
            "merge_s_total": round(sum(walls), 2),
            "refits": refits,
            "refit_s_total": round(sum(r["refit_s"] for r in refits), 2),
            "final_pairs": spark.read.parquet(pairs_path).count(),
        }
    return arms


def probe_semantic_refit_loop(spark, work: str, replicas: int, batches: int):
    """The refit arm driven THROUGH the production loop (round-10
    verdict item 5): same 100× feed and same deliberately-stale initial
    book as :func:`probe_semantic_refit`, but every refit decision is
    made by ``maintain_semantic_dedup(refit_growth=2.0)`` itself —
    trigger on persisted ``fitted_n``, durable centroid book, atomic
    swaps — with each batch arriving as a real file-stream micro-batch
    (availableNow drain per appended file, re-attaching from the
    persisted state every time, exactly how a production ingestion loop
    runs).  Per-batch wall therefore INCLUDES stream startup/recovery
    and any refit the loop chose; ``fitted_n`` is read back from the
    durable book after each drain so the refit schedule the loop
    actually decided is part of the record."""
    from pyspark.sql import functions as F

    from tweets_spark_top_10_spark.functions.similarity import semdedup_centroids
    from tweets_spark_top_10_spark.streaming.semantic_dedup import (
        maintain_semantic_dedup,
    )

    vecs = _sd_feed(spark, work, replicas)
    n = vecs.count()
    per = (n + batches - 1) // batches
    import duckdb

    src = os.path.join(BASE, "embeddings.parquet")
    max_orig_id = duckdb.sql(
        f"SELECT MAX(vec_id) FROM read_parquet('{src}')"
    ).fetchone()[0]
    slice0 = vecs.filter(F.col("vec_id") <= max_orig_id)
    n0 = slice0.count()
    stale = semdedup_centroids(
        slice0, cand_id="vec_id", vec_col="vec"
    ).localCheckpoint(eager=True)

    feed_dir = os.path.join(work, f"sdl_feed_x{replicas}")
    os.makedirs(feed_dir)
    cells_path = os.path.join(work, f"sdl_cells_x{replicas}")
    pairs_path = os.path.join(work, f"sdl_pairs_x{replicas}")
    cents_path = os.path.join(work, f"sdl_cents_x{replicas}")
    ckpt = os.path.join(work, f"sdl_ckpt_x{replicas}")
    schema = vecs.schema
    per_batch = []
    fitted_trail = []
    for b in range(batches):
        # stage batch b as one new file in the stream source dir
        batch_pdf = (
            vecs.filter(
                (F.col("vec_id") >= b * per) & (F.col("vec_id") < (b + 1) * per)
            )
            .toPandas()
        )
        batch_pdf.to_parquet(os.path.join(feed_dir, f"b{b:03d}.parquet"))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed_dir)
        )
        t0 = time.perf_counter()
        maintain_semantic_dedup(
            stream,
            stale,
            cells_path,
            pairs_path,
            checkpoint=ckpt,
            refit_growth=2.0,
            centroids_path=cents_path,
            fitted_on=n0,
        ).awaitTermination()
        wall = time.perf_counter() - t0
        fitted_n = (
            spark.read.parquet(cents_path).select("fitted_n").head()[0]
        )
        refitted = bool(fitted_trail) and fitted_n != fitted_trail[-1]
        fitted_trail.append(fitted_n)
        per_batch.append(
            {
                "batch": b,
                "drain_s": round(wall, 2),
                "fitted_n": fitted_n,
                "loop_refitted": refitted or (b == 0 and fitted_n != n0),
            }
        )
        print(
            f"sd-refit-loop x{replicas} batch {b}: {per_batch[-1]}", flush=True
        )
    walls = [r["drain_s"] for r in per_batch]
    return {
        "per_batch": per_batch,
        "drain_s_first3_avg": round(sum(walls[:3]) / max(1, len(walls[:3])), 2),
        "drain_s_last3_avg": round(sum(walls[-3:]) / max(1, len(walls[-3:])), 2),
        "drain_s_total": round(sum(walls), 2),
        "loop_refits": [
            {"after_batch": r["batch"], "fitted_n": r["fitted_n"]}
            for r in per_batch
            if r["loop_refitted"]
        ],
        "initial_fitted_n": n0,
        "final_pairs": spark.read.parquet(pairs_path).count(),
    }


def _docs_feed(spark, work: str, replicas: int):
    """Content-disjoint x``replicas`` document corpus: per-replica
    token tagging after punctuation sanitization (the
    scale_probe_100x documents protocol), so replicas multiply the
    VOCABULARY — the dimension the BPE word table grows with."""
    import duckdb

    src = os.path.join(BASE, "documents.parquet")
    feed_path = os.path.join(work, f"bpe_feed_x{replicas}.parquet")
    if not os.path.exists(feed_path):
        duckdb.sql(f"""
          COPY (
            SELECT d.doc_id + r.k * (SELECT MAX(doc_id)+1 FROM read_parquet('{src}')) AS doc_id,
                   array_to_string(
                     list_transform(
                       string_split(regexp_replace(d.text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
                       x -> 'r' || r.k || x), ' ') AS text
            FROM read_parquet('{src}') d,
                 (SELECT UNNEST(RANGE({replicas})) AS k) r
          ) TO '{feed_path}' (FORMAT PARQUET)
        """)
    return spark.read.parquet(feed_path)


def probe_bpe_vocab(
    spark, work: str, replicas: int, batches: int,
    merges: int = 8, growth: float = 2.0,
):
    """Replay documents x``replicas`` through the streaming BPE vocab
    maintainer (``streaming/bpe.bpe_step`` — the identical per-batch
    body the foreachBatch wiring runs) and record, per batch, the
    fold+decide+relearn wall, whether the growth trigger fired, and
    the word-table footprint.  The quantities that decide 100 TB
    viability: fold wall must track BATCH size (not accumulated corpus
    — the union+groupBy rewrites the Zipf table, which grows with
    vocabulary, not tokens), and relearns must thin out as fitted_n
    doubles."""
    from pyspark.sql import functions as F

    from tweets_spark_top_10_spark.streaming.bpe import bpe_step

    feed = _docs_feed(spark, work, replicas)
    lo, hi = [
        int(x)
        for x in feed.agg(F.min("doc_id"), F.max("doc_id")).first()
    ]
    per = (hi - lo + batches) // batches
    state = os.path.join(work, f"bpe_state_x{replicas}")
    per_batch = []
    for b in range(batches):
        batch_df = feed.filter(
            (F.col("doc_id") >= lo + b * per)
            & (F.col("doc_id") < lo + (b + 1) * per)
        )
        t0 = time.perf_counter()
        tel = bpe_step(batch_df, state, "text", merges, growth, batch_id=b)
        wall = time.perf_counter() - t0
        per_batch.append(
            {
                "batch": b,
                "step_s": round(wall, 2),
                "relearned": tel["relearned"],
                "stored_tokens": tel["stored_tokens"],
                "words_mb": round(_du(os.path.join(state, "words")) / 1e6, 2),
            }
        )
        print(f"bpe x{replicas} batch {b}: {per_batch[-1]}", flush=True)
    walls = [r["step_s"] for r in per_batch]
    return {
        "per_batch": per_batch,
        "relearn_count": sum(1 for r in per_batch if r["relearned"]),
        "step_s_first3_avg": round(sum(walls[:3]) / max(1, len(walls[:3])), 2),
        "step_s_last3_avg": round(sum(walls[-3:]) / max(1, len(walls[-3:])), 2),
    }


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    work = tempfile.mkdtemp(prefix="stream_scale_")

    from tweets_spark_top_10_spark.session import get_spark

    spark = get_spark(
        app_name="stream-scale-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    mode = sys.argv[3] if len(sys.argv) > 3 else "mg,sd"
    results = {}
    if "mg" in mode:
        for tag, reps in (("1x", 1), (f"{replicas}x", replicas)):
            results[f"windowed_mg_{tag}"] = probe_windowed_mg(
                spark, work, reps, batches, capacity=64
            )
            spark.catalog.clearCache()
    if "sd" in mode:
        for tag, reps in (("1x", 1), (f"{replicas}x", replicas)):
            results[f"semantic_dedup_{tag}"] = probe_semantic_dedup(
                spark, work, reps, batches
            )
            spark.catalog.clearCache()
    if "refit" in mode:
        results[f"semantic_refit_{replicas}x"] = probe_semantic_refit(
            spark, work, replicas, batches
        )
        spark.catalog.clearCache()
    if "loop" in mode:
        results[f"semantic_refit_loop_{replicas}x"] = probe_semantic_refit_loop(
            spark, work, replicas, batches
        )
        spark.catalog.clearCache()
    if "bpe" in mode:
        for tag, reps in (("1x", 1), (f"{replicas}x", replicas)):
            results[f"bpe_vocab_{tag}"] = probe_bpe_vocab(
                spark, work, reps, batches
            )
            spark.catalog.clearCache()

    print(json.dumps(results))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
