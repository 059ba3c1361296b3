#!/usr/bin/env python
"""Benchmark harness: run the catalog's headline queries and print ONE
JSON line — a compact summary sized to survive the driver's ~2000-char
stdout-tail capture.  The full record (per-query map, pq curve, 10x
ratios, deltas) is persisted to BENCH_FULL.json and appended to
BENCH_HISTORY.jsonl; stdout carries ONLY the compact line (round-10
advice: two stdout objects broke whole-stdout json.loads consumers).

Inputs:   $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
Parallel: local[$SPARK_GRAFT_CPUS] (default 32)

Materialization is a noop-format write — full execution on executors,
zero driver collect, so timings measure the plan, not py4j transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tweets_spark_top_10_spark.session import get_spark  # noqa: E402

# The 5 queries that TRAIN a codebook/centroid artifact inline — the
# in-query-training twins of the *_prebuilt serving queries.  Their
# k-means/OPQ iterations dominate this box's run-to-run bench variance
# (round-10 re-anchor: the 147.9-168.0 s spread was almost entirely
# these), so the composite is reported with and without them.
INLINE_TRAINING = frozenset(
    {
        "pq_adc_top5",
        "pq_adc_lloyd_top5",
        "pq_adc_opq_top5",
        "pq_adc_opq_rerank_top5",
        "ivfpq_adc_top5",
    }
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = get_spark(
        app_name=f"bench-sf{sf}",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from tweets_spark_top_10_spark.queries import QUERIES
    from tweets_spark_top_10_spark.sources.registry import TABLES, load_table

    # Warm up JVM/codegen/shuffle machinery and the page cache so the
    # first timed query doesn't absorb session startup.
    spark.range(10_000_000).groupBy((F.col("id") % 7).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()
    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    # The 60/64-column SimHash signature aggregates cost ~4s of one-time
    # Catalyst/JIT work on first execution; compile them here on 10 rows
    # so the timed sketch queries measure execution, not compilation.
    from tweets_spark_top_10_spark.functions.dedup import simhash64, simhash_md5

    for _sig in (simhash64, simhash_md5):
        _sig(
            spark.range(10).select(
                F.col("id").alias("doc_id"), F.lit("warm up tokens").alias("text")
            )
        ).write.format("noop").mode("overwrite").save()

    # Box-speed calibration (round-14 verdict item 2): a fixed pure-JVM
    # shuffle-free workload timed right after warmup.  `calib_s` rides
    # on every history line so a wall-regime shift (the 95.8 s -> 120 s
    # era move that cost two rounds of control runs) is separable from
    # a code regression by arithmetic: walls moving WITH calib = host;
    # walls moving AGAINST flat calib = code.
    try:
        from tools.calibration import calibrate, calibrate_shuffle

        calib_s = calibrate(spark)
        # shuffle-tier sample (r15 closing): the CPU workload missed an
        # IO/memory-path slowdown that inflated 44/147 queries ~1.6x —
        # this second number tracks the exchange path (telemetry only
        # until a baseline accumulates)
        calib_shuffle_s = calibrate_shuffle(spark)
    except Exception as exc:  # calibration is telemetry, not the bench
        print(f"# calibration failed: {exc}", file=sys.stderr)
        calib_s = None
        calib_shuffle_s = None

    calib = {"calib_s": calib_s, "calib_shuffle_s": calib_shuffle_s}

    # Two passes, report the MIN per query: single-shot wall times on
    # this box swing 2-5x from CPU-steal/GC noise (an identical trivial
    # groupBy measured 1.9s and 5.0s in back-to-back runs); min-of-N is
    # the standard noise-robust wall-time estimator and N=2 keeps the
    # bench under the round budget.
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in sorted(QUERIES):
            fn = QUERIES[name]
            start = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                t = round(time.perf_counter() - start, 3)
                prev_t = timings.get(name)
                # min over SUCCESSFUL passes only: a failure marker from
                # pass 1 must not beat a clean pass-2 time.
                timings[name] = t if prev_t in (None, -1.0) else min(prev_t, t)
            except Exception as exc:  # keep the bench line parseable on failure
                # ... and a transient pass-2 failure must not erase a
                # valid pass-1 measurement.
                timings.setdefault(name, -1.0)
                print(f"# bench failure {name}: {exc}", file=sys.stderr)
            finally:
                # Queries that persist() intermediates (dedup sketches,
                # CC) cannot unpersist before their lazy result
                # materializes, so the bench drops leftover blocks here —
                # otherwise caches accumulate across 70+ queries and GC
                # pressure inflates every later timing (measured +5s on
                # unrelated queries).  Block eviction is async and a
                # major GC can land mid-next-query, so force the
                # collection and settle with a no-op action while the
                # clock is NOT running.
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                spark.range(1).count()

    # END-of-run calibration sample (r15 run-2 lesson: the run-start
    # sample mispairs with walls measured many minutes later under a
    # different host regime).  The gate below normalizes by the MOST
    # FORGIVING of the start/end x cpu/shuffle ratios, so a regime that
    # shifted mid-run — in either tier — still reads as host weather.
    try:
        from tools.calibration import calibrate, calibrate_shuffle

        calib["calib_end_s"] = calibrate(spark, passes=3)
        calib["calib_shuffle_end_s"] = calibrate_shuffle(spark, passes=2)
    except Exception as exc:
        print(f"# end calibration failed: {exc}", file=sys.stderr)

    # PQ recall/latency curve: coarse -> fine decompositions of the same
    # 64-dim space, each timed and scored against the exact cosine scan.
    pq_curve = _pq_recall_curve(spark, sf_dir)

    # RP curve: IVF served in the original 64-dim space vs JL-projected
    # 16-dim IVF + exact rerank — the dim/d_out index-cost-cut claim of
    # rp_project, measured per round (round-13 verdict item 4).
    rp_curve = _rp_recall_curve(spark, sf_dir)

    # 10x scale trend (round-7 verdict item 8: track scale runs as bench
    # artifacts, not one-off tables): replicate embeddings 10x
    # content-disjointly and re-time the two scale-critical vector
    # queries.  semantic_dedup_keep is THE query whose 10x ratio was the
    # round-7 perf-weak item (4.5x, fixed to <2x in round 8) — tracking
    # it here makes a regression visible the round it happens.
    scale_10x = _scale_10x(spark, sf_dir, timings)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # Split composite (round-10 verdict item: make the headline
    # regression-comparable).  The inline-codebook-training queries —
    # exactly the in-query-training twins of the *_prebuilt serving
    # queries — carry ±2-4 s/run of k-means/OPQ training noise on this
    # box; everything else is stable.  Report the catalog wall EXCLUDING
    # them and the training family separately, and regress each on its
    # own anchor (BASELINE.md "Round-11 split composite").
    training = {
        n: t for n, t in timings.items() if n in INLINE_TRAINING
    }
    total_excl = round(
        sum(t for n, t in timings.items() if t >= 0 and n not in INLINE_TRAINING),
        3,
    )
    total_training = round(sum(t for t in training.values() if t >= 0), 3)
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    # `value` is THIS run's measurement (null when any query failed —
    # a deflated partial total must not masquerade as the headline;
    # round-7 advisor finding).  The cross-round noise guard — min
    # total across failure-free history runs with the IDENTICAL query
    # set at this sf (this box swings 95-117s on identical code from
    # CPU steal) — is reported separately as `value_stable`.
    clean_run = all(t >= 0 for t in timings.values())
    stable = _stable_total(
        repo_dir, float(sf), set(timings), total if clean_run else None
    )
    # The policy-aligned stable floor: min excl-training composite over
    # comparable runs (value_stable's min-of-totals preserves an
    # r8-era box-luck line — 117.7 s — that the round-10 re-anchor
    # discredited as a code-level reference; training noise is exactly
    # what that min is made of).
    stable_excl = _stable_total(
        repo_dir,
        float(sf),
        set(timings),
        total_excl if clean_run else None,
        key="total_excl_training",
    )
    out = {
        "metric": "catalog_total_wall",
        "value": total if clean_run else None,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "cpus": int(cpus),
        "timing": "min_of_2_passes",
        "clean_run": clean_run,
        "value_stable": stable,
        "value_stable_excl_training": stable_excl,
        "value_excl_training": total_excl if clean_run else None,
        "value_training": total_training if clean_run else None,
        "training_queries": sorted(INLINE_TRAINING & set(timings)),
        "calib_s": calib_s,
        "calib_shuffle_s": calib_shuffle_s,
        "calib_end_s": calib.get("calib_end_s"),
        "calib_shuffle_end_s": calib.get("calib_shuffle_end_s"),
        "value_note": "value = this run's total (null if any query failed); "
        "value_stable = min over history runs with identical query set; "
        "value_stable_excl_training = same min over the excl-training "
        "composite (the policy-aligned floor); "
        "value_excl_training/value_training = split composite (the "
        "inline-codebook-training family is the box's noise source)",
    }
    if pq_curve:
        out["pq_curve"] = pq_curve
    if rp_curve:
        out["rp_curve"] = rp_curve
    if scale_10x:
        out["scale_10x"] = scale_10x

    # Regression tracking: per-query delta vs the newest prior run —
    # self-recorded history first (BENCH_HISTORY.jsonl, complete and
    # uncut), else the newest driver BENCH_r*.json (whose 2000-char tail
    # often truncates away the timings). Only comparable at the same sf.
    prev = _own_history_timings(repo_dir, float(sf)) or _latest_round_timings(
        repo_dir, float(sf)
    )
    if prev:
        ref_name, ref_q, ref_calib = prev
        out["delta_vs"] = ref_name
        out["delta_s"] = {
            n: round(t - ref_q[n], 3)
            for n, t in timings.items()
            if n in ref_q and t >= 0 and ref_q[n] >= 0
        }
        # Calibrated gate (r15, two-tier since r16): scale the reference
        # walls by the box-speed ratio before flagging — a host regime
        # shift moves calib with the walls and stops reading as dozens
        # of per-query regressions, while a code regression moves the
        # ratio and flags exactly as before.  The scale is the MOST
        # FORGIVING of the available tier ratios (CPU and shuffle, start
        # and end samples): the r15 close anchor proved the CPU tier
        # alone is blind to IO/memory-path weather (44/147 queries 1.6x
        # with calib flat 0.977), and the run-start sample alone
        # mispairs with walls measured minutes later.  A real code
        # regression moves NO calibration, so every ratio stays ~1 and
        # the gate is unchanged for it.  delta_s stays RAW (history
        # consumers compare absolute walls); only the flag threshold is
        # calibrated.
        scale, tiers = regression_scale(calib, ref_calib)
        if tiers:
            out["calib_scale"] = round(scale, 3)
            out["calib_scale_tiers"] = tiers
        regressed = sorted(
            (
                n
                for n, d in out["delta_s"].items()
                if timings[n] - scale * ref_q[n]
                > max(0.5, 0.5 * scale * ref_q[n])
            ),
            key=lambda n: -out["delta_s"][n],
        )
        out["regressed"] = regressed
    note = os.environ.get("SPARK_GRAFT_BENCH_NOTE")
    if note:
        out["note"] = note

    # The driver's artifact capture keeps only the TAIL of stdout
    # (~2000 chars), which truncated a full-record line from the front
    # (BENCH_r09.json landed with parsed=null) — and printing the full
    # record AND a compact one broke whole-stdout json.loads consumers
    # (round-10 advice).  So stdout carries ONLY this compact summary,
    # and the full record lives in BENCH_FULL.json + BENCH_HISTORY.jsonl.
    compact = {
        k: out[k]
        for k in (
            "metric", "value", "unit", "sf", "cpus", "timing",
            "clean_run", "value_stable", "value_stable_excl_training",
            "value_excl_training", "value_training", "calib_s",
            "calib_shuffle_s", "calib_end_s", "calib_shuffle_end_s",
            "calib_scale", "calib_scale_tiers", "note",
        )
        if k in out
    }
    if "regressed" in out:
        # keep the compact line inside the ~2000-char capture window
        # even on a catastrophic run: first 10 names + the full count
        compact["regressed_n"] = len(out["regressed"])
        compact["regressed"] = out["regressed"][:10]
    if out.get("delta_s"):
        # r17 (verdict item 5): the driver's tail capture sees only this
        # compact line, so give its regression analysis SOME per-query
        # signal — the 10 largest |delta| vs the reference run, raw
        # seconds (same sign convention as delta_s).  ~350 chars.
        top = sorted(out["delta_s"].items(), key=lambda kv: -abs(kv[1]))[:10]
        compact["delta_top"] = dict(top)
    compact["queries_n"] = len(timings)
    compact["detail"] = "per-query map in BENCH_FULL.json + BENCH_HISTORY.jsonl"
    try:  # write AFTER printing so a full disk can't eat the result
        with open(os.path.join(repo_dir, "BENCH_FULL.json"), "w") as fh:
            json.dump(out, fh)
        rec = {
            "sf": float(sf),
            "total": total,
            "total_excl_training": total_excl,
            "total_training": total_training,
            "calib_s": calib_s,
            "calib_shuffle_s": calib_shuffle_s,
            "calib_end_s": calib.get("calib_end_s"),
            "calib_shuffle_end_s": calib.get("calib_shuffle_end_s"),
            "queries": timings,
        }
        if note:
            rec["note"] = note
        if pq_curve:  # build/query split tracked per round (r8 item 4)
            rec["pq_curve"] = pq_curve
        if rp_curve:  # dim-reduction build/query split (r13 item 4)
            rec["rp_curve"] = rp_curve
        with open(os.path.join(repo_dir, "BENCH_HISTORY.jsonl"), "a") as fh:
            fh.write(json.dumps(rec) + "\n")
    except OSError:
        pass
    print(json.dumps(compact))


def regression_scale(
    cur: dict, ref: dict | None
) -> tuple[float, dict[str, float]]:
    """Host-speed scale for the per-query regression gate: the MAX of
    the available calibration-tier ratios, so a wall inflation that any
    measured host tier can explain is not flagged as a code regression.

    Tiers (each present only when BOTH runs carry the sample):

    - ``cpu``:     max(calib_s, calib_end_s) / ref calib_s — the
      pure-JVM compute regime, sampled at run start AND after the timed
      passes (the r15 run-2 mispairing lesson).
    - ``shuffle``: max(calib_shuffle_s, calib_shuffle_end_s) / ref
      calib_shuffle_s — the exchange write+read path the CPU tier is
      blind to (the r15 close anchor: 44/147 queries 1.6x with CPU
      calib flat 0.977).

    A code regression moves NO calibration, so every ratio stays ~1 and
    the gate behaves exactly as uncalibrated.  Returns (scale, tiers);
    scale = 1.0 and tiers = {} when no tier is comparable (pre-r15
    reference or failed calibration)."""
    tiers: dict[str, float] = {}
    ref = ref or {}

    def _ratio(cur_keys: tuple[str, ...], ref_key: str) -> float | None:
        r = ref.get(ref_key)
        samples = [
            cur.get(k)
            for k in cur_keys
            if isinstance(cur.get(k), (int, float)) and cur.get(k) > 0
        ]
        if not samples or not isinstance(r, (int, float)) or r <= 0:
            return None
        return max(samples) / r

    cpu = _ratio(("calib_s", "calib_end_s"), "calib_s")
    if cpu is not None:
        tiers["cpu"] = round(cpu, 3)
    shuffle = _ratio(("calib_shuffle_s", "calib_shuffle_end_s"), "calib_shuffle_s")
    if shuffle is not None:
        tiers["shuffle"] = round(shuffle, 3)
    if not tiers:
        return 1.0, {}
    return max(tiers.values()), tiers


def _stable_total(
    repo_dir: str,
    sf: float,
    query_set: set,
    current: float | None,
    key: str = "total",
):
    """Min `key` across failure-free BENCH_HISTORY.jsonl runs at this sf
    whose query set is IDENTICAL to the current catalog (older/newer
    catalogs are not comparable), the current run included when it is
    itself failure-free (pass None otherwise). None if nothing
    comparable exists.  key="total_excl_training" gives the
    POLICY-ALIGNED stable reference (BASELINE.md round-11 split
    composite: totals swing on ANN-training noise; the excl-training
    composite is the regression quantity)."""
    path = os.path.join(repo_dir, "BENCH_HISTORY.jsonl")
    best = current if current is not None else float("inf")
    found = current is not None
    try:
        with open(path) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                q = rec.get("queries")
                if (
                    float(rec.get("sf", -1)) == sf
                    and isinstance(q, dict)
                    and set(q) == query_set
                    # a run with ANY failed query (timing -1, excluded
                    # from its total) is not comparable: its deflated
                    # total would become the headline min forever
                    and all(
                        isinstance(t, (int, float)) and t >= 0
                        for t in q.values()
                    )
                    and isinstance(rec.get(key), (int, float))
                ):
                    found = True
                    best = min(best, float(rec[key]))
    except OSError:
        return None
    return round(best, 3) if found else None


def _own_history_timings(repo_dir: str, sf: float):
    """('bench history', {query: sec}, {calib_s, calib_shuffle_s}) from
    the last BENCH_HISTORY.jsonl line at this sf, or None."""
    path = os.path.join(repo_dir, "BENCH_HISTORY.jsonl")
    try:
        with open(path) as fh:
            lines = fh.read().splitlines()
    except OSError:
        return None
    for line in reversed(lines):
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if float(rec.get("sf", -1)) == sf and isinstance(rec.get("queries"), dict):
            return (
                "bench history",
                rec["queries"],
                {
                    "calib_s": rec.get("calib_s"),
                    "calib_shuffle_s": rec.get("calib_shuffle_s"),
                },
            )
    return None


def _scale_10x(spark, sf_dir: str, timings: dict) -> dict:
    """10x scale ratios for the scale-critical vector queries.

    Embeddings are replicated 10x with shifted ids (content-disjoint)
    into a temp dir that only holds embeddings.parquet — both probed
    queries read nothing else.  The 1x number is the catalog timing
    already measured this run; only the 10x side costs new wall
    (~10-15s total).  Failure is telemetry, never a bench failure.
    """
    import shutil
    import tempfile

    probes = ["semantic_dedup_keep", "pq_adc_top5_prebuilt"]
    work = None
    try:
        import duckdb

        from tweets_spark_top_10_spark.queries import QUERIES

        work = tempfile.mkdtemp(prefix="bench_scale10x_")
        src = os.path.join(sf_dir, "embeddings.parquet")
        # Content-disjoint replication: replica k is the CYCLIC SHIFT of
        # the original vector by k dims (norm-preserving, near-zero
        # cosine to other replicas of the same vector) — plain id
        # shifting with duplicate vectors would guarantee 10 identical
        # copies per cell and measure duplicate-pair explosion, not
        # corpus growth (round-8 review finding).
        duckdb.sql(f"""
          COPY (
            SELECT e.vec_id + r.k * (SELECT MAX(vec_id)+1 FROM read_parquet('{src}')) AS vec_id,
                   e.label,
                   e.embedding[r.k + 1:] || e.embedding[:r.k] AS embedding
            FROM read_parquet('{src}') e, (SELECT UNNEST(RANGE(10)) AS k) r
          ) TO '{work}/embeddings.parquet' (FORMAT PARQUET)
        """)
        out = {}
        for name in probes:
            t1 = timings.get(name)
            if t1 is None or t1 < 0:
                continue
            fn = QUERIES[name]
            fn(spark, work).write.format("noop").mode("overwrite").save()  # warm
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, work).write.format("noop").mode("overwrite").save()
                t = time.perf_counter() - t0
                best = t if best is None else min(best, t)
            out[name] = {
                "x1_s": t1,
                "x10_s": round(best, 3),
                "ratio": round(best / t1, 2) if t1 > 0 else None,
            }
            spark.catalog.clearCache()
        return out
    except Exception as exc:
        print(f"# scale_10x probe failure: {exc}", file=sys.stderr)
        return {}
    finally:
        if work is not None:
            # the *_prebuilt probe built an index for the throwaway 10x
            # corpus under the user cache (unique fingerprint per run —
            # unbounded growth if left); drop both the corpus and its
            # cache entry
            try:
                from tweets_spark_top_10_spark.queries.similarity_queries import (
                    _pq_index_dir,
                )

                shutil.rmtree(_pq_index_dir(work), ignore_errors=True)
            except Exception:
                pass
            shutil.rmtree(work, ignore_errors=True)


def _pq_recall_curve(spark, sf_dir: str) -> list[dict]:
    """recall@5 + wall seconds for PQ/ADC at three (m, sub_dim) points
    against the exact cosine top-5 — the compression/accuracy tradeoff
    the PQ operator exists to navigate."""
    import time

    from pyspark.sql import functions as F

    from tweets_spark_top_10_spark.functions.pq import pq_adc_topk
    from tweets_spark_top_10_spark.functions.similarity import (
        brute_force_knn,
        l2_norm,
    )
    from tweets_spark_top_10_spark.sources.registry import load_table

    try:
        emb = load_table(spark, sf_dir, "embeddings")
        n = l2_norm(F.col("embedding"))
        normed = emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double") / n).alias(
                "embedding"
            ),
        )
        q = normed.filter(F.col("vec_id") < 10).withColumnRenamed(
            "vec_id", "query_id"
        )
        c = normed.filter(F.col("vec_id") >= 10).withColumnRenamed(
            "vec_id", "neighbor_id"
        ).repartition(spark.sparkContext.defaultParallelism)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_knn(q, c, k=5).collect()
        }
        from tweets_spark_top_10_spark.functions.pq import (
            apply_permutation,
            opq_permutation,
            pq_codebook,
            pq_codebook_refine,
            pq_codebook_shift,
        )

        # Build vs query split (round-8 verdict item 4): every trained
        # artifact (Lloyd codebooks, OPQ permutation, permuted corpus)
        # is materialized EAGERLY with its wall time recorded, so each
        # curve point can report {build_s, query_s} — a serving-path
        # regression is no longer hidden under training noise.  build_s
        # is cumulative over the artifacts the point depends on.
        def _built(df):
            t0 = time.perf_counter()
            out = df.localCheckpoint(eager=True)
            return out, round(time.perf_counter() - t0, 3)

        seed_cb, seed_b = _built(pq_codebook(c))
        lloyd_cb, l1_b = _built(pq_codebook_refine(c, seed_cb))
        # Multi-iteration Lloyd convergence: mean centroid displacement
        # per iteration (should shrink) + the recall it buys.
        lloyd2_cb, l2_b = _built(pq_codebook_refine(c, lloyd_cb))
        shifts = []
        for before, after in [(seed_cb, lloyd_cb), (lloyd_cb, lloyd2_cb)]:
            row = pq_codebook_shift(before, after, sub_dim=4).collect()[0]
            shifts.append(round(float(row["mean_shift"]), 6))
        # OPQ-style permuted space: snake variance allocation, 1 Lloyd.
        perm, perm_b = _built(opq_permutation(c))
        qp = apply_permutation(q, "query_id", perm)
        cp, cp_b = _built(
            apply_permutation(c, "neighbor_id", perm).repartition(
                spark.sparkContext.defaultParallelism
            )
        )
        opq_seed, opq_seed_b = _built(pq_codebook(cp))
        opq_cb, opq_b = _built(pq_codebook_refine(cp, opq_seed))
        opq_build = round(perm_b + cp_b + opq_seed_b + opq_b, 3)
        from tweets_spark_top_10_spark.functions.pq import pq_adc_rerank_topk

        curve = []
        # ADC shortlist-32 + exact rerank (Jegou'11 IVFADC-R): the
        # recall a fixed 16-byte code budget reaches once serving
        # reranks 32 fetched vectors per query (round-8 verdict item 5)
        start = time.perf_counter()
        rr = {
            (r.query_id, r.neighbor_id)
            for r in pq_adc_rerank_topk(
                qp, cp, k=5, shortlist=32, codebook=opq_cb,
                rerank_queries=q, rerank_candidates=c,
            ).collect()
        }
        curve.append({
            "m": 16, "sub_dim": 4, "codebook": "opq+lloyd1+rerank32",
            "recall_at5": round(len(exact & rr) / len(exact), 3),
            "build_s": opq_build,
            "query_s": round(time.perf_counter() - start, 3),
        })
        for m, sub_dim, cb, qq, cc, label, build_s in [
            # codebook=None: the strided seed book is built inline — a
            # pure projection, part of the scan by design (build_s 0).
            (4, 16, None, q, c, None, 0.0),
            (8, 8, None, q, c, None, 0.0),
            (16, 4, None, q, c, None, 0.0),
            (16, 4, lloyd_cb, q, c, "lloyd1", seed_b + l1_b),
            (16, 4, lloyd2_cb, q, c, "lloyd2", seed_b + l1_b + l2_b),
            (16, 4, opq_cb, qp, cp, "opq+lloyd1", opq_build),
        ]:
            start = time.perf_counter()
            approx = {
                (r.query_id, r.neighbor_id)
                for r in pq_adc_topk(
                    qq, cc, k=5, m=m, sub_dim=sub_dim, codebook=cb
                ).collect()
            }
            point = {
                "m": m,
                "sub_dim": sub_dim,
                "recall_at5": round(len(exact & approx) / len(exact), 3),
                "build_s": round(build_s, 3),
                "query_s": round(time.perf_counter() - start, 3),
            }
            if label is not None:
                point["codebook"] = label
            curve.append(point)
        curve.append({"lloyd_mean_shift_per_iter": shifts})
        spark.catalog.clearCache()
        return curve
    except Exception as exc:  # the curve is telemetry, never a bench failure
        print(f"# pq curve failure: {exc}", file=sys.stderr)
        return []


def _rp_recall_curve(spark, sf_dir: str) -> list[dict]:
    """recall@5 + build/query split for IVF served in the ORIGINAL
    64-dim space vs JL-projected 16-dim IVF + exact original-space
    rerank — the dim/d_out index-cost cut ``rp_project`` claims.
    build = centroid book + 1-probe cell assignment, eagerly
    materialized and timed; query = probe + rank (+ rerank)."""
    import time

    from pyspark.sql import functions as F

    from tweets_spark_top_10_spark.functions.similarity import (
        brute_force_knn,
        ivf_assign_cells,
        ivf_centroids,
        ivf_knn,
        rp_array,
        rp_ivf_rerank_knn,
    )
    from tweets_spark_top_10_spark.sources.registry import load_table

    try:
        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        c = (
            emb.filter(F.col("vec_id") >= 10)
            .select(F.col("vec_id").alias("neighbor_id"), "embedding")
            .repartition(spark.sparkContext.defaultParallelism)
        )
        exact = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_knn(q, c, k=5).collect()
        }

        def _built(df):
            t0 = time.perf_counter()
            out = df.localCheckpoint(eager=True)
            return out, round(time.perf_counter() - t0, 3)

        curve = []
        cents64, b1 = _built(ivf_centroids(c, "neighbor_id", "embedding", 16))
        cells64, b2 = _built(
            ivf_assign_cells(c, cents64, "neighbor_id", "embedding", n_probe=1)
        )
        t0 = time.perf_counter()
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_knn(
                q, c, k=5, n_cells=16, n_probe=4,
                centroids=cents64, cand_cells=cells64,
            ).collect()
        }
        curve.append({
            "space": "ivf_orig64",
            "recall_at5": round(len(exact & got) / len(exact), 3),
            "build_s": round(b1 + b2, 3),
            "query_s": round(time.perf_counter() - t0, 3),
        })

        # two projection points: 16 (the 4x cut, JL-worst-case recall on
        # the quasi-random fixture) and 32/50 (the catalog params)
        for d_out, shortlist in ((16, 20), (32, 50)):
            cp, b3 = _built(rp_array(c, "neighbor_id", d_out=d_out))
            cents_p, b4 = _built(
                ivf_centroids(cp, "neighbor_id", "rp_vec", 16)
            )
            cells_p, b5 = _built(
                ivf_assign_cells(
                    cp, cents_p, "neighbor_id", "rp_vec", n_probe=1
                )
            )
            t0 = time.perf_counter()
            got = {
                (r.query_id, r.neighbor_id)
                for r in rp_ivf_rerank_knn(
                    q, c, k=5, d_out=d_out, shortlist=shortlist,
                    centroids=cents_p, cand_cells=cells_p,
                ).collect()
            }
            curve.append({
                "space": f"rp{d_out}_ivf_rerank{shortlist}",
                "recall_at5": round(len(exact & got) / len(exact), 3),
                "build_s": round(b3 + b4 + b5, 3),
                "query_s": round(time.perf_counter() - t0, 3),
            })

        # Clustered-geometry point (r15): the quasi-random fixture is
        # the JL worst case; real corpora are clustered, where the
        # projection loses nothing (recall 1.0 measured at both d_out
        # points, BASELINE round-15).  Track the aggressive 4x cut on a
        # 10x clustered corpus per round so a recall regression in the
        # realistic regime is visible the round it happens.
        from tools.rp_clustered_probe import clustered_corpus

        corpus = clustered_corpus(spark, sf_dir, replicas=10).localCheckpoint(
            eager=True
        )
        qc = corpus.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        cc = (
            corpus.filter(F.col("vec_id") >= 10)
            .select(F.col("vec_id").alias("neighbor_id"), "embedding")
            .repartition(spark.sparkContext.defaultParallelism)
        )
        exact_c = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_knn(qc, cc, k=5).collect()
        }
        t0 = time.perf_counter()
        got = {
            (r.query_id, r.neighbor_id)
            for r in rp_ivf_rerank_knn(
                qc, cc, k=5, d_out=16, shortlist=20, n_cells=64
            ).collect()
        }
        curve.append({
            "space": "clustered10x_rp16_ivf_rerank20",
            "recall_at5": round(len(exact_c & got) / len(exact_c), 3),
            "query_s": round(time.perf_counter() - t0, 3),
        })
        spark.catalog.clearCache()
        return curve
    except Exception as exc:  # telemetry, never a bench failure
        print(f"# rp curve failure: {exc}", file=sys.stderr)
        return []


def _latest_round_timings(repo_dir: str, sf: float):
    """(filename, {query: sec}) from the newest BENCH_r*.json at this sf."""
    import glob
    import re

    best = None
    for path in glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as fh:
                rec = json.load(fh)
            if float(rec.get("sf", rec.get("parsed", {}).get("sf", -1) if isinstance(rec.get("parsed"), dict) else -1)) != sf:
                continue
            q = None
            parsed = rec.get("parsed")
            if isinstance(parsed, dict):
                q = parsed.get("queries")
            if q is None and isinstance(rec.get("queries"), dict):
                q = rec["queries"]
            if q is None and isinstance(rec.get("tail"), str):
                # tail is a fragment like '"queries": {...}, "sf": ...' —
                # decode just the first JSON object after the marker.
                tail = rec["tail"]
                idx = tail.find('"queries"')
                if idx >= 0:
                    brace = tail.find("{", idx)
                    if brace >= 0:
                        try:
                            q, _ = json.JSONDecoder().raw_decode(tail[brace:])
                        except ValueError:
                            q = None
                # A tail without the '"queries"' marker is truncated
                # from the front (it holds only the delta section, whose
                # pairs are DELTAS, not timings) — never recover those.
            if q and (best is None or int(m.group(1)) > best[0]):
                best = (int(m.group(1)), os.path.basename(path), q)
        except (ValueError, KeyError, OSError, IndexError):
            continue
    return (best[1], best[2], None) if best else None


if __name__ == "__main__":
    main()
