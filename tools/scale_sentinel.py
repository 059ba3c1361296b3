"""Standing 100x scale sentinel (round-11 verdict item 5).

The per-family 100x probes were run ad-hoc each round; a scale
regression therefore surfaced only when someone re-ran the right probe.
This tool makes a FIXED sentinel set (see ``SENTINEL_QUERIES``) —
spanning the scale-sensitive plan shapes — a once-per-round record: it reuses
``tools/scale_probe_100x.run_probe`` (same fixtures, same min-of-2
timing, same spill telemetry) and APPENDS one line to
``BENCH_HISTORY.jsonl``::

    {"kind": "scale_sentinel", "round": N, "replicas": 100,
     "sentinel": {query: {"1x": rec, "100x": rec, "ratio": r}},
     "regressed": [...], "note": $SPARK_GRAFT_BENCH_NOTE}

Sentinel set and why each is there:

- ``dedup_canonical_docs``   — shingle exchange + DF cap + banded pairs
  + star-contraction CC (the join-heaviest batch shape).
- ``semantic_dedup_keep``    — sqrt(N)-cell blocking, the O(N^1.5)
  contract whose ratio is SUPPOSED to be ~48x at 100x; the sentinel
  catches the contract breaking, not the superlinearity.
- ``minhash_lsh_candidates`` — banding + shuffled-hash exact rerank
  (the plan-hint-pinned shape that spilled 27.9 GB under sort-merge).
- ``lsh_knn_top5``           — map-only SRP banding + bounded (t, band)
  candidate join (the round-11 rewrite).
- ``regional_customer_revenue`` — the de-hinted TPC-H star join +
  per-customer pre-agg (15M customers / 60M lineitem at 100×; the
  shape a resurrected broadcast hint would OOM).
- ``user_sessions``          — gap sessionization over per-user
  windows (100× users, fixed time range — window-partitioning shape).
- ``pq_adc_top5_prebuilt``   — ANN serving scan over a prebuilt index;
  the ~flat-at-100× claim the training/serving split rests on.

Plus ONE streaming-maintenance row (round-12 verdict item 5 — state
growth was the only scale surface with no standing per-round record):
a 10x / 6-micro-batch ``maintain_semantic_dedup`` replay through
``tools/stream_scale_probe.probe_semantic_dedup`` (fixed full-corpus
quantizer, content-disjoint cyclic-shift feed).  Recorded under the
line's ``stream`` key; gated by :func:`classify_stream` — the final
accumulated pair count is DETERMINISTIC (fixed feed, seeded
quantizer), so any drift is a semantics/plan change and flags
immediately; cell-state bytes get the 10% plan gate; total merge wall
gets the same two-tier watch/escalate policy as the batch rows.  The
100x/10-batch production-loop replay (~407 s, BASELINE.md round-11)
stays an ad-hoc probe — this row is its per-round canary at ~1/8 the
cost, exercising the identical upsert path.

Regression rule (two-tier — calibrated by the round-12 seed pair,
where `minhash_lsh_candidates` measured 29.7 s then 47.9 s at 100x on
IDENTICAL code with byte-identical shuffle telemetry, so a pure-wall
1.5x gate is uninformative for the shuffle-heavy shapes):

1. **PLAN tier, immediate**: the 100x shuffle-read bytes drift >10%
   from the latest prior record, or spill appears where the prior had
   none.  The probe's replication is deterministic, so bytes moved are
   a plan/data property, not weather — any drift IS a plan change and
   flags the same round, regardless of wall.
2. **WALL tier, persistent**: the 100x wall exceeds ``REGRESS_FACTOR``
   (1.5) x the best prior wall with FLAT telemetry.  One such round is
   recorded as ``wall_watch`` (exit 0 — observed box noise reaches
   1.6x on the 15 GB-shuffle query); the SAME query wall-flagged in
   two consecutive sentinel rounds escalates to ``regressed`` — a
   sustained compute-only slowdown (e.g. a codegen or HOF regression)
   moves no bytes but does not clear either.  Since round 15 every
   line also records ``calib_s`` (tools/calibration.calibrate — a
   fixed pure-JVM shuffle-free workload timed at run start) and the
   wall tier compares walls NORMALIZED by it once calibrated priors
   exist: a host regime shift moves calib with the walls (no flag),
   a code regression moves the ratio (flags) — the r14 rebase debate
   becomes arithmetic.

First-ever rows cannot regress; they seed the reference.  The 1x/100x
ratio itself is NOT gated: each family's expected ratio differs by
design (2.5x map-only .. 48x O(N^1.5)) and is documented per-family in
BASELINE.md.

Usage::

    python tools/scale_sentinel.py [replicas]     # default 100
    python tools/scale_sentinel.py --no-stream    # batch rows only
    python tools/scale_sentinel.py --check        # no probe: report
                                                  # latest recorded round
Exit code 1 when any sentinel regressed (so round automation can trip).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HISTORY = os.path.join(REPO, "BENCH_HISTORY.jsonl")

SENTINEL_QUERIES = [
    "dedup_canonical_docs",
    "semantic_dedup_keep",
    "minhash_lsh_candidates",
    "lsh_knn_top5",
    "regional_customer_revenue",
    "user_sessions",
    "pq_adc_top5_prebuilt",
]
REGRESS_FACTOR = 1.5
STREAM_REPLICAS = 10
STREAM_BATCHES = 6


def current_round() -> int:
    """Rounds are numbered by driver artifacts: the round in progress
    is max(CORRECTNESS_r{N}) + 1 (the driver writes N's artifact at the
    END of round N)."""
    rounds = [
        int(m.group(1))
        for f in os.listdir(REPO)
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))
    ]
    return (max(rounds) + 1) if rounds else 1


def prior_records(
    replicas: int | None, rebased: bool = True
) -> list[dict]:
    """Prior sentinel lines in file order; ``replicas`` filters to one
    BATCH-probe replica count, ``None`` returns every line (the stream
    row always runs at STREAM_REPLICAS and filters for itself inside
    classify_stream — pre-filtering by the batch CLI argument would
    silently discard all stream history on a non-default run).

    **Rebase (round-14):** a ``{"kind": "scale_sentinel_rebase",
    "round": N, ...}`` line declares every sentinel record from rounds
    BEFORE N non-comparable FOR THE WALL TIER — records from round >= N
    (inclusive, so the rebasing round's own measurements seed the new
    reference) are kept; older ones are dropped from best-wall and
    consecutive-flag computation.  A rebase line is legitimate ONLY
    with an embedded same-hour control: the UNCHANGED last-certified
    commit re-probed in a worktree reproducing the inflated walls with
    byte-identical shuffle/spill telemetry (the r14 precedent: control
    read 90.8 s on dedup_canonical_docs vs HEAD's 68.1 against the
    r12-era 34.5 best — host regime shift, not code).  Wall-only
    escalations against a pre-shift best are exactly the false positive
    this exists to stop.

    PLAN/spill telemetry stays comparable forever, so the plan tier
    must NOT lose its reference to a rebase: pass ``rebased=False`` to
    get the full untruncated history (``classify``'s ``plan_priors``) —
    otherwise a rebase line landing before a post-rebase record exists
    for some query would leave that query's plan reference empty and a
    shuffle-byte drift silently unflagged for one round (the r15
    advisor finding)."""
    out: list[dict] = []
    rebase_round: int | None = None
    try:
        with open(HISTORY) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("kind") == "scale_sentinel_rebase" and isinstance(
                    rec.get("round"), int
                ):
                    rebase_round = max(rebase_round or 0, rec["round"])
                elif rec.get("kind") == "scale_sentinel" and (
                    replicas is None or rec.get("replicas") == replicas
                ):
                    out.append(rec)
    except OSError:
        pass
    if rebased and rebase_round is not None:
        out = [
            r
            for r in out
            if isinstance(r.get("round"), int) and r["round"] >= rebase_round
        ]
    return out


def _best_and_latest(
    priors: list[dict], tag: str
) -> tuple[dict[str, float], dict[str, dict]]:
    """Per query: min prior wall at `tag`, and the newest prior
    telemetry record (file order = chronological)."""
    best: dict[str, float] = {}
    latest_rec: dict[str, dict] = {}
    for rec in priors:
        for q, scales in rec.get("sentinel", {}).items():
            w = scales.get(tag, {}).get("wall_s")
            if isinstance(w, (int, float)):
                best[q] = min(best.get(q, float("inf")), w)
                latest_rec[q] = scales[tag]
    return best, latest_rec


def prior_best_100x(replicas: int) -> dict[str, float]:
    """Best (min) prior 100x wall per query from recorded sentinel
    lines at the same replica count."""
    best, _ = _best_and_latest(prior_records(replicas), f"{replicas}x")
    return best


def _earlier_round_wall_flags(
    priors: list[dict], cur_round: int | None
) -> set[str]:
    """Queries wall-flagged (watch or wall-tier regressed) in the
    newest prior record from a STRICTLY EARLIER round — the only
    precedent that can turn this round's slow wall into 'consecutive
    rounds'."""
    earlier = [
        r
        for r in priors
        if isinstance(r.get("round"), int)
        and (cur_round is None or r["round"] < cur_round)
    ]
    if not earlier:
        return set()
    last_round = max(r["round"] for r in earlier)
    last = [r for r in earlier if r["round"] == last_round][-1]
    return {
        e["query"]
        for e in last.get("regressed", [])
        if e.get("tier") == "wall"
    } | {
        e["query"]
        for e in last.get("wall_watch", [])
        # a watch the shuffle tier cleared is adjudicated host weather;
        # it stays visible in the record but is no escalation precedent
        if not e.get("cleared_by")
    }


def _best_rate(
    priors: list[dict], tag: str
) -> dict[str, float]:
    """Per query: min prior CALIBRATED wall (wall_s / calib_s) over
    priors that carry a calibration — the box-speed-normalized wall
    reference (round-14 verdict item 2).  A per-QUERY calib (the rec's
    own ``calib_s``, measured immediately before that query's timed
    passes — the r15 run-2 lesson: a single run-start calibration
    mispairs with walls measured an hour later under different load)
    takes precedence over the line-level one."""
    best: dict[str, float] = {}
    for rec in priors:
        line_c = rec.get("calib_s")
        for q, scales in rec.get("sentinel", {}).items():
            r = scales.get(tag, {})
            w = r.get("wall_s")
            c = r.get("calib_s", line_c)
            if (
                isinstance(w, (int, float))
                and isinstance(c, (int, float))
                and c > 0
            ):
                best[q] = min(best.get(q, float("inf")), w / c)
    return best


def _best_rate_shuffle(
    priors: list[dict], tag: str
) -> dict[str, float]:
    """Per query: min prior wall / LINE-LEVEL ``calib_shuffle_s`` over
    priors that carry the shuffle-tier calibration (r16: recorded since
    the round-15 close; the r16 line seeds the reference).  Only the
    line-level sample exists for this tier — no per-query shuffle
    calibration is recorded — so this reference is coarser than the
    CPU tier's; it exists to answer exactly one question the CPU tier
    cannot: is the exchange path degraded?"""
    best: dict[str, float] = {}
    for rec in priors:
        c = rec.get("calib_shuffle_s")
        if not (isinstance(c, (int, float)) and c > 0):
            continue
        for q, scales in rec.get("sentinel", {}).items():
            w = scales.get(tag, {}).get("wall_s")
            if isinstance(w, (int, float)):
                best[q] = min(best.get(q, float("inf")), w / c)
    return best


def classify(
    results: dict[str, dict],
    priors: list[dict],
    replicas: int,
    factor: float = REGRESS_FACTOR,
    cur_round: int | None = None,
    plan_priors: list[dict] | None = None,
    calib_s: float | None = None,
    calib_shuffle_s: float | None = None,
) -> tuple[list[dict], list[dict]]:
    """(regressed, wall_watch) per the two-tier rule in the module
    docstring.  `results` is run_probe output; `priors` the recorded
    sentinel lines (file order).  Pure so the tiers are unit-testable
    without a Spark run.

    `plan_priors` (default: `priors`) feeds the PLAN/spill reference —
    pass the FULL untruncated history here: bytes stay comparable
    across a wall-reference rebase, and without it a rebase landing
    before a post-rebase record exists for a query leaves that query's
    plan drift silently unflagged for one round (r15 advisor finding).

    `calib_s` is this run's box-speed calibration
    (tools/calibration.calibrate).  When both it and a calibrated
    prior exist for a query, the WALL tier compares CALIBRATED walls
    (wall / calib) — a host regime shift moves calib with the walls
    and does not flag; a code regression moves the ratio and flags as
    before.  Falls back to raw walls when either side lacks a
    calibration (pre-r15 history).

    `calib_shuffle_s` is this run's exchange-path calibration
    (tools/calibration.calibrate_shuffle, line-level).  When BOTH it
    and a shuffle-calibrated prior exist for a query, a CPU-tier wall
    flag must ALSO hold under the shuffle normalization
    (wall / calib_shuffle vs factor x best prior rate) to count — the
    r16 live lesson: dedup_canonical_docs read 2.0x per CPU-calib with
    byte-identical telemetry during an IO-path-degraded regime the
    pure-arithmetic tier cannot see (the same blind spot bench.py's
    regression_scale closes with its most-forgiving-tier rule).  With
    no shuffle reference (pre-r16 history) the CPU tier alone decides,
    exactly as before.

    Escalation reads the newest prior record from a STRICTLY EARLIER
    round than `cur_round` (a same-round re-run — which happens, three
    round-12 lines exist in history — must not turn one noisy wall
    into a 'consecutive-rounds' regression), and only its WALL-tier
    flags count: a plan/spill flag followed by a slow wall is two
    different symptoms, not a sustained compute slowdown."""
    tag = f"{replicas}x"
    best, _ = _best_and_latest(priors, tag)
    _, latest_rec = _best_and_latest(
        priors if plan_priors is None else plan_priors, tag
    )
    best_rate = _best_rate(priors, tag)
    best_rate_sh = _best_rate_shuffle(priors, tag)
    latest_flagged = _earlier_round_wall_flags(priors, cur_round)

    regressed: list[dict] = []
    wall_watch: list[dict] = []
    for q, scales in results.items():
        cur = scales.get(tag, {})
        ref = latest_rec.get(q)
        if ref is None:
            continue  # first-ever row seeds the reference
        # plan reference may exist (full history) while the rebased
        # wall reference is still empty — wall tier then just seeds
        wall, ref_best = cur.get("wall_s"), best.get(q)
        # PLAN tier: bytes moved are deterministic — drift is a plan
        # change, flagged immediately.  -1 marks a failed UI probe.
        cur_sh, ref_sh = cur.get("shuffle_read_mb", -1), ref.get(
            "shuffle_read_mb", -1
        )
        cur_spill = max(0, cur.get("spill_mem_mb", 0)) + max(
            0, cur.get("spill_disk_mb", 0)
        )
        ref_spill = max(0, ref.get("spill_mem_mb", 0)) + max(
            0, ref.get("spill_disk_mb", 0)
        )
        if cur_sh >= 0 and ref_sh >= 0 and abs(cur_sh - ref_sh) > 0.10 * max(
            ref_sh, 1.0
        ):
            regressed.append(
                {
                    "query": q,
                    "tier": "plan",
                    "shuffle_read_mb": cur_sh,
                    "prior_shuffle_read_mb": ref_sh,
                    "wall_100x_s": wall,
                }
            )
            continue
        if cur_spill > 0 and ref_spill == 0:
            regressed.append(
                {
                    "query": q,
                    "tier": "spill",
                    "spill_mb": round(cur_spill, 1),
                    "wall_100x_s": wall,
                }
            )
            continue
        # WALL tier: flat telemetry — one round is watch, two is real.
        # Calibrated comparison when both sides carry a calibration
        # (wall/calib vs best prior wall/calib); raw walls otherwise.
        if not isinstance(wall, (int, float)):
            continue
        rate_ref = best_rate.get(q)
        # per-query calibration (measured right before this query's
        # timed passes) beats the run-start line-level sample
        cur_calib = cur.get("calib_s", calib_s)
        if cur_calib and rate_ref is not None:
            flagged = (wall / cur_calib) > factor * rate_ref
            entry = {
                "query": q,
                "tier": "wall",
                "wall_100x_s": wall,
                "calib_s": cur_calib,
                "wall_per_calib": round(wall / cur_calib, 2),
                "prior_best_per_calib": round(rate_ref, 2),
            }
            # shuffle-tier veto: a CPU-tier flag that the exchange-path
            # normalization fully explains is host weather, not code
            sh_ref = best_rate_sh.get(q)
            if flagged and calib_shuffle_s and sh_ref is not None:
                sh_flagged = (wall / calib_shuffle_s) > factor * sh_ref
                entry["wall_per_calib_shuffle"] = round(
                    wall / calib_shuffle_s, 2
                )
                entry["prior_best_per_calib_shuffle"] = round(sh_ref, 2)
                if not sh_flagged:
                    entry["cleared_by"] = "shuffle_tier"
                    wall_watch.append(entry)  # visible, but never escalates
                    continue
        elif ref_best is not None:
            flagged = wall > factor * ref_best
            entry = {
                "query": q,
                "tier": "wall",
                "wall_100x_s": wall,
                "prior_best_s": ref_best,
            }
        else:
            continue  # no wall reference yet: this run seeds it
        if flagged:
            if q in latest_flagged:
                entry["consecutive"] = True
                regressed.append(entry)
            else:
                wall_watch.append(entry)
    return regressed, wall_watch


def run_stream_row(
    replicas: int = STREAM_REPLICAS, batches: int = STREAM_BATCHES
) -> dict:
    """One streaming-maintenance sentinel row: replay a 10x
    content-disjoint embedding corpus through
    ``upsert_semantic_pairs_batch`` in ``batches`` micro-batches
    against a fixed full-corpus quantizer (the exact
    ``probe_semantic_dedup`` protocol, BASELINE.md round-9) and
    compress the per-batch telemetry into one record."""
    import shutil
    import tempfile

    try:
        from tools.stream_scale_probe import probe_semantic_dedup
    except ImportError:  # run as a script: sys.path[0] is tools/
        from stream_scale_probe import probe_semantic_dedup

    from tweets_spark_top_10_spark.session import get_spark

    spark = get_spark(
        app_name="scale-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "24g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        from tools.calibration import calibrate
    except ImportError:  # run as a script: sys.path[0] is tools/
        from calibration import calibrate

    # temporally-local box-speed sample, right before the replay (the
    # r15 run-2 lesson: the run-start calib mispairs an hour later)
    stream_calib = calibrate(spark, passes=3)
    work = tempfile.mkdtemp(prefix="stream_sentinel_")
    try:
        res = probe_semantic_dedup(spark, work, replicas, batches)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    per = res["per_batch"]
    return {
        "query": "maintain_semantic_dedup",
        "replicas": replicas,
        "batches": batches,
        "calib_s": stream_calib,
        "merge_total_s": round(sum(r["merge_s"] for r in per), 2),
        "first3_avg_s": res["merge_s_first3_avg"],
        "last3_avg_s": res["merge_s_last3_avg"],
        "final_pairs_rows": per[-1]["pairs_rows"],
        "final_cells_mb": per[-1]["cells_mb"],
    }


def classify_stream(
    cur: dict,
    priors: list[dict],
    factor: float = REGRESS_FACTOR,
    cur_round: int | None = None,
    plan_priors: list[dict] | None = None,
    calib_s: float | None = None,
    calib_shuffle_s: float | None = None,
) -> tuple[list[dict], list[dict]]:
    """(regressed, wall_watch) for the streaming row.  The replay is
    deterministic end-to-end (fixed feed, seeded quantizer, range
    batching), so the accumulated pair count is an EXACT plan gate —
    any drift means the upsert semantics changed; cell-state bytes get
    the 10% gate (parquet framing jitter); total merge wall follows
    the same two-tier watch/escalate policy as the batch rows —
    calibrated by ``calib_s`` when priors carry one (see ``classify``),
    raw otherwise.  ``plan_priors`` (full untruncated history) feeds
    the pairs/cells reference, same rationale as ``classify``."""

    def _rows(recs: list[dict]) -> list[dict]:
        return [
            r
            for r in recs
            if isinstance(r.get("stream"), dict)
            and r["stream"].get("replicas") == cur.get("replicas")
            and r["stream"].get("batches") == cur.get("batches")
        ]

    recs = _rows(priors)
    plan_recs = _rows(priors if plan_priors is None else plan_priors)
    if not plan_recs and not recs:
        return [], []  # first-ever row seeds the reference
    q = cur["query"]
    latest = (plan_recs or recs)[-1]["stream"]
    walls = [
        r["stream"]["merge_total_s"]
        for r in recs
        if isinstance(r["stream"].get("merge_total_s"), (int, float))
    ]
    def _calib(rec: dict):
        # per-stream calib (measured right before the replay) beats the
        # line-level run-start sample — the r15 run-2 mispairing lesson
        c = rec["stream"].get("calib_s", rec.get("calib_s"))
        return c if isinstance(c, (int, float)) and c > 0 else None

    rates = [
        r["stream"]["merge_total_s"] / _calib(r)
        for r in recs
        if isinstance(r["stream"].get("merge_total_s"), (int, float))
        and _calib(r)
    ]
    if cur.get("final_pairs_rows") != latest.get("final_pairs_rows"):
        return [
            {
                "query": q,
                "tier": "plan",
                "final_pairs_rows": cur.get("final_pairs_rows"),
                "prior_pairs_rows": latest.get("final_pairs_rows"),
                "merge_total_s": cur.get("merge_total_s"),
            }
        ], []
    cur_mb, ref_mb = cur.get("final_cells_mb"), latest.get("final_cells_mb")
    if (
        isinstance(cur_mb, (int, float))
        and isinstance(ref_mb, (int, float))
        and abs(cur_mb - ref_mb) > 0.10 * max(ref_mb, 1.0)
    ):
        return [
            {
                "query": q,
                "tier": "plan",
                "final_cells_mb": cur_mb,
                "prior_cells_mb": ref_mb,
                "merge_total_s": cur.get("merge_total_s"),
            }
        ], []
    wall = cur.get("merge_total_s")
    if not isinstance(wall, (int, float)):
        return [], []
    cur_calib = cur.get("calib_s", calib_s)
    sh_rates = [
        r["stream"]["merge_total_s"] / r["calib_shuffle_s"]
        for r in recs
        if isinstance(r["stream"].get("merge_total_s"), (int, float))
        and isinstance(r.get("calib_shuffle_s"), (int, float))
        and r["calib_shuffle_s"] > 0
    ]
    if cur_calib and rates:
        flagged = (wall / cur_calib) > factor * min(rates)
        entry = {
            "query": q,
            "tier": "wall",
            "merge_total_s": wall,
            "calib_s": cur_calib,
            "wall_per_calib": round(wall / cur_calib, 2),
            "prior_best_per_calib": round(min(rates), 2),
        }
        # shuffle-tier veto, same contract as `classify`'s wall tier
        if flagged and calib_shuffle_s and sh_rates:
            sh_flagged = (wall / calib_shuffle_s) > factor * min(sh_rates)
            entry["wall_per_calib_shuffle"] = round(wall / calib_shuffle_s, 2)
            entry["prior_best_per_calib_shuffle"] = round(min(sh_rates), 2)
            if not sh_flagged:
                entry["cleared_by"] = "shuffle_tier"
                return [], [entry]
    elif walls:
        flagged = wall > factor * min(walls)
        entry = {
            "query": q,
            "tier": "wall",
            "merge_total_s": wall,
            "prior_best_s": min(walls),
        }
    else:
        return [], []  # no wall reference yet: this run seeds it
    if flagged:
        if q in _earlier_round_wall_flags(recs, cur_round):
            entry["consecutive"] = True
            return [entry], []
        return [], [entry]
    return [], []


def latest_recorded_round() -> int | None:
    latest = None
    try:
        with open(HISTORY) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("kind") == "scale_sentinel" and isinstance(
                    rec.get("round"), int
                ):
                    latest = rec["round"]
    except OSError:
        pass
    return latest


def main() -> int:
    if "--check" in sys.argv:
        latest, cur = latest_recorded_round(), current_round()
        print(
            f"scale_sentinel: latest recorded round = {latest}, "
            f"current round = {cur}"
            + ("" if latest == cur else "  <- RUN IT THIS ROUND")
        )
        return 0 if latest == cur else 1

    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    replicas = int(positional[0]) if positional else 100
    try:
        from tools.calibration import calibrate
        from tools.scale_probe_100x import run_probe
    except ImportError:  # run as a script: sys.path[0] is tools/
        from calibration import calibrate
        from scale_probe_100x import run_probe

    # Box-speed calibration FIRST (same session run_probe will reuse —
    # identical conf so getOrCreate returns it): `calib_s` rides on the
    # history line and the wall tier compares walls normalized by it,
    # so the next host regime shift is arithmetic, not an escalation
    # debate (round-14 verdict item 2).
    from tweets_spark_top_10_spark.session import get_spark

    spark = get_spark(
        app_name="scale-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4099",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "24g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    calib_s = calibrate(spark)
    try:
        from tools.calibration import calibrate_shuffle
    except ImportError:
        from calibration import calibrate_shuffle
    calib_shuffle_s = calibrate_shuffle(spark)
    print(f"# calib_s = {calib_s}, calib_shuffle_s = {calib_shuffle_s}", flush=True)

    # per-query calibration inside the probe: each 100x rec gets its
    # own temporally-local calib_s (3 passes keep the overhead ~10 s/
    # query); the line-level calib_s above stays as the run-start
    # sample and the fallback for pre-r15.2 records
    results = run_probe(
        replicas, SENTINEL_QUERIES, calibrator=lambda s: calibrate(s, passes=3)
    )
    tag = f"{replicas}x"
    for q, scales in results.items():
        w1, wn = scales["1x"]["wall_s"], scales[tag]["wall_s"]
        scales["ratio"] = round(wn / w1, 2) if w1 else None
    priors = prior_records(replicas)
    regressed, wall_watch = classify(
        results,
        priors,
        replicas,
        cur_round=current_round(),
        plan_priors=prior_records(replicas, rebased=False),
        calib_s=calib_s,
        calib_shuffle_s=calib_shuffle_s,
    )
    stream_rec = None
    if "--no-stream" not in sys.argv:
        stream_rec = run_stream_row()
        s_reg, s_watch = classify_stream(
            stream_rec,
            prior_records(None),
            cur_round=current_round(),
            plan_priors=prior_records(None, rebased=False),
            calib_s=calib_s,
            calib_shuffle_s=calib_shuffle_s,
        )
        regressed.extend(s_reg)
        wall_watch.extend(s_watch)
    line = {
        "kind": "scale_sentinel",
        "round": current_round(),
        "replicas": replicas,
        "calib_s": calib_s,
        "calib_shuffle_s": calib_shuffle_s,
        "base_sf_dir": os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ),
        "sentinel": results,
        "regressed": regressed,
        "wall_watch": wall_watch,
    }
    if stream_rec is not None:
        line["stream"] = stream_rec
    note = os.environ.get("SPARK_GRAFT_BENCH_NOTE")
    if note:
        line["note"] = note
    with open(HISTORY, "a") as fh:
        fh.write(json.dumps(line) + "\n")
    print(
        json.dumps(
            {k: line[k] for k in ("kind", "round", "regressed", "wall_watch")}
        )
    )
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
