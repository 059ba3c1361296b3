"""Standing 100x scale sentinel (round-11 verdict item 5).

The per-family 100x probes were run ad-hoc each round; a scale
regression therefore surfaced only when someone re-ran the right probe.
This tool makes a FIXED 4-query sentinel — spanning the scale-sensitive
plan shapes — a once-per-round record: it reuses
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

Regression rule: a query regresses when its 100x wall exceeds
``REGRESS_FACTOR`` (1.5) x the best prior recorded 100x wall for the
same (query, replicas) — the probe box carries ~±10% noise
(BASELINE.md round-10 re-anchor), so 1.5x fires on plan-shape breaks,
not weather.  First-ever rows cannot regress; they seed the reference.
The ratio itself is NOT gated: each family's expected ratio differs by
design (2.5x map-only .. 48x O(N^1.5)) and is documented per-family in
BASELINE.md.

Usage::

    python tools/scale_sentinel.py [replicas]   # default 100
    python tools/scale_sentinel.py --check      # no probe: report the
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
]
REGRESS_FACTOR = 1.5


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


def prior_best_100x(replicas: int) -> dict[str, float]:
    """Best (min) prior 100x wall per query from recorded sentinel
    lines at the same replica count."""
    best: dict[str, float] = {}
    tag = f"{replicas}x"
    try:
        with open(HISTORY) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("kind") != "scale_sentinel":
                    continue
                if rec.get("replicas") != replicas:
                    continue
                for q, scales in rec.get("sentinel", {}).items():
                    w = scales.get(tag, {}).get("wall_s")
                    if isinstance(w, (int, float)):
                        best[q] = min(best.get(q, float("inf")), w)
    except OSError:
        pass
    return best


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

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    try:
        from tools.scale_probe_100x import run_probe
    except ImportError:  # run as a script: sys.path[0] is tools/
        from scale_probe_100x import run_probe

    results = run_probe(replicas, SENTINEL_QUERIES)
    tag = f"{replicas}x"
    prior = prior_best_100x(replicas)
    regressed = []
    for q, scales in results.items():
        w1, wn = scales["1x"]["wall_s"], scales[tag]["wall_s"]
        scales["ratio"] = round(wn / w1, 2) if w1 else None
        ref = prior.get(q)
        if ref is not None and wn > REGRESS_FACTOR * ref:
            regressed.append(
                {"query": q, "wall_100x_s": wn, "prior_best_s": ref}
            )
    line = {
        "kind": "scale_sentinel",
        "round": current_round(),
        "replicas": replicas,
        "base_sf_dir": os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ),
        "sentinel": results,
        "regressed": regressed,
    }
    note = os.environ.get("SPARK_GRAFT_BENCH_NOTE")
    if note:
        line["note"] = note
    with open(HISTORY, "a") as fh:
        fh.write(json.dumps(line) + "\n")
    print(json.dumps({k: line[k] for k in ("kind", "round", "regressed")}))
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
