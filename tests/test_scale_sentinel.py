"""Unit contracts for the standing 100x scale sentinel
(tools/scale_sentinel.py, round-11 verdict item 5) — the pure-Python
record/compare logic only; the Spark probe itself is exercised by the
per-round sentinel run recorded in BENCH_HISTORY.jsonl."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import scale_sentinel  # noqa: E402


def _write_history(tmp_path, lines):
    p = tmp_path / "BENCH_HISTORY.jsonl"
    p.write_text("".join(json.dumps(x) + "\n" for x in lines))
    return p


def test_prior_best_ignores_bench_lines_and_other_replicas(
    tmp_path, monkeypatch
):
    hist = _write_history(
        tmp_path,
        [
            # a normal bench line must be invisible to the sentinel
            {"sf": 0.1, "total": 100.0, "queries": {"lsh_knn_top5": 1.4}},
            {
                "kind": "scale_sentinel",
                "round": 11,
                "replicas": 10,  # other replica count: not comparable
                "sentinel": {"lsh_knn_top5": {"10x": {"wall_s": 2.0}}},
            },
            {
                "kind": "scale_sentinel",
                "round": 11,
                "replicas": 100,
                "sentinel": {
                    "lsh_knn_top5": {
                        "1x": {"wall_s": 1.6},
                        "100x": {"wall_s": 4.1},
                    }
                },
            },
            {
                "kind": "scale_sentinel",
                "round": 12,
                "replicas": 100,
                "sentinel": {
                    "lsh_knn_top5": {
                        "1x": {"wall_s": 1.7},
                        "100x": {"wall_s": 4.9},
                    }
                },
            },
        ],
    )
    monkeypatch.setattr(scale_sentinel, "HISTORY", str(hist))
    best = scale_sentinel.prior_best_100x(100)
    # min across recorded 100x walls, the 10x line excluded
    assert best == {"lsh_knn_top5": 4.1}
    assert scale_sentinel.latest_recorded_round() == 12


def test_rebase_line_truncates_wall_reference(tmp_path, monkeypatch):
    """A control-evidenced scale_sentinel_rebase line (host regime
    shift, r14 precedent) drops pre-rebase records from the wall
    reference AND from consecutive-flag precedent — records from the
    rebasing round itself survive as the new-regime seed."""
    hist = _write_history(
        tmp_path,
        [
            {
                "kind": "scale_sentinel",
                "round": 12,
                "replicas": 100,
                "sentinel": {"q": {"100x": {"wall_s": 4.0}}},
            },
            {
                "kind": "scale_sentinel",
                "round": 13,
                "replicas": 100,
                "sentinel": {"q": {"100x": {"wall_s": 8.0}}},
                "wall_watch": [{"query": "q", "tier": "wall"}],
            },
            {
                "kind": "scale_sentinel",
                "round": 14,
                "replicas": 100,
                "sentinel": {"q": {"100x": {"wall_s": 9.0}}},
                "regressed": [{"query": "q", "tier": "wall"}],
            },
            {"kind": "scale_sentinel_rebase", "round": 14},
        ],
    )
    monkeypatch.setattr(scale_sentinel, "HISTORY", str(hist))
    # pre-rebase 4.0 is gone; the r14 record seeds the new reference
    assert scale_sentinel.prior_best_100x(100) == {"q": 9.0}
    priors = scale_sentinel.prior_records(100)
    assert [r["round"] for r in priors] == [14]
    # r15 at the r14-era wall neither watches nor escalates
    reg, watch = scale_sentinel.classify(
        {"q": {"100x": {"wall_s": 9.5}}}, priors, 100, cur_round=15
    )
    assert reg == [] and watch == []
    # without the rebase line the same reading would have ESCALATED
    hist2 = _write_history(
        tmp_path,
        [json.loads(line) for line in hist.read_text().splitlines()[:-1]],
    )
    monkeypatch.setattr(scale_sentinel, "HISTORY", str(hist2))
    reg, watch = scale_sentinel.classify(
        {"q": {"100x": {"wall_s": 9.5}}},
        scale_sentinel.prior_records(100),
        100,
        cur_round=15,
    )
    assert [e["query"] for e in reg] == ["q"] and reg[0].get("consecutive")


def test_sentinel_lines_are_invisible_to_bench_history_readers(tmp_path):
    """bench.py's _stable_total/_own_history_timings must skip sentinel
    lines: they carry no `queries` dict, the key both readers require —
    otherwise a sentinel append would corrupt the headline-min logic."""
    import bench

    hist = _write_history(
        tmp_path,
        [
            {"sf": 0.1, "total": 100.0, "queries": {"q": 1.0}},
            {
                "kind": "scale_sentinel",
                "round": 12,
                "replicas": 100,
                "sentinel": {"q": {"1x": {"wall_s": 1.0}, "100x": {"wall_s": 3.0}}},
            },
        ],
    )
    assert bench._stable_total(str(tmp_path), 0.1, {"q"}, None) == 100.0
    src, timings, calib = bench._own_history_timings(str(tmp_path), 0.1)
    assert timings == {"q": 1.0}
    # an uncalibrated reference yields the neutral scale
    assert bench.regression_scale({"calib_s": 2.0}, calib) == (1.0, {})


def test_bench_history_reader_carries_calibration(tmp_path):
    """The newest history line's calibrations ride along so the
    per-query regression gate can scale its reference walls by the
    box-speed ratio (walls moving WITH calib = host weather, not a
    flag)."""
    import bench

    _write_history(
        tmp_path,
        [
            {
                "sf": 0.1,
                "total": 50.0,
                "calib_s": 2.0,
                "calib_shuffle_s": 5.0,
                "queries": {"q": 10.0},
            }
        ],
    )
    src, timings, calib = bench._own_history_timings(str(tmp_path), 0.1)
    assert timings == {"q": 10.0}
    assert calib == {"calib_s": 2.0, "calib_shuffle_s": 5.0}
    # the calibrated flag rule the bench applies: current wall t flags
    # iff t - scale*ref > max(0.5, 0.5*scale*ref), scale from the tiers
    scale, tiers = bench.regression_scale({"calib_s": 4.0}, calib)
    assert scale == 2.0 and tiers == {"cpu": 2.0}  # box 2x slower
    t = 20.0  # wall exactly tracks the box: 10 * 2
    assert not (t - scale * 10.0 > max(0.5, 0.5 * scale * 10.0))
    t = 45.0  # genuinely slower than the box explains
    assert t - scale * 10.0 > max(0.5, 0.5 * scale * 10.0)


def test_bench_regression_scale_two_tier_precedence():
    """The r16 gate contract (VERDICT r15 item 2): the scale is the
    MOST FORGIVING of the available tier ratios, so

    - IO/shuffle-path weather the CPU tier cannot see (the r15 close
      anchor: 44/147 queries ~1.6x with CPU calib flat) clears via the
      shuffle tier;
    - a regime that shifts MID-run (start sample flat, end sample
      inflated — the r15 run-2 mispairing) clears via the end sample;
    - a genuine code regression moves NO calibration: every ratio ~1,
      gate unchanged."""
    import bench

    ref = {"calib_s": 2.0, "calib_shuffle_s": 5.0}

    # shuffle weather, CPU flat: the r15 false-flag class must clear
    scale, tiers = bench.regression_scale(
        {"calib_s": 2.0, "calib_shuffle_s": 8.5}, ref
    )
    assert tiers == {"cpu": 1.0, "shuffle": 1.7} and scale == 1.7
    ref_wall, wall = 10.0, 16.0  # 1.6x — inside what shuffle explains
    assert not (wall - scale * ref_wall > max(0.5, 0.5 * scale * ref_wall))

    # mid-run shift: start samples flat, end samples inflated
    scale, _ = bench.regression_scale(
        {
            "calib_s": 2.0,
            "calib_end_s": 3.2,
            "calib_shuffle_s": 5.0,
            "calib_shuffle_end_s": 5.0,
        },
        ref,
    )
    assert scale == 1.6

    # code regression: all tiers flat -> neutral scale -> flags
    scale, tiers = bench.regression_scale(
        {"calib_s": 2.0, "calib_shuffle_s": 5.0}, ref
    )
    assert scale == 1.0 and tiers == {"cpu": 1.0, "shuffle": 1.0}
    wall = 22.0
    assert wall - scale * ref_wall > max(0.5, 0.5 * scale * ref_wall)

    # missing shuffle baseline (pre-r15 reference): CPU tier only
    scale, tiers = bench.regression_scale(
        {"calib_s": 3.0, "calib_shuffle_s": 9.0}, {"calib_s": 2.0}
    )
    assert tiers == {"cpu": 1.5} and scale == 1.5

    # no reference at all (BENCH_r*.json fallback): neutral
    assert bench.regression_scale({"calib_s": 3.0}, None) == (1.0, {})


def _rec(q, wall, shuffle, spill=0.0, regressed=(), watch=(), round=12, tier="wall"):
    return {
        "kind": "scale_sentinel",
        "round": round,
        "replicas": 100,
        "sentinel": {
            q: {
                "1x": {"wall_s": 1.0},
                "100x": {
                    "wall_s": wall,
                    "shuffle_read_mb": shuffle,
                    "spill_mem_mb": spill,
                    "spill_disk_mb": 0.0,
                },
            }
        },
        "regressed": [{"query": n, "tier": tier} for n in regressed],
        "wall_watch": [{"query": n, "tier": "wall"} for n in watch],
    }


def _cur(wall, shuffle, spill=0.0):
    return {
        "q": {
            "1x": {"wall_s": 1.0},
            "100x": {
                "wall_s": wall,
                "shuffle_read_mb": shuffle,
                "spill_mem_mb": spill,
                "spill_disk_mb": 0.0,
            },
        }
    }


def test_classify_two_tier():
    """Calibrated by the round-12 seed pair: identical code measured
    29.7 then 47.9 s at 100x with byte-identical shuffle telemetry —
    a pure-wall 1.5x gate is noise; telemetry drift is not."""
    seed = _rec("q", wall=30.0, shuffle=15000.0)

    # 1.6x wall, flat telemetry -> watch, not regression
    reg, watch = scale_sentinel.classify(
        _cur(48.0, 15000.0), [seed], 100
    )
    assert reg == [] and watch[0]["query"] == "q"

    # same wall flag in two CONSECUTIVE rounds -> escalates
    prev = _rec("q", wall=48.0, shuffle=15000.0, watch=["q"])
    reg, watch = scale_sentinel.classify(_cur(49.0, 15000.0), [seed, prev], 100)
    assert reg[0]["tier"] == "wall" and reg[0]["consecutive"] and not watch

    # ... but a SAME-ROUND re-run (three round-12 lines exist in real
    # history) must NOT self-escalate: the watch line is from this
    # round, so a second slow run this round stays a watch.
    seed11 = _rec("q", wall=30.0, shuffle=15000.0, round=11)
    prev12 = _rec("q", wall=48.0, shuffle=15000.0, round=12, watch=["q"])
    reg, watch = scale_sentinel.classify(
        _cur(49.0, 15000.0), [seed11, prev12], 100, cur_round=12
    )
    assert reg == [] and watch[0]["query"] == "q"
    # a LATER round seeing the round-12 watch does escalate
    reg, watch = scale_sentinel.classify(
        _cur(49.0, 15000.0), [seed11, prev12], 100, cur_round=13
    )
    assert reg[0].get("consecutive") and not watch

    # a prior PLAN/SPILL flag is not a wall precedent: plan flag last
    # round + slow-flat wall this round -> watch, not consecutive.
    prev_plan = _rec(
        "q", wall=31.0, shuffle=15000.0, round=12, regressed=["q"], tier="plan"
    )
    reg, watch = scale_sentinel.classify(
        _cur(49.0, 15000.0), [seed11, prev_plan], 100, cur_round=13
    )
    assert reg == [] and watch[0]["query"] == "q"

    # >10% shuffle-byte drift -> PLAN regression immediately, any wall
    reg, _ = scale_sentinel.classify(_cur(31.0, 18000.0), [seed], 100)
    assert reg[0]["tier"] == "plan"

    # new spill where prior had none -> immediate
    reg, _ = scale_sentinel.classify(_cur(31.0, 15000.0, spill=512.0), [seed], 100)
    assert reg[0]["tier"] == "spill"

    # flat everything -> clean
    reg, watch = scale_sentinel.classify(_cur(31.0, 15100.0), [seed], 100)
    assert reg == [] and watch == []

    # first-ever query seeds silently
    reg, watch = scale_sentinel.classify(_cur(31.0, 15000.0), [], 100)
    assert reg == [] and watch == []


def test_rebase_keeps_plan_reference(tmp_path, monkeypatch):
    """The wall-tier rebase must NOT blind the plan tier (r15 advisor
    finding): when the rebase line lands before any post-rebase record
    exists for a query, the FULL history (rebased=False) still feeds
    the plan/spill reference — a shuffle-byte drift flags the same
    round, and the wall tier quietly seeds instead of KeyError-ing."""
    hist = _write_history(
        tmp_path,
        [
            _rec("q", wall=30.0, shuffle=15000.0, round=13),
            {"kind": "scale_sentinel_rebase", "round": 14},
        ],
    )
    monkeypatch.setattr(scale_sentinel, "HISTORY", str(hist))
    priors = scale_sentinel.prior_records(100)
    assert priors == []  # wall reference truncated — nothing post-rebase
    full = scale_sentinel.prior_records(100, rebased=False)
    assert [r["round"] for r in full] == [13]

    # 20% shuffle drift vs the PRE-rebase record still flags as plan
    reg, watch = scale_sentinel.classify(
        _cur(31.0, 18000.0), priors, 100, cur_round=15, plan_priors=full
    )
    assert reg[0]["tier"] == "plan" and watch == []

    # flat bytes + a 3x wall: no wall reference survives the rebase, so
    # this run seeds — no flag, and no crash on the missing best[q]
    reg, watch = scale_sentinel.classify(
        _cur(90.0, 15000.0), priors, 100, cur_round=15, plan_priors=full
    )
    assert reg == [] and watch == []


def test_classify_calibrated_wall_tier():
    """With calib_s on both sides the wall tier compares wall/calib:
    a host regime shift (walls AND calib 2x) stays quiet; a code
    regression (walls 2x, calib flat) flags; priors without calib fall
    back to raw walls (pre-r15 history)."""
    seed = _rec("q", wall=30.0, shuffle=15000.0, round=14)
    seed["calib_s"] = 2.0  # 30s wall at calib 2.0 -> rate 15.0

    # box got 2x slower: wall 60s, calib 4.0 -> rate 15.0, flat -> clean
    reg, watch = scale_sentinel.classify(
        _cur(60.0, 15000.0), [seed], 100, cur_round=15, calib_s=4.0
    )
    assert reg == [] and watch == []

    # code got 2x slower: wall 60s, calib flat 2.0 -> rate 30.0 -> watch
    reg, watch = scale_sentinel.classify(
        _cur(60.0, 15000.0), [seed], 100, cur_round=15, calib_s=2.0
    )
    assert reg == [] and watch[0]["wall_per_calib"] == 30.0
    assert watch[0]["prior_best_per_calib"] == 15.0

    # ... and escalates on consecutive-round precedent as before
    prev = _rec("q", wall=60.0, shuffle=15000.0, round=15, watch=["q"])
    prev["calib_s"] = 2.0
    reg, watch = scale_sentinel.classify(
        _cur(60.0, 15000.0), [seed, prev], 100, cur_round=16, calib_s=2.0
    )
    assert reg[0].get("consecutive") and not watch

    # prior lacks calib -> raw-wall comparison still applies
    raw_seed = _rec("q", wall=30.0, shuffle=15000.0, round=14)
    reg, watch = scale_sentinel.classify(
        _cur(60.0, 15000.0), [raw_seed], 100, cur_round=15, calib_s=2.0
    )
    assert watch[0]["prior_best_s"] == 30.0

    # current run lacks calib (calibration failed) -> raw fallback too
    reg, watch = scale_sentinel.classify(
        _cur(60.0, 15000.0), [seed], 100, cur_round=15
    )
    assert watch[0]["prior_best_s"] == 30.0


def test_classify_per_query_calibration_precedence():
    """The r15 run-2 lesson, pinned: a run-start (line-level) calib can
    mispair with walls measured an hour later under different load, so
    a per-QUERY calib_s inside the 100x rec — measured immediately
    before that query's timed passes — takes precedence on BOTH sides
    (reference rates and the current run)."""
    seed = _rec("q", wall=30.0, shuffle=15000.0, round=15)
    seed["calib_s"] = 4.0  # contaminated run-start sample...
    seed["sentinel"]["q"]["100x"]["calib_s"] = 2.0  # ...local truth
    # reference rate must be 30/2.0 = 15, NOT 30/4.0 = 7.5
    assert scale_sentinel._best_rate([seed], "100x") == {"q": 15.0}

    # current run: wall 60 with per-query calib 4.0 -> rate 15, clean
    cur = _cur(60.0, 15000.0)
    cur["q"]["100x"]["calib_s"] = 4.0
    reg, watch = scale_sentinel.classify(
        cur, [seed], 100, cur_round=16, calib_s=1.0
    )
    assert reg == [] and watch == []
    # without the per-query calib the line-level 1.0 would have flagged
    del cur["q"]["100x"]["calib_s"]
    reg, watch = scale_sentinel.classify(
        cur, [seed], 100, cur_round=16, calib_s=1.0
    )
    assert watch and watch[0]["wall_per_calib"] == 60.0

    # stream rec: its own calib beats the line's
    sseed = _stream_line(15, 30.0)
    sseed["calib_s"] = 4.0
    sseed["stream"]["calib_s"] = 2.0
    scur = _stream_cur(60.0)
    scur["calib_s"] = 4.0
    reg, watch = scale_sentinel.classify_stream(
        scur, [sseed], cur_round=16, calib_s=1.0
    )
    assert reg == [] and watch == []  # 60/4=15 vs best 30/2=15


def test_classify_stream_calibrated():
    """The streaming wall follows the same calibrated comparison; the
    pairs/cells plan gates are calibration-independent (deterministic
    replay) and keep flagging regardless."""
    seed = _stream_line(14, 30.0)
    seed["calib_s"] = 2.0

    # host 2x slower -> clean; code 2x slower -> watch
    reg, watch = scale_sentinel.classify_stream(
        _stream_cur(60.0), [seed], cur_round=15, calib_s=4.0
    )
    assert reg == [] and watch == []
    reg, watch = scale_sentinel.classify_stream(
        _stream_cur(60.0), [seed], cur_round=15, calib_s=2.0
    )
    assert reg == [] and watch[0]["wall_per_calib"] == 30.0

    # plan gate ignores calibration entirely
    reg, _ = scale_sentinel.classify_stream(
        _stream_cur(30.0, pairs=99999), [seed], cur_round=15, calib_s=4.0
    )
    assert reg[0]["tier"] == "plan"

    # rebased-away stream history: plan_priors keeps the pairs gate
    reg, _ = scale_sentinel.classify_stream(
        _stream_cur(30.0, pairs=99999), [], cur_round=15, plan_priors=[seed]
    )
    assert reg[0]["tier"] == "plan"
    # ... while the wall tier quietly seeds (no reference in `priors`)
    reg, watch = scale_sentinel.classify_stream(
        _stream_cur(90.0), [], cur_round=15, plan_priors=[seed]
    )
    assert reg == [] and watch == []


def _stream_line(round, total, pairs=75081, cells=8.5, regressed=(), watch=()):
    return {
        "kind": "scale_sentinel",
        "round": round,
        "replicas": 100,
        "stream": {
            "query": "maintain_semantic_dedup",
            "replicas": 10,
            "batches": 6,
            "merge_total_s": total,
            "final_pairs_rows": pairs,
            "final_cells_mb": cells,
        },
        "regressed": [{"query": n, "tier": "wall"} for n in regressed],
        "wall_watch": [{"query": n, "tier": "wall"} for n in watch],
    }


def _stream_cur(total, pairs=75081, cells=8.5):
    return {
        "query": "maintain_semantic_dedup",
        "replicas": 10,
        "batches": 6,
        "merge_total_s": total,
        "final_pairs_rows": pairs,
        "final_cells_mb": cells,
    }


def test_classify_stream_two_tier():
    """The streaming row's plan gate is EXACT on accumulated pairs
    (deterministic replay); cells_mb gets 10%; wall follows the same
    round-aware two-tier policy as the batch rows."""
    seed = _stream_line(11, 30.0)

    # first-ever seeds silently
    assert scale_sentinel.classify_stream(_stream_cur(30.0), []) == ([], [])
    # a prior line WITHOUT a stream rec is not a reference
    assert scale_sentinel.classify_stream(
        _stream_cur(30.0), [{"kind": "scale_sentinel", "round": 11}]
    ) == ([], [])

    # flat everything -> clean
    reg, watch = scale_sentinel.classify_stream(_stream_cur(31.0), [seed])
    assert reg == [] and watch == []

    # ANY pair-count drift -> plan regression immediately
    reg, _ = scale_sentinel.classify_stream(
        _stream_cur(30.0, pairs=75082), [seed]
    )
    assert reg[0]["tier"] == "plan" and "final_pairs_rows" in reg[0]

    # >10% cell-state drift -> plan regression
    reg, _ = scale_sentinel.classify_stream(
        _stream_cur(30.0, cells=10.0), [seed]
    )
    assert reg[0]["tier"] == "plan" and "final_cells_mb" in reg[0]

    # slow wall, flat telemetry -> watch
    reg, watch = scale_sentinel.classify_stream(
        _stream_cur(48.0), [seed], cur_round=12
    )
    assert reg == [] and watch[0]["tier"] == "wall"

    # watch in an EARLIER round escalates; same-round re-run does not
    prev = _stream_line(12, 48.0, watch=["maintain_semantic_dedup"])
    reg, watch = scale_sentinel.classify_stream(
        _stream_cur(49.0), [seed, prev], cur_round=13
    )
    assert reg[0].get("consecutive") and not watch
    reg, watch = scale_sentinel.classify_stream(
        _stream_cur(49.0), [seed, prev], cur_round=12
    )
    assert reg == [] and watch[0]["query"] == "maintain_semantic_dedup"


def test_calibration_expected_sum_constant():
    """Pin CALIB_EXPECT_SUM with exact pure-Python arithmetic via the
    mod-p periodicity ((id*a)%p depends on id%p only) — the JVM must
    reproduce this value every calibration pass or the box's timings
    are declared untrustworthy."""
    from tools import calibration as C

    a, p = 2654435761, 1_000_003
    one_period = sum((i * a) % p for i in range(p))
    full = C.CALIB_ROWS // p
    tail = sum((i * a) % p for i in range(C.CALIB_ROWS - full * p))
    assert full * one_period + tail == C.CALIB_EXPECT_SUM

    # shuffle tier: repartition + two-level groupBy-sum preserves the
    # global sum, so the same closed form pins it
    full = C.CALIB_SHUFFLE_ROWS // p
    tail = sum((i * a) % p for i in range(C.CALIB_SHUFFLE_ROWS - full * p))
    assert full * one_period + tail == C.CALIB_SHUFFLE_EXPECT_SUM


def test_current_round_is_max_correctness_plus_one(tmp_path, monkeypatch):
    (tmp_path / "CORRECTNESS_r03.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r11.json").write_text("{}")
    monkeypatch.setattr(scale_sentinel, "REPO", str(tmp_path))
    assert scale_sentinel.current_round() == 12


def test_round_close_refuses_non_empty_index(tmp_path, monkeypatch):
    """round_close's artifact commit is a plain `git commit`, so
    anything pre-staged would be swept into it — the tool must refuse
    to run over a non-empty index (round-12 ADVICE closure)."""
    import subprocess

    from tools import round_close

    subprocess.run(
        ["git", "init", "-q", str(tmp_path)], check=True, capture_output=True
    )
    env_cfg = [
        ["git", "-C", str(tmp_path), "config", "user.email", "t@t"],
        ["git", "-C", str(tmp_path), "config", "user.name", "t"],
    ]
    for cmd in env_cfg:
        subprocess.run(cmd, check=True, capture_output=True)
    (tmp_path / "feature.py").write_text("x = 1\n")
    subprocess.run(
        ["git", "-C", str(tmp_path), "add", "feature.py"],
        check=True,
        capture_output=True,
    )
    monkeypatch.setattr(round_close, "REPO", tmp_path)
    assert round_close.main([]) == 1  # refuses before fold/stage/commit


def test_classify_shuffle_tier_vetoes_cpu_only_wall_flags():
    """The r16 contract: a CPU-calibrated wall flag must ALSO hold
    under the shuffle-tier normalization (when both sides carry
    calib_shuffle_s) to count — IO-path weather inflates walls with
    the CPU calib flat (the live r16 dedup watch: 2.0x per CPU calib,
    telemetry byte-identical), and the exchange-path tier is the axis
    that sees it.  A veto stays VISIBLE as a cleared watch but is no
    escalation precedent; a flag that exceeds BOTH tiers follows the
    normal watch/escalate path."""
    seed = _rec("q", wall=30.0, shuffle=15000.0, round=15)
    seed["calib_s"] = 2.0  # CPU rate ref 15.0
    seed["calib_shuffle_s"] = 5.0  # shuffle rate ref 6.0

    # wall 90 at CPU calib 2.0 -> 45 > 1.5*15: CPU tier flags.  The
    # shuffle sample moved with the wall (12.0): 90/12 = 7.5 <= 9 ->
    # vetoed, recorded as a cleared watch, never regressed
    reg, watch = scale_sentinel.classify(
        _cur(90.0, 15000.0), [seed], 100, cur_round=16,
        calib_s=2.0, calib_shuffle_s=12.0,
    )
    assert reg == []
    assert watch[0]["cleared_by"] == "shuffle_tier"
    assert watch[0]["wall_per_calib_shuffle"] == 7.5

    # a cleared watch in the prior round is NOT consecutive precedent
    prev = _rec("q", wall=90.0, shuffle=15000.0, round=16)
    prev["calib_s"], prev["calib_shuffle_s"] = 2.0, 5.0
    prev["wall_watch"] = [
        {"query": "q", "tier": "wall", "cleared_by": "shuffle_tier"}
    ]
    reg, watch = scale_sentinel.classify(
        _cur(90.0, 15000.0), [seed, prev], 100, cur_round=17,
        calib_s=2.0, calib_shuffle_s=12.0,
    )
    assert reg == [] and watch[0]["cleared_by"] == "shuffle_tier"

    # both tiers exceed (shuffle sample flat at 5.0: 90/5 = 18 > 9):
    # real flag -> first round is a normal watch, no cleared_by
    reg, watch = scale_sentinel.classify(
        _cur(90.0, 15000.0), [seed], 100, cur_round=16,
        calib_s=2.0, calib_shuffle_s=5.0,
    )
    assert reg == [] and "cleared_by" not in watch[0]
    assert watch[0]["wall_per_calib_shuffle"] == 18.0

    # ... and an UNcleared prior watch still escalates
    prev2 = _rec("q", wall=90.0, shuffle=15000.0, round=16, watch=["q"])
    prev2["calib_s"], prev2["calib_shuffle_s"] = 2.0, 5.0
    reg, watch = scale_sentinel.classify(
        _cur(90.0, 15000.0), [seed, prev2], 100, cur_round=17,
        calib_s=2.0, calib_shuffle_s=5.0,
    )
    assert reg[0].get("consecutive") and not watch

    # no shuffle baseline in priors (pre-r16 history): CPU tier alone
    # decides, exactly the old behavior
    old = _rec("q", wall=30.0, shuffle=15000.0, round=15)
    old["calib_s"] = 2.0
    reg, watch = scale_sentinel.classify(
        _cur(90.0, 15000.0), [old], 100, cur_round=16,
        calib_s=2.0, calib_shuffle_s=12.0,
    )
    assert reg == [] and "cleared_by" not in watch[0]


def test_classify_stream_shuffle_tier_veto():
    """Same veto for the streaming row, using the LINE-level shuffle
    calibration on both sides (no per-stream shuffle sample exists)."""
    base = {
        "kind": "scale_sentinel",
        "round": 15,
        "replicas": 100,
        "calib_shuffle_s": 5.0,
        "sentinel": {},
        "regressed": [],
        "wall_watch": [],
        "stream": {
            "query": "maintain_semantic_dedup",
            "replicas": 10,
            "batches": 6,
            "calib_s": 2.0,
            "merge_total_s": 100.0,  # CPU rate 50, shuffle rate 20
            "final_pairs_rows": 7,
            "final_cells_mb": 1.0,
        },
    }
    cur = {
        "query": "maintain_semantic_dedup",
        "replicas": 10,
        "batches": 6,
        "calib_s": 2.0,  # CPU tier: 200/2.0 = 100 > 1.5*50 -> flags
        "merge_total_s": 200.0,
        "final_pairs_rows": 7,
        "final_cells_mb": 1.0,
    }
    # shuffle sample moved with the wall: 200/12 = 16.7 <= 30 -> veto
    reg, watch = scale_sentinel.classify_stream(
        cur, [base], cur_round=16, calib_shuffle_s=12.0
    )
    assert reg == [] and watch[0]["cleared_by"] == "shuffle_tier"
    # shuffle flat: 200/5 = 40 > 30 -> both tiers agree -> normal watch
    reg, watch = scale_sentinel.classify_stream(
        cur, [base], cur_round=16, calib_shuffle_s=5.0
    )
    assert reg == [] and "cleared_by" not in watch[0]


def test_ui_delta_propagates_failed_samples():
    """A timed-out spill_totals sample (-1) must yield -1 — the
    'telemetry missing' marker classify() skips — never a delta against
    the session's all-time totals (the r16 sentinel's bogus 4.2 GB
    first-query shuffle_read_mb)."""
    from tools.scale_probe_100x import ui_delta_mb

    assert ui_delta_mb(-1, 5_000_000) == -1.0
    assert ui_delta_mb(5_000_000, -1) == -1.0
    assert ui_delta_mb(-1, -1) == -1.0
    assert ui_delta_mb(1_000_000, 5_000_000) == 4.0
    # a counter that shrank (app restart) clamps to 0, not negative
    assert ui_delta_mb(5_000_000, 1_000_000) == 0.0
