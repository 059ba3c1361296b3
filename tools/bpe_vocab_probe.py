"""BPE vocabulary-cardinality probe (round-13 verdict item 5).

The r13 probes stressed the corpus-scan axis with a 31-word fixture;
the axis that grows with VOCABULARY — the per-round adjacent-pair
count + the whole-word-table replace+checkpoint — was argued (Zipf),
not measured.  This probe generates synthetic Zipf word-frequency
tables at ~1e4 and ~1e5 distinct words (log-rank frequency ``max(1,
10V/r)`` ~ Zipf(1); pseudo-words are md5-derived ~8-char alphanumerics
so the symbol alphabet and word lengths are realistic) and drives
``functions/bpe.learn_from_words`` at K=1/2/4/8 merges — learning is
deterministic, so the cumulative runs replay exact prefixes and their
differences isolate marginal per-round cost.  Shuffle/spill bytes come
from the UI REST API (the ``scale_probe_100x.spill_totals`` pattern).

Verdict to read off: tail per-round wall (K=8 minus K=4, /4) growing
~linearly with V = the documented contract holds; super-linear growth
is a finding (candidate fix: rewrite only the words containing the
merged pair instead of the whole table).

Round-15 extension (verdict item 3): a BATCHED-trainer section on the
largest V — ``learn_from_words_batched`` at batch=64 /
window_factor=128 for a dozen scans, recording adopted-rules-per-scan
and per-scan wall, then extrapolating a 32k-merge production run.
What the r15 measurements showed: the symbol-disjoint rule exhausts a
SHALLOW (8x) candidate window at ~20 adopted/scan regardless of
``batch`` (Zipf tables concentrate the top pairs on a few hot
symbols), while a 128x window reaches rarer mutually-disjoint symbols
and adoption climbs to ~batch within a few scans — so the scan count
for 32k merges drops from ~8k (batch=4, hours of fixed per-scan
latency) to ~500-900 (~15-25 min).  The probe prints the raw
extrapolation AND a 1.5x-padded bound (per-scan wall was measured
sub-linear in vocabulary, x1.23 per vocab x10, but not flat).

Usage: python tools/bpe_vocab_probe.py [V1,V2,...] (default
10000,100000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def zipf_words(spark, v: int):
    """(s, freq) word table: rank r gets freq max(1, 10V/r); the word
    string for rank r is an md5-derived base-36 pseudo-word, encoded in
    the double-space boundary-owning symbol form the learner consumes."""
    from pyspark.sql import functions as F

    return spark.range(1, v + 1).select(
        F.regexp_replace(
            F.lower(
                F.conv(
                    F.substring(F.md5(F.col("id").cast("string")), 1, 10),
                    16,
                    36,
                )
            ),
            "(.)",
            " $1 ",
        ).alias("s"),
        F.greatest(
            F.lit(1), (F.lit(10 * v) / F.col("id")).cast("long")
        ).alias("freq"),
    )


def main() -> None:
    vs = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [10_000, 100_000]
    )
    from tweets_spark_top_10_spark.functions.bpe import learn_from_words
    from tweets_spark_top_10_spark.session import get_spark
    from tools.scale_probe_100x import spill_totals

    spark = get_spark(
        app_name="bpe-vocab-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4098",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "16g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = "http://localhost:4098"

    out = []
    for v in vs:
        words = zipf_words(spark, v).localCheckpoint(eager=True)
        rows = words.count()
        rec: dict = {"V": v, "word_rows": rows}
        walls = {}
        for k in (1, 2, 4, 8):
            if k == 8:
                s0 = spill_totals(ui)
            t0 = time.perf_counter()
            learned, final = learn_from_words(words, k)
            walls[k] = round(time.perf_counter() - t0, 2)
            if k == 8:
                s1 = spill_totals(ui)
                rec["k8_spill_mem_mb"] = round(max(0, s1[0] - s0[0]) / 1e6, 1)
                rec["k8_spill_disk_mb"] = round(max(0, s1[1] - s0[1]) / 1e6, 1)
                rec["k8_shuffle_read_mb"] = round(
                    max(0, s1[2] - s0[2]) / 1e6, 1
                )
                rec["merges"] = [(m[1], m[2], m[3]) for m in learned]
        rec["wall_k"] = walls
        # marginal cost of rounds 5-8 — steady-state per-round wall,
        # free of the one-time first-round plan compilation
        rec["per_round_tail_s"] = round((walls[8] - walls[4]) / 4, 3)
        out.append(rec)
        print(f"# V={v}: {rec}", flush=True)

    if len(out) >= 2:
        a, b = out[0], out[-1]
        ratio_v = b["V"] / a["V"]
        ratio_w = (
            b["per_round_tail_s"] / a["per_round_tail_s"]
            if a["per_round_tail_s"] > 0
            else None
        )
        print(
            f"# vocab x{ratio_v:.0f} -> per-round wall x"
            f"{ratio_w:.2f}" if ratio_w else "# per-round too fast to ratio",
            flush=True,
        )

    # ---- batched-trainer extrapolation on the largest V (r15) ----
    from tweets_spark_top_10_spark.functions.bpe import (
        learn_from_words_batched,
    )

    v = max(vs)
    base = zipf_words(spark, v).localCheckpoint(eager=True)
    batch, wf, scans = 64, 128, 12
    # adoption trend: rounds=1 calls (the entry re-checkpoint inflates
    # the wall, so walls come from the single uninterrupted call below)
    adopted_per: list[int] = []
    words = base
    for _ in range(scans):
        learned, words = learn_from_words_batched(
            words, rounds=1, batch=batch, window_factor=wf
        )
        adopted_per.append(len(learned))
        if not learned:
            break
    # per-scan wall: ONE rounds=`scans` call, exactly as production runs
    t0 = time.perf_counter()
    learned_all, _ = learn_from_words_batched(
        base, rounds=scans, batch=batch, window_factor=wf
    )
    wall_total = time.perf_counter() - t0
    # steady state = the last 4 scans (adoption ramps over the first
    # few while the symbol alphabet is still the initial ~36 chars)
    steady_rate = sum(adopted_per[-4:]) / max(1, len(adopted_per[-4:]))
    steady_wall = wall_total / max(1, scans)
    scans_32k = int(-(-32_000 // max(1.0, steady_rate)))
    raw_min = scans_32k * steady_wall / 60
    batched = {
        "V": v,
        "batch": batch,
        "window_factor": wf,
        "adopted_per_scan": adopted_per,
        "adopted_total_single_call": len(learned_all),
        "wall_total_s": round(wall_total, 2),
        "steady_adopted_per_scan": round(steady_rate, 1),
        "steady_wall_per_scan_s": round(steady_wall, 2),
        "extrap_32k_scans": scans_32k,
        "extrap_32k_minutes": round(raw_min, 1),
        # per-scan wall measured sub-linear in vocabulary (x1.23 per
        # vocab x10) but not flat — pad the claim, don't oversell it
        "extrap_32k_minutes_padded_1p5x": round(raw_min * 1.5, 1),
    }
    print(f"# batched: {batched}", flush=True)
    out.append({"batched_32k_extrapolation": batched})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
