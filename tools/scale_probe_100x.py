"""100x flagship scale probe (round-8 verdict item 4).

Replicates the documents/embeddings/events fixtures 100x
content-disjointly (documents: per-replica token tagging after
punctuation sanitization so no shingle crosses replicas; embeddings:
cyclic-shifted vectors; events: user-shifted over the same time range)
and pushes the queries that carry the 100 TB story through 1x vs 100x
— default set:

- ``heavy_hitters_top10``  — certified two-pass top-K
- ``pq_adc_top5_prebuilt`` — ANN serving scan over a prebuilt index
- ``dedup_canonical_docs`` — banded near-dup pairs + star-contraction CC

Reports min-of-2 wall, shuffle spill (memory+disk, summed over stages
via the UI REST API), and CC round counts.  The 1x side uses the SAME
sanitized/tagged text (k=0 only) so the comparison is content-fair.

Usage: python tools/scale_probe_100x.py [replicas] (default 100)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_fixtures(work: str, replicas: int) -> tuple[str, str]:
    import duckdb

    one = os.path.join(work, "x1")
    many = os.path.join(work, f"x{replicas}")
    os.makedirs(one)
    os.makedirs(many)
    for tag, path, n in (("1x", one, 1), (f"{replicas}x", many, replicas)):
        duckdb.sql(f"""
          COPY (
            SELECT d.doc_id + r.k * (SELECT MAX(doc_id)+1 FROM read_parquet('{BASE}/documents.parquet')) AS doc_id,
                   array_to_string(
                     list_transform(
                       string_split(regexp_replace(d.text, '[^a-zA-Z0-9 ]', '', 'g'), ' '),
                       x -> 'r' || r.k || x), ' ') AS text,
                   d.lang, d.source, d.n_chars
            FROM read_parquet('{BASE}/documents.parquet') d,
                 (SELECT UNNEST(RANGE({n})) AS k) r
          ) TO '{path}/documents.parquet' (FORMAT PARQUET)
        """)
        # content-disjoint in EMBEDDING SPACE, not just by id: replica k
        # is the cyclic shift of the vector by k%64 dims, negated for
        # k>=64 (norm-preserving, near-zero cosine across replicas) —
        # duplicate vectors with shifted ids would land 10 identical
        # copies per IVF cell and measure duplicate-pair explosion, not
        # corpus growth (round-8 review finding)
        duckdb.sql(f"""
          COPY (
            SELECT e.vec_id + r.k * (SELECT MAX(vec_id)+1 FROM read_parquet('{BASE}/embeddings.parquet')) AS vec_id,
                   e.label,
                   list_transform(
                     e.embedding[(r.k % 64) + 1:] || e.embedding[:(r.k % 64)],
                     x -> CASE WHEN r.k >= 64 THEN -x ELSE x END) AS embedding
            FROM read_parquet('{BASE}/embeddings.parquet') e,
                 (SELECT UNNEST(RANGE({n})) AS k) r
          ) TO '{path}/embeddings.parquet' (FORMAT PARQUET)
        """)
        # events: content-disjoint in USER space (replica k shifts every
        # user_id past the original range) over the SAME time range —
        # windows/sessions per user multiply by the replica count while
        # the window grid stays fixed, the growth axis a 100x event
        # stream actually has
        duckdb.sql(f"""
          COPY (
            SELECT e.event_id + r.k * (SELECT MAX(event_id)+1 FROM read_parquet('{BASE}/events.parquet')) AS event_id,
                   e.ts,
                   e.user_id + r.k * (SELECT MAX(user_id)+1 FROM read_parquet('{BASE}/events.parquet')) AS user_id,
                   e.event_type, e.value, e.props
            FROM read_parquet('{BASE}/events.parquet') e,
                 (SELECT UNNEST(RANGE({n})) AS k) r
          ) TO '{path}/events.parquet' (FORMAT PARQUET)
        """)
        # TPC-H facts: customer/orders/lineitem replicate with shifted
        # keys (new customers placing new orders — both fact-fact and
        # fact-dim join inputs grow together, the axis that stresses
        # the un-hinted customer joins and the per-customer pre-agg);
        # bounded dims (region/nation/supplier/part) copy at 1x, which
        # is exactly their 100 TB behavior.
        mc = "(SELECT MAX(c_custkey)+1 FROM read_parquet('{0}/customer.parquet'))".format(BASE)
        mo = "(SELECT MAX(o_orderkey)+1 FROM read_parquet('{0}/orders.parquet'))".format(BASE)
        duckdb.sql(f"""
          COPY (
            SELECT * REPLACE (c_custkey + r.k * {mc} AS c_custkey)
            FROM read_parquet('{BASE}/customer.parquet'), (SELECT UNNEST(RANGE({n})) AS k) r
          ) TO '{path}/customer.parquet' (FORMAT PARQUET)
        """)
        duckdb.sql(f"""
          COPY (
            SELECT * REPLACE (o_orderkey + r.k * {mo} AS o_orderkey,
                              o_custkey + r.k * {mc} AS o_custkey)
            FROM read_parquet('{BASE}/orders.parquet'), (SELECT UNNEST(RANGE({n})) AS k) r
          ) TO '{path}/orders.parquet' (FORMAT PARQUET)
        """)
        duckdb.sql(f"""
          COPY (
            SELECT * REPLACE (l_orderkey + r.k * {mo} AS l_orderkey)
            FROM read_parquet('{BASE}/lineitem.parquet'), (SELECT UNNEST(RANGE({n})) AS k) r
          ) TO '{path}/lineitem.parquet' (FORMAT PARQUET)
        """)
        for dim in ("region", "nation", "supplier", "part"):
            duckdb.sql(f"""
              COPY (SELECT * FROM read_parquet('{BASE}/{dim}.parquet'))
              TO '{path}/{dim}.parquet' (FORMAT PARQUET)
            """)
    return one, many


def spill_totals(ui: str) -> tuple[int, int, int]:
    """(memory spilled, disk spilled, shuffle read) bytes summed over
    all stages so far — deltas around a run isolate that run's cost.
    Shuffle read tracks the round-8 verdict's flagged scale-killer (the
    raw-string shingle shuffle) shrinking once keys are compacted."""
    try:
        # 30s, not 5: under the degraded-regime loads this sentinel is
        # most valuable in, the 5s REST timeout is what failed (r16).
        apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=30))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages", timeout=30)
        )
        return (
            sum(s.get("memoryBytesSpilled", 0) for s in stages),
            sum(s.get("diskBytesSpilled", 0) for s in stages),
            sum(s.get("shuffleReadBytes", 0) for s in stages),
        )
    except Exception as exc:  # UI metrics are telemetry, not the probe
        print(f"# spill probe failed: {exc}", file=sys.stderr)
        return (-1, -1, -1)


def ui_delta_mb(before: int, after: int) -> float:
    """Windowed MB between two ``spill_totals`` samples.

    A FAILED sample (-1, e.g. a REST timeout under load) must propagate
    as -1, not silently become a delta against the session's ALL-TIME
    totals: the r16 sentinel recorded a bogus 4.2 GB "shuffle_read_mb"
    for its first query when the spill0 call timed out — the run-start
    shuffle CALIBRATION's bytes, not the query's — which reads as a
    130x plan regression.  ``classify()`` already skips the plan tier
    for -1 samples; this makes the probe emit what it means."""
    if before < 0 or after < 0:
        return -1.0
    return round(max(0, after - before) / 1e6, 1)


def run_probe(
    replicas: int, probe_queries: list[str], calibrator=None
) -> dict[str, dict]:
    """Build 1x/{replicas}x fixtures, run each query at both scales
    (one untimed warm pass + min-of-2 timed), return
    {query: {"1x": rec, "{replicas}x": rec}} with wall/spill/shuffle
    per rec.  Callable so the standing sentinel
    (tools/scale_sentinel.py) shares the exact probe semantics.

    ``calibrator`` (callable(spark) -> float): when set, a box-speed
    calibration runs IMMEDIATELY BEFORE each {replicas}x query's timed
    passes and lands in that rec as ``calib_s`` — pairing every wall
    with a temporally-LOCAL speed sample.  A single run-start
    calibration mispairs badly on this box: the r15 run-1 line
    calibrated at 3.726 under transient load while its walls ran on a
    quieter box an hour later, poisoning the wall/calib reference for
    every later run (seven false watches in run 2)."""
    work = tempfile.mkdtemp(prefix="scale_probe_")
    t0 = time.perf_counter()
    one, many = build_fixtures(work, replicas)
    print(f"# fixtures built in {time.perf_counter()-t0:.1f}s under {work}")

    from tweets_spark_top_10_spark.session import get_spark

    spark = get_spark(
        app_name="scale-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4099",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = "http://localhost:4099"

    from tweets_spark_top_10_spark.functions import dedup
    from tweets_spark_top_10_spark.queries.catalog import QUERIES

    results: dict[str, dict] = {}
    for name in probe_queries:
        fn = QUERIES[name]
        for tag, sf_dir in (("1x", one), (f"{replicas}x", many)):
            # prebuilt serving: index construction is offline — build untimed
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            rec_calib = (
                calibrator(spark)
                if calibrator is not None and tag != "1x"
                else None
            )
            spill0 = spill_totals(ui)
            best, rounds = None, None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                t = time.perf_counter() - t0
                best = t if best is None else min(best, t)
                rounds = dedup._last_cc_rounds
            spill1 = spill_totals(ui)
            rec = {
                "wall_s": round(best, 2),
                "spill_mem_mb": ui_delta_mb(spill0[0], spill1[0]),
                "spill_disk_mb": ui_delta_mb(spill0[1], spill1[1]),
                # over BOTH timed passes (the delta spans them)
                "shuffle_read_mb": ui_delta_mb(spill0[2], spill1[2]),
            }
            if rec_calib is not None:
                rec["calib_s"] = rec_calib
            if name == "dedup_canonical_docs":
                rec["cc_rounds"] = rounds
            results.setdefault(name, {})[tag] = rec
            print(f"{name} {tag}: {rec}", flush=True)

    shutil.rmtree(work, ignore_errors=True)
    return results


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    probe_queries = (
        sys.argv[2].split(",")
        if len(sys.argv) > 2
        else ["heavy_hitters_top10", "pq_adc_top5_prebuilt", "dedup_canonical_docs"]
    )
    print(json.dumps(run_probe(replicas, probe_queries)))


if __name__ == "__main__":
    main()
