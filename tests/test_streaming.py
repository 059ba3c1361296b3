"""Streaming tests: file-stream replay of the events table.

Strategy (SURVEY.md §5.2): re-write events as a multi-file parquet dir,
replay it as a file stream (maxFilesPerTrigger=1 → several micro-
batches), run the streaming query with availableNow, and compare
against the equivalent batch computation. Append-mode windows only
finalize once the watermark passes them, so comparisons restrict the
batch side to windows closed by the final watermark.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tweets_spark_top_10_spark.sources.registry import SCHEMAS, load_table
from tweets_spark_top_10_spark.streaming import (
    dedup_stream,
    file_stream,
    foreach_batch_overwrite,
    run_to_memory,
    windowed_count,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """events re-written as 4 *chronological* parquet files.

    File streams replay in modification-time order and the watermark
    advances between micro-batches — randomly-partitioned files would
    make the watermark jump to ~max after batch 1 and drop everything
    else as late. Chronological chunks mirror a real tailing source.
    """
    import glob
    import os
    import shutil

    base = tmp_path_factory.mktemp("events_stream")
    events = load_table(spark, sf_dir, "events")
    lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 4
    bounds = [None, lo + span, lo + 2 * span, lo + 3 * span, None]
    path = str(base / "stream")
    os.makedirs(path, exist_ok=True)
    for i in range(4):
        chunk = events
        if bounds[i] is not None:
            chunk = chunk.filter(F.col("ts") > F.lit(bounds[i]))
        if bounds[i + 1] is not None:
            chunk = chunk.filter(F.col("ts") <= F.lit(bounds[i + 1]))
        tmp_out = str(base / f"chunk{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        src = glob.glob(f"{tmp_out}/part-*.parquet")[0]
        dst = f"{path}/chunk{i}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return path


@pytest.fixture(scope="module")
def events_schema():
    return SCHEMAS["events"]


def _final_watermark_cutoff(spark, sf_dir, delay_secs):
    mx = load_table(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    import datetime

    return mx - datetime.timedelta(seconds=delay_secs)


def test_windowed_count_matches_batch(spark, sf_dir, events_dir, events_schema):
    stream = file_stream(spark, events_dir, events_schema, max_files_per_trigger=1)
    counts = windowed_count(
        stream, "ts", ["event_type"], window="1 hour", watermark="10 minutes"
    )
    q = run_to_memory(counts, "win_counts")
    q.awaitTermination()
    got = {
        (r.window_start, r.event_type): r.n
        for r in spark.table("win_counts").collect()
    }
    assert got, "stream emitted nothing"

    cutoff = _final_watermark_cutoff(spark, sf_dir, 600)
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("window.end") <= F.lit(cutoff))
        .select(F.col("window.start").alias("ws"), "event_type", "n")
    )
    expected = {(r.ws, r.event_type): r.n for r in batch.collect()}
    # Every batch-finalized window must match the streamed result exactly.
    for key, n in expected.items():
        assert got.get(key) == n, f"window {key}: stream={got.get(key)} batch={n}"


def test_streaming_dedup_drops_duplicates(spark, events_dir, events_schema, tmp_path):
    # Duplicate every row: same file replayed means duplicates arrive
    # within the watermark horizon and must be dropped.
    dup_dir = str(tmp_path / "dup")
    base = spark.read.schema(events_schema).parquet(events_dir)
    base.union(base).repartition(2).write.mode("overwrite").parquet(dup_dir)

    stream = file_stream(spark, dup_dir, events_schema)
    deduped = dedup_stream(stream, ["event_id"], "ts", watermark="1 hour")
    q = run_to_memory(deduped, "dedup_out")
    q.awaitTermination()
    n_out = spark.table("dedup_out").count()
    n_unique = base.select("event_id").distinct().count()
    assert n_out == n_unique, f"dedup kept {n_out}, expected {n_unique}"


def test_foreach_batch_overwrite_idempotent(
    spark, sf_dir, events_dir, events_schema, tmp_path
):
    out = str(tmp_path / "out")

    def run(checkpoint: str):
        stream = file_stream(spark, events_dir, events_schema)
        counts = windowed_count(
            stream, "ts", ["event_type"], window="1 hour", watermark="10 minutes"
        )
        q = foreach_batch_overwrite(
            counts,
            out,
            partition_by=["event_type"],
            checkpoint=checkpoint,
        )
        q.awaitTermination()

    run(str(tmp_path / "ckpt1"))
    first = sorted(
        (r.window_start, r.event_type, r.n)
        for r in spark.read.parquet(out).collect()
    )
    assert first, "sink wrote nothing"
    # Re-running the whole pipeline (fresh checkpoint) overwrites the
    # same partitions with the same content — the idempotent replacement
    # for the reference's ES delete-then-insert (App.java:146-157).
    run(str(tmp_path / "ckpt2"))
    second = sorted(
        (r.window_start, r.event_type, r.n)
        for r in spark.read.parquet(out).collect()
    )
    assert first == second


def _has_protobuf() -> bool:
    # transformWithStateInPandas speaks protobuf to the state server;
    # the runtime dependency is missing from this container (PySpark
    # declares it optional) and installs are unavailable.
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.parametrize(
    "impl",
    [
        "apply_in_pandas",
        pytest.param(
            "transform_with_state",
            marks=pytest.mark.skipif(
                not _has_protobuf(),
                reason="transformWithStateInPandas needs google.protobuf "
                "(absent from container; pip install unavailable) — the "
                "differential gate runs wherever protobuf exists",
            ),
        ),
    ],
)
def test_stateful_sessionization_matches_batch(
    spark, sf_dir, events_dir, events_schema, impl
):
    """Stateful sessions == batch lag-gap sessions, for BOTH custom-state
    APIs (applyInPandasWithState and transformWithStateInPandas).

    Closed-session semantics: every batch session that ends more than
    (gap + watermark-delay) before the max event time MUST be emitted by
    the stream; everything the stream emits must be a real batch session.
    """
    import datetime

    from pyspark.sql import Window
    from tweets_spark_top_10_spark.streaming import (
        sessionize_transform_with_state,
        sessionize_with_state,
    )

    sessionize = (
        sessionize_with_state
        if impl == "apply_in_pandas"
        else sessionize_transform_with_state
    )
    gap_s, wm_s = 7200, 600
    stream = file_stream(spark, events_dir, events_schema, max_files_per_trigger=1)
    sessions = sessionize(
        stream, "ts", "user_id", gap_seconds=gap_s, watermark="10 minutes"
    )
    q = run_to_memory(sessions, f"state_sessions_{impl}")
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table(f"state_sessions_{impl}").collect()
    }
    assert got, "stateful stream emitted nothing"

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    batch = (
        events.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (
                F.col("prev_ts").isNull()
                | (
                    F.unix_micros("ts") - F.unix_micros("prev_ts")
                    > gap_s * 1_000_000
                )
            ).cast("int"),
        )
        .withColumn("sess_id", F.sum("new_sess").over(w))
        .groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    all_sessions = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch.collect()
    }
    mx = events.agg(F.max("ts")).collect()[0][0]
    cutoff = mx - datetime.timedelta(seconds=gap_s + wm_s)
    must_emit = {s for s in all_sessions if s[2] < cutoff}

    assert got <= all_sessions, f"phantom sessions: {sorted(got - all_sessions)[:3]}"
    missing = must_emit - got
    assert not missing, f"{len(missing)} closed sessions never emitted: {sorted(missing)[:3]}"


def test_stateful_session_absorbs_earlier_late_event(
    spark, events_schema, tmp_path
):
    """A late-but-within-watermark event that PREDATES the stored
    session's start must lower session_start to it (session_window
    semantics: the merged session starts at its earliest member).

    Regression test: the merge branch used to extend only session_end.
    """
    import datetime
    import os

    import pandas as pd
    from tweets_spark_top_10_spark.streaming import sessionize_with_state

    def write_batch(name, rows, mtime):
        p = str(tmp_path / name)
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": [pd.Timestamp(r[1]) for r in rows],
                "user_id": [r[2] for r in rows],
                "event_type": "x",
                "value": 1.0,
                "props": "{}",
            }
        ).to_parquet(p, coerce_timestamps="us", allow_truncated_timestamps=True)
        os.utime(p, (mtime, mtime))

    t = datetime.datetime(2024, 1, 1, 10, 0)
    h = datetime.timedelta(minutes=30)
    # Batch 1: the session as first seen (10:30). Batch 2: a late event
    # at 10:00 — older than the stored start, newer than the 2h
    # watermark. Batch 3: a far-future event closing the session.
    write_batch("b1.parquet", [(1, t + h, 1)], 1_000)
    write_batch("b2.parquet", [(2, t, 1)], 2_000)
    write_batch("b3.parquet", [(3, t + datetime.timedelta(hours=10), 99)], 3_000)

    stream = file_stream(spark, str(tmp_path), events_schema, max_files_per_trigger=1)
    sessions = sessionize_with_state(
        stream, "ts", "user_id", gap_seconds=3600, watermark="2 hours"
    )
    q = run_to_memory(sessions, "late_start_sessions")
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("late_start_sessions").collect()
        if r.user_id == 1
    }
    assert got == {(1, t, t + h, 2)}, got


def test_streaming_top_k_matches_batch(spark, sf_dir, events_dir, events_schema, tmp_path):
    """The reference query, streaming: windowed counts -> per-window
    top-3 ranked in the foreachBatch sink -> partition-overwritten
    parquet. Finalized windows must equal the batch top-3 exactly."""
    from tweets_spark_top_10_spark.streaming import windowed_top_k
    from tweets_spark_top_10_spark.streaming.sinks import foreach_batch_top_k

    out = str(tmp_path / "topk_out")
    stream = file_stream(spark, events_dir, events_schema, max_files_per_trigger=1)
    counts = windowed_top_k(
        stream, "ts", "event_type", window="1 hour", watermark="10 minutes"
    )
    q = foreach_batch_top_k(
        counts, out, checkpoint=str(tmp_path / "ckpt"), key="event_type", k=3
    )
    q.awaitTermination()

    got = {
        (r.window_start, r.event_type): r.n
        for r in spark.read.parquet(out).collect()
    }
    assert got, "top-k sink wrote nothing"
    per_window = {}
    for (ws, et), n in got.items():
        per_window.setdefault(ws, []).append((n, et))
    assert all(len(v) <= 3 for v in per_window.values())

    cutoff = _final_watermark_cutoff(spark, sf_dir, 600)
    from pyspark.sql import Window as W

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("window.end") <= F.lit(cutoff))
        .select(F.col("window.start").alias("ws"), "event_type", "n")
        .withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("ws").orderBy(F.desc("n"), F.asc("event_type"))
            ),
        )
        .filter(F.col("rank") <= 3)
    )
    expected = {(r.ws, r.event_type): r.n for r in batch.collect()}
    for key, n in expected.items():
        assert got.get(key) == n, f"{key}: stream={got.get(key)} batch={n}"


def test_session_window_matches_batch(spark, sf_dir, events_dir, events_schema):
    """Built-in session_window streaming == the same session_window agg
    run as a batch query, for sessions closed by the final watermark."""
    import datetime

    from tweets_spark_top_10_spark.streaming import session_agg

    stream = file_stream(spark, events_dir, events_schema, max_files_per_trigger=1)
    sessions = session_agg(stream, "ts", "user_id", gap="2 hours", watermark="10 minutes")
    q = run_to_memory(sessions, "sw_sessions")
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start): (r.n_events, r.session_value)
        for r in spark.table("sw_sessions").collect()
    }
    assert got, "session stream emitted nothing"

    events = load_table(spark, sf_dir, "events")
    batch = (
        events.groupBy(F.session_window("ts", "2 hours"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )
    mx = events.agg(F.max("ts")).collect()[0][0]
    cutoff = mx - datetime.timedelta(seconds=600)
    for r in batch.collect():
        if r.session_end <= cutoff:
            assert got.get((r.user_id, r.session_start)) == (
                r.n_events,
                r.session_value,
            ), f"user {r.user_id} @ {r.session_start}"


def test_rate_source_windowed_count_runs(spark):
    """Rate source smoke: a windowed count over the built-in load
    generator produces rows within a bounded run."""
    import time

    from tweets_spark_top_10_spark.streaming.sources import rate_stream

    counts = windowed_count(
        rate_stream(spark, rows_per_second=200),
        "timestamp",
        [],
        window="1 second",
        watermark="0 seconds",
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("rate_counts")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 25
        while time.time() < deadline and not spark.table("rate_counts").count():
            time.sleep(1)
        assert spark.table("rate_counts").count() > 0
    finally:
        q.stop()


def test_stream_static_enrichment_matches_batch(spark, sf_dir, events_dir, events_schema):
    """Stream-static broadcast join: every streamed event enriched with
    its user's segment; totals must equal the batch join."""
    from tweets_spark_top_10_spark.streaming.joins import enrich_stream

    dim = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    stream = file_stream(spark, events_dir, events_schema)
    enriched = enrich_stream(stream, dim, on="user_id")
    q = run_to_memory(enriched.select("event_id", "c_mktsegment"), "enriched")
    q.awaitTermination()
    got = (
        spark.table("enriched")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .join(dim, "user_id")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert {(r.c_mktsegment, r["count"]) for r in got} == {
        (r.c_mktsegment, r["count"]) for r in batch
    }


def test_stream_stream_interval_join_matches_batch(
    spark, sf_dir, events_dir, events_schema
):
    """Stream-stream interval join (purchases x views within 1h per
    user) == the equivalent batch theta join, for pairs whose left
    event closed under the final watermark."""
    import datetime

    from tweets_spark_top_10_spark.streaming.joins import interval_join

    def split(df, et, suffix):
        return df.filter(F.col("event_type") == et).select(
            F.col("event_id").alias(f"eid_{suffix}"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias(f"ts_{suffix}"),
        )

    stream = file_stream(spark, events_dir, events_schema, max_files_per_trigger=1)
    purchases = split(stream, "purchase", "p").withColumnRenamed("user_id", "user_id")
    views = split(stream, "view", "v")
    joined = interval_join(
        purchases.withColumnRenamed("ts_p", "tsp"),
        views.withColumnRenamed("ts_v", "tsv"),
        key="user_id",
        left_ts="tsp",
        right_ts="tsv",
        lookback="1 hour",
        watermark="10 minutes",
    ).select("eid_p", "eid_v")
    q = run_to_memory(joined, "ssj_out")
    q.awaitTermination()
    got = {(r.eid_p, r.eid_v) for r in spark.table("ssj_out").collect()}
    assert got, "stream-stream join emitted nothing"

    ev = load_table(spark, sf_dir, "events")
    p = split(ev, "purchase", "p")
    v = split(ev, "view", "v")
    batch = p.join(
        v,
        (p.user_id == v.user_id)
        & (F.col("ts_v") >= F.col("ts_p") - F.expr("INTERVAL 1 hour"))
        & (F.col("ts_v") <= F.col("ts_p")),
    ).select("eid_p", "eid_v", "ts_p")
    mx = ev.agg(F.max("ts")).collect()[0][0]
    cutoff = mx - datetime.timedelta(seconds=600 + 3600)
    expected_closed = {
        (r.eid_p, r.eid_v) for r in batch.collect() if r.ts_p < cutoff
    }
    all_pairs = {(r.eid_p, r.eid_v) for r in batch.collect()}
    assert got <= all_pairs, f"phantom pairs: {sorted(got - all_pairs)[:3]}"
    missing = expected_closed - got
    assert not missing, f"{len(missing)} closed pairs missing: {sorted(missing)[:3]}"


def test_late_rows_dropped_after_watermark(spark, tmp_path):
    """Exact watermark semantics on synthetic data: a row arriving in a
    later micro-batch with event time older than (max_seen - delay) must
    be dropped from an append-mode windowed aggregate; a late-but-within
    -delay row must still count."""
    import datetime as dt
    import os

    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("k", T.StringType())]
    )
    base = dt.datetime(2024, 6, 1, 10, 0, 0)
    d = str(tmp_path / "late_stream")
    os.makedirs(d)

    def write_chunk(name, rows, mtime):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / name))
        import glob as g
        import shutil

        src = g.glob(str(tmp_path / name / "part-*.parquet"))[0]
        dst = f"{d}/{name}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (mtime, mtime))

    # b0: events in windows 10:00 (one row) and 10:05 (two rows)
    write_chunk(
        "c1",
        [
            (base + dt.timedelta(minutes=1), "a"),
            (base + dt.timedelta(minutes=6), "a"),
            (base + dt.timedelta(minutes=7), "a"),
        ],
        1_700_000_000,
    )
    # b1: 10:30 → watermark after b1 = 10:20
    write_chunk("c2", [(base + dt.timedelta(minutes=30), "a")], 1_700_000_060)
    # b2: wm=10:20 finalizes the 10:00 and 10:05 windows THIS batch
    write_chunk("c3", [(base + dt.timedelta(minutes=31), "a")], 1_700_000_120)
    # b3: 10:02 arrives AFTER its window finalized → must be dropped
    # (append mode never re-emits); 10:27 is within the open horizon → kept
    write_chunk(
        "c4",
        [
            (base + dt.timedelta(minutes=2), "a"),
            (base + dt.timedelta(minutes=27), "a"),
        ],
        1_700_000_180,
    )
    # b4: push watermark beyond every open window so all finalize
    write_chunk("c5", [(base + dt.timedelta(minutes=60), "a")], 1_700_000_240)

    stream = file_stream(spark, d, schema, max_files_per_trigger=1)
    counts = windowed_count(stream, "ts", ["k"], window="5 minutes", watermark="10 minutes")
    q = run_to_memory(counts, "late_counts")
    q.awaitTermination()
    rows = spark.table("late_counts").collect()
    got = {r.window_start.minute: r.n for r in rows}
    assert len(rows) == len(got), f"append mode re-emitted a window: {rows}"
    # 10:00 window stays 1 — the post-finalization late row was dropped
    assert got.get(0) == 1, got
    assert got.get(5) == 2, got
    assert got.get(25) == 1, got
    assert got.get(30) == 2, got  # 10:30 + 10:31


def test_checkpoint_resume_exactly_once(spark, tmp_path):
    """Stop a checkpointed stream, add new files, restart with the SAME
    checkpoint: previously-processed files are not re-read (no
    duplicates) and new files are picked up — exactly-once resumption,
    the property the reference's delete-then-insert dance was trying to
    fake (App.java:146-157)."""
    import datetime as dt
    import glob as g
    import os
    import shutil

    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("k", T.StringType())]
    )
    base = dt.datetime(2024, 6, 1, 0, 0, 0)
    d = str(tmp_path / "resume_stream")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(d)

    def write_chunk(name, rows, mtime):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / name))
        src = g.glob(str(tmp_path / name / "part-*.parquet"))[0]
        dst = f"{d}/{name}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (mtime, mtime))

    def run_pass():
        stream = file_stream(spark, d, schema)
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_chunk("a", [(base + dt.timedelta(minutes=i), "x") for i in range(5)], 1_700_000_000)
    run_pass()
    assert spark.read.parquet(out).count() == 5

    write_chunk("b", [(base + dt.timedelta(minutes=60 + i), "y") for i in range(3)], 1_700_000_100)
    run_pass()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 8, f"expected 5+3 rows exactly once, got {len(rows)}"
    assert len({(r.ts, r.k) for r in rows}) == 8, "duplicate rows after resume"


def test_update_mode_final_counts_match_batch(spark, sf_dir, events_dir, events_schema):
    """Update output mode: per-batch refinements; the LAST emission per
    window must equal the batch count for EVERY window (update mode
    needs no watermark finality, unlike append)."""
    stream = file_stream(spark, events_dir, events_schema, max_files_per_trigger=1)
    counts = windowed_count(
        stream, "ts", ["event_type"], window="1 hour", watermark="10 minutes"
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("upd_counts")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # memory sink in update mode appends each refinement; last write wins
    final = {}
    for r in spark.table("upd_counts").collect():
        final[(r.window_start, r.event_type)] = max(
            r.n, final.get((r.window_start, r.event_type), 0)
        )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "event_type", "n")
    )
    expected = {(r.ws, r.event_type): r.n for r in batch.collect()}
    assert final == expected


def test_stream_over_hour_partitioned_dirs(spark, sf_dir, tmp_path):
    """Streaming backfill of the reference's own layout: readStream over
    a year=/month=/day=/hour= partitioned table (App.java:60-63's dir
    convention) picks up partition columns and replays every hour."""
    from tweets_spark_top_10_spark.sources.writers import write_partitioned
    from pyspark.sql import types as T

    events = load_table(spark, sf_dir, "events")
    base = str(tmp_path / "hourly")
    write_partitioned(
        events.withColumns(
            {
                "year": F.year("ts"),
                "month": F.month("ts"),
                "day": F.dayofmonth("ts"),
                "hour": F.hour("ts"),
            }
        ),
        base,
        ["year", "month", "day", "hour"],
    )
    schema = T.StructType(
        SCHEMAS["events"].fields
        + [
            T.StructField("year", T.IntegerType()),
            T.StructField("month", T.IntegerType()),
            T.StructField("day", T.IntegerType()),
            T.StructField("hour", T.IntegerType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("basePath", base)
        .load(base + "/year=*/month=*/day=*/hour=*")
    )
    counts = (
        stream.groupBy("year", "month", "day", "hour")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("hourly_backfill")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.year, r.month, r.day, r.hour): r.n
        for r in spark.table("hourly_backfill").collect()
    }
    expected = {
        (r.year, r.month, r.day, r.hour): r.n
        for r in events.groupBy(
            F.year("ts").alias("year"),
            F.month("ts").alias("month"),
            F.dayofmonth("ts").alias("day"),
            F.hour("ts").alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected


def test_streaming_minhash_index_matches_batch(spark, sf_dir, tmp_path):
    """Incremental signature upsert == batch signatures of the final
    corpus state.

    Three micro-batches: first half of the docs, second half, then one
    doc RE-SENT with mutated text.  The maintained table must equal
    minhash_signatures() computed directly on the final corpus (mutated
    doc included), bucket column and all — exact, because the whole
    path is deterministic."""
    import pandas as pd

    from tweets_spark_top_10_spark.functions.dedup import minhash_signatures
    from tweets_spark_top_10_spark.functions.sampling import hash_bucket
    from tweets_spark_top_10_spark.streaming.sketch import maintain_minhash_index

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    half = len(pdf) // 2
    mutated_id = int(pdf.doc_id.iloc[0])
    mutated_text = "entirely new text for the resent document"

    src = tmp_path / "doc_stream"
    src.mkdir()
    pdf.iloc[:half].to_parquet(src / "b1.parquet", index=False)
    pdf.iloc[half:].to_parquet(src / "b2.parquet", index=False)
    pd.DataFrame({"doc_id": [mutated_id], "text": [mutated_text]}).to_parquet(
        src / "b3.parquet", index=False
    )

    stream = file_stream(
        spark,
        str(src),
        docs.schema,
        max_files_per_trigger=1,
    )
    table = str(tmp_path / "sig_table")
    q = maintain_minhash_index(
        stream, table, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    got = sorted(map(tuple, spark.read.parquet(table).collect()))
    final_corpus = spark.createDataFrame(
        pd.concat(
            [
                pdf[pdf.doc_id != mutated_id],
                pd.DataFrame(
                    {"doc_id": [mutated_id], "text": [mutated_text]}
                ),
            ]
        )
    )
    want_df = minhash_signatures(final_corpus).withColumn(
        "bucket", hash_bucket("doc_id", 16)
    )
    # align column order with the parquet table (partition col lands last)
    want = sorted(
        map(tuple, want_df.select(*spark.read.parquet(table).columns).collect())
    )
    assert len(got) == len(pdf)
    assert got == want


def test_signature_upsert_recovers_from_stale_swap_dirs(spark, sf_dir, tmp_path):
    """Crash re-entrancy: leftover staging/aside dirs from an
    interrupted swap must not break (or contaminate) the next upsert."""
    from tweets_spark_top_10_spark.functions.dedup import minhash_signatures
    from tweets_spark_top_10_spark.functions.sampling import hash_bucket
    from tweets_spark_top_10_spark.streaming.sketch import upsert_signature_batch

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    table = str(tmp_path / "sigs")

    # Simulate a prior crash: stale staging dir with garbage content.
    stale = tmp_path / "sigs__stage" / "bucket=3"
    stale.mkdir(parents=True)
    (stale / "junk.parquet").write_bytes(b"not parquet")
    (tmp_path / "sigs__old").mkdir()

    upsert_signature_batch(spark, docs, table)
    got = sorted(map(tuple, spark.read.parquet(table).collect()))
    cols = spark.read.parquet(table).columns
    want = sorted(
        map(
            tuple,
            minhash_signatures(docs)
            .withColumn("bucket", hash_bucket("doc_id", 16))
            .select(*cols)
            .collect(),
        )
    )
    assert got == want
    import os

    assert not os.path.exists(str(tmp_path / "sigs__stage"))
    assert not os.path.exists(str(tmp_path / "sigs__old"))


def test_signature_upsert_restores_bucket_stranded_mid_swap(
    spark, sf_dir, tmp_path
):
    """Crash BETWEEN a bucket's rename pair strands its only copy in the
    aside dir; the next upsert must move it back in — not delete it —
    so rows of docs absent from the new batch survive."""
    import os
    import shutil

    from tweets_spark_top_10_spark.streaming.sketch import upsert_signature_batch

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    first = docs.limit(60)
    table = str(tmp_path / "sigs")
    upsert_signature_batch(spark, first, table)
    before = sorted(map(tuple, spark.read.parquet(table).collect()))

    # Simulate the torn swap: one live bucket dir moved to the aside.
    buckets = [d for d in os.listdir(table) if d.startswith("bucket=")]
    victim = sorted(buckets)[0]
    aside = tmp_path / "sigs__old"
    aside.mkdir()
    shutil.move(os.path.join(table, victim), str(aside / victim))

    # Next batch touches only OTHER docs (disjoint ids): the stranded
    # bucket's rows can come back only via the aside-restore path.
    second = docs.filter(~docs.doc_id.isin([r.doc_id for r in first.collect()])).limit(20)
    upsert_signature_batch(spark, second, table)
    after = {t for t in map(tuple, spark.read.parquet(table).collect())}
    missing = set(before) - after
    assert not missing, f"{len(missing)} stranded rows lost (e.g. {sorted(missing)[:2]})"
    assert not os.path.exists(str(aside))


def test_streaming_ann_enrichment_matches_batch(spark, sf_dir, tmp_path):
    """Incrementally-maintained IVF index + streamed query enrichment ==
    batch ivf_knn over the final corpus state — exact.

    Vector stream: first half, second half, then one vector RE-SENT
    negated (it must move cells and replace its old row).  The
    maintained cell table must equal the batch assignment of the final
    corpus, and a query stream enriched against it must produce exactly
    the batch ivf_knn top-5 (same fixed centroid book)."""
    import pandas as pd
    from pyspark.sql import types as T

    from tweets_spark_top_10_spark.functions.similarity import (
        ivf_assign_cells,
        ivf_centroids,
        ivf_knn,
    )
    from tweets_spark_top_10_spark.streaming.ann import (
        enrich_stream_ann,
        maintain_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    cands = emb.filter(F.col("vec_id") >= 10)
    qdf = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # Fixed offline coarse book (97-stride over the pre-mutation corpus)
    cents = ivf_centroids(cands, "vec_id")

    pdf = cands.toPandas().sort_values("vec_id").reset_index(drop=True)
    pdf["embedding"] = pdf["embedding"].map(list)
    half = len(pdf) // 2
    mutated_id = int(pdf.vec_id.iloc[1])  # not a 97-stride centroid member
    mutated_vec = [
        -float(v) for v in pdf.loc[pdf.vec_id == mutated_id, "embedding"].iloc[0]
    ]

    src = tmp_path / "vec_stream"
    src.mkdir()
    pdf.iloc[:half].to_parquet(src / "b1.parquet", index=False)
    pdf.iloc[half:].to_parquet(src / "b2.parquet", index=False)
    pd.DataFrame({"vec_id": [mutated_id], "embedding": [mutated_vec]}).to_parquet(
        src / "b3.parquet", index=False
    )

    vec_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    stream = file_stream(spark, str(src), vec_schema, max_files_per_trigger=1)
    table = str(tmp_path / "cell_table")
    maintain_ivf_index(
        stream, cents, table, checkpoint=str(tmp_path / "ckpt_idx")
    ).awaitTermination()

    final_cands = cands.filter(F.col("vec_id") != mutated_id).unionByName(
        spark.createDataFrame(
            [(mutated_id, mutated_vec)], schema=vec_schema
        )
    )
    got_idx = {
        (r.vec_id, r.cell_id) for r in spark.read.parquet(table).collect()
    }
    want_idx = {
        (r.vec_id, r.cell_id)
        for r in ivf_assign_cells(final_cands, cents, "vec_id", n_probe=1).collect()
    }
    assert got_idx == want_idx

    qsrc = tmp_path / "query_stream"
    qsrc.mkdir()
    qpdf = qdf.toPandas()
    qpdf["embedding"] = qpdf["embedding"].map(list)
    qpdf.to_parquet(qsrc / "q1.parquet", index=False)
    q_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    qstream = file_stream(spark, str(qsrc), q_schema, max_files_per_trigger=1)
    out = str(tmp_path / "ann_out")
    enrich_stream_ann(
        qstream, table, cents, out, checkpoint=str(tmp_path / "ckpt_q")
    ).awaitTermination()

    got = {
        (r.query_id, r.vec_id, r.cos_sim, r.rank)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.query_id, r.vec_id, r.cos_sim, r.rank)
        for r in ivf_knn(
            qdf, final_cands, k=5, cand_id="vec_id", centroids=cents
        ).collect()
    }
    assert got and got == want


def test_streaming_rp_ivf_index_matches_batch(spark, sf_dir, tmp_path):
    """Incrementally-maintained PROJECTED cell table == batch
    rp_array+ivf_assign_cells of the final corpus state against the
    same fixed projected centroid book — exact (rounded projections,
    deterministic argmin).  Includes a mutated-vector resend that must
    re-project and replace its old row, and the served top-5 through
    rp_ivf_rerank_knn's prebuilt path must equal the inline pipeline."""
    import pandas as pd
    from pyspark.sql import types as T

    from tweets_spark_top_10_spark.functions.similarity import (
        ivf_assign_cells,
        ivf_centroids,
        rp_array,
        rp_ivf_rerank_knn,
    )
    from tweets_spark_top_10_spark.streaming.ann import maintain_rp_ivf_index

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    cands = emb.filter(F.col("vec_id") >= 10)
    # fixed offline book in the PROJECTED space (pre-mutation corpus)
    cents = ivf_centroids(
        rp_array(cands, "vec_id", d_out=32), "vec_id", "rp_vec"
    ).localCheckpoint(eager=True)

    pdf = cands.toPandas().sort_values("vec_id").reset_index(drop=True)
    pdf["embedding"] = pdf["embedding"].map(list)
    half = len(pdf) // 2
    mutated_id = int(pdf.vec_id.iloc[1])
    mutated_vec = [
        -float(v) for v in pdf.loc[pdf.vec_id == mutated_id, "embedding"].iloc[0]
    ]
    src = tmp_path / "vec_stream"
    src.mkdir()
    pdf.iloc[:half].to_parquet(src / "b1.parquet", index=False)
    pdf.iloc[half:].to_parquet(src / "b2.parquet", index=False)
    pd.DataFrame({"vec_id": [mutated_id], "embedding": [mutated_vec]}).to_parquet(
        src / "b3.parquet", index=False
    )
    vec_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    stream = file_stream(spark, str(src), vec_schema, max_files_per_trigger=1)
    table = str(tmp_path / "rp_cell_table")
    maintain_rp_ivf_index(
        stream, cents, table, checkpoint=str(tmp_path / "ckpt_rp")
    ).awaitTermination()

    final_cands = cands.filter(F.col("vec_id") != mutated_id).unionByName(
        spark.createDataFrame([(mutated_id, mutated_vec)], schema=vec_schema)
    )
    want_cells = ivf_assign_cells(
        rp_array(final_cands, "vec_id", d_out=32), cents, "vec_id", "rp_vec",
        n_probe=1,
    )
    got_idx = {
        (r.vec_id, r.cell_id, tuple(r.rp_vec))
        for r in spark.read.parquet(table).collect()
    }
    want_idx = {
        (r.vec_id, r.cell_id, tuple(r.rp_vec)) for r in want_cells.collect()
    }
    assert got_idx == want_idx

    # serving from the maintained table == the inline pipeline
    qdf = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    maintained = spark.read.parquet(table).withColumnRenamed(
        "vec_id", "neighbor_id"
    )
    served = {
        tuple(r)
        for r in rp_ivf_rerank_knn(
            qdf, final_cands.withColumnRenamed("vec_id", "neighbor_id"),
            k=5, d_out=32, shortlist=50,
            centroids=cents, cand_cells=maintained,
        ).collect()
    }
    inline = {
        tuple(r)
        for r in rp_ivf_rerank_knn(
            qdf, final_cands.withColumnRenamed("vec_id", "neighbor_id"),
            k=5, d_out=32, shortlist=50, centroids=cents,
        ).collect()
    }
    assert served and served == inline


def test_streaming_pq_index_matches_batch(spark, sf_dir, tmp_path):
    """Incrementally-maintained PQ-codes table == batch pq_encode of the
    final corpus state against the same fixed codebook — exact (the
    argmin encode is deterministic). Includes a mutated-vector resend."""
    import pandas as pd
    from pyspark.sql import types as T

    from tweets_spark_top_10_spark.functions.pq import pq_codebook, pq_encode
    from tweets_spark_top_10_spark.functions.sampling import hash_bucket
    from tweets_spark_top_10_spark.functions.similarity import l2_norm
    from tweets_spark_top_10_spark.streaming.ann import maintain_pq_index

    emb = load_table(spark, sf_dir, "embeddings")
    n = l2_norm(F.col("embedding"))
    cands = emb.filter(F.col("vec_id") >= 10).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double") / n).alias(
            "embedding"
        ),
    )
    cb = pq_codebook(cands, "vec_id").localCheckpoint(eager=False)

    pdf = cands.toPandas().sort_values("vec_id").reset_index(drop=True)
    pdf["embedding"] = pdf["embedding"].map(list)
    half = len(pdf) // 2
    mutated_id = int(pdf.vec_id.iloc[2])
    mutated_vec = [
        -float(v) for v in pdf.loc[pdf.vec_id == mutated_id, "embedding"].iloc[0]
    ]

    src = tmp_path / "pq_vec_stream"
    src.mkdir()
    pdf.iloc[:half].to_parquet(src / "b1.parquet", index=False)
    pdf.iloc[half:].to_parquet(src / "b2.parquet", index=False)
    pd.DataFrame({"vec_id": [mutated_id], "embedding": [mutated_vec]}).to_parquet(
        src / "b3.parquet", index=False
    )

    vec_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    stream = file_stream(spark, str(src), vec_schema, max_files_per_trigger=1)
    table = str(tmp_path / "pq_table")
    maintain_pq_index(
        stream, cb, table, checkpoint=str(tmp_path / "ckpt_pq")
    ).awaitTermination()

    final_cands = cands.filter(F.col("vec_id") != mutated_id).unionByName(
        spark.createDataFrame([(mutated_id, mutated_vec)], schema=vec_schema)
    )
    got = sorted(
        (r.vec_id, r.m, r.code, r.bucket)
        for r in spark.read.parquet(table).collect()
    )
    want = sorted(
        (r.vec_id, r.m, r.code, r.bucket)
        for r in pq_encode(final_cands, cb, "vec_id")
        .withColumn("bucket", hash_bucket("vec_id", 16))
        .collect()
    )
    assert len(got) == 16 * len(pdf)
    assert got == want

    # ADC enrichment against the maintained codes table == batch
    # pq_adc_topk over the final corpus with the same codebook, exact.
    from tweets_spark_top_10_spark.functions.pq import pq_adc_topk
    from tweets_spark_top_10_spark.streaming.ann import enrich_stream_adc

    qdf = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double") / n).alias(
            "embedding"
        ),
    )
    qsrc = tmp_path / "pq_query_stream"
    qsrc.mkdir()
    qpdf = qdf.toPandas()
    qpdf["embedding"] = qpdf["embedding"].map(list)
    qpdf.to_parquet(qsrc / "q1.parquet", index=False)
    q_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    qstream = file_stream(spark, str(qsrc), q_schema, max_files_per_trigger=1)
    out = str(tmp_path / "adc_out")
    enrich_stream_adc(
        qstream, table, cb, out, checkpoint=str(tmp_path / "ckpt_adc")
    ).awaitTermination()
    got_adc = {
        (r.query_id, r.vec_id, r.approx_d2, r.rank)
        for r in spark.read.parquet(out).collect()
    }
    want_adc = {
        (r.query_id, r.vec_id, r.approx_d2, r.rank)
        for r in pq_adc_topk(
            qdf, final_cands, k=5, cand_id="vec_id", codebook=cb
        ).collect()
    }
    assert got_adc and got_adc == want_adc


def test_streaming_opq_adc_matches_batch(spark, sf_dir, tmp_path):
    """OPQ-composed streaming: codes maintained in the PERMUTED space
    (maintain_pq_index(perm=...)) + query-stream ADC enrichment through
    the same permutation == the batch pq_adc_opq pipeline over the
    final corpus state, exact. Includes a mutated-vector resend, and a
    checkpoint-wiped re-run to prove the batch_id-keyed overwrite sink
    is idempotent (not just at-least-once)."""
    import pandas as pd
    from pyspark.sql import types as T

    from tweets_spark_top_10_spark.functions.pq import (
        apply_permutation,
        opq_permutation,
        pq_adc_topk,
        pq_codebook,
        pq_encode,
    )
    from tweets_spark_top_10_spark.functions.sampling import hash_bucket
    from tweets_spark_top_10_spark.functions.similarity import l2_norm
    from tweets_spark_top_10_spark.streaming.ann import (
        enrich_stream_adc,
        maintain_pq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n = l2_norm(F.col("embedding"))
    cands = emb.filter(F.col("vec_id") >= 10).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double") / n).alias(
            "embedding"
        ),
    )
    perm = opq_permutation(cands).localCheckpoint(eager=False)
    cands_p = apply_permutation(cands, "vec_id", perm)
    cb = pq_codebook(cands_p, "vec_id").localCheckpoint(eager=False)

    pdf = cands.toPandas().sort_values("vec_id").reset_index(drop=True)
    pdf["embedding"] = pdf["embedding"].map(list)
    half = len(pdf) // 2
    mutated_id = int(pdf.vec_id.iloc[4])
    mutated_vec = [
        -float(v) for v in pdf.loc[pdf.vec_id == mutated_id, "embedding"].iloc[0]
    ]
    src = tmp_path / "opq_vec_stream"
    src.mkdir()
    pdf.iloc[:half].to_parquet(src / "b1.parquet", index=False)
    pdf.iloc[half:].to_parquet(src / "b2.parquet", index=False)
    pd.DataFrame({"vec_id": [mutated_id], "embedding": [mutated_vec]}).to_parquet(
        src / "b3.parquet", index=False
    )

    vec_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    stream = file_stream(spark, str(src), vec_schema, max_files_per_trigger=1)
    table = str(tmp_path / "opq_table")
    maintain_pq_index(
        stream, cb, table, checkpoint=str(tmp_path / "ckpt_opq"), perm=perm
    ).awaitTermination()

    final_cands = cands.filter(F.col("vec_id") != mutated_id).unionByName(
        spark.createDataFrame([(mutated_id, mutated_vec)], schema=vec_schema)
    )
    final_p = apply_permutation(final_cands, "vec_id", perm)
    got = sorted(
        (r.vec_id, r.m, r.code, r.bucket)
        for r in spark.read.parquet(table).collect()
    )
    want = sorted(
        (r.vec_id, r.m, r.code, r.bucket)
        for r in pq_encode(final_p, cb, "vec_id")
        .withColumn("bucket", hash_bucket("vec_id", 16))
        .collect()
    )
    assert len(got) == 16 * len(pdf)
    assert got == want

    qdf = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double") / n).alias(
            "embedding"
        ),
    )
    qsrc = tmp_path / "opq_query_stream"
    qsrc.mkdir()
    qpdf = qdf.toPandas()
    qpdf["embedding"] = qpdf["embedding"].map(list)
    qpdf.to_parquet(qsrc / "q1.parquet", index=False)
    q_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    out = str(tmp_path / "opq_adc_out")
    enrich_stream_adc(
        file_stream(spark, str(qsrc), q_schema, max_files_per_trigger=1),
        table,
        cb,
        out,
        checkpoint=str(tmp_path / "ckpt_opq_adc"),
        perm=perm,
    ).awaitTermination()
    got_adc = {
        (r.query_id, r.vec_id, r.approx_d2, r.rank)
        for r in spark.read.parquet(out).collect()
    }
    want_adc = {
        (r.query_id, r.vec_id, r.approx_d2, r.rank)
        for r in pq_adc_topk(
            apply_permutation(qdf, "query_id", perm),
            final_p,
            k=5,
            cand_id="vec_id",
            codebook=cb,
        ).collect()
    }
    assert got_adc and got_adc == want_adc

    # Replay with a wiped checkpoint: the same micro-batches regenerate
    # and OVERWRITE their batch_id subdirs — total row count unchanged
    # (an append sink would double it).
    n_rows = spark.read.parquet(out).count()
    enrich_stream_adc(
        file_stream(spark, str(qsrc), q_schema, max_files_per_trigger=1),
        table,
        cb,
        out,
        checkpoint=str(tmp_path / "ckpt_opq_adc_replay"),
        perm=perm,
    ).awaitTermination()
    assert spark.read.parquet(out).count() == n_rows


def test_foreach_batch_kv_upsert_matches_batch(spark, sf_dir, tmp_path):
    """The R12 analog (ES bulk index, App.java:159-178): streamed keyed
    upserts converge to the batch latest-state of the same rows —
    last-writer-wins on the key across micro-batches, max-seq within a
    batch — and replaying with a wiped checkpoint is idempotent."""
    import pandas as pd
    from pyspark.sql import types as T

    from tweets_spark_top_10_spark.streaming.sinks import foreach_batch_kv_upsert

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "value")
        .limit(60)
    )
    pdf = ev.toPandas().sort_values("event_id").reset_index(drop=True)
    # pandas defaults to ns parquet timestamps, which Spark's schema'd
    # stream reader rejects; the fixtures' own nanos handling lives in
    # load_table, not here.
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    src = tmp_path / "kv_stream"
    src.mkdir()
    pdf.iloc[:30].to_parquet(src / "b1.parquet", index=False)
    pdf.iloc[30:].to_parquet(src / "b2.parquet", index=False)
    # Resend two keys with mutated values and later timestamps — the
    # upsert must replace their rows.
    mut = pdf.iloc[:2].copy()
    mut["value"] = [111.0, 222.0]
    mut["ts"] = (mut["ts"] + pd.Timedelta(hours=1)).astype("datetime64[us]")
    mut.to_parquet(src / "b3.parquet", index=False)

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    table = str(tmp_path / "kv_table")
    foreach_batch_kv_upsert(
        file_stream(spark, str(src), schema, max_files_per_trigger=1),
        table,
        key_col="event_id",
        checkpoint=str(tmp_path / "ckpt_kv"),
        seq_col="ts",
    ).awaitTermination()

    got = {
        (r.event_id, r.ts, r.user_id, r.value)
        for r in spark.read.parquet(table).drop("bucket").collect()
    }
    all_rows = spark.createDataFrame(pd.concat([pdf, mut]), schema=schema)
    want = {
        tuple(r)
        for r in all_rows.groupBy("event_id")
        .agg(
            F.max_by(F.struct("ts", "user_id", "value"), F.col("ts")).alias("r")
        )
        .select("event_id", "r.ts", "r.user_id", "r.value")
        .collect()
    }
    assert len(got) == 60
    assert got == want

    # Idempotent replay: wiped checkpoint, same source -> same table.
    foreach_batch_kv_upsert(
        file_stream(spark, str(src), schema, max_files_per_trigger=1),
        table,
        key_col="event_id",
        checkpoint=str(tmp_path / "ckpt_kv2"),
        seq_col="ts",
    ).awaitTermination()
    got2 = {
        (r.event_id, r.ts, r.user_id, r.value)
        for r in spark.read.parquet(table).drop("bucket").collect()
    }
    assert got2 == want


def test_streaming_heavy_hitters_summary_certifies_exact_topk(spark, sf_dir, tmp_path):
    """Incrementally maintained MG summary == a valid candidate source:
    after draining the doc stream in micro-batches, candidates from the
    stored summary + exact rerank must equal the batch exact top-10,
    the summary must stay bounded at capacity+1 rows, and the certify
    path (not the exhaustive fallback) must be the one taken."""
    import pandas as pd

    from tweets_spark_top_10_spark.functions.heavy_hitters import (
        candidates_from_summary,
    )
    from tweets_spark_top_10_spark.functions.text import tokenize
    from tweets_spark_top_10_spark.streaming.heavy_hitters import (
        maintain_heavy_hitters,
        top_k_from_summary,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    third = len(pdf) // 3
    src = tmp_path / "hh_docs"
    src.mkdir()
    pdf.iloc[:third].to_parquet(src / "b1.parquet", index=False)
    pdf.iloc[third : 2 * third].to_parquet(src / "b2.parquet", index=False)
    pdf.iloc[2 * third :].to_parquet(src / "b3.parquet", index=False)

    stream = file_stream(spark, str(src), docs.schema, max_files_per_trigger=1)
    toks_stream = stream.select(F.explode(tokenize(F.col("text"))).alias("token"))
    table = str(tmp_path / "mg_summary")
    cap = 512
    q = maintain_heavy_hitters(
        toks_stream, table, checkpoint=str(tmp_path / "hh_ckpt"), capacity=cap
    )
    q.awaitTermination()

    summary = spark.read.parquet(table)
    assert summary.count() <= cap + 1
    # total-count row carries the full stream length
    n_meta = summary.where(F.col("token").isNull()).collect()
    assert len(n_meta) == 1

    corpus_tokens = docs.select(F.explode(tokenize(F.col("text"))).alias("token"))
    assert (
        candidates_from_summary(summary, "token", 10, cap) is not None
    ), "summary failed to certify — capacity undersized for fixture"
    got = top_k_from_summary(spark, table, corpus_tokens, k=10, capacity=cap)
    want = (
        corpus_tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(10)
    )
    assert got.collect() == want.collect()


def test_streaming_bloom_bits_match_batch_build(spark, sf_dir, tmp_path):
    """Incrementally OR-merged Bloom words == the single-pass batch
    build over all streamed keys, bit for bit (bit_or is mergeable and
    idempotent) — including after a re-sent (duplicated) batch."""
    import pandas as pd

    from tweets_spark_top_10_spark.functions.bloom import (
        bloom_build,
        bloom_might_contain,
    )
    from tweets_spark_top_10_spark.streaming.bloom import (
        maintain_bloom,
        read_bloom_words,
    )

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    pdf = cust.toPandas().sort_values("c_custkey").reset_index(drop=True)
    half = len(pdf) // 2
    src = tmp_path / "bloom_keys"
    src.mkdir()
    pdf.iloc[:half].to_parquet(src / "b1.parquet", index=False)
    pdf.iloc[half:].to_parquet(src / "b2.parquet", index=False)
    # duplicate delivery of batch 1: idempotent by construction
    pdf.iloc[:half].to_parquet(src / "b3.parquet", index=False)

    stream = file_stream(spark, str(src), cust.schema, max_files_per_trigger=1)
    table = str(tmp_path / "bloom_words")
    q = maintain_bloom(
        stream, table, checkpoint=str(tmp_path / "bloom_ckpt"), key_col="c_custkey"
    )
    q.awaitTermination()

    got = read_bloom_words(spark, table)
    want = bloom_build(cust, "c_custkey")
    assert got == want
    # and the maintained filter admits every member key
    hits = cust.where(bloom_might_contain(F.col("c_custkey"), got)).count()
    assert hits == cust.count()


def test_streaming_cdc_snapshot_matches_batch_apply(spark, sf_dir, tmp_path):
    """Stream-maintained CDC snapshot == batch apply_changes over the
    full change log, value-exact — including a DUPLICATED batch file
    (at-least-once replay) and seq-DESCENDING file names (delivery
    order decoupled from seq order; the seq-beats-stored rule, not
    arrival order, decides every merge). Tombstoned keys stay dead
    even when a pre-delete upsert arrives after the delete."""
    import pandas as pd

    from tweets_spark_top_10_spark.operators.merge import apply_changes
    from tweets_spark_top_10_spark.streaming.cdc import (
        init_cdc_table,
        maintain_cdc_snapshot,
        read_cdc_snapshot,
    )

    base = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .limit(50)
    )
    keys = [r["c_custkey"] for r in base.collect()]
    log = []
    for i, k in enumerate(keys[:20]):
        log.append((k, f"upd_{k}", 1.0 * i, "U", i + 1))
    for i, k in enumerate(keys[5:10]):
        log.append((k, f"dead_{k}", 0.0, "D", 100 + i))
    for i in range(3):  # brand-new keys
        log.append((900000 + i, f"new_{i}", -1.0, "I", 200 + i))
    # an upsert with seq OLDER than key 5..7's delete, delivered later
    for i, k in enumerate(keys[5:8]):
        log.append((k, f"zombie_{k}", 9.9, "U", 50 + i))
    schema = "c_custkey long, c_name string, c_acctbal double, op string, seq long"
    changes = spark.createDataFrame(log, schema)

    src = tmp_path / "cdc_changes"
    src.mkdir()
    pdf = pd.DataFrame(log, columns=["c_custkey", "c_name", "c_acctbal", "op", "seq"])
    # deliver high-seq changes FIRST (b1), low-seq later (b2), then a
    # duplicate of b1 (replay)
    hi, lo = pdf[pdf["seq"] >= 50], pdf[pdf["seq"] < 50]
    hi.to_parquet(src / "b1.parquet", index=False)
    lo.to_parquet(src / "b2.parquet", index=False)
    hi.to_parquet(src / "b3.parquet", index=False)

    table = str(tmp_path / "cdc_table")
    init_cdc_table(base, table)
    stream = file_stream(spark, str(src), changes.schema, max_files_per_trigger=1)
    q = maintain_cdc_snapshot(
        stream, table, checkpoint=str(tmp_path / "cdc_ckpt"), key="c_custkey"
    )
    q.awaitTermination()

    got = sorted(
        map(tuple, read_cdc_snapshot(spark, table).collect())
    )
    want = sorted(map(tuple, apply_changes(base, changes, "c_custkey").collect()))
    assert got == want
    # the zombie upsert must NOT have resurrected deleted keys
    got_keys = {t[0] for t in got}
    assert not any(k in got_keys for k in keys[5:8])


def test_streaming_ivm_view_tracks_snapshot(spark, sf_dir, tmp_path):
    """Stream-maintained additive rollup: after every-batch maintenance
    over a change stream with a DUPLICATED batch (replay) and
    seq-out-of-order delivery, the view equals a direct aggregate of
    the final maintained snapshot AND of the batch-merged log."""
    import pandas as pd

    from tweets_spark_top_10_spark.operators.ivm import build_agg_view
    from tweets_spark_top_10_spark.operators.merge import apply_changes
    from tweets_spark_top_10_spark.streaming.cdc import read_cdc_snapshot
    from tweets_spark_top_10_spark.streaming.ivm import maintain_agg_view

    # change log over a tiny keyed table: inserts, group-moving
    # updates, deletes — cents-style exact longs
    log = []
    for i in range(40):
        log.append((i, f"g{i % 4}", 100 + i, "I", 1))
    for i in range(0, 40, 2):
        log.append((i, f"g{(i + 1) % 4}", 200 + i, "U", 2))  # move group
    for i in range(0, 40, 5):
        log.append((i, f"g{i % 4}", 0, "D", 3))
    schema = "k long, g string, v long, op string, seq long"
    changes = spark.createDataFrame(log, schema)

    src = tmp_path / "ivm_changes"
    src.mkdir()
    pdf = pd.DataFrame(log, columns=["k", "g", "v", "op", "seq"])
    hi, lo = pdf[pdf["seq"] >= 3], pdf[pdf["seq"] < 3]
    hi.to_parquet(src / "b1.parquet", index=False)   # deletes arrive first
    lo.to_parquet(src / "b2.parquet", index=False)
    hi.to_parquet(src / "b3.parquet", index=False)   # replay

    snap, view = str(tmp_path / "ivm_snap"), str(tmp_path / "ivm_view")
    stream = file_stream(spark, str(src), changes.schema, max_files_per_trigger=1)
    q = maintain_agg_view(
        stream, snap, view, checkpoint=str(tmp_path / "ivm_ckpt"),
        key="k", group_cols=["g"], sum_cols=["v"],
    )
    q.awaitTermination()

    got = {
        r["g"]: (r["n"], r["sum_v"])
        for r in spark.read.parquet(view).collect()
    }
    from_snapshot = {
        r["g"]: (r["n"], r["sum_v"])
        for r in build_agg_view(
            read_cdc_snapshot(spark, snap), ["g"], ["v"]
        ).collect()
    }
    empty_base = spark.createDataFrame([], "k long, g string, v long")
    from_log = {
        r["g"]: (r["n"], r["sum_v"])
        for r in build_agg_view(
            apply_changes(empty_base, changes, "k"), ["g"], ["v"]
        ).collect()
    }
    assert got == from_snapshot == from_log and got


def test_ivm_replay_after_crash_between_swaps_converges(spark, tmp_path):
    """The IVM two-swap crash window (view swapped, snapshot merge
    crashed): replaying the SAME batch_id must converge both artifacts
    instead of double-counting the view delta.  The view dir's
    batch-id marker (round-8; same protocol as the MG summaries) skips
    the replayed view update while the seq-idempotent snapshot merge
    still runs."""
    from tweets_spark_top_10_spark.operators.ivm import build_agg_view
    from tweets_spark_top_10_spark.streaming.cdc import read_cdc_snapshot
    from tweets_spark_top_10_spark.streaming import ivm as ivm_mod

    schema = "k long, g string, v long, op string, seq long"
    b1 = spark.createDataFrame(
        [(i, f"g{i % 2}", 10 + i, "I", 1) for i in range(8)], schema
    )
    b2 = spark.createDataFrame(
        [(i, f"g{(i + 1) % 2}", 100 + i, "U", 2) for i in range(0, 8, 2)],
        schema,
    )
    snap, view = str(tmp_path / "snap"), str(tmp_path / "view")

    ivm_mod.ivm_step(spark, b1, snap, view, "k", ["g"], ["v"], batch_id=0)

    # crash: view swap commits, snapshot merge dies
    real_merge = ivm_mod.merge_cdc_batch
    ivm_mod.merge_cdc_batch = lambda *a, **kw: (_ for _ in ()).throw(
        RuntimeError("crash before snapshot merge")
    )
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError):
            ivm_mod.ivm_step(spark, b2, snap, view, "k", ["g"], ["v"], batch_id=1)
    finally:
        ivm_mod.merge_cdc_batch = real_merge

    # view is one batch ahead of the snapshot now; replay batch 1
    ivm_mod.ivm_step(spark, b2, snap, view, "k", ["g"], ["v"], batch_id=1)

    got = {
        r["g"]: (r["n"], r["sum_v"]) for r in spark.read.parquet(view).collect()
    }
    want = {
        r["g"]: (r["n"], r["sum_v"])
        for r in build_agg_view(
            read_cdc_snapshot(spark, snap), ["g"], ["v"]
        ).collect()
    }
    assert got == want and got, (got, want)


def test_cdc_tombstone_compaction_keeps_live_rows(spark, tmp_path):
    """Compaction drops only tombstones below the replay horizon: live
    rows of any seq and younger tombstones survive, and the visible
    snapshot is unchanged."""
    from tweets_spark_top_10_spark.streaming.cdc import (
        compact_cdc_table,
        init_cdc_table,
        merge_cdc_batch,
        read_cdc_snapshot,
    )

    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    table = str(tmp_path / "cdc_compact")
    init_cdc_table(base, table)
    changes = spark.createDataFrame(
        [(1, "a_dead", "D", 5), (2, "b_dead", "D", 50), (3, "c2", "U", 60)],
        "k int, v string, op string, seq long",
    )
    merge_cdc_batch(spark, changes, table, "k")

    before = sorted(map(tuple, read_cdc_snapshot(spark, table).collect()))
    assert compact_cdc_table(spark, table, replay_horizon_seq=10) == 1  # k=1 only
    stored = spark.read.parquet(table)
    assert stored.where("__deleted").count() == 1      # k=2 tombstone kept
    assert stored.where("NOT __deleted").count() == 1     # live k=3 untouched
    assert sorted(map(tuple, read_cdc_snapshot(spark, table).collect())) == before
    assert compact_cdc_table(spark, table, replay_horizon_seq=10) == 0  # idempotent


def test_streaming_resample_matches_batch_locf(spark, sf_dir, tmp_path):
    """Bucket partials maintained over an out-of-order multi-batch
    stream, then read_resampled == batch resample_locf over the union
    of all observations — and a REPLAYED batch (same batch_id, rerun
    of the merge step) changes nothing (batch-id-keyed overwrite)."""
    import pandas as pd

    from tweets_spark_top_10_spark.operators.resample import resample_locf
    from tweets_spark_top_10_spark.streaming.resample import (
        maintain_bucket_partials,
        read_resampled,
    )

    events = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .where(F.col("user_id") < 30)
    )
    pdf = events.toPandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # micros, not nanos
    src = tmp_path / "obs"
    src.mkdir()
    # deliver NEWEST observations first (out of order)
    pdf_sorted = pdf.sort_values("ts", ascending=False).reset_index(drop=True)
    third = len(pdf_sorted) // 3
    pdf_sorted.iloc[:third].to_parquet(src / "b1.parquet", index=False)
    pdf_sorted.iloc[third : 2 * third].to_parquet(src / "b2.parquet", index=False)
    pdf_sorted.iloc[2 * third :].to_parquet(src / "b3.parquet", index=False)

    partials = str(tmp_path / "partials")
    stream = file_stream(spark, str(src), events.schema, max_files_per_trigger=1)
    q = maintain_bucket_partials(
        stream, partials, checkpoint=str(tmp_path / "rs_ckpt"),
        key_col="user_id", ts_col="ts", value_col="value",
    )
    q.awaitTermination()

    def snap():
        return sorted(
            (r["user_id"], r["bucket"], r["v"], r["is_gap"])
            for r in read_resampled(spark, partials, "user_id").collect()
        )

    got = snap()
    want = sorted(
        (r["user_id"], r["bucket"], r["v"], r["is_gap"])
        for r in resample_locf(events, "user_id", "ts", "value").collect()
    )
    assert got == want and got

    # simulate an at-least-once replay: rerun batch 0's merge by hand
    # with the same batch_id and data — the partition overwrites itself
    b1 = spark.createDataFrame(pdf_sorted.iloc[:third], events.schema)
    unit_partial = (
        b1.groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.sum("value").alias("v_sum"), F.count("value").alias("v_cnt"))
        .withColumn("batch_id", F.lit(0))
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        unit_partial.write.mode("overwrite").partitionBy("batch_id").parquet(partials)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    assert snap() == want


def test_stream_static_pit_enrichment_matches_batch(spark, sf_dir, tmp_path):
    """pit_join works unchanged as a stream-static join: a probe
    STREAM enriched against static SCD2 history equals the batch
    pit_join on the same probes (inner join + interval filter are both
    stream-static safe; no state, no watermark needed)."""
    import pandas as pd

    from tweets_spark_top_10_spark.operators.merge import pit_join, scd2_history
    from tweets_spark_top_10_spark.streaming.sinks import run_to_memory

    orders = load_table(spark, sf_dir, "orders").limit(400)
    k = F.col("o_orderkey")
    base = orders.select("o_orderkey", "o_orderstatus")
    changes = (
        base.withColumns({"op": F.lit("I"), "seq": F.lit(0)})
        .unionByName(
            base.where(k % 2 == 0).withColumns(
                {"o_orderstatus": F.lit("X"), "op": F.lit("U"), "seq": F.lit(1)}
            )
        )
    )
    hist = scd2_history(changes, "o_orderkey").drop("is_current")

    probes = orders.select(
        "o_orderkey", (k % 2).cast("int").alias("at")
    )
    src = tmp_path / "pit_probes"
    src.mkdir()
    probes.toPandas().to_parquet(src / "p.parquet", index=False)
    stream = file_stream(spark, str(src), probes.schema)
    enriched = pit_join(stream, hist, "o_orderkey", "at")
    q = run_to_memory(enriched, "pit_mem")
    q.awaitTermination()
    got = sorted(map(tuple, spark.table("pit_mem").collect()))
    want = sorted(map(tuple, pit_join(probes, hist, "o_orderkey", "at").collect()))
    assert got == want and got


def test_compact_bucket_partials_preserves_series(spark, sf_dir, tmp_path):
    """Folding pre-horizon batch partitions into batch_id=-1 leaves the
    resampled series bit-identical, shrinks the partition count, and a
    replayed at-horizon batch still overwrites itself (idempotence
    preserved above the horizon)."""
    import glob as _glob

    import pandas as pd

    from tweets_spark_top_10_spark.streaming.resample import (
        compact_bucket_partials,
        maintain_bucket_partials,
        read_resampled,
    )

    events = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .where(F.col("user_id") < 20)
    )
    pdf = events.toPandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    src = tmp_path / "cp_obs"
    src.mkdir()
    third = len(pdf) // 3
    for i in range(3):
        pdf.iloc[i * third : (i + 1) * third if i < 2 else len(pdf)].to_parquet(
            src / f"b{i}.parquet", index=False
        )
    partials = str(tmp_path / "cp_partials")
    q = maintain_bucket_partials(
        file_stream(spark, str(src), events.schema, max_files_per_trigger=1),
        partials, checkpoint=str(tmp_path / "cp_ckpt"),
        key_col="user_id", ts_col="ts", value_col="value",
    )
    q.awaitTermination()

    def snap():
        return sorted(
            map(tuple, read_resampled(spark, partials, "user_id").collect())
        )

    before = snap()
    n_parts_before = len(_glob.glob(f"{partials}/batch_id=*"))
    assert n_parts_before == 3
    assert compact_bucket_partials(spark, partials, batch_horizon=2) == 2
    assert len(_glob.glob(f"{partials}/batch_id=*")) == 2  # {-1, 2}
    assert snap() == before
    # idempotent: nothing left to fold below the horizon but -1 itself
    assert compact_bucket_partials(spark, partials, batch_horizon=2) == 0


def test_streaming_scd2_history_matches_batch(spark, sf_dir, tmp_path):
    """History maintained per micro-batch over an in-order multi-batch
    change stream with a REPLAYED batch == batch scd2_history over the
    full log: same versions, same intervals, same open rows. Deletes
    arriving in a later batch close the stored open version without
    emitting one."""
    import pandas as pd

    from tweets_spark_top_10_spark.operators.merge import scd2_history
    from tweets_spark_top_10_spark.streaming.scd2 import maintain_scd2_history

    keys = list(range(1, 41))
    log = []
    for k in keys:
        log.append((k, f"v0_{k}", "I", 1))          # batch 1: births
    for k in keys[::2]:
        log.append((k, f"v1_{k}", "U", 2))          # batch 2: updates
    for k in keys[::4]:
        log.append((k, f"dead_{k}", "D", 3))        # batch 3: deletes
    for k in keys[1::4]:
        log.append((k, f"v2_{k}", "U", 3))          # batch 3: more updates
    schema = "k long, v string, op string, seq long"
    changes = spark.createDataFrame(log, schema)

    src = tmp_path / "scd2_changes"
    src.mkdir()
    pdf = pd.DataFrame(log, columns=["k", "v", "op", "seq"])
    for i, s in enumerate([1, 2, 3]):
        pdf[pdf["seq"] == s].to_parquet(src / f"b{i}.parquet", index=False)
    pdf[pdf["seq"] == 2].to_parquet(src / "b3.parquet", index=False)  # replay

    hist_path = str(tmp_path / "scd2_hist")
    q = maintain_scd2_history(
        file_stream(spark, str(src), changes.schema, max_files_per_trigger=1),
        hist_path, checkpoint=str(tmp_path / "scd2_ckpt"), key="k",
    )
    q.awaitTermination()

    got = sorted(map(tuple, spark.read.parquet(hist_path).select(
        "k", "v", "valid_from", "valid_to", "is_current").collect()))
    want = sorted(map(tuple, scd2_history(changes, "k").select(
        "k", "v", "valid_from", "valid_to", "is_current").collect()))
    assert got == want and got
    # spot-check semantics: k=1 (born, updated, deleted) has two closed
    # versions and no open one; k=2 (born, updated seq3) has an open v2
    by_k = {}
    for k, v, vf, vt, cur in got:
        by_k.setdefault(k, []).append((v, vf, vt, cur))
    assert by_k[1] == [("v0_1", 1, 2, False), ("v1_1", 2, 3, False)]
    assert ("v2_2", 3, None, True) in by_k[2]


def test_synthetic_stream_source_exactly_once_vs_batch(spark, tmp_path):
    """Custom streaming Python DataSource: draining the bounded stream
    yields every generated row EXACTLY once across micro-batches, and
    the content equals the batch source's for the same id range (one
    generation rule, two engines' worth of plumbing)."""
    from tweets_spark_top_10_spark.sources.pyds import (
        register_synthetic_events,
        register_synthetic_stream,
    )

    register_synthetic_events(spark)
    register_synthetic_stream(spark)

    stream = (
        spark.readStream.format("synthetic_events_stream")
        .option("rows_per_batch", "64")
        .option("max_rows", "300")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("syn_stream_t")
        .option("checkpointLocation", str(tmp_path / "syn_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(map(tuple, spark.table("syn_stream_t").collect()))
    want = sorted(
        map(
            tuple,
            spark.read.format("synthetic_events")
            .option("partitions", "3")
            .option("rows_per_partition", "100")
            .load()
            .collect(),
        )
    )
    assert got == want and len(got) == 300


def test_kafka_unavailable_is_loud_not_silent(spark):
    """The Kafka source is jar-gated (round-6 verdict item 4): without
    spark-sql-kafka on the classpath it must raise
    KafkaConnectorUnavailable carrying the exact --packages deploy hint
    — never a silent fallback, because no Python shim can preserve
    Kafka's offset/partition semantics.  With the jar present, the
    reader must construct (broker connection errors surface at stream
    start, not here)."""
    from tweets_spark_top_10_spark.streaming import (
        KafkaConnectorUnavailable,
        kafka_stream,
    )

    try:
        df = kafka_stream(spark, "localhost:9092", "tweets")
    except KafkaConnectorUnavailable as e:
        assert "--packages org.apache.spark:spark-sql-kafka" in str(e), e
        pytest.skip(
            "spark-sql-kafka not on classpath (expected in this container); "
            "gate verified loud"
        )
    # Jar present: the source schema is Kafka's fixed 7-column contract.
    assert {"key", "value", "topic", "partition", "offset"} <= set(df.columns)


def test_kafka_shaped_payload_parity_with_file_stream(
    spark, sf_dir, tmp_path
):
    """Differential for the payload path shared by Kafka and replay:
    kafka_json_values must decode a Kafka-SHAPED stream (binary value
    column of JSON) to exactly the rows the original batch holds.  The
    same projection runs unchanged on the real Kafka source; when a
    broker + jar are available (SPARK_GRAFT_KAFKA_BOOTSTRAP), the
    second half replays the same payloads through format('kafka') and
    compares — mirroring the native-Avro gating convention."""
    import json
    import os

    from tweets_spark_top_10_spark.streaming import (
        KafkaConnectorUnavailable,
        kafka_json_values,
        kafka_stream,
        run_to_memory,
    )

    events = load_table(spark, sf_dir, "events").limit(200)
    payloads = events.select(
        F.to_json(F.struct("event_id", "user_id", "event_type", "value")).alias(
            "value"
        )
    )
    src = str(tmp_path / "kafka_shaped")
    payloads.coalesce(1).write.mode("overwrite").format("text").save(src)

    schema = (
        "event_id long, user_id long, event_type string, value double"
    )
    stream = (
        spark.readStream.format("text")
        .schema("value string")
        .load(src)
    )
    decoded = kafka_json_values(stream, T._parse_datatype_string(schema))
    q = run_to_memory(decoded, "kafka_parity")
    q.awaitTermination()
    got = spark.table("kafka_parity").select(
        "event_id", "user_id", "event_type", "value"
    )
    expect = events.select("event_id", "user_id", "event_type", "value")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expect.collect())
    )

    bootstrap = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
    if not bootstrap:
        pytest.skip(
            "no SPARK_GRAFT_KAFKA_BOOTSTRAP broker configured; file-shaped "
            "payload parity verified, real-Kafka differential skipped"
        )
    try:
        kdf = kafka_stream(spark, bootstrap, "tweets_spark_graft_test")
    except KafkaConnectorUnavailable:
        pytest.skip("broker configured but spark-sql-kafka jar missing")
    kq = run_to_memory(
        kafka_json_values(kdf, T._parse_datatype_string(schema)), "kafka_real"
    )
    kq.awaitTermination()
    assert sorted(map(tuple, spark.table("kafka_real").collect())) == sorted(
        map(tuple, expect.collect())
    )


def test_streaming_grouped_heavy_hitters_matches_batch(spark, sf_dir, tmp_path):
    """Grouped MG maintenance (round-6 verdict item 6): after draining
    the doc stream in micro-batches, per-group candidates from the
    stored (group, token, est) summary + exact rerank must equal the
    per-group batch exact top-k for EVERY group, and the stored state
    must stay bounded at (capacity+1) rows per group."""
    from tweets_spark_top_10_spark.functions.text import language_id, tokenize
    from tweets_spark_top_10_spark.streaming.heavy_hitters import (
        grouped_top_k_from_summary,
        maintain_grouped_heavy_hitters,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    third = len(pdf) // 3
    src = tmp_path / "ghh_docs"
    src.mkdir()
    pdf.iloc[:third].to_parquet(src / "b1.parquet", index=False)
    pdf.iloc[third : 2 * third].to_parquet(src / "b2.parquet", index=False)
    pdf.iloc[2 * third :].to_parquet(src / "b3.parquet", index=False)

    def grouped_tokens(df):
        toks = df.select(tokenize(F.col("text")).alias("toks"))
        return toks.select(
            language_id(F.col("toks")).alias("lang"),
            F.explode(F.col("toks")).alias("token"),
        )

    stream = file_stream(spark, str(src), docs.schema, max_files_per_trigger=1)
    table = str(tmp_path / "grouped_mg")
    cap = 512
    q = maintain_grouped_heavy_hitters(
        grouped_tokens(stream),
        table,
        checkpoint=str(tmp_path / "ghh_ckpt"),
        group_col="lang",
        capacity=cap,
    )
    q.awaitTermination()

    summary = spark.read.parquet(table)
    per_group = (
        summary.groupBy("lang").agg(F.count(F.lit(1)).alias("rows")).collect()
    )
    assert per_group and all(r.rows <= cap + 1 for r in per_group), per_group
    # one NULL-token total row per group
    totals = summary.where(F.col("token").isNull()).groupBy("lang").count()
    assert all(r["count"] == 1 for r in totals.collect())

    corpus = grouped_tokens(docs)
    got = grouped_top_k_from_summary(
        spark, table, corpus, group_col="lang", k=5, capacity=cap
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("token"))
    want = (
        corpus.groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_grouped_mg_merge_recovers_from_stale_swap_dirs(spark, sf_dir, tmp_path):
    """Crash-recovery for the grouped MG swap: a crash that left (a)
    only the aside dir, or (b) a half-written staging dir, must not
    lose or double-count state — the next merge restores/clears and
    converges to the same summary a clean run produces."""
    import os
    import shutil

    from tweets_spark_top_10_spark.functions.text import tokenize
    from tweets_spark_top_10_spark.streaming.heavy_hitters import (
        merge_mg_batch_grouped,
    )

    docs = load_table(spark, sf_dir, "documents").limit(200)
    batch = docs.select(
        "lang", F.explode(tokenize(F.col("text"))).alias("token")
    )

    def canon(path):
        rows = [tuple(r) for r in spark.read.parquet(path).collect()]
        return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))

    clean = str(tmp_path / "clean")
    merge_mg_batch_grouped(spark, batch, clean, "lang", capacity=64)
    merge_mg_batch_grouped(spark, batch, clean, "lang", capacity=64)
    want = canon(clean)

    # (a) crash after live was renamed aside but before stage promoted
    crashed = str(tmp_path / "crashed")
    merge_mg_batch_grouped(spark, batch, crashed, "lang", capacity=64)
    os.rename(crashed, crashed + "__old")
    merge_mg_batch_grouped(spark, batch, crashed, "lang", capacity=64)
    assert canon(crashed) == want
    assert not os.path.exists(crashed + "__old")

    # (b) stale half-written staging dir must be cleared, not promoted
    crashed2 = str(tmp_path / "crashed2")
    merge_mg_batch_grouped(spark, batch, crashed2, "lang", capacity=64)
    os.makedirs(crashed2 + "__stage")
    with open(crashed2 + "__stage/garbage.parquet", "w") as fh:
        fh.write("not parquet")
    merge_mg_batch_grouped(spark, batch, crashed2, "lang", capacity=64)
    assert canon(crashed2) == want
    assert not os.path.exists(crashed2 + "__stage")


def test_kafka_replay_feeds_windowed_heavy_hitters(spark, sf_dir, tmp_path):
    """Composition: the jar-free kafka_replay source (round 7) drives
    the watermarked (window, group) MG maintenance (round 8) end to
    end — JSON payloads with event-time ts decode from the Kafka
    contract columns, fold into per-(day, segment) summaries under the
    watermark, and the state-derived top-3 equals the batch exact
    answer.  This is the production wiring: broker-shaped ingestion →
    bounded streaming state → exact serving read."""
    import json

    from tweets_spark_top_10_spark.functions.heavy_hitters import (
        grouped_exact_top_k,
    )
    from tweets_spark_top_10_spark.sources.pyds import (
        register_kafka_replay,
        write_kafka_replay_dump,
    )
    from tweets_spark_top_10_spark.streaming import kafka_json_values
    from tweets_spark_top_10_spark.streaming.heavy_hitters import (
        maintain_windowed_heavy_hitters,
        windowed_grouped_top_k_from_summary,
    )

    events = load_table(spark, sf_dir, "events").limit(400).select(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        (F.col("user_id") % 4).cast("string").alias("seg"),
        F.col("event_type").alias("token"),
    )
    payloads = [
        r["v"]
        for r in events.select(
            F.to_json(F.struct("ts_s", "seg", "token")).alias("v")
        ).collect()
    ]
    root = str(tmp_path / "hh_topic")
    write_kafka_replay_dump(payloads, root, n_partitions=3)

    register_kafka_replay(spark)
    stream = (
        spark.readStream.format("kafka_replay")
        .option("path", root)
        .option("topic", "events")
        .load()
    )
    decoded = kafka_json_values(
        stream, T._parse_datatype_string("ts_s string, seg string, token string")
    ).select(F.to_timestamp("ts_s").alias("ts"), "seg", "token")

    state = str(tmp_path / "kr_hh_state")
    q = maintain_windowed_heavy_hitters(
        decoded,
        state,
        checkpoint=str(tmp_path / "kr_hh_ckpt"),
        time_col="ts",
        group_col="seg",
        capacity=64,
        delay_seconds=40 * 86400,
        window="day",
    )
    q.awaitTermination()

    corpus = events.select(
        F.date_trunc("day", F.to_timestamp("ts_s")).alias("window"),
        "seg",
        "token",
    )
    got = sorted(
        map(
            tuple,
            windowed_grouped_top_k_from_summary(
                spark, state, corpus, "seg", k=3, capacity=64
            )
            .select(
                F.concat_ws(
                    "|",
                    F.date_format("window", "yyyy-MM-dd HH:mm:ss"),
                    "seg",
                ).alias("wg"),
                "token",
                "n",
            )
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            grouped_exact_top_k(
                corpus.withColumn(
                    "wg",
                    F.concat_ws(
                        "|",
                        F.date_format("window", "yyyy-MM-dd HH:mm:ss"),
                        "seg",
                    ),
                ).select("wg", "token"),
                "wg",
                "token",
                k=3,
                capacity=64,
            ).collect(),
        )
    )
    assert got == want and got


def test_kafka_replay_source_exactly_once_and_payload_parity(
    spark, sf_dir, tmp_path
):
    """The jar-free kafka_replay Python DataSource must deliver the
    Kafka source contract: 6-column schema, per-partition dense
    offsets, every payload exactly once, and kafka_json_values
    decoding identical rows to the original batch.  Files appended
    after a drain are picked up from the checkpoint (offset resume)
    with no re-delivery of committed offsets."""
    import json
    import os

    from tweets_spark_top_10_spark.sources.pyds import (
        register_kafka_replay,
        write_kafka_replay_dump,
    )
    from tweets_spark_top_10_spark.streaming import kafka_json_values

    events = load_table(spark, sf_dir, "events").limit(300)
    payloads = [
        r["v"]
        for r in events.select(
            F.to_json(
                F.struct("event_id", "user_id", "event_type", "value")
            ).alias("v")
        ).collect()
    ]
    root = str(tmp_path / "topic_dump")
    write_kafka_replay_dump(payloads[:200], root, n_partitions=3)

    register_kafka_replay(spark)
    stream = (
        spark.readStream.format("kafka_replay")
        .option("path", root)
        .option("topic", "tweets")
        .load()
    )
    schema = "event_id long, user_id long, event_type string, value double"
    decoded = kafka_json_values(stream, T._parse_datatype_string(schema))
    ckpt = str(tmp_path / "kr_ckpt")
    out = str(tmp_path / "kr_out")

    def drain():
        q = (
            decoded.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def expected(ps):
        return sorted(
            tuple(json.loads(p)[k]
                  for k in ("event_id", "user_id", "event_type", "value"))
            for p in ps
        )

    drain()
    got1 = spark.read.parquet(out).select(
        "event_id", "user_id", "event_type", "value"
    )
    assert sorted(map(tuple, got1.collect())) == expected(payloads[:200])

    # raw contract columns: offsets dense per partition
    raw_q = (
        spark.readStream.format("kafka_replay")
        .option("path", root)
        .load()
        .writeStream.format("memory")
        .queryName("kr_raw")
        .trigger(availableNow=True)
        .start()
    )
    raw_q.awaitTermination()
    raw = spark.table("kr_raw")
    assert set(raw.columns) == {
        "key", "value", "topic", "partition", "offset", "timestamp"
    }
    per_part = (
        raw.groupBy("partition")
        .agg(F.count(F.lit(1)).alias("n"),
             F.min("offset").alias("lo"), F.max("offset").alias("hi"))
        .collect()
    )
    assert len(per_part) == 3
    for r in per_part:
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1

    # append more records -> resume from checkpoint, no re-delivery
    by_part: dict[int, int] = {}
    for i, _ in enumerate(payloads[:200]):
        by_part[i % 3] = by_part.get(i % 3, 0) + 1
    for j, p in enumerate(payloads[200:]):
        part = j % 3
        start = by_part.get(part, 0)
        path = os.path.join(
            root, f"partition={part}", f"{start}-{start + 1}.jsonl"
        )
        with open(path, "w") as fh:
            fh.write(p + "\n")
        by_part[part] = start + 1
    drain()
    got2 = spark.read.parquet(out).select(
        "event_id", "user_id", "event_type", "value"
    )
    # exactly once across BOTH drains: 300 rows total, no duplicates
    assert sorted(map(tuple, got2.collect())) == expected(payloads)


def test_windowed_grouped_heavy_hitters_watermark(spark, sf_dir, tmp_path):
    """(event-time window, group)-keyed MG maintenance under a
    watermark (round-7 verdict item 6), three contracts in one drain:

    1. EXACTNESS under out-of-order delivery: events sorted by user_id
       (time-shuffled) drain in 3 micro-batches; with a delay wider
       than the corpus span nothing drops, and the state-derived
       per-(day, segment) top-3 equals batch grouped_exact_top_k over
       the same buckets.
    2. STATE EXPIRY past the watermark: one far-future event advances
       the watermark beyond every original window — they must leave
       live state (bounded!) for the finalized dir, and the reader
       (live ∪ closed) must still produce the exact answer including
       the new window.
    3. LATE-BEYOND-WATERMARK DROP: an event older than the watermark
       merges into nothing — state and answers unchanged.
    """
    import datetime

    from tweets_spark_top_10_spark.functions.heavy_hitters import (
        grouped_exact_top_k,
    )
    from tweets_spark_top_10_spark.streaming.heavy_hitters import (
        maintain_windowed_heavy_hitters,
        windowed_grouped_top_k_from_summary,
    )

    events = load_table(spark, sf_dir, "events").select(
        "ts",
        (F.col("user_id") % 8).cast("string").alias("seg"),
        F.col("event_type").alias("token"),
    )
    span_delay = 40 * 86400  # corpus spans ~30 days; nothing drops

    def expected(corpus):
        toks = corpus.select(
            F.date_trunc("day", "ts").alias("window"), "seg", "token"
        ).withColumn(
            "wg",
            F.concat_ws(
                "|",
                F.date_format("window", "yyyy-MM-dd HH:mm:ss"),
                F.col("seg"),
            ),
        )
        got = grouped_exact_top_k(toks, "wg", "token", k=3, capacity=64)
        return sorted(map(tuple, got.collect()))

    def observed(corpus):
        got = windowed_grouped_top_k_from_summary(
            spark,
            state,
            corpus.select(
                F.date_trunc("day", "ts").alias("window"), "seg", "token"
            ),
            "seg",
            k=3,
            capacity=64,
        ).select(
            F.concat_ws(
                "|",
                F.date_format("window", "yyyy-MM-dd HH:mm:ss"),
                F.col("seg"),
            ).alias("wg"),
            "token",
            "n",
        )
        return sorted(map(tuple, got.collect()))

    # out-of-order delivery: sort by user id, split in thirds — each
    # micro-batch spans the whole month
    pdf = events.toPandas().sort_values(["seg", "ts"]).reset_index(drop=True)
    # pandas defaults to TIMESTAMP(NANOS), unreadable as Spark timestamp
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    src = tmp_path / "ev_stream"
    src.mkdir()
    third = len(pdf) // 3
    pdf.iloc[:third].to_parquet(src / "b1.parquet", index=False)
    pdf.iloc[third : 2 * third].to_parquet(src / "b2.parquet", index=False)
    pdf.iloc[2 * third :].to_parquet(src / "b3.parquet", index=False)

    state = str(tmp_path / "win_hh")
    stream = file_stream(spark, str(src), events.schema, max_files_per_trigger=1)

    def drain(ckpt):
        q = maintain_windowed_heavy_hitters(
            stream,
            state,
            checkpoint=str(tmp_path / ckpt),
            time_col="ts",
            group_col="seg",
            capacity=64,
            delay_seconds=span_delay,
            window="day",
        )
        q.awaitTermination()

    drain("ck1")
    assert observed(events) == expected(events)

    # (2) a far-future event expires every original window to closed
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    future = max_ts + datetime.timedelta(days=100)
    extra = spark.createDataFrame([(future, "0", "purchase")], events.schema)
    epdf = extra.toPandas()
    epdf["ts"] = epdf["ts"].astype("datetime64[us]")
    epdf.to_parquet(src / "b4_future.parquet", index=False)
    drain("ck2")
    full = events.unionByName(extra)
    live_windows = {
        r["window"] for r in spark.read.parquet(state).select("window").distinct().collect()
    }
    assert live_windows == {future.replace(hour=0, minute=0, second=0, microsecond=0)}, (
        f"live state not bounded: {sorted(live_windows)[:5]}..."
    )
    import os as _os

    assert _os.path.exists(state + "__closed"), "no finalized summaries"
    assert observed(full) == expected(full)

    # (3) an event behind the watermark is dropped, state unchanged
    stale = spark.createDataFrame(
        [(max_ts, "3", "view")], events.schema  # ~100 days behind watermark
    )
    spdf = stale.toPandas()
    spdf["ts"] = spdf["ts"].astype("datetime64[us]")
    spdf.to_parquet(src / "b5_stale.parquet", index=False)
    drain("ck3")
    assert observed(full) == expected(full)  # the stale row never lands


def test_windowed_mg_crash_between_closed_write_and_live_swap(
    spark, sf_dir, tmp_path
):
    """Crash window unique to the windowed merge: expired windows are
    written to the __closed dir BEFORE the live swap commits.  A crash
    between the two must converge on replay — the replayed batch
    re-merges (marker unstamped), rewrites the same closed partitions
    via dynamic overwrite, and completes the swap; totals stay exact."""
    import datetime

    from tweets_spark_top_10_spark.streaming import heavy_hitters as hh

    schema = "ts timestamp, seg string, token string"
    t0 = datetime.datetime(2024, 1, 1, 0, 30)
    b1 = spark.createDataFrame(
        [(t0, "a", "x")] * 3 + [(t0, "a", "y")], schema
    )
    # far-future batch: advances the watermark so b1's window expires
    b2 = spark.createDataFrame(
        [(t0 + datetime.timedelta(days=30), "a", "z")], schema
    )
    state = str(tmp_path / "wstate")
    hh.merge_mg_batch_windowed(
        spark, b1, state, "ts", "seg", capacity=8, delay_seconds=3600,
        window="hour", batch_id=0,
    )

    real_swap = hh._swap_in
    hh._swap_in = lambda *a, **kw: (_ for _ in ()).throw(
        RuntimeError("crash after closed write, before live swap")
    )
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError):
            hh.merge_mg_batch_windowed(
                spark, b2, state, "ts", "seg", capacity=8,
                delay_seconds=3600, window="hour", batch_id=1,
            )
    finally:
        hh._swap_in = real_swap

    # replay the same batch id; must complete and not double anything
    hh.merge_mg_batch_windowed(
        spark, b2, state, "ts", "seg", capacity=8, delay_seconds=3600,
        window="hour", batch_id=1,
    )
    corpus = b1.unionByName(b2).select(
        F.date_trunc("hour", "ts").alias("window"), "seg", "token"
    )
    got = {
        (r["window"], r["seg"], r["token"]): r["n"]
        for r in hh.windowed_grouped_top_k_from_summary(
            spark, state, corpus, "seg", k=3, capacity=8
        ).collect()
    }
    assert got == {
        (t0.replace(minute=0), "a", "x"): 3,
        (t0.replace(minute=0), "a", "y"): 1,
        ((t0 + datetime.timedelta(days=30)).replace(minute=0, second=0), "a", "z"): 1,
    }, got


def test_mg_merge_replayed_batch_is_noop(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: if the state swap commits but the
    streaming checkpoint commit does not, the SAME micro-batch is
    redelivered with the SAME batch_id.  A second merge with an id at
    or below the stored high-water mark must be a no-op — otherwise est
    and the NULL-token totals double-count and the certify-or-degrade
    contract of the summary readers silently breaks (round-7 advisor
    finding).  Covers flat and grouped merges; a LATER id still merges."""
    from tweets_spark_top_10_spark.functions.text import tokenize
    from tweets_spark_top_10_spark.streaming.heavy_hitters import (
        merge_mg_batch,
        merge_mg_batch_grouped,
    )

    docs = load_table(spark, sf_dir, "documents").limit(200)
    batch = docs.select(
        "lang", F.explode(tokenize(F.col("text"))).alias("token")
    )

    def canon(path):
        rows = [tuple(r) for r in spark.read.parquet(path).collect()]
        return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))

    # grouped: replay of batch 0 is dropped, batch 1 merges
    grouped = str(tmp_path / "grouped")
    merge_mg_batch_grouped(spark, batch, grouped, "lang", capacity=64, batch_id=0)
    once = canon(grouped)
    merge_mg_batch_grouped(spark, batch, grouped, "lang", capacity=64, batch_id=0)
    assert canon(grouped) == once, "replayed grouped batch double-merged"
    merge_mg_batch_grouped(spark, batch, grouped, "lang", capacity=64, batch_id=1)
    assert canon(grouped) != once, "later batch id must still merge"

    # flat: same contract
    flat = str(tmp_path / "flat")
    tokens = batch.select("token")
    merge_mg_batch(spark, tokens, flat, capacity=64, batch_id=0)
    once = canon(flat)
    merge_mg_batch(spark, tokens, flat, capacity=64, batch_id=0)
    assert canon(flat) == once, "replayed flat batch double-merged"
    merge_mg_batch(spark, tokens, flat, capacity=64, batch_id=1)
    assert canon(flat) != once

    # legacy direct calls (no batch_id) keep merging unconditionally
    merge_mg_batch(spark, tokens, flat, capacity=64)
    merge_mg_batch(spark, tokens, flat, capacity=64)

    # the marker survives the crash-recovery rename path: promote the
    # aside dir, then replay an old id — still a no-op
    import os

    crashed = str(tmp_path / "crashed")
    merge_mg_batch_grouped(spark, batch, crashed, "lang", capacity=64, batch_id=5)
    after5 = canon(crashed)
    os.rename(crashed, crashed + "__old")
    merge_mg_batch_grouped(spark, batch, crashed, "lang", capacity=64, batch_id=5)
    assert canon(crashed) == after5, "replay after aside-restore double-merged"

    # fresh checkpoint over existing state: ids restart below the
    # stored marker — those batches are NEW data and must merge
    # (the marker check is ==, not <=; round-8 review finding)
    merge_mg_batch_grouped(spark, batch, crashed, "lang", capacity=64, batch_id=0)
    assert canon(crashed) != after5, "fresh-checkpoint batch was discarded"


def test_streaming_semantic_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Incrementally maintained semantic-dedup state == the batch
    semantic_dedup_keep pipeline: drain the vector corpus in 3
    micro-batches against the same fixed coarse quantizer, then the
    state-derived (id, cluster, keep) must match the batch query
    row-for-row.  Draining the SAME data again (duplicate delivery)
    must leave the state unchanged."""
    from tweets_spark_top_10_spark.functions.similarity import (
        semdedup_centroids,
    )
    from tweets_spark_top_10_spark.queries.catalog import QUERIES
    from tweets_spark_top_10_spark.streaming.semantic_dedup import (
        maintain_semantic_dedup,
        semantic_clusters_from_state,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    # the batch query's corpus-scaled quantizer, fixed for the stream
    cents = semdedup_centroids(vecs, cand_id="vec_id", vec_col="vec")

    pdf = vecs.toPandas().sort_values("vec_id").reset_index(drop=True)
    third = len(pdf) // 3
    src = tmp_path / "vec_stream"
    src.mkdir()
    pdf.iloc[:third].to_parquet(src / "b1.parquet", index=False)
    pdf.iloc[third : 2 * third].to_parquet(src / "b2.parquet", index=False)
    pdf.iloc[2 * third :].to_parquet(src / "b3.parquet", index=False)

    stream = file_stream(
        spark, str(src), vecs.schema, max_files_per_trigger=1
    )
    cells = str(tmp_path / "sd_cells")
    pairs = str(tmp_path / "sd_pairs")
    q = maintain_semantic_dedup(
        stream, cents, cells, pairs, checkpoint=str(tmp_path / "sd_ckpt")
    )
    q.awaitTermination()

    got = sorted(
        map(tuple, semantic_clusters_from_state(spark, cells, pairs).collect())
    )
    want = sorted(
        map(tuple, QUERIES["semantic_dedup_keep"](spark, sf_dir).collect())
    )
    assert got == want

    # duplicate delivery: fresh checkpoint, same files -> same state
    q2 = maintain_semantic_dedup(
        stream, cents, cells, pairs, checkpoint=str(tmp_path / "sd_ckpt2")
    )
    q2.awaitTermination()
    again = sorted(
        map(tuple, semantic_clusters_from_state(spark, cells, pairs).collect())
    )
    assert again == want


def test_streaming_semantic_refit_matches_batch(spark, sf_dir, tmp_path):
    """Quantizer re-fit with state migration — the production lever for
    an unbounded stream (BASELINE.md): start the stream against a
    deliberately STALE quantizer (4 cells — the corpus wants √N), drain
    2/3 of the corpus, re-fit mid-stream (corpus-scaled centroids +
    cell re-assignment + pair regeneration), drain the rest against the
    returned centroids, re-fit once more at full corpus size — and the
    state-derived (id, cluster, keep) must equal the batch
    semantic_dedup_keep query row-for-row.  Plus: a legacy-preserving
    refit never drops recorded pairs, and the refit is idempotent."""
    from tweets_spark_top_10_spark.functions.similarity import ivf_centroids
    from tweets_spark_top_10_spark.queries.catalog import QUERIES
    from tweets_spark_top_10_spark.streaming.semantic_dedup import (
        maintain_semantic_dedup,
        refit_semantic_state,
        semantic_clusters_from_state,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    pdf = vecs.toPandas().sort_values("vec_id").reset_index(drop=True)
    third = len(pdf) // 3
    src = tmp_path / "vec_stream"
    src.mkdir()
    pdf.iloc[:third].to_parquet(src / "b1.parquet", index=False)
    pdf.iloc[third : 2 * third].to_parquet(src / "b2.parquet", index=False)

    stale = ivf_centroids(vecs, "vec_id", "vec", n_cells=4, stride=29)
    stream = file_stream(
        spark, str(src), vecs.schema, max_files_per_trigger=1
    )
    cells = str(tmp_path / "sd_cells")
    pairs = str(tmp_path / "sd_pairs")
    ckpt = str(tmp_path / "sd_ckpt")
    maintain_semantic_dedup(
        stream, stale, cells, pairs, checkpoint=ckpt
    ).awaitTermination()

    stale_pairs = set(map(tuple, spark.read.parquet(pairs).collect()))
    assert stale_pairs, "stale quantizer found no pairs — fixture too easy"

    # mid-stream refit, legacy-preserving: evidence already recorded
    # under the stale quantizer must survive even where the new one no
    # longer co-locates it
    cents2 = refit_semantic_state(
        spark, cells, pairs, keep_legacy_pairs=True
    )
    after_refit = set(map(tuple, spark.read.parquet(pairs).collect()))
    assert after_refit >= stale_pairs

    # drain the remaining third against the refit centroids (same
    # checkpoint — only the new file is unprocessed)
    pdf.iloc[2 * third :].to_parquet(src / "b3.parquet", index=False)
    maintain_semantic_dedup(
        stream, cents2, cells, pairs, checkpoint=ckpt
    ).awaitTermination()

    # final refit at full corpus size, batch-equivalence mode: the
    # state becomes a pure function of (corpus, √N quantizer) — exactly
    # what the batch query computes
    refit_semantic_state(spark, cells, pairs)
    got = sorted(
        map(tuple, semantic_clusters_from_state(spark, cells, pairs).collect())
    )
    want = sorted(
        map(tuple, QUERIES["semantic_dedup_keep"](spark, sf_dir).collect())
    )
    assert got == want

    # idempotence: re-running the refit leaves the state unchanged
    refit_semantic_state(spark, cells, pairs)
    again = sorted(
        map(tuple, semantic_clusters_from_state(spark, cells, pairs).collect())
    )
    assert again == want

    # crash between the two swaps: cells already migrated, pairs still
    # the old quantizer's — restore the stale pair set into the live
    # pairs dir and re-run; refit must converge back to the batch
    # state, because batch-equivalence mode regenerates pairs from the
    # cell snapshot and never reads the pair table
    import shutil

    shutil.rmtree(pairs)
    spark.createDataFrame(
        sorted(stale_pairs), "id_a long, id_b long"
    ).write.mode("overwrite").parquet(pairs)
    refit_semantic_state(spark, cells, pairs)
    recovered = sorted(
        map(tuple, semantic_clusters_from_state(spark, cells, pairs).collect())
    )
    assert recovered == want


def test_streaming_semantic_refit_guards(spark, sf_dir, tmp_path):
    """Round-10 advice (low): entry validation on the stream-decided
    refit — refit_growth ≤ 1 (a full O(N·√N) rebuild EVERY micro-batch)
    rejects loudly, a persisted centroid table without fitted_n (not a
    maintainer artifact) rejects with the column list, and an empty one
    names the recovery action instead of raising NoneType errors."""
    import pytest

    from tweets_spark_top_10_spark.functions.similarity import ivf_centroids
    from tweets_spark_top_10_spark.streaming.semantic_dedup import (
        maintain_semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    src = tmp_path / "g_src"
    src.mkdir()
    vecs.limit(10).toPandas().to_parquet(src / "b.parquet")
    stream = file_stream(spark, str(src), vecs.schema, max_files_per_trigger=1)
    book = ivf_centroids(vecs, "vec_id", "vec", n_cells=4, stride=29)
    args = dict(
        cells_path=str(tmp_path / "g_cells"),
        pairs_path=str(tmp_path / "g_pairs"),
        checkpoint=str(tmp_path / "g_ckpt"),
    )

    with pytest.raises(ValueError, match="refit_growth must be > 1"):
        maintain_semantic_dedup(
            stream, book, refit_growth=1.0,
            centroids_path=str(tmp_path / "g_cents"), **args,
        )
    with pytest.raises(ValueError, match="requires centroids_path"):
        maintain_semantic_dedup(stream, book, refit_growth=2.0, **args)

    # a foreign parquet at centroids_path: reject naming the columns
    foreign = str(tmp_path / "g_foreign")
    book.write.parquet(foreign)
    with pytest.raises(ValueError, match="no fitted_n column"):
        maintain_semantic_dedup(
            stream, book, refit_growth=2.0, centroids_path=foreign, **args
        )

    # an empty (zero-row) book: reject naming the recovery action
    empty = str(tmp_path / "g_empty")
    book.limit(0).withColumn("fitted_n", F.lit(16)).write.parquet(empty)
    with pytest.raises(ValueError, match="empty"):
        maintain_semantic_dedup(
            stream, book, refit_growth=2.0, centroids_path=empty, **args
        )


def test_streaming_semantic_refit_stream_decided(spark, sf_dir, tmp_path):
    """Round-10 production cadence: the STREAM decides when to re-fit.
    ``maintain_semantic_dedup(refit_growth=2.0)`` starts from a
    deliberately stale 4-cell quantizer (derived fitted_on = 4² = 16)
    and drains the 500-vector corpus as 125/125/250 — the stored corpus
    doubles at every batch boundary, so the loop must refit after each
    batch and the LAST refit lands exactly on the full corpus: the
    final state equals the batch semantic_dedup_keep query with zero
    manual refit calls.  Then the durable-quantizer and crash-re-arm
    contracts: a re-attached stream passed the stale book must continue
    from the PERSISTED quantizer (duplicate delivery leaves the state
    unchanged), and a simulated crash that rolled the centroid table
    back to the stale book re-arms the trigger on the next drain."""
    from tweets_spark_top_10_spark.functions.similarity import ivf_centroids
    from tweets_spark_top_10_spark.queries.catalog import QUERIES
    from tweets_spark_top_10_spark.streaming.semantic_dedup import (
        _persist_centroids,
        maintain_semantic_dedup,
        semantic_clusters_from_state,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    pdf = vecs.toPandas().sort_values("vec_id").reset_index(drop=True)
    n = len(pdf)
    q1, q2 = n // 4, n // 2
    src = tmp_path / "vec_stream"
    src.mkdir()
    pdf.iloc[:q1].to_parquet(src / "b1.parquet", index=False)
    pdf.iloc[q1:q2].to_parquet(src / "b2.parquet", index=False)
    pdf.iloc[q2:].to_parquet(src / "b3.parquet", index=False)

    stale = ivf_centroids(vecs, "vec_id", "vec", n_cells=4, stride=29)
    cells = str(tmp_path / "sd_cells")
    pairs = str(tmp_path / "sd_pairs")
    cents_path = str(tmp_path / "sd_cents")
    stream = file_stream(spark, str(src), vecs.schema, max_files_per_trigger=1)
    maintain_semantic_dedup(
        stream,
        stale,
        cells,
        pairs,
        checkpoint=str(tmp_path / "sd_ckpt"),
        refit_growth=2.0,
        centroids_path=cents_path,
    ).awaitTermination()

    want = sorted(
        map(tuple, QUERIES["semantic_dedup_keep"](spark, sf_dir).collect())
    )
    got = sorted(
        map(tuple, semantic_clusters_from_state(spark, cells, pairs).collect())
    )
    assert got == want, "stream-decided refits did not converge to batch state"
    persisted = spark.read.parquet(cents_path)
    assert persisted.select("fitted_n").head()[0] == n, (
        "last refit did not land on the full corpus"
    )
    assert persisted.count() > 4, "quantizer never re-fitted past the stale book"

    # durable quantizer wins over the caller's stale argument: fresh
    # checkpoint, same files — duplicate delivery, no state change, and
    # fitted_n stays at n (no spurious refit: n >= 2n is false)
    maintain_semantic_dedup(
        file_stream(spark, str(src), vecs.schema, max_files_per_trigger=1),
        stale,
        cells,
        pairs,
        checkpoint=str(tmp_path / "sd_ckpt2"),
        refit_growth=2.0,
        centroids_path=cents_path,
    ).awaitTermination()
    again = sorted(
        map(tuple, semantic_clusters_from_state(spark, cells, pairs).collect())
    )
    assert again == want
    assert spark.read.parquet(cents_path).select("fitted_n").head()[0] == n

    # crash re-arm: roll the centroid table back to the stale book
    # (as if the crash hit after refit's state swaps but before the
    # centroid swap — fitted_n never advanced).  The next drain sees
    # stored n >= 2*16, re-runs the refit, and converges.
    _persist_centroids(stale, cents_path, 16)
    maintain_semantic_dedup(
        file_stream(spark, str(src), vecs.schema, max_files_per_trigger=1),
        stale,
        cells,
        pairs,
        checkpoint=str(tmp_path / "sd_ckpt3"),
        refit_growth=2.0,
        centroids_path=cents_path,
    ).awaitTermination()
    recovered = sorted(
        map(tuple, semantic_clusters_from_state(spark, cells, pairs).collect())
    )
    assert recovered == want
    assert spark.read.parquet(cents_path).select("fitted_n").head()[0] == n


def test_streaming_skewed_merge_coarsens_then_converges(spark, tmp_path):
    """Skewed-corpus contract for the INCREMENTAL merge path: between
    refits the per-batch merge emits all intra-cell pairs (uncapped —
    per-batch work is bounded by the batch side, not the cell), a
    SUPERSET of the batch pipeline's capped+bridged pair set, so
    stream-derived clusters may only COARSEN the batch answer (every
    batch-merged group lands inside ONE stream group; dedup evidence is
    never lost).  A refit then regenerates the exact batch state.
    Fixture: the test_skew adversarial corpus — 90% of 800 vectors
    near-identical on one direction, forcing the batch cap+bridge path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tweets_spark_top_10_spark.functions.similarity import (
        semdedup_centroids,
    )
    from tweets_spark_top_10_spark.queries.catalog import QUERIES
    from tweets_spark_top_10_spark.streaming.semantic_dedup import (
        refit_semantic_state,
        semantic_clusters_from_state,
        upsert_semantic_pairs_batch,
    )

    n, dim = 800, 8

    def emb(i: int) -> list[float]:
        if i % 10 != 9:
            return [1.0, (i + 1) * 2e-8] + [0.0] * (dim - 2)
        j = 1 + (i // 10) % (dim - 1)
        return [0.0] * j + [1.0] + [0.0] * (dim - 1 - j)

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "label": pa.array([i % 5 for i in range(n)], pa.int32()),
                "embedding": pa.array(
                    [emb(i) for i in range(n)], pa.list_(pa.float32())
                ),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    want_rows = QUERIES["semantic_dedup_keep"](spark, str(tmp_path)).collect()
    want_cluster = {r.vec_id: r.cluster for r in want_rows}

    vecs = spark.read.parquet(str(tmp_path / "embeddings.parquet")).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    cents = semdedup_centroids(vecs, cand_id="vec_id", vec_col="vec")
    cells = str(tmp_path / "cells")
    pairs = str(tmp_path / "pairs")
    for lo, hi in ((0, n // 2), (n // 2, n)):
        upsert_semantic_pairs_batch(
            spark,
            vecs.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            cents,
            cells,
            pairs,
        )
    got_cluster = {
        r.vec_id: r.cluster
        for r in semantic_clusters_from_state(spark, cells, pairs).collect()
    }
    # coarsening: every batch cluster maps into exactly one stream cluster
    seen: dict[int, int] = {}
    for vid, bc in want_cluster.items():
        sc = got_cluster[vid]
        assert seen.setdefault(bc, sc) == sc, (
            f"batch cluster {bc} split across stream clusters "
            f"{seen[bc]} and {sc} — incremental merge LOST evidence"
        )

    # convergence: a refit regenerates the exact batch state
    refit_semantic_state(spark, cells, pairs)
    got = sorted(
        map(tuple, semantic_clusters_from_state(spark, cells, pairs).collect())
    )
    assert got == sorted(map(tuple, want_rows))


def test_streaming_semantic_refit_collapses_exact_dup_mass(spark, tmp_path):
    """Round-10 advice (medium): an EXACT-duplicate mass counted
    uncollapsed can push its cell over the sub-cell cap, split by
    id % s across sub-cells whose min-id reps are non-dup decoys
    OUTSIDE threshold — a refit without the batch pipeline's xxhash64
    collapse prepass then keeps s canonicals where the batch query
    keeps one.  Fixture engineered to hit exactly that: 532 bitwise-
    identical vectors + 9 low-id decoys that share the mass's cell
    (argmin) but sit below the 0.3 cosine threshold to it, so every
    sub-cell's min-id rep is either a decoy or a lone mass member and
    the rep bridge cannot reconnect the mass.  The refit must still
    equal the batch ``semantic_dedup_keep`` row-for-row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tweets_spark_top_10_spark.functions.similarity import (
        ivf_assign_cells,
        ivf_centroids,
        scaled_cell_params,
        semdedup_centroids,
        subcell_cap,
    )
    from tweets_spark_top_10_spark.queries.catalog import QUERIES
    from tweets_spark_top_10_spark.streaming.semantic_dedup import (
        refit_semantic_state,
        semantic_clusters_from_state,
        upsert_semantic_pairs_batch,
    )

    n, dim = 600, 8
    mass = [1.0] + [0.0] * (dim - 1)

    def emb(i: int) -> list[float]:
        if i == 0 or 10 <= i < 540:
            return list(mass)  # bitwise-identical duplicate mass
        if 1 <= i <= 9:
            # decoy: argmin lands in the mass's cell (cos≈0.29 to mass
            # beats ≤0.24 to every axis-filler centroid) but BELOW the
            # 0.3 pair threshold; distinct floats so decoys are
            # near-dups of each other, never exact dups
            return [0.3, 0.25, 0.0, i * 1e-6, 0.0, 0.0, 0.0, 0.95]
        axis = 1 + (i % 2)  # axis fillers spread the strided book
        v = [0.0] * dim
        v[axis] = 1.0
        v[4] = (i - 540) * 1e-6
        return v

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "label": pa.array([i % 5 for i in range(n)], pa.int32()),
                "embedding": pa.array(
                    [emb(i) for i in range(n)], pa.list_(pa.float32())
                ),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )

    vecs = spark.read.parquet(str(tmp_path / "embeddings.parquet")).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    # fixture-hardness guard: UNcollapsed, the mass cell must exceed the
    # cap (otherwise this test would pass trivially without the prepass)
    n_cells, stride = scaled_cell_params(n)
    cap = subcell_cap(n, n_cells)
    book = ivf_centroids(vecs, "vec_id", "vec", n_cells, stride)
    hot = (
        ivf_assign_cells(vecs, book, "vec_id", "vec", n_probe=1)
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c"))
        .first()[0]
    )
    assert hot > cap, f"fixture too easy: hottest cell {hot} <= cap {cap}"

    want_rows = QUERIES["semantic_dedup_keep"](spark, str(tmp_path)).collect()
    mass_ids = {0} | set(range(10, 540))
    want_mass_keeps = sum(
        1 for r in want_rows if r.vec_id in mass_ids and r.keep
    )
    assert want_mass_keeps == 1, (
        f"batch keeps {want_mass_keeps} canonicals of the exact-dup mass"
    )

    cents = semdedup_centroids(vecs, cand_id="vec_id", vec_col="vec")
    cells = str(tmp_path / "cells")
    pairs = str(tmp_path / "pairs")
    for lo, hi in ((0, n // 2), (n // 2, n)):
        upsert_semantic_pairs_batch(
            spark,
            vecs.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            cents,
            cells,
            pairs,
        )
    refit_semantic_state(spark, cells, pairs)
    got = sorted(
        map(tuple, semantic_clusters_from_state(spark, cells, pairs).collect())
    )
    assert got == sorted(map(tuple, want_rows))


def test_streaming_grouped_heavy_hitters_order_independent_exactness(
    spark, sf_dir, tmp_path
):
    """MG summaries are ORDER-DEPENDENT (different micro-batch order ->
    different surviving counters), but the certify+rerank contract must
    stay EXACT under any delivery order: drain the same corpus with the
    batch order reversed and the per-group top-5 must still equal the
    batch-exact answer."""
    from tweets_spark_top_10_spark.functions.text import language_id, tokenize
    from tweets_spark_top_10_spark.streaming.heavy_hitters import (
        grouped_top_k_from_summary,
        maintain_grouped_heavy_hitters,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    third = len(pdf) // 3
    src = tmp_path / "ghh_rev"
    src.mkdir()
    # REVERSED chunk order vs the in-order test; mtimes force the
    # file stream to replay newest-content first.
    import os

    chunks = [pdf.iloc[2 * third :], pdf.iloc[third : 2 * third], pdf.iloc[:third]]
    for i, c in enumerate(chunks):
        p = src / f"b{i}.parquet"
        c.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    def grouped_tokens(df):
        toks = df.select(tokenize(F.col("text")).alias("toks"))
        return toks.select(
            language_id(F.col("toks")).alias("lang"),
            F.explode(F.col("toks")).alias("token"),
        )

    stream = file_stream(spark, str(src), docs.schema, max_files_per_trigger=1)
    table = str(tmp_path / "ghh_rev_mg")
    q = maintain_grouped_heavy_hitters(
        grouped_tokens(stream),
        table,
        checkpoint=str(tmp_path / "ghh_rev_ckpt"),
        group_col="lang",
        capacity=512,
    )
    q.awaitTermination()

    corpus = grouped_tokens(docs)
    got = grouped_top_k_from_summary(
        spark, table, corpus, group_col="lang", k=5, capacity=512
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("token"))
    want = (
        corpus.groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_kafka_replay_ignores_foreign_files_and_empty_dirs(spark, tmp_path):
    """Layout robustness: non-partition dirs, malformed file names and
    empty partitions must be skipped (not crash, not emit rows)."""
    import os

    from tweets_spark_top_10_spark.sources.pyds import register_kafka_replay

    root = tmp_path / "messy_topic"
    (root / "partition=0").mkdir(parents=True)
    (root / "partition=1").mkdir()
    (root / "_metadata").mkdir()
    with open(root / "partition=0" / "0-2.jsonl", "w") as fh:
        fh.write('{"a": 1}\n{"a": 2}\n')
    with open(root / "partition=0" / "README.txt", "w") as fh:
        fh.write("not a segment")
    with open(root / "partition=1" / "garbage.jsonl", "w") as fh:
        fh.write("badly named: no offset span")

    register_kafka_replay(spark)
    q = (
        spark.readStream.format("kafka_replay")
        .option("path", str(root))
        .load()
        .writeStream.format("memory")
        .queryName("kr_messy")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("kr_messy").select("partition", "offset").collect()
    assert sorted(map(tuple, rows)) == [(0, 0), (0, 1)]


def test_windowed_mg_live_state_bounded_under_token_churn(spark, tmp_path):
    """The scale contract the 10x stream probe measures (BASELINE.md
    round-9 table), pinned as a fast regression: live windowed-MG state
    is bounded by (windows inside the watermark horizon) x groups x
    (capacity+1) — NOT by distinct tokens.  Six batches advance event
    time one hour each while every batch brings 800 NEW distinct tokens;
    with a 1 h lag at most two hour-windows are ever live, so live rows
    must stay under 2 x groups x (capacity+1) at every step while the
    closed dir accumulates the finalized windows."""
    import datetime

    from tweets_spark_top_10_spark.streaming import heavy_hitters as hh

    schema = "ts timestamp, seg string, token string"
    t0 = datetime.datetime(2024, 3, 1, 0, 30)
    cap, groups, batches = 16, ("a", "b"), 6
    state = str(tmp_path / "churn_state")
    closed = state + "__closed"

    for b in range(batches):
        ts = t0 + datetime.timedelta(hours=b)
        rows = [
            (ts, g, f"b{b}g{g}t{i}") for g in groups for i in range(400)
        ]
        hh.merge_mg_batch_windowed(
            spark,
            spark.createDataFrame(rows, schema),
            state,
            time_col="ts",
            group_col="seg",
            capacity=cap,
            delay_seconds=3600,
            window="hour",
            batch_id=b,
        )
        live = spark.read.parquet(state)
        n_live = live.count()
        assert n_live <= 2 * len(groups) * (cap + 1), (b, n_live)
        over = (
            live.groupBy("window", "seg")
            .count()
            .where(F.col("count") > cap + 1)
            .count()
        )
        assert over == 0, (b, over)

    # every window except the two inside the horizon finalized exactly once
    closed_windows = (
        spark.read.parquet(closed).select("window_part").distinct().count()
    )
    assert closed_windows == batches - 2, closed_windows
