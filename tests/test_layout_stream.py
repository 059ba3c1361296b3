"""Streaming maintenance of the bucketed layout (streaming/layout.py):
exactly-once batch-partitioned ingest, co-located joins from the first
micro-batch, horizon compaction that preserves rows and the bucket spec.
"""

from __future__ import annotations

import glob
import re

import pytest
from pyspark.sql import functions as F

from tweets_spark_top_10_spark.sources.registry import SCHEMAS, load_table
from tweets_spark_top_10_spark.streaming.layout import (
    compact_ingest_partitions,
    foreach_batch_bucketed_ingest,
)
from tweets_spark_top_10_spark.streaming.sources import file_stream

N_BUCKETS = 8


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """events as 4 chronological files (one micro-batch each with
    maxFilesPerTrigger=1) — same construction as tests/test_streaming."""
    import os
    import shutil

    base = tmp_path_factory.mktemp("layout_stream")
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


def _ingest(spark, events_dir, table, path, ckpt):
    stream = file_stream(
        spark, events_dir, SCHEMAS["events"], max_files_per_trigger=1
    )
    q = foreach_batch_bucketed_ingest(
        stream,
        table_name=table,
        path=path,
        bucket_key="user_id",
        n_buckets=N_BUCKETS,
        checkpoint=ckpt,
    )
    q.awaitTermination()


def _content(spark, table):
    # foreachBatch runs in a CLONED session: its in-batch REFRESH can't
    # reach this session's file-listing cache, so a reader session must
    # refresh after external maintenance — standard Spark datasource
    # semantics (documented in streaming/layout.py's module docstring)
    spark.sql(f"REFRESH TABLE {table}")
    return sorted(
        (r.event_id, r.user_id, r.event_type)
        for r in spark.table(table).select("event_id", "user_id", "event_type").collect()
    )


def test_bucketed_ingest_exactly_once_and_colocated(
    spark, sf_dir, events_dir, tmp_path
):
    from tweets_spark_top_10_spark.queries.layout_queries import bucketed_table

    spark.sql("DROP TABLE IF EXISTS ing_events")
    path = str(tmp_path / "ing_events")
    _ingest(spark, events_dir, "ing_events", path, str(tmp_path / "ck1"))

    events = load_table(spark, sf_dir, "events")
    want = sorted(
        (r.event_id, r.user_id, r.event_type)
        for r in events.select("event_id", "user_id", "event_type").collect()
    )
    got = _content(spark, "ing_events")
    assert got == want  # every batch landed, nothing duplicated

    # 4 micro-batches -> 4 batch partitions; at most ONE file per bucket
    # id in each (an empty bucket writes no file at all)
    parts = glob.glob(f"{path}/__ingest_batch=*")
    assert len(parts) == 4, parts
    for p in parts:
        files = glob.glob(f"{p}/part-*")
        bucket_ids = [re.search(r"_(\d{5})\.", f).group(1) for f in files]
        assert 0 < len(files) <= N_BUCKETS, p
        assert len(bucket_ids) == len(set(bucket_ids)), (p, sorted(bucket_ids))

    # full replay with a fresh checkpoint rewrites the same partitions
    _ingest(spark, events_dir, "ing_events", path, str(tmp_path / "ck2"))
    assert _content(spark, "ing_events") == want

    # co-located join against a batch-bucketed dim on the same key:
    # zero Exchange from the stream-maintained side too
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    dim_name = "ing_user_dim"
    spark.sql(f"DROP TABLE IF EXISTS {dim_name}")
    from tweets_spark_top_10_spark.sources.writers import write_bucketed

    write_bucketed(
        events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_total")),
        table_name=dim_name,
        path=str(tmp_path / "user_dim"),
        bucket_cols=["user_id"],
        num_buckets=N_BUCKETS,
        sort_cols=["user_id"],
    )
    ing = spark.table("ing_events")
    dim = spark.table(dim_name)
    j = ing.hint("merge").join(dim, "user_id").groupBy("event_type").agg(
        F.sum("n_total").alias("s")
    )
    j.collect()
    plan = (
        j._jdf.queryExecution().executedPlan().toString().split(
            "+- == Initial Plan =="
        )[0]
    )
    # the only exchange is the tiny event_type re-agg, never the join
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Exchange") == 1, plan
    assert "hashpartitioning(user_id" not in plan, plan


def test_compact_ingest_partitions_folds_history(
    spark, sf_dir, events_dir, tmp_path
):
    spark.sql("DROP TABLE IF EXISTS ing_events2")
    path = str(tmp_path / "ing_events2")
    _ingest(spark, events_dir, "ing_events2", path, str(tmp_path / "ck"))
    before = _content(spark, "ing_events2")

    # horizon above every batch id -> everything folds into -1
    n = compact_ingest_partitions(spark, "ing_events2", batch_horizon=100)
    assert n == 4
    assert _content(spark, "ing_events2") == before  # rows preserved exactly

    parts = glob.glob(f"{path}/__ingest_batch=*")
    assert [p.split("=")[-1] for p in parts] == ["-1"], parts
    files = glob.glob(f"{parts[0]}/part-*")
    bucket_ids = [re.search(r"_(\d{5})\.", f).group(1) for f in files]
    assert 0 < len(files) <= N_BUCKETS
    assert len(bucket_ids) == len(set(bucket_ids)), sorted(bucket_ids)

    # single-partition history: the sorted single-file-per-bucket scan
    # is trustable again -> join needs no Sort on the ingest side
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    ing = spark.table("ing_events2").select("user_id", "value")
    other = spark.table("ing_events2").select(
        F.col("user_id").alias("u2"), "event_id"
    )
    j = ing.hint("merge").join(other, ing.user_id == other.u2)
    j.count()
    plan = (
        j._jdf.queryExecution().executedPlan().toString().split(
            "+- == Initial Plan =="
        )[0]
    )
    assert plan.count("Exchange") == 0, plan
    assert not re.findall(r"\bSort \[", plan), plan

    # nothing left to fold: second compaction is a no-op
    assert compact_ingest_partitions(spark, "ing_events2", batch_horizon=100) == 0


def test_fresh_session_reregisters_published_ingest(spark, sf_dir, events_dir, tmp_path):
    """THE data-loss case the review caught: a fresh session (no catalog
    entry) resuming an EXISTING checkpoint sees only new batches — if
    re-registration fails to recognize the published files (their names
    all start with '_': __ingest_batch=N, _SUCCESS), the first new batch
    falls into the create-overwrite branch and wipes batches 0..N.
    Deliver one NEW chunk against the SAME checkpoint and assert the
    old batches survive alongside it."""
    import shutil

    stream_dir = str(tmp_path / "stream5")
    shutil.copytree(events_dir, stream_dir)
    extra = str(tmp_path / "extra_chunk")
    events = load_table(spark, sf_dir, "events")
    events.limit(0).coalesce(1).write.mode("overwrite").parquet(extra)

    spark.sql("DROP TABLE IF EXISTS ing_events3")
    path = str(tmp_path / "ing_events3")
    ckpt = str(tmp_path / "cka")
    _ingest(spark, stream_dir, "ing_events3", path, ckpt)
    want = _content(spark, "ing_events3")
    assert want

    spark.sql("DROP TABLE ing_events3")  # external: files survive
    # a 5th chunk arrives; same checkpoint -> ONLY it is processed, by a
    # session with no catalog entry: must re-register, never clobber
    new_rows = events.orderBy("event_id").limit(7)
    new_rows.coalesce(1).write.mode("overwrite").parquet(extra)
    src = glob.glob(f"{extra}/part-*.parquet")[0]
    shutil.copy(src, f"{stream_dir}/chunk4.parquet")
    _ingest(spark, stream_dir, "ing_events3", path, ckpt)

    got = _content(spark, "ing_events3")
    extra_want = sorted(
        (r.event_id, r.user_id, r.event_type)
        for r in new_rows.select("event_id", "user_id", "event_type").collect()
    )
    assert got == sorted(want + extra_want), (
        len(got),
        len(want),
        len(extra_want),
    )


def test_compact_aborts_when_batch_lands_mid_compaction(
    spark, sf_dir, events_dir, tmp_path, monkeypatch
):
    """The continuous-ingest race the round-13 review caught: a batch
    already PAST the ingest guard when the compaction lease lands can
    commit its partition while the staged copy is being written; the
    old code swapped anyway and rmtree'd that batch with the aside dir.
    The pre-swap partition diff must abort the swap, leave `path`
    (including the new batch) intact, and release the lease."""
    import os

    spark.sql("DROP TABLE IF EXISTS ing_events6")
    path = str(tmp_path / "ing_events6")
    _ingest(spark, events_dir, "ing_events6", path, str(tmp_path / "ck"))
    want = _content(spark, "ing_events6")

    landed = os.path.join(path, "__ingest_batch=150")
    real_listdir = os.listdir

    def listdir_with_late_batch(p="."):
        # first listing of the table dir = the pre-swap diff; an
        # in-flight batch's partition commits just before it
        if os.path.abspath(str(p)) == os.path.abspath(path):
            os.makedirs(landed, exist_ok=True)
        return real_listdir(p)

    monkeypatch.setattr(os, "listdir", listdir_with_late_batch)
    with pytest.raises(RuntimeError, match="during compaction"):
        compact_ingest_partitions(spark, "ing_events6", batch_horizon=100)
    monkeypatch.undo()

    # table untouched, late batch still on disk, lease + staging gone
    assert os.path.exists(landed)
    assert not os.path.exists(path + "__swap_pending")
    assert not os.path.exists(path + "__stage")
    assert not os.path.exists(path + "__old")
    assert _content(spark, "ing_events6") == want

    # once ingest quiesces (no new partition appears), the retry folds
    os.rmdir(landed)
    assert compact_ingest_partitions(spark, "ing_events6", batch_horizon=100) == 4
    assert _content(spark, "ing_events6") == want


def test_compact_rescues_batch_landing_in_swap_window(
    spark, sf_dir, events_dir, tmp_path, monkeypatch
):
    """The ms-wide TOCTOU left over after the pre-swap diff: a batch
    past the ingest guard commits its partition AFTER the diff's
    listdir but BEFORE rename(path -> aside) — it rides into the aside
    dir, and without the post-swap re-diff the rmtree deleted it even
    though its checkpoint offset committed. The re-diff must move the
    late partition into the new table dir before discarding aside."""
    import os
    import shutil as sh

    spark.sql("DROP TABLE IF EXISTS ing_events7")
    path = str(tmp_path / "ing_events7")
    _ingest(spark, events_dir, "ing_events7", path, str(tmp_path / "ck"))
    want = _content(spark, "ing_events7")
    # a real bucketed part file (name keeps its bucket suffix) stands in
    # for the late batch's committed output; its rows (one bucket of
    # batch 0) are what must survive the swap
    src_file = glob.glob(f"{path}/__ingest_batch=0/part-*")[0]
    late_rows = sorted(
        (r.event_id, r.user_id, r.event_type)
        for r in spark.read.parquet(src_file)
        .select("event_id", "user_id", "event_type")
        .collect()
    )
    assert late_rows

    landed = os.path.join(path, "__ingest_batch=150")
    real_rename = os.rename

    def rename_with_late_commit(src, dst):
        # the in-flight batch's partition commits in the window between
        # the pre-swap listdir and rename(path -> aside)
        if os.path.abspath(str(src)) == os.path.abspath(path):
            os.makedirs(landed, exist_ok=True)
            sh.copy(src_file, landed)
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", rename_with_late_commit)
    n = compact_ingest_partitions(spark, "ing_events7", batch_horizon=100)
    monkeypatch.undo()
    assert n == 4

    # the late partition was moved out of aside into the new table dir
    # (not rmtree'd with it); its rows are visible, nothing else changed
    assert os.path.exists(landed)
    assert glob.glob(f"{landed}/part-*")
    assert not os.path.exists(path + "__old")
    assert not os.path.exists(path + "__stage")
    assert not os.path.exists(path + "__swap_pending")
    assert _content(spark, "ing_events7") == sorted(want + late_rows)


def test_compact_recovers_from_crash_between_renames(
    spark, sf_dir, events_dir, tmp_path
):
    """Simulate a crash inside the marker-bracketed swap window (after
    `rename(path -> aside)`, before `rename(staging -> path)`): the
    table location is missing, the marker is up, and the data lives
    only in the aside copy. The next compaction call must roll back
    and then complete normally; ingest must REFUSE to write while the
    marker is up (it would recreate `path` as a one-batch fragment)."""
    import os
    import pathlib
    import shutil

    spark.sql("DROP TABLE IF EXISTS ing_events4")
    path = str(tmp_path / "ing_events4")
    _ingest(spark, events_dir, "ing_events4", path, str(tmp_path / "ck"))
    want = _content(spark, "ing_events4")

    pathlib.Path(path + "__swap_pending").touch()
    os.rename(path, path + "__old")  # the crash window

    # the ingest guard: a resumed micro-batch must fail loudly, not
    # recreate the location (which would poison recovery)
    with pytest.raises(Exception, match="compaction swap leftovers"):
        _ingest(spark, events_dir, "ing_events4", path, str(tmp_path / "ck_g"))
    assert not os.path.exists(path)

    n = compact_ingest_partitions(spark, "ing_events4", batch_horizon=100)
    assert n == 4
    assert _content(spark, "ing_events4") == want
    assert not os.path.exists(path + "__old")
    assert not os.path.exists(path + "__stage")
    assert not os.path.exists(path + "__swap_pending")

    # an aside copy WITHOUT a marker is unreachable from the code:
    # refuse to guess which copy is the real table
    os.makedirs(path + "__old")
    with pytest.raises(RuntimeError, match="without a swap marker"):
        compact_ingest_partitions(spark, "ing_events4", batch_horizon=100)
    shutil.rmtree(path + "__old")

    # missing location with NO recovery copy fails loudly, touches nothing
    pathlib.Path(path + "__swap_pending").touch()
    shutil.rmtree(path)
    with pytest.raises(FileNotFoundError, match="no recovery copy"):
        compact_ingest_partitions(spark, "ing_events4", batch_horizon=100)


def test_recover_swap_rescues_late_batch_after_postswap_crash(
    spark, sf_dir, events_dir, tmp_path, monkeypatch
):
    """The round-15 review's crash window: a late batch rides into aside
    (the swap-window TOCTOU), rename(staging -> path) completes, and the
    process dies BEFORE the post-swap re-diff moves it out / rmtree's
    aside. Recovery previously treated marker+path+aside as 'aside is
    redundant' and rmtree'd the committed late batch. The marker now
    records the swap's horizon and _recover_swap replays the same
    rescue before discarding aside."""
    import os
    import shutil as sh

    from tweets_spark_top_10_spark.streaming import layout

    spark.sql("DROP TABLE IF EXISTS ing_events8")
    path = str(tmp_path / "ing_events8")
    _ingest(spark, events_dir, "ing_events8", path, str(tmp_path / "ck"))
    want = _content(spark, "ing_events8")
    src_file = glob.glob(f"{path}/__ingest_batch=0/part-*")[0]
    late_rows = sorted(
        (r.event_id, r.user_id, r.event_type)
        for r in spark.read.parquet(src_file)
        .select("event_id", "user_id", "event_type")
        .collect()
    )
    assert late_rows

    landed = os.path.join(path, "__ingest_batch=150")
    real_rename = os.rename

    def rename_with_late_commit(src, dst):
        # late batch commits between the pre-swap listdir and
        # rename(path -> aside) — it rides into aside
        if os.path.abspath(str(src)) == os.path.abspath(path):
            os.makedirs(landed, exist_ok=True)
            sh.copy(src_file, landed)
        return real_rename(src, dst)

    class Crash(RuntimeError):
        pass

    def crash_before_rescue(aside, new_path, horizon):
        raise Crash("simulated crash in the post-swap window")

    monkeypatch.setattr(os, "rename", rename_with_late_commit)
    monkeypatch.setattr(layout, "_rescue_late_partitions", crash_before_rescue)
    with pytest.raises(Crash):
        compact_ingest_partitions(spark, "ing_events8", batch_horizon=100)
    monkeypatch.undo()

    # the crash state: swap finished, late batch stranded in aside,
    # marker up (recording the horizon), table dir is the compacted copy
    assert os.path.exists(path + "__old")
    assert os.path.exists(os.path.join(path + "__old", "__ingest_batch=150"))
    assert open(path + "__swap_pending").read().strip() == "100"
    assert not os.path.exists(landed)

    # recovery (entered via the next compaction call) must move the late
    # partition into place, not rmtree it with aside
    n = compact_ingest_partitions(spark, "ing_events8", batch_horizon=100)
    assert n == 0  # history already folded by the crashed (completed) swap
    assert os.path.exists(landed)
    assert glob.glob(f"{landed}/part-*")
    assert not os.path.exists(path + "__old")
    assert not os.path.exists(path + "__stage")
    assert not os.path.exists(path + "__swap_pending")
    assert _content(spark, "ing_events8") == sorted(want + late_rows)


def test_recover_swap_refuses_horizonless_marker_with_aside(
    spark, sf_dir, events_dir, tmp_path
):
    """An EMPTY marker (pre-horizon format) alongside an aside copy
    cannot be re-diffed safely — moving <horizon partitions back would
    double-count against the staged -1 consolidation. Recovery must
    refuse loudly instead of picking a loss mode."""
    import os
    import pathlib
    import shutil

    spark.sql("DROP TABLE IF EXISTS ing_events9")
    path = str(tmp_path / "ing_events9")
    _ingest(spark, events_dir, "ing_events9", path, str(tmp_path / "ck"))
    want = _content(spark, "ing_events9")

    pathlib.Path(path + "__swap_pending").touch()  # old format: no body
    os.makedirs(path + "__old/__ingest_batch=150")
    with pytest.raises(RuntimeError, match="records no batch horizon"):
        compact_ingest_partitions(spark, "ing_events9", batch_horizon=100)
    # nothing destroyed: both copies and the marker still on disk
    assert os.path.exists(path + "__old/__ingest_batch=150")
    assert os.path.exists(path + "__swap_pending")

    shutil.rmtree(path + "__old")
    os.remove(path + "__swap_pending")
    assert _content(spark, "ing_events9") == want
