"""Streaming maintenance of the bucketed (co-located) layout.

``queries/layout_queries.py`` gives batch writes the zero-shuffle join;
this module keeps that layout true under CONTINUOUS ingest — the gap a
100 TB fact table actually lives in: events arrive forever, the nightly
join must stay co-located anyway.

Design (composing three proven disciplines):

- **Exactly-once ingest** = the ``foreach_batch_overwrite`` contract
  applied at the batch grain: every micro-batch lands in its own
  ``__ingest_batch = batch_id`` partition via dynamic partition
  overwrite, so a crash-replayed batch rewrites exactly its partition
  (``streaming/sinks.py:19``'s idempotence, without requiring whole
  result-partitions per batch — raw ingest appends, it never loses
  earlier batches).
- **Co-location** = the table is ``CLUSTERED BY (bucket_key)`` with a
  fixed bucket count; Spark's bucket spec is table-wide across
  partitions (bucket b's files across every ``__ingest_batch`` dir
  feed task b), so joins against any same-bucketed table stay
  zero-Exchange from the very first micro-batch — plan-asserted in
  ``tests/test_layout_stream.py``.
- **Compaction** = ``compact_ingest_partitions`` folds batch
  partitions below the caller's replay horizon (the checkpoint
  guarantees those batch ids never re-fire — the
  ``streaming/resample.compact_bucket_partials`` horizon contract)
  into one consolidated ``__ingest_batch = -1`` partition, restoring
  one-file-per-bucket there; partitions at/above the horizon keep
  their batch-id-keyed overwrite idempotence verbatim.

What multi-file buckets cost while uncompacted: the co-located join
keeps ZERO Exchange (the 100 TB killer) but re-sorts each bucket
locally (Spark only trusts the written sort order for single-file
buckets) — a per-task in-memory sort of that task's slice, not a
cluster-wide movement. Compaction restores the sort-free scan for the
consolidated history.

Reader contract: a batch REPLAY rewrites its partition under new file
names, and ``foreachBatch`` executes in a CLONED session whose
``REFRESH TABLE`` cannot reach other sessions' file-listing caches —
so a reader session that may overlap replays/compaction refreshes the
table before reading (standard Spark datasource-table semantics; the
in-write refresh below covers readers sharing the stream's session).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_BATCH_COL = "__ingest_batch"


def _register_existing(
    spark: SparkSession,
    table_name: str,
    path: str,
    batch: DataFrame,
    bucket_key: str,
    n_buckets: int,
) -> None:
    """Re-register published ingest files in a fresh session (the
    ``bucketed_table`` build-once/register-anywhere discipline): DDL
    with the bucket spec over the existing LOCATION, then partition
    recovery so the already-ingested ``__ingest_batch`` dirs are
    visible."""
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in batch.schema.fields
    )
    spark.sql(
        f"CREATE TABLE {table_name} ({ddl}, {_BATCH_COL} int) USING PARQUET "
        f"PARTITIONED BY ({_BATCH_COL}) "
        f"CLUSTERED BY ({bucket_key}) SORTED BY ({bucket_key}) "
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )
    spark.sql(f"MSCK REPAIR TABLE {table_name}")


def foreach_batch_bucketed_ingest(
    stream: DataFrame,
    table_name: str,
    path: str,
    bucket_key: str,
    n_buckets: int,
    checkpoint: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """writeStream.foreachBatch → batch-id-partitioned, bucketed ingest.

    ``repartition(n_buckets, bucket_key)`` before every write keeps the
    one-file-per-bucket-PER-PARTITION contract (each task holds exactly
    one bucket), bounding file count at buckets x batches until
    compaction folds the history.
    """

    def _write(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        out = batch.withColumn(_BATCH_COL, F.lit(int(batch_id))).repartition(
            n_buckets, bucket_key
        )
        if not spark.catalog.tableExists(table_name):
            import os

            if os.path.exists(path) and any(
                not e.startswith((".", "_")) for e in os.listdir(path)
            ):
                _register_existing(
                    spark, table_name, path, batch, bucket_key, n_buckets
                )
            else:
                (
                    out.write.format("parquet")
                    .partitionBy(_BATCH_COL)
                    .bucketBy(n_buckets, bucket_key)
                    .sortBy(bucket_key)
                    .option("path", path)
                    .mode("overwrite")
                    .saveAsTable(table_name)
                )
                return
        cols = spark.table(table_name).columns  # partition col is last
        # insertInto ignores writer-level options (it resolves through
        # the catalog, not a path writer) — dynamic mode must come from
        # the session conf, scoped and restored so the caller's other
        # overwrite writes keep their semantics
        conf_key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(conf_key, "static")
        spark.conf.set(conf_key, "dynamic")
        try:
            out.select(*cols).write.mode("overwrite").insertInto(table_name)
        finally:
            spark.conf.set(conf_key, prev)
        # a replayed batch rewrites its partition under NEW file names;
        # invalidate the cached listing so concurrent readers of the
        # table never chase deleted files
        spark.sql(f"REFRESH TABLE {table_name}")

    writer = stream.writeStream.foreachBatch(_write).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_ingest_partitions(
    spark: SparkSession, table_name: str, batch_horizon: int
) -> int:
    """Fold ``__ingest_batch`` partitions below ``batch_horizon``
    (including a previous ``-1`` consolidation) into ONE ``-1``
    partition with one file per bucket, keeping replayable partitions
    verbatim. Atomic dir swap under the table's unchanged LOCATION
    (the ``compact_bucket_partials`` discipline, bucket-spec-preserving
    via a staged ``saveAsTable``); returns how many batch partitions
    were folded."""
    import os
    import shutil

    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}")
        .where(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    path = loc.removeprefix("file:")
    staging = path.rstrip("/") + "__stage"
    aside = path.rstrip("/") + "__old"
    # Re-entrancy with RECOVERY (the compact_parquet discipline): a
    # crash between the two renames below leaves `path` missing and the
    # table alive only in the aside (original) or staging (complete —
    # it is only renamed into place after the staged write finished and
    # its temp table was dropped). Restore BEFORE reading, and never
    # delete a directory that is the table's only copy; leftovers are
    # safe to clear only once `path` exists again.
    if not os.path.exists(path):
        if os.path.exists(aside):
            os.rename(aside, path)
        elif os.path.exists(staging):
            os.rename(staging, path)
        else:
            raise FileNotFoundError(
                f"{table_name} location {path} missing with no recovery copy"
            )
        spark.sql(f"MSCK REPAIR TABLE {table_name}")
        spark.sql(f"REFRESH TABLE {table_name}")
    for p in (staging, aside):
        if os.path.exists(p):
            shutil.rmtree(p)

    df = spark.table(table_name)
    old = df.where(F.col(_BATCH_COL) < batch_horizon)
    n_folded = old.select(_BATCH_COL).distinct().count()
    if n_folded <= 1:
        return 0
    folded = old.withColumn(_BATCH_COL, F.lit(-1))
    keep = df.where(F.col(_BATCH_COL) >= batch_horizon)
    out = folded.unionByName(keep).localCheckpoint(eager=True)

    # identify the bucket spec from the catalog so the rewrite keeps it
    meta = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}").collect()
    }
    n_buckets = int(meta["Num Buckets"])
    bucket_key = meta["Bucket Columns"].strip("[]` ")

    stage_tbl = f"{table_name}__compact_stage"
    spark.sql(f"DROP TABLE IF EXISTS {stage_tbl}")
    (
        out.repartition(n_buckets, bucket_key)
        .write.format("parquet")
        .partitionBy(_BATCH_COL)
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .option("path", staging)
        .mode("overwrite")
        .saveAsTable(stage_tbl)
    )
    spark.sql(f"DROP TABLE {stage_tbl}")  # external: staged files stay
    os.rename(path, aside)
    os.rename(staging, path)
    shutil.rmtree(aside)
    spark.sql(f"MSCK REPAIR TABLE {table_name}")
    spark.sql(f"REFRESH TABLE {table_name}")
    return n_folded
