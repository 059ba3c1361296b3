"""Streaming sources: file streams (the Kafka-shaped replay path).

``file_stream`` replays a directory of parquet files as a stream — the
test/replay twin of the Kafka topic the reference's pipeline consumed
upstream (its HDFS files were written by a Kafka-Connect sink,
``App.java:60-63``). Schema must be explicit: streaming reads do not
infer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def rate_stream(
    spark: SparkSession,
    rows_per_second: int = 100,
) -> DataFrame:
    """Built-in rate source: (timestamp, value) rows at a fixed rate —
    the zero-dependency load generator for soak/latency testing of
    streaming queries."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Read a directory as a file stream with an explicit schema.

    ``max_files_per_trigger`` throttles replay into multiple micro-
    batches (useful to exercise incremental state in tests).
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)
