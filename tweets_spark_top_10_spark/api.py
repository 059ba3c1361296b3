"""User-facing entry points: the reference job as a library call.

``App.java:35-134`` is: pick an hour (args or previous UTC hour), read
that hour's files, explode the hashtag array, count, keep 10, write a
headered CSV.  ``hourly_top_k`` is that job on engine primitives — a
user of the reference switches by calling this with their base path —
and ``resolve_hour`` reproduces the reference's argument contract
(``App.java:41-57``: 0 args → previous UTC hour, 4 args → explicit
year/month/day/hour, anything else is an error) without its bugs
(UTC everywhere; no Calendar month off-by-one, SURVEY.md §1.2).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tweets_spark_top_10_spark.operators.explode_count import explode_count
from tweets_spark_top_10_spark.operators.topk import top_k
from tweets_spark_top_10_spark.sources.readers import read_hour_partition
from tweets_spark_top_10_spark.sources.writers import write_csv_top_k


def resolve_hour(args: list[str]) -> tuple[int, int, int, int]:
    """The reference's CLI contract: [] → previous UTC hour;
    [year, month, day, hour] → that hour; else ValueError."""
    if not args:
        prev = datetime.now(timezone.utc) - timedelta(hours=1)
        return prev.year, prev.month, prev.day, prev.hour
    if len(args) == 4:
        y, mo, d, h = (int(a) for a in args)
        # validate via real date arithmetic, not field codes
        datetime(y, mo, d, h, tzinfo=timezone.utc)
        return y, mo, d, h
    raise ValueError(
        f"expected 0 or 4 args (year month day hour), got {len(args)}"
    )


def hourly_top_k(
    spark: SparkSession,
    base_path: str,
    year: int,
    month: int,
    day: int,
    hour: int,
    array_col: str = "hashtags",
    k: int = 10,
    out_path: str | None = None,
    out_key: str = "hashtag",
    out_count: str = "NumberOfHashtags",
    fmt: str = "parquet",
) -> DataFrame:
    """One hour of an hour-partitioned table → explode ``array_col`` →
    count → top-K (count desc, key asc tie-break — the determinism the
    reference lacked, SURVEY.md §1.2) → optional single-file headered
    CSV, overwriting (``App.java:133-134``).

    ``fmt="avro"`` runs the reference's ACTUAL input format
    (``App.java:92-94``) — via the native connector when its jar is
    present, else the pure-Python container decoder."""
    hour_df = read_hour_partition(
        spark, base_path, year, month, day, hour, fmt=fmt
    )
    counted = explode_count(hour_df, array_col, out_key=out_key, out_count=out_count)
    result = top_k(counted, [F.desc(out_count), F.asc(out_key)], k=k)
    if out_path is not None:
        write_csv_top_k(result, out_path, k=k)
    return result
