"""hourly_top_k == the reference job (App.java:35-134) end-to-end on a
tweets-shaped hour-partitioned table."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from tweets_spark_top_10_spark.api import hourly_top_k, resolve_hour
from tweets_spark_top_10_spark.sources.registry import load_table
from tweets_spark_top_10_spark.sources.writers import write_partitioned


@pytest.fixture(scope="module")
def tweets_dir(spark, sf_dir, tmp_path_factory):
    """A tweets-shaped table: (timestamp, hashtags: array<string>),
    hour-partitioned — synthesized from events (hashtags = tokens of
    event_type + user bucket, so counts are deterministic)."""
    base = str(tmp_path_factory.mktemp("tweets") / "tbl")
    events = load_table(spark, sf_dir, "events")
    tweets = events.select(
        F.col("ts").alias("timestamp"),
        F.array(
            F.col("event_type"),
            F.concat(F.lit("u"), (F.col("user_id") % 10).cast("string")),
        ).alias("hashtags"),
        F.year("ts").alias("year"),
        F.month("ts").alias("month"),
        F.dayofmonth("ts").alias("day"),
        F.hour("ts").alias("hour"),
    )
    write_partitioned(tweets, base, ["year", "month", "day", "hour"])
    return base


def test_resolve_hour_contract():
    y, mo, d, h = resolve_hour(["2024", "1", "15", "7"])
    assert (y, mo, d, h) == (2024, 1, 15, 7)
    prev = resolve_hour([])
    assert 2020 < prev[0] < 2100
    with pytest.raises(ValueError):
        resolve_hour(["2024", "1"])
    with pytest.raises(ValueError):
        resolve_hour(["2024", "13", "1", "0"])  # month 13: real validation


def test_hourly_top_k_matches_direct(spark, sf_dir, tweets_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    y, mo, d, h = (
        events.select(
            F.year("ts"), F.month("ts"), F.dayofmonth("ts"), F.hour("ts")
        )
        .distinct()
        .orderBy("year(ts)", "month(ts)", "dayofmonth(ts)", "hour(ts)")
        .collect()[3]
    )
    out = str(tmp_path / "csv")
    got = hourly_top_k(
        spark, tweets_dir, y, mo, d, h, k=10, out_path=out
    ).collect()
    assert 0 < len(got) <= 10

    direct = (
        events
        .filter(
            (F.year("ts") == y)
            & (F.month("ts") == mo)
            & (F.dayofmonth("ts") == d)
            & (F.hour("ts") == h)
        )
        .select(
            F.explode(
                F.array(
                    F.col("event_type"),
                    F.concat(F.lit("u"), (F.col("user_id") % 10).cast("string")),
                )
            ).alias("hashtag")
        )
        .groupBy("hashtag")
        .agg(F.count(F.lit(1)).alias("NumberOfHashtags"))
        .orderBy(F.desc("NumberOfHashtags"), F.asc("hashtag"))
        .limit(10)
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in direct]

    csv = glob.glob(f"{out}/part-*.csv")
    assert len(csv) == 1
    lines = open(csv[0]).read().strip().splitlines()
    assert lines[0] == "hashtag,NumberOfHashtags"
    assert len(lines) == len(got) + 1


def test_hourly_top_k_over_avro_hour_partition(spark, tmp_path):
    """The LITERAL reference user journey: hour-partitioned Avro tweet
    data (App.java:60-94) -> hourly_top_k(fmt='avro') -> deterministic
    top-10 + single headered CSV — end to end in this jar-less
    container via the python container decoder."""
    import glob

    from tweets_spark_top_10_spark.api import hourly_top_k
    from tweets_spark_top_10_spark.sources.avro_py import write_avro_file

    schema = {
        "type": "record",
        "name": "Tweet",
        "fields": [
            {"name": "timestamp", "type": "long"},
            {"name": "hashtags", "type": {"type": "array", "items": "string"}},
        ],
    }
    base = tmp_path / "topics" / "tweets"
    hour_dir = base / "year=2024" / "month=03" / "day=01" / "hour=07"
    other_dir = base / "year=2024" / "month=03" / "day=01" / "hour=08"
    hour_dir.mkdir(parents=True)
    other_dir.mkdir(parents=True)
    recs = (
        [{"timestamp": 1, "hashtags": ["spark", "data"]}] * 6
        + [{"timestamp": 2, "hashtags": ["spark"]}] * 3
        + [{"timestamp": 3, "hashtags": []}]
    )
    write_avro_file(str(hour_dir / "part-0.avro"), schema, recs)
    # a different hour that must NOT leak into the result
    write_avro_file(
        str(other_dir / "part-0.avro"),
        schema,
        [{"timestamp": 9, "hashtags": ["leak"]}] * 50,
    )

    out = str(tmp_path / "Top10-2024-03-01-07")
    result = hourly_top_k(
        spark, str(base), 2024, 3, 1, 7, out_path=out, fmt="avro"
    ).collect()
    assert [(r["hashtag"], r["NumberOfHashtags"]) for r in result] == [
        ("spark", 9),
        ("data", 6),
    ]
    files = glob.glob(f"{out}/part-*.csv")
    assert len(files) == 1
    lines = open(files[0]).read().strip().splitlines()
    assert lines[0] == "hashtag,NumberOfHashtags"
    assert lines[1:] == ["spark,9", "data,6"]
