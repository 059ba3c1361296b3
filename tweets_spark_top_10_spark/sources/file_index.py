"""File-level Bloom index: point-lookup file skipping on plain parquet.

Footer min/max stats (``write_clustered`` / ``write_zorder_clustered``)
prune RANGE predicates; they are useless for a point lookup on a
high-cardinality key whose values interleave across files.  The Bloom
sidecar closes that gap: one small bit-word table per data file, built
distributed in a single scan, lets a reader test "might file F contain
key x?" and open only the files that pass — the same access path
Parquet's optional column-level Bloom filters / Iceberg puffin blobs
provide, expressed over the engine's own mergeable Bloom core
(``functions/bloom.py``) so it works on any parquet dir, written by
anyone.

Guarantees: zero false negatives (a file containing the key always
passes — the lookup result equals the full-scan filter, which is what
the test asserts); false positives only cost extra file opens at the
filter's FPR.

Scale shape: the build is one scan with a ``groupBy(file, word_idx)``
bit_or (shuffle bounded by n_files x m/64 words, not by row count);
the index table is KBs per file; pruning itself runs on the index
table (file-count-sized) and the subsequent read lists only candidate
files.  The index composes with the streaming maintenance pattern —
new files contribute their word rows append-only; bit words for a
file never change once the file is immutable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tweets_spark_top_10_spark.functions.bloom import (
    _bit_mask,
    _probe_positions,
)


def build_file_bloom_index(
    spark: SparkSession,
    data_path: str,
    key_col: str,
    m_bits: int = 1 << 13,
    k: int = 5,
) -> DataFrame:
    """One scan → sparse per-file Bloom words ``(file, word_idx, word)``.

    ``m_bits`` sizes the filter PER FILE (default 2^13 bits = 1 KB) —
    pick ~10 bits per distinct key per file for ~1% FPR.
    """
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    df = spark.read.parquet(data_path).select(
        F.input_file_name().alias("file"), F.col(key_col)
    )
    # hash the STRING form: xxhash64 is type-sensitive (hash(12 as int)
    # != hash(12 as bigint)), and the probe side receives a Python
    # literal whose Spark type need not match the column's — the cast
    # canonicalizes both sides
    pos = F.explode(
        F.array(*_probe_positions(F.col(key_col).cast("string"), k, m_bits))
    ).alias("pos")
    return (
        df.where(F.col(key_col).isNotNull())
        .select("file", pos)
        .select(
            "file",
            F.shiftright(F.col("pos"), 6).alias("word_idx"),
            _bit_mask(F.col("pos")).alias("mask"),
        )
        .groupBy("file", "word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def candidate_files(
    index: DataFrame,
    key_value,
    m_bits: int = 1 << 13,
    k: int = 5,
) -> list[str]:
    """Files that MAY contain ``key_value`` per the index — a superset
    of the files that do (no false negatives).

    The probe runs as one tiny job: the k probe positions of the
    literal are reduced to per-word required masks (two probes can
    land in one word), then a file qualifies iff EVERY required word
    has all its required bits set.  Sparse representation means an
    absent (file, word_idx) row fails that word — correct, since the
    build writes a row for every word any key of the file touched.
    """
    spark = index.sparkSession
    lit = F.lit(key_value).cast("string")  # match the build-side cast
    probes = spark.range(1).select(
        F.explode(F.array(*_probe_positions(lit, k, m_bits))).alias("pos")
    )
    needed = (
        probes.select(
            F.shiftright(F.col("pos"), 6).alias("word_idx"),
            _bit_mask(F.col("pos")).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("need"))
    )
    n_words = needed.count()
    hits = (
        index.join(F.broadcast(needed), "word_idx")
        .where(F.col("word").bitwiseAND(F.col("need")) == F.col("need"))
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("n_ok"))
        .where(F.col("n_ok") == F.lit(n_words))
    )
    return [r["file"] for r in hits.select("file").collect()]


def point_lookup(
    spark: SparkSession,
    data_path: str,
    index: DataFrame,
    key_col: str,
    key_value,
    m_bits: int = 1 << 13,
    k: int = 5,
) -> DataFrame:
    """Exact point lookup reading only index-passing files.

    Result == ``read(data_path).where(key == value)`` (the Bloom pass
    is a superset; the residual filter closes it); when no file
    passes, returns an empty DataFrame with the table's schema without
    touching any data file.
    """
    files = candidate_files(index, key_value, m_bits=m_bits, k=k)
    schema = spark.read.parquet(data_path).schema
    if not files:
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema)
        .parquet(*files)
        .where(F.col(key_col) == F.lit(key_value))
    )
