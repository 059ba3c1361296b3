"""Multimodal-column queries over the documents fixture.

The fixtures carry no real media, so each query synthesizes the binary
payload column as ``encode(text, 'utf-8')`` — an honest stand-in: the
payload is opaque bytes to everything downstream, and the mapInPandas
plumbing (schemas, Arrow batches, explode-shaped frame output) is
exactly what a real image/video column uses.  The decode kernel itself
is the deterministic stub in ``functions/multimodal.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tweets_spark_top_10_spark.functions.multimodal import (
    attach_meta,
    extract_image_features,
    frame_sample,
    resize_media,
)
from tweets_spark_top_10_spark.queries.registry import register
from tweets_spark_top_10_spark.sources.registry import load_table


def _with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("id"),
        F.encode("text", "utf-8").alias("payload"),
    )


@register(
    "media_frame_counts",
    oracle="""
    SELECT doc_id AS id,
           CAST(CEIL(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_frames,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    WHERE octet_length(encode(text)) > 0
    """,
)
def media_frame_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample a binary column (1 row per 64-byte chunk via
    mapInPandas), then count frames per id.  The oracle recomputes the
    chunk count arithmetically — so the Arrow batch plumbing itself is
    under the correctness gate, not just the kernel."""
    payloads = _with_payload(spark, sf_dir)
    frames = frame_sample(payloads, every_n_bytes=64, frame_bytes=16)
    sizes = payloads.select(
        "id", F.octet_length("payload").cast("long").alias("n_bytes")
    )
    return (
        frames.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_frames"))
        .join(sizes, "id")
        .select("id", "n_frames", "n_bytes")
    )


@register(
    "media_resize_stats",
    oracle="""
    SELECT doc_id AS id,
           CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
           CAST(CEIL(octet_length(encode(text)) / 4.0) AS BIGINT) AS resized_bytes
    FROM documents
    """,
)
def media_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize kernel (1-in-4 byte downsample stub) through mapInPandas;
    the oracle recomputes both sizes arithmetically, gating the batch
    plumbing and the size bookkeeping."""
    payloads = _with_payload(spark, sf_dir)
    return resize_media(payloads, factor=4).select(
        "id", "orig_bytes", "resized_bytes"
    )


@register(
    "media_image_features",
    oracle="""
    WITH e AS (
      SELECT doc_id AS id, text,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             unnest(range(1, length(text) + 1)) AS i
      FROM documents
      WHERE octet_length(encode(text)) > 0
    ), b AS (
      SELECT id, n_bytes, ascii(substr(text, CAST(i AS INT), 1)) % 8 AS bin
      FROM e
    )
    SELECT id, MAX(n_bytes) AS n_bytes,
           array_to_string(list_value(
             CAST(SUM(CASE WHEN bin = 0 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN bin = 1 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN bin = 2 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN bin = 3 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN bin = 4 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN bin = 5 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN bin = 6 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN bin = 7 THEN 1 ELSE 0 END) AS BIGINT)), ',')
             AS hist,
           CAST(1.0 AS DOUBLE) AS feat_l1
    FROM b
    GROUP BY id
    """,
)
def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode+featurize binary payloads (deterministic stub for the
    codec+embed step) through Arrow-batched mapInPandas; output drops the
    payload so downstream shuffles move features, not media bytes.

    Full value oracle: the kernel's integer byte-histogram is replayed
    exactly in SQL (documents text is ASCII, so ``ascii(substr(...))``
    is the byte value); the float feature is gated by its L1 invariant
    (normalized histogram sums to 1), rounded to 4 digits.
    """
    payloads = attach_meta(_with_payload(spark, sf_dir), mime="text/plain")
    feats = extract_image_features(payloads, dim=8)
    return feats.filter(F.col("n_bytes") > 0).select(
        "id",
        "n_bytes",
        F.array_join(F.col("hist"), ",").alias("hist"),
        F.round(
            F.aggregate(
                "feature", F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            4,
        ).alias("feat_l1"),
    )


@register(
    "media_audio_stats",
    oracle="""
    WITH bytes AS (
      SELECT doc_id, ord(c) AS b
      FROM (SELECT doc_id, unnest(split(text, '')) AS c
            FROM documents WHERE length(text) > 0)
    )
    SELECT doc_id AS id,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(MAX(b) AS BIGINT) AS peak,
           ROUND(AVG(b), 6) AS mean_amp,
           ROUND(SQRT(AVG(CAST(b AS DOUBLE) * b)), 6) AS rms
    FROM bytes GROUP BY doc_id
    """,
)
def media_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio path of the multimodal surface: stub-decode the binary
    payload to uint8 'PCM' and compute waveform stats in an Arrow
    numpy kernel (``functions/multimodal.audio_waveform_stats``).  The
    fixture text is pure ASCII, so the oracle replays the byte stream
    as codepoints and the stats match exactly."""
    from tweets_spark_top_10_spark.functions.multimodal import audio_waveform_stats

    return audio_waveform_stats(_with_payload(spark, sf_dir))
