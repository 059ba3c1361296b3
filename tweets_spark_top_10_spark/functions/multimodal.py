"""Multimodal column conventions: opaque binary payloads + typed metadata.

[EXT] surface (BASELINE.json north star). Design for 100 TB of media:

- A modality column is ``binary`` (the encoded payload) plus a struct
  of typed metadata (``media_meta``): mime, width/height/duration,
  sample rate. Metadata travels with the row so filters (e.g. "images
  wider than 512px") prune BEFORE any decode — predicate pushdown on
  the struct fields works; decode never runs on filtered-out rows.
- Decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` so each Python worker touches a whole batch, and the
  decoded output never needs to co-reside with the input (schema
  changes are explicit).
- The actual codec calls (PIL/ffmpeg/torchaudio) are NOT available in
  this container, so the decode kernels are deterministic fakes behind
  ``_decode_stub`` — the Spark-side plumbing (schemas, batch iteration,
  partitioning) is real and tested; swapping in a real codec is a
  one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("hist", T.ArrayType(T.LongType())),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_stub(payload: bytes, dim: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic fake 'decode + embed': bytes → (int histogram,
    L1-normalized fixed-dim feature).

    Stands in for (PIL.Image.open → resize → CNN embed); deterministic
    so tests can assert exact values. Real deployments replace this one
    function with the codec call.  The integer histogram rides along
    because it is exactly replayable in SQL — the correctness oracle
    checks it bit-for-bit, while the float feature is gated by its L1
    invariant (sums to 1 for non-empty payloads).
    """
    if payload is None or len(payload) == 0:
        z = np.zeros(dim)
        return z.astype(np.int64), z.astype(np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    # bucket byte histogram into `dim` coarse bins, L1-normalized
    hist = np.bincount(arr % dim, minlength=dim)
    feat = hist.astype(np.float32) / max(float(hist.sum()), 1.0)
    return hist.astype(np.int64), feat


def attach_meta(
    df: DataFrame,
    payload_col: str = "payload",
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Wrap a raw binary column with the engine's media_meta struct.

    ``width``/``height``/``duration_ms``/``sample_rate`` start NULL (a
    real decoder fills them); ``mime`` and the payload byte size are
    known up front, so size/mime filters prune before any decode."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.octet_length(F.col(payload_col)).alias("n_bytes"),
        ),
    )


def extract_image_features(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    dim: int = 8,
) -> DataFrame:
    """Decode+featurize a binary column via Arrow-batched mapInPandas.

    The output schema drops the payload — feature tables should never
    carry the original bytes through downstream shuffles (a 100 TB
    media table's features are ~1000× smaller than its payloads).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_decode_stub(p, dim) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[payload_col].map(
                        lambda p: 0 if p is None else len(p)
                    ).astype("int64"),
                    "hist": [h.tolist() for h, _ in decoded],
                    "feature": [f.tolist() for _, f in decoded],
                }
            )

    return df.mapInPandas(batches, schema=IMAGE_FEATURES)


def resize_media(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    factor: int = 4,
) -> DataFrame:
    """'Resize' a binary column: deterministic 1-in-``factor`` byte
    downsample (stand-in for PIL resize / ffmpeg scale — same contract:
    payload in, smaller payload + updated meta out, Arrow-batched).

    Output keeps the media_meta convention: new payload plus original
    and resized byte sizes so downstream filters can prune on size
    without touching bytes.
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("orig_bytes", T.LongType()),
            T.StructField("resized_bytes", T.LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads, orig, resized = [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    p = b""
                small = bytes(p[::factor])
                ids.append(i)
                payloads.append(small)
                orig.append(len(p))
                resized.append(len(small))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "payload": payloads,
                    "orig_bytes": orig,
                    "resized_bytes": resized,
                }
            )

    return df.mapInPandas(batches, schema=out_schema)


def frame_sample(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    every_n_bytes: int = 64,
    frame_bytes: int = 16,
) -> DataFrame:
    """'Frame sampling' over a binary column: emit one row per sampled
    chunk (stand-in for video frame extraction — same explode-shaped
    plumbing: one input row → N output rows, schema declared up front).
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, frames = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                for no, off in enumerate(range(0, len(p), every_n_bytes)):
                    ids.append(i)
                    nos.append(no)
                    frames.append(bytes(p[off : off + frame_bytes]))
            yield pd.DataFrame({"id": ids, "frame_no": nos, "frame": frames})

    return df.mapInPandas(batches, schema=out_schema)


AUDIO_STATS = "id long, n_samples long, peak long, mean_amp double, rms double"


def audio_waveform_stats(
    df: DataFrame, id_col: str = "id", payload_col: str = "payload"
) -> DataFrame:
    """Audio-decode stub + waveform statistics via mapInPandas.

    A real pipeline would decode the container (wav/flac/ogg) to PCM
    here; the container has no audio libs, so the deterministic stand-in
    treats the payload bytes themselves as uint8 samples (schema,
    batching, and the numpy-kernel shape are exactly the real path).
    Sums are exact in float64 (byte values, len << 2^53), so the stats
    are replayable bit-for-bit by the SQL oracle.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tweets_spark_top_10_spark.functions.numeric import (
            round_half_up,
        )

        for pdf in it:
            ids, n, peak, mean, rms = [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None or len(p) == 0:
                    continue
                x = np.frombuffer(p, dtype=np.uint8).astype(np.float64)
                ids.append(int(i))
                n.append(len(x))
                peak.append(int(x.max()))
                # HALF_UP to match SQL ROUND (round() is half-even)
                mean.append(round_half_up(float(x.mean()), 6))
                rms.append(round_half_up(float(np.sqrt(np.mean(x * x))), 6))
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(n, dtype="int64"),
                    "peak": pd.Series(peak, dtype="int64"),
                    "mean_amp": pd.Series(mean, dtype="float64"),
                    "rms": pd.Series(rms, dtype="float64"),
                }
            )

    return df.mapInPandas(batches, schema=AUDIO_STATS)
