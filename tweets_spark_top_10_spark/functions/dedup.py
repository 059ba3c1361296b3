"""Deduplication: exact, n-gram Jaccard, MinHash-LSH, SimHash.

[EXT] surface (SURVEY.md §2.2); the reference has no dedup at all.

Scale design (100 TB of documents):
- **Exact**: hash-groupBy on a content fingerprint — one shuffle keyed
  by a uniformly-distributed hash, so no skew by construction.
- **n-gram Jaccard**: exact pairwise similarity, but candidates come
  from an equi-join on shared shingles — never a cross join. Hot
  shingles (appearing in thousands of docs) quadratically blow up the
  candidate set, so `max_shingle_df` drops them (a shingle shared by
  10k docs is useless as dedup evidence anyway — it is boilerplate).
- **MinHash-LSH**: sub-quadratic candidate generation via
  ``pyspark.ml.feature.MinHashLSH`` banding; the exact-Jaccard rerank
  of candidates is cheap.
- **SimHash**: 64-bit sketch via a vectorized Pandas UDF (Arrow
  batches); near-dup = small Hamming distance, banded by 16-bit chunks
  for candidate generation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tweets_spark_top_10_spark.functions.text import fingerprint, shingles, tokenize


def content_hash(text: Column | str) -> Column:
    """Full md5 of normalized text (exact-dedup key)."""
    return fingerprint(text, length=32)


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Keep the lowest-id row per distinct (normalized) content.

    Output: (hash_col, id_col, n_dups). One shuffle keyed by the
    content hash — uniformly distributed, so skew-free by construction.
    """
    h = content_hash(F.col(text_col)).alias(hash_col)
    return (
        df.select(h, F.col(id_col))
        .groupBy(hash_col)
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def shingle_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(id, shingle) pairs, distinct per doc — the join key space for
    candidate generation."""
    toks = tokenize(F.col(text_col))
    return df.select(
        F.col(id_col), F.explode(shingles(toks, n)).alias("shingle")
    ).distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing a shingle.

    Plan shape: shingle equi-join (shuffle on shingle) → group by pair
    (shuffle on pair) → join per-doc counts (broadcast-able) → filter.
    ``max_shingle_df`` caps the document frequency of join-key shingles
    to keep hot keys from exploding the pair count at scale.
    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to
    6 digits for cross-engine determinism.
    """
    sh = shingle_table(df, text_col, id_col, n)
    if max_shingle_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(keep), "shingle")
    counts = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))

    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    na = counts.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = counts.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hash_tables: int = 4,
    num_features: int = 1 << 18,
    jaccard_threshold: float = 0.2,
    seed: int = 42,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash-LSH (sub-quadratic).

    shingles → HashingTF (sparse indicator vector) → MinHashLSH
    approxSimilarityJoin. Output: (id_a, id_b, jaccard_approx) where
    jaccard_approx = 1 - lsh distance. The LSH distance is itself an
    estimate; callers wanting exactness rerank candidates with
    :func:`ngram_jaccard_pairs` restricted to these pairs.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    toks = tokenize(F.col(text_col))
    docs = df.select(id_col, shingles(toks, n).alias("sh")).filter(F.size("sh") > 0)
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=num_features)
    feats = tf.transform(docs)
    lsh = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, 1.0 - jaccard_threshold, distCol="dist"
    )
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round(1.0 - F.col("dist"), 6).alias("jaccard_approx"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


def simhash64(df: DataFrame, text_col: str = "text", out_col: str = "simhash") -> DataFrame:
    """64-bit SimHash per row via a vectorized Pandas UDF.

    Python is unavoidable here (per-bit majority vote over token hashes
    has no clean Catalyst expression), so it is the Arrow-batched kind:
    one Python call per ~10k rows, numpy inside.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            acc = np.zeros(64, dtype=np.int64)
            for tok in t.lower().split():
                # FNV-1a 64-bit, deterministic across processes.
                h = np.uint64(0xCBF29CE484222325)
                for ch in tok.encode("utf-8"):
                    h = np.uint64((int(h) ^ ch) * 0x100000001B3 % (1 << 64))
                bits = np.unpackbits(
                    np.frombuffer(np.uint64(h).tobytes(), dtype=np.uint8)
                )
                acc += np.where(bits == 1, 1, -1)
            sig = np.packbits((acc > 0).astype(np.uint8))
            out[i] = np.frombuffer(sig.tobytes(), dtype=np.int64)[0]
        return pd.Series(out)

    return df.withColumn(out_col, _simhash(F.col(text_col)))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    simhash_col: str = "simhash",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded for scale.

    Pigeonhole: two 64-bit signatures within Hamming distance d <= 3
    agree exactly on at least one of 4 16-bit bands. Candidates come
    from an equi-join per band (shuffle on 16-bit band value, never a
    cross join), then the exact popcount filter runs on candidates.
    """
    bands = [
        F.shiftrightunsigned(F.col(simhash_col), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias(f"b{i}")
        for i in range(4)
    ]
    sig = df.select(F.col(id_col), F.col(simhash_col), *bands)
    pairs = None
    for i in range(4):
        a = sig.select(
            F.col(id_col).alias("id_a"),
            F.col(simhash_col).alias("sh_a"),
            F.col(f"b{i}").alias("band"),
        )
        b = sig.select(
            F.col(id_col).alias("id_b"),
            F.col(simhash_col).alias("sh_b"),
            F.col(f"b{i}").alias("band"),
        )
        cand = a.join(b, "band").filter(F.col("id_a") < F.col("id_b")).drop("band")
        pairs = cand if pairs is None else pairs.unionByName(cand)
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.distinct()
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
