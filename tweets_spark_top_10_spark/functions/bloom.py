"""Broadcast Bloom-filter semi-join reduction, pure JVM.

The 100 TB problem this solves: a fact/dimension equi-join where the
dimension's *rows* are too big to broadcast but its *key set* fits a
few KB of Bloom bits.  Shuffling the full fact table to discover that
most rows have no match wastes the bulk of the join's cost; filtering
the fact side first with a broadcast Bloom filter of the dimension
keys drops non-matching rows BEFORE the shuffle.  False positives
only — the subsequent (now much smaller) exact join removes them, so
the final result is exact, which is what the full value oracle checks.

This is the explicit-operator form of Spark's own runtime row-level
filtering (``spark.sql.optimizer.runtime.bloomFilter.enabled``, which
only triggers under its own selectivity heuristics); making it an
operator lets a pipeline apply it deterministically, persist the bits
alongside a snapshot, or push the same bits into multiple fact scans.

Implementation is entirely Catalyst expressions (whole-stage codegen,
no Python in the executor path): double hashing via two ``xxhash64``
seeds (Kirsch-Mitzenmacher: probe_i = h1 + i*h2 mod m), bit words
built distributed with ``groupBy(word).bit_or(mask)``, and membership
tested against a broadcast ``array<long>`` literal of the words.  The
only driver-side collect is the word array itself — ``m_bits/64``
longs (8 KB at the default 2^16 bits), metadata-size by construction.

Hashes are masked to 31 bits before the probe arithmetic so the
``h1 + i*h2`` terms stay far from Long.MaxValue — Spark 4 runs ANSI
mode by default, where silent overflow is an error.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MASK31 = 1 << 31


def _bit_mask(pos: Column) -> Column:
    """``1L << (pos % 64)`` with a Column shift amount (the ``F.shiftleft``
    wrapper only takes a literal count, the SQL function takes a column)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
    )


def _probe_positions(key: Column, k: int, m_bits: int) -> list[Column]:
    """The k Bloom probe bit-positions of ``key`` (double hashing)."""
    h1 = F.pmod(F.xxhash64(key), F.lit(_MASK31))
    h2 = F.pmod(F.xxhash64(key, F.lit("bloom-h2")), F.lit(_MASK31))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]


def bloom_word_updates(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 5
) -> DataFrame:
    """Sparse ``(word_idx, word)`` bit-word contributions of ``keys``.

    The mergeable core of the filter: bit_or is commutative/
    associative/idempotent, so word tables from any partitioning of
    the key set — batches, streams, partial rebuilds — OR together
    into exactly the filter a single-pass build produces.
    """
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    key = F.col(key_col)
    pos = F.explode(F.array(*_probe_positions(key, k, m_bits))).alias("pos")
    return (
        keys.where(key.isNotNull())
        .select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).alias("word_idx"),
            _bit_mask(F.col("pos")).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 5) -> list[int]:
    """Build Bloom bit-words over ``keys[key_col]``, distributed.

    Each key contributes ``k`` bits; words are OR-combined with a
    map-side-combinable ``bit_or`` aggregate keyed by word index (at
    most ``m_bits/64`` groups — the shuffle is bounded by the filter
    size, not the key count).  Returns the dense ``m_bits // 64``
    word list (Python ints) for broadcasting into expressions.
    """
    words = bloom_word_updates(keys, key_col, m_bits=m_bits, k=k).collect()
    dense = [0] * (m_bits // 64)
    for r in words:
        dense[int(r["word_idx"])] = int(r["word"])
    return dense


def bloom_might_contain(key: Column, words: list[int], k: int = 5) -> Column:
    """Membership test column: true if all k probe bits are set.

    ``words`` is embedded as an ``array<long>`` literal — Catalyst
    broadcasts it inside the serialized plan, so the test runs in
    whole-stage codegen with zero extra joins or Python."""
    m_bits = len(words) * 64
    arr = F.lit(words)
    conds = []
    for pos in _probe_positions(key, k, m_bits):
        word = F.element_at(arr, (F.shiftright(pos, 6) + F.lit(1)).cast("int"))
        conds.append(word.bitwiseAND(_bit_mask(pos)) != F.lit(0))
    return functools.reduce(operator.and_, conds)


def bloom_prefilter(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    m_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """Filter ``fact`` to rows whose ``fact_key`` *may* appear in
    ``dim[dim_key]`` — a superset of the true semi-join (false
    positives only, never false negatives), to be closed by the exact
    join that follows."""
    words = bloom_build(dim.select(dim_key), dim_key, m_bits=m_bits, k=k)
    return fact.where(bloom_might_contain(F.col(fact_key), words, k=k))
