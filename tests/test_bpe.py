"""Distributed BPE merge learning (functions/bpe.py).

Three gates, per the replay-oracle audit discipline (SURVEY §2.3):
the DuckDB oracle unrolls the same rounds in SQL, so the INDEPENDENT
gate here is a pure-Python reference BPE (dict + Counter, no Spark, no
SQL) that must reproduce the merge table exactly; a handmade corpus
pins the overlap semantics (leftmost non-overlapping = greedy BPE
pairing) and the tie-break; and the oracle-harness compare pins the
driver-canon dtype contract."""

from __future__ import annotations

import collections
import re

import duckdb
import pyarrow.parquet as pq


def _py_bpe(texts: list[str], merges: int) -> list[tuple[int, str, str, int]]:
    """Reference BPE on Python dicts — same symbol-string encoding
    (space-joined, sentinel-wrapped) and same str.replace leftmost
    non-overlapping merge application as the engine and the oracle."""
    freq = collections.Counter(
        tok for t in texts for tok in re.split(r"\s+", t) if tok
    )
    words = {" " + " ".join(w) + " ": c for w, c in freq.items()}
    out = []
    for rank in range(1, merges + 1):
        pairs: collections.Counter = collections.Counter()
        for s, c in words.items():
            syms = s.split()
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (lhs, rhs), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rank, lhs, rhs, cnt))
        pat, rep = f" {lhs} {rhs} ", f" {lhs}{rhs} "
        merged: dict[str, int] = {}
        for s, c in words.items():
            merged[s.replace(pat, rep)] = merged.get(s.replace(pat, rep), 0) + c
        words = merged
    return out


def test_bpe_matches_python_reference(spark, sf_dir):
    """Engine merge table == the pure-Python reference, exactly —
    the independent gate the unrolled-SQL oracle can't provide."""
    from tweets_spark_top_10_spark.queries import QUERIES

    texts = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )["text"].to_pylist()
    expected = _py_bpe(texts, 8)
    got = sorted(
        map(tuple, QUERIES["bpe_merge_table"](spark, sf_dir).collect())
    )
    assert got == expected


def test_bpe_handmade_overlaps_and_ties(spark):
    """Pins the two semantics that make or break cross-engine parity:

    - leftmost non-overlapping pairing on runs: 'aaa' counts (a,a)
      twice but merging yields '(aa) a', never 'a (aa)';
    - ties break on (count DESC, lhs ASC, rhs ASC).
    """
    from tweets_spark_top_10_spark.functions.bpe import bpe_learn_merges

    # 'aaab' x3: pairs (a,a)x2*3=6, (a,b)x3 -> merge1 (a,a) cnt 6.
    # After: ' aa a b ': pairs (aa,a)x3, (a,b)x3 -> TIE at 3 ->
    # lhs 'a' < 'aa' so merge2 is (a,b) cnt 3.
    # After: ' aa a ab '? no — replace(' a b ',' ab ') on ' aa a b '
    # gives ' aa ab ': pairs (aa,ab)x3 -> merge3 (aa,ab) cnt 3.
    docs = spark.createDataFrame([("aaab aaab",), ("aaab",)], ["text"])
    got = [tuple(r) for r in bpe_learn_merges(docs, merges=4).collect()]
    assert got == [
        (1, "a", "a", 6),
        (2, "a", "b", 3),
        (3, "aa", "ab", 3),
    ], got  # round 4: no pairs left -> early stop at 3 rows

    assert got == [(r, lh, rh, c) for r, lh, rh, c in _py_bpe(
        ["aaab aaab", "aaab"], 4
    )]


def _py_apply_merges(texts, merge_rules):
    """Segmented word-frequency dict after applying merges in order."""
    freq = collections.Counter(
        tok for t in texts for tok in re.split(r"\s+", t) if tok
    )
    words = {" " + " ".join(w) + " ": c for w, c in freq.items()}
    for lhs, rhs in merge_rules:
        pat, rep = f" {lhs} {rhs} ", f" {lhs}{rhs} "
        merged: dict[str, int] = {}
        for s, c in words.items():
            k = s.replace(pat, rep)
            merged[k] = merged.get(k, 0) + c
        words = merged
    return words


def test_bpe_subword_vocab_matches_python_reference(spark, sf_dir):
    """Encode half: top-20 subword counts after the learned merges ==
    the pure-Python segmentation, exactly (count DESC, subword ASC)."""
    from tweets_spark_top_10_spark.queries import QUERIES

    texts = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )["text"].to_pylist()
    rules = [(lh, rh) for _, lh, rh, _ in _py_bpe(texts, 8)]
    counts: collections.Counter = collections.Counter()
    for s, c in _py_apply_merges(texts, rules).items():
        for sym in s.split():
            counts[sym] += c
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r.subword, r.n)
        for r in QUERIES["bpe_subword_vocab_top20"](spark, sf_dir).collect()
    ]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == expected
    assert len(got) == 20


def test_bpe_oracle_harness_compare(spark, sf_dir):
    """Full driver-style compare (row count + dtype-strict canon hash)
    against the unrolled MATERIALIZED-CTE oracles, both queries."""
    from tests.oracle_harness import compare
    from tweets_spark_top_10_spark.queries import ORACLE, QUERIES

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    for name in ("bpe_merge_table", "bpe_subword_vocab_top20"):
        res = compare(QUERIES[name](spark, sf_dir), con, ORACLE[name])
        assert res.ok, f"{name}: {res.detail}"


def test_bpe_rejects_bad_merge_count(spark):
    import pytest

    from tweets_spark_top_10_spark.functions.bpe import bpe_learn_merges

    docs = spark.createDataFrame([("x",)], ["text"])
    with pytest.raises(ValueError, match="merges"):
        bpe_learn_merges(docs, merges=0)
