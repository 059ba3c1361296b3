"""Property-based invariants (hypothesis) for the text/dedup kernels.

One Spark job per example is slow, so each property batches all its
hypothesis-generated documents into a single DataFrame and asserts the
invariant row-wise — ~1 job per property, not per example.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from tweets_spark_top_10_spark.functions.dedup import content_hash
from tweets_spark_top_10_spark.functions.text import tokenize

# printable-ish text including whitespace runs and unicode
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    max_size=120,
)


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=60))
def test_tokenize_never_yields_empty_tokens(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    bad = (
        df.select(F.explode(tokenize(F.col("text"))).alias("tok"))
        .filter((F.col("tok") == "") | F.col("tok").isNull())
        .count()
    )
    assert bad == 0


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=60))
def test_token_join_roundtrip_preserves_nonspace_content(spark, texts):
    """Concatenating tokens == original text with whitespace removed
    (whitespace-split must lose nothing but separators)."""
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        F.array_join(tokenize(F.col("text")), "").alias("joined"),
        F.regexp_replace("text", r"\s+", "").alias("stripped"),
    ).collect()
    for r in rows:
        assert r.joined == r.stripped


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_content_hash_stable_and_injective_on_sample(spark, texts):
    """Same text → same hash (determinism across two evaluations);
    hash length is constant."""
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    a = [r[0] for r in df.select(content_hash(F.col("text"))).collect()]
    b = [r[0] for r in df.select(content_hash(F.col("text"))).collect()]
    assert a == b
    assert all(len(h) == 32 for h in a)


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_normalize_text_idempotent_and_shape(spark, texts):
    """normalize(normalize(x)) == normalize(x); output never contains
    control chars, leading/trailing space, doubled spaces, or uppercase."""
    from tweets_spark_top_10_spark.functions.text import normalize_text

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        normalize_text(F.col("text")).alias("once"),
        normalize_text(normalize_text(F.col("text"))).alias("twice"),
    ).collect()
    for r in rows:
        assert r.once == r.twice
        assert r.once == r.once.strip()
        assert "  " not in r.once
        assert not any(ord(ch) < 0x20 or ord(ch) == 0x7F for ch in r.once)
        assert r.once == r.once.lower()


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_redact_pii_fixed_point_and_count_consistency(spark, texts):
    """After one redact pass nothing is left for a second pass to find
    (pii_count(redacted) == 0), and redact never raises on arbitrary
    unicode."""
    from tweets_spark_top_10_spark.functions.text import pii_count, redact_pii

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    leftover = (
        df.select(redact_pii("text").alias("clean"))
        .select(pii_count("clean").alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert leftover == 0
