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
