"""Two-pass exact top-K (Misra-Gries candidates + exact rerank).

The catalog query ``heavy_hitters_top10`` is oracle-gated at real SF;
these tests pin the *guarantee* on adversarial layouts — including the
case where the sketch cannot certify a candidate set and the operator
must fall back to the exhaustive count to stay exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tweets_spark_top_10_spark.functions.heavy_hitters import (
    exact_top_k_two_pass,
    mg_candidate_tokens,
    mg_partition_summaries,
)


def _exact(df, k):
    return (
        df.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
        .collect()
    )


def test_sketch_path_certifies_small_candidate_set(spark):
    """Heavy-tailed data, adequate capacity: the sketch must certify a
    candidate set (no fallback), the set must be tiny relative to the
    vocabulary, and the final top-5 must equal the exhaustive answer."""
    rows = [(f"hot{h}",) for h in range(10) for _ in range(500)]
    rows += [(f"tail_{i}",) for i in range(1000)]
    df = spark.createDataFrame(rows, "token string").repartition(8)
    cands = mg_candidate_tokens(df, "token", k=5, capacity=99)
    assert cands is not None, "sketch should certify at this capacity"
    n_cands = cands.count()
    assert n_cands <= 20, f"candidate set not selective: {n_cands}"
    got = exact_top_k_two_pass(df, "token", k=5, capacity=99).collect()
    assert got == _exact(df, 5)


def test_spread_hitter_exact_even_when_capacity_undersized(spark):
    """A token spread thin over many partitions (4 per partition, tied
    down by partition-local junk) with a deliberately tiny capacity:
    the sketch cannot certify, the operator must fall back, and the
    answer must still be the exact top-5."""
    rows = []
    for p in range(16):
        rows += [(p, "needle")] * 4
        rows += [(p, f"junk_{p}_{j}") for j in range(40) for _ in range(3)]
    df = (
        spark.createDataFrame(rows, "part int, token string")
        .repartition(16, "part")
        .select("token")
    )
    got = exact_top_k_two_pass(df, "token", k=5, capacity=8).collect()
    assert got == _exact(df, 5)
    assert got[0]["token"] == "needle" and got[0]["n"] == 64


def test_two_pass_matches_exact_across_capacities(spark):
    rows = []
    for i in range(400):
        tok = f"t{i % 23}" if i % 3 else f"hot{i % 2}"
        rows.append((tok,))
    df = spark.createDataFrame(rows, "token string").repartition(8)
    for cap in (1, 2, 7, 64, 4096):
        got = exact_top_k_two_pass(df, "token", k=10, capacity=cap)
        assert got.collect() == _exact(df, 10), f"capacity={cap}"


def test_partition_summaries_bounded_and_undercounting(spark):
    df = spark.createDataFrame(
        [(f"t{i % 50}",) for i in range(1000)], "token string"
    ).repartition(4)
    cap = 10
    s = mg_partition_summaries(df, "token", cap).collect()
    per_part_tokens = [r for r in s if r["token"] is not None]
    meta = [r for r in s if r["token"] is None]
    # <= capacity token rows per partition; one meta row per partition
    assert len(meta) == 4
    assert len(per_part_tokens) <= cap * 4
    assert sum(r["est"] for r in meta) == 1000
    # merged estimates never exceed true global counts (MG underestimates)
    from collections import Counter

    merged = Counter()
    for r in per_part_tokens:
        merged[r["token"]] += r["est"]
    for tok, est in merged.items():
        assert est <= 1000 / 50 + 1e-9, tok


def _exact_grouped(df, k):
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("grp").orderBy(F.desc("n"), F.asc("token"))
    )
    return (
        df.where(F.col("grp").isNotNull() & F.col("token").isNotNull())
        .groupBy("grp", "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", rn)
        .where(F.col("rn") <= k)
        .drop("rn")
        .orderBy("grp", F.desc("n"), "token")
        .collect()
    )


def test_grouped_mixed_certified_and_fallback_groups(spark):
    """One heavy-tailed group (certifiable), one flat group too spread
    for the tiny capacity (must degrade to exhaustive), one group with
    fewer than k distinct tokens, plus NULL group/token rows that must
    not appear anywhere. Exactness must hold across all of them."""
    from tweets_spark_top_10_spark.functions.heavy_hitters import (
        grouped_exact_top_k,
    )

    rows = [("skewed", f"hot{h}") for h in range(5) for _ in range(200)]
    rows += [("skewed", f"tail_{i}") for i in range(300)]
    rows += [("flat", f"f{i % 97}") for i in range(970)]
    rows += [("tiny", "only_a")] * 4 + [("tiny", "only_b")] * 2
    rows += [(None, "ghost")] * 10 + [("skewed", None)] * 10
    df = spark.createDataFrame(rows, "grp string, token string").repartition(8)
    for cap in (8, 64, 2048):
        got = (
            grouped_exact_top_k(df, "grp", "token", k=3, capacity=cap)
            .orderBy("grp", F.desc("n"), "token")
            .collect()
        )
        assert got == _exact_grouped(df, 3), f"capacity={cap}"
    # the tiny group surfaces both of its tokens, no more
    tiny = [r for r in got if r["grp"] == "tiny"]
    assert [(r["token"], r["n"]) for r in tiny] == [("only_a", 4), ("only_b", 2)]


def test_grouped_summaries_bounded_per_partition_group(spark):
    from tweets_spark_top_10_spark.functions.heavy_hitters import (
        mg_partition_summaries_grouped,
    )

    rows = [(f"g{i % 3}", f"t{i % 40}") for i in range(1200)]
    df = spark.createDataFrame(rows, "grp string, token string").repartition(4)
    cap = 5
    s = mg_partition_summaries_grouped(df, "grp", "token", cap).collect()
    tok_rows = [r for r in s if r["token"] is not None]
    meta = [r for r in s if r["token"] is None]
    # one total row per (partition, group); <= cap tokens per each
    assert len(meta) <= 4 * 3
    assert sum(r["est"] for r in meta) == 1200
    from collections import Counter

    per_pg = Counter()
    for r in tok_rows:
        per_pg[r["grp"]] += 1
    assert all(c <= cap * 4 for c in per_pg.values())


def test_global_summary_with_fewer_than_k_survivors_falls_back(spark):
    """When pruning leaves fewer than k merged tokens, absent tokens
    could still be top-k by distinctness alone — the sketch must refuse
    to certify (m < k guard) and the two-pass result stay exact."""
    rows = [("dom",)] * 500 + [(f"rare{i}",) for i in range(30)]
    df = spark.createDataFrame(rows, "token string").repartition(2)
    # capacity 1: each partition keeps ~1 surviving token
    assert mg_candidate_tokens(df, "token", k=5, capacity=1) is None
    got = exact_top_k_two_pass(df, "token", k=5, capacity=1).collect()
    assert got == _exact(df, 5)
