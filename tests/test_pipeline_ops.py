"""Training-pipeline ops: normalization, PII scrub, stratified sampling,
canonical-keep dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from tweets_spark_top_10_spark.functions.sampling import (
    hash_bucket,
    stratified_hash_sample,
)
from tweets_spark_top_10_spark.functions.text import (
    PII_PATTERNS,
    normalize_text,
    pii_count,
    redact_pii,
)
from tweets_spark_top_10_spark.sources.registry import load_table


def test_normalize_text_rules_and_idempotence(spark):
    df = spark.createDataFrame(
        [
            (1, "\t Hello\x07WORLD  \r\n mixed   CASE \x1f"),
            (2, "already clean text"),
            (3, ""),
        ],
        "id: long, text: string",
    )
    got = {r.id: r.n for r in df.select("id", normalize_text("text").alias("n")).collect()}
    assert got[1] == "hello world mixed case"
    assert got[2] == "already clean text"
    assert got[3] == ""
    # idempotent: normalizing normalized text is the identity
    twice = {
        r.id: r.n
        for r in df.select(
            "id", normalize_text(normalize_text("text")).alias("n")
        ).collect()
    }
    assert twice == got


def test_redact_pii_scrubs_every_pattern(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-1.org call 555-123-4567 ssn 123-45-6789 ip 10.0.0.1"),
            (2, "no pii here, just 12345 and v1.2"),
        ],
        "id: long, text: string",
    )
    rows = {
        r.id: (r.clean, r.n)
        for r in df.select(
            "id",
            redact_pii("text").alias("clean"),
            pii_count("text").alias("n"),
        ).collect()
    }
    assert rows[1][0] == "mail <EMAIL> call <PHONE> ssn <SSN> ip <IP>"
    assert rows[1][1] == 4
    assert rows[2] == ("no pii here, just 12345 and v1.2", 0)
    # Overlap: a phone-shaped local part inside an email is ONE literal —
    # the email rule consumes it and the sequential count must agree
    # with the number of replacements actually performed.
    overlap = spark.createDataFrame(
        [(1, "reach 555-123-4567@relay.example.com now")],
        "id: long, text: string",
    ).select(redact_pii("text").alias("clean"), pii_count("text").alias("n"))
    row = overlap.collect()[0]
    assert row.clean == "reach <EMAIL> now"
    assert row.n == 1
    # nothing a second pass would still match
    leftover = (
        df.select(redact_pii("text").alias("clean"))
        .select(pii_count("clean").alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert leftover == 0
    assert len(PII_PATTERNS) == 4


def test_stratified_sample_deterministic_and_rate_shaped(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rates = {"en": 0.1, "zh": 1.0}
    picked = stratified_hash_sample(docs, "lang", rates, "doc_id", default_rate=0.5)
    counts = {
        r.lang: (r.n, r.total)
        for r in picked.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(
            docs.groupBy("lang").agg(F.count(F.lit(1)).alias("total")), "lang"
        )
        .collect()
    }
    n_zh, total_zh = counts["zh"]
    assert n_zh == total_zh, "rate-1.0 stratum must keep every row"
    n_en, total_en = counts["en"]
    assert 0 < n_en < 0.25 * total_en, f"en rate 0.1 off: {n_en}/{total_en}"
    # partitioning-independent: same sample after an arbitrary repartition
    again = {
        r.doc_id
        for r in stratified_hash_sample(
            docs.repartition(7, "lang"), "lang", rates, "doc_id", 0.5
        ).select("doc_id").collect()
    }
    assert again == {r.doc_id for r in picked.select("doc_id").collect()}


def test_hash_bucket_uniform_enough(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    buckets = orders.select(hash_bucket("o_orderkey", 10).alias("b"))
    dist = {r.b: r.n for r in buckets.groupBy("b").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(dist.values())
    assert set(dist) == set(range(10))
    for b, n in dist.items():
        assert 0.05 < n / total < 0.2, f"bucket {b} skewed: {n}/{total}"


def test_dedup_canonical_is_consistent_with_components(spark, sf_dir):
    """Every non-canonical doc points at a canonical doc; canonical ids
    are minimal in their cluster (component = min reachable id)."""
    from tweets_spark_top_10_spark.queries import QUERIES

    rows = QUERIES["dedup_canonical_docs"](spark, sf_dir).collect()
    canon = {r.doc_id for r in rows if r.is_canonical}
    for r in rows:
        assert r.canonical_id <= r.doc_id
        assert r.canonical_id in canon
        assert r.is_canonical == (r.canonical_id == r.doc_id)


def test_hll_sketch_blobs_survive_parquet_roundtrip(spark, sf_dir, tmp_path):
    """Mergeability ACROSS RUNS: HLL sketch blobs written to parquet in
    one job and re-unioned in another must estimate the same global
    cardinality — the property that lets each hour sketch once and any
    later job merge the <=4 KB blobs without rescanning."""
    from pyspark.sql import functions as F

    from tweets_spark_top_10_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
    direct = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias("est")
    ).collect()[0]["est"]
    path = str(tmp_path / "sketches")
    sk.write.parquet(path)
    replayed = (
        spark.read.parquet(path)
        .agg(F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias("est"))
        .collect()[0]["est"]
    )
    assert replayed == direct
    exact = ev.agg(F.count_distinct("user_id")).collect()[0][0]
    assert abs(replayed - exact) <= 0.05 * exact


def test_weighted_hash_sample_properties(spark):
    """E-S weighted sampling: partitioning-invariant and deterministic,
    k>=n degenerates to 'all positive-weight rows', zero/NULL weights
    never sampled, and across many salts heavy rows are included ~in
    proportion to weight (statistical, wide margin)."""
    from tweets_spark_top_10_spark.functions.sampling import (
        weighted_hash_sample,
    )

    rows = [(f"h{i}", 50.0) for i in range(10)]
    rows += [(f"l{i}", 1.0) for i in range(190)]
    rows += [("zero", 0.0), ("neg", -3.0), ("nullw", None)]
    df = spark.createDataFrame(rows, "k string, w double")

    s1 = sorted(r["k"] for r in weighted_hash_sample(df, "k", "w", 40).collect())
    s2 = sorted(
        r["k"]
        for r in weighted_hash_sample(df.repartition(13), "k", "w", 40).collect()
    )
    assert s1 == s2 and len(s1) == 40
    assert not {"zero", "neg", "nullw"} & set(s1)

    allr = weighted_hash_sample(df, "k", "w", 10_000).collect()
    assert len(allr) == 200  # every positive-weight row, nothing else

    heavy_hits = light_hits = 0
    for i in range(20):
        s = {r["k"] for r in weighted_hash_sample(df, "k", "w", 40, salt=f"s{i}").collect()}
        heavy_hits += sum(1 for x in s if x.startswith("h"))
        light_hits += sum(1 for x in s if x.startswith("l"))
    # heavy rows are 50x weight but only 10/200 of rows; with k=40 they
    # should be included nearly always (inclusion prob -> ~1), far
    # above the light rows' rate
    assert heavy_hits / (20 * 10) > 0.8
    assert light_hits / (20 * 190) < 0.25


def test_doc_token_id_arrays_match_surrogate(spark, sf_dir):
    """The raw array<long> vocabulary encoding must agree with the
    registered md5-surrogate query row-for-row: re-hashing each array
    the same way reproduces token_ids_md5 and n_tok exactly (the array
    path stays correct even though the driver gate sees only the
    surrogate)."""
    from tweets_spark_top_10_spark.queries.catalog import QUERIES
    from tweets_spark_top_10_spark.queries.text_queries import (
        doc_token_id_arrays,
    )

    arrays = {
        r["doc_id"]: (list(r["token_ids"]), r["n_oov"])
        for r in doc_token_id_arrays(spark, sf_dir).collect()
    }
    surrogate = QUERIES["doc_token_ids"](spark, sf_dir).collect()
    assert len(surrogate) == len(arrays) > 0
    import hashlib

    for row in surrogate:
        ids, n_oov = arrays[row["doc_id"]]
        md5 = hashlib.md5(" ".join(map(str, ids)).encode()).hexdigest()
        assert row["token_ids_md5"] == md5
        assert row["n_tok"] == len(ids)
        assert row["n_oov"] == n_oov
