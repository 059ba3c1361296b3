"""Python-execution surface: pandas grouped-map, pandas grouped-agg
(UDAF), Python UDTF, and the skew-salting pattern.

Each query exists to put one Python-boundary (or skew) mechanism under
the oracle gate; the JVM-side twin queries elsewhere in the catalog are
the fast path.  Scale notes:

- pandas paths move Arrow batches — fine when the *per-group* data fits
  an executor (grouped-map materializes one group per call).
- The UDTF runs row-at-a-time per input row but yields many rows;
  at scale prefer ``explode(split(...))`` (JVM) — the UDTF form is for
  logic Catalyst can't express.
- Salting splits a hot grouping key across ``n_salt`` partial groups,
  then re-aggregates: identical result, bounded per-task state.  AQE
  handles skewed *joins*; skewed *aggregations* still need this.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tweets_spark_top_10_spark.functions.text import tokenize
from tweets_spark_top_10_spark.queries.registry import register
from tweets_spark_top_10_spark.sources.registry import load_table


@register(
    "salted_token_count_top20",
    oracle=r"""
    SELECT token, COUNT(*) AS n FROM (
      SELECT unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents
    ) t
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 20
    """,
)
def salted_token_count_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation of a skewed key (hot tokens).

    Phase 1 groups by (token, salt) — the hot key's rows spread over 16
    partial groups; phase 2 sums partials by token.  Result is identical
    to the direct groupBy (the oracle IS the direct form); the plan
    bounds any single task's state at ~1/16 of the hot key.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokenize(F.col("text"))).alias("token"))
    salted = toks.withColumn(
        "salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(16))
    )
    partial = salted.groupBy("token", "salt").agg(F.count(F.lit(1)).alias("pn"))
    return (
        partial.groupBy("token")
        .agg(F.sum("pn").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


@register(
    "label_centroids_pandas",
    oracle="""
    WITH expanded AS (
      SELECT label,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS val,
             unnest(range(0, len(embedding))) AS pos
      FROM embeddings
    )
    SELECT label, CAST(pos AS BIGINT) AS pos, ROUND(AVG(val), 6) AS avg_val
    FROM expanded
    GROUP BY label, pos
    """,
)
def label_centroids_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid via ``applyInPandas`` grouped-map (numpy mean
    over the whole group's matrix) — same oracle as the JVM-side
    ``label_centroids``, proving the Arrow grouped-map path end-to-end."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")

    from tweets_spark_top_10_spark.functions.numeric import round_half_up_array

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        # HALF_UP to match the oracle's ROUND (np.round is half-even)
        mean = round_half_up_array(mat.mean(axis=0), 6)
        return pd.DataFrame(
            {
                "label": pdf["label"].iloc[0],
                "pos": np.arange(mat.shape[1], dtype=np.int64),
                "avg_val": mean,
            }
        )

    return emb.groupBy("label").applyInPandas(
        centroid, schema="label int, pos long, avg_val double"
    )


@register(
    "event_value_udaf",
    oracle="""
    SELECT event_type,
           ROUND(AVG(value), 6) AS mean_value,
           ROUND(STDDEV_SAMP(value), 6) AS sd_value
    FROM events
    GROUP BY event_type
    """,
)
def event_value_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas grouped-agg UDAF (vectorized UDAF surface): per-type mean
    and sample stddev computed in pandas, matching the SQL aggregates."""

    @F.pandas_udf("double")
    def mean_udaf(v: pd.Series) -> float:
        return float(v.mean())

    @F.pandas_udf("double")
    def sd_udaf(v: pd.Series) -> float:
        return float(v.std(ddof=1))

    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(mean_udaf("value"), 6).alias("mean_value"),
        F.round(sd_udaf("value"), 6).alias("sd_value"),
    )


@register(
    "doc_sentences_udtf",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, '. '), s -> s <> ''))
                AS BIGINT) AS n_sentences
    FROM documents
    WHERE text IS NOT NULL
      AND len(list_filter(string_split(text, '. '), s -> s <> '')) > 0
    """,
)
def doc_sentences_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): one row per sentence, then
    re-aggregated to per-doc counts the oracle can recompute
    arithmetically.  The UDTF is the escape hatch for one-to-many logic
    Catalyst can't express; for plain splitting, explode(split()) is
    the fast path."""

    @F.udtf(returnType="doc_id bigint, sentence_no int, sentence string")
    class SentenceSplit:
        def eval(self, doc_id: int, text: str) -> Iterator[tuple]:
            if text is None:
                return
            no = 0
            for raw in text.split(". "):
                if raw:
                    yield doc_id, no, raw
                    no += 1

    # Arrow-batched UDTF transfer (runtime-settable; the session factory
    # sets it too, but the driver's own session may not have it).
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    docs = load_table(spark, sf_dir, "documents")
    # lateral-join the UDTF output per document row
    docs.createOrReplaceTempView("__docs_udtf_in")
    spark.udtf.register("sentence_split", SentenceSplit)
    out = spark.sql(
        """
        SELECT s.doc_id, s.sentence_no, s.sentence
        FROM __docs_udtf_in d,
             LATERAL sentence_split(d.doc_id, d.text) s
        """
    )
    return out.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_sentences"))


@register(
    "grouped_heavy_hitters",
    oracle=r"""
    SELECT lang, token, n FROM (
      SELECT lang, token, n,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY n DESC, token ASC
             ) AS rn
      FROM (
        SELECT lang, token, COUNT(*) AS n FROM (
          SELECT lang,
                 unnest(regexp_split_to_array(text, '\s+')) AS token
          FROM documents
        ) t
        WHERE token <> ''
        GROUP BY lang, token
      ) c
    ) r
    WHERE rn <= 3
    """,
)
def grouped_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-3 tokens PER LANGUAGE without a full-cardinality
    shuffle — the grouped form of ``heavy_hitters_top10``.

    One pass builds per-(partition, language) Misra-Gries sketches;
    certification (is the candidate set provably a superset of the
    group's top-3?) is decided per group inside the plan — no driver
    collect — and only uncertified groups degrade to the exhaustive
    count.  Oracle = the exhaustive grouped count + row_number, which
    the two-pass result must match bit-for-bit
    (``functions/heavy_hitters.py:grouped_exact_top_k``).
    """
    from tweets_spark_top_10_spark.functions.heavy_hitters import (
        grouped_exact_top_k,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(tokenize(F.col("text"))).alias("token")
    )
    return grouped_exact_top_k(toks, "lang", "token", k=3, capacity=512)


@register(
    "heavy_hitters_top10",
    oracle=r"""
    SELECT token, COUNT(*) AS n FROM (
      SELECT unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents
    ) t
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 10
    """,
)
def heavy_hitters_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 tokens WITHOUT a full-cardinality shuffle: the 100 TB
    shape of the reference's flagship query (``App.java:97-99``).

    Per-partition Misra-Gries sketches (one data pass, KB-size output)
    produce a provable superset of the top-10; a second pass re-counts
    only those candidates exactly (broadcast semi-join, map-side
    combine).  The oracle is the exhaustive groupBy-count top-10 — the
    two-pass result is bit-identical by the Misra-Gries merge bound
    (see ``functions/heavy_hitters.py``).
    """
    from tweets_spark_top_10_spark.functions.heavy_hitters import (
        exact_top_k_two_pass,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokenize(F.col("text"))).alias("token"))
    return exact_top_k_two_pass(toks, "token", k=10, capacity=512)


@register(
    "hourly_heavy_hitters",
    oracle=r"""
    SELECT hour, token, n FROM (
      SELECT hour, token, n,
             ROW_NUMBER() OVER (
               PARTITION BY hour ORDER BY n DESC, token ASC
             ) AS rn
      FROM (
        SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
               event_type AS token, COUNT(*) AS n
        FROM events GROUP BY 1, 2
      ) c
    ) r
    WHERE rn <= 3
    """,
)
def hourly_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINDOWED heavy hitters: exact top-3 event types per hour via the
    same per-group MG certification as ``grouped_heavy_hitters`` — the
    group key is simply the time bucket, so "top-K per window without
    a full-cardinality shuffle" is the grouped operator applied to a
    derived column, not new machinery.  (With event-type cardinality
    this low every group certifies trivially; the oracle check is
    about the plumbing: bucket-derived groups, string-cast stability.)
    """
    from tweets_spark_top_10_spark.functions.heavy_hitters import (
        grouped_exact_top_k,
    )

    events = load_table(spark, sf_dir, "events")
    toks = events.select(
        F.date_trunc("hour", "ts").cast("string").alias("hour"),
        F.col("event_type").alias("token"),
    )
    return grouped_exact_top_k(toks, "hour", "token", k=3, capacity=64)


@register(
    "embedding_arrow_norms",
    oracle="""
    SELECT vec_id,
           ROUND(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 5) AS l2
    FROM embeddings
    """,
)
def embedding_arrow_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the zero-copy record-batch surface below
    mapInPandas — the kernel receives pyarrow RecordBatches and does
    the math in numpy on the batch's buffers, skipping the
    pandas materialization entirely.  Right altitude for per-row
    vector math over wide array columns at 100 TB: Arrow batch in,
    Arrow batch out, no Python-object rows anywhere.  Same result as
    the JVM-side ``embedding_norms`` twin (different column name so
    both stay in the catalog)."""
    import pyarrow as pa

    def l2_batches(batches):
        import numpy as np

        from tweets_spark_top_10_spark.functions.numeric import (
            round_half_up_array,
        )

        for batch in batches:
            vec_col = batch.column(batch.schema.get_field_index("embedding"))
            ids = batch.column(batch.schema.get_field_index("vec_id"))
            # work on the list array's flat values buffer (zero-copy),
            # reshaping by the uniform embedding dimension
            flat = vec_col.combine_chunks() if hasattr(vec_col, "combine_chunks") else vec_col
            values = np.asarray(flat.flatten(), dtype=np.float64)
            n = len(vec_col)
            d = values.size // n
            if d * n != values.size:
                raise ValueError("ragged embedding lengths in batch")
            mat = values.reshape(n, d)
            # HALF_UP to match the oracle's ROUND (np.round is half-even)
            l2 = round_half_up_array(np.sqrt((mat * mat).sum(axis=1)), 5)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(l2, pa.float64())], names=["vec_id", "l2"]
            )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.mapInArrow(l2_batches, schema="vec_id long, l2 double")


@register(
    "label_centroids_arrow",
    oracle="""
    WITH expanded AS (
      SELECT label,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS val,
             unnest(range(0, len(embedding))) AS pos
      FROM embeddings
    )
    SELECT label, CAST(pos AS BIGINT) AS pos, ROUND(AVG(val), 6) AS avg_val
    FROM expanded
    GROUP BY label, pos
    """,
)
def label_centroids_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid via ``applyInArrow`` grouped-map — the
    pandas-free Arrow table surface (Spark 4): the group's embedding
    column arrives as an Arrow ListArray whose values buffer reshapes
    zero-copy into the (rows, dim) matrix, no pandas object boxing at
    all.  Same oracle as ``label_centroids`` / ``label_centroids_pandas``
    — three implementations of one contract, one value gate each."""
    import numpy as np
    import pyarrow as pa

    emb = load_table(spark, sf_dir, "embeddings")

    from tweets_spark_top_10_spark.functions.numeric import round_half_up_array

    def centroid(tbl: pa.Table) -> pa.Table:
        col = tbl.column("embedding").combine_chunks()
        flat = np.asarray(col.flatten(), dtype=np.float64)
        mat = flat.reshape(len(tbl), -1)
        # HALF_UP to match the oracle's ROUND (np.round is half-even)
        mean = round_half_up_array(mat.mean(axis=0), 6)
        dim = mat.shape[1]
        return pa.table(
            {
                "label": pa.array(
                    [tbl.column("label")[0].as_py()] * dim, pa.int32()
                ),
                "pos": pa.array(np.arange(dim, dtype=np.int64)),
                "avg_val": pa.array(mean),
            }
        )

    return emb.groupBy("label").applyInArrow(
        centroid, schema="label int, pos long, avg_val double"
    )


@register(
    "nation_balance_drift_ks",
    oracle="""
    WITH a AS (
      SELECT c_nationkey AS k, CAST(c_acctbal AS DOUBLE) AS x FROM customer
    ), b AS (
      SELECT s_nationkey AS k, CAST(s_acctbal AS DOUBLE) AS x FROM supplier
    ), sizes AS (
      SELECT k, na, nb FROM
        (SELECT k, COUNT(*) AS na FROM a GROUP BY k) ta
        JOIN (SELECT k, COUNT(*) AS nb FROM b GROUP BY k) tb USING (k)
    ), u AS (
      SELECT k, x, 1 AS ia, 0 AS ib FROM a
      UNION ALL
      SELECT k, x, 0, 1 FROM b
    ), c AS (
      SELECT u.k, u.x,
             SUM(ia) OVER (PARTITION BY u.k ORDER BY x) AS ca,
             SUM(ib) OVER (PARTITION BY u.k ORDER BY x) AS cb,
             s.na, s.nb
      FROM u JOIN sizes s ON s.k = u.k
    )
    SELECT k AS nationkey,
           CAST(MAX(na) AS BIGINT) AS n_cust,
           CAST(MAX(nb) AS BIGINT) AS n_supp,
           ROUND(MAX(ABS(ca * 1.0 / na - cb * 1.0 / nb)), 6) AS ks
    FROM c GROUP BY k
    """,
)
def nation_balance_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between customer and
    supplier balance distributions per nation — the keyed distribution-
    drift check a feature pipeline runs between snapshots, done through
    the COGROUP surface: ``customer.groupBy(nation) .cogroup(supplier
    .groupBy(nation)).applyInPandas`` hands both sides of each key to
    one Arrow-batched function (numpy searchsorted CDFs), no join
    materializing the union.

    The oracle replays KS relationally: tag each side, cumulative
    RANGE-framed counts over the ordered union (ties included — the
    default ORDER BY frame), max CDF gap.  Keys missing either side
    carry no statistic and are dropped on both engines."""
    import numpy as np

    from tweets_spark_top_10_spark.functions.numeric import round_half_up

    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    a = cust.select(
        F.col("c_nationkey").alias("k"), F.col("c_acctbal").cast("double").alias("x")
    )
    b = supp.select(
        F.col("s_nationkey").alias("k"), F.col("s_acctbal").cast("double").alias("x")
    )

    def ks(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame(
                {"nationkey": [], "n_cust": [], "n_supp": [], "ks": []}
            ).astype({"nationkey": "int64", "n_cust": "int64",
                      "n_supp": "int64", "ks": "float64"})
        xa = np.sort(left["x"].to_numpy(dtype="float64"))
        xb = np.sort(right["x"].to_numpy(dtype="float64"))
        support = np.union1d(xa, xb)
        ca = np.searchsorted(xa, support, side="right")
        cb = np.searchsorted(xb, support, side="right")
        gap = np.max(np.abs(ca * 1.0 / len(xa) - cb * 1.0 / len(xb)))
        return pd.DataFrame(
            {
                "nationkey": [int(left["k"].iloc[0])],
                "n_cust": [len(xa)],
                "n_supp": [len(xb)],
                # HALF_UP to match the oracle's ROUND (round() is half-even)
                "ks": [round_half_up(float(gap), 6)],
            }
        )

    return a.groupBy("k").cogroup(b.groupBy("k")).applyInPandas(
        ks, schema="nationkey long, n_cust long, n_supp long, ks double"
    )
