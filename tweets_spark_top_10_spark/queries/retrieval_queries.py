"""Retrieval-serving operators: late-interaction (MaxSim) scoring and
reciprocal-rank-fusion hybrid search (round 16 — the last catalog
slots, spent on the two retrieval primitives a production RAG /
training-data stack runs that nothing in the catalog gated yet).

- **MaxSim** (ColBERT-style late interaction): a query is a SET of
  vectors, a candidate is a SET of vectors, and the score is
  sum over query vectors of the max cosine against the candidate's
  vectors.  Fundamentally different from single-vector kNN: the
  interaction is per-token and the aggregate is max-then-sum, which no
  single pooled vector reproduces.
- **RRF hybrid search**: fuse a lexical ranking (token-set Jaccard)
  with a vector ranking (cosine) as sum of 1/(60 + rank) — the
  standard hybrid-retrieval combiner (Cormack/Clarke/Buettcher'09),
  robust to incomparable score scales because it consumes RANKS.

Scale shapes: the catalog queries score candidates EXACTLY (bounded
fixture), which is also the production RERANK stage — at 100 TB both
operators run behind a candidate generator (IVF cells / LSH bands /
inverted-index top-m), so the cross-join side is a bounded shortlist
per query, broadcast like ``brute_force_knn``'s query side.  Both
aggregates (max-then-sum; intersection counts) are map-side
combinable; ranks are per-query windows over narrow rows, never a
global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tweets_spark_top_10_spark.functions.spread import spread_scan
from tweets_spark_top_10_spark.queries.registry import register
from tweets_spark_top_10_spark.sources.registry import load_table

_DVEC = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


@register(
    "maxsim_label_top3",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, {_DVEC} AS v FROM embeddings
    ), q AS (
      SELECT label AS q_label, vec_id AS q_vec, v FROM e WHERE vec_id < 50
    ), c AS (
      SELECT label AS cand_label, v FROM e WHERE vec_id >= 50
    ), s AS (
      SELECT q.q_label, q.q_vec, c.cand_label,
             ROUND(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(c.v, c.v))), 6) AS cos_sim
      FROM q CROSS JOIN c
    ), m AS (
      SELECT q_label, q_vec, cand_label,
             CAST(ROUND(MAX(cos_sim) * 1000000) AS BIGINT) AS mxi
      FROM s GROUP BY 1, 2, 3
    ), sc AS (
      SELECT q_label, cand_label,
             CASE WHEN SUM(mxi) >= 0
                  THEN FLOOR((CAST(SUM(mxi) AS DOUBLE) + 50) / 100)
                  ELSE -FLOOR((-CAST(SUM(mxi) AS DOUBLE) + 50) / 100)
             END / 10000.0 AS maxsim
      FROM m GROUP BY 1, 2
    )
    SELECT q_label, cand_label, maxsim, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY q_label ORDER BY maxsim DESC, cand_label ASC
      ) AS BIGINT) AS rank
      FROM sc
    ) WHERE rank <= 3
    """,
)
def maxsim_label_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction retrieval: each label's vectors with
    ``vec_id < 50`` form that label's multi-vector QUERY set; vectors
    ``>= 50`` grouped by label are the candidate "documents".  Score =
    MaxSim (per query vector, max cosine within the candidate group;
    summed over the query group), top-3 candidate labels per query
    label.  Max of ROUNDED cosines is order-independent; the sum is
    rounded to 4 digits before ranking so the (score, label) tie-break
    is engine-independent.  Plan: one broadcast cross join over the
    bounded query set -> two map-side-combinable aggs -> per-query
    window; at scale the candidate group set comes from a
    coarse retriever and this is the rerank stage."""
    emb = load_table(spark, sf_dir, "embeddings")
    from tweets_spark_top_10_spark.functions.similarity import dot, l2_norm

    # The MaxSim sum runs in exact integer MICRO-UNITS: the 6-digit-
    # rounded cosines are exact multiples of 1e-6, so SUM over their
    # scaled integers is order-independent, and the 4-digit rounding
    # happens in integer arithmetic (half away from zero — the ROUND
    # semantics of both engines).  ROUND(SUM(double), 4) was NOT
    # order-independent: symmetric cosine sums land exactly on 4-digit
    # halves (observed 1.68855 at sf0.01), where add-order noise —
    # which varies per partial-aggregation schedule — decided the
    # rounding direction (r16 inherited-state fix: the query was
    # nondeterministic run-to-run, not just cross-engine).
    q = emb.filter(F.col("vec_id") < 50).select(
        F.col("label").alias("q_label"),
        F.col("vec_id").alias("q_vec"),
        F.col("embedding").alias("__qv"),
        l2_norm(F.col("embedding")).alias("__qn"),
    )
    # spread_scan (r16): the broadcast cross join scores where the
    # candidate side lives — otherwise the fixture's single scan split;
    # no-op at cluster scale.
    c = spread_scan(
        emb.filter(F.col("vec_id") >= 50).select(
            F.col("label").alias("cand_label"),
            F.col("embedding").alias("__cv"),
            l2_norm(F.col("embedding")).alias("__cn"),
        )
    )
    cos = F.round(
        dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")), 6
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "q_label", "q_vec", "cand_label", cos.alias("cos_sim")
    )
    per_qvec = scored.groupBy("q_label", "q_vec", "cand_label").agg(
        F.round(F.max("cos_sim") * 1000000).cast("long").alias("mxi")
    )
    s_sum = F.sum("mxi").cast("double")
    half_away = F.when(s_sum >= 0, F.floor((s_sum + 50) / 100)).otherwise(
        -F.floor((-s_sum + 50) / 100)
    )
    sc = per_qvec.groupBy("q_label", "cand_label").agg(
        (half_away / 10000.0).alias("maxsim")
    )
    w = Window.partitionBy("q_label").orderBy(
        F.desc("maxsim"), F.asc("cand_label")
    )
    return (
        sc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
    )


@register(
    "hybrid_rrf_top5",
    oracle=f"""
    WITH qd AS (
      SELECT doc_id AS query_id,
             list_distinct(list_filter(
               regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS qt
      FROM documents WHERE doc_id < 5
    ), cd AS (
      SELECT doc_id AS cand_id,
             list_distinct(list_filter(
               regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS ct
      FROM documents WHERE doc_id >= 10
    ), lex AS (
      SELECT q.query_id, c.cand_id,
             ROUND(CAST(len(list_intersect(q.qt, c.ct)) AS DOUBLE)
               / (len(q.qt) + len(c.ct) - len(list_intersect(q.qt, c.ct))),
               6) AS jac
      FROM qd q CROSS JOIN cd c
    ), lrank AS (
      SELECT query_id, cand_id, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY jac DESC, cand_id ASC
      ) AS BIGINT) AS r_lex
      FROM lex
    ), qe AS (
      SELECT vec_id AS query_id, {_DVEC} AS v FROM embeddings WHERE vec_id < 5
    ), ce AS (
      SELECT vec_id AS cand_id, {_DVEC} AS v FROM embeddings WHERE vec_id >= 10
    ), vrank AS (
      SELECT query_id, cand_id, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, cand_id ASC
      ) AS BIGINT) AS r_vec
      FROM (
        SELECT q.query_id, c.cand_id,
               ROUND(list_dot_product(q.v, c.v)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(c.v, c.v))), 6) AS cos_sim
        FROM qe q CROSS JOIN ce c
      )
    ), fused AS (
      SELECT l.query_id, l.cand_id,
             ROUND(1.0 / (60 + l.r_lex) + 1.0 / (60 + v.r_vec), 6) AS rrf,
             l.r_lex, v.r_vec
      FROM lrank l JOIN vrank v USING (query_id, cand_id)
    )
    SELECT query_id, cand_id, rrf, r_lex, r_vec, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY rrf DESC, cand_id ASC
      ) AS BIGINT) AS rank
      FROM fused
    ) WHERE rank <= 5
    """,
)
def hybrid_rrf_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: queries = docs 0-4 (text AND embedding, the
    tables share ids); candidates = ids >= 10.  Lexical ranking by
    distinct-token Jaccard, vector ranking by cosine, fused by
    reciprocal rank (k=60, the standard constant) — both rankings run
    over the FULL candidate set so every candidate carries both ranks,
    and only ranks cross modalities (score scales never mix).  Plan:
    the lexical intersection is a broadcast token join + one
    map-side-combinable count (never a text cross join); vector ranks
    are ``brute_force_knn``'s shape unlimited; fusion is one narrow
    equi-join + a per-query window.  At 100 TB each modality feeds its
    own top-m shortlist into the fusion instead of full rankings —
    same operator, bounded input."""
    from tweets_spark_top_10_spark.functions.similarity import dot, l2_norm
    from tweets_spark_top_10_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    # spread_scan (r16): the distinct-token explode feeding both
    # modalities otherwise runs in the single scan split; no-op at
    # cluster scale.
    toks = spread_scan(docs).select(
        "doc_id", F.explode(F.array_distinct(tokenize(F.col("text")))).alias("tok")
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    q_toks = toks.filter(F.col("doc_id") < 5).withColumnRenamed(
        "doc_id", "query_id"
    )
    c_toks = toks.filter(F.col("doc_id") >= 10).withColumnRenamed(
        "doc_id", "cand_id"
    )
    inter = (
        c_toks.join(F.broadcast(q_toks), "tok")
        .groupBy("query_id", "cand_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # every (query, candidate) pair needs a lexical rank, including
    # zero-overlap pairs — build the full bounded grid and left-join
    grid = (
        docs.filter(F.col("doc_id") >= 10)
        .select(F.col("doc_id").alias("cand_id"))
        .crossJoin(
            F.broadcast(
                docs.filter(F.col("doc_id") < 5).select(
                    F.col("doc_id").alias("query_id")
                )
            )
        )
    )
    lex = (
        grid.join(inter, ["query_id", "cand_id"], "left")
        .join(
            F.broadcast(sizes.withColumnRenamed("doc_id", "query_id")).withColumnRenamed("n_tok", "nq"),
            "query_id",
        )
        .join(sizes.withColumnRenamed("doc_id", "cand_id").withColumnRenamed("n_tok", "nc"), "cand_id")
        .select(
            "query_id",
            "cand_id",
            F.round(
                F.coalesce(F.col("inter"), F.lit(0)).cast("double")
                / (F.col("nq") + F.col("nc") - F.coalesce(F.col("inter"), F.lit(0))),
                6,
            ).alias("jac"),
        )
    )
    wl = Window.partitionBy("query_id").orderBy(F.desc("jac"), F.asc("cand_id"))
    lrank = lex.select(
        "query_id", "cand_id", F.row_number().over(wl).cast("long").alias("r_lex")
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qe = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        l2_norm(F.col("embedding")).alias("__qn"),
    )
    ce = spread_scan(emb.filter(F.col("vec_id") >= 10)).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("__cv"),
        l2_norm(F.col("embedding")).alias("__cn"),
    )
    cos = F.round(
        dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")), 6
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    vrank = (
        ce.crossJoin(F.broadcast(qe))
        .select("query_id", "cand_id", cos.alias("cos_sim"))
        .select(
            "query_id",
            "cand_id",
            F.row_number().over(wv).cast("long").alias("r_vec"),
        )
    )

    fused = lrank.join(vrank, ["query_id", "cand_id"]).select(
        "query_id",
        "cand_id",
        F.round(
            1.0 / (F.lit(60) + F.col("r_lex")) + 1.0 / (F.lit(60) + F.col("r_vec")),
            6,
        ).alias("rrf"),
        "r_lex",
        "r_vec",
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("cand_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("rank") <= 5)
    )
