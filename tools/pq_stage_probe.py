#!/usr/bin/env python
"""Per-phase wall breakdown of the inline-training PQ queries (r16 opt):
materialize each phase boundary with the noop sink so the optimization
targets the phase that actually costs (guide §1).  Also counts Spark
jobs per phase — at sf0.1 the corpus is tiny, so sequential-job count,
not bytes, is the first suspect.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tweets_spark_top_10_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="pq-probe",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from tweets_spark_top_10_spark.functions.cachectl import persist_tracked
    from tweets_spark_top_10_spark.functions.pq import (
        apply_permutation,
        opq_permutation,
        pq_adc_rerank_topk,
        pq_codebook,
        pq_codebook_refine,
    )
    from tweets_spark_top_10_spark.queries import QUERIES
    from tweets_spark_top_10_spark.queries.similarity_queries import _normed
    from tweets_spark_top_10_spark.sources.registry import load_table

    def jobs() -> int:
        ids = sc.statusTracker().getJobIdsForGroup(None)
        return max(ids) if ids else 0

    def t(label, df):
        j0, t0 = jobs(), time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        print(
            f"{time.perf_counter() - t0:8.3f}  jobs+{jobs() - j0:<3d} {label}",
            flush=True,
        )

    load_table(spark, sf_dir, "embeddings").write.format("noop").mode(
        "overwrite"
    ).save()

    for rnd in range(2):
        print(f"== round {rnd}", flush=True)
        emb = load_table(spark, sf_dir, "embeddings")
        q0 = _normed(emb, "query_id", 0, 10)
        c0 = _normed(emb, "neighbor_id", 10, None)
        t("c0 normed scan", c0)
        perm = opq_permutation(c0).localCheckpoint(eager=False)
        t("perm (variance+snake)", perm)
        queries = apply_permutation(q0, "query_id", perm)
        t("queries permuted", queries)
        cands = (
            apply_permutation(c0, "neighbor_id", perm)
            .repartition(sc.defaultParallelism, "neighbor_id")
            .transform(persist_tracked)
        )
        t("cands permuted+persist", cands)
        seed = pq_codebook(cands)
        t("seed codebook", seed)
        refined = pq_codebook_refine(cands, seed).localCheckpoint(eager=False)
        t("refined codebook (1 Lloyd)", refined)
        out = pq_adc_rerank_topk(
            queries,
            cands,
            k=5,
            shortlist=32,
            codebook=refined,
            rerank_queries=q0,
            rerank_candidates=c0,
        )
        t("ADC shortlist + rerank (cum)", out)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.range(1).count()
        fn = QUERIES["pq_adc_opq_rerank_top5"]
        j0, t0 = jobs(), time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(
            f"{time.perf_counter() - t0:8.3f}  jobs+{jobs() - j0:<3d} FULL "
            f"pq_adc_opq_rerank_top5",
            flush=True,
        )
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.range(1).count()


if __name__ == "__main__":
    main()
