#!/usr/bin/env python
"""Per-stage wall breakdown of ``training_pipeline_docs`` (r16 opt):
materialize each stage boundary with the noop sink and time the
increments, so the optimization targets the stage that actually costs,
not the one that looks expensive (guide §1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tweets_spark_top_10_spark.session import get_spark  # noqa: E402


def t(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{time.perf_counter() - t0:8.3f}  {label}", flush=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="pipeline-probe",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from tweets_spark_top_10_spark.functions.dedup import (
        connected_components,
        exact_dedup,
        ngram_jaccard_pairs,
        shingle_table,
    )
    from tweets_spark_top_10_spark.functions.text import (
        language_id,
        quality_score,
        tokenize,
    )
    from tweets_spark_top_10_spark.queries import QUERIES
    from tweets_spark_top_10_spark.sources.registry import load_table

    # warm
    load_table(spark, sf_dir, "documents").write.format("noop").mode(
        "overwrite"
    ).save()

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    is_eval = F.col("doc_id") % 50 == 0

    lang_ok = docs.select(
        "doc_id",
        "text",
        language_id(toks).alias("lang_pred"),
        quality_score(F.col("text"), toks).alias("quality"),
        F.size(toks).cast("long").alias("n_tokens"),
    ).filter((F.col("lang_pred") == "en") & ~is_eval)
    t("stage1 lang_ok (score+gate)", lang_ok)

    ev_shingles = (
        shingle_table(docs.filter(is_eval), "text", "doc_id", 3)
        .select("shingle")
        .distinct()
    )
    t("stage2a eval shingles", ev_shingles)

    contaminated = (
        shingle_table(lang_ok, "text", "doc_id", 3)
        .join(F.broadcast(ev_shingles), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 5)
        .select("doc_id")
    )
    t("stage2b contamination (cum)", contaminated)

    clean = lang_ok.join(contaminated, "doc_id", "left_anti").persist()
    t("stage2c clean persist (cum)", clean)

    keepers = exact_dedup(clean, "text", "doc_id").select("doc_id")
    kd = clean.join(keepers, "doc_id").persist()
    t("stage3 kd persist (incr)", kd)

    pairs = ngram_jaccard_pairs(
        kd, "text", "doc_id", n=3, threshold=0.5, max_shingle_df=100
    )
    t("stage4a jaccard pairs (incr)", pairs)

    comp = connected_components(pairs).withColumnRenamed("node", "doc_id")
    t("stage4b CC (incr, re-runs pairs via checkpoint)", comp)

    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()

    # full query, clean slate, twice
    fn = QUERIES["training_pipeline_docs"]
    for i in range(2):
        t(f"FULL training_pipeline_docs pass{i + 1}", fn(spark, sf_dir))
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.range(1).count()


if __name__ == "__main__":
    main()
