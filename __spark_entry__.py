"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query (the reference's
explode→count→top-10, App.java:92-134, over tokenized document text).
``queries()`` / ``oracle_sql()`` expose the full catalog from
``tweets_spark_top_10_spark.queries`` — every implemented operator has a
Spark builder and (where ANSI-SQL-expressible) a DuckDB oracle twin with
identical column names.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from tweets_spark_top_10_spark.queries import QUERIES

    return QUERIES["ref_top10_tokens"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tweets_spark_top_10_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from tweets_spark_top_10_spark.queries import ORACLE

    return dict(ORACLE)
