"""Column-level function library: text analysis, dedup, similarity.

All functions return lazy ``Column`` expressions built from
``pyspark.sql.functions`` (JVM-side, codegen-friendly) unless explicitly
documented as a Pandas-UDF path. Row-at-a-time Python UDFs are banned in
this package.
"""

from tweets_spark_top_10_spark.functions import dedup, similarity, text

__all__ = ["dedup", "similarity", "text"]
