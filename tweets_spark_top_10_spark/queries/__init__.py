"""Query catalog: every engine capability as a (Spark builder, oracle SQL) pair.

The driver's correctness gate runs each ``queries()`` entry on Spark and
its ``oracle_sql()`` twin on DuckDB over the same parquet and compares
row count + schema + order-insensitive value hash. Column names are
aligned by explicit aliases on BOTH sides.
"""

from tweets_spark_top_10_spark.queries.catalog import ORACLE, QUERIES

__all__ = ["ORACLE", "QUERIES"]
