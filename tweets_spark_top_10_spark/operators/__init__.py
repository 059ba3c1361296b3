"""Relational operators: thin, typed, scale-annotated DataFrame builders.

Each helper builds a lazy DataFrame plan — Catalyst optimizes, Tungsten
executes. Nothing here collects to the driver.
"""

from tweets_spark_top_10_spark.operators.explode_count import explode_count
from tweets_spark_top_10_spark.operators.topk import top_k, top_k_per_group
from tweets_spark_top_10_spark.operators.joins import broadcast_join, join

__all__ = [
    "explode_count",
    "top_k",
    "top_k_per_group",
    "broadcast_join",
    "join",
]
