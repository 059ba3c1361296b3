"""Catalog entries defined THROUGH the metrics layer.

Both the Spark builder and the oracle SQL below come out of ONE
``compile_metrics`` call — the pair cannot drift (see
``functions/metrics.py``).  The oracle gate then checks the compiler
itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tweets_spark_top_10_spark.functions.metrics import (
    Ratio,
    compile_metrics,
    m_avg,
    m_count,
    m_count_distinct,
    m_max,
    m_min,
    m_sum,
)
from tweets_spark_top_10_spark.queries.registry import register

_order_builder, _order_sql = compile_metrics(
    table="orders",
    dims=["o_orderpriority", "o_orderstatus"],
    metrics=[
        m_count(),
        m_sum("o_totalprice", "revenue", digits=2),
        m_avg("o_totalprice", "avg_price", digits=4),
        m_count_distinct("o_custkey", "nd_customers"),
    ],
    derived=[Ratio("orders_per_customer", "n", "nd_customers", digits=6)],
)

register("metrics_order_summary", oracle=_order_sql)(_order_builder)


_event_builder, _event_sql = compile_metrics(
    table="events",
    dims=["event_type"],
    metrics=[
        m_count(),
        m_sum("value", "total_value", digits=4),
        m_min("value", "min_value"),
        m_max("value", "max_value"),
        m_count_distinct("user_id", "nd_users"),
    ],
    derived=[Ratio("value_per_user", "total_value", "nd_users", digits=6)],
    where=(lambda: F.col("value") > 0, "value > 0"),
)

register("metrics_event_by_type", oracle=_event_sql)(_event_builder)
