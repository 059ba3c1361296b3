"""Metrics-layer compiler: spec validation (the runtime behavior is
oracle-gated via metrics_order_summary / metrics_event_by_type — one
compile emits both the Spark plan and the SQL the gate compares)."""

from __future__ import annotations

import pytest

from tweets_spark_top_10_spark.functions.metrics import (
    Ratio,
    compile_metrics,
    m_count,
    m_sum,
)


def test_compile_rejects_bad_specs():
    with pytest.raises(ValueError, match="unique"):
        compile_metrics("orders", ["g"], [m_count("x"), m_sum("v", "x")])
    with pytest.raises(ValueError, match="disjoint"):
        compile_metrics("orders", ["n"], [m_count("n")])
    with pytest.raises(ValueError, match="undeclared"):
        compile_metrics(
            "orders", ["g"], [m_count()], derived=[Ratio("r", "n", "ghost")]
        )


def test_compiled_sql_shape():
    _, sql = compile_metrics(
        "orders",
        ["o_orderstatus"],
        [m_count(), m_sum("o_totalprice", "rev", digits=2)],
        derived=[Ratio("rev_per_order", "rev", "n", digits=6)],
        where=(lambda: None, "o_totalprice > 0"),
    )
    assert "GROUP BY o_orderstatus" in sql
    assert "WHERE o_totalprice > 0" in sql
    assert "ROUND(SUM(o_totalprice), 2) AS rev" in sql
    assert "ROUND(CAST(rev AS DOUBLE) / n, 6) AS rev_per_order" in sql
