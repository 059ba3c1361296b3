"""Declarative metrics layer: one spec → the Spark plan AND its SQL.

A semantic layer in the dbt/LookML sense, sized to this engine: a
metric is declared once as (name, aggregate) and queried by (dims,
metrics, filter).  The compiler emits BOTH artifacts from the single
spec — the DataFrame builder the engine executes and the ANSI SQL an
external warehouse (or the DuckDB oracle gate) runs — so the two can
never drift apart by construction.  That is the point: hand-written
query/oracle pairs can disagree; compiled pairs cannot, short of a
compiler bug, which is exactly what the oracle gate then detects.

Derived metrics (ratios of two aggregates) are computed POST-
aggregation on both sides — never avg-of-ratio — and rounding is part
of the metric declaration so float tails are pinned identically in
both dialects.

Scale: the compiled plan is a single groupBy(dims).agg(...) — map-side
partial aggregation, one shuffle keyed by the dims, optional filter
pushed to the scan.  The layer adds zero runtime machinery; it is a
plan factory.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Metric:
    """One aggregate, in both dialects.

    ``spark`` is a THUNK building the Column (lazy: metric specs are
    declared at module import, before any SparkSession exists); ``sql``
    is the equivalent ANSI aggregate text.  Use the constructors below
    — they keep the pair in lockstep."""

    name: str
    spark: Callable[[], Column]
    sql: str


def m_count(name: str = "n") -> Metric:
    return Metric(name, lambda: F.count(F.lit(1)).alias(name), f"COUNT(*) AS {name}")


def m_sum(col: str, name: str | None = None, digits: int | None = None) -> Metric:
    name = name or f"sum_{col}"
    if digits is None:
        return Metric(name, lambda: F.sum(col).alias(name), f"SUM({col}) AS {name}")
    return Metric(
        name,
        lambda: F.round(F.sum(col), digits).alias(name),
        f"ROUND(SUM({col}), {digits}) AS {name}",
    )


def m_avg(col: str, name: str | None = None, digits: int = 6) -> Metric:
    name = name or f"avg_{col}"
    return Metric(
        name,
        lambda: F.round(F.avg(col), digits).alias(name),
        f"ROUND(AVG({col}), {digits}) AS {name}",
    )


def m_min(col: str, name: str | None = None) -> Metric:
    name = name or f"min_{col}"
    return Metric(name, lambda: F.min(col).alias(name), f"MIN({col}) AS {name}")


def m_max(col: str, name: str | None = None) -> Metric:
    name = name or f"max_{col}"
    return Metric(name, lambda: F.max(col).alias(name), f"MAX({col}) AS {name}")


def m_count_distinct(col: str, name: str | None = None) -> Metric:
    name = name or f"nd_{col}"
    return Metric(
        name,
        lambda: F.count_distinct(F.col(col)).alias(name),
        f"COUNT(DISTINCT {col}) AS {name}",
    )


@dataclass(frozen=True)
class Ratio:
    """Derived metric: ``num / den`` of two declared metrics, computed
    after aggregation (never an average of row-level ratios)."""

    name: str
    num: str
    den: str
    digits: int = 6


def compile_metrics(
    table: str,
    dims: list[str],
    metrics: list[Metric],
    derived: list[Ratio] | None = None,
    where: tuple[Callable[[], Column], str] | None = None,
):
    """Compile a metric query over ``table`` into
    ``(builder(spark, sf_dir) -> DataFrame, oracle_sql: str)``.

    ``where`` is an optional (Spark Column thunk, SQL text) pair —
    the one place a caller writes both dialects; everything else is
    generated.  Metric/derived names must be unique and disjoint from
    dims (the compiler validates — a silent shadow would corrupt the
    result before the oracle could catch it).
    """
    derived = derived or []
    names = [m.name for m in metrics] + [d.name for d in derived]
    if len(set(names)) != len(names) or set(names) & set(dims):
        raise ValueError(f"metric names must be unique and disjoint from dims: {names}")
    for d in derived:
        if d.num not in {m.name for m in metrics} or d.den not in {
            m.name for m in metrics
        }:
            raise ValueError(f"derived {d.name} references undeclared metrics")

    def builder(spark: SparkSession, sf_dir: str) -> DataFrame:
        from tweets_spark_top_10_spark.sources.registry import load_table

        df = load_table(spark, sf_dir, table)
        if where is not None:
            df = df.where(where[0]())
        out = df.groupBy(*dims).agg(*[m.spark() for m in metrics])
        for d in derived:
            out = out.withColumn(
                d.name, F.round(F.col(d.num) / F.col(d.den), d.digits)
            )
        return out

    select = dims + [m.sql for m in metrics]
    inner = f"SELECT {', '.join(select)} FROM {table}"
    if where is not None:
        inner += f" WHERE {where[1]}"
    if dims:
        inner += f" GROUP BY {', '.join(dims)}"
    if derived:
        outer_cols = dims + [m.name for m in metrics] + [
            f"ROUND(CAST({d.num} AS DOUBLE) / {d.den}, {d.digits}) AS {d.name}"
            for d in derived
        ]
        sql = f"SELECT {', '.join(outer_cols)} FROM ({inner}) __m"
    else:
        sql = inner
    return builder, sql
