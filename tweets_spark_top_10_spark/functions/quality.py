"""Declarative data-quality constraint audit.

A 100 TB ingest without mechanical constraint checks ships silent
corruption downstream; this is the dbt-test / Deequ-shaped surface:
declare constraints, get one tiny ``(check_name, n_violations)``
result back, gate the pipeline on it.

Scale shape: every row-local constraint (not-null, range, domain)
folds into ONE aggregate pass over the table — a single
map-side-combined agg producing one row, stacked into per-check rows
driver-free.  Referential checks are a broadcast anti-join against
the (distinct) dimension keys; uniqueness is a count-per-key
aggregate keyed by the candidate key (uniform, skew-free when the
key is actually near-unique).  Nothing collects; the final result is
as many rows as checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEMA_HINT = "check_name string, n_violations long"


def row_local_violations(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """One aggregate pass counting rows violating each condition;
    ``checks`` maps check name -> *violation* predicate."""
    if not checks:
        raise ValueError("no checks given")
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in checks.items()
    ]
    stacked = ", ".join(f"'{n}', `{n}`" for n in checks)
    return df.agg(*aggs).selectExpr(
        f"stack({len(checks)}, {stacked}) AS (check_name, n_violations)"
    )


def referential_violations(
    df: DataFrame, key: str, dim: DataFrame, dim_key: str, name: str
) -> DataFrame:
    """Rows of ``df`` whose ``key`` has no match in ``dim[dim_key]``
    (anti-join; NULL keys don't count — pair with a not-null check if
    they should).  No broadcast hint: this helper takes ARBITRARY
    dimensions, and the caller's dim may scale with the corpus
    (customer does) — the optimizer broadcasts the distinct key set
    while it fits and shuffles past that."""
    orphans = df.where(F.col(key).isNotNull()).join(
        dim.select(dim_key).distinct(),
        df[key] == F.col(dim_key),
        "left_anti",
    )
    return orphans.agg(
        F.lit(name).alias("check_name"),
        F.count(F.lit(1)).cast("long").alias("n_violations"),
    )


def uniqueness_violations(df: DataFrame, key: str, name: str) -> DataFrame:
    """Number of surplus rows beyond the first per duplicated key."""
    dups = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 1)
    )
    return dups.agg(
        F.lit(name).alias("check_name"),
        F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).cast("long").alias("n_violations"),
    )


def audit(*parts: DataFrame) -> DataFrame:
    """Union the per-family violation tables into one report."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
