"""Local DuckDB-vs-Spark differential harness, mirroring the driver's gate.

Canonicalization (FIXTURES.md): sort columns by name, sort rows, round
doubles to 12 significant digits, then hash. A mismatch returns a diff
sample instead of just a boolean so failures are debuggable.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from datetime import date, datetime

import duckdb
from pyspark.sql import DataFrame

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        # 12 significant digits
        return float(f"{v:.12g}")
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    return v


def _canon_rows(rows: list[dict]) -> list[tuple]:
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    out = [tuple(_canon_value(r[c]) for c in cols) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


@dataclass
class CompareResult:
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare(df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str) -> CompareResult:
    spark_rows = [r.asDict() for r in df.collect()]
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    oracle_rows = [dict(zip(cols, row)) for row in cur.fetchall()]

    if spark_rows and oracle_rows:
        sc, oc = sorted(spark_rows[0].keys()), sorted(oracle_rows[0].keys())
        if sc != oc:
            return CompareResult(
                False, len(spark_rows), len(oracle_rows),
                f"column mismatch: spark={sc} oracle={oc}",
            )
    a, b = _canon_rows(spark_rows), _canon_rows(oracle_rows)
    if len(a) != len(b):
        return CompareResult(
            False, len(a), len(b), f"row count: spark={len(a)} oracle={len(b)}"
        )
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            return CompareResult(
                False, len(a), len(b),
                f"first diff at canonical row {i}:\n  spark={ra}\n  duckdb={rb}",
            )
    return CompareResult(True, len(a), len(b))
