"""Local DuckDB-vs-Spark differential harness, mirroring the driver's gate.

Canonicalization (FIXTURES.md): sort columns by name, sort rows, round
doubles to 12 significant digits, then hash. A mismatch returns a diff
sample instead of just a boolean so failures are debuggable.

Two comparison phases (round-6 verdict item 2):

1. **Value-exact** — Python-object canonicalization (lists→tuples,
   floats to 12 sig digits).  Catches wrong values.
2. **Driver-canon** — replays the DRIVER's pandas-based hasher:
   DuckDB side materialized via ``.df()`` (so HUGEINT→float64 shows up
   exactly as the driver sees it), columns sorted by name, rows
   canonically ordered via ``pd.factorize(sort=True)`` (which raises
   ``TypeError: unhashable type`` on array cells, like the driver's
   ``ObjectHashTable._unique``), then a dtype-strict
   ``pd.util.hash_pandas_object`` digest.  Catches the two r6 failure
   classes — ``doc_token_ids`` (array column) and
   ``priority_revenue_ivm`` (int64 vs HUGEINT→float64) — locally,
   before they burn a driver row.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd
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


def _driver_canon_column(s: pd.Series) -> pd.Series:
    """Normalize ONE column the way a cross-engine pandas hasher must:
    temporal values to ISO strings (engines disagree on datetime64
    unit), Decimal to rounded float64.  Deliberately does NOT touch the
    int-vs-float distinction (that mismatch must fail) and does NOT
    unwrap list/array cells (those must raise)."""
    kind = s.dtype.kind
    if kind == "M":  # datetime64[any unit], tz-aware or naive
        if getattr(s.dtype, "tz", None) is not None:
            s = s.dt.tz_localize(None)  # returns a Series: re-enter .dt
        return s.dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if kind == "f":
        return s.map(
            lambda v: 0.0 if v == 0 else float(f"{v:.12g}"),
            na_action="ignore",
        ).astype("float64")
    if kind == "O":
        sample = next((v for v in s if v is not None), None)
        if isinstance(sample, Decimal):
            return s.map(
                lambda v: 0.0 if v == 0 else float(f"{float(v):.12g}"),
                na_action="ignore",
            ).astype("float64")
        if isinstance(sample, datetime):
            return s.map(
                lambda v: v.replace(tzinfo=None).strftime("%Y-%m-%dT%H:%M:%S.%f"),
                na_action="ignore",
            )
        if isinstance(sample, date):
            # Same string as a midnight datetime64 — Spark DATE comes
            # back as datetime.date objects, DuckDB DATE as
            # datetime64[us]; both engines mean the same instant.
            return s.map(
                lambda v: datetime.combine(v, datetime.min.time()).strftime(
                    "%Y-%m-%dT%H:%M:%S.%f"
                ),
                na_action="ignore",
            )
    return s


def driver_canon_hash(pdf: pd.DataFrame) -> str:
    """Digest a result frame the way the correctness driver does:
    columns sorted by name, rows canonically ordered, dtype-strict
    value hash.  Raises ``TypeError`` on unhashable cells (lists) —
    that IS the tripwire for array-typed output columns."""
    pdf = pdf.reindex(sorted(map(str, pdf.columns)), axis=1)
    pdf = pdf.apply(_driver_canon_column)
    if len(pdf):
        # factorize(sort=True) raises on list cells, like the driver.
        codes = [pd.factorize(pdf[c], sort=True)[0] for c in pdf.columns]
        pdf = pdf.iloc[np.lexsort(codes[::-1])]
    h = hashlib.md5()
    h.update(("|".join(f"{c}:{pdf[c].dtype.kind}" for c in pdf.columns)).encode())
    h.update(pd.util.hash_pandas_object(pdf, index=False).values.tobytes())
    return h.hexdigest()


def driver_canon_compare(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame
) -> str | None:
    """Replay the driver's hasher on both sides; None if they agree,
    else a failure description (including raised TypeErrors)."""
    try:
        a = driver_canon_hash(spark_pdf)
        b = driver_canon_hash(oracle_pdf)
    except TypeError as e:
        return f"driver canonicalizer would ERR: {e}"
    if a != b:
        sd = {c: str(spark_pdf[c].dtype) for c in spark_pdf.columns}
        od = {c: str(oracle_pdf[c].dtype) for c in oracle_pdf.columns}
        return (
            "driver-canon hash mismatch (dtype-strict): "
            f"spark dtypes={sd} oracle dtypes={od}"
        )
    return None


@dataclass
class CompareResult:
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare(df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str) -> CompareResult:
    df = df.persist()  # collected twice: object rows + driver-canon toPandas
    try:
        return _compare_persisted(df, con, sql)
    finally:
        df.unpersist()


def _compare_persisted(
    df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str
) -> CompareResult:
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
    # Phase 2: driver-harness compatibility (dtype-strict pandas hash).
    # The driver materializes Spark via toPandas() and DuckDB via .df()
    # — both dtype-bearing paths (nullable long -> float64 on BOTH
    # sides; HUGEINT -> float64 on the oracle side ONLY, which is the
    # r6 priority_revenue_ivm burn this phase exists to catch).
    detail = driver_canon_compare(df.toPandas(), con.execute(sql).df())
    if detail is not None:
        return CompareResult(False, len(a), len(b), detail)
    return CompareResult(True, len(a), len(b))
