"""The driver-harness compatibility tripwire itself must trip.

Round-6 verdict item 2: two driver rows burned on output-shape issues
the in-repo harness tolerated — ``doc_token_ids`` (raw ``array<long>``
column, driver canonicalizer raised ``unhashable type: 'list'``) and
``priority_revenue_ivm`` (DuckDB HUGEINT→float64 vs Spark int64,
dtype-strict hash mismatch on identical values).  These fixtures pin
both failure classes against ``tests.oracle_harness.driver_canon_*``;
the positive path is exercised by every query in
``tests/test_oracle.py`` (phase 2 of ``compare``).
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.oracle_harness import driver_canon_compare, driver_canon_hash


def test_array_column_trips():
    spark = pd.DataFrame({"k": [1, 2], "ids": [[1, 2, 3], [4]]})
    oracle = pd.DataFrame({"ids": [[1, 2, 3], [4]], "k": [1, 2]})
    detail = driver_canon_compare(spark, oracle)
    assert detail is not None and "ERR" in detail, detail


def test_int64_vs_float64_trips():
    spark = pd.DataFrame({"g": ["a", "b"], "s": [84_700_000_000, 12]})
    # DuckDB SUM(BIGINT) -> HUGEINT -> pandas float64: same values,
    # different dtype.  Must hash-mismatch.
    oracle = pd.DataFrame({"g": ["a", "b"], "s": [84_700_000_000.0, 12.0]})
    detail = driver_canon_compare(spark, oracle)
    assert detail is not None and "mismatch" in detail, detail


def test_identical_frames_agree():
    spark = pd.DataFrame({"g": ["b", "a"], "n": [2, 1], "x": [1.5, 0.25]})
    # Different row order, different column order: same hash.
    oracle = pd.DataFrame({"x": [0.25, 1.5], "g": ["a", "b"], "n": [1, 2]})
    assert driver_canon_compare(spark, oracle) is None


def test_float_rounding_tolerance():
    a = pd.DataFrame({"x": [0.1 + 0.2]})
    b = pd.DataFrame({"x": [0.3]})
    assert driver_canon_hash(a) == driver_canon_hash(b)


def test_row_order_canonicalized_with_nulls():
    a = pd.DataFrame({"g": ["a", None, "b"], "n": [1.0, float("nan"), 2.0]})
    b = pd.DataFrame({"g": [None, "b", "a"], "n": [float("nan"), 2.0, 1.0]})
    assert driver_canon_hash(a) == driver_canon_hash(b)
