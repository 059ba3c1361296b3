"""Differential test: every oracle-bearing query must match DuckDB.

This mirrors the driver's CORRECTNESS gate locally (at sf0.001 by
default for speed; set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to
run at the driver's scale factor).
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duckdb_con
from tweets_spark_top_10_spark.queries import ORACLE, QUERIES


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    res = compare(df, con, ORACLE[name])
    assert res.ok, f"{name}: {res.detail}"
    assert res.spark_rows > 0, f"{name}: empty result (vacuous pass)"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
