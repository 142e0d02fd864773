"""Every registered query must hash-match its DuckDB oracle at sf0.001 (fast)
— the local pre-flight for the driver's sf0.01 correctness gate."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duck_con


def _registry():
    from spookystuff_spark.queries import ORACLE, QUERIES, load_all_query_modules

    load_all_query_modules()
    return QUERIES, ORACLE


QUERIES, ORACLE = _registry()


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, con, name):
    spark_df = QUERIES[name](spark, SF_SMOKE)
    expected = con.sql(ORACLE[name]).df()
    compare(spark_df, expected, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_query_runs(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
