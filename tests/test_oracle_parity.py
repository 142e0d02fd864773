"""Every registered query must hash-match its DuckDB oracle at sf0.001 (fast)
— the local pre-flight for the driver's sf0.01 correctness gate."""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.oracle_harness import compare, duck_con


def _registry():
    from spookystuff_spark.queries import (
        GOLDEN_QUERIES,
        ORACLE,
        QUERIES,
        load_all_query_modules,
    )

    load_all_query_modules()
    return QUERIES, ORACLE, GOLDEN_QUERIES


QUERIES, ORACLE, GOLDEN = _registry()


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(set(ORACLE) - GOLDEN))
def test_query_matches_oracle(spark, con, name):
    spark_df = QUERIES[name](spark, SF_SMOKE)
    expected = con.sql(ORACLE[name]).df()
    compare(spark_df, expected, name)


@pytest.fixture(scope="module")
def con_correct():
    c = duck_con(SF_CORRECT)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(GOLDEN & set(ORACLE)))
def test_query_matches_golden_oracle(spark, con_correct, name):
    """Golden-parquet oracles are precomputed at the driver's gate SF
    (sf0.01) by an independent numpy implementation — compare at that SF
    (views at the same SF: suite oracles may mix golden parquets with
    table SQL)."""
    spark_df = QUERIES[name](spark, SF_CORRECT)
    expected = con_correct.sql(ORACLE[name]).df()
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
