"""spark.sql text must produce the same results (and plans of the same
quality) as the DataFrame API — Catalyst is shared, pin it."""

from __future__ import annotations

from spookystuff_spark.sources.views import sql
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sql_equals_dataframe_q6(spark):
    from spookystuff_spark.queries import QUERIES, load_all_query_modules

    load_all_query_modules()
    got = sql(
        spark,
        SF_SMOKE,
        """
        SELECT round(1e-6 + sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        """,
    )
    expected = QUERIES["q6_forecast_revenue"](spark, SF_SMOKE)
    assert _rows(got) == _rows(expected)


def test_sql_window_and_cte(spark):
    got = sql(
        spark,
        SF_SMOKE,
        """
        WITH ranked AS (
          SELECT o_custkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders)
        SELECT count(*) AS n FROM ranked WHERE rk = 1
        """,
    ).collect()[0]["n"]
    n_cust = sql(
        spark, SF_SMOKE, "SELECT count(DISTINCT o_custkey) AS n FROM orders"
    ).collect()[0]["n"]
    assert got == n_cust


def test_sql_plan_quality_pushdown(spark):
    df = sql(
        spark,
        SF_SMOKE,
        "SELECT l_orderkey FROM lineitem WHERE l_shipdate > DATE '1995-06-01'",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_shipdate" in plan
