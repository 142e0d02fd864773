"""Melted set-operation suite: the semi/anti-join and INTERSECT/EXCEPT
queries (previously gated individually) folded into one gated result set,
freeing correctness-gate slots for new operator surfaces while still pinning
every row of every constituent. Same melt discipline as tpch_suites.py:
``(q, row_key, measure, v_num)`` — these queries output key tuples only, so
each row melts to one ``present=1`` measure row.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark.queries import query
from spookystuff_spark.queries.relational import (
    ORACLE_CUST_NO_ORDERS,
    ORACLE_NATION_INTERSECT,
    q_customers_without_orders,
    q_nation_keys_intersect,
)
from spookystuff_spark.queries.relational2 import (
    ORACLE_CUST_WITH_ORDERS,
    ORACLE_EXCEPT_9596,
    q_active_1995_not_1996_except,
    q_customers_with_orders_semi,
)


def _melt_keys(df: DataFrame, qname: str, keys: list[str]) -> DataFrame:
    row_key = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    return df.select(
        F.lit(qname).alias("q"),
        row_key.alias("row_key"),
        F.lit("present").alias("measure"),
        F.lit(1.0).alias("v_num"),
    )


def _melt_keys_sql(cte: str, qname: str, keys: list[str]) -> str:
    key = "concat_ws('|', " + ", ".join(f"CAST({k} AS VARCHAR)" for k in keys) + ")"
    return (
        f"SELECT '{qname}' AS q, {key} AS row_key, "
        f"'present' AS measure, CAST(1.0 AS DOUBLE) AS v_num FROM {cte}"
    )


_SETOPS_SQL = f"""
WITH semi_q AS ({ORACLE_CUST_WITH_ORDERS}), anti_q AS ({ORACLE_CUST_NO_ORDERS}),
     isect_q AS ({ORACLE_NATION_INTERSECT}), exc_q AS ({ORACLE_EXCEPT_9596})
{_melt_keys_sql("semi_q", "semi", ["c_custkey", "c_name"])}
UNION ALL {_melt_keys_sql("anti_q", "anti", ["c_custkey", "c_name"])}
UNION ALL {_melt_keys_sql("isect_q", "intersect", ["nationkey"])}
UNION ALL {_melt_keys_sql("exc_q", "except", ["custkey"])}
"""


@query("q_setops_suite", oracle=_SETOPS_SQL)
def q_setops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS), anti join (NOT EXISTS), INTERSECT, and EXCEPT
    melted into one gated result set (constituents stay individually
    benchmarked via ``bench_only``)."""
    from spookystuff_spark.tables import shared_scans

    with shared_scans(spark, sf_dir, ("customer", "orders")):
        return _setops_parts(spark, sf_dir)


def _setops_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = [
        _melt_keys(
            q_customers_with_orders_semi(spark, sf_dir), "semi", ["c_custkey", "c_name"]
        ),
        _melt_keys(
            q_customers_without_orders(spark, sf_dir), "anti", ["c_custkey", "c_name"]
        ),
        _melt_keys(q_nation_keys_intersect(spark, sf_dir), "intersect", ["nationkey"]),
        _melt_keys(q_active_1995_not_1996_except(spark, sf_dir), "except", ["custkey"]),
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


from spookystuff_spark.queries import register_suite  # noqa: E402

register_suite(
    "q_setops_suite",
    {
        "semi": "q_customers_with_orders_semi",
        "anti": "q_customers_without_orders",
        "intersect": "q_nation_keys_intersect",
        "except": "q_active_1995_not_1996_except",
    },
)
