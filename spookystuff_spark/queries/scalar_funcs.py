"""Scalar-function coverage: string + date functions and advanced window
functions (ntile/lead/cume_dist), oracle-verified. The reference has no scalar
function library at all (SURVEY §2.3 — everything is user lambdas); the
rebuild's surface is Catalyst's, pinned here against DuckDB."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from spookystuff_spark.functions.rounding import round_stable
from spookystuff_spark.queries import bench_only, query
from spookystuff_spark.tables import table

ORACLE_STRING_FUNCS = """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           substr(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           concat(c_mktsegment, ':', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           replace(c_name, 'Customer', 'C') AS name_short,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           levenshtein(c_mktsegment, 'BUILDING') AS seg_dist
    FROM customer
    WHERE c_custkey < 100
    """


@bench_only("q_string_functions")
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws(":", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.regexp_replace("c_name", "Customer", "C").alias("name_short"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_dist"),
    )


ORACLE_DATE_DIMS = """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(quarter(o_orderdate) AS INTEGER) AS o_quarter,
           CAST(month(o_orderdate) AS INTEGER) AS o_month,
           count(*) AS n_orders,
           round(1e-6 + sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY 1, 2, 3
    """


@bench_only("q_date_dimensions")
def q_date_dimensions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.quarter("o_orderdate").cast("int").alias("o_quarter"),
        F.month("o_orderdate").cast("int").alias("o_month"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        round_stable(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@query(
    "q_window_suite",
    oracle="""
    SELECT s_suppkey,
           CAST(ntile(4) OVER w AS INTEGER) AS balance_quartile,
           round(1e-6 + lead(s_acctbal, 1, 0.0) OVER w, 2) AS next_bal,
           round(1e-6 + cume_dist() OVER w, 4) AS cume,
           round(1e-6 + s_acctbal, 2) AS bal
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + lead + cume_dist over one ordered window (supplier is small —
    a global window is fine; at scale, partition first like the moving-avg
    query does)."""
    s = table(spark, sf_dir, "supplier")
    w = Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return s.select(
        "s_suppkey",
        F.ntile(4).over(w).cast("int").alias("balance_quartile"),
        round_stable(F.lead("s_acctbal", 1, 0.0).over(w), 2).alias("next_bal"),
        round_stable(F.cume_dist().over(w), 4).alias("cume"),
        round_stable(F.col("s_acctbal"), 2).alias("bal"),
    )


PROFILE_COLS = [
    ("o_orderkey", "numeric"),
    ("o_totalprice", "numeric"),
    ("o_orderstatus", "string"),
    ("o_orderpriority", "string"),
]


@bench_only("q_table_profile")
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANALYZE-style column profile of the orders table
    (operators/profile.py): one wide aggregate pass → per-column
    null/distinct counts + type-appropriate min/max/mean, melt-shaped.
    Rides q_scalar_suite against the profile_sql DuckDB twin."""
    from spookystuff_spark.operators.profile import profile_table

    prof = profile_table(
        table(spark, sf_dir, "orders"), [c for c, _ in PROFILE_COLS]
    )
    return prof.select(
        F.lit("q_table_profile").alias("q"),
        F.concat_ws("|", "column", "metric").alias("row_key"),
        F.lit("v").alias("measure"),
        F.col("v_num"),
    )


def _profile_oracle() -> str:
    from spookystuff_spark.operators.profile import profile_sql

    inner = profile_sql("SELECT * FROM orders", PROFILE_COLS)
    return f"""
    SELECT 'q_table_profile' AS q,
           concat_ws('|', p.column, p.metric) AS row_key,
           'v' AS measure, p.v_num
    FROM ({inner}) p"""


ORACLE_TABLE_PROFILE = _profile_oracle()
