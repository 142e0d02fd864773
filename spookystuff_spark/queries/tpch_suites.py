"""Melted TPC-H suite queries: correctness gate for the individually-
benchmarked TPC-H adaptations (queries/tpch_more*.py, registered via
``bench_only``).

Each constituent query's full result set is melted to a common long format
``(q, row_key, measure, v_num)`` — group keys concatenated into ``row_key``,
every numeric output emitted as one ``(measure, v_num)`` row — and unioned.
One green CORRECTNESS row per suite therefore pins EVERY value of every
constituent query (same plans, same rounding discipline); the DuckDB oracle
performs the identical melt over the original per-query oracle SQL.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from spookystuff_spark.queries import query
from spookystuff_spark.tables import shared_scans
from spookystuff_spark.queries.tpch_more import (
    ORACLE_Q7,
    ORACLE_Q9,
    ORACLE_Q10,
    ORACLE_Q14,
    ORACLE_Q17,
    ORACLE_Q18,
    ORACLE_Q19,
    q7_volume_shipping,
    q9_product_revenue,
    q10_returned_items,
    q14_promo_revenue,
    q17_small_quantity_revenue,
    q18_large_orders,
    q19_brand_band_revenue,
)
from spookystuff_spark.queries.tpch_more2 import (
    ORACLE_Q8,
    ORACLE_Q13,
    ORACLE_Q15,
    ORACLE_Q22,
    q8_market_share,
    q13_order_count_distribution,
    q15_top_suppliers,
    q22_sales_opportunity,
)
from spookystuff_spark.queries.tpch_rest import (
    ORACLE_Q2,
    ORACLE_Q11,
    ORACLE_Q12,
    ORACLE_Q16,
    ORACLE_Q20,
    ORACLE_Q21,
    q2_min_cost_supplier,
    q11_important_stock,
    q12_late_lines_by_status,
    q16_supplier_part_counts,
    q20_excess_shippers,
    q21_waiting_suppliers,
)


def _melt(df: DataFrame, qname: str, keys: list, measures: list[str]) -> DataFrame:
    """→ (q, row_key, measure, v_num): one row per (input row, measure)."""
    key_cols = [k if isinstance(k, Column) else F.col(k).cast("string") for k in keys]
    row_key = F.concat_ws("|", *key_cols) if key_cols else F.lit("")
    mv = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(m).alias("measure"),
                    F.col(m).cast("double").alias("v_num"),
                )
                for m in measures
            ]
        )
    ).alias("mv")
    return df.select(F.lit(qname).alias("q"), row_key.alias("row_key"), mv).select(
        "q", "row_key", "mv.measure", "mv.v_num"
    )


def _melt_sql(cte_name: str, qname: str, key_sql: list[str], measures: list[str]) -> str:
    key = (
        "concat_ws('|', " + ", ".join(f"CAST({k} AS VARCHAR)" for k in key_sql) + ")"
        if key_sql
        else "''"
    )
    parts = [
        f"SELECT '{qname}' AS q, {key} AS row_key, "
        f"'{m}' AS measure, CAST({m} AS DOUBLE) AS v_num FROM {cte_name}"
        for m in measures
    ]
    return " UNION ALL ".join(parts)


_SUITE_A_SQL = f"""
WITH q7 AS ({ORACLE_Q7}), q8 AS ({ORACLE_Q8}), q9 AS ({ORACLE_Q9}),
     q10 AS ({ORACLE_Q10}), q13 AS ({ORACLE_Q13}), q2 AS ({ORACLE_Q2}),
     q11 AS ({ORACLE_Q11}), q12 AS ({ORACLE_Q12})
{_melt_sql("q7", "q7", ["supp_nation", "cust_nation", "l_year"], ["revenue"])}
UNION ALL {_melt_sql("q8", "q8", ["o_year"], ["mkt_share"])}
UNION ALL {_melt_sql("q9", "q9", ["nation", "o_year"], ["revenue"])}
UNION ALL {_melt_sql("q10", "q10", ["c_custkey", "c_name"], ["revenue", "c_acctbal"])}
UNION ALL {_melt_sql("q13", "q13", ["c_count"], ["custdist"])}
UNION ALL {
    _melt_sql(
        "q2",
        "q2",
        ["p_partkey", "s_suppkey", "s_name", "n_name"],
        ["s_acctbal", "supply_cost"],
    )
}
UNION ALL {_melt_sql("q11", "q11", ["p_partkey"], ["part_value"])}
UNION ALL {_melt_sql("q12", "q12", ["l_linestatus"], ["high_line_count", "low_line_count"])}
"""


@query("q_tpch_suite_a", oracle=_SUITE_A_SQL)
def q_tpch_suite_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2/q7/q8/q9/q10/q11/q12/q13 melted into one gated result set.

    ``shared_scans`` persists the fact/dim scans once for the whole union —
    without it each constituent re-scans lineitem/orders/... independently."""
    with shared_scans(
        spark, sf_dir, ("lineitem", "orders", "customer", "part", "supplier")
    ):
        return _suite_a_parts(spark, sf_dir)


def _suite_a_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = [
        _melt(
            q2_min_cost_supplier(spark, sf_dir),
            "q2",
            ["p_partkey", "s_suppkey", "s_name", "n_name"],
            ["s_acctbal", "supply_cost"],
        ),
        _melt(q11_important_stock(spark, sf_dir), "q11", ["p_partkey"], ["part_value"]),
        _melt(
            q12_late_lines_by_status(spark, sf_dir),
            "q12",
            ["l_linestatus"],
            ["high_line_count", "low_line_count"],
        ),
        _melt(
            q7_volume_shipping(spark, sf_dir),
            "q7",
            ["supp_nation", "cust_nation", "l_year"],
            ["revenue"],
        ),
        _melt(q8_market_share(spark, sf_dir), "q8", ["o_year"], ["mkt_share"]),
        _melt(q9_product_revenue(spark, sf_dir), "q9", ["nation", "o_year"], ["revenue"]),
        _melt(
            q10_returned_items(spark, sf_dir),
            "q10",
            ["c_custkey", "c_name"],
            ["revenue", "c_acctbal"],
        ),
        _melt(
            q13_order_count_distribution(spark, sf_dir), "q13", ["c_count"], ["custdist"]
        ),
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


_SUITE_B_SQL = f"""
WITH q14 AS ({ORACLE_Q14}), q15 AS ({ORACLE_Q15}), q17 AS ({ORACLE_Q17}),
     q18 AS ({ORACLE_Q18}), q19 AS ({ORACLE_Q19}), q22 AS ({ORACLE_Q22}),
     q16 AS ({ORACLE_Q16}), q20 AS ({ORACLE_Q20}), q21 AS ({ORACLE_Q21})
{_melt_sql("q14", "q14", [], ["promo_revenue"])}
UNION ALL {_melt_sql("q15", "q15", ["s_suppkey", "s_name"], ["total_revenue"])}
UNION ALL {_melt_sql("q17", "q17", [], ["avg_yearly"])}
UNION ALL {
    _melt_sql(
        "q18",
        "q18",
        ["c_custkey", "o_orderkey", "CAST(o_orderdate AS DATE)"],
        ["o_totalprice", "total_qty"],
    )
}
UNION ALL {_melt_sql("q19", "q19", [], ["revenue", "n_lines"])}
UNION ALL {_melt_sql("q22", "q22", ["c_mktsegment"], ["numcust", "totacctbal"])}
UNION ALL {_melt_sql("q16", "q16", ["p_brand", "p_type", "p_size"], ["supplier_cnt"])}
UNION ALL {_melt_sql("q20", "q20", ["s_name"], ["s_acctbal"])}
UNION ALL {_melt_sql("q21", "q21", ["s_name"], ["numwait"])}
"""


@query("q_tpch_suite_b", oracle=_SUITE_B_SQL)
def q_tpch_suite_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14/q15/q16/q17/q18/q19/q20/q21/q22 melted into one gated set."""
    with shared_scans(
        spark, sf_dir, ("lineitem", "orders", "customer", "part", "supplier")
    ):
        return _suite_b_parts(spark, sf_dir)


def _suite_b_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = [
        _melt(
            q16_supplier_part_counts(spark, sf_dir),
            "q16",
            ["p_brand", "p_type", "p_size"],
            ["supplier_cnt"],
        ),
        _melt(q20_excess_shippers(spark, sf_dir), "q20", ["s_name"], ["s_acctbal"]),
        _melt(q21_waiting_suppliers(spark, sf_dir), "q21", ["s_name"], ["numwait"]),
        _melt(q14_promo_revenue(spark, sf_dir), "q14", [], ["promo_revenue"]),
        _melt(
            q15_top_suppliers(spark, sf_dir),
            "q15",
            ["s_suppkey", "s_name"],
            ["total_revenue"],
        ),
        _melt(q17_small_quantity_revenue(spark, sf_dir), "q17", [], ["avg_yearly"]),
        _melt(
            q18_large_orders(spark, sf_dir),
            "q18",
            [
                F.col("c_custkey").cast("string"),
                F.col("o_orderkey").cast("string"),
                F.col("o_orderdate").cast("date").cast("string"),
            ],
            ["o_totalprice", "total_qty"],
        ),
        _melt(q19_brand_band_revenue(spark, sf_dir), "q19", [], ["revenue", "n_lines"]),
        _melt(
            q22_sales_opportunity(spark, sf_dir),
            "q22",
            ["c_mktsegment"],
            ["numcust", "totacctbal"],
        ),
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


from spookystuff_spark.queries import register_suite  # noqa: E402

register_suite(
    "q_tpch_suite_a",
    {
        "q2": "q2_min_cost_supplier", "q7": "q7_volume_shipping",
        "q8": "q8_market_share", "q9": "q9_product_revenue",
        "q10": "q10_returned_items", "q11": "q11_important_stock",
        "q12": "q12_late_lines_by_status",
        "q13": "q13_order_count_distribution",
    },
)
register_suite(
    "q_tpch_suite_b",
    {
        "q14": "q14_promo_revenue", "q15": "q15_top_suppliers",
        "q16": "q16_supplier_part_counts",
        "q17": "q17_small_quantity_revenue", "q18": "q18_large_orders",
        "q19": "q19_brand_band_revenue", "q20": "q20_excess_shippers",
        "q21": "q21_waiting_suppliers", "q22": "q22_sales_opportunity",
    },
)
