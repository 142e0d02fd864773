"""TPC-H q2/q11/q12/q16/q20/q21 adaptations — completes the 22-query TPC-H
family (the driver corpus has no ``partsupp`` table, so the part↔supplier
catalog queries derive the pair relation from ``lineitem``; q12/q21 substitute
shipdate-vs-orderdate lateness for the absent commit/receipt dates).

Registered ``bench_only`` — the correctness gate rows are the melted
``q_tpch_suite_a``/``q_tpch_suite_b`` queries (queries/tpch_suites.py), which
pin every value of every constituent.

Determinism notes (see MEMORY: spark-duckdb-parity-traps): threshold
comparisons use raw IEEE arithmetic computed with the same formula both
sides; rounding (``round_stable`` / ``round(1e-6 + x)``) happens only at the
output boundary; every query has a total output ordering or full-set output.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark.functions.rounding import round_stable
from spookystuff_spark.queries import bench_only
from spookystuff_spark.tables import table


ORACLE_Q2 = """
    WITH offers AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    eu_supp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    scoped AS (
      SELECT o.partkey, o.suppkey, o.unit_cost, s.s_name, s.s_acctbal, s.n_name
      FROM offers o
      JOIN eu_supp s ON o.suppkey = s.s_suppkey
      JOIN part p ON o.partkey = p.p_partkey
      WHERE p.p_type = 'STANDARD' AND p.p_size BETWEEN 10 AND 20),
    best AS (
      SELECT partkey, min(unit_cost) AS min_cost FROM scoped GROUP BY partkey)
    SELECT s.s_acctbal, s.s_name, s.n_name,
           s.partkey AS p_partkey, s.suppkey AS s_suppkey,
           round(1e-6 + s.unit_cost, 2) AS supply_cost
    FROM scoped s JOIN best b
      ON s.partkey = b.partkey AND s.unit_cost = b.min_cost
    ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p_partkey, s_suppkey
    LIMIT 100
    """


@bench_only("q2_min_cost_supplier")
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted: part↔supplier catalog derived from lineitem, unit
    cost = min extendedprice/quantity): minimum-cost supplier per part in one
    region — correlated-min join. Part + supplier dims broadcast; the only
    shuffle is the lineitem pair aggregation. Min-cost equality compares the
    exact double the min was taken over, so it is bit-stable cross-engine."""
    li = table(spark, sf_dir, "lineitem")
    offers = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))

    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    )
    scoped = offers.join(
        F.broadcast(eu_supp), F.col("suppkey") == F.col("s_suppkey")
    ).join(F.broadcast(parts), F.col("partkey") == F.col("p_partkey"))
    best = scoped.groupBy(F.col("partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        scoped.join(
            best,
            (F.col("partkey") == F.col("b_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("partkey").alias("p_partkey"),
            F.col("suppkey").alias("s_suppkey"),
            round_stable(F.col("unit_cost"), 2).alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "s_suppkey"
        )
        .limit(100)
    )


ORACLE_Q11 = """
    WITH scoped AS (
      SELECT l_partkey, l_extendedprice * (1 - l_discount) AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'),
    byp AS (SELECT l_partkey, sum(val) AS value FROM scoped GROUP BY l_partkey)
    SELECT l_partkey AS p_partkey, round(1e-6 + value, 2) AS part_value
    FROM byp
    WHERE value > (SELECT sum(val) * 0.002 FROM scoped)
    ORDER BY part_value DESC, p_partkey
    """


@bench_only("q11_important_stock")
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted: stock value from lineitem revenue instead of the
    absent partsupp): parts whose one-nation value exceeds a fraction of the
    nation total — grouped agg HAVING a broadcast scalar subquery."""
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    scoped = (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp.select("s_suppkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val"),
        )
    )
    byp = scoped.groupBy("l_partkey").agg(F.sum("val").alias("value"))
    total = scoped.agg((F.sum("val") * F.lit(0.002)).alias("threshold"))
    return (
        byp.join(F.broadcast(total), F.col("value") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            round_stable(F.col("value"), 2).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


ORACLE_Q12 = """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 30
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """


@bench_only("q12_late_lines_by_status")
def q12_late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted: linestatus instead of the absent shipmode; lateness
    = shipped >30 days after order date instead of commit/receipt): priority
    split of late lines — one shuffle join + conditional aggregation."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate").cast("date")
            > F.date_add(F.col("o_orderdate").cast("date"), 30)
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


ORACLE_Q16 = """
    WITH pairs AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    ok_supp AS (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0)
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM pairs
    JOIN part ON l_partkey = p_partkey
    JOIN ok_supp ON l_suppkey = s_suppkey
    WHERE p_brand <> 'Brand#9'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """


@bench_only("q16_supplier_part_counts")
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted: pair relation from lineitem; negative account
    balance stands in for the complaints filter): distinct-supplier counts per
    part attribute cell — distinct-pair shuffle then count-distinct agg."""
    # no pre-distinct: the count_distinct aggregate dedups after the highly
    # selective broadcast joins, so the one shuffle carries only filtered
    # rows instead of every (partkey, suppkey) pair in lineitem
    pairs = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    ok_supp = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") >= 0)
        .select("s_suppkey")
    )
    parts = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & ~F.col("p_type").isin("PROMO", "ECONOMY")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    return (
        pairs.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(ok_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


ORACLE_Q20 = """
    WITH red_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    shipped AS (
      SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
      FROM lineitem JOIN red_parts ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey)
    SELECT s_name, round(1e-6 + s_acctbal, 2) AS s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
      AND EXISTS (SELECT 1 FROM shipped
                  WHERE l_suppkey = s_suppkey AND qty > 100)
    ORDER BY s_name
    """


@bench_only("q20_excess_shippers")
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted: shipped-quantity totals instead of the absent
    availqty): one nation's suppliers that moved >100 units of any red part in
    1996 — semi-join chain (part filter → pair agg → semi join supplier).
    l_quantity is integral so the sum and the >100 comparison are exact."""
    red_parts = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    shipped = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
        .distinct()
    )
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    return (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(shipped, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", round_stable(F.col("s_acctbal"), 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


ORACLE_Q21 = """
    WITH f_lines AS (
      SELECT l_orderkey, l_suppkey,
             CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60 AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'),
    per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
      FROM f_lines GROUP BY l_orderkey),
    blamed AS (
      SELECT DISTINCT f.l_orderkey, f.l_suppkey
      FROM f_lines f
      JOIN per_order p ON f.l_orderkey = p.l_orderkey
      WHERE f.late AND p.n_supp >= 2 AND p.n_late = 1)
    SELECT s_name, count(*) AS numwait
    FROM blamed JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """


@bench_only("q21_waiting_suppliers")
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted: late = shipped >60 days after order date): the sole
    late supplier on multi-supplier finished orders, ranked by blame count.
    The exists/not-exists pair of the original is expressed as one per-order
    distinct-count aggregation (n_supp >= 2 AND n_late = 1) — one shuffle
    replaces two correlated self-joins."""
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    f_lines = (
        table(spark, sf_dir, "lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate").cast("date")
                > F.date_add(F.col("o_orderdate").cast("date"), 60)
            ).alias("late"),
        )
    )
    per_order = f_lines.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    blamed = (
        f_lines.filter(F.col("late"))
        .join(
            per_order,
            (F.col("l_orderkey") == F.col("po_orderkey"))
            & (F.col("n_supp") >= 2)
            & (F.col("n_late") == 1),
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    supplier = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
