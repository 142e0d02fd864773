"""Relational surface over the TPC-H-ish corpus.

The reference has no relational operators of its own (SURVEY.md §2.3) — joins
exist only as locality cogroups (utils/locality/*.scala) and aggregation only as
explore-frontier reduceByKey. The rebuild inherits the whole surface from
PySpark; these queries pin the semantics against the DuckDB oracle and serve as
the bench workload.

Scale notes (100 TB):
  * fact-fact joins (orders⋈lineitem) shuffle on the join key — both sides hash
    into `spark.sql.shuffle.partitions`; AQE coalesces/splits skewed partitions;
  * dimension joins (region/nation/supplier/customer-at-small-SF) are broadcast
    (`F.broadcast`) so the fact table never moves;
  * all aggregates are partial (map-side combine) — Catalyst does this for every
    `groupBy().agg()` below;
  * filters sit directly on the parquet scan (PushedFilters), projections prune
    columns at the reader.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from spookystuff_spark.functions.rounding import round_stable
from spookystuff_spark.queries import bench_only, query
from spookystuff_spark.tables import table


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(1e-6 + sum(l_quantity), 2)                                        AS sum_qty,
           round(1e-6 + sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(1e-6 + sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(1e-6 + sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(1e-6 + avg(l_quantity), 2)                                        AS avg_qty,
           round(1e-6 + avg(l_extendedprice), 2)                                   AS avg_price,
           round(1e-6 + avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: one scan, one hash aggregate; fully map-side-combinable."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round_stable(F.sum("l_quantity"), 2).alias("sum_qty"),
            round_stable(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            round_stable(F.sum(disc_price), 2).alias("sum_disc_price"),
            round_stable(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            round_stable(F.avg("l_quantity"), 2).alias("avg_qty"),
            round_stable(F.avg("l_extendedprice"), 2).alias("avg_price"),
            round_stable(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT o_orderkey,
           round(1e-6 + sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15'
      AND l_shipdate  > TIMESTAMP '1997-03-15'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: customer is the small side → broadcast; orders⋈lineitem is the
    one real shuffle. Top-10 with unique-key tiebreak for determinism."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            round_stable(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, round(1e-6 + sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join. All dimensions broadcast; the only shuffle is
    orders⋈lineitem. Region filter prunes before the nation join."""
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            round_stable(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(1e-6 + sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+agg — every predicate reaches PushedFilters."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            round_stable(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_top_orders_per_customer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT c_custkey, c_name, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM customer JOIN orders ON c_custkey = o_custkey
    ) t WHERE rnk <= 3
    """,
)
def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via window row_number — the canonical distributed top-k:
    one shuffle on the partition key, rank inside each partition."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "rnk")
    )


@query(
    "q_rollup_acctbal",
    oracle="""
    SELECT r_name, n_name,
           round(1e-6 + sum(c_acctbal), 2) AS total_acctbal,
           count(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def q_rollup_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregate via ROLLUP (region → nation → grand total)."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            round_stable(F.sum("c_acctbal"), 2).alias("total_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


ORACLE_CUST_NO_ORDERS = """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """


@bench_only("q_customers_without_orders")
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS). Catalyst turns this into a broadcast/shuffled
    left-anti; only the key column of orders is scanned."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


ORACLE_NATION_INTERSECT = """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """


@bench_only("q_nation_keys_intersect")
def q_nation_keys_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: INTERSECT (distinct semantics on both engines)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q_part_type_stats",
    oracle="""
    SELECT p_brand,
           count(DISTINCT p_type)        AS n_types,
           round(1e-6 + avg(p_retailprice), 2)  AS avg_price,
           max(p_size)                   AS max_size,
           min(p_size)                   AS min_size
    FROM part
    GROUP BY p_brand
    """,
)
def q_part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed agg incl. count-distinct (expands to two-phase distinct agg)."""
    part = table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.countDistinct("p_type").alias("n_types"),
        round_stable(F.avg("p_retailprice"), 2).alias("avg_price"),
        F.max("p_size").alias("max_size"),
        F.min("p_size").alias("min_size"),
    )
