"""Additional relational coverage: bucketed histograms, correlated aggregates
(window-decorrelated), GROUPING SETS."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from spookystuff_spark.functions.rounding import round_stable
from spookystuff_spark.queries import query
from spookystuff_spark.tables import table


@query(
    "q_value_histogram",
    oracle="""
    SELECT CAST(CASE WHEN value < 0 THEN 0
                     WHEN value >= 200 THEN 21
                     ELSE floor(value / 10) + 1 END AS INTEGER) AS bucket,
           count(*) AS n,
           round(1e-6 + min(value), 2) AS lo,
           round(1e-6 + max(value), 2) AS hi
    FROM events
    GROUP BY 1
    """,
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (explicit width_bucket arithmetic — identical
    formula both engines; DuckDB lacks the builtin)."""
    ev = table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 0, 0)
        .when(F.col("value") >= 200, 21)
        .otherwise(F.floor(F.col("value") / 10) + 1)
    )
    return ev.groupBy(bucket.cast("int").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        round_stable(F.min("value"), 2).alias("lo"),
        round_stable(F.max("value"), 2).alias("hi"),
    )


@query(
    "q_above_nation_avg_customers",
    oracle="""
    WITH x AS (
      SELECT c_custkey, c_nationkey, c_acctbal,
             avg(c_acctbal) OVER (PARTITION BY c_nationkey) AS nation_avg
      FROM customer)
    SELECT c_nationkey,
           count(*) AS n_above,
           round(1e-6 + avg(c_acctbal - nation_avg), 2) AS avg_excess
    FROM x WHERE c_acctbal > nation_avg
    GROUP BY c_nationkey
    """,
)
def q_above_nation_avg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated per-group aggregate decorrelated into a window — one shuffle
    shared by the window and the final group-by (same key)."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    x = c.withColumn("nation_avg", F.avg("c_acctbal").over(w))
    return (
        x.filter(F.col("c_acctbal") > F.col("nation_avg"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            round_stable(
                F.avg(F.col("c_acctbal") - F.col("nation_avg")), 2
            ).alias("avg_excess"),
        )
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint rollups in one pass)."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n
           FROM __orders_gs
           GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""
    )
