"""Extended relational coverage: cube, moving windows, as-of join, range join,
semi/except set ops, percentiles — rounding out the SURVEY §2.3 surface that
the reference lacks entirely and the rebuild inherits from Catalyst.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from spookystuff_spark.functions.rounding import round_stable
from spookystuff_spark.queries import bench_only, query
from spookystuff_spark.tables import table


@query(
    "q_cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(1e-6 + sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        round_stable(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@query(
    "q_moving_avg_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             sum(o_totalprice) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT day,
           round(1e-6 + revenue, 2) AS revenue,
           round(1e-6 + avg(revenue) OVER (ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS ma7
    FROM daily
    """,
)
def q_moving_avg_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average — unpartitioned ordered window. At 100 TB the
    pre-aggregation to daily grain (one shuffle) makes the single-partition
    window trivially small; never window over raw rows."""
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        round_stable(F.col("rev"), 2).alias("revenue"),
        round_stable(F.avg("rev").over(w), 2).alias("ma7"),
    )


@query(
    "q_asof_prior_purchase",
    oracle="""
    SELECT event_id, user_id, ts,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prior_purchase_value
    FROM events
    """,
)
def q_asof_prior_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (each event ↦ the user's most recent strictly-prior purchase)
    expressed as an IGNORE NULLS last_value window — the classic Spark as-of
    pattern: one shuffle on the key, no range explosion, same plan shape at
    any scale. Equivalent to DuckDB's ASOF JOIN on (user_id, ts)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.last(
        F.when(F.col("event_type") == "purchase", F.col("value")), ignorenulls=True
    ).over(w)
    return ev.select(
        "event_id", "user_id", "ts", prior.alias("prior_purchase_value")
    )


@query(
    "q_range_join_value_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('low', 0.0, 25.0), ('mid', 25.0, 75.0),
             ('high', 75.0, 150.0), ('extreme', 150.0, 1e12)
    )
    SELECT band, count(*) AS n_events,
           round(1e-6 + sum(value), 2) AS total_value
    FROM events JOIN bands ON value >= lo AND value < hi
    GROUP BY band
    """,
)
def q_range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a broadcast bands table —
    BroadcastNestedLoopJoin on a tiny side, the right physical choice."""
    ev = table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [
            ("low", 0.0, 25.0),
            ("mid", 25.0, 75.0),
            ("high", 75.0, 150.0),
            ("extreme", 150.0, 1e12),
        ],
        ["band", "lo", "hi"],
    )
    return (
        ev.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round_stable(F.sum("value"), 2).alias("total_value"),
        )
    )


ORACLE_CUST_WITH_ORDERS = """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """


@bench_only("q_customers_with_orders_semi")
def q_customers_with_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


ORACLE_EXCEPT_9596 = """
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    """


@bench_only("q_active_1995_not_1996_except")
def q_active_1995_not_1996_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    y95 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select(F.col("o_custkey").alias("custkey"))
    y96 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select(F.col("o_custkey").alias("custkey"))
    return y95.subtract(y96)  # EXCEPT (distinct) — not exceptAll


@query(
    "q_price_percentiles",
    oracle="""
    SELECT o_orderstatus,
           round(1e-6 + quantile_cont(o_totalprice, 0.25), 2) AS p25,
           round(1e-6 + quantile_cont(o_totalprice, 0.50), 2) AS p50,
           round(1e-6 + quantile_cont(o_totalprice, 0.75), 2) AS p75,
           count(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``)."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        round_stable(F.percentile(F.col("o_totalprice"), F.lit(0.25)), 2).alias("p25"),
        round_stable(F.percentile(F.col("o_totalprice"), F.lit(0.50)), 2).alias("p50"),
        round_stable(F.percentile(F.col("o_totalprice"), F.lit(0.75)), 2).alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )
