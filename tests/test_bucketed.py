"""Bucketed-table co-location: joins and aggregations on the bucket key must
run with ZERO Exchange in the physical plan — the 100 TB join strategy."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def bucketed_pair(spark, tmp_path_factory):
    from spookystuff_spark.sources.bucketed import write_bucketed

    base = tmp_path_factory.mktemp("bucketed")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    orders = spark.range(1000).select(
        F.col("id").alias("okey"), (F.col("id") % 7).alias("status")
    )
    lines = spark.range(5000).select(
        (F.col("id") % 1000).alias("okey"), (F.col("id") * 2).alias("qty")
    )
    write_bucketed(orders, "b_orders", "okey", 8, path=str(base / "o"))
    write_bucketed(lines, "b_lines", "okey", 8, path=str(base / "l"))
    yield "b_orders", "b_lines"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    t_orders, t_lines = bucketed_pair
    # disable broadcast so the join would otherwise be a shuffled SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t_orders).join(spark.table(t_lines), "okey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == 5000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_pair):
    _, t_lines = bucketed_pair
    agg = spark.table(t_lines).groupBy("okey").agg(F.sum("qty").alias("s"))
    plan = _plan(agg)
    assert "Exchange" not in plan, f"bucketed agg still shuffles:\n{plan}"
    assert agg.count() == 1000


def test_unbucketed_join_does_shuffle(spark, bucketed_pair):
    """Sanity: the same join WITHOUT bucketing has Exchanges — proves the
    bucketed plans above aren't trivially exchange-free."""
    t_orders, _ = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = spark.range(5000).select(
            (F.col("id") % 1000).alias("okey"), F.col("id").alias("qty")
        )
        plan = _plan(spark.table(t_orders).join(plain, "okey"))
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
