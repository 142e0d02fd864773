"""Bucketized interval join (operators/intervals.py): exact match with the
naive inequality join (randomized + closed-form), exactly-once pair
emission across shared buckets, keyed variant, and the no-BNLJ plan
assertion that is the operator's reason to exist."""

from __future__ import annotations

import duckdb
import pytest

import pyspark.sql.functions as F
from spookystuff_spark.operators.intervals import interval_join, interval_join_sql


def _df(spark, rows, prefix):
    return spark.createDataFrame(
        rows, f"{prefix}_id long, {prefix}_s long, {prefix}_e long"
    )


def test_closed_form_pairs_once(spark):
    left = _df(spark, [(1, 0, 100), (2, 50, 60), (3, 200, 210)], "a")
    right = _df(spark, [(10, 90, 150), (11, 55, 58), (12, 500, 600)], "b")
    got = {
        (r["a_id"], r["b_id"])
        for r in interval_join(
            left, right, "a_s", "a_e", "b_s", "b_e", bucket_width=10
        ).collect()
    }
    assert got == {(1, 10), (1, 11), (2, 11)}
    # exactly-once even though (1,11) shares buckets 5 and 6 at width 10
    n = interval_join(
        left, right, "a_s", "a_e", "b_s", "b_e", bucket_width=10
    ).count()
    assert n == 3


@pytest.mark.parametrize("width", [1, 7, 100, 10_000])
def test_matches_naive_join_randomized(spark, width):
    import random

    rnd = random.Random(42)
    lrows = [
        (i, s, s + rnd.randrange(0, 300))
        for i, s in ((i, rnd.randrange(0, 5000)) for i in range(150))
    ]
    rrows = [
        (i, s, s + rnd.randrange(0, 300))
        for i, s in ((i, rnd.randrange(0, 5000)) for i in range(150))
    ]
    left, right = _df(spark, lrows, "a"), _df(spark, rrows, "b")
    got = {
        (r["a_id"], r["b_id"])
        for r in interval_join(
            left, right, "a_s", "a_e", "b_s", "b_e", bucket_width=width
        ).collect()
    }
    want = {
        (a, b)
        for a, s1, e1 in lrows
        for b, s2, e2 in rrows
        if s1 <= e2 and s2 <= e1
    }
    assert got == want and len(want) > 100


def test_keyed_and_oracle_parity(spark):
    lrows = [(i, i % 3, 10 * i, 10 * i + 25) for i in range(60)]
    rrows = [(i, i % 3, 7 * i, 7 * i + 12) for i in range(60)]
    left = spark.createDataFrame(lrows, "a_id long, k long, a_s long, a_e long")
    right = spark.createDataFrame(rrows, "b_id long, k long, b_s long, b_e long")
    got = {
        (r["a_id"], r["b_id"])
        for r in interval_join(
            left, right, "a_s", "a_e", "b_s", "b_e", keys=["k"],
            bucket_width=50,
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lt AS SELECT * FROM (VALUES "
        + ", ".join(map(str, lrows))
        + ") t(a_id, k, a_s, a_e)"
    )
    con.execute(
        "CREATE TABLE rt AS SELECT * FROM (VALUES "
        + ", ".join(map(str, rrows))
        + ") t(b_id, k, b_s, b_e)"
    )
    want = {
        (a, b)
        for a, b in con.execute(
            interval_join_sql(
                "SELECT * FROM lt", "SELECT * FROM rt",
                "a_s", "a_e", "b_s", "b_e", keys=["k"],
                select="l.a_id, r.b_id",
            )
        ).fetchall()
    }
    assert got == want and len(want) > 20


def test_plan_is_equi_join_never_bnlj(spark):
    left = _df(spark, [(i, 10 * i, 10 * i + 15) for i in range(50)], "a")
    right = _df(spark, [(i, 8 * i, 8 * i + 9) for i in range(50)], "b")
    plan = interval_join(
        left, right, "a_s", "a_e", "b_s", "b_e", bucket_width=20
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_refusals_and_inverted_intervals(spark):
    left = _df(spark, [(1, 100, 0)], "a")  # inverted: dropped, not UB
    right = _df(spark, [(10, 0, 1000)], "b")
    assert (
        interval_join(left, right, "a_s", "a_e", "b_s", "b_e").count() == 0
    )
    with pytest.raises(ValueError, match="inner"):
        interval_join(left, right, "a_s", "a_e", "b_s", "b_e", how="left")
    with pytest.raises(ValueError, match="positive"):
        interval_join(left, right, "a_s", "a_e", "b_s", "b_e", bucket_width=0)


def test_negative_epochs_floor_correctly(spark):
    left = _df(spark, [(1, -25, -5)], "a")
    right = _df(spark, [(10, -10, 3), (11, -100, -30)], "b")
    got = {
        (r["a_id"], r["b_id"])
        for r in interval_join(
            left, right, "a_s", "a_e", "b_s", "b_e", bucket_width=10
        ).collect()
    }
    assert got == {(1, 10)}  # floor-div bucketing, not truncation
