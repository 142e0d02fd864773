"""Funnel + cohort retention (operators/funnel.py): closed-form ordering
cases (out-of-order steps must NOT count) and Spark↔DuckDB parity on the
real events table."""

from __future__ import annotations

import duckdb
import pytest

import pyspark.sql.functions as F
from spookystuff_spark.operators.funnel import (
    cohort_retention,
    funnel_counts,
    funnel_sql,
    retention_sql,
)

EV = [  # user, epoch-s, type
    (1, 10, "view"), (1, 20, "click"), (1, 30, "buy"),      # full funnel
    (2, 10, "view"), (2, 20, "click"),                      # stops at click
    (3, 10, "click"), (3, 20, "view"), (3, 30, "buy"),      # click BEFORE view
    (4, 10, "buy"), (4, 20, "view"),                        # buy before view
    (5, 10, "view"), (5, 15, "view"), (5, 20, "click"),     # repeats fine
]


def _ev(spark):
    return spark.createDataFrame(
        [(u, s, t) for u, s, t in EV], "user_id long, ts_s long, event_type string"
    ).withColumn("ts", F.timestamp_seconds("ts_s"))


def test_funnel_ordering_semantics(spark):
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts(_ev(spark), ["view", "click", "buy"]).collect()
    }
    # user 3's click precedes their view → counts for view only... until
    # the buy, which follows their view but needs a click AFTER the view
    assert got == {"view": 5, "click": 3, "buy": 1}
    with pytest.raises(ValueError, match="at least one step"):
        funnel_counts(_ev(spark), [])


def test_retention_cells(spark):
    rows = [(1, 0, "a"), (1, 8 * 86400, "a"), (2, 0, "a"), (2, 15 * 86400, "a")]
    df = spark.createDataFrame(
        [(u, s, t) for u, s, t in rows], "user_id long, ts_s long, event_type string"
    ).withColumn("ts", F.timestamp_seconds("ts_s"))
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1}


@pytest.mark.parametrize(
    "steps", [["view", "click", "purchase"], ["click", "view"]]
)
def test_funnel_matches_duckdb_on_events(spark, steps):
    from spookystuff_spark.tables import table

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in funnel_counts(table(spark, sf, "events"), steps).collect()
    )
    want = sorted(
        tuple(r)
        for r in duckdb.connect()
        .execute(
            funnel_sql(
                f"SELECT * FROM read_parquet('{sf}/events.parquet')", steps
            )
        )
        .fetchall()
    )
    assert got == want and got[0][2] > 0


def test_retention_matches_duckdb_on_events(spark):
    from spookystuff_spark.tables import table

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r)
        for r in cohort_retention(
            table(spark, sf, "events"), max_offset=10
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in duckdb.connect()
        .execute(
            retention_sql(
                f"SELECT * FROM read_parquet('{sf}/events.parquet')",
                max_offset=10,
            )
        )
        .fetchall()
    )
    assert got == want and len(got) > 0
