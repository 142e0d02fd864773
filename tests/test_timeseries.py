"""Resample + gap-fill (operators/timeseries.py): closed-form fills on a
hand-built gappy series, spine density invariants, and Spark↔DuckDB parity
of the full pipeline on the real events table."""

from __future__ import annotations

import duckdb
import pytest

import pyspark.sql.functions as F
from spookystuff_spark.operators.timeseries import (
    gap_fill,
    gapfill_sql,
    resample,
)

ROWS = [  # key, epoch-seconds, value — key a has holes at 20 and 30
    ("a", 5, 1.0), ("a", 12, 3.0), ("a", 41, 9.0), ("a", 44, 11.0),
    ("b", 100, 5.0),
]


def _series(spark):
    return spark.createDataFrame(
        [(k, s, v) for k, s, v in ROWS], "k string, ts_s long, value double"
    ).withColumn("ts", F.timestamp_seconds("ts_s"))


@pytest.fixture
def rs(spark):
    return resample(_series(spark), ["k"], "ts", "value", 10, agg="sum")


def test_resample_buckets_and_sums(rs):
    got = {(r["k"], r["bucket_s"]): r["v"] for r in rs.collect()}
    assert got == {("a", 0): 1.0, ("a", 10): 3.0, ("a", 40): 20.0,
                   ("b", 100): 5.0}


def test_gap_fill_locf_linear_zero(spark, rs):
    locf = {
        (r["k"], r["bucket_s"]): (r["v"], r["filled"])
        for r in gap_fill(rs, ["k"], 10, "locf").collect()
    }
    assert locf[("a", 20)] == (3.0, 1) and locf[("a", 30)] == (3.0, 1)
    assert locf[("a", 40)] == (20.0, 0) and locf[("b", 100)] == (5.0, 0)
    lin = {
        (r["k"], r["bucket_s"]): r["v"]
        for r in gap_fill(rs, ["k"], 10, "linear").collect()
    }
    # interpolate 3.0 → 20.0 over buckets 10..40
    assert lin[("a", 20)] == pytest.approx(8.67) and lin[("a", 30)] == pytest.approx(14.33)
    assert lin[("a", 0)] == 1.0 and lin[("a", 40)] == 20.0  # observed untouched
    zero = {
        (r["k"], r["bucket_s"]): r["v"]
        for r in gap_fill(rs, ["k"], 10, "zero").collect()
    }
    assert zero[("a", 20)] == 0.0 and zero[("a", 40)] == 20.0


def test_spine_is_dense_per_key(spark, rs):
    out = gap_fill(rs, ["k"], 10, "locf")
    per_key = {
        r["k"]: r["n"]
        for r in out.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_key == {"a": 5, "b": 1}  # a: 0..40 step 10; b: single bucket
    with pytest.raises(ValueError, match="fill method"):
        gap_fill(rs, ["k"], 10, "bogus")


@pytest.mark.parametrize("method", ["locf", "linear", "zero"])
def test_matches_duckdb_on_events(spark, method):
    """Full pipeline parity on the real table — the same comparison the
    correctness gate runs, per fill method."""
    from spookystuff_spark.tables import table

    sf = "/root/testdata/sf0.001"
    ev = table(spark, sf, "events")
    got = gap_fill(
        resample(ev, ["user_id"], "ts", "value", 3600, agg="sum"),
        ["user_id"], 3600, method,
    )
    sql = gapfill_sql(
        f"SELECT * FROM read_parquet('{sf}/events.parquet')",
        "user_id", "ts", "value", 3600, method,
    )
    want = duckdb.connect().execute(sql).fetchdf()
    g = {
        (r["user_id"], r["bucket_s"]): (round(r["v"], 2), r["filled"])
        for r in got.collect()
    }
    w = {
        (int(r.k), int(r.bucket_s)): (round(float(r.v), 2), int(r.filled))
        for r in want.itertuples()
    }
    assert g == w and len(g) > 100


def test_gapfill_plan_no_nested_loop(spark, rs):
    for method in ("locf", "linear"):
        plan = (
            gap_fill(rs, ["k"], 10, method)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_gapfill_properties_random(spark):
    """Randomized invariants across fills: dense per-key spine, observed
    buckets keep exact values under every method, LOCF holes equal the
    nearest earlier observation, linear holes sit between their
    neighbors."""
    import random

    rnd = random.Random(7)
    rows = [
        (f"k{u}", rnd.randrange(0, 500), round(rnd.uniform(-50, 50), 2))
        for u in range(6)
        for _ in range(rnd.randrange(1, 25))
    ]
    df = spark.createDataFrame(rows, "k string, ts_s long, value double")
    import pyspark.sql.functions as F

    rs = resample(
        df.withColumn("ts", F.timestamp_seconds("ts_s")),
        ["k"], "ts", "value", 20, agg="sum",
    ).localCheckpoint(eager=True)
    observed = {(r["k"], r["bucket_s"]): r["v"] for r in rs.collect()}
    spans = {}
    for (k, b) in observed:
        lo, hi = spans.get(k, (b, b))
        spans[k] = (min(lo, b), max(hi, b))
    for method in ("locf", "linear", "zero"):
        out = {(r["k"], r["bucket_s"]): r["v"]
               for r in gap_fill(rs, ["k"], 20, method).collect()}
        # dense spine, exactly [lo, hi] step 20, per key
        want_keys = {
            (k, b)
            for k, (lo, hi) in spans.items()
            for b in range(lo, hi + 1, 20)
        }
        assert set(out) == want_keys
        for key, v in observed.items():
            assert out[key] == v  # observed untouched
        if method == "locf":
            for (k, b), v in out.items():
                if (k, b) not in observed:
                    prev = max(
                        bb for (kk, bb) in observed if kk == k and bb < b
                    )
                    assert v == observed[(k, prev)]
        if method == "linear":
            for (k, b), v in out.items():
                if (k, b) not in observed:
                    prevs = [bb for (kk, bb) in observed if kk == k and bb < b]
                    nexts = [bb for (kk, bb) in observed if kk == k and bb > b]
                    lo_v = observed[(k, max(prevs))]
                    hi_v = observed[(k, min(nexts))]
                    assert min(lo_v, hi_v) - 0.01 <= v <= max(lo_v, hi_v) + 0.01
