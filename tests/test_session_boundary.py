"""Regression tests for sessionization second-boundary semantics.

Round-3 verdict: a 1800.886 s gap flipped between engine and oracle because the
engine diffed in truncated SECONDs while the oracle diffed full-precision
epochs. Both sides now use integer microseconds; these tests pin the crafted
flip-zone gaps (1800.2 s, 1800.9 s, exactly 1800.0 s, 1800.000001 s) against
the closed form for BOTH the lag+cumsum path (q_events_sessionize) and the
session_window path (q_session_windows / streaming).
"""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from spookystuff_spark.queries.events import SESSION_GAP_SEC, sessionize_counts
from spookystuff_spark.streaming.events import sessionized

T0 = datetime.datetime(2020, 1, 1, 0, 0, 0, 500000)


def _mk(spark, specs):
    """specs: {user: [gap_seconds_between_consecutive_events...]} — first event
    at T0, each next event at prev + gap (float seconds, µs resolution)."""
    rows = []
    for user, gaps in specs.items():
        ts = T0
        rows.append((user, ts, 0))
        for i, g in enumerate(gaps, start=1):
            ts = ts + datetime.timedelta(microseconds=round(g * 1_000_000))
            rows.append((user, ts, i))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_id long")
    return df.withColumn("value", F.lit(1.0))


SPECS = {
    # gap > 1800 strictly -> new session (both paths)
    "flip_low": [1800.2],        # 2 sessions
    "flip_high": [1800.9],       # 2 sessions
    "exact": [1800.0],           # exactly the gap -> SAME session (strict >)
    "just_over": [1800.000001],  # 2 sessions
    "just_under": [1799.999999], # 1 session
    "mixed": [10.0, 1800.886, 5.0, 1800.0, 1801.0],  # 3 sessions, 6 events
}

EXPECTED_SESSIONS = {
    "flip_low": 2,
    "flip_high": 2,
    "exact": 1,
    "just_over": 2,
    "just_under": 1,
    "mixed": 3,
}


def test_sessionize_counts_boundary(spark):
    ev = _mk(spark, SPECS)
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in sessionize_counts(ev).collect()
    }
    for user, n_sess in EXPECTED_SESSIONS.items():
        assert got[user] == (n_sess, len(SPECS[user]) + 1), user


def test_session_window_boundary(spark):
    ev = _mk(spark, SPECS)
    sess = sessionized(ev, gap=f"{SESSION_GAP_SEC} seconds")
    counts = {
        r["user_id"]: r["n"]
        for r in sess.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == EXPECTED_SESSIONS


def test_sessionize_matches_duckdb_oracle_on_crafted_gaps(spark, tmp_path):
    """End-to-end engine-vs-oracle parity on the crafted flip-zone data, using
    the exact oracle SQL registered for q_events_sessionize."""
    import duckdb

    from spookystuff_spark.queries import ORACLE

    ev = _mk(spark, SPECS)
    pdf = ev.toPandas()
    con = duckdb.connect()
    con.register("events", pdf)
    sql = ORACLE["q_events_sessionize"]
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(sql).fetchall()
    }
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in sessionize_counts(ev).collect()
    }
    assert got == oracle
