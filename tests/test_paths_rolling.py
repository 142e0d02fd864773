"""Event-flow analytics (operators/paths.py) + rolling z-score
(operators/timeseries.py): closed-form transition/path/window cases and
DuckDB parity on the real events table."""

from __future__ import annotations

import duckdb

import pyspark.sql.functions as F
from spookystuff_spark.operators.paths import (
    event_transitions,
    top_paths,
    top_paths_sql,
    transitions_sql,
)
from spookystuff_spark.operators.timeseries import (
    rolling_zscore,
    rolling_zscore_sql,
)

EV = [  # user, epoch-s, id, type — user 1 has a session gap after 20
    (1, 10, 1, "a"), (1, 20, 2, "b"), (1, 4000, 3, "a"), (1, 4010, 4, "c"),
    (2, 10, 5, "a"), (2, 15, 6, "b"), (2, 20, 7, "c"),
]


def _ev(spark):
    return spark.createDataFrame(
        [(u, s, i, t) for u, s, i, t in EV],
        "user_id long, ts_s long, event_id long, event_type string",
    ).withColumn("ts", F.timestamp_seconds("ts_s"))


def test_transitions_closed_form(spark):
    got = {
        (r["src"], r["dst"]): r["n"]
        for r in event_transitions(_ev(spark)).collect()
    }
    # user1: a>b, b>a (across the gap — transitions ignore sessions), a>c
    # user2: a>b, b>c
    assert got == {("a", "b"): 2, ("b", "a"): 1, ("a", "c"): 1, ("b", "c"): 1}


def test_top_paths_closed_form(spark):
    got = {
        r["path"]: (r["n_sessions"], r["rank"])
        for r in top_paths(_ev(spark), gap_sec=1800, max_len=8, k=10).collect()
    }
    assert got == {"a>b": (1, 1), "a>b>c": (1, 2), "a>c": (1, 3)}


def test_flow_matches_duckdb_on_events(spark):
    from spookystuff_spark.tables import table

    sf = "/root/testdata/sf0.001"
    ev = table(spark, sf, "events")
    src = f"SELECT * FROM read_parquet('{sf}/events.parquet')"
    con = duckdb.connect()
    got_t = {
        (r["src"], r["dst"]): r["n"] for r in event_transitions(ev).collect()
    }
    want_t = {
        (a, b): n for a, b, n in con.execute(transitions_sql(src)).fetchall()
    }
    assert got_t == want_t and len(got_t) == 25
    got_p = {
        (r["path"], r["n_sessions"], r["rank"])
        for r in top_paths(ev, k=15).collect()
    }
    want_p = {tuple(r) for r in con.execute(top_paths_sql(src, k=15)).fetchall()}
    assert got_p == want_p and len(got_p) == 15


def test_rolling_zscore_closed_form(spark):
    rows = [("a", i, float(v)) for i, v in enumerate([10, 10, 10, 40])]
    df = spark.createDataFrame(rows, "k string, o long, v double")
    got = {
        r["o"]: (r["roll_mean"], r["roll_std"], r["zscore"])
        for r in rolling_zscore(df, ["k"], "o", "v", window_rows=3).collect()
    }
    assert got[0] == (10.0, None, None)          # 1-point window
    assert got[1][1] == 0.0 and got[1][2] is None  # zero variance → no z
    assert got[3][0] == 20.0 and got[3][2] is not None  # (40-20)/17.32


def test_rolling_matches_duckdb_on_events(spark):
    from spookystuff_spark.tables import table

    sf = "/root/testdata/sf0.001"
    ev = table(spark, sf, "events").select(
        "user_id", "event_id", "value"
    )
    got = {
        (r["user_id"], r["event_id"]): (r["roll_mean"], r["roll_std"], r["zscore"])
        for r in rolling_zscore(
            ev, ["user_id"], "event_id", "value", window_rows=12
        ).collect()
    }
    sql = rolling_zscore_sql(
        f"SELECT * FROM read_parquet('{sf}/events.parquet')",
        "user_id", "event_id", "value", window_rows=12,
    )
    want = {
        (int(r[0]), int(r[1])): (r[3], r[4], r[5])
        for r in duckdb.connect().execute(sql).fetchall()
    }
    assert len(got) == len(want) > 900
    assert got == want
