"""Event-stream queries (time bucketing, JSON extraction, sessionization).

The events table mirrors what the reference never had (no streaming —
SURVEY.md §2.8); batch implementations here, Structured Streaming variants in
``spookystuff_spark/streaming/``. Sessionization is the classic lag+cumsum
pattern: one shuffle on user_id, everything else window-local.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from spookystuff_spark.functions.rounding import round_stable
from spookystuff_spark.queries import bench_only, query
from spookystuff_spark.tables import table

SESSION_GAP_SEC = 1800


@query(
    "q_events_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           count(*) AS n_events,
           round(1e-6 + sum(value), 2) AS total_value,
           round(1e-6 + avg(value), 2) AS avg_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        round_stable(F.sum("value"), 2).alias("total_value"),
        round_stable(F.avg("value"), 2).alias("avg_value"),
    )


@query(
    "q_events_json_props",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(1e-6 + avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 2) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction stays JVM-side: get_json_object is a native
    Catalyst expression (no Python round-trip)."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        round_stable(F.avg(k), 2).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "q_events_sessionize",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id,
             CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > {SESSION_GAP_SEC} * 1000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    )
    SELECT user_id,
           CAST(sum(new_sess) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min idle → new session).

    Single shuffle on user_id; the lag window and the final per-user aggregate
    share that partitioning, so Catalyst reuses the exchange. At 100 TB the
    shuffle is keyed on user_id — high cardinality, no skew concern.
    """
    ev = table(spark, sf_dir, "events")
    return sessionize_counts(ev)


def sessionize_counts(ev: DataFrame) -> DataFrame:
    """Core lag+cumsum sessionization over any (user_id, ts, event_id) frame;
    split out so crafted-boundary regression tests can drive it directly."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    # Full-precision microsecond diff (timestamp_diff works for both TIMESTAMP
    # and TIMESTAMP_NTZ). A SECOND-unit diff would TRUNCATE the sub-second part
    # of the gap, so a 1800.886 s gap would read as 1800 and land on the wrong
    # side of the boundary — integer microseconds on both engine and oracle
    # (epoch_us) leave no flip zone and no double rounding.
    gap_us = F.timestamp_diff("MICROSECOND", prev_ts, F.col("ts"))
    new_sess = F.when(
        prev_ts.isNull() | (gap_us > SESSION_GAP_SEC * 1_000_000),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("new_sess", new_sess)
        .groupBy("user_id")
        .agg(
            F.sum("new_sess").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ------------------------------------------------------- resample/gap-fill

GAPFILL_INTERVAL = 3 * 3600
GAPFILL_USER_FILTER = "user_id % 5 = 0"


@bench_only("q_gapfill")
def q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket resample + gap-fill (operators/timeseries.py): per-user
    3-hour value rollups densified onto each user's full bucket spine, the
    holes filled by BOTH methods — last-observation-carried-forward and
    linear interpolation — and melted one gate row per (user, bucket,
    method). TimescaleDB time_bucket_gapfill / QuestDB SAMPLE-BY-FILL
    semantics; rides q_scalar_suite's oracle."""
    from functools import reduce

    from spookystuff_spark.operators.timeseries import gap_fill, resample
    from spookystuff_spark.queries.tpch_suites import _melt

    ev = table(spark, sf_dir, "events").where(F.expr(GAPFILL_USER_FILTER))
    rs = resample(
        ev, ["user_id"], "ts", "value", GAPFILL_INTERVAL, agg="sum"
    ).localCheckpoint(eager=True)  # both fills consume the same rollup
    parts = [
        _melt(
            gap_fill(rs, ["user_id"], GAPFILL_INTERVAL, method),
            f"gapfill_{method}",
            ["user_id", "bucket_s", "filled"],
            ["v"],
        )
        for method in ("locf", "linear")
    ]
    return reduce(DataFrame.unionByName, parts)


def _gapfill_oracle(method: str) -> str:
    from spookystuff_spark.operators.timeseries import gapfill_sql

    return gapfill_sql(
        f"SELECT * FROM events WHERE {GAPFILL_USER_FILTER}",
        "user_id", "ts", "value", GAPFILL_INTERVAL, method,
    )


ORACLE_GAPFILL_LOCF = _gapfill_oracle("locf")
ORACLE_GAPFILL_LINEAR = _gapfill_oracle("linear")


# ------------------------------------------------- funnel / cohort retention

FUNNEL_STEPS = ["signup", "view", "click", "purchase"]
RETENTION_MAX_OFFSET = 26


@bench_only("q_funnel_retention")
def q_funnel_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel reach counts + weekly cohort retention cells
    (operators/funnel.py) melted one gate row each — exact integer
    counts, the strongest oracle tier. Rides q_scalar_suite."""
    from functools import reduce

    from spookystuff_spark.operators.funnel import (
        cohort_retention,
        funnel_counts,
    )
    from spookystuff_spark.queries.tpch_suites import _melt

    ev = table(spark, sf_dir, "events")
    parts = [
        _melt(
            funnel_counts(ev, FUNNEL_STEPS),
            "funnel",
            ["step_idx", "step"],
            ["n_users"],
        ),
        _melt(
            cohort_retention(ev, max_offset=RETENTION_MAX_OFFSET),
            "retention",
            ["cohort_week", "week_offset"],
            ["n_users"],
        ),
    ]
    return reduce(DataFrame.unionByName, parts)


def _funnel_oracles() -> tuple[str, str]:
    from spookystuff_spark.operators.funnel import funnel_sql, retention_sql

    return (
        funnel_sql("SELECT * FROM events", FUNNEL_STEPS),
        retention_sql("SELECT * FROM events", max_offset=RETENTION_MAX_OFFSET),
    )


ORACLE_FUNNEL, ORACLE_RETENTION = _funnel_oracles()


# ---------------------------------------------------------- interval join

ERR_WINDOW_S = 1800


@bench_only("q_interval_join")
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized interval-overlap join (operators/intervals.py): every
    error event opens a ±30-min window; purchases of the SAME user landing
    inside it pair up (the on-call question 'which purchases happened
    around an error?'). The plan is an equi-join on (user, bucket) — never
    the BNLJ Catalyst would pick for the raw inequality — and the oracle
    IS that raw inequality join in DuckDB. Rides q_scalar_suite."""
    from spookystuff_spark.operators.intervals import interval_join

    ev = table(spark, sf_dir, "events")
    ep = F.unix_timestamp("ts").cast("long")
    err = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        (ep - ERR_WINDOW_S).alias("a_s"),
        (ep + ERR_WINDOW_S).alias("a_e"),
        ep.alias("a_ts"),
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pur_id"),
        "user_id",
        ep.alias("b_s"),
        ep.alias("b_e"),
    )
    return interval_join(
        err, pur, "a_s", "a_e", "b_s", "b_e",
        keys=["user_id"], bucket_width=ERR_WINDOW_S,
    ).select(
        "err_id", "pur_id", (F.col("b_s") - F.col("a_ts")).alias("gap_s")
    )


def _interval_oracle() -> str:
    from spookystuff_spark.operators.intervals import interval_join_sql

    ep = "CAST(floor(epoch(ts)) AS BIGINT)"
    err = f"""SELECT event_id AS err_id, user_id,
                     {ep} - {ERR_WINDOW_S} AS a_s,
                     {ep} + {ERR_WINDOW_S} AS a_e,
                     {ep} AS a_ts
              FROM events WHERE event_type = 'error'"""
    pur = f"""SELECT event_id AS pur_id, user_id, {ep} AS b_s, {ep} AS b_e
              FROM events WHERE event_type = 'purchase'"""
    return interval_join_sql(
        err, pur, "a_s", "a_e", "b_s", "b_e", keys=["user_id"],
        select="l.err_id, r.pur_id, r.b_s - l.a_ts AS gap_s",
    )


ORACLE_INTERVAL_JOIN = _interval_oracle()


# ----------------------------------------------- event flow / rolling stats

ROLLING_WINDOW = 12
ROLLING_USER_FILTER = "user_id % 10 = 0"


@bench_only("q_event_flow")
def q_event_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition counts + top session paths (operators/paths.py)
    melted one gate row each — the Sankey/flow-view queries, exact
    integer counts. Rides q_scalar_suite."""
    from functools import reduce

    from spookystuff_spark.operators.paths import event_transitions, top_paths
    from spookystuff_spark.queries.tpch_suites import _melt

    ev = table(spark, sf_dir, "events")
    parts = [
        _melt(event_transitions(ev), "transitions", ["src", "dst"], ["n"]),
        _melt(
            top_paths(ev, k=20),
            "toppaths",
            ["path"],
            ["n_sessions", "rank"],
        ),
    ]
    return reduce(DataFrame.unionByName, parts)


@bench_only("q_rolling_zscore")
def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly scores per user (operators/timeseries.py
    rolling_zscore): mean / sample-stddev / z over the last 12 events,
    NULLs (cold window, zero variance) pinned via a sentinel so the
    null-handling is part of the oracle contract. Rides q_scalar_suite."""
    from spookystuff_spark.operators.timeseries import rolling_zscore

    ev = table(spark, sf_dir, "events").where(F.expr(ROLLING_USER_FILTER))
    rz = rolling_zscore(
        ev.select("user_id", "event_id", "value"),
        ["user_id"], "event_id", "value", window_rows=ROLLING_WINDOW,
    )
    return rz.select(
        F.lit("q_rolling_zscore").alias("q"),
        F.concat_ws("|", "user_id", "event_id").alias("row_key"),
        F.lit("rz").alias("measure"),
        (
            F.coalesce(F.col("roll_mean"), F.lit(-999.0))
            + F.coalesce(F.col("roll_std"), F.lit(-999.0)) * 1000
            + F.coalesce(F.col("zscore"), F.lit(-999.0)) * 1000000
        ).alias("v_num"),
    )


def _flow_oracles() -> tuple[str, str, str]:
    from spookystuff_spark.operators.paths import top_paths_sql, transitions_sql
    from spookystuff_spark.operators.timeseries import rolling_zscore_sql

    rz = rolling_zscore_sql(
        f"SELECT * FROM events WHERE {ROLLING_USER_FILTER}",
        "user_id", "event_id", "value", window_rows=ROLLING_WINDOW,
    )
    rz_melt = f"""
    SELECT 'q_rolling_zscore' AS q,
           concat_ws('|', CAST(k AS VARCHAR), CAST(o AS VARCHAR)) AS row_key,
           'rz' AS measure,
           COALESCE(roll_mean, -999.0)
             + COALESCE(roll_std, -999.0) * 1000
             + COALESCE(zscore, -999.0) * 1000000 AS v_num
    FROM ({rz})"""
    return (
        transitions_sql("SELECT * FROM events"),
        top_paths_sql("SELECT * FROM events", k=20),
        rz_melt,
    )


ORACLE_TRANSITIONS, ORACLE_TOPPATHS, ORACLE_ROLLING_Z = _flow_oracles()
