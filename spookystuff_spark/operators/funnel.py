"""Ordered-funnel and cohort-retention analysis over event streams.

The two classic event-analytics operators (Amplitude/Mixpanel-style),
Spark-first and exact:

* :func:`funnel_counts` — how many users reach step k of an ordered
  event-type funnel, where step k must occur STRICTLY AFTER the user's
  earliest completion of step k-1 (the standard "unordered in between,
  ordered overall" funnel). Implemented as k chained
  filter→join→groupBy-min passes, every one keyed on the user column —
  one logical shuffle key throughout, no window over the full event
  stream, no per-user event-list materialization (the thing that OOMs at
  100 TB when a power user has 10^8 events).
* :func:`cohort_retention` — users bucketed by the WEEK INDEX of their
  first event (integer ``floor(epoch_days / 7)`` — engine-portable, no
  week-start convention to disagree on), counted per (cohort, offset)
  cell of distinct active users. Two shuffles: first-event per user,
  then the cell count.

Counts are exact integers — the strongest oracle tier. The reference has
no event-analytics surface (SURVEY §2.8); these round out the events
family with the queries any warehouse user expects.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DAY_S = 86_400
WEEK_S = 7 * DAY_S


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step_idx, step, n_users): users whose earliest chain reaches each
    funnel step in order. Greedy earliest-completion is optimal here: if
    ANY ordered chain exists, the chain of earliest valid timestamps
    exists too, so min-chaining loses nobody."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    spark = events.sparkSession
    reached = None  # (user, t_k): earliest completion of step k
    out = []
    for idx, step in enumerate(steps):
        matching = events.where(F.col(type_col) == step)
        if reached is None:
            cur = matching.groupBy(user_col).agg(F.min(ts_col).alias("_t"))
        else:
            cur = (
                matching.join(reached, user_col)
                .where(F.col(ts_col) > F.col("_t"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("_t"))
            )
        # the per-step frame feeds both the count and the next join
        cur = cur.localCheckpoint(eager=True)
        out.append((idx + 1, step, cur.count()))
        reached = cur
    return spark.createDataFrame(
        out, "step_idx int, step string, n_users long"
    )


def funnel_sql(
    events_sql: str,
    steps: Sequence[str],
    user_sql: str = "user_id",
    ts_sql: str = "ts",
    type_sql: str = "event_type",
) -> str:
    """DuckDB twin of :func:`funnel_counts` (oracle)."""
    ctes, prev = [], None
    for i, step in enumerate(steps, start=1):
        if prev is None:
            ctes.append(
                f"s{i} AS (SELECT {user_sql} AS u, min({ts_sql}) AS t "
                f"FROM ({events_sql}) WHERE {type_sql} = '{step}' "
                f"GROUP BY 1)"
            )
        else:
            ctes.append(
                f"s{i} AS (SELECT e.{user_sql} AS u, min(e.{ts_sql}) AS t "
                f"FROM ({events_sql}) e JOIN {prev} p ON e.{user_sql} = p.u "
                f"WHERE e.{type_sql} = '{step}' AND e.{ts_sql} > p.t "
                f"GROUP BY 1)"
            )
        prev = f"s{i}"
    selects = " UNION ALL ".join(
        f"SELECT {i} AS step_idx, '{s}' AS step, "
        f"(SELECT count(*) FROM s{i}) AS n_users"
        for i, s in enumerate(steps, start=1)
    )
    return f"WITH {', '.join(ctes)} {selects}"


def _week_idx(ts_col):
    ep = F.unix_timestamp(ts_col)
    return ((ep - (ep % F.lit(WEEK_S))) / F.lit(WEEK_S)).cast("long")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """(cohort_week, week_offset, n_users): distinct users of each
    first-event cohort active again ``week_offset`` weeks later.
    ``cohort_week`` is the integer week index (epoch // 1 week)."""
    firsts = events.groupBy(user_col).agg(
        _week_idx(F.min(ts_col)).alias("cohort_week")
    )
    active = events.select(
        user_col, _week_idx(F.col(ts_col)).alias("_wk")
    ).distinct()
    cells = (
        active.join(firsts, user_col)
        .withColumn("week_offset", (F.col("_wk") - F.col("cohort_week")).cast("int"))
    )
    if max_offset is not None:
        cells = cells.where(F.col("week_offset") <= max_offset)
    return cells.groupBy("cohort_week", "week_offset").agg(
        F.count_distinct(user_col).alias("n_users")
    )


def retention_sql(
    events_sql: str,
    user_sql: str = "user_id",
    ts_sql: str = "ts",
    max_offset: int | None = None,
) -> str:
    """DuckDB twin of :func:`cohort_retention` (oracle)."""
    wk = f"CAST(floor(epoch({ts_sql})) AS BIGINT) // {WEEK_S}"
    wk_min = f"CAST(floor(epoch(min({ts_sql}))) AS BIGINT) // {WEEK_S}"
    bound = f"WHERE week_offset <= {max_offset}" if max_offset is not None else ""
    return f"""
WITH firsts AS (
  SELECT {user_sql} AS u, {wk_min} AS cohort_week
  FROM ({events_sql}) GROUP BY 1
), active AS (
  SELECT DISTINCT {user_sql} AS u, {wk} AS wk FROM ({events_sql})
), cells AS (
  SELECT f.cohort_week, CAST(a.wk - f.cohort_week AS INTEGER) AS week_offset,
         a.u
  FROM active a JOIN firsts f USING (u)
)
SELECT cohort_week, week_offset, count(DISTINCT u) AS n_users
FROM cells {bound} GROUP BY 1, 2"""
