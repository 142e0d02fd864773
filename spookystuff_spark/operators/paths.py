"""Event-flow analytics: Markov transitions and top session paths.

The two queries behind every product-analytics flow view (Sankey /
"users who did X then did Y"):

* :func:`event_transitions` — (src, dst, n) counts of consecutive
  event-type pairs per user. One shuffle on the user column for the lag
  window; the pair count partial-aggregates map-side. Ordering ties
  break on the event id, so the result is layout-independent.
* :func:`top_paths` — sessionize (gap rule), truncate each session to
  its first ``max_len`` events (bounding the path string — the cap every
  real flow view applies), concatenate the ordered types into a path,
  count paths. Two shuffles: the user window and the path count; the
  per-session ordered aggregation is ``sort_array`` over
  (ts, id, type) structs — never a Python stage, and memory per session
  is bounded by ``max_len`` after the rank filter.

Exact integer counts — strongest oracle tier. The reference has no
event-analytics surface (SURVEY §2.8).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from spookystuff_spark.queries.events import SESSION_GAP_SEC


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(src, dst, n): consecutive event-type pairs within each user's
    timeline. Deterministic under ties via the id tiebreak."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    return (
        events.withColumn("_next", F.lead(type_col).over(w))
        .where(F.col("_next").isNotNull())
        .groupBy(F.col(type_col).alias("src"), F.col("_next").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def transitions_sql(
    events_sql: str,
    user_sql: str = "user_id",
    ts_sql: str = "ts",
    type_sql: str = "event_type",
    id_sql: str = "event_id",
) -> str:
    return f"""
WITH nxt AS (
  SELECT {type_sql} AS src,
         lead({type_sql}) OVER (PARTITION BY {user_sql}
                                ORDER BY {ts_sql}, {id_sql}) AS dst
  FROM ({events_sql})
)
SELECT src, dst, count(*) AS n FROM nxt WHERE dst IS NOT NULL
GROUP BY src, dst"""


def top_paths(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    gap_sec: int = SESSION_GAP_SEC,
    max_len: int = 8,
    k: int = 20,
) -> DataFrame:
    """(path, n_sessions, rank): the ``k`` most common session-opening
    event sequences (first ``max_len`` events of each gap-session),
    rendered ``a>b>c``. Rank ties break on the path string."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(ts_col).over(w)
    gap_us = F.timestamp_diff("MICROSECOND", prev_ts, F.col(ts_col))
    new_sess = F.when(
        prev_ts.isNull() | (gap_us > gap_sec * 1_000_000), 1
    ).otherwise(0)
    sess = (
        events.withColumn("_new", new_sess)
        .withColumn("_sess", F.sum("_new").over(w))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(user_col, "_sess").orderBy(ts_col, id_col)
            ),
        )
        .where(F.col("_rn") <= max_len)
    )
    paths = (
        sess.groupBy(user_col, "_sess")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(ts_col, id_col, F.col(type_col).alias("t"))
                        )
                    ),
                    lambda s: s["t"],
                ),
                ">",
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    wr = Window.orderBy(F.col("n_sessions").desc(), F.col("path"))
    return (
        paths.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
    )


def top_paths_sql(
    events_sql: str,
    user_sql: str = "user_id",
    ts_sql: str = "ts",
    type_sql: str = "event_type",
    id_sql: str = "event_id",
    gap_sec: int = SESSION_GAP_SEC,
    max_len: int = 8,
    k: int = 20,
) -> str:
    return f"""
WITH ordered AS (
  SELECT {user_sql} AS u, {ts_sql} AS ts, {id_sql} AS eid,
         {type_sql} AS et,
         lag({ts_sql}) OVER (PARTITION BY {user_sql}
                             ORDER BY {ts_sql}, {id_sql}) AS prev_ts
  FROM ({events_sql})
), flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                      OR epoch_us(ts) - epoch_us(prev_ts)
                         > {gap_sec} * 1000000
                 THEN 1 ELSE 0 END AS new_sess
  FROM ordered
), sess AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY u ORDER BY ts, eid) AS sid
  FROM flagged
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY u, sid ORDER BY ts, eid) AS rn
  FROM sess
), paths AS (
  SELECT u, sid, string_agg(et, '>' ORDER BY ts, eid) AS path
  FROM ranked WHERE rn <= {max_len} GROUP BY u, sid
), counted AS (
  SELECT path, count(*) AS n_sessions FROM paths GROUP BY path
)
SELECT path, n_sessions,
       CAST(row_number() OVER (ORDER BY n_sessions DESC, path) AS INTEGER)
         AS rank
FROM counted QUALIFY rank <= {k}"""
