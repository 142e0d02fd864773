"""Session-window query — the streaming-shaped operator (session_window) run
in batch mode, oracled against the closed-form lag+cumsum SQL. The same
expression runs as a Structured Streaming query (streaming/events.py);
batch≡stream is pinned in tests/test_streaming.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark.queries import query
from spookystuff_spark.queries.events import SESSION_GAP_SEC
from spookystuff_spark.tables import table


@query(
    "q_session_windows",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_SEC} * 1000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL {SESSION_GAP_SEC} SECOND AS session_end,
           count(*) AS n_events,
           round(1e-6 + sum(value), 2) AS total_value
    FROM sess GROUP BY user_id, sid
    """,
)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``session_window`` (gap 30 min): start = first event, end = last event
    + gap — exactly the lag+cumsum closed form the oracle computes.

    Boundary semantics (verified empirically on Spark 4): ``session_window``
    merges an event into the open session when its timestamp is <= the
    session's current end, i.e. a new session starts iff the full-precision
    gap is STRICTLY greater than the gap duration. The oracle mirrors this
    with integer microseconds (``epoch_us`` diff > gap*1e6) — no truncation,
    no double rounding, no flip zone."""
    from spookystuff_spark.streaming.events import sessionized

    ev = table(spark, sf_dir, "events")
    return sessionized(ev, gap=f"{SESSION_GAP_SEC} seconds")
