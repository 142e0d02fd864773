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
                       OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_SEC}
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
    + gap — exactly the lag+cumsum closed form the oracle computes."""
    from spookystuff_spark.streaming.events import sessionized

    ev = table(spark, sf_dir, "events")
    return sessionized(ev, gap=f"{SESSION_GAP_SEC} seconds")
