"""Structured Streaming parity: the streaming run must equal the batch run of
the same expression (Spark's unified semantics as the correctness oracle)."""

from __future__ import annotations

import pytest

from spookystuff_spark.streaming.events import (
    hourly_counts,
    run_stream_to_memory,
    sessionized,
    stream_events_from_dir,
)
from spookystuff_spark.tables import table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Re-land the events table as a multi-file parquet dir (stream source)."""
    d = tmp_path_factory.mktemp("events_stream")
    ev = table(spark, SF_SMOKE, "events")
    ev.repartition(4).write.mode("overwrite").parquet(str(d / "events"))
    return str(d / "events")


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_session_window_stream_equals_batch(spark, events_dir):
    ev_batch = spark.read.parquet(events_dir)
    expected = _rows(
        sessionized(ev_batch),
        ["user_id", "session_start", "n_events", "total_value"],
    )

    stream = stream_events_from_dir(spark, events_dir, ev_batch.schema)
    q = run_stream_to_memory(
        sessionized(stream, watermark="1 hour"), "sessions_t", "complete"
    )
    q.awaitTermination(120)
    got = _rows(
        spark.sql("SELECT * FROM sessions_t"),
        ["user_id", "session_start", "n_events", "total_value"],
    )
    assert got == expected
    assert len(got) > 0


def test_hourly_window_stream_equals_batch(spark, events_dir):
    ev_batch = spark.read.parquet(events_dir)
    expected = _rows(hourly_counts(ev_batch), ["hour", "event_type", "n_events"])

    stream = stream_events_from_dir(spark, events_dir, ev_batch.schema)
    q = run_stream_to_memory(
        hourly_counts(stream, watermark="1 hour"), "hourly_t", "complete"
    )
    q.awaitTermination(120)
    got = _rows(
        spark.sql("SELECT * FROM hourly_t"), ["hour", "event_type", "n_events"]
    )
    assert got == expected


def test_session_window_agrees_with_lag_sessionize(spark):
    """Two independent sessionization implementations must agree on counts
    (session_window vs lag+cumsum from queries/events.py)."""
    from spookystuff_spark.queries.events import q_events_sessionize

    ev = table(spark, SF_SMOKE, "events")
    via_window = (
        sessionized(ev)
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "n_sessions")
    )
    via_lag = q_events_sessionize(spark, SF_SMOKE).select("user_id", "n_sessions")
    a = _rows(via_window, ["user_id", "n_sessions"])
    b = _rows(via_lag, ["user_id", "n_sessions"])
    assert a == b
