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


def test_append_mode_watermark_emits_closed_windows(spark, tmp_path):
    """Append output mode emits ONLY windows the watermark has passed: with
    max event time 02:05 and a 1h watermark, the hour-0 window finalizes and
    the hour-2 window is withheld as still-open state. (Exact late-row
    exclusion depends on micro-batch boundaries — availableNow may coalesce
    file drops — so this asserts the boundary-independent contract.)"""
    import datetime as dt

    import pandas as pd

    src = str(tmp_path / "late_drops")
    import os

    os.makedirs(src, exist_ok=True)
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return base + dt.timedelta(minutes=minutes)

    # drop 1: two events in hour-0, one in hour-2 (advances watermark far)
    pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "ts": [ts(5), ts(10), ts(125)],
            "event_type": ["click"] * 3,
            "value": [1.0, 1.0, 1.0],
        }
    ).to_parquet(src + "/d1.parquet", coerce_timestamps="us", allow_truncated_timestamps=True)
    # drop 2: a LATE row for hour-0 — watermark (max 02:05 - 1h = 01:05)
    # has passed hour-0 entirely, so it must be dropped
    pd.DataFrame(
        {
            "user_id": [1],
            "ts": [ts(15)],
            "event_type": ["click"],
            "value": [100.0],
        }
    ).to_parquet(src + "/d2.parquet", coerce_timestamps="us", allow_truncated_timestamps=True)

    schema = "user_id long, ts timestamp, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from spookystuff_spark.streaming.events import hourly_counts

    q = (
        hourly_counts(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("late_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.hour: r.n_events for r in spark.sql("SELECT * FROM late_t").collect()}
    assert base in rows  # hour-0 finalized (watermark 01:05 passed its end)
    hour2 = base + dt.timedelta(hours=2)
    assert hour2 not in rows  # hour-2 still open — withheld in append mode


def test_streaming_exact_dedup_matches_batch(spark, tmp_path):
    """dedup_stream (watermark-bounded dropDuplicates on the content
    fingerprint) keeps exactly one row per normalized text — same set a
    batch groupBy-fingerprint pass retains."""
    import pyspark.sql.functions as F

    from spookystuff_spark.operators.text import fingerprint
    from spookystuff_spark.streaming.dedup_stream import dedup_stream

    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"doc_id": 1, "text": "Alpha beta gamma.", "ts": "2024-01-01 00:00:01"},
        {"doc_id": 2, "text": "alpha  beta gamma.", "ts": "2024-01-01 00:00:02"},  # dup (normalized)
        {"doc_id": 3, "text": "Something else entirely.", "ts": "2024-01-01 00:00:03"},
        {"doc_id": 4, "text": "Alpha beta gamma.", "ts": "2024-01-01 00:00:04"},  # dup
    ]
    batch = spark.createDataFrame(rows).withColumn("ts", F.to_timestamp("ts"))
    batch.write.parquet(str(src / "p0"))

    stream = (
        spark.readStream.schema(batch.schema).parquet(str(src / "*"))
    )
    out_rows = []
    q = (
        dedup_stream(stream, text_col="text", ts_col="ts")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("select * from dedup_out").collect()
    finally:
        q.stop()

    got_fps = sorted(
        r.fp for r in spark.createDataFrame([{"text": r.text} for r in out])
        .select(fingerprint(F.col("text")).alias("fp")).collect()
    )
    expected_fps = sorted(
        r.fp for r in batch.select(fingerprint(F.col("text")).alias("fp")).distinct().collect()
    )
    assert got_fps == expected_fps  # one survivor per normalized content
    assert len(out) == 2


def test_stream_static_join_equals_batch(spark, events_dir):
    import pyspark.sql.functions as F

    from spookystuff_spark.streaming.events import enriched_by_user_segment

    ev_batch = spark.read.parquet(events_dir)
    segments = (
        ev_batch.select("user_id")
        .distinct()
        .withColumn("segment", F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd"))
    )
    expected = _rows(
        enriched_by_user_segment(ev_batch, segments),
        ["segment", "hour", "n_events", "total_value"],
    )
    stream = stream_events_from_dir(spark, events_dir, ev_batch.schema)
    q = run_stream_to_memory(
        enriched_by_user_segment(stream, segments, watermark="1 hour"),
        "enriched_t",
        "complete",
    )
    q.awaitTermination(120)
    got = _rows(
        spark.sql("SELECT * FROM enriched_t"),
        ["segment", "hour", "n_events", "total_value"],
    )
    assert got == expected and len(got) > 0


def test_windowed_hll_stream_equals_batch(spark, events_dir):
    """Streaming HLL: the register table is one supported streaming agg
    (max is monotone/mergeable); finished estimates must equal the batch
    run of the same expressions, and the per-window register state must be
    bounded by 2^p."""
    from spookystuff_spark.streaming.sketch_stream import (
        finish_windowed_hll,
        windowed_hll_registers,
    )

    ev_batch = spark.read.parquet(events_dir)
    expected = _rows(
        finish_windowed_hll(windowed_hll_registers(ev_batch, p=8), p=8),
        ["window_start", "event_type", "est_distinct", "zero_regs"],
    )
    assert len(expected) > 0

    stream = stream_events_from_dir(spark, events_dir, ev_batch.schema)
    q = run_stream_to_memory(
        windowed_hll_registers(stream, watermark="1 hour", p=8),
        "hll_regs_t",
        "complete",
    )
    q.awaitTermination(120)
    regs = spark.sql("SELECT * FROM hll_regs_t")
    # state bound: at most 2^p register rows per (window, group)
    import pyspark.sql.functions as F

    per_group = regs.groupBy("window_start", "event_type").count().collect()
    assert all(r["count"] <= 256 for r in per_group)
    got = _rows(
        finish_windowed_hll(regs, p=8),
        ["window_start", "event_type", "est_distinct", "zero_regs"],
    )
    assert got == expected


def test_windowed_cms_stream_equals_batch(spark, events_dir):
    """Streaming Count-Min: the counter grid is one supported streaming agg
    (sum is mergeable); the streamed sketch must equal the batch sketch and
    stay bounded at depth x width rows per window."""
    from spookystuff_spark.streaming.sketch_stream import windowed_cms_sketch

    ev_batch = spark.read.parquet(events_dir)
    expected = sorted(
        map(tuple, windowed_cms_sketch(ev_batch, depth=2, width=64).collect())
    )
    assert len(expected) > 0

    stream = stream_events_from_dir(spark, events_dir, ev_batch.schema)
    q = run_stream_to_memory(
        windowed_cms_sketch(stream, watermark="1 hour", depth=2, width=64),
        "cms_t",
        "complete",
    )
    q.awaitTermination(120)
    got_df = spark.sql("SELECT * FROM cms_t")
    per_win = got_df.groupBy("window_start").count().collect()
    assert all(r["count"] <= 2 * 64 for r in per_win)
    assert sorted(map(tuple, got_df.collect())) == expected


def test_stream_stream_attribution_join_equals_batch(spark, events_dir):
    import pyspark.sql.functions as F

    from spookystuff_spark.streaming.events import click_purchase_attribution

    ev_batch = spark.read.parquet(events_dir)
    clicks_b = ev_batch.filter(F.col("event_type") == "click")
    purch_b = ev_batch.filter(F.col("event_type") == "purchase")
    cols = ["user_id", "click_id", "click_ts", "purchase_id", "purchase_ts",
            "purchase_value"]
    expected = _rows(click_purchase_attribution(clicks_b, purch_b), cols)
    assert len(expected) > 0  # the corpus must actually exercise the join

    stream = stream_events_from_dir(spark, events_dir, ev_batch.schema)
    clicks_s = stream.filter(F.col("event_type") == "click")
    purch_s = stream.filter(F.col("event_type") == "purchase")
    q = run_stream_to_memory(
        click_purchase_attribution(clicks_s, purch_s, watermark="2 hours"),
        "attrib_t",
        "append",
    )
    q.awaitTermination(120)
    got = _rows(spark.sql("SELECT * FROM attrib_t"), cols)
    assert got == expected


def test_appless_sink_against_marked_table_warns_or_raises(spark, tmp_path):
    """r7 punch #6: constructing an app_id=None sink against a table that
    already carries app-less batch markers is the fresh-checkpoint
    foot-gun (batch ids restart at 0 and every batch <= the old marker
    silently skips). Construction now warns — or raises under
    strict_app_id — instead of staying silent; naming an app_id stays
    quiet."""
    import warnings

    import pytest

    from spookystuff_spark.streaming.sink import (
        batch_marker_name,
        streaming_upsert_sink,
    )
    from spookystuff_spark.sources import upsert as U

    tdir = str(tmp_path / "sink_tbl")
    # a prior app-less stream committed batches 0..5
    U.write_table(
        spark.createDataFrame([(1, "a")], "k long, v string"), tdir,
        marker=batch_marker_name(5, None), change_feed=False,
    )
    with pytest.warns(UserWarning, match="silently SKIPPED"):
        streaming_upsert_sink(tdir, ["k"])  # app-less: ambiguous
    with pytest.raises(ValueError, match="silently SKIPPED"):
        streaming_upsert_sink(tdir, ["k"], strict_app_id=True)
    # the canonical call — one namespace per checkpoint — stays quiet
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        streaming_upsert_sink(tdir, ["k"], app_id=str(tmp_path / "ckpt"))
    # and a fresh table is quiet too
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        streaming_upsert_sink(str(tmp_path / "none_yet"), ["k"])
