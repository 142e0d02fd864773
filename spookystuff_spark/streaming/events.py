"""Structured Streaming surface.

The reference has NO streaming operators (SURVEY.md §2.8 — explore is
batch-iterative); this module is rebuild-native: the same sessionization /
windowed-aggregation logic as the batch queries, expressed once and runnable
both ways (Spark's unified batch/streaming semantics make the batch run the
correctness oracle for the streaming run — pinned in tests/test_streaming.py).

Scale notes: watermark bounds state store growth; session_window merges are
keyed on (user_id) so state partitioning follows the shuffle; file sources at
100 TB should set maxFilesPerTrigger for back-pressure.
"""

from __future__ import annotations

from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

SESSION_GAP = "30 minutes"
WATERMARK = "1 hour"


def _with_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (ltz); parquet event times may infer as
    TIMESTAMP_NTZ depending on ``spark.sql.timestampType`` — normalize."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def sessionized(events: DataFrame, gap: str = SESSION_GAP, watermark: Optional[str] = None) -> DataFrame:
    """Gap-based sessions via ``session_window`` — one expression, batch or
    stream. Returns (user_id, session_start, session_end, n_events, total_value)."""
    src = _with_event_time(events, "ts")
    if watermark:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.col("user_id"), F.session_window(F.col("ts"), gap).alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value") + F.lit(1e-6), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def hourly_counts(events: DataFrame, watermark: Optional[str] = None) -> DataFrame:
    """Tumbling 1-hour windowed counts (late data handled by watermark)."""
    src = _with_event_time(events, "ts")
    if watermark:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("hour"), "event_type", "n_events"
        )
    )


def stream_events_from_dir(
    spark: SparkSession, dir_path: str, schema, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over parquet drops (the standard landing-zone setup)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(dir_path)
    )


def enriched_by_user_segment(
    events: DataFrame, segments: DataFrame, watermark: Optional[str] = None
) -> DataFrame:
    """Stream-static enrichment + windowed rollup — the standard landing-zone
    pattern: a micro-batched event stream joined to a slowly-changing static
    dimension. The static side is broadcast per micro-batch (no stream state
    for the join; only the windowed aggregate keeps state, bounded by the
    watermark). Returns (segment, hour, n_events, total_value)."""
    import pyspark.sql.functions as F2
    from pyspark.sql.functions import broadcast

    src = _with_event_time(events, "ts")
    if watermark:
        src = src.withWatermark("ts", watermark)
    return (
        src.join(broadcast(segments), "user_id")
        .groupBy("segment", F2.window("ts", "1 hour").alias("w"))
        .agg(
            F2.count(F2.lit(1)).alias("n_events"),
            F2.round(F2.sum("value") + F2.lit(1e-6), 2).alias("total_value"),
        )
        .select(
            "segment", F2.col("w.start").alias("hour"), "n_events", "total_value"
        )
    )


def click_purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: Optional[str] = None,
) -> DataFrame:
    """STREAM-STREAM inner join: attribute each purchase to every click the
    same user made within ``horizon`` before it.

    The canonical two-stream pattern: both sides watermarked, plus an
    explicit event-time range predicate (``purchase_ts`` ∈ [click_ts,
    click_ts + horizon]) — together these let Spark compute how long a
    buffered click can still match a future purchase and EXPIRE join state,
    so state is bounded by (watermark + horizon) of traffic per key, not
    the stream's history. Without the range bound a stream-stream join
    must buffer both sides forever. Runs identically in batch (no
    watermark) — the parity oracle in tests/test_streaming.py.
    """
    c = _with_event_time(clicks, "ts").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = _with_event_time(purchases, "ts").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if watermark:
        c = c.withWatermark("click_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        [
            c["user_id"] == p["user_id"],
            F.col("purchase_ts") >= F.col("click_ts"),
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}"),
        ],
    ).select(
        c["user_id"].alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        F.round(F.col("purchase_value") + F.lit(1e-6), 2).alias("purchase_value"),
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
):
    """Drive a streaming query into an in-memory sink (test/debug harness)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
