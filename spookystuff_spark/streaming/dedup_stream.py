"""Streaming exact dedup — the continuous-ingest twin of q_dedup_exact.

A 100 TB pretraining ingest arrives as a stream; exact dedup there is
``dropDuplicates`` on the canonical content fingerprint with a watermark
bounding the dedup state (Spark stores seen keys in the state store; the
watermark lets it evict keys older than the lateness bound instead of
growing forever). Near-dup (MinHash) stays a batch pass over the deduped
output — its candidate generation is a shuffle, not a per-record decision.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from spookystuff_spark.operators.text import fingerprint


def dedup_stream(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    lateness: str = "1 hour",
) -> DataFrame:
    """readStream df → stream with exact duplicates dropped by content
    fingerprint. State is watermark-bounded: a duplicate arriving more than
    ``lateness`` after the original MAY be re-emitted (the documented
    trade-off that keeps state finite at ingest scale)."""
    from spookystuff_spark.streaming.events import _with_event_time

    return (
        _with_event_time(stream_df, ts_col)
        .withColumn("__fp", fingerprint(F.col(text_col)))
        .withWatermark(ts_col, lateness)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )
