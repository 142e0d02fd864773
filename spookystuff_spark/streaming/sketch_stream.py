"""Streaming HyperLogLog: windowed approximate distinct counts over an event
stream. The register table IS the streaming state — ``max(rho)`` is a
monotone, mergeable aggregate, so the whole sketch runs as one supported
streaming aggregation (no custom state store code), bounded at
``windows x groups x 2^p`` rows. The batch run of the same expressions is
the correctness oracle (tests/test_streaming.py pattern).

At 100 TB-scale ingest: state size is independent of distinct-value count
(the whole point); the watermark evicts closed windows; finishing
(registers -> estimate) is a trivially small batch step over the emitted
sketch, or `hll_finish` directly on the update-mode sink table.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from spookystuff_spark.operators.sketch import hll_finish, hll_reg_rho
from spookystuff_spark.streaming.events import _with_event_time


def windowed_hll_registers(
    events: DataFrame,
    group_cols: Sequence[str] = ("event_type",),
    value_col: str = "user_id",
    window: str = "1 hour",
    watermark: Optional[str] = None,
    p: int = 12,
) -> DataFrame:
    """(window, group, reg, rho) register rows per tumbling window — batch or
    stream (same expression; with a watermark it is a supported append/update
    streaming aggregation)."""
    src = _with_event_time(events, "ts")
    if watermark:
        src = src.withWatermark("ts", watermark)
    reg, rho = hll_reg_rho(value_col, p)
    return (
        src.groupBy(
            F.window(F.col("ts"), window).alias("w"),
            *group_cols,
            reg.alias("reg"),
        )
        .agg(F.max(rho).alias("rho"))
        .select(
            F.col("w.start").alias("window_start"), *group_cols, "reg", "rho"
        )
    )


def finish_windowed_hll(
    registers: DataFrame,
    group_cols: Sequence[str] = ("event_type",),
    p: int = 12,
) -> DataFrame:
    """Registers (from any number of micro-batch emissions — duplicates
    merge via max) -> (window_start, group, est_distinct, zero_regs)."""
    return hll_finish(registers, ["window_start", *group_cols], p)


def windowed_cms_sketch(
    events: DataFrame,
    key_col: str = "user_id",
    window: str = "1 hour",
    watermark: Optional[str] = None,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Streaming Count-Min: per tumbling window, the fixed depth x width
    counter grid — ``sum`` is mergeable, so this is one supported streaming
    aggregation with state bounded at windows x depth x width rows no matter
    how many distinct keys flow through. Returns
    (window_start, j, bucket, c); point-query the emitted sketch with
    ``operators.sketch.cms_query`` per window (counts from repeated
    micro-batch emissions in update mode merge by summing)."""
    from spookystuff_spark.operators.sketch import _cms_bucket

    src = _with_event_time(events, "ts")
    if watermark:
        src = src.withWatermark("ts", watermark)
    rows = F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j")
    keyed = src.select(
        F.col("ts"), F.col(key_col).cast("string").alias("k"), rows
    )
    return (
        keyed.groupBy(
            F.window(F.col("ts"), window).alias("w"),
            "j",
            _cms_bucket(F.col("j"), F.col("k"), width).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("w.start").alias("window_start"), "j", "bucket", "c")
    )
