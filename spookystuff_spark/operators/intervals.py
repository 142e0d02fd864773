"""Interval-overlap join without a nested-loop plan.

``a.start <= b.end AND b.start <= a.end`` is inequality-only, so Catalyst
can only plan it as BroadcastNestedLoopJoin / CartesianProduct — the
classic Spark scale trap (fine at 10^4 rows, dead at 10^9). The standard
fix (Flink interval joins, Spark's own range-join hints on Databricks):
quantize time into fixed-width buckets, explode each interval onto every
bucket it touches, and equi-join on (keys..., bucket). Overlapping pairs
then meet in EVERY shared bucket, so results are deduplicated not with a
``distinct`` (a second shuffle over the matches) but with the
report-once trick: a pair is emitted only from the bucket containing
``greatest(a.start, b.start)`` — the first bucket where both are live —
which each match row can check locally.

Cost model: rows explode into ``(len / width) + 1`` bucket rows, so pick
``width`` near the typical interval length — the join stays an equi-join
(shuffle or broadcast, AQE's choice) on a key whose fan-out is bounded
and skew-visible. Everything is whole-stage codegen; the only Python is
plan construction.

The reference has no interval algebra (batch fetch engine); this rounds
out the events/session family the way a stream-analytics user expects.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    keys: Sequence[str] = (),
    bucket_width: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join rows whose [start, end] intervals overlap (inclusive ends),
    optionally equi-matched on ``keys`` first. Interval columns are
    numeric (e.g. epoch seconds). Only ``how='inner'`` is supported — the
    report-once dedup has no outer-join analogue here."""
    if how != "inner":
        raise ValueError("interval_join supports how='inner' only")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = F.lit(int(bucket_width))

    def bucketed(df: DataFrame, s: str, e: str) -> DataFrame:
        # an inverted interval (start > end) is undefined under overlap
        # semantics AND would make sequence() count backwards — drop it
        # explicitly so behavior is defined, not engine-accidental
        df = df.where(F.col(s) <= F.col(e))
        return df.withColumn(
            "_ib",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / w).cast("long"),
                    F.floor(F.col(e) / w).cast("long"),
                )
            ),
        )

    lb = bucketed(left, l_start, l_end)
    rb = bucketed(right, r_start, r_end)
    overlap = (F.col(l_start) <= F.col(r_end)) & (
        F.col(r_start) <= F.col(l_end)
    )
    first_shared = F.floor(
        F.greatest(F.col(l_start), F.col(r_start)) / w
    ).cast("long")
    return (
        lb.join(rb, [*keys, "_ib"], "inner")
        .where(overlap & (F.col("_ib") == first_shared))
        .drop("_ib")
    )


def interval_join_sql(
    left_sql: str,
    right_sql: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    keys: Sequence[str] = (),
    select: str = "*",
) -> str:
    """DuckDB twin (oracle): the plain inequality join the bucketed plan
    must exactly reproduce."""
    on = " AND ".join(
        [f"l.{k} = r.{k}" for k in keys]
        + [f"l.{l_start} <= r.{r_end}", f"r.{r_start} <= l.{l_end}"]
    )
    return (
        f"SELECT {select} FROM ({left_sql}) l JOIN ({right_sql}) r ON {on}"
    )
