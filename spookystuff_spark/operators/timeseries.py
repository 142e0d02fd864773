"""Time-series resample + gap-fill (TimescaleDB ``time_bucket_gapfill`` /
QuestDB ``SAMPLE BY ... FILL`` semantics, Spark-first).

Everything is pure Catalyst: bucketing is integer arithmetic on epoch
seconds (a BIGINT bucket key — engine-portable, no timezone semantics to
disagree on), the per-key time spine is ``sequence()`` + ``explode``
derived from each key's own [min, max] bucket (never a driver loop, never
a global collect), and the fill methods are window functions over the
key. Scale shape: one shuffle keys the bucket aggregation, the spine and
the fill windows reuse the same key partitioning, and the spine→value
join is key-local — nothing here widens at 100 TB beyond the groupBy any
rollup already pays. Gap cardinality is bounded by (max-min)/interval per
key; a pathological key (one event in 1970, one today) would explode its
own spine only — callers bound the range upstream like any gapfill
engine requires.

Fill methods:

* ``locf`` — last observation carried forward (strictly: last non-null
  value at or before the bucket).
* ``linear`` — linear interpolation between the neighboring observed
  buckets (observed buckets keep their exact value).
* ``zero`` — missing buckets read 0.0.

The reference has no time-series surface (SURVEY §2.8 — batch-only, no
event-time ops); this rounds out the events-table family
(queries/events.py) the way a training-data/metrics pipeline expects.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from spookystuff_spark.functions.rounding import round_stable

_FILLS = ("locf", "linear", "zero")


def time_bucket(ts_col: Column, interval_sec: int) -> Column:
    """Epoch-seconds BIGINT bucket: floor(ts / interval) * interval —
    pure integer arithmetic (no double round-trip)."""
    ep = F.unix_timestamp(ts_col)
    return (ep - (ep % F.lit(interval_sec))).cast("long")


def resample(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    interval_sec: int,
    agg: str = "sum",
    round_digits: int = 2,
) -> DataFrame:
    """Downsample to fixed buckets: (keys..., bucket_s, v) — one shuffle."""
    agg_fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
              "count": F.count}[agg]
    return (
        df.withColumn("bucket_s", time_bucket(F.col(ts_col), interval_sec))
        .groupBy(*key_cols, "bucket_s")
        .agg(round_stable(agg_fn(value_col), round_digits).alias("v"))
    )


def gap_fill(
    resampled: DataFrame,
    key_cols: Sequence[str],
    interval_sec: int,
    method: str = "locf",
    bucket_col: str = "bucket_s",
    value_col: str = "v",
    round_digits: int = 2,
) -> DataFrame:
    """Densify a resampled frame onto each key's full bucket spine and fill
    the holes. Output: (keys..., bucket_s, v, filled) where ``filled`` is 1
    on spine-generated rows. Observed buckets keep their exact value under
    every method."""
    if method not in _FILLS:
        raise ValueError(f"fill method {method!r} not in {_FILLS}")
    keys = list(key_cols)
    spine = (
        resampled.groupBy(*keys)
        .agg(F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi"))
        .select(
            *keys,
            F.explode(
                F.sequence("_lo", "_hi", F.lit(interval_sec))
            ).alias(bucket_col),
        )
    )
    joined = spine.join(resampled, keys + [bucket_col], "left").withColumn(
        "filled", F.col(value_col).isNull().cast("int")
    )
    w = Window.partitionBy(*keys).orderBy(bucket_col)
    if method == "zero":
        filled_v = F.coalesce(F.col(value_col), F.lit(0.0))
    elif method == "locf":
        filled_v = F.last(value_col, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
    else:  # linear
        prev_v = F.last(value_col, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        prev_t = F.last(
            F.when(F.col(value_col).isNotNull(), F.col(bucket_col))
        , ignorenulls=True).over(w.rowsBetween(Window.unboundedPreceding, 0))
        next_v = F.first(value_col, ignorenulls=True).over(
            w.rowsBetween(0, Window.unboundedFollowing)
        )
        next_t = F.first(
            F.when(F.col(value_col).isNotNull(), F.col(bucket_col))
        , ignorenulls=True).over(w.rowsBetween(0, Window.unboundedFollowing))
        # per-key spines start/end at observed buckets, so interior holes
        # always have both neighbors; the coalesces are edge guards only
        interp = prev_v + (next_v - prev_v) * (
            (F.col(bucket_col) - prev_t).cast("double")
            / (next_t - prev_t).cast("double")
        )
        filled_v = F.coalesce(
            F.col(value_col),
            round_stable(interp, round_digits),
            prev_v,
            next_v,
        )
    return joined.select(
        *keys, bucket_col, filled_v.alias(value_col), "filled"
    )


# --------------------------------------------------------- DuckDB oracle


def gapfill_sql(
    events_sql: str,
    key_sql: str,
    ts_sql: str,
    value_sql: str,
    interval_sec: int,
    method: str = "locf",
    agg: str = "sum",
    round_digits: int = 2,
) -> str:
    """DuckDB twin of ``resample`` + ``gap_fill`` (correctness oracle)."""
    if method not in _FILLS:
        raise ValueError(f"fill method {method!r} not in {_FILLS}")
    bucket = (
        f"(CAST(floor(epoch({ts_sql})) AS BIGINT) // {interval_sec})"
        f" * {interval_sec}"
    )
    if method == "zero":
        fill = "COALESCE(v, 0.0)"
    elif method == "locf":
        fill = (
            "last_value(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY bucket_s "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
    else:
        fill = f"""COALESCE(v, round(1e-6 + pv + (nv - pv) *
            CAST(bucket_s - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE),
            {round_digits}), pv, nv)"""
    neighbor_cols = """,
         last_value(v IGNORE NULLS) OVER w_prev AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN bucket_s END IGNORE NULLS)
           OVER w_prev AS pt,
         first_value(v IGNORE NULLS) OVER w_next AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN bucket_s END IGNORE NULLS)
           OVER w_next AS nt""" if method == "linear" else ""
    window_decl = """
  WINDOW w_prev AS (PARTITION BY k ORDER BY bucket_s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w_next AS (PARTITION BY k ORDER BY bucket_s
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)""" if (
        method == "linear"
    ) else ""
    return f"""
WITH rs AS (
  SELECT {key_sql} AS k, {bucket} AS bucket_s,
         round(1e-6 + {agg}({value_sql}), {round_digits}) AS v
  FROM ({events_sql}) GROUP BY 1, 2
), spine AS (
  SELECT k, unnest(range(min(bucket_s), max(bucket_s) + 1,
                         {interval_sec})) AS bucket_s
  FROM rs GROUP BY k
), j AS (
  SELECT spine.k, spine.bucket_s, rs.v,
         CASE WHEN rs.v IS NULL THEN 1 ELSE 0 END AS filled{neighbor_cols}
  FROM spine LEFT JOIN rs USING (k, bucket_s){window_decl}
)
SELECT k, bucket_s, {fill} AS v, filled FROM j"""


def rolling_zscore(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    window_rows: int = 24,
    round_digits: int = 4,
) -> DataFrame:
    """Rolling anomaly score: mean/sample-stddev over the trailing
    ``window_rows`` rows per key (ROWS frame — deterministic, unlike a
    RANGE frame on duplicate timestamps paired with a tie) and the
    z-score of the current value. Rows whose trailing window has fewer
    than 2 points, or zero variance, get a NULL z — "not enough signal",
    never a division blow-up. One shuffle (the key window); everything in
    codegen."""
    keys = list(key_cols)
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    # variance threshold instead of != 0: near-zero variance is where the
    # two engines' summation orders could disagree about exact zero
    z = F.when(
        std.isNotNull() & (std > 1e-9),
        round_stable((F.col(value_col) - mean) / std, round_digits),
    )
    return df.select(
        *keys,
        order_col,
        value_col,
        round_stable(mean, round_digits).alias("roll_mean"),
        F.when(std.isNotNull(), round_stable(std, round_digits)).alias(
            "roll_std"
        ),
        z.alias("zscore"),
    )


def rolling_zscore_sql(
    src_sql: str,
    key_sql: str,
    order_sql: str,
    value_sql: str,
    window_rows: int = 24,
    round_digits: int = 4,
) -> str:
    """DuckDB twin of :func:`rolling_zscore`."""
    frame = f"ROWS BETWEEN {window_rows - 1} PRECEDING AND CURRENT ROW"
    over = f"OVER (PARTITION BY {key_sql} ORDER BY {order_sql} {frame})"
    return f"""
WITH rolled AS (
  SELECT {key_sql} AS k, {order_sql} AS o, {value_sql} AS v,
         avg({value_sql}) {over} AS m,
         stddev_samp({value_sql}) {over} AS s
  FROM ({src_sql})
)
SELECT k, o, v,
       round(1e-6 + m, {round_digits}) AS roll_mean,
       CASE WHEN s IS NOT NULL THEN round(1e-6 + s, {round_digits}) END
         AS roll_std,
       CASE WHEN s IS NOT NULL AND s > 1e-9
            THEN round(1e-6 + (v - m) / s, {round_digits}) END AS zscore
FROM rolled"""
