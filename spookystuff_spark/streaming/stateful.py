"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the rebuild-native pattern for operators Spark's built-in windows can't
express (running per-key aggregates with arbitrary Python state).

State is one row per user (count, total, last_ts); the state store partitions
on the groupBy key, so at 100 TB state scales with |users|, not |events|, and
a watermark + timeout would bound idle keys (GroupStateTimeout).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _update_user(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    last_ts = None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = pdf["ts"].max()
        last_ts = mx if last_ts is None else max(last_ts, mx)
    state.update((n, round(total, 6)))
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "n_events": n,
                "total_value": round(total, 2),
                "last_ts": last_ts,
            }
        ]
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Running per-user totals across micro-batches (update mode)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
