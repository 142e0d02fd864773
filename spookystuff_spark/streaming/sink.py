"""Exactly-once streaming MERGE sink: Structured Streaming → versioned table.

``foreachBatch`` gives at-least-once micro-batch delivery — after a crash the
last batch is REPLAYED with the same ``batch_id``. Exactly-once therefore
needs an idempotent commit: each snapshot produced by the sink records the
batch id that wrote it (a ``_BATCH_<id>`` marker dropped inside the immutable
version dir BEFORE the pointer swap, so marker and data commit atomically
together), and a replayed batch with id ≤ the last committed marker is a
no-op. This is precisely the Delta/Iceberg ``txnAppId``/``txnVersion``
protocol, re-expressed over sources/upsert.py's pointer-swap tables.

Scale shape: each micro-batch pays one anti-join + union snapshot write (see
upsert.py — partition the table and upsert per partition at 100 TB); the
marker probe is one directory listing of committed versions, O(versions),
bounded by ``vacuum``.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

from pyspark.sql import DataFrame

from spookystuff_spark.sources import upsert as U

_MARK = "_BATCH_"


def _batch_marker(table_dir: str, version: str) -> int | None:
    vdir = os.path.join(table_dir, version)
    try:
        for f in os.listdir(vdir):
            if f.startswith(_MARK):
                return int(f[len(_MARK):])
    except FileNotFoundError:
        return None
    return None


def last_committed_batch(table_dir: str) -> int | None:
    """Highest stream batch id whose snapshot committed (pointer-visible).

    Stream batch ids are monotonic, but interleaved NON-stream writes
    (manual upserts, compaction) create newer versions without markers — so
    walk committed versions newest-first for the latest marker."""
    if not os.path.isdir(table_dir):
        return None
    for v in reversed(U.committed_versions(table_dir)):
        b = _batch_marker(table_dir, v)
        if b is not None:
            return b
    return None


def streaming_upsert_sink(
    table_dir: str, key_cols: Sequence[str]
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function: MERGE each micro-batch into the
    versioned table, exactly once per batch id.

    Usage::

        q = (df.writeStream.outputMode("update")
               .foreachBatch(streaming_upsert_sink(dir, ["user_id"]))
               .start())
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        last = last_committed_batch(table_dir)
        if last is not None and batch_id <= last:
            return  # replay of an already-committed batch: exactly-once skip
        U.upsert(
            batch_df.sparkSession,
            table_dir,
            batch_df,
            key_cols,
            marker=f"{_MARK}{batch_id}",
        )

    return sink
